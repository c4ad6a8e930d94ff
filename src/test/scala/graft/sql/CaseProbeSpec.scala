package graft.sql
import graft.SparkSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec
class CaseProbeSpec extends AnyWordSpec with Matchers with SparkSpec {
  import GraftSql.implicits._
  "case insensitivity" should {
    "resolve mixed-case identifiers like the reference (Calcite caseSensitive=false)" in {
      import spark.implicits._
      val df = Seq((1, "a", 2.0)).toDF("id", "name", "bal")
      val out = df.sql("SELECT NAME as n, Bal")
      out.columns.toSeq shouldBe Seq("n", "Bal")
      out.collect().head.toSeq shouldBe Seq("a", 2.0)
      val ws = df.sql("SELECT ID FROM t withstructure")
      ws.collect().head.toSeq shouldBe Seq(1)
    }
  }
}
