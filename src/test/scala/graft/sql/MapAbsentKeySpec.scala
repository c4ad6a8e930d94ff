package graft.sql
import graft.SparkSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec
import org.apache.spark.sql.Row
case class MH2(id: Int, tags: Map[String, Int])
class MapAbsentKeySpec extends AnyWordSpec with Matchers with SparkSpec {
  import GraftSql.implicits._
  "map cherry-pick of an absent key" should {
    "silently skip, as the reference does (AvroSql.scala:270)" in {
      import spark.implicits._
      val df = Seq(MH2(1, Map("a" -> 1)), MH2(2, Map("b" -> 2))).toDF()
      val out = df.sql("SELECT id, tags.a as A, tags.b FROM t withstructure")
      val rows = out.orderBy("id").collect()
      rows(0).getMap[String, Int](1).toMap shouldBe Map("A" -> 1)
      rows(1).getMap[String, Int](1).toMap shouldBe Map("b" -> 2)
    }
  }
}
