package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.SparkSpec

class GraftExtensionsSpec extends AnyWordSpec with Matchers with SparkSpec {

  "GraftExtensions" should {
    "make the native functions resolvable in a session built with them" in {
      // force the shared SparkContext to be up before swapping sessions
      spark.range(1).count()
      val prevDefault = SparkSession.getDefaultSession
      val prevActive = SparkSession.getActiveSession
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      try {
        val s2 = SparkSession.builder()
          .master("local[4]")
          .withExtensions(new GraftExtensions)
          .getOrCreate()
        val row = s2.sql(
          """SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)),
            |               array(cast(3.0 as float), cast(4.0 as float))) AS d,
            |       sorted_overlap(array('a','b','c'), array('b','c','d')) AS o,
            |       simhash16(array(md5('alpha'))) AS s""".stripMargin)
          .collect().head
        row.getDouble(0) shouldBe 11.0
        row.getInt(1) shouldBe 2
        row.getLong(2) should be >= 0L
        // UDTF in a select list and via LATERAL VIEW
        val gen = s2.sql(
          "SELECT shingles('a b c d', 3) FROM (SELECT 1)").collect()
        gen.map(r => (r.getInt(0), r.getString(1))).toSeq shouldBe
          Seq((0, "a b c"), (1, "b c d"))
        val lat = s2.sql(
          """SELECT t.txt, g.pos, g.shingle
            |FROM (SELECT 'x y z w' AS txt) t
            |LATERAL VIEW shingles(txt, 2) g AS pos, shingle
            |WHERE g.pos > 0""".stripMargin).collect()
        lat.map(r => (r.getInt(1), r.getString(2))).toSeq shouldBe
          Seq((1, "y z"), (2, "z w"))
        // short input yields no rows; null yields no rows
        s2.sql("SELECT shingles('a b', 3) FROM (SELECT 1)").count() shouldBe 0
        s2.sql("SELECT shingles(cast(null as string), 3) FROM (SELECT 1)")
          .count() shouldBe 0
      } finally {
        SparkSession.clearDefaultSession()
        SparkSession.clearActiveSession()
        prevDefault.foreach(SparkSession.setDefaultSession)
        prevActive.foreach(SparkSession.setActiveSession)
      }
    }
  }
}
