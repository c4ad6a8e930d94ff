package graft.operators

import org.apache.spark.sql.{functions => F}
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.SparkSpec

/** Sketch surface: approx_count_distinct (HLL++) has no cross-engine
  * oracle (sketch internals differ between engines), so its contract is
  * asserted as a relative-error bound against the exact count — the scale
  * story is that the sketch aggregates in O(1) memory per group where
  * exact distinct shuffles every value.
  */
class SketchSpec extends AnyWordSpec with Matchers with SparkSpec {

  "approx_count_distinct" should {
    "stay within the configured error of the exact distinct count" in {
      val words = spark.read
        .parquet("/root/testdata/sf0.01/documents.parquet")
        .select(F.explode(F.split(F.col("text"), " ")).as("w"))
      val exact = words.select(F.countDistinct("w")).collect().head.getLong(0)
      val approx = words
        .select(F.approx_count_distinct("w", rsd = 0.02))
        .collect().head.getLong(0)
      math.abs(approx - exact).toDouble / exact should be < 0.05
    }

    "work per group with bounded state" in {
      val d = spark.read
        .parquet("/root/testdata/sf0.01/documents.parquet")
      val perLang = d.groupBy("lang")
        .agg(F.approx_count_distinct("source").as("n_sources"))
        .collect()
      perLang should have length 5
      // 20 sources per language; HLL at default rsd must land close
      perLang.foreach { r => r.getLong(1).toDouble shouldBe 20.0 +- 3.0 }
    }
  }
}
