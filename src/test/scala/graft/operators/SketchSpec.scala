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

  "the KMV bottom-k sketch (q_sketch_kmv)" should {
    "estimate within the k=64 error regime, integer-only" in {
      val rows = Sketches.queries("q_sketch_kmv")(spark, "/root/testdata/sf0.01")
        .collect()
      rows should not be empty
      rows.foreach { r =>
        val exact = r.getLong(r.fieldIndex("exact_users")).toDouble
        val est = r.getLong(r.fieldIndex("kmv_est")).toDouble
        // KMV rsd ~ 1/sqrt(k-2) = 12.7%; allow 3 sigma
        math.abs(est - exact) / exact should be < 0.39
      }
    }

    "fall back to the exact sketch size below k distinct values" in {
      // sf0.001 has 15 users per type — under k=64 the estimate IS exact
      Sketches.queries("q_sketch_kmv")(spark, "/root/testdata/sf0.001")
        .collect().foreach { r =>
          r.getLong(r.fieldIndex("kmv_est")) shouldBe
            r.getLong(r.fieldIndex("exact_users"))
        }
    }
  }

  "KMV set algebra (q_sketch_kmv_jaccard)" should {
    "recover union and intersection within the sketch error" in {
      val r = Sketches.queries("q_sketch_kmv_jaccard")(
        spark, "/root/testdata/sf0.01").collect().head
      val exactU = r.getLong(r.fieldIndex("exact_union")).toDouble
      val exactI = r.getLong(r.fieldIndex("exact_inter")).toDouble
      val estU = r.getLong(r.fieldIndex("union_est")).toDouble
      val estI = r.getLong(r.fieldIndex("inter_est")).toDouble
      math.abs(estU - exactU) / exactU should be < 0.39
      // intersection compounds two estimates; allow a looser band
      math.abs(estI - exactI) / exactI should be < 0.5
    }
  }

  "the hand-rolled HLL (q_sketch_hll)" should {
    "estimate within the m=64 error regime and aggregate map-side" in {
      val rows = Sketches.queries("q_sketch_hll")(spark, "/root/testdata/sf0.01")
      val plan = rows.queryExecution.executedPlan.toString
      // bucket-max is mergeable state: Spark must plan a partial max
      // (map-side combine) before the exchange, never shuffle user_ids
      // for the sketch side.
      plan should include("partial_max")
      rows.collect().foreach { r =>
        val exact = r.getLong(r.fieldIndex("exact_users")).toDouble
        val est = r.getLong(r.fieldIndex("hll_est")).toDouble
        // raw harmonic estimate (no small-range correction): 1.04/sqrt(64)
        // = 13% standard error; allow 3 sigma.
        math.abs(est - exact) / exact should be < 0.39
      }
    }
  }

  "the histogram quantile (q_sketch_quantile_hist)" should {
    "place the median bucket around the true rank-median element" in {
      val sfDir = "/root/testdata/sf0.001"
      val rows = Sketches.queries("q_sketch_quantile_hist")(spark, sfDir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      // exact lower median per group, from a full sort (test-only)
      val exact = spark.read.parquet(s"$sfDir/events.parquet")
        .groupBy("event_type")
        .agg(F.expr("sort_array(collect_list(value))" +
          "[CAST((count(value) + 1) DIV 2 AS INT) - 1]").as("med"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      exact.foreach { case (et, med) =>
        val (n, bucket, nnz) = rows(et)
        n should be > 0L
        nnz should be > 1L
        // the true median element quantizes into exactly that bucket
        (math.floor(med * 1000) / 1000).toLong shouldBe bucket
      }
    }
  }

  "the count-min sketch (q_sketch_cms)" should {
    "never under-count and stay within the (d=3, w=256) collision bound" in {
      val rows = Sketches.queries("q_sketch_cms")(spark, "/root/testdata/sf0.01")
        .collect()
      rows should have length 10
      rows.foreach { r =>
        val est = r.getLong(r.fieldIndex("cms_est"))
        val tru = r.getLong(r.fieldIndex("true_cnt"))
        r.getBoolean(r.fieldIndex("never_under")) shouldBe true
        est should be >= tru
      }
      // with 3 independent rows the min-estimate should beat any single
      // row's collision noise: at least one candidate is estimated exactly
      rows.exists(r => r.getLong(r.fieldIndex("cms_est")) ==
        r.getLong(r.fieldIndex("true_cnt"))) shouldBe true
    }
  }
}
