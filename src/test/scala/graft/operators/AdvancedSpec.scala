package graft.operators

import graft.SparkSpec
import graft.functions.BloomFilters
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Specs for the round-4 relational-depth gates (Advanced catalog) and the
  * explicit bloom-filter surface they build on.
  */
class AdvancedSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val sf = "/root/testdata/sf0.001"

  test("bloom filter has no false negatives and a bounded false-positive rate") {
    import spark.implicits._
    val keys = spark.range(0, 10000).select(F.col("id").as("k"))
    val bloom = keys.agg(BloomFilters.bloomAgg(spark, F.col("k"), 10000L, 1L << 17))
      .head().getAs[Array[Byte]](0)

    // every inserted key must probe true (blooms cannot under-approximate)
    val misses = keys.filter(!BloomFilters.mightContain(spark, bloom, F.col("k")))
      .count()
    misses shouldBe 0L

    // disjoint probe set: fpp should be near 10000/2^17·ln2 setup ≈ 1-2%
    val fp = spark.range(1000000, 1010000).select(F.col("id").as("k"))
      .filter(BloomFilters.mightContain(spark, bloom, F.col("k"))).count()
    assert(fp < 500, s"false-positive count $fp out of 10000 probes is > 5%")
    ()
  }

  test("bloom prefilter keeps the exact semi-join result unchanged") {
    // the gate's own invariant: prefilter(bloom) ∘ semi-join ≡ semi-join
    def t(n: String) = spark.read.parquet(s"$sf/$n.parquet")
    val cust = t("customer").filter(F.col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val bloom = cust.agg(BloomFilters.bloomAgg(spark, F.col("c_custkey"), 100000L, 1L << 20))
      .head().getAs[Array[Byte]](0)
    val plain = t("orders")
      .join(cust, F.col("o_custkey") === F.col("c_custkey"), "left_semi")
    val pre = t("orders")
      .filter(BloomFilters.mightContain(spark, bloom, F.col("o_custkey")))
      .join(cust, F.col("o_custkey") === F.col("c_custkey"), "left_semi")
    pre.count() shouldBe plain.count()
    // and the probe really prunes: bloom alone admits barely more than the
    // true matches (≤ fpp overhead), far fewer than the full fact table
    val admitted = t("orders")
      .filter(BloomFilters.mightContain(spark, bloom, F.col("o_custkey"))).count()
    val total = t("orders").count()
    assert(admitted < total, s"bloom admitted every row ($admitted of $total)")
    ()
  }

  test("q_filter_agg computes differently-filtered aggregates in one pass") {
    val df = Advanced.queries("q_filter_agg")(spark, sf)
    val rows = df.collect()
    rows.length shouldBe 3 // l_returnflag ∈ {A, N, R}
    rows.foreach { r =>
      val nAll = r.getAs[Long]("n_all")
      val nDisc = r.getAs[Long]("n_disc")
      assert(nDisc <= nAll, "filtered count exceeds unfiltered count")
    }
    // single scan: exactly one relation leaf in the optimized plan (the
    // physical plan is AQE-wrapped, so count on the logical side)
    val scans = df.queryExecution.optimizedPlan.collectLeaves().length
    scans shouldBe 1
  }

  test("q_lateral returns at most 2 customers per nation, highest balance first") {
    val df = Advanced.queries("q_lateral")(spark, sf)
    val byNation = df.collect().groupBy(_.getAs[String]("n_name"))
    byNation.foreach { case (_, rows) =>
      assert(rows.length <= 2)
    }
    byNation.size should be > 0
  }

  test("q_stats_moments matches Spark's native corr/stddev to float tolerance") {
    val df = Advanced.queries("q_stats_moments")(spark, sf)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(F.col("l_returnflag"),
        F.col("l_quantity").cast("double").as("x"),
        F.floor(F.col("l_extendedprice")).cast("double").as("y"))
    val native = li.groupBy("l_returnflag")
      .agg(F.corr("x", "y").as("c"), F.stddev("x").as("sx"), F.stddev("y").as("sy"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    df.collect().foreach { r =>
      val (c, sx, sy) = native(r.getAs[String]("l_returnflag"))
      math.abs(r.getAs[Double]("corr_qty_price") - c) should be < 1e-9
      math.abs(r.getAs[Double]("sd_qty") - sx) should be < 1e-6
      math.abs(r.getAs[Double]("sd_price") - sy) should be < 1e-3
    }
  }

  test("q_approx_topk: CMS estimates over-approximate within eps·N") {
    val rows = Advanced.queries("q_approx_topk")(spark, sf).collect()
    rows.length shouldBe 10
    all(rows.map(_.getAs[Boolean]("cms_ok"))) shouldBe true
  }

  test("two-phase skyline equals brute-force dominance on random points") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      // duplicates on purpose: small value ranges force both-dim ties
      val pts = Seq.fill(300)(
        (rnd.nextLong().abs % 100000, rnd.nextInt(12), rnd.nextInt(40).toLong))
      val df = pts.toDF("p_partkey", "p_size", "cents")
      val got = Advanced.skyline2D(
          Advanced.skyline2D(df, Some(F.pmod(F.col("p_partkey"), F.lit(7)))),
          None)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val want = pts.filter { case (_, s, c) =>
        !pts.exists { case (_, s2, c2) =>
          s2 <= s && c2 <= c && (s2 < s || c2 < c)
        }
      }.toSet
      got shouldBe want
    }
  }
}
