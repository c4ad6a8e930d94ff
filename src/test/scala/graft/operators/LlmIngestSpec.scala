package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Specs for the ingest-curation gates (LlmIngest) and the two new
  * Advanced relational gates they ship alongside.
  */
class LlmIngestSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val sf = "/root/testdata/sf0.001"

  test("fuzzy-join length banding loses no pair vs the brute-force cross join") {
    val banded = Advanced.queries("q_fuzzy_join")(spark, sf)
      .select("name_a", "name_b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val names = spark.read.parquet(s"$sf/part.parquet")
      .select(F.col("p_name").as("nm")).distinct()
    val brute = names.alias("a").crossJoin(names.alias("b"))
      .filter(F.col("a.nm") < F.col("b.nm"))
      .filter(F.levenshtein(F.col("a.nm"), F.col("b.nm")).between(1, 2))
      .select(F.col("a.nm"), F.col("b.nm"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    banded shouldBe brute
    brute should not be empty
  }

  test("q_not_in plans as a null-aware anti join and drops null-key rows") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val df = Advanced.queries("q_not_in")(spark, sf)
    df.collect() // finalize AQE so the executed subtree is materialized
    // AdaptiveSparkPlanExec and QueryStageExec wrappers hide their subtrees
    // from plan.collect() — recurse through them explicitly.
    def findNaaj(p: SparkPlan): Seq[BroadcastHashJoinExec] = {
      val here = p match {
        case b: BroadcastHashJoinExec if b.isNullAwareAntiJoin => Seq(b)
        case _ => Seq.empty
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(findNaaj)
    }
    val naaj = findNaaj(df.queryExecution.executedPlan)
    assert(naaj.nonEmpty,
      s"expected a null-aware anti join in:\n${df.queryExecution.executedPlan.toString.take(2000)}")
    // three-valued logic: rows with o_custkey = 7 (nulled probe key) must
    // not be counted anywhere
    val total = df.agg(F.sum("n")).head().getLong(0)
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    val building = spark.read.parquet(s"$sf/customer.parquet")
      .filter(F.col("c_mktsegment") === "BUILDING").select("c_custkey")
    val expect = ord.filter(F.col("o_custkey") =!= 7)
      .join(building, F.col("o_custkey") === F.col("c_custkey"), "left_anti")
      .count()
    total shouldBe expect
  }

  test("llm_pii_redact masks every injected email and phone token") {
    val rows = LlmIngest.queries("llm_pii_redact")(spark, sf).collect()
    rows.length should be > 0
    // each doc got exactly one synthetic email and one phone appended
    all(rows.map(_.getAs[Int]("n_email"))) shouldBe 1
    all(rows.map(_.getAs[Int]("n_phone"))) shouldBe 1
    // and redaction is idempotent: masked text contains no further matches
    val masked = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("aug", F.concat(F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@mail.example or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")))
      .select(F.regexp_replace(F.regexp_replace(F.col("aug"),
        "[a-z0-9]+@[a-z]+\\.[a-z]+", "<EMAIL>"),
        "555-[0-9]{4}", "<PHONE>").as("red"))
      .filter(F.col("red").rlike("[a-z0-9]+@[a-z]+\\.[a-z]+|555-[0-9]{4}"))
      .count()
    masked shouldBe 0L
  }

  test("llm_mixture honors per-domain quotas exactly") {
    val perSource = LlmIngest.queries("llm_mixture")(spark, sf)
      .groupBy("source").agg(F.count(F.lit(1)).as("n"), F.max("rk").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    perSource("src0")._1 shouldBe 15L
    perSource("src1")._1 shouldBe 10L
    (perSource.keySet -- Set("src0", "src1")).foreach { s =>
      perSource(s)._1 shouldBe 5L
    }
    // rank never exceeds quota (the filter IS the quota)
    perSource.foreach { case (s, (n, mx)) => mx.toLong shouldBe n }
  }

  test("llm_mixture_temp flattens the mix: smaller sources keep larger fractions") {
    val rows = LlmIngest.queries("llm_mixture_temp")(spark, sf)
      .collect().map(r => (r.getAs[Long]("n_s"), r.getAs[Long]("thr"),
        r.getAs[Long]("n_kept")))
    // the smallest source's threshold is 2^32 → keeps everything
    val minRow = rows.minBy(_._1)
    minRow._2 shouldBe 4294967296L
    minRow._3 shouldBe minRow._1
    // thresholds decrease as source size grows (1/sqrt(n) scaling)
    val bySize = rows.sortBy(_._1).toSeq
    bySize.sliding(2).foreach {
      case Seq((n1, t1, _), (n2, t2, _)) =>
        if (n1 < n2) t1 should be > t2 else t1 shouldBe t2
      case _ => ()
    }
    // keep fraction is monotone non-increasing in source size on average:
    // the largest source keeps a strictly smaller fraction than the smallest
    val maxRow = rows.maxBy(_._1)
    if (maxRow._1 > minRow._1) {
      (maxRow._3.toDouble / maxRow._1) should be < 1.0
    }
  }

  test("llm_dedup_incremental: bloom prefilter finds exactly the true dups") {
    val got = LlmIngest.queries("llm_dedup_incremental")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("h", F.md5(F.substring(F.col("text"), 1, 60)))
    val corpus = d.filter(F.col("doc_id") % 2 === 0).select("h").distinct()
    val expect = d.filter(F.col("doc_id") % 2 === 1)
      .join(corpus, Seq("h"), "left_semi")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    got shouldBe expect
  }
}
