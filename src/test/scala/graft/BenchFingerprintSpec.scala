package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

/** The plan fingerprint must be STABLE across re-planning (else every
  * round reads as "regression") and SENSITIVE to plan changes (else a
  * real regression reads as env-drift). Id churn — new expression ids on
  * every analysis, fresh temp dirs — is exactly what the normalization
  * strips.
  */
class BenchFingerprintSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("same query fingerprints identically across independent plannings") {
    def q() = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(F.col("l_quantity") > 10)
      .groupBy("l_returnflag").agg(F.sum("l_quantity").as("s"))
    // separate analyses allocate different expression ids; a temp-dir
    // write/read cycle changes paths — neither may move the fingerprint
    val a = Bench.fingerprint(q(), dir)
    val b = Bench.fingerprint(q(), dir)
    assert(a === b)
    assert(a.matches("[0-9a-f]{16}"))
  }

  test("tempdir churn does not move the fingerprint; a plan change does") {
    def via(tmp: String) = {
      spark.range(0, 100).toDF("k")
        .write.mode("overwrite").parquet(tmp)
      spark.read.parquet(tmp).filter(F.col("k") > 50)
    }
    val t1 = operators.Catalog.tempDir("graft_fp_a")
    val t2 = operators.Catalog.tempDir("graft_fp_b")
    assert(Bench.fingerprint(via(t1), dir) === Bench.fingerprint(via(t2), dir))
    // a genuinely different plan (extra aggregate) must differ
    val changed = spark.read.parquet(t1).filter(F.col("k") > 50)
      .groupBy().count()
    assert(Bench.fingerprint(via(t1), dir) !== Bench.fingerprint(changed, dir))
  }

  test("real gates fingerprint deterministically (incl. a checkpointing one)") {
    for (name <- Seq("q1_agg", "llm_dedup_exact")) {
      val a = Bench.fingerprint(SparkEntry.queries(name)(spark, dir), dir)
      val b = Bench.fingerprint(SparkEntry.queries(name)(spark, dir), dir)
      assert(a === b, name)
    }
  }

  // ------------------------------------------------------- r19: q_profile
  // RewriteDistinctAggregates orders distinct groups by expression-id
  // hash, so two same-code runs permute the gid each group gets, the
  // Expand projection rows, and every downstream attribute list — the
  // ONLY gate of 324 whose fingerprint moved across same-code r18 runs,
  // firing a false "regression" flag. These fixtures are (shortened)
  // REAL lines from the two r18 artifacts' normalized explains.

  // real shape: the gid-0 row carries the CASE WHENs and nulls for every
  // distinct column; each distinct group's row carries ITS column + its
  // gid ordinal — the run permutes which ordinal each column gets and
  // every downstream attribute list
  private val runA = Seq(
    "Arguments: [[null, null, 0, CASE WHEN isnull(o_orderkey#L) THEN 1 ELSE 0 END], [null, o_custkey#L, 1, null], [o_orderkey#L, null, 2, null]], [o_custkey#L, o_orderkey#L, gid#]",
    "Keys []: [o_orderkey#L, o_custkey#L, gid#]",
    "Functions []: [partial_count(o_custkey#L) FILTER (WHERE (gid# = 1)), partial_count(o_orderkey#L) FILTER (WHERE (gid# = 2))]",
    "Arguments: hashpartitioning(o_orderkey#L, o_custkey#L, gid#, 32), ENSURE_REQUIREMENTS, [plan_id=]"
  ).mkString("\n")

  private val runB = Seq(
    "Arguments: [[null, null, 0, CASE WHEN isnull(o_orderkey#L) THEN 1 ELSE 0 END], [o_orderkey#L, null, 1, null], [null, o_custkey#L, 2, null]], [o_orderkey#L, o_custkey#L, gid#]",
    "Keys []: [o_custkey#L, o_orderkey#L, gid#]",
    "Functions []: [partial_count(o_orderkey#L) FILTER (WHERE (gid# = 1)), partial_count(o_custkey#L) FILTER (WHERE (gid# = 2))]",
    "Arguments: hashpartitioning(o_custkey#L, o_orderkey#L, gid#, 32), ENSURE_REQUIREMENTS, [plan_id=]"
  ).mkString("\n")

  test("distinct-rewrite gid/row permutations canonicalize identically") {
    assert(Bench.canonText(runA, dir) === Bench.canonText(runB, dir))
  }

  test("canonicalization stays SENSITIVE to element changes") {
    // same shape, one aggregate swapped for another — must differ
    val changed = runA.replace("partial_count(o_custkey#L)",
      "partial_max(o_custkey#L)")
    assert(Bench.canonText(runA, dir) !== Bench.canonText(changed, dir))
    // a filter literal outside the Expand/gid shapes is preserved
    val lit = "Condition: (l_quantity# > 10)"
    assert(Bench.canonText(lit, dir) !==
      Bench.canonText(lit.replace("10", "20"), dir))
  }

  test("sortBrackets: nested groups, parenthesized commas, stray parens") {
    assert(Bench.sortBrackets("[b, a]") === "[a, b]")
    assert(Bench.sortBrackets("[[z, y], [b, a]]") === "[[a, b], [y, z]]")
    assert(Bench.sortBrackets("[f(a, b), e(c)]") === "[e(c), f(a, b)]")
    // idempotent, empty-safe, stray-close-safe
    assert(Bench.sortBrackets("[]") === "[]")
    assert(Bench.sortBrackets("x) [b, a]") === "x) [a, b]")
    assert(Bench.sortBrackets(Bench.sortBrackets("[f(a, b), e(c)]")) ===
      Bench.sortBrackets("[f(a, b), e(c)]"))
  }

  test("lambda-variable counters normalize (HOF gates)") {
    // `lambda x_N#`: N is a global resolution counter — the r19 full-run
    // diff caught 10 HOF gates moving when the shuffled order changed
    // what planned first
    val a = Bench.fingerprint(
      SparkEntry.queries("proj_map_pick")(spark, dir), dir)
    // burn lambda ids: resolving unrelated HOFs bumps the counter
    spark.range(4).selectExpr(
      "transform(sequence(0, 3), x -> x + 1) as t",
      "filter(sequence(0, 5), y -> y > 2) as f")
      .queryExecution.optimizedPlan
    val b = Bench.fingerprint(
      SparkEntry.queries("proj_map_pick")(spark, dir), dir)
    assert(a === b)
    assert(Bench.canonText("lambda x_1#.key = lambda x_1#", dir) ===
      Bench.canonText("lambda x_9#.key = lambda x_9#", dir))
    // the variable NAME stays significant
    assert(Bench.canonText("lambda x_1#", dir) !==
      Bench.canonText("lambda y_1#", dir))
    // third counter class: common-subexpression-elimination aliases
    assert(Bench.canonText(
      "[(a# > 1) AS _common_expr_7#, (b# > 2) AS _common_expr_5#]", dir) ===
      Bench.canonText(
        "[(b# > 2) AS _common_expr_4#, (a# > 1) AS _common_expr_6#]", dir))
  }

  test("q_profile plans to the same fingerprint across re-plannings") {
    val a = Bench.fingerprint(SparkEntry.queries("q_profile")(spark, dir), dir)
    // burn expression ids between the two plannings: the distinct
    // groupBy hashes expression ids, so this is what historically
    // permuted the gid assignment
    spark.range(10).select((0 until 40).map(i => F.lit(i).as(s"c$i")): _*)
      .queryExecution.analyzed
    val b = Bench.fingerprint(SparkEntry.queries("q_profile")(spark, dir), dir)
    assert(a === b)
  }
}
