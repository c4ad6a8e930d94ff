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
}
