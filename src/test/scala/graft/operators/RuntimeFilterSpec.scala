package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Proves Spark's runtime row-level filtering (bloom-filter semi-join
  * pushdown) activates for the selective-dimension ⋈ fact shape this
  * engine's catalogs rely on: the optimizer builds a bloom filter from the
  * filtered dimension keys and applies it to the fact scan BEFORE the
  * shuffle, cutting the exchanged fact rows to candidates only. At 100 TB
  * this is the difference between shuffling the whole fact table and
  * shuffling the ~matching slice. (Thresholds are production-tuned for
  * 10 GB scans, so the test lowers them; the default-on conf is what ships.)
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("a selective dim join injects a bloom filter on the fact side") {
    val dir = graft.operators.Catalog.tempDir("graft_rtf")
    spark.range(20000)
      .select(F.col("id").as("fk"), (F.col("id") % 1000).as("k"),
        F.md5(F.col("id").cast("string")).as("pay"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(1000)
      .select(F.col("id").as("k"), (F.col("id") % 7).as("cat"))
      .write.mode("overwrite").parquet(s"$dir/dim")

    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // default-on switch, asserted rather than set:
      conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") shouldBe "true"

      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(F.col("cat") === 3)
      val joined = fact.join(dim, "k")
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") ||
        optimized.contains("BloomFilter"),
        s"expected an injected bloom filter in:\n$optimized")
      // and the result is still correct: 143 dim keys (k % 7 == 3 in
      // 0..999) × 20 fact rows per key
      joined.count() shouldBe 143L * 20L
      ()
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
