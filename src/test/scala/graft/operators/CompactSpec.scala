package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Specs for the size-targeted compaction primitive: the file count
  * collapses to the byte-budgeted target and the rewrite preserves the
  * row multiset exactly.
  */
class CompactSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val sf = "/root/testdata/sf0.001"

  test("compaction collapses a fragmented table to the byte budget") {
    val frag = Catalog.tempDir("graft_compact_frag")
    val out = Catalog.tempDir("graft_compact_out")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.repartition(32).write.mode("overwrite").parquet(frag)
    Compact.dataFiles(frag) shouldBe 32

    val target = 32L * 1024 * 1024
    val n = Compact.compact(spark, frag, out, target)
    val expected =
      math.max(1L, (Compact.listBytes(frag) + target - 1) / target).toInt
    n shouldBe expected
    Compact.dataFiles(out) shouldBe n
    n should be < 32

    // content-invisible: identical row multiset
    val before = docs.collect().map(_.toString).sorted
    val after = spark.read.parquet(out).collect().map(_.toString).sorted
    after shouldBe before
  }

  test("partitioned (subdirectory) layouts are listed recursively") {
    val in = Catalog.tempDir("graft_compact_part_in")
    val out = Catalog.tempDir("graft_compact_part_out")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.write.partitionBy("lang").mode("overwrite").parquet(in)
    // a non-recursive listing would see only lang=* dirs → 0 files/bytes
    Compact.dataFiles(in) should be > 0
    Compact.listBytes(in) should be > 0L
    val target = 32L * 1024 * 1024
    val n = Compact.compact(spark, in, out, target)
    n shouldBe math.max(1L,
      (Compact.listBytes(in) + target - 1) / target).toInt
    // content preserved (column order normalized: partitionBy moves the
    // partition column to the end of the read-back schema)
    val cols = docs.columns.sorted.toSeq
    val before = docs.select(cols.head, cols.tail: _*)
      .collect().map(_.toString).sorted
    val after = spark.read.parquet(out).select(cols.head, cols.tail: _*)
      .collect().map(_.toString).sorted
    after shouldBe before
  }

  test("an already-compact table stays at one file") {
    val in = Catalog.tempDir("graft_compact_one_in")
    val out = Catalog.tempDir("graft_compact_one_out")
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(in)
    Compact.compact(spark, in, out, 32L * 1024 * 1024) shouldBe 1
    Compact.dataFiles(out) shouldBe 1
    spark.read.parquet(out).count() shouldBe 100
  }
}
