package graft.operators

import java.nio.file.Files

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
    val frag = Files.createTempDirectory("graft_compact_frag").toString
    val out = Files.createTempDirectory("graft_compact_out").toString
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

  test("an already-compact table stays at one file") {
    val in = Files.createTempDirectory("graft_compact_one_in").toString
    val out = Files.createTempDirectory("graft_compact_one_out").toString
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(in)
    Compact.compact(spark, in, out, 32L * 1024 * 1024) shouldBe 1
    Compact.dataFiles(out) shouldBe 1
    spark.read.parquet(out).count() shouldBe 100
  }
}
