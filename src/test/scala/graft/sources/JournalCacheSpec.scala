package graft.sources

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Snapshot-journal parse cache: with planning journal-served, the
  * journal parse is the per-scan planning cost — repeated scans of an
  * unchanged table must serve snapshots and births from the
  * (lastModified, length)-keyed cache, and EVERY journal mutation
  * (append, rollback's rewrite, vacuum's rebase) must invalidate it.
  */
class JournalCacheSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp(): String = graft.operators.Catalog.tempDir("graft_jcache")

  test("repeated reads parse once; every mutation invalidates") {
    val dir = tmp()
    val d = new File(dir)
    spark.range(0, 10).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)   // v1

    val p0 = AvroFileSource.journalParses.get()
    val s1 = AvroFileSource.readSnapshots(d)
    val afterFirst = AvroFileSource.journalParses.get()
    // repeated reads and a full table scan plan: zero further parses
    AvroFileSource.readSnapshots(d) shouldBe s1
    AvroFileSource.readSnapshots(d) shouldBe s1
    spark.read.format("graft-avro").load(dir).count() shouldBe 10L
    AvroFileSource.journalParses.get() shouldBe afterFirst
    (afterFirst - p0) should be <= 2L // snapshots (+ births at most once)

    // an append commits a new version: the cache must refresh
    spark.range(10, 15).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)      // v2
    AvroFileSource.readSnapshots(d).last.version shouldBe 2L
    spark.read.format("graft-avro").load(dir).count() shouldBe 15L

    // rollback REWRITES journal state: stale serves would resurrect v2
    AvroMaintenance.rollbackTo(dir, 1L)
    spark.read.format("graft-avro").load(dir).count() shouldBe 10L
    AvroFileSource.readSnapshots(d).last.kind shouldBe "rollback"
  }

  test("vacuum's rebase invalidates births too") {
    val dir = tmp()
    val d = new File(dir)
    spark.range(0, 5).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)   // v1
    spark.range(5, 9).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)      // v2
    spark.range(9, 12).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)      // v3
    val b0 = AvroFileSource.fileBirths(d)
    b0.values.toSet shouldBe Set(0L, 2L, 3L) // first-line files birth 0
    AvroMaintenance.expireSnapshots(dir, 1)
    // rebase rewrote the journal with explicit @birth suffixes — the
    // cached births must refresh, preserving the original versions
    AvroFileSource.fileBirths(d) shouldBe b0
    spark.read.format("graft-avro").load(dir).count() shouldBe 12L
  }
}
