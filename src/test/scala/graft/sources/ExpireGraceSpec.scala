package graft.sources

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Expire-vs-long-scan retention grace: a scan pins its file list at
  * planInputPartitions, so a vacuum landing mid-scan could yank an
  * archived file out from under a time-travel read. With `graceMs`, the
  * journal rebases immediately (the version is gone for NEW reads) but
  * unreferenced archive files stay on disk until `graceMs` past their
  * ARCHIVE time (mtime stamped at the archive move), and a later expire
  * call reclaims the aged survivors even when it drops no versions
  * itself.
  */
class ExpireGraceSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp(): String = graft.operators.Catalog.tempDir("graft_grace")

  test("a pinned scan survives a concurrent expire under grace; aged " +
      "survivors reclaim on a later call") {
    val dir = tmp()
    spark.range(0, 1000).toDF("k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    spark.range(1000, 2000).toDF("k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v2
    // the long-running scan: partitions (and archive-resolved file
    // paths) pin NOW, before the vacuum
    val scan = spark.read.format("graft-avro")
      .option("versionAsOf", 1).load(dir)
    val rdd = scan.queryExecution.toRdd
    rdd.partitions.length should be > 0
    // vacuum with a generous grace: the journal rebases, the files wait
    val removed = AvroMaintenance.expireSnapshots(dir, keepLast = 1,
      graceMs = 3600L * 1000)
    removed shouldBe 0
    // new time-travel reads of v1 are refused (the version is expired)…
    intercept[Exception] {
      spark.read.format("graft-avro").option("versionAsOf", 1)
        .load(dir).count()
    }
    // …but the pinned scan drains its full snapshot
    rdd.count() shouldBe 1000L
    // grace elapsed (backdate the archive stamps — the durable
    // `_graft_archived` sidecar is authoritative since r18, with mtime
    // only a legacy fallback): a later expire that drops NO versions
    // still reclaims the aged survivors
    val aged = System.currentTimeMillis() - 7200L * 1000
    AvroFileSource.writeArchivedStamps(new File(dir),
      AvroFileSource.readArchivedStamps(new File(dir))
        .map { case (rel, _) => rel -> aged })
    def backdate(f: File): Unit =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(backdate)
      else {
        f.setLastModified(aged)
        ()
      }
    backdate(new File(dir, "_graft_archive"))
    val removed2 = AvroMaintenance.expireSnapshots(dir, keepLast = 1,
      graceMs = 3600L * 1000)
    removed2 should be > 0
    new File(dir, "_graft_archive").isDirectory shouldBe false
    // the stamp sidecar pruned with its files
    AvroFileSource.readArchivedStamps(new File(dir)) shouldBe empty
    // the live table is untouched throughout
    spark.read.format("graft-avro").load(dir).count() shouldBe 1000L
  }

  test("a stamp append AFTER a sweep rewrite keeps both entries " +
      "(trailing-newline regression)") {
    val dir = new File(tmp())
    // sweep-shaped rewrite...
    AvroFileSource.writeArchivedStamps(dir, Map("a.avro" -> 100L))
    // ...then an archive move appends: the rewrite must have left a
    // trailing newline or the two lines concatenate and BOTH drop
    val arch = new File(dir, "_graft_archive")
    arch.mkdirs()
    val f = new File(arch, "b.avro")
    java.nio.file.Files.write(f.toPath, Array[Byte](1))
    AvroFileSource.stampArchived(f)
    val stamps = AvroFileSource.readArchivedStamps(dir)
    stamps.get("a.avro") shouldBe Some(100L)
    stamps.contains("b.avro") shouldBe true
  }

  test("a legacy archive (no stamp sidecar) still ages by mtime") {
    val dir = tmp()
    spark.range(0, 100).toDF("k")
      .write.format("graft-avro").mode("overwrite").save(dir)
    spark.range(100, 300).toDF("k")
      .write.format("graft-avro").mode("overwrite").save(dir)
    // simulate a pre-r18 archive: stamps never written
    AvroFileSource.archivedStampFile(new File(dir)).delete()
    AvroMaintenance.expireSnapshots(dir, keepLast = 1,
      graceMs = 3600L * 1000) shouldBe 0 // young by mtime: survives
    def backdate(f: File): Unit =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(backdate)
      else { f.setLastModified(System.currentTimeMillis() - 7200000L); () }
    backdate(new File(dir, "_graft_archive"))
    AvroMaintenance.expireSnapshots(dir, keepLast = 1,
      graceMs = 3600L * 1000) should be > 0
  }

  test("zero grace (the default) reclaims immediately — prior behavior") {
    val dir = tmp()
    spark.range(0, 100).toDF("k")
      .write.format("graft-avro").mode("overwrite").save(dir)
    spark.range(100, 300).toDF("k")
      .write.format("graft-avro").mode("overwrite").save(dir)
    AvroMaintenance.expireSnapshots(dir, keepLast = 1) should be > 0
    new File(dir, "_graft_archive").isDirectory shouldBe false
  }
}
