package graft.sources

import java.io.File

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Snapshot isolation + time travel for graft-avro — the Iceberg
  * snapshot-log analogue. Pinned here:
  *
  *  - every state-changing commit (overwrite, append, equality delete,
  *    streaming epoch) mints a version in the delta-encoded
  *    `_graft_snapshots` journal;
  *  - `versionAsOf` reconstructs each historical state EXACTLY,
  *    including the delete sidecar in force at that version and files
  *    a later overwrite archived;
  *  - `timestampAsOf` resolves to the latest version at-or-before the
  *    instant;
  *  - schema travel: a pre-overwrite version keeps ITS schema;
  *  - the vacuum ([[AvroMaintenance.expireSnapshots]]) rebases the
  *    journal and deletes unreferenced archive files, after which
  *    expired versions fail loudly and kept ones still read;
  *  - error contracts: writes reject time-travel options, streaming
  *    reads reject them, unknown versions fail fast.
  */
class AvroSnapshotSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp(): String = graft.operators.Catalog.tempDir("graft_snap")

  private def writeRange(dir: String, lo: Int, hi: Int,
      mode: String): Unit =
    spark.range(lo, hi).toDF("k")
      .withColumn("grp", (F.col("k") % 5).cast("int"))
      .repartition(2)
      .write.format("graft-avro").mode(mode).save(dir)

  private def readAt(dir: String, v: Long) =
    spark.read.format("graft-avro").option("versionAsOf", v).load(dir)

  private def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("k").collect().map(_.getLong(0)).toSet

  test("legacy 5-field journal lines parse; upgraded lines mix in") {
    // a pre-r16 journal has no posdel column: those lines read as
    // "carried" (None on all-legacy journals), and a NEW commit appends
    // a 6-field line next to them — mixed journals read forever
    val dir = tmp()
    writeRange(dir, 0, 10, "overwrite") // v1 (6-field, posCol "-")
    val jf = AvroFileSource.snapshotsFile(new File(dir))
    // strip v1's line back to the legacy 5-field form
    val line = new String(
      java.nio.file.Files.readAllBytes(jf.toPath), "UTF-8").trim
    val legacy = line.split('\t').take(5).mkString("\t")
    java.nio.file.Files.write(jf.toPath, (legacy + "\n").getBytes("UTF-8"))
    AvroFileSource.readSnapshots(new File(dir)).last.posdels shouldBe None
    keys(readAt(dir, 1)) shouldBe (0L until 10L).toSet
    // a new commit upgrades the journal in place; history still reads
    writeRange(dir, 10, 15, "append") // v2 (6-field)
    keys(readAt(dir, 1)) shouldBe (0L until 10L).toSet
    keys(readAt(dir, 2)) shouldBe (0L until 15L).toSet
    // and posdel journaling works from here on
    val d = new File(dir)
    val rel = d.getAbsoluteFile.toPath.relativize(
      AvroFileSource.listLive(d).head._1.getAbsoluteFile.toPath).toString
    AvroMaintenance.deleteAtPositions(dir, rel, Seq(0L)) // v3
    AvroFileSource.readSnapshots(d).last.posdels should not be None
    readAt(dir, 3).count() shouldBe 14L
    readAt(dir, 2).count() shouldBe 15L
  }

  test("overwrite/append/delete each mint a version; versionAsOf replays them") {
    val dir = tmp()
    writeRange(dir, 0, 10, "overwrite")                       // v1
    writeRange(dir, 10, 20, "append")                         // v2
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(3L, 13L)) // v3
    writeRange(dir, 100, 105, "overwrite")                    // v4

    val snaps = AvroFileSource.readSnapshots(new File(dir))
    snaps.map(_.version) shouldBe Seq(1L, 2L, 3L, 4L)
    snaps.map(_.kind) shouldBe Seq("overwrite", "append", "delete", "overwrite")
    // the delete version changed no files, only the sidecar
    snaps(2).files.toSet shouldBe snaps(1).files.toSet
    snaps(2).deletes.isDefined shouldBe true
    snaps(3).deletes shouldBe None // overwrite clears deletes

    keys(readAt(dir, 1)) shouldBe (0L until 10L).toSet
    keys(readAt(dir, 2)) shouldBe (0L until 20L).toSet
    keys(readAt(dir, 3)) shouldBe (0L until 20L).toSet - 3L - 13L
    keys(readAt(dir, 4)) shouldBe (100L until 105L).toSet
    // the current read IS the latest version
    keys(spark.read.format("graft-avro").load(dir)) shouldBe
      (100L until 105L).toSet
  }

  test("overwrite archives replaced files; the journal stays delta-sized") {
    val dir = tmp()
    writeRange(dir, 0, 10, "overwrite")
    val firstGen = AvroFileSource.listAvro(new File(dir)).map(_.getName).toSet
    writeRange(dir, 50, 60, "overwrite")
    val arch = AvroFileSource.archiveDir(new File(dir))
    arch.isDirectory shouldBe true
    val archived = Option(arch.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).map(_.getName).toSet
    archived shouldBe firstGen
    // live listing never sees the archive
    AvroFileSource.listAvro(new File(dir))
      .map(_.getName).toSet.intersect(firstGen) shouldBe empty
    // delta encoding: journal bytes ~ O(file churn), two small lines
    val lines = scala.io.Source.fromFile(
      AvroFileSource.snapshotsFile(new File(dir)), "UTF-8")
      .getLines().toList
    lines should have length 2
  }

  test("timestampAsOf resolves to the latest version at or before the instant") {
    val dir = tmp()
    writeRange(dir, 0, 5, "overwrite")
    writeRange(dir, 5, 10, "append")
    val snaps = AvroFileSource.readSnapshots(new File(dir))
    keys(spark.read.format("graft-avro")
      .option("timestampAsOf", snaps.head.millis).load(dir)) shouldBe
      (0L until 5L).toSet
    keys(spark.read.format("graft-avro")
      .option("timestampAsOf", snaps.last.millis + 1000).load(dir)) shouldBe
      (0L until 10L).toSet
    val err = intercept[IllegalArgumentException] {
      spark.read.format("graft-avro")
        .option("timestampAsOf", snaps.head.millis - 1000).load(dir)
    }
    err.getMessage should include("no snapshot at or before")
    intercept[IllegalArgumentException] {
      spark.read.format("graft-avro").option("versionAsOf", 1L)
        .option("timestampAsOf", snaps.head.millis).load(dir)
    }.getMessage should include("at most one")
  }

  test("a pre-overwrite version keeps its own schema") {
    val dir = tmp()
    spark.range(0, 5).toDF("k")
      .withColumn("old_col", F.lit("x"))
      .write.format("graft-avro").mode("overwrite").save(dir)
    spark.range(0, 5).toDF("k")
      .withColumn("new_col", F.lit(7).cast("int"))
      .write.format("graft-avro").mode("overwrite").save(dir)
    readAt(dir, 1).schema.fieldNames.toSeq shouldBe Seq("k", "old_col")
    readAt(dir, 2).schema.fieldNames.toSeq shouldBe Seq("k", "new_col")
    spark.read.format("graft-avro").load(dir)
      .schema.fieldNames.toSeq shouldBe Seq("k", "new_col")
  }

  test("expireSnapshots rebases the journal and vacuums the archive") {
    val dir = tmp()
    writeRange(dir, 0, 10, "overwrite")  // v1
    writeRange(dir, 10, 15, "overwrite") // v2 (archives v1 files)
    writeRange(dir, 20, 30, "overwrite") // v3 (archives v2 files)
    val removed = AvroMaintenance.expireSnapshots(dir, keepLast = 2)
    removed should be > 0 // v1's files referenced by no kept snapshot
    val snaps = AvroFileSource.readSnapshots(new File(dir))
    snaps.map(_.version) shouldBe Seq(2L, 3L)
    // kept historical version still reads (its files remain archived)
    keys(readAt(dir, 2)) shouldBe (10L until 15L).toSet
    keys(readAt(dir, 3)) shouldBe (20L until 30L).toSet
    // expired version fails fast with a helpful range
    val err = intercept[IllegalArgumentException] { readAt(dir, 1) }
    err.getMessage should include("no snapshot version 1")
    // idempotent when nothing to drop
    AvroMaintenance.expireSnapshots(dir, keepLast = 2) shouldBe 0
  }

  test("time-based retention expires by commit timestamp, pins current + tags") {
    val dir = tmp()
    writeRange(dir, 0, 10, "overwrite")  // v1
    writeRange(dir, 10, 15, "overwrite") // v2
    Thread.sleep(60)
    val cutoff = System.currentTimeMillis()
    Thread.sleep(60)
    writeRange(dir, 20, 30, "overwrite") // v3 (after the cutoff)
    // pin v1 with a tag: time-based expiry must keep it
    AvroMaintenance.tag(dir, "pin1", 1L)
    AvroMaintenance.expireSnapshotsOlderThan(dir, cutoff)
    val snaps = AvroFileSource.readSnapshots(new File(dir))
    snaps.map(_.version) shouldBe Seq(1L, 3L) // v2 expired, v1 tagged
    keys(readAt(dir, 1)) shouldBe (0L until 10L).toSet
    keys(readAt(dir, 3)) shouldBe (20L until 30L).toSet
    intercept[IllegalArgumentException] { readAt(dir, 2) }
    // with the tag dropped, everything before the cutoff goes — but the
    // CURRENT version always survives, even if it predates the cutoff
    AvroMaintenance.dropTag(dir, "pin1")
    AvroMaintenance.expireSnapshotsOlderThan(dir,
      System.currentTimeMillis() + 3600 * 1000L)
    AvroFileSource.readSnapshots(new File(dir)).map(_.version) shouldBe
      Seq(3L)
    keys(spark.read.format("graft-avro").load(dir)) shouldBe
      (20L until 30L).toSet
  }

  test("vacuum to a single version empties the archive entirely") {
    val dir = tmp()
    writeRange(dir, 0, 10, "overwrite")
    writeRange(dir, 10, 15, "overwrite")
    AvroMaintenance.expireSnapshots(dir, keepLast = 1)
    AvroFileSource.archiveDir(new File(dir)).exists() shouldBe false
    keys(spark.read.format("graft-avro").load(dir)) shouldBe
      (10L until 15L).toSet
  }

  test("time travel rejects writes, streaming reads, and unknown versions") {
    val dir = tmp()
    writeRange(dir, 0, 5, "overwrite")
    intercept[IllegalArgumentException] {
      spark.range(0, 3).toDF("k")
        .write.format("graft-avro").option("versionAsOf", 1L)
        .mode("append").save(dir)
    }.getMessage should include("read option")
    intercept[IllegalArgumentException] {
      readAt(dir, 99).collect()
    }.getMessage should include("no snapshot version 99")
    val stream = spark.readStream.format("graft-avro")
      .schema(spark.read.format("graft-avro").load(dir).schema)
      .option("versionAsOf", 1L).load(dir)
    val ex = intercept[Exception] {
      stream.writeStream.format("noop")
        .option("checkpointLocation", tmp()).start().processAllAvailable()
    }
    ex.getMessage should include("batch-only")
  }

  test("time-travel scans disable metadata aggregates and zone pruning") {
    val dir = tmp()
    spark.range(0, 100).toDF("k")
      .withColumn("grp", (F.col("k") % 5).cast("int"))
      .coalesce(1)
      .write.format("graft-avro").option("sortedBy", "k")
        .mode("overwrite").save(dir)
    writeRange(dir, 100, 200, "overwrite")
    // v1 count must come from real rows (the CURRENT block counts and
    // manifests describe v2) — and still be correct
    val v1 = readAt(dir, 1)
    v1.count() shouldBe 100
    v1.agg(F.min("k"), F.max("k")).collect().head.toSeq shouldBe Seq(0L, 99L)
    // filters still apply (residually) on historical reads
    keys(v1.filter(F.col("k") < 10)) shouldBe (0L until 10L).toSet
  }

  test("partitioned tables travel with partition values intact") {
    val dir = tmp()
    spark.range(0, 20).toDF("k")
      .withColumn("grp", (F.col("k") % 2).cast("int"))
      .write.format("graft-avro").option("partitionBy", "grp")
        .mode("overwrite").save(dir)
    spark.range(100, 110).toDF("k")
      .withColumn("grp", (F.col("k") % 2).cast("int"))
      .write.format("graft-avro").option("partitionBy", "grp")
        .mode("overwrite").save(dir)
    val v1 = readAt(dir, 1)
    keys(v1.filter(F.col("grp") === 1)) shouldBe
      (0L until 20L).filter(_ % 2 == 1).toSet
    keys(v1) shouldBe (0L until 20L).toSet
  }

  test("incremental reads return exactly the appended rows; non-append ranges fail") {
    val dir = tmp()
    writeRange(dir, 0, 10, "overwrite") // v1
    writeRange(dir, 10, 15, "append")   // v2
    writeRange(dir, 15, 25, "append")   // v3
    def inc(opts: (String, String)*) = {
      var r = spark.read.format("graft-avro")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load(dir)
    }
    keys(inc("fromVersion" -> "1")) shouldBe (10L until 25L).toSet
    keys(inc("fromVersion" -> "2", "toVersion" -> "3")) shouldBe
      (15L until 25L).toSet
    keys(inc("fromVersion" -> "0", "toVersion" -> "1")) shouldBe
      (0L until 10L).toSet
    // a delete inside the range breaks append-only soundness
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(12L)) // v4
    intercept[IllegalArgumentException] {
      inc("fromVersion" -> "3").collect()
    }.getMessage should include("not append-only")
    // ...but a range ending before it still reads
    keys(inc("fromVersion" -> "1", "toVersion" -> "3")) shouldBe
      (10L until 25L).toSet
    // an overwrite inside the range likewise fails
    writeRange(dir, 100, 105, "overwrite") // v5
    intercept[IllegalArgumentException] {
      inc("fromVersion" -> "2").collect()
    }.getMessage should include("not append-only")
    intercept[IllegalArgumentException] {
      inc("toVersion" -> "2").collect()
    }.getMessage should include("requires fromVersion")
    intercept[IllegalArgumentException] {
      inc("fromVersion" -> "1", "versionAsOf" -> "2").collect()
    }.getMessage should include("exclusive")
  }

  test("tags name versions, pin them through the vacuum, and drop cleanly") {
    val dir = tmp()
    writeRange(dir, 0, 10, "overwrite")  // v1
    writeRange(dir, 10, 15, "overwrite") // v2
    writeRange(dir, 20, 30, "overwrite") // v3
    writeRange(dir, 40, 45, "overwrite") // v4
    AvroMaintenance.tag(dir, "baseline", 1L)
    // tagAsOf reads the tagged version exactly
    keys(spark.read.format("graft-avro").option("tagAsOf", "baseline")
      .load(dir)) shouldBe (0L until 10L).toSet
    // the vacuum keeps last-2 AND the pinned v1; v2 expires
    AvroMaintenance.expireSnapshots(dir, keepLast = 2)
    val snaps = AvroFileSource.readSnapshots(new File(dir))
    snaps.map(_.version) shouldBe Seq(1L, 3L, 4L) // gap at 2 is legal
    keys(spark.read.format("graft-avro").option("tagAsOf", "baseline")
      .load(dir)) shouldBe (0L until 10L).toSet
    keys(readAt(dir, 3)) shouldBe (20L until 30L).toSet
    intercept[IllegalArgumentException] { readAt(dir, 2) }
    // errors: unknown tag, tag of unknown version, double option
    intercept[IllegalArgumentException] {
      spark.read.format("graft-avro").option("tagAsOf", "nope").load(dir)
    }.getMessage should include("no tag 'nope'")
    intercept[IllegalArgumentException] {
      AvroMaintenance.tag(dir, "bad", 99L)
    }.getMessage should include("unknown version")
    intercept[IllegalArgumentException] {
      spark.read.format("graft-avro").option("tagAsOf", "baseline")
        .option("versionAsOf", 3L).load(dir)
    }.getMessage should include("at most one")
    // dropping the tag releases the pin: the next vacuum expires v1
    AvroMaintenance.dropTag(dir, "baseline")
    AvroMaintenance.expireSnapshots(dir, keepLast = 2)
    AvroFileSource.readSnapshots(new File(dir))
      .map(_.version) shouldBe Seq(3L, 4L)
    intercept[IllegalArgumentException] { readAt(dir, 1) }
  }

  test("streaming epochs snapshot; idle epochs mint no version") {
    val dir = tmp()
    val src = tmp()
    spark.range(0, 10).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(src)
    val q = spark.readStream.format("graft-avro")
      .schema(spark.read.format("graft-avro").load(src).schema)
      .option("maxFilesPerTrigger", "1").load(src)
      .writeStream.format("graft-avro")
      .option("checkpointLocation", tmp())
      .option("path", dir).start()
    try q.processAllAvailable() finally q.stop()
    val snaps = AvroFileSource.readSnapshots(new File(dir))
    snaps should not be empty
    // every journaled version reconstructs a readable prefix state
    keys(readAt(dir, snaps.last.version)) shouldBe (0L until 10L).toSet
    // idle epochs (processAllAvailable ran past the data) minted nothing:
    // every version's file set differs from its predecessor's
    snaps.sliding(2).foreach {
      case Seq(a, b) => b.files.toSet should not be a.files.toSet
      case _ => ()
    }
  }
}
