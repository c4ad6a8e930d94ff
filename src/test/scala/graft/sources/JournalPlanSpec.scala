package graft.sources

import java.io.File

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Scan planning is served from the `_graft_snapshots` journal, not a
  * recursive directory walk: at object-store scale the walk is the
  * planning bottleneck (one listing call per directory per scan), while
  * the journal is a single sidecar read that every commit path already
  * maintains under the table lock. The walk survives only as the
  * legacy/unjournaled fallback.
  */
class JournalPlanSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp(): String = graft.operators.Catalog.tempDir("graft_jplan")

  test("journaled table plans from the journal: smuggled file is invisible") {
    val dir = tmp()
    spark.range(0, 20).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    // a second real commit so the journal is delta-encoded, not trivial
    spark.range(100, 110).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)
    spark.read.format("graft-avro").load(dir).count() shouldBe 30L

    // smuggle a copy of a live data file in OUTSIDE any commit: a walk
    // would double-count it; the journal doesn't know it
    val d = new File(dir)
    val donor = AvroFileSource.listAvro(d).head
    val smuggled = new File(d, "zz_smuggled_copy.avro")
    java.nio.file.Files.copy(donor.toPath, smuggled.toPath)
    spark.read.format("graft-avro").load(dir).count() shouldBe 30L

    // the next real commit journals the directory state (its walk finds
    // the smuggled file) — from then on it is a journaled, visible file
    spark.range(200, 205).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)
    val donorRows = {
      val r = new org.apache.avro.file.DataFileReader[
        org.apache.avro.generic.GenericRecord](donor,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try { var n = 0L; while (r.hasNext) { r.next(); n += 1 }; n }
      finally r.close()
    }
    spark.read.format("graft-avro").load(dir).count() shouldBe
      (30L + 5L + donorRows)
  }

  test("remove_orphans reclaims smuggled files; journaled files survive") {
    val dir = tmp()
    spark.range(0, 20).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)   // v1
    spark.range(20, 30).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)      // v2
    val d = new File(dir)
    val donor = AvroFileSource.listAvro(d).head
    java.nio.file.Files.copy(donor.toPath,
      new File(d, "zz_orphan.avro").toPath)
    AvroFileSource.listAvro(d).size shouldBe 3
    AvroMaintenance.removeOrphans(dir) shouldBe 1
    AvroFileSource.listAvro(d).size shouldBe 2
    spark.read.format("graft-avro").load(dir).count() shouldBe 30L
    // idempotent; and an unjournaled dir refuses loudly
    AvroMaintenance.removeOrphans(dir) shouldBe 0
    AvroFileSource.snapshotsFile(d).delete() shouldBe true
    an[IllegalArgumentException] should be thrownBy
      AvroMaintenance.removeOrphans(dir)
  }

  test("add_files adopts smuggled files as a new version") {
    val dir = tmp()
    spark.range(0, 20).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    val d = new File(dir)
    val donor = AvroFileSource.listAvro(d).head
    java.nio.file.Files.copy(donor.toPath,
      new File(d, "zz_import.avro").toPath)
    // invisible until adopted
    spark.read.format("graft-avro").load(dir).count() shouldBe 20L
    AvroMaintenance.addFiles(dir) shouldBe 1
    spark.read.format("graft-avro").load(dir).count() shouldBe 40L
    // versioned: pre-adoption state still travels
    spark.read.format("graft-avro").option("versionAsOf", 1)
      .load(dir).count() shouldBe 20L
    // idempotent no-op mints no version
    val vs = AvroFileSource.readSnapshots(d).map(_.version)
    AvroMaintenance.addFiles(dir) shouldBe 0
    AvroFileSource.readSnapshots(d).map(_.version) shouldBe vs
  }

  test("unjournaled directory falls back to the walk") {
    val dir = tmp()
    spark.range(0, 15).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    val d = new File(dir)
    // simulate a legacy table: journal gone, data files remain
    AvroFileSource.snapshotsFile(d).delete() shouldBe true
    spark.read.format("graft-avro").load(dir).count() shouldBe 15L
    AvroFileSource.listLive(d).map(_._1.getName) shouldBe
      AvroFileSource.listPartitioned(d).map(_._1.getName)
  }

  test("journal-served listing preserves partition values for pruning") {
    val dir = tmp()
    spark.range(0, 40).toDF("k").withColumn("p", F.col("k") % 4)
      .write.format("graft-avro").option("partitionBy", "p")
      .mode("overwrite").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
      .filter(F.col("p") === 2)
    df.count() shouldBe 10L
    // partition pruning still happens: only p=2 files planned
    val listed = AvroFileSource.listLive(new File(dir))
    listed.foreach { case (_, vals) => vals.keySet should contain("p") }
    listed.count(_._2("p") == "2") should be > 0
  }

  test("time travel and the journal-served live path agree after churn") {
    val dir = tmp()
    spark.range(0, 10).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)   // v1
    spark.range(10, 20).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)      // v2
    spark.range(0, 5).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)   // v3
    spark.read.format("graft-avro").option("versionAsOf", 2)
      .load(dir).count() shouldBe 20L
    spark.read.format("graft-avro").load(dir).count() shouldBe 5L
    val d = new File(dir)
    val base = d.getAbsoluteFile.toPath
    val live = AvroFileSource.listAvro(d)
      .map(f => base.relativize(f.getAbsoluteFile.toPath).toString).toSet
    AvroFileSource.listLive(d).map(p =>
      base.relativize(p._1.getAbsoluteFile.toPath).toString).toSet shouldBe
      live
  }
}
