package graft.sources

import java.io.File

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Row-level MERGE (upsert) and the versioned equality deletes it rides
  * on. The sequence-number rule — a delete stamped at version V applies
  * only to files BORN before V — is what lets an upsert re-insert a key
  * without the just-published delete killing the fresh row, and what
  * lets a plain append after a DELETE resurrect a key on purpose. Pinned
  * here: no-duplicate visibility, replace-vs-insert routing, re-insert
  * survival, legacy (unstamped) sidecar compatibility, idempotent
  * re-runs, time travel across a merge, and birth preservation through
  * the snapshot vacuum's journal rebase.
  */
class AvroMergeSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp(): String = graft.operators.Catalog.tempDir("graft_merge")

  private def base(dir: String, n: Int = 100): Unit =
    spark.range(0, n.toLong).toDF("k")
      .withColumn("v", F.lit("old"))
      .withColumn("amt", F.col("k") * 2)
      .repartition(4)
      .write.format("graft-avro").mode("overwrite").save(dir)

  private def updates(ks: Seq[Long], tag: String) = {
    import spark.implicits._
    ks.toDF("k")
      .withColumn("v", F.lit(tag))
      .withColumn("amt", F.col("k") * 100)
  }

  test("mergeInto replaces matched keys, inserts new ones, no duplicates") {
    val dir = tmp()
    base(dir)
    AvroMaintenance.mergeInto(spark, dir, updates(Seq(5L, 50L, 150L), "m1"), "k")
    val t = spark.read.format("graft-avro").load(dir)
    t.count() shouldBe 101 // 100 base, 2 replaced in place, 1 inserted
    t.select("k").distinct().count() shouldBe 101 // never a duplicate key
    t.filter(F.col("k") === 50).select("v", "amt").collect()
      .map(_.toSeq) shouldBe Array(Seq("m1", 5000L))
    t.filter(F.col("k") === 150).count() shouldBe 1 // pure insert
    t.filter(F.col("v") === "old").count() shouldBe 98
  }

  test("a key re-inserted after a DELETE survives (version-stamp rule)") {
    val dir = tmp()
    base(dir)
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(7L, 8L))
    spark.read.format("graft-avro").load(dir).count() shouldBe 98
    // plain append re-adds k=7: the stamped delete predates the file
    updates(Seq(7L), "back")
      .write.format("graft-avro").mode("append").save(dir)
    val t = spark.read.format("graft-avro").load(dir)
    t.filter(F.col("k") === 7).select("v").collect()
      .map(_.getString(0)) shouldBe Array("back")
    t.filter(F.col("k") === 8).count() shouldBe 0 // still deleted
    t.count() shouldBe 99
  }

  test("legacy unstamped sidecar lines apply to every file") {
    val dir = tmp()
    base(dir)
    updates(Seq(7L), "back")
      .write.format("graft-avro").mode("append").save(dir)
    // hand-written 3-field (pre-versioning) line: kills k=7 everywhere,
    // including in the file appended above
    java.nio.file.Files.write(new File(dir, "_graft_deletes").toPath,
      "k\tbigint\t7\n".getBytes("UTF-8"))
    val t = spark.read.format("graft-avro").load(dir)
    t.filter(F.col("k") === 7).count() shouldBe 0
    t.count() shouldBe 99
  }

  test("merge is idempotent under crash-and-rerun") {
    val dir = tmp()
    base(dir)
    val u = updates(Seq(3L, 200L), "m")
    AvroMaintenance.mergeInto(spark, dir, u, "k")
    // rerun (as after a crash between the delete and append halves): the
    // re-stamped delete kills the first run's rows, the append lands once
    AvroMaintenance.mergeInto(spark, dir, u, "k")
    val t = spark.read.format("graft-avro").load(dir)
    t.count() shouldBe 101
    t.filter(F.col("k").isin(3L, 200L)).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted shouldBe
      Array((3L, "m"), (200L, "m"))
  }

  test("time travel reconstructs pre-merge and mid-merge states") {
    val dir = tmp()
    base(dir, n = 10) // v1
    AvroMaintenance.mergeInto(spark, dir, updates(Seq(2L, 12L), "m"), "k") // v2+v3
    def at(v: Long) = spark.read.format("graft-avro")
      .option("versionAsOf", v).load(dir)
    at(1).count() shouldBe 10
    at(1).filter(F.col("v") === "m").count() shouldBe 0
    // v2 = the delete half: a consistent subset (base minus matched)
    at(2).count() shouldBe 9
    at(2).filter(F.col("k") === 2).count() shouldBe 0
    at(3).count() shouldBe 11
    at(3).filter(F.col("v") === "m").count() shouldBe 2
  }

  test("vacuum preserves birth versions, so merges survive the rebase") {
    val dir = tmp()
    base(dir, n = 20)                                        // v1
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(5L, 6L)) // v2
    updates(Seq(5L), "back")
      .write.format("graft-avro").mode("append").save(dir)   // v3
    AvroMaintenance.expireSnapshots(dir, keepLast = 1)
    // after the rebase the journal's only entry is a full file set; the
    // @birth suffixes must keep the old files deletable (stamp 2 > birth
    // 0) and the re-insert alive (stamp 2 < birth 3)
    val t = spark.read.format("graft-avro").load(dir)
    t.filter(F.col("k") === 5).select("v").collect()
      .map(_.getString(0)) shouldBe Array("back")
    t.filter(F.col("k") === 6).count() shouldBe 0
    t.count() shouldBe 19
  }

  test("mergeInto refuses an over-scale key batch with a routing error") {
    val dir = tmp()
    base(dir)
    val ex = intercept[IllegalArgumentException] {
      AvroMaintenance.mergeInto(spark, dir,
        updates((0L until 20L).toSeq, "big"), "k", maxKeys = 10)
    }
    ex.getMessage should include("MERGE INTO")
    // nothing was published: no delete sidecar, no appended rows
    AvroFileSource.deleteFile(new File(dir)).isFile shouldBe false
    spark.read.format("graft-avro").load(dir).count() shouldBe 100
  }

  test("mergeInto rejects a mismatched update schema") {
    val dir = tmp()
    base(dir)
    import spark.implicits._
    val bad = Seq(1L).toDF("k").withColumn("extra", F.lit(1))
    val ex = intercept[IllegalArgumentException] {
      AvroMaintenance.mergeInto(spark, dir, bad, "k")
    }
    ex.getMessage should include("merge schema mismatch")
  }
}
