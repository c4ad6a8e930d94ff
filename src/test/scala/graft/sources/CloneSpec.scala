package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Deep clone ([[AvroMaintenance.cloneTo]] / `CALL system.clone`):
  * byte-copy the current snapshot plus every file-keyed stats manifest
  * into a fresh table with an independent single-version history.
  * Pinned: content equality, carried metadata aggregates (zero-decode
  * on the clone), history independence in both directions, bucket-spec
  * stamp rewrite, and the loud refusals (pending deletes, renames,
  * non-empty targets).
  */
class CloneSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp() = graft.operators.Catalog.tempDir("graft_clone")

  test("clone carries data + stats; histories diverge independently") {
    val src = tmp()
    val dst = tmp() + "/t"
    spark.range(0, 500).selectExpr("id AS k", "cast(id % 7 as long) AS g")
      .write.format("graft-avro").mode("overwrite").save(src) // v1
    spark.range(500, 800).selectExpr("id AS k", "cast(id % 7 as long) AS g")
      .write.format("graft-avro").mode("append").save(src) // v2
    val n = AvroMaintenance.cloneTo(src, dst)
    n should be > 0
    // content identical
    val a = spark.read.format("graft-avro").load(src)
    val b = spark.read.format("graft-avro").load(dst)
    b.count() shouldBe 800L
    b.agg(F.sum("k")).head().getLong(0) shouldBe
      a.agg(F.sum("k")).head().getLong(0)
    // stats manifests carried: the clone's metadata aggregate serves
    // with zero decode, exactly like the source's
    val agg = b.agg(F.sum("k").as("s"), F.min("k"), F.max("k"),
      F.count(F.lit(1)))
    agg.queryExecution.executedPlan.toString should
      include("PushedAggregation")
    // fresh single-version history
    AvroFileSource.readSnapshots(new File(dst)).map(_.version) shouldBe
      Seq(1L)
    // divergence: a write to the clone never reaches the source...
    spark.range(1000, 1010).selectExpr("id AS k", "id % 7 AS g")
      .write.format("graft-avro").mode("append").save(dst)
    a.count() shouldBe 800L
    spark.read.format("graft-avro").load(dst).count() shouldBe 810L
    // ...and vice versa
    AvroMaintenance.deleteWhere(spark, src, "k", Seq(5L))
    spark.read.format("graft-avro").load(src).count() shouldBe 799L
    spark.read.format("graft-avro").load(dst).count() shouldBe 810L
  }

  test("bucket specs clone with version-1 stamps; sorted claims carry") {
    val src = tmp()
    val dst = tmp() + "/t"
    spark.range(0, 400).toDF("k")
      .withColumn("pay", F.md5(F.col("k").cast("string")))
      .write.format("graft-avro").option("bucketBy", "k:8")
      .mode("overwrite").save(src)
    AvroMaintenance.cloneTo(src, dst)
    AvroFileSource.readBucketSpecStamped(new File(dst)) shouldBe
      Seq(("k", 8, 1L))
    // bucket pruning works on the clone (live and as-of v1)
    spark.read.format("graft-avro").load(dst)
      .filter(F.col("k") === 7L).count() shouldBe 1L
    val srt = tmp()
    val srtC = tmp() + "/t"
    spark.range(0, 300).toDF("k").orderBy("k").coalesce(1)
      .write.format("graft-avro").option("sortedBy", "k")
      .mode("overwrite").save(srt)
    AvroMaintenance.cloneTo(srt, srtC)
    AvroFileSource.sortedColumnOf(new File(srtC)) shouldBe Some("k")
  }

  test("refusals: pending deletes, renames, non-empty target") {
    val src = tmp()
    spark.range(0, 10).toDF("k")
      .write.format("graft-avro").mode("overwrite").save(src)
    AvroMaintenance.deleteWhere(spark, src, "k", Seq(1L))
    intercept[IllegalArgumentException] {
      AvroMaintenance.cloneTo(src, tmp() + "/t")
    }.getMessage should include("compact first")
    val src2 = tmp()
    spark.range(0, 10).selectExpr("id AS a")
      .write.format("graft-avro").mode("overwrite").save(src2)
    AvroMaintenance.renameColumn(src2, "a", "b")
    intercept[IllegalArgumentException] {
      AvroMaintenance.cloneTo(src2, tmp() + "/t")
    }.getMessage should include("rename")
    val src3 = tmp()
    spark.range(0, 10).toDF("k")
      .write.format("graft-avro").mode("overwrite").save(src3)
    intercept[IllegalArgumentException] {
      AvroMaintenance.cloneTo(src3, src) // non-empty target
    }.getMessage should include("not empty")
  }

  test("CALL system.clone creates the catalog table") {
    val root = tmp()
    spark.conf.set("spark.sql.catalog.gclone",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gclone.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gclone.ns")
    spark.sql("DROP TABLE IF EXISTS gclone.ns.src")
    spark.sql("CREATE TABLE gclone.ns.src AS SELECT id AS k FROM range(50)")
    spark.sql("CALL gclone.system.clone('ns.src', 'ns.copy')")
      .head().getLong(0) should be > 0L
    spark.sql("SELECT count(*) FROM gclone.ns.copy")
      .head().getLong(0) shouldBe 50L
    // the clone is a first-class table: listed, writable, independent
    spark.sql("SHOW TABLES IN gclone.ns").collect()
      .map(_.getString(1)) should contain("copy")
    spark.sql("INSERT INTO gclone.ns.copy VALUES (999)")
    spark.sql("SELECT count(*) FROM gclone.ns.src")
      .head().getLong(0) shouldBe 50L
    // cloning onto an existing table refuses
    intercept[Exception] {
      spark.sql("CALL gclone.system.clone('ns.src', 'ns.copy')")
    }
  }
}
