package graft.sources

import java.io.File

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Equality deletes (merge-on-read) + compaction (the copy-on-write
  * transition): the DELETE/OPTIMIZE pair of a 100 TB table format.
  * Pinned here: exact decode-time application (including with the
  * delete column pruned from the projection), the metadata-aggregate
  * self-disable while a sidecar exists, sidecar lifecycle across
  * truncate and compaction, the file-count collapse, and the compacted
  * table's restored metadata-served aggregates.
  */
class AvroDeleteSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp(): String = graft.operators.Catalog.tempDir("graft_del")

  private def write(dir: String, parts: Int = 4): Unit =
    spark.range(0, 1000).toDF("k")
      .withColumn("grp", (F.col("k") % 10).cast("int"))
      .withColumn("payload", F.md5(F.col("k").cast("string")))
      .repartition(parts)
      .write.format("graft-avro").mode("overwrite").save(dir)

  private def scanDescription(df: org.apache.spark.sql.DataFrame): String = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val root = df.queryExecution.executedPlan
    val under = root.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(root)
    under.collect { case b: BatchScanExec => b }.head.scan.description()
  }

  test("equality deletes drop exactly the named rows, no file rewritten") {
    val dir = tmp()
    write(dir)
    val before = AvroFileSource.listAvro(new File(dir))
      .map(f => f.getName -> f.length()).sortBy(_._1)
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(3L, 500L, 999L))
    new File(dir, "_graft_deletes") should exist
    // data files untouched byte-for-byte
    AvroFileSource.listAvro(new File(dir))
      .map(f => f.getName -> f.length()).sortBy(_._1) shouldBe before

    val t = spark.read.format("graft-avro").load(dir)
    t.count() shouldBe 997
    t.filter(F.col("k") === 500).count() shouldBe 0
    // second delete merges with the first
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(1L, 2L))
    spark.read.format("graft-avro").load(dir).count() shouldBe 995
  }

  test("deletes apply when the delete column is pruned from the projection") {
    val dir = tmp()
    write(dir)
    AvroMaintenance.deleteWhere(spark, dir, "k",
      (0L until 100L).toSeq) // all of grp 0..9 lose 10 rows each
    val grps = spark.read.format("graft-avro").load(dir)
      .select("grp") // k NOT projected: reader must widen its decode
      .groupBy("grp").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    grps.values.toSet shouldBe Set(90L)
  }

  test("a delete sidecar disables metadata-served COUNT and MIN/MAX") {
    val dir = tmp()
    // sorted write → zone manifest → min/max normally metadata-served
    spark.range(0, 1000).toDF("k")
      .withColumn("payload", F.md5(F.col("k").cast("string")))
      .repartitionByRange(4, F.col("k")).sortWithinPartitions("k")
      .write.format("graft-avro").option("sortedBy", "k")
      .mode("overwrite").save(dir)
    val served = spark.read.format("graft-avro").load(dir)
      .agg(F.min("k"), F.max("k"))
    scanDescription(served) should include("PushedAggregation")

    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(0L, 999L))
    val t = spark.read.format("graft-avro").load(dir)
    val agg = t.agg(F.count(F.lit(1)).as("n"),
      F.min("k").as("mn"), F.max("k").as("mx"))
    scanDescription(agg) should not include "PushedAggregation"
    val r = agg.collect().head
    r.getLong(0) shouldBe 998
    r.getLong(1) shouldBe 1L // the deleted extremes are gone
    r.getLong(2) shouldBe 998L
  }

  test("streaming reads apply the delete sidecar") {
    val dir = tmp()
    val ckpt = graft.operators.Catalog.tempDir("graft_del_ckpt")
    write(dir, parts = 2)
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(10L, 20L, 30L))
    val q = spark.readStream.format("graft-avro")
      .schema(spark.read.format("graft-avro").load(dir).schema)
      .load(dir)
      .groupBy().count()
      .writeStream.format("memory").queryName("del_stream")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000) shouldBe true
    spark.table("del_stream").collect().head.getLong(0) shouldBe 997
  }

  test("truncate clears the sidecar; compaction applies deletes physically") {
    val in = tmp()
    val out = tmp()
    write(in, parts = 16)
    AvroMaintenance.dataFiles(in) shouldBe 16
    AvroMaintenance.deleteWhere(spark, in, "grp", Seq(7))

    val target = math.max(1L, AvroMaintenance.listBytes(in) / 3)
    val n = AvroMaintenance.compactTo(spark, in, out, target)
    AvroMaintenance.dataFiles(out) shouldBe n
    n should be < 16
    // deletes applied physically, no sidecar carried
    new File(out, "_graft_deletes") should not(exist)
    val t = spark.read.format("graft-avro").load(out)
    t.count() shouldBe 900
    t.filter(F.col("grp") === 7).count() shouldBe 0
    // the compacted table's all-column manifest serves MIN/MAX again
    val agg = t.agg(F.min("k").as("mn"), F.max("k").as("mx"))
    scanDescription(agg) should include("PushedAggregation")
    agg.collect().head.toSeq shouldBe Seq(0L, 999L)

    // overwriting the ORIGINAL table clears its sidecar
    write(in, parts = 2)
    new File(in, "_graft_deletes") should not(exist)
    spark.read.format("graft-avro").load(in).count() shouldBe 1000
  }

  test("corrupt or mistyped sidecars fail the read, never resurrect rows") {
    val dir = tmp()
    write(dir)
    java.nio.file.Files.write(new File(dir, "_graft_deletes").toPath,
      "k\tstring\tnot_a_long\n".getBytes("UTF-8"))
    val ex = intercept[IllegalStateException] {
      spark.read.format("graft-avro").load(dir).count()
    }
    ex.getMessage should include("delete sidecar")
  }

  test("deleteWhere validates column, type, and values up front") {
    val dir = tmp()
    write(dir)
    intercept[IllegalArgumentException] {
      AvroMaintenance.deleteWhere(spark, dir, "nope", Seq(1L))
    }
    intercept[IllegalArgumentException] {
      AvroMaintenance.deleteWhere(spark, dir, "k", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      AvroMaintenance.deleteWhere(spark, dir, "k", Seq(null)) // null value
    }
    // a value of the wrong runtime type cannot round-trip as BIGINT
    intercept[IllegalArgumentException] {
      AvroMaintenance.deleteWhere(spark, dir, "k", Seq("abc"))
    }
  }
}
