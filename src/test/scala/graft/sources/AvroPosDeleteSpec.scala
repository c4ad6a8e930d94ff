package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Positional deletes: specific physical rows die by ordinal, exactly at
  * decode, in batch AND in combination with equality deletes; splitting,
  * COUNT(*) pushdown, and metadata MIN/MAX self-disable; compaction
  * materializes and clears; historical reads refuse while pending.
  */
class AvroPosDeleteSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp() = graft.operators.Catalog.tempDir("graft_posdel")

  private def rels(dir: String): Seq[String] =
    AvroFileSource.listAvro(new java.io.File(dir)).map(_.getName)

  test("ordinals die exactly; equality deletes compose; count is real") {
    val dir = tmp()
    spark.range(100).selectExpr("id as k", "id * 3 as v").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    val rel = rels(dir).head
    // rows are written in id order (single task, range source)
    AvroMaintenance.deleteAtPositions(dir, rel, Seq(0L, 7L, 99L))
    val back = spark.read.format("graft-avro").load(dir)
    back.count() shouldBe 97
    back.agg(F.sum("k")).head().getLong(0) shouldBe
      (0L until 100L).sum - 0L - 7L - 99L
    // equality delete on top: both flavors apply in one read
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(50L))
    spark.read.format("graft-avro").load(dir).count() shouldBe 96
  }

  test("positions are validated against the physical row count") {
    val dir = tmp()
    spark.range(10).selectExpr("id as k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    intercept[IllegalArgumentException] {
      AvroMaintenance.deleteAtPositions(dir, rels(dir).head, Seq(10L))
    }
    intercept[IllegalArgumentException] {
      AvroMaintenance.deleteAtPositions(dir, "_graft_zones", Seq(0L))
    }
  }

  test("files with positional deletes are never byte-range split") {
    val dir = tmp()
    spark.range(20000)
      .selectExpr("id as k", "repeat('x', 200) as pad").coalesce(1)
      .write.format("graft-avro").option("codec", "null")
      .mode("overwrite").save(dir)
    def parts(df: org.apache.spark.sql.DataFrame): Int = {
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      val root = df.queryExecution.executedPlan
      val under = root.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(root)
      under.collect { case b: BatchScanExec => b }.head.inputPartitions.size
    }
    def load() = spark.read.format("graft-avro")
      .option("maxSplitBytes", "262144").load(dir)
    parts(load()) should be > 1
    AvroMaintenance.deleteAtPositions(dir, rels(dir).head, Seq(5L))
    parts(load()) shouldBe 1
    load().count() shouldBe 19999
  }

  test("historical reads refuse while positional deletes are pending") {
    val dir = tmp()
    spark.range(10).selectExpr("id as k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    spark.range(10, 20).selectExpr("id as k").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)
    AvroMaintenance.deleteAtPositions(dir, rels(dir).head, Seq(1L))
    val err = intercept[Exception] {
      spark.read.format("graft-avro").option("versionAsOf", "1")
        .load(dir).count()
    }
    err.getMessage should include("compact first")
  }

  test("compaction materializes positional deletes and clears the sidecar") {
    val dir = tmp()
    val out = tmp()
    spark.range(30).selectExpr("id as k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    AvroMaintenance.deleteAtPositions(dir, rels(dir).head, Seq(0L, 29L))
    AvroMaintenance.compactTo(spark, dir, out, 1L << 30)
    AvroFileSource.posdelFile(new java.io.File(out)).isFile shouldBe false
    val back = spark.read.format("graft-avro").load(out)
    back.count() shouldBe 28
    back.agg(F.min("k"), F.max("k")).head() match {
      case r => (r.getLong(0), r.getLong(1)) shouldBe (1L, 28L)
    }
  }
}
