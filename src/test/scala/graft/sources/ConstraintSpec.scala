package graft.sources

import java.io.File

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** CHECK constraints for graft-avro writes (Delta-parity quality gates
  * at ingest). Pinned here:
  *
  *  - the ad-hoc `check` write option rejects a violating batch and the
  *    transactional commit leaves the previous dataset fully intact;
  *  - table-level constraints ([[AvroMaintenance.addConstraint]])
  *    validate existing data at ADD time, then police every later
  *    write, including streaming epochs;
  *  - SQL CHECK null semantics: only definitely-FALSE rows violate;
  *  - plan-time failures: unresolvable / non-boolean expressions;
  *  - dropConstraint re-opens the gate.
  */
class ConstraintSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp(): String = graft.operators.Catalog.tempDir("graft_chk")

  private def chain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString("; ")

  test("check option: valid batch writes, violating batch fails atomically") {
    val dir = tmp()
    spark.range(0, 10).toDF("k")
      .write.format("graft-avro").option("check", "k >= 0")
      .mode("overwrite").save(dir)
    spark.read.format("graft-avro").load(dir).count() shouldBe 10L

    val err = intercept[Exception] {
      spark.range(0, 10).toDF("k")
        .withColumn("k", F.col("k") - 5)
        .write.format("graft-avro").option("check", "k >= 0")
        .mode("overwrite").save(dir)
    }
    chain(err) should include("CHECK constraint")
    // the failed overwrite published nothing: the old data still reads
    spark.read.format("graft-avro").load(dir).count() shouldBe 10L
    spark.read.format("graft-avro").load(dir)
      .agg(F.min("k")).head().getLong(0) shouldBe 0L
  }

  test("table-level constraint polices every later write; drop re-opens") {
    val dir = tmp()
    spark.range(0, 10).toDF("k").selectExpr("k", "k * 2 AS v")
      .write.format("graft-avro").mode("overwrite").save(dir)
    AvroMaintenance.addConstraint(spark, dir, "v_even", "v % 2 = 0")
    // agreeing append passes
    spark.range(10, 12).toDF("k").selectExpr("k", "k * 4 AS v")
      .write.format("graft-avro").mode("append").save(dir)
    // violating append fails
    val err = intercept[Exception] {
      spark.range(0, 3).toDF("k").selectExpr("k", "k * 2 + 1 AS v")
        .write.format("graft-avro").mode("append").save(dir)
    }
    chain(err) should include("v_even")
    spark.read.format("graft-avro").load(dir).count() shouldBe 12L
    AvroMaintenance.dropConstraint(dir, "v_even")
    spark.range(0, 3).toDF("k").selectExpr("k", "k * 2 + 1 AS v")
      .write.format("graft-avro").mode("append").save(dir)
    spark.read.format("graft-avro").load(dir).count() shouldBe 15L
  }

  test("addConstraint validates existing data and rejects violations") {
    val dir = tmp()
    spark.range(0, 10).toDF("k")
      .write.format("graft-avro").mode("overwrite").save(dir)
    intercept[IllegalArgumentException] {
      AvroMaintenance.addConstraint(spark, dir, "late", "k < 5")
    }
    AvroFileSource.constraintsFile(new File(dir)).isFile shouldBe false
  }

  test("null passes (SQL CHECK semantics), false fails") {
    val dir = tmp()
    spark.range(0, 5).toDF("k")
      .selectExpr("k", "CASE WHEN k = 3 THEN NULL ELSE k END AS v")
      .write.format("graft-avro").option("check", "v < 100")
      .mode("overwrite").save(dir)
    // the k=3 row has v null — `v < 100` is null there, which PASSES
    spark.read.format("graft-avro").load(dir).count() shouldBe 5L
  }

  test("validateConstraints audits adopted files; null passes (r20)") {
    val dir = tmp()
    spark.range(0, 10).toDF("k")
      .withColumn("v", F.when(F.col("k") % 2 === 0, F.col("k") * 10))
      .write.format("graft-avro").mode("overwrite").save(dir)
    AvroMaintenance.addConstraint(spark, dir, "k_pos", "k >= 0")
    // v is NULL on odd rows: SQL CHECK null-passes — zero violations
    AvroMaintenance.addConstraint(spark, dir, "v_big", "v >= 0")
    AvroMaintenance.validateConstraints(spark, dir) shouldBe
      Seq("k_pos" -> 0L, "v_big" -> 0L)
    // smuggle a violating container (written elsewhere, byte-copied,
    // adopted via addFiles — the path write enforcement never saw it)
    val scratch = tmp()
    spark.range(0, 4).toDF("k")
      .withColumn("k", F.col("k") - 10).withColumn("v", F.lit(-1L))
      .coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(scratch)
    val part = new java.io.File(scratch).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(dir, "smuggled.avro").toPath)
    AvroMaintenance.addFiles(dir) shouldBe 1
    AvroMaintenance.validateConstraints(spark, dir) shouldBe
      Seq("k_pos" -> 4L, "v_big" -> 4L)
    // no constraints -> empty audit
    AvroMaintenance.dropConstraint(dir, "k_pos")
    AvroMaintenance.dropConstraint(dir, "v_big")
    AvroMaintenance.validateConstraints(spark, dir) shouldBe Nil
  }

  test("plan-time failures: unresolvable and non-boolean expressions") {
    val dir = tmp()
    val e1 = intercept[Exception] {
      spark.range(0, 5).toDF("k")
        .write.format("graft-avro").option("check", "nope > 0")
        .mode("overwrite").save(dir)
    }
    chain(e1) should include("cannot resolve")
    val e2 = intercept[Exception] {
      spark.range(0, 5).toDF("k")
        .write.format("graft-avro").option("check", "k + 1")
        .mode("overwrite").save(dir)
    }
    chain(e2) should include("not boolean")
  }

  test("streaming epochs validate table constraints too") {
    val dir = tmp()
    val src = tmp()
    spark.range(0, 5).toDF("k")
      .write.format("graft-avro").mode("overwrite").save(dir)
    AvroMaintenance.addConstraint(spark, dir, "pos", "k >= 0")
    spark.range(0, 3).toDF("k").coalesce(1).write.mode("overwrite").parquet(src)
    val q = spark.readStream.schema("k LONG").parquet(src)
      .writeStream.format("graft-avro")
      .option("path", dir)
      .option("checkpointLocation", tmp())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    spark.read.format("graft-avro").load(dir).count() shouldBe 8L

    // violating stream: the epoch fails, nothing publishes
    val src2 = tmp()
    spark.range(0, 3).toDF("k").withColumn("k", F.col("k") - 9)
      .coalesce(1).write.mode("overwrite").parquet(src2)
    val q2 = spark.readStream.schema("k LONG").parquet(src2)
      .writeStream.format("graft-avro")
      .option("path", dir)
      .option("checkpointLocation", tmp())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val err = intercept[Exception] { q2.awaitTermination(60000) }
    chain(err) should include("pos")
    spark.read.format("graft-avro").load(dir).count() shouldBe 8L
  }
}
