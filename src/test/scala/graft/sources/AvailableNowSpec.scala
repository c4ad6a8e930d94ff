package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Trigger.AvailableNow over the graft-avro streaming source
  * (SupportsTriggerAvailableNow): the run pins the registry horizon at
  * start, drains to it in rate-limited micro-batches, and terminates
  * by itself; a later run resumes from the checkpoint and drains only
  * what arrived since — the cron-style batch-ingestion shape with
  * streaming exactly-once.
  */
class AvailableNowSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp() = graft.operators.Catalog.tempDir("graft_avnow")

  test("availableNow drains to the pinned horizon and terminates") {
    val dir = tmp()
    val out = tmp()
    val ckpt = tmp()
    spark.range(10).selectExpr("id as k")
      .write.format("graft-avro").mode("overwrite").save(dir)
    val schema = spark.read.format("graft-avro").load(dir).schema

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-avro").schema(schema)
        // one file per micro-batch: the drain takes SEVERAL batches,
        // proving the horizon (not the rate limit) ends the run
        .option("maxFilesPerTrigger", "1")
        .load(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      // AvailableNow terminates on its own — no stop() needed
      assert(q.awaitTermination(120000L), "availableNow run never ended")
    }

    runOnce()
    spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq shouldBe
      (0L until 10L)

    // second run drains ONLY the files that arrived since the first
    spark.range(10, 14).selectExpr("id as k")
      .write.format("graft-avro").mode("append").save(dir)
    runOnce()
    spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq shouldBe
      (0L until 14L)

    // nothing new: a third run terminates with no duplicate rows
    runOnce()
    spark.read.parquet(out).count() shouldBe 14L
  }

  test("maxBytesPerTrigger sizes batches by summed file bytes") {
    val dir = tmp()
    spark.range(1200).selectExpr("id as k", "repeat('x', 40) as pad")
      .repartition(4)
      .write.format("graft-avro").option("codec", "null")
      .mode("overwrite").save(dir)
    val files = AvroFileSource.listAvro(new java.io.File(dir))
    files.size shouldBe 4
    val oneFile = files.map(_.length()).min
    val schema = spark.read.format("graft-avro").load(dir).schema
    def drain(opts: Map[String, String], out: String,
        ckpt: String): Int = {
      var r = spark.readStream.format("graft-avro").schema(schema)
      opts.foreach { case (k, v) => r = r.option(k, v) }
      val q = r.load(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000L), "run never ended")
      spark.read.parquet(out).count() shouldBe 1200L
      Option(new java.io.File(ckpt, "commits").listFiles())
        .map(_.count(_.getName.forall(_.isDigit))).getOrElse(0)
    }
    // cap below one file: every batch admits exactly one (progress is
    // guaranteed even when a single file exceeds the cap)
    drain(Map("maxBytesPerTrigger" -> "1"), tmp(), tmp()) shouldBe 4
    // cap above everything: one batch
    drain(Map("maxBytesPerTrigger" -> (1L << 30).toString),
      tmp(), tmp()) shouldBe 1
    // roughly two files per batch
    drain(Map("maxBytesPerTrigger" -> (2 * oneFile + 16).toString),
      tmp(), tmp()) shouldBe 2
    // composite: the TIGHTER of files/bytes governs
    drain(Map("maxBytesPerTrigger" -> (1L << 30).toString,
      "maxFilesPerTrigger" -> "1"), tmp(), tmp()) shouldBe 4
    drain(Map("maxBytesPerTrigger" -> "1",
      "maxFilesPerTrigger" -> "4"), tmp(), tmp()) shouldBe 4
  }
}
