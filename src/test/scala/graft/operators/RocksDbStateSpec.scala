package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** Proof that [[AvroGates.withRocksDbStateStore]] actually engages the
  * RocksDB provider (not silently falling back to the in-memory
  * default): a stateful stream run under the helper must (a) surface
  * rocksdb custom metrics on its state operator and (b) leave
  * RocksDB-format artifacts (zip snapshots / changelogs) in the
  * checkpoint's state directory, and (c) a restart from that checkpoint
  * must recover the counts. The restart gates (q_stream_restart_agg,
  * q_stream_sessions) run their full kill/recover cycle on this
  * provider; this spec pins that the conf they rely on takes effect.
  */
class RocksDbStateSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("withRocksDbStateStore engages RocksDB and survives a restart") {
    import spark.implicits._
    val src = Catalog.tempDir("graft_rocks_src")
    val ckpt = Catalog.tempDir("graft_rocks_ckpt")
    spark.range(0, 100).select(F.col("id"),
        F.pmod(F.col("id"), F.lit(7)).as("k"))
      .repartition(4).write.mode("overwrite").parquet(src)

    // complete-mode memory sink: each batch re-emits the FULL aggregate
    // straight from the state store, so what the restarted query shows
    // is exactly what RocksDB recovered
    def start(name: String) = spark.readStream
      .schema("id LONG, k LONG")
      .option("maxFilesPerTrigger", "1").parquet(src)
      .groupBy("k").agg(F.count(F.lit(1)).as("n"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()

    AvroGates.withStateParallelism(spark, 4) {
      AvroGates.withRocksDbStateStore(spark) {
        val q1 = start("rocks_counts_1")
        try q1.processAllAvailable() finally q1.stop()
        // (a) the state operator reports rocksdb-prefixed custom metrics
        val metrics = Option(q1.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
          .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
        metrics.exists(_.toLowerCase.contains("rocksdb")) shouldBe true

        // (b) the checkpoint state dir holds RocksDB snapshot/changelog
        // artifacts, not the default provider's .delta files
        val stateFiles = {
          val b = Seq.newBuilder[String]
          def walk(f: java.io.File): Unit = {
            val kids = Option(f.listFiles()).getOrElse(Array.empty)
            kids.foreach { c =>
              if (c.isDirectory) walk(c) else b += c.getName
            }
          }
          walk(new java.io.File(ckpt, "state"))
          b.result()
        }
        stateFiles.exists(n =>
          n.endsWith(".zip") || n.endsWith(".changelog")) shouldBe true
        stateFiles.exists(_.endsWith(".delta")) shouldBe false

        // (c) restart from the RocksDB checkpoint: new data folds into
        // the recovered counts
        spark.range(100, 140).select(F.col("id"),
            F.pmod(F.col("id"), F.lit(7)).as("k"))
          .repartition(2).write.mode("append").parquet(src)
        val q2 = start("rocks_counts_2")
        try q2.processAllAvailable() finally q2.stop()
      }
    }
    val got = spark.table("rocks_counts_2").as[(Long, Long)].collect().toMap
    val want = (0L until 140L).groupBy(_ % 7).view.mapValues(_.size.toLong)
    got shouldBe want.toMap
    // the helper restored the session default afterwards (getOption
    // surfaces the built-in default once the explicit value is unset)
    spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .getOrElse("") should not include "RocksDB"
  }
}
