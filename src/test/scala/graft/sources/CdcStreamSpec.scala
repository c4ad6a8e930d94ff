package graft.sources

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Streaming CDC change feed (`readChangeFeed=true`): journal versions
  * as offsets, per-version file deltas as insert/delete rows tagged
  * `_change_type` + `_commit_version`, exactly-once across restarts,
  * and the loud refusals that keep a file-level feed sound (equality-
  * delete deltas, pending positional deletes, batch reads).
  */
class CdcStreamSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp() = graft.operators.Catalog.tempDir("graft_cdc")

  test("history replay + forward tail: inserts, overwrite churn, version tags") {
    val dir = tmp()
    spark.range(0, 5).selectExpr("id AS k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    spark.range(5, 8).selectExpr("id AS k")
      .write.format("graft-avro").mode("append").save(dir) // v2

    val q = spark.readStream.format("graft-avro")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .load(dir)
      .writeStream.format("memory").queryName("cdc_replay")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val hist = spark.table("cdc_replay").collect()
      hist.length shouldBe 8
      hist.forall(_.getString(1) == "insert") shouldBe true
      hist.map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq shouldBe
        ((0L until 5L).map((_, 1L)) ++ (5L until 8L).map((_, 2L)))

      // an overwrite surfaces as full churn: every old row deleted at
      // v3, the replacement rows inserted at v3
      spark.range(100, 102).selectExpr("id AS k")
        .write.format("graft-avro").mode("overwrite").save(dir) // v3
      q.processAllAvailable()
      val all = spark.table("cdc_replay")
      all.count() shouldBe 18
      all.filter("_change_type = 'delete' AND _commit_version = 3")
        .select("k").collect().map(_.getLong(0)).sorted.toSeq shouldBe
        (0L until 8L)
      all.filter("_change_type = 'insert' AND _commit_version = 3")
        .select("k").collect().map(_.getLong(0)).sorted.toSeq shouldBe
        Seq(100L, 101L)
    } finally q.stop()
  }

  test("default start is forward-only; checkpoint restart is exactly-once") {
    val dir = tmp()
    val out = tmp()
    val ckpt = tmp()
    spark.range(0, 4).selectExpr("id AS k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-avro")
        .option("readChangeFeed", "true")
        .load(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }

    runOnce() // v1 predates the stream: nothing served
    spark.read.parquet(out).count() shouldBe 0

    spark.range(4, 7).selectExpr("id AS k")
      .write.format("graft-avro").mode("append").save(dir) // v2
    runOnce()
    val afterV2 = spark.read.parquet(out)
    afterV2.count() shouldBe 3
    afterV2.select("k").collect().map(_.getLong(0)).sorted.toSeq shouldBe
      Seq(4L, 5L, 6L)

    // replaying with nothing new adds nothing (offsets are versions)
    runOnce()
    spark.read.parquet(out).count() shouldBe 3
  }

  test("equality-delete deltas emit delete rows; batch reads refuse loudly") {
    val dir = tmp()
    spark.range(0, 6).selectExpr("id AS k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    // a metadata deleteWhere mints a version whose only delta is the
    // delete sidecar: the feed serves the newly-hidden rows as deletes
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(2L, 4L)) // v2
    val q = spark.readStream.format("graft-avro")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .load(dir)
      .writeStream.format("memory").queryName("cdc_deld")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cdc_deld").collect()
        .map(r => (r.getString(1), r.getLong(0), r.getLong(2))).sorted
      rows.filter(_._1 == "insert").map(_._2).toSeq shouldBe (0L until 6L)
      rows.filter(_._1 == "delete").toSeq shouldBe
        Seq(("delete", 2L, 2L), ("delete", 4L, 2L))

      // a MERGE-style re-insert AFTER the delete: the stamped entry must
      // not re-kill the replayed insert (per-file stamp gating)
      spark.range(4, 5).selectExpr("id AS k")
        .write.format("graft-avro").mode("append").save(dir) // v3
      AvroMaintenance.deleteWhere(spark, dir, "k", Seq(0L)) // v4
      q.processAllAvailable()
      val all = spark.table("cdc_deld").collect()
        .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
      all.filter(_._3 == 3L).toSeq shouldBe Seq(("insert", 4L, 3L))
      all.filter(_._3 == 4L).toSeq shouldBe Seq(("delete", 0L, 4L))
      // fold check: feed-replayed state == live state
      val folded = all.foldLeft(Map.empty[Long, Long]) { (m, r) =>
        val d = if (r._1 == "insert") 1L else -1L
        val n = m.getOrElse(r._2, 0L) + d
        if (n == 0L) m - r._2 else m.updated(r._2, n)
      }
      val live = spark.read.format("graft-avro").load(dir).collect()
        .map(_.getLong(0)).groupBy(identity)
        .map { case (k, a) => k -> a.length.toLong }
      folded shouldBe live
    } finally q.stop()

    // batch read (r16): the SAME feed as one version-ranged batch —
    // default range = the full journal, filters applied post-scan
    val batch = spark.read.format("graft-avro")
      .option("readChangeFeed", "true").load(dir)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    batch.sorted.toSeq shouldBe spark.table("cdc_deld").collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2))).sorted.toSeq
    // explicit (startingVersion, endingVersion] sub-range
    val sub = spark.read.format("graft-avro")
      .option("readChangeFeed", "true")
      .option("startingVersion", "3")
      .option("endingVersion", "3").load(dir)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    sub.toSeq shouldBe Seq(("insert", 4L, 3L))
    // residual filters compose (never pruned against the live listing)
    spark.read.format("graft-avro").option("readChangeFeed", "true")
      .load(dir).filter("_change_type = 'delete'").count() shouldBe 3L
    // guards: endingVersion beyond current / on a stream
    intercept[Exception] {
      spark.read.format("graft-avro").option("readChangeFeed", "true")
        .option("endingVersion", "99").load(dir).collect()
    }.getMessage should include("beyond the current")
    intercept[Exception] {
      val qq = spark.readStream.format("graft-avro")
        .option("readChangeFeed", "true")
        .option("endingVersion", "2").load(dir)
        .writeStream.format("memory").queryName("cdc_deld_bad")
        .outputMode("append").start()
      try qq.processAllAvailable() finally qq.stop()
    }.getMessage should include("batch option")
  }

  test("delete-delta emission widens a pruned-away sidecar column") {
    val dir = tmp()
    spark.range(0, 5).selectExpr("id AS k", "id * 10 AS v")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(3L)) // v2
    // project ONLY v (+ CDC columns): the matcher needs k, which the
    // reader must widen into the decode schema and project back out
    val q = spark.readStream.format("graft-avro")
      .option("readChangeFeed", "true")
      .option("startingVersion", "2")
      .load(dir)
      .select(F.col("v"), F.col("_change_type"), F.col("_commit_version"))
      .writeStream.format("memory").queryName("cdc_widen")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table("cdc_widen").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq shouldBe
        Seq((30L, "delete", 2L))
    } finally q.stop()
  }

  test("rollback across a deleteWhere emits re-surfacing inserts") {
    val dir = tmp()
    spark.range(0, 4).selectExpr("id AS k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(1L)) // v2
    AvroMaintenance.rollbackTo(dir, 1L) // v3: sidecar entry disappears
    val q = spark.readStream.format("graft-avro")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .load(dir)
      .writeStream.format("memory").queryName("cdc_undel")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cdc_undel").collect()
        .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
      rows.filter(_._3 == 2L).toSeq shouldBe Seq(("delete", 1L, 2L))
      // the rollback re-surfaces k=1 as an insert at v3
      rows.filter(_._3 == 3L).toSeq shouldBe Seq(("insert", 1L, 3L))
      val folded = rows.foldLeft(Map.empty[Long, Long]) { (m, r) =>
        val d = if (r._1 == "insert") 1L else -1L
        val n = m.getOrElse(r._2, 0L) + d
        if (n == 0L) m - r._2 else m.updated(r._2, n)
      }
      folded shouldBe (0L until 4L).map(_ -> 1L).toMap
    } finally q.stop()
  }

  test("availableNow + maxVersionsPerTrigger drains history in bounded batches") {
    val dir = tmp()
    val out = tmp()
    val ckpt = tmp()
    spark.range(0, 2).selectExpr("id AS k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    spark.range(2, 4).selectExpr("id AS k")
      .write.format("graft-avro").mode("append").save(dir) // v2
    spark.range(4, 6).selectExpr("id AS k")
      .write.format("graft-avro").mode("append").save(dir) // v3
    val q = spark.readStream.format("graft-avro")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .option("maxVersionsPerTrigger", "1") // one version per batch
      .load(dir)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000L), "availableNow run never ended")
    val rows = spark.read.parquet(out)
    rows.count() shouldBe 6
    rows.select("k").collect().map(_.getLong(0)).sorted.toSeq shouldBe
      (0L until 6L)
    // the rate limit forced one version per micro-batch: ≥ 3 data batches
    rows.select("_commit_version").distinct().count() shouldBe 3
  }

  test("a stream lagging past snapshot expiry fails loudly, never skips") {
    val dir = tmp()
    spark.range(0, 3).selectExpr("id AS k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    spark.range(3, 6).selectExpr("id AS k")
      .write.format("graft-avro").mode("append").save(dir) // v2
    spark.range(6, 9).selectExpr("id AS k")
      .write.format("graft-avro").mode("append").save(dir) // v3
    // vacuum: rebase the journal so v1's delta is gone
    AvroMaintenance.expireSnapshots(dir, keepLast = 1)
    val q = spark.readStream.format("graft-avro")
      .option("readChangeFeed", "true")
      .option("startingVersion", "2") // needs v1 as the delta base
      .load(dir)
      .writeStream.format("memory").queryName("cdc_expired")
      .outputMode("append").start()
    val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    boom.getMessage.toLowerCase should include("gone from the journal")
  }

  test("change partitions byte-range split; posdel ordinals stay exact") {
    // a huge changed file must not pin one CDC task: partitions split
    // like any batch scan, and absolute ordinals (posdel overlays, the
    // gained-position delta filter) survive the ranges via the
    // block-header seed
    val dir = tmp()
    spark.range(20000)
      .selectExpr("id AS k", "repeat('x', 200) AS pad").coalesce(1)
      .sortWithinPartitions("k")
      .write.format("graft-avro").option("codec", "null")
      .mode("overwrite").save(dir) // v1: one ~4MB file
    val d = new java.io.File(dir)
    val rel = d.getAbsoluteFile.toPath.relativize(
      AvroFileSource.listLive(d).head._1.getAbsoluteFile.toPath).toString
    // boundary-straddling ordinals (the posdel-splits spec's shape)
    val dead = Seq(0L, 5L, 4999L, 5000L, 9999L, 15000L, 19999L)
    AvroMaintenance.deleteAtPositions(dir, rel, dead) // v2
    def feed(maxSplit: String) = spark.read.format("graft-avro")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .option("maxSplitBytes", maxSplit)
      .load(dir)
    val small = feed((256 * 1024).toString)
    small.rdd.getNumPartitions should be > 8 // genuinely split
    val rows = small.select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    rows.count(_._2 == "insert") shouldBe 20000
    rows.filter(_._2 == "delete").map(_._1).sorted.toSeq shouldBe dead
    // split and unsplit reads agree exactly
    val one = feed(Long.MaxValue.toString)
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    rows.sorted.toSeq shouldBe one.sorted.toSeq
  }

  test("the feed spans an ADD COLUMN: old versions null-fill the column") {
    val dir = tmp()
    spark.range(0, 4).selectExpr("id AS k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    AvroMaintenance.addColumn(dir,
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.LongType)) // v2 (no file delta)
    spark.range(4, 6).selectExpr("id AS k", "id * 2 AS extra")
      .write.format("graft-avro").mode("append").save(dir) // v3
    val q = spark.readStream.format("graft-avro")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .load(dir)
      .writeStream.format("memory").queryName("cdc_evo")
      .outputMode("append").start()
    val rows =
      try {
        q.processAllAvailable()
        spark.table("cdc_evo")
          .select("k", "extra", "_change_type", "_commit_version")
          .collect()
          .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2),
            r.getLong(3))).sortBy(_._1)
      } finally q.stop()
    // v1's rows serve under the CURRENT (evolved) schema, extra null;
    // v3's carry real values — all inserts, versions exact
    rows.toSeq shouldBe Seq(
      (0L, None, "insert", 1L), (1L, None, "insert", 1L),
      (2L, None, "insert", 1L), (3L, None, "insert", 1L),
      (4L, Some(8L), "insert", 3L), (5L, Some(10L), "insert", 3L))
  }

  test("a row killed by BOTH mechanisms emits once; rollback once") {
    // posdel kills k=0 (v2), an equality entry for the same row lands
    // (v3, no visible effect), rollback to v1 loses BOTH in one step
    // (v4): the feed must emit exactly ONE delete and ONE re-surfacing
    // insert for k=0 — the posdel partition is authoritative when one
    // version step moves both sidecars
    val dir = tmp()
    spark.range(0, 5).selectExpr("id AS k").coalesce(1)
      .sortWithinPartitions("k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    val d = new java.io.File(dir)
    val rel = d.getAbsoluteFile.toPath.relativize(
      AvroFileSource.listLive(d).head._1.getAbsoluteFile.toPath).toString
    AvroMaintenance.deleteAtPositions(dir, rel, Seq(0L)) // v2: kills k=0
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(0L)) // v3: same row
    AvroMaintenance.rollbackTo(dir, 1L) // v4: both sidecars revert
    val q = spark.readStream.format("graft-avro")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .load(dir)
      .writeStream.format("memory").queryName("cdc_both")
      .outputMode("append").start()
    val rows =
      try {
        q.processAllAvailable()
        spark.table("cdc_both").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      } finally q.stop()
    rows.filter(r => r._1 == 0L && r._2 == "delete").toSeq shouldBe
      Seq((0L, "delete", 2L))
    rows.filter(r => r._1 == 0L && r._2 == "insert").toSeq shouldBe
      Seq((0L, "insert", 1L), (0L, "insert", 4L))
    // fold == live
    val folded = rows.foldLeft(Map.empty[Long, Long]) { (m, r) =>
      val dd = if (r._2 == "insert") 1L else -1L
      val n = m.getOrElse(r._1, 0L) + dd
      if (n == 0L) m - r._1 else m.updated(r._1, n)
    }
    folded shouldBe (0L until 5L).map(_ -> 1L).toMap
    // batch changes agrees on the (1, 4] net (nothing changed)
    AvroMaintenance.changes(spark, dir, 1, 4).collect() shouldBe empty
    // and on the (2, 4] net: k=0 resurfaces exactly once
    AvroMaintenance.changes(spark, dir, 2, 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((0L, "insert"))
  }

  test("catalog .changes view: readStream.table serves the feed; writes refuse") {
    val root = graft.operators.Catalog.tempDir("graft_cdc_cat")
    spark.conf.set("spark.sql.catalog.graft_cdc",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cdc.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cdc.ns")
    spark.sql("DROP TABLE IF EXISTS graft_cdc.ns.t")
    spark.sql("CREATE TABLE graft_cdc.ns.t AS SELECT id AS k FROM range(5)")
    spark.sql("INSERT INTO graft_cdc.ns.t SELECT id AS k FROM range(5, 8)")
    val q = spark.readStream
      .option("startingVersion", "1")
      .table("graft_cdc.ns.t.changes")
      .writeStream.format("memory").queryName("cdc_cat")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cdc_cat").collect()
      rows.length shouldBe 8
      rows.forall(_.getString(1) == "insert") shouldBe true
      rows.map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq shouldBe
        ((0L until 5L).map((_, 1L)) ++ (5L until 8L).map((_, 2L)))
    } finally q.stop()
    // the view is read-only…
    intercept[Exception] {
      spark.sql("INSERT INTO graft_cdc.ns.t.changes VALUES (1, 'x', 1)")
    }
    // …and a batch SELECT serves the full feed since r16 (the whole
    // journal range as inserts here — SQL surface for the changelog)
    val sqlRows = spark.sql(
      "SELECT k, _change_type, _commit_version " +
        "FROM graft_cdc.ns.t.changes").collect()
    sqlRows.length shouldBe 8
    sqlRows.forall(_.getString(1) == "insert") shouldBe true
    sqlRows.map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq shouldBe
      ((0L until 5L).map((_, 1L)) ++ (5L until 8L).map((_, 2L)))
  }

  test("column pruning and cdc-only projections stay consistent") {
    val dir = tmp()
    spark.range(0, 3).selectExpr("id AS k", "id * 2 AS v")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    spark.range(3, 5).selectExpr("id AS k", "id * 2 AS v")
      .write.format("graft-avro").mode("append").save(dir) // v2
    val q = spark.readStream.format("graft-avro")
      .option("readChangeFeed", "true")
      .option("startingVersion", "2")
      .load(dir)
      .select(F.col("v"), F.col("_commit_version"))
      .writeStream.format("memory").queryName("cdc_prune")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table("cdc_prune").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq shouldBe
        Seq((6L, 2L), (8L, 2L))
    } finally q.stop()
  }
}
