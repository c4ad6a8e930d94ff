package graft.sources

import java.io.File
import java.util.concurrent.{Callable, Executors, TimeUnit}

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Commit serialization under concurrent writers: every metadata
  * mutation (journal append, sidecar rewrite, manifest merge) runs
  * under the per-table commit lock, so parallel commits can never lose
  * a journal line, a delete entry, or a tag — the failure mode of
  * unserialized read-modify-write over shared manifest files. Data
  * tasks stay lock-free (names are generation-unique); only the
  * driver-side commit section serializes.
  */
/** Latches coordinating the concurrent-DELETE conflict test: executor
  * threads share this JVM in local mode, so the UDF can signal/await.
  */
object DeleteConflictSync {
  @volatile var scanStarted = new java.util.concurrent.CountDownLatch(1)
  @volatile var deleteDone = new java.util.concurrent.CountDownLatch(1)
  def reset(): Unit = {
    scanStarted = new java.util.concurrent.CountDownLatch(1)
    deleteDone = new java.util.concurrent.CountDownLatch(1)
  }
}

class CommitLockSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp(): String = graft.operators.Catalog.tempDir("graft_lock")

  test("concurrent appends each mint their own journal version, none lost") {
    val dir = tmp()
    spark.range(0, 10).toDF("k")
      .write.format("graft-avro").mode("overwrite").save(dir)   // v1
    val n = 6
    val pool = Executors.newFixedThreadPool(n)
    try {
      val futs = (1 to n).map { i =>
        pool.submit(new Callable[Unit] {
          override def call(): Unit =
            spark.range(i * 100L, i * 100L + 5).toDF("k")
              .coalesce(1)
              .write.format("graft-avro").mode("append").save(dir)
        })
      }
      futs.foreach(_.get(120, TimeUnit.SECONDS))
    } finally pool.shutdown()

    val d = new File(dir)
    val snaps = AvroFileSource.readSnapshots(d)
    // strict +1 versions: one per commit, no lost update on the journal
    snaps.map(_.version) shouldBe (1L to (n + 1).toLong)
    // no rows lost or duplicated
    spark.read.format("graft-avro").load(dir).count() shouldBe 10L + 5L * n
    // the final snapshot's file set is exactly the live listing
    val base = d.getAbsoluteFile.toPath
    val live = AvroFileSource.listAvro(d)
      .map(f => base.relativize(f.getAbsoluteFile.toPath).toString).toSet
    snaps.last.files.toSet shouldBe live
    // every append version added at least one new file
    snaps.sliding(2).foreach {
      case Seq(a, b) => (b.files.toSet -- a.files.toSet) should not be empty
      case _ => ()
    }
  }

  test("concurrent metadata ops: all deletes and tags survive") {
    val dir = tmp()
    spark.range(0, 100).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)   // v1
    val n = 8
    val pool = Executors.newFixedThreadPool(n)
    try {
      val futs = (0 until n).map { i =>
        pool.submit(new Callable[Unit] {
          override def call(): Unit =
            if (i % 2 == 0)
              AvroMaintenance.deleteWhere(spark, dir, "k", Seq(i.toLong))
            else AvroMaintenance.tag(dir, s"t$i", 1L)
        })
      }
      futs.foreach(_.get(120, TimeUnit.SECONDS))
    } finally pool.shutdown()

    val d = new File(dir)
    // every tag survived the concurrent refs rewrites
    AvroFileSource.readRefs(d).keySet shouldBe
      (0 until n).filter(_ % 2 == 1).map(i => s"t$i").toSet
    // every equality delete survived the concurrent sidecar rewrites
    spark.read.format("graft-avro").load(dir).count() shouldBe
      100L - (0 until n).count(_ % 2 == 0)
    // journal versions stay strictly increasing
    val vs = AvroFileSource.readSnapshots(d).map(_.version)
    vs shouldBe vs.sorted
    vs.distinct.size shouldBe vs.size
  }

  test("concurrent row-level UPDATEs: winners apply exactly once, losers fail loudly") {
    val root = graft.operators.Catalog.tempDir("graft_lock_cat")
    spark.conf.set("spark.sql.catalog.graft_lk",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_lk.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_lk.ns")
    spark.sql("DROP TABLE IF EXISTS graft_lk.ns.up")
    spark.sql("CREATE TABLE graft_lk.ns.up AS " +
      "SELECT id AS k, CAST(0 AS BIGINT) AS v FROM range(100)")
    // both updates hit the SAME rows → the same files: if B scanned the
    // pre-A generation, its commit finds the file already archived and
    // fails LOUDLY (snapshot-isolation conflict) instead of silently
    // losing A's update; if B scanned after A committed, both apply.
    val pool = Executors.newFixedThreadPool(2)
    val outcomes = try {
      val futs = (1 to 2).map { _ =>
        pool.submit(new Callable[Boolean] {
          override def call(): Boolean =
            try {
              spark.sql("UPDATE graft_lk.ns.up SET v = v + 1 WHERE k < 50")
              true
            } catch { case _: Exception => false }
        })
      }
      futs.map(_.get(180, TimeUnit.SECONDS))
    } finally pool.shutdown()
    val wins = outcomes.count(identity)
    wins should be >= 1
    // the final state reflects EXACTLY the successful updates — never a
    // lost update, never a double application
    spark.sql("SELECT sum(v) FROM graft_lk.ns.up").head().getLong(0) shouldBe
      50L * wins
    spark.sql("SELECT count(*) FROM graft_lk.ns.up")
      .head().getLong(0) shouldBe 100L
  }

  test("row-level commit detects a concurrent equality DELETE (lost-delete guard)") {
    val root = graft.operators.Catalog.tempDir("graft_lock_del")
    spark.conf.set("spark.sql.catalog.graft_ld",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ld.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_ld.ns")
    spark.sql("DROP TABLE IF EXISTS graft_ld.ns.t")
    spark.sql("CREATE TABLE graft_ld.ns.t AS " +
      "SELECT id AS k, CAST(0 AS BIGINT) AS v FROM range(100)")
    val dir = new File(root, "ns/t").getAbsolutePath
    // the UDF gates the UPDATE's rewrite tasks open: first row signals
    // the scan has planned (fingerprint recorded), then every task
    // blocks until the conflicting deleteWhere has committed — so the
    // delete provably lands between the row-level scan and its commit
    DeleteConflictSync.reset()
    spark.udf.register("gate_inc", (v: Long) => {
      DeleteConflictSync.scanStarted.countDown()
      DeleteConflictSync.deleteDone.await(60, TimeUnit.SECONDS)
      v + 1
    })
    val pool = Executors.newFixedThreadPool(1)
    try {
      val upd = pool.submit(new Callable[Option[Throwable]] {
        override def call(): Option[Throwable] =
          try { spark.sql(
            "UPDATE graft_ld.ns.t SET v = gate_inc(v) WHERE k < 50"); None }
          catch { case e: Throwable => Some(e) }
      })
      DeleteConflictSync.scanStarted.await(60, TimeUnit.SECONDS) shouldBe true
      // concurrent equality delete on a row inside the rewritten range:
      // if the UPDATE commits anyway, its rewritten files get births
      // later than this delete's stamp and k=10 silently resurrects
      AvroMaintenance.deleteWhere(spark, dir, "k", Seq(10L))
      DeleteConflictSync.deleteDone.countDown()
      val err = upd.get(180, TimeUnit.SECONDS)
      err should not be empty
      val msgs = Iterator.iterate(err.get)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString("\n")
      msgs should include("concurrent delete conflict")
    } finally pool.shutdown()
    // the delete survived and the failed UPDATE published nothing
    spark.sql("SELECT count(*) FROM graft_ld.ns.t")
      .head().getLong(0) shouldBe 99L
    spark.sql("SELECT sum(v) FROM graft_ld.ns.t").head().getLong(0) shouldBe 0L
  }

  test("delete-state fingerprint moves on either sidecar") {
    val dir = tmp()
    spark.range(0, 10).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    val d = new File(dir)
    val fp0 = AvroFileSource.deleteStateFingerprint(d)
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(3L))
    val fp1 = AvroFileSource.deleteStateFingerprint(d)
    fp1 should not be fp0
    val base = d.getAbsoluteFile.toPath
    val rel = base.relativize(
      AvroFileSource.listAvro(d).head.getAbsoluteFile.toPath).toString
    AvroMaintenance.deleteAtPositions(dir, rel, Seq(0L))
    AvroFileSource.deleteStateFingerprint(d) should not be fp1
  }

  test("re-entrant composed ops still work (createBranch nests tag)") {
    val dir = tmp()
    spark.range(0, 5).toDF("k")
      .write.format("graft-avro").mode("overwrite").save(dir)
    val forkV = AvroMaintenance.createBranch(dir, "b1")
    AvroFileSource.readRefs(new File(dir)).get("branch/b1") shouldBe
      Some(forkV)
    AvroMaintenance.dropBranch(dir, "b1")
  }
}
