package graft.sources

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Atomic CTAS / RTAS through [[GraftCatalog]]'s StagingTableCatalog:
  * the query writes into a hidden `_graft_stage_*` directory and only a
  * successful write swaps it into place — so a FAILING `REPLACE TABLE
  * AS SELECT` leaves the old table fully intact (Spark's non-staged
  * fallback is drop-then-create, which destroys it), aborts leave no
  * litter, and listings never see the staging directories.
  */
class StagedCtasSpec extends AnyFunSuite with SparkSpec with Matchers {

  private lazy val root = graft.operators.Catalog.tempDir("graft_stage_root")

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.graft_st",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_st.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_st.ns")
  }

  private def stagingLitter(): Seq[String] =
    Option(new File(root, "ns").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("_graft_stage")).map(_.getName).toSeq

  test("CTAS is staged: data lands atomically, no litter") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_st.ns.t1")
    spark.sql("CREATE TABLE graft_st.ns.t1 AS SELECT id AS k FROM range(20)")
    spark.sql("SELECT count(*) FROM graft_st.ns.t1").head().getLong(0) shouldBe 20
    stagingLitter() shouldBe empty
  }

  test("failing RTAS leaves the old table fully intact") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_st.ns.t2")
    spark.sql("CREATE TABLE graft_st.ns.t2 AS " +
      "SELECT id AS k, id * 10 AS v FROM range(10)")
    val boom = intercept[Exception] {
      spark.sql("REPLACE TABLE graft_st.ns.t2 AS " +
        "SELECT assert_true(id < 5) AS a, id AS k FROM range(10)")
    }
    boom.getMessage should not be null
    // the old table — schema AND rows — survives the failed replace
    val back = spark.sql("SELECT k, v FROM graft_st.ns.t2")
    back.count() shouldBe 10
    back.schema.fieldNames.toSeq shouldBe Seq("k", "v")
    stagingLitter() shouldBe empty
  }

  test("CREATE OR REPLACE swaps schema and data; partitioned staging works") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_st.ns.t3")
    spark.sql("CREATE OR REPLACE TABLE graft_st.ns.t3 AS " +
      "SELECT id AS k FROM range(5)")
    spark.sql("SELECT count(*) FROM graft_st.ns.t3").head().getLong(0) shouldBe 5
    spark.sql("CREATE OR REPLACE TABLE graft_st.ns.t3 " +
      "PARTITIONED BY (p) AS " +
      "SELECT id AS k, CAST(id % 3 AS STRING) AS p FROM range(30)")
    spark.sql("SELECT count(DISTINCT p) FROM graft_st.ns.t3")
      .head().getLong(0) shouldBe 3
    // the replacement's hive layout materialized (identity partitions)
    val segs = AvroFileSource.listPartitioned(new File(s"$root/ns/t3"))
      .flatMap(_._2.get("p")).distinct
    segs.sorted shouldBe Seq("0", "1", "2")
    stagingLitter() shouldBe empty
  }

  test("CALL system.clean_stages reclaims crash-abandoned staging dirs") {
    init()
    // forge a crash leftover: a staging dir nobody will ever commit
    val stale = new File(new File(root, "ns"), "_graft_stage_zombie_abc")
    stale.mkdirs()
    new File(stale, "part-x.avro").createNewFile()
    // too young under a 60-minute floor: untouched (a LIVE staged CTAS
    // must never be swept mid-write)
    spark.sql("CALL graft_st.system.clean_stages('ns', 60)")
      .head().getLong(0) shouldBe 0L
    stale.isDirectory shouldBe true
    // age floor 0: reclaimed
    spark.sql("CALL graft_st.system.clean_stages('ns', 0)")
      .head().getLong(0) shouldBe 1L
    stale.exists() shouldBe false
  }

  test("the RTAS swap serializes on the TARGET table's commit lock") {
    // The r14-advice hole: table mutations lock the TABLE dir, the swap
    // locked only the NAMESPACE dir — a concurrent INSERT could publish
    // into the renamed-away directory and vanish with the trash. Now
    // the swap nests withCommitLock(target): while any table commit
    // holds that lock, the swap WAITS; afterwards it replaces the table
    // (ordered REPLACE semantics, never a silent interleaved loss).
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    init()
    spark.sql("DROP TABLE IF EXISTS graft_st.ns.tl")
    spark.sql("CREATE TABLE graft_st.ns.tl AS SELECT id AS k FROM range(20)")
    val target = new File(root, "ns/tl")
    val held = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    try {
      val holder = pool.submit(new Runnable {
        override def run(): Unit =
          AvroFileSource.withCommitLock(target) {
            held.countDown()
            release.await(60, TimeUnit.SECONDS)
            ()
          }
      })
      held.await(60, TimeUnit.SECONDS) shouldBe true
      val rtas = pool.submit(new Runnable {
        override def run(): Unit = {
          spark.sql(
            "REPLACE TABLE graft_st.ns.tl AS SELECT id * 10 AS k FROM range(5)")
          ()
        }
      })
      // wait until the staged write LANDED (the only remaining step is
      // the ms-scale swap — which must be blocked on the held lock)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def stagedFiles(): Int =
        Option(new File(root, "ns").listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("_graft_stage_tl"))
          .flatMap(d => AvroFileSource.listAvro(d)).length
      while (stagedFiles() == 0 && System.nanoTime() < deadline)
        Thread.sleep(25)
      stagedFiles() should be > 0
      Thread.sleep(1500)
      rtas.isDone shouldBe false // blocked on the target's commit lock
      // the old table is fully readable while the swap waits
      spark.sql("SELECT count(*) FROM graft_st.ns.tl")
        .head().getLong(0) shouldBe 20
      release.countDown()
      rtas.get(120, TimeUnit.SECONDS)
      holder.get(120, TimeUnit.SECONDS)
      spark.sql("SELECT count(*) FROM graft_st.ns.tl")
        .head().getLong(0) shouldBe 5
      stagingLitter().filter(_.startsWith("_graft_stage_tl")) shouldBe empty
    } finally pool.shutdown()
  }

  test("staged REPLACE of a missing table refuses; CTAS over existing refuses") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_st.ns.t4")
    intercept[Exception] {
      spark.sql("REPLACE TABLE graft_st.ns.t4 AS SELECT 1 AS x")
    }
    spark.sql("CREATE TABLE graft_st.ns.t4 AS SELECT 1 AS x")
    intercept[Exception] {
      spark.sql("CREATE TABLE graft_st.ns.t4 AS SELECT 2 AS y")
    }
    spark.sql("SELECT x FROM graft_st.ns.t4").head().getInt(0) shouldBe 1
  }
}
