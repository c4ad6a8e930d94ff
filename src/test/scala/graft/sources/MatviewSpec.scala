package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.Catalog

/** Incremental materialized views (GraftMatviews): refresh must equal a
  * full recompute while reading only the source delta, a no-op refresh
  * must report so, and every unsound shortcut — rewritten source
  * history, double create — must fail loudly.
  */
class MatviewSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val agg =
    """SELECT k, count(*) AS n,
      |  CAST(sum(CAST(v AS BIGINT)) AS BIGINT) AS s
      |FROM __SRC__ GROUP BY k""".stripMargin
  private val merge =
    """SELECT k, CAST(sum(n) AS BIGINT) AS n,
      |  CAST(sum(s) AS BIGINT) AS s
      |FROM __ACC__ GROUP BY k""".stripMargin

  private def writeGen(dir: String, from: Int, until: Int,
      mode: String): Unit = {
    val s = spark
    import s.implicits._
    (from until until).map(i => (i.toLong % 7, i.toLong))
      .toDF("k", "v")
      .write.format("graft-avro").mode(mode).save(dir)
  }

  private def viewRows(dir: String): Map[Long, (Long, Long)] =
    spark.read.format("graft-avro").load(dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("refresh equals full recompute and reads only the delta") {
    val src = Catalog.tempDir("graft_mv_src")
    val mv = Catalog.tempDir("graft_mv_view")
    writeGen(src, 0, 100, "overwrite") // v1
    val v0 = GraftMatviews.create(spark, mv, src, agg, merge)
    v0 shouldBe 1L

    writeGen(src, 100, 150, "append") // v2
    writeGen(src, 150, 230, "append") // v3
    val (from, to) = GraftMatviews.refresh(spark, mv)
    (from, to) shouldBe (1L, 3L)

    val expect = (0 until 230).groupBy(_ % 7).map { case (k, vs) =>
      k.toLong -> (vs.size.toLong, vs.map(_.toLong).sum)
    }
    viewRows(mv) shouldBe expect

    // the source has not moved: refresh reports a no-op
    val (f2, t2) = GraftMatviews.refresh(spark, mv)
    f2 shouldBe t2
    viewRows(mv) shouldBe expect
  }

  test("delta view folds deletes to a from-scratch rebuild (counting)") {
    val src = Catalog.tempDir("graft_mv_src_d")
    val mv = Catalog.tempDir("graft_mv_view_d")
    writeGen(src, 0, 100, "overwrite") // v1
    val delta =
      """SELECT k,
        |  CAST(sum(CASE WHEN _change_type = 'insert' THEN 1 ELSE -1 END)
        |    AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN _change_type = 'insert' THEN CAST(v AS BIGINT)
        |    ELSE -CAST(v AS BIGINT) END) AS BIGINT) AS s
        |FROM __CHG__ GROUP BY k""".stripMargin
    val mergeDrop =
      """SELECT k, CAST(sum(n) AS BIGINT) AS n,
        |  CAST(sum(s) AS BIGINT) AS s
        |FROM __ACC__ GROUP BY k
        |HAVING CAST(sum(n) AS BIGINT) > 0""".stripMargin
    GraftMatviews.create(spark, mv, src, agg, mergeDrop, Some(delta))
    writeGen(src, 100, 160, "append") // v2
    // equality delete mid-history: every k=3 row of v1+v2 dies — the
    // whole group must VANISH from the view (HAVING drops the zero)
    AvroMaintenance.deleteWhere(spark, src, "k", Seq(3L)) // v3
    // positional delete: two specific physical rows die
    val base = new java.io.File(src).getAbsoluteFile.toPath
    val rel = AvroFileSource.listLive(new java.io.File(src))
      .map(p => base.relativize(p._1.getAbsoluteFile.toPath).toString)
      .sorted.head
    AvroMaintenance.deleteAtPositions(src, rel, Seq(0L, 1L)) // v4
    writeGen(src, 160, 190, "append") // v5 (k=3 rows survive: stamped)
    val (from, to) = GraftMatviews.refresh(spark, mv)
    from shouldBe 1L
    to should be >= 5L
    // from-scratch rebuild over the LIVE table = the refreshed view
    val expect = spark.read.format("graft-avro").load(src)
      .groupBy("k").agg(F.count(F.lit(1)).as("n"),
        F.sum(F.col("v").cast("long")).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    viewRows(mv) shouldBe expect
    // k=3 exists again (v5 postdates the stamp) — but only v5's rows
    expect(3L)._1 shouldBe (160 until 190).count(_ % 7 == 3).toLong
    // no-op refresh reports so
    val (f2, t2) = GraftMatviews.refresh(spark, mv)
    f2 shouldBe t2
  }

  test("rewritten source history fails the refresh loudly") {
    val src = Catalog.tempDir("graft_mv_src2")
    val mv = Catalog.tempDir("graft_mv_view2")
    writeGen(src, 0, 50, "overwrite")
    GraftMatviews.create(spark, mv, src, agg, merge)
    writeGen(src, 50, 80, "append")
    // an equality delete makes the window non-additive
    AvroMaintenance.deleteWhere(spark, src, "k", Seq(3L))
    val e = intercept[Exception] {
      GraftMatviews.refresh(spark, mv)
    }
    e.getMessage.toLowerCase should include regex "additive|delete"
  }

  test("concurrent refreshes serialize: the loser no-ops, no double-count") {
    val src = Catalog.tempDir("graft_mv_src_cc")
    val mv = Catalog.tempDir("graft_mv_view_cc")
    writeGen(src, 0, 100, "overwrite") // v1
    GraftMatviews.create(spark, mv, src, agg, merge)
    writeGen(src, 100, 160, "append") // v2 — the delta both will race for

    // latch-gate: thread A enters the critical section and parks; B
    // must NOT get past the lock while A holds it
    val aInside = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val first = new java.util.concurrent.atomic.AtomicBoolean(true)
    GraftMatviews.testInLock = () =>
      if (first.getAndSet(false)) { aInside.countDown(); release.await() }
    try {
      val results = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      def refresher() = new Thread(() =>
        try results.add(GraftMatviews.refresh(spark, mv))
        catch { case t: Throwable => errs.add(t) })
      val a = refresher(); a.start()
      aInside.await()
      val b = refresher(); b.start()
      // B is queued behind the per-view lock while A parks inside it
      b.join(1500); b.isAlive shouldBe true
      release.countDown()
      a.join(60000); b.join(60000)
      errs.asScala shouldBe empty
      // exactly one applied 1->2; the other re-read the spec under the
      // lock, saw lastVersion=2, and no-op'd
      results.asScala.toSet shouldBe Set((1L, 2L), (2L, 2L))
    } finally GraftMatviews.testInLock = () => ()

    val expect = (0 until 160).groupBy(_ % 7).map { case (k, vs) =>
      k.toLong -> (vs.size.toLong, vs.map(_.toLong).sum)
    }
    viewRows(mv) shouldBe expect
  }

  // ---------------------------------------------------------------- joins

  private val joinSql =
    """SELECT l.k AS k, l.v AS lv, r.w AS rw
      |FROM __L__ l JOIN __R__ r ON l.k = r.k""".stripMargin

  private def writePairs(dir: String, rows: Seq[(Long, Long)],
      cols: (String, String), mode: String): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF(cols._1, cols._2)
      .write.format("graft-avro").mode(mode).save(dir)
  }

  private def joinRows(dir: String): Seq[(Long, Long, Long)] =
    spark.read.format("graft-avro").load(dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted

  test("join refresh equals full re-join across both sides' deltas") {
    val l = Catalog.tempDir("graft_mvj_l")
    val r = Catalog.tempDir("graft_mvj_r")
    val mv = Catalog.tempDir("graft_mvj_v")
    // duplicate keys on both sides: bag semantics must survive
    val l1 = Seq((1L, 10L), (1L, 11L), (2L, 20L), (9L, 90L))
    val r1 = Seq((1L, 100L), (2L, 200L), (2L, 201L), (8L, 800L))
    writePairs(l, l1, ("k", "v"), "overwrite")
    writePairs(r, r1, ("k", "w"), "overwrite")
    GraftMatviews.createJoin(spark, mv, l, r, joinSql) shouldBe ((1L, 1L))

    def expect(ls: Seq[(Long, Long)], rs: Seq[(Long, Long)]) =
      (for { (lk, lv) <- ls; (rk, rw) <- rs if lk == rk }
        yield (lk, lv, rw)).sorted
    joinRows(mv) shouldBe expect(l1, r1)

    // BOTH sides move before one refresh: exercises ΔL⋈R_new,
    // L_old⋈ΔR, and the ΔL⋈ΔR cross term in a single pass
    val l2 = Seq((2L, 21L), (8L, 80L), (3L, 30L))
    val r2 = Seq((1L, 101L), (9L, 900L), (3L, 300L))
    writePairs(l, l2, ("k", "v"), "append")
    writePairs(r, r2, ("k", "w"), "append")
    GraftMatviews.refreshJoin(spark, mv) shouldBe (((1L, 2L), (1L, 2L)))
    joinRows(mv) shouldBe expect(l1 ++ l2, r1 ++ r2)

    // one-sided move
    val l3 = Seq((9L, 91L))
    writePairs(l, l3, ("k", "v"), "append")
    GraftMatviews.refreshJoin(spark, mv) shouldBe (((2L, 3L), (2L, 2L)))
    joinRows(mv) shouldBe expect(l1 ++ l2 ++ l3, r1 ++ r2)

    // no-op
    GraftMatviews.refreshJoin(spark, mv) shouldBe (((3L, 3L), (2L, 2L)))
    joinRows(mv) shouldBe expect(l1 ++ l2 ++ l3, r1 ++ r2)
  }

  test("join refresh fails loudly on a non-additive source window") {
    val l = Catalog.tempDir("graft_mvj_l2")
    val r = Catalog.tempDir("graft_mvj_r2")
    val mv = Catalog.tempDir("graft_mvj_v2")
    writePairs(l, Seq((1L, 10L)), ("k", "v"), "overwrite")
    writePairs(r, Seq((1L, 100L)), ("k", "w"), "overwrite")
    GraftMatviews.createJoin(spark, mv, l, r, joinSql)
    writePairs(r, Seq((2L, 200L)), ("k", "w"), "append")
    AvroMaintenance.deleteWhere(spark, r, "k", Seq(1L))
    val e = intercept[Exception] { GraftMatviews.refreshJoin(spark, mv) }
    e.getMessage.toLowerCase should include regex "additive|delete"
    // the explicit escape hatch: allowRebuild recomputes the join at
    // the sources' pinned CURRENT versions and overwrites the view —
    // correct through the delete, never silent
    GraftMatviews.refreshJoin(spark, mv, allowRebuild = true)
    joinRows(mv) shouldBe Seq.empty // k=1 deleted on the right: no pairs
    // and the view is consistent again: a later additive refresh works
    writePairs(l, Seq((2L, 20L)), ("k", "v"), "append")
    GraftMatviews.refreshJoin(spark, mv)
    joinRows(mv) shouldBe Seq((2L, 20L, 200L))
  }

  test("counting join view maintains through DELETES on either side") {
    val l = Catalog.tempDir("graft_mvjc_l")
    val r = Catalog.tempDir("graft_mvjc_r")
    val mv = Catalog.tempDir("graft_mvjc_v")
    // duplicate keys: multiplicities > 1 must fold exactly
    var lRows = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L))
    var rRows = Seq((1L, 100L), (2L, 200L), (2L, 201L), (3L, 300L))
    writePairs(l, lRows, ("k", "v"), "overwrite")
    writePairs(r, rRows, ("k", "w"), "overwrite")
    GraftMatviews.createJoinCounting(spark, mv, l, r, joinSql) shouldBe
      ((1L, 1L))

    def expect(ls: Seq[(Long, Long)], rs: Seq[(Long, Long)]) =
      (for { (lk, lv) <- ls; (rk, rw) <- rs if lk == rk }
        yield (lk, lv, rw)).groupBy(identity)
        .map { case (row, xs) => (row._1, row._2, row._3, xs.size.toLong) }
        .toSeq.sorted
    def got(): Seq[(Long, Long, Long, Long)] =
      spark.read.format("graft-avro").load(mv).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          x.getAs[Long]("_mv_n"))).toSeq.sorted
    got() shouldBe expect(lRows, rRows)

    // append on L + equality DELETE on R in one window: the signed
    // deltas fold, k=2's groups VANISH, no rebuild flag needed
    writePairs(l, Seq((2L, 21L), (9L, 90L)), ("k", "v"), "append")
    lRows ++= Seq((2L, 21L), (9L, 90L))
    AvroMaintenance.deleteWhere(spark, r, "k", Seq(2L))
    rRows = rRows.filterNot(_._1 == 2L)
    GraftMatviews.refreshJoin(spark, mv)
    got() shouldBe expect(lRows, rRows)
    got().map(_._1) should not contain 2L

    // positional (MoR-style) delete on L: kills ONE of k=1's dup rows —
    // the multiplicity decrements, the row survives at n reflecting it
    val rel = AvroFileSource.listLive(new java.io.File(l)).map(_._1)
      .map(f => new java.io.File(l).getAbsoluteFile.toPath
        .relativize(f.getAbsoluteFile.toPath).toString)
      .find { rl =>
        spark.read.format("graft-avro").load(l)
          .select(org.apache.spark.sql.functions
            .col(AvroFileSource.MetaFile), org.apache.spark.sql.functions
            .col("v"))
          .filter("v = 10").head().getString(0) == rl
      }.get
    val ord = spark.read.format("graft-avro").load(l)
      .select(org.apache.spark.sql.functions
        .col(AvroFileSource.MetaPos), org.apache.spark.sql.functions
        .col("v"))
      .filter("v = 10").head().getLong(0)
    AvroMaintenance.deleteAtPositions(l, rel, Seq(ord))
    lRows = {
      val i = lRows.indexOf((1L, 10L))
      lRows.patch(i, Nil, 1)
    }
    GraftMatviews.refreshJoin(spark, mv)
    got() shouldBe expect(lRows, rRows)
  }

  test("3-way BAG view: append-only telescoping deltas (r20)") {
    val a = Catalog.tempDir("graft_mvb3_a")
    val b = Catalog.tempDir("graft_mvb3_b")
    val c = Catalog.tempDir("graft_mvb3_c")
    val mv = Catalog.tempDir("graft_mvb3_v")
    val sql3 =
      """SELECT a.k AS k, a.v AS av, b.w AS bw, c.x AS cx
        |FROM __S1__ a JOIN __S2__ b ON a.k = b.k
        |JOIN __S3__ c ON b.k = c.k""".stripMargin
    var aR = Seq((1L, 10L), (2L, 20L), (2L, 21L))
    var bR = Seq((1L, 100L), (2L, 200L))
    var cR = Seq((1L, 1000L), (2L, 2000L), (2L, 2001L))
    writePairs(a, aR, ("k", "v"), "overwrite")
    writePairs(b, bR, ("k", "w"), "overwrite")
    writePairs(c, cR, ("k", "x"), "overwrite")
    GraftMatviews.createJoinN(spark, mv, Seq(a, b, c), sql3,
      counting = false) shouldBe Seq(1L, 1L, 1L)
    def expect(as: Seq[(Long, Long)], bs: Seq[(Long, Long)],
        cs: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] =
      (for { (ak, av) <- as; (bk, bw) <- bs if ak == bk
             (ck, cx) <- cs if bk == ck } yield (ak, av, bw, cx)).sorted
    def got(): Seq[(Long, Long, Long, Long)] =
      spark.read.format("graft-avro").load(mv).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          x.getLong(3))).toSeq.sorted
    got() shouldBe expect(aR, bR, cR)
    // all three sources move in one window: every telescoping term
    // (incl. the triple cross delta) must land exactly once
    writePairs(a, Seq((3L, 30L), (1L, 11L)), ("k", "v"), "append")
    aR ++= Seq((3L, 30L), (1L, 11L))
    writePairs(b, Seq((3L, 300L), (2L, 201L)), ("k", "w"), "append")
    bR ++= Seq((3L, 300L), (2L, 201L))
    writePairs(c, Seq((3L, 3000L), (1L, 1001L)), ("k", "x"), "append")
    cR ++= Seq((3L, 3000L), (1L, 1001L))
    GraftMatviews.refreshJoinN(spark, mv) shouldBe
      Seq((1L, 2L), (1L, 2L), (1L, 2L))
    got() shouldBe expect(aR, bR, cR)
    // only the middle source moves: two no-op windows
    writePairs(b, Seq((1L, 101L)), ("k", "w"), "append")
    bR ++= Seq((1L, 101L))
    GraftMatviews.refreshJoinN(spark, mv) shouldBe
      Seq((2L, 2L), (2L, 3L), (2L, 2L))
    got() shouldBe expect(aR, bR, cR)
  }

  test("3-way counting view: deltas on every source, middle delete (r20)") {
    val a = Catalog.tempDir("graft_mvj3_a")
    val b = Catalog.tempDir("graft_mvj3_b")
    val c = Catalog.tempDir("graft_mvj3_c")
    val mv = Catalog.tempDir("graft_mvj3_v")
    val sql3 =
      """SELECT a.k AS k, a.v AS av, b.w AS bw, c.x AS cx
        |FROM __S1__ a JOIN __S2__ b ON a.k = b.k
        |JOIN __S3__ c ON b.k = c.k""".stripMargin
    // duplicate keys on every side: the 3-linear fold must stay exact
    var aR = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L))
    var bR = Seq((1L, 100L), (2L, 200L), (2L, 201L), (3L, 300L))
    var cR = Seq((1L, 1000L), (2L, 2000L), (3L, 3000L), (3L, 3001L))
    writePairs(a, aR, ("k", "v"), "overwrite")
    writePairs(b, bR, ("k", "w"), "overwrite")
    writePairs(c, cR, ("k", "x"), "overwrite")
    GraftMatviews.createJoinCountingN(spark, mv, Seq(a, b, c),
      sql3) shouldBe Seq(1L, 1L, 1L)

    def expect(as: Seq[(Long, Long)], bs: Seq[(Long, Long)],
        cs: Seq[(Long, Long)]) =
      (for { (ak, av) <- as; (bk, bw) <- bs if ak == bk
             (ck, cx) <- cs if bk == ck }
        yield (ak, av, bw, cx)).groupBy(identity)
        .map { case (row, xs) =>
          (row._1, row._2, row._3, row._4, xs.size.toLong) }
        .toSeq.sorted
    def got(): Seq[(Long, Long, Long, Long, Long)] =
      spark.read.format("graft-avro").load(mv).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          x.getLong(3), x.getAs[Long]("_mv_n"))).toSeq.sorted
    got() shouldBe expect(aR, bR, cR)

    // every source moves in ONE window (all cross deltas exercised) —
    // AND an equality DELETE on the MIDDLE source kills k=2 entirely:
    // the telescoping signed sum must vanish those groups, no rebuild
    writePairs(a, Seq((2L, 21L), (9L, 90L)), ("k", "v"), "append")
    aR ++= Seq((2L, 21L), (9L, 90L))
    AvroMaintenance.deleteWhere(spark, b, "k", Seq(2L))
    bR = bR.filterNot(_._1 == 2L)
    writePairs(b, Seq((9L, 900L), (3L, 301L)), ("k", "w"), "append")
    bR ++= Seq((9L, 900L), (3L, 301L))
    writePairs(c, Seq((9L, 9000L), (1L, 1001L)), ("k", "x"), "append")
    cR ++= Seq((9L, 9000L), (1L, 1001L))
    GraftMatviews.refreshJoinN(spark, mv) shouldBe
      Seq((1L, 2L), (1L, 3L), (1L, 2L))
    got() shouldBe expect(aR, bR, cR)
    got().map(_._1) should not contain 2L

    // second window: delete on the LAST source decrements a dup group
    AvroMaintenance.deleteWhere(spark, c, "x", Seq(3001L))
    cR = cR.filterNot(_._2 == 3001L)
    GraftMatviews.refreshJoinN(spark, mv) shouldBe
      Seq((2L, 2L), (3L, 3L), (2L, 3L))
    got() shouldBe expect(aR, bR, cR)

    // sidecar round-trip: the nway form re-reads identically
    val spec = GraftMatviews.readJoinSpec(new java.io.File(mv))
    spec.sources.length shouldBe 3
    spec.counting shouldBe true
    spec.lastVs shouldBe Seq(2L, 3L, 3L)
  }

  test("join view create/refresh guardrails") {
    val l = Catalog.tempDir("graft_mvj_l3")
    val r = Catalog.tempDir("graft_mvj_r3")
    val mv = Catalog.tempDir("graft_mvj_v3")
    writePairs(l, Seq((1L, 10L)), ("k", "v"), "overwrite")
    writePairs(r, Seq((1L, 100L)), ("k", "w"), "overwrite")
    GraftMatviews.createJoin(spark, mv, l, r, joinSql)
    intercept[IllegalArgumentException] {
      GraftMatviews.createJoin(spark, mv, l, r, joinSql)
    }.getMessage should include("already")
    // an aggregate view dir refuses join refresh and vice versa
    intercept[IllegalArgumentException] {
      GraftMatviews.refreshJoin(spark, l)
    }.getMessage should include("_graft_mvjoin")
    intercept[IllegalArgumentException] {
      GraftMatviews.refresh(spark, mv)
    }.getMessage should include("_graft_matview")
    intercept[IllegalArgumentException] {
      GraftMatviews.createJoin(spark, Catalog.tempDir("graft_mvj_v4"),
        l, r, "SELECT 1 FROM __L__")
    }.getMessage should include("__R__")
  }

  test("double create and refresh of a non-view fail with diagnoses") {
    val src = Catalog.tempDir("graft_mv_src3")
    val mv = Catalog.tempDir("graft_mv_view3")
    writeGen(src, 0, 10, "overwrite")
    GraftMatviews.create(spark, mv, src, agg, merge)
    intercept[IllegalArgumentException] {
      GraftMatviews.create(spark, mv, src, agg, merge)
    }.getMessage should include("already")
    intercept[IllegalArgumentException] {
      GraftMatviews.refresh(spark, src)
    }.getMessage should include("_graft_matview")
    intercept[IllegalArgumentException] {
      GraftMatviews.create(spark, Catalog.tempDir("graft_mv_view4"),
        src, "SELECT k FROM nowhere", merge)
    }.getMessage should include("__SRC__")
  }
}
