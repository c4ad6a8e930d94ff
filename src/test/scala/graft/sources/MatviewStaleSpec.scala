package graft.sources

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.Catalog

/** Matview staleness budget (r18): `CALL system.set_matview_staleness`
  * opts a view into LAZY refresh at catalog-read time — a read finding
  * the view older than the budget runs the normal incremental refresh
  * first (under the view lock), while a fresh read costs zero Spark
  * jobs and leaves the view's journal untouched.
  */
class MatviewStaleSpec extends AnyFunSuite with SparkSpec with Matchers {

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

  private def version(dir: String): Long =
    AvroFileSource.readSnapshots(new File(dir))
      .lastOption.map(_.version).getOrElse(0L)

  private lazy val root: String = {
    spark.conf.set("spark.sql.catalog.mvstale",
      classOf[GraftCatalog].getName)
    val r = Catalog.tempDir("mvstale_cat")
    spark.conf.set("spark.sql.catalog.mvstale.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvstale.ns")
    r
  }

  test("stale catalog read refreshes once; fresh reads are zero-version") {
    val src = s"$root/ns/src"
    val mv = s"$root/ns/v"
    writeGen(src, 0, 100, "overwrite") // v1
    GraftMatviews.create(spark, mv, src, agg, merge)
    spark.sql(
      "CALL mvstale.system.set_matview_staleness('ns.v', 0)")
      .head().getLong(0) shouldBe 0L

    writeGen(src, 100, 150, "append") // v2 — the view is now stale
    Thread.sleep(5)
    val vBefore = version(mv)
    val got = spark.table("mvstale.ns.v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // the read folded the delta WITHOUT a manual CALL refresh_matview
    val expect = (0 until 150).groupBy(_ % 7).map { case (k, vs) =>
      k.toLong -> (vs.size.toLong, vs.map(_.toLong).sum)
    }
    got shouldBe expect
    // exactly one refresh commit (analysis may loadTable repeatedly —
    // the losers no-op under the view lock)
    version(mv) shouldBe vBefore + 1

    // fresh source: the next read leaves the view's journal untouched
    Thread.sleep(5)
    val vAfter = version(mv)
    spark.table("mvstale.ns.v").count() shouldBe 7L
    version(mv) shouldBe vAfter
  }

  test("join matviews honor the staleness budget too") {
    val l = s"$root/ns/jl"
    val r = s"$root/ns/jr"
    val mv = s"$root/ns/jv"
    val s2 = spark
    import s2.implicits._
    (0 until 50).map(i => (i.toLong % 5, i.toLong)).toDF("k", "lv")
      .write.format("graft-avro").mode("overwrite").save(l)
    (0L until 5L).map(k => (k, k * 10)).toDF("k", "rv")
      .write.format("graft-avro").mode("overwrite").save(r)
    GraftMatviews.createJoin(spark, mv, l, r,
      "SELECT a.k, a.lv, b.rv FROM __L__ a JOIN __R__ b ON a.k = b.k")
    spark.sql("CALL mvstale.system.set_matview_staleness('ns.jv', 0)")
    (50 until 80).map(i => (i.toLong % 5, i.toLong)).toDF("k", "lv")
      .write.format("graft-avro").mode("append").save(l)
    Thread.sleep(5)
    // the catalog read folds the left delta without a refresh CALL
    spark.table("mvstale.ns.jv").count() shouldBe 80L
    // fresh read: journal untouched
    Thread.sleep(5)
    val v = version(mv)
    spark.table("mvstale.ns.jv").count() shouldBe 80L
    version(mv) shouldBe v
  }

  test("inside the budget nothing refreshes; turning it off restores manual-only") {
    val src = s"$root/ns/src2"
    val mv = s"$root/ns/v2"
    writeGen(src, 0, 70, "overwrite")
    GraftMatviews.create(spark, mv, src, agg, merge)
    GraftMatviews.setMaxStaleness(mv, 3600000L) // 1 h budget
    writeGen(src, 70, 140, "append")
    // within the budget: the read serves the (stale) view as-is
    val vStale = version(mv)
    spark.table("mvstale.ns.v2").agg(
      org.apache.spark.sql.functions.sum("n")).head().getLong(0) shouldBe 70L
    version(mv) shouldBe vStale

    // budget off: even an ancient view stays manual-refresh-only
    GraftMatviews.setMaxStaleness(mv, -1L)
    GraftMatviews.readSpec(new File(mv)).maxStalenessMs shouldBe None
    spark.table("mvstale.ns.v2").count() shouldBe 7L
    version(mv) shouldBe vStale
    // manual refresh still works and stamps the verification time
    GraftMatviews.refresh(spark, mv)
    spark.table("mvstale.ns.v2").agg(
      org.apache.spark.sql.functions.sum("n")).head().getLong(0) shouldBe 140L
  }
}
