package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Probe: Spark 4.1's analyzer resolves PERSISTENT v2 views
  * (ResolvedPersistentView) even though OSS ships no v2 CREATE VIEW
  * exec — so reads go through plain SQL while DDL goes through the
  * CALL procedures.
  */
class ViewReadProbeSpec extends AnyFunSuite with SparkSpec with Matchers {

  private lazy val root = graft.operators.Catalog.tempDir("graft_viewprobe")

  test("a sidecar-written view resolves and re-analyzes through SELECT") {
    spark.conf.set("spark.sql.catalog.graft_vp",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_vp.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_vp.ns")
    spark.sql("DROP TABLE IF EXISTS graft_vp.ns.base")
    spark.sql("CREATE TABLE graft_vp.ns.base AS SELECT id AS k FROM range(10)")
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("ns"), "v")
    val sql = "SELECT count(*) AS n, sum(k) AS s FROM graft_vp.ns.base"
    val schema = spark.sql(sql).schema
    GraftViews.write(new java.io.File(s"$root/ns"),
      new org.apache.spark.sql.connector.catalog.ViewInfo(ident, sql,
        "graft_vp", Array("ns"), schema, schema.fieldNames,
        Array.empty, Array.empty, new java.util.HashMap[String, String]()))
    new java.io.File(s"$root/ns/_graft_view_v").isFile shouldBe true
    val cat = spark.sessionState.catalogManager.catalog("graft_vp")
      .asInstanceOf[GraftCatalog]
    cat.viewExists(ident) shouldBe true
    cat.loadView(ident).query() shouldBe sql
    val r = spark.sql("SELECT * FROM graft_vp.ns.v").head()
    r.getLong(0) shouldBe 10L
    r.getLong(1) shouldBe 45L
    // live: view re-analyzes over new data
    spark.sql("INSERT INTO graft_vp.ns.base VALUES (100)")
    spark.sql("SELECT n FROM graft_vp.ns.v").head().getLong(0) shouldBe 11L
  }
}
