package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Declarative writer-layout properties (`_graft_props`): table-level
  * defaults for sortedBy/requestSort/bloomFor/ndvFor/trigramFor/codec
  * so SQL INSERTs (which cannot pass writer options) get the declared
  * layout. Explicit write options override; unknown graft.* keys refuse.
  */
class TablePropsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp() = graft.operators.Catalog.tempDir("graft_props")

  test("TBLPROPERTIES drive SQL INSERT layout: sort, zones, blooms") {
    spark.conf.set("spark.sql.catalog.gprops",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gprops.root", tmp())
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gprops.ns")
    spark.sql("DROP TABLE IF EXISTS gprops.ns.t")
    spark.sql("""CREATE TABLE gprops.ns.t (k BIGINT NOT NULL, s STRING)
                 TBLPROPERTIES ('graft.sortedBy' = 'k',
                   'graft.requestSort' = 'true',
                   'graft.bloomFor' = 's')""")
    // deliberately UNSORTED insert: requestSort must add the sort
    spark.sql("INSERT INTO gprops.ns.t " +
      "SELECT (id * 37) % 1000, cast(id as string) FROM range(1000)")
    val dir = spark.sql("SHOW TBLPROPERTIES gprops.ns.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    dir("graft.sortedBy") shouldBe "k"
    val d = new java.io.File(spark.conf
      .get("spark.sql.catalog.gprops.root"), "ns/t")
    AvroFileSource.sortedColumnOf(d) shouldBe Some("k")
    AvroFileSource.bloomFile(d).isFile shouldBe true
    // the declared sort makes metadata MIN/MAX serve from the manifest
    val agg = spark.sql("SELECT min(k), max(k) FROM gprops.ns.t")
    agg.queryExecution.executedPlan.toString should
      include("PushedAggregation")
    val r = agg.collect().head
    (r.getLong(0), r.getLong(1)) shouldBe
      ((0L until 1000L).map(i => (i * 37) % 1000).min,
        (0L until 1000L).map(i => (i * 37) % 1000).max)
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES round-trips") {
    spark.conf.set("spark.sql.catalog.gprops2",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gprops2.root", tmp())
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gprops2.ns")
    spark.sql("DROP TABLE IF EXISTS gprops2.ns.t")
    spark.sql("CREATE TABLE gprops2.ns.t (k BIGINT, s STRING)")
    spark.sql("ALTER TABLE gprops2.ns.t SET TBLPROPERTIES " +
      "('graft.ndvFor' = 'k', 'graft.codec' = 'deflate')")
    val d = new java.io.File(spark.conf
      .get("spark.sql.catalog.gprops2.root"), "ns/t")
    AvroFileSource.readProps(d) shouldBe
      Map("graft.ndvFor" -> "k", "graft.codec" -> "deflate")
    spark.sql("INSERT INTO gprops2.ns.t SELECT id, 'x' FROM range(50)")
    AvroFileSource.ndvFile(d).isFile shouldBe true
    // the recorded container codec honors the property
    val f = AvroFileSource.listAvro(d).head
    val rd = new org.apache.avro.file.DataFileReader(f,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    try rd.getMetaString("avro.codec") shouldBe "deflate"
    finally rd.close()
    spark.sql("ALTER TABLE gprops2.ns.t UNSET TBLPROPERTIES " +
      "('graft.ndvFor', 'graft.codec')")
    AvroFileSource.readProps(d) shouldBe Map.empty
  }

  test("explicit write options override properties; unknown keys refuse") {
    val dir = tmp()
    spark.range(5).selectExpr("id as k")
      .write.format("graft-avro").mode("overwrite").save(dir)
    AvroMaintenance.setTableProperties(dir, Map("graft.codec" -> "deflate"))
    // explicit option wins over the property
    spark.range(5, 10).selectExpr("id as k")
      .write.format("graft-avro").option("codec", "zstandard")
      .mode("append").save(dir)
    val files = AvroFileSource.listAvro(new java.io.File(dir))
    val codecs = files.map { f =>
      val rd = new org.apache.avro.file.DataFileReader(f,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try rd.getMetaString("avro.codec") finally rd.close()
    }.toSet
    codecs should contain("zstandard")
    intercept[IllegalArgumentException] {
      AvroMaintenance.setTableProperties(dir, Map("graft.bogus" -> "x"))
    }
    // non-graft keys via SQL refuse too
    spark.conf.set("spark.sql.catalog.gprops3",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gprops3.root", tmp())
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gprops3.ns")
    spark.sql("CREATE TABLE IF NOT EXISTS gprops3.ns.t (k BIGINT)")
    intercept[Exception] {
      spark.sql("ALTER TABLE gprops3.ns.t SET TBLPROPERTIES ('foo' = '1')")
    }
  }
}
