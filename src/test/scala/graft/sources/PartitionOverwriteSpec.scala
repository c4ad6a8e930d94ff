package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Partition overwrite: dynamic mode archives exactly the partition
  * dirs the new files land in; static `PARTITION (p='x')` archives the
  * matching partition via the filter-overwrite path; untouched
  * partitions, time travel, and posdel entries of surviving files all
  * hold.
  */
class PartitionOverwriteSpec extends AnyFunSuite with SparkSpec
    with Matchers {

  private def tmp() = graft.operators.Catalog.tempDir("graft_pow")

  private def mkCat(name: String): String = {
    val root = tmp()
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.ns")
    root
  }

  test("dynamic overwrite replaces only the written partitions") {
    val root = mkCat("gpow1")
    spark.sql("DROP TABLE IF EXISTS gpow1.ns.t")
    spark.sql("CREATE TABLE gpow1.ns.t (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO gpow1.ns.t VALUES " +
      "(1, 'a'), (2, 'a'), (3, 'b'), (4, 'c')")
    withSQLConf("spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
      spark.sql("INSERT OVERWRITE gpow1.ns.t VALUES (10, 'a'), (11, 'a')")
    }
    spark.sql("SELECT k FROM gpow1.ns.t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq shouldBe Seq(3L, 4L, 10L, 11L)
    // journal: the partial overwrite minted an 'overwrite' version and
    // time travel still serves the replaced partition
    val d = new java.io.File(root, "ns/t")
    AvroFileSource.readSnapshots(d).last.kind shouldBe "overwrite"
    spark.sql("SELECT k FROM gpow1.ns.t VERSION AS OF 1 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L, 3L, 4L)
  }

  test("static PARTITION (p='x') overwrite replaces one partition") {
    mkCat("gpow2")
    spark.sql("DROP TABLE IF EXISTS gpow2.ns.t")
    spark.sql("CREATE TABLE gpow2.ns.t (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO gpow2.ns.t VALUES (1, 'a'), (3, 'b'), (4, 'b')")
    spark.sql("INSERT OVERWRITE gpow2.ns.t PARTITION (p = 'b') " +
      "SELECT 30 AS k")
    spark.sql("SELECT k, p FROM gpow2.ns.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((1L, "a"), (30L, "b"))
    // plain INSERT OVERWRITE (static, no partition spec) = truncate
    spark.sql("INSERT OVERWRITE gpow2.ns.t VALUES (99, 'z')")
    spark.sql("SELECT k FROM gpow2.ns.t").collect()
      .map(_.getLong(0)).toSeq shouldBe Seq(99L)
  }

  test("posdel entries survive on untouched partitions only") {
    val root = mkCat("gpow3")
    spark.sql("DROP TABLE IF EXISTS gpow3.ns.t")
    spark.sql("CREATE TABLE gpow3.ns.t (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO gpow3.ns.t " +
      "SELECT id, if(id < 5, 'a', 'b') FROM range(10)")
    val d = new java.io.File(root, "ns/t")
    val base = d.getAbsoluteFile.toPath
    // kill one row in each partition positionally
    Seq("a", "b").foreach { pv =>
      val rel = AvroFileSource.listPartitioned(d).collectFirst {
        case (f, m) if m.get("p").contains(pv) =>
          base.relativize(f.getAbsoluteFile.toPath).toString
      }.get
      AvroMaintenance.deleteAtPositions(d.getPath, rel, Seq(0L))
    }
    spark.sql("SELECT count(*) FROM gpow3.ns.t").head().getLong(0) shouldBe 8
    withSQLConf("spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
      spark.sql("INSERT OVERWRITE gpow3.ns.t VALUES (100, 'b'), (101, 'b')")
    }
    // partition a: 5 rows minus its posdel; partition b: the 2 new rows
    spark.sql("SELECT count(*) FROM gpow3.ns.t").head().getLong(0) shouldBe 6
    AvroFileSource.readPosdel(d).keys.foreach(rel =>
      rel should startWith("p=a"))
  }

  test("non-partition overwrite conditions refuse") {
    mkCat("gpow4")
    spark.sql("DROP TABLE IF EXISTS gpow4.ns.t")
    spark.sql("CREATE TABLE gpow4.ns.t (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO gpow4.ns.t VALUES (1, 'a')")
    val ex = intercept[Exception] {
      spark.range(5).selectExpr("id as k", "'a' as p")
        .writeTo("gpow4.ns.t").overwrite(F.col("k") === 1L)
    }
    ex.getMessage should include("partition column")
  }

  private def withSQLConf(kv: (String, String)*)(body: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
