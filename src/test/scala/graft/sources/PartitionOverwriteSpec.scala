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

  test("compactPartition rewrites ONE partition; others byte-untouched") {
    val dir = tmp()
    import java.io.File
    // many small files per partition: 6 single-row appends per value
    (0 until 6).foreach { i =>
      spark.createDataFrame(Seq((i.toLong, "a"), (i + 100L, "b")))
        .toDF("k", "p").repartition(2)
        .write.format("graft-avro").option("partitionBy", "p")
        .mode(if (i == 0) "overwrite" else "append").save(dir)
    }
    // a pending equality delete must materialize through the rewrite
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(3L))
    def filesOf(seg: String): Seq[String] =
      AvroFileSource.listPartitioned(new File(dir)).collect {
        case (f, vals) if vals.get("p").contains(seg) => f.getName
      }
    val aBefore = filesOf("a")
    val bBefore = filesOf("b")
    aBefore.size should be > 3
    val vBefore = AvroFileSource.readSnapshots(new File(dir)).last.version
    val n = AvroMaintenance.compactPartition(spark, dir, "p", "a",
      512L * 1024 * 1024)
    n shouldBe 1
    // the compacted partition collapsed; the other is BYTE-identical
    filesOf("a").size shouldBe 1
    filesOf("b") shouldBe bBefore
    // content: k=3 materialized away, everything else intact
    val back = spark.read.format("graft-avro").load(dir)
    back.filter(F.col("p") === "a").collect().map(_.getLong(0)).sorted
      .toSeq shouldBe Seq(0L, 1L, 2L, 4L, 5L)
    back.filter(F.col("p") === "b").count() shouldBe 6
    // one new journal version; time travel across the compaction works
    AvroFileSource.readSnapshots(new File(dir)).last.version shouldBe
      vBefore + 1
    spark.read.format("graft-avro").option("versionAsOf", vBefore)
      .load(dir).filter(F.col("p") === "a").count() shouldBe 5
    // value with no live files is a no-op
    AvroMaintenance.compactPartition(spark, dir, "p", "zz",
      512L * 1024 * 1024) shouldBe 0
    // a non-partition column refuses — with the MEMBERSHIP message, not
    // the partition-evolution one, and BEFORE the empty-target early
    // return (a typo'd column must never silently no-op)
    val e = intercept[IllegalArgumentException] {
      AvroMaintenance.compactPartition(spark, dir, "k", "1", 1024L)
    }
    e.getMessage should include("not an identity partition column")
    val e2 = intercept[IllegalArgumentException] {
      AvroMaintenance.compactPartition(spark, dir, "nosuch", "zz", 1024L)
    }
    e2.getMessage should include("not an identity partition column")
  }

  test("CALL system.compact_partition drives the same rewrite") {
    val root = mkCat("gpow5")
    spark.sql("DROP TABLE IF EXISTS gpow5.ns.cp")
    spark.sql("CREATE TABLE gpow5.ns.cp (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO gpow5.ns.cp VALUES ($i, 'x'), ($i, 'y')")
    }
    val d = new java.io.File(root, "ns/cp")
    val before = AvroFileSource.listPartitioned(d).size
    spark.sql("CALL gpow5.system.compact_partition('ns.cp', 'p', 'x', " +
      s"${512L * 1024 * 1024})").head().getLong(0) shouldBe 1L
    AvroFileSource.listPartitioned(d).size should be < before
    spark.sql("SELECT count(*) FROM gpow5.ns.cp WHERE p = 'x'")
      .head().getLong(0) shouldBe 4
    spark.sql("SELECT count(*) FROM gpow5.ns.cp WHERE p = 'y'")
      .head().getLong(0) shouldBe 4
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
