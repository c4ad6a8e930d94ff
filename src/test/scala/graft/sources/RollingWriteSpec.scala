package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Rolling writer (`targetFileBytes` option / `graft.targetFileBytes`
  * property): staged batch writes roll to a fresh container file once
  * the on-disk size crosses the target, so one huge task can never pin
  * one huge file. Every rolled file is a first-class file: own zone
  * bounds + sum cells + row count (metadata aggregates still serve),
  * own sort verification (the sorted claim survives), full round-trip.
  */
class RollingWriteSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp() = graft.operators.Catalog.tempDir("graft_roll")

  test("one task rolls into several bounded files, data exact") {
    val dir = tmp()
    spark.range(400000)
      .selectExpr("id as k", "repeat(cast(id as string), 4) as s")
      .coalesce(1)
      .write.format("graft-avro")
      .option("targetFileBytes", (256 * 1024).toString)
      .option("codec", "null")
      .mode("overwrite").save(dir)
    val files = AvroFileSource.listAvro(new java.io.File(dir))
    files.size should be > 3
    // bounded: target + one container block of slack (the roll check
    // observes flushed bytes only)
    files.foreach(f => f.length() should be < (512L * 1024))
    val back = spark.read.format("graft-avro").load(dir)
    back.count() shouldBe 400000L
    back.agg(F.sum("k")).head().getLong(0) shouldBe
      (0L until 400000L).sum
    // every rolled file carries manifest entries: the metadata
    // aggregate still serves with zero decode
    val agg = spark.read.format("graft-avro").load(dir)
      .agg(F.sum("k").as("s"), F.min("k"), F.max("k"))
    agg.queryExecution.executedPlan.toString should
      include("PushedAggregation")
  }

  test("rolling preserves the verified sorted claim and zone pruning") {
    val dir = tmp()
    spark.range(300000).selectExpr("id as k")
      .orderBy("k").coalesce(1)
      .write.format("graft-avro")
      .option("sortedBy", "k")
      .option("targetFileBytes", (128 * 1024).toString)
      .option("codec", "null")
      .mode("overwrite").save(dir)
    val d = new java.io.File(dir)
    AvroFileSource.listAvro(d).size should be > 2
    AvroFileSource.sortedColumnOf(d) shouldBe Some("k")
    // disjoint per-file zones: a point predicate plans few partitions
    val q = spark.read.format("graft-avro").load(dir).filter("k = 250000")
    q.rdd.getNumPartitions shouldBe 1
    q.collect().map(_.getLong(0)).toSeq shouldBe Seq(250000L)
  }

  test("partitioned rolling: per-dir bounded files, values routed") {
    val dir = tmp()
    spark.range(200000)
      .selectExpr("id as k", "cast(id % 2 as string) as p",
        "repeat('x', 20) as pad")
      .coalesce(1)
      .write.format("graft-avro")
      .option("partitionBy", "p")
      .option("targetFileBytes", (128 * 1024).toString)
      .option("codec", "null")
      .mode("overwrite").save(dir)
    val byPart = AvroFileSource.listPartitioned(new java.io.File(dir))
      .groupBy(_._2.get("p"))
    byPart.keySet shouldBe Set(Some("0"), Some("1"))
    byPart.values.foreach(_.size should be > 1)
    spark.read.format("graft-avro").load(dir)
      .groupBy("p").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("0" -> 100000L, "1" -> 100000L)
  }

  test("the table property drives SQL INSERT rolling") {
    val root = tmp()
    spark.conf.set("spark.sql.catalog.groll",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.groll.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS groll.ns")
    spark.sql("DROP TABLE IF EXISTS groll.ns.t")
    spark.sql("CREATE TABLE groll.ns.t (k BIGINT, s STRING) " +
      "TBLPROPERTIES ('graft.targetFileBytes' = '131072', " +
      "'graft.codec' = 'null')")
    spark.sql("INSERT INTO groll.ns.t " +
      "SELECT id, repeat(cast(id as string), 6) FROM range(200000)")
    val d = new java.io.File(root, "ns/t")
    AvroFileSource.listAvro(d).size should be >
      spark.sparkContext.defaultParallelism / 8 // rolled beyond 1/task
    spark.sql("SELECT count(*) FROM groll.ns.t").head().getLong(0) shouldBe
      200000L
  }
}
