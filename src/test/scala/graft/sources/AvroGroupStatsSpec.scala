package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Grouped metadata MIN/MAX (+COUNT) by partition-path columns: each
  * file contributes (partition values, col-zone bounds, block-header
  * count) and Spark folds per key — zero rows decoded. Stand-downs:
  * positional deletes, missing/partial col-zone coverage, float
  * columns, truncated string bounds.
  */
class AvroGroupStatsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp() = graft.operators.Catalog.tempDir("graft_gstats")

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def grouped(dir: String): DataFrame =
    spark.read.format("graft-avro").load(dir)
      .groupBy("p")
      .agg(F.min("k").as("mn"), F.max("k").as("mx"),
        F.count(F.lit(1)).as("n"))

  test("grouped min/max/count serves from metadata, exact per key") {
    val dir = tmp()
    spark.range(1000)
      .selectExpr("id as k", "concat('p', cast(id % 5 as string)) as p")
      .write.format("graft-avro").option("partitionBy", "p")
      .mode("overwrite").save(dir)
    val df = grouped(dir)
    plan(df) should include(
      "PushedAggregation: [MIN(k), MAX(k), COUNT(*)]")
    plan(df) should include("PushedGroupBy: [p]")
    val got = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    (0 until 5).foreach { i =>
      val ks = (0 until 1000).filter(_ % 5 == i)
      got(s"p$i") shouldBe ((ks.min.toLong, ks.max.toLong,
        ks.size.toLong))
    }
  }

  test("all-null and partly-null columns: SQL semantics hold") {
    val dir = tmp()
    spark.range(100)
      .selectExpr(
        "if(id < 50, null, id) as k", // group 'a' all-null, 'b' valued
        "if(id < 50, 'a', 'b') as p")
      .write.format("graft-avro").option("partitionBy", "p")
      .mode("overwrite").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
      .groupBy("p").agg(F.min("k").as("mn"), F.max("k").as("mx"))
    plan(df) should include("PushedAggregation: [MIN(k), MAX(k)]")
    val got = df.collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    got("a") shouldBe ((None, None))
    got("b") shouldBe ((Some(50L), Some(99L)))
  }

  test("composes with a partition-decided filter") {
    val dir = tmp()
    spark.range(300)
      .selectExpr("id as k", "concat('g', cast(id % 3 as string)) as p")
      .write.format("graft-avro").option("partitionBy", "p")
      .mode("overwrite").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
      .filter("p IN ('g0', 'g2')")
      .groupBy("p").agg(F.min("k").as("mn"), F.max("k").as("mx"))
    plan(df) should include("PushedAggregation: [MIN(k), MAX(k)]")
    val got = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got should have size 2
    got("g0") shouldBe ((0L, 297L))
    got("g2") shouldBe ((2L, 299L))
  }

  test("positional deletes, float columns, missing manifest stand down") {
    val dir = tmp()
    spark.range(100)
      .selectExpr("id as k", "cast(id as double) as x",
        "if(id < 50, 'a', 'b') as p")
      .write.format("graft-avro").option("partitionBy", "p")
      .mode("overwrite").save(dir)
    // float/double aggregate: real rows
    val byX = spark.read.format("graft-avro").load(dir)
      .groupBy("p").agg(F.min("x").as("mn"))
    (plan(byX) should not).include("PushedAggregation")
    byX.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap shouldBe
      Map("a" -> 0.0, "b" -> 50.0)
    // manifest removed: real rows, same answer
    AvroFileSource.colZoneFile(new java.io.File(dir)).delete()
    val noMan = grouped(dir)
    (plan(noMan) should not).include("PushedAggregation")
    noMan.collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("a" -> 0L, "b" -> 50L)
  }

  test("posdel dead rows force the real-row path, results stay exact") {
    val dir = tmp()
    spark.range(100)
      .selectExpr("id as k", "if(id < 50, 'a', 'b') as p")
      .write.format("graft-avro").option("partitionBy", "p")
      .mode("overwrite").save(dir)
    val rel = AvroFileSource.listPartitioned(new java.io.File(dir))
      .collectFirst { case (f, pv) if pv.get("p").contains("a") =>
        new java.io.File(dir).getAbsoluteFile.toPath
          .relativize(f.getAbsoluteFile.toPath).toString }.get
    AvroMaintenance.deleteAtPositions(dir, rel, Seq(0L)) // kills k=0
    val df = grouped(dir)
    (plan(df) should not).include("PushedAggregation")
    val got = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    got("a") shouldBe ((1L, 49L, 49L))
    got("b") shouldBe ((50L, 99L, 50L))
  }

  test("string bounds at the truncation cap stand down") {
    val dir = tmp()
    spark.range(40)
      .selectExpr(
        s"concat('s', repeat('x', ${AvroFileSource.StringBoundMax + 8}), " +
          "cast(id as string)) as s",
        "if(id < 20, 'a', 'b') as p")
      .write.format("graft-avro").option("partitionBy", "p")
      .mode("overwrite").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
      .groupBy("p").agg(F.max("s").as("mx"))
    (plan(df) should not).include("PushedAggregation")
    df.count() shouldBe 2
  }
}
