package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Metadata-served SUM / COUNT(col) / COUNT(*) mixes: per-file exact
  * sums + non-null counts ride the all-column zone manifest under a
  * `sum:`-tagged type, and the pushdown folds them driver-side (or
  * emits per-file partials in the grouped path) — zero rows decoded.
  * Exactness guards: integral columns only, full coverage, addExact at
  * write AND fold (overflow anywhere stands down to a real scan, which
  * reproduces Spark's native semantics — an ANSI overflow error here),
  * all-null sums are NULL.
  */
class AvroSumMetaSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp() = graft.operators.Catalog.tempDir("graft_summeta")

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("ungrouped sum/count/min/max/count(*) mix serves from metadata") {
    val dir = tmp()
    spark.range(1000).selectExpr("id as k", "cast(id % 7 as int) as v")
      .write.format("graft-avro").mode("overwrite").save(dir)
    // two generations so the fold crosses files
    spark.range(1000, 1500).selectExpr("id as k", "cast(id % 7 as int) as v")
      .write.format("graft-avro").mode("append").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
      .agg(F.sum("k").as("s"), F.count("k").as("c"),
        F.min("k").as("mn"), F.max("k").as("mx"),
        F.count(F.lit(1)).as("n"), F.sum("v").as("sv"))
    plan(df) should include("SUM(k)")
    plan(df) should include("PushedAggregation")
    val r = df.collect().head
    r.getLong(0) shouldBe (0L until 1500L).sum
    r.getLong(1) shouldBe 1500L
    r.getLong(2) shouldBe 0L
    r.getLong(3) shouldBe 1499L
    r.getLong(4) shouldBe 1500L
    r.getLong(5) shouldBe (0 until 1500).map(_ % 7).sum.toLong
    // AVG rides for free: Spark's partial-pushdown rewrite splits it
    // into SUM + COUNT before offering the aggregation
    val avg = spark.read.format("graft-avro").load(dir)
      .agg(F.avg("k").as("a"))
    avg.collect().head.getDouble(0) shouldBe
      (0L until 1500L).sum.toDouble / 1500.0
  }

  test("null handling: sums skip nulls, all-null sum is NULL") {
    val dir = tmp()
    spark.range(100)
      .selectExpr("if(id % 2 = 0, id, null) as k",
        "cast(null as long) as dead")
      .write.format("graft-avro").mode("overwrite").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
      .agg(F.sum("k").as("s"), F.count("k").as("c"),
        F.sum("dead").as("sd"), F.count("dead").as("cd"))
    plan(df) should include("PushedAggregation")
    val r = df.collect().head
    r.getLong(0) shouldBe (0L until 100L).filter(_ % 2 == 0).sum
    r.getLong(1) shouldBe 50L
    r.isNullAt(2) shouldBe true
    r.getLong(3) shouldBe 0L
  }

  test("per-file overflow stands down; results match Spark's real scan") {
    val dir = tmp()
    spark.createDataFrame(Seq((Long.MaxValue, 1), (5L, 2)))
      .toDF("k", "t")
      .coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
      .agg(F.sum("k").as("s"))
    (plan(df) should not).include("PushedAggregation")
    // the real scan reproduces Spark's native semantics — under ANSI
    // (the Spark 4 default) that is an ARITHMETIC_OVERFLOW error, which
    // a metadata-served wrapped value would have silently swallowed
    val ex = intercept[Exception] { df.collect() }
    ex.getMessage should include("overflow")
  }

  test("fold overflow across covered files stands down") {
    val dir = tmp()
    spark.createDataFrame(Seq(Tuple1(Long.MaxValue - 5L))).toDF("k")
      .coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    spark.createDataFrame(Seq(Tuple1(100L))).toDF("k")
      .coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
      .agg(F.sum("k").as("s"))
    (plan(df) should not).include("PushedAggregation")
    val ex = intercept[Exception] { df.collect() }
    ex.getMessage should include("overflow")
  }

  test("equality deletes stand the sum path down") {
    val dir = tmp()
    spark.range(100).selectExpr("id as k", "cast(id as string) as s")
      .write.format("graft-avro").mode("overwrite").save(dir)
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(7L))
    val df = spark.read.format("graft-avro").load(dir)
      .agg(F.sum("k").as("s"), F.count("k").as("c"))
    (plan(df) should not).include("PushedAggregation")
    val r = df.collect().head
    r.getLong(0) shouldBe (0L until 100L).sum - 7L
    r.getLong(1) shouldBe 99L
  }

  test("non-integral sum columns fall back to a real scan") {
    val dir = tmp()
    spark.range(50).selectExpr("cast(id as double) as d")
      .write.format("graft-avro").mode("overwrite").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
      .agg(F.sum("d").as("s"))
    (plan(df) should not).include("PushedAggregation")
    df.collect().head.getDouble(0) shouldBe (0 until 50).sum.toDouble
  }

  test("zone-DECIDED filters compose: fold restricts to the keep-set") {
    val dir = tmp()
    // two disjoint-keyrange generations -> every file decides k > 599
    spark.range(600).selectExpr("id as k", "id * 3 as v")
      .write.format("graft-avro").mode("overwrite").save(dir)
    spark.range(600, 1000).selectExpr("id as k", "id * 3 as v")
      .write.format("graft-avro").mode("append").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
      .filter("k > 599")
      .agg(F.sum("v").as("s"), F.count("v").as("c"),
        F.min("k").as("mn"), F.max("k").as("mx"),
        F.count(F.lit(1)).as("n"))
    plan(df) should include("PushedAggregation")
    val r = df.collect().head
    r.getLong(0) shouldBe (600L until 1000L).map(_ * 3).sum
    r.getLong(1) shouldBe 400L
    r.getLong(2) shouldBe 600L
    r.getLong(3) shouldBe 999L
    r.getLong(4) shouldBe 400L
    // an UNDECIDED filter (cuts through a file) falls back to real rows
    val un = spark.read.format("graft-avro").load(dir)
      .filter("k > 500")
      .agg(F.sum("v").as("s"))
    (plan(un) should not).include("PushedAggregation")
    un.collect().head.getLong(0) shouldBe
      (501L until 1000L).map(_ * 3).sum
  }

  test("decided filters never serve the sort-zone min/max path") {
    val dir = tmp()
    spark.range(600).selectExpr("id as k")
      .orderBy("k")
      .write.format("graft-avro").option("sortedBy", "k")
      .mode("overwrite").save(dir)
    spark.range(600, 1000).selectExpr("id as k")
      .orderBy("k")
      .write.format("graft-avro").option("sortedBy", "k")
      .mode("append").save(dir)
    // min/max under a decided filter: served via the generalized
    // keep-set fold (col-zones), NOT the whole-table sort-zone fold
    val df = spark.read.format("graft-avro").load(dir)
      .filter("k > 599")
      .agg(F.min("k").as("mn"), F.max("k").as("mx"))
    plan(df) should include("PushedAggregation")
    val r = df.collect().head
    r.getLong(0) shouldBe 600L
    r.getLong(1) shouldBe 999L
  }

  test("grouped sum/count by partition columns serves from metadata") {
    val dir = tmp()
    spark.range(900)
      .selectExpr("id as k", "concat('p', cast(id % 3 as string)) as p")
      .write.format("graft-avro").option("partitionBy", "p")
      .mode("overwrite").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
      .groupBy("p")
      .agg(F.sum("k").as("s"), F.count("k").as("c"),
        F.max("k").as("mx"), F.count(F.lit(1)).as("n"))
    plan(df) should include("PushedAggregation")
    plan(df) should include("SUM(k)")
    val got = df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    (0 until 3).foreach { i =>
      val ks = (0 until 900).filter(_ % 3 == i)
      got(s"p$i") shouldBe ((ks.map(_.toLong).sum, ks.size.toLong,
        ks.max.toLong, ks.size.toLong))
    }
  }

  test("grouped all-null sum partials stay NULL per group") {
    val dir = tmp()
    spark.range(100)
      .selectExpr("if(id < 50, null, id) as k", // group 'a' all-null
        "if(id < 50, 'a', 'b') as p")
      .write.format("graft-avro").option("partitionBy", "p")
      .mode("overwrite").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
      .groupBy("p").agg(F.sum("k").as("s"), F.count("k").as("c"))
    plan(df) should include("PushedAggregation")
    val got = df.collect().map(r => r.getString(0) ->
      ((if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2)))).toMap
    got("a") shouldBe ((None, 0L))
    got("b") shouldBe ((Some((50L until 100L).sum), 50L))
  }
}
