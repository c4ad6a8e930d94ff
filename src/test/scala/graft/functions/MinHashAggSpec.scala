package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Specs for the native minhash4 TypedImperativeAggregate. */
class MinHashAggSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def sigOf(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] = {
    VectorFunctions.register(spark)
    df.groupBy("g").agg(VectorFunctions.minhash4(F.col("s")).as("sig"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
  }

  test("matches the per-lane md5-slice min computed with built-ins") {
    import spark.implicits._
    val df = Seq(("a", "alpha"), ("a", "beta"), ("a", "gamma"), ("b", "delta"))
      .toDF("g", "s")
    val got = sigOf(df)
    val expected = df
      .select(F.col("g"), F.md5(F.col("s")).as("h"))
      .select(F.col("g") +: (0 until 4).map(i =>
        F.conv(F.substring(F.col("h"), 1 + 8 * i, 8), 16, 10)
          .cast("long").as(s"l$i")): _*)
      .groupBy("g")
      .agg(F.min("l0"), F.min("l1"), F.min("l2"), F.min("l3"))
      .collect()
      .map(r => r.getString(0) -> (1 to 4).map(r.getLong(_)).toList).toMap
    got shouldBe expected
  }

  test("merge is order-independent: any partitioning yields the same signature") {
    import spark.implicits._
    val rows = (0 until 500).map(i => (s"g${i % 3}", s"value_$i"))
    val df = rows.toDF("g", "s")
    val one = sigOf(df.coalesce(1))
    val many = sigOf(df.repartition(32))
    val skewed = sigOf(df.repartition(7, F.col("s")))
    one shouldBe many
    one shouldBe skewed
  }

  test("null inputs are skipped; identical sets give identical signatures") {
    import spark.implicits._
    val a = Seq(("x", "p"), ("x", "q")).toDF("g", "s")
    val b = Seq(("x", "q"), ("x", "p"), ("x", null.asInstanceOf[String]))
      .toDF("g", "s")
    sigOf(a)("x") shouldBe sigOf(b)("x")
  }

  test("signature lane equality estimates Jaccard similarity directionally") {
    import spark.implicits._
    // identical sets agree on all 4 lanes; disjoint sets agree on none
    // (these particular values share no lane minima)
    val same = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v")).toDF("g", "s")
    val sigs = sigOf(same)
    sigs("a") shouldBe sigs("b")
    val disjoint = Seq(("a", "u1"), ("a", "u2"), ("b", "w1"), ("b", "w2"))
      .toDF("g", "s")
    val d = sigOf(disjoint)
    d("a") should not be d("b")
  }

  test("works through SQL text via GraftExtensions-style registration") {
    import spark.implicits._
    VectorFunctions.register(spark)
    Seq(("a", "alpha"), ("a", "beta")).toDF("g", "s")
      .createOrReplaceTempView("mh_sql_spec")
    val viaSql = spark.sql(
      "SELECT g, minhash4(s) AS sig FROM mh_sql_spec GROUP BY g")
      .collect().head.getSeq[Long](1)
    viaSql.length shouldBe 4
    all(viaSql) should be >= 0L
  }

  test("minhash8: lanes 0-3 equal minhash4; lanes 4-7 from the salted block") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq(("a", "alpha"), ("a", "beta"), ("b", "gamma")).toDF("g", "s")
    df.createOrReplaceTempView("mh_wide_spec")
    val wide = spark.sql(
      "SELECT g, minhash8(s) AS w, minhash4(s) AS n FROM mh_wide_spec GROUP BY g")
      .collect().map(r => (r.getString(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    wide.foreach { case (_, w, n) =>
      w.length shouldBe 8
      w.take(4) shouldBe n // block 0 is the unsalted digest in both
    }
    // salted block = element-wise min of md5('1' || s) slices
    val expected = df.filter($"g" === "a")
      .selectExpr("min(cast(conv(substring(md5(concat('1', s)), 1, 8), 16, 10) as bigint)) as h4")
      .head().getLong(0)
    wide.find(_._1 == "a").get._2(4) shouldBe expected
  }
}
