package graft.functions

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.SparkSpec

class VectorExpressionsSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def df = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("a", ArrayType(FloatType, containsNull = false), nullable = true),
      StructField("b", ArrayType(FloatType, containsNull = false), nullable = true)))
    spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      org.apache.spark.sql.Row(2, Seq(0.5f, -2.0f), Seq(2.0f, 0.25f)),
      org.apache.spark.sql.Row(3, null, Seq(1.0f))
    ).asJava, schema)
  }

  "FloatVecDot" should {
    "compute the double dot product (codegen path)" in {
      VectorFunctions.register(spark)
      val out = df.select(F.col("id"),
        VectorFunctions.vec_dot(F.col("a"), F.col("b")).as("d"))
        .orderBy("id").collect()
      out(0).getDouble(1) shouldBe 32.0
      out(1).getDouble(1) shouldBe 0.5
      out(2).isNullAt(1) shouldBe true // null input → null out
    }

    "agree with the aggregate/zip_with HOF form bit-for-bit" in {
      VectorFunctions.register(spark)
      val both = df.filter(F.col("a").isNotNull).select(
        VectorFunctions.vec_dot(F.col("a"), F.col("b")).as("native"),
        F.expr("aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)").as("hof"))
        .collect()
      both.foreach { r => r.getDouble(0) shouldBe r.getDouble(1) }
    }

    "reject non-float-array inputs at analysis" in {
      VectorFunctions.register(spark)
      an[Exception] should be thrownBy
        df.select(VectorFunctions.vec_dot(F.col("id"), F.col("b"))).collect()
    }

    "sorted_overlap counts common elements of sorted distinct arrays" in {
      VectorFunctions.register(spark)
      import spark.implicits._
      val d = Seq(
        (Seq("a", "b", "d", "f"), Seq("b", "c", "d", "e", "f")),
        (Seq.empty[String], Seq("x")),
        (Seq("a"), Seq("a"))
      ).toDF("x", "y")
      val got = d.select(
        VectorFunctions.sorted_overlap(F.col("x"), F.col("y")).as("c"),
        F.size(F.array_intersect(F.col("x"), F.col("y"))).as("ref"))
        .collect()
      got.foreach { r => r.getInt(0) shouldBe r.getInt(1) }
      got.map(_.getInt(0)).toSeq shouldBe Seq(3, 0, 1)
    }

    "simhash16 matches the HOF reference formula" in {
      VectorFunctions.register(spark)
      import spark.implicits._
      val d = Seq(Seq("alpha", "bravo", "gamma"), Seq("x"), Seq.empty[String])
        .toDF("ws")
        .select(F.transform(F.col("ws"), w => F.md5(w)).as("hsw"))
      val got = d.select(
        VectorFunctions.simhash16(F.col("hsw")).as("native"),
        F.expr(
          """aggregate(sequence(0, 15), 0L, (acc, b) ->
            |  acc + if(
            |    aggregate(hsw, 0, (s, h) ->
            |      s + if(substring(h, b + 1, 1)
            |              in ('8','9','a','b','c','d','e','f'), 1, -1)) > 0,
            |    cast(pow(2.0, b) as long), 0L))""".stripMargin).as("hof"))
        .collect()
      got.foreach { r => r.getLong(0) shouldBe r.getLong(1) }
    }

    "norm2 is dot with itself" in {
      VectorFunctions.register(spark)
      val r = df.filter(F.col("id") === 1)
        .select(VectorFunctions.vec_norm2(F.col("a"))).collect().head
      r.getDouble(0) shouldBe (1.0 + 4.0 + 9.0)
    }
  }

  "LongVecL2" should {
    "compute exact squared L2 distance and agree with the HOF form" in {
      VectorFunctions.register(spark)
      import spark.implicits._
      val d = Seq(
        (Seq(1L, 2L, 3L), Seq(4L, 6L, 3L)),
        (Seq(-100000L, 0L), Seq(100000L, -5L)),
        (Seq(7L), Seq(7L))
      ).toDF("x", "y")
      val got = d.select(
        VectorFunctions.vec_l2sq(F.col("x"), F.col("y")).as("native"),
        F.expr("aggregate(zip_with(x, y, (a, b) -> (a - b) * (a - b)), " +
          "cast(0 as bigint), (acc, v) -> acc + v)").as("hof"))
        .collect()
      got.foreach { r => r.getLong(0) shouldBe r.getLong(1) }
      got.map(_.getLong(0)).toSeq shouldBe
        Seq(9L + 16L, 40000000000L + 25L, 0L)
    }

    "yield null on length mismatch or null elements (HOF semantics)" in {
      VectorFunctions.register(spark)
      val out = spark.sql(
        """SELECT vec_l2sq(array(1L), array(1L, 2L, 3L)) AS mismatch,
                  vec_l2sq(array(1L, cast(null as bigint)), array(3L, 4L))
                    AS nullelem,
                  vec_dot(array(1.0F), array(1.0F, 2.0F)) AS dmismatch,
                  vec_dot(array(1.0F, cast(null as float)), array(1.0F, 2.0F))
                    AS dnullelem""").collect().head
      (0 until 4).foreach(i => out.isNullAt(i) shouldBe true)
    }

    "propagate null inputs and reject non-bigint arrays" in {
      VectorFunctions.register(spark)
      import spark.implicits._
      val d = Seq((Option(Seq(1L)), Seq(2L)), (None, Seq(3L)))
        .toDF("x", "y")
      val out = d.select(
        VectorFunctions.vec_l2sq(F.col("x"), F.col("y")).as("l2"))
        .collect()
      out(0).getLong(0) shouldBe 1L
      out(1).isNullAt(0) shouldBe true
      an[Exception] should be thrownBy
        df.select(VectorFunctions.vec_l2sq(F.col("a"), F.col("b"))).collect()
    }
  }

  "nfc_normalize" should {
    "compose decomposed sequences, pass NFC text through, and be idempotent" in {
      VectorFunctions.register(spark)
      import spark.implicits._
      val deco = "é"      // e + combining acute
      val composed = "\u00e9" // precomposed
      val rows = Seq(deco, composed, "plain ascii", "", "😀x")
        .toDF("s")
        .selectExpr("s", "nfc_normalize(s) AS n",
          "nfc_normalize(nfc_normalize(s)) AS nn", "length(s) AS l",
          "length(nfc_normalize(s)) AS ln")
        .collect()
      rows(0).getString(1) shouldBe composed // composition happened
      rows(0).getInt(3) shouldBe 2
      rows(0).getInt(4) shouldBe 1
      rows(1).getString(1) shouldBe composed // already-NFC passthrough
      rows(2).getString(1) shouldBe "plain ascii"
      rows(3).getString(1) shouldBe ""
      rows(4).getString(1) shouldBe "😀x" // non-BMP untouched
      rows.foreach(r => r.getString(2) shouldBe r.getString(1)) // idempotent
      // null propagates; non-string rejected at analysis
      Seq[Option[String]](None).toDF("s")
        .selectExpr("nfc_normalize(s)").collect().head.isNullAt(0) shouldBe true
      an[Exception] should be thrownBy
        spark.range(1).selectExpr("nfc_normalize(id)").collect()
    }
  }
}
