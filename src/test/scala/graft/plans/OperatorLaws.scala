package graft.plans

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

import graft.SparkTestSession
import graft.functions.ZOrder

/** ScalaCheck laws for the layout key and the native top-k operator.
  * Spark-executing cases are kept small; the pure z-value laws run on the
  * driver via a 1-row plan.
  */
object OperatorLaws extends Properties("OperatorLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkTestSession.spark

  private def zval(x: Long, y: Long, bits: Int): Long =
    spark.range(1)
      .select(ZOrder.zvalue(F.lit(x), F.lit(y), bits).as("z"))
      .head().getLong(0)

  private val coord = Gen.chooseNum(0L, 255L)

  // reference interleave on the driver
  private def refZ(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
    }

  property("zvalue equals the bit-interleave reference") =
    Prop.forAll(coord, coord) { (x, y) => zval(x, y, 8) == refZ(x, y, 8) }

  property("zvalue is injective on the bit-bounded domain") =
    Prop.forAll(coord, coord, coord, coord) { (x1, y1, x2, y2) =>
      ((x1, y1) == (x2, y2)) == (refZ(x1, y1, 8) == refZ(x2, y2, 8))
    }

  property("zvalue grows monotonically when either coordinate's high bit rises") =
    Prop.forAll(Gen.chooseNum(0L, 127L), Gen.chooseNum(0L, 127L)) { (x, y) =>
      // setting bit 7 of either input raises the z-value above any value
      // with that bit clear on BOTH inputs (curve locality at the top level)
      refZ(x | 128L, y, 8) > refZ(x, y, 8) && refZ(x, y | 128L, 8) > refZ(x, y, 8)
    }

  private val topKCase: Gen[(Int, Int, Int, Long)] = for {
    n <- Gen.chooseNum(1, 120)
    keys <- Gen.chooseNum(1, 5)
    k <- Gen.chooseNum(1, 6)
    mod <- Gen.chooseNum(3L, 50L)
  } yield (n, keys, k, mod)

  property("topKPerKey equals the window row_number formulation") =
    Prop.forAll(topKCase) { case (n, keys, k, mod) =>
      GraftPlans.register(spark)
      val df = spark.range(n)
        .select((F.col("id") % keys).as("g"), F.col("id").as("i"),
          (F.col("id") % mod).as("v"))
      val native = GraftPlans.topKPerKey(df,
          Seq(F.col("g")), Seq(F.col("v").desc, F.col("i")), k)
        .select("g", "i").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = Window.partitionBy("g").orderBy(F.col("v").desc, F.col("i"))
      val win = df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("g", "i").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      native == win
    }
}
