package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.SparkTestSession

/** ScalaCheck laws for the graft-avro DataSource V2 and the minhash4
  * sketch aggregate: random schemas and rows, invariants the formats
  * guarantee. Every case runs real write + read Spark jobs, so cases are
  * kept small.
  */
object SourceLaws extends Properties("SourceLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark

  private val namePool =
    Vector("alpha", "bravo", "carol", "delta", "echo", "fox")

  private val leafGen: Gen[DataType] =
    Gen.oneOf(IntegerType, LongType, DoubleType, StringType, BooleanType)

  private def valueGen(dt: DataType): Gen[Any] = dt match {
    case IntegerType => Gen.frequency(9 -> Gen.chooseNum(-1000, 1000), 1 -> Gen.const(null))
    case LongType => Gen.frequency(9 -> Gen.chooseNum(-100000L, 100000L), 1 -> Gen.const(null))
    case DoubleType => Gen.chooseNum(-100, 100).map(_ / 4.0)
    case StringType => Gen.alphaNumStr.map(_.take(8))
    case BooleanType => Gen.oneOf(true, false)
    case s: StructType =>
      Gen.sequence[Seq[Any], Any](s.fields.toSeq.map(f => valueGen(f.dataType)))
        .map(Row.fromSeq)
    case ArrayType(et, _) =>
      Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n, valueGen(et)))
    case _ => Gen.const(null)
  }

  private case class Case(schema: StructType, rows: Seq[Row])

  private val caseGen: Gen[Case] = for {
    n <- Gen.chooseNum(1, 4)
    names <- Gen.pick(n, namePool)
    types <- Gen.listOfN(n, Gen.frequency(
      6 -> leafGen,
      2 -> leafGen.map(t => StructType(Seq(
        StructField("x", t, nullable = true),
        StructField("y", StringType, nullable = true)))),
      2 -> leafGen.map(t => ArrayType(t, containsNull = false))))
    schema = StructType(names.toSeq.zip(types).map { case (nm, t) =>
      // array elements are non-null; the field itself stays nullable
      StructField(nm, t, nullable = true)
    })
    nRows <- Gen.chooseNum(1, 5)
    rows <- Gen.listOfN(nRows,
      Gen.sequence[Seq[Any], Any](schema.fields.toSeq.map { f =>
        f.dataType match {
          case _: ArrayType => valueGen(f.dataType) // keep arrays non-null
          case dt => valueGen(dt)
        }
      }))
  } yield Case(schema, rows.map(Row.fromSeq))

  private def df(c: Case): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(c.rows.asJava, c.schema)
  }

  private def canon(d: DataFrame): Seq[String] =
    d.collect().toSeq.map(_.toString).sorted

  // Law: writing any schema/rows through graft-avro and reading back is
  // the identity on the row multiset (schema names preserved in order).
  property("graft-avro round trip is the identity") = Prop.forAll(caseGen) { c =>
    val dir = Files.createTempDirectory("graft_avro_law").toString
    val in = df(c)
    in.write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    (back.schema.fieldNames.toSeq == c.schema.fieldNames.toSeq) :| "names" &&
      (canon(back) == canon(in)) :| s"rows: ${canon(back)} vs ${canon(in)}"
  }

  // Law: minhash4 lanes are monotone non-increasing under set growth —
  // a superset's signature is element-wise <= the subset's.
  property("minhash4 lanes shrink monotonically under union") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(6))),
      Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(6)))) { (a, b) =>
      import spark.implicits._
      graft.functions.VectorFunctions.register(spark)
      def sig(xs: Seq[String]): Seq[Long] =
        xs.toDF("s").agg(
          graft.functions.VectorFunctions.minhash4(F.col("s")).as("sig"))
          .head().getSeq[Long](0)
      val sa = sig(a)
      val sab = sig(a ++ b)
      sab.zip(sa).forall { case (u, x) => u <= x }
    }
}
