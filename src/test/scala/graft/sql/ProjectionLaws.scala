package graft.sql

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestSession

/** ScalaCheck laws for the projection engine (SURVEY.md §5 plan):
  * random schemas/rows, properties the reference's semantics guarantee.
  * Kept small per case — every case plans and executes real Spark jobs.
  */
object ProjectionLaws extends Properties("ProjectionLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkTestSession.spark
  import GraftSql.implicits._

  private val namePool =
    Vector("alpha", "bravo", "carol", "delta", "echo", "fox", "golf", "hotel")

  private val typeGen: Gen[DataType] =
    Gen.oneOf(IntegerType, LongType, DoubleType, StringType, BooleanType)

  private case class FlatCase(schema: StructType, rows: Seq[Row])

  private def valueGen(dt: DataType): Gen[Any] = dt match {
    case IntegerType => Gen.chooseNum(-1000, 1000)
    case LongType => Gen.chooseNum(-100000L, 100000L)
    case DoubleType => Gen.chooseNum(-100, 100).map(_ / 4.0)
    case StringType => Gen.alphaNumStr.map(_.take(8))
    case BooleanType => Gen.oneOf(true, false)
    case _ => Gen.const(null)
  }

  private val flatCaseGen: Gen[FlatCase] = for {
    n <- Gen.chooseNum(1, 6)
    names <- Gen.pick(n, namePool)
    types <- Gen.listOfN(n, typeGen)
    schema = StructType(names.toSeq.zip(types).map { case (nm, t) =>
      StructField(nm, t, nullable = true)
    })
    nRows <- Gen.chooseNum(1, 4)
    rows <- Gen.listOfN(nRows,
      Gen.sequence[Seq[Any], Any](schema.fields.toSeq.map(f => valueGen(f.dataType))))
  } yield FlatCase(schema, rows.map(Row.fromSeq))

  private def df(c: FlatCase): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(c.rows.asJava, c.schema)
  }

  private def dump(d: DataFrame): (Seq[String], Seq[Seq[Any]]) =
    (d.schema.fieldNames.toSeq, d.collect().toSeq.map(_.toSeq))

  // Law 1: SELECT * is the identity, in both modes (ref: AvroSqlTest :75-81,
  // withstructure :72-81).
  property("select-star identity (flatten)") = Prop.forAll(flatCaseGen) { c =>
    dump(df(c).sql("SELECT *")) == dump(df(c))
  }
  property("select-star identity (withstructure)") = Prop.forAll(flatCaseGen) { c =>
    dump(df(c).sql("SELECT * FROM t withstructure")) == dump(df(c))
  }

  // Law 2: on flat schemas, flatten and withstructure agree for any
  // rename/reorder selection (no nesting → the modes coincide).
  property("flatten == withstructure on flat schemas") =
    Prop.forAll(flatCaseGen, Gen.chooseNum(0, 100)) { (c, seed) =>
      val k = 1 + seed % c.schema.length
      val picked = c.schema.fieldNames.take(k).zipWithIndex
        .map { case (f, i) => s"$f as out$i" }
      val q = s"SELECT ${picked.mkString(", ")}"
      dump(df(c).sql(q)) == dump(df(c).sql(s"$q FROM t withstructure"))
    }

  // Law 3: aliases land in select-list order with the selected values.
  property("rename preserves order and values") =
    Prop.forAll(flatCaseGen) { c =>
      val q = "SELECT " + c.schema.fieldNames.reverse.zipWithIndex
        .map { case (f, i) => s"$f as r$i" }.mkString(", ")
      val (names, rows) = dump(df(c).sql(q))
      val expectNames = c.schema.fieldNames.indices.map(i => s"r$i")
      val expectRows = c.rows.map(r => r.toSeq.reverse)
      names == expectNames && rows == expectRows
    }

  // Law 4: star-with-override — explicit field first, star expands the
  // rest without duplicating it (ref :277-305).
  property("star exclusion completeness, no duplicates") =
    Prop.forAll(flatCaseGen) { c =>
      val f = c.schema.fieldNames.head
      val (names, _) = dump(df(c).sql(s"SELECT $f as moved, *"))
      names == ("moved" +: c.schema.fieldNames.filterNot(_ == f).toSeq) &&
        names.distinct == names
    }

  // --- nested-schema laws (SURVEY §5: random nested schemas) ----------

  private case class NestedCase(schema: StructType, rows: Seq[Row],
      leafPaths: Seq[Seq[String]])

  /** Random 2-3 level struct nesting; returns all leaf paths. */
  private val nestedCaseGen: Gen[NestedCase] = for {
    nTop <- Gen.chooseNum(1, 3)
    topNames <- Gen.pick(nTop, namePool.take(4))
    nInner <- Gen.chooseNum(1, 3)
    innerNames <- Gen.pick(nInner, namePool.drop(4))
    deep <- Gen.oneOf(true, false)
    innerFields = innerNames.toSeq.map { n =>
      StructField(n, IntegerType, nullable = true)
    }
    inner = StructType(
      if (deep)
        innerFields :+ StructField("kern",
          StructType(Seq(StructField("leaf", LongType, nullable = true))),
          nullable = true)
      else innerFields)
    schema = StructType(
      StructField("id", IntegerType, nullable = false) +:
        topNames.toSeq.map(n => StructField(n, inner, nullable = true)))
    nRows <- Gen.chooseNum(1, 3)
    rows <- Gen.listOfN(nRows, Gen.chooseNum(0, 1000))
  } yield {
    def innerRow(seed: Int): Row = Row.fromSeq(
      innerFields.indices.map(i => seed + i) ++
        (if (deep) Seq(Row(seed.toLong * 2)) else Nil))
    val rws = rows.zipWithIndex.map { case (seed, i) =>
      Row.fromSeq(i +: topNames.toSeq.map(_ => innerRow(seed)))
    }
    val leaves = topNames.toSeq.flatMap { t =>
      innerNames.toSeq.map(n => Seq(t, n)) ++
        (if (deep) Seq(Seq(t, "kern", "leaf")) else Nil)
    }
    NestedCase(schema, rws, leaves)
  }

  private def ndf(c: NestedCase): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(c.rows.asJava, c.schema)
  }

  // Law N1: SELECT * identity holds on nested schemas in both modes.
  property("select-star identity on nested schemas") =
    Prop.forAll(nestedCaseGen) { c =>
      dump(ndf(c).sql("SELECT *")) == dump(ndf(c)) &&
        dump(ndf(c).sql("SELECT * FROM t withstructure")) == dump(ndf(c))
    }

  // Law N2: flattening any leaf path equals the native getField chain.
  property("leaf-path flatten equals native column extraction") =
    Prop.forAll(nestedCaseGen) { c =>
      c.leafPaths.forall { p =>
        val q = s"SELECT id, ${p.mkString(".")} as leaf"
        val native = ndf(c).select(
          org.apache.spark.sql.functions.col("id"),
          p.tail.foldLeft(org.apache.spark.sql.functions.col(p.head))(_.getField(_))
            .alias("leaf"))
        dump(ndf(c).sql(q)) == dump(native)
      }
    }

  // Law N3: withstructure cherry-pick of one leaf keeps the enclosing
  // nesting chain and nothing else at the traversed levels' siblings...
  // structurally: output field count at top == mentioned top segments.
  property("withstructure cherry-pick keeps only mentioned top segments") =
    Prop.forAll(nestedCaseGen) { c =>
      val p = c.leafPaths.head
      val out = ndf(c).sql(s"SELECT ${p.mkString(".")} FROM t withstructure")
      out.schema.fieldNames.toSeq == Seq(p.head)
    }

  // Law 5: nullability is monotone — a leaf reached through a nullable
  // parent is nullable in the output, and null parents yield null leaves
  // (O14; ref :160-172).
  property("nullability propagates through nullable parents") =
    Prop.forAll(Gen.chooseNum(0, 3), Gen.chooseNum(1, 4)) { (nullEvery, n) =>
      import scala.jdk.CollectionConverters._
      val inner = StructType(Seq(StructField("leaf", IntegerType, nullable = false)))
      val schema = StructType(Seq(
        StructField("id", IntegerType, nullable = false),
        StructField("p", inner, nullable = true)))
      val rows = (0 until n).map { i =>
        Row(i, if (nullEvery > 0 && i % (nullEvery + 1) == 0) null else Row(i * 10))
      }
      val d = spark.createDataFrame(rows.asJava, schema)
      val out = d.sql("SELECT id, p.leaf as leaf")
      val nullsMatch = out.collect().toSeq.forall { r =>
        val i = r.getInt(0)
        val expectNull = nullEvery > 0 && i % (nullEvery + 1) == 0
        (r.isNullAt(1)) == expectNull
      }
      out.schema("leaf").nullable && nullsMatch
    }
}
