package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.SparkTestSession
import graft.functions.BucketHash

/** Lockstep laws for the bucket hash's four consumers — the bucketed
  * writer's directory routing, the scan's filter-literal targets, the
  * catalog's SPJ `bucket` function, and the `graft_bucket` SQL
  * expression (codegen path). A divergence anywhere silently breaks
  * bucket pruning soundness, so each pair is pinned against
  * [[BucketHash.bucket]] directly.
  */
object BucketHashLaws extends Properties("BucketHashLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestSession.spark

  private val nGen = Gen.choose(1, 64)

  property("graft_bucket expression == BucketHash over strings") =
    Prop.forAll(Gen.listOfN(40, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.choose(Long.MinValue, Long.MaxValue).map(_.toString))),
      nGen) { (vals, n) =>
      import spark.implicits._
      vals.toDF("s")
        .withColumn("b",
          F.call_function("graft_bucket", F.col("s"), F.lit(n)))
        .collect().forall { r =>
          r.getInt(1) == BucketHash.bucket(r.getString(0), n)
        }
    }

  property("graft_bucket over longs/dates matches canonical strings") =
    Prop.forAll(Gen.listOfN(30, Gen.choose(-100000L, 100000L)), nGen) {
      (vals, n) =>
      import spark.implicits._
      vals.toDF("k")
        .withColumn("b",
          F.call_function("graft_bucket", F.col("k"), F.lit(n)))
        .withColumn("d",
          F.date_add(F.lit(java.sql.Date.valueOf("2020-01-01")),
            F.pmod(F.col("k"), F.lit(3650)).cast("int")))
        .withColumn("bd",
          F.call_function("graft_bucket", F.col("d"), F.lit(n)))
        .collect().forall { r =>
          r.getInt(1) == BucketHash.bucket(r.getLong(0).toString, n) &&
            r.getInt(3) == BucketHash.bucket(r.getDate(2).toString, n)
        }
    }

  property("writer routing: every row's segment == BucketHash of its key") =
    Prop.forAll(Gen.listOfN(60, Gen.choose(0L, 10000L)), Gen.choose(2, 16)) {
      (vals, n) =>
      import spark.implicits._
      val dir = graft.operators.Catalog.tempDir("graft_bucket_law")
      vals.toDF("k").write.format("graft-avro")
        .option("bucketBy", s"k:$n").mode("overwrite").save(dir)
      spark.read.format("graft-avro").load(dir)
        .select(F.col("k"), F.col("_graft_file"))
        .collect().forall { r =>
          val seg = r.getString(1).split('/')
            .find(_.startsWith("k_bucket=")).get.stripPrefix("k_bucket=")
          seg.toInt == BucketHash.bucket(r.getLong(0).toString, n)
        }
    }

  property("catalog SPJ bucket function == BucketHash (all bound types)") =
    Prop.forAll(Gen.choose(-1000000L, 1000000L), nGen) { (v, n) =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.unsafe.types.UTF8String
      def bind(dt: DataType) = GraftBucketFunction
        .bind(StructType(Seq(StructField("n", IntegerType),
          StructField("v", dt))))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.functions
          .ScalarFunction[Integer]]
      val longOk = bind(LongType)
        .produceResult(InternalRow(n, v)) ==
        BucketHash.bucket(v.toString, n)
      val i = (v % 100000L).toInt
      val intOk = bind(IntegerType)
        .produceResult(InternalRow(n, i)) ==
        BucketHash.bucket(i.toString, n)
      val s = s"s$v"
      val strOk = bind(StringType)
        .produceResult(InternalRow(n, UTF8String.fromString(s))) ==
        BucketHash.bucket(s, n)
      val d = (v % 20000L).toInt
      val dateOk = bind(DateType)
        .produceResult(InternalRow(n, d)) ==
        BucketHash.bucket(
          java.time.LocalDate.ofEpochDay(d.toLong).toString, n)
      val nullOk = bind(LongType)
        .produceResult(InternalRow(n, null)) == null
      longOk && intOk && strOk && dateOk && nullOk
    }
}
