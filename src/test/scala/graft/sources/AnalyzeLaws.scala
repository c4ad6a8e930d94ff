package graft.sources

import java.io.File

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.SparkTestSession

/** Equivalence law for ANALYZE: for random data — nulls, NaN/Infinity
  * floats, strings at/over the truncation cap, a literal "__null__",
  * sum-overflow-scale longs — the manifests analyze rebuilds from the
  * files are BYTE-IDENTICAL to the ones the writer produced at commit
  * (all-column zones incl. sum cells, row counts, blooms, NDV). One
  * decode path proving the other: a divergence means analyze-backfilled
  * tables would prune or answer differently than written ones.
  */
object AnalyzeLaws extends Properties("AnalyzeLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("s", StringType),
    StructField("d", DoubleType),
    StructField("i", IntegerType)))

  private val rowGen: Gen[Row] = for {
    k <- Gen.frequency(
      6 -> Gen.chooseNum(-100000L, 100000L),
      1 -> Gen.const(Long.MaxValue - 3), // addExact overflow territory
      1 -> Gen.const(null))
    s <- Gen.frequency(
      5 -> Gen.alphaNumStr.map(_.take(8)),
      1 -> Gen.const("__null__"), // collides with the null marker
      1 -> Gen.alphaNumStr.map(x => (x * 20).take( // at/over the cap
        AvroFileSource.StringBoundMax + 3)),
      1 -> Gen.const(null))
    d <- Gen.frequency(
      6 -> Gen.chooseNum(-100, 100).map(x => x / 8.0),
      1 -> Gen.const(Double.NaN), // kills the leaf (dead)
      1 -> Gen.const(Double.PositiveInfinity),
      1 -> Gen.const(null))
    i <- Gen.frequency(
      8 -> Gen.chooseNum(-1000, 1000),
      1 -> Gen.const(null))
  } yield Row(k, s, d, i)

  private def manifest(dir: String, name: String): String = {
    val f = new File(dir, name)
    if (!f.isFile) "<absent>"
    else new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
  }

  private val Manifests =
    Seq("_graft_zones_cols", "_graft_rows", "_graft_blooms", "_graft_ndv")

  property("analyze reproduces the writer's manifests byte-for-byte") =
    Prop.forAllNoShrink(
      Gen.listOfN(40, rowGen), Gen.chooseNum(1, 3)) { (rows, nFiles) =>
      val dir = graft.operators.Catalog.tempDir("graft_anl_law")
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, nFiles), schema)
      df.write.format("graft-avro")
        .option("bloomFor", "s").option("ndvFor", "k")
        .mode("overwrite").save(dir)
      val written = Manifests.map(m => m -> manifest(dir, m)).toMap
      Manifests.foreach(m => new File(dir, m).delete())
      AvroMaintenance.analyze(spark, dir,
        bloomFor = Seq("s"), ndvFor = Seq("k"))
      val rebuilt = Manifests.map(m => m -> manifest(dir, m)).toMap
      Manifests.map { m =>
        (written(m) == rebuilt(m)) :| s"$m diverged:\n--- writer:\n" +
          s"${written(m).take(600)}\n--- analyze:\n${rebuilt(m).take(600)}"
      }.reduce(_ && _)
    }
}
