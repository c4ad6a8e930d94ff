package graft.operators

import org.apache.spark.sql.{functions => F}
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.SparkTestSession

/** ScalaCheck laws for the layout operators: compaction must be
  * content-invisible for ANY input fragmentation, and the output file
  * count must match the byte budget exactly.
  */
object LayoutLaws extends Properties("LayoutLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestSession.spark

  // forAllNoShrink: the default Int shrinker would step outside the
  // generator bounds (parts→0 ⇒ repartition(0) throws; rows→0 ⇒ null
  // sum), replacing a genuine counterexample with a bogus crash.
  property("compaction preserves content for any fragmentation") =
    Prop.forAllNoShrink(
      Gen.chooseNum(1, 8), Gen.chooseNum(50, 500),
      // tiny targets force the MULTI-file path (n > 1); the large one
      // covers the collapse-to-one case
      Gen.oneOf(4L * 1024, 16L * 1024, 64L * 1024 * 1024)
    ) { (parts, rows, target) =>
      val in = Catalog.tempDir("graft_law_compact_in")
      val out = Catalog.tempDir("graft_law_compact_out")
      spark.range(rows.toLong)
        .selectExpr("id", "md5(cast(id as string)) as h")
        .repartition(parts).write.mode("overwrite").parquet(in)
      val n = Compact.compact(spark, in, out, target)
      // independently derived ceiling (floating form, not the operator's
      // integer formula) so a rounding regression cannot self-confirm
      val bytes = Compact.listBytes(in)
      val expected = math.max(1, math.ceil(bytes.toDouble / target).toInt)
      val agg = spark.read.parquet(out)
        .agg(F.count(F.lit(1)), F.sum("id"),
          F.count_distinct(F.col("h"))).head()
      (n == expected) :| s"n=$n expected=$expected bytes=$bytes" &&
        (Compact.dataFiles(out) == n) :| "output file count" &&
        (agg.getLong(0) == rows.toLong) :| s"rows ${agg.getLong(0)}" &&
        (agg.getLong(1) == (0L until rows.toLong).sum) :| "id sum" &&
        (agg.getLong(2) == rows.toLong) :| "distinct hashes"
    }
}
