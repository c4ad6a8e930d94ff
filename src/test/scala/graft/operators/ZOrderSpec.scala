package graft.operators

import graft.SparkSpec
import graft.functions.ZOrder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Proves the z-order layout claim that file-level min/max statistics
  * prune predicates on EVERY interleaved dimension, where a linear sort
  * only prunes its leading column.
  *
  * Method: write the same (px, sx) grid twice — range-partitioned by
  * z-value vs by px — then, per output file, collect min/max of both
  * columns (exactly the stats a file-skipping scan consults) and count
  * how many files overlap a box predicate on the NON-leading dimension.
  */
class ZOrderSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val nFiles = 16

  private def grid: DataFrame = {
    // 64×64 grid, 2 rows per cell → 8192 rows
    spark.range(8192)
      .select((F.col("id") % 64).as("px"), F.expr("(id DIV 64) % 64").as("sx"))
  }

  /** files as (min_px, max_px, min_sx, max_sx) rows */
  private def fileStats(dir: String): Array[(Long, Long, Long, Long)] =
    spark.read.parquet(dir)
      .groupBy(F.input_file_name())
      .agg(F.min("px"), F.max("px"), F.min("sx"), F.max("sx"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  private def overlapping(stats: Array[(Long, Long, Long, Long)],
      lo: Long, hi: Long, onSx: Boolean): Int =
    stats.count { case (pmin, pmax, smin, smax) =>
      if (onSx) smin <= hi && smax >= lo else pmin <= hi && pmax >= lo
    }

  test("z-order clustering prunes on both dimensions; linear sort only on its leading column") {
    val base = graft.operators.Catalog.tempDir("graft_zorder")
    val zDir = s"$base/zorder"
    val linDir = s"$base/linear"

    grid.repartitionByRange(nFiles, ZOrder.zvalue(F.col("px"), F.col("sx"), 6))
      .write.mode("overwrite").parquet(zDir)
    grid.repartitionByRange(nFiles, F.col("px"))
      .write.mode("overwrite").parquet(linDir)

    val zStats = fileStats(zDir)
    val linStats = fileStats(linDir)
    // repartitionByRange samples to pick boundaries (seed varies with
    // RDD ids, so concurrent suites see different splits): an unlucky
    // sample can leave a boundary partition empty — the layout claim
    // below is what matters, not an exact file count
    zStats.length should be >= nFiles - 2
    linStats.length should be >= nFiles - 2

    // Box predicate on sx (the non-leading dimension): sx BETWEEN 8 AND 15.
    // 16 range partitions over a 12-bit z-value = the top 4 bits = 2 px
    // bits + 2 sx bits, so each file spans one px-quarter × sx-quarter;
    // the sx range 8..15 sits inside one quarter → ~4 of 16 files overlap
    // (range-boundary files may add a couple). Linear px-sort leaves the
    // full sx range in every file → nothing prunes.
    val zHit = overlapping(zStats, 8, 15, onSx = true)
    val linHit = overlapping(linStats, 8, 15, onSx = true)
    assert(zHit <= 8, s"z-order should prune sx queries, hit $zHit/$nFiles")
    assert(linHit == linStats.length,
      s"px-sorted layout cannot prune sx queries, hit $linHit/${linStats.length}")

    // Both layouts prune the px dimension (leading column vs interleaved).
    overlapping(linStats, 8, 15, onSx = false) should be <= 8
    overlapping(zStats, 8, 15, onSx = false) should be <= 8
  }

  test("zvalue matches the reference bit-interleave") {
    val row = spark.range(1)
      .select(ZOrder.zvalue(F.lit(170L), F.lit(85L), 8).as("z"))
      .head()
    // 170 = 10101010b on odd bits, 85 = 01010101b on even bits → 39321
    row.getLong(0) shouldBe 39321L
  }
}
