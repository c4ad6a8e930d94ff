package graft

import org.apache.spark.sql.SparkSession

/** A/B microbenchmark for block-range skipping (`_graft_blockidx`): one
  * large VERIFIED-SORTED file, a selective range predicate, measured
  * with the chunk index present vs removed (same bytes, same plan shape
  * — the only difference is whether planInputPartitions emits the
  * overlapping chunks or the whole file). Prints one JSON line with
  * medians; `BLOCK_AB_SELECTIVITY` (default 0.01) sets the matched
  * fraction.
  *
  *   sbt "runMain graft.BlockSkipAb [rows] [iters]"
  */
object BlockSkipAb {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 10000000L
    val iters = if (args.length > 1) args(1).toInt else 5
    val sel = sys.env.getOrElse("BLOCK_AB_SELECTIVITY", "0.01").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions",
        classOf[graft.functions.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.{functions => F}

    val dir = operators.Catalog.tempDir("block_ab")
    spark.range(0, rows).toDF("k")
      .withColumn("payload", F.md5(F.col("k").cast("string")))
      .withColumn("v", F.col("k") * 3)
      .coalesce(1).sortWithinPartitions("k")
      .write.format("graft-avro").option("sortedBy", "k")
      .mode("overwrite").save(dir)
    val bixF = graft.sources.AvroFileSource
      .blockIdxFile(new java.io.File(dir))
    require(bixF.isFile, "no block index written")
    val bixBytes = java.nio.file.Files.readAllBytes(bixF.toPath)

    val lo = (rows * 0.6).toLong
    val hi = lo + (rows * sel).toLong
    def run(): Double = {
      val t0 = System.nanoTime()
      spark.read.format("graft-avro").load(dir)
        .filter(F.col("k").between(lo, hi))
        .agg(F.sum("v"), F.count(F.lit(1)))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    run() // untimed warmup (codegen, page cache)
    val withIdx = median((1 to iters).map(_ => run()))
    bixF.delete()
    val without =
      try {
        run() // warm the no-index path too
        median((1 to iters).map(_ => run()))
      } finally {
        // restore even on failure: a rerun in the same dir must not
        // silently measure an unindexed table in BOTH arms
        java.nio.file.Files.write(bixF.toPath, bixBytes)
        ()
      }

    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    spark.stop()
    println(s"""{"metric":"block_skip_ab","rows":$rows,""" +
      s""""selectivity":$sel,"with_index_sec":${fmt(withIdx)},""" +
      s""""without_sec":${fmt(without)},""" +
      s""""speedup":${fmt(without / withIdx)}}""")
  }
}
