package graft

import org.apache.spark.sql.SparkSession

/** A/B microbenchmark for per-chunk bloom cells (`chunkBloomFor`): one
  * large sorted file whose probed column is a SCATTERED bijection (per
  * chunk its zone bounds span ~the whole domain — zones cannot prune,
  * only membership can), probed with a small IN-set, measured with the
  * bloom cells present vs stripped from the sidecar (zone lines kept —
  * the A and B arms differ ONLY in membership cells). Prints one JSON
  * line with medians; `CHUNK_AB_KEYS` (default 4) sets the probe size.
  *
  *   sbt "runMain graft.ChunkBloomAb [rows] [iters]"
  */
object ChunkBloomAb {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 10000000L
    val iters = if (args.length > 1) args(1).toInt else 5
    val nKeys = sys.env.getOrElse("CHUNK_AB_KEYS", "4").toInt
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

    val dir = operators.Catalog.tempDir("chunk_bloom_ab")
    // id = scrambled bijection of the row ordinal: every chunk's id
    // bounds span ~[0, rows·large) — zone pruning is structurally
    // useless on it, isolating the bloom cells' contribution
    spark.range(0, rows).toDF("k")
      .withColumn("id", F.expr("pmod(k * 2654435761, 68718952447)"))
      .withColumn("payload", F.md5(F.col("k").cast("string")))
      .coalesce(1).sortWithinPartitions("k")
      .write.format("graft-avro").option("sortedBy", "k")
      .option("chunkBloomFor", "id")
      .mode("overwrite").save(dir)
    val bixF = graft.sources.AvroFileSource
      .blockIdxFile(new java.io.File(dir))
    require(bixF.isFile, "no block index written")
    val allLines = new String(
      java.nio.file.Files.readAllBytes(bixF.toPath), "UTF-8")
    require(allLines.contains("bloom:"), "no chunk-bloom cells written")
    val zoneOnly = allLines.split('\n')
      .filterNot(_.split('\t').lift(2).exists(_.startsWith("bloom:")))
      .mkString("", "\n", "\n")

    def idOf(k: Long): Long =
      Math.floorMod(k * 2654435761L, 68718952447L)
    val keys = (1 to nKeys).map(i => idOf(i.toLong * rows / (nKeys + 1)))
    def run(): Double = {
      val t0 = System.nanoTime()
      spark.read.format("graft-avro").load(dir)
        .filter(F.col("id").isin(keys: _*))
        .agg(F.sum("k"), F.count(F.lit(1)))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    run() // untimed warmup (codegen, page cache)
    val withCells = median((1 to iters).map(_ => run()))
    java.nio.file.Files.write(bixF.toPath, zoneOnly.getBytes("UTF-8"))
    val without =
      try {
        run() // warm the no-cells path too
        median((1 to iters).map(_ => run()))
      } finally {
        java.nio.file.Files.write(bixF.toPath, allLines.getBytes("UTF-8"))
        ()
      }

    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    spark.stop()
    println(s"""{"metric":"chunk_bloom_ab","rows":$rows,""" +
      s""""n_keys":$nKeys,"with_cells_sec":${fmt(withCells)},""" +
      s""""without_sec":${fmt(without)},""" +
      s""""speedup":${fmt(without / withCells)}}""")
  }
}
