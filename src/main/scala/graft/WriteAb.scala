package graft

import org.apache.spark.sql.SparkSession

/** A/B throughput check for the graft-avro DIRECT write path
  * (InternalRow → BinaryEncoder, AvroDirectDatumWriter) vs the
  * GenericRecord tier: writes one cached input frame repeatedly with
  * `-Dgraft.avro.directWrite` toggled and prints per-iteration wall
  * times plus the median speedup. The input is localCheckpoint-ed
  * before timing so only the write is measured (the ColumnarAb
  * pattern, write-side).
  *
  * Usage: runMain graft.WriteAb [rows] [iters] [codec]
  * Modes (env): WRITE_AB_ARRAYS (array<float>[32] payload),
  * WRITE_AB_SORTED (sortedBy=id — stats + block-index write path),
  * WRITE_AB_SERIAL (coalesce(1): the q_avro_block_bloom shape).
  */
object WriteAb {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 10000000L
    val iters = if (args.length > 1) args(1).toInt else 5
    val codec = if (args.length > 2) args(2)
      else graft.sources.AvroFileSource.DefaultCodec
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

    val arrays = sys.env.get("WRITE_AB_ARRAYS").exists(_.toBoolean)
    val sorted = sys.env.get("WRITE_AB_SORTED").exists(_.toBoolean)
    val serial = sys.env.get("WRITE_AB_SERIAL").exists(_.toBoolean)

    val base =
      if (arrays)
        spark.range(rows).selectExpr(
          "id",
          "transform(sequence(0, 31), x -> cast(id % 997 + x as float)) as emb")
      else
        spark.range(rows).selectExpr(
          "id",
          "cast(id % 9973 as double) as d",
          "cast(id % 2 = 0 as boolean) as b",
          "md5(cast(id as string)) as s1",
          "repeat(cast(id % 1000 as string), 4) as s2",
          "date_add(date'2020-01-01', cast(id % 3650 as int)) as dt",
          "timestamp_micros(1500000000000000 + id * 1000) as ts")
    val shaped =
      if (serial) base.coalesce(1)
      else if (sorted) base.repartition(32).sortWithinPartitions("id")
      else base.repartition(32)
    val input = shaped.localCheckpoint(true)

    val root = operators.Catalog.tempDir("write_ab")
    var gen = 0
    def write(direct: Boolean): Double = {
      System.setProperty("graft.avro.directWrite", direct.toString)
      val dir = new java.io.File(root, s"g$gen"); gen += 1
      val t0 = System.nanoTime()
      val w = input.write.format("graft-avro").option("codec", codec)
      (if (sorted || serial) w.option("sortedBy", "id") else w)
        .mode("append").save(dir.getPath)
      val dt = (System.nanoTime() - t0) / 1e9
      // reclaim between iterations so the disk doesn't fill
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
      dt
    }
    write(direct = true); write(direct = false) // warmup both paths

    val (on, off) = (Array.ofDim[Double](iters), Array.ofDim[Double](iters))
    for (i <- 0 until iters) {
      off(i) = write(direct = false)
      on(i) = write(direct = true)
      println(f"iter ${i + 1}: generic ${off(i)}%.3f s, direct ${on(i)}%.3f s")
    }
    System.clearProperty("graft.avro.directWrite")
    def med(a: Array[Double]) = a.sorted.apply(a.length / 2)
    println(f"""{"rows":$rows,"generic_sec":${med(off)}%.3f,""" +
      f""""direct_sec":${med(on)}%.3f,""" +
      f""""speedup":${med(off) / med(on)}%.2f}""")
    spark.stop()
  }
}
