package graft

import org.apache.spark.sql.{SparkSession, functions => F}

/** A/B throughput check for the graft-avro vectorized decode path:
  * scans one flat table (written once) with `columnar` on vs off and
  * prints per-iteration wall times plus the median speedup.
  *
  * Usage: runMain graft.ColumnarAb [rows] [iters]
  */
object ColumnarAb {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 5000000L
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

    // COLUMNAR_AB_ARRAYS: embedding-shaped payload (array<float>[32])
    // instead of the flat mixed row — measures the child-vector decode
    val arrays = sys.env.get("COLUMNAR_AB_ARRAYS").exists(_.toBoolean)
    // COLUMNAR_AB_STRUCTS: nested-record payload — measures the
    // struct-children decode
    val structs = sys.env.get("COLUMNAR_AB_STRUCTS").exists(_.toBoolean)
    // COLUMNAR_AB_UNIONS: multi-branch tagged-union payload (a foreign
    // [string, long] column) — measures the r16 union-index dispatch
    val unions = sys.env.get("COLUMNAR_AB_UNIONS").exists(_.toBoolean)
    val dir = operators.Catalog.tempDir("columnar_ab")
    if (unions) {
      // write REAL union files (the engine's own sink reconstructs the
      // union from the tagged struct + metadata — round-trip it once)
      import org.apache.avro.{Schema, SchemaBuilder}
      import org.apache.avro.generic.{GenericData, GenericDatumWriter,
        GenericRecord}
      val unionS = Schema.createUnion(java.util.Arrays.asList(
        Schema.create(Schema.Type.STRING), Schema.create(Schema.Type.LONG)))
      val recS = SchemaBuilder.record("U").namespace("ab").fields()
        .requiredLong("uid")
        .name("v").`type`(unionS).noDefault()
        .endRecord()
      val perFile = rows / 32
      java.util.stream.IntStream.range(0, 32).parallel().forEach { p =>
        val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](recS))
        w.setCodec(org.apache.avro.file.CodecFactory.fromString(
          if (codec == "null") "null" else codec))
        w.create(recS, new java.io.File(dir, f"u-$p%05d.avro"))
        try {
          var i = 0L
          while (i < perFile) {
            val id = p * perFile + i
            val r = new GenericData.Record(recS)
            r.put("uid", id)
            r.put("v", if (id % 2 == 0) s"s$id" else Long.box(id * 10L))
            w.append(r)
            i += 1
          }
        } finally w.close()
      }
    } else (if (structs)
      spark.range(rows).selectExpr(
        "id",
        """named_struct(
             'name', md5(cast(id as string)),
             'score', cast(id % 9973 as double),
             'inner', named_struct('a', id * 2, 'b',
               cast(id % 2 = 0 as boolean))) as info""")
    else if (arrays)
      spark.range(rows).selectExpr(
        "id",
        "transform(sequence(0, 31), x -> cast(id % 997 + x as float)) as emb")
    else
      spark.range(rows).selectExpr(
        "id",
        "cast(id % 9973 as double) as d",
        "cast(id % 2 = 0 as boolean) as b",
        "md5(cast(id as string)) as s1",
        "repeat(cast(id % 1000 as string), 4) as s2"))
      .repartition(32)
      .write.format("graft-avro").option("codec", codec)
      .mode("append").save(dir)

    // COLUMNAR_AB_RENAME: decode the same flat payload through a
    // column-rename view (alias resolution on the vector path)
    val renamed = sys.env.get("COLUMNAR_AB_RENAME").exists(_.toBoolean)
    if (renamed && !arrays && !structs) {
      graft.sources.AvroMaintenance.renameColumn(dir, "d", "dr")
      graft.sources.AvroMaintenance.renameColumn(dir, "s1", "sr")
    }
    def rn(n: String): String =
      if (!renamed) n
      else n match { case "d" => "dr"; case "s1" => "sr"; case o => o }

    val numsOnly = sys.env.get("COLUMNAR_AB_NUMS").exists(_.toBoolean)
    def scan(columnar: Boolean): Double = {
      val t0 = System.nanoTime()
      val df = spark.read.format("graft-avro")
        .option("columnar", columnar).load(dir)
      // every variant keeps at least one non-column aggregate expression
      // so the metadata-served SUM pushdown can't skip the scan
      val agg =
        if (unions) df.agg(
          F.sum("uid"),
          F.sum(F.length(F.col("v.string"))),
          F.sum("v.long"),
          F.count(F.when(F.col("v.tag") === "long", 1)))
        else if (structs) df.agg(
          F.sum(F.length(F.col("info.name"))),
          F.sum("info.score"), F.sum("info.inner.a"))
        else if (arrays) df.agg(F.sum(F.size(F.col("emb"))),
          F.sum(F.element_at(F.col("emb"), 3)))
        else if (numsOnly) df.agg(F.sum("id"), F.sum(rn("d")))
        else df.agg(F.sum("id"), F.sum(rn("d")),
          F.sum(F.length(F.col(rn("s1")))),
          F.sum(F.length(F.col("s2"))), F.count(F.when(F.col("b"), 1)))
      agg.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    scan(true); scan(false) // warmup both code paths

    val (on, off) = (Array.ofDim[Double](iters), Array.ofDim[Double](iters))
    for (i <- 0 until iters) {
      off(i) = scan(false)
      on(i) = scan(true)
      println(f"iter ${i + 1}: row ${off(i)}%.3f s, columnar ${on(i)}%.3f s")
    }
    def med(a: Array[Double]) = a.sorted.apply(a.length / 2)
    println(f"""{"rows":$rows,"row_sec":${med(off)}%.3f,""" +
      f""""columnar_sec":${med(on)}%.3f,""" +
      f""""speedup":${med(off) / med(on)}%.2f}""")
    spark.stop()
  }
}
