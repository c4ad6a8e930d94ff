package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: executes every gate query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Each query is executed through the built-in `noop` sink so the FULL plan
  * runs (projection, sort, exchange) — a bare `count()` would let Catalyst
  * prune every projected column and skip sorts, timing little more than the
  * parquet scan. Errors are surfaced per query (value -1 plus an `errors`
  * map) instead of being silently swallowed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup: JVM/codegen/parquet-reader init otherwise lands on
    // whichever query happens to run first.
    try {
      spark.range(100000).selectExpr("md5(cast(id as string)) as h")
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/region.parquet")
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Stable order so residual warmup effects land on the same query.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          // drop blocks left by checkpointing/caching queries so later
          // queries aren't taxed by their memory pressure
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          true
        } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
            false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"\"$k\":\"$v\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // stop() BEFORE the println: the JSON line must be the LAST thing on
    // stdout (driver contract) and session teardown may log.
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    if (errors.nonEmpty) sys.exit(1)
  }
}
