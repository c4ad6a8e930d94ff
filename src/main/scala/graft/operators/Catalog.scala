package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of gate queries with their DuckDB oracles.
  *
  * Every query is deterministic (full ORDER BY on a unique key, explicit
  * tie-breaks under LIMIT) and column-name-aligned with its oracle, because
  * the driver compares by sorted column name + value hash.
  */
trait Catalog {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]

  protected def table(spark: SparkSession, dir: String, name: String): DataFrame =
    Catalog.load(spark, dir, name)

  /** Fresh temp dir for gates that materialize intermediate datasets,
    * reaped at JVM exit so repeated bench/verify runs leave nothing in
    * /tmp.
    */
  protected def tempDir(prefix: String): String = Catalog.tempDir(prefix)
}

object Catalog {
  import org.apache.spark.sql.{functions => F}

  /** Shutdown-hook-reaped temp dir (shared by gates and specs). ONE hook
    * drains a queue of registered dirs — a hook Thread per tempDir call
    * would leave ScalaCheck-heavy test JVMs (hundreds of dirs) running
    * hundreds of concurrent deleter threads at exit.
    */
  private val reapQueue =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val reaperInstalled: Unit = {
    sys.addShutdownHook {
      import java.nio.file.{Files => JF, Path}
      import java.util.Comparator
      var p = reapQueue.poll()
      while (p != null) {
        try JF.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => JF.deleteIfExists(f))
        catch { case _: Throwable => () }
        p = reapQueue.poll()
      }
    }
    ()
  }

  def tempDir(prefix: String): String = {
    reaperInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    reapQueue.add(p)
    p.toString
  }

  /** Load one testdata table. The `events` table's `ts` column has
    * shipped as TIMESTAMP(NANOS) in some testdata generations (which
    * Spark 4 refuses to read natively — read nanos as long and truncate
    * with integer division; a double division would lose precision on
    * ~1e18 nano values) and as plain micros in others. Branch on the
    * actual read schema and normalize every generation to a session-UTC
    * TimestampType — DuckDB's TIMESTAMP is micros, so the oracle sees
    * identical values either way.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // One-time session config (guarded — plan-time config mutation on
      // every load would thrash the per-session plan cache).
      val k = "spark.sql.legacy.parquet.nanosAsLong"
      if (!spark.conf.getOption(k).contains("true")) spark.conf.set(k, "true")
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case LongType => // nanos surfaced as long under the legacy conf
          raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        case TimestampNTZType => // micros; NTZ→LTZ is a no-op under UTC
          raw.withColumn("ts", F.col("ts").cast(TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
