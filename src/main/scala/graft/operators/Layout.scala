package graft.operators

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.functions.ZOrder

/** Size-targeted small-file compaction — the OPTIMIZE/maintenance
  * primitive that keeps scan task counts sane after streaming appends or
  * over-parallel writes. The output file count comes from the REAL
  * on-disk bytes (not row counts), so a 100 TB table compacts toward the
  * configured target regardless of row width; the rewrite is one
  * round-robin repartition (no keys → no skew, each output file an even
  * byte share).
  */
object Compact {
  /** Rewrite the parquet dataset at `in` into `out` targeting
    * `targetBytes` per file; returns the chosen output file count.
    */
  def compact(spark: SparkSession, in: String, out: String,
      targetBytes: Long): Int = {
    val bytes = listBytes(in)
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(in).repartition(n)
      .write.mode("overwrite").parquet(out)
    n
  }

  /** Data files under `dir`, RECURSIVE — a partitionBy layout nests its
    * files in key=value subdirectories, and a non-recursive listing
    * would report 0 bytes and collapse the rewrite to one partition.
    * Hidden/metadata entries (_SUCCESS, .crc) are skipped at every
    * level. Local-filesystem only, like the rest of this test harness;
    * a cluster deployment would route through Hadoop's FileSystem.
    */
  private def walk(f: java.io.File): Seq[java.io.File] = {
    val name = f.getName
    if (name.startsWith("_") || name.startsWith(".")) Seq.empty
    else if (f.isFile) Seq(f)
    else Option(f.listFiles()).toSeq.flatten.flatMap(walk)
  }

  /** Total bytes of data files under `dir` (recursive). */
  def listBytes(dir: String): Long =
    walk(new java.io.File(dir)).map(_.length()).sum

  /** Count of data files under `dir` (recursive). */
  def dataFiles(dir: String): Int = walk(new java.io.File(dir)).size
}

/** Data-layout operators: multi-dimensional (z-order) clustering keys.
  *
  * The gate checks the z-VALUE computation cross-engine; the layout
  * benefit itself (per-file min/max narrowing on every interleaved
  * dimension → file pruning for predicates on any of them) is proved by
  * ZOrderSpec, which writes z-clustered vs linearly-sorted files and
  * counts how many files a box query's stats ranges overlap.
  */
object Layout extends Catalog {

  val queries: Map[String, Q] = Map(

    // 8-bit × 8-bit Morton interleave of (partkey, suppkey) buckets — the
    // clustering key a 100 TB lineitem layout would range-partition by so
    // part- AND supplier-scoped scans both prune. Narrow per-row bit
    // arithmetic, fully codegen'd, no shuffle before the oracle ORDER BY.
    "q_zorder" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .select(F.col("l_orderkey"), F.col("l_linenumber"),
          (F.col("l_partkey") % 256).as("px"),
          (F.col("l_suppkey") % 256).as("sx"))
        .withColumn("zval", ZOrder.zvalue(F.col("px"), F.col("sx"), 8))
        .orderBy("l_orderkey", "l_linenumber")),

    // Hilbert index of the same (partkey, suppkey) bucket pair — the
    // layout curve with unit-step locality (consecutive indices are
    // adjacent grid cells, so each range-partitioned file covers ONE
    // contiguous region where a z-range covers disconnected blocks).
    // The kernel is a codegen'd native expression (the per-level
    // rotate/reflect is a sequential recurrence, not an interleave);
    // the oracle unrolls the same 8 levels as CTE steps. HilbertLaws
    // proves bijectivity + adjacency; AvroClusterSpec drives the curve
    // through clusterBy and proves both dimensions prune.
    "q_hilbert" -> ((s, dir) => {
      graft.functions.VectorFunctions.register(s)
      table(s, dir, "lineitem")
        .select(F.col("l_orderkey"), F.col("l_linenumber"),
          (F.col("l_partkey") % 256).as("px"),
          (F.col("l_suppkey") % 256).as("sx"))
        .withColumn("hval", graft.functions.VectorFunctions.hilbert2(
          F.col("px"), F.col("sx"), 8))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Small-file compaction round trip: fragment the documents table
    // into 64 files, compact to a byte-budgeted count, and prove the
    // rewrite is content-invisible (the oracle aggregates the original).
    // CompactSpec asserts the file-count collapse; the gate pins the
    // value identity under the driver's hash.
    "q_compact" -> ((s, dir) => {
      val frag = tempDir("graft_gate_compact_in")
      val out = tempDir("graft_gate_compact_out")
      table(s, dir, "documents").repartition(64)
        .write.mode("overwrite").parquet(frag)
      Compact.compact(s, frag, out, 32L * 1024 * 1024)
      s.read.parquet(out)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum(F.col("n_chars")).as("chars"),
          F.min("doc_id").as("first_doc"),
          F.max("doc_id").as("last_doc"))
        .orderBy("lang", "source")
    })
  )

  /** The Hilbert recurrence unrolled: one CTE step per level (s = 128
    * down to 1), each computing the quadrant bits (rx, ry), accumulating
    * d += s²·((3rx) XOR ry) — expressed as 3rx + ry(1−2rx), identical
    * integer arithmetic in both engines — and applying the
    * reflect-then-swap rotation. Matches Hilbert.xy2d line for line.
    */
  private val hilbertOracle: String = {
    val steps = (7 to 0 by -1).zipWithIndex.map { case (k, i) =>
      val s = 1L << k
      s"""h${i + 1} AS (
           SELECT l_orderkey, l_linenumber, px, sx,
                  d + ${s * s} * (3 * rx + ry * (1 - 2 * rx)) AS d,
                  CASE WHEN ry = 0 THEN
                    (CASE WHEN rx = 1 THEN $s - 1 - y ELSE y END)
                  ELSE x END AS x,
                  CASE WHEN ry = 0 THEN
                    (CASE WHEN rx = 1 THEN $s - 1 - x ELSE x END)
                  ELSE y END AS y
           FROM (SELECT *, (x >> $k) & 1 AS rx, (y >> $k) & 1 AS ry
                 FROM h$i) t)"""
    }.mkString(",\n       ")
    s"""WITH h0 AS (
         SELECT l_orderkey, l_linenumber,
                l_partkey % 256 AS px, l_suppkey % 256 AS sx,
                CAST(l_partkey % 256 AS BIGINT) AS x,
                CAST(l_suppkey % 256 AS BIGINT) AS y,
                CAST(0 AS BIGINT) AS d
         FROM lineitem),
       $steps
       SELECT l_orderkey, l_linenumber, px, sx, d AS hval
       FROM h8 ORDER BY l_orderkey, l_linenumber"""
  }

  val oracles: Map[String, String] = Map(
    "q_hilbert" -> hilbertOracle,
    "q_zorder" ->
      """SELECT l_orderkey, l_linenumber,
                l_partkey % 256 AS px, l_suppkey % 256 AS sx,
                CAST(list_sum(list_transform(generate_series(0, 7), i ->
                  (((l_partkey % 256 >> i) & 1) << (2*i+1)) +
                  (((l_suppkey % 256 >> i) & 1) << (2*i)))) AS BIGINT) AS zval
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber""",
    "q_compact" ->
      """SELECT lang, source, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS chars,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM documents GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
