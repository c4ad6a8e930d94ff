package graft.operators

import org.apache.spark.sql.{functions => F}
import graft.functions.ZOrder

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
        .orderBy("l_orderkey", "l_linenumber"))
  )

  val oracles: Map[String, String] = Map(
    "q_zorder" ->
      """SELECT l_orderkey, l_linenumber,
                l_partkey % 256 AS px, l_suppkey % 256 AS sx,
                CAST(list_sum(list_transform(generate_series(0, 7), i ->
                  (((l_partkey % 256 >> i) & 1) << (2*i+1)) +
                  (((l_suppkey % 256 >> i) & 1) << (2*i)))) AS BIGINT) AS zval
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber"""
  )
}
