package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full correctness-gate catalog (one entry per implemented
  * operator from SURVEY.md §2 + the §2.4 extensions); `oracleSql` carries the
  * DuckDB-equivalent SQL for everything SQL-expressible. Column names are
  * aligned pairwise because the driver hashes values under sorted column
  * names.
  */
object SparkEntry {

  private val catalogs: Seq[Catalog] = Seq(Projections, Relational, TpchMore, Advanced, Quality, Sketches, Layout, LlmText, LlmBpe, LlmDedup, LlmSimilarity, LlmMultimodal, LlmIngest, LlmRetrieval, AvroGates, SourceGates)

  /** Flagship query on sf=0.001: revenue by region across the whole star
    * schema (two broadcast dims + two fact joins + aggregation).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val li = t("lineitem")
    val ord = t("orders")
    val cust = t("customer")
    val nat = t("nation")
    val reg = t("region")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(F.broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(F.broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy("r_name")
      .agg(F.round(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 2).as("revenue"),
        F.count(F.lit(1)).as("n_lineitems"))
      .orderBy("r_name")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.flatMap(_.queries).toMap

  /** All gate names INCLUDING any cross-catalog duplicates — the contract
    * spec asserts none exist (a duplicate would silently shadow a gate in
    * the `toMap` above). Within-catalog duplicates are invisible here
    * (the Map literal already deduped them); only cross-catalog shadowing
    * is detectable at this layer.
    */
  def allQueryNames: Seq[String] = catalogs.flatMap(_.queries.keys)

  /** Same, for oracle names — a duplicated oracle alone would silently
    * verify a gate against the wrong SQL.
    */
  def allOracleNames: Seq[String] = catalogs.flatMap(_.oracles.keys)

  def oracleSql: Map[String, String] =
    catalogs.flatMap(_.oracles).toMap
}
