package graft.operators

import org.apache.spark.sql.{functions => F}

/** Gate queries exercising the projection engine (reference operators
  * O2-O11, SURVEY.md §2.2) against real parquet tables. Nested inputs are
  * constructed with `struct()`/`array()` so the DuckDB oracle can state the
  * equivalent flat result over the raw tables.
  */
object Projections extends Catalog {

  import graft.sql.GraftSql.implicits._

  val queries: Map[String, Q] = Map(
    // O2: flat projection + rename
    "proj_rename" -> ((s, dir) =>
      table(s, dir, "customer")
        .sql("SELECT c_custkey, c_name as name, c_acctbal as bal")
        .orderBy("c_custkey")),

    // O3: star expansion with sibling exclusion + interleaving
    "proj_star_exclusion" -> ((s, dir) =>
      table(s, dir, "customer")
        .sql("SELECT c_mktsegment as segment, *")
        .orderBy("c_custkey")),

    // O4: nested dotted-path flatten (+ O5 via alias)
    "proj_nested_flatten" -> ((s, dir) =>
      table(s, dir, "orders")
        .select(F.col("o_orderkey"),
          F.struct(F.col("o_totalprice").as("price"),
            F.struct(F.col("o_orderdate").as("dt")).as("at")).as("info"))
        .sql("SELECT o_orderkey, info.price as price, info.at.dt as dt")
        .orderBy("o_orderkey")),

    // O8: withstructure cherry-pick, flattened afterwards for the oracle
    "proj_withstructure" -> ((s, dir) =>
      table(s, dir, "orders")
        .select(F.col("o_orderkey"),
          F.struct(F.col("o_totalprice").as("price"),
            F.col("o_orderstatus").as("status")).as("info"))
        .sql("SELECT o_orderkey, info.price FROM t withstructure")
        .select(F.col("o_orderkey"), F.col("info.price").as("price"))
        .orderBy("o_orderkey")),

    // O10: projection inside array elements (transform), flattened back out
    "proj_array_rebuild" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .select(F.col("l_orderkey"), F.col("l_linenumber"),
          F.array(
            F.struct(F.col("l_quantity").as("q"), F.col("l_discount").as("d")),
            F.struct(F.col("l_tax").as("q"), F.col("l_discount").as("d"))
          ).as("items"))
        .sql("SELECT l_orderkey, l_linenumber, items.q FROM t withstructure")
        .select(F.col("l_orderkey"), F.col("l_linenumber"),
          F.col("items").getItem(0).getField("q").as("q1"),
          F.col("items").getItem(1).getField("q").as("q2"))
        .orderBy("l_orderkey", "l_linenumber"))
  )

  val oracles: Map[String, String] = Map(
    "proj_rename" ->
      """SELECT c_custkey, c_name AS name, c_acctbal AS bal
         FROM customer ORDER BY c_custkey""",
    "proj_star_exclusion" ->
      """SELECT c_mktsegment AS segment, c_custkey, c_name, c_nationkey,
                c_acctbal
         FROM customer ORDER BY c_custkey""",
    "proj_nested_flatten" ->
      """SELECT o_orderkey, o_totalprice AS price, o_orderdate AS dt
         FROM orders ORDER BY o_orderkey""",
    "proj_withstructure" ->
      """SELECT o_orderkey, o_totalprice AS price
         FROM orders ORDER BY o_orderkey""",
    "proj_array_rebuild" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS q1, l_tax AS q2
         FROM lineitem ORDER BY l_orderkey, l_linenumber"""
  )
}
