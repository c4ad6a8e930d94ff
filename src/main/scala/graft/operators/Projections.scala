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

    // O5: duplicate output names get _N suffixes in select order
    "proj_collision" -> ((s, dir) =>
      table(s, dir, "customer")
        .sql("SELECT c_nationkey as key, c_custkey as key, c_acctbal as key")
        .orderBy("key_1")),

    // O9: star-with-overrides in structure mode — explicit field first (at
    // its select-list position), star expands the REST in schema order
    "proj_struct_star_override" -> ((s, dir) =>
      table(s, dir, "orders")
        .sql("SELECT o_orderstatus as st, * FROM t withstructure")
        .orderBy("o_orderkey")),

    // O11: map key cherry-pick + rename, flattened back out for the oracle
    "proj_map_pick" -> ((s, dir) =>
      table(s, dir, "part")
        .select(F.col("p_partkey"),
          F.map(F.lit("brand"), F.col("p_brand"),
            F.lit("type"), F.col("p_type")).as("attrs"))
        .sql("SELECT p_partkey, attrs.brand as b FROM t withstructure")
        .select(F.col("p_partkey"),
          F.element_at(F.col("attrs"), "b").as("brand_val"),
          F.map_keys(F.col("attrs")).getItem(0).as("kept_key"),
          F.size(F.col("attrs")).as("n_keys"))
        .orderBy("p_partkey")),

    // O14: projection through a nullable parent struct → null propagates
    "proj_nullable_prop" -> ((s, dir) =>
      table(s, dir, "customer")
        .select(F.col("c_custkey"),
          F.when(F.col("c_acctbal") >= 0,
            F.struct(F.col("c_acctbal").as("bal"),
              F.col("c_mktsegment").as("seg"))).as("acct"))
        .sql("SELECT c_custkey, acct.bal as bal")
        .orderBy("c_custkey")),

    // Reference parity: trailing WHERE/ORDER BY/LIMIT clauses parse and
    // are IGNORED — the reference reads only the select list out of the
    // Calcite tree (AvroSql.scala:75,79), so the "filter" must not
    // filter. The oracle is therefore the UNFILTERED projection.
    "proj_where_ignored" -> ((s, dir) =>
      table(s, dir, "customer")
        .sql("SELECT c_custkey, c_name as name FROM t " +
          "WHERE c_custkey < 0 ORDER BY name LIMIT 5")
        .orderBy("c_custkey")),

    // Multi-branch union EXTENSION (the reference rejects [A, B] unions,
    // AvroSchemaSql.scala:40-47): Avro records with a [string, int]
    // union field cross the bridge as a tagged struct
    // {tag, string, int} and project with dotted paths like any struct.
    // The record-level bridge is driver-side by definition (same
    // contract as AvroSql's per-record API); the bounded `part` table
    // stands in for a Kafka message stream.
    "proj_union_branch" -> ((s, dir) => {
      import org.apache.avro.{Schema => ASchema, SchemaBuilder}
      import org.apache.avro.generic.GenericData
      val unionS = ASchema.createUnion(java.util.Arrays.asList(
        ASchema.create(ASchema.Type.STRING),
        ASchema.create(ASchema.Type.INT)))
      val recS = SchemaBuilder.record("PartAttr").namespace("graft")
        .fields()
        .requiredLong("p_partkey")
        .name("attr").`type`(unionS).noDefault()
        .endRecord()
      // the driver-side collect is bounded BY CONSTRUCTION: the bridge
      // demo needs a message-stream-sized batch, not the table — the
      // deterministic key filter caps it at 4000 records at ANY SF
      val recs = table(s, dir, "part")
        .filter(F.coalesce(F.col("p_partkey"), F.lit(0L)) <= 4000)
        .select("p_partkey", "p_brand", "p_size").collect().toSeq.map { r =>
          val g = new GenericData.Record(recS)
          val k = r.getLong(0)
          g.put("p_partkey", k)
          g.put("attr",
            if (k % 2 == 0) r.getString(1) else Int.box(r.getInt(2)))
          g
        }
      graft.avro.AvroBridge.toDF(s, recS, recs)
        .sql("SELECT p_partkey, attr.tag as tag, " +
          "attr.string as sval, attr.int as ival")
        .orderBy("p_partkey")
    }),

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
    "proj_where_ignored" ->
      """SELECT c_custkey, c_name AS name
         FROM customer ORDER BY c_custkey""",
    "proj_union_branch" ->
      """SELECT p_partkey,
              CASE WHEN p_partkey % 2 = 0 THEN 'string' ELSE 'int' END
                AS tag,
              CASE WHEN p_partkey % 2 = 0 THEN p_brand END AS sval,
              CASE WHEN p_partkey % 2 = 1 THEN p_size END AS ival
         FROM part WHERE p_partkey <= 4000 ORDER BY p_partkey""",
    "proj_withstructure" ->
      """SELECT o_orderkey, o_totalprice AS price
         FROM orders ORDER BY o_orderkey""",
    "proj_array_rebuild" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS q1, l_tax AS q2
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "proj_collision" ->
      """SELECT c_nationkey AS key, c_custkey AS key_1, c_acctbal AS key_2
         FROM customer ORDER BY key_1""",
    "proj_struct_star_override" ->
      """SELECT o_orderstatus AS st, o_orderkey, o_custkey, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders ORDER BY o_orderkey""",
    "proj_map_pick" ->
      """SELECT p_partkey, p_brand AS brand_val, 'b' AS kept_key,
                1 AS n_keys
         FROM part ORDER BY p_partkey""",
    "proj_nullable_prop" ->
      """SELECT c_custkey,
                CASE WHEN c_acctbal >= 0 THEN c_acctbal END AS bal
         FROM customer ORDER BY c_custkey"""
  )
}
