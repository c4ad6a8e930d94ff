package graft.operators

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Spark-contributed relational surface (SURVEY.md §2.3): filter, join
  * (shuffle/broadcast/semi/anti), aggregation, rollup/cube, window, sort,
  * limit, set ops, scalar/date/JSON functions — each wired to a DuckDB
  * oracle.
  *
  * Scale notes (100 TB design): filters and projections push to the scan;
  * dimension joins are explicitly `broadcast()`; fact-fact joins shuffle on
  * the join key only after filtering; aggregates are partial (map-side) by
  * construction; float aggregates are rounded so the oracle hash is stable.
  */
object Relational extends Catalog {

  val queries: Map[String, Q] = Map(

    // TPC-H Q1 flavour: map-side partial agg, 6 aggregates, tiny result
    "q1_agg" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-01")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          F.round(F.sum("l_quantity"), 2).as("sum_qty"),
          F.round(F.sum("l_extendedprice"), 2).as("sum_base_price"),
          F.round(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 2).as("sum_disc_price"),
          F.round(F.avg("l_quantity"), 4).as("avg_qty"),
          F.round(F.avg("l_discount"), 4).as("avg_disc"),
          F.count(F.lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // predicate pushdown: filter reaches the parquet scan, no shuffle at all
    "q_filter" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .filter(F.col("l_discount").between(0.05, 0.07) &&
          F.col("l_quantity") < 24)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
          "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    // TPC-H Q3 flavour: broadcast the filtered dimension, shuffle join facts
    "q3_top_orders" -> ((s, dir) => {
      val cust = table(s, dir, "customer")
        .filter(F.col("c_mktsegment") === "BUILDING")
      val ord = table(s, dir, "orders")
        .filter(F.col("o_orderdate") < F.to_timestamp(F.lit("1997-06-01")))
      val li = table(s, dir, "lineitem")
        .filter(F.col("l_shipdate") > F.to_timestamp(F.lit("1997-06-01")))
      // scale-safe plan: broadcast ONLY the filtered customer dim; the
      // orders⋈lineitem fact-fact join shuffles on orderkey (AQE may still
      // choose broadcast at toy scale, but nothing fact-sized is forced
      // through the driver — at 100 TB this stays a shuffle join).
      li.join(ord.join(F.broadcast(cust),
          ord("o_custkey") === cust("c_custkey")),
          li("l_orderkey") === ord("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 2).as("revenue"))
        .orderBy(F.col("revenue").desc, F.col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 flavour: 6-table join tree. customer and supplier SCALE
    // with the data (no forced broadcast — they shuffle on their keys,
    // AQE may still broadcast at small SF); only the fixed-size
    // nation/region dims are broadcast. The local-supplier condition
    // (supplier nation = customer nation) rides on the supplier join.
    "q5_local_supplier" -> ((s, dir) => {
      val cust = table(s, dir, "customer")
      val ord = table(s, dir, "orders")
        .filter(F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")) &&
          F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
      val li = table(s, dir, "lineitem")
      val sup = table(s, dir, "supplier")
      val nat = table(s, dir, "nation")
      val reg = table(s, dir, "region")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(sup,
          li("l_suppkey") === sup("s_suppkey") &&
            cust("c_nationkey") === sup("s_nationkey"))
        .join(F.broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(F.broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .filter(reg("r_name") === "ASIA")
        .groupBy(nat("n_name").as("n_name"))
        .agg(F.round(F.sum(li("l_extendedprice") * (F.lit(1) - li("l_discount"))), 2)
          .as("revenue"))
        .orderBy(F.col("revenue").desc, F.col("n_name"))
    }),

    // TPC-H Q10 flavour: returned-item revenue per customer, top 20.
    // Facts shuffle on their join keys; only the fixed nation dim is
    // broadcast; the global top-20 compiles to TakeOrderedAndProject.
    "q10_returned_items" -> ((s, dir) => {
      val cust = table(s, dir, "customer")
      val ord = table(s, dir, "orders")
        .filter(F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")) &&
          F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01")))
      val li = table(s, dir, "lineitem").filter(F.col("l_returnflag") === "R")
      val nat = table(s, dir, "nation")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(F.broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(cust("c_custkey").as("c_custkey"), cust("c_name").as("c_name"),
          nat("n_name").as("n_name"))
        .agg(F.round(F.sum(li("l_extendedprice") * (F.lit(1) - li("l_discount"))), 2)
          .as("revenue"))
        .orderBy(F.col("revenue").desc, F.col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18 flavour: large-volume orders — an aggregated IN-subquery
    // becomes a semi-join against the grouped fact (the filter list is
    // fact-derived, so it joins rather than broadcasts at scale)
    "q18_big_orders" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val big = li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").as("qty"))
        .filter(F.col("qty") > 220)
        .select(F.col("l_orderkey").as("big_ok"))
      val ord = table(s, dir, "orders")
      val cust = table(s, dir, "customer")
      ord.join(big, ord("o_orderkey") === F.col("big_ok"), "left_semi")
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(li, ord("o_orderkey") === li("l_orderkey"))
        .groupBy(cust("c_custkey").as("c_custkey"),
          ord("o_orderkey").as("o_orderkey"),
          ord("o_totalprice").as("o_totalprice"))
        .agg(F.round(F.sum("l_quantity"), 2).as("total_qty"))
        .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey"))
        .limit(50)
    }),

    // star-schema rollup through two broadcast dims
    "q_region_rollup" -> ((s, dir) => {
      val sup = table(s, dir, "supplier")
      val nat = table(s, dir, "nation")
      val reg = table(s, dir, "region")
      sup.join(F.broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(F.broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).as("n_suppliers"),
          F.round(F.sum("s_acctbal"), 2).as("total_bal"))
        .orderBy("r_name")
    }),

    // window: top-3 orders per customer
    "q_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey"))
      table(s, dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // window: running sum per customer over time
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "orders")
        .withColumn("running_total", F.round(F.sum("o_totalprice").over(w), 2))
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // global top-k: orderBy+limit compiles to TakeOrderedAndProject (no full sort)
    "q_sort_topk" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .orderBy(F.col("l_extendedprice").desc, F.col("l_orderkey"),
          F.col("l_linenumber"))
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")),

    "q_distinct" -> ((s, dir) =>
      table(s, dir, "customer")
        .select("c_nationkey", "c_mktsegment").distinct()
        .orderBy("c_nationkey", "c_mktsegment")),

    // set ops: symmetric difference of customer/supplier nations, tagged.
    // One scan per table + one join — EXCEPT/EXCEPT/INTERSECT would read
    // each side three times and shuffle three times for the same result.
    "q_setops" -> ((s, dir) => {
      val c = table(s, dir, "customer")
        .select(F.col("c_nationkey").as("nk")).distinct()
        .withColumn("in_c", F.lit(1))
      val su = table(s, dir, "supplier")
        .select(F.col("s_nationkey").as("nk")).distinct()
        .withColumn("in_s", F.lit(1))
      c.join(su, Seq("nk"), "full_outer")
        .select(F.col("nk"),
          F.when(F.col("in_c").isNotNull && F.col("in_s").isNotNull, "both")
            .when(F.col("in_c").isNotNull, "customer_only")
            .otherwise("supplier_only").as("side"))
        .orderBy("side", "nk")
    }),

    // grouping sets via rollup (NULL indicators coalesced for the oracle)
    "q_rollup" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).as("n"),
          F.round(F.sum("l_quantity"), 2).as("qty"))
        .select(F.coalesce(F.col("l_returnflag"), F.lit("ALL")).as("rf"),
          F.coalesce(F.col("l_linestatus"), F.lit("ALL")).as("ls"),
          F.col("n"), F.col("qty"))
        .orderBy("rf", "ls")),

    "q_cube" -> ((s, dir) =>
      table(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).as("n"))
        .select(F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).as("st"),
          F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).as("pri"),
          F.col("n"))
        .orderBy("st", "pri")),

    // outer joins: orders-per-customer with both unmatched sides kept
    "q_full_outer" -> ((s, dir) => {
      val o = table(s, dir, "orders")
        .groupBy(F.col("o_custkey")).agg(F.count(F.lit(1)).as("n_orders"))
      val c = table(s, dir, "customer")
        .select(F.col("c_custkey"), F.col("c_mktsegment"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(
          F.coalesce(c("c_custkey"), o("o_custkey")).as("k"),
          F.coalesce(F.col("c_mktsegment"), F.lit("NO_CUSTOMER")).as("seg"),
          F.coalesce(F.col("n_orders"), F.lit(0L)).as("n_orders"))
        .orderBy("k")
    }),

    // semi/anti joins (EXISTS / NOT EXISTS)
    "q_semi_join" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")
    }),
    "q_anti_join" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // scalar function library: string/math
    "q_scalar_funcs" -> ((s, dir) =>
      table(s, dir, "part")
        .select(F.col("p_partkey"),
          F.upper(F.col("p_brand")).as("brand_u"),
          F.length(F.col("p_name")).as("name_len"),
          F.substring(F.col("p_type"), 1, 5).as("type5"),
          F.concat_ws("-", F.col("p_brand"), F.col("p_type")).as("brand_type"),
          F.round(F.col("p_retailprice") * 1.1, 2).as("bumped"),
          F.abs(F.col("p_size") - 25).as("size_dist"))
        .orderBy("p_partkey")),

    // exact percentiles (sort-based; DuckDB quantile_cont uses the same
    // linear interpolation). At scale prefer approx_percentile sketches —
    // kept exact here because sketch algorithms differ across engines.
    "q_percentile" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.expr("percentile(l_quantity, 0.5)").as("med"),
          F.expr("percentile(l_quantity, 0.9)").as("p90"),
          F.expr("percentile(l_extendedprice, 0.5)").as("med_price"))
        .orderBy("l_returnflag")),

    // array + map function library over constructed collections, flattened
    // back to scalars for the oracle
    "q_array_funcs" -> ((s, dir) =>
      table(s, dir, "part")
        .select(F.col("p_partkey"),
          F.array(F.col("p_size"), F.lit(25), F.col("p_size") * 2).as("arr"),
          F.map(F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type"))
            .as("m"))
        .select(F.col("p_partkey"),
          F.array_max(F.col("arr")).as("amax"),
          F.array_min(F.col("arr")).as("amin"),
          F.element_at(F.array_sort(F.col("arr")), 2).as("amed"),
          F.array_contains(F.col("arr"), 25).as("has25"),
          F.size(F.col("arr")).as("alen"),
          F.element_at(F.col("m"), "brand").as("brand"),
          F.size(F.col("m")).as("mlen"))
        .orderBy("p_partkey")),

    // date/time functions
    "q_datetime_funcs" -> ((s, dir) =>
      table(s, dir, "orders")
        .select(F.col("o_orderkey"),
          F.year(F.col("o_orderdate")).as("y"),
          F.month(F.col("o_orderdate")).as("m"),
          F.dayofmonth(F.col("o_orderdate")).as("d"),
          F.date_trunc("month", F.col("o_orderdate")).as("month_start"),
          F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1995-01-01"))).as("days_since"))
        .orderBy("o_orderkey")),

    // JSON-ish extraction from the events props payload
    "q_json_extract" -> ((s, dir) =>
      table(s, dir, "events")
        .select(F.col("event_id"),
          F.regexp_extract(F.col("props"), "\"k\": (\\d+)", 1).cast("int").as("k"))
        .orderBy("event_id")),

    // Spark 4 VARIANT over the semi-structured props payload:
    // parse_json → a binary variant column, typed extraction with
    // variant_get, safe extraction of an absent path with
    // try_variant_get (NULL, not an error), and schema_of_variant for
    // shape profiling. The oracle extracts the same numbers through
    // DuckDB's JSON type — engine-specific schema STRINGS never cross
    // the comparison, only their distinct COUNT does.
    "q_variant_extract" -> ((s, dir) => {
      table(s, dir, "events").createOrReplaceTempView("v_ev_var")
      s.sql(
        """SELECT event_type, count(*) AS n,
          |       CAST(sum(variant_get(parse_json(props), '$.k',
          |                            'bigint')) AS BIGINT) AS k_sum,
          |       CAST(min(variant_get(parse_json(props), '$.k',
          |                            'bigint')) AS BIGINT) AS k_min,
          |       CAST(max(variant_get(parse_json(props), '$.k',
          |                            'bigint')) AS BIGINT) AS k_max,
          |       count(DISTINCT schema_of_variant(parse_json(props)))
          |         AS n_shapes,
          |       CAST(sum(CASE WHEN try_variant_get(parse_json(props),
          |                       '$.missing', 'bigint') IS NULL
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_absent
          |FROM v_ev_var GROUP BY event_type ORDER BY event_type
          |""".stripMargin)
    }),

    // INTERVAL UNION (merge overlapping spans — the dedup step of any
    // availability/coverage computation): each event opens a 5-minute
    // interval; per user, overlapping-or-touching intervals merge via
    // gaps-and-islands — a new island starts where the running max of
    // previous ends stays short of the next start. Exact integer
    // micros end to end; one shuffle on user_id, two window passes.
    "q_interval_union" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val iv = table(s, dir, "events")
        .select(F.col("user_id"),
          F.unix_micros(F.col("ts")).as("st"))
        .withColumn("en", F.col("st") + 300000000L)
      val w = Window.partitionBy("user_id").orderBy("st", "en")
      iv.withColumn("prevMax",
          F.max("en").over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("brk",
          F.when(F.col("prevMax").isNull ||
            F.col("prevMax") < F.col("st"), 1L).otherwise(0L))
        .withColumn("grp", F.sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "grp")
        .agg(F.min("st").as("st"), F.max("en").as("en"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).as("n_spans"),
          F.sum(F.col("en") - F.col("st")).cast("long")
            .as("covered_us"),
          F.max(F.col("en") - F.col("st")).cast("long")
            .as("longest_us"))
        .orderBy("user_id")
    }),

    // MODE with a deterministic tie-break (engines disagree on which
    // mode to return, so the contract is pinned: the SMALLEST value
    // among the most frequent): count per (group, value), then one
    // argmax window ordered (count desc, value asc). Quantity is
    // integer-valued in TPC-H; floor-scale makes that explicit.
    "q_mode" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cnt = table(s, dir, "lineitem")
        .select(F.col("l_returnflag").as("flag"),
          F.expr("CAST(floor(l_quantity) AS BIGINT)").as("qty"))
        .groupBy("flag", "qty").agg(F.count(F.lit(1)).as("n"))
      cnt.withColumn("rn", F.row_number().over(
          Window.partitionBy("flag")
            .orderBy(F.col("n").desc, F.col("qty"))))
        .filter(F.col("rn") === 1)
        .select(F.col("flag"), F.col("qty").as("mode_qty"),
          F.col("n").as("mode_n"))
        .orderBy("flag")
    }),

    // TIME-WEIGHTED AVERAGE (the metrics-system aggregation: a value
    // holds until the next observation, so its weight is the gap to
    // the successor): per user, Σ cents·Δt over Σ Δt in exact integer
    // micros — the last observation carries no interval and drops out,
    // the same convention as any step-function integral. One shuffle,
    // one lead() window, one aggregate; the final divide is a positive
    // floor div.
    "q_time_weighted_avg" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      table(s, dir, "events")
        .select(F.col("user_id"), F.col("event_id"),
          F.unix_micros(F.col("ts")).as("us"),
          F.expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
        .withColumn("nxt", F.lead("us", 1).over(w))
        .filter(F.col("nxt").isNotNull)
        .withColumn("dt", F.col("nxt") - F.col("us"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).as("n_obs"),
          F.sum("dt").cast("long").as("span_us"),
          F.sum(F.col("cents") * F.col("dt")).cast("long").as("wsum"))
        .filter(F.col("span_us") > 0)
        .select(F.col("user_id"), F.col("n_obs"), F.col("span_us"),
          F.expr("wsum div span_us").as("twa_cents"))
        .orderBy("user_id")
    }),

    // Spark 4 SQL PIPE SYNTAX (`|>`): the same aggregation written as
    // a linear pipeline — FROM |> WHERE |> AGGREGATE … GROUP BY |>
    // ORDER BY — must equal the oracle's classic SELECT exactly; this
    // pins the engine's pipe-operator surface, not new semantics.
    "q_pipe_syntax" -> ((s, dir) => {
      table(s, dir, "orders").createOrReplaceTempView("v_ord_pipe")
      s.sql(
        """FROM v_ord_pipe
          ||> WHERE o_totalprice > 1000
          ||> AGGREGATE count(*) AS n_orders,
          |     CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
          |       AS BIGINT) AS cents
          |   GROUP BY o_orderpriority
          ||> ORDER BY o_orderpriority""".stripMargin)
    }),

    // CASE bucketing + aggregation
    "q_case_agg" -> ((s, dir) =>
      table(s, dir, "customer")
        .withColumn("bucket",
          F.when(F.col("c_acctbal") < 0, "negative")
            .when(F.col("c_acctbal") < 5000, "mid")
            .otherwise("high"))
        .groupBy("c_mktsegment", "bucket")
        .agg(F.count(F.lit(1)).as("n"),
          F.round(F.sum("c_acctbal"), 2).as("bal"))
        .orderBy("c_mktsegment", "bucket")),

    // time-bucketed aggregation over the event stream table (batch form of
    // the streaming tumbling window — same plan shape as readStream+window)
    "q_time_window" -> ((s, dir) =>
      table(s, dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).as("hour"),
          F.col("event_type"))
        .agg(F.count(F.lit(1)).as("n"),
          F.round(F.sum("value"), 2).as("total_value"))
        .orderBy("hour", "event_type")),

    // hopping (sliding) window: 1-hour windows every 30 minutes — each
    // event lands in exactly 2 windows (the batch shape of the streaming
    // sliding window; same plan under readStream)
    "q_sliding_window" -> ((s, dir) =>
      table(s, dir, "events")
        .groupBy(F.window(F.col("ts"), "1 hour", "30 minutes"),
          F.col("event_type"))
        .agg(F.count(F.lit(1)).as("n"))
        .select(F.col("window.start").as("ws"), F.col("window.end").as("we"),
          F.col("event_type"), F.col("n"))
        .orderBy("ws", "event_type")),

    // Exact DISTINCT count over SLIDING windows — the op naive plans get
    // wrong at scale: a per-window distinct can't be maintained
    // incrementally like a sum, so the scale-safe exact form replicates
    // each event into the (window/slide = 2) windows containing it and
    // runs ONE partial-aggregatable count-distinct per window group.
    // The row multiplication is bounded by the overlap factor, not the
    // data; beyond exactness requirements, swap count_distinct for
    // approx_count_distinct (HLL, q_approx_distinct) and keep the plan.
    "q_sliding_distinct" -> ((s, dir) =>
      table(s, dir, "events")
        .groupBy(F.window(F.col("ts"), "1 hour", "30 minutes"))
        .agg(F.countDistinct(F.col("user_id")).as("n_users"),
          F.count(F.lit(1)).as("n_events"))
        .select(F.col("window.start").as("ws"), F.col("n_users"),
          F.col("n_events"))
        .orderBy("ws")),

    // native session_window (30-minute gap): sessions merge while events
    // keep arriving within the gap; end = last event + gap. Oracled
    // against DuckDB's manual lag/cumsum sessionization.
    "q_session_window" -> ((s, dir) =>
      table(s, dir, "events")
        .groupBy(F.session_window(F.col("ts"), "30 minutes"),
          F.col("user_id"))
        .agg(F.count(F.lit(1)).as("n_events"),
          F.round(F.sum("value"), 2).as("total_value"))
        .select(F.col("user_id"),
          F.col("session_window.start").as("ss"),
          F.col("session_window.end").as("se"),
          F.col("n_events"), F.col("total_value"))
        .orderBy("user_id", "ss")),

    // sessionization: gap-based sessions via lag + running flag sum
    "q_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      table(s, dir, "events")
        .withColumn("prev_ts", F.lag("ts", 1).over(byUser))
        .withColumn("new_session",
          F.when(F.col("prev_ts").isNull ||
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts")) >
              1800L * 1000000L,
            1).otherwise(0))
        .withColumn("session_idx", F.sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("user_id", "event_id", "session_idx")
        .orderBy("user_id", "event_id")
    }),

    "q_having" -> ((s, dir) =>
      table(s, dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).as("n_sup"))
        .filter(F.col("n_sup") >= 2)
        .orderBy("s_nationkey")),

    // Range join, scale-safe shape: candidate pairs come from an equi-join
    // on (user, minute-bucket ± 1) — each row meets only its temporal
    // neighbourhood, never the whole partition — then the exact |Δt| ≤ 60 s
    // predicate filters. A naive theta-join would be O(per-user²) rows;
    // this is O(per-bucket²) with minute buckets.
    "q_range_join" -> ((s, dir) => {
      val e = table(s, dir, "events")
        .select(F.col("user_id"), F.col("event_id"),
          F.unix_micros(F.col("ts")).as("us"))
        .withColumn("bucket", F.floor(F.col("us") / F.lit(60000000L)))
      val a = e.select(F.col("user_id"), F.col("event_id").as("i"),
        F.col("us").as("ua"), F.col("bucket"))
      val b = e.select(F.col("user_id"), F.col("event_id").as("j"),
        F.col("us").as("ub"),
        F.explode(F.array(F.col("bucket") - 1, F.col("bucket"),
          F.col("bucket") + 1)).as("bucket"))
      a.join(b, Seq("user_id", "bucket"))
        .filter(F.col("i") < F.col("j") &&
          F.abs(F.col("ua") - F.col("ub")) <= 60000000L)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).as("n_close_pairs"))
        .orderBy("user_id")
    }),

    // RANGE window frame: per-customer order totals over the trailing
    // 30 days (frame bounded by VALUE distance, not row count), plus
    // lead/first_value navigation
    "q_window_range" -> ((s, dir) => {
      // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC so the cast is the
      // identity instant and matches DuckDB's epoch() on the naive value
      val epoch = F.expr(
        "unix_micros(cast(o_orderdate as timestamp)) DIV 1000000")
      val w = Window.partitionBy("o_custkey").orderBy("epoch_s")
        .rangeBetween(-30L * 86400, 0)
      val wNav = Window.partitionBy("o_custkey")
        .orderBy("epoch_s", "o_orderkey")
      table(s, dir, "orders")
        .withColumn("epoch_s", epoch)
        .withColumn("trailing_30d",
          F.round(F.sum("o_totalprice").over(w), 2))
        .withColumn("next_order", F.lead("o_orderkey", 1).over(wNav))
        .withColumn("first_order", F.first("o_orderkey").over(wNav))
        .select("o_custkey", "o_orderkey", "trailing_30d", "next_order",
          "first_order")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // As-of join (each event → most recent strictly-prior purchase of the
    // same user), composed as a windowed carry-forward: one shuffle on the
    // partition key, no join. The oracle is DuckDB's native ASOF JOIN, so
    // this gate proves the composition IS an as-of join.
    "q_asof_join" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      table(s, dir, "events")
        .withColumn("last_purchase_id",
          F.last(F.when(F.col("event_type") === "purchase", F.col("event_id")),
            ignoreNulls = true).over(w))
        .select("event_id", "user_id", "last_purchase_id")
        .orderBy("event_id")
    }),

    // Correlated scalar subquery through the spark.sql(...) string surface
    // (Catalyst decorrelates it into a left outer aggregate join)
    "q_scalar_subquery" -> ((s, dir) => {
      table(s, dir, "customer").createOrReplaceTempView("v_customer")
      table(s, dir, "orders").createOrReplaceTempView("v_orders")
      s.sql(
        """SELECT c_custkey,
          |       (SELECT count(*) FROM v_orders WHERE o_custkey = c_custkey)
          |         AS n_orders
          |FROM v_customer ORDER BY c_custkey""".stripMargin)
    }),

    // arbitrary GROUPING SETS through the SQL surface (finer than
    // rollup/cube: exactly the requested combinations are aggregated)
    "q_grouping_sets" -> ((s, dir) => {
      table(s, dir, "orders").createOrReplaceTempView("v_orders_gs")
      s.sql(
        """SELECT coalesce(o_orderstatus, 'ALL') AS st,
          |       coalesce(o_orderpriority, 'ALL') AS pri,
          |       count(*) AS n
          |FROM v_orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY st, pri""".stripMargin)
    }),

    // lateral explode with position (posexplode) — flatten the first 5
    // words of each document with their ordinal
    "q_explode" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(F.col("doc_id"),
          F.posexplode(F.slice(F.split(F.col("text"), " "), 1, 5)))
        .withColumnsRenamed(Map("pos" -> "pos", "col" -> "word"))
        .orderBy("doc_id", "pos")),

    // Bag-semantics set ops (EXCEPT ALL keeps duplicate multiplicity)
    "q_except_all" -> ((s, dir) => {
      val o = table(s, dir, "orders").select(F.col("o_custkey").as("ck"))
      val c = table(s, dir, "customer").select(F.col("c_custkey").as("ck"))
      o.exceptAll(c) // customers with >1 order survive (multiplicity - 1)
        .groupBy("ck").agg(F.count(F.lit(1)).as("extra_orders"))
        .orderBy("ck")
    }),
    "q_intersect_all" -> ((s, dir) => {
      val li = table(s, dir, "lineitem").select(F.col("l_suppkey").as("sk"))
      val su = table(s, dir, "supplier").select(F.col("s_suppkey").as("sk"))
      li.intersectAll(su) // min(multiplicity) per key — suppliers used ≥1×
        .groupBy("sk").agg(F.count(F.lit(1)).as("n"))
        .orderBy("sk")
    }),

    // Pivot: explicit value list so no extra distinct-values job runs (at
    // scale, always pass the values — the implicit collect is a full pass)
    "q_pivot" -> ((s, dir) =>
      table(s, dir, "customer")
        .groupBy("c_nationkey")
        .pivot("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .agg(F.round(F.sum("c_acctbal"), 2))
        .orderBy("c_nationkey")),

    // Skew-safe two-stage (salted) aggregation: stage 1 pre-aggregates on
    // (salt, key) so a hot key spreads over 16 reducers; stage 2 merges the
    // 16 partials per key. Same result as a direct groupBy — the pattern
    // bounds any single reducer's load at 1/16th of the hottest key.
    "q_skew_salted" -> ((s, dir) => {
      val salted = table(s, dir, "events")
        .withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
        .groupBy("user_id", "salt")
        .agg(F.count(F.lit(1)).as("pn"), F.sum("value").as("pv"))
      salted.groupBy("user_id")
        .agg(F.sum("pn").as("n_events"),
          F.round(F.sum("pv"), 2).as("total_value"))
        .orderBy("user_id")
    }),

    // UNPIVOT (melt): wide aggregate row → long (metric, value) form —
    // the inverse of q_pivot. Values share BIGINT type by construction.
    "q_unpivot" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast("long")).as("sum_qty"),
          F.count(F.lit(1)).as("n_lines"))
        .unpivot(Array(F.col("l_returnflag")),
          Array(F.col("sum_qty"), F.col("n_lines")), "metric", "value")
        .orderBy("l_returnflag", "metric")),

    // distribution window functions: ntile / percent_rank / cume_dist.
    // percent_rank and cume_dist are exact rationals ((rank-1)/(n-1),
    // rank/n) — identical doubles in both engines — reported floor-scaled
    // because round()'s half-tie rule differs across engines whenever a
    // partition size makes the rational dyadic (e.g. 129 rows → k/128
    // lands exactly on a .xxxxxx5 boundary).
    "q_window_stats" -> ((s, dir) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal"), F.col("c_custkey"))
      table(s, dir, "customer")
        .select(F.col("c_custkey"), F.col("c_nationkey"),
          F.ntile(4).over(w).as("quartile"),
          F.floor(F.lit(1000000.0) * F.percent_rank().over(w)).as("pr_m"),
          F.floor(F.lit(1000000.0) * F.cume_dist().over(w)).as("cd_m"))
        .orderBy("c_custkey")
    }),

    // ordered string aggregation: collect_list is shuffle-order-dependent,
    // so the list is sorted before joining — same contract as DuckDB's
    // string_agg(... ORDER BY).
    "q_string_agg" -> ((s, dir) => {
      val nat = table(s, dir, "nation")
      val reg = table(s, dir, "region")
      nat.join(F.broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",")
          .as("nations"))
        .orderBy("r_name")
    }),

    // Data-quality profile: one row per column with null and distinct
    // counts — the "analyze corpus" step of a pipeline. ONE pass computes
    // every aggregate (count-distincts expand, but the scan is single);
    // stack() melts the wide aggregate row. String-rendered min/max are
    // deliberately excluded: double/timestamp formatting differs across
    // engines.
    "q_profile" -> ((s, dir) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val aggs = F.count(F.lit(1)).as("n_rows") +:
        cols.flatMap(c => Seq(
          F.sum(F.when(F.col(c).isNull, 1).otherwise(0)).as(s"nul_$c"),
          F.countDistinct(F.col(c)).as(s"dis_$c")))
      val stacked = cols.map(c => s"'$c', nul_$c, dis_$c").mkString(", ")
      table(s, dir, "orders")
        .agg(aggs.head, aggs.tail: _*)
        .select(F.col("n_rows"),
          F.expr(s"stack(${cols.size}, $stacked) as (col_name, n_nulls, n_distinct)"))
        .select("col_name", "n_rows", "n_nulls", "n_distinct")
        .orderBy("col_name")
    }),

    // native per-key top-k through the custom-plan stack (logical
    // TopKPerKey → TopKStrategy → partial/final TopKPerKeyExec): map-side
    // bounded heaps prune the exchange to partitions×keys×k candidate
    // rows — no full sort of any partition, unlike the window
    // row_number() formulation (q_window_topk). Oracled against DuckDB's
    // QUALIFY row_number form; ties broken by orderkey.
    "q_topk_native" -> ((s, dir) => {
      graft.plans.GraftPlans.register(s)
      graft.plans.GraftPlans.topKPerKey(table(s, dir, "orders"),
          Seq(F.col("o_orderpriority")),
          Seq(F.col("o_totalprice").desc, F.col("o_orderkey")), 5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .orderBy(F.col("o_orderpriority"), F.col("o_totalprice").desc,
          F.col("o_orderkey"))
    }),

    // MERGE/upsert as a full-outer join + COALESCE — the incremental
    // corpus-refresh primitive (new crawl snapshot into the document
    // store). One shuffle on the merge key; at 100 TB the base side's
    // reshuffle is avoided by bucketing both sides on doc_id (see
    // BucketedJoinSpec) so the merge is a zero-exchange sort-merge join.
    "q_upsert" -> ((s, dir) => {
      val base = table(s, dir, "documents")
        .select(F.col("doc_id"), F.col("lang"), F.col("n_chars"))
      val changes = base.filter(F.col("doc_id") % 7 === 0)
        .select(F.col("doc_id"), F.col("lang"),
          (F.col("n_chars") + 1000L).as("n_chars"))
        .unionByName(base.filter(F.col("doc_id") % 13 === 0)
          .select((F.col("doc_id") + 1000000L).as("doc_id"),
            F.lit("xx").as("lang"), F.lit(42L).as("n_chars")))
      val b = base.as("b")
      val u = changes.as("u")
      b.join(u, F.col("b.doc_id") === F.col("u.doc_id"), "full_outer")
        .select(
          F.coalesce(F.col("u.doc_id"), F.col("b.doc_id")).as("doc_id"),
          F.coalesce(F.col("u.lang"), F.col("b.lang")).as("lang"),
          F.coalesce(F.col("u.n_chars"), F.col("b.n_chars")).as("n_chars"),
          F.when(F.col("u.doc_id").isNotNull && F.col("b.doc_id").isNotNull,
            "updated")
            .when(F.col("b.doc_id").isNull, "inserted")
            .otherwise("kept").as("op"))
        .orderBy("doc_id")
    }),

    // SCD type-2 dimension build from a change log: collapse consecutive
    // duplicates to change points, then validity intervals via lead().
    // ONE hash exchange on the dimension key serves both window passes
    // (same partitioning; sort-within-partition only), so the build
    // scales as a single shuffle of the changelog — the standard
    // warehouse pattern without a self-join.
    "q_scd2" -> ((s, dir) => {
      val byKey = Window.partitionBy("user_id").orderBy("ts", "event_id")
      table(s, dir, "events")
        .withColumn("prev", F.lag("event_type", 1).over(byKey))
        .filter(F.col("prev").isNull ||
          F.col("prev") =!= F.col("event_type"))
        .select(F.col("user_id"), F.col("event_type"),
          F.col("ts").as("valid_from"),
          F.lead("ts", 1).over(byKey).as("valid_to"),
          F.row_number().over(byKey).as("version"))
        .withColumn("is_current", F.col("valid_to").isNull)
        .orderBy("user_id", "valid_from")
    }),

    // CDC latest-state snapshot as a PARTIAL AGGREGATE: max over a
    // (ts, event_id, payload...) struct is associative, so map-side
    // combine reduces each partition to one row per key BEFORE the
    // shuffle — the scale-correct form of "latest per key". The window
    // row_number()=1 formulation shuffles and sorts the entire changelog;
    // this shuffles at most n_keys × n_partitions pre-combined rows.
    // Deterministic because the struct order is (ts, event_id) and
    // event_id is unique.
    "q_cdc_snapshot" -> ((s, dir) =>
      table(s, dir, "events")
        .groupBy("user_id")
        .agg(F.max(F.struct(F.col("ts"), F.col("event_id"),
          F.col("event_type"), F.col("value"))).as("s"))
        .select(F.col("user_id"), F.col("s.ts").as("ts"),
          F.col("s.event_id").as("event_id"),
          F.col("s.event_type").as("event_type"),
          F.col("s.value").as("value"))
        .orderBy("user_id")),

    // Funnel conversion: first signup → first purchase within 24 h.
    // Both sides pre-aggregate/filter before the user_id join, and the
    // conditional min is a partial aggregate — no window, no
    // event-by-event sequence scan.
    "q_funnel" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val signup = ev.filter(F.col("event_type") === "signup")
        .groupBy("user_id").agg(F.min("ts").as("signup_ts"))
      val purch = ev.filter(F.col("event_type") === "purchase")
        .select(F.col("user_id"), F.col("ts").as("p_ts"))
      signup.join(purch, Seq("user_id"), "left")
        .groupBy("user_id", "signup_ts")
        .agg(F.min(F.when(F.col("p_ts") > F.col("signup_ts") &&
          F.col("p_ts") <= F.col("signup_ts") + F.expr("INTERVAL 24 HOURS"),
          F.col("p_ts"))).as("first_conv_ts"))
        .withColumn("converted", F.col("first_conv_ts").isNotNull)
        .orderBy("user_id")
    }),

    // Cohort retention: users bucketed by first-activity week × weeks
    // since. Week offsets are exact integers (epoch arithmetic on
    // week-truncated UTC timestamps), so the matrix hash-matches across
    // engines; the distinct-activity projection shrinks the fact before
    // the cohort join.
    "q_cohort" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(F.col("user_id"), F.date_trunc("week", F.col("ts")).as("wk"))
      val cohort = ev.groupBy("user_id").agg(F.min("wk").as("cohort_week"))
      val active = ev.distinct()
      active.join(cohort, "user_id")
        .withColumn("week_offset",
          ((F.unix_timestamp(F.col("wk")) -
            F.unix_timestamp(F.col("cohort_week"))) / 604800L).cast("long"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // GAP-FILL / RESAMPLE: dense daily scaffold per key (generated
    // in-engine, never shuffled for its own sake), left join of the
    // sparse daily aggregates, count gaps filled with 0 and values
    // carried forward (last non-null over an ordered window). 100 TB
    // shape: scaffold = distinct-keys × broadcast day-spine (linear,
    // co-keyed with the join), one shuffle on (user_id, day), one
    // window pass per key; values are per-row integer-scaled so sums
    // are order-proof.
    "q_gapfill" -> ((s, dir) => {
      val ev = table(s, dir, "events").filter(F.col("user_id") < 50)
        .select(F.col("user_id"),
          F.date_trunc("day", F.col("ts")).as("day"),
          F.floor(F.col("value") * 1000).cast("long").as("v"))
      val daily = ev.groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).as("n"), F.sum("v").as("v_sum"))
      val days = ev.agg(F.min("day").as("d0"), F.max("day").as("d1"))
        .select(F.explode(F.expr("sequence(d0, d1, interval 1 day)"))
          .as("day"))
      val scaffold = ev.select("user_id").distinct()
        .crossJoin(F.broadcast(days))
      val w = Window.partitionBy("user_id").orderBy("day")
      scaffold.join(daily, Seq("user_id", "day"), "left")
        .withColumn("n_filled", F.coalesce(F.col("n"), F.lit(0L)))
        .withColumn("v_carry",
          F.last("v_sum", ignoreNulls = true).over(w))
        .select("user_id", "day", "n_filled", "v_carry")
        .orderBy("user_id", "day")
    }),

    // EWMA — exponentially weighted moving average per user, the
    // sequential-recurrence member of the time-series family:
    // s_1 = x_1, s_t = floor((x_t + 3·s_{t-1}) / 4) (α = 1/4), inputs
    // quantized ONCE to integer cents so every step is exact and the
    // DuckDB recursive-CTE oracle replays it bit for bit (the same
    // quantize-then-integer-recurrence discipline as the ADPCM codec).
    // The fold state is a (init, s) struct — no sentinel value that a
    // legitimate input could collide with — and the divide subtracts the
    // positive mod first so Spark `div` (truncating) equals DuckDB `//`
    // (flooring) even for negative intermediate values.
    // Scale shape: one shuffle groups each user's bounded event list;
    // the fold is a per-row array pass (session-scale groups — for
    // unbounded keys this becomes transformWithState, q_stream_tws).
    "q_ewma" -> ((s, dir) => {
      val e = table(s, dir, "events")
        .select(F.col("user_id"),
          F.unix_micros(F.col("ts")).as("us"), F.col("event_id"),
          F.floor(F.col("value") * 100).cast("long").as("x"))
      e.groupBy("user_id")
        .agg(F.expr("array_sort(collect_list(struct(us, event_id, x)))")
          .as("arr"))
        .select(F.col("user_id"),
          F.expr("aggregate(arr, " +
            "named_struct('init', false, 's', cast(0 as bigint)), " +
            "(acc, e) -> if(NOT acc.init, " +
            "named_struct('init', true, 's', e.x), " +
            "named_struct('init', true, 's', " +
            "(e.x + 3 * acc.s - pmod(e.x + 3 * acc.s, 4)) div 4)), " +
            "acc -> acc.s)").as("ewma"),
          F.size(F.col("arr")).cast("long").as("n"))
        .orderBy("user_id")
    }),

    // OHLC resampling — open/high/low/close bars per (user, hour), the
    // standard time-series downsample: open/close are min_by/max_by on
    // the (ts, event_id) total order (ties impossible), high/low plain
    // min/max, all on integer cents. One partial-aggregatable shuffle.
    "q_ohlc" -> ((s, dir) => {
      val e = table(s, dir, "events")
        .select(F.col("user_id"),
          F.date_trunc("hour", F.col("ts")).as("hr"),
          F.unix_micros(F.col("ts")).as("us"), F.col("event_id"),
          F.floor(F.col("value") * 100).cast("long").as("x"))
      e.groupBy("user_id", "hr")
        .agg(
          F.expr("min_by(x, struct(us, event_id))").as("open"),
          F.max("x").as("high"), F.min("x").as("low"),
          F.expr("max_by(x, struct(us, event_id))").as("close"),
          F.count(F.lit(1)).as("n"))
        .orderBy("user_id", "hr")
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_base_price,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                round(avg(l_quantity), 4) AS avg_qty,
                round(avg(l_discount), 4) AS avg_disc,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
                l_extendedprice
         FROM lineitem
         WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
         ORDER BY l_orderkey, l_linenumber""",
    "q3_top_orders" ->
      """SELECT l_orderkey,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
           AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1997-06-01'
           AND l_shipdate > TIMESTAMP '1997-06-01'
         GROUP BY l_orderkey
         ORDER BY revenue DESC, l_orderkey
         LIMIT 10""",
    "q5_local_supplier" ->
      """SELECT n_name,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name""",
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM customer, orders, lineitem, nation
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND c_nationkey = n_nationkey
           AND l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-07-01'
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey
         LIMIT 20""",
    "q18_big_orders" ->
      """SELECT c_custkey, o_orderkey, o_totalprice,
                round(sum(l_quantity), 2) AS total_qty
         FROM customer, orders, lineitem
         WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
           AND o_orderkey IN (SELECT l_orderkey FROM lineitem
                              GROUP BY l_orderkey HAVING sum(l_quantity) > 220)
         GROUP BY c_custkey, o_orderkey, o_totalprice
         ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 50""",
    "q_region_rollup" ->
      """SELECT r_name, count(*) AS n_suppliers,
                round(sum(s_acctbal), 2) AS total_bal
         FROM supplier, nation, region
         WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
                round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                  AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q_sort_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
         FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         LIMIT 100""",
    "q_distinct" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
         ORDER BY c_nationkey, c_mktsegment""",
    "q_setops" ->
      """WITH c AS (SELECT c_nationkey AS nk FROM customer),
            su AS (SELECT s_nationkey AS nk FROM supplier)
         SELECT nk, 'customer_only' AS side FROM (SELECT * FROM c EXCEPT SELECT * FROM su)
         UNION ALL
         SELECT nk, 'supplier_only' AS side FROM (SELECT * FROM su EXCEPT SELECT * FROM c)
         UNION ALL
         SELECT nk, 'both' AS side FROM (SELECT * FROM c INTERSECT SELECT * FROM su)
         ORDER BY side, nk""",
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
                coalesce(l_linestatus, 'ALL') AS ls,
                count(*) AS n, round(sum(l_quantity), 2) AS qty
         FROM lineitem
         GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
                coalesce(o_orderpriority, 'ALL') AS pri, count(*) AS n
         FROM orders
         GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY st, pri""",
    "q_full_outer" ->
      """SELECT coalesce(c.c_custkey, o.o_custkey) AS k,
                coalesce(c.c_mktsegment, 'NO_CUSTOMER') AS seg,
                coalesce(o.n_orders, 0) AS n_orders
         FROM customer c
         FULL OUTER JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
                          FROM orders GROUP BY o_custkey) o
           ON c.c_custkey = o.o_custkey
         ORDER BY k""",
    "q_semi_join" ->
      """SELECT c_custkey FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_scalar_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
                length(p_name) AS name_len,
                substring(p_type, 1, 5) AS type5,
                concat_ws('-', p_brand, p_type) AS brand_type,
                round(p_retailprice * 1.1, 2) AS bumped,
                abs(p_size - 25) AS size_dist
         FROM part ORDER BY p_partkey""",
    "q_percentile" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.5) AS med,
                quantile_cont(l_quantity, 0.9) AS p90,
                quantile_cont(l_extendedprice, 0.5) AS med_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_array_funcs" ->
      """SELECT p_partkey,
                list_max([p_size, 25, p_size * 2]) AS amax,
                list_min([p_size, 25, p_size * 2]) AS amin,
                list_sort([p_size, 25, p_size * 2])[2] AS amed,
                list_contains([p_size, 25, p_size * 2], 25) AS has25,
                CAST(len([p_size, 25, p_size * 2]) AS INT) AS alen,
                p_brand AS brand,
                2 AS mlen
         FROM part ORDER BY p_partkey""",
    "q_datetime_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
                day(o_orderdate) AS d,
                date_trunc('month', o_orderdate) AS month_start,
                date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                  AS days_since
         FROM orders ORDER BY o_orderkey""",
    "q_json_extract" ->
      """SELECT event_id,
                CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
         FROM events ORDER BY event_id""",
    // identical islands arithmetic; epoch_us(ts) = Spark unix_micros
    "q_interval_union" ->
      """WITH iv AS (
           SELECT user_id, epoch_us(ts) AS st,
                  epoch_us(ts) + 300000000 AS en
           FROM events),
         marked AS (
           SELECT user_id, st, en,
                  max(en) OVER (PARTITION BY user_id ORDER BY st, en
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prevMax
           FROM iv),
         brk AS (
           SELECT user_id, st, en,
                  CASE WHEN prevMax IS NULL OR prevMax < st
                       THEN 1 ELSE 0 END AS b
           FROM marked),
         grp AS (
           SELECT user_id, st, en,
                  sum(b) OVER (PARTITION BY user_id ORDER BY st, en
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS g
           FROM brk),
         spans AS (
           SELECT user_id, min(st) AS st, max(en) AS en
           FROM grp GROUP BY user_id, g)
         SELECT user_id, count(*) AS n_spans,
                CAST(sum(en - st) AS BIGINT) AS covered_us,
                CAST(max(en - st) AS BIGINT) AS longest_us
         FROM spans GROUP BY user_id ORDER BY user_id""",
    // same argmax: count desc, value asc — never DuckDB's own mode()
    // (its tie choice is unspecified)
    "q_mode" ->
      """WITH cnt AS (
           SELECT l_returnflag AS flag,
                  CAST(floor(l_quantity) AS BIGINT) AS qty,
                  count(*) AS n
           FROM lineitem GROUP BY flag, qty),
         ranked AS (
           SELECT flag, qty, n,
                  row_number() OVER (PARTITION BY flag
                                     ORDER BY n DESC, qty) AS rn
           FROM cnt)
         SELECT flag, qty AS mode_qty, CAST(n AS BIGINT) AS mode_n
         FROM ranked WHERE rn = 1 ORDER BY flag""",
    // identical step-function integral; wsum can exceed 2^63? no:
    // cents < 2^17, dt < 2^40, n < 2^17 ⇒ wsum < 2^63 comfortably
    "q_time_weighted_avg" ->
      """WITH obs AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
                  CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         gapped AS (
           SELECT user_id, cents,
                  lead(us) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id) - us AS dt
           FROM obs),
         agg AS (
           SELECT user_id, count(*) AS n_obs,
                  CAST(sum(dt) AS BIGINT) AS span_us,
                  CAST(sum(cents * dt) AS BIGINT) AS wsum
           FROM gapped WHERE dt IS NOT NULL GROUP BY user_id)
         SELECT user_id, n_obs, span_us, wsum // span_us AS twa_cents
         FROM agg WHERE span_us > 0 ORDER BY user_id""",
    // the pipe query must equal the classic SELECT
    "q_pipe_syntax" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
         FROM orders WHERE o_totalprice > 1000
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // DuckDB's JSON type plays the variant: typed extraction, absent
    // paths as NULL, json_structure for the shape count
    "q_variant_extract" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                  AS BIGINT) AS k_sum,
                CAST(min(CAST(json_extract(props, '$.k') AS BIGINT))
                  AS BIGINT) AS k_min,
                CAST(max(CAST(json_extract(props, '$.k') AS BIGINT))
                  AS BIGINT) AS k_max,
                count(DISTINCT CAST(json_structure(props) AS VARCHAR))
                  AS n_shapes,
                CAST(sum(CASE WHEN json_extract(props, '$.missing')
                              IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_absent
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_case_agg" ->
      """SELECT c_mktsegment,
                CASE WHEN c_acctbal < 0 THEN 'negative'
                     WHEN c_acctbal < 5000 THEN 'mid'
                     ELSE 'high' END AS bucket,
                count(*) AS n, round(sum(c_acctbal), 2) AS bal
         FROM customer
         GROUP BY 1, 2 ORDER BY c_mktsegment, bucket""",
    "q_time_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
                count(*) AS n, round(sum(value), 2) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q_sliding_window" ->
      """SELECT make_timestamp((epoch_us(ts) // 1800000000 - k) * 1800000000)
                  AS ws,
                make_timestamp((epoch_us(ts) // 1800000000 - k) * 1800000000
                  + 3600000000) AS we,
                event_type, count(*) AS n
         FROM events, (SELECT unnest([0, 1]) AS k)
         GROUP BY 1, 2, 3 ORDER BY ws, event_type""",
    "q_sliding_distinct" ->
      """SELECT make_timestamp((epoch_us(ts) // 1800000000 - k) * 1800000000)
                  AS ws,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                count(*) AS n_events
         FROM events, (SELECT unnest([0, 1]) AS k)
         GROUP BY 1 ORDER BY ws""",
    "q_session_window" ->
      """WITH flagged AS (
           SELECT user_id, ts, value,
                  CASE WHEN lag(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                              PARTITION BY user_id ORDER BY ts, event_id))
                            >= 1800 * 1000000
                       THEN 1 ELSE 0 END AS new_session,
                  event_id
           FROM events),
         sessions AS (
           SELECT user_id, ts, value,
                  sum(new_session) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS session_idx
           FROM flagged)
         SELECT user_id, min(ts) AS ss,
                max(ts) + INTERVAL 30 MINUTE AS se,
                count(*) AS n_events, round(sum(value), 2) AS total_value
         FROM sessions GROUP BY user_id, session_idx
         ORDER BY user_id, ss""",
    "q_sessionize" ->
      """SELECT user_id, event_id,
                CAST(sum(new_session) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_idx
         FROM (
           SELECT user_id, event_id, ts,
                  CASE WHEN lag(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                              PARTITION BY user_id ORDER BY ts, event_id))
                            > 1800 * 1000000
                       THEN 1 ELSE 0 END AS new_session
           FROM events)
         ORDER BY user_id, event_id""",
    "q_having" ->
      """SELECT s_nationkey, count(*) AS n_sup FROM supplier
         GROUP BY s_nationkey HAVING count(*) >= 2
         ORDER BY s_nationkey""",
    "q_range_join" ->
      """SELECT user_id, count(*) AS n_close_pairs FROM (
           SELECT a.user_id
           FROM events a JOIN events b
             ON a.user_id = b.user_id AND a.event_id < b.event_id
            AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000)
         GROUP BY user_id ORDER BY user_id""",
    "q_window_range" ->
      """SELECT o_custkey, o_orderkey,
                round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                  ORDER BY epoch_s
                  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2)
                  AS trailing_30d,
                lead(o_orderkey) OVER (PARTITION BY o_custkey
                  ORDER BY epoch_s, o_orderkey) AS next_order,
                first_value(o_orderkey) OVER (PARTITION BY o_custkey
                  ORDER BY epoch_s, o_orderkey) AS first_order
         FROM (SELECT *, CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
               FROM orders)
         ORDER BY o_custkey, o_orderkey""",
    "q_asof_join" ->
      """WITH p AS (SELECT user_id, ts, event_id AS last_purchase_id
                    FROM events WHERE event_type = 'purchase')
         SELECT e.event_id, e.user_id, p.last_purchase_id
         FROM events e ASOF LEFT JOIN p
           ON e.user_id = p.user_id AND e.ts > p.ts
         ORDER BY e.event_id""",
    "q_scalar_subquery" ->
      """SELECT c_custkey,
                (SELECT count(*) FROM orders WHERE o_custkey = c_custkey)
                  AS n_orders
         FROM customer ORDER BY c_custkey""",
    "q_except_all" ->
      """SELECT ck, count(*) AS extra_orders FROM (
           SELECT o_custkey AS ck FROM orders
           EXCEPT ALL
           SELECT c_custkey AS ck FROM customer)
         GROUP BY ck ORDER BY ck""",
    "q_intersect_all" ->
      """SELECT sk, count(*) AS n FROM (
           SELECT l_suppkey AS sk FROM lineitem
           INTERSECT ALL
           SELECT s_suppkey AS sk FROM supplier)
         GROUP BY sk ORDER BY sk""",
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
                coalesce(o_orderpriority, 'ALL') AS pri,
                count(*) AS n
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY st, pri""",
    "q_explode" ->
      """SELECT doc_id, CAST(t.i - 1 AS INT) AS pos, w[t.i] AS word
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
              unnest(generate_series(1, least(5, len(d.w)))) t(i)
         ORDER BY doc_id, pos""",
    "q_pivot" ->
      """SELECT c_nationkey,
                round(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c_acctbal END), 2) AS "AUTOMOBILE",
                round(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal END), 2) AS "BUILDING",
                round(sum(CASE WHEN c_mktsegment = 'FURNITURE' THEN c_acctbal END), 2) AS "FURNITURE",
                round(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN c_acctbal END), 2) AS "HOUSEHOLD",
                round(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN c_acctbal END), 2) AS "MACHINERY"
         FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q_skew_salted" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                round(sum(value), 2) AS total_value
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_unpivot" ->
      """WITH a AS (
           SELECT l_returnflag,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                  count(*) AS n_lines
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, metric, value
         FROM a UNPIVOT (value FOR metric IN (sum_qty, n_lines))
         ORDER BY l_returnflag, metric""",
    "q_window_stats" ->
      """SELECT c_custkey, c_nationkey,
                CAST(ntile(4) OVER w AS INT) AS quartile,
                CAST(floor(1000000.0 * (percent_rank() OVER w)) AS BIGINT) AS pr_m,
                CAST(floor(1000000.0 * (cume_dist() OVER w)) AS BIGINT) AS cd_m
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
         ORDER BY c_custkey""",
    "q_string_agg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
         FROM nation JOIN region ON r_regionkey = n_regionkey
         GROUP BY 1 ORDER BY 1""",
    "q_profile" ->
      """WITH p AS (
           SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
                  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                  count(DISTINCT o_orderkey) AS n_distinct FROM orders
           UNION ALL
           SELECT 'o_custkey', count(*),
                  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  count(DISTINCT o_custkey) FROM orders
           UNION ALL
           SELECT 'o_orderstatus', count(*),
                  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  count(DISTINCT o_orderstatus) FROM orders
           UNION ALL
           SELECT 'o_totalprice', count(*),
                  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  count(DISTINCT o_totalprice) FROM orders
           UNION ALL
           SELECT 'o_orderdate', count(*),
                  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  count(DISTINCT o_orderdate) FROM orders
           UNION ALL
           SELECT 'o_orderpriority', count(*),
                  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  count(DISTINCT o_orderpriority) FROM orders)
         SELECT col_name, n_rows, n_nulls, n_distinct
         FROM p ORDER BY col_name""",
    "q_scd2" ->
      """WITH ordered AS (
           SELECT user_id, event_type, ts, event_id,
                  lag(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS prev
           FROM events),
         changes AS (
           SELECT user_id, event_type, ts, event_id FROM ordered
           WHERE prev IS NULL OR prev <> event_type)
         SELECT user_id, event_type, ts AS valid_from,
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS valid_to,
                CAST(row_number() OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS INT) AS version,
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  IS NULL AS is_current
         FROM changes ORDER BY user_id, valid_from""",
    "q_funnel" ->
      """WITH s AS (
           SELECT user_id, min(ts) AS signup_ts FROM events
           WHERE event_type = 'signup' GROUP BY 1),
         p AS (
           SELECT user_id, ts FROM events WHERE event_type = 'purchase')
         SELECT s.user_id, s.signup_ts,
                min(CASE WHEN p.ts > s.signup_ts
                          AND p.ts <= s.signup_ts + INTERVAL 24 HOUR
                         THEN p.ts END) AS first_conv_ts,
                min(CASE WHEN p.ts > s.signup_ts
                          AND p.ts <= s.signup_ts + INTERVAL 24 HOUR
                         THEN p.ts END) IS NOT NULL AS converted
         FROM s LEFT JOIN p ON s.user_id = p.user_id
         GROUP BY 1, 2 ORDER BY 1""",
    "q_cohort" ->
      """WITH ev AS (
           SELECT DISTINCT user_id,
                  CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
           FROM events),
         cohort AS (
           SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY 1)
         SELECT c.cohort_week,
                CAST((epoch(e.wk) - epoch(c.cohort_week)) // 604800 AS BIGINT)
                  AS week_offset,
                CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
         FROM ev e JOIN cohort c ON e.user_id = c.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_gapfill" ->
      """WITH ev AS (
           SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                  CAST(floor(value * 1000) AS BIGINT) AS v
           FROM events WHERE user_id < 50),
         daily AS (
           SELECT user_id, day, count(*) AS n,
                  CAST(sum(v) AS BIGINT) AS v_sum
           FROM ev GROUP BY 1, 2),
         b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
         days AS (
           SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
           FROM b),
         scaffold AS (
           SELECT k.user_id, d.day
           FROM (SELECT DISTINCT user_id FROM ev) k, days d)
         SELECT s.user_id, s.day, COALESCE(d.n, 0) AS n_filled,
                last_value(d.v_sum IGNORE NULLS) OVER (
                  PARTITION BY s.user_id ORDER BY s.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS v_carry
         FROM scaffold s LEFT JOIN daily d USING (user_id, day)
         ORDER BY 1, 2""",
    // the recurrence replayed one row per iteration (true sequential
    // recursion, same pattern as llm_audio_adpcm); every value integer
    "q_ewma" ->
      """WITH RECURSIVE e AS (
           SELECT user_id, epoch_us(ts) AS us, event_id,
                  CAST(floor(value * 100) AS BIGINT) AS x
           FROM events),
         ord AS (
           SELECT user_id, x, row_number() OVER (
             PARTITION BY user_id ORDER BY us, event_id) AS rn
           FROM e),
         cnt AS (SELECT user_id, count(*) AS n FROM ord GROUP BY 1),
         rec(user_id, rn, s) AS (
           SELECT user_id, rn, x FROM ord WHERE rn = 1
           UNION ALL
           SELECT o.user_id, o.rn, (o.x + 3 * r.s) // 4
           FROM rec r JOIN ord o
             ON o.user_id = r.user_id AND o.rn = r.rn + 1)
         SELECT r.user_id, CAST(r.s AS BIGINT) AS ewma,
                CAST(c.n AS BIGINT) AS n
         FROM rec r JOIN cnt c ON c.user_id = r.user_id AND r.rn = c.n
         ORDER BY r.user_id""",
    "q_ohlc" ->
      """WITH e AS (
           SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                  epoch_us(ts) AS us, event_id,
                  CAST(floor(value * 100) AS BIGINT) AS x
           FROM events),
         w AS (
           SELECT user_id, hr, x,
                  row_number() OVER (PARTITION BY user_id, hr
                    ORDER BY us, event_id) AS ra,
                  row_number() OVER (PARTITION BY user_id, hr
                    ORDER BY us DESC, event_id DESC) AS rd
           FROM e),
         oc AS (
           SELECT user_id, hr,
                  max(CASE WHEN ra = 1 THEN x END) AS open,
                  max(CASE WHEN rd = 1 THEN x END) AS close
           FROM w GROUP BY 1, 2),
         hl AS (
           SELECT user_id, hr, max(x) AS high, min(x) AS low,
                  count(*) AS n
           FROM e GROUP BY 1, 2)
         SELECT o.user_id, o.hr, o.open, hl.high, hl.low, o.close, hl.n
         FROM oc o JOIN hl ON hl.user_id = o.user_id AND hl.hr = o.hr
         ORDER BY o.user_id, o.hr""",
    "q_cdc_snapshot" ->
      """WITH m AS (
           SELECT user_id,
                  max({'ts': ts, 'eid': event_id, 'et': event_type,
                       'v': value}) AS s
           FROM events GROUP BY 1)
         SELECT user_id, s.ts AS ts, s.eid AS event_id,
                s.et AS event_type, s.v AS value
         FROM m ORDER BY user_id""",
    "q_topk_native" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice
         FROM orders
         QUALIFY row_number() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) <= 5
         ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""",
    "q_upsert" ->
      """WITH base AS (
           SELECT doc_id, lang, n_chars FROM documents),
         changes AS (
           SELECT doc_id, lang, n_chars + 1000 AS n_chars
           FROM base WHERE doc_id % 7 = 0
           UNION ALL
           SELECT doc_id + 1000000, 'xx', 42 FROM base WHERE doc_id % 13 = 0)
         SELECT coalesce(u.doc_id, b.doc_id) AS doc_id,
                coalesce(u.lang, b.lang) AS lang,
                CAST(coalesce(u.n_chars, b.n_chars) AS BIGINT) AS n_chars,
                CASE WHEN u.doc_id IS NOT NULL AND b.doc_id IS NOT NULL
                       THEN 'updated'
                     WHEN b.doc_id IS NULL THEN 'inserted'
                     ELSE 'kept' END AS op
         FROM base b FULL OUTER JOIN changes u ON b.doc_id = u.doc_id
         ORDER BY doc_id"""
  )
}
