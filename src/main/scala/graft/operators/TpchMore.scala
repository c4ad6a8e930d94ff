package graft.operators

import org.apache.spark.sql.{functions => F}

/** Additional TPC-H flavours (beyond Q1/Q3/Q5/Q10/Q18 in Relational.scala),
  * adapted to the driver testdata's columns: there is no partsupp table, no
  * l_commitdate/l_receiptdate/l_shipmode, and no c_phone, so Q4/Q12/Q16/Q22
  * are re-flavoured on the available columns while keeping each query's
  * defining relational shape (EXISTS semi-join, late-line classification,
  * distinct-supplier counting, anti-joined balance screen).
  *
  * Scale notes (100 TB): nation/region are the only forced broadcasts
  * (fixed 25/5 rows); part/supplier/customer SCALE with the data and are
  * left to AQE (shuffle-join by default, runtime-broadcast at toy SF).
  * Fact-fact joins shuffle on the join key after pushed-down date filters.
  * Aggregates are all partial (map-side combine) by construction. Scalar
  * "global max / global avg" values (Q15/Q22) are computed as 1-row
  * aggregates and broadcast-cross-joined — never a single-partition window.
  *
  * Determinism (CLAUDE.md rules): ALL money sums run in exact integer
  * units (see [[discUnits]]) so they are summation-order-independent —
  * no `round(sum(double))` anywhere in this catalog; ratios floor-scale;
  * counts from CASE-sums are cast to BIGINT on the DuckDB side (integer
  * sum → HUGEINT); `year()` is cast to INT on the DuckDB side (BIGINT
  * there, INT in Spark).
  */
object TpchMore extends Catalog {

  /** Discounted revenue in EXACT integer units (1e-4 dollars): price and
    * (1-discount) are 2-decimal values, so each scales to an exact integer
    * and the product/sum stay exact in double — ORDER-INDEPENDENT, unlike
    * `round(sum(double), 2)` whose shuffle-merge order can flip a group
    * that lands on a half-cent boundary (q9 hit this at sf0.01; and Spark's
    * partial-merge order is not stable run-to-run, so a green boundary
    * today can flip tomorrow). Dividing the exact sum once at the end is a
    * single IEEE operation — bit-identical in both engines, no round().
    */
  private val discUnits = F.round(F.col("l_extendedprice") * 100, 0) *
    F.round((F.lit(1) - F.col("l_discount")) * 100, 0)

  /** q2's candidate subtree (part ⋈ part-supplier links ⋈ EUROPE
    * suppliers), pre-checkpoint. Exposed so PlanGuardSpec can assert the
    * p_size pushdown on the REAL scan: the gate checkpoints this subtree
    * (it feeds both sides of the min-join), which replaces the file scan
    * with an RDD scan in the final plan and would otherwise hide the
    * pushed filter from the guard.
    */
  private[graft] def q2Candidates(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val ps = table(s, dir, "lineitem")
      .select(F.col("l_partkey"), F.col("l_suppkey")).distinct()
    val eu = table(s, dir, "supplier")
      .join(F.broadcast(table(s, dir, "nation")),
        F.col("s_nationkey") === F.col("n_nationkey"))
      .join(F.broadcast(table(s, dir, "region")
        .filter(F.col("r_name") === "EUROPE")),
        F.col("n_regionkey") === F.col("r_regionkey"))
      .select(F.col("s_suppkey"), F.col("s_name"), F.col("s_acctbal"),
        F.col("n_name"))
    val part = table(s, dir, "part")
      .filter(F.col("p_size") === 15 && F.col("p_type") === "ECONOMY")
    part.join(ps, part("p_partkey") === ps("l_partkey"))
      .join(eu, F.col("l_suppkey") === F.col("s_suppkey"))
      .select(F.col("p_partkey"), F.col("p_name"), F.col("s_suppkey"),
        F.col("s_name"), F.col("s_acctbal"), F.col("n_name"))
  }

  /** revenue-at-discount (price·discount) in the same exact units. */
  private val rebateUnits = F.round(F.col("l_extendedprice") * 100, 0) *
    F.round(F.col("l_discount") * 100, 0)

  val queries: Map[String, Q] = Map(

    // TPC-H Q6: pure scan-side query — both range predicates push to
    // parquet (PushedFilters), zero joins, one partial-agg reduce.
    "q6_forecast_revenue" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")) &&
          F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")) &&
          F.col("l_discount").between(0.05, 0.07) &&
          F.col("l_quantity") < 24)
        .agg((F.sum(rebateUnits) / 10000.0).as("revenue"),
          F.count(F.lit(1)).as("n_items"))),

    // TPC-H Q4 flavour (no commitdate → "shipped >90 days after order"):
    // the defining shape is EXISTS = left-semi join with a non-equi
    // residual; the date filter on orders prunes the probe side first.
    "q4_priority" -> ((s, dir) => {
      val ord = table(s, dir, "orders")
        .filter(F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")) &&
          F.col("o_orderdate") < F.to_timestamp(F.lit("1997-10-01")))
      val li = table(s, dir, "lineitem")
      ord.join(li,
          ord("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > ord("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q7: volume shipping between two nations, both directions.
    // SCALE-CRITICAL join order: Catalyst cannot push the
    // OR-of-conjunctions pair predicate (it references both sides), and
    // without CBO it will not reorder the joins — so the selective nation
    // filter is applied to each DIM first (nation pre-filtered to the two
    // names, broadcast into supplier and customer), shrinking supplier to
    // ~2/25 and customer to ~2/25 BEFORE any fact-fact shuffle. Each fact
    // then inner-joins its shrunken dim (dropping ~92% of fact rows; the
    // dim joins are left to AQE per the scale policy above — supplier/
    // customer scale with the data), and only the two reduced facts
    // shuffle-join on o_orderkey. The residual filter only removes the two
    // same-nation combinations (1,1)/(2,2). At 100x this carries ~25x
    // less volume through the exchanges than filtering after the joins.
    "q7_volume_shipping" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")) &&
          F.col("l_shipdate") < F.to_timestamp(F.lit("1999-01-01")))
      val pair = Seq("NATION_1", "NATION_2")
      val sn = table(s, dir, "nation")
        .filter(F.col("n_name").isin(pair: _*))
        .select(F.col("n_nationkey").as("sn_key"), F.col("n_name").as("supp_nation"))
      val cn = table(s, dir, "nation")
        .filter(F.col("n_name").isin(pair: _*))
        .select(F.col("n_nationkey").as("cn_key"), F.col("n_name").as("cust_nation"))
      val sup = table(s, dir, "supplier")
        .join(F.broadcast(sn), F.col("s_nationkey") === F.col("sn_key"))
      val cust = table(s, dir, "customer")
        .join(F.broadcast(cn), F.col("c_nationkey") === F.col("cn_key"))
      val ord = table(s, dir, "orders")
      val liSup = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      val ordCust = ord.join(cust, ord("o_custkey") === cust("c_custkey"))
      liSup.join(ordCust, liSup("l_orderkey") === ordCust("o_orderkey"))
        .filter((F.col("supp_nation") === "NATION_1" && F.col("cust_nation") === "NATION_2") ||
          (F.col("supp_nation") === "NATION_2" && F.col("cust_nation") === "NATION_1"))
        .groupBy(F.col("supp_nation"), F.col("cust_nation"),
          F.year(F.col("l_shipdate")).as("l_year"))
        .agg((F.sum(discUnits) / 10000.0).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8 flavour: NATION_3 suppliers' market share of PROMO-part
    // volume sold to ASIA customers, by order year, in exact units.
    // SCALE-CRITICAL join order (same fix as q7): the ASIA region filter
    // is folded into the nation dim FIRST (region ⋈ nation is a 5×25
    // broadcast join), then broadcast into customer — shrinking customer
    // to ~1/5 — before any fact-fact shuffle. orders then joins the
    // shrunken customer, so 4/5 of order rows never reach the
    // lineitem⋈orders exchange instead of being discarded after it.
    // supp_nation rides into supplier the same way (no selectivity, but
    // it removes a post-join broadcast over full fact volume).
    "q8_market_share" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val part = table(s, dir, "part").filter(F.col("p_type") === "PROMO")
      val reg = table(s, dir, "region").filter(F.col("r_name") === "ASIA")
      val cn = table(s, dir, "nation")
        .select(F.col("n_nationkey").as("cn_key"), F.col("n_regionkey").as("cn_region"))
        .join(F.broadcast(reg), F.col("cn_region") === F.col("r_regionkey"))
        .select(F.col("cn_key"))
      val sn = table(s, dir, "nation")
        .select(F.col("n_nationkey").as("sn_key"), F.col("n_name").as("supp_nation"))
      val sup = table(s, dir, "supplier")
        .join(F.broadcast(sn), F.col("s_nationkey") === F.col("sn_key"))
      val cust = table(s, dir, "customer")
        .join(F.broadcast(cn), F.col("c_nationkey") === F.col("cn_key"))
      val ord = table(s, dir, "orders")
        .filter(F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")) &&
          F.col("o_orderdate") < F.to_timestamp(F.lit("1999-01-01")))
      val liSide = li.join(part, li("l_partkey") === part("p_partkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey"))
      val ordSide = ord.join(cust, ord("o_custkey") === cust("c_custkey"))
      liSide.join(ordSide, liSide("l_orderkey") === ordSide("o_orderkey"))
        .groupBy(F.year(F.col("o_orderdate")).as("o_year"))
        .agg((F.sum(F.when(F.col("supp_nation") === "NATION_3", discUnits)
            .otherwise(F.lit(0.0))) / 10000.0).as("nat_vol"),
          (F.sum(discUnits) / 10000.0).as("total_vol"))
        .orderBy("o_year")
    }),

    // TPC-H Q9 flavour (no partsupp → profit is discounted revenue):
    // part-name LIKE filter, supplier-nation × order-year aggregation.
    // With 175 output groups, `round(sum(double), 2)` WILL land a group on
    // a half-cent boundary where engine summation order disagrees (it did:
    // ...425.435 at sf0.01). So the money math is exact integer units:
    // price and (1-discount) are 2-decimal values → scale each to an exact
    // integer, multiply (still exact in double), sum (order-independent),
    // and divide once at the end — bit-identical without any round().
    "q9_profit" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val part = table(s, dir, "part").filter(F.col("p_name").contains("widget"))
      val sup = table(s, dir, "supplier")
      val ord = table(s, dir, "orders")
      val nat = table(s, dir, "nation")
      li.join(part, li("l_partkey") === part("p_partkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") === F.col("n_nationkey"))
        .groupBy(F.col("n_name").as("nation"),
          F.year(F.col("o_orderdate")).as("o_year"))
        .agg((F.sum(discUnits) / 10000.0).as("profit"))
        .orderBy("nation", "o_year")
    }),

    // TPC-H Q12 flavour (no shipmode/receiptdate → late = shipped >60
    // days after order; bucket by returnflag): priority classification
    // as conditional counts over one fact-fact join.
    "q12_late_lines" -> ((s, dir) => {
      val ord = table(s, dir, "orders")
      val li = table(s, dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")) &&
          F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
      val high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      ord.join(li, ord("o_orderkey") === li("l_orderkey"))
        .filter(li("l_shipdate") > ord("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(high, 1).otherwise(0)).as("high_line_count"),
          F.sum(F.when(!high, 1).otherwise(0)).as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q14: promo revenue ratio for one quarter. The ratio divides
    // the two rounded aggregates — bit-identical inputs in both engines.
    "q14_promo_revenue" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-09-01")) &&
          F.col("l_shipdate") < F.to_timestamp(F.lit("1997-12-01")))
      val part = table(s, dir, "part")
      li.join(part, li("l_partkey") === part("p_partkey"))
        .agg((F.sum(F.when(F.col("p_type") === "PROMO", discUnits)
            .otherwise(F.lit(0.0))) / 10000.0).as("promo_rev"),
          (F.sum(discUnits) / 10000.0).as("total_rev"))
        // ppm share floor-scaled from the exact sums: a ratio of integers
        // CAN land exactly on a round() half-way digit; floor cannot tie.
        .withColumn("promo_ppm",
          F.floor(F.lit(1000000.0) * F.col("promo_rev") / F.col("total_rev")))
    }),

    // TPC-H Q15: top supplier by quarterly revenue. The global max is a
    // 1-row aggregate broadcast back (never a single-partition window);
    // equality compares the rounded revenues.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = table(s, dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")) &&
          F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
        .groupBy(F.col("l_suppkey").as("suppkey"))
        .agg((F.sum(discUnits) / 10000.0).as("total_revenue"))
      val mx = rev.agg(F.max("total_revenue").as("max_revenue"))
      val sup = table(s, dir, "supplier")
      rev.join(F.broadcast(mx), F.col("total_revenue") === F.col("max_revenue"))
        .join(sup, F.col("suppkey") === sup("s_suppkey"))
        .select(F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q16 flavour (no partsupp → lineitem is the part-supplier
    // link): distinct suppliers per (brand, type, size) bucket. The
    // distinct pair projection shuffles 16 bytes/row, not the fact row.
    "q16_supplier_cnt" -> ((s, dir) => {
      val ps = table(s, dir, "lineitem")
        .select(F.col("l_partkey"), F.col("l_suppkey")).distinct()
      val part = table(s, dir, "part")
        .filter(F.col("p_brand") =!= "Brand#15" && F.col("p_type") =!= "PROMO" &&
          F.col("p_size").isin(1, 14, 23, 45))
      ps.join(part, ps("l_partkey") === part("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc, F.col("p_brand"), F.col("p_type"),
          F.col("p_size"))
    }),

    // TPC-H Q17: small-quantity lines of one brand vs 20% of the
    // per-part average quantity. Per-part averages are exact (integer
    // quantities sum exactly in double; one IEEE division) so the strict
    // comparison is engine-stable. The average is aggregated over the
    // FULL lineitem then joined back on partkey.
    "q17_small_qty" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val avgq = li.groupBy(F.col("l_partkey").as("ap_key"))
        .agg(F.avg("l_quantity").as("avg_qty"))
      val part = table(s, dir, "part")
        .filter(F.col("p_brand") === "Brand#3" && F.col("p_size") <= 10)
      li.join(part, li("l_partkey") === part("p_partkey"))
        .join(avgq, li("l_partkey") === F.col("ap_key"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg((F.sum(F.round(F.col("l_extendedprice") * 100, 0)) / 700.0)
          .as("avg_yearly"),
          F.count(F.lit(1)).as("n_lines"))
    }),

    // TPC-H Q2 flavour (no partsupp → lineitem is the part-supplier link;
    // s_acctbal plays supply cost): min-cost EUROPE supplier per
    // ECONOMY/size-15 part. The per-part minimum is a grouped aggregate
    // joined back on (part, acctbal) equality — exact stored doubles, no
    // arithmetic, so the equality is engine-stable.
    "q2_min_cost_supp" -> ((s, dir) => {
      // cand feeds both sides of the min-join: checkpoint so distinct
      // aliasing can never defeat exchange reuse and recompute the subtree.
      // Pushdown on the pre-checkpoint subtree is guarded via q2Candidates
      // (PlanGuardSpec) — the checkpointed plan no longer exposes the scan.
      val cand = q2Candidates(s, dir).localCheckpoint(true)
      val mins = cand.groupBy(F.col("p_partkey").as("mp"))
        .agg(F.min("s_acctbal").as("mb"))
      cand.join(mins,
          F.col("p_partkey") === F.col("mp") && F.col("s_acctbal") === F.col("mb"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc, F.col("n_name"), F.col("s_name"),
          F.col("p_partkey"))
        .limit(20)
    }),

    // TPC-H Q11 flavour (no partsupp → part value from shipped volume):
    // NATION_7 suppliers' per-part value with a global-fraction HAVING —
    // the scalar total is a 1-row aggregate broadcast into the filter.
    // Units are exact integers (cents × integer quantity).
    "q11_important_parts" -> ((s, dir) => {
      val v = table(s, dir, "lineitem")
        .join(table(s, dir, "supplier").filter(F.col("s_nationkey") === 7),
          F.col("l_suppkey") === F.col("s_suppkey"))
        .select(F.col("l_partkey"),
          (F.round(F.col("l_extendedprice") * 100, 0) * F.col("l_quantity"))
            .as("u"))
      val tot = v.agg(F.sum("u").as("t"))
      v.crossJoin(F.broadcast(tot))
        .groupBy(F.col("l_partkey").as("partkey"), F.col("t"))
        .agg((F.sum("u") / 100.0).as("value"), F.sum("u").as("su"))
        .filter(F.col("su") > F.lit(0.001) * F.col("t"))
        .select("partkey", "value")
        .orderBy(F.col("value").desc, F.col("partkey"))
    }),

    // TPC-H Q13: customer order-count distribution — LEFT join keeps
    // zero-order customers, double aggregation (per-customer count, then
    // histogram). Pure counts, no float math.
    "q13_custdist" -> ((s, dir) => {
      val ord = table(s, dir, "orders")
        .filter(F.col("o_orderpriority") =!= "1-URGENT")
      val perCust = table(s, dir, "customer")
        .join(ord, F.col("c_custkey") === F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").as("c_count"))
      perCust.groupBy("c_count")
        .agg(F.count(F.lit(1)).as("custdist"))
        .orderBy(F.col("custdist").desc, F.col("c_count").desc)
    }),

    // TPC-H Q19: disjunctive (brand, size, quantity) predicate triplets —
    // the OR-of-ANDs shape the optimizer must keep join-pushable. Exact
    // integer revenue units.
    "q19_discounted_revenue" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val part = table(s, dir, "part")
      val joined = li.join(part, li("l_partkey") === part("p_partkey"))
      val cond =
        (F.col("p_brand") === "Brand#12" && F.col("p_size").between(1, 5) &&
          F.col("l_quantity").between(1, 11)) ||
        (F.col("p_brand") === "Brand#23" && F.col("p_size").between(1, 10) &&
          F.col("l_quantity").between(10, 20)) ||
        (F.col("p_brand") === "Brand#15" && F.col("p_size").between(1, 15) &&
          F.col("l_quantity").between(20, 30))
      joined.filter(cond)
        .agg((F.sum(discUnits) / 10000.0).as("revenue"),
          F.count(F.lit(1)).as("n_items"))
    }),

    // TPC-H Q20 flavour (no partsupp → shipped volume): suppliers whose
    // 1997 'red'-part quantity exceeds 10% of their total — the ratio
    // compares exact integer quantity sums (10·red > tot), no division.
    "q20_red_suppliers" -> ((s, dir) => {
      val l = table(s, dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")) &&
          F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        .join(table(s, dir, "part"), F.col("l_partkey") === F.col("p_partkey"))
        .select(F.col("l_suppkey"), F.col("l_quantity").cast("long").as("q"),
          F.col("p_name"))
      l.groupBy("l_suppkey")
        .agg(F.sum(F.when(F.col("p_name").contains("red"), F.col("q"))
          .otherwise(0L)).as("red_qty"),
          F.sum("q").as("tot_qty"))
        .filter(F.lit(10) * F.col("red_qty") > F.col("tot_qty"))
        .join(table(s, dir, "supplier"),
          F.col("l_suppkey") === F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "red_qty", "tot_qty")
        .orderBy("s_suppkey")
    }),

    // TPC-H Q21 flavour (no receiptdate → late = shipped >90 days after
    // order): suppliers who were the SOLE late supplier on a multi-
    // supplier finished order — Q21's EXISTS/NOT-EXISTS pair expressed as
    // one per-order aggregate (distinct suppliers, distinct late
    // suppliers, the unique late supplier), which shuffles each order's
    // supplier ids once instead of two correlated probes.
    "q21_waiting_supplier" -> ((s, dir) => {
      val ol = table(s, dir, "lineitem")
        .join(table(s, dir, "orders").filter(F.col("o_orderstatus") === "F"),
          F.col("l_orderkey") === F.col("o_orderkey"))
        .select(F.col("l_orderkey").as("ok"), F.col("l_suppkey").as("sk"),
          F.when(F.col("l_shipdate") >
            F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1)
            .otherwise(0).as("late"))
      val po = ol.groupBy("ok")
        .agg(F.countDistinct("sk").as("n_supp"),
          F.countDistinct(F.when(F.col("late") === 1, F.col("sk"))).as("n_late"),
          F.max(F.when(F.col("late") === 1, F.col("sk"))).as("late_sk"))
        .filter(F.col("n_supp") > 1 && F.col("n_late") === 1)
      po.join(table(s, dir, "supplier"),
          F.col("late_sk") === F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).as("numwait"))
        .orderBy(F.col("numwait").desc, F.col("s_name"))
        .limit(20)
    }),

    // TPC-H Q22 flavour (every customer has orders in this data → screen
    // for LAPSED customers: none since 2000). The global average balance
    // is a rounded 1-row aggregate broadcast into the filter; the order
    // screen is a broadcast-able anti-join on the pre-filtered order ids.
    "q22_idle_customers" -> ((s, dir) => {
      val cust = table(s, dir, "customer")
        .withColumn("bal_c", F.round(F.col("c_acctbal") * 100, 0))
      // threshold in exact cents: the cent sum is order-independent, the
      // division exact, and floor cannot tie — the screen is stable even
      // for a customer sitting exactly on the average.
      val ab = cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.floor(F.sum("bal_c") / F.count(F.lit(1))).as("ab_c"))
      val recent = table(s, dir, "orders")
        .filter(F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01")))
        .select(F.col("o_custkey"))
      cust.crossJoin(F.broadcast(ab))
        .filter(F.col("bal_c") > F.col("ab_c"))
        .join(recent, cust("c_custkey") === recent("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).as("numcust"),
          (F.sum("bal_c") / 100.0).as("totacctbal"))
        .orderBy("c_nationkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "q6_forecast_revenue" ->
      """SELECT sum(round(l_extendedprice * 100, 0) *
                    round(l_discount * 100, 0)) / 10000.0 AS revenue,
                count(*) AS n_items
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders o
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1997-10-01'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q7_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                CAST(year(l_shipdate) AS INT) AS l_year,
                sum(round(l_extendedprice * 100, 0) *
                    round((1 - l_discount) * 100, 0)) / 10000.0 AS revenue
         FROM lineitem
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation sn ON sn.n_nationkey = s_nationkey
         JOIN nation cn ON cn.n_nationkey = c_nationkey
         WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
             OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
           AND l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1999-01-01'
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q8_market_share" ->
      """WITH vol AS (
           SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                  round(l_extendedprice * 100, 0) *
                    round((1 - l_discount) * 100, 0) AS v,
                  sn.n_name AS supp_nation
           FROM lineitem
           JOIN part ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation cn ON cn.n_nationkey = c_nationkey
           JOIN region ON r_regionkey = cn.n_regionkey
           JOIN nation sn ON sn.n_nationkey = s_nationkey
           WHERE r_name = 'ASIA' AND p_type = 'PROMO'
             AND o_orderdate >= TIMESTAMP '1997-01-01'
             AND o_orderdate < TIMESTAMP '1999-01-01')
         SELECT o_year,
                sum(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END)
                  / 10000.0 AS nat_vol,
                sum(v) / 10000.0 AS total_vol
         FROM vol GROUP BY o_year ORDER BY o_year""",
    "q9_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
                sum(round(l_extendedprice * 100, 0) *
                    round((1 - l_discount) * 100, 0)) / 10000.0 AS profit
         FROM lineitem
         JOIN part ON p_partkey = l_partkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN nation ON n_nationkey = s_nationkey
         WHERE p_name LIKE '%widget%'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q12_late_lines" ->
      """SELECT l_returnflag,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_shipdate > o_orderdate + INTERVAL 60 DAY
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q14_promo_revenue" ->
      """WITH s AS (
           SELECT sum(CASE WHEN p_type = 'PROMO'
                    THEN round(l_extendedprice * 100, 0) *
                         round((1 - l_discount) * 100, 0) ELSE 0 END)
                    / 10000.0 AS promo_rev,
                  sum(round(l_extendedprice * 100, 0) *
                      round((1 - l_discount) * 100, 0)) / 10000.0 AS total_rev
           FROM lineitem JOIN part ON p_partkey = l_partkey
           WHERE l_shipdate >= TIMESTAMP '1997-09-01'
             AND l_shipdate < TIMESTAMP '1997-12-01')
         SELECT promo_rev, total_rev,
                CAST(floor(1000000.0 * promo_rev / total_rev) AS BIGINT)
                  AS promo_ppm
         FROM s""",
    "q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey AS suppkey,
                  sum(round(l_extendedprice * 100, 0) *
                      round((1 - l_discount) * 100, 0)) / 10000.0 AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1997-04-01'
           GROUP BY 1)
         SELECT s_suppkey, s_name, total_revenue
         FROM rev JOIN supplier ON s_suppkey = suppkey
         WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         ORDER BY s_suppkey""",
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
                count(DISTINCT ps.l_suppkey) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
         JOIN part ON p_partkey = ps.l_partkey
         WHERE p_brand <> 'Brand#15' AND p_type <> 'PROMO'
           AND p_size IN (1, 14, 23, 45)
         GROUP BY 1, 2, 3
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q17_small_qty" ->
      """SELECT sum(round(l_extendedprice * 100, 0)) / 700.0 AS avg_yearly,
                count(*) AS n_lines
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE p_brand = 'Brand#3' AND p_size <= 10
           AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                             FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""",
    "q2_min_cost_supp" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
                FROM supplier JOIN nation ON n_nationkey = s_nationkey
                JOIN region ON r_regionkey = n_regionkey
                WHERE r_name = 'EUROPE'),
         cand AS (SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
                         n_name
                  FROM part JOIN ps ON l_partkey = p_partkey
                  JOIN eu ON s_suppkey = l_suppkey
                  WHERE p_size = 15 AND p_type = 'ECONOMY'),
         m AS (SELECT p_partkey AS mp, min(s_acctbal) AS mb
               FROM cand GROUP BY 1)
         SELECT s_acctbal, s_name, n_name, p_partkey, p_name
         FROM cand JOIN m ON p_partkey = mp AND s_acctbal = mb
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20""",
    "q11_important_parts" ->
      """WITH v AS (
           SELECT l_partkey, round(l_extendedprice * 100, 0) * l_quantity AS u
           FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
           WHERE s_nationkey = 7),
         tot AS (SELECT sum(u) AS t FROM v)
         SELECT l_partkey AS partkey, sum(u) / 100.0 AS value
         FROM v, tot GROUP BY l_partkey, t
         HAVING sum(u) > 0.001 * t
         ORDER BY value DESC, partkey""",
    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist
         FROM (SELECT c_custkey, count(o_orderkey) AS c_count
               FROM customer LEFT JOIN orders
                 ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
               GROUP BY c_custkey)
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "q19_discounted_revenue" ->
      """SELECT sum(round(l_extendedprice * 100, 0) *
                    round((1 - l_discount) * 100, 0)) / 10000.0 AS revenue,
                count(*) AS n_items
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20 AND 30)""",
    "q20_red_suppliers" ->
      """WITH l AS (
           SELECT l_suppkey, CAST(l_quantity AS BIGINT) AS q, p_name
           FROM lineitem JOIN part ON p_partkey = l_partkey
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1998-01-01'),
         agg AS (
           SELECT l_suppkey,
                  CAST(sum(CASE WHEN p_name LIKE '%red%' THEN q ELSE 0 END)
                    AS BIGINT) AS red_qty,
                  CAST(sum(q) AS BIGINT) AS tot_qty
           FROM l GROUP BY 1)
         SELECT s_suppkey, s_name, red_qty, tot_qty
         FROM agg JOIN supplier ON s_suppkey = l_suppkey
         WHERE 10 * red_qty > tot_qty
         ORDER BY s_suppkey""",
    "q21_waiting_supplier" ->
      """WITH ol AS (
           SELECT l_orderkey AS ok, l_suppkey AS sk,
                  CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                       THEN 1 ELSE 0 END AS late
           FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           WHERE o_orderstatus = 'F'),
         po AS (
           SELECT ok, count(DISTINCT sk) AS n_supp,
                  count(DISTINCT CASE WHEN late = 1 THEN sk END) AS n_late,
                  max(CASE WHEN late = 1 THEN sk END) AS late_sk
           FROM ol GROUP BY ok)
         SELECT s_name, count(*) AS numwait
         FROM po JOIN supplier ON s_suppkey = late_sk
         WHERE n_supp > 1 AND n_late = 1
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""",
    "q22_idle_customers" ->
      """WITH c AS (
           SELECT *, round(c_acctbal * 100, 0) AS bal_c FROM customer),
         avgbal AS (
           SELECT CAST(floor(sum(bal_c) / count(*)) AS BIGINT) AS ab_c
           FROM c WHERE c_acctbal > 0.0)
         SELECT c_nationkey, count(*) AS numcust,
                sum(bal_c) / 100.0 AS totacctbal
         FROM c, avgbal
         WHERE bal_c > ab_c
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '2000-01-01')
         GROUP BY c_nationkey ORDER BY c_nationkey"""
  )
}
