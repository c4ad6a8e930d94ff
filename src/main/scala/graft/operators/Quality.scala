package graft.operators

import org.apache.spark.sql.{functions => F}

/** Data-quality gates: a one-pass constraint-validation suite and
  * MATCH_RECOGNIZE-lite event-sequence pattern matching.
  *
  * Scale posture:
  * - `q_validate` runs every single-table check as FILTER aggregates in
  *   ONE scan per table (map-side combined to a single row, then
  *   `stack`ed into check rows), so validating a 100 TB fact table costs
  *   exactly one pass regardless of how many checks ride it. The two
  *   referential checks are anti-joins on the join key — the same
  *   shuffle any FK audit needs; nothing is collected to the driver.
  * - `q_event_pattern` builds each user's ordered event string with
  *   `sort_array(collect_list(struct(ts, event_id, …)))` — grouped, not
  *   windowed, so there is no whole-table sort; per-group state is
  *   bounded by a user's event count (production would window by time
  *   first). The regex runs per-user on a short string, inside codegen.
  *
  * Determinism (CLAUDE.md rules):
  * - All counts are BIGINT on both sides.
  * - The event sequence is totally ordered by (ts, event_id) — event_id
  *   is unique, so collect+sort is deterministic across partitions.
  * - `length(seq) - length(replace(seq, 'vp', ''))` counts non-
  *   overlapping 'vp' occurrences identically in both engines; the /2 is
  *   integer `div`/`//` on a non-negative even number.
  */
object Quality extends Catalog {

  val queries: Map[String, Q] = Map(

    // Constraint-validation suite: PK uniqueness, FK integrity (both
    // directions), and domain/range checks — each reported as
    // (check_name, violations, total). The data makes one check
    // legitimately non-zero at sf0.01+ (negative supplier balances), so
    // the gate proves the counts, not just zeros.
    "q_validate" -> ((s, dir) => {
      val customer = table(s, dir, "customer")
      val orders = table(s, dir, "orders")
      val lineitem = table(s, dir, "lineitem")
      val documents = table(s, dir, "documents")

      // One scan of lineitem for all three lineitem checks.
      val li = lineitem.agg(
        F.count(F.lit(1)).as("n"),
        F.count_if(F.col("l_quantity") < 1 || F.col("l_quantity") > 50)
          .as("qty"),
        F.count_if(F.col("l_extendedprice") <= 0).as("price"),
        F.count_if(F.col("l_discount") < 0 || F.col("l_discount") > 0.1)
          .as("disc"))
        .selectExpr(
          """stack(3,
             'li_qty_range', qty, n,
             'li_price_nonpositive', price, n,
             'li_discount_range', disc, n)
             AS (check_name, violations, total)""")

      // One scan of supplier: negative balances are real in TPC-H, so
      // this check is legitimately non-zero.
      val suppBal = table(s, dir, "supplier").agg(
        F.count_if(F.col("s_acctbal") < 0).as("violations"),
        F.count(F.lit(1)).as("total"))
        .select(F.lit("supplier_negative_balance").as("check_name"),
          F.col("violations"), F.col("total"))

      // One scan of customer for PK-dup (duplicate key count = rows in
      // keys seen more than once) — a partial-aggregate groupBy.
      val pkDup = customer.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).as("c"))
        .agg(F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))),
          F.lit(0L)).as("violations"),
          F.sum("c").as("total"))
        .select(F.lit("customer_pk_dup").as("check_name"),
          F.col("violations"), F.col("total"))

      // FK: every order must reference an existing customer.
      val fkOrders = orders.join(customer,
        F.col("o_custkey") === F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).as("violations"))
        .crossJoin(F.broadcast(orders.agg(F.count(F.lit(1)).as("total"))))
        .select(F.lit("orders_fk_customer").as("check_name"),
          F.col("violations"), F.col("total"))

      // Reverse coverage: customers with no orders (zero in this
      // synthetic data — the anti-join still audits coverage).
      val noOrders = customer.join(orders,
        F.col("c_custkey") === F.col("o_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).as("violations"))
        .crossJoin(F.broadcast(customer.agg(F.count(F.lit(1)).as("total"))))
        .select(F.lit("customer_without_orders").as("check_name"),
          F.col("violations"), F.col("total"))

      // Documents: empty or null text.
      val docEmpty = documents.agg(
        F.count_if(F.col("text").isNull || F.length(F.col("text")) === 0)
          .as("violations"),
        F.count(F.lit(1)).as("total"))
        .select(F.lit("documents_empty_text").as("check_name"),
          F.col("violations"), F.col("total"))

      li.unionByName(suppBal).unionByName(pkDup).unionByName(fkOrders)
        .unionByName(noOrders).unionByName(docEmpty)
        .orderBy("check_name")
    }),

    // Event-sequence pattern matching (MATCH_RECOGNIZE-lite): per user,
    // the totally-ordered initial-letter string of their events (click→c,
    // error→e, purchase→p, signup→s, view→v), direct view→purchase
    // adjacency count, and whether the regex 's.*p' (signed up, later
    // purchased) matches.
    "q_event_pattern" -> ((s, dir) =>
      table(s, dir, "events")
        .select(F.col("user_id"),
          F.struct(F.col("ts"), F.col("event_id"),
            F.substring(F.col("event_type"), 1, 1).as("ini")).as("ev"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("ev")).as("evs"))
        .withColumn("seq",
          F.expr("concat_ws('', transform(evs, e -> e.ini))"))
        .select(F.col("user_id"), F.col("seq"),
          F.length(F.col("seq")).cast("long").as("seq_len"),
          F.expr("(length(seq) - length(replace(seq, 'vp', ''))) div 2")
            .as("n_vp"),
          F.col("seq").rlike("s.*p").as("matched"))
        .orderBy("user_id")),

    // WINSORIZATION on exact order statistics: per group, clamp values
    // at the p05/p95 ranks before aggregating — the robust-mean move
    // that keeps a fat-tailed metric from being owned by outliers.
    // Rank positions come from row_number over integer cents (the
    // VALUE at rank k is the k-th order statistic regardless of how
    // ties permute), bounds join back as a 3-row broadcast. One sort
    // shuffle per group — the same cost as any exact percentile.
    "q_winsorize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cents = table(s, dir, "lineitem")
        .select(F.col("l_returnflag").as("flag"),
          F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
      val n = cents.groupBy("flag").agg(F.count(F.lit(1)).as("n"))
        .select(F.col("flag"), F.col("n"),
          F.expr("greatest(1L, (5 * n) div 100)").as("k05"),
          F.expr("greatest(1L, (95 * n) div 100)").as("k95"))
      val ranked = cents.withColumn("rn", F.row_number().over(
          Window.partitionBy("flag").orderBy("c")).cast("long"))
        .join(F.broadcast(n), "flag")
      val bounds = ranked
        .filter(F.col("rn") === F.col("k05") ||
          F.col("rn") === F.col("k95"))
        .groupBy("flag")
        .agg(F.min("c").as("lo"), F.max("c").as("hi"))
      cents.join(F.broadcast(bounds), "flag")
        .select(F.col("flag"), F.col("lo"), F.col("hi"),
          F.expr("least(greatest(c, lo), hi)").as("w"))
        .groupBy("flag", "lo", "hi")
        .agg(F.count(F.lit(1)).as("n_rows"),
          F.sum("w").cast("long").as("winsor_cents"))
        .select("flag", "n_rows", "lo", "hi", "winsor_cents")
        .orderBy("flag")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_validate" ->
      """WITH li AS (
           SELECT count(*) AS n,
                  count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS qty,
                  count(*) FILTER (WHERE l_extendedprice <= 0) AS price,
                  count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) AS disc
           FROM lineitem),
         checks AS (
           SELECT 'li_qty_range' AS check_name, qty AS violations,
                  n AS total FROM li
           UNION ALL
           SELECT 'li_price_nonpositive', price, n FROM li
           UNION ALL
           SELECT 'li_discount_range', disc, n FROM li
           UNION ALL
           SELECT 'supplier_negative_balance',
                  count(*) FILTER (WHERE s_acctbal < 0), count(*)
           FROM supplier
           UNION ALL
           SELECT 'customer_pk_dup',
                  CAST(coalesce(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT),
                  CAST(sum(c) AS BIGINT)
           FROM (SELECT c_custkey, count(*) AS c FROM customer GROUP BY 1)
           UNION ALL
           SELECT 'orders_fk_customer',
                  (SELECT count(*) FROM orders o
                   WHERE NOT EXISTS (SELECT 1 FROM customer c
                                     WHERE c.c_custkey = o.o_custkey)),
                  (SELECT count(*) FROM orders)
           UNION ALL
           SELECT 'customer_without_orders',
                  (SELECT count(*) FROM customer c
                   WHERE NOT EXISTS (SELECT 1 FROM orders o
                                     WHERE o.o_custkey = c.c_custkey)),
                  (SELECT count(*) FROM customer)
           UNION ALL
           SELECT 'documents_empty_text',
                  count(*) FILTER (WHERE text IS NULL OR length(text) = 0),
                  count(*)
           FROM documents)
         SELECT check_name, violations, total
         FROM checks ORDER BY check_name""",
    "q_event_pattern" ->
      """WITH seqs AS (
           SELECT user_id,
                  string_agg(substr(event_type, 1, 1), ''
                    ORDER BY ts, event_id) AS seq
           FROM events GROUP BY user_id)
         SELECT user_id, seq,
                CAST(length(seq) AS BIGINT) AS seq_len,
                (length(seq) - length(replace(seq, 'vp', ''))) // 2 AS n_vp,
                regexp_matches(seq, 's.*p') AS matched
         FROM seqs ORDER BY user_id""",
    // identical rank arithmetic: the value at row_number k is the k-th
    // order statistic however ties permute; // ≡ div on positive n
    "q_winsorize" ->
      """WITH cents AS (
           SELECT l_returnflag AS flag,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS c
           FROM lineitem),
         grp AS (
           SELECT flag, count(*) AS n,
                  greatest(1, (5 * count(*)) // 100) AS k05,
                  greatest(1, (95 * count(*)) // 100) AS k95
           FROM cents GROUP BY flag),
         ranked AS (
           SELECT flag, c,
                  row_number() OVER (PARTITION BY flag ORDER BY c) AS rn
           FROM cents),
         bounds AS (
           SELECT r.flag, min(r.c) AS lo, max(r.c) AS hi
           FROM ranked r JOIN grp g ON r.flag = g.flag
           WHERE r.rn = g.k05 OR r.rn = g.k95
           GROUP BY r.flag)
         SELECT c.flag, count(*) AS n_rows, b.lo, b.hi,
                CAST(sum(least(greatest(c.c, b.lo), b.hi)) AS BIGINT)
                  AS winsor_cents
         FROM cents c JOIN bounds b ON c.flag = b.flag
         GROUP BY c.flag, b.lo, b.hi ORDER BY c.flag"""
  )
}
