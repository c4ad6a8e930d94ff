package graft.operators

import org.apache.spark.sql.{functions => F}

import graft.functions.BloomFilters

/** Round-4 relational depth gates: FILTER-clause aggregates, LATERAL
  * subquery joins, exact-moment statistics, count-min-sketch heavy hitters,
  * and explicit bloom-filter semi-join prefiltering.
  *
  * Determinism notes (CLAUDE.md rules apply throughout):
  * - Statistics are computed from EXACT integer moments (BIGINT sums), and
  *   the final corr/stddev formula runs entirely in IEEE doubles with
  *   identical parenthesization in both engines — +,-,*,/ and sqrt are
  *   correctly rounded, so the doubles are bit-identical cross-engine
  *   (only libm transcendentals like ln/exp may differ; none are used).
  * - Sketches are order-independent (CMS counters are additive; bloom bit
  *   sets are unions) and seeded, so they are stable under Spark's
  *   nondeterministic partition/merge order.
  */
object Advanced extends Catalog {

  val queries: Map[String, Q] = Map(

    // FILTER-clause aggregates (SQL:2003 T612): several differently-
    // filtered aggregates in ONE pass over the fact table — the scale-
    // friendly alternative to N self-joined subqueries. Money in exact
    // integer cents.
    "q_filter_agg" -> ((s, dir) => {
      table(s, dir, "lineitem").createOrReplaceTempView("v_li_fa")
      s.sql(
        """SELECT l_returnflag,
          |       count(*) AS n_all,
          |       count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
          |       sum(CAST(round(l_extendedprice * 100) AS BIGINT))
          |         FILTER (WHERE l_quantity >= 25) AS cents_heavy
          |FROM v_li_fa GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    // LATERAL correlated subquery: per-nation top-2 customers by balance.
    // Catalyst plans the correlated limit as a decorrelated join + per-key
    // limit — the declarative form of the "top-k per key" pattern
    // (cf. the native operator gate q_topk_native).
    "q_lateral" -> ((s, dir) => {
      table(s, dir, "nation").createOrReplaceTempView("v_nat_lat")
      table(s, dir, "customer").createOrReplaceTempView("v_cust_lat")
      s.sql(
        """SELECT n.n_name, t.c_name, t.c_acctbal
          |FROM v_nat_lat n,
          |LATERAL (SELECT c_name, c_acctbal FROM v_cust_lat c
          |         WHERE c.c_nationkey = n.n_nationkey
          |         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
          |ORDER BY n_name, c_name""".stripMargin)
    }),

    // Statistical aggregates via EXACT integer moments: corr/stddev from
    // BIGINT sums (n, Σx, Σy, Σx², Σy², Σxy), final formula in doubles.
    // Spark's native corr()/stddev() accumulate doubles in partition-merge
    // order (nondeterministic run-to-run); integer moments shuffle-order-
    // proof the result AND halve the passes (one scan, six sums).
    // Headroom: Σy² ≈ 2e15 at sf0.1 (y = whole dollars ~1e5) — BIGINT
    // overflows near sf3000; at that scale switch the sums to DECIMAL(38).
    "q_stats_moments" -> ((s, dir) => {
      table(s, dir, "lineitem").createOrReplaceTempView("v_li_mom")
      s.sql(statsMomentsSql("v_li_mom"))
    }),

    // Bitmap-index set algebra (the roaring-style audience-overlap
    // pattern): per event_type, engaged users (≥14 events) become a
    // bitmap of 62-bit words (word = user div 62; the word value is the
    // OR of 1<<bit — a plain sum, since engaged (type, user) pairs are
    // distinct); pairwise audience overlap is then pure word algebra —
    // AND + popcount — never a row-level set intersection. Scale shape:
    // a bitmap is |users|/62 words per type (~16M words for 1B users),
    // the pair join runs word-to-word, and the raw event table is
    // touched exactly once. 62-bit words keep 1<<bit inside signed
    // range in both engines.
    "q_bitmap_users" -> ((s, dir) => {
      // the bitmap is the tiny derived artifact every later step reads
      // — localCheckpoint materializes it ONCE, so the raw event scan
      // runs exactly once (a CTE spelling re-scans the fact table per
      // consumer: Spark inlines WITH)
      val bm = table(s, dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).as("n"))
        .filter(F.col("n") >= 14)
        .select(F.col("event_type"),
          F.expr("user_id div 62").as("word"),
          F.expr("shiftleft(cast(1 as bigint), cast(user_id % 62 as int))")
            .as("b"))
        .groupBy("event_type", "word")
        .agg(F.sum("b").cast("long").as("val"))
        .localCheckpoint()
      val card = bm.groupBy("event_type")
        .agg(F.sum(F.expr("bit_count(val)")).cast("long").as("n_users"))
      val inter = bm.as("a")
        .join(bm.as("b"),
          F.col("a.word") === F.col("b.word") &&
            F.col("a.event_type") < F.col("b.event_type"))
        .select(F.col("a.event_type").as("t1"),
          F.col("b.event_type").as("t2"),
          F.col("a.val").bitwiseAND(F.col("b.val")).as("and_val"))
        .groupBy("t1", "t2")
        .agg(F.sum(F.expr("bit_count(and_val)")).cast("long").as("n_both"))
      card.as("ca")
        .join(card.as("cb"),
          F.col("ca.event_type") < F.col("cb.event_type"))
        .select(F.col("ca.event_type").as("t1"),
          F.col("cb.event_type").as("t2"),
          F.col("ca.n_users").as("na"), F.col("cb.n_users").as("nb"))
        .join(inter, Seq("t1", "t2"), "left")
        .withColumn("n_both", F.coalesce(F.col("n_both"), F.lit(0L)))
        .withColumn("n_either",
          F.col("na") + F.col("nb") - F.col("n_both"))
        .select(F.col("t1"), F.col("t2"), F.col("n_both"),
          F.col("n_either"),
          F.expr("(1000 * n_both) div n_either").as("jacc_milli"))
        .orderBy("t1", "t2")
    }),

    // Spatial radius self-join via GRID BUCKETING: points (md5-derived
    // integer coords on a 1000×1000 plane) pair up iff dist² ≤ 100.
    // Each point replicates into its 3×3 neighborhood of 10×10 cells
    // and joins the other side's HOME cell — an equi-join on cell keys
    // whose candidate set is the density-bounded neighborhood, never
    // the N² plane; each true pair surfaces exactly once (the partner
    // home cell is unique). The oracle deliberately evaluates the
    // NAIVE all-pairs filter — a genuinely different plan reaching the
    // same rows, so a grid that misses a boundary-straddling pair (the
    // classic off-by-one-cell bug) breaks the hash. Scale shape: one
    // 9× replication + one shuffle on cell keys; AQE handles dense-
    // cell skew the same way it handles any hot join key.
    "q_spatial_grid" -> ((s, dir) => {
      val pts = table(s, dir, "customer")
        .select(F.col("c_custkey").as("id"),
          F.col("c_mktsegment").as("seg"),
          F.expr("CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 1, 6), 16, 10) AS BIGINT) % 1000").as("x"),
          F.expr("CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 7, 6), 16, 10) AS BIGINT) % 1000").as("y"))
      val probe = pts
        .withColumn("dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .select(F.col("id").as("a_id"), F.col("seg"),
          F.col("x").as("ax"), F.col("y").as("ay"),
          (F.expr("x div 10") + F.col("dx")).as("cx"),
          (F.expr("y div 10") + F.col("dy")).as("cy"))
      val home = pts.select(F.col("id").as("b_id"),
        F.col("x").as("bx"), F.col("y").as("by"),
        F.expr("x div 10").as("cx"), F.expr("y div 10").as("cy"))
      probe.join(home, Seq("cx", "cy"))
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("d2",
          (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) +
            (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")))
        .filter(F.col("d2") <= 100)
        .groupBy("seg")
        .agg(F.count(F.lit(1)).as("n_pairs"),
          F.sum("d2").cast("long").as("sum_d2"))
        .orderBy("seg")
    }),

    // Grid-based DBSCAN (deterministic min-label variant): core points
    // have >= 4 points (self included) within eps=8; clusters are the
    // connected components of the core-core eps-graph, labeled by
    // their minimum core id; border points (non-core within eps of a
    // core) attach to the SMALLEST adjacent core label — textbook
    // DBSCAN leaves border assignment scan-order-dependent, and the
    // min rule is the standard determinization. Scale shape: the
    // eps-neighborhood comes from the same 3×3 grid-cell join as
    // q_spatial_grid (cell = eps, candidates bounded by local
    // density), min-label propagation localCheckpoints per hop with a
    // loud convergence guard, and component diameters are bounded at
    // subcritical density (the point count is capped below continuum
    // percolation, where one giant component would make single-label
    // clustering meaningless anyway). Oracle: NAIVE all-pairs
    // neighborhoods + recursive-reachability labels — two different
    // plans, same clusters.
    "q_spatial_dbscan" -> ((s, dir) => {
      val pts = table(s, dir, "customer")
        .filter(F.col("c_custkey") <= 3000)
        .select(F.col("c_custkey").as("id"),
          F.expr("CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 1, 6), 16, 10) AS BIGINT) % 1000").as("x"),
          F.expr("CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 7, 6), 16, 10) AS BIGINT) % 1000").as("y"))
        .localCheckpoint()
      val probe = pts
        .withColumn("dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .select(F.col("id").as("a_id"),
          F.col("x").as("ax"), F.col("y").as("ay"),
          (F.expr("x div 8") + F.col("dx")).as("cx"),
          (F.expr("y div 8") + F.col("dy")).as("cy"))
      val home = pts.select(F.col("id").as("b_id"),
        F.col("x").as("bx"), F.col("y").as("by"),
        F.expr("x div 8").as("cx"), F.expr("y div 8").as("cy"))
      val nbr = probe.join(home, Seq("cx", "cy"))
        .filter(F.col("a_id") =!= F.col("b_id"))
        .filter(
          ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) +
            (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")))
            <= 64)
        .select("a_id", "b_id").localCheckpoint()
      val core = nbr.groupBy("a_id")
        .agg((F.count(F.lit(1)) + 1).as("deg"))
        .filter(F.col("deg") >= 4)
        .select(F.col("a_id").as("id")).localCheckpoint()
      val ce = nbr
        .join(core.select(F.col("id").as("a_id")), "a_id")
        .join(core.select(F.col("id").as("b_id")), "b_id")
        .select(F.col("a_id").as("u"), F.col("b_id").as("v"))
        .localCheckpoint()
      var lab = core.select(F.col("id").as("v"))
        .withColumn("lab", F.col("v")).localCheckpoint()
      var fp = (-1L, -1L)
      var round = 0
      var done = false
      while (!done && round < 30) {
        round += 1
        val prop = ce
          .join(lab.select(F.col("v").as("u"), F.col("lab")), "u")
          .select(F.col("v"), F.col("lab"))
        lab = lab.unionByName(prop)
          .groupBy("v").agg(F.min("lab").as("lab"))
          .localCheckpoint()
        val r = lab.agg(F.count(F.lit(1)),
          F.coalesce(F.sum("lab"), F.lit(0L))).head()
        val now = (r.getLong(0), r.getLong(1))
        if (now == fp) done = true else fp = now
      }
      require(done, s"q_spatial_dbscan: label propagation did not " +
        s"converge in $round rounds")
      val border = nbr
        .join(core.select(F.col("id").as("b_id")), "b_id")
        .join(core.select(F.col("id").as("a_id")), Seq("a_id"),
          "left_anti")
        .join(lab.select(F.col("v").as("b_id"), F.col("lab")), "b_id")
        .groupBy("a_id").agg(F.min("lab").as("lab"))
      lab.select(F.col("lab"), F.lit(1L).as("c"), F.lit(0L).as("b"))
        .unionByName(border.select(F.col("lab"), F.lit(0L).as("c"),
          F.lit(1L).as("b")))
        .groupBy("lab")
        .agg(F.sum("c").cast("long").as("n_core"),
          F.sum("b").cast("long").as("n_border"))
        .select(F.col("lab").as("cluster_id"), F.col("n_core"),
          F.col("n_border"))
        .orderBy("cluster_id")
    }),

    // Count-min-sketch heavy hitters over document tokens, with the sketch
    // accuracy contract checked in-engine (cf. Sketches.scala): the CMS
    // estimate must over-approximate (no under-counting, structurally) and
    // stay within eps·N of the exact count. The sketch is built in ONE
    // distributed pass (mergeable counters, fixed seed); only the k exact
    // top rows and the kilobyte sketch reach the driver.
    "q_approx_topk" -> ((s, dir) => {
      val toks = table(s, dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).as("token"))
        .filter(F.length(F.col("token")) > 0)
      val eps = 0.001
      val cms = toks.stat.countMinSketch("token", eps, 0.99, 42)
      val bound = math.ceil(eps * cms.totalCount()).toLong
      val top = toks.groupBy("token").agg(F.count(F.lit(1)).as("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc, F.col("token"))
        .limit(10).collect()
      val rows = top.toSeq.map { r =>
        val tok = r.getString(0)
        val exact = r.getLong(1)
        val est = cms.estimateCount(tok)
        (tok, exact, est >= exact && est <= exact + bound)
      }
      val out = s.createDataFrame(rows).toDF("token", "exact_cnt", "cms_ok")
      out.orderBy(F.col("exact_cnt").desc, F.col("token"))
    }),

    // NULL-aware anti join: NOT IN over a nullable probe column. Three-
    // valued logic makes `NULL NOT IN (...)` UNKNOWN, so rows with a null
    // key drop — the semantic corner that separates NOT IN from a plain
    // anti join. Spark plans the single-column form as a broadcast hash
    // join with isNullAwareAntiJoin, scan-side prunable at scale.
    "q_not_in" -> ((s, dir) => {
      table(s, dir, "orders").createOrReplaceTempView("v_ord_ni")
      table(s, dir, "customer").createOrReplaceTempView("v_cust_ni")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n
          |FROM v_ord_ni
          |WHERE nullif(o_custkey, 7) NOT IN
          |  (SELECT c_custkey FROM v_cust_ni WHERE c_mktsegment = 'BUILDING')
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    // Fuzzy string join (entity resolution): distinct-name pairs within
    // edit distance 2, banded by length/4 so candidates come from equal or
    // adjacent bands only — |Δlen| ≤ 2 bounds the band gap to 1, making the
    // banding SOUND (no pair lost) while avoiding the all-pairs cross join
    // that a naive levenshtein theta-join would shuffle at scale. The
    // 3-way band explode is the standard blocking trick: each probe row
    // lands in its own and both neighbor bands; the build side keeps one.
    "q_fuzzy_join" -> ((s, dir) => {
      val names = table(s, dir, "part").select(F.col("p_name").as("nm"))
        .distinct()
        .withColumn("ln", F.length(F.col("nm")))
      val band = F.floor(F.col("ln") / 4).cast("int")
      val build = names.withColumn("band", band)
      val probe = names.withColumn("band",
        F.explode(F.array(band - 1, band, band + 1)))
      probe.alias("a").join(build.alias("b"),
          F.col("a.band") === F.col("b.band")
            && F.col("a.nm") < F.col("b.nm")
            && F.abs(F.col("a.ln") - F.col("b.ln")) <= 2)
        .select(F.col("a.nm").as("name_a"), F.col("b.nm").as("name_b"),
          F.levenshtein(F.col("a.nm"), F.col("b.nm")).as("dist"))
        .filter(F.col("dist").between(1, 2))
        .orderBy("name_a", "name_b")
    }),

    // Equi-width histogram over exact integer cents: bucket = cents DIV
    // 500000 ($5000 buckets). Integer division sidesteps every double
    // floor-boundary hazard, and the aggregate is a single partial-agg
    // pass — the plan shape that holds at any scale (bucket count is
    // bounded by the value domain, not the row count).
    "q_histogram" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .withColumn("cents", F.expr("cast(round(l_extendedprice * 100) as bigint)"))
        .withColumn("bucket", F.expr("cents DIV 500000").cast("int"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).as("n"),
          F.sum("cents").as("sum_cents"))
        .orderBy("bucket")),

    // Linear regression per group from EXACT integer sufficient statistics
    // (n, Σx, Σy, Σxy, Σx², Σy² as BIGINT sums — x = quantity, y = WHOLE
    // price dollars so Σy² stays far from BIGINT overflow even at sf100:
    // (1e5)²·6e8 rows ≈ 6e18 < 2⁶³), then slope/r² in IEEE doubles with identical
    // parenthesization in both engines. This is how regr_slope/regr_r2
    // must be computed at scale anyway (one partial-agg pass, no second
    // scan); doing it from integer moments also makes the result exactly
    // reproducible cross-engine, which the built-in double-accumulating
    // regr_* aggregates are not (merge order varies run to run).
    "q_regr" -> ((s, dir) => {
      table(s, dir, "lineitem").createOrReplaceTempView("v_li_regr")
      s.sql(
        """WITH m AS (
          |  SELECT l_returnflag,
          |         count(*) AS n,
          |         sum(CAST(l_quantity AS BIGINT)) AS sx,
          |         sum(CAST(round(l_extendedprice) AS BIGINT)) AS sy,
          |         sum(CAST(l_quantity AS BIGINT)
          |             * CAST(round(l_extendedprice) AS BIGINT)) AS sxy,
          |         sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
          |         sum(CAST(round(l_extendedprice) AS BIGINT)
          |             * CAST(round(l_extendedprice) AS BIGINT)) AS syy
          |  FROM v_li_regr GROUP BY l_returnflag)
          |SELECT l_returnflag, n, sx, sy,
          |       CAST(floor(1000000.0 *
          |         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
          |         AS BIGINT) AS slope_u,
          |       CAST(floor(1000000.0 *
          |         ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |          * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
          |         / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
          |         AS BIGINT) AS r2_u
          |FROM m ORDER BY l_returnflag""".stripMargin)
    }),

    // Explicit bloom-filter semi-join prefilter (graft.functions
    // .BloomFilters): bloom the filtered customer dim's keys (kilobytes),
    // probe it INSIDE the orders scan stage (no false negatives → nothing
    // true is lost), then confirm the ≤fpp false positives with the exact
    // semi join. At 100 TB the bloom prunes the fact shuffle by the dim
    // selectivity; the same shape prefilters dedup-candidate joins.
    "q_bloom_prefilter" -> ((s, dir) => {
      val cust = table(s, dir, "customer")
        .filter(F.col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val bloom = cust
        .agg(BloomFilters.bloomAgg(s, F.col("c_custkey"), 100000L, 1L << 20))
        .head().getAs[Array[Byte]](0)
      table(s, dir, "orders")
        .filter(BloomFilters.mightContain(s, bloom, F.col("o_custkey")))
        .join(cust, F.col("o_custkey") === F.col("c_custkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).as("n_orders"),
          F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).as("cents_total"))
        .orderBy("o_orderpriority")
    }),

    // WEIGHTED shortest paths (multi-source SSSP): distributed
    // Bellman-Ford — relax every edge against the current distance
    // table each round, keep per-vertex minima, iterate to FIXPOINT
    // detected by the (count, sum) fingerprint (distances only ever
    // decrease and the reached set only grows, so the pair is a
    // monotone convergence witness costing one tiny aggregate per
    // round). The oracle is a WEIGHTED recursive CTE: paths extend
    // while total weight < 60, recursive-union dedup on (v, d) bounds
    // the search, min(d) per vertex = the shortest distance (positive
    // weights make prefix totals monotone, so the cap never cuts a
    // shorter path's prefix). Same Pregel scale shape as q_graph_bfs:
    // one shuffle join per round, localCheckpoint per step.
    "q_graph_sssp" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
      val mod = docs.agg(F.max("doc_id")).head().getLong(0) + 1
      def target(off: Int) =
        F.conv(F.substring(F.md5(F.col("text")), off, 12), 16, 10)
          .cast("long") % mod
      def weight(off: Int) =
        F.conv(F.substring(F.md5(F.col("text")), off, 4), 16, 10)
          .cast("long") % 9 + 1
      val edges = docs.select(F.col("doc_id").as("u"),
          F.explode(F.array(
            F.struct(target(1).as("v"), weight(25).as("w")),
            F.struct(target(13).as("v"), weight(29).as("w")))).as("e"))
        .select(F.col("u"), F.col("e.v").as("v"), F.col("e.w").as("w"))
        .localCheckpoint()
      var dist = docs.select(F.col("doc_id").as("v"))
        .filter(F.col("v") % 29 === 0)
        .withColumn("d", F.lit(0L)).localCheckpoint()
      var fp = (-1L, -1L)
      var round = 0
      var done = false
      while (!done && round < 40) {
        round += 1
        // (r20 opt note: fusing TWO relaxations per barrier was tried —
        // monotonicity keeps the fixpoint identical — but measured SLOWER
        // at sf0.1: the fused job pays two extra exchanges per round and
        // exchange reuse does not offset them. One relax per barrier is
        // the measured optimum; see OPTIMIZATION_r20.md.)
        val relaxed = edges
          .join(dist.select(F.col("v").as("u"), F.col("d")), "u")
          .select(F.col("v"), (F.col("d") + F.col("w")).as("d"))
        dist = dist.unionByName(relaxed)
          .groupBy("v").agg(F.min("d").as("d"))
          .localCheckpoint()
        val r = dist.agg(F.count(F.lit(1)), F.sum("d")).head()
        val now = (r.getLong(0), r.getLong(1))
        if (now == fp) done = true else fp = now
      }
      dist.filter(F.col("d") < 60)
        .select(F.col("v").as("doc_id"), F.col("d").as("dist"))
        .orderBy("doc_id")
    }),

    // Recursive query / graph traversal: multi-source BFS hop distance
    // over an md5-derived 2-out edge graph, iterated TO FIXPOINT
    // (frontier-empty), not a fixed unroll — the oracle is a true
    // `WITH RECURSIVE` (DuckDB's recursive-union min-distance), so this
    // gate proves the iterative DataFrame loop ≡ recursive SQL. Scale
    // shape: each hop is one shuffle join on the frontier (the Pregel
    // step) + an anti-join against the known set; localCheckpoint per
    // hop keeps lineage one step deep, and the loop stops the moment
    // the frontier dies (~log N hops on this graph), with a 30-hop
    // safety cap mirrored in the oracle's WHERE d < 30.
    "q_graph_bfs" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
      val mod = docs.agg(F.max("doc_id")).head().getLong(0) + 1
      def target(off: Int) =
        F.conv(F.substring(F.md5(F.col("text")), off, 12), 16, 10)
          .cast("long") % mod
      val edges = docs.select(F.col("doc_id").as("u"),
          F.explode(F.array(target(1), target(13))).as("v"))
        .localCheckpoint()
      var known = docs.select(F.col("doc_id").as("v"))
        .filter(F.col("v") % 23 === 0)
        .withColumn("dist", F.lit(0L)).localCheckpoint()
      var frontier = known.select("v")
      var hop = 0L
      var done = false
      while (!done && hop < 30) {
        hop += 1
        val next = edges
          .join(frontier.select(F.col("v").as("u")), "u")
          .select("v").distinct()
          .join(known, Seq("v"), "left_anti")
          .withColumn("dist", F.lit(hop))
          .localCheckpoint()
        if (next.isEmpty) done = true
        else {
          // `next` is already materialized; re-checkpointing the whole
          // GROWING known set each hop re-wrote O(hops × |known|) rows
          // (r20 opt) — the union of per-hop checkpointed frames reads
          // the same bytes without the per-hop rewrite job.
          known = known.unionByName(next)
          frontier = next.select("v")
        }
      }
      known.select(F.col("v").as("doc_id"), F.col("dist"))
        .orderBy("doc_id")
    }),

    // CONNECTED COMPONENTS by min-label propagation to fixpoint — the
    // Pregel/GraphFrames CC shape: symmetrize the md5 edge set once,
    // then each round is ONE shuffle join (labels to neighbors) + a
    // min-aggregate, localCheckpoint'd so lineage stays a step deep;
    // rounds ≈ component diameter (~log N on this random 2-out graph).
    // Labels flow THROUGH phantom endpoints (md5 targets that are not
    // document ids) exactly as the oracle's recursive reachability
    // does; the output restricts to real documents. Converge-or-fail
    // guard: a non-converged answer must never publish.
    "q_graph_cc" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
      // BLOCK-LOCAL random graph (one md5 out-edge per node, confined
      // to the node's 16-id block): a global 2-out graph collapses into
      // one giant component — a 1-row gate pins nothing. Block edges
      // keep >= N/16 components, each block fragmenting further under
      // its own functional-graph structure, at every SF.
      def target(off: Int) = F.expr(
        s"(doc_id div 16) * 16 + CAST(conv(substring(md5(text), $off, 12)" +
          ", 16, 10) AS BIGINT) % 16")
      val raw = docs.select(F.col("doc_id").as("u"), target(1).as("v"))
        .filter(F.col("u") =!= F.col("v"))
      val edges = raw.select("u", "v")
        .unionByName(raw.select(F.col("v").as("u"), F.col("u").as("v")))
        .distinct().localCheckpoint()
      var lab = docs.select(F.col("doc_id").as("v"))
        .unionByName(edges.select("v"))
        .unionByName(edges.select(F.col("u").as("v")))
        .distinct()
        .withColumn("lab", F.col("v")).localCheckpoint()
      var fp = (-1L, -1L)
      var round = 0
      var done = false
      while (!done && round < 60) {
        round += 1
        val prop = edges
          .join(lab.select(F.col("v").as("u"), F.col("lab")), "u")
          .select(F.col("v"), F.col("lab"))
        lab = lab.unionByName(prop)
          .groupBy("v").agg(F.min("lab").as("lab"))
          .localCheckpoint()
        val r = lab.agg(F.count(F.lit(1)), F.sum("lab")).head()
        val now = (r.getLong(0), r.getLong(1))
        if (now == fp) done = true else fp = now
      }
      require(done, s"q_graph_cc: min-label propagation did not " +
        s"converge in $round rounds")
      lab.join(docs.select(F.col("doc_id").as("v")), "v")
        .groupBy(F.col("lab").as("comp"))
        .agg(F.count(F.lit(1)).as("size"))
        .orderBy("comp")
    }),

    // PAGERANK, exact-integer: the iterative-scoring member of the
    // graph family (BFS = reachability, SSSP = distance, CC = identity,
    // triangles = local density, PageRank = global importance). The
    // directed graph is two block-local md5 out-edges per document,
    // restricted to real target ids; K=3 synchronous iterations of
    // pr' = (15·S + 85·Σ pr(u) div deg(u)) div 100 at scale S=10^6 —
    // every step integer (positive ⇒ Spark div ≡ DuckDB //), so the
    // oracle's three unrolled CTE steps are bit-exact. No dangling
    // redistribution in EITHER engine (identical simplification).
    // Scale shape: each iteration is ONE shuffle join (scores to
    // out-edges) + one aggregate, localCheckpoint'd; the edge set with
    // degrees is built once and pinned.
    "q_graph_pagerank" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(F.col("doc_id"), F.col("text"))
        .repartition(s.sparkContext.defaultParallelism)
      def target(off: Int) = F.expr(
        s"(doc_id div 16) * 16 + CAST(conv(substring(md5(text), $off, " +
          "12), 16, 10) AS BIGINT) % 16")
      val ids = docs.select(F.col("doc_id")).localCheckpoint()
      val raw = docs.select(F.col("doc_id").as("u"), target(1).as("v"))
        .unionByName(
          docs.select(F.col("doc_id").as("u"), target(13).as("v")))
        .filter(F.col("u") =!= F.col("v")).distinct()
      val edges = raw
        .join(ids.select(F.col("doc_id").as("v")), "v").select("u", "v")
      val deg = edges.groupBy("u").agg(F.count(F.lit(1)).as("deg"))
      val withDeg = edges.join(deg, "u").localCheckpoint()
      var pr = ids.select(F.col("doc_id").as("v"),
        F.lit(1000000L).as("pr"))
      // fixed-K linear chain: each iteration's pr feeds exactly ONE
      // consumer (the next contrib join), so the per-iteration
      // localCheckpoint jobs were pure overhead — the 3 unrolled steps
      // execute as one pipeline off the pinned edge table (r20 opt)
      for (_ <- 1 to 3) {
        val contrib = withDeg
          .join(pr.select(F.col("v").as("u"), F.col("pr")), "u")
          .select(F.col("v"), F.expr("pr div deg").as("c"))
        pr = ids.select(F.col("doc_id").as("v"))
          .join(contrib.groupBy("v").agg(F.sum("c").as("sc")),
            Seq("v"), "left")
          .select(F.col("v"),
            F.expr("(15 * 1000000 + 85 * coalesce(sc, 0L)) div 100")
              .as("pr"))
      }
      pr.select(F.col("v").as("doc_id"), F.col("pr")).orderBy("doc_id")
    }),

    // Triangle counting via DEGREE ORIENTATION — the algorithm that
    // scales to trillion-edge graphs: orient every undirected edge from
    // its (degree, id)-smaller endpoint to the larger, so out-degrees
    // are bounded by O(sqrt m) on bounded-arboricity graphs and wedge
    // generation (the quadratic step of naive counting) never explodes
    // on hub vertices. Each triangle is then counted EXACTLY once at
    // its (degree, id)-minimal apex: two shuffle joins — wedges on the
    // apex key, closure against the canonical undirected edge set on
    // the (lo, hi) pair — no broadcast, no N². Per-vertex counts come
    // from one final explode + groupBy. The oracle replays the same
    // orientation in plain SQL joins.
    "q_graph_triangles" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
      val mod = docs.agg(F.max("doc_id")).head().getLong(0) + 1
      def target(off: Int) =
        F.conv(F.substring(F.md5(F.col("text")), off, 12), 16, 10)
          .cast("long") % mod
      // 4-out md5 graph (denser than the BFS graph so triangles exist),
      // canonicalized to the undirected simple edge set a < b.
      val raw = docs.select(F.col("doc_id").as("u"),
          F.explode(F.array(target(1), target(9), target(17), target(25)))
            .as("v"))
      triangleCounts(raw)
        .select(F.col("x").as("doc_id"), F.col("n_tri"))
        .orderBy("doc_id")
    }),

    // Recursive CTE through spark.sql — see mgmtChainSql. The temp view
    // is the raw parquet table; everything else is the shared SQL text.
    "q_recursive_sql" -> ((s, dir) => {
      table(s, dir, "supplier").createOrReplaceTempView("supplier")
      s.sql(mgmtChainSql("div"))
    }),

    // SKYLINE (Pareto frontier, minimize both dims) — the multi-objective
    // "best tradeoffs" operator. Naive dominance is an N² self-join; the
    // scale shape exploits distributivity (skyline(A∪B) =
    // skyline(skyline(A) ∪ skyline(B))): phase 1 computes per-bucket
    // skylines with a PARTITIONED sorted sweep (one shuffle, no global
    // funnel), phase 2 re-sweeps only the tiny survivor set globally.
    // Each sweep is two window mins — strictly-smaller-size running min
    // + same-size group min — so dominance is decided without any join.
    // Money in exact integer cents; the oracle is the N² NOT EXISTS.
    "q_skyline" -> ((s, dir) => {
      val pts = table(s, dir, "part").select(
        F.col("p_partkey"),
        F.col("p_size"),
        F.round(F.col("p_retailprice") * 100).cast("long").as("cents"))
      skyline2D(skyline2D(pts, Some(F.pmod(F.col("p_partkey"), F.lit(32)))),
          None)
        .orderBy("p_partkey")
    })
  )

  /** True recursive CTE ON THE ENGINE'S OWN SQL SURFACE (Spark 4
    * recursion): the SAME query text — modulo the one integer-division
    * dialect token (Spark `div`, DuckDB `//`, equal on the positive keys
    * here) — runs through `spark.sql` AND the oracle. Management-chain
    * walk over the binary tree `parent(k) = k div 2` rooted at supplier 1:
    * depth + running minimum balance along the ancestor chain. Spark
    * executes each recursion level as one shuffle join off the previous
    * frontier (the Pregel shape the hand-built BFS/SSSP loops use), so
    * the declarative form scales the same way.
    */
  private def mgmtChainSql(div: String): String =
    s"""WITH RECURSIVE s AS (
       |  SELECT s_suppkey, CAST(round(s_acctbal * 100) AS BIGINT) AS bal
       |  FROM supplier),
       |chain AS (
       |  SELECT s_suppkey, 0 AS depth, bal AS min_bal
       |  FROM s WHERE s_suppkey = 1
       |  UNION ALL
       |  SELECT c.s_suppkey, p.depth + 1, LEAST(p.min_bal, c.bal)
       |  FROM chain p JOIN s c ON c.s_suppkey $div 2 = p.s_suppkey
       |  WHERE c.s_suppkey <> 1)
       |SELECT s_suppkey, depth, min_bal FROM chain
       |ORDER BY s_suppkey""".stripMargin

  /** One skyline sweep (minimize p_size then cents): survivors are rows not
    * dominated within their bucket (or globally when `bucket` is None).
    * A row is dominated iff some row has strictly smaller size and ≤ cost
    * (the running min over size < s), or equal size and strictly smaller
    * cost (the size-group min). Ties on both dims survive together —
    * neither dominates.
    */
  def skyline2D(pts: org.apache.spark.sql.DataFrame,
      bucket: Option[org.apache.spark.sql.Column])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withB = pts.withColumn("_b", bucket.getOrElse(F.lit(0)))
    val wPrev = (if (bucket.isDefined) Window.partitionBy("_b")
                 else Window.partitionBy())
      .orderBy("p_size").rangeBetween(Window.unboundedPreceding, -1)
    val wSame = if (bucket.isDefined) Window.partitionBy("_b", "p_size")
                else Window.partitionBy("p_size")
    withB
      .withColumn("_m1", F.min("cents").over(wPrev))
      .withColumn("_m2", F.min("cents").over(wSame))
      .filter((F.col("_m1").isNull || F.col("_m1") > F.col("cents")) &&
        F.col("_m2") === F.col("cents"))
      .drop("_b", "_m1", "_m2")
  }

  /** Per-vertex triangle counts of the undirected simple graph induced by a
    * directed multigraph edge list (u, v) — self-loops and duplicate edges
    * are canonicalized away. Degree-oriented: out-degrees bounded by
    * O(sqrt m), each triangle generated exactly once at its (deg, id)-lex
    * minimal apex. Returns (x, n_tri) for every vertex on ≥1 triangle.
    */
  def triangleCounts(rawEdges: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val und = rawEdges
      .filter(F.col("u") =!= F.col("v"))
      .select(F.least(F.col("u"), F.col("v")).as("a"),
        F.greatest(F.col("u"), F.col("v")).as("b"))
      .distinct()
      .localCheckpoint() // reused by degree, orientation, and closure
    val deg = und.select(F.col("a").as("x"))
      .unionAll(und.select(F.col("b").as("x")))
      .groupBy("x").agg(F.count(F.lit(1)).as("d"))
    // Orient a→b when (deg_a, a) <lex (deg_b, b); ties on degree break
    // by id, so the orientation is a DAG under a total order.
    val oriented = und
      .join(deg.select(F.col("x").as("a"), F.col("d").as("da")), "a")
      .join(deg.select(F.col("x").as("b"), F.col("d").as("db")), "b")
      .select(
        F.when(F.col("da") < F.col("db") ||
            (F.col("da") === F.col("db") && F.col("a") < F.col("b")),
            F.struct(F.col("a").as("u"), F.col("b").as("v")))
          .otherwise(F.struct(F.col("b").as("u"), F.col("a").as("v")))
          .as("e"))
      .select(F.col("e.u").as("u"), F.col("e.v").as("v"))
    // Wedges at the apex u (both out-neighbors, id-ordered once so each
    // unordered pair appears exactly once), closed against `und`.
    val o1 = oriented.select(F.col("u"), F.col("v").as("x"))
    val o2 = oriented.select(F.col("u"), F.col("v").as("y"))
    val tri = o1.join(o2, "u").filter(F.col("x") < F.col("y"))
      .join(und, F.col("x") === F.col("a") && F.col("y") === F.col("b"))
      .select(F.col("u"), F.col("x"), F.col("y"))
    tri.select(F.explode(F.array(F.col("u"), F.col("x"), F.col("y")))
        .as("x"))
      .groupBy("x").agg(F.count(F.lit(1)).as("n_tri"))
  }

  /** Shared Spark/DuckDB moment-statistics SQL — identical text modulo the
    * table name so the double arithmetic parenthesization matches exactly.
    */
  private def statsMomentsSql(t: String): String =
    s"""WITH m AS (
       |  SELECT l_returnflag,
       |         count(*) AS n,
       |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
       |         CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
       |         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
       |         CAST(sum(CAST(floor(l_extendedprice) AS BIGINT) * CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy,
       |         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy
       |  FROM $t GROUP BY l_returnflag)
       |SELECT l_returnflag, n,
       |       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       |       (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
       |        sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       |         AS corr_qty_price,
       |       sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
       |            (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) AS sd_qty,
       |       sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) /
       |            (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) AS sd_price
       |FROM m ORDER BY l_returnflag""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_filter_agg" ->
      """SELECT l_returnflag,
           count(*) AS n_all,
           CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_disc,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             FILTER (WHERE l_quantity >= 25) AS BIGINT) AS cents_heavy
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_lateral" ->
      """SELECT n.n_name, t.c_name, t.c_acctbal
         FROM nation n,
         LATERAL (SELECT c_name, c_acctbal FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
         ORDER BY n_name, c_name""",
    "q_stats_moments" -> statsMomentsSql("lineitem"),
    "q_not_in" ->
      """SELECT o_orderpriority, count(*) AS n
         FROM orders
         WHERE nullif(o_custkey, 7) NOT IN
           (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_fuzzy_join" ->
      """WITH n AS (SELECT DISTINCT p_name AS nm FROM part)
         SELECT a.nm AS name_a, b.nm AS name_b,
                CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
         FROM n a JOIN n b
           ON a.nm < b.nm AND abs(length(a.nm) - length(b.nm)) <= 2
         WHERE levenshtein(a.nm, b.nm) BETWEEN 1 AND 2
         ORDER BY name_a, name_b""",
    "q_histogram" ->
      """SELECT CAST(CAST(round(l_extendedprice * 100) AS BIGINT) // 500000 AS INT) AS bucket,
                count(*) AS n,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM lineitem GROUP BY bucket ORDER BY bucket""",
    "q_regr" ->
      """WITH m AS (
           SELECT l_returnflag,
                  count(*) AS n,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
                  CAST(sum(CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
                  CAST(sum(CAST(l_quantity AS BIGINT)
                      * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy,
                  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
                  CAST(sum(CAST(round(l_extendedprice) AS BIGINT)
                      * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n, sx, sy,
                CAST(floor(1000000.0 *
                  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                  AS BIGINT) AS slope_u,
                CAST(floor(1000000.0 *
                  ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                  / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
                  AS BIGINT) AS r2_u
         FROM m ORDER BY l_returnflag""",
    "q_approx_topk" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt, TRUE AS cms_ok
         FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
         WHERE length(token) > 0
         GROUP BY token ORDER BY exact_cnt DESC, token LIMIT 10""",
    // the NAIVE all-pairs evaluation of the same radius predicate — a
    // different plan whose agreement proves the grid loses no
    // boundary-straddling pair; a < b orientation matches the gate
    "q_spatial_grid" ->
      """WITH pts AS (
           SELECT c_custkey AS id, c_mktsegment AS seg,
                  CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
                               1, 6) AS BIGINT) % 1000 AS x,
                  CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
                               7, 6) AS BIGINT) % 1000 AS y
           FROM customer),
         pairs AS (
           SELECT a.seg,
                  (a.x - b.x) * (a.x - b.x)
                    + (a.y - b.y) * (a.y - b.y) AS d2
           FROM pts a JOIN pts b ON a.id < b.id
           WHERE (a.x - b.x) * (a.x - b.x)
                   + (a.y - b.y) * (a.y - b.y) <= 100)
         SELECT seg, count(*) AS n_pairs,
                CAST(sum(d2) AS BIGINT) AS sum_d2
         FROM pairs GROUP BY seg ORDER BY seg""",
    // naive all-pairs neighborhoods + recursive-reachability labels:
    // a different plan than the grid join + propagation loop, same
    // clusters (q_graph_cc's pair-set fixpoint pattern)
    "q_spatial_dbscan" ->
      """WITH RECURSIVE pts AS (
           SELECT c_custkey AS id,
                  CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
                               1, 6) AS BIGINT) % 1000 AS x,
                  CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
                               7, 6) AS BIGINT) % 1000 AS y
           FROM customer WHERE c_custkey <= 3000),
         nbr AS (
           SELECT a.id AS a_id, b.id AS b_id
           FROM pts a JOIN pts b ON a.id <> b.id
           WHERE (a.x - b.x) * (a.x - b.x)
                   + (a.y - b.y) * (a.y - b.y) <= 64),
         core AS (
           SELECT a_id AS id FROM nbr
           GROUP BY a_id HAVING count(*) + 1 >= 4),
         ce AS (
           SELECT n.a_id AS u, n.b_id AS v FROM nbr n
           JOIN core c1 ON n.a_id = c1.id
           JOIN core c2 ON n.b_id = c2.id),
         reach(u, v) AS (
           SELECT id AS u, id AS v FROM core
           UNION
           SELECT r.u, e.v FROM reach r JOIN ce e ON r.v = e.u),
         clab AS (SELECT u AS id, min(v) AS lab FROM reach GROUP BY u),
         border AS (
           SELECT n.a_id, min(cl.lab) AS lab
           FROM nbr n
           JOIN core c ON n.b_id = c.id
           JOIN clab cl ON cl.id = n.b_id
           WHERE n.a_id NOT IN (SELECT id FROM core)
           GROUP BY n.a_id)
         SELECT lab AS cluster_id,
                CAST(sum(c) AS BIGINT) AS n_core,
                CAST(sum(b) AS BIGINT) AS n_border
         FROM (SELECT lab, 1 AS c, 0 AS b FROM clab
               UNION ALL
               SELECT lab, 0 AS c, 1 AS b FROM border) t
         GROUP BY lab ORDER BY cluster_id""",
    // identical word algebra: << for shiftleft, // for div; engaged
    // pairs are distinct so the word value sum IS the bitwise OR
    "q_bitmap_users" ->
      """WITH eng AS (
           SELECT event_type, user_id
           FROM events GROUP BY event_type, user_id
           HAVING count(*) >= 14),
         bm AS (
           SELECT event_type, user_id // 62 AS word,
                  CAST(sum(CAST(1 AS BIGINT) << CAST(user_id % 62 AS INT))
                    AS BIGINT) AS val
           FROM eng GROUP BY event_type, user_id // 62),
         card AS (
           SELECT event_type,
                  CAST(sum(bit_count(val)) AS BIGINT) AS n_users
           FROM bm GROUP BY event_type),
         inter AS (
           SELECT a.event_type AS t1, b.event_type AS t2,
                  CAST(sum(bit_count(a.val & b.val)) AS BIGINT) AS n_both
           FROM bm a JOIN bm b
             ON a.word = b.word AND a.event_type < b.event_type
           GROUP BY a.event_type, b.event_type)
         SELECT ca.event_type AS t1, cb.event_type AS t2,
                coalesce(i.n_both, 0) AS n_both,
                ca.n_users + cb.n_users - coalesce(i.n_both, 0) AS n_either,
                (1000 * coalesce(i.n_both, 0))
                  // (ca.n_users + cb.n_users - coalesce(i.n_both, 0))
                  AS jacc_milli
         FROM card ca JOIN card cb ON ca.event_type < cb.event_type
         LEFT JOIN inter i
           ON i.t1 = ca.event_type AND i.t2 = cb.event_type
         ORDER BY t1, t2""",
    "q_bloom_prefilter" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS cents_total
         FROM orders
         WHERE o_custkey IN
           (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // weighted recursion: extend while the path total stays under 60;
    // positive weights ⇒ prefix totals are monotone, so the cap never
    // truncates a prefix of a shorter path — min(d) is exact for every
    // vertex whose true distance is < 60, and the Spark side's
    // converged Bellman-Ford filters to the same set
    "q_graph_sssp" ->
      """WITH RECURSIVE
           mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
           e AS (
             SELECT doc_id AS u,
                    CAST('0x' || substring(md5(text), 1, 12) AS BIGINT) % m
                      AS v,
                    CAST('0x' || substring(md5(text), 25, 4) AS BIGINT) % 9
                      + 1 AS w
             FROM documents, mx
             UNION ALL
             SELECT doc_id,
                    CAST('0x' || substring(md5(text), 13, 12) AS BIGINT) % m,
                    CAST('0x' || substring(md5(text), 29, 4) AS BIGINT) % 9
                      + 1
             FROM documents, mx),
           sp(v, d) AS (
             SELECT doc_id, 0 FROM documents WHERE doc_id % 29 = 0
             UNION
             SELECT e.v, sp.d + e.w FROM sp JOIN e ON e.u = sp.v
             WHERE sp.d + e.w < 60)
         SELECT v AS doc_id, CAST(min(d) AS BIGINT) AS dist
         FROM sp GROUP BY v ORDER BY doc_id""",
    // true recursive CTE: recursive-union dedup on (v, d) pairs bounds
    // the iteration, min(d) recovers the BFS distance; the d < 30 cap
    // mirrors the Spark loop's safety bound exactly
    "q_graph_bfs" ->
      """WITH RECURSIVE
           mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
           e AS (
             SELECT doc_id AS u,
                    CAST('0x' || substring(md5(text), 1, 12) AS BIGINT) % m
                      AS v
             FROM documents, mx
             UNION ALL
             SELECT doc_id,
                    CAST('0x' || substring(md5(text), 13, 12) AS BIGINT) % m
             FROM documents, mx),
           bfs(v, d) AS (
             SELECT doc_id, 0 FROM documents WHERE doc_id % 23 = 0
             UNION
             SELECT e.v, bfs.d + 1 FROM bfs JOIN e ON e.u = bfs.v
             WHERE bfs.d < 30)
         SELECT v AS doc_id, CAST(min(d) AS BIGINT) AS dist
         FROM bfs GROUP BY v ORDER BY doc_id""",
    // true recursive reachability (pair-set fixpoint, no depth cap
    // needed — (v, u) pairs are finite and UNION dedups); component
    // label = min reachable vertex id, phantoms included, then sizes
    // over real documents only — exactly the Spark loop's restriction
    "q_graph_cc" ->
      """WITH RECURSIVE
           raw AS (
             SELECT doc_id AS u,
                    (doc_id // 16) * 16 +
                      CAST('0x' || substring(md5(text), 1, 12) AS BIGINT) % 16
                      AS v
             FROM documents),
           e AS (
             SELECT u, v FROM raw WHERE u <> v
             UNION
             SELECT v, u FROM raw WHERE u <> v),
           r(v, u) AS (
             SELECT doc_id, doc_id FROM documents
             UNION
             SELECT r.v, e.v FROM r JOIN e ON e.u = r.u),
           lab AS (SELECT v, min(u) AS comp FROM r GROUP BY v)
         SELECT comp, count(*) AS size
         FROM lab GROUP BY comp ORDER BY comp""",
    // three unrolled integer PageRank steps; every arithmetic step
    // mirrors the Spark loop exactly (positive // ≡ div, sums cast off
    // HUGEINT, coalesce for in-degree-0 nodes)
    "q_graph_pagerank" ->
      """WITH raw AS (
           SELECT doc_id AS u,
                  (doc_id // 16) * 16 +
                    CAST('0x' || substring(md5(text), 1, 12) AS BIGINT)
                      % 16 AS v
           FROM documents
           UNION
           SELECT doc_id,
                  (doc_id // 16) * 16 +
                    CAST('0x' || substring(md5(text), 13, 12) AS BIGINT)
                      % 16
           FROM documents),
         e AS (
           SELECT DISTINCT u, v FROM raw
           WHERE u <> v AND v IN (SELECT doc_id FROM documents)),
         deg AS (SELECT u, count(*) AS d FROM e GROUP BY u),
         ed AS (SELECT e.u, e.v, deg.d FROM e JOIN deg ON deg.u = e.u),
         n AS (SELECT doc_id AS v FROM documents),
         p0 AS (SELECT doc_id AS v, CAST(1000000 AS BIGINT) AS pr
                FROM documents),
         p1 AS (SELECT n.v,
                  (15 * 1000000 + 85 * COALESCE(s.sc, 0)) // 100 AS pr
                FROM n LEFT JOIN (
                  SELECT ed.v, CAST(SUM(p0.pr // ed.d) AS BIGINT) AS sc
                  FROM ed JOIN p0 ON p0.v = ed.u GROUP BY ed.v) s
                  ON s.v = n.v),
         p2 AS (SELECT n.v,
                  (15 * 1000000 + 85 * COALESCE(s.sc, 0)) // 100 AS pr
                FROM n LEFT JOIN (
                  SELECT ed.v, CAST(SUM(p1.pr // ed.d) AS BIGINT) AS sc
                  FROM ed JOIN p1 ON p1.v = ed.u GROUP BY ed.v) s
                  ON s.v = n.v),
         p3 AS (SELECT n.v,
                  (15 * 1000000 + 85 * COALESCE(s.sc, 0)) // 100 AS pr
                FROM n LEFT JOIN (
                  SELECT ed.v, CAST(SUM(p2.pr // ed.d) AS BIGINT) AS sc
                  FROM ed JOIN p2 ON p2.v = ed.u GROUP BY ed.v) s
                  ON s.v = n.v)
         SELECT v AS doc_id, CAST(pr AS BIGINT) AS pr
         FROM p3 ORDER BY doc_id""",
    // same degree orientation in plain SQL: canonical undirected set,
    // degree table, (deg, id)-lex orientation, id-ordered wedges at the
    // apex, closure membership against the canonical set — each triangle
    // surfaces exactly once, then fans out to its three corners
    "q_graph_triangles" ->
      """WITH
           mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
           raw AS (
             SELECT doc_id AS u,
                    CAST('0x' || substring(md5(text), 1, 12) AS BIGINT) % m AS v
             FROM documents, mx
             UNION ALL
             SELECT doc_id,
                    CAST('0x' || substring(md5(text), 9, 12) AS BIGINT) % m
             FROM documents, mx
             UNION ALL
             SELECT doc_id,
                    CAST('0x' || substring(md5(text), 17, 12) AS BIGINT) % m
             FROM documents, mx
             UNION ALL
             SELECT doc_id,
                    CAST('0x' || substring(md5(text), 25, 12) AS BIGINT) % m
             FROM documents, mx),
           und AS (
             SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
             FROM raw WHERE u <> v),
           deg AS (
             SELECT x, count(*) AS d FROM (
               SELECT a AS x FROM und UNION ALL SELECT b FROM und)
             GROUP BY x),
           oriented AS (
             SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND und.a < und.b)
                         THEN und.a ELSE und.b END AS u,
                    CASE WHEN da.d < db.d OR (da.d = db.d AND und.a < und.b)
                         THEN und.b ELSE und.a END AS v
             FROM und
             JOIN deg da ON da.x = und.a
             JOIN deg db ON db.x = und.b),
           tri AS (
             SELECT o1.u, o1.v AS x, o2.v AS y
             FROM oriented o1
             JOIN oriented o2 ON o1.u = o2.u AND o1.v < o2.v
             JOIN und ON und.a = o1.v AND und.b = o2.v)
         SELECT c AS doc_id, CAST(count(*) AS BIGINT) AS n_tri
         FROM (SELECT unnest([u, x, y]) AS c FROM tri)
         GROUP BY c ORDER BY doc_id""",
    "q_recursive_sql" -> mgmtChainSql("//"),
    // the quadratic dominance definition the distributed two-phase sweep
    // must reproduce exactly: dominated = somebody ≤ on both dims and
    // strictly < on at least one; both-dim ties survive together
    "q_skyline" ->
      """WITH pts AS (
           SELECT p_partkey, p_size,
                  CAST(round(p_retailprice * 100) AS BIGINT) AS cents
           FROM part)
         SELECT p_partkey, p_size, cents
         FROM pts p
         WHERE NOT EXISTS (
           SELECT 1 FROM pts q
           WHERE q.p_size <= p.p_size AND q.cents <= p.cents
             AND (q.p_size < p.p_size OR q.cents < p.cents))
         ORDER BY p_partkey"""
  )
}
