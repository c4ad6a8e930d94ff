package graft.operators

import org.apache.spark.sql.{functions => F}

/** Approximate/sketch aggregation gates over the `events` table.
  *
  * Sketch values themselves cannot be compared across engines (Spark's
  * HyperLogLog++ and percentile digests are implementation-specific), so
  * each gate emits (a) exact values the DuckDB oracle reproduces and (b)
  * the sketch's ACCURACY CONTRACT as a boolean computed in-engine. Spark
  * sketches are deterministic on fixed input (no RNG state), so the boolean
  * is stable run-to-run and the oracle pins it with a literal TRUE — if a
  * regression pushes the sketch outside its error bound, the gate fails.
  *
  * Scale notes (100 TB): this is the whole point of sketches — both
  * aggregates are associative mergeable state, so Spark computes map-side
  * partial sketches and shuffles ONLY the fixed-size sketch buffers
  * (HashAggregate partial_approx_count_distinct / partial_percentile_approx
  * in the plan), never the distinct values. An exact global count-distinct
  * at 100 TB would shuffle every distinct key; the HLL++ version exchanges
  * ~kilobytes per group.
  */
object Sketches extends Catalog {

  /** HLL estimate numerator: alpha_64 * m^2 * 2^55, folded left-to-right in
    * double exactly as the oracle folds it (each step correctly rounded →
    * bit-identical across engines). 2^55 scales the harmonic sum into exact
    * integer space: Z = Σ_buckets 2^(55-M_j) is a BIGINT (≤ 64·2^55 = 2^61),
    * so the only float op in the whole sketch is this one division.
    */
  private val HllNumer: Double = 0.709 * 4096.0 * 3.6028797018963968e16

  val queries: Map[String, Q] = Map(

    // HyperLogLog++ distinct-user counts per event type, checked against
    // the exact count at rsd=2% (gate bound 5%). The exact countDistinct
    // is the oracle-comparable side; production at 100 TB would drop it
    // and keep only the sketch.
    "q_approx_distinct" -> ((s, dir) =>
      table(s, dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).as("n_events"),
          F.countDistinct("user_id").as("exact_users"),
          F.approx_count_distinct(F.col("user_id"), 0.02).as("ad"))
        .select(F.col("event_type"), F.col("n_events"), F.col("exact_users"),
          (F.abs(F.col("ad") - F.col("exact_users")) <=
            F.lit(0.05) * F.col("exact_users")).as("hll_ok"))
        .orderBy("event_type")),

    // Approximate median per event type, verified by its RANK error: the
    // returned value's rank INTERVAL [count(< ap50), count(<= ap50)] must
    // intersect [0.45·n, 0.55·n] (accuracy=1000 → rank error 1e-3; the
    // gate allows 50×). The interval form — not a single <=-fraction — is
    // tie-robust: a value mass at the median legitimately pushes
    // count(<=) far past 0.5·n even for a perfect sketch, but its rank
    // interval still covers the median rank. The check needs a second
    // pass over events, joining the tiny per-group sketch result back via
    // broadcast.
    "q_approx_quantile" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val ap = ev.groupBy(F.col("event_type").as("et"))
        .agg(F.percentile_approx(F.col("value"), F.lit(0.5), F.lit(1000)).as("ap50"))
      ev.join(F.broadcast(ap), ev("event_type") === F.col("et"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).as("n_vals"),
          F.sum(F.when(F.col("value") < F.col("ap50"), 1).otherwise(0)).as("lt"),
          F.sum(F.when(F.col("value") <= F.col("ap50"), 1).otherwise(0)).as("le"))
        .select(F.col("event_type"), F.col("n_vals"),
          (F.col("lt").cast("double") <= F.lit(0.55) * F.col("n_vals") &&
            F.col("le").cast("double") >= F.lit(0.45) * F.col("n_vals"))
            .as("rank_ok"))
        .orderBy("event_type")
    }),

    // Hand-rolled HyperLogLog whose ESTIMATE the oracle reproduces
    // bit-exactly (unlike q_approx_distinct, which can only pin Spark's
    // opaque HLL++ behind an error-bound boolean). m=64 buckets; the hash
    // is 60 bits of shared md5; rho = leading-zero count of the remaining
    // 54-bit word, computed exactly via length(bin(w)) in both engines.
    // The harmonic sum is kept in exact integer space scaled by 2^55; the
    // single float op (numerator / Z) is a correctly-rounded IEEE divide,
    // identical in Spark and DuckDB, so floor() lands identically.
    //
    // Scale (100 TB): the per-(event_type, bucket) MAX(rho) is associative
    // mergeable state — the plan shows a partial_max HashAggregate, so
    // executors exchange at most 64 small ints per group, never user_ids.
    // This is the sketch you'd actually run where the exact
    // countDistinct's shuffle of every distinct key is unaffordable.
    "q_sketch_hll" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val hashed = ev.select(F.col("event_type"), F.col("user_id"),
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      val rho = hashed.select(F.col("event_type"),
        F.pmod(F.col("h"), F.lit(64L)).as("bucket"),
        F.expr("h div 64").as("w"))
        .select(F.col("event_type"), F.col("bucket"),
          F.when(F.col("w") === 0L, F.lit(55))
            .otherwise(F.lit(55) - F.length(F.bin(F.col("w")))).as("rho"))
      val mj = rho.groupBy("event_type", "bucket").agg(F.max("rho").as("m_j"))
      // Complete the 64-bucket grid so empty buckets contribute 2^55 to Z.
      val grid = ev.select("event_type").distinct()
        .select(F.col("event_type"),
          F.explode(F.sequence(F.lit(0L), F.lit(63L))).as("bucket"))
      val z = grid.join(mj, Seq("event_type", "bucket"), "left")
        .select(F.col("event_type"), F.coalesce(F.col("m_j"), F.lit(0)).as("m_j"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - m_j)")).as("z"),
          F.sum(F.when(F.col("m_j") === 0, 1L).otherwise(0L)).as("empty_buckets"))
      val exact = ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").as("exact_users"))
      exact.join(F.broadcast(z), Seq("event_type"))
        .select(F.col("event_type"), F.col("exact_users"),
          F.floor(F.lit(HllNumer) / F.col("z")).cast("long").as("hll_est"),
          F.col("empty_buckets"))
        .orderBy("event_type")
    }),

    // KMV (k-minimum-values) distinct sketch, est = (k-1)·2^48 / h_(k) —
    // the bottom-k companion to HLL whose state is the k smallest hash
    // values, and the ONLY classic distinct sketch that also supports
    // SET OPERATIONS (see q_sketch_kmv_jaccard). Fully integer: 48-bit
    // md5 hashes, (k-1)·2^48 < 2^54, and the final estimate is one
    // integer floor-division (positive operands, so Spark `div` ≡
    // DuckDB `//`) — bit-exact cross-engine with zero float ops, one
    // better than the HLL gate's single IEEE divide. Groups with fewer
    // than k distinct hashes short-circuit to the exact sketch size
    // (the standard KMV small-set rule), exercised at sf0.001.
    //
    // Scale (100 TB): bottom-k is associative mergeable state; the
    // distinct+window here shuffles only (event_type, h) pairs after
    // partial distinct, and the sketch side of every join is ≤ k rows
    // per group — broadcast territory at any corpus size.
    "q_sketch_kmv" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = table(s, dir, "events")
      val dh = ev.select(F.col("event_type"),
          F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12),
            16, 10).cast("long").as("h"))
        .distinct()
      val ranked = dh.withColumn("rn",
        F.row_number().over(Window.partitionBy("event_type").orderBy("h")))
      val kth = ranked.filter(F.col("rn") === 64)
        .select(F.col("event_type"), F.col("h").as("hk"))
      val nh = dh.groupBy("event_type").agg(F.count(F.lit(1)).as("n_h"))
      val exact = ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").as("exact_users"))
      exact.join(nh, Seq("event_type"))
        .join(F.broadcast(kth), Seq("event_type"), "left")
        .select(F.col("event_type"), F.col("exact_users"),
          F.when(F.col("hk").isNull, F.col("n_h"))
            .otherwise(F.expr(s"(63 * ${1L << 48}) div hk"))
            .cast("long").as("kmv_est"))
        .orderBy("event_type")
    }),

    // KMV set algebra — the reason to keep bottom-k sketches at all:
    // two per-type sketches estimate their UNION (bottom-k of the
    // merged hash sets) and INTERSECTION (|SU ∩ SA ∩ SB|/k of the
    // union estimate) without touching the raw data again. Exact
    // integer arithmetic end to end; the oracle replays the identical
    // sketch algebra, and exact distinct counts ride along so the
    // estimates' error is visible in the artifact.
    "q_sketch_kmv_jaccard" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = table(s, dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
      val dh = ev.select(F.col("event_type"),
          F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12),
            16, 10).cast("long").as("h"))
        .distinct()
      // per-type bottom-k sketches
      val sk = dh.withColumn("rn",
          F.row_number().over(Window.partitionBy("event_type").orderBy("h")))
        .filter(F.col("rn") <= 64)
        .select("event_type", "h").localCheckpoint()
      val sa = sk.filter(F.col("event_type") === "click").select("h")
      val sb = sk.filter(F.col("event_type") === "view").select("h")
      // union sketch: bottom-k of the merged sketch hash sets
      val su = sa.unionByName(sb).distinct()
        .withColumn("rn", F.row_number().over(
          Window.partitionBy().orderBy("h")))
        .filter(F.col("rn") <= 64)
      val uk = su.agg(F.max("h").as("hu"), F.count(F.lit(1)).as("nu"))
      val common = su.join(sa, Seq("h"), "left_semi")
        .join(sb, Seq("h"), "left_semi")
        .agg(F.count(F.lit(1)).as("n_common"))
      val exact = ev.groupBy("user_id")
        .agg(F.countDistinct("event_type").as("nt"))
        .agg(F.count(F.lit(1)).as("exact_union"),
          F.sum(F.when(F.col("nt") === 2, 1L).otherwise(0L))
            .as("exact_inter"))
      common.crossJoin(F.broadcast(uk)).crossJoin(F.broadcast(exact))
        .select(F.col("n_common"), F.col("exact_union"), F.col("exact_inter"),
          F.when(F.col("nu") < 64, F.col("nu"))
            .otherwise(F.expr(s"(63 * ${1L << 48}) div hu"))
            .cast("long").as("union_est"),
          F.col("nu"))
        // ρ = n_common/|SU|; when the union sketch is the whole hash set
        // (nu < k) this degenerates to the exact intersection, as it must
        .withColumn("inter_est",
          F.expr("(n_common * union_est) div nu").cast("long"))
        .drop("nu")
    }),

    // Fixed-width histogram quantile: the mergeable-state alternative to
    // percentile_approx whose answer the oracle reproduces EXACTLY.
    // Values quantize to integers once (floor(value·1000), the engine's
    // iterative-loop rule), buckets are width-1000 floor divisions, and
    // the median is the first bucket whose cumulative count reaches
    // ceil(n/2) — every step exact integer arithmetic in both engines.
    //
    // Scale (100 TB): the per-(event_type, bucket) counts are classic
    // map-side-combinable state bounded by the value range, not the row
    // count; the cumulative walk runs over the tiny histogram. This is
    // the equi-width-histogram quantile any warehouse serves at scale,
    // with the sketch→answer path fully under the oracle (the
    // percentile_approx gate q_approx_quantile can only pin a rank
    // bound).
    "q_sketch_quantile_hist" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = table(s, dir, "events")
      // events.value >= 0 in this corpus, so div == floor division
      val hist = ev
        .select(F.col("event_type"),
          F.expr("CAST(floor(value * 1000) AS BIGINT) div 1000").as("b"))
        .groupBy("event_type", "b").agg(F.count(F.lit(1)).as("c"))
      val w = Window.partitionBy("event_type").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy("event_type")
      hist
        .withColumn("cum", F.sum("c").over(w))
        .withColumn("n", F.sum("c").over(wn))
        .groupBy("event_type")
        .agg(F.min("n").as("n_vals"),
          F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("b")))
            .as("med_bucket"),
          F.count(F.lit(1)).as("hist_nnz"))
        .orderBy("event_type")
    }),

    // Count-min sketch heavy hitters, cross-engine exact: d=3 hash rows
    // (disjoint 28-bit slices of ONE md5, per the slice-don't-reseed rule),
    // w=256 counters. The estimate min_r counter[r][h_r(u)] is pure integer
    // arithmetic, and the CMS one-sided guarantee (never under-counts) is
    // emitted as a checked column.
    //
    // Scale (100 TB): the sketch is 768 counters regardless of input size —
    // a map-side-combined groupBy on (r, b) — and the candidate probe joins
    // against it broadcast. Production would stream the fixed-size sketch
    // per shard and merge by counter addition (associative); the exact
    // top-k here is the verification side, not the scale path.
    "q_sketch_cms" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      def hr(r: Int) = F.pmod(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1 + 7 * r, 7), 16, 10)
          .cast("long"), F.lit(256L))
      val triples = ev.select(F.col("user_id"),
        F.posexplode(F.array(hr(0), hr(1), hr(2)))).toDF("user_id", "r", "b")
      val sketch = triples.groupBy("r", "b").agg(F.count(F.lit(1)).as("cnt"))
      val exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).as("true_cnt"))
      val cand = exact.orderBy(F.col("true_cnt").desc, F.col("user_id")).limit(10)
      val candH = cand.select(F.col("user_id"), F.col("true_cnt"),
        F.posexplode(F.array(hr(0), hr(1), hr(2)))).toDF("user_id", "true_cnt", "r", "b")
      candH.join(F.broadcast(sketch), Seq("r", "b"))
        .groupBy("user_id", "true_cnt")
        .agg(F.min("cnt").as("cms_est"))
        .select(F.col("user_id"), F.col("true_cnt"), F.col("cms_est"),
          (F.col("cms_est") >= F.col("true_cnt")).as("never_under"))
        .orderBy(F.col("true_cnt").desc, F.col("user_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_approx_distinct" ->
      """SELECT event_type, count(*) AS n_events,
                count(DISTINCT user_id) AS exact_users,
                TRUE AS hll_ok
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_approx_quantile" ->
      """SELECT event_type, count(*) AS n_vals, TRUE AS rank_ok
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_sketch_kmv" ->
      s"""WITH dh AS (
            SELECT DISTINCT event_type,
                   CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12)
                     AS BIGINT) AS h
            FROM events),
          r AS (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h)
                     AS rn
            FROM dh),
          kth AS (SELECT event_type, h AS hk FROM r WHERE rn = 64),
          nh AS (SELECT event_type, count(*) AS n_h FROM dh GROUP BY 1),
          ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
                 FROM events GROUP BY 1)
          SELECT ex.event_type, ex.exact_users,
                 CAST(CASE WHEN kth.hk IS NULL THEN nh.n_h
                      ELSE (63 * ${1L << 48}) // kth.hk END AS BIGINT)
                   AS kmv_est
          FROM ex
          JOIN nh ON nh.event_type = ex.event_type
          LEFT JOIN kth ON kth.event_type = ex.event_type
          ORDER BY ex.event_type""",
    "q_sketch_kmv_jaccard" ->
      s"""WITH ev AS (SELECT * FROM events
                      WHERE event_type IN ('click', 'view')),
          dh AS (
            SELECT DISTINCT event_type,
                   CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12)
                     AS BIGINT) AS h
            FROM ev),
          sk AS (SELECT event_type, h FROM (
                   SELECT event_type, h,
                          row_number() OVER (PARTITION BY event_type
                                             ORDER BY h) AS rn
                   FROM dh)
                 WHERE rn <= 64),
          sa AS (SELECT h FROM sk WHERE event_type = 'click'),
          sb AS (SELECT h FROM sk WHERE event_type = 'view'),
          su AS (SELECT h FROM (
                   SELECT h, row_number() OVER (ORDER BY h) AS rn
                   FROM (SELECT DISTINCT h FROM (
                           SELECT h FROM sa UNION ALL SELECT h FROM sb)))
                 WHERE rn <= 64),
          uk AS (SELECT max(h) AS hu, count(*) AS nu FROM su),
          cm AS (SELECT count(*) AS n_common FROM su
                 WHERE h IN (SELECT h FROM sa)
                   AND h IN (SELECT h FROM sb)),
          ex AS (SELECT count(*) AS exact_union,
                        CAST(sum(CASE WHEN nt = 2 THEN 1 ELSE 0 END)
                          AS BIGINT) AS exact_inter
                 FROM (SELECT user_id, count(DISTINCT event_type) AS nt
                       FROM ev GROUP BY 1)),
          est AS (SELECT n_common, exact_union, exact_inter, nu,
                         CAST(CASE WHEN nu < 64 THEN nu
                              ELSE (63 * ${1L << 48}) // hu END AS BIGINT)
                           AS union_est
                  FROM cm, uk, ex)
          SELECT n_common, exact_union, exact_inter, union_est,
                 CAST((n_common * union_est) // nu AS BIGINT) AS inter_est
          FROM est""",
    "q_sketch_hll" ->
      s"""WITH h AS (
            SELECT event_type,
                   CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
            FROM events),
          r AS (
            SELECT event_type, h % 64 AS bucket,
                   CASE WHEN h // 64 = 0 THEN 55
                        ELSE 55 - length(bin(h // 64)) END AS rho
            FROM h),
          mj AS (SELECT event_type, bucket, max(rho) AS m_j FROM r GROUP BY 1, 2),
          grid AS (SELECT t.event_type, gs.bucket
                   FROM (SELECT DISTINCT event_type FROM events) t
                   CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bucket) gs),
          filled AS (SELECT g.event_type, COALESCE(m.m_j, 0) AS m_j
                     FROM grid g LEFT JOIN mj m
                       ON g.event_type = m.event_type AND g.bucket = m.bucket),
          z AS (SELECT event_type,
                  CAST(sum(CAST(1 AS BIGINT) << (55 - m_j)) AS BIGINT) AS z,
                  CAST(sum(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_buckets
                FROM filled GROUP BY 1),
          exact AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
                    FROM events GROUP BY 1)
          SELECT e.event_type, e.exact_users,
                 CAST(floor($HllNumer / z.z) AS BIGINT) AS hll_est,
                 z.empty_buckets
          FROM exact e JOIN z ON e.event_type = z.event_type
          ORDER BY e.event_type""",
    "q_sketch_quantile_hist" ->
      """WITH q AS (
           SELECT event_type,
                  CAST(floor(value * 1000) AS BIGINT) // 1000 AS b
           FROM events),
         h AS (SELECT event_type, b, CAST(count(*) AS BIGINT) AS c
               FROM q GROUP BY 1, 2),
         cum AS (SELECT event_type, b, c,
                  sum(c) OVER (PARTITION BY event_type ORDER BY b) AS cum,
                  sum(c) OVER (PARTITION BY event_type) AS n
                 FROM h)
         SELECT event_type,
                CAST(min(n) AS BIGINT) AS n_vals,
                CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN b END)
                  AS BIGINT) AS med_bucket,
                CAST(count(*) AS BIGINT) AS hist_nnz
         FROM cum GROUP BY event_type ORDER BY event_type""",
    "q_sketch_cms" ->
      """WITH hh AS (
           SELECT user_id,
             CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 7) AS BIGINT) % 256 AS h0,
             CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 8, 7) AS BIGINT) % 256 AS h1,
             CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 15, 7) AS BIGINT) % 256 AS h2
           FROM events),
         tr AS (
           SELECT user_id, 0 AS r, h0 AS b FROM hh
           UNION ALL SELECT user_id, 1, h1 FROM hh
           UNION ALL SELECT user_id, 2, h2 FROM hh),
         sketch AS (SELECT r, b, CAST(count(*) AS BIGINT) AS cnt FROM tr GROUP BY 1, 2),
         exact AS (SELECT user_id, count(*) AS true_cnt FROM events GROUP BY 1),
         cand AS (SELECT * FROM exact ORDER BY true_cnt DESC, user_id LIMIT 10),
         ch AS (SELECT DISTINCT c.user_id, c.true_cnt, t.r, t.b
                FROM cand c JOIN tr t ON c.user_id = t.user_id)
         SELECT ch.user_id, ch.true_cnt, CAST(min(s.cnt) AS BIGINT) AS cms_est,
                CAST(min(s.cnt) AS BIGINT) >= ch.true_cnt AS never_under
         FROM ch JOIN sketch s ON ch.r = s.r AND ch.b = s.b
         GROUP BY ch.user_id, ch.true_cnt
         ORDER BY ch.true_cnt DESC, ch.user_id"""
  )
}
