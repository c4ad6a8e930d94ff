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
         FROM events GROUP BY 1 ORDER BY 1"""
  )
}
