package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Retrieval-index operators over the `documents` table: inverted-index
  * construction and BM25 ranking — the search side of a training-data
  * platform (RAG corpus prep, boosted sampling, eval-set retrieval).
  *
  * Scale notes (100 TB):
  * - The inverted index uses BLOCKED postings: the posting list for a
  *   token is segmented by `doc_id DIV blockSize`, so no single groupBy
  *   value ever aggregates more than `blockSize` ids regardless of how
  *   common the token is. An unblocked `collect_list` over a stop-word's
  *   postings is the classic executor-OOM; blocking bounds both the
  *   shuffle value size and the output row width, and real engines
  *   (Lucene segments, ES shards) store postings exactly this way.
  * - BM25 never shuffles the corpus: per-term document frequencies and
  *   the average document length are tiny aggregates (one row each,
  *   collected to literals / broadcast), and scoring is then a narrow
  *   per-row projection over the term-frequency columns.
  *
  * Cross-engine determinism: scores use the RATIONAL idf variant
  * `(N - df + 0.5) / (df + 0.5)` rather than the textbook `ln` of it —
  * monotone-identical ranking, but exactly computable from integer
  * sufficient statistics in fixed IEEE-754 op order in both engines
  * (`ln` is only ~1-ulp accurate in libm/Math.log and may differ).
  * Scores are floor-scaled (CLAUDE.md rules) before ranking.
  */
object LlmRetrieval extends Catalog {

  // BM25 shape parameters (standard defaults) appear ONLY as decimal
  // literals mirrored verbatim in the oracle SQL — Scala-side constant
  // folding (e.g. k1 + 1.0) could round differently than DuckDB's parse
  // of the folded literal.

  private def docs(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("w", F.split(F.col("text"), " "))

  val queries: Map[String, Q] = Map(

    // Blocked inverted index: token → (block, bounded posting segment).
    // ONE shuffle on the token+block key — within-document repeats are
    // deduped by collect_set inside the aggregate (map-side partial sets)
    // instead of a separate distinct() exchange, and the per-group set is
    // capped at the 100-doc block size by construction.
    "llm_inverted_index" -> ((s, dir) =>
      docs(s, dir)
        .select(F.col("doc_id"), F.explode(F.col("w")).as("token"))
        .filter(F.length(F.col("token")) >= 3)
        .withColumn("block_id", F.expr("doc_id DIV 100"))
        .groupBy("token", "block_id")
        .agg(F.collect_set(F.col("doc_id")).as("ids"))
        .select(F.col("token"), F.col("block_id"),
          F.size(F.col("ids")).cast("long").as("n_docs"),
          F.md5(F.concat_ws(",",
            F.expr("transform(sort_array(ids), x -> cast(x as string))")))
            .as("postings_hash"))
        .orderBy("token", "block_id")),

    // Rice/Golomb-coded POSTING LISTS — the inverted-index compression
    // step (Lucene/PForDelta territory) under the oracle: per token,
    // the sorted doc-id list becomes [first, gap, gap, …] and the Rice
    // parameter k is chosen by the EXACT integer bit-cost argmin
    // Σ((v >> k) + 1 + k) over k ∈ 0..14, ties to the smallest k —
    // the same Rice math the FLAC oracle already pins. Every value is
    // an integer, so the encoded size is bit-exact cross-engine with
    // no encoder to run. Scale shape: one shuffle builds the postings,
    // the 15-way k sweep is a narrow explode + re-aggregate on the
    // (token, k) key, the argmin a per-token window.
    "llm_postings_rice" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val vals = docs(s, dir)
        .select(F.col("doc_id"), F.explode(F.col("w")).as("token"))
        .filter(F.length(F.col("token")) >= 3)
        .groupBy("token")
        .agg(F.sort_array(F.collect_set("doc_id")).as("ids"))
        .filter(F.size(F.col("ids")) >= 2)
        .select(F.col("token"),
          F.size(F.col("ids")).cast("long").as("n_docs"),
          F.explode(F.expr(
            "transform(ids, (x, i) -> IF(i = 0, x, x - element_at(ids, i)))"))
            .as("v"))
      val costs = vals
        .withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(14))))
        .groupBy("token", "k")
        .agg(F.max("n_docs").as("n_docs"),
          F.sum(F.expr("shiftright(v, cast(k as int)) + 1 + k"))
            .cast("long").as("bits"))
      costs
        .withColumn("rn", F.row_number().over(
          Window.partitionBy("token")
            .orderBy(F.col("bits"), F.col("k"))))
        .filter(F.col("rn") === 1)
        .select(F.col("token"), F.col("n_docs"),
          F.col("k").cast("long").as("best_k"), F.col("bits"),
          F.expr("(bits + 7) div 8").as("bytes"))
        .orderBy("token")
    }),

    // BM25 top-50 for the fixed query {spark, merge, vector}. df per term
    // and avgdl are one-row aggregates (cross-joined, i.e. broadcast);
    // scoring is a narrow projection; final rank is a 50-row top-k.
    "llm_bm25" -> ((s, dir) => {
      val d = docs(s, dir)
        .select(F.col("doc_id"), F.col("w"),
          F.size(F.col("w")).cast("long").as("dl"))
      val stats = d.agg(
        F.count(F.lit(1)).as("n_corpus"),
        F.sum("dl").as("sum_dl"),
        F.sum(F.when(F.array_contains(F.col("w"), "spark"), 1L).otherwise(0L)).as("df_spark"),
        F.sum(F.when(F.array_contains(F.col("w"), "merge"), 1L).otherwise(0L)).as("df_merge"),
        F.sum(F.when(F.array_contains(F.col("w"), "vector"), 1L).otherwise(0L)).as("df_vector"))
      def tf(term: String) =
        F.expr(s"cast(size(filter(w, x -> x = '$term')) as double)")
      // rational idf and the standard tf saturation, in fixed op order
      def idf(df: Column) =
        (F.col("n_corpus").cast("double") - df.cast("double") + F.lit(0.5)) /
          (df.cast("double") + F.lit(0.5))
      def part(term: String, df: Column) = {
        val t = tf(term)
        idf(df) * (t * F.lit(2.2)) /
          (t + F.lit(1.2) * (F.lit(0.25) +
            F.lit(0.75) * F.col("dl").cast("double") /
              (F.col("sum_dl").cast("double") / F.col("n_corpus").cast("double"))))
      }
      d.crossJoin(F.broadcast(stats))
        .withColumn("score_u", F.floor(F.lit(1000000.0) *
          (part("spark", F.col("df_spark")) +
            part("merge", F.col("df_merge")) +
            part("vector", F.col("df_vector")))).cast("long"))
        .select("doc_id", "dl", "score_u")
        .orderBy(F.col("score_u").desc, F.col("doc_id"))
        .limit(50)
    })
  )

  val oracles: Map[String, String] = Map(
    "llm_inverted_index" ->
      """WITH pairs AS (
           SELECT DISTINCT doc_id, t.w AS token
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM documents) t(doc_id, w)
           WHERE length(t.w) >= 3)
         SELECT token, doc_id // 100 AS block_id,
                CAST(count(*) AS BIGINT) AS n_docs,
                md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
                  AS postings_hash
         FROM pairs GROUP BY token, block_id
         ORDER BY token, block_id""",
    // same gap stream via lag(), same Rice cost sum, same
    // row_number-over-(bits, k) argmin as the FLAC oracle
    "llm_postings_rice" ->
      """WITH pairs AS (
           SELECT DISTINCT doc_id, t.w AS token
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM documents) t(doc_id, w)
           WHERE length(t.w) >= 3),
         sized AS (
           SELECT token, count(*) AS n_docs FROM pairs
           GROUP BY token HAVING count(*) >= 2),
         vals AS (
           SELECT p.token, s.n_docs,
                  coalesce(p.doc_id - lag(p.doc_id) OVER (
                    PARTITION BY p.token ORDER BY p.doc_id),
                    p.doc_id) AS v
           FROM pairs p JOIN sized s ON p.token = s.token),
         costs AS (
           SELECT token, k, max(n_docs) AS n_docs,
                  CAST(sum((v >> CAST(k AS INT)) + 1 + k) AS BIGINT)
                    AS bits
           FROM vals, (SELECT unnest(generate_series(0, 14)) AS k) ks
           GROUP BY token, k),
         best AS (
           SELECT token, n_docs, k, bits,
                  row_number() OVER (PARTITION BY token
                                     ORDER BY bits, k) AS rn
           FROM costs)
         SELECT token, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(k AS BIGINT) AS best_k, bits,
                (bits + 7) // 8 AS bytes
         FROM best WHERE rn = 1 ORDER BY token""",
    "llm_bm25" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS w,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
           FROM documents),
         stats AS (
           SELECT CAST(count(*) AS BIGINT) AS n_corpus,
                  CAST(sum(dl) AS BIGINT) AS sum_dl,
                  CAST(sum(CASE WHEN list_contains(w, 'spark') THEN 1 ELSE 0 END) AS BIGINT) AS df_spark,
                  CAST(sum(CASE WHEN list_contains(w, 'merge') THEN 1 ELSE 0 END) AS BIGINT) AS df_merge,
                  CAST(sum(CASE WHEN list_contains(w, 'vector') THEN 1 ELSE 0 END) AS BIGINT) AS df_vector
           FROM d)
         SELECT doc_id, dl,
                CAST(floor(1000000.0 * (
                  ((CAST(n_corpus AS DOUBLE) - CAST(df_spark AS DOUBLE) + 0.5) / (CAST(df_spark AS DOUBLE) + 0.5))
                    * (CAST(len(list_filter(w, x -> x = 'spark')) AS DOUBLE) * 2.2)
                    / (CAST(len(list_filter(w, x -> x = 'spark')) AS DOUBLE)
                       + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_corpus AS DOUBLE))))
                + ((CAST(n_corpus AS DOUBLE) - CAST(df_merge AS DOUBLE) + 0.5) / (CAST(df_merge AS DOUBLE) + 0.5))
                    * (CAST(len(list_filter(w, x -> x = 'merge')) AS DOUBLE) * 2.2)
                    / (CAST(len(list_filter(w, x -> x = 'merge')) AS DOUBLE)
                       + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_corpus AS DOUBLE))))
                + ((CAST(n_corpus AS DOUBLE) - CAST(df_vector AS DOUBLE) + 0.5) / (CAST(df_vector AS DOUBLE) + 0.5))
                    * (CAST(len(list_filter(w, x -> x = 'vector')) AS DOUBLE) * 2.2)
                    / (CAST(len(list_filter(w, x -> x = 'vector')) AS DOUBLE)
                       + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_corpus AS DOUBLE))))
                )) AS BIGINT) AS score_u
         FROM d, stats
         ORDER BY score_u DESC, doc_id LIMIT 50"""
  )
}
