package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Byte-pair-encoding tokenizer: TRAIN merges on the corpus vocabulary,
  * then ENCODE documents with the learned merge table — the core
  * token-counting primitive of an LLM data pipeline, built as a real
  * (small-K) BPE rather than the regex approximation in LlmText.
  *
  * Semantics (identical in the Scala kernel and the DuckDB oracle):
  *  - a word's initial symbols are its characters;
  *  - one training step counts adjacent symbol pairs weighted by word
  *    frequency, picks the most frequent pair (ties → lexicographically
  *    smallest (lhs, rhs)), and merges it GREEDILY LEFT-TO-RIGHT in every
  *    word (in a run of overlapping matches — only possible when
  *    lhs == rhs — the 1st, 3rd, … are merged, exactly what the
  *    sequential scan does);
  *  - encoding applies the K learned merges in rank order.
  *
  * The oracle cannot run a sequential scan, so it re-expresses greedy
  * merging as gaps-and-islands: mark matching positions, group maximal
  * runs of consecutive matches, keep even offsets within each run. The
  * Scala kernel is the plain scan; the gates prove the two agree on the
  * whole corpus.
  *
  * Scale posture (100 TB): pair counting and merging run on the DISTINCT
  * word vocabulary with frequencies (Zipf: orders of magnitude smaller
  * than the corpus), one shuffle per step to re-aggregate pairs; the
  * merge decision is a single-row driver fetch per step (the same
  * bounded-scalar pattern as the k-means loop). Encoding touches each
  * corpus document only to split words, then joins per-word token counts
  * from the tokenized vocabulary — at production scale that vocab join is
  * a broadcast, and the expensive per-word merge work is never repeated
  * per occurrence. Each loop step is localCheckpoint'd (iterative-loop
  * rule).
  */
object LlmBpe extends Catalog {

  /** Number of learned merges. Small so the oracle's unrolled-CTE chain
    * stays readable; the Scala side takes any K.
    */
  val K = 3

  /** One greedy left-to-right merge pass of (l, r) → l+r. */
  def mergePair(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** The corpus vocabulary as (cnt, syms): distinct words with
    * frequencies, each split into single-character symbols.
    */
  private def vocab(s: SparkSession, dir: String): DataFrame =
    Catalog.load(s, dir, "documents")
      .select(F.explode(F.split(F.col("text"), " ")).as("w"))
      .filter(F.length(F.col("w")) > 0)
      .groupBy("w").agg(F.count(F.lit(1)).as("cnt"))
      .select(F.col("cnt"),
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms"))

  /** Train K merges; returns (rank, lhs, rhs, pair_count). The argmax is
    * a bounded single-row driver fetch per step; the vocabulary is
    * re-checkpointed between steps so the plan stays flat.
    */
  def train(s: SparkSession, dir: String, k: Int = K): Seq[(Int, String, String, Long)] = {
    import s.implicits._
    var cur = vocab(s, dir).as[(Long, Seq[String])].toDF("cnt", "syms")
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 1
    while (rank <= k) {
      // length-1 words have no pairs; sequence(0, -1) would count DOWN
      val pairs = cur.filter(F.size(F.col("syms")) >= 2)
        .select(F.col("cnt"), F.explode(F.expr(
          "transform(sequence(0, size(syms)-2)," +
            " i -> struct(syms[i] as lhs, syms[i+1] as rhs))")).as("p"))
        .groupBy("p.lhs", "p.rhs").agg(F.sum("cnt").as("pc"))
      val best = pairs
        .orderBy(F.col("pc").desc, F.col("lhs"), F.col("rhs")).limit(1)
        .collect()
      require(best.nonEmpty, "vocabulary exhausted before K merges")
      val (l, r, pc) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += ((rank, l, r, pc))
      cur = cur.as[(Long, Seq[String])]
        .map { case (cnt, syms) => (cnt, mergePair(syms.toArray, l, r).toSeq) }
        .toDF("cnt", "syms")
        .localCheckpoint()
      rank += 1
    }
    merges.toSeq
  }

  val queries: Map[String, Q] = Map(

    // The learned merge table itself: rank, pair, corpus pair count. The
    // oracle re-runs the whole training loop as unrolled CTE steps and
    // must land on the identical merges AND counts — any drift in pair
    // counting, tie-breaking, or the greedy merge semantics shows here.
    "llm_bpe_train" -> ((s, dir) => {
      import s.implicits._
      train(s, dir).toDF("rank", "lhs", "rhs", "pair_count")
        .select(F.col("rank"), F.col("lhs"), F.col("rhs"), F.col("pair_count"))
        .orderBy("rank")
    }),

    // Encode the corpus with the learned merges: per-document initial
    // symbol count vs post-BPE token count. The per-word tokenization
    // runs ONCE on the distinct vocabulary and joins back to documents —
    // the 100 TB plan (vocab broadcast, no per-occurrence merge work).
    "llm_bpe_encode" -> ((s, dir) => {
      import s.implicits._
      val merges = train(s, dir)
      val docs = Catalog.load(s, dir, "documents")
      val words = docs
        .select(F.col("doc_id"), F.explode(F.split(F.col("text"), " ")).as("w"))
        .filter(F.length(F.col("w")) > 0)
      val tokenized = words.select("w").distinct().as[String]
        .map { w =>
          var syms = Array.tabulate(w.length)(i => w.substring(i, i + 1))
          merges.foreach { case (_, l, r, _) => syms = mergePair(syms, l, r) }
          (w, syms.length.toLong)
        }
        .toDF("w", "n_tok")
      words.join(F.broadcast(tokenized), Seq("w"))
        .groupBy("doc_id")
        .agg(F.sum(F.length(F.col("w")).cast("long")).as("n_syms"),
          F.sum("n_tok").as("n_tokens"))
        .orderBy("doc_id")
    })
  )

  /** One unrolled training step: s$prev → best$k + s$k. The greedy merge
    * as SQL — pair marks via lead(), maximal runs of consecutive matches
    * via the i − row_number() gaps-and-islands key, even offsets within
    * each run selected, consumed right-symbols dropped, positions
    * renumbered dense.
    */
  private def stepSql(k: Int): String = {
    val prev = s"s${k - 1}"
    s"""p$k AS (
          SELECT w, cnt, i, s AS l,
                 lead(s) OVER (PARTITION BY w ORDER BY i) AS r
          FROM $prev),
        pc$k AS (
          SELECT l, r, CAST(sum(cnt) AS BIGINT) AS pc
          FROM p$k WHERE r IS NOT NULL GROUP BY l, r),
        best$k AS (SELECT l, r, pc FROM pc$k ORDER BY pc DESC, l, r LIMIT 1),
        m$k AS (
          SELECT p.w, p.cnt, p.i, p.l, p.r,
                 CASE WHEN p.l = (SELECT l FROM best$k)
                       AND p.r IS NOT NULL
                       AND p.r = (SELECT r FROM best$k)
                      THEN 1 ELSE 0 END AS mt
          FROM p$k p),
        r$k AS (
          SELECT w, i,
                 i - row_number() OVER (PARTITION BY w ORDER BY i) AS grp
          FROM m$k WHERE mt = 1),
        sel$k AS (
          SELECT w, i FROM (
            SELECT w, i, min(i) OVER (PARTITION BY w, grp) AS rs
            FROM r$k) t
          WHERE (i - rs) % 2 = 0),
        n$k AS (
          SELECT m.w, m.cnt, m.i,
                 CASE WHEN sel.i IS NOT NULL THEN m.l || m.r ELSE m.l END AS s,
                 CASE WHEN selp.i IS NOT NULL THEN 1 ELSE 0 END AS dropped
          FROM m$k m
          LEFT JOIN sel$k sel ON m.w = sel.w AND m.i = sel.i
          LEFT JOIN sel$k selp ON m.w = selp.w AND m.i = selp.i + 1),
        s$k AS (
          SELECT w, cnt, row_number() OVER (PARTITION BY w ORDER BY i) AS i, s
          FROM n$k WHERE dropped = 0)"""
  }

  /** Shared training prefix: vocabulary + initial symbol rows + K steps. */
  private def trainSql: String =
    s"""WITH w0 AS (
          SELECT w, CAST(count(*) AS BIGINT) AS cnt
          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
          WHERE length(w) > 0 GROUP BY w),
        s0 AS (
          SELECT w, cnt, t.i AS i, substring(w, CAST(t.i AS INT), 1) AS s
          FROM w0, unnest(generate_series(1, length(w))) t(i)),
        """ + (1 to K).map(stepSql).mkString(",\n        ")

  val oracles: Map[String, String] = Map(
    "llm_bpe_train" -> (trainSql + s"""
        SELECT * FROM (
          ${(1 to K).map(k =>
            s"SELECT CAST($k AS INT) AS rank, l AS lhs, r AS rhs, pc AS pair_count FROM best$k")
            .mkString("\n          UNION ALL ")}) u
        ORDER BY rank"""),
    "llm_bpe_encode" -> (trainSql + s"""
        ,
        tok AS (SELECT w, CAST(count(*) AS BIGINT) AS n_tok FROM s$K GROUP BY w),
        dw AS (
          SELECT doc_id, w FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents) t
          WHERE length(w) > 0)
        SELECT dw.doc_id,
               CAST(sum(length(dw.w)) AS BIGINT) AS n_syms,
               CAST(sum(tok.n_tok) AS BIGINT) AS n_tokens
        FROM dw JOIN tok ON dw.w = tok.w
        GROUP BY dw.doc_id ORDER BY dw.doc_id""")
  )
}
