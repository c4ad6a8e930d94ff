package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

import graft.functions.BloomFilters

/** Corpus-ingest curation gates: PII redaction, fixed-quota domain
  * mixing, and incremental (new-batch vs corpus) deduplication.
  *
  * These are the operations that run at the FRONT of a training-data
  * pipeline, where the input is largest — each is a narrow map or a
  * prefiltered join, never a corpus-wide shuffle:
  * - redaction is a per-row regex map (codegen'd, no shuffle);
  * - quota mixing shuffles once on the low-cardinality domain key;
  * - incremental dedup broadcasts a kilobyte bloom of corpus hashes and
  *   only the ~duplicate slice of the new batch reaches the exact join.
  *
  * Determinism: regex patterns use the Java∩RE2 common subset (char
  * classes, `+`, bounded repeats — no backrefs/lookaround, which RE2
  * lacks); ranking keys are md5-based (CLAUDE.md hash rules) with doc_id
  * tie-breaks.
  */
object LlmIngest extends Catalog {

  private val emailPat = "[a-z0-9]+@[a-z]+\\.[a-z]+"
  private val phonePat = "555-[0-9]{4}"

  val queries: Map[String, Q] = Map(

    // PII redaction: detect + mask emails and phone-like tokens in one
    // per-row pass. The testdata is synthetic prose with no real PII, so
    // deterministic PII is APPENDED first (doc_id-derived address and
    // number) — the redaction pipeline itself is exactly what would run
    // on real text. Counts survive as audit columns; the masked text is
    // hash-compared (engines agree byte-for-byte or the md5 differs).
    "llm_pii_redact" -> ((s, dir) =>
      table(s, dir, "documents")
        .withColumn("aug", F.concat(F.col("text"),
          F.lit(" contact user"), F.col("doc_id").cast("string"),
          F.lit("@mail.example or call 555-"),
          F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")))
        .select(F.col("doc_id"),
          F.regexp_count(F.col("aug"), F.lit(emailPat)).as("n_email"),
          F.regexp_count(F.col("aug"), F.lit(phonePat)).as("n_phone"),
          F.md5(F.regexp_replace(
            F.regexp_replace(F.col("aug"), emailPat, "<EMAIL>"),
            phonePat, "<PHONE>")).as("redacted_md5"))
        .orderBy("doc_id")),

    // Fixed-quota domain mixture: every source contributes at most its
    // quota, chosen by a seeded content-hash rank (reproducible, no RNG).
    // Differs from llm_sample (per-stratum FRACTION via hash threshold):
    // quotas give exact per-domain budgets, the knob real data-mixing
    // recipes specify. One shuffle on the 20-value domain key; the window
    // is per-domain rank, spilled by Spark if a domain is huge (at real
    // scale pre-aggregate a per-domain count and hash-bucket within the
    // domain instead of a single global window per key).
    "llm_mixture" -> ((s, dir) => {
      val w = Window.partitionBy("source")
        .orderBy(F.md5(F.concat(F.lit("mx:"), F.col("text"))), F.col("doc_id"))
      table(s, dir, "documents")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.when(F.col("source") === "src0", 15)
          .when(F.col("source") === "src1", 10).otherwise(5))
        .select("doc_id", "source", "rk")
        .orderBy("doc_id")
    }),

    // Incremental dedup: which new-batch docs already exist in the
    // corpus? (Parity of doc_id stands in for corpus/batch membership so
    // the gate is scale-invariant; the dup key is a 60-char prefix
    // fingerprint — whole-text md5 finds nothing in this testdata, whose
    // duplicates are near-dups sharing long prefixes.) A bloom over the
    // corpus fingerprints is broadcast as a literal; new-batch rows
    // failing the probe are PROVABLY novel (blooms have no false
    // negatives) and skip the join entirely — only the ≤fpp candidate
    // slice is shuffled for the exact semi-join confirm. At 100 TB:
    // kilobytes broadcast vs re-shuffling the whole corpus every ingest
    // tick.
    // Temperature-scaled mixture sampling (T=2, the multilingual-training
    // rebalancing op): source s keeps documents with probability
    // ∝ n_s^(1/T - 1) = 1/sqrt(n_s), normalized so the smallest source
    // keeps everything — big sources are downsampled toward a flatter
    // mix. The keep decision is a seeded md5-uniform against an integer
    // threshold floor(2^32·sqrt(n_min)/sqrt(n_s)): sqrt, *, / are
    // correctly-rounded IEEE ops, so both engines compute the identical
    // threshold (pow() with arbitrary exponents is libm, NOT
    // cross-engine reproducible — hence T=2 specifically). Source counts
    // are a 20-row broadcast; the corpus-side pass is narrow.
    "llm_mixture_temp" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val counts = d.groupBy("source").agg(F.count(F.lit(1)).as("n_s"))
      val minN = counts.agg(F.min("n_s").as("n_min"))
      val thr = counts.crossJoin(F.broadcast(minN))
        .withColumn("thr", F.floor(F.lit(4294967296.0) *
          F.sqrt(F.col("n_min").cast("double")) /
          F.sqrt(F.col("n_s").cast("double"))).cast("long"))
      val u = F.conv(F.substring(F.md5(F.concat(F.lit("ts:"), F.col("text"))), 1, 8), 16, 10)
        .cast("long")
      d.join(F.broadcast(thr), Seq("source"))
        .withColumn("kept", (u < F.col("thr")).cast("int"))
        .groupBy("source")
        .agg(F.max("n_s").as("n_s"), F.max("thr").as("thr"),
          F.sum("kept").as("n_kept"))
        .orderBy("source")
    }),

    // k-anonymity suppression over quasi-identifiers (source, lang,
    // length bucket): any QI combination carried by fewer than k=5
    // documents is generalized to '*'/-1 before release — the standard
    // privacy gate before training-data publication. One window count
    // over the (bounded-cardinality) QI key; the document body is never
    // shuffled, only the QI columns.
    "llm_kanon" -> ((s, dir) => {
      val qi = Seq(F.col("source"), F.col("lang"),
        F.expr("n_chars DIV 200").cast("int").as("len_bucket"))
      val w = Window.partitionBy("source", "lang", "len_bucket")
      table(s, dir, "documents")
        .select((F.col("doc_id") +: qi): _*)
        .withColumn("grp_n", F.count(F.lit(1)).over(w))
        .select(F.col("doc_id"),
          F.when(F.col("grp_n") >= 5, F.col("source")).otherwise("*").as("g_source"),
          F.when(F.col("grp_n") >= 5, F.col("lang")).otherwise("*").as("g_lang"),
          F.when(F.col("grp_n") >= 5, F.col("len_bucket")).otherwise(-1).as("g_bucket"),
          F.col("grp_n"))
        .orderBy("doc_id")
    }),

    // PERSISTED-index incremental dedup — the real nightly-ingest loop:
    // day-1 builds an index (exact md5 keys AND a bloom sketch) and writes
    // BOTH through the engine's own sink; the day-2 job loads them from
    // disk, routes most rows past the join via the broadcast sketch
    // (definitely-new short circuit) and exact-confirms only bloom
    // positives; it then publishes index v2, which the day-3 job dedups
    // against. At 100 TB the index is keys-only (16-byte md5s, not
    // bodies), the sketch is a single broadcastable blob rebuilt never —
    // each nightly run reads yesterday's artifacts instead of rescanning
    // the corpus.
    "llm_dedup_persistent" -> ((s, dir) => {
      import s.implicits._
      val idx1Dir = tempDir("graft_idx_day1")
      val idx2Dir = tempDir("graft_idx_day2")
      val sketchDir = tempDir("graft_idx_sketch")
      val d = table(s, dir, "documents")
        .withColumn("h", F.md5(F.substring(F.col("text"), 1, 60)))
      val day = F.pmod(F.col("doc_id"), F.lit(3))
      // day-1 job: persist the exact-key index and its bloom sketch
      d.filter(day === 0).select("h").distinct()
        .write.format("graft-avro").mode("overwrite").save(idx1Dir)
      val bloomDay1 = s.read.format("graft-avro").load(idx1Dir)
        .agg(BloomFilters.bloomAgg(s, F.col("h"), 1000000L, 1L << 23))
        .head().getAs[Array[Byte]](0)
      Seq(Tuple1(bloomDay1)).toDF("sketch")
        .write.format("graft-avro").mode("overwrite").save(sketchDir)
      // day-2 job: everything below reads the SAVED artifacts, not day-1
      // state — the sketch round-trips as avro binary
      val sketch = s.read.format("graft-avro").load(sketchDir)
        .head().getAs[Array[Byte]](0)
      val idx1 = s.read.format("graft-avro").load(idx1Dir)
      val day2 = d.filter(day === 1)
      val surv2 = day2
        .filter(!BloomFilters.mightContain(s, sketch, F.col("h")))
        .unionByName(day2
          .filter(BloomFilters.mightContain(s, sketch, F.col("h")))
          .join(idx1, Seq("h"), "left_anti"))
      idx1.unionByName(day2.select("h")).distinct()
        .write.format("graft-avro").mode("overwrite").save(idx2Dir)
      // day-3 job against the published v2 index
      val surv3 = d.filter(day === 2)
        .join(s.read.format("graft-avro").load(idx2Dir), Seq("h"), "left_anti")
      surv2.select(F.lit(2).as("day"), F.col("doc_id"), F.col("source"))
        .unionByName(
          surv3.select(F.lit(3).as("day"), F.col("doc_id"), F.col("source")))
        .orderBy("doc_id")
    }),

    "llm_dedup_incremental" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .withColumn("h", F.md5(F.substring(F.col("text"), 1, 60)))
      val corpus = d.filter(F.col("doc_id") % 2 === 0).select("h")
      val bloom = corpus
        .agg(BloomFilters.bloomAgg(s, F.col("h"), 1000000L, 1L << 23))
        .head().getAs[Array[Byte]](0)
      d.filter(F.col("doc_id") % 2 === 1)
        .filter(BloomFilters.mightContain(s, bloom, F.col("h")))
        .join(corpus, Seq("h"), "left_semi")
        .select("doc_id", "source")
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "llm_pii_redact" ->
      """WITH aug AS (
           SELECT doc_id,
                  text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@mail.example or call 555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
           FROM documents)
         SELECT doc_id,
                CAST(len(regexp_extract_all(aug, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS INT) AS n_email,
                CAST(len(regexp_extract_all(aug, '555-[0-9]{4}')) AS INT) AS n_phone,
                md5(regexp_replace(regexp_replace(aug,
                  '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
                  '555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
         FROM aug ORDER BY doc_id""",
    "llm_mixture" ->
      """WITH ranked AS (
           SELECT doc_id, source,
                  CAST(row_number() OVER (PARTITION BY source
                    ORDER BY md5('mx:' || text), doc_id) AS INT) AS rk
           FROM documents)
         SELECT doc_id, source, rk FROM ranked
         WHERE rk <= CASE WHEN source = 'src0' THEN 15
                          WHEN source = 'src1' THEN 10 ELSE 5 END
         ORDER BY doc_id""",
    "llm_mixture_temp" ->
      """WITH c AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_s
           FROM documents GROUP BY source),
         m AS (SELECT min(n_s) AS n_min FROM c),
         t AS (
           SELECT source, n_s,
                  CAST(floor(4294967296.0 * sqrt(CAST(n_min AS DOUBLE))
                       / sqrt(CAST(n_s AS DOUBLE))) AS BIGINT) AS thr
           FROM c, m)
         SELECT d.source, max(t.n_s) AS n_s, max(t.thr) AS thr,
                CAST(sum(CASE WHEN CAST('0x' || substring(
                       md5('ts:' || d.text), 1, 8) AS BIGINT) < t.thr
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         FROM documents d JOIN t ON d.source = t.source
         GROUP BY d.source ORDER BY d.source""",
    "llm_kanon" ->
      """WITH q AS (
           SELECT doc_id, source, lang,
                  CAST(n_chars // 200 AS INT) AS len_bucket,
                  count(*) OVER (PARTITION BY source, lang, n_chars // 200)
                    AS grp_n
           FROM documents)
         SELECT doc_id,
                CASE WHEN grp_n >= 5 THEN source ELSE '*' END AS g_source,
                CASE WHEN grp_n >= 5 THEN lang ELSE '*' END AS g_lang,
                CASE WHEN grp_n >= 5 THEN len_bucket ELSE -1 END AS g_bucket,
                CAST(grp_n AS BIGINT) AS grp_n
         FROM q ORDER BY doc_id""",
    "llm_dedup_persistent" ->
      """WITH k AS (
           SELECT doc_id, source, md5(substring(text, 1, 60)) AS h,
                  doc_id % 3 AS day
           FROM documents),
         i1 AS (SELECT DISTINCT h FROM k WHERE day = 0),
         i2 AS (SELECT DISTINCT h FROM k WHERE day <= 1)
         SELECT * FROM (
           SELECT 2 AS day, doc_id, source FROM k
           WHERE day = 1 AND h NOT IN (SELECT h FROM i1)
           UNION ALL
           SELECT 3 AS day, doc_id, source FROM k
           WHERE day = 2 AND h NOT IN (SELECT h FROM i2))
         ORDER BY doc_id""",
    "llm_dedup_incremental" ->
      """SELECT doc_id, source FROM documents
         WHERE doc_id % 2 = 1
           AND md5(substring(text, 1, 60)) IN
             (SELECT md5(substring(text, 1, 60)) FROM documents
              WHERE doc_id % 2 = 0)
         ORDER BY doc_id"""
  )
}
