package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** LLM-training-data text operators over the `documents` table
  * (SURVEY.md §2.4): exact deduplication, quality statistics, token
  * counting, language identification, and document fingerprinting.
  *
  * Cross-engine determinism: every hash is `md5` (identical hex in Spark
  * and DuckDB), every ratio is integer-derived double division (bit-exact
  * in both engines), and every DuckDB integer aggregate is cast back to
  * BIGINT to match Spark's LongType (DuckDB sums widen to HUGEINT).
  *
  * Scale notes (100 TB): all per-document stats are narrow projections over
  * higher-order functions — no explode/shuffle in llm_text_stats,
  * llm_token_stats, or llm_fingerprint, so they stream through
  * WholeStageCodegen at scan speed. llm_dedup_exact shuffles once on the
  * 16-byte content hash (not the document body). llm_langid builds a
  * vocabulary-bounded profile (distinct words × languages) that is
  * broadcast back against the corpus — the big side is never shuffled.
  */
object LlmText extends Catalog {

  /** documents with the split word array attached (single-space corpus).
    *
    * The testdata ships one single-row-group parquet file per table, so a
    * plain scan is ONE input split — per-row hashing downstream would run
    * single-threaded. The explicit repartition (tiny shuffle: the corpus
    * slice is <1 MB here) restores full-core parallelism; on real
    * many-file/many-row-group inputs Spark creates the splits itself and
    * this is a no-op-sized exchange.
    */
  private def docs(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("w", F.split(F.col("text"), " "))

  /** (doc_id → rep_m): floor-scaled top-bigram share — the repetition
    * signal shared by llm_repetition (reported raw, with counts) and
    * llm_quality_filter (thresholded); one definition so the reported
    * signal and the keep/drop decision can never drift apart.
    */
  private def repM(d: DataFrame): DataFrame =
    d.filter(F.size(F.col("w")) >= 2)
      .select(F.col("doc_id"),
        F.explode(F.expr(
          "transform(sequence(1, size(w)-1), i -> concat_ws(' ', slice(w, i, 2)))"))
          .as("b"))
      .groupBy("doc_id", "b").agg(F.count(F.lit(1)).as("c"))
      .groupBy(F.col("doc_id").as("rid"))
      .agg(F.sum("c").as("n_bigrams"),
        F.max("c").as("top_cnt"),
        F.count(F.lit(1)).as("n_distinct"))
      .withColumn("rep_m",
        F.floor(F.lit(1000000.0) * F.col("top_cnt") / F.col("n_bigrams")))

  val queries: Map[String, Q] = Map(

    // Exact dedup: group on content hash, keep the smallest doc_id.
    // One shuffle on md5(text); at 100 TB the map side exchanges 16-byte
    // hashes + ids only, never the document bodies.
    "llm_dedup_exact" -> ((s, dir) =>
      table(s, dir, "documents")
        .groupBy(F.md5(F.col("text")).as("content_hash"))
        .agg(F.min("doc_id").as("keep_id"),
          F.count(F.lit(1)).as("n_copies"))
        .orderBy("keep_id")),

    // Unicode NFC canonicalization — the normalization pass that must
    // precede hash dedup: the same visible text arrives precomposed
    // (U+00E9) and decomposed (e + U+0301) from different crawls, and
    // without NFC the two forms hash apart. Each doc synthesizes its
    // decomposed twin (a combining acute after every vowel), the native
    // codegen nfc_normalize expression composes it back, and DuckDB's
    // nfc_normalize (the identical Unicode algorithm) re-derives length
    // shrink + post-NFC md5 — a one-codepoint disagreement anywhere in
    // the composition tables breaks every hash.
    "llm_text_nfc" -> ((s, dir) => {
      graft.functions.VectorFunctions.register(s)
      table(s, dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select(F.col("doc_id"), F.expr(
          "array_join(transform(split(text, ''), ch -> " +
            "CASE WHEN ch IN ('a','e','i','o','u') " +
            "THEN concat(ch, '\u0301') ELSE ch END), '')").as("deco"))
        .select(F.col("doc_id"),
          F.length(F.col("deco")).cast("long").as("pre_len"),
          F.expr("nfc_normalize(deco)").as("norm"))
        .select(F.col("doc_id"), F.col("pre_len"),
          F.length(F.col("norm")).cast("long").as("post_len"),
          F.md5(F.col("norm").cast("binary")).as("norm_hash"))
        .orderBy("doc_id")
    }),

    // Quality stats: everything derives from integers so the doubles are
    // bit-identical across engines. No explode — array HOFs only.
    "llm_text_stats" -> ((s, dir) =>
      docs(s, dir)
        .select(F.col("doc_id"),
          F.length(F.col("text")).as("len"),
          F.size(F.col("w")).cast("long").as("n_words"),
          F.size(F.array_distinct(F.col("w"))).cast("long").as("n_distinct"),
          F.expr("cast(size(filter(w, x -> x in ('the','a','of','and','to','in','is'))) as long)")
            .as("n_stop"))
        .select(F.col("doc_id"), F.col("len").cast("long").as("n_chars_m"),
          F.col("n_words"), F.col("n_distinct"), F.col("n_stop"),
          F.round((F.col("len") - (F.col("n_words") - 1)).cast("double") / F.col("n_words"), 4)
            .as("avg_word_len"),
          F.round(F.col("n_distinct").cast("double") / F.col("n_words"), 4).as("ttr"),
          F.round(F.col("n_stop").cast("double") / F.col("n_words"), 4).as("stop_ratio"))
        // quality as a floor-scaled integer: round() half-way semantics differ
        // between Spark (decimal string, HALF_UP) and DuckDB (binary double),
        // and weighted sums of 4-decimal inputs sit exactly on .xxxx5
        // boundaries; floor of a bit-identical double is engine-stable.
        .withColumn("quality_m",
          F.floor(F.lit(10000.0) * (F.lit(0.4) * (F.col("n_stop").cast("double") / F.col("n_words"))
            + F.lit(0.3) * (F.col("n_distinct").cast("double") / F.col("n_words"))
            + F.lit(0.3) * F.least(F.lit(1.0), F.col("n_words").cast("double") / 200.0))))
        .orderBy("doc_id")),

    // Token counting with a BPE-ish regex (letters / digits / other runs).
    "llm_token_stats" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(F.col("doc_id"),
          F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), F.lit(0)).as("toks"))
        .select(F.col("doc_id"),
          F.size(F.col("toks")).cast("long").as("n_tokens"),
          F.size(F.array_distinct(F.col("toks"))).cast("long").as("n_unique"),
          F.array_max(F.transform(F.col("toks"), x => F.length(x))).cast("long").as("longest"),
          F.array_min(F.transform(F.col("toks"), x => F.length(x))).cast("long").as("shortest"))
        .orderBy("doc_id")),

    // Language ID: word-count profile per labelled language (the "training"
    // aggregate), then classify each doc by integer dot-product of its word
    // counts with each profile. All-integer scores → exact argmax.
    "llm_langid" -> ((s, dir) => {
      val d = docs(s, dir)
      val docWords = d
        .select(F.col("doc_id"), F.col("lang"), F.explode(F.col("w")).as("word"))
        .groupBy("doc_id", "lang", "word").agg(F.count(F.lit(1)).as("cnt"))
      val profile = docWords
        .groupBy(F.col("lang").as("plang"), F.col("word"))
        .agg(F.sum("cnt").as("lcnt"))
      val scored = docWords
        .join(F.broadcast(profile), "word")
        .groupBy("doc_id", "lang", "plang")
        .agg(F.sum(F.col("cnt") * F.col("lcnt")).as("score"))
      val w = Window.partitionBy("doc_id")
        .orderBy(F.col("score").desc, F.col("plang"))
      scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") === 1)
        .select(F.col("doc_id"), F.col("plang").as("pred_lang"), F.col("score"),
          (F.col("plang") === F.col("lang")).cast("int").as("is_correct"))
        .orderBy("doc_id")
    }),

    // Deterministic stratified sampling — training-data mixing: each
    // language keeps a different fraction, decided by a seeded content
    // hash (reproducible across runs/engines, no RNG state). Narrow
    // filter, pushes nothing but touches only the rows it keeps.
    "llm_sample" -> ((s, dir) =>
      table(s, dir, "documents")
        .withColumn("h",
          F.substring(F.md5(F.concat(F.lit("s1:"), F.col("text"))), 1, 1))
        .filter(F.col("h") < F.when(F.col("lang") === "en", "8")
          .when(F.col("lang") === "de", "4").otherwise("2"))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),

    // EXACT-QUOTA stratified sampling: each stratum keeps precisely
    // ceil(10%) of its rows — rate sampling (llm_sample) hits quotas
    // only in expectation, but a token-budgeted mixture needs exact
    // allocations. Selection is the md5-least rows per stratum (seeded,
    // reproducible, no RNG) via ONE rank window per stratum — the price
    // of exactness is a shuffle by stratum key, which AQE skew-splits if
    // a language dominates; the quota `(n+9) div 10` stays in integer
    // arithmetic on both engines.
    "llm_quota_sample" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang")
        .orderBy(F.col("h").asc, F.col("doc_id").asc)
      table(s, dir, "documents")
        .withColumn("h", F.md5(F.concat(F.lit("qs:"), F.col("text"))))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_lang", F.count(F.lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("lang")))
        .filter(F.col("rn") <= F.expr("(n_lang + 9) div 10"))
        .select(F.col("doc_id"), F.col("lang"),
          F.col("rn").cast("int").as("rn"),
          F.col("n_lang").as("n_lang"))
        .orderBy("doc_id")
    }),

    // End-to-end pipeline composition: stratified sample → quality filter
    // → token-budget shard assignment → per-shard stats. One narrow
    // filtered scan feeding a windowed cumsum and a small aggregate —
    // the shape of a real corpus-preparation job.
    "llm_pipeline_e2e" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir)
        .withColumn("h",
          F.substring(F.md5(F.concat(F.lit("s1:"), F.col("text"))), 1, 1))
        .filter(F.col("h") < F.when(F.col("lang") === "en", "8")
          .when(F.col("lang") === "de", "4").otherwise("2"))
        .select(F.col("doc_id"), F.col("lang"),
          F.size(F.col("w")).cast("long").as("n_tokens"))
        .filter(F.col("n_tokens") >= 30)
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn("shard_id", F.expr("(cum - 1) DIV 1000"))
        .groupBy("lang", "shard_id")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum("n_tokens").as("shard_tokens"))
        .orderBy("lang", "shard_id")
    }),

    // Deterministic train/val/test split: content-hash bucketing (first
    // 4 md5 hex chars mod 100 → 90/5/5), so assignment is stable under
    // reprocessing, independent of row order or partitioning, and
    // reproducible from the text alone — the property a 100 TB corpus
    // needs (no global shuffle, no stored split table, leakage-proof
    // because duplicates always land in the same split). Repartition
    // first: the single-row-group testdata file would otherwise run the
    // per-row md5 pass on one core.
    "llm_split_assign" -> ((s, dir) =>
      table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("text").isNotNull)
        .withColumn("b",
          F.conv(F.substring(F.md5(F.col("text")), 1, 4), 16, 10)
            .cast("long") % 100)
        .withColumn("split",
          F.when(F.col("b") < 90, "train")
            .when(F.col("b") < 95, "val").otherwise("test"))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum(F.col("n_chars")).as("chars"))
        .orderBy("split", "lang")),

    // Vocabulary coverage: global top-50 tokens with the cumulative
    // corpus-coverage fraction. The top-k is TakeOrderedAndProject
    // (distributed bounded heaps, never a single-partition global sort
    // of the vocabulary); only the 50 survivors cross into the
    // single-row-total crossJoin and the tiny running-sum window.
    "llm_vocab_coverage" -> ((s, dir) => {
      val counts = docs(s, dir)
        .select(F.explode(F.col("w")).as("tok"))
        .filter(F.col("tok") =!= "")
        .groupBy("tok").agg(F.count(F.lit(1)).as("n"))
      val total = counts.agg(F.sum("n").as("tot"))
      val w50 = Window.orderBy(F.col("n").desc, F.col("tok"))
      counts.orderBy(F.col("n").desc, F.col("tok")).limit(50)
        .crossJoin(F.broadcast(total))
        .withColumn("rk", F.row_number().over(w50))
        .withColumn("cov_m", F.floor(F.lit(1000000.0) *
          F.sum("n").over(
            w50.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          / F.col("tot")))
        .select("rk", "tok", "n", "cov_m")
        .orderBy("rk")
    }),

    // Rarity scoring: per-document sum of integer inverse document
    // frequency over DISTINCT words — the log-free surprisal proxy that
    // flags boilerplate (low rarity) vs specialist text (high). idf_m =
    // (1e6·N) intdiv df is exact integer arithmetic (positive operands,
    // so Spark div ≡ DuckDB //); the df table shuffles once on word with
    // partial aggregation, the one-row corpus count broadcasts.
    "llm_rarity" -> ((s, dir) => {
      val d = docs(s, dir)
      val dw = d.select(F.col("doc_id"),
        F.explode(F.array_distinct(F.col("w"))).as("word"))
        .filter(F.col("word") =!= "")
      val dfreq = dw.groupBy("word").agg(F.count(F.lit(1)).as("df"))
      val nd = d.agg(F.count(F.lit(1)).as("nd"))
      dw.join(dfreq, "word").crossJoin(F.broadcast(nd))
        .withColumn("idf_m", F.expr("(1000000 * nd) div df"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).as("n_distinct"),
          F.sum("idf_m").as("rarity_m"))
        .orderBy("doc_id")
    }),

    // Corpus term statistics — the integer core of TF-IDF/BM25 scoring
    // (kept log-free: both engines' ln need not be bit-identical, and the
    // downstream scorer can apply its own weighting). Two partial-agg
    // shuffles: (doc, word) then word — both keyed on vocabulary-bounded
    // values.
    "llm_tfdf" -> ((s, dir) =>
      docs(s, dir)
        .select(F.col("doc_id"), F.explode(F.col("w")).as("word"))
        .groupBy("doc_id", "word").agg(F.count(F.lit(1)).as("tf"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).as("df"),
          F.sum("tf").as("total_tf"),
          F.max("tf").as("max_tf"))
        .orderBy("word")),

    // Shard packing: assign docs to fixed token-budget training shards per
    // language — running token total (windowed cumsum, one shuffle on the
    // partition key) divided by the budget. Deterministic by (lang,
    // doc_id) order.
    "llm_shard_pack" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir)
        .select(F.col("doc_id"), F.col("lang"),
          F.size(F.col("w")).cast("long").as("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("shard_id", F.expr("(cum_tokens - 1) DIV 2000"))
        .orderBy("lang", "doc_id")
    }),

    // PARAGRAPH-LEVEL exact dedup (the C4/RefinedWeb sub-document pass):
    // explode docs into fixed 10-word paragraphs, keep each distinct
    // paragraph ONLY at its corpus-wide first occurrence ((doc_id, idx)
    // order), and reassemble what survives per document. One shuffle on
    // the paragraph text (the dedup key), deterministic reassembly via
    // sort_array over (idx, para) structs — collect_list alone is
    // arrival-ordered and would break the hash.
    "llm_paragraph_dedup" -> ((s, dir) => {
      val paras = docs(s, dir)
        .select(F.col("doc_id"),
          F.posexplode(F.expr(
            "transform(sequence(0, (size(w)-1) div 10), i -> " +
              "concat_ws(' ', slice(w, i*10 + 1, 10)))")))
        .select(F.col("doc_id"), F.col("pos").as("para_idx"),
          F.col("col").as("para"))
      val w = Window.partitionBy("para").orderBy("doc_id", "para_idx")
      paras.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") === 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).as("n_kept"),
          F.sort_array(F.collect_list(F.struct(
            F.col("para_idx"), F.col("para")))).as("ps"))
        .select(F.col("doc_id"), F.col("n_kept"),
          F.md5(F.concat_ws(" ",
            F.expr("transform(ps, x -> x.para)"))).as("kept_hash"))
        .orderBy("doc_id")
    }),

    // Curriculum ordering: the training-order op — rank docs easiest-
    // first (longer docs ≈ harder here; any integer difficulty signal
    // slots in) WITHIN each language, then interleave languages
    // round-robin by rank so every training window sees a language mix.
    // No global row_number funnel: (rank, lang) IS the curriculum
    // position; per-lang ranking is one partitioned window shuffle.
    "llm_curriculum" -> ((s, dir) => {
      val w = Window.partitionBy("lang")
        .orderBy(F.col("n_words"), F.col("doc_id"))
      docs(s, dir)
        .select(F.col("doc_id"), F.col("lang"),
          F.size(F.col("w")).cast("long").as("n_words"))
        .withColumn("rank", F.row_number().over(w))
        .orderBy("rank", "lang", "doc_id")
    }),

    // Context chunking: split each document into fixed 50-word windows
    // (the training-sequence prep step). Narrow explode; chunk count is
    // derived per row, no shuffle before the oracle ORDER BY.
    "llm_chunks" -> ((s, dir) =>
      docs(s, dir)
        .select(F.col("doc_id"), F.col("w"),
          F.expr("transform(sequence(0, (size(w)-1) div 50), i -> " +
            "concat_ws(' ', slice(w, i*50 + 1, 50)))").as("chunks"))
        .select(F.col("doc_id"), F.posexplode(F.col("chunks")))
        .select(F.col("doc_id"), F.col("pos").as("chunk_idx"),
          F.length(F.col("col")).cast("long").as("chunk_chars"),
          F.md5(F.col("col")).as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")),

    // Composite quality FILTER (the operational Gopher/C4-style keep/drop
    // decision): length, stopword-density, and repetition rules evaluated
    // in order with the first failing rule reported. Every rule compares
    // exact integers (word counts, 20·n_stop vs n_words, floor-scaled
    // repetition) so the decision is engine-stable. The repetition signal
    // is the only shuffling input; the rule cascade itself is a narrow
    // projection.
    "llm_quality_filter" -> ((s, dir) => {
      val d = docs(s, dir)
      val st = d.select(F.col("doc_id"),
        F.size(F.col("w")).cast("long").as("n_words"),
        F.expr("cast(size(filter(w, x -> x in ('the','a','of','and','to','in','is'))) as long)")
          .as("n_stop"))
      val rep = repM(d).select("rid", "rep_m")
      st.join(rep, st("doc_id") === F.col("rid"), "left")
        .select(F.col("doc_id"), F.col("n_words"), F.col("n_stop"),
          F.coalesce(F.col("rep_m"), F.lit(0L)).as("rep_m"))
        .withColumn("reason",
          F.when(F.col("n_words") < 40, "too_short")
            .when(F.lit(20) * F.col("n_stop") < F.col("n_words"), "low_stopwords")
            .when(F.col("rep_m") > 60000, "repetitive")
            .otherwise("ok"))
        .withColumn("keep", F.col("reason") === "ok")
        .orderBy("doc_id")
    }),

    // Repetition quality signal (Gopher/C4-style filter): the most
    // frequent bigram's share of all bigram occurrences — repetitive
    // machine-generated text scores high and gets filtered. Explode →
    // two partial-agg shuffles keyed on (doc, bigram) then doc; the
    // exchanged rows are (id, 8-byte hash-able bigram, count) — never
    // document bodies.
    "llm_repetition" -> ((s, dir) =>
      repM(docs(s, dir))
        .select(F.col("rid").as("doc_id"), F.col("n_bigrams"),
          F.col("n_distinct"), F.col("top_cnt"), F.col("rep_m"))
        .orderBy("doc_id")),

    // UDTF form of shingling: the custom ShingleGenerate Generator
    // (graft.functions) emits one (pos, shingle) row per 3-word window —
    // the lateral row-expansion surface, vs the array form the dedup
    // operators use. Bounded to 50 docs to keep the gate result small.
    "llm_shingle_gen" -> ((s, dir) => {
      graft.functions.VectorFunctions.register(s)
      table(s, dir, "documents")
        .filter(F.col("doc_id") < 50)
        .selectExpr("doc_id", "shingles(text, 3)")
        .withColumn("shingle_hash", F.md5(F.col("shingle")))
        .drop("shingle")
        .orderBy("doc_id", "pos")
    }),

    // Boilerplate detection (the CCNet/RefinedWeb dedup-within-domain
    // step): a 3-shingle appearing in >= 3 DISTINCT documents of the
    // same source is boilerplate (headers, nav, templates); each doc
    // reports how much of it is boilerplate. Scale shape: per-doc
    // DISTINCT shingles (array_distinct, no shuffle) explode once; the
    // document-frequency aggregate and the join back are co-partitioned
    // on (source, shingle) — the corpus text itself is never joined,
    // only shingle keys; final per-doc rollup shuffles doc_id counts.
    "llm_boilerplate" -> ((s, dir) => {
      val sh = docs(s, dir)
        .filter(F.size(F.col("w")) >= 3)
        .select(F.col("doc_id"), F.col("source"),
          F.explode(F.array_distinct(F.expr(
            "transform(sequence(1, size(w)-2), i -> concat_ws(' ', slice(w, i, 3)))")))
            .as("shingle"))
      val boiler = sh.groupBy("source", "shingle")
        .agg(F.count(F.lit(1)).as("n_with")) // rows are distinct per doc
        .filter(F.col("n_with") >= 3)
        .select(F.col("source"), F.col("shingle"), F.lit(1).as("isb"))
      sh.join(boiler, Seq("source", "shingle"), "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).as("n_shingles"),
          F.count(F.col("isb")).as("n_boiler"))
        .select(F.col("doc_id"), F.col("n_shingles"), F.col("n_boiler"),
          F.expr("(1000 * n_boiler) div n_shingles").as("boiler_permille"))
        .orderBy("doc_id")
    }),

    // Fingerprinting: full-content hash + winnowing-style minimum
    // 3-shingle hash. Narrow projection, no shuffle.
    "llm_fingerprint" -> ((s, dir) =>
      docs(s, dir)
        .filter(F.size(F.col("w")) >= 3)
        .select(F.col("doc_id"),
          F.md5(F.col("text")).as("content_hash"),
          F.array_min(F.transform(
            F.expr("transform(sequence(1, size(w)-2), i -> concat_ws(' ', slice(w, i, 3)))"),
            x => F.md5(x))).as("min_shingle_hash"))
        .orderBy("doc_id")),

    // Character-bigram language-model scoring (the KenLM-shaped quality
    // signal, integer-exact): each doc's score is the mean corpus
    // "information" of its bigrams, with log2 replaced by the EXACT
    // integer bit length (length(bin(count)) — bit-identical in both
    // engines, no float log anywhere). Scale shape: the model is the
    // bigram count table — a BOUNDED vocabulary (charset², ~10k rows at
    // web scale) → broadcast join; the corpus text shuffles only its
    // (doc_id, bigram) keys for the two aggregations, never re-joins
    // itself. Final per-doc divide is positive-integer floor → `div`
    // ≡ `//`.
    "llm_bigram_lm" -> ((s, dir) => {
      // the exploded bigram stream feeds BOTH the model aggregate and
      // the scoring join — localCheckpoint materializes it once instead
      // of re-exploding the corpus per consumer
      // explode positions, codegen substring (see llm_ppl_filter)
      val grams = table(s, dir, "documents")
        .filter(F.length(F.col("text")) >= 2)
        .select(F.col("doc_id"), F.col("lang"), F.col("text"),
          F.explode(F.sequence(F.lit(1), F.length(F.col("text")) - 1))
            .as("i"))
        .select(F.col("doc_id"), F.col("lang"),
          F.expr("substring(text, i, 2)").as("bg"))
        .localCheckpoint()
      val model = grams.groupBy("bg").agg(F.count(F.lit(1)).as("cnt"))
        .select(F.col("bg"),
          F.length(F.bin(F.col("cnt"))).cast("long").as("bits"))
      grams.join(F.broadcast(model), Seq("bg"))
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).as("n_bg"), F.sum("bits").as("sum_bits"))
        .select(F.col("lang"),
          F.expr("(1000 * sum_bits) div n_bg").as("score_milli"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum("score_milli").cast("long").as("sum_score"),
          F.min("score_milli").cast("long").as("min_score"),
          F.max("score_milli").cast("long").as("max_score"))
        .orderBy("lang")
    }),

    // PII SCRUBBING — the anonymization stage: emails and phone-shaped
    // tokens mask to fixed placeholders via regexp_replace. The corpus
    // text is synthetic, so each doc gets a deterministic PII suffix
    // appended first (user<id>@example.com + 555-<id>) — the scrub
    // then provably removes EVERY occurrence, including any naturally
    // present. Patterns stay in the RE2 ∩ java.util.regex portable
    // core (plain char classes, no backrefs — DuckDB backreferences
    // are not portable) and replacements are literals. Scale shape:
    // pure per-row map, no shuffle before the final aggregate.
    "llm_anonymize" -> ((s, dir) => {
      val email = "[a-z0-9._]+@[a-z0-9.]+"
      val tel = "555-[0-9]+"
      table(s, dir, "documents")
        .select(F.coalesce(F.col("doc_id"), F.lit(0L)).as("doc_id"),
          F.concat(F.col("text"), F.lit(" contact user"), F.col("doc_id"),
            F.lit("@example.com tel 555-"), F.col("doc_id")).as("t2"))
        .select(F.col("doc_id"),
          F.size(F.regexp_extract_all(F.col("t2"), F.lit(email), F.lit(0)))
            .cast("long").as("n_email"),
          F.size(F.regexp_extract_all(F.col("t2"), F.lit(tel), F.lit(0)))
            .cast("long").as("n_tel"),
          F.regexp_replace(
            F.regexp_replace(F.col("t2"), email, "<email>"),
            tel, "<tel>").as("clean"))
        .select(F.col("n_email"), F.col("n_tel"),
          F.length(F.col("clean")).cast("long").as("clean_len"),
          (F.size(F.regexp_extract_all(F.col("clean"), F.lit(email),
            F.lit(0))) +
            F.size(F.regexp_extract_all(F.col("clean"), F.lit(tel),
              F.lit(0)))).cast("long").as("residual"))
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum("n_email").as("emails"),
          F.sum("n_tel").as("tels"),
          F.sum("clean_len").as("clean_chars"),
          F.sum("residual").as("residual_pii"))
    }),

    // EPOCH-MULTIPLICITY MIXING — the third domain-weight knob next to
    // llm_mixture (exact per-domain QUOTAS) and llm_sample (per-stratum
    // FRACTIONS): sources repeat for k EPOCHS (weights > 1, the thing
    // quota/fraction sampling cannot express) or down-sample, keyed on
    // the source's numeric suffix mod 4. Up-weighting is an explode over
    // sequence(1, k) tagged with the epoch; down-weighting is an exact
    // hash-threshold sample (md5(doc_id) parity — the same shared-md5
    // determinism every sketch uses, so the oracle reproduces the
    // sample bit-for-bit; NEVER rand()). Scale shape: pure map-side
    // row multiplication + one final aggregate — no shuffle before the
    // groupBy, weights applied at read time, no data copied.
    "llm_mix" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(F.coalesce(F.col("doc_id"), F.lit(0L)).as("doc_id"),
          F.col("source"),
          F.size(F.split(F.col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("sn",
          F.expr("CAST(substring(source, 4) AS INT) % 4"))
      val up = d.filter(F.col("sn") === 0)
        .withColumn("epoch", F.explode(F.expr("sequence(1, 2)")))
      val one = d.filter(F.col("sn") === 1).withColumn("epoch", F.lit(1))
      val half = d.filter(F.col("sn") === 2)
        .filter(F.expr(
          "pmod(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)" +
            ", 2) = 0"))
        .withColumn("epoch", F.lit(1))
      up.unionByName(one).unionByName(half)
        .groupBy("source")
        .agg(F.count(F.lit(1)).as("n_rows"),
          F.countDistinct("doc_id").as("n_docs"),
          F.sum("n_tok").as("n_tokens"))
        .orderBy("source")
    }),

    // SEQUENCE PACKING — the training-data assembly stage: documents
    // concatenate into fixed-capacity (2048-token) training sequences,
    // GPT-style stream-chunking (a doc belongs to the pack where its
    // first token lands). Packing is BLOCK-LOCAL (doc_id div 64): each
    // block packs independently, so the cumulative-sum window
    // partitions by block and the whole operator is one windowed pass
    // — the distributed shape real packers use (a single global stream
    // would funnel 100 TB through one task; block-local packing costs
    // at most one underfilled tail pack per block). Integer-exact:
    // token counts via whitespace split, positive floor-div pack ids.
    "llm_pack" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("blk").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      table(s, dir, "documents")
        .select(F.coalesce(F.col("doc_id"), F.lit(0L)).as("doc_id"),
          F.size(F.split(F.col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("blk", F.expr("doc_id div 64"))
        .withColumn("cum", F.sum("n_tok").over(w))
        .select(F.col("doc_id"), F.col("n_tok"),
          (F.col("blk") * 10000 +
            F.expr("(cum - n_tok) div 2048")).cast("long").as("pack"))
        .groupBy("pack")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum("n_tok").as("n_tokens"),
          F.min("doc_id").as("first_doc"),
          F.max("doc_id").as("last_doc"))
        .orderBy("pack")
    }),

    // PERPLEXITY FILTER (the CCNet/Gopher curation stage): train the
    // bigram cost model on a HELD-OUT split (doc_id % 4 != 0), score
    // the serving split against it with OOV BACKOFF (an unseen bigram
    // costs the 24-bit ceiling — the part in-corpus scoring like
    // llm_bigram_lm can never exercise), then keep the
    // better-scoring HALF (exact median split: rank by (score,
    // doc_id), keep rank*2 <= n — SF-robust where any absolute
    // threshold would drift with corpus-size-dependent counts). All
    // integer: cost = 24 - floor(log2(cnt)) via length(bin(cnt)).
    // Scale shape: the model is a bounded-vocabulary broadcast; the
    // exact global median rank is the one non-distributive step — at
    // 100 TB swap it for approx_percentile or a two-pass
    // count-then-rank selection, everything else unchanged.
    "llm_ppl_filter" -> ((s, dir) => {
      // positions explode FIRST, the substring runs in a codegen
      // projection — inside a transform() lambda it would be
      // interpreted per element (the winnow lesson, ~2x on this path)
      val grams = table(s, dir, "documents")
        .filter(F.length(F.col("text")) >= 2)
        .select(F.col("doc_id"), F.col("lang"), F.col("text"),
          F.explode(F.sequence(F.lit(1), F.length(F.col("text")) - 1))
            .as("i"))
        .select(F.col("doc_id"), F.col("lang"),
          F.expr("substring(text, i, 2)").as("bg"))
        .localCheckpoint()
      val model = grams.filter(F.col("doc_id") % 4 =!= 0)
        .groupBy("bg").agg(F.count(F.lit(1)).as("cnt"))
        .select(F.col("bg"),
          (F.lit(24L) - F.length(F.bin(F.col("cnt"))).cast("long"))
            .as("cost"))
      val scored = grams.filter(F.col("doc_id") % 4 === 0)
        .join(F.broadcast(model), Seq("bg"), "left")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).as("n_bg"),
          F.sum(F.coalesce(F.col("cost"), F.lit(24L))).as("sum_cost"))
        .select(F.col("doc_id"), F.col("lang"),
          F.expr("(1000 * sum_cost) div n_bg").as("score_milli"))
        // feeds the median-rank count AND the final ranking: pin the
        // one-row-per-doc score frame so the gram join + aggregate run
        // once (r20 opt)
        .localCheckpoint()
      val n = scored.count()
      val ranked = scored.withColumn("rk", F.row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(F.col("score_milli"), F.col("doc_id"))))
      ranked
        .withColumn("kept", (F.col("rk") * 2 <= n).cast("long"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum("kept").as("n_kept"),
          F.sum("score_milli").as("sum_score"))
        .orderBy("lang")
    }),

    // Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03 —
    // the MOSS selection rule): char 5-gram hashes, one fingerprint
    // per window of w=4 — the window's RIGHTMOST minimum. The argmin
    // is packed into ONE integer (h * 2^21 + (2^20 - i): smaller hash
    // wins, ties break to the larger position) so selection is a
    // single window MIN — no self-join, no second argmax pass. The
    // 32-bit md5-slice hash keeps the pack inside 53 bits. Scale
    // shape: explode → one per-doc window pass → distinct; all work
    // is narrow per-doc, one shuffle on doc_id.
    "llm_winnow" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // positions explode FIRST; the md5-slice hash runs in a codegen
      // projection — inside a transform() lambda it would be
      // interpreted per-element (the HOF rule), 2.4× slower here
      val g = table(s, dir, "documents")
        .filter(F.length(F.col("text")) >= 8)
        .select(F.col("doc_id"), F.col("text"),
          (F.length(F.col("text")) - 4).cast("long").as("n"),
          F.explode(F.sequence(F.lit(1),
            (F.length(F.col("text")) - 4))).as("iRaw"))
        .select(F.col("doc_id"), F.col("n"),
          F.col("iRaw").cast("long").as("i"),
          (F.expr("""cast(conv(substring(md5(substring(text, iRaw, 5)),
                         1, 8), 16, 10) as bigint)""") * 2097152L +
            (F.lit(1048576L) - F.col("iRaw").cast("long"))).as("v"))
      g.withColumn("mv", F.min("v").over(
          Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, 3)))
        .filter(F.col("i") <= F.col("n") - 3)
        .select(F.col("doc_id"), F.col("n"),
          F.expr("mv div 2097152").as("h"),
          (F.lit(1048576L) - F.expr("mv % 2097152")).as("p"))
        .distinct()
        .groupBy("doc_id")
        .agg((F.max("n") - 3).as("n_win"),
          F.count(F.lit(1)).as("n_fp"),
          F.sum("h").as("fp_sum"))
        .orderBy("doc_id")
    }),

    // DATASET CARD: the one-row corpus profile every published
    // training set ships (size, language spread, dup rate, length
    // shape, vocabulary) — computed in two aggregate passes (doc-level
    // multi-aggregate + token distinct) joined as 1-row broadcasts,
    // all integer-exact. The single output row is the entire driver
    // footprint at any corpus size.
    "llm_dataset_card" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val docAgg = d.agg(
        F.count(F.lit(1)).as("n_docs"),
        F.countDistinct(F.col("lang")).as("n_langs"),
        F.sum("n_chars").cast("long").as("total_chars"),
        F.countDistinct(F.md5(F.col("text"))).as("n_uniq"),
        F.count_if(F.length(F.col("text")) < 50).as("n_short"),
        F.count_if(F.length(F.col("text")) ===
          F.expr("octet_length(text)")).as("n_ascii"))
      val vocab = d
        .select(F.explode(F.split(F.col("text"), " ")).as("t"))
        .filter(F.length(F.col("t")) >= 3)
        .agg(F.countDistinct("t").as("vocab_size"))
      docAgg.crossJoin(F.broadcast(vocab))
        .select(F.col("n_docs"), F.col("n_langs"), F.col("total_chars"),
          F.expr("total_chars div n_docs").as("mean_chars"),
          (F.col("n_docs") - F.col("n_uniq")).as("n_dup"),
          F.expr("(1000 * (n_docs - n_uniq)) div n_docs").as("dup_milli"),
          F.col("n_short"), F.col("n_ascii"), F.col("vocab_size"))
    }),

    // Dictionary compression under the oracle: a REAL LZSS coder
    // ([[graft.multimodal.Lzss]], window 64, lengths 3..10) runs over
    // truncated docs, round-trips in-engine (decode must reproduce the
    // input or the task throws), and reports parse stats + encoded
    // size. The oracle REPLAYS the greedy parse as a recursive CTE —
    // each step's "longest match in window" is a correlated EXISTS
    // over (offset, length) substr-equality candidates — so the hash
    // pins every match/literal decision AND the bit-exact size model,
    // not just losslessness. ASCII-guarded (char ≡ byte) so SQL char
    // offsets equal codec byte offsets; %16 sampling + 240-char cap
    // bound the oracle's recursion. Scale shape: pure per-row kernel
    // work after a narrow projection — no shuffle, linear in bytes.
    "llm_text_lzss" -> ((s, dir) => {
      import s.implicits._
      table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(F.col("doc_id") % 16 === 0 &&
          F.length(F.col("text")) > 0 &&
          F.length(F.col("text")) === F.expr("octet_length(text)"))
        .select(F.col("doc_id"),
          F.expr("substring(text, 1, 240)").as("tx"))
        .as[(Long, String)]
        .map { case (id, tx) =>
          val data = tx.getBytes("UTF-8")
          val (enc, st) = graft.multimodal.Lzss.encode(data)
          val dec = graft.multimodal.Lzss.decode(enc)
          require(java.util.Arrays.equals(dec, data),
            s"lzss round-trip failed for doc $id")
          (id, st.nLit.toLong, st.nMatch.toLong, st.matchChars.toLong,
            enc.length.toLong, new String(dec, "UTF-8"))
        }
        .toDF("doc_id", "n_lit", "n_match", "match_chars", "enc_bytes",
          "dec")
        .select(F.col("doc_id"), F.col("n_lit"), F.col("n_match"),
          F.col("match_chars"), F.col("enc_bytes"),
          F.md5(F.col("dec")).as("rt_hash"))
        .orderBy("doc_id")
    }),

    // Held-out LM quality scoring (the CCNet/KenLM recipe): a char-
    // bigram model trained on the EVEN half of the corpus scores the
    // ODD half, add-one smoothing for unseen bigrams (bit length of
    // count+1; unseen → 1). Information = exact integer bit length →
    // bit-exact cross-engine, zero libm. Scale shape: the model is a
    // bounded charset² aggregate → broadcast left join; held-out text
    // shuffles once on doc_id.
    "llm_lm_holdout" -> ((s, dir) => {
      // positions explode FIRST so the substring runs codegen'd, not in
      // an interpreted transform() lambda (the winnow/ppl_filter rewrite,
      // applied here r20)
      val grams = table(s, dir, "documents")
        .filter(F.length(F.col("text")) >= 2)
        .select(F.col("doc_id"), F.col("lang"),
          F.explode(F.sequence(F.lit(1), F.length(F.col("text")) - 1))
            .as("i"), F.col("text"))
        .select(F.col("doc_id"), F.col("lang"),
          F.expr("substring(text, i, 2)").as("bg"))
        .localCheckpoint()
      val model = grams.filter(F.col("doc_id") % 2 === 0)
        .groupBy("bg").agg(F.count(F.lit(1)).as("cnt"))
        .select(F.col("bg"),
          F.length(F.bin(F.col("cnt") + 1)).cast("long").as("bits"))
      grams.filter(F.col("doc_id") % 2 === 1)
        .join(F.broadcast(model), Seq("bg"), "left")
        .select(F.col("doc_id"), F.col("lang"),
          F.coalesce(F.col("bits"), F.lit(1L)).as("bits"))
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).as("n_bg"), F.sum("bits").as("sum_bits"))
        .select(F.col("lang"),
          F.expr("(1000 * sum_bits) div n_bg").as("score_milli"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum("score_milli").cast("long").as("sum_score"),
          F.min("score_milli").cast("long").as("min_score"),
          F.max("score_milli").cast("long").as("max_score"))
        .orderBy("lang")
    }),

    // Zipf-law fit over per-language character frequencies — the
    // corpus-statistics sanity check (natural text follows a power law;
    // synthetic/corrupted shards do not). log2 is replaced by the EXACT
    // integer bit length on both rank and count, the regression runs on
    // exact BIGINT moments (q_regr pattern), and the final slope is one
    // identically-parenthesized double formula — bit-exact cross-engine
    // with zero libm calls. Scale shape: char frequencies are a bounded
    // aggregate (|charset| per language), the rank window runs over
    // ~100 rows per language, moments are one partial-agg pass.
    "llm_char_zipf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val freq = table(s, dir, "documents")
        .select(F.col("lang"),
          F.explode(F.split(F.col("text"), "")).as("c"))
        .filter(F.col("c") =!= "")
        .groupBy("lang", "c").agg(F.count(F.lit(1)).as("cnt"))
      val ranked = freq.withColumn("r",
          F.row_number().over(Window.partitionBy("lang")
            .orderBy(F.col("cnt").desc, F.col("c"))))
        .filter(F.col("r") <= 32)
        .select(F.col("lang"),
          F.length(F.bin(F.col("r"))).cast("long").as("x"),
          F.length(F.bin(F.col("cnt"))).cast("long").as("y"))
      ranked.groupBy("lang")
        .agg(F.count(F.lit(1)).as("n"),
          F.sum("x").as("sx"), F.sum("y").as("sy"),
          F.sum(F.col("x") * F.col("y")).as("sxy"),
          F.sum(F.col("x") * F.col("x")).as("sxx"))
        .select(F.col("lang"), F.col("n"),
          ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double") /
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
              .cast("double")).as("zipf_slope"))
        .orderBy("lang")
    }),

    // Greedy longest-match-first segmentation against a frozen subword
    // vocab (the WordPiece decoding rule) as ONE codegen kernel per row
    // (graft.functions.GreedySegmentExpr) — embarrassingly parallel,
    // zero shuffles before the final sort; the oracle's recursive CTE
    // replays the exact greedy walk, and sum of squared token lengths
    // pins every boundary, not just the count.
    "llm_greedy_segment" -> ((s, dir) => {
      graft.functions.VectorFunctions.register(s)
      table(s, dir, "documents")
        .selectExpr("doc_id", "greedy_segment(text) AS seg")
        .select(F.col("doc_id"),
          F.col("seg").getItem(0).as("n_tokens"),
          F.col("seg").getItem(1).as("sum_sq"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // per-char rebuild (no regex backreferences — DuckDB's RE2 rewrite
    // handling is not portable), then DuckDB's own nfc_normalize: the
    // two engines must agree on every composition the canonical tables
    // define for the decomposed twins
    "llm_text_nfc" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n
                    FROM documents WHERE length(text) > 0),
         chars AS (
           SELECT doc_id, t.i AS i, substring(text, t.i, 1) AS ch
           FROM d, unnest(generate_series(1, d.n)) t(i)),
         deco AS (
           SELECT doc_id,
                  string_agg(CASE WHEN ch IN ('a','e','i','o','u')
                    THEN ch || chr(769) ELSE ch END, '' ORDER BY i) AS s
           FROM chars GROUP BY doc_id)
         SELECT doc_id, CAST(length(s) AS BIGINT) AS pre_len,
                CAST(length(nfc_normalize(s)) AS BIGINT) AS post_len,
                md5(nfc_normalize(s)) AS norm_hash
         FROM deco ORDER BY doc_id""",
    "llm_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
                count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY keep_id""",
    "llm_text_stats" ->
      """WITH b AS (
           SELECT doc_id, length(text) AS len,
                  string_split(text, ' ') AS w
           FROM documents),
         c AS (
           SELECT doc_id, len,
                  len(w) AS n_words,
                  len(list_distinct(w)) AS n_distinct,
                  len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS n_stop
           FROM b),
         d AS (
           SELECT doc_id, CAST(len AS BIGINT) AS n_chars_m,
                  CAST(n_words AS BIGINT) AS n_words,
                  CAST(n_distinct AS BIGINT) AS n_distinct,
                  CAST(n_stop AS BIGINT) AS n_stop,
                  round(CAST(len - (n_words - 1) AS DOUBLE) / n_words, 4) AS avg_word_len,
                  round(CAST(n_distinct AS DOUBLE) / n_words, 4) AS ttr,
                  round(CAST(n_stop AS DOUBLE) / n_words, 4) AS stop_ratio
           FROM c)
         SELECT *, CAST(floor(10000.0 * (0.4 * (CAST(n_stop AS DOUBLE) / n_words)
                  + 0.3 * (CAST(n_distinct AS DOUBLE) / n_words)
                  + 0.3 * least(1.0, CAST(n_words AS DOUBLE) / 200.0))) AS BIGINT)
                  AS quality_m
         FROM d ORDER BY doc_id""",
    "llm_token_stats" ->
      """SELECT doc_id,
                CAST(len(toks) AS BIGINT) AS n_tokens,
                CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
                CAST(list_max(list_transform(toks, x -> length(x))) AS BIGINT) AS longest,
                CAST(list_min(list_transform(toks, x -> length(x))) AS BIGINT) AS shortest
         FROM (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks
               FROM documents)
         ORDER BY doc_id""",
    "llm_langid" ->
      """WITH dw AS (
           SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
           FROM documents),
         docwords AS (
           SELECT doc_id, lang, word, count(*) AS cnt
           FROM dw GROUP BY 1, 2, 3),
         profile AS (
           SELECT lang AS plang, word, CAST(sum(cnt) AS BIGINT) AS lcnt
           FROM docwords GROUP BY 1, 2),
         scored AS (
           SELECT d.doc_id, d.lang, p.plang,
                  CAST(sum(d.cnt * p.lcnt) AS BIGINT) AS score
           FROM docwords d JOIN profile p USING (word)
           GROUP BY 1, 2, 3),
         ranked AS (
           SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, plang) AS rn
           FROM scored)
         SELECT doc_id, plang AS pred_lang, score,
                CASE WHEN plang = lang THEN 1 ELSE 0 END AS is_correct
         FROM ranked WHERE rn = 1 ORDER BY doc_id""",
    "llm_sample" ->
      """SELECT doc_id, lang, source, n_chars
         FROM documents
         WHERE substring(md5('s1:' || text), 1, 1) <
               CASE WHEN lang = 'en' THEN '8'
                    WHEN lang = 'de' THEN '4' ELSE '2' END
         ORDER BY doc_id""",
    "llm_quota_sample" ->
      """WITH ranked AS (
           SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY md5('qs:' || text), doc_id) AS rn,
                  count(*) OVER (PARTITION BY lang) AS n_lang
           FROM documents)
         SELECT doc_id, lang, CAST(rn AS INT) AS rn, n_lang
         FROM ranked
         WHERE rn <= (n_lang + 9) // 10
         ORDER BY doc_id""",
    "llm_pipeline_e2e" ->
      """WITH sampled AS (
           SELECT doc_id, lang,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents
           WHERE substring(md5('s1:' || text), 1, 1) <
                 CASE WHEN lang = 'en' THEN '8'
                      WHEN lang = 'de' THEN '4' ELSE '2' END),
         q AS (SELECT * FROM sampled WHERE n_tokens >= 30),
         sharded AS (
           SELECT doc_id, lang, n_tokens,
                  CAST((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
                    // 1000 AS BIGINT) AS shard_id
           FROM q)
         SELECT lang, shard_id, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
         FROM sharded GROUP BY lang, shard_id
         ORDER BY lang, shard_id""",
    "llm_shard_pack" ->
      """SELECT doc_id, lang, n_tokens,
                CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_tokens,
                CAST((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) // 2000
                  AS BIGINT) AS shard_id
         FROM (SELECT doc_id, lang,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
               FROM documents)
         ORDER BY lang, doc_id""",
    // same first-occurrence rule: row_number over (doc_id, para_idx)
    // within each distinct paragraph text; reassembly string_agg is
    // para_idx-ordered to mirror the engine's sort_array
    "llm_paragraph_dedup" ->
      """WITH w AS (
           SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         p AS (
           SELECT doc_id, t.i AS para_idx,
                  array_to_string(l[t.i*10 + 1 : t.i*10 + 10], ' ') AS para
           FROM w, unnest(generate_series(0,
                  CAST((len(l) - 1) // 10 AS INT))) t(i)),
         k AS (
           SELECT doc_id, para_idx, para,
                  row_number() OVER (PARTITION BY para
                    ORDER BY doc_id, para_idx) AS rn
           FROM p)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                md5(string_agg(para, ' ' ORDER BY para_idx)) AS kept_hash
         FROM k WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""",
    "llm_curriculum" ->
      """SELECT doc_id, lang, n_words,
                CAST(row_number() OVER (PARTITION BY lang
                  ORDER BY n_words, doc_id) AS INT) AS rank
         FROM (SELECT doc_id, lang,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
               FROM documents)
         ORDER BY rank, lang, doc_id""",
    "llm_chunks" ->
      """SELECT doc_id, CAST(t.i AS INT) AS chunk_idx,
                CAST(length(array_to_string(w[t.i*50 + 1 : t.i*50 + 50], ' '))
                  AS BIGINT) AS chunk_chars,
                md5(array_to_string(w[t.i*50 + 1 : t.i*50 + 50], ' '))
                  AS chunk_hash
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
              unnest(generate_series(0, (len(d.w) - 1) // 50)) t(i)
         ORDER BY doc_id, chunk_idx""",
    "llm_split_assign" ->
      """WITH b AS (
           SELECT lang, n_chars,
                  CAST('0x' || substring(md5(text), 1, 4) AS BIGINT) % 100
                    AS b
           FROM documents WHERE text IS NOT NULL)
         SELECT CASE WHEN b < 90 THEN 'train'
                     WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
                lang, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS chars
         FROM b GROUP BY 1, 2 ORDER BY 1, 2""",
    "llm_vocab_coverage" ->
      """WITH counts AS (
           SELECT tok, count(*) AS n
           FROM (SELECT unnest(string_split(text, ' ')) AS tok
                 FROM documents)
           WHERE tok <> '' GROUP BY tok),
         total AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM counts),
         top AS (
           SELECT tok, n,
                  CAST(row_number() OVER (ORDER BY n DESC, tok) AS INT)
                    AS rk
           FROM counts ORDER BY n DESC, tok LIMIT 50)
         SELECT t.rk, t.tok, t.n,
                CAST(floor(1000000.0 * sum(t.n) OVER (ORDER BY t.rk
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  / total.tot) AS BIGINT) AS cov_m
         FROM top t, total ORDER BY rk""",
    "llm_rarity" ->
      """WITH dw AS (
           SELECT doc_id, word FROM (
             SELECT doc_id,
                    unnest(list_distinct(string_split(text, ' '))) AS word
             FROM documents)
           WHERE word <> ''),
         dfreq AS (SELECT word, count(*) AS df FROM dw GROUP BY word),
         nd AS (SELECT count(*) AS nd FROM documents)
         SELECT d.doc_id, count(*) AS n_distinct,
                CAST(sum((1000000 * nd.nd) // dfreq.df) AS BIGINT)
                  AS rarity_m
         FROM dw d JOIN dfreq USING (word) CROSS JOIN nd
         GROUP BY d.doc_id ORDER BY d.doc_id""",
    "llm_tfdf" ->
      """WITH tf AS (
           SELECT doc_id, word, count(*) AS tf
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                 FROM documents)
           GROUP BY 1, 2)
         SELECT word, count(*) AS df,
                CAST(sum(tf) AS BIGINT) AS total_tf,
                max(tf) AS max_tf
         FROM tf GROUP BY word ORDER BY word""",
    "llm_quality_filter" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         st AS (
           SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
                  CAST(len(list_filter(w,
                    x -> x IN ('the','a','of','and','to','in','is')))
                    AS BIGINT) AS n_stop
           FROM d),
         bg AS (
           SELECT doc_id,
                  unnest(list_transform(generate_series(1, len(w) - 1),
                    i -> array_to_string(w[i:i+1], ' '))) AS b
           FROM d WHERE len(w) >= 2),
         cnt AS (
           SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
         rep AS (
           SELECT doc_id,
                  CAST(floor(1000000.0 * max(c) / sum(c)) AS BIGINT) AS rep_m
           FROM cnt GROUP BY 1),
         j AS (
           SELECT st.doc_id, n_words, n_stop,
                  coalesce(rep_m, 0) AS rep_m
           FROM st LEFT JOIN rep ON st.doc_id = rep.doc_id),
         r AS (
           SELECT *,
                  CASE WHEN n_words < 40 THEN 'too_short'
                       WHEN 20 * n_stop < n_words THEN 'low_stopwords'
                       WHEN rep_m > 60000 THEN 'repetitive'
                       ELSE 'ok' END AS reason
           FROM j)
         SELECT doc_id, n_words, n_stop, rep_m, reason,
                reason = 'ok' AS keep
         FROM r ORDER BY doc_id""",
    "llm_repetition" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         bg AS (
           SELECT doc_id,
                  unnest(list_transform(generate_series(1, len(w) - 1),
                    i -> array_to_string(w[i:i+1], ' '))) AS b
           FROM d WHERE len(w) >= 2),
         cnt AS (
           SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
         agg AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                  CAST(max(c) AS BIGINT) AS top_cnt,
                  CAST(count(*) AS BIGINT) AS n_distinct
           FROM cnt GROUP BY 1)
         SELECT doc_id, n_bigrams, n_distinct, top_cnt,
                CAST(floor(1000000.0 * top_cnt / n_bigrams) AS BIGINT) AS rep_m
         FROM agg ORDER BY doc_id""",
    "llm_shingle_gen" ->
      """SELECT doc_id, CAST(t.i - 1 AS INT) AS pos,
                md5(array_to_string(w[t.i:t.i+2], ' ')) AS shingle_hash
         FROM (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents WHERE doc_id < 50) d,
              unnest(generate_series(1, len(d.w) - 2)) t(i)
         ORDER BY doc_id, pos""",
    "llm_boilerplate" ->
      """WITH w AS (
           SELECT doc_id, source, string_split(text, ' ') AS ws
           FROM documents WHERE len(string_split(text, ' ')) >= 3),
         sh AS (
           SELECT doc_id, source, unnest(list_distinct(list_transform(
             generate_series(1, len(ws) - 2),
             i -> array_to_string(ws[i:i+2], ' ')))) AS shingle
           FROM w),
         boiler AS (
           SELECT source, shingle FROM sh
           GROUP BY 1, 2 HAVING count(*) >= 3)
         SELECT s.doc_id,
                CAST(count(*) AS BIGINT) AS n_shingles,
                CAST(count(b.shingle) AS BIGINT) AS n_boiler,
                (1000 * count(b.shingle)) // count(*) AS boiler_permille
         FROM sh s LEFT JOIN boiler b USING (source, shingle)
         GROUP BY 1 ORDER BY 1""",
    "llm_fingerprint" ->
      """SELECT doc_id, md5(text) AS content_hash,
                list_aggregate(list_transform(
                  list_transform(generate_series(1, len(w) - 2),
                    i -> array_to_string(w[i:i+2], ' ')),
                  x -> md5(x)), 'min') AS min_shingle_hash
         FROM (SELECT doc_id, text, string_split(text, ' ') AS w
               FROM documents)
         WHERE len(w) >= 3 ORDER BY doc_id""",
    // bit length (length(bin(n))) is the exact integer log2 both
    // engines agree on; HUGEINT sums cast back down after the floor
    // divide
    "llm_bigram_lm" ->
      """WITH g AS (
           SELECT doc_id, lang,
                  unnest(list_transform(generate_series(1, length(text) - 1),
                    i -> substr(text, i, 2))) AS bg
           FROM documents WHERE length(text) >= 2),
         m AS (SELECT bg, length(bin(count(*))) AS bits FROM g GROUP BY bg),
         sc AS (SELECT doc_id, lang, count(*) AS n_bg,
                       sum(bits) AS sum_bits
                FROM g JOIN m USING (bg) GROUP BY doc_id, lang)
         SELECT lang, count(*) AS n_docs,
                CAST(sum((1000 * sum_bits) // n_bg) AS BIGINT) AS sum_score,
                CAST(min((1000 * sum_bits) // n_bg) AS BIGINT) AS min_score,
                CAST(max((1000 * sum_bits) // n_bg) AS BIGINT) AS max_score
         FROM sc GROUP BY lang ORDER BY lang""",
    // the same portable-regex scrub over the same synthetic PII suffix;
    // both engines count with regexp_extract_all and replace literals
    "llm_anonymize" ->
      """WITH t AS (
           SELECT doc_id,
                  text || ' contact user' || doc_id ||
                    '@example.com tel 555-' || doc_id AS t2
           FROM documents),
         sc AS (
           SELECT doc_id,
                  CAST(len(regexp_extract_all(t2,
                    '[a-z0-9._]+@[a-z0-9.]+')) AS BIGINT) AS n_email,
                  CAST(len(regexp_extract_all(t2,
                    '555-[0-9]+')) AS BIGINT) AS n_tel,
                  regexp_replace(regexp_replace(t2,
                    '[a-z0-9._]+@[a-z0-9.]+', '<email>', 'g'),
                    '555-[0-9]+', '<tel>', 'g') AS clean
           FROM t)
         SELECT count(*) AS n_docs,
                CAST(sum(n_email) AS BIGINT) AS emails,
                CAST(sum(n_tel) AS BIGINT) AS tels,
                CAST(sum(length(clean)) AS BIGINT) AS clean_chars,
                CAST(sum(
                  len(regexp_extract_all(clean, '[a-z0-9._]+@[a-z0-9.]+')) +
                  len(regexp_extract_all(clean, '555-[0-9]+')))
                  AS BIGINT) AS residual_pii
         FROM sc""",
    // per-source multiplicities re-derived: x2 via a 2-row series, x1
    // plain, deterministic half via the shared-md5 parity, rest dropped
    "llm_mix" ->
      """WITH d AS (
           SELECT doc_id, source,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                  CAST(substr(source, 4) AS INT) % 4 AS sn
           FROM documents),
         up AS (SELECT d.doc_id, d.source, d.n_tok FROM d,
                  (SELECT unnest(generate_series(1, 2)) AS e) e
                WHERE d.sn = 0),
         one AS (SELECT doc_id, source, n_tok FROM d WHERE sn = 1),
         half AS (SELECT doc_id, source, n_tok FROM d
                  WHERE sn = 2 AND
                    ((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                       1, 8) AS BIGINT) % 2) + 2) % 2 = 0),
         mixed AS (SELECT * FROM up UNION ALL SELECT * FROM one
                   UNION ALL SELECT * FROM half)
         SELECT source, count(*) AS n_rows,
                count(DISTINCT doc_id) AS n_docs,
                CAST(sum(n_tok) AS BIGINT) AS n_tokens
         FROM mixed GROUP BY source ORDER BY source""",
    // block-local stream packing: cum-sum window per block, a doc's
    // pack = where its first token lands; all ids positive so // ≡ div
    "llm_pack" ->
      """WITH d AS (
           SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                  doc_id // 64 AS blk
           FROM documents),
         c AS (SELECT *, sum(n_tok) OVER (PARTITION BY blk ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
               FROM d),
         p AS (SELECT doc_id, n_tok,
                      CAST(blk * 10000 +
                        (CAST(cum AS BIGINT) - n_tok) // 2048
                        AS BIGINT) AS pack
               FROM c)
         SELECT pack, count(*) AS n_docs,
                CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                CAST(min(doc_id) AS BIGINT) AS first_doc,
                CAST(max(doc_id) AS BIGINT) AS last_doc
         FROM p GROUP BY pack ORDER BY pack""",
    // held-out bigram model + OOV backoff + exact better-half keep:
    // the rank window orders (score, doc_id) identically in both
    // engines, and n (the test-split size) is recomputed in SQL
    "llm_ppl_filter" ->
      """WITH g AS (
           SELECT doc_id, lang,
                  unnest(list_transform(generate_series(1, length(text) - 1),
                    i -> substr(text, i, 2))) AS bg
           FROM documents WHERE length(text) >= 2),
         m AS (SELECT bg, 24 - length(bin(count(*))) AS cost
               FROM g WHERE doc_id % 4 <> 0 GROUP BY bg),
         sc AS (SELECT doc_id, lang, count(*) AS n_bg,
                       sum(COALESCE(cost, 24)) AS sum_cost
                FROM (SELECT t.doc_id, t.lang, m.cost
                      FROM g t LEFT JOIN m ON m.bg = t.bg
                      WHERE t.doc_id % 4 = 0) q
                GROUP BY doc_id, lang),
         scored AS (SELECT doc_id, lang,
                           (1000 * sum_cost) // n_bg AS score_milli
                    FROM sc),
         ranked AS (SELECT *, row_number() OVER (
                      ORDER BY score_milli, doc_id) AS rk,
                      count(*) OVER () AS n
                    FROM scored)
         SELECT lang, count(*) AS n_docs,
                CAST(sum(CASE WHEN rk * 2 <= n THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_kept,
                CAST(sum(score_milli) AS BIGINT) AS sum_score
         FROM ranked GROUP BY lang ORDER BY lang""",
    // the packed argmin (h*2^21 + (2^20 - i)) makes rightmost-min
    // selection a plain window MIN; all values positive so % and //
    // agree with Spark's % and div
    "llm_winnow" ->
      """WITH d AS (SELECT doc_id, text, length(text) - 4 AS n
                    FROM documents WHERE length(text) >= 8),
         g AS (SELECT doc_id, n, i,
                      CAST('0x' || substr(md5(substr(text, CAST(i AS INT), 5)),
                                          1, 8) AS BIGINT)
                        * 2097152 + (1048576 - i) AS v
               FROM d, unnest(generate_series(1, n)) t(i)),
         m AS (SELECT doc_id, n, i,
                      min(v) OVER (PARTITION BY doc_id ORDER BY i
                                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                        AS mv
               FROM g),
         sel AS (SELECT DISTINCT doc_id, n, mv // 2097152 AS h,
                        1048576 - (mv % 2097152) AS p
                 FROM m WHERE i <= n - 3)
         SELECT doc_id, CAST(max(n) - 3 AS BIGINT) AS n_win,
                count(*) AS n_fp,
                CAST(sum(h) AS BIGINT) AS fp_sum
         FROM sel GROUP BY doc_id ORDER BY doc_id""",
    // two 1-row aggregates joined; every metric integer-exact
    "llm_dataset_card" ->
      """WITH da AS (
           SELECT count(*) AS n_docs,
                  count(DISTINCT lang) AS n_langs,
                  CAST(sum(n_chars) AS BIGINT) AS total_chars,
                  count(DISTINCT md5(text)) AS n_uniq,
                  count(*) FILTER (WHERE length(text) < 50) AS n_short,
                  count(*) FILTER (WHERE length(text) =
                    octet_length(encode(text))) AS n_ascii
           FROM documents),
         vb AS (
           SELECT count(DISTINCT t.w) AS vocab_size
           FROM (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents) t(w)
           WHERE length(t.w) >= 3)
         SELECT n_docs, n_langs, total_chars,
                total_chars // n_docs AS mean_chars,
                n_docs - n_uniq AS n_dup,
                (1000 * (n_docs - n_uniq)) // n_docs AS dup_milli,
                n_short, n_ascii, vocab_size
         FROM da, vb""",
    // the greedy LZSS parse replayed one token per recursion step:
    // bl = longest l with a window match (NULL → literal); the size
    // model is 9 bits per literal, 10 per match, 4 header bytes
    "llm_text_lzss" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id, substr(text, 1, 240) AS tx,
                  length(substr(text, 1, 240)) AS L
           FROM documents
           WHERE doc_id % 16 = 0 AND length(text) > 0
             AND octet_length(encode(text)) = length(text)),
         st AS (
           SELECT doc_id, tx, L, CAST(1 AS BIGINT) AS p,
                  CAST(0 AS BIGINT) AS n_lit,
                  CAST(0 AS BIGINT) AS n_match,
                  CAST(0 AS BIGINT) AS match_chars
           FROM d
           UNION ALL
           SELECT doc_id, tx, L,
                  p + CASE WHEN bl IS NULL THEN 1 ELSE bl END,
                  n_lit + CASE WHEN bl IS NULL THEN 1 ELSE 0 END,
                  n_match + CASE WHEN bl IS NULL THEN 0 ELSE 1 END,
                  match_chars + coalesce(bl, 0)
           FROM (
             SELECT s.doc_id, s.tx, s.L, s.p, s.n_lit, s.n_match,
                    s.match_chars,
                    (SELECT max(l)
                     FROM (SELECT unnest(generate_series(3, 10)) AS l) ls
                     WHERE l <= s.L - s.p + 1
                       AND EXISTS (
                         SELECT 1
                         FROM (SELECT unnest(generate_series(
                                CASE WHEN s.p > 64 THEN s.p - 64
                                     ELSE 1 END,
                                s.p - 1)) AS q) qs
                         WHERE substr(s.tx, CAST(q AS INT), CAST(l AS INT))
                             = substr(s.tx, CAST(s.p AS INT),
                                      CAST(l AS INT)))) AS bl
             FROM st s WHERE s.p <= s.L
           ) stepped)
         SELECT doc_id, n_lit, n_match, match_chars,
                4 + (9 * n_lit + 10 * n_match + 7) // 8 AS enc_bytes,
                md5(tx) AS rt_hash
         FROM st WHERE p > L
         ORDER BY doc_id""",
    // train/score split on doc_id parity; bit length of count+1 is the
    // add-one-smoothed information, unseen bigrams coalesce to 1
    "llm_lm_holdout" ->
      """WITH g AS (
           SELECT doc_id, lang,
                  unnest(list_transform(generate_series(1, length(text) - 1),
                    i -> substr(text, i, 2))) AS bg
           FROM documents WHERE length(text) >= 2),
         m AS (SELECT bg, length(bin(count(*) + 1)) AS bits
               FROM g WHERE doc_id % 2 = 0 GROUP BY bg),
         ho AS (SELECT * FROM g WHERE doc_id % 2 = 1),
         sc AS (SELECT doc_id, lang, count(*) AS n_bg,
                       CAST(sum(coalesce(bits, 1)) AS BIGINT) AS sum_bits
                FROM ho LEFT JOIN m USING (bg) GROUP BY doc_id, lang)
         SELECT lang, count(*) AS n_docs,
                CAST(sum((1000 * sum_bits) // n_bg) AS BIGINT) AS sum_score,
                CAST(min((1000 * sum_bits) // n_bg) AS BIGINT) AS min_score,
                CAST(max((1000 * sum_bits) // n_bg) AS BIGINT) AS max_score
         FROM sc GROUP BY lang ORDER BY lang""",
    // integer bit-length points + exact BIGINT moments + one
    // identically-parenthesized double divide = bit-exact slope
    "llm_char_zipf" ->
      """WITH chars AS (
           SELECT lang,
                  unnest(list_transform(generate_series(1, length(text)),
                    i -> substr(text, i, 1))) AS c
           FROM documents),
         freq AS (SELECT lang, c, count(*) AS cnt
                  FROM chars GROUP BY lang, c),
         ranked AS (
           SELECT lang,
                  CAST(length(bin(row_number() OVER (PARTITION BY lang
                    ORDER BY cnt DESC, c))) AS BIGINT) AS x,
                  CAST(length(bin(cnt)) AS BIGINT) AS y,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY cnt DESC, c) AS r
           FROM freq QUALIFY r <= 32),
         m AS (SELECT lang, count(*) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx
               FROM ranked GROUP BY lang)
         SELECT lang, n,
                CAST(n * sxy - sx * sy AS DOUBLE) /
                  CAST(n * sxx - sx * sx AS DOUBLE) AS zipf_slope
         FROM m ORDER BY lang""",
    // the recursive CTE replays the greedy longest-match walk one token
    // per iteration; the vocab literals are spliced from the SAME
    // frozen arrays the codegen kernel compiles in
    "llm_greedy_segment" -> {
      def lits(a: Array[String]) = a.map(g => s"'$g'").mkString(", ")
      val v4 = lits(graft.functions.GreedySegment.Grams4)
      val v3 = lits(graft.functions.GreedySegment.Grams3)
      val v2 = lits(graft.functions.GreedySegment.Grams2)
      s"""WITH RECURSIVE seg AS (
           SELECT doc_id, text, 0 AS pos, 0 AS n_tok, 0 AS sum_sq
           FROM documents
           UNION ALL
           SELECT doc_id, text, pos + l, n_tok + 1, sum_sq + l * l
           FROM (
             SELECT doc_id, text, pos, n_tok, sum_sq,
                    CASE WHEN length(text) - pos >= 4
                              AND substr(text, pos + 1, 4) IN ($v4) THEN 4
                         WHEN length(text) - pos >= 3
                              AND substr(text, pos + 1, 3) IN ($v3) THEN 3
                         WHEN length(text) - pos >= 2
                              AND substr(text, pos + 1, 2) IN ($v2) THEN 2
                         ELSE 1 END AS l
             FROM seg WHERE pos < length(text)) x
         )
         SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
                CAST(sum_sq AS BIGINT) AS sum_sq
         FROM seg WHERE pos = length(text) ORDER BY doc_id"""
    }
  )
}
