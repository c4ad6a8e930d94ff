package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Near-duplicate detection over the `documents` table (SURVEY.md §2.4):
  * banded MinHash (pairs / survivors / clusters), SimHash signatures, and
  * bucketed n-gram Jaccard.
  *
  * Scale design (100 TB):
  *  - MinHash NEVER does an all-pairs comparison: candidates come from a
  *    self-join on (band, min-hash) signatures, so join fan-out is bounded
  *    by band-bucket sizes; only candidates pay the exact-Jaccard
  *    verification, which is a codegen'd sorted merge over the shingle
  *    arrays carried on the candidate rows — the corpus is never exploded
  *    per shingle. Signatures themselves are narrow per-row array work.
  *  - llm_simhash is a fully narrow projection (one codegen'd pass over
  *    the per-word hash array); Hamming-ball grouping on the signature is
  *    then an equality/bucket problem, not a pairwise one.
  *  - llm_ngram_jaccard demonstrates the lossless prefix-filter pattern
  *    (the public AllPairs/PPJoin family): each doc emits only its
  *    p(n) = n - ceil(n/20) + 1 RAREST bigrams (document-frequency-
  *    ascending order within (lang, source)) as candidate keys, and any
  *    pair meeting the reporting threshold (jac >= 1/20, compared in exact
  *    integers as 21*common >= ni+nj) provably shares a prefix element —
  *    NgramPrefixLaws carries the smallest-common-element proof, and the
  *    DuckDB oracle is the unbanded all-pairs query, so the driver hash
  *    re-proves losslessness on real data. Candidates need an ACTUAL
  *    shared rare bigram, so cost is Σ prefix-DF(g)² — strictly a subset
  *    of the r7 length-band scheme's Σ|adjacent-band window|² (a same-band
  *    pair with no common bigram is no longer a candidate at all).
  *    N-gram sets are 60-bit hashes so the verify merge compares longs.
  *  - llm_dedup_clusters runs label propagation to fixpoint with eager
  *    lineage checkpoints (iterative DataFrames otherwise replan their
  *    upstream exponentially).
  *
  * Determinism: md5 everywhere (identical hex in Spark/DuckDB); Jaccard is
  * reported floor-scaled (jac_m = floor(1e6·j)) because engine round()
  * half-way semantics differ; thresholds compare bit-identical doubles.
  */
object LlmDedup extends Catalog {

  import graft.functions.VectorFunctions

  /** (doc_id, shs) — per-doc SORTED DISTINCT 3-word shingle ARRAY. Kept as
    * an array so signatures and set intersections run as narrow per-row
    * work — no per-shingle explode, no shuffle until a join needs one;
    * sorted once here so pair verification is a codegen'd two-pointer
    * merge (`sorted_overlap`) instead of a per-pair hash build.
    */
  /** `sorted = true` additionally array_sorts the set — required only by
    * the `sorted_overlap` merge kernel; consumers that explode the set
    * (decontamination) skip the interpreted sort pass.
    */
  private def shingleArrays(s: SparkSession, dir: String,
      sorted: Boolean = true): DataFrame = {
    VectorFunctions.register(s)
    val distinctShingles = F.array_distinct(
      F.expr("transform(sequence(1, size(w)-2), i -> concat_ws(' ', slice(w, i, 3)))"))
    table(s, dir, "documents")
      // single-row-group input file → one split; repartition so the
      // per-row shingling/hashing uses every core (see LlmText.docs)
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("w", F.split(F.col("text"), " "))
      .filter(F.size(F.col("w")) >= 3)
      .select(F.col("doc_id"),
        (if (sorted) F.array_sort(distinctShingles) else distinctShingles)
          .as("shs"))
  }

  /** One md5 per shingle; band k's signature is the minimum of hex slice
    * [8k+1, 8k+8] — four independent 32-bit min-hashes from a single hash
    * pass (hashing is the dominant cost; seeding 4 separate md5s costs 4×).
    */
  private def bandSig(k: Int) =
    F.array_min(F.transform(F.col("hs"),
      h => F.substring(h, 8 * k + 1, 8)))

  private val jac = F.col("common").cast("double") /
    (F.col("ni") + F.col("nj") - F.col("common"))

  /** (tk, doc_id, shs) — shingle sets keyed by an exact-dup group key:
    * md5 over the sorted-distinct shingle array. Two docs share `tk` iff
    * their shingle SETS are identical (the only state every downstream
    * Jaccard quantity depends on), so `tk` groups are exactly the rows
    * banding cannot distinguish.
    */
  private def keyedShingles(s: SparkSession, dir: String): DataFrame =
    shingleArrays(s, dir)
      // the separator below is a literal U+0001 byte (invisible in
      // most editors): it cannot appear inside a shingle (shingles
      // are space-joined words split on spaces), so the concatenation
      // is injective on sorted-distinct sets - distinct sets can
      // never collide into one tk via element-boundary ambiguity
      .withColumn("tk", F.md5(F.concat_ws("", F.col("shs"))))

  /** Band-join candidate pairs over exact-dup REPRESENTATIVES (min doc_id
    * per identical shingle set). Exposed for the skew-guard spec: N
    * identical documents collapse to ONE representative before banding, so
    * candidate count stays O(groups²-within-band) instead of the O(N²)
    * fan-out identical docs would otherwise create in their shared band
    * bucket — quadratic blow-up on exactly the input dedup exists for.
    */
  private[operators] def bandCandidates(s: SparkSession, dir: String): DataFrame =
    bandCandidatesOf(collapseDups(keyedShingles(s, dir)))

  /** One representative row (min doc_id) per identical shingle set. */
  private def collapseDups(keyed: DataFrame): DataFrame =
    keyed.groupBy("tk").agg(F.min("doc_id").as("doc_id"), F.first("shs").as("shs"))

  // private[operators]: BandSkewSpec drives a deliberately hot band
  // (hundreds of DISTINCT sets sharing one band signature — the shape
  // exact-dup collapse cannot absorb) straight through this join
  /** (doc_id, k, mh) band-signature rows of a (tk, doc_id, shs) frame —
    * the unit both the self-join candidates and the PERSISTED band
    * index (llm_dedup_minhash_incr) are built from.
    */
  private def bandRows(d: DataFrame): DataFrame =
    d.withColumn("hs", F.transform(F.col("shs"), x => F.md5(x)))
      .select(F.col("doc_id"),
        F.concat(bandSig(0), bandSig(1)).as("b0"),
        F.concat(bandSig(2), bandSig(3)).as("b1"))
      .select(F.col("doc_id"),
        F.expr("stack(2, 0, b0, 1, b1) as (k, mh)"))

  private[operators] def bandCandidatesOf(d: DataFrame): DataFrame = {
    val bands = bandRows(d)
    bands.as("x").join(bands.as("y"),
        F.col("x.k") === F.col("y.k") && F.col("x.mh") === F.col("y.mh") &&
          F.col("x.doc_id") < F.col("y.doc_id"))
      .select(F.col("x.doc_id").as("i"), F.col("y.doc_id").as("j"))
      .distinct()
  }

  /** Verified near-dup pairs: (i < j, common, ni, nj) at Jaccard ≥ 0.5.
    *
    * The 4 32-bit min-hashes pair into 2 bands of r=2 (P(candidate) =
    * 1-(1-J²)² — one-hash bands admit ~J per band, far too many false
    * candidates on a high-overlap corpus) → band-signature self-join for
    * candidates → exact Jaccard verification. Scale shape: signatures and
    * set sizes are per-row array work (scan-speed, zero shuffle); the ONLY
    * shuffles are the candidate band join and the verification join, both
    * bounded by candidate count, and the shingle arrays travel with the
    * candidate rows so verification is a codegen'd sorted merge — no
    * per-shingle explode join over the corpus.
    *
    * Skew guard (stage 0): EXACT duplicates are collapsed to a min-doc_id
    * representative per identical shingle set BEFORE banding — a corpus
    * with many copies of one document (the very input dedup exists for)
    * would otherwise put all copies in one band bucket and fan out O(N²)
    * candidates that each pay the verify merge. After verification over
    * representatives, group members are re-attached: intra-group pairs are
    * emitted directly (Jaccard is exactly 1 — no verify needed), and each
    * verified rep pair expands to the member cross product with i/j (and
    * ni/nj) reordered. The oracle stays the unbanded spec, so the driver
    * hash proves the collapse+expansion exact. MinHashSkewSpec asserts the
    * O(N) candidate behavior directly via [[bandCandidates]].
    */
  /** The shared dedup core: materialized keyed shingles, collapsed
    * representatives, and the verified near-dup pairs BETWEEN
    * representatives. Consumers that need per-document results choose
    * their own re-attachment: full pair expansion (llm_dedup_minhash —
    * output-inherent), linear drop-set algebra (llm_dedup_keep), or
    * star edges (llm_dedup_clusters) — the latter two never materialize
    * the quadratic intra-group pair set a giant duplicate group implies.
    */
  private def dedupCore(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    // the keyed-shingle pipeline (an md5 per shingle over the corpus) is
    // referenced by the collapse, the intra-group join (twice), and the
    // membership expansion (twice): materialize it ONCE — without this the
    // narrow-but-heavy hashing pass re-executes per reference
    val keyed = keyedShingles(s, dir).localCheckpoint()
    val d = collapseDups(keyed).localCheckpoint()
    val repPairs = bandCandidatesOf(d)
      .join(d.select(F.col("doc_id").as("i"), F.col("shs").as("sa")), "i")
      .join(d.select(F.col("doc_id").as("j"), F.col("shs").as("sb")), "j")
      .select(F.col("i"), F.col("j"),
        VectorFunctions.sorted_overlap(F.col("sa"), F.col("sb")).cast("long").as("common"),
        F.size(F.col("sa")).cast("long").as("ni"),
        F.size(F.col("sb")).cast("long").as("nj"))
      .filter(jac >= 0.5)
    (keyed, d, repPairs)
  }

  /** (rep, member) rows for every NON-representative member — the linear
    * intra-group structure (star), never the pairwise expansion.
    */
  private def nonRepMembers(keyed: DataFrame, d: DataFrame): DataFrame =
    keyed.select(F.col("tk"), F.col("doc_id"))
      .join(d.select(F.col("tk"), F.col("doc_id").as("rep")), "tk")
      .filter(F.col("doc_id") =!= F.col("rep"))

  private def verifiedPairs(s: SparkSession, dir: String): DataFrame = {
    val (keyed, _, repPairs) = dedupCore(s, dir)
    // membership (tk, doc_id, n); n travels so expansion never re-reads shs
    val m = keyed.select(F.col("tk"), F.col("doc_id"),
      F.size(F.col("shs")).cast("long").as("n"))
    // intra-group pairs: identical sets, so common = ni = nj = n
    val intra = m.as("x").join(m.as("y"),
        F.col("x.tk") === F.col("y.tk") && F.col("x.doc_id") < F.col("y.doc_id"))
      .select(F.col("x.doc_id").as("i"), F.col("y.doc_id").as("j"),
        F.col("x.n").as("common"), F.col("x.n").as("ni"), F.col("y.n").as("nj"))
    // cross-group expansion: rep pair (i,j) → members(i) × members(j),
    // reordering ids (and their set sizes) so i < j still holds
    val repTk = keyed.select(F.col("doc_id"), F.col("tk"))
    val a = F.col("ma.doc_id")
    val b = F.col("mb.doc_id")
    val cross = repPairs
      .join(repTk.select(F.col("doc_id").as("i"), F.col("tk").as("ta")), "i")
      .join(repTk.select(F.col("doc_id").as("j"), F.col("tk").as("tb")), "j")
      .join(m.as("ma"), F.col("ta") === F.col("ma.tk"))
      .join(m.as("mb"), F.col("tb") === F.col("mb.tk"))
      .select(F.least(a, b).as("i"), F.greatest(a, b).as("j"), F.col("common"),
        F.when(a < b, F.col("ni")).otherwise(F.col("nj")).as("ni"),
        F.when(a < b, F.col("nj")).otherwise(F.col("ni")).as("nj"))
    intra.unionAll(cross)
  }

  val queries: Map[String, Q] = Map(

    // MinHash near-dup pairs with their Jaccard (floor-scaled).
    "llm_dedup_minhash" -> ((s, dir) =>
      verifiedPairs(s, dir)
        .select(F.col("i"), F.col("j"), F.col("common"), F.col("ni"), F.col("nj"),
          F.floor(F.lit(1000000.0) * jac).as("jac_m"))
        .orderBy("i", "j")),

    // INCREMENTAL near-dup dedup against a PERSISTED band index (r20):
    // day-1 publishes the corpus's MinHash band signatures — three tiny
    // (doc_id, k, mh) rows per exact-dup representative — as a
    // graft-avro table; day-2 hashes ONLY the new batch, band-joins it
    // against the index (never the corpus), exact-verifies the
    // candidates' Jaccard, and appends the new batch's bands so day-3
    // dedups against the grown index. The 100 TB shape: the corpus is
    // never re-shingled — day-2 cost = new-batch hashing + a join
    // bounded by index hits + verification bounded by candidates. The
    // oracle is the unbanded cross-generation spec, so the driver hash
    // proves the collapse/expand + persisted round-trip exact. Distinct
    // from llm_dedup_incremental / llm_dedup_persistent (EXACT-key
    // indexes): this one persists the NEAR-dup sketch.
    "llm_dedup_minhash_incr" -> ((s, dir) => {
      VectorFunctions.register(s)
      val idxDir = Catalog.tempDir("llm_mh_idx")
      val keyed = keyedShingles(s, dir).localCheckpoint()
      val old = keyed.filter(F.pmod(F.col("doc_id"), F.lit(2)) === 0)
      val nw = keyed.filter(F.pmod(F.col("doc_id"), F.lit(2)) === 1)
      val oldReps = collapseDups(old).localCheckpoint()
      val newReps = collapseDups(nw).localCheckpoint()
      // day-1 publish
      bandRows(oldReps).write.format("graft-avro")
        .mode("overwrite").save(idxDir)
      // day-2: new bands probe the PERSISTED index
      val idx = s.read.format("graft-avro").load(idxDir)
      val cand = bandRows(newReps).as("y").join(idx.as("x"),
          F.col("x.k") === F.col("y.k") && F.col("x.mh") === F.col("y.mh"))
        .select(F.col("x.doc_id").as("i"), F.col("y.doc_id").as("j"))
        .distinct()
      val repPairs = cand
        .join(oldReps.select(F.col("doc_id").as("i"),
          F.col("shs").as("sa")), "i")
        .join(newReps.select(F.col("doc_id").as("j"),
          F.col("shs").as("sb")), "j")
        .select(F.col("i"), F.col("j"),
          VectorFunctions.sorted_overlap(F.col("sa"), F.col("sb"))
            .cast("long").as("common"),
          F.size(F.col("sa")).cast("long").as("ni"),
          F.size(F.col("sb")).cast("long").as("nj"))
        .filter(jac >= 0.5)
      // expand rep pairs to (old member, new member) pairs — sizes are
      // identical within a tk group, so they travel with the reps
      val mo = old.select(F.col("tk"), F.col("doc_id"))
      val mn = nw.select(F.col("tk"), F.col("doc_id"))
      val out = repPairs
        .join(oldReps.select(F.col("doc_id").as("i"),
          F.col("tk").as("ta")), "i")
        .join(newReps.select(F.col("doc_id").as("j"),
          F.col("tk").as("tb")), "j")
        .join(mo.as("ma"), F.col("ta") === F.col("ma.tk"))
        .join(mn.as("mb"), F.col("tb") === F.col("mb.tk"))
        .select(F.col("ma.doc_id").as("i"), F.col("mb.doc_id").as("j"),
          F.col("common"), F.col("ni"), F.col("nj"),
          F.floor(F.lit(1000000.0) * jac).as("jac_m"))
      // index maintenance: the new generation's bands append for day-3
      bandRows(newReps).write.format("graft-avro")
        .mode("append").save(idxDir)
      out.orderBy("i", "j")
    }),

    // Per-source MinHash signature through the native minhash4
    // TypedImperativeAggregate (graft.functions.MinHashAgg): a mergeable
    // 32-byte sketch per group — the shuffle carries signatures, never
    // member strings, and element-wise-min merge is order-independent so
    // AQE merge order cannot change the result. Lanes are md5 slices,
    // reproduced exactly by the oracle's per-lane min.
    "llm_minhash_sig" -> ((s, dir) => {
      VectorFunctions.register(s)
      table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .groupBy("source")
        .agg(VectorFunctions.minhash4(F.col("text")).as("sig"))
        .select(F.col("source"),
          F.element_at(F.col("sig"), 1).as("h0"),
          F.element_at(F.col("sig"), 2).as("h1"),
          F.element_at(F.col("sig"), 3).as("h2"),
          F.element_at(F.col("sig"), 4).as("h3"))
        .orderBy("source")
    }),

    // 8-lane widening of llm_minhash_sig: same one-pass mergeable sketch,
    // lanes 4-7 sliced from a salted second digest md5('1' || text) — the
    // generic widen-by-salt path (estimator error 1/sqrt(k)). Still one
    // shuffle of 64-byte buffers per group.
    "llm_minhash_wide" -> ((s, dir) => {
      VectorFunctions.register(s)
      table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .groupBy("source")
        .agg(VectorFunctions.minhash8(F.col("text")).as("sig"))
        .select(F.col("source") +:
          (0 until 8).map(i =>
            F.element_at(F.col("sig"), i + 1).as(s"h$i")): _*)
        .orderBy("source")
    }),

    // SimHash: classic construction — ONE md5 per distinct word; bit b's
    // ±1 vote is the parity of hex char b of that hash; bit b is set when
    // votes sum positive. Entirely narrow and zero-shuffle: the signature
    // is the codegen'd SimHash16 kernel (one pass over the hash array)
    // rather than 16 interpreted HOF aggregates; only the final ORDER BY
    // (an oracle artifact) exchanges.
    "llm_simhash" -> ((s, dir) => {
      VectorFunctions.register(s)
      table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(F.col("doc_id"),
          F.transform(F.array_distinct(F.split(F.col("text"), " ")),
            w => F.md5(w)).as("hsw"))
        .select(F.col("doc_id"),
          VectorFunctions.simhash16(F.col("hsw")).as("simhash"))
        .orderBy("doc_id")
    }),

    // Iterative GRAPH analytics — link-style rank propagation, the
    // curation primitive behind quality/influence scoring over document
    // graphs. The graph is deterministic: each doc emits 2 out-edges to
    // md5-derived targets (a functional graph with constant out-degree,
    // so the damping division is exact). Three PageRank iterations in
    // EXACT integer arithmetic: r' = 150000 + Σ (17·r_u) div 40 — the
    // floor runs per-edge BEFORE the sum in both engines, so the oracle
    // (unrolled as 3 CTE steps, the llm_embed_kmeans pattern) is
    // bit-identical. Scale shape: each iteration is one edge join + one
    // aggregate — the canonical distributed PageRank step — with
    // localCheckpoint per hop so the loop's lineage stays one step deep.
    "llm_graph_rank" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
      val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
      val mod = maxId + 1
      def target(off: Int) =
        F.conv(F.substring(F.md5(F.col("text")), off, 12), 16, 10)
          .cast("long") % mod
      val edges = docs.select(F.col("doc_id").as("u"),
          F.explode(F.array(target(1), target(13))).as("tv"))
        .localCheckpoint()
      val verts = docs.select(F.col("doc_id").as("v")).localCheckpoint()
      var r = verts.withColumn("r", F.lit(1000000L))
      // fixed-K linear chain (each step's r feeds exactly one consumer):
      // the 3 unrolled steps execute as one pipeline off the pinned
      // edge/vertex tables — per-step localCheckpoint jobs were pure
      // overhead (r20 opt, same shape as q_graph_pagerank)
      (1 to 3).foreach { _ =>
        val contrib = edges
          .join(r.select(F.col("v").as("u"), F.col("r")), "u")
          .select(F.col("tv").as("v"),
            // integer div, NOT '/', which is float division in Spark;
            // operands are positive so div == floor, matching DuckDB //
            F.expr("(17 * r) div 40").as("c"))
          .groupBy("v").agg(F.sum("c").as("cs"))
        r = verts.join(contrib, Seq("v"), "left")
          .select(F.col("v"),
            (F.lit(150000L) + F.coalesce(F.col("cs"), F.lit(0L))).as("r"))
      }
      r.select(F.col("v").as("doc_id"), F.col("r").as("pr"))
        .orderBy("doc_id")
    }),

    // SimHash SEARCH — the signature's actual use: near-dup pairs at
    // Hamming distance <= 2 within (lang, source), candidates from the
    // PIGEONHOLE chunk trick: the 16-bit signature splits into 3 chunks
    // (6+5+5 bits); <= 2 differing bits touch <= 2 chunks, so qualifying
    // pairs always share at least one whole chunk — bucket-join on
    // (chunk_idx, chunk_value), then exact bit_count verify. LOSSLESS by
    // pigeonhole; the oracle is the unchunked all-pairs query so the
    // driver hash re-proves it. (Production uses 64-bit signatures with
    // 4x16-bit chunks — identical shape, roomier buckets.)
    "llm_simhash_pairs" -> ((s, dir) => {
      VectorFunctions.register(s)
      val sig = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(F.col("doc_id"), F.col("lang"), F.col("source"),
          F.transform(F.array_distinct(F.split(F.col("text"), " ")),
            w => F.md5(w)).as("hsw"))
        .select(F.col("doc_id"), F.col("lang"), F.col("source"),
          VectorFunctions.simhash16(F.col("hsw")).as("sh"))
      val chunks = sig.select(F.col("doc_id"), F.col("lang"),
        F.col("source"), F.col("sh"),
        F.expr("stack(3, 0, sh % 64, 1, (sh div 64) % 32, 2, sh div 2048) as (k, cv)"))
      val cx = chunks.select(F.col("lang"), F.col("source"), F.col("k"),
        F.col("cv"), F.col("doc_id").as("i"), F.col("sh").as("sa"))
      val cy = chunks.select(F.col("lang"), F.col("source"), F.col("k"),
        F.col("cv"), F.col("doc_id").as("j"), F.col("sh").as("sb"))
      cx.join(cy, Seq("lang", "source", "k", "cv"))
        .filter(F.col("i") < F.col("j"))
        .select(F.col("lang"), F.col("source"), F.col("i"), F.col("j"),
          F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).as("ham"))
        .filter(F.col("ham") <= 2)
        .distinct() // a pair can share up to 3 chunk buckets
        .orderBy("lang", "source", "i", "j")
    }),

    // Survivor materialization — the step a real dedup pipeline ends
    // with: drop every document that is the HIGHER id of a verified
    // near-dup pair (union-by-min within pairs), keep the rest. The drop
    // list is tiny relative to the corpus, so it broadcasts and the keep
    // step is a broadcast anti-join — the corpus is never shuffled.
    // The drop set is computed in LINEAR work, never expanding pairs:
    // a doc is a drop iff it is (a) a non-representative member of any
    // exact-dup group (some smaller identical doc exists), or (b) any
    // member of a group whose representative is the j of a verified rep
    // pair — for rep pair (r, s) with r < s = min of its group, the j's
    // of the expanded cross product are exactly (G_r \ {r}) ∪ G_s, and
    // G_r \ {r} is already covered by (a). The oracle is the expanded
    // definition, so the driver hash proves this algebra.
    "llm_dedup_keep" -> ((s, dir) => {
      val (keyed, d, repPairs) = dedupCore(s, dir)
      val nonRep = nonRepMembers(keyed, d).select("doc_id")
      val hitMembers = d.select(F.col("tk"), F.col("doc_id").as("j"))
        .join(repPairs.select("j").distinct(), "j")
        .select("tk")
        .join(keyed.select(F.col("tk"), F.col("doc_id")), "tk")
        .select("doc_id")
      val drops = nonRep.unionAll(hitMembers).distinct()
      table(s, dir, "documents")
        .join(F.broadcast(drops), Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // Near-dup CLUSTERS: connected components over the verified MinHash
    // pair graph, labelled by the component's minimum doc_id. Label
    // propagation with a fixed hop budget — each iteration is one
    // edge-join + min-aggregate, the standard distributed
    // connected-components shape (at web scale you alternate
    // large-star/small-star, same primitive). The pair graph is tiny
    // relative to the corpus, so these joins touch only near-dup members.
    "llm_dedup_clusters" -> ((s, dir) => {
      // The edge set is LINEAR, not the expanded pair set: exact-dup
      // groups contribute STAR edges (rep → member) — same connectivity
      // as the all-pairs clique a group implies, |G|−1 edges instead of
      // |G|²/2 — and verified rep pairs contribute one edge each (their
      // member cross products are already connected through the two
      // stars). Components and min-labels are identical; the oracle
      // walks the expanded graph, so the driver hash proves it.
      val (keyed, dd, repPairs) = dedupCore(s, dir)
      val star = nonRepMembers(keyed, dd)
        .select(F.col("rep").as("i"), F.col("doc_id").as("j"))
      val pairs = repPairs.select("i", "j").unionAll(star)
      // Iterative algorithms MUST truncate lineage: without the eager
      // localCheckpoint the 8-iteration loop re-plans (and re-executes)
      // the entire MinHash pipeline once per reference — exponentially.
      // At cluster scale this is reliable-checkpointing to HDFS; the
      // pattern (materialize edges once, checkpoint labels per hop) is
      // identical.
      val edges = pairs
        .unionAll(pairs.select(F.col("j").as("i"), F.col("i").as("j")))
        .select(F.col("i").as("src"), F.col("j").as("dst"))
        .localCheckpoint()
      var lab = edges.select(F.col("src").as("v")).distinct()
        .withColumn("lab", F.col("v"))
        .localCheckpoint()
      // propagate to FIXPOINT. Each hop combines (a) neighbor-min
      // propagation with (b) pointer jumping (v's label := its label's
      // label — "path halving"), so chain-shaped components converge in
      // O(log diameter) hops instead of O(diameter). Labels only ever
      // DECREASE, so convergence is detected inline (`chg` carried on the
      // checkpointed row) — no old-vs-new comparison join per hop.
      var changed = 1L
      var guard = 0
      while (changed > 0 && guard < 12) {
        guard += 1
        val prop = edges.join(lab, edges("dst") === lab("v"))
          .groupBy(F.col("src")).agg(F.min("lab").as("nlab"))
        // checkpoint BEFORE the self-join: `stepped` feeds the jump join
        // twice (probe + parent side) — materialized once here, and the
        // per-hop lineage stays one join deep for the next iteration.
        val stepped = lab.join(prop, lab("v") === prop("src"), "left")
          .select(lab("v"), lab("lab").as("old"),
            F.least(lab("lab"), F.coalesce(F.col("nlab"), lab("lab"))).as("mid"))
          .localCheckpoint()
        val parent = stepped.select(F.col("v").as("pv"), F.col("mid").as("plab"))
        val jumped = F.least(F.col("a.mid"),
          F.coalesce(F.col("p.plab"), F.col("a.mid")))
        // checkpoint `next` itself (r20 opt): it feeds the convergence
        // count AND both lab consumers of the next hop (the propagation
        // join + the stepped build) — uncheckpointed, the jump join
        // re-executed once per consumer
        val next = stepped.as("a")
          .join(parent.as("p"), F.col("a.mid") === F.col("p.pv"), "left")
          .select(F.col("a.v").as("v"), jumped.as("lab"),
            (jumped < F.col("a.old")).as("chg"))
          .localCheckpoint()
        changed = next.filter(F.col("chg")).count()
        lab = next.select("v", "lab")
      }
      // Hitting the hop budget with labels still moving means the clusters
      // are unconverged — fail loudly instead of emitting wrong components
      // (pointer jumping needs diameter > ~2^12 to get here).
      require(changed == 0,
        s"connected-components did not converge within $guard hops " +
          s"($changed labels still changing)")
      lab.select(F.col("v").as("doc_id"), F.col("lab").as("cluster"))
        .orderBy("doc_id")
    }),

    // Train/test DECONTAMINATION: flag corpus documents sharing any
    // 3-word shingle with a held-out benchmark set (doc_id % 17 == 0
    // plays the benchmark role). Scale shape: the benchmark shingle set
    // is tiny relative to the corpus — it broadcasts, so the corpus-side
    // explode feeds a broadcast join (no corpus shuffle) and only
    // contaminated docs reach the aggregate. contam_m is the
    // floor-scaled fraction of a doc's shingles that are contaminated.
    "llm_decontaminate" -> ((s, dir) => {
      // the shingle derivation feeds BOTH the benchmark split and the
      // corpus split below — pin it so the split + per-word shingle
      // build runs once, not once per consumer (r20 opt)
      val d = shingleArrays(s, dir, sorted = false).localCheckpoint()
      val bench = d.filter(F.col("doc_id") % 17 === 0)
        .select(F.explode(F.col("shs")).as("sg")).distinct()
      d.filter(F.col("doc_id") % 17 =!= 0)
        .select(F.col("doc_id"),
          F.size(F.col("shs")).cast("long").as("n_shingles"),
          F.explode(F.col("shs")).as("sg"))
        .join(F.broadcast(bench), "sg")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).as("n_shared"))
        .withColumn("contam_m", F.floor(F.lit(1000000.0) *
          F.col("n_shared") / F.col("n_shingles")))
        .orderBy("doc_id")
    }),

    // Pairwise 2-gram Jaccard at reporting threshold jac >= 1/20, compared
    // in exact integers (21*common >= ni+nj — no float boundary).
    // Candidates come from LOSSLESS PREFIX FILTERING (the public AllPairs/
    // PPJoin family): under ANY fixed total order on bigrams, a qualifying
    // pair must share an element inside the first p(n) = n - ceil(n/20) + 1
    // order-ranked elements of BOTH docs. Proof: common <= min(ni,nj) and
    // 21*common >= ni+nj imply nj <= 20*ni, so common >= (ni + ni/20)/21
    // = ni/20, i.e. common >= ceil(ni/20); let c be the smallest common
    // bigram in the order — if c sat outside doc i's prefix, at most
    // ceil(ni/20) - 1 elements of doc i could follow it, yet all other
    // common elements do: contradiction (NgramPrefixLaws re-proves this on
    // random qualifying pairs; the oracle below stays the UNBANDED
    // all-pairs query, so the driver hash re-verifies no pair was lost on
    // real data). The order is (df, g) ascending — bigram document
    // frequency within (lang, source) — so each doc's prefix carries its
    // RAREST bigrams and candidate fan-out is Σ prefix-DF(g)² over
    // actually-shared rare bigrams: strictly a subset of the former
    // length-band window pairs (a same-band pair with zero common bigrams
    // is no longer a candidate at all), retiring the Σ|band window|² tail
    // documented in r7. The exact ratio prune (max <= 20*min, implied by
    // the threshold) still kills impossible pairs before the distinct.
    "llm_ngram_jaccard" -> ((s, dir) => {
      VectorFunctions.register(s)
      import org.apache.spark.sql.expressions.Window
      // bigrams are represented by 60-bit md5-prefix hashes: the pairwise
      // merge then compares longs instead of strings (~4x cheaper), and the
      // 8-byte elements shrink the arrays the verify join carries.
      // localCheckpoint: d feeds the prefix keys AND both verify joins —
      // without it the split+md5 projection recomputes three times.
      val d = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("w", F.split(F.col("text"), " "))
        .filter(F.size(F.col("w")) >= 2)
        .select(F.col("doc_id"), F.col("lang"), F.col("source"),
          F.array_sort(F.array_distinct(F.transform(
            F.array_distinct(
              F.expr("transform(sequence(1, size(w)-1), i -> concat_ws(' ', slice(w, i, 2)))")),
            bg => F.conv(F.substring(F.md5(bg), 1, 15), 16, 10).cast("long"))))
            .as("gs"))
        .localCheckpoint()
      val ex = d.select(F.col("lang"), F.col("source"), F.col("doc_id"),
        F.size(F.col("gs")).as("n"), F.explode(F.col("gs")).as("g"))
      val dfreq = ex.groupBy("lang", "source", "g")
        .agg(F.count(F.lit(1)).as("df"))
      // rank each doc's bigrams rarest-first and keep the p(n) prefix;
      // candidate rows carry only (lang, source, g, id, n) — 5 narrow
      // columns; the bigram arrays join in AFTER candidate distinct.
      // localCheckpoint: the self-join below references pre on both sides
      // and the plans don't share the df-join + window subtree otherwise
      // (distinct aliases defeat exchange reuse — PlanAudit showed the
      // stage duplicated).
      val pre = ex.join(dfreq, Seq("lang", "source", "g"))
        .withColumn("rn", F.row_number().over(
          Window.partitionBy("doc_id").orderBy("df", "g")))
        .filter(F.col("rn") <= F.col("n") - F.expr("(n + 19) div 20") + 1)
        .localCheckpoint()
      val kx = pre.select(F.col("lang"), F.col("source"), F.col("g"),
        F.col("doc_id").as("i"), F.col("n").as("na"))
      val ky = pre.select(F.col("lang"), F.col("source"), F.col("g"),
        F.col("doc_id").as("j"), F.col("n").as("nb"))
      val cand = kx.join(ky, Seq("lang", "source", "g"))
        .filter(F.col("i") < F.col("j") &&
          F.greatest(F.col("na"), F.col("nb")) <=
            F.lit(20) * F.least(F.col("na"), F.col("nb")))
        .select("lang", "source", "i", "j").distinct()
      cand
        .join(d.select(F.col("doc_id").as("i"), F.col("gs").as("ga")), "i")
        .join(d.select(F.col("doc_id").as("j"), F.col("gs").as("gb")), "j")
        .select(F.col("lang"), F.col("source"), F.col("i"), F.col("j"),
          VectorFunctions.sorted_overlap(F.col("ga"), F.col("gb")).cast("long").as("common"),
          F.size(F.col("ga")).cast("long").as("ni"),
          F.size(F.col("gb")).cast("long").as("nj"))
        .filter(F.lit(21) * F.col("common") >= F.col("ni") + F.col("nj"))
        .withColumn("jac_m", F.floor(F.lit(1000000.0) *
          (F.col("common").cast("double") /
            (F.col("ni") + F.col("nj") - F.col("common")))))
        .orderBy("lang", "source", "i", "j")
    }),

    // EXACT substring-level duplication (the suffix-array dedup family:
    // find every maximal character span whose k-grams all repeat
    // somewhere in the corpus — within OR across documents). The
    // distributed shape: explode each doc into its k=20 character grams
    // (positions are data-parallel, no state), one shuffle groups grams
    // to find those occurring >= 2 times, a join marks the duplicated
    // positions, and the per-doc gaps-and-islands window (i - row_number)
    // merges consecutive duplicated positions into MAXIMAL spans — the
    // same re-expression that made the BPE greedy scan oracle-able.
    // At 100 TB: cost is one shuffle on the gram key (combine-heavy:
    // counts collapse before the join) + one window partitioned by
    // doc_id (bounded by document length). Nothing is ever pairwise.
    // The shuffle key is xxhash64(gram) — 8 bytes instead of the
    // ~20-byte gram string, and codegen'd (an md5 slice here costs
    // more CPU than the narrower shuffle saves: measured 12.3 s vs
    // 8.5 s raw at sf0.1). The hash is INTERNAL — results are span
    // layouts, so the oracle keys on the raw gram and agreement holds
    // unless xxhash64 collides (~(N grams)²/2⁶⁵ ≈ 3e-6 at sf0.1, and
    // deterministic per dataset: green at a tested SF stays green).
    "llm_substring_dup" -> ((s, dir) => {
      val k = 20
      val pos = table(s, dir, "documents")
        .select(F.col("doc_id"), F.col("text"))
        .filter(F.length(F.col("text")) >= k) // sequence(1,0) counts DOWN
        .select(F.col("doc_id"),
          F.explode(F.sequence(F.lit(1),
            F.length(F.col("text")) - (k - 1))).as("i"),
          F.col("text"))
        .select(F.col("doc_id"), F.col("i"),
          F.xxhash64(F.expr(s"substring(text, i, $k)")).as("g"))
        // pos feeds BOTH the duplicated-gram aggregate and the marking
        // join: pin it so the explode + substring + xxhash64 derivation
        // (the gate's hot kernel, one row per character) runs once, not
        // once per consumer (r20 opt)
        .localCheckpoint()
      val dup = pos.groupBy("g").agg(F.count(F.lit(1)).as("cnt"))
        .filter(F.col("cnt") >= 2).select("g")
      val marked = pos.join(dup, "g").select("doc_id", "i")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("i")
      val spans = marked
        .withColumn("grp", F.col("i") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(F.min("i").as("s"), (F.max("i") + F.lit(k - 1)).as("e"))
      spans.groupBy("doc_id")
        .agg(F.count(F.lit(1)).as("n_spans"),
          F.sum(F.col("e") - F.col("s") + 1).as("dup_chars"),
          F.max(F.col("e") - F.col("s") + 1).cast("long").as("max_span"))
        .orderBy("doc_id")
    }),

    // MOSS-style overlap detection on WINNOWING fingerprints (the
    // application the SIGMOD'03 selection exists for): docs sharing
    // >= 5 selected fingerprint hashes are reported as likely-overlap
    // pairs. The pair join runs per fingerprint BUCKET, and hashes
    // selected in > 20 docs are dropped first — the standard MOSS
    // stop-fingerprint move (a boilerplate gram everyone shares would
    // otherwise make one bucket quadratic); with the cap, candidate
    // work is bounded by cap² per hash. Same k=5/w=4 parameters and
    // packed-argmin window MIN as llm_winnow.
    "llm_winnow_pairs" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // positions explode FIRST so the md5 hash runs codegen'd, not in
      // an interpreted transform() lambda (same rewrite as llm_winnow)
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
      val sel = g.withColumn("mv", F.min("v").over(
          Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, 3)))
        .filter(F.col("i") <= F.col("n") - 3)
        .select(F.col("doc_id"), F.expr("mv div 2097152").as("h"))
        .distinct()
        // pin the selected fingerprints: sel feeds the df count AND
        // both sides of the pair join — without the checkpoint the
        // 5M-gram codegen-md5 + window pipeline re-runs per consumer
        // (the fleet's most expensive gate; this is its hot path)
        .localCheckpoint()
      val keep = sel.groupBy("h").agg(F.count(F.lit(1)).as("df"))
        .filter(F.col("df").between(2, 20)).select("h")
      val mk = sel.join(keep, "h")
      mk.as("a")
        .join(mk.as("b"), F.col("a.h") === F.col("b.h") &&
          F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").as("a_id"),
          F.col("b.doc_id").as("b_id"))
        .agg(F.count(F.lit(1)).as("n_shared"))
        .filter(F.col("n_shared") >= 5)
        .orderBy("a_id", "b_id")
    }),

    // Content-defined chunking (the gear/Rabin boundary trick behind
    // FastCDC and storage dedup, here for shared-paragraph detection):
    // a cut lands wherever the local 8-gram hash ≡ 0 (mod 64), so
    // identical passages chunk IDENTICALLY regardless of their byte
    // offset — the property fixed-width llm_chunks lacks. The boundary
    // predicate is a PURE per-position function (no min-size skip —
    // real FastCDC's skip is a sequential scan; dropping it keeps
    // every position independently testable), so chunking is
    // embarrassingly parallel: explode → filter → one per-doc lead()
    // window → chunk-hash aggregate. Expected chunk ≈ 64 chars.
    "llm_cdc_chunks" -> ((s, dir) => {
      val k = 8
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("i")
      table(s, dir, "documents")
        .filter(F.length(F.col("text")) >= k)
        .select(F.col("doc_id"), F.col("lang"), F.col("text"),
          F.length(F.col("text")).cast("long").as("len"))
        .select(F.col("doc_id"), F.col("lang"), F.col("text"), F.col("len"),
          F.explode(F.sequence(F.lit(1),
            (F.col("len") - (k - 1)).cast("int"))).as("i"))
        .filter(F.col("i") === 1 || F.expr(
          s"""cast(conv(substring(md5(substring(text, i, $k)), 1, 6),
             |     16, 10) as bigint) % 64""".stripMargin) === 0)
        .withColumn("nxt", F.lead("i", 1).over(w))
        .select(F.col("doc_id"), F.col("lang"),
          (F.coalesce(F.col("nxt").cast("long"), F.col("len") + 1)
            - F.col("i")).as("clen"),
          F.md5(F.expr(
            "substring(text, i, cast(coalesce(nxt, len + 1) - i as int))"))
            .as("ch"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).as("n_chunks"),
          F.countDistinct("ch").as("n_uniq"),
          F.sum("clen").cast("long").as("sum_len"),
          F.max("clen").cast("long").as("max_len"))
        .orderBy("lang")
    })
  )

  val oracles: Map[String, String] = Map(
    // same gram/mark/island pipeline in SQL; i stays BIGINT from
    // generate_series (cast only at substr), sums cast off HUGEINT.
    // The oracle keys on the RAW gram — the gate's xxhash64 key is an
    // internal shuffle-width optimization whose results agree unless
    // the hash collides (see the gate comment for the bound)
    "llm_substring_dup" ->
      """WITH pos AS (
           SELECT doc_id, i, substr(text, CAST(i AS INT), 20) AS g
           FROM documents,
                LATERAL (SELECT unnest(generate_series(1,
                  length(text) - 19)) AS i)
           WHERE length(text) >= 20),
         dup AS (
           SELECT g FROM pos GROUP BY g HAVING count(*) >= 2),
         marked AS (
           SELECT doc_id, i FROM pos
           WHERE g IN (SELECT g FROM dup)),
         isl AS (
           SELECT doc_id, i,
                  i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
                    AS grp
           FROM marked),
         spans AS (
           SELECT doc_id, min(i) AS s, max(i) + 19 AS e
           FROM isl GROUP BY doc_id, grp)
         SELECT doc_id, count(*) AS n_spans,
                CAST(sum(e - s + 1) AS BIGINT) AS dup_chars,
                CAST(max(e - s + 1) AS BIGINT) AS max_span
         FROM spans GROUP BY doc_id ORDER BY doc_id""",
    // same winnow selection (packed argmin, window MIN), then the
    // stop-fingerprint cap and the per-bucket pair join
    "llm_winnow_pairs" ->
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
         sel AS (SELECT DISTINCT doc_id, mv // 2097152 AS h
                 FROM m WHERE i <= n - 3),
         keep AS (SELECT h FROM sel GROUP BY h
                  HAVING count(*) BETWEEN 2 AND 20),
         mk AS (SELECT s.doc_id, s.h FROM sel s JOIN keep USING (h))
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                count(*) AS n_shared
         FROM mk a JOIN mk b ON a.h = b.h AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 5
         ORDER BY a_id, b_id""",
    // same pure boundary predicate (8-gram md5-slice ≡ 0 mod 64, cut
    // forced at position 1), chunk length from lead(); all values
    // positive so % agrees with Spark
    "llm_cdc_chunks" ->
      """WITH d AS (SELECT doc_id, lang, text, length(text) AS len
                    FROM documents WHERE length(text) >= 8),
         b AS (SELECT doc_id, lang, text, len, i
               FROM d, unnest(generate_series(1, len - 7)) t(i)
               WHERE i = 1 OR
                 CAST('0x' || substr(md5(substr(text, CAST(i AS INT), 8)),
                                     1, 6) AS BIGINT) % 64 = 0),
         c AS (SELECT doc_id, lang,
                      coalesce(lead(i) OVER (PARTITION BY doc_id ORDER BY i),
                               len + 1) - i AS clen,
                      md5(substr(text, CAST(i AS INT),
                        CAST(coalesce(lead(i) OVER (PARTITION BY doc_id
                                                    ORDER BY i),
                                      len + 1) - i AS INT))) AS ch
               FROM b)
         SELECT lang, count(*) AS n_chunks,
                count(DISTINCT ch) AS n_uniq,
                CAST(sum(clen) AS BIGINT) AS sum_len,
                CAST(max(clen) AS BIGINT) AS max_len
         FROM c GROUP BY lang ORDER BY lang""",
    "llm_dedup_minhash" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
             generate_series(1, len(w) - 2),
             i -> array_to_string(w[i:i+2], ' ')))) AS sg
           FROM d WHERE len(w) >= 3),
         bands AS (
           SELECT doc_id, 0 AS k,
                  min(substring(md5(sg), 1, 8)) || min(substring(md5(sg), 9, 8)) AS mh
           FROM sh GROUP BY doc_id
           UNION ALL
           SELECT doc_id, 1 AS k,
                  min(substring(md5(sg), 17, 8)) || min(substring(md5(sg), 25, 8)) AS mh
           FROM sh GROUP BY doc_id),
         cand AS (
           SELECT DISTINCT x.doc_id AS i, y.doc_id AS j
           FROM bands x JOIN bands y
             ON x.k = y.k AND x.mh = y.mh AND x.doc_id < y.doc_id),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         common AS (
           SELECT c.i, c.j, count(*) AS common
           FROM cand c
           JOIN sh a ON a.doc_id = c.i
           JOIN sh b ON b.doc_id = c.j AND b.sg = a.sg
           GROUP BY 1, 2)
         SELECT i, j, common, si.n AS ni, sj.n AS nj,
                CAST(floor(1000000.0 * (CAST(common AS DOUBLE) /
                  (si.n + sj.n - common))) AS BIGINT) AS jac_m
         FROM common
         JOIN sizes si ON si.doc_id = i
         JOIN sizes sj ON sj.doc_id = j
         WHERE CAST(common AS DOUBLE) / (si.n + sj.n - common) >= 0.5
         ORDER BY i, j""",
    // cross-generation spec: candidates pair an EVEN (indexed) doc with
    // an ODD (new-batch) doc sharing a band signature; verification is
    // the exact Jaccard over full shingle sets
    "llm_dedup_minhash_incr" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
             generate_series(1, len(w) - 2),
             i -> array_to_string(w[i:i+2], ' ')))) AS sg
           FROM d WHERE len(w) >= 3),
         bands AS (
           SELECT doc_id, 0 AS k,
                  min(substring(md5(sg), 1, 8)) || min(substring(md5(sg), 9, 8)) AS mh
           FROM sh GROUP BY doc_id
           UNION ALL
           SELECT doc_id, 1 AS k,
                  min(substring(md5(sg), 17, 8)) || min(substring(md5(sg), 25, 8)) AS mh
           FROM sh GROUP BY doc_id),
         cand AS (
           SELECT DISTINCT x.doc_id AS i, y.doc_id AS j
           FROM bands x JOIN bands y
             ON x.k = y.k AND x.mh = y.mh
           WHERE x.doc_id % 2 = 0 AND y.doc_id % 2 = 1),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         common AS (
           SELECT c.i, c.j, count(*) AS common
           FROM cand c
           JOIN sh a ON a.doc_id = c.i
           JOIN sh b ON b.doc_id = c.j AND b.sg = a.sg
           GROUP BY 1, 2)
         SELECT i, j, common, si.n AS ni, sj.n AS nj,
                CAST(floor(1000000.0 * (CAST(common AS DOUBLE) /
                  (si.n + sj.n - common))) AS BIGINT) AS jac_m
         FROM common
         JOIN sizes si ON si.doc_id = i
         JOIN sizes sj ON sj.doc_id = j
         WHERE CAST(common AS DOUBLE) / (si.n + sj.n - common) >= 0.5
         ORDER BY i, j""",
    "llm_dedup_keep" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
             generate_series(1, len(w) - 2),
             i -> array_to_string(w[i:i+2], ' ')))) AS sg
           FROM d WHERE len(w) >= 3),
         bands AS (
           SELECT doc_id, 0 AS k,
                  min(substring(md5(sg), 1, 8)) || min(substring(md5(sg), 9, 8)) AS mh
           FROM sh GROUP BY doc_id
           UNION ALL
           SELECT doc_id, 1 AS k,
                  min(substring(md5(sg), 17, 8)) || min(substring(md5(sg), 25, 8)) AS mh
           FROM sh GROUP BY doc_id),
         cand AS (
           SELECT DISTINCT x.doc_id AS i, y.doc_id AS j
           FROM bands x JOIN bands y
             ON x.k = y.k AND x.mh = y.mh AND x.doc_id < y.doc_id),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         common AS (
           SELECT c.i, c.j, count(*) AS common
           FROM cand c
           JOIN sh a ON a.doc_id = c.i
           JOIN sh b ON b.doc_id = c.j AND b.sg = a.sg
           GROUP BY 1, 2),
         drops AS (
           SELECT DISTINCT j AS doc_id
           FROM common
           JOIN sizes si ON si.doc_id = i
           JOIN sizes sj ON sj.doc_id = j
           WHERE CAST(common AS DOUBLE) / (si.n + sj.n - common) >= 0.5)
         SELECT doc_id, lang, source, n_chars
         FROM documents
         WHERE doc_id NOT IN (SELECT doc_id FROM drops)
         ORDER BY doc_id""",
    "llm_dedup_clusters" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
             generate_series(1, len(w) - 2),
             i -> array_to_string(w[i:i+2], ' ')))) AS sg
           FROM d WHERE len(w) >= 3),
         bands AS (
           SELECT doc_id, 0 AS k,
                  min(substring(md5(sg), 1, 8)) || min(substring(md5(sg), 9, 8)) AS mh
           FROM sh GROUP BY doc_id
           UNION ALL
           SELECT doc_id, 1 AS k,
                  min(substring(md5(sg), 17, 8)) || min(substring(md5(sg), 25, 8)) AS mh
           FROM sh GROUP BY doc_id),
         cand AS (
           SELECT DISTINCT x.doc_id AS i, y.doc_id AS j
           FROM bands x JOIN bands y
             ON x.k = y.k AND x.mh = y.mh AND x.doc_id < y.doc_id),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         common AS (
           SELECT c.i, c.j, count(*) AS common
           FROM cand c
           JOIN sh a ON a.doc_id = c.i
           JOIN sh b ON b.doc_id = c.j AND b.sg = a.sg
           GROUP BY 1, 2),
         pairs AS (
           SELECT i, j
           FROM common
           JOIN sizes si ON si.doc_id = i
           JOIN sizes sj ON sj.doc_id = j
           WHERE CAST(common AS DOUBLE) / (si.n + sj.n - common) >= 0.5),
         edges AS (
           SELECT i AS src, j AS dst FROM pairs
           UNION ALL SELECT j, i FROM pairs),
         walk(v, lab) AS (
           SELECT DISTINCT src AS v, src AS lab FROM edges
           UNION
           SELECT e.src, w.lab FROM edges e JOIN walk w ON w.v = e.dst)
         SELECT v AS doc_id, min(lab) AS cluster
         FROM walk GROUP BY v ORDER BY doc_id""",
    "llm_minhash_sig" ->
      """SELECT source,
                min(CAST('0x' || substring(md5(text), 1, 8) AS BIGINT)) AS h0,
                min(CAST('0x' || substring(md5(text), 9, 8) AS BIGINT)) AS h1,
                min(CAST('0x' || substring(md5(text), 17, 8) AS BIGINT)) AS h2,
                min(CAST('0x' || substring(md5(text), 25, 8) AS BIGINT)) AS h3
         FROM documents GROUP BY source ORDER BY source""",
    "llm_minhash_wide" ->
      """SELECT source,
                min(CAST('0x' || substring(md5(text), 1, 8) AS BIGINT)) AS h0,
                min(CAST('0x' || substring(md5(text), 9, 8) AS BIGINT)) AS h1,
                min(CAST('0x' || substring(md5(text), 17, 8) AS BIGINT)) AS h2,
                min(CAST('0x' || substring(md5(text), 25, 8) AS BIGINT)) AS h3,
                min(CAST('0x' || substring(md5('1' || text), 1, 8) AS BIGINT)) AS h4,
                min(CAST('0x' || substring(md5('1' || text), 9, 8) AS BIGINT)) AS h5,
                min(CAST('0x' || substring(md5('1' || text), 17, 8) AS BIGINT)) AS h6,
                min(CAST('0x' || substring(md5('1' || text), 25, 8) AS BIGINT)) AS h7
         FROM documents GROUP BY source ORDER BY source""",
    "llm_simhash" ->
      """WITH dw AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
           FROM documents),
         votes AS (
           SELECT doc_id, b,
                  CASE WHEN substring(md5(word), b + 1, 1)
                         IN ('8','9','a','b','c','d','e','f')
                       THEN 1 ELSE -1 END AS v
           FROM dw, (SELECT unnest(range(0, 16)) AS b)),
         bits AS (
           SELECT doc_id, b, CAST(sum(v) AS BIGINT) AS s
           FROM votes GROUP BY 1, 2)
         SELECT doc_id,
                CAST(sum(CASE WHEN s > 0
                  THEN CAST(power(2, b) AS BIGINT) ELSE 0 END) AS BIGINT)
                  AS simhash
         FROM bits GROUP BY 1 ORDER BY doc_id""",
    "llm_graph_rank" ->
      """WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
         e AS (
           SELECT doc_id AS u,
                  CAST('0x' || substring(md5(text), 1, 12) AS BIGINT) % m AS v
           FROM documents, mx
           UNION ALL
           SELECT doc_id,
                  CAST('0x' || substring(md5(text), 13, 12) AS BIGINT) % m
           FROM documents, mx),
         r0 AS (SELECT doc_id AS v, CAST(1000000 AS BIGINT) AS r
                FROM documents),
         c1 AS (SELECT e.v, CAST(sum((17 * r0.r) // 40) AS BIGINT) AS cs
                FROM e JOIN r0 ON r0.v = e.u GROUP BY e.v),
         r1 AS (SELECT r0.v, CAST(150000 + COALESCE(c1.cs, 0) AS BIGINT) AS r
                FROM r0 LEFT JOIN c1 ON c1.v = r0.v),
         c2 AS (SELECT e.v, CAST(sum((17 * r1.r) // 40) AS BIGINT) AS cs
                FROM e JOIN r1 ON r1.v = e.u GROUP BY e.v),
         r2 AS (SELECT r1.v, CAST(150000 + COALESCE(c2.cs, 0) AS BIGINT) AS r
                FROM r1 LEFT JOIN c2 ON c2.v = r1.v),
         c3 AS (SELECT e.v, CAST(sum((17 * r2.r) // 40) AS BIGINT) AS cs
                FROM e JOIN r2 ON r2.v = e.u GROUP BY e.v),
         r3 AS (SELECT r2.v, CAST(150000 + COALESCE(c3.cs, 0) AS BIGINT) AS r
                FROM r2 LEFT JOIN c3 ON c3.v = r2.v)
         SELECT v AS doc_id, r AS pr FROM r3 ORDER BY doc_id""",
    "llm_simhash_pairs" ->
      """WITH dw AS (
           SELECT doc_id, lang, source,
                  unnest(list_distinct(string_split(text, ' '))) AS word
           FROM documents),
         votes AS (
           SELECT doc_id, lang, source, b,
                  CASE WHEN substring(md5(word), b + 1, 1)
                         IN ('8','9','a','b','c','d','e','f')
                       THEN 1 ELSE -1 END AS v
           FROM dw, (SELECT unnest(range(0, 16)) AS b)),
         bits AS (
           SELECT doc_id, lang, source, b, CAST(sum(v) AS BIGINT) AS s
           FROM votes GROUP BY 1, 2, 3, 4),
         sig AS (
           SELECT doc_id, lang, source,
                  CAST(sum(CASE WHEN s > 0
                    THEN CAST(power(2, b) AS BIGINT) ELSE 0 END) AS BIGINT)
                    AS sh
           FROM bits GROUP BY 1, 2, 3)
         SELECT a.lang, a.source, a.doc_id AS i, b.doc_id AS j,
                CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS ham
         FROM sig a JOIN sig b
           ON a.lang = b.lang AND a.source = b.source
          AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.sh, b.sh)) <= 2
         ORDER BY a.lang, a.source, i, j""",
    "llm_decontaminate" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
             generate_series(1, len(w) - 2),
             i -> array_to_string(w[i:i+2], ' ')))) AS sg
           FROM d WHERE len(w) >= 3),
         bench AS (
           SELECT DISTINCT sg FROM sh WHERE doc_id % 17 = 0),
         sizes AS (
           SELECT doc_id, count(*) AS n_shingles
           FROM sh WHERE doc_id % 17 <> 0 GROUP BY 1),
         shared AS (
           SELECT s.doc_id, count(*) AS n_shared
           FROM sh s JOIN bench b ON s.sg = b.sg
           WHERE s.doc_id % 17 <> 0 GROUP BY 1)
         SELECT s.doc_id, z.n_shingles, s.n_shared,
                CAST(floor(1000000.0 * s.n_shared / z.n_shingles) AS BIGINT)
                  AS contam_m
         FROM shared s JOIN sizes z USING (doc_id)
         ORDER BY doc_id""",
    "llm_ngram_jaccard" ->
      """WITH d AS (
           SELECT doc_id, lang, source,
                  list_sort(list_distinct(list_transform(
                    list_distinct(list_transform(
                      generate_series(1, len(string_split(text, ' ')) - 1),
                      i -> array_to_string(string_split(text, ' ')[i:i+1], ' '))),
                    bg -> CAST('0x' || substring(md5(bg), 1, 15) AS BIGINT))))
                    AS gs
           FROM documents WHERE len(string_split(text, ' ')) >= 2)
         SELECT a.lang, a.source, a.doc_id AS i, b.doc_id AS j,
                CAST(len(list_intersect(a.gs, b.gs)) AS BIGINT) AS common,
                CAST(len(a.gs) AS BIGINT) AS ni,
                CAST(len(b.gs) AS BIGINT) AS nj,
                CAST(floor(1000000.0 * (CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE) /
                  (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs)))))
                  AS BIGINT) AS jac_m
         FROM d a JOIN d b
           ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         WHERE 21 * len(list_intersect(a.gs, b.gs)) >= len(a.gs) + len(b.gs)
         ORDER BY a.lang, a.source, i, j"""
  )
}
