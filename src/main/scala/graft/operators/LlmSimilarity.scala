package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor / similarity search over the `embeddings`
  * table (`embedding: array<float>[64]`, `label: int` — SURVEY.md §2.4).
  *
  * Three operators, ordered by scale posture:
  *  - llm_similar_topk: brute-force cosine top-k for a bounded query set —
  *    the correctness baseline. The tiny query side is broadcast; the corpus
  *    is scanned once, never shuffled; per-query top-k via window rank.
  *  - llm_similar_ivf: the 100 TB path. `label` plays the role of an IVF
  *    coarse-quantizer cell id: each vector probes only its own cell
  *    (nprobe=1), so the pairwise cost is Σ|cell|² instead of N². The join
  *    is a shuffle on the cell id — co-partitioned, bounded fan-out.
  *  - llm_embed_neardup: near-duplicate candidates as MUTUAL nearest
  *    neighbors within a cell — an equality self-join on the per-vector
  *    top-1 result, no additional pairwise work.
  *
  * Determinism: dot products accumulate float→double products left-to-right
  * (Spark `aggregate` over `zip_with`; DuckDB `list_sum` over an ascending
  * `generate_series` transform), so the doubles are bit-identical; cosines
  * are floor-scaled to cos_m = floor(1e6·cos) and ranked on (cos_m DESC,
  * vec_id) for engine-stable ordering.
  */
object LlmSimilarity extends Catalog {

  import graft.functions.VectorFunctions

  /** embeddings + precomputed squared norm (one narrow pass). The dot
    * kernel is the custom codegen'd [[graft.functions.FloatVecDot]] —
    * identical accumulation order to the `aggregate`/`zip_with` HOF form,
    * but a primitive loop instead of an interpreted lambda per element.
    */
  /** ±1 sign matrix for signed random projection, 16 output dims × 64
    * input dims. Seeded from md5("rp{i}_{j}") — the parity of the FIRST
    * hex nibble — because md5 is the one hash both engines share: the
    * oracle re-derives the identical matrix with SQL
    * `md5('rp'||i||'_'||j)`, so the projection is bit-exact
    * cross-engine. Computed once on the driver and folded into the plan
    * as a literal.
    */
  private lazy val rpSigns: Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 16).map { j =>
      (0 until 64).map { i =>
        val h = md.digest(s"rp${i}_${j}".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xf) % 2 == 0) 1 else -1
      }
    }
  }

  private def emb(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    table(s, dir, "embeddings")
      .withColumn("ss", VectorFunctions.vec_norm2(F.col("embedding")))
  }

  private def dot: Column =
    VectorFunctions.vec_dot(F.col("qe"), F.col("embedding"))

  /** floor-scaled cosine between (qe, qss) and (embedding, ss). */
  private val cosM: Column =
    F.floor(F.lit(1000000.0) *
      (dot / (F.sqrt(F.col("qss")) * F.sqrt(F.col("ss")))))

  /** Mutual top-1 neighbor pairs within an IVF cell — (i, j, cos_m) with
    * i < j. Shared by llm_embed_neardup (reported raw) and
    * llm_semantic_keep (thresholded into a drop set) so the candidate
    * definition cannot drift between the two.
    */
  private def mutualPairs(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.select(F.col("label"), F.col("vec_id").as("qid"),
      F.col("embedding").as("qe"), F.col("ss").as("qss"))
    val w = Window.partitionBy("qid")
      .orderBy(F.col("cos_m").desc, F.col("nb"))
    val top1 = q.join(e, "label")
      .filter(F.col("vec_id") =!= F.col("qid"))
      .select(F.col("qid"), F.col("vec_id").as("nb"), cosM.as("cos_m"))
      .withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") === 1)
      .select("qid", "nb", "cos_m")
      // both sides of the mutuality self-join shuffle on DIFFERENT keys
      // (x.nb vs y.qid), so exchange reuse cannot share the label join +
      // window pipeline — pin it once (r20 opt)
      .localCheckpoint()
    top1.as("x").join(top1.as("y"),
        F.col("x.nb") === F.col("y.qid") && F.col("y.nb") === F.col("x.qid") &&
          F.col("x.qid") < F.col("y.qid"))
      .select(F.col("x.qid").as("i"), F.col("x.nb").as("j"),
        F.col("x.cos_m").as("cos_m"))
  }

  /** Shared 3-pass integer Lloyd loop (see llm_embed_kmeans for the
    * determinism + scale rationale). Returns (corpus, assigned,
    * centroids): the quantized corpus (vec_id, qx, qx16), the final
    * assignment (vec_id, cid, qx) and the final 16×-sub-resolution
    * centroid means (cid, mvec) — all localCheckpoint()ed.
    */
  private[operators] def lloyd(s: SparkSession, dir: String,
      below: Option[Long] = None)
      : (DataFrame, DataFrame, DataFrame) =
    lloydFrom(s, table(s, dir, "embeddings"), below)

  /** [[lloyd]] over an arbitrary corpus frame with (vec_id, embedding)
    * columns — the SQL-surface index procedures train over a catalog
    * table instead of the testdata parquet (GraftAnnIndex). */
  private[graft] def lloydFrom(s: SparkSession, raw: DataFrame,
      below: Option[Long] = None)
      : (DataFrame, DataFrame, DataFrame) = {
    VectorFunctions.register(s)
    val corpus = raw
      // `below` trains over a vec_id prefix only — the day-1 corpus of
      // the incremental-index gate (seeds vec_id < 8 stay inside it)
      .filter(below.map(b => F.col("vec_id") < b).getOrElse(F.lit(true)))
      .select(F.col("vec_id"), F.expr(
        "transform(embedding, x -> " +
          "cast(floor(cast(x as double) * 10000.0) as bigint))").as("qx"))
      .withColumn("qx16", F.expr("transform(qx, v -> v * 16)"))
      .localCheckpoint() // scanned 3×: pin the quantized projection
    var centroids = corpus.filter(F.col("vec_id") < 8)
      .select(F.col("vec_id").as("cid"), F.col("qx16").as("mvec"))
    var assigned: DataFrame = corpus // placeholder; set in iteration 1
    for (it <- 1 to 3) {
      // distance kernel: codegen'd LongVecL2 (k×dims per row — the hot
      // loop), not the interpreted zip_with/aggregate lambda chain.
      // Argmin via min_by partial aggregation, NOT a window: the window
      // form shuffles all N·k crossed rows on vec_id per iteration,
      // while min_by collapses to one row per vector map-side (the k
      // candidates are adjacent after the broadcast cross join), so the
      // shuffle carries N rows. Ties break to the lowest cid via the
      // (d, cid) ordering struct — same as the oracle's ORDER BY d, cid.
      assigned = corpus.crossJoin(F.broadcast(centroids))
        .withColumn("d",
          VectorFunctions.vec_l2sq(F.col("qx16"), F.col("mvec")))
        .groupBy("vec_id", "qx")
        .agg(F.min_by(F.col("cid"), F.struct(F.col("d"), F.col("cid")))
          .as("cid"))
        .select("vec_id", "cid", "qx")
      // r20 note: deferring ALL intermediate checkpoints (fusing the
      // 3 iterations into one job) measured FASTER in isolated subsets
      // but consistently SLOWER across full 337-gate passes — the fused
      // chain's stages are structurally unique per iteration, so they
      // recompile under full-run codegen-cache pressure, while the
      // checkpointed loop reuses one compiled stage shape per iteration.
      // Per-iteration materialization stays; the counts-merge below is
      // the part that survives (one exchange + join fewer per step).
      assigned = assigned.localCheckpoint()
      // cluster size n rides the per-position sum aggregate (every
      // vector contributes exactly one row per pos, so the (cid, pos)
      // row count IS the cid's vector count) — the separate counts
      // aggregate + join per iteration removed one exchange each.
      val sums = assigned
        .select(F.col("cid"), F.posexplode(F.col("qx")).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(F.sum("v").as("sv"), F.count(F.lit(1)).as("n"))
      centroids = sums.groupBy("cid")
        .agg(F.expr(
          "transform(array_sort(collect_list(struct(pos, sv))), t -> t.sv)")
          .as("svec"),
          F.max("n").as("n"))
        .select(F.col("cid"), F.expr(
          "transform(svec, s -> (16 * s - (((16 * s) % n + n) % n)) div n)")
          .as("mvec"))
      centroids = centroids.localCheckpoint()
    }
    (corpus, assigned, centroids)
  }

  /** Shared PRODUCT-QUANTIZATION trainer: the 64-dim corpus splits into
    * m=8 contiguous 8-dim subspaces, each learning its own k=8 codebook
    * with a 2-pass integer Lloyd loop (the same exact-arithmetic trick
    * as [[lloyd]], keyed by the extra `sub` column — one grouped job
    * trains all 8 codebooks at once, not 8 loops). Returns
    *  - subs:     (vec_id, sub, sq1, sq16) quantized subvectors,
    *  - codes:    (vec_id, sub, cid, d) final assignment + its distance,
    *  - codebook: (sub, cid, mvec) 16×-resolution centroids.
    * A vector's PQ code is its 8 per-subspace cids — 3 bits each, so the
    * whole 64-dim float vector compresses to 24 bits + the shared
    * codebook (the m·k·(D/m) table). 100 TB shape: codebooks are ~tiny
    * (64 rows) and broadcast everywhere; training scans the corpus
    * twice with N·k·(D/m) products per subspace and shuffles one row
    * per (vector, subspace); nothing is ever pairwise.
    */
  private[operators] def pqTrain(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) =
    pqTrainFrom(s, table(s, dir, "embeddings"))

  /** [[pqTrain]] over an arbitrary (vec_id, embedding) corpus frame —
    * the `CALL system.build_pq_index` path. */
  private[graft] def pqTrainFrom(s: SparkSession, raw: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    VectorFunctions.register(s)
    val corpus = raw
      .select(F.col("vec_id"), F.expr(
        "transform(embedding, x -> " +
          "cast(floor(cast(x as double) * 10000.0) as bigint))").as("qx"))
    val subs = corpus
      .select(F.col("vec_id"), F.posexplode(F.expr(
        "transform(sequence(0, 7), s -> slice(qx, s * 8 + 1, 8))"))
        .as(Seq("sub", "sq1")))
      .withColumn("sq16", F.expr("transform(sq1, v -> v * 16)"))
      .localCheckpoint() // scanned every Lloyd pass: pin the projection
    var cb = subs.filter(F.col("vec_id") < 8)
      .select(F.col("sub"), F.col("vec_id").as("cid"),
        F.col("sq16").as("mvec"))
    var codes: DataFrame = subs // placeholder; set in iteration 1
    for (it <- 1 to 2) {
      codes = subs.join(F.broadcast(cb), "sub")
        .withColumn("d",
          VectorFunctions.vec_l2sq(F.col("sq16"), F.col("mvec")))
        .groupBy("vec_id", "sub", "sq1")
        .agg(F.min_by(F.col("cid"), F.struct(F.col("d"), F.col("cid")))
          .as("cid"),
          F.min("d").as("d"))
      // same r20 outcome as [[lloydFrom]]: per-iteration checkpoints
      // kept (full-run codegen-cache pressure penalizes fused chains);
      // the per-(sub, cid) size rides the per-position sum aggregate
      // instead of a separate counts aggregate + join
      codes = codes.localCheckpoint()
      val sums = codes
        .select(F.col("sub"), F.col("cid"),
          F.posexplode(F.col("sq1")).as(Seq("pos", "v")))
        .groupBy("sub", "cid", "pos")
        .agg(F.sum("v").as("sv"), F.count(F.lit(1)).as("n"))
      cb = sums.groupBy("sub", "cid")
        .agg(F.expr(
          "transform(array_sort(collect_list(struct(pos, sv))), t -> t.sv)")
          .as("svec"),
          F.max("n").as("n"))
        .select(F.col("sub"), F.col("cid"), F.expr(
          "transform(svec, s -> (16 * s - (((16 * s) % n + n) % n)) div n)")
          .as("mvec"))
      cb = cb.localCheckpoint()
    }
    (subs, codes, cb)
  }

  /** The IVF search plan shared by llm_similar_ivf_kmeans (index built
    * in-job) and llm_similar_ivf_persist (index read back from the
    * graft-avro sink): queries (vec_id < 20) probe their nprobe=6
    * nearest centroids, candidates are exact integer-L2 top-3 within the
    * probed cells.
    *
    * nprobe=6 of 8 cells is pinned by the AnnRecallSpec quality contract
    * (recall@3 ≥ 0.9 at BOTH sf0.01 and sf0.1, full-precision and
    * int8-quantized ranking). Measured recall@3 vs exhaustive
    * same-metric search at sf0.01 by nprobe: 1→0.55, 2→0.63, 3→0.77,
    * 4→0.88, 5→0.93 — but the 4x sf0.1 corpus measured 0.883 at
    * nprobe=5 (the synthetic embeddings are near-uniform, so recall
    * tracks the corpus fraction probed, with per-SF noise); 6 is the
    * smallest nprobe holding the floor at every asserted scale. On
    * clustered real-world embeddings the same plan holds recall at far
    * smaller nprobe/k fractions; the plan SHAPE (Σ_probed |cell|
    * candidates, never N²) is what scales.
    */
  private def ivfSearch(corpus: DataFrame, assigned: DataFrame,
      centroids: DataFrame, qBelow: Long = 20, nprobe: Int = 6,
      k: Int = 3): DataFrame =
    ivfSearchQ(
      corpus.filter(F.col("vec_id") < qBelow)
        .select(F.col("vec_id").as("qid"), F.col("qx16").as("qv")),
      corpus, assigned, centroids, nprobe, k, excludeSelf = true)

  /** The probe/candidate/top-k plan over an arbitrary QUERY frame
    * (qid, qv) — `qv` already in the corpus's 16×-quantized integer
    * space. `excludeSelf` drops candidates whose vec_id equals the qid
    * (corpus-internal queries must not retrieve themselves); EXTERNAL
    * query vectors pass false — their qid namespace is unrelated to
    * corpus ids, so an id collision must not silently drop a true
    * neighbor. */
  private def ivfSearchQ(queries: DataFrame, corpus: DataFrame,
      assigned: DataFrame, centroids: DataFrame, nprobe: Int, k: Int,
      excludeSelf: Boolean): DataFrame = {
    val wq = Window.partitionBy("qid").orderBy(F.col("d"), F.col("cid"))
    val probes = queries
      .crossJoin(F.broadcast(centroids))
      .withColumn("d", VectorFunctions.vec_l2sq(F.col("qv"), F.col("mvec")))
      .withColumn("rn", F.row_number().over(wq))
      .filter(F.col("rn") <= nprobe)
      .select("qid", "cid", "qv")
    val cells = assigned.select("vec_id", "cid")
      .join(corpus.select("vec_id", "qx16"), "vec_id")
    val wr = Window.partitionBy("qid").orderBy(F.col("d"), F.col("vec_id"))
    // the probe side is |queries|·nprobe rows — broadcast it so the
    // cell-id candidate join never shuffles the corpus
    val cand = F.broadcast(probes).join(cells, "cid")
    (if (excludeSelf) cand.filter(F.col("vec_id") =!= F.col("qid")) else cand)
      .select(F.col("qid"), F.col("vec_id"),
        VectorFunctions.vec_l2sq(F.col("qv"), F.col("qx16")).as("d"))
      .withColumn("rn", F.row_number().over(wr))
      .filter(F.col("rn") <= k)
      .orderBy("qid", "rn")
  }

  /** Build job: train the coarse quantizer and publish centroids + cell
    * assignments through the graft-avro sink. Returns the two artifact
    * directories.
    */
  private[operators] def buildIvfIndex(s: SparkSession, dir: String,
      into: Option[(String, String)] = None,
      below: Option[Long] = None): (String, String) =
    buildIvfIndexFrom(s, table(s, dir, "embeddings"), into, below)

  /** [[buildIvfIndex]] over an arbitrary (vec_id, embedding) corpus
    * frame — the `CALL system.build_ivf_index` path. */
  private[graft] def buildIvfIndexFrom(s: SparkSession, raw: DataFrame,
      into: Option[(String, String)] = None,
      below: Option[Long] = None): (String, String) = {
    val (cenDir, asgDir) = into.getOrElse(
      (tempDir("graft_ivf_centroids"), tempDir("graft_ivf_assign")))
    val (_, assigned, centroids) = lloydFrom(s, raw, below)
    centroids.select("cid", "mvec")
      .write.format("graft-avro").mode("overwrite").save(cenDir)
    assigned.select("vec_id", "cid")
      .write.format("graft-avro").mode("overwrite").save(asgDir)
    (cenDir, asgDir)
  }

  /** Day-2 INCREMENTAL index maintenance: assign a batch of NEW vectors
    * (vec_id >= `atOrAbove`) to the PERSISTED centroids — one broadcast
    * cross join + map-side argmin, zero Lloyd iterations, zero touches
    * of the existing assignment rows — and append the new (vec_id, cid)
    * rows to the assignment table. This is the path that keeps a 100 TB
    * ANN index serving while the corpus grows: train rarely, assign
    * per-append in O(batch × k) products; the coarse quantizer drifts
    * only as the distribution does (rebuild via [[buildIvfIndex]] when
    * recall decays).
    */
  private[operators] def appendIvfAssignments(s: SparkSession, dir: String,
      cenDir: String, asgDir: String, atOrAbove: Long,
      until: Option[Long] = None): Unit =
    appendIvfAssignmentsFrom(s, table(s, dir, "embeddings"), cenDir,
      asgDir, atOrAbove, until)

  /** [[appendIvfAssignments]] over an arbitrary (vec_id, embedding)
    * corpus frame — the `CALL system.append_ivf_assignments` path. */
  private[graft] def appendIvfAssignmentsFrom(s: SparkSession,
      raw: DataFrame, cenDir: String, asgDir: String, atOrAbove: Long,
      until: Option[Long] = None): Unit = {
    VectorFunctions.register(s)
    val fresh = raw
      .filter(F.col("vec_id") >= atOrAbove &&
        until.map(F.col("vec_id") < _).getOrElse(F.lit(true)))
      .select(F.col("vec_id"), F.expr(
        "transform(embedding, x -> " +
          "cast(floor(cast(x as double) * 10000.0) as bigint) * 16)")
        .as("qx16"))
    val centroids = s.read.format("graft-avro").load(cenDir)
    fresh.crossJoin(F.broadcast(centroids))
      .withColumn("d",
        VectorFunctions.vec_l2sq(F.col("qx16"), F.col("mvec")))
      .groupBy("vec_id")
      .agg(F.min_by(F.col("cid"), F.struct(F.col("d"), F.col("cid")))
        .as("cid"))
      .select("vec_id", "cid")
      .write.format("graft-avro").mode("append").save(asgDir)
  }

  /** Day-N LIST MAINTENANCE under skewed growth: incremental appends
    * ([[appendIvfAssignments]]) pile into whatever cells the frozen
    * quantizer routes them to, and a hot list degrades recall (a probe
    * that lands there scans a huge cell; probes elsewhere miss its
    * vectors). This pass splits every list past the τ=1× mean — strict
    * integer cross-multiplication `n·k > total`, no division to
    * mirror — 2-WAY via ONE assignment pass over ONLY the oversized
    * lists' members (seeds = the list's two lowest vec_ids; argmin with
    * ties to the lower seed; child centroids = the same 16×-resolution
    * integer means as [[lloyd]]). Publication touches nothing else:
    * centroids rewrite (a tiny broadcastable table — parents out,
    * children in, child ids allocated past the current max), while the
    * ASSIGNMENT table keeps every untouched file byte-identical — the
    * parents' rows die via a METADATA equality delete (sidecar, zero
    * rewrite) and the re-assigned rows append. 100 TB: cost is
    * O(Σ oversized |cell|) products + one append commit; recall repair
    * without retraining the quantizer (IvfRebalanceSpec holds the
    * recall contract after three skewed append rounds).
    * Returns the split parent cids (empty = balanced, nothing done).
    */
  private[operators] def rebalanceIvfLists(s: SparkSession, dir: String,
      cenDir: String, asgDir: String): Seq[Long] =
    rebalanceIvfListsFrom(s, table(s, dir, "embeddings"), cenDir, asgDir)

  /** [[rebalanceIvfLists]] over an arbitrary (vec_id, embedding) corpus
    * frame — the `CALL system.rebalance_ivf_index` path. */
  private[graft] def rebalanceIvfListsFrom(s: SparkSession, raw: DataFrame,
      cenDir: String, asgDir: String): Seq[Long] = {
    VectorFunctions.register(s)
    val assigned = s.read.format("graft-avro").load(asgDir)
    val centroids = s.read.format("graft-avro").load(cenDir)
    val counts = assigned.groupBy("cid").agg(F.count(F.lit(1)).as("n"))
      .localCheckpoint() // tiny (one row per list); read three times
    // one fused driver action for (total, k) instead of two (r21)
    val tk = counts.agg(F.sum("n"), F.count(F.lit(1))).head()
    val total = tk.getLong(0)
    val k = tk.getLong(1)
    // oversized list ids: bounded by k (the centroid count, small by
    // construction) — a safe driver collect
    val oversized = counts.filter(F.col("n") * k > F.lit(total))
      .select("cid").collect().map(_.getLong(0)).sorted.toSeq
    if (oversized.isEmpty) return Nil
    val maxCid = centroids.agg(F.max("cid")).head().getLong(0)
    val corpus = raw
      .select(F.col("vec_id"), F.expr(
        "transform(embedding, x -> " +
          "cast(floor(cast(x as double) * 10000.0) as bigint))").as("qx"))
      .withColumn("qx16", F.expr("transform(qx, v -> v * 16)"))
    // ONLY the oversized lists' members are ever read or rewritten
    val members = assigned.filter(F.col("cid").isin(oversized: _*))
      .join(corpus, "vec_id")
      .localCheckpoint() // read twice: seed pick + reassignment
    val wSeed = Window.partitionBy("cid").orderBy("vec_id")
    val seeds = members.withColumn("sn", F.row_number().over(wSeed))
      .filter(F.col("sn") <= 2)
      .select(F.col("cid"), F.col("sn"), F.col("qx16").as("svec"))
    import s.implicits._
    val ranks = oversized.zipWithIndex.toDF("cid", "rk")
    val newAsg = members.join(F.broadcast(seeds), "cid")
      .withColumn("d", VectorFunctions.vec_l2sq(F.col("qx16"), F.col("svec")))
      .groupBy("vec_id", "cid", "qx")
      .agg(F.min_by(F.col("sn"), F.struct(F.col("d"), F.col("sn")))
        .as("child"))
      .join(F.broadcast(ranks), "cid")
      .select(F.col("vec_id"),
        (F.lit(maxCid + 1) + F.col("rk") * 2 + (F.col("child") - 1))
          .cast("long").as("cid"),
        F.col("qx"))
      .localCheckpoint() // feeds both the append and the child means
    // child size rides the per-position sum aggregate (the lloydFrom r20
    // counts-merge: every member contributes one row per pos)
    val sums = newAsg
      .select(F.col("cid"), F.posexplode(F.col("qx")).as(Seq("pos", "v")))
      .groupBy("cid", "pos")
      .agg(F.sum("v").as("sv"), F.count(F.lit(1)).as("n"))
    val children = sums.groupBy("cid")
      .agg(F.expr(
        "transform(array_sort(collect_list(struct(pos, sv))), t -> t.sv)")
        .as("svec"),
        F.max("n").as("n"))
      .select(F.col("cid"), F.expr(
        "transform(svec, s -> (16 * s - (((16 * s) % n + n) % n)) div n)")
        .as("mvec"))
    // materialize BEFORE the same-directory overwrite (compactInPlace
    // rule: a lazy plan would scan cenDir mid-replace)
    centroids.filter(!F.col("cid").isin(oversized: _*))
      .unionByName(children)
      .localCheckpoint(true)
      .write.format("graft-avro").mode("overwrite").save(cenDir)
    graft.sources.AvroMaintenance.deleteWhere(s, asgDir, "cid", oversized)
    newAsg.select("vec_id", "cid")
      .write.format("graft-avro").mode("append").save(asgDir)
    oversized
  }

  /** Day-2 search job: everything below reads the PUBLISHED index — no
    * Lloyd iteration, no localCheckpoint. The corpus side is only the
    * deterministic qx16 quantization projection (narrow, loop-free).
    */
  private[operators] def searchPersistedIvf(s: SparkSession, dir: String,
      cenDir: String, asgDir: String): DataFrame =
    searchPersistedIvfFrom(s, table(s, dir, "embeddings"), cenDir, asgDir)

  /** [[searchPersistedIvf]] over an arbitrary (vec_id, embedding) corpus
    * frame with parametric probe shape — the `ivf_search(...)` TVF path
    * (queries = vec_id < qBelow, nprobe nearest lists, top-k). */
  private[graft] def searchPersistedIvfFrom(s: SparkSession, raw: DataFrame,
      cenDir: String, asgDir: String, qBelow: Long = 20, nprobe: Int = 6,
      k: Int = 3): DataFrame = {
    VectorFunctions.register(s)
    val corpus = raw
      .select(F.col("vec_id"), F.expr(
        "transform(embedding, x -> " +
          "cast(floor(cast(x as double) * 10000.0) as bigint) * 16)")
        .as("qx16"))
    val centroids = s.read.format("graft-avro").load(cenDir)
    val assigned = s.read.format("graft-avro").load(asgDir)
    ivfSearch(corpus, assigned, centroids, qBelow, nprobe, k)
  }

  /** EXTERNAL-query-vector IVF search (r19): the canonical ANN use —
    * "here is a NEW embedding, find its neighbors" — without inserting
    * the query into the corpus (which would mutate the index). Each
    * query vector is quantized EXACTLY as the corpus decode path
    * (float → double → ×10000 → floor → ×16) so its integer-L2
    * distances live in the same space as the stored assignments; no
    * self-exclusion (the qid namespace is the caller's, unrelated to
    * corpus ids). Queries fold into the plan as a LocalRelation —
    * zero training jobs, zero RDD leaves (AnnSqlSpec guards). */
  private[graft] def searchIvfVecFrom(s: SparkSession, raw: DataFrame,
      cenDir: String, asgDir: String, queries: Seq[(Long, Seq[Float])],
      nprobe: Int = 6, k: Int = 3): DataFrame = {
    import s.implicits._
    searchIvfFrameFrom(s, raw, cenDir, asgDir,
      queries.toDF("qid", "qvec"), nprobe, k)
  }

  /** [[searchIvfVecFrom]] over an arbitrary QUERY FRAME with
    * (qid, qvec) columns — the batch external-query path (a table of
    * fresh embeddings finds neighbors in one call; the query side
    * broadcasts, the corpus is never shuffled). */
  private[graft] def searchIvfFrameFrom(s: SparkSession, raw: DataFrame,
      cenDir: String, asgDir: String, queries: DataFrame,
      nprobe: Int = 6, k: Int = 3): DataFrame = {
    VectorFunctions.register(s)
    val corpus = raw
      .select(F.col("vec_id"), F.expr(
        "transform(embedding, x -> " +
          "cast(floor(cast(x as double) * 10000.0) as bigint) * 16)")
        .as("qx16"))
    val qdf = queries
      .select(F.col("qid").cast("long").as("qid"), F.expr(
        "transform(qvec, x -> " +
          "cast(floor(cast(x as double) * 10000.0) as bigint) * 16)")
        .as("qv"))
    val centroids = s.read.format("graft-avro").load(cenDir)
    val assigned = s.read.format("graft-avro").load(asgDir)
    ivfSearchQ(qdf, corpus, assigned, centroids, nprobe, k,
      excludeSelf = false)
  }

  /** EXTERNAL-query-vector ADC search (r19): the [[searchIvfVecFrom]]
    * counterpart for the PQ index — the query vector quantizes and
    * slices into the 8 subspaces exactly as the corpus path, builds its
    * distance table against the broadcast codebook, and ranks stored
    * codes by table-lookup sums. Full vectors untouched; no
    * self-exclusion. */
  private[graft] def searchPqVecFrom(s: SparkSession, cbDir: String,
      codesDir: String, queries: Seq[(Long, Seq[Float])],
      k: Int = 3): DataFrame = {
    import s.implicits._
    searchPqFrameFrom(s, cbDir, codesDir, queries.toDF("qid", "qvec"), k)
  }

  /** [[searchPqVecFrom]] over an arbitrary (qid, qvec) query frame —
    * batch external ADC queries. */
  private[graft] def searchPqFrameFrom(s: SparkSession, cbDir: String,
      codesDir: String, queries: DataFrame, k: Int = 3): DataFrame = {
    VectorFunctions.register(s)
    val qsubs = queries
      .select(F.col("qid").cast("long").as("qid"), F.expr(
        "transform(qvec, x -> " +
          "cast(floor(cast(x as double) * 10000.0) as bigint))").as("qx"))
      .select(F.col("qid"), F.posexplode(F.expr(
        "transform(sequence(0, 7), s -> slice(qx, s * 8 + 1, 8))"))
        .as(Seq("sub", "sq1")))
      .select(F.col("qid"), F.col("sub"),
        F.expr("transform(sq1, v -> v * 16)").as("sq16"))
    val cb = s.read.format("graft-avro").load(cbDir)
    val codes = s.read.format("graft-avro").load(codesDir)
    pqAdcSearch(qsubs, codes, cb, k, excludeSelf = false)
  }

  /** The ADC search plan shared by llm_similar_pq (codes/codebook from
    * the in-job trainer) and llm_similar_pq_persist (read back from the
    * graft-avro index artifacts): each query builds its m x k distance
    * table against the codebook (broadcast), every corpus code row
    * contributes one table lookup, partial-summed map-side into N rows
    * per query, top-3 by (adc_d, vec_id).
    */
  private def pqAdcSearch(qsubs: DataFrame, codes: DataFrame,
      cb: DataFrame, k: Int = 3, excludeSelf: Boolean = true): DataFrame = {
    val qdt = qsubs
      .join(F.broadcast(cb), "sub")
      .withColumn("dq",
        VectorFunctions.vec_l2sq(F.col("sq16"), F.col("mvec")))
      .select("qid", "sub", "cid", "dq")
    val looked = codes.select("vec_id", "sub", "cid")
      .join(F.broadcast(qdt), Seq("sub", "cid"))
    // external query vectors keep id-colliding corpus rows: their qid
    // namespace is the caller's, unrelated to corpus vec_ids
    val adc = (if (excludeSelf)
                 looked.filter(F.col("vec_id") =!= F.col("qid"))
               else looked)
      .groupBy("qid", "vec_id")
      .agg(F.sum("dq").as("adc_d"))
    val w = Window.partitionBy("qid")
      .orderBy(F.col("adc_d"), F.col("vec_id"))
    adc.withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= k)
      .select(F.col("qid"), F.col("rn"), F.col("vec_id"), F.col("adc_d"))
      .orderBy("qid", "rn")
  }

  /** Build job for the persisted PQ index: one pqTrain run, codebook +
    * codes published through the graft-avro sink. The pairing the
    * trainer defines (codes = last-pass assignment vs the previous
    * codebook, ADC tables vs the FINAL codebook) is preserved because
    * both artifacts are written from the same run.
    */
  private[operators] def buildPqIndex(s: SparkSession, dir: String,
      into: Option[(String, String)] = None): (String, String) =
    buildPqIndexFrom(s, table(s, dir, "embeddings"), into)

  /** [[buildPqIndex]] over an arbitrary (vec_id, embedding) corpus
    * frame — the `CALL system.build_pq_index` path. */
  private[graft] def buildPqIndexFrom(s: SparkSession, raw: DataFrame,
      into: Option[(String, String)] = None): (String, String) = {
    val (cbDir, codesDir) = into.getOrElse(
      (tempDir("graft_pq_codebook"), tempDir("graft_pq_codes")))
    val (_, codes, cb) = pqTrainFrom(s, raw)
    cb.select("sub", "cid", "mvec")
      .write.format("graft-avro").mode("overwrite").save(cbDir)
    codes.select("vec_id", "sub", "cid")
      .write.format("graft-avro").mode("overwrite").save(codesDir)
    (cbDir, codesDir)
  }

  /** Day-2 PQ search: codebook + codes read back from the published
    * index — zero Lloyd passes, zero localCheckpoint rounds; only the
    * deterministic query-subvector projection re-derives from the
    * corpus (PqPersistSpec plan-guards this).
    */
  private[operators] def searchPersistedPq(s: SparkSession, dir: String,
      cbDir: String, codesDir: String): DataFrame =
    searchPersistedPqFrom(s, table(s, dir, "embeddings"), cbDir, codesDir)

  /** [[searchPersistedPq]] over an arbitrary (vec_id, embedding) corpus
    * frame with parametric probe shape — the `pq_search(...)` TVF path
    * (queries = vec_id < qBelow, ADC top-k). */
  private[graft] def searchPersistedPqFrom(s: SparkSession, raw: DataFrame,
      cbDir: String, codesDir: String, qBelow: Long = 20,
      k: Int = 3): DataFrame = {
    VectorFunctions.register(s)
    val qsubs = raw
      .filter(F.col("vec_id") < qBelow)
      .select(F.col("vec_id"), F.expr(
        "transform(embedding, x -> " +
          "cast(floor(cast(x as double) * 10000.0) as bigint))").as("qx"))
      .select(F.col("vec_id"), F.posexplode(F.expr(
        "transform(sequence(0, 7), s -> slice(qx, s * 8 + 1, 8))"))
        .as(Seq("sub", "sq1")))
      .select(F.col("vec_id").as("qid"), F.col("sub"),
        F.expr("transform(sq1, v -> v * 16)").as("sq16"))
    val cb = s.read.format("graft-avro").load(cbDir)
    val codes = s.read.format("graft-avro").load(codesDir)
    pqAdcSearch(qsubs, codes, cb, k)
  }

  val queries: Map[String, Q] = Map(

    // Brute-force cosine top-5 for queries vec_id < 20 against the corpus.
    "llm_similar_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").as("qid"), F.col("embedding").as("qe"),
          F.col("ss").as("qss"))
      val w = Window.partitionBy("qid")
        .orderBy(F.col("cos_m").desc, F.col("vec_id"))
      e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") =!= F.col("qid"))
        .select(F.col("qid"), F.col("vec_id"), cosM.as("cos_m"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .orderBy("qid", "rn")
    }),

    // HARD-NEGATIVE MINING (contrastive training prep): for each query,
    // the top-3 most-similar vectors whose label DIFFERS — near the
    // anchor in embedding space but of another class, exactly the
    // negatives a contrastive loss wants. Broadcast query batch × corpus
    // scan (Q·N work, the honest shape for a bounded mining batch);
    // at full-corpus scale the candidate set restricts to IVF probes of
    // neighboring cells first, as in llm_similar_ivf_kmeans.
    "llm_hard_negatives" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").as("qid"), F.col("label").as("qlabel"),
          F.col("embedding").as("qe"), F.col("ss").as("qss"))
      val w = Window.partitionBy("qid")
        .orderBy(F.col("cos_m").desc, F.col("vec_id"))
      e.crossJoin(F.broadcast(q))
        .filter(F.col("label") =!= F.col("qlabel"))
        .select(F.col("qid"), F.col("vec_id"), cosM.as("cos_m"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("qid", "rn")
    }),

    // IVF probe: every vector searches its own label cell, top-3.
    "llm_similar_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.select(F.col("label"), F.col("vec_id").as("qid"),
        F.col("embedding").as("qe"), F.col("ss").as("qss"))
      val w = Window.partitionBy("qid")
        .orderBy(F.col("cos_m").desc, F.col("vec_id"))
      q.join(e, "label")
        .filter(F.col("vec_id") =!= F.col("qid"))
        .select(F.col("label"), F.col("qid"), F.col("vec_id"), cosM.as("cos_m"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("qid", "rn")
    }),

    // LSH-bucketed probe for UNLABELED data: an 8-bit random-hyperplane
    // signature buckets the corpus; each vector probes only its own
    // bucket, top-1. This is the scale path when no IVF cell id exists:
    // pairwise cost is Σ|bucket|² over ~2^bits buckets. The plane signs
    // are md5-hex-parity — CONSTANTS, so they are materialized driver-side
    // once (same md5 the oracle recomputes per row) and shipped as ±1
    // float-array literals; the signature is then 8 codegen'd vec_dot
    // calls per row instead of 512 interpreted per-row md5s.
    "llm_similar_lsh" -> ((s, dir) => {
      val dims = 64
      val planes: Seq[Seq[Float]] = (0 until 8).map { b =>
        (1 to dims).map { i =>
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest(s"p$b:$i".getBytes("UTF-8"))
          // first hex char is the high nibble of byte 0; '8'..'f' ⇔ >= 8
          if (((h(0) >> 4) & 0xf) >= 8) 1.0f else -1.0f
        }
      }
      val sig = (0 until 8).map { b =>
        F.when(VectorFunctions.vec_dot(F.col("embedding"),
          F.typedlit(planes(b))) > 0.0, 1L << b).otherwise(0L)
      }.reduce(_ + _)
      val e = emb(s, dir).withColumn("sig", sig)
      val q = e.select(F.col("sig"), F.col("vec_id").as("qid"),
        F.col("embedding").as("qe"), F.col("ss").as("qss"))
      val w = Window.partitionBy("qid")
        .orderBy(F.col("cos_m").desc, F.col("vec_id"))
      q.join(e, "sig")
        .filter(F.col("vec_id") =!= F.col("qid"))
        .select(F.col("sig"), F.col("qid"), F.col("vec_id"), cosM.as("cos_m"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") === 1)
        .select("sig", "qid", "vec_id", "cos_m")
        .orderBy("qid")
    }),

    // int8 scalar quantization — the storage/bandwidth half of a vector
    // index (embeddings ship as 1 byte/dim + 1 norm instead of 4 bytes/dim).
    // Each component maps to floor(127·x/‖v‖) clamped to [-127, 127]; the
    // gate emits integer summaries of the quantized vector (sum, min, max,
    // position-weighted checksum) plus the floor-scaled norm, so every
    // compared value is integer-exact. All per-row array work — zero
    // shuffle before the oracle ORDER BY. floor/div determinism: x and ‖v‖
    // are identical doubles in both engines (left-to-right float→double
    // accumulation + one IEEE sqrt), so the quotient and floor match
    // bit-for-bit.
    "llm_embed_quant" -> ((s, dir) =>
      emb(s, dir)
        .filter(F.col("ss") > 0.0)
        .withColumn("nrm", F.sqrt(F.col("ss")))
        .withColumn("q", F.expr(
          "transform(embedding, x -> greatest(cast(-127 as bigint), " +
            "least(cast(127 as bigint), floor(cast(x as double) / nrm * 127.0))))"))
        .select(F.col("vec_id"),
          F.floor(F.lit(1000000.0) * F.col("nrm")).as("norm_m"),
          F.expr("aggregate(q, cast(0 as bigint), (a, x) -> a + x)").as("qsum"),
          F.array_min(F.col("q")).as("qmin"),
          F.array_max(F.col("q")).as("qmax"),
          F.expr("aggregate(sequence(1, size(q)), cast(0 as bigint), " +
            "(a, i) -> a + element_at(q, i) * i)").as("qcheck"))
        .orderBy("vec_id")),

    // Signed random projection (Achlioptas/SRP): 64-dim float vectors →
    // 16 integer components via a data-independent ±1 matrix derived
    // from md5 (the shared cross-engine hash), quantized floor(1024·x)
    // so every multiply-accumulate is exact BIGINT arithmetic. The sign
    // matrix is a broadcast literal folded into codegen — per row the
    // projection is 16×64 integer MACs with NO shuffle and no driver
    // round-trip, which is the 100 TB-friendly way to cut embedding
    // dimensionality ahead of LSH banding or coarse clustering
    // (projection preserves angles in expectation; sign bits of these
    // components ARE a 16-bit SRP-LSH code). Output follows the
    // llm_embed_quant convention: leading components + order-weighted
    // checksum instead of raw arrays.
    "llm_embed_rproj" -> ((s, dir) => {
      val signsExpr = "array(" + rpSigns.map(r =>
        "array(" + r.mkString(",") + ")").mkString(",") + ")"
      table(s, dir, "embeddings")
        .withColumn("q", F.expr(
          "transform(embedding, x -> " +
            "cast(floor(1024.0d * cast(x as double)) as bigint))"))
        .withColumn("proj", F.expr(
          s"transform($signsExpr, r -> " +
            "aggregate(zip_with(r, q, (sg, qq) -> sg * qq), " +
            "cast(0 as bigint), (a, x) -> a + x))"))
        .select(F.col("vec_id"),
          F.expr("element_at(proj, 1)").as("p0"),
          F.expr("element_at(proj, 2)").as("p1"),
          F.expr("element_at(proj, 3)").as("p2"),
          F.expr("element_at(proj, 4)").as("p3"),
          F.expr("aggregate(proj, cast(0 as bigint), (a, x) -> a + x)")
            .as("psum"),
          F.array_min(F.col("proj")).as("pmin"),
          F.array_max(F.col("proj")).as("pmax"),
          F.expr("aggregate(sequence(1, size(proj)), cast(0 as bigint), " +
            "(a, i) -> a + element_at(proj, i) * i)").as("pcheck"))
        .orderBy("vec_id")
    }),

    // Near-dup candidates: mutual top-1 neighbors within a cell.
    "llm_embed_neardup" -> ((s, dir) =>
      mutualPairs(s, dir).orderBy("i")),

    // SEMANTIC DEDUP KEEP LIST: the near-dup pairs turned into an actual
    // dedup decision — for every mutual-NN pair with cos_m ≥ 0.3 the
    // larger id drops, everything else survives. The drop set is tiny
    // (bounded by pair count) so the anti join broadcasts; the corpus is
    // scanned once. This is the embedding-space analogue of
    // llm_dedup_keep's MinHash survivor list.
    "llm_semantic_keep" -> ((s, dir) => {
      val drops = mutualPairs(s, dir)
        .filter(F.col("cos_m") >= 300000)
        .select(F.col("j").as("vec_id")).distinct()
      emb(s, dir).select("vec_id", "label")
        .join(F.broadcast(drops), Seq("vec_id"), "left_anti")
        .orderBy("vec_id")
    }),

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    // pairwise cosine WITHIN LEARNED k-means clusters — the
    // unlabeled-corpus scale path (llm_semantic_keep's mutual-NN runs
    // inside pre-labeled cells; this one clusters first, then drops
    // every pair member above the similarity threshold). All exact
    // integer: cos(x,y) >= τ decided by cross-multiplication
    // 10^4·dot² >= τ²·10^4·n2x·n2y (dot > 0), promoted to DECIMAL(38,0)
    // — dot ≤ 64·10^8 so dot²·10^4 ≈ 4e23 stays exact in 38 digits on
    // BOTH engines (DuckDB computes the mirror in HUGEINT). The dot
    // comes from the codegen'd vec_l2sq identity dot = (n2x+n2y−d²)/2
    // (always even, so truncating div == floor div). 100 TB shape:
    // pairwise cost is Σ|cluster|² — bounded by the cluster count you
    // train, never corpus², and each pair is ONE codegen'd L2 kernel;
    // per-vector norms compute once before the join.
    "llm_semdedup" -> ((s, dir) => {
      val (_, assigned, _) = lloyd(s, dir)
      val withN2 = assigned.withColumn("n2", F.expr(
        "aggregate(transform(qx, v -> v * v), cast(0 as bigint), " +
          "(a, v) -> a + v)"))
        .localCheckpoint()
      val x = withN2.select(F.col("cid"), F.col("vec_id").as("i"),
        F.col("qx").as("xi"), F.col("n2").as("n2i"))
      val y = withN2.select(F.col("cid"), F.col("vec_id").as("j"),
        F.col("qx").as("xj"), F.col("n2").as("n2j"))
      val pairs = x.join(y, Seq("cid"))
        .filter(F.col("i") < F.col("j"))
        .withColumn("d2", VectorFunctions.vec_l2sq(F.col("xi"), F.col("xj")))
        .withColumn("dot", F.expr("(n2i + n2j - d2) div 2"))
      val drops = pairs
        .filter(F.col("dot") > 0 &&
          F.col("dot").cast("decimal(38,0)") * F.col("dot") * F.lit(10000L)
            >= F.lit(1225L).cast("decimal(38,0)") * F.col("n2i") *
              F.col("n2j"))
        .select(F.col("j").as("vec_id")).distinct()
      assigned
        .join(F.broadcast(drops.withColumn("dropped", F.lit(1L))),
          Seq("vec_id"), "left")
        .groupBy("cid")
        .agg(F.count(F.lit(1)).as("n_members"),
          F.sum(F.coalesce(F.col("dropped"), F.lit(0L))).as("n_dropped"),
          F.sum(F.when(F.col("dropped").isNull, F.col("vec_id"))
            .otherwise(0L)).as("keep_sum"))
        .orderBy("cid")
    }),

    // LLOYD-ITERATED K-MEANS (3 fixed iterations): the full iterative-ML
    // loop under the oracle — assign to nearest centroid, recompute means,
    // reassign — the shape llm_dedup_clusters proves for graphs. All
    // arithmetic is EXACT INTEGER so the loop is cross-engine bit-stable:
    //  - corpus components quantize once to qx = floor(1e4·x) (BIGINT; one
    //    IEEE op from the shared float, so floors agree);
    //  - centroids live at 16× sub-resolution (mvec = floorDiv(16·Σqx, n),
    //    floorDiv spelled via positive-mod so Spark `div` truncation and
    //    DuckDB `//` agree — the numerator is made exactly divisible);
    //  - distances are Σ(16·qx − mvec)², BIGINT, order-independent (max
    //    |qx|≈6e3 ⇒ dist ≤ 64·(1.9e5)² ≈ 2e12 ≪ 2^63), ties → lowest cid.
    // 100 TB shape: centroids (k≤8 rows) broadcast each pass; the corpus
    // is scanned once per iteration with N·k products and no pairwise
    // blow-up; the mean update is posexplode + partial-agg (≤ k·dims rows
    // per partition reach the shuffle); every iteration's tiny centroid
    // table is localCheckpoint()ed so the loop never replans its history.
    "llm_embed_kmeans" -> ((s, dir) => {
      val (_, assigned, centroids) = lloyd(s, dir)
      assigned.groupBy("cid")
        .agg(F.count(F.lit(1)).as("n_members"),
          F.min("vec_id").as("first_vec"),
          F.max("vec_id").as("last_vec"))
        .join(F.broadcast(centroids), "cid")
        .select(F.col("cid"), F.col("n_members"), F.col("first_vec"),
          F.col("last_vec"),
          F.expr("aggregate(mvec, cast(0 as bigint), (a, v) -> a + v)")
            .as("c_sum"),
          F.expr("aggregate(sequence(1, size(mvec)), cast(0 as bigint), " +
            "(a, i) -> a + element_at(mvec, i) * i)").as("c_check"))
        .orderBy("cid")
    }),

    // IVF SEARCH OVER LEARNED CELLS: the full two-operator ANN
    // composition — the 3-pass Lloyd loop trains the coarse quantizer,
    // then queries (vec_id < 20) probe their nprobe=6 nearest cells and
    // exact-rank the candidates inside them (top-3 by integer L2,
    // vec_id tie-break). Unlike llm_similar_ivf (which inherits the
    // `label` column as its cell id) this is the real unlabeled-data
    // scale path: cells come from the data itself. 100 TB shape: the
    // corpus is assigned ONCE (broadcast centroids, one shuffle on cell
    // id), each query fans out to exactly nprobe cells, candidate cost
    // is Σ_probed |cell| — never N² — and every distance is the
    // codegen'd vec_l2sq kernel.
    "llm_similar_ivf_kmeans" -> ((s, dir) => {
      val (corpus, assigned, centroids) = lloyd(s, dir)
      ivfSearch(corpus, assigned, centroids)
    }),

    // BUILD ONCE, SEARCH MANY — the deployment shape of the IVF index.
    // The build job trains the coarse quantizer (the one Lloyd loop) and
    // PUBLISHES centroids + cell assignments through the engine's own
    // graft-avro sink; the day-2 search job reads those artifacts back
    // from files and runs the exact llm_similar_ivf_kmeans search plan —
    // zero Lloyd iterations, zero localCheckpoint rounds (IvfPersistSpec
    // plan-guards the search side: index from BatchScan, no ExistingRDD).
    // Only the cheap deterministic qx16 projection re-derives from the
    // corpus — vectors live in the lake; the index persists the LEARNED
    // structure. Sharing ivfSearch with the in-job gate plus the shared
    // oracle pins day-2 search equality. 100 TB: the train cost is paid
    // once per index version, every nightly search is a broadcast-probe
    // candidate join over Σ_probed |cell| rows.
    "llm_similar_ivf_persist" -> ((s, dir) => {
      val (cenDir, asgDir) = buildIvfIndex(s, dir)
      searchPersistedIvf(s, dir, cenDir, asgDir)
    }),

    // INCREMENTAL index maintenance (r16) — the day-2 APPEND path: the
    // index trains once over the day-1 half of the corpus, the other
    // half arrives later and ASSIGNS to the persisted centroids (one
    // broadcast cross join + map-side argmin — zero Lloyd jobs,
    // IvfPersistSpec plan-guards it) with the new (vec_id, cid) rows
    // APPENDED to the assignment table. The search then serves over
    // the merged assignments: appended vectors are immediately
    // retrievable, nothing was retrained, nothing rewritten. 100 TB:
    // per-append cost is O(batch x k) products + one append commit —
    // the only sane maintenance cadence for a continuously-ingesting
    // embedding corpus (retrain on recall decay, not per batch).
    "llm_similar_ivf_incr" -> ((s, dir) => {
      val cut = table(s, dir, "embeddings").count() / 2
      val (cenDir, asgDir) = buildIvfIndex(s, dir, below = Some(cut))
      appendIvfAssignments(s, dir, cenDir, asgDir, atOrAbove = cut)
      searchPersistedIvf(s, dir, cenDir, asgDir)
    }),

    // LIST REBALANCE after skewed growth (r17): the day-1 index absorbs
    // THREE append rounds against frozen centroids (batch boundaries
    // are invisible to the per-vector argmin, so the oracle assigns the
    // whole tail once), then every list past the 1× mean splits 2-way
    // via one assignment pass over ONLY its members — parents die by a
    // METADATA equality delete, children append, untouched assignment
    // files stay byte-identical (IvfRebalanceSpec pins that and the
    // recall contract). The search then serves over the rebalanced
    // index; n_split pins that the split actually fired in BOTH
    // engines. 100 TB: recall repair costs O(Σ oversized |cell|), not
    // a retrain.
    "llm_similar_ivf_rebalance" -> ((s, dir) => {
      val n = table(s, dir, "embeddings").count()
      val cut = n / 2
      val (cenDir, asgDir) = buildIvfIndex(s, dir, below = Some(cut))
      val b = (n - cut) / 3
      appendIvfAssignments(s, dir, cenDir, asgDir, cut, Some(cut + b))
      appendIvfAssignments(s, dir, cenDir, asgDir, cut + b,
        Some(cut + 2 * b))
      appendIvfAssignments(s, dir, cenDir, asgDir, cut + 2 * b)
      val split = rebalanceIvfLists(s, dir, cenDir, asgDir)
      searchPersistedIvf(s, dir, cenDir, asgDir)
        .withColumn("n_split", F.lit(split.size))
    }),

    // SQL-SURFACE ANN LIFECYCLE (r18): the full persisted-index story —
    // CREATE the corpus table, CALL system.build_ivf_index, three
    // INSERT + CALL system.append_ivf_assignments rounds, CALL
    // system.rebalance_ivf_index, then SELECT FROM the ivf_search(...)
    // TVF — with every step a spark.sql statement, so a SQL-only user
    // reaches build-once/search-many ANN without writing Scala. The
    // flow mirrors llm_similar_ivf_rebalance exactly (same cut/batch
    // boundaries, same corpus rows through the graft-avro roundtrip —
    // float→double quantization is value-identical), so the rebalance
    // oracle applies verbatim. The index records its corpus ref +
    // column names in a sidecar; search resolves everything from the
    // index name (AnnSqlSpec plan-guards zero training jobs in the
    // TVF expansion).
    "llm_similar_ivf_sql" -> ((s, dir) => {
      if (s.conf.getOption("spark.sql.catalog.graft_gate").isEmpty) {
        s.conf.set("spark.sql.catalog.graft_gate",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.graft_gate.root",
          tempDir("graft_gate_cat"))
      }
      val n = table(s, dir, "embeddings").count()
      val cut = n / 2
      val b = (n - cut) / 3
      table(s, dir, "embeddings").select("vec_id", "embedding")
        .createOrReplaceTempView("emb_src_sql")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_gate.ann")
      s.sql("DROP TABLE IF EXISTS graft_gate.ann.ivfidx_centroids")
      s.sql("DROP TABLE IF EXISTS graft_gate.ann.ivfidx_assign")
      s.sql("DROP TABLE IF EXISTS graft_gate.ann.emb")
      s.sql("CREATE TABLE graft_gate.ann.emb AS " +
        s"SELECT * FROM emb_src_sql WHERE vec_id < $cut")
      s.sql("CALL graft_gate.system.build_ivf_index('ann.emb', " +
        "'vec_id', 'embedding', 'ann.ivfidx')")
      s.sql("INSERT INTO graft_gate.ann.emb SELECT * FROM emb_src_sql " +
        s"WHERE vec_id >= $cut AND vec_id < ${cut + b}")
      s.sql("CALL graft_gate.system.append_ivf_assignments(" +
        s"'ann.ivfidx', $cut, ${cut + b})")
      s.sql("INSERT INTO graft_gate.ann.emb SELECT * FROM emb_src_sql " +
        s"WHERE vec_id >= ${cut + b} AND vec_id < ${cut + 2 * b}")
      s.sql("CALL graft_gate.system.append_ivf_assignments(" +
        s"'ann.ivfidx', ${cut + b}, ${cut + 2 * b})")
      s.sql("INSERT INTO graft_gate.ann.emb SELECT * FROM emb_src_sql " +
        s"WHERE vec_id >= ${cut + 2 * b}")
      s.sql("CALL graft_gate.system.append_ivf_assignments(" +
        s"'ann.ivfidx', ${cut + 2 * b})")
      val nSplit = s.sql(
        "CALL graft_gate.system.rebalance_ivf_index('ann.ivfidx')")
        .head().getLong(0)
      s.sql("SELECT qid, vec_id, d, rn FROM " +
        "ivf_search('graft_gate.ann.ivfidx', 20, 6, 3) ORDER BY qid, rn")
        .withColumn("n_split", F.lit(nSplit).cast("int"))
    }),

    // EXTERNAL-QUERY-VECTOR ANN (r19): the canonical search call —
    // "here is a NEW embedding, find its neighbors" — through the SQL
    // surface, WITHOUT inserting the query into the corpus (an insert
    // would mutate the index; the r18 surface only ranked
    // corpus-internal ids). Three deterministic query vectors (exact
    // quarters, so float→double→×10000→floor quantizes bit-identically
    // in both engines) splice into `ivf_search('idx', array(…), 6, 3)`
    // as literal arrays; the TVF quantizes them exactly as the corpus
    // decode path and probes the persisted index with ZERO training
    // jobs (AnnSqlSpec plan-guards). No self-exclusion: an external
    // query's id namespace is unrelated to corpus vec_ids. The oracle
    // re-derives the same vectors in a CTE and probes the same trained
    // index (lloydCte), sharing the qcell/cand shape with ivfSearchSql.
    "llm_similar_ivf_qvec" -> ((s, dir) => {
      if (s.conf.getOption("spark.sql.catalog.graft_gate").isEmpty) {
        s.conf.set("spark.sql.catalog.graft_gate",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.graft_gate.root",
          tempDir("graft_gate_cat"))
      }
      table(s, dir, "embeddings").select("vec_id", "embedding")
        .createOrReplaceTempView("emb_src_qv")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_gate.ann")
      s.sql("DROP TABLE IF EXISTS graft_gate.ann.qvidx_centroids")
      s.sql("DROP TABLE IF EXISTS graft_gate.ann.qvidx_assign")
      s.sql("DROP TABLE IF EXISTS graft_gate.ann.qvemb")
      s.sql("CREATE TABLE graft_gate.ann.qvemb AS SELECT * FROM emb_src_qv")
      s.sql("CALL graft_gate.system.build_ivf_index('ann.qvemb', " +
        "'vec_id', 'embedding', 'ann.qvidx')")
      (0L to 2L).map { q =>
        val arr = qvecVals(q).map(v => BigDecimal(v.toDouble).toString)
          .mkString("array(", ", ", ")")
        s.sql("SELECT vec_id, d, rn FROM " +
          s"ivf_search('graft_gate.ann.qvidx', $arr, 6, 3)")
          .withColumn("qid", F.lit(q))
      }.reduce(_ unionByName _)
        .select("qid", "vec_id", "d", "rn")
        .orderBy("qid", "rn")
    }),

    // PRODUCT QUANTIZATION — the codebook compression layout (Jégou et
    // al., the standard ANN storage beyond scalar int8): 8 per-subspace
    // k=8 codebooks trained in ONE grouped integer-Lloyd job, every
    // 64-dim vector reduced to 8 cell ids (24 bits, a 85x compression
    // of the float vector). Reported per (sub, cid): membership, the
    // 16x-resolution centroid checksums, and the summed assignment
    // distortion — the quantity PQ training minimizes, exactly-integer
    // here so the oracle pins the whole trainer.
    "llm_embed_pq" -> ((s, dir) => {
      val (_, codes, cb) = pqTrain(s, dir)
      codes.groupBy("sub", "cid")
        .agg(F.count(F.lit(1)).as("n_members"),
          F.min("vec_id").as("first_vec"),
          F.sum("d").as("distortion"))
        .join(F.broadcast(cb), Seq("sub", "cid"))
        .select(F.col("sub"), F.col("cid"), F.col("n_members"),
          F.col("first_vec"), F.col("distortion"),
          F.expr("aggregate(mvec, cast(0 as bigint), (a, v) -> a + v)")
            .as("c_sum"),
          F.expr("aggregate(sequence(1, size(mvec)), cast(0 as bigint), " +
            "(a, i) -> a + element_at(mvec, i) * i)").as("c_check"))
        .orderBy("sub", "cid")
    }),

    // ADC SEARCH OVER PQ CODES — the search half of product
    // quantization: each query builds a tiny m x k distance table
    // (64 integer L2 entries against the codebooks), and every corpus
    // vector's approximate distance is the SUM OF 8 TABLE LOOKUPS on
    // its stored code — the float vectors are never touched at query
    // time. 100 TB shape: the distance tables (queries x 64 rows)
    // broadcast to the codes table; the scan is one pass over N·m code
    // rows, grouped map-side into N partial sums per query; top-3 by
    // (adc_d, vec_id) via window rank. The oracle replays table build,
    // lookup join, and ranking exactly — integer end to end.
    "llm_similar_pq" -> ((s, dir) => {
      val (subs, codes, cb) = pqTrain(s, dir)
      pqAdcSearch(subs.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").as("qid"), F.col("sub"), F.col("sq16")),
        codes, cb)
    }),

    // BUILD ONCE, SEARCH MANY for the PQ index — the same deployment
    // shape as llm_similar_ivf_persist: the build job trains all 8
    // codebooks once and publishes codebook + codes through the
    // graft-avro sink; day-2 ADC search reloads them with ZERO Lloyd
    // passes (plan-guarded by PqPersistSpec — no LogicalRDD in the
    // search plan). Shares pqAdcSearch and the DuckDB oracle with the
    // in-job gate, pinning day-2 equality. 100 TB: the 85x-compressed
    // codes table is the only per-vector state the nightly search
    // touches; the codebook (64 rows) broadcasts.
    "llm_similar_pq_persist" -> ((s, dir) => {
      val (cbDir, codesDir) = buildPqIndex(s, dir)
      searchPersistedPq(s, dir, cbDir, codesDir)
    }),

    // SQL-SURFACE PQ LIFECYCLE (r18): CREATE the corpus table, CALL
    // system.build_pq_index, SELECT FROM the pq_search(...) TVF —
    // the llm_similar_ivf_sql pattern for the compressed-codes index,
    // so a SQL-only user reaches ADC search too. Shares the PQ oracle
    // with the in-job and persisted gates (the graft-avro roundtrip is
    // value-identical for the float embeddings); AnnSqlSpec plan-guards
    // zero training jobs in the TVF expansion.
    "llm_similar_pq_sql" -> ((s, dir) => {
      if (s.conf.getOption("spark.sql.catalog.graft_gate").isEmpty) {
        s.conf.set("spark.sql.catalog.graft_gate",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.graft_gate.root",
          tempDir("graft_gate_cat"))
      }
      table(s, dir, "embeddings").select("vec_id", "embedding")
        .createOrReplaceTempView("emb_src_pqsql")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_gate.ann")
      s.sql("DROP TABLE IF EXISTS graft_gate.ann.pqidx_codebook")
      s.sql("DROP TABLE IF EXISTS graft_gate.ann.pqidx_codes")
      s.sql("DROP TABLE IF EXISTS graft_gate.ann.pqemb")
      s.sql("CREATE TABLE graft_gate.ann.pqemb AS " +
        "SELECT * FROM emb_src_pqsql")
      s.sql("CALL graft_gate.system.build_pq_index('ann.pqemb', " +
        "'vec_id', 'embedding', 'ann.pqidx')")
      s.sql("SELECT qid, rn, vec_id, adc_d FROM " +
        "pq_search('graft_gate.ann.pqidx', 20, 3) ORDER BY qid, rn")
    }),

    // PQ SHORTLIST + EXACT RE-RANK — the deployed two-stage composition
    // (FAISS's IndexPQ + refine): the ADC scan produces a cheap
    // 100-candidate shortlist per query from codes alone, then ONLY the
    // shortlist re-ranks with exact integer L2 on the real vectors.
    // Measured at sf0.01: the shortlist holds 87% of the exhaustive
    // top-3 while touching full vectors for 20% of the corpus
    // (PqRecallSpec pins the floor; on this near-uniform synthetic
    // corpus containment tracks the fraction shortlisted — real
    // clustered embeddings concentrate much faster). 100 TB shape: the
    // expensive exact kernel runs on queries x 100 rows, everything
    // upstream is the broadcast-table ADC scan.
    "llm_similar_pq_rerank" -> ((s, dir) => {
      val (subs, codes, cb) = pqTrain(s, dir)
      val qdt = subs.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").as("qid"), F.col("sub"), F.col("sq16"))
        .join(F.broadcast(cb), "sub")
        .withColumn("dq",
          VectorFunctions.vec_l2sq(F.col("sq16"), F.col("mvec")))
        .select("qid", "sub", "cid", "dq")
      val adc = codes.select("vec_id", "sub", "cid")
        .join(F.broadcast(qdt), Seq("sub", "cid"))
        .filter(F.col("vec_id") =!= F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("dq").as("adc_d"))
      val wAdc = Window.partitionBy("qid")
        .orderBy(F.col("adc_d"), F.col("vec_id"))
      val shortlist = adc.withColumn("srn", F.row_number().over(wAdc))
        .filter(F.col("srn") <= 100).select("qid", "vec_id")
      // exact re-rank: full 64-dim vectors touched ONLY for the shortlist
      val full = table(s, dir, "embeddings")
        .select(F.col("vec_id"), F.expr(
          "transform(embedding, x -> " +
            "cast(floor(cast(x as double) * 10000.0) as bigint) * 16)")
          .as("v16"))
      val qv = full.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").as("qid"), F.col("v16").as("qv"))
      val wEx = Window.partitionBy("qid")
        .orderBy(F.col("exact_d"), F.col("vec_id"))
      shortlist.join(full, "vec_id").join(F.broadcast(qv), "qid")
        .withColumn("exact_d",
          VectorFunctions.vec_l2sq(F.col("v16"), F.col("qv")))
        .withColumn("rn", F.row_number().over(wEx))
        .filter(F.col("rn") <= 3)
        .select(F.col("qid"), F.col("rn"), F.col("vec_id"),
          F.col("exact_d"))
        .orderBy("qid", "rn")
    }),

    // IVF SEARCH OVER THE int8 STORAGE LAYOUT — the production
    // composition a curation pipeline actually deploys: coarse
    // quantizer = the Lloyd cells, candidate re-rank = integer L2 over
    // llm_embed_quant's int8 vectors (1 byte/dim shipped, not 4). All
    // quantized components are BIGINTs derived by floor semantics both
    // engines share (proven by llm_embed_quant), so the search is
    // oracle-deterministic end to end; AnnRecallSpec pins recall@3 ≥
    // 0.9 of THIS gate's plan against exhaustive full-precision truth
    // at sf0.01 and sf0.1. Same 100 TB shape as llm_similar_ivf_kmeans:
    // broadcast probes, Σ_probed |cell| candidates, never N².
    "llm_similar_ivf_quant" -> ((s, dir) => {
      val (corpus, assigned, centroids) = lloyd(s, dir)
      val q8 = emb(s, dir)
        .filter(F.col("ss") > 0.0)
        .withColumn("nrm", F.sqrt(F.col("ss")))
        .withColumn("q8", F.expr(
          "transform(embedding, x -> greatest(cast(-127 as bigint), " +
            "least(cast(127 as bigint), floor(cast(x as double) / nrm * 127.0))))"))
        .select("vec_id", "q8")
      val wq = Window.partitionBy("qid").orderBy(F.col("d"), F.col("cid"))
      val probes = corpus.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").as("qid"), F.col("qx16").as("qv"))
        .crossJoin(F.broadcast(centroids))
        .withColumn("d", VectorFunctions.vec_l2sq(F.col("qv"), F.col("mvec")))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 6)
        .select("qid", "cid")
        .join(q8.select(F.col("vec_id").as("qid"), F.col("q8").as("qq8")),
          "qid")
      val cells = assigned.select("vec_id", "cid").join(q8, "vec_id")
      val wr = Window.partitionBy("qid").orderBy(F.col("d"), F.col("vec_id"))
      F.broadcast(probes).join(cells, "cid")
        .filter(F.col("vec_id") =!= F.col("qid"))
        .select(F.col("qid"), F.col("vec_id"),
          VectorFunctions.vec_l2sq(F.col("qq8"), F.col("q8")).as("d"))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 3)
        .orderBy("qid", "rn")
    }),

    // IVF + PQ — the full FAISS-style IVFPQ composition (by_residual
    // off): the coarse Lloyd quantizer restricts candidates to nprobe=6
    // probed cells, the PQ codebooks rank those candidates by ADC (8
    // integer table lookups per candidate, float vectors untouched), and
    // only the 100-deep ADC shortlist pays the exact integer-L2 re-rank.
    // 100 TB shape: this is THE deployed billion-scale layout — per
    // query the work is Σ_probed |cell| code-table lookups (bytes, not
    // vectors) + 20 exact kernels; both index artifacts (centroids,
    // codebooks) broadcast. The oracle splices the PQ subspace steps
    // onto the shared Lloyd CTE and replays probe → ADC → re-rank
    // integer-exactly; IvfPqRecallSpec pins shortlist containment.
    "llm_similar_ivfpq" -> ((s, dir) => {
      val (corpus, assigned, centroids) = lloyd(s, dir)
      val (subs, codes, cb) = pqTrain(s, dir)
      val wq = Window.partitionBy("qid").orderBy(F.col("d"), F.col("ccid"))
      val probes = corpus.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").as("qid"), F.col("qx16").as("qv"))
        .crossJoin(F.broadcast(centroids
          .select(F.col("cid").as("ccid"), F.col("mvec"))))
        .withColumn("d",
          VectorFunctions.vec_l2sq(F.col("qv"), F.col("mvec")))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 6)
        .select("qid", "ccid")
      val qdt = subs.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").as("qid"), F.col("sub"), F.col("sq16"))
        .join(F.broadcast(cb), "sub")
        .withColumn("dq",
          VectorFunctions.vec_l2sq(F.col("sq16"), F.col("mvec")))
        .select("qid", "sub", "cid", "dq")
      val cand = assigned.select(F.col("vec_id"), F.col("cid").as("ccid"))
        .join(F.broadcast(probes), "ccid")
        .filter(F.col("vec_id") =!= F.col("qid"))
        .select("qid", "vec_id")
      val adc = cand.join(codes.select("vec_id", "sub", "cid"), "vec_id")
        .join(F.broadcast(qdt), Seq("qid", "sub", "cid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("dq").as("adc_d"))
      val wAdc = Window.partitionBy("qid")
        .orderBy(F.col("adc_d"), F.col("vec_id"))
      val shortlist = adc.withColumn("srn", F.row_number().over(wAdc))
        .filter(F.col("srn") <= 100).select("qid", "vec_id")
      val full = corpus.select("vec_id", "qx16")
      val qv = full.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").as("qid"), F.col("qx16").as("qv"))
      val wEx = Window.partitionBy("qid")
        .orderBy(F.col("exact_d"), F.col("vec_id"))
      shortlist.join(full, "vec_id").join(F.broadcast(qv), "qid")
        .withColumn("exact_d",
          VectorFunctions.vec_l2sq(F.col("qx16"), F.col("qv")))
        .withColumn("rn", F.row_number().over(wEx))
        .filter(F.col("rn") <= 3)
        .select(F.col("qid"), F.col("rn"), F.col("vec_id"),
          F.col("exact_d"))
        .orderBy("qid", "rn")
    }),

    // K-MEANS assignment pass (diversity clustering): 8 deterministic
    // seed centroids (vec_id < 8) broadcast to the corpus; every vector
    // joins its cosine-nearest centroid (argmax via window rank with a
    // cid tie-break) and the per-cluster summary aggregates map-side.
    // 100 TB shape: k is tiny (broadcast), the corpus is scanned once
    // with NO pairwise blow-up (N·k products) and never shuffled until
    // the k-row aggregate. The iterated-Lloyd version of this plan is
    // llm_embed_kmeans; llm_similar_ivf_kmeans searches its cells.
    "llm_embed_centroids" -> ((s, dir) => {
      val e = emb(s, dir)
      val c = e.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").as("cid"), F.col("embedding").as("qe"),
          F.col("ss").as("qss"))
      val w = Window.partitionBy("vec_id")
        .orderBy(F.col("cos_m").desc, F.col("cid"))
      e.crossJoin(F.broadcast(c))
        .select(F.col("vec_id"), F.col("cid"), cosM.as("cos_m"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") === 1)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).as("n_members"),
          F.sum("cos_m").as("cohesion_m"),
          F.min("vec_id").as("first_vec"),
          F.max("vec_id").as("last_vec"))
        .orderBy("cid")
    })
  )

  /** Unrolled 3-step Lloyd oracle. Mirrors the Spark loop exactly: same
    * floor(1e4·x) quantization, same positive-mod floorDiv for the 16×
    * sub-resolution means, same (d, cid) tie-break — every compared value
    * is BIGINT so the driver hash cannot drift. (DuckDB `list_sum` →
    * HUGEINT is confined to the window ORDER BY, never emitted.)
    */
  /** Lloyd steps over a named corpus CTE (`ex` = the full corpus;
    * `exb` = the day-1 prefix of the incremental-index oracle).
    */
  private def lloydStep(i: Int, corpus: String): String = {
    val prev = s"c${i - 1}"
    s"""
         d$i AS (
           SELECT x.vec_id, c.cid, x.qx,
                  list_sum(list_transform(generate_series(1, len(x.qx16)),
                    k -> (x.qx16[k] - c.mvec[k]) * (x.qx16[k] - c.mvec[k])))
                    AS d
           FROM $corpus x, $prev c),
         a$i AS (
           SELECT vec_id, cid, qx FROM (
             SELECT *, row_number() OVER (PARTITION BY vec_id
                         ORDER BY d, cid) AS rn
             FROM d$i)
           WHERE rn = 1),
         s$i AS (
           SELECT cid, pos, CAST(sum(v) AS BIGINT) AS sv FROM (
             SELECT cid, unnest(qx) AS v,
                    unnest(generate_series(1, len(qx))) AS pos
             FROM a$i)
           GROUP BY cid, pos),
         n$i AS (SELECT cid, count(*) AS n FROM a$i GROUP BY cid),
         c$i AS (
           SELECT s.cid,
                  list((16 * sv - (((16 * sv) % n + n) % n)) // n
                       ORDER BY pos) AS mvec
           FROM s$i s JOIN n$i n USING (cid)
           GROUP BY s.cid, n.n)"""
  }

  private val lloydQuantCte: String =
    s"""WITH e AS (
         SELECT vec_id,
                list_transform(embedding, x ->
                  CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qx
         FROM embeddings),
       ex AS (
         SELECT vec_id, qx, list_transform(qx, v -> v * 16) AS qx16 FROM e)"""

  private val lloydCte: String =
    s"""$lloydQuantCte,
       c0 AS (
         SELECT vec_id AS cid, qx16 AS mvec FROM ex WHERE vec_id < 8),
       ${lloydStep(1, "ex")},
       ${lloydStep(2, "ex")},
       ${lloydStep(3, "ex")}"""

  /** Incremental-index prelude: Lloyd trains over the day-1 PREFIX
    * (vec_id < half the corpus), the appended half assigns to the
    * FINAL centroids with zero retraining, and `aall` is the merged
    * assignment table the search probes.
    */
  private val lloydIncrCte: String =
    s"""$lloydQuantCte,
       exb AS (
         SELECT * FROM ex
         WHERE vec_id < (SELECT count(*) // 2 FROM embeddings)),
       c0 AS (
         SELECT vec_id AS cid, qx16 AS mvec FROM exb WHERE vec_id < 8),
       ${lloydStep(1, "exb")},
       ${lloydStep(2, "exb")},
       ${lloydStep(3, "exb")},
       na AS (
         SELECT vec_id, cid FROM (
           SELECT x.vec_id, c.cid,
                  row_number() OVER (PARTITION BY x.vec_id ORDER BY
                    list_sum(list_transform(generate_series(1, len(x.qx16)),
                      k -> (x.qx16[k] - c.mvec[k]) * (x.qx16[k] - c.mvec[k]))),
                    c.cid) AS rn
           FROM ex x, c3 c
           WHERE x.vec_id >= (SELECT count(*) // 2 FROM embeddings))
         WHERE rn = 1),
       ab1 AS (SELECT vec_id, cid FROM a3),
       ab2 AS (SELECT vec_id, cid FROM na),
       aall AS (SELECT * FROM ab1 UNION ALL SELECT * FROM ab2)"""

  /** PQ trainer as SQL: the lloydCte pattern with a `sub` key — one
    * recursion-free unrolled 2-pass Lloyd over all 8 subspaces at once.
    * pa2 keeps each assignment's distance so the distortion sum is
    * checkable; pc2 is the final 16×-resolution codebook.
    */
  private val pqSteps: String = {
    def step(i: Int): String = {
      val prev = s"pc${i - 1}"
      s"""
         pd$i AS (
           SELECT x.vec_id, x.sub, c.cid, x.sq1,
                  list_sum(list_transform(generate_series(1, len(x.sq16)),
                    k -> (x.sq16[k] - c.mvec[k]) * (x.sq16[k] - c.mvec[k])))
                    AS d
           FROM sx x JOIN $prev c ON c.sub = x.sub),
         pa$i AS (
           SELECT vec_id, sub, cid, sq1, d FROM (
             SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                         ORDER BY d, cid) AS rn
             FROM pd$i)
           WHERE rn = 1),
         ps$i AS (
           SELECT sub, cid, pos, CAST(sum(v) AS BIGINT) AS sv FROM (
             SELECT sub, cid, unnest(sq1) AS v,
                    unnest(generate_series(1, len(sq1))) AS pos
             FROM pa$i)
           GROUP BY sub, cid, pos),
         pn$i AS (SELECT sub, cid, count(*) AS n FROM pa$i
                  GROUP BY sub, cid),
         pc$i AS (
           SELECT s.sub, s.cid,
                  list((16 * sv - (((16 * sv) % n + n) % n)) // n
                       ORDER BY pos) AS mvec
           FROM ps$i s JOIN pn$i n USING (sub, cid)
           GROUP BY s.sub, s.cid, n.n)"""
    }
    s"""sx AS (
         SELECT vec_id, s.s AS sub,
                list_transform(generate_series(1, 8),
                  i -> qx[s.s * 8 + i]) AS sq1,
                list_transform(generate_series(1, 8),
                  i -> qx[s.s * 8 + i] * 16) AS sq16
         FROM e, (SELECT unnest(generate_series(0, 7)) AS s) s),
       pc0 AS (
         SELECT sub, vec_id AS cid, sq16 AS mvec FROM sx WHERE vec_id < 8),
       ${step(1)},
       ${step(2)}"""
  }

  /** Standalone PQ oracle prelude: the shared quantization CTE plus the
    * subspace steps. [[ivfPqOracle]] instead splices [[pqSteps]] after
    * [[lloydCte]] (whose `e` is the identical quantization), so the
    * coarse quantizer and the codebooks train over one shared WITH.
    */
  private val pqCte: String =
    s"""WITH e AS (
         SELECT vec_id,
                list_transform(embedding, x ->
                  CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qx
         FROM embeddings),
       $pqSteps"""

  private val pqEmbedOracle: String = pqCte + """,
       m AS (
         SELECT sub, cid, count(*) AS n_members, min(vec_id) AS first_vec,
                CAST(sum(d) AS BIGINT) AS distortion
         FROM pa2 GROUP BY sub, cid),
       cs AS (
         SELECT sub, cid, CAST(list_sum(mvec) AS BIGINT) AS c_sum,
                CAST(list_sum(list_transform(generate_series(1, len(mvec)),
                  i -> mvec[i] * i)) AS BIGINT) AS c_check
         FROM pc2)
       SELECT m.sub, m.cid, m.n_members, m.first_vec, m.distortion,
              cs.c_sum, cs.c_check
       FROM m JOIN cs USING (sub, cid) ORDER BY sub, cid"""

  private val pqSearchOracle: String = pqCte + """,
       qdt AS (
         SELECT x.vec_id AS qid, x.sub, c.cid,
                CAST(list_sum(list_transform(generate_series(1, len(x.sq16)),
                  i -> (x.sq16[i] - c.mvec[i]) * (x.sq16[i] - c.mvec[i])))
                  AS BIGINT) AS dq
         FROM sx x JOIN pc2 c ON c.sub = x.sub
         WHERE x.vec_id < 20),
       adc AS (
         SELECT q.qid, a.vec_id, CAST(sum(q.dq) AS BIGINT) AS adc_d
         FROM pa2 a
         JOIN qdt q ON q.sub = a.sub AND q.cid = a.cid
         WHERE a.vec_id <> q.qid
         GROUP BY q.qid, a.vec_id)
       SELECT qid, CAST(rn AS INT) AS rn, vec_id, adc_d FROM (
         SELECT *, row_number() OVER (PARTITION BY qid
                     ORDER BY adc_d, vec_id) AS rn
         FROM adc)
       WHERE rn <= 3 ORDER BY qid, rn"""

  private val pqRerankOracle: String = pqCte + """,
       qdt AS (
         SELECT x.vec_id AS qid, x.sub, c.cid,
                CAST(list_sum(list_transform(generate_series(1, len(x.sq16)),
                  i -> (x.sq16[i] - c.mvec[i]) * (x.sq16[i] - c.mvec[i])))
                  AS BIGINT) AS dq
         FROM sx x JOIN pc2 c ON c.sub = x.sub
         WHERE x.vec_id < 20),
       adc AS (
         SELECT q.qid, a.vec_id, CAST(sum(q.dq) AS BIGINT) AS adc_d
         FROM pa2 a
         JOIN qdt q ON q.sub = a.sub AND q.cid = a.cid
         WHERE a.vec_id <> q.qid
         GROUP BY q.qid, a.vec_id),
       short AS (
         SELECT qid, vec_id FROM (
           SELECT *, row_number() OVER (PARTITION BY qid
                       ORDER BY adc_d, vec_id) AS srn
           FROM adc)
         WHERE srn <= 100),
       fullv AS (
         SELECT vec_id, list_transform(qx, v -> v * 16) AS v16 FROM e),
       rer AS (
         SELECT s.qid, s.vec_id,
                CAST(list_sum(list_transform(generate_series(1, len(fv.v16)),
                  i -> (fv.v16[i] - qv.v16[i]) * (fv.v16[i] - qv.v16[i])))
                  AS BIGINT) AS exact_d
         FROM short s
         JOIN fullv fv ON fv.vec_id = s.vec_id
         JOIN fullv qv ON qv.vec_id = s.qid)
       SELECT qid, CAST(rn AS INT) AS rn, vec_id, exact_d FROM (
         SELECT *, row_number() OVER (PARTITION BY qid
                     ORDER BY exact_d, vec_id) AS rn
         FROM rer)
       WHERE rn <= 3 ORDER BY qid, rn"""

  private val kmeansOracle: String = lloydCte + """,
       m AS (
         SELECT cid, count(*) AS n_members, min(vec_id) AS first_vec,
                max(vec_id) AS last_vec
         FROM a3 GROUP BY cid),
       cs AS (
         SELECT cid, CAST(list_sum(mvec) AS BIGINT) AS c_sum,
                CAST(list_sum(list_transform(generate_series(1, len(mvec)),
                  i -> mvec[i] * i)) AS BIGINT) AS c_check
         FROM c3)
       SELECT m.cid, m.n_members, m.first_vec, m.last_vec, cs.c_sum,
              cs.c_check
       FROM m JOIN cs USING (cid) ORDER BY cid"""

  /** IVF probe over the learned cells: nprobe=6 nearest c3 centroids per
    * query, exact integer-L2 top-3 within the probed cells — over the
    * named assignment CTE (`a3` day-1, `aall` after incremental appends).
    */
  private def ivfSearchSql(assign: String, cents: String = "c3",
      extra: String = ""): String = s""",
       probeq AS (
         SELECT vec_id AS qid, qx16 AS qv FROM ex WHERE vec_id < 20),
       qcell AS (
         SELECT qid, cid, qv FROM (
           SELECT q.qid, c.cid, q.qv,
                  row_number() OVER (PARTITION BY q.qid ORDER BY
                    list_sum(list_transform(generate_series(1, len(q.qv)),
                      i -> (q.qv[i] - c.mvec[i]) * (q.qv[i] - c.mvec[i]))),
                    c.cid) AS rn
           FROM probeq q, $cents c)
         WHERE rn <= 6),
       cand AS (
         SELECT qc.qid, a.vec_id,
                CAST(list_sum(list_transform(generate_series(1, len(qc.qv)),
                  i -> (qc.qv[i] - x.qx16[i]) * (qc.qv[i] - x.qx16[i])))
                  AS BIGINT) AS d
         FROM qcell qc
         JOIN $assign a ON a.cid = qc.cid AND a.vec_id <> qc.qid
         JOIN ex x ON x.vec_id = a.vec_id),
       rankedc AS (
         SELECT *, CAST(row_number() OVER (PARTITION BY qid
                     ORDER BY d, vec_id) AS INT) AS rn
         FROM cand)
       SELECT qid, vec_id, d, rn$extra FROM rankedc
       WHERE rn <= 3 ORDER BY qid, rn"""

  private val ivfKmeansOracle: String = lloydCte + ivfSearchSql("a3")

  /** Deterministic EXTERNAL query vectors for llm_similar_ivf_qvec,
    * shared by the gate (spliced into the TVF call as array literals)
    * and the oracle (re-derived in SQL): qvec[i] = ((qid·7 + i·13) %
    * 21 − 10) / 4 — exact binary quarters in [−2.5, 2.5], so
    * float→double→×10000→floor quantizes bit-identically cross-engine.
    */
  private def qvecVals(q: Long): Seq[Float] =
    (0 until 64).map(i => ((q * 7 + i * 13) % 21 - 10).toFloat / 4.0f)

  /** External-vector probe over the trained (c3, a3) index: the
    * [[ivfSearchSql]] qcell/cand shape with probeq replaced by the
    * derived query vectors and NO self-exclusion (an external query's
    * id namespace is unrelated to corpus vec_ids). */
  private val ivfSearchVecSql: String = s""",
       xq AS (
         SELECT CAST(qid AS BIGINT) AS qid,
                list_transform(generate_series(0, 63), i ->
                  CAST((qid * 7 + i * 13) % 21 - 10 AS DOUBLE) / 4.0) AS xv
         FROM (SELECT unnest(generate_series(0, 2)) AS qid)),
       probeq AS (
         SELECT qid, list_transform(xv, x ->
                  CAST(floor(x * 10000.0) AS BIGINT) * 16) AS qv
         FROM xq),
       qcell AS (
         SELECT qid, cid, qv FROM (
           SELECT q.qid, c.cid, q.qv,
                  row_number() OVER (PARTITION BY q.qid ORDER BY
                    list_sum(list_transform(generate_series(1, len(q.qv)),
                      i -> (q.qv[i] - c.mvec[i]) * (q.qv[i] - c.mvec[i]))),
                    c.cid) AS rn
           FROM probeq q, c3 c)
         WHERE rn <= 6),
       cand AS (
         SELECT qc.qid, a.vec_id,
                CAST(list_sum(list_transform(generate_series(1, len(qc.qv)),
                  i -> (qc.qv[i] - x.qx16[i]) * (qc.qv[i] - x.qx16[i])))
                  AS BIGINT) AS d
         FROM qcell qc
         JOIN a3 a ON a.cid = qc.cid
         JOIN ex x ON x.vec_id = a.vec_id),
       rankedc AS (
         SELECT *, CAST(row_number() OVER (PARTITION BY qid
                     ORDER BY d, vec_id) AS INT) AS rn
         FROM cand)
       SELECT qid, vec_id, d, rn FROM rankedc
       WHERE rn <= 3 ORDER BY qid, rn"""

  private val ivfQvecOracle: String = lloydCte + ivfSearchVecSql

  private val ivfIncrOracle: String = lloydIncrCte + ivfSearchSql("aall")

  /** Rebalance oracle: the incremental prelude (three appends ≡ one
    * tail assignment), then the split mirrored in exact integers —
    * oversized = `n·k > total` by cross-multiplication, seeds = the two
    * lowest member vec_ids, one argmin pass with ties to the lower
    * seed, child ids past max(cid), child centroids via the shared
    * positive-mod floorDiv means — and the standard probe over the
    * rebalanced (cfin, afin) index.
    */
  private val ivfRebalanceOracle: String = lloydIncrCte + s""",
       cnts AS (SELECT cid, count(*) AS n FROM aall GROUP BY cid),
       tot AS (SELECT CAST(sum(n) AS BIGINT) AS t,
                      CAST(count(*) AS BIGINT) AS k FROM cnts),
       ovs AS (SELECT cid FROM cnts, tot WHERE n * k > t),
       mx AS (SELECT max(cid) AS m FROM c3),
       rks AS (SELECT cid,
                      CAST(row_number() OVER (ORDER BY cid) AS BIGINT) - 1
                        AS rk
               FROM ovs),
       mem AS (SELECT a.cid, a.vec_id, x.qx, x.qx16
               FROM aall a JOIN ex x USING (vec_id)
               WHERE a.cid IN (SELECT cid FROM ovs)),
       sds AS (SELECT cid, sn, qx16 AS svec FROM (
                 SELECT cid, qx16, row_number() OVER (PARTITION BY cid
                          ORDER BY vec_id) AS sn
                 FROM mem)
               WHERE sn <= 2),
       rea AS (SELECT vec_id, cid, qx, child FROM (
                 SELECT m.vec_id, m.cid, m.qx, s.sn AS child,
                        row_number() OVER (PARTITION BY m.vec_id ORDER BY
                          list_sum(list_transform(
                            generate_series(1, len(m.qx16)),
                            i -> (m.qx16[i] - s.svec[i]) *
                                 (m.qx16[i] - s.svec[i]))),
                          s.sn) AS rn
                 FROM mem m JOIN sds s USING (cid))
               WHERE rn = 1),
       newa AS (SELECT r.vec_id,
                       (SELECT m FROM mx) + 1 + k.rk * 2 + (r.child - 1)
                         AS cid,
                       r.qx
                FROM rea r JOIN rks k USING (cid)),
       csum AS (SELECT cid, pos, CAST(sum(v) AS BIGINT) AS sv FROM (
                  SELECT cid, unnest(qx) AS v,
                         unnest(generate_series(1, len(qx))) AS pos
                  FROM newa)
                GROUP BY cid, pos),
       cnn AS (SELECT cid, count(*) AS n FROM newa GROUP BY cid),
       cch AS (SELECT s.cid,
                      list((16 * sv - (((16 * sv) % n + n) % n)) // n
                           ORDER BY pos) AS mvec
               FROM csum s JOIN cnn n USING (cid)
               GROUP BY s.cid, n.n),
       ckeep AS (SELECT cid, mvec FROM c3
                 WHERE cid NOT IN (SELECT cid FROM ovs)),
       cfin AS (SELECT * FROM ckeep UNION ALL SELECT * FROM cch),
       akeep AS (SELECT vec_id, cid FROM aall
                 WHERE cid NOT IN (SELECT cid FROM ovs)),
       anew AS (SELECT vec_id, cid FROM newa),
       afin AS (SELECT * FROM akeep UNION ALL SELECT * FROM anew)""" +
    ivfSearchSql("afin", "cfin",
      ", (SELECT CAST(count(*) AS INT) FROM ovs) AS n_split")

  /** IVF over the int8 layout: same probed cells, candidates re-ranked
    * by integer L2 over the quantized vectors (floor semantics shared
    * with llm_embed_quant's oracle).
    */
  private val ivfQuantOracle: String = lloydCte + """,
       qss AS (
         SELECT vec_id, embedding,
                list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS ss
         FROM embeddings),
       q8 AS (
         SELECT vec_id,
                list_transform(embedding, x ->
                  greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT),
                    CAST(floor(CAST(x AS DOUBLE) / sqrt(ss) * 127.0)
                      AS BIGINT)))) AS q
         FROM qss WHERE ss > 0.0),
       probeq AS (
         SELECT vec_id AS qid, qx16 AS qv FROM ex WHERE vec_id < 20),
       qcell AS (
         SELECT qid, cid FROM (
           SELECT q.qid, c.cid,
                  row_number() OVER (PARTITION BY q.qid ORDER BY
                    list_sum(list_transform(generate_series(1, len(q.qv)),
                      i -> (q.qv[i] - c.mvec[i]) * (q.qv[i] - c.mvec[i]))),
                    c.cid) AS rn
           FROM probeq q, c3 c)
         WHERE rn <= 6),
       cand AS (
         SELECT qc.qid, a.vec_id,
                CAST(list_sum(list_transform(generate_series(1, len(qq.q)),
                  i -> (qq.q[i] - x.q[i]) * (qq.q[i] - x.q[i])))
                  AS BIGINT) AS d
         FROM qcell qc
         JOIN q8 qq ON qq.vec_id = qc.qid
         JOIN a3 a ON a.cid = qc.cid AND a.vec_id <> qc.qid
         JOIN q8 x ON x.vec_id = a.vec_id),
       rankedc AS (
         SELECT *, CAST(row_number() OVER (PARTITION BY qid
                     ORDER BY d, vec_id) AS INT) AS rn
         FROM cand)
       SELECT qid, vec_id, d, rn FROM rankedc
       WHERE rn <= 3 ORDER BY qid, rn"""

  /** IVFPQ: coarse probe (lloydCte's c3/a3) gates the candidates, ADC
    * over the PQ codes (pqSteps' pa2/pc2, spliced after lloydCte so
    * both share the one `e` quantization) ranks them, exact integer L2
    * re-ranks the 100-deep shortlist.
    */
  private val ivfPqOracle: String = lloydCte + ",\n" + pqSteps + """,
       probeq AS (
         SELECT vec_id AS qid, qx16 AS qv FROM ex WHERE vec_id < 20),
       qcell AS (
         SELECT qid, cid AS ccid FROM (
           SELECT q.qid, c.cid,
                  row_number() OVER (PARTITION BY q.qid ORDER BY
                    list_sum(list_transform(generate_series(1, len(q.qv)),
                      i -> (q.qv[i] - c.mvec[i]) * (q.qv[i] - c.mvec[i]))),
                    c.cid) AS rn
           FROM probeq q, c3 c)
         WHERE rn <= 6),
       qdt AS (
         SELECT x.vec_id AS qid, x.sub, c.cid,
                CAST(list_sum(list_transform(generate_series(1, len(x.sq16)),
                  i -> (x.sq16[i] - c.mvec[i]) * (x.sq16[i] - c.mvec[i])))
                  AS BIGINT) AS dq
         FROM sx x JOIN pc2 c ON c.sub = x.sub
         WHERE x.vec_id < 20),
       candq AS (
         SELECT qc.qid, a.vec_id
         FROM qcell qc
         JOIN a3 a ON a.cid = qc.ccid AND a.vec_id <> qc.qid),
       adc AS (
         SELECT cd.qid, cd.vec_id, CAST(sum(q.dq) AS BIGINT) AS adc_d
         FROM candq cd
         JOIN pa2 p ON p.vec_id = cd.vec_id
         JOIN qdt q ON q.qid = cd.qid AND q.sub = p.sub AND q.cid = p.cid
         GROUP BY cd.qid, cd.vec_id),
       short AS (
         SELECT qid, vec_id FROM (
           SELECT *, row_number() OVER (PARTITION BY qid
                       ORDER BY adc_d, vec_id) AS srn
           FROM adc)
         WHERE srn <= 100),
       rer AS (
         SELECT s.qid, s.vec_id,
                CAST(list_sum(list_transform(generate_series(1, len(fv.qx16)),
                  i -> (fv.qx16[i] - qv.qx16[i]) * (fv.qx16[i] - qv.qx16[i])))
                  AS BIGINT) AS exact_d
         FROM short s
         JOIN ex fv ON fv.vec_id = s.vec_id
         JOIN ex qv ON qv.vec_id = s.qid)
       SELECT qid, CAST(rn AS INT) AS rn, vec_id, exact_d FROM (
         SELECT *, row_number() OVER (PARTITION BY qid
                     ORDER BY exact_d, vec_id) AS rn
         FROM rer)
       WHERE rn <= 3 ORDER BY qid, rn"""

  private val oracleProbe =
    """WITH e AS (
         SELECT vec_id, label, embedding,
                list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS ss
         FROM embeddings),
       pairs AS (
         SELECT a.vec_id AS qid, b.vec_id AS vec_id, a.label,
                CAST(floor(1000000.0 *
                  (list_sum(list_transform(generate_series(1, len(a.embedding)),
                     k -> CAST(a.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE)))
                   / (sqrt(a.ss) * sqrt(b.ss)))) AS BIGINT) AS cos_m
         FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
       ranked AS (
         SELECT *, CAST(row_number() OVER (PARTITION BY qid
                     ORDER BY cos_m DESC, vec_id) AS INT) AS rn
         FROM pairs)"""

  val oracles: Map[String, String] = Map(
    "llm_embed_pq" -> pqEmbedOracle,
    "llm_similar_pq" -> pqSearchOracle,
    // persisted-index search replays the identical ADC plan from the
    // published artifacts — same oracle by construction
    "llm_similar_pq_persist" -> pqSearchOracle,
    // the SQL lifecycle reproduces the persisted-PQ flow through
    // CALL + TVF — same oracle, any drift breaks the hash
    "llm_similar_pq_sql" -> pqSearchOracle,
    "llm_similar_pq_rerank" -> pqRerankOracle,
    "llm_embed_kmeans" -> kmeansOracle,
    // SemDeDup: pairwise exact-integer cosine threshold inside the
    // learned clusters; the HUGEINT cross-multiplication mirrors the
    // Spark side's DECIMAL(38,0) promotion exactly
    "llm_semdedup" -> (lloydCte + """,
       sdn2 AS (
         SELECT vec_id, cid, qx,
                CAST(list_sum(list_transform(qx, v -> v * v)) AS BIGINT)
                  AS n2
         FROM a3),
       sdp AS (
         SELECT x.cid, x.vec_id AS i, y.vec_id AS j,
                CAST(list_sum(list_transform(generate_series(1, len(x.qx)),
                  k -> x.qx[k] * y.qx[k])) AS BIGINT) AS dot,
                x.n2 AS n2i, y.n2 AS n2j
         FROM sdn2 x JOIN sdn2 y ON x.cid = y.cid AND x.vec_id < y.vec_id),
       sddrops AS (
         SELECT DISTINCT j AS vec_id FROM sdp
         WHERE dot > 0 AND
               CAST(dot AS HUGEINT) * dot * 10000 >=
               CAST(1225 AS HUGEINT) * n2i * n2j)
       SELECT a3.cid, count(*) AS n_members,
              CAST(sum(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END)
                AS BIGINT) AS n_dropped,
              CAST(sum(CASE WHEN d.vec_id IS NULL THEN a3.vec_id ELSE 0 END)
                AS BIGINT) AS keep_sum
       FROM a3 LEFT JOIN sddrops d ON d.vec_id = a3.vec_id
       GROUP BY a3.cid ORDER BY a3.cid"""),
    "llm_similar_ivf_kmeans" -> ivfKmeansOracle,
    // day-2 search equality: the persisted-index search must reproduce
    // the in-job plan's answer exactly — same oracle, bit for bit
    "llm_similar_ivf_persist" -> ivfKmeansOracle,
    "llm_similar_ivf_incr" -> ivfIncrOracle,
    "llm_similar_ivf_rebalance" -> ivfRebalanceOracle,
    // the SQL-surface lifecycle reproduces the rebalance flow statement
    // for statement (same cut and batch boundaries), so the oracle is
    // shared — any drift between the CALL/TVF path and the Scala path
    // breaks the hash
    "llm_similar_ivf_sql" -> ivfRebalanceOracle,
    "llm_similar_ivf_qvec" -> ivfQvecOracle,
    "llm_similar_ivf_quant" -> ivfQuantOracle,
    "llm_similar_ivfpq" -> ivfPqOracle,
    // re-derive the ±1 matrix from SQL md5 and replay the exact integer
    // MACs; q[i] is 1-based list indexing over the quantized vector
    "llm_embed_rproj" ->
      """WITH e AS (
           SELECT vec_id,
                  list_transform(embedding, x ->
                    CAST(floor(1024.0 * CAST(x AS DOUBLE)) AS BIGINT)) AS q
           FROM embeddings),
         sj AS (SELECT unnest(generate_series(0, 15)) AS j),
         si AS (SELECT unnest(generate_series(1, 64)) AS i),
         signs AS (
           SELECT j, i,
                  CASE WHEN CAST('0x' ||
                         substr(md5('rp' || (i - 1) || '_' || j), 1, 1)
                       AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sg
           FROM sj, si),
         flat AS (
           SELECT e.vec_id, s.j, CAST(sum(s.sg * e.q[s.i]) AS BIGINT) AS pv
           FROM e, signs s
           GROUP BY 1, 2),
         proj AS (
           SELECT vec_id, list(pv ORDER BY j) AS p
           FROM flat GROUP BY vec_id)
         SELECT vec_id, p[1] AS p0, p[2] AS p1, p[3] AS p2, p[4] AS p3,
                CAST(list_sum(p) AS BIGINT) AS psum,
                list_min(p) AS pmin, list_max(p) AS pmax,
                CAST(list_sum(list_transform(generate_series(1, len(p)),
                  i -> p[i] * i)) AS BIGINT) AS pcheck
         FROM proj ORDER BY vec_id""",
    "llm_embed_quant" ->
      """WITH e AS (
           SELECT vec_id, embedding,
                  list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS ss
           FROM embeddings),
         n AS (
           SELECT vec_id, embedding, sqrt(ss) AS nrm
           FROM e WHERE ss > 0.0),
         qv AS (
           SELECT vec_id, nrm,
                  list_transform(embedding, x ->
                    greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT),
                      CAST(floor(CAST(x AS DOUBLE) / nrm * 127.0) AS BIGINT))))
                    AS q
           FROM n)
         SELECT vec_id,
                CAST(floor(1000000.0 * nrm) AS BIGINT) AS norm_m,
                CAST(list_sum(q) AS BIGINT) AS qsum,
                list_min(q) AS qmin,
                list_max(q) AS qmax,
                CAST(list_sum(list_transform(generate_series(1, len(q)),
                  i -> q[i] * i)) AS BIGINT) AS qcheck
         FROM qv ORDER BY vec_id""",
    "llm_similar_topk" ->
      """WITH e AS (
           SELECT vec_id, embedding,
                  list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS ss
           FROM embeddings),
         q AS (SELECT vec_id AS qid, embedding AS qe, ss AS qss
               FROM e WHERE vec_id < 20),
         pairs AS (
           SELECT q.qid, e.vec_id,
                  CAST(floor(1000000.0 *
                    (list_sum(list_transform(generate_series(1, len(q.qe)),
                       k -> CAST(q.qe[k] AS DOUBLE) * CAST(e.embedding[k] AS DOUBLE)))
                     / (sqrt(q.qss) * sqrt(e.ss)))) AS BIGINT) AS cos_m
           FROM q JOIN e ON e.vec_id <> q.qid),
         ranked AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY qid
                       ORDER BY cos_m DESC, vec_id) AS INT) AS rn
           FROM pairs)
         SELECT qid, vec_id, cos_m, rn FROM ranked
         WHERE rn <= 5 ORDER BY qid, rn""",
    "llm_hard_negatives" ->
      """WITH e AS (
           SELECT vec_id, label, embedding,
                  list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS ss
           FROM embeddings),
         q AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qe,
                      ss AS qss
               FROM e WHERE vec_id < 20),
         pairs AS (
           SELECT q.qid, e.vec_id,
                  CAST(floor(1000000.0 *
                    (list_sum(list_transform(generate_series(1, len(q.qe)),
                       k -> CAST(q.qe[k] AS DOUBLE) * CAST(e.embedding[k] AS DOUBLE)))
                     / (sqrt(q.qss) * sqrt(e.ss)))) AS BIGINT) AS cos_m
           FROM q JOIN e ON e.label <> q.qlabel),
         ranked AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY qid
                       ORDER BY cos_m DESC, vec_id) AS INT) AS rn
           FROM pairs)
         SELECT qid, vec_id, cos_m, rn FROM ranked
         WHERE rn <= 3 ORDER BY qid, rn""",
    "llm_similar_lsh" ->
      """WITH e AS (
           SELECT vec_id, embedding,
                  list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS ss,
                  CAST(list_sum(list_transform(generate_series(0, 7), b ->
                    CASE WHEN list_sum(list_transform(
                           generate_series(1, len(embedding)), i ->
                      CASE WHEN substring(md5('p' || CAST(b AS VARCHAR) || ':'
                                 || CAST(i AS VARCHAR)), 1, 1)
                             IN ('8','9','a','b','c','d','e','f')
                           THEN CAST(embedding[i] AS DOUBLE)
                           ELSE -CAST(embedding[i] AS DOUBLE) END)) > 0
                    THEN CAST(power(2, b) AS BIGINT) ELSE 0 END)) AS BIGINT)
                    AS sig
           FROM embeddings),
         pairs AS (
           SELECT a.sig, a.vec_id AS qid, b.vec_id AS vec_id,
                  CAST(floor(1000000.0 *
                    (list_sum(list_transform(generate_series(1, len(a.embedding)),
                       k -> CAST(a.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE)))
                     / (sqrt(a.ss) * sqrt(b.ss)))) AS BIGINT) AS cos_m
           FROM e a JOIN e b ON a.sig = b.sig AND a.vec_id <> b.vec_id),
         ranked AS (
           SELECT *, row_number() OVER (PARTITION BY qid
                       ORDER BY cos_m DESC, vec_id) AS rn
           FROM pairs)
         SELECT sig, qid, vec_id, cos_m FROM ranked
         WHERE rn = 1 ORDER BY qid""",
    "llm_similar_ivf" -> (oracleProbe +
      """
         SELECT label, qid, vec_id, cos_m, rn FROM ranked
         WHERE rn <= 3 ORDER BY qid, rn"""),
    "llm_embed_neardup" -> (oracleProbe +
      """,
       top1 AS (
         SELECT qid, vec_id AS nb, cos_m FROM ranked WHERE rn = 1)
       SELECT x.qid AS i, x.nb AS j, x.cos_m
       FROM top1 x JOIN top1 y
         ON x.nb = y.qid AND y.nb = x.qid AND x.qid < y.qid
       ORDER BY i"""),
    "llm_semantic_keep" -> (oracleProbe +
      """,
       top1 AS (
         SELECT qid, vec_id AS nb, cos_m FROM ranked WHERE rn = 1),
       mut AS (
         SELECT x.qid AS i, y.qid AS j, x.cos_m
         FROM top1 x JOIN top1 y
           ON x.nb = y.qid AND y.nb = x.qid AND x.qid < y.qid),
       drops AS (
         SELECT DISTINCT j AS vec_id FROM mut WHERE cos_m >= 300000)
       SELECT e.vec_id, e.label FROM embeddings e
       WHERE e.vec_id NOT IN (SELECT vec_id FROM drops)
       ORDER BY e.vec_id"""),
    "llm_embed_centroids" ->
      """WITH e AS (
           SELECT vec_id, embedding,
                  list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS ss
           FROM embeddings),
         c AS (SELECT vec_id AS cid, embedding AS qe, ss AS qss
               FROM e WHERE vec_id < 8),
         pairs AS (
           SELECT e.vec_id, c.cid,
                  CAST(floor(1000000.0 *
                    (list_sum(list_transform(generate_series(1, len(c.qe)),
                       k -> CAST(c.qe[k] AS DOUBLE) * CAST(e.embedding[k] AS DOUBLE)))
                     / (sqrt(c.qss) * sqrt(e.ss)))) AS BIGINT) AS cos_m
           FROM e, c),
         ranked AS (
           SELECT *, row_number() OVER (PARTITION BY vec_id
                       ORDER BY cos_m DESC, cid) AS rn
           FROM pairs)
         SELECT cid, count(*) AS n_members,
                CAST(sum(cos_m) AS BIGINT) AS cohesion_m,
                min(vec_id) AS first_vec, max(vec_id) AS last_vec
         FROM ranked WHERE rn = 1
         GROUP BY cid ORDER BY cid"""
  )
}
