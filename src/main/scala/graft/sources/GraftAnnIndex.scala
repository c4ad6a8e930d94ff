package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** SQL-surface lifecycle for the persisted IVF ANN index
  * (round-18 verdict item 2): a SQL-only user reaches
  * build-once/search-many approximate-nearest-neighbor without writing
  * Scala —
  *
  * {{{
  *   CALL cat.system.build_ivf_index('ns.corpus', 'id_col', 'vec_col',
  *                                   'ns.idx')
  *   CALL cat.system.append_ivf_assignments('ns.idx', 1000)   -- new rows
  *   CALL cat.system.rebalance_ivf_index('ns.idx')            -- skew repair
  *   SELECT * FROM ivf_search('cat.ns.idx', 20, 6, 3)         -- TVF
  * }}}
  *
  * The index is TWO ordinary graft-avro catalog tables created next to the
  * corpus — `<idx>_centroids` (cid, mvec) and `<idx>_assign`
  * (vec_id, cid) — plus a tiny `_graft_annidx` sidecar in the centroids
  * table dir recording the corpus table ref and its id/vector column
  * names, so the later procedures and the search TVF need only the index
  * name. All heavy lifting delegates to the proven operators
  * ([[graft.operators.LlmSimilarity]]): integer Lloyd training, broadcast
  * argmin appends with zero retraining, oversized-list 2-way splits whose
  * untouched assignment files stay byte-identical, and the
  * broadcast-probe candidate join search (never N²). 100 TB posture is
  * inherited: train rarely, assign per-append in O(batch × k), search
  * Σ_probed |cell| candidates.
  */
object GraftAnnIndex {

  private val SidecarName = "_graft_annidx"

  /** Index metadata: corpus table ref (catalog-relative `ns.tbl`), the
    * id/vector column names it was built over, and the corpus snapshot
    * version the index state reflects (r20 — 0 on legacy sidecars /
    * unjournaled corpora; build and append re-stamp it, so
    * `built@vX vs live@vY` in the stats metatable shows index lag). */
  final case class Meta(source: String, idCol: String, vecCol: String,
      sourceVersion: Long = 0L)

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  private[sources] def writeMeta(cenDir: File, m: Meta): Unit = {
    val txt = Seq(
      s"source\t${enc(m.source)}",
      s"idCol\t${enc(m.idCol)}",
      s"vecCol\t${enc(m.vecCol)}",
      s"sourceVersion\t${m.sourceVersion}").mkString("", "\n", "\n")
    java.nio.file.Files.write(
      new File(cenDir, SidecarName).toPath, txt.getBytes("UTF-8"))
  }

  /** The corpus dir's current snapshot version (0 = unjournaled). */
  private def corpusVersion(cat: GraftCatalog, sourceRef: String): Long =
    try AvroFileSource.readSnapshots(cat.resolveTableDir(sourceRef))
      .lastOption.map(_.version).getOrElse(0L)
    catch { case scala.util.control.NonFatal(_) => 0L }

  /** A missing or malformed sidecar fails LOUDLY: the procedures resolve
    * the corpus through it, and guessing a corpus would search the wrong
    * data. */
  def readMeta(cenDir: File): Meta = {
    val f = new File(cenDir, SidecarName)
    require(f.isFile,
      s"graft ann index: no $SidecarName sidecar in $cenDir — was this " +
        "index built by CALL system.build_ivf_index?")
    val kv = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      .split('\n').filter(_.nonEmpty).map { line =>
        val parts = line.split('\t')
        require(parts.length == 2,
          s"graft ann index: malformed sidecar line '$line' in $f")
        parts(0) -> dec(parts(1))
      }.toMap
    Meta(
      kv.getOrElse("source", sys.error(s"graft ann index: $f lacks source")),
      kv.getOrElse("idCol", sys.error(s"graft ann index: $f lacks idCol")),
      kv.getOrElse("vecCol", sys.error(s"graft ann index: $f lacks vecCol")),
      kv.get("sourceVersion").flatMap(v =>
        scala.util.Try(v.toLong).toOption).getOrElse(0L))
  }

  /** The corpus in the canonical (vec_id, embedding) shape the operators
    * expect — id cast to long, columns renamed. */
  private def corpus(s: SparkSession, cat: GraftCatalog, m: Meta)
      : DataFrame =
    s.read.format("graft-avro")
      .load(cat.resolveTableDir(m.source).getPath)
      .select(F.col(m.idCol).cast("long").as("vec_id"),
        F.col(m.vecCol).as("embedding"))

  /** Resolve an existing index ref to its (centroids dir, assign dir). */
  def indexDirs(cat: GraftCatalog, indexRef: String): (File, File) = {
    val cen = cat.resolveTableDir(indexRef + "_centroids")
    val asg = cat.resolveTableDir(indexRef + "_assign")
    (cen, asg)
  }

  /** Train the coarse quantizer over the corpus table and publish the
    * index as `<indexRef>_centroids` / `<indexRef>_assign` catalog
    * tables. Returns the list (centroid) count. */
  /** Best-effort recursive delete of a half-built index table dir so a
    * failed build can simply be retried under the same name (the
    * resolveNewTableDir name-free check would otherwise refuse until
    * the orphans were dropped manually — ADVICE r18). Only ever called
    * on dirs THIS build created. */
  private def dropDir(d: File): Unit =
    try {
      if (d.exists()) {
        java.nio.file.Files.walk(d.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { p.toFile.delete(); () })
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  def build(s: SparkSession, cat: GraftCatalog, sourceRef: String,
      idCol: String, vecCol: String, indexRef: String): Long = {
    val m = Meta(sourceRef, idCol, vecCol,
      corpusVersion(cat, sourceRef))
    val raw = corpus(s, cat, m)
    val cenDir = cat.resolveNewTableDir(indexRef + "_centroids")
    val asgDir = cat.resolveNewTableDir(indexRef + "_assign")
    try {
      graft.operators.LlmSimilarity.buildIvfIndexFrom(s, raw,
        Some((cenDir.getPath, asgDir.getPath)))
      writeMeta(cenDir, m)
    } catch {
      case scala.util.control.NonFatal(e) =>
        // a half-built index (tables without the sidecar) would block a
        // retry under the same name — clean up before rethrowing
        dropDir(cenDir); dropDir(asgDir)
        throw e
    }
    manifestCount(s, cenDir)
  }

  /** Row count of a just-written tiny index table: served from the
    * `_graft_rows` manifest the commit folded (zero Spark jobs, r21);
    * falls back to a real count if any live file lacks coverage. */
  private def manifestCount(s: SparkSession, dir: File): Long = {
    val base = dir.getAbsoluteFile.toPath
    val rows = AvroFileSource.readRowsRaw(AvroFileSource.rowsFile(dir))
    val live = AvroFileSource.listLive(dir).map { case (f, _) =>
      base.relativize(f.getAbsoluteFile.toPath).toString
    }
    if (live.nonEmpty && live.forall(rows.contains)) live.map(rows).sum
    else s.read.format("graft-avro").load(dir.getPath).count()
  }

  /** Assign corpus rows with `atOrAbove <= vec_id (< until)` to the
    * persisted centroids — zero Lloyd jobs — and append them to the
    * assignment table. Returns the assignment table's new snapshot
    * version. */
  def append(s: SparkSession, cat: GraftCatalog, indexRef: String,
      atOrAbove: Long, until: Option[Long]): Long = {
    val (cenDir, asgDir) = indexDirs(cat, indexRef)
    val m = readMeta(cenDir)
    graft.operators.LlmSimilarity.appendIvfAssignmentsFrom(s,
      corpus(s, cat, m), cenDir.getPath, asgDir.getPath, atOrAbove, until)
    // the appended assignments reflect the corpus as of NOW — re-stamp
    // so the stats metatable's built@ vs live@ shows remaining lag only
    writeMeta(cenDir, m.copy(
      sourceVersion = corpusVersion(cat, m.source)))
    AvroFileSource.readSnapshots(asgDir).lastOption.map(_.version)
      .getOrElse(0L)
  }

  /** Split every list past the 1× mean 2-way (metadata delete + append;
    * untouched files byte-identical). Returns the split count. */
  def rebalance(s: SparkSession, cat: GraftCatalog, indexRef: String)
      : Long = {
    val (cenDir, asgDir) = indexDirs(cat, indexRef)
    val m = readMeta(cenDir)
    graft.operators.LlmSimilarity.rebalanceIvfListsFrom(s,
      corpus(s, cat, m), cenDir.getPath, asgDir.getPath).size.toLong
  }

  /** The day-2 search plan over the published index: queries = corpus
    * rows with vec_id < qBelow, probing the nprobe nearest lists, exact
    * integer-L2 top-k within them. Plan contains NO training trace
    * (AnnSqlSpec guards zero LogicalRDD/ExistingRDD leaves). */
  def search(s: SparkSession, cat: GraftCatalog, indexRef: String,
      qBelow: Long, nprobe: Int, k: Int): DataFrame = {
    val (cenDir, asgDir) = indexDirs(cat, indexRef)
    val m = readMeta(cenDir)
    graft.operators.LlmSimilarity.searchPersistedIvfFrom(s,
      corpus(s, cat, m), cenDir.getPath, asgDir.getPath, qBelow, nprobe, k)
  }

  /** EXTERNAL-query-vector search (r19): neighbors of a NEW embedding
    * that is NOT a corpus row — the canonical ANN call, reachable
    * without inserting the query (which would mutate the index). The
    * vector quantizes exactly as the corpus path; returns
    * (vec_id, d, rn) — no qid column, the query is the caller's. */
  def searchVec(s: SparkSession, cat: GraftCatalog, indexRef: String,
      vec: Seq[Float], nprobe: Int, k: Int): DataFrame = {
    val (cenDir, asgDir) = indexDirs(cat, indexRef)
    val m = readMeta(cenDir)
    graft.operators.LlmSimilarity.searchIvfVecFrom(s,
      corpus(s, cat, m), cenDir.getPath, asgDir.getPath,
      Seq(0L -> vec), nprobe, k)
      .select("vec_id", "d", "rn")
  }

  /** BATCH external-query search (r19): a catalog TABLE of fresh
    * embeddings — columns `qid` (integral) and `qvec` (float array) —
    * finds neighbors for every row in one call; returns
    * (qid, vec_id, d, rn). The query side broadcasts; the corpus is
    * never shuffled. */
  def searchVecTable(s: SparkSession, cat: GraftCatalog, indexRef: String,
      queryRef: String, nprobe: Int, k: Int): DataFrame = {
    val (cenDir, asgDir) = indexDirs(cat, indexRef)
    val m = readMeta(cenDir)
    val q = s.read.format("graft-avro")
      .load(cat.resolveTableDir(queryRef).getPath)
    require(q.columns.contains("qid") && q.columns.contains("qvec"),
      s"graft ann index: query table '$queryRef' must carry columns " +
        "(qid, qvec)")
    graft.operators.LlmSimilarity.searchIvfFrameFrom(s,
      corpus(s, cat, m), cenDir.getPath, asgDir.getPath, q, nprobe, k)
  }

  // ---------------------------------------------------------------- PQ

  /** Resolve an existing PQ index ref to (codebook dir, codes dir). */
  def pqDirs(cat: GraftCatalog, indexRef: String): (File, File) = {
    val cb = cat.resolveTableDir(indexRef + "_codebook")
    val codes = cat.resolveTableDir(indexRef + "_codes")
    (cb, codes)
  }

  /** Train the m=8 per-subspace codebooks over the corpus table and
    * publish the PQ index as `<indexRef>_codebook` / `<indexRef>_codes`
    * catalog tables (85× compression: 24 bits per vector + the shared
    * 64-row codebook). Returns the codebook row count. */
  def buildPq(s: SparkSession, cat: GraftCatalog, sourceRef: String,
      idCol: String, vecCol: String, indexRef: String): Long = {
    val m = Meta(sourceRef, idCol, vecCol,
      corpusVersion(cat, sourceRef))
    val raw = corpus(s, cat, m)
    val cbDir = cat.resolveNewTableDir(indexRef + "_codebook")
    val codesDir = cat.resolveNewTableDir(indexRef + "_codes")
    try {
      graft.operators.LlmSimilarity.buildPqIndexFrom(s, raw,
        Some((cbDir.getPath, codesDir.getPath)))
      writeMeta(cbDir, m)
    } catch {
      case scala.util.control.NonFatal(e) =>
        dropDir(cbDir); dropDir(codesDir)
        throw e
    }
    manifestCount(s, cbDir)
  }

  /** The day-2 ADC search plan: queries = corpus rows with
    * vec_id < qBelow, approximate distance = 8 codebook-table lookups
    * per corpus code, top-k by (adc_d, vec_id). Full vectors are never
    * touched at query time; zero training jobs in the plan. */
  def searchPq(s: SparkSession, cat: GraftCatalog, indexRef: String,
      qBelow: Long, k: Int): DataFrame = {
    val (cbDir, codesDir) = pqDirs(cat, indexRef)
    val m = readMeta(cbDir)
    graft.operators.LlmSimilarity.searchPersistedPqFrom(s,
      corpus(s, cat, m), cbDir.getPath, codesDir.getPath, qBelow, k)
  }

  /** [[searchVec]] for the PQ index: ADC neighbors of an external
    * vector via codebook-table lookups only — returns
    * (rn, vec_id, adc_d). */
  def searchPqVec(s: SparkSession, cat: GraftCatalog, indexRef: String,
      vec: Seq[Float], k: Int): DataFrame = {
    val (cbDir, codesDir) = pqDirs(cat, indexRef)
    readMeta(cbDir) // loud on a non-index ref; corpus itself unused
    graft.operators.LlmSimilarity.searchPqVecFrom(s,
      cbDir.getPath, codesDir.getPath, Seq(0L -> vec), k)
      .select("rn", "vec_id", "adc_d")
  }

  /** [[searchVecTable]] for the PQ index — batch external ADC queries
    * from a (qid, qvec) catalog table; returns (qid, rn, vec_id,
    * adc_d). */
  def searchPqVecTable(s: SparkSession, cat: GraftCatalog,
      indexRef: String, queryRef: String, k: Int): DataFrame = {
    val (cbDir, codesDir) = pqDirs(cat, indexRef)
    readMeta(cbDir)
    val q = s.read.format("graft-avro")
      .load(cat.resolveTableDir(queryRef).getPath)
    require(q.columns.contains("qid") && q.columns.contains("qvec"),
      s"graft ann index: query table '$queryRef' must carry columns " +
        "(qid, qvec)")
    graft.operators.LlmSimilarity.searchPqFrameFrom(s,
      cbDir.getPath, codesDir.getPath, q, k)
  }
}
