package graft.sources

import java.io.File
import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Incremental MATERIALIZED VIEWS over graft-avro tables — the
  * partial/final aggregate split (the same contract Spark's own
  * two-phase HashAggregate runs in-memory) made durable across
  * batches.
  *
  * A matview is an ordinary graft-avro table (readable by path or
  * through the catalog) plus a `_graft_matview` sidecar recording the
  * source directory, the PARTIAL aggregate SQL (over the placeholder
  * `__SRC__`), the COMBINE SQL (over `__ACC__`, which binds to
  * previously-combined rows ∪ fresh partials — so its aggregates must
  * be the merge step: sum of sums, sum of counts, min of mins), and
  * the last refreshed source version.
  *
  * Refresh reads ONLY the source versions committed since the last
  * refresh, through the additive-only incremental path: O(delta +
  * |view|) work, never a source rescan — the property that makes a
  * 100 TB fact table's rollup maintainable. A non-additive source
  * history since the last refresh (delete / overwrite / rollback)
  * fails the incremental read LOUDLY rather than silently serving a
  * stale or wrong aggregate; recreate the view to resync.
  *
  * The caller supplies the combine SQL explicitly instead of the
  * engine deriving it by parsing the partial SQL — deriving combine
  * rules for arbitrary expressions is exactly the trap (AVG, DISTINCT)
  * that silently breaks incremental view maintenance; the explicit
  * split keeps the contract checkable: create() validates that
  * combining the initial partials preserves the schema.
  */
object GraftMatviews {

  def sidecar(dir: File): File = new File(dir, "_graft_matview")

  /** Per-view refresh serialization. Two concurrent refreshes that both
    * read lastVersion=v would each fold the same source delta and
    * double-count; the lock makes the read-spec → incremental-read →
    * combine → overwrite → write-spec sequence atomic per view (the
    * loser re-reads the spec under the lock and no-ops). NOT the table
    * commit lock: the body runs a graft-avro WRITE job on the view dir,
    * whose commit takes `_graft_lockfile` itself — this lock lives on a
    * separate file (`_graft_matview_lock`), so the two never overlap.
    * In-JVM threads serialize on a canonical-path-keyed monitor
    * (FileLock is not re-entrant and overlapping locks throw);
    * cross-process writers serialize on the FileLock.
    */
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Test seam: latch-gated concurrency specs block the first entrant
    * INSIDE the critical section to prove the second serializes.
    */
  @volatile private[sources] var testInLock: () => Unit = () => ()

  private def withViewLock[A](viewDir: File)(body: => A): A = {
    viewDir.mkdirs()
    val mon = monitors.computeIfAbsent(
      viewDir.getCanonicalPath, _ => new Object)
    mon.synchronized {
      val ch = java.nio.channels.FileChannel.open(
        new File(viewDir, "_graft_matview_lock").toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try { testInLock(); body } finally lock.release()
      } finally ch.close()
    }
  }

  /** `deltaSql` (optional, r16) upgrades the view from additive-only to
    * DELETE-capable maintenance via the counting algorithm: it reads
    * the CDC changes frame `__CHG__` (the source's row-level diff with
    * `_change_type` insert/delete) and must emit partials with
    * NEGATIVE contributions for delete rows (e.g. `sum(CASE WHEN
    * _change_type = 'insert' THEN x ELSE -x END)`). The caller owns the
    * signs for the same reason it owns the combine split: deriving the
    * negation for arbitrary expressions is the classic silent-breakage
    * trap. Groups whose rows all die fold to zero counts — drop them in
    * the combine SQL (`HAVING`) when the view's contract is
    * groups-with-rows-only.
    */
  /** `maxStalenessMs` (optional, r18) opts the view into LAZY refresh at
    * read time: a catalog read older than the budget triggers the normal
    * incremental refresh under the view lock before the table loads
    * (see [[maybeRefreshStale]]); `refreshedAtMs` records when the view
    * last verified itself against the source (stamped on no-op
    * refreshes too, so a fresh view inside the budget costs reads
    * nothing).
    */
  final case class Spec(srcDir: String, aggSql: String, mergeSql: String,
      lastVersion: Long, deltaSql: Option[String] = None,
      maxStalenessMs: Option[Long] = None, refreshedAtMs: Long = 0L)

  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8)

  private def dec(s: String): String =
    URLDecoder.decode(s, StandardCharsets.UTF_8)

  def readSpec(viewDir: File): Spec = {
    val f = sidecar(viewDir)
    require(f.isFile, s"graft matview: $viewDir has no _graft_matview " +
      "sidecar (not a materialized view)")
    val line = new String(Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8).trim
    line.split("\t", -1) match {
      case Array(src, agg, merge, v) =>
        Spec(dec(src), dec(agg), dec(merge), v.toLong)
      case Array(src, agg, merge, v, delta) =>
        Spec(dec(src), dec(agg), dec(merge), v.toLong,
          Some(dec(delta)).filter(_.nonEmpty))
      case Array(src, agg, merge, v, delta, maxMs, at)
          if maxMs.matches("-?[0-9]+") && at.matches("[0-9]+") =>
        Spec(dec(src), dec(agg), dec(merge), v.toLong,
          Some(dec(delta)).filter(_.nonEmpty),
          Some(maxMs.toLong).filter(_ >= 0), at.toLong)
      case _ => throw new IllegalArgumentException(
        s"graft matview: corrupt sidecar $f")
    }
  }

  private def writeSpec(viewDir: File, spec: Spec): Unit = {
    val tmp = new File(viewDir, "_graft_matview.staging")
    Files.write(tmp.toPath,
      (enc(spec.srcDir) + "\t" + enc(spec.aggSql) + "\t" +
        enc(spec.mergeSql) + "\t" + spec.lastVersion +
        "\t" + spec.deltaSql.map(enc).getOrElse("") +
        "\t" + spec.maxStalenessMs.getOrElse(-1L) +
        "\t" + spec.refreshedAtMs + "\n")
        .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, sidecar(viewDir).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private val viewSeq = new java.util.concurrent.atomic.AtomicLong()

  private def currentVersion(srcDir: String): Long =
    AvroFileSource.readSnapshots(new File(srcDir))
      .lastOption.map(_.version).getOrElse(0L)

  /** Full initial build: partial SQL over the whole source, combined
    * once (validates the split), written as the matview table. Returns
    * the source version the view now reflects.
    */
  def create(spark: SparkSession, viewDir: String, srcDir: String,
      aggSql: String, mergeSql: String,
      deltaSql: Option[String] = None): Long =
      withViewLock(new File(viewDir)) {
    require(aggSql.contains("__SRC__"),
      "graft matview: aggregate SQL must read FROM __SRC__")
    require(mergeSql.contains("__ACC__"),
      "graft matview: combine SQL must read FROM __ACC__")
    deltaSql.foreach(d => require(d.contains("__CHG__"),
      "graft matview: delta SQL must read FROM __CHG__ (the CDC " +
        "changes frame with _change_type)"))
    require(!sidecar(new File(viewDir)).isFile &&
        !joinSidecar(new File(viewDir)).isFile,
      s"graft matview: $viewDir already is a materialized view " +
        "(drop it first)")
    val ver = currentVersion(srcDir)
    require(deltaSql.isEmpty || ver > 0,
      "graft matview: a delta-maintained view needs a journaled " +
        "graft-avro source (no snapshot journal found)")
    val id = viewSeq.incrementAndGet()
    val srcView = s"graft_mv_src_$id"
    val accView = s"graft_mv_acc_$id"
    spark.read.format("graft-avro").load(srcDir)
      .createOrReplaceTempView(srcView)
    val partial = spark.sql(aggSql.replace("__SRC__", srcView))
    partial.createOrReplaceTempView(accView)
    val combined = spark.sql(mergeSql.replace("__ACC__", accView))
    // names + types only: aggregates legitimately flip nullability
    // (count(*) is non-null, sum-of-counts is nullable)
    require(combined.schema.map(f => (f.name, f.dataType)) ==
        partial.schema.map(f => (f.name, f.dataType)),
      "graft matview: combine SQL must preserve the partial schema — " +
        s"partial ${partial.schema.simpleString} vs combined " +
        combined.schema.simpleString)
    // validate the delta split up front, against a real changes frame
    // (the from-the-beginning diff serves every current row as insert)
    deltaSql.foreach { d =>
      val chgView = s"graft_mv_chg_$id"
      AvroMaintenance.changes(spark, srcDir, 0L, ver)
        .createOrReplaceTempView(chgView)
      val dp = spark.sql(d.replace("__CHG__", chgView))
      require(dp.schema.map(f => (f.name, f.dataType)) ==
          partial.schema.map(f => (f.name, f.dataType)),
        "graft matview: delta SQL must preserve the partial schema — " +
          s"partial ${partial.schema.simpleString} vs delta " +
          dp.schema.simpleString)
    }
    combined.write.format("graft-avro").mode("overwrite").save(viewDir)
    writeSpec(new File(viewDir), Spec(
      new File(srcDir).getCanonicalPath, aggSql, mergeSql, ver, deltaSql,
      refreshedAtMs = System.currentTimeMillis()))
    ver
  }

  /** Opt a view (aggregate OR join matview) into lazy refresh-on-read:
    * a catalog read finding the view older than `maxMs` runs the normal
    * incremental refresh first (see [[maybeRefreshStale]]). `maxMs < 0`
    * turns it back off.
    */
  def setMaxStaleness(viewDir: String, maxMs: Long): Unit =
    withViewLock(new File(viewDir)) {
      val vd = new File(viewDir)
      val budget = Some(maxMs).filter(_ >= 0)
      if (joinSidecar(vd).isFile)
        writeJoinSpec(vd, readJoinSpec(vd).copy(maxStalenessMs = budget))
      else
        writeSpec(vd, readSpec(vd).copy(maxStalenessMs = budget))
    }

  /** The read-time staleness hook (GraftCatalog.loadTable): when the
    * view opted in via [[setMaxStaleness]] and its last verification is
    * older than the budget, run the normal incremental refresh — under
    * the view lock, so concurrent readers serialize and the losers
    * no-op. A fresh view costs a read ONE sidecar stat+parse and zero
    * Spark jobs; a stale-but-unchanged source costs two sidecar reads
    * and zero jobs (the no-op refresh re-stamps `refreshedAtMs`, so the
    * next reads inside the budget skip even that). Join views refresh
    * with `allowRebuild = false`: a non-additive source window fails
    * the READ loudly — the view needs a recreate or an explicit
    * rebuild, and serving silently-stale data would be worse.
    */
  def maybeRefreshStale(spark: SparkSession, viewDir: File): Unit = {
    // a sidecar that EXISTS but cannot be parsed fails the read loudly
    // (the equality-delete/journal convention): the view may carry a
    // staleness contract we can no longer see — serving possibly-stale
    // data silently is exactly what the budget rules out. Only a
    // vanished sidecar (concurrent DROP between stat and read) demotes
    // to "not a matview".
    def specOf[A](f: => A): Option[A] =
      try Some(f)
      catch {
        case _: java.io.FileNotFoundException => None
        case _: java.nio.file.NoSuchFileException => None
      }
    if (sidecar(viewDir).isFile) {
      specOf(readSpec(viewDir)).foreach { spec =>
        spec.maxStalenessMs match {
          case Some(maxMs)
              if System.currentTimeMillis() - spec.refreshedAtMs > maxMs =>
            refresh(spark, viewDir.getPath)
            ()
          case _ => ()
        }
      }
    } else if (joinSidecar(viewDir).isFile) {
      specOf(readJoinSpec(viewDir)).foreach { spec =>
        spec.maxStalenessMs match {
          case Some(maxMs)
              if System.currentTimeMillis() - spec.refreshedAtMs > maxMs =>
            refreshJoin(spark, viewDir.getPath)
            ()
          case _ => ()
        }
      }
    }
  }

  /** Incremental refresh: partials over the source's new versions,
    * combined with the current (already aggregated) view rows, and the
    * view overwritten. Returns (fromExclusive, to) — equal when the
    * source has not moved and the refresh was a no-op.
    */
  def refresh(spark: SparkSession, viewDir: String): (Long, Long) =
      withViewLock(new File(viewDir)) {
    // spec (and its lastVersion) read UNDER the lock: a refresh that
    // waited here sees the winner's updated lastVersion and no-ops
    // instead of re-folding the same delta
    val spec = readSpec(new File(viewDir))
    val cur = currentVersion(spec.srcDir)
    if (cur == spec.lastVersion) {
      // verified fresh: re-stamp so staleness-budget reads inside the
      // window skip the lock entirely (only views that opted in — an
      // ordinary view's sidecar stays byte-stable across no-ops)
      if (spec.maxStalenessMs.nonEmpty)
        writeSpec(new File(viewDir),
          spec.copy(refreshedAtMs = System.currentTimeMillis()))
      return (cur, cur)
    }
    require(cur > spec.lastVersion,
      s"graft matview: source went BACKWARDS (v$cur < " +
        s"v${spec.lastVersion}) — rolled back or expired; recreate " +
        "the view")
    val id = viewSeq.incrementAndGet()
    val srcView = s"graft_mv_src_$id"
    val accView = s"graft_mv_acc_$id"
    val deltaPartial = spec.deltaSql match {
      case Some(d) =>
        // counting-algorithm maintenance: the CDC changes frame serves
        // appends AND row-level deletes (equality, positional,
        // overwrites) as signed contributions — O(changed rows), and a
        // rewritten history folds instead of failing
        val chgView = s"graft_mv_chg_$id"
        AvroMaintenance.changes(spark, spec.srcDir,
          spec.lastVersion, cur).createOrReplaceTempView(chgView)
        spark.sql(d.replace("__CHG__", chgView))
      case None =>
        // additive-only incremental read: deletes/overwrites since the
        // last refresh fail here, loudly
        spark.read.format("graft-avro")
          .option("fromVersion", spec.lastVersion.toString)
          .option("toVersion", cur.toString)
          .load(spec.srcDir)
          .createOrReplaceTempView(srcView)
        spark.sql(spec.aggSql.replace("__SRC__", srcView))
    }
    spark.read.format("graft-avro").load(viewDir)
      .unionByName(deltaPartial)
      .createOrReplaceTempView(accView)
    // materialize BEFORE the same-directory overwrite (the
    // compactInPlace rule: a lazy plan would scan mid-replace)
    val merged = spark.sql(spec.mergeSql.replace("__ACC__", accView))
      .localCheckpoint(true)
    merged.write.format("graft-avro").mode("overwrite").save(viewDir)
    writeSpec(new File(viewDir), spec.copy(lastVersion = cur,
      refreshedAtMs = System.currentTimeMillis()))
    (spec.lastVersion, cur)
  }

  // ---------------------------------------------------------------- joins

  /** JOIN matviews: `V = L ⋈ R` maintained incrementally from BOTH
    * sides' append-only deltas by the classic delta-join expansion
    *
    *   ΔV = ΔL ⋈ R@curR  ∪  L@lastL ⋈ ΔR
    *
    * (the ΔL⋈ΔR cross term rides inside the first term because the
    * right side is read at its NEW version; the second term reads the
    * left at its OLD version — both pinned with versionAsOf so a
    * concurrent commit between version lookup and read cannot skew the
    * algebra). The view is APPEND-maintained — the join result is
    * row-additive under row-additive inputs (inner joins, bag
    * semantics) — so refresh work is O(Δ ⋈ …), never a re-join of two
    * 100 TB fact tables. Non-additive source history (delete /
    * overwrite / rollback) fails the incremental read loudly; recreate
    * to resync. Aggregates over a join maintain compositionally: layer
    * an aggregate matview (partial/combine) OVER the join view's
    * directory.
    */
  def joinSidecar(dir: File): File = new File(dir, "_graft_mvjoin")

  /** N sources, N last-refreshed versions (r20 — the 2-way view is the
    * n = 2 case; `leftDir`/`lastLeft` etc. remain as accessors).
    */
  final case class JoinSpec(sources: Seq[String], joinSql: String,
      lastVs: Seq[Long], maxStalenessMs: Option[Long] = None,
      refreshedAtMs: Long = 0L, counting: Boolean = false) {
    require(sources.length == lastVs.length && sources.length >= 2)
    def leftDir: String = sources(0)
    def rightDir: String = sources(1)
    def lastLeft: Long = lastVs(0)
    def lastRight: Long = lastVs(1)
  }

  /** Placeholder names `joinSql` reads FROM: the historical `__L__`/
    * `__R__` pair for two sources, `__S1__ … __Sn__` beyond (accepted
    * for n = 2 as well).
    */
  private[sources] def placeholders(n: Int, sql: String): Seq[String] =
    if (n == 2 && sql.contains("__L__")) Seq("__L__", "__R__")
    else (1 to n).map(i => s"__S${i}__")

  def readJoinSpec(viewDir: File): JoinSpec = {
    val f = joinSidecar(viewDir)
    require(f.isFile, s"graft matview: $viewDir has no _graft_mvjoin " +
      "sidecar (not a join materialized view)")
    val line = new String(Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8).trim
    val parts = line.split("\t", -1)
    // n-way form (r20): nway <n> <dir1..dirn> <sql> <v1..vn> maxMs at mode
    if (parts.headOption.contains("nway")) {
      val bad = new IllegalArgumentException(
        s"graft matview: corrupt join sidecar $f")
      if (parts.length < 2 || !parts(1).matches("[0-9]+")) throw bad
      val n = parts(1).toInt
      if (n < 2 || parts.length != 2 + n + 1 + n + 3) throw bad
      val dirs = parts.slice(2, 2 + n).toSeq.map(dec)
      val sql = dec(parts(2 + n))
      val vs = parts.slice(3 + n, 3 + 2 * n).toSeq.map { v =>
        if (!v.matches("[0-9]+")) throw bad
        v.toLong
      }
      val Array(maxMs, at, mode) = parts.takeRight(3)
      if (!maxMs.matches("-?[0-9]+") || !at.matches("[0-9]+") ||
        (mode != "counting" && mode != "bag")) throw bad
      return JoinSpec(dirs, sql, vs,
        Some(maxMs.toLong).filter(_ >= 0), at.toLong,
        counting = mode == "counting")
    }
    parts match {
      case Array(l, r, sql, lv, rv) =>
        JoinSpec(Seq(dec(l), dec(r)), dec(sql), Seq(lv.toLong, rv.toLong))
      case Array(l, r, sql, lv, rv, maxMs, at)
          if maxMs.matches("-?[0-9]+") && at.matches("[0-9]+") =>
        JoinSpec(Seq(dec(l), dec(r)), dec(sql), Seq(lv.toLong, rv.toLong),
          Some(maxMs.toLong).filter(_ >= 0), at.toLong)
      case Array(l, r, sql, lv, rv, maxMs, at, mode)
          if maxMs.matches("-?[0-9]+") && at.matches("[0-9]+") &&
            (mode == "counting" || mode == "bag") =>
        JoinSpec(Seq(dec(l), dec(r)), dec(sql), Seq(lv.toLong, rv.toLong),
          Some(maxMs.toLong).filter(_ >= 0), at.toLong,
          counting = mode == "counting")
      case _ => throw new IllegalArgumentException(
        s"graft matview: corrupt join sidecar $f")
    }
  }

  private def writeJoinSpec(viewDir: File, spec: JoinSpec): Unit = {
    val tmp = new File(viewDir, "_graft_mvjoin.staging")
    val line =
      if (spec.sources.length == 2)
        // two sources keep the historical byte layout (pre-r20 readers)
        enc(spec.leftDir) + "\t" + enc(spec.rightDir) + "\t" +
          enc(spec.joinSql) + "\t" + spec.lastLeft + "\t" +
          spec.lastRight +
          "\t" + spec.maxStalenessMs.getOrElse(-1L) +
          "\t" + spec.refreshedAtMs +
          "\t" + (if (spec.counting) "counting" else "bag")
      else
        "nway\t" + spec.sources.length + "\t" +
          spec.sources.map(enc).mkString("\t") + "\t" +
          enc(spec.joinSql) + "\t" + spec.lastVs.mkString("\t") +
          "\t" + spec.maxStalenessMs.getOrElse(-1L) +
          "\t" + spec.refreshedAtMs +
          "\t" + (if (spec.counting) "counting" else "bag")
    Files.write(tmp.toPath, (line + "\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, joinSidecar(viewDir).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Is the (last, cur] window of EVERY source purely additive? The
    * same subset-per-version + unchanged-sidecars test the incremental
    * read enforces, answered as a boolean instead of a throw — the
    * rebuild fallback's dispatch.
    */
  private def additiveWindow(spec: JoinSpec, curVs: Seq[Long]): Boolean = {
    def ok(dir: String, from: Long, to: Long): Boolean =
      from == to || scala.util.Try(
        AvroFileSource.incrementalFiles(new File(dir), from, to)).isSuccess
    spec.sources.lazyZip(spec.lastVs).lazyZip(curVs).forall {
      case (d, from, to) => ok(d, from, to)
    }
  }

  /** Full initial build of `joinSql` (reads FROM `__L__` and `__R__`),
    * written as the view table; records both sources' current versions.
    */
  def createJoin(spark: SparkSession, viewDir: String, leftDir: String,
      rightDir: String, joinSql: String): (Long, Long) = {
    val vs = createJoinN(spark, viewDir, Seq(leftDir, rightDir), joinSql,
      counting = false)
    (vs(0), vs(1))
  }

  /** Shared n-way initial build: validates placeholders, pins every
    * source at its current version, runs `joinSql`, writes the view
    * (counting mode folds multiplicities into `_mv_n` first).
    */
  def createJoinN(spark: SparkSession, viewDir: String,
      srcDirs: Seq[String], joinSql: String,
      counting: Boolean): Seq[Long] = withViewLock(new File(viewDir)) {
    val n = srcDirs.length
    require(n >= 2, "graft matview: a join view needs >= 2 sources")
    val ph = placeholders(n, joinSql)
    require(ph.forall(joinSql.contains),
      s"graft matview: join SQL must read FROM ${ph.mkString(" and ")}")
    val vd = new File(viewDir)
    require(!joinSidecar(vd).isFile && !sidecar(vd).isFile,
      s"graft matview: $viewDir already is a materialized view " +
        "(drop it first)")
    val vs = srcDirs.map(currentVersion)
    require(vs.forall(_ > 0), "graft matview: join sources must be " +
      "journaled graft-avro tables (no snapshot journal found)")
    val id = viewSeq.incrementAndGet()
    val names = srcDirs.indices.map(i => s"graft_mvj_s${i}_$id")
    srcDirs.lazyZip(vs).lazyZip(names).foreach { case (d, v, name) =>
      spark.read.format("graft-avro").option("versionAsOf", v.toString)
        .load(d).createOrReplaceTempView(name)
    }
    val sql = ph.lazyZip(names).foldLeft(joinSql) {
      case (s, (p, name)) => s.replace(p, name)
    }
    val rows = spark.sql(sql)
    val out = if (counting) {
      require(!rows.columns.contains("_mv_n"),
        "graft matview: join SQL must not project a _mv_n column (the " +
          "engine owns the multiplicity)")
      rows.groupBy(rows.columns.map(org.apache.spark.sql.functions.col)
          .toIndexedSeq: _*)
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("_mv_n"))
    } else rows
    out.write.format("graft-avro").mode("overwrite").save(viewDir)
    writeJoinSpec(vd, JoinSpec(
      srcDirs.map(d => new File(d).getCanonicalPath), joinSql, vs,
      refreshedAtMs = System.currentTimeMillis(), counting = counting))
    vs
  }

  /** COUNTING join matview (r19): `V = γ_all-cols,count(L ⋈ R)` —
    * the view stores each distinct join-result row with its
    * multiplicity `_mv_n`, so row-level DELETES in either source
    * maintain incrementally instead of forcing `allowRebuild`. Delta
    * algebra: with SIGNED source deltas (insert +1 / delete −1, the
    * CDC changes feed), the bag identity
    *
    *   ΔV = ΔL ⋈ R@curR ∪ L@lastL ⋈ ΔR
    *
    * is BILINEAR, so the engine runs the caller's `joinSql` separately
    * on each side's insert and delete rows and tags the outputs ±1 —
    * the caller writes ONE plain join projection, never sign logic.
    * Merge = group over the view's columns, SUM the signs, and
    * zero-count rows DROP (the counting algorithm's HAVING). Contract:
    * `joinSql` must be a pure bag join-projection (no aggregation or
    * DISTINCT inside — bilinearity is what makes the signed split
    * exact). Refresh cost is O(Δ ⋈ …) + one view rewrite.
    */
  def createJoinCounting(spark: SparkSession, viewDir: String,
      leftDir: String, rightDir: String, joinSql: String): (Long, Long) = {
    val vs = createJoinN(spark, viewDir, Seq(leftDir, rightDir), joinSql,
      counting = true)
    (vs(0), vs(1))
  }

  /** N-way counting join matview (r20): the bag identity telescopes to
    * the n-linear sum
    *
    *   ΔV = Σᵢ  S₁@old ⋈ … ⋈ Sᵢ₋₁@old ⋈ ΔSᵢ ⋈ Sᵢ₊₁@new ⋈ … ⋈ Sₙ@new
    *
    * (each term's prefix at LAST versions, suffix at CURRENT — the
    * 2-way `ΔL ⋈ R@cur ∪ L@last ⋈ ΔR` is the n = 2 case). `joinSql`
    * reads FROM `__S1__ … __Sn__` and must stay a pure bag projection.
    */
  def createJoinCountingN(spark: SparkSession, viewDir: String,
      srcDirs: Seq[String], joinSql: String): Seq[Long] =
    createJoinN(spark, viewDir, srcDirs, joinSql, counting = true)

  /** The signed delta term for source `i`: the caller's joinSql run
    * over that source's CDC insert rows (+1) and delete rows (−1),
    * sources before `i` pinned at their OLD versions, sources after at
    * their NEW versions — exact by multilinearity.
    */
  private def countingTerm(spark: SparkSession, spec: JoinSpec, i: Int,
      from: Long, to: Long, oldViews: Seq[String], newViews: Seq[String],
      id: Long): Option[org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.functions._
    if (from == to) return None
    val ph = placeholders(spec.sources.length, spec.joinSql)
    val chg = AvroMaintenance.changes(spark, spec.sources(i), from, to)
    val cols = chg.columns.filterNot(c =>
      c == AvroFileSource.CdcChangeType ||
        c == AvroFileSource.CdcCommitVersion)
    def term(changeType: String, sign: Int)
        : org.apache.spark.sql.DataFrame = {
      val side = chg
        .filter(col(AvroFileSource.CdcChangeType) === changeType)
        .select(cols.map(col).toIndexedSeq: _*)
      val name = s"graft_mvjc_s${i}_${changeType}_$id"
      side.createOrReplaceTempView(name)
      val sql = ph.zipWithIndex.foldLeft(spec.joinSql) {
        case (s, (p, j)) =>
          s.replace(p,
            if (j == i) name
            else if (j < i) oldViews(j)
            else newViews(j))
      }
      val out = spark.sql(sql)
      out.groupBy(out.columns.map(col).toIndexedSeq: _*)
        .agg((count(lit(1)) * sign).as("_mv_n"))
    }
    Some(term("insert", 1).unionByName(term("delete", -1)))
  }

  /** Incremental join refresh: appends the two delta terms to the view.
    * Returns ((fromL, toL), (fromR, toR)) — both pairs equal when
    * neither source moved (no-op).
    *
    * `allowRebuild = true` opts into a PINNED full re-join when the
    * incremental window is non-additive (a delete/overwrite/rollback
    * landed in a source): correctness is restored by recomputing the
    * join at (curL, curR) via versionAsOf reads and overwriting the
    * view — an explicit, expensive escape hatch (the default still
    * fails loudly so a 100 TB re-join is never silent).
    */
  def refreshJoin(spark: SparkSession, viewDir: String,
      allowRebuild: Boolean = false): ((Long, Long), (Long, Long)) = {
    val pairs = refreshJoinN(spark, viewDir, allowRebuild)
    (pairs(0), pairs(1))
  }

  /** Incremental join refresh, any number of sources: appends (bag) or
    * merges (counting) the n telescoping delta terms. Returns the
    * per-source (from, to) windows — all pairs equal when no source
    * moved (no-op).
    *
    * `allowRebuild = true` opts into a PINNED full re-join when the
    * incremental window is non-additive (a delete/overwrite/rollback
    * landed in a source): correctness is restored by recomputing the
    * join at the current versions via versionAsOf reads and overwriting
    * the view — an explicit, expensive escape hatch (the default still
    * fails loudly so a 100 TB re-join is never silent).
    */
  def refreshJoinN(spark: SparkSession, viewDir: String,
      allowRebuild: Boolean = false)
      : Seq[(Long, Long)] = withViewLock(new File(viewDir)) {
    val spec = readJoinSpec(new File(viewDir))
    val n = spec.sources.length
    val ph = placeholders(n, spec.joinSql)
    val curVs = spec.sources.map(currentVersion)
    require(curVs.lazyZip(spec.lastVs).forall(_ >= _),
      s"graft matview: a source went BACKWARDS (current " +
        s"${curVs.mkString(",")} vs last ${spec.lastVs.mkString(",")})" +
        " — rolled back or expired; recreate the view")
    if (curVs == spec.lastVs) {
      // verified fresh: re-stamp for staleness-budget reads (opted-in
      // views only — ordinary sidecars stay byte-stable across no-ops)
      if (spec.maxStalenessMs.nonEmpty)
        writeJoinSpec(new File(viewDir),
          spec.copy(refreshedAtMs = System.currentTimeMillis()))
      return curVs.map(v => (v, v))
    }
    val id = viewSeq.incrementAndGet()
    def bind(df: org.apache.spark.sql.DataFrame, name: String): String = {
      df.createOrReplaceTempView(name); name
    }
    // term i reads sources BEFORE i at their OLD versions and sources
    // AFTER i at their NEW versions (the i = first term carries every
    // cross delta) — registration is lazy, unused views cost nothing
    lazy val oldViews = spec.sources.indices.map { j =>
      bind(spark.read.format("graft-avro")
        .option("versionAsOf", spec.lastVs(j).toString)
        .load(spec.sources(j)), s"graft_mvj_o${j}_$id")
    }
    lazy val newViews = spec.sources.indices.map { j =>
      bind(spark.read.format("graft-avro")
        .option("versionAsOf", curVs(j).toString)
        .load(spec.sources(j)), s"graft_mvj_n${j}_$id")
    }
    if (spec.counting) {
      import org.apache.spark.sql.functions._
      val terms = spec.sources.indices.flatMap { i =>
        countingTerm(spark, spec, i, spec.lastVs(i), curVs(i),
          oldViews, newViews, id)
      }
      val delta = terms.reduce(_ unionByName _)
      val view = spark.read.format("graft-avro").load(viewDir)
      val keyCols = view.columns.filterNot(_ == "_mv_n")
      // counting merge: multiplicities sum; rows whose count reaches
      // zero DROP — a delete-killed join group vanishes without a
      // rebuild. Materialize before the same-directory overwrite.
      val merged = view.unionByName(delta)
        .groupBy(keyCols.map(col).toIndexedSeq: _*)
        .agg(sum("_mv_n").as("_mv_n"))
        .filter(col("_mv_n") > 0L)
        .localCheckpoint(true)
      merged.write.format("graft-avro").mode("overwrite").save(viewDir)
      writeJoinSpec(new File(viewDir),
        spec.copy(lastVs = curVs,
          refreshedAtMs = System.currentTimeMillis()))
      return spec.lastVs.zip(curVs)
    }
    if (allowRebuild && !additiveWindow(spec, curVs)) {
      // materialize BEFORE the same-directory overwrite (the
      // compactInPlace rule)
      val sql = ph.lazyZip(newViews).foldLeft(spec.joinSql) {
        case (s, (p, name)) => s.replace(p, name)
      }
      val rebuilt = spark.sql(sql).localCheckpoint(true)
      rebuilt.write.format("graft-avro").mode("overwrite").save(viewDir)
      writeJoinSpec(new File(viewDir),
        spec.copy(lastVs = curVs,
          refreshedAtMs = System.currentTimeMillis()))
      return spec.lastVs.zip(curVs)
    }
    // bag (append-only) maintenance: term i = prefix@old ⋈ ΔSᵢ
    // (incremental read) ⋈ suffix@new, appended to the view — the
    // delta reads source dirs, not the view, so no checkpoint needed
    val terms = spec.sources.indices.flatMap { i =>
      if (curVs(i) == spec.lastVs(i)) None
      else {
        val d = bind(spark.read.format("graft-avro")
          .option("fromVersion", spec.lastVs(i).toString)
          .option("toVersion", curVs(i).toString)
          .load(spec.sources(i)), s"graft_mvj_d${i}_$id")
        val sql = ph.zipWithIndex.foldLeft(spec.joinSql) {
          case (s, (p, j)) =>
            s.replace(p,
              if (j == i) d
              else if (j < i) oldViews(j)
              else newViews(j))
        }
        Some(spark.sql(sql))
      }
    }
    val delta = terms.reduce(_ unionByName _)
    delta.write.format("graft-avro").mode("append").save(viewDir)
    writeJoinSpec(new File(viewDir),
      spec.copy(lastVs = curVs,
        refreshedAtMs = System.currentTimeMillis()))
    spec.lastVs.zip(curVs)
  }
}
