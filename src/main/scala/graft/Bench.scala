package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: executes every gate query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Each query is executed through the built-in `noop` sink so the FULL plan
  * runs (projection, sort, exchange) — a bare `count()` would let Catalyst
  * prune every projected column and skip sorts, timing little more than the
  * parquet scan. Errors are surfaced per query (value -1 plus an `errors`
  * map) instead of being silently swallowed.
  *
  * == Contention self-adjudication (r9) ==
  * Reps run as SEPARATED FULL PASSES (pass 1 all gates, then pass 2 all
  * gates), not back-to-back per gate. A machine-contention window shorter
  * than a full pass (~1 min at sf0.1) can therefore inflate a gate in at
  * most ONE pass — the cross-pass best stays clean. r8 showed the
  * back-to-back shape failing: one multi-minute window inflated BOTH reps
  * of three alphabetically-adjacent gates (q19/q1_agg/q20 at 3–5x, code
  * byte-identical to the prior round) and the [best,worst] spread read it
  * as a true regression.
  *
  * Additionally every gate run is bracketed by ~10 ms single-threaded md5
  * probes (PRE, after a settle loop, and POST, after teardown — r18) whose
  * duration depends only on machine contention. The probe times and the
  * run's start offset land in BENCH_DETAIL.json (`probes` as
  * [offset, pre, post]), so a contention window is visible IN the
  * artifact even when it ARRIVES mid-gate: a slow gate whose pre or post
  * probe is inflated (vs the run's median probe) was contended, not
  * regressed. [[Bench.classify]] encodes the rule and
  * [[Bench.adjudicateCrossRound]] re-examines every cross-round mover
  * whose best is claimed trustworthy; BenchAdjudicateSpec proves both on
  * synthetic contention windows. See README.md "Bench calibration".
  */
object Bench {

  /** Shared CPU-bound kernel: single-threaded, allocation-free after
    * warmup, deterministic — runtime varies only with machine contention.
    */
  private def md5Loop(iters: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](64)
    val t0 = System.nanoTime()
    var i = 0
    while (i < iters) {
      buf(0) = (i & 0xff).toByte
      md.update(buf)
      md.digest(md.digest()) // keep the result live; no allocation growth
      i += 1
    }
    (System.nanoTime() - t0) / 1e9
  }

  /** Whole-run calibration (~0.10–0.12 s on a quiet box, see README). */
  def calibrate(): Double = md5Loop(300000)

  /** Per-gate probe (~10 ms quiet): cheap enough to run before every gate
    * without distorting the total, long enough that a busy scheduler shows.
    */
  def probe(): Double = md5Loop(30000)

  /** Classify one gate's cross-pass evidence. `times`, `preProbes` and
    * `postProbes` are parallel per-pass sequences (the pre-probe runs
    * after a settle loop just before the gate, the post-probe right after
    * its teardown); `quietProbe` is the run's median probe.
    *
    *  - "error":     some pass failed (negative time).
    *  - "contended": the PRE probe was inflated (>2x quiet) in EVERY pass —
    *                 even the best time is untrustworthy; a cross-round
    *                 comparison must not read this gate as regressed.
    *                 (Pre only: the settle loop filters self-inflicted
    *                 residue there; a post-probe can carry the gate's own
    *                 GC tail, which must not un-trust every pass.)
    *  - "stable":    pass times agree (max ≤ 1.5x min or within 0.3 s) —
    *                 best is trustworthy; if it is slower than last round,
    *                 that IS a regression.
    *  - "spiky-contended": passes disagree and the slow pass's pre OR post
    *                 probe is inflated — a contention window hit that pass
    *                 (possibly MID-gate, landing only on the post probe);
    *                 best is the real number.
    *  - "spiky":     passes disagree, probes quiet — unexplained transient
    *                 (GC, shuffle-file cold cache); best is the real number.
    *
    * The r17 hole: contention that arrived DURING a gate (quiet pre-probe)
    * left both a 24.95 s and a 59.98 s pass on llm_winnow_pairs classified
    * plain "spiky" with best silently standing at 5x the prior round. The
    * post-gate probe catches the window's tail here; the cross-round rule
    * in [[adjudicateCrossRound]] now also re-examines spiky verdicts.
    */
  def classify(times: Seq[Double], preProbes: Seq[Double],
               postProbes: Seq[Double], quietProbe: Double): String = {
    if (times.exists(_ < 0)) "error"
    else if (preProbes.nonEmpty && preProbes.min > 2 * quietProbe) "contended"
    else if (times.max <= times.min * 1.5 || times.max - times.min < 0.3)
      "stable"
    else {
      val slow = times.indexOf(times.max)
      val hot = preProbes.lift(slow).exists(_ > 2 * quietProbe) ||
        postProbes.lift(slow).exists(_ > 2 * quietProbe)
      if (hot) "spiky-contended" else "spiky"
    }
  }

  /** Pre-probe-only form (r9 shape, kept for callers without post-probe
    * evidence — identical semantics with an empty post sequence). */
  def classify(times: Seq[Double], probes: Seq[Double],
               quietProbe: Double): String =
    classify(times, probes, Seq.empty, quietProbe)

  /** Canonical plan fingerprint: md5 of the gate's `explain(formatted)`
    * with run-varying tokens normalized — expression ids (`#12`), node
    * ids (`(3)`), rdd ids (`[7]`), temp-dir and sf-dir paths, file-index
    * locations. Two rounds produce the same fingerprint iff the gate
    * PLANS identically, so "same fingerprint but slower" is environment
    * drift, not a code regression (the r9 hole: llm_pipeline_e2e /
    * q13_custdist / q11 read as stable regressions although their code
    * was byte-identical — only a judge git-diff could tell).
    */
  def fingerprint(df: org.apache.spark.sql.DataFrame, sfDir: String): String = {
    val canon = canonicalPlan(df, sfDir)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(canon.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString.take(16)
  }

  /** The normalized plan text [[fingerprint]] hashes — exposed so
    * `PlanAudit --fingerprint` can print it and two same-code runs can be
    * diffed directly when a fingerprint is unstable.
    *
    * == The r18 q_profile lesson ==
    * Spark's RewriteDistinctAggregates groups the distinct aggregates
    * with a hash Map whose iteration order depends on expression ids —
    * which depend on how many expressions the JVM allocated BEFORE the
    * gate planned. Two same-code runs therefore permute (a) the gid
    * literal each distinct group gets, (b) the Expand projection rows,
    * and (c) every downstream attribute list (Keys/Results/
    * hashpartitioning/FILTER gid). The canonicalization neutralizes
    * exactly that: gid literals normalize to N, and the contents of
    * every `[...]` list sort (recursively, innermost first) so
    * order-permuted-but-equal lists hash identically. The cost is that
    * a code change REORDERING a list without changing its elements
    * (e.g. swapped sort keys) fingerprints equal — mislabeling such a
    * slowdown "env-drift" — accepted: element-preserving reorders are
    * rare, while the gid permutation fired a FALSE regression flag
    * every round (BenchFingerprintSpec pins both directions).
    */
  def canonicalPlan(df: org.apache.spark.sql.DataFrame, sfDir: String): String =
    canonText(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")),
      sfDir)

  /** Text half of [[canonicalPlan]], separated so the spec can feed
    * forged permuted plan text without a SparkSession. */
  private[graft] def canonText(txt: String, sfDir: String): String = {
    val flat = txt
      .replaceAll("(file:)?" + java.util.regex.Pattern.quote(sfDir), "SF")
      .replaceAll("(file:)?/tmp/\\S*", "TMP")
      .replaceAll("Location: \\S+", "Location: X")
      .replaceAll("#\\d+", "#")
      .replaceAll("plan_id=\\d+", "plan_id=")
      .replaceAll("id: \\d+", "id:")
      // typed-Dataset lambdas render as Class$$Lambda$N/0xADDR@HASH —
      // N, the hidden-class address and the identity hash all vary per
      // JVM; the owning class name before $$Lambda is what's stable
      .replaceAll("\\$\\$Lambda\\$?[0-9/x0-9a-f]*", "\\$\\$Lambda")
      .replaceAll("@[0-9a-f]+", "@")
      .replaceAll("\\[\\d+\\]", "[]")
      .replaceAll("\\(\\d+\\)", "()")
      // the distinct-rewrite group id: its VALUE is the unstable group
      // ordinal, both as a compare (`gid# = 3`) and as a bare Expand
      // projection slot (normalized inside Expand rows below)
      .replaceAll("gid# = \\d+", "gid# = N")
      // higher-order-function lambda variables render as `lambda x_N#`
      // where N is a GLOBAL resolution counter — it depends on how many
      // lambdas the session resolved before this gate planned (the
      // second instability the r19 full-run diff surfaced: 10 HOF-using
      // gates moved when the shuffled gate order changed what ran first)
      .replaceAll("lambda (\\w+?)_\\d+#", "lambda $1_#")
      // common-subexpression-elimination aliases (`_common_expr_N`)
      // carry the same kind of global counter (third r19 class — the
      // full-run diff caught q_validate/llm_dataset_card moving)
      .replaceAll("_common_expr_\\d+", "_common_expr_")
    flat.linesIterator.map { line =>
      // Expand argument rows carry the gid ordinal as a bare literal
      // list element — normalize only inside the nested-list shape
      val l =
        if (line.contains("Arguments: [["))
          line.replaceAll("(?<=[\\[, ])\\d+(?=[,\\]])", "N")
        else line
      sortBrackets(sortHashPartitioning(l))
    }.mkString("\n")
  }

  /** Sort the argument list of every `hashpartitioning(…)` occurrence —
    * the one PAREN list the distinct-rewrite permutation reaches (the
    * shuffle clusters on the Expand output attributes, whose order
    * follows the unstable group order; clustering is order-insensitive
    * for plan-identity purposes). Other function arg lists stay
    * untouched: their order is semantic. */
  private[graft] def sortHashPartitioning(line: String): String = {
    val marker = "hashpartitioning("
    val sb = new StringBuilder
    var i = 0
    while (i < line.length) {
      val at = line.indexOf(marker, i)
      if (at < 0) { sb.append(line.substring(i)); i = line.length }
      else {
        sb.append(line.substring(i, at)).append(marker)
        var j = at + marker.length
        var depth = 1
        val items = scala.collection.mutable.ArrayBuffer.empty[String]
        val cur = new StringBuilder
        while (j < line.length && depth > 0) {
          line.charAt(j) match {
            case '(' => depth += 1; cur.append('('); j += 1
            case ')' =>
              depth -= 1
              if (depth > 0) cur.append(')')
              j += 1
            case ',' if depth == 1 =>
              items += cur.result(); cur.clear()
              j += 1
              while (j < line.length && line.charAt(j) == ' ') j += 1
            case c => cur.append(c); j += 1
          }
        }
        items += cur.result()
        sb.append(items.sorted.mkString(", ")).append(')')
        i = j
      }
    }
    sb.result()
  }

  /** Sort the top-level comma-separated items of every `[...]` group in
    * `s`, innermost groups first, so element-equal lists hash equal
    * regardless of order. Commas inside nested parens/brackets do not
    * split. Pure text transform — deterministic, idempotent. */
  private[graft] def sortBrackets(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    def group(): String = { // positioned just past '['
      val items = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var paren = 0
      while (i < s.length && !(s.charAt(i) == ']' && paren == 0)) {
        s.charAt(i) match {
          case '[' => i += 1; cur.append('[').append(group()).append(']')
          case '(' => paren += 1; cur.append('('); i += 1
          // clamp: a stray ')' at depth 0 (free text) must not make
          // later top-level commas or the closing ']' invisible
          case ')' => paren = math.max(0, paren - 1); cur.append(')'); i += 1
          case ',' if paren == 0 =>
            items += cur.result(); cur.clear()
            i += 1
            while (i < s.length && s.charAt(i) == ' ') i += 1
          case c => cur.append(c); i += 1
        }
      }
      if (i < s.length) i += 1 // consume ']'
      items += cur.result()
      items.sorted.mkString(", ")
    }
    while (i < s.length) {
      s.charAt(i) match {
        case '[' => i += 1; sb.append('[').append(group()).append(']')
        case c => sb.append(c); i += 1
      }
    }
    sb.result()
  }

  /** Cross-round adjudication: a gate whose BEST time stands (verdict
    * "stable", "spiky" or "spiky-contended" — the probe evidence explains
    * at most the WORST pass, never the best) but whose best runs ≥1.5x and
    * ≥0.3 s slower than the previous round's artifact is re-labeled by its
    * plan fingerprint —
    *  - same fingerprint  ⇒ "env-drift"  (code identical: slow-in-both-
    *    passes contention or box drift, NOT a regression)
    *  - different         ⇒ "regression" (the plan changed AND it got
    *    slower — a true candidate, no git-diff needed)
    *  - no baseline       ⇒ "slower-no-baseline" (first round with
    *    fingerprints, or a new gate)
    * "contended"/"error" pass through: their best is already untrustworthy.
    *
    * r17 lesson: restricting this to "stable" let llm_winnow_pairs stand
    * unflagged at 24.95 s best (5x the prior committed round) because its
    * spread classified "spiky" — every ≥1.5x + ≥0.3 s cross-round mover
    * whose best is claimed trustworthy must now land in exactly one of
    * env-drift / regression / slower-no-baseline, never silently pass.
    */
  def adjudicateCrossRound(verdict: String, bestNow: Double,
      prevBest: Option[Double], fpNow: Option[String],
      fpPrev: Option[String]): String =
    if (!Set("stable", "spiky", "spiky-contended")(verdict) || bestNow < 0)
      verdict
    else prevBest match {
      case Some(p) if bestNow >= p * 1.5 && bestNow - p >= 0.3 =>
        (fpNow, fpPrev) match {
          case (Some(a), Some(b)) if a == b => "env-drift"
          case (Some(_), Some(_))           => "regression"
          case _                            => "slower-no-baseline"
        }
      case _ => verdict
    }

  /** Previous round's committed BENCH_DETAIL.json: (per-gate best times,
    * per-gate plan fingerprints). Missing file, old format, or parse
    * failure all degrade to empty maps — the adjudication then labels
    * slower gates "slower-no-baseline" instead of guessing.
    */
  /** Canonicalization scheme version, embedded in the artifact: a
    * baseline hashed under a DIFFERENT scheme is not comparable — its
    * fingerprints all differ from this round's by construction, which
    * would flag every slower gate "regression". Version mismatch drops
    * the baseline fingerprints (times stay comparable) so movers land
    * in "slower-no-baseline" instead. Bump when canonText changes.
    * v2 (r19): distinct-rewrite gid + bracket/hashpartitioning sorting.
    * v3 (r19): lambda-variable counter (`lambda x_N#`) normalization.
    * v4 (r19): `_common_expr_N` CSE-alias counter normalization. */
  private[graft] val FpVersion = 4

  private[graft] def readPrevDetail(path: String, sfDir: String)
      : (Map[String, Double], Map[String, String]) =
    try {
      import org.json4s._
      val jv = org.json4s.jackson.JsonMethods.parse(
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8"))
      // a baseline taken at a DIFFERENT scale factor is not comparable —
      // a local sf0.001 iteration must not read the committed sf0.1
      // artifact's times as its previous round
      jv \ "sf" match {
        case JString(s) if s != sfDir => return (Map.empty, Map.empty)
        case _ => ()
      }
      def obj(field: String): List[(String, JValue)] = jv \ field match {
        case JObject(fs) => fs
        case _ => Nil
      }
      val q = obj("queries").collect {
        case (k, JDouble(v)) => k -> v
        case (k, JInt(v)) => k -> v.toDouble
        case (k, JDecimal(v)) => k -> v.toDouble
      }.toMap
      val fpVer = jv \ "fp_version" match {
        case JInt(v) => v.toInt
        case JDouble(v) => v.toInt
        case _ => 1 // pre-r19 artifacts carried no version
      }
      val f =
        if (fpVer != FpVersion) Map.empty[String, String]
        else obj("fingerprints").collect {
          case (k, JString(v)) => k -> v
        }.toMap
      (q, f)
    } catch { case _: Throwable => (Map.empty, Map.empty) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions",
        classOf[graft.functions.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      // r20 opt note: two shuffle-machinery configs were A/B'd here
      // (spark.shuffle.sort.bypassMergeThreshold=1 after stack samples
      // showed BypassMergeSortShuffleWriter file-opens, and AQE
      // coalescePartitions.parallelismFirst=false) — neither produced a
      // reproducible win at sf0.1 (variance > effect across 4 paired
      // runs), so the defaults stand. See OPTIMIZATION_r20.md.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup: JVM/codegen/parquet-reader init otherwise lands on
    // whichever query happens to run first.
    try {
      spark.range(100000).selectExpr("md5(cast(id as string)) as h")
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/region.parquet")
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    calibrate() // untimed: let JIT compile the loop before measuring it
    val calibPre = calibrate()

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // SPARK_GRAFT_BENCH_REPS=n (default 2): n separated full passes; the
    // artifact reports per-gate best across passes (steady-state, per-query
    // codegen and shuffle-file warmup excluded from the best) — see the
    // class scaladoc for why passes are separated rather than back-to-back.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    // SPARK_GRAFT_BENCH_ONLY=sub1,sub2 (local iteration): bench only
    // queries whose name contains a substring. Driver sets nothing.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').toSeq).getOrElse(Seq.empty)
    // Sorted for the ARTIFACT (stable keys); execution order is
    // shuffled per pass below.
    val gates = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
      .sortBy(_._1)
    val times = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      gates.map(_._1 -> Vector.empty[Double]): _*)
    // per pass per gate: (start offset sec since bench epoch,
    // pre-gate probe sec, post-gate probe sec) — the post probe catches
    // contention windows that ARRIVE mid-gate (quiet pre, hot post)
    val probes = scala.collection.mutable.LinkedHashMap[String, Vector[(Double, Double, Double)]](
      gates.map(_._1 -> Vector.empty[(Double, Double, Double)]): _*)
    // previous round's artifact (committed by the driver): per-gate best
    // times + plan fingerprints for the cross-round adjudication. A
    // missing/old-format file degrades to "slower-no-baseline".
    val (prevBest, prevFps) = readPrevDetail("BENCH_DETAIL.json", sfDir)
    val fps = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val epoch = System.nanoTime()
    // quiet-probe estimate available AT probe time (the artifact's
    // median is only known post-hoc): the probe runs 1/10 the
    // calibration iterations, so a quiet probe ≈ calibPre / 10
    val quietEst = calibPre / 10
    // SEEDED RANDOM GATE ORDER PER PASS (r19): passes used to run in
    // gate-name order, so a box-heat episode mapped to an ALPHABETIC
    // RANGE of gates and best-of-2 correlated across passes (every
    // round's env-drift movers were alphabetically contiguous).
    // Shuffling decorrelates a contention window from gate identity;
    // the seeds land in the artifact so any pass is replayable.
    val passSeeds = (1 to reps).map(_ => scala.util.Random.nextLong())
    val passOrder = passSeeds.map(sd => new scala.util.Random(sd).shuffle(gates))
    for (pass <- 1 to reps; (name, fn) <- passOrder(pass - 1)) {
      val off = (System.nanoTime() - epoch) / 1e9
      // SETTLE before probing: residue of the PREVIOUS gate's teardown
      // (async shuffle cleanup, GC of a 20 s dedup gate's heap) is
      // single-JVM self-inflicted noise that used to inflate the next
      // few gates' probes on EVERY pass — deterministically mislabeling
      // them "contended" (the r16 flags: llm_dedup_*, llm_tfdf, …).
      // Re-probe briefly until quiet; genuine box contention outlives
      // the ~0.6 s budget and still classifies correctly.
      var p = probe()
      var settles = 0
      while (p > 2 * quietEst && settles < 10) {
        Thread.sleep(50)
        p = probe()
        settles += 1
      }
      val t0 = System.nanoTime()
      var fpDf: Option[org.apache.spark.sql.DataFrame] = None
      try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        times(name) :+= (System.nanoTime() - t0) / 1e9
        // teardown OUTSIDE the timed region, BLOCKING: a non-blocking
        // unpersist inside the timing both taxed this gate and bled
        // into the next gate's probe window
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        fpDf = Some(df)
      } catch {
        case e: Throwable =>
          if (!errors.contains(name))
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
          times(name) :+= -1.0
      }
      // POST-gate probe, after the blocking teardown: contention that
      // arrived DURING the gate (quiet pre-probe — the r17 blind spot)
      // shows in its tail here and classifies the slow pass
      // spiky-contended instead of silently "best stands".
      val post = probe()
      probes(name) :+= ((off, p, post))
      // fingerprint OUTSIDE the timed region, first pass only (the
      // plan is a pure function of the code; pass 2 re-plans equal)
      if (pass == 1) fpDf.foreach { df =>
        try {
          fps(name) = fingerprint(df, sfDir)
          // SPARK_GRAFT_FP_DUMP=name1,name2: write the canonical plan
          // text to /tmp for diffing an unstable fingerprint across runs
          // (the q_profile diagnosis tool — see PlanAudit --fingerprint
          // for the isolated-session variant)
          if (sys.env.get("SPARK_GRAFT_FP_DUMP")
              .exists(_.split(',').contains(name)))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"/tmp/fpdump_$name.txt"),
              canonicalPlan(df, sfDir).getBytes("UTF-8"))
        } catch { case _: Throwable => () }
      }
    }
    val results = gates.map { case (name, _) =>
      val ts = times(name)
      name -> (if (ts.contains(-1.0)) Seq(-1.0, -1.0)
               else Seq(ts.min, ts.max))
    }
    val allProbes = probes.values.flatMap(_.map(_._2)).toVector.sorted
    val quietProbe =
      if (allProbes.isEmpty) 0.0 else allProbes(allProbes.size / 2)
    val verdicts = gates.map { case (name, _) =>
      val base = classify(times(name), probes(name).map(_._2),
        probes(name).map(_._3), quietProbe)
      name -> adjudicateCrossRound(base, times(name).filter(_ >= 0)
          .minOption.getOrElse(-1.0),
        prevBest.get(name).filter(_ >= 0), fps.get(name), prevFps.get(name))
    }

    // Locale.ROOT: a comma-decimal default locale would emit `0,123`
    // and break the driver's JSON parse.
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def toJson(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    def toJsonSpread(rs: Seq[(String, Seq[Double])]) =
      rs.map { case (k, vs) =>
        "\"" + k + "\":[" + vs.map(fmt).mkString(",") + "]"
      }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"\"$k\":\"$v\"" }
      .mkString("{", ",", "}")
    val calibPost = calibrate()
    // One number for the artifact: the MAX of pre/post, i.e. the worst
    // contention observed while the bench ran. Compare against a quiet-box
    // reference (committed clean runs measure ~0.1-0.2 s) — if calib_sec is
    // 2x that, every query time in this artifact is inflated by contention.
    val calibSec = math.max(calibPre, calibPost)
    val best = results.map { case (k, vs) => k -> vs.head }
    val total = best.collect { case (_, v) if v >= 0 => v }.sum
    // The driver captures only the LAST 2000 chars of stdout and parses the
    // JSON line out of that tail (BENCH_r1..r3 all show `parsed: null` —
    // the full 100+-query map is ~3.4 KB, so the line's opening brace fell
    // off the tail every round). Emit a compact line: headline queries only
    // (all 22 TPC-H + the flagship LLM ops), full detail to BENCH_DETAIL
    // .json alongside.
    val headline = best.filter { case (k, _) =>
      k.matches("q\\d+.*") ||
        Set("llm_dedup_minhash", "llm_similar_topk", "llm_decontaminate",
          "llm_pipeline_e2e", "q_topk_native").contains(k)
    }
    // Per-query [best, worst] across the separated passes: `worst >> best`
    // identifies a transient per-pass spike (best is the real number);
    // because passes are separated, `worst ≈ best ≈ slow` with quiet probes
    // identifies a true regression; with hot probes in every pass
    // (verdict "contended") even best is untrustworthy. Full spread and
    // probes go to BENCH_DETAIL.json; the compact driver line (2000-char
    // stdout-tail contract) carries only the TOP 5 spiky outliers by
    // worst/best ratio — an uncapped list on a contended run pushed the
    // opening brace off the tail (r8 advice).
    val spiky = results
      .filter { case (_, vs) =>
        vs.head >= 0 && vs.last >= vs.head * 1.5 && vs.last - vs.head >= 0.3
      }
      .sortBy { case (_, vs) => -(vs.last / vs.head) }
      .take(5)
    val contended = verdicts.collect {
      case (k, v) if v == "contended" || v == "spiky-contended" => k
    }.take(10)
    val probeJson = probes.map { case (k, vs) =>
      "\"" + k + "\":[" + vs.map { case (off, p, post) =>
        "[" + fmt(off) + "," + fmt(p) + "," + fmt(post) + "]"
      }.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val verdictJson = verdicts
      .filter(_._2 != "stable")
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val fpJson = fps.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val seedsJson = passSeeds.mkString("[", ",", "]")
    val detail =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"n_passes":$reps,"pass_seeds":$seedsJson,"fp_version":$FpVersion,"calib_sec":${fmt(calibSec)},"calib_pre":${fmt(calibPre)},"calib_post":${fmt(calibPost)},"probe_median":${fmt(quietProbe)},"queries":${toJson(best)},"spread":${toJsonSpread(results)},"probes":$probeJson,"verdicts":$verdictJson,"fingerprints":$fpJson,"errors":$errJson,"sf":"$sfDir"}"""
    try {
      // subset runs (SPARK_GRAFT_BENCH_ONLY) go to a side file: they must
      // not clobber the committed full artifact the NEXT round's
      // cross-round adjudication reads as its baseline
      val target =
        if (only.isEmpty) "BENCH_DETAIL.json" else "BENCH_DETAIL_PARTIAL.json"
      java.nio.file.Files.write(java.nio.file.Paths.get(target),
        detail.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    val contendedJson = contended.map("\"" + _ + "\"").mkString("[", ",", "]")
    // cross-round self-adjudication in the compact driver line: stable-
    // but-slower gates split by fingerprint into environment drift (code
    // identical — NOT a regression) vs true regression candidates
    val envDrift = verdicts.collect { case (k, "env-drift") => k }.take(5)
    val regressions = verdicts.collect { case (k, "regression") => k }.take(5)
    def names(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${toJson(headline)},"sf":"$sfDir","n_queries":${results.size},"n_errors":${errors.size},"calib_sec":${fmt(calibSec)},"probe_median":${fmt(quietProbe)},"spread":${toJsonSpread(spiky)},"contended":$contendedJson,"env_drift":${names(envDrift)},"regressions":${names(regressions)}}"""
    // stop() BEFORE the println: the JSON line must be the LAST thing on
    // stdout (driver contract) and session teardown may log.
    spark.stop()
    println(line)
    if (errors.nonEmpty) sys.exit(1)
  }
}
