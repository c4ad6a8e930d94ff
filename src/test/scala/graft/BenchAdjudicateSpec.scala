package graft

import org.scalatest.funsuite.AnyFunSuite

/** Proves [[Bench.classify]] adjudicates a synthetic contention window
  * without a manual re-run — the r8 failure mode (a multi-minute window
  * inflating both back-to-back reps of adjacent gates, read as a true
  * regression) must now be visible from the artifact alone.
  *
  * The synthetic bench below has 10 gates x 2 separated passes. A
  * contention window covers gates 3..5 of pass 1 only (pass separation
  * guarantees a window shorter than a pass cannot hit the same gate
  * twice): their times AND probes inflate together. Gate "g9_regressed"
  * is genuinely 4x slower in BOTH passes with quiet probes. Gate
  * "g8_allhot" simulates a window spanning the entire bench (both passes
  * hot) — the one case where even best is untrustworthy.
  */
class BenchAdjudicateSpec extends AnyFunSuite {

  private val quiet = 0.010 // run-median probe, sec

  test("gates inside a one-pass contention window classify spiky-contended") {
    // pass 1 contended (4x time, 5x probe), pass 2 clean
    (3 to 5).foreach { i =>
      val v = Bench.classify(
        times = Seq(0.4 * 4, 0.4), probes = Seq(quiet * 5, quiet), quiet)
      assert(v === "spiky-contended", s"gate g$i")
    }
  }

  test("clean gates classify stable") {
    val v = Bench.classify(Seq(0.41, 0.40), Seq(quiet, quiet * 1.1), quiet)
    assert(v === "stable")
  }

  test("a true regression (slow both passes, quiet probes) stays stable: best is trustworthy") {
    // cross-round comparison then reads best=1.6 vs prior 0.4 as a REAL
    // regression — exactly what we want: the artifact does not excuse it.
    val v = Bench.classify(Seq(1.61, 1.60), Seq(quiet, quiet * 1.2), quiet)
    assert(v === "stable")
  }

  test("a bench-spanning window (probes hot in every pass) classifies contended") {
    // the r8 shape if a window outlasted even pass separation: the driver
    // must NOT read this gate's times as a regression.
    val v = Bench.classify(Seq(1.6, 1.7), Seq(quiet * 4, quiet * 3), quiet)
    assert(v === "contended")
  }

  test("unexplained transient with quiet probes classifies spiky") {
    val v = Bench.classify(Seq(2.0, 0.4), Seq(quiet, quiet * 1.1), quiet)
    assert(v === "spiky")
  }

  test("failed pass classifies error") {
    assert(Bench.classify(Seq(-1.0, 0.4), Seq(quiet, quiet), quiet) === "error")
  }

  test("sub-threshold jitter on fast gates stays stable (0.3 s floor)") {
    // worst/best = 3x but only 80 ms apart — shuffle-file cache jitter,
    // not worth flagging.
    assert(Bench.classify(Seq(0.12, 0.04), Seq(quiet, quiet), quiet) === "stable")
  }

  // == Cross-round adjudication (r10): the r9 hole was stable-but-slower
  // gates whose code was byte-identical to the prior round — env drift
  // masquerading as regression, resolvable only by a judge git-diff. The
  // plan fingerprint settles it from the artifacts alone. ==

  test("stable + slower + same fingerprint adjudicates env-drift") {
    val v = Bench.adjudicateCrossRound("stable", bestNow = 1.6,
      prevBest = Some(0.4), fpNow = Some("abcd"), fpPrev = Some("abcd"))
    assert(v === "env-drift")
  }

  test("stable + slower + different fingerprint adjudicates regression") {
    val v = Bench.adjudicateCrossRound("stable", 1.6, Some(0.4),
      Some("abcd"), Some("ef01"))
    assert(v === "regression")
  }

  test("stable + slower without a baseline fingerprint stays inconclusive") {
    assert(Bench.adjudicateCrossRound("stable", 1.6, Some(0.4),
      Some("abcd"), None) === "slower-no-baseline")
    assert(Bench.adjudicateCrossRound("stable", 1.6, None,
      Some("abcd"), Some("abcd")) === "stable")
  }

  test("stable within the regression thresholds passes through") {
    // 1.4x / sub-0.3s: jitter, not a regression — fingerprint irrelevant
    assert(Bench.adjudicateCrossRound("stable", 0.56, Some(0.40),
      Some("abcd"), Some("ef01")) === "stable")
    assert(Bench.adjudicateCrossRound("stable", 0.15, Some(0.05),
      Some("abcd"), Some("ef01")) === "stable")
  }

  test("untrustworthy-best verdicts pass through untouched") {
    for (v <- Seq("contended", "error"))
      assert(Bench.adjudicateCrossRound(v, 1.6, Some(0.4),
        Some("a"), Some("b")) === v)
  }

  // == r18: the llm_winnow_pairs hole — a gate whose spread classified
  // "spiky" (best stands!) escaped cross-round adjudication entirely and
  // stood unflagged at 5x the prior committed round. Every verdict whose
  // best is claimed trustworthy now adjudicates. ==

  test("spiky + slower best + same fingerprint adjudicates env-drift") {
    assert(Bench.adjudicateCrossRound("spiky", bestNow = 24.95,
      prevBest = Some(4.67), fpNow = Some("abcd"), fpPrev = Some("abcd"))
      === "env-drift")
  }

  test("spiky-contended + slower best + different fingerprint adjudicates regression") {
    assert(Bench.adjudicateCrossRound("spiky-contended", 1.6, Some(0.4),
      Some("abcd"), Some("ef01")) === "regression")
  }

  test("spiky with a best inside the thresholds passes through") {
    // the spread was a one-pass transient; best agrees with last round
    assert(Bench.adjudicateCrossRound("spiky", 0.45, Some(0.40),
      Some("abcd"), Some("ef01")) === "spiky")
  }

  test("mid-gate contention (quiet pre-probe, hot post-probe on the slow pass) classifies spiky-contended") {
    // the r17 blind spot: the window arrived DURING pass 1 — its pre
    // probe was quiet, only the post probe saw the tail
    val v = Bench.classify(times = Seq(24.95, 4.7),
      preProbes = Seq(quiet, quiet * 1.1),
      postProbes = Seq(quiet * 6, quiet), quietProbe = quiet)
    assert(v === "spiky-contended")
  }

  test("hot post-probes never un-trust every pass (contended stays pre-probe-only)") {
    // a heavy gate's own GC tail can land on the post probe of EVERY
    // pass; that must not flag the gate contended (best untrustworthy)
    val v = Bench.classify(Seq(1.6, 1.62), Seq(quiet, quiet * 1.1),
      Seq(quiet * 5, quiet * 5), quiet)
    assert(v === "stable")
  }

  test("quiet post-probes leave an unexplained transient spiky") {
    val v = Bench.classify(Seq(2.0, 0.4), Seq(quiet, quiet),
      Seq(quiet * 1.2, quiet), quiet)
    assert(v === "spiky")
  }

  test("readPrevDetail parses queries + fingerprints and degrades to empty") {
    val f = java.nio.file.Files.createTempFile("bench_detail", ".json")
    java.nio.file.Files.write(f,
      s"""{"sf":"/sf0.1","fp_version":${Bench.FpVersion},"queries":{"q1":0.42,"q2":1.0},"fingerprints":{"q1":"abcd"}}"""
        .getBytes("UTF-8"))
    val (q, fp) = Bench.readPrevDetail(f.toString, "/sf0.1")
    assert(q === Map("q1" -> 0.42, "q2" -> 1.0))
    assert(fp === Map("q1" -> "abcd"))
    // a baseline at a DIFFERENT scale factor must not be compared — a
    // local sf0.001 iteration vs the committed sf0.1 artifact
    assert(Bench.readPrevDetail(f.toString, "/sf0.001") ===
      ((Map.empty, Map.empty)))
    // a baseline hashed under a DIFFERENT canonicalization scheme (or a
    // pre-version artifact) keeps its TIMES but drops fingerprints —
    // every fp differs by construction and would flag false regressions
    java.nio.file.Files.write(f,
      """{"sf":"/sf0.1","queries":{"q1":0.42},"fingerprints":{"q1":"abcd"}}"""
        .getBytes("UTF-8"))
    val (q2, fp2) = Bench.readPrevDetail(f.toString, "/sf0.1")
    assert(q2 === Map("q1" -> 0.42))
    assert(fp2 === Map.empty)
    // old-format artifact (no fingerprints field) and missing file
    java.nio.file.Files.write(f,
      """{"sf":"/sf0.1","queries":{"q1":0.42}}""".getBytes("UTF-8"))
    assert(Bench.readPrevDetail(f.toString, "/sf0.1")._2 === Map.empty)
    assert(Bench.readPrevDetail("/nonexistent/x.json", "/sf0.1") ===
      ((Map.empty, Map.empty)))
  }

  test("probe kernel is contention-sensitive and ~10 ms quiet") {
    // warm then measure: the probe must be cheap enough to precede every
    // gate (< 100 ms even on a loaded box) and strictly positive.
    Bench.probe()
    val p = Bench.probe()
    assert(p > 0.0 && p < 0.5, s"probe=$p")
  }
}
