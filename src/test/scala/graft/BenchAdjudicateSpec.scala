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

  test("probe kernel is contention-sensitive and ~10 ms quiet") {
    // warm then measure: the probe must be cheap enough to precede every
    // gate (< 100 ms even on a loaded box) and strictly positive.
    Bench.probe()
    val p = Bench.probe()
    assert(p > 0.0 && p < 0.5, s"probe=$p")
  }
}
