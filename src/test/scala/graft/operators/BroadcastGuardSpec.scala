package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the broadcast contracts of the two corpus-fraction-dependent
  * joins at the LARGEST local scale (sf0.1, not the sf0.001 the other
  * plan guards use): llm_decontaminate broadcasts the benchmark shingle
  * set (doc_id % 17 ≈ 6% of shingles) and llm_semantic_keep broadcasts
  * the thresholded drop list. Both must plan as BroadcastHashJoin — a
  * silent fallback to sort-merge would shuffle the full corpus-side
  * explode — and both must EXECUTE at sf0.1, proving the build side
  * actually fits the driver at the asserted scale.
  *
  * When the benchmark side outgrows the driver at real scale, the
  * documented fallback is the q_bloom_prefilter shape (bloom the
  * benchmark keys into kilobytes, probe inside the corpus scan, confirm
  * survivors with the exact join) — see OPERATORS.md "Broadcast
  * thresholds and the bloom fallback".
  */
class BroadcastGuardSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = "/root/testdata/sf0.1"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("llm_decontaminate plans a broadcast for the benchmark shingles at sf0.1") {
    val df = LlmDedup.queries("llm_decontaminate")(spark, dir)
    val plan = planOf(df)
    plan should include("BroadcastHashJoin")
    // the ONLY join in this gate is corpus-explode ⨝ benchmark: nothing
    // may shuffle the exploded corpus side
    plan should not include "SortMergeJoin"
    plan should not include "ShuffledHashJoin"
    // ...and the broadcast build succeeds at sf0.1 volumes
    df.write.format("noop").mode("overwrite").save()
  }

  test("llm_semantic_keep plans a broadcast anti-join for the drop list at sf0.1") {
    val df = LlmSimilarity.queries("llm_semantic_keep")(spark, dir)
    val plan = planOf(df)
    // the survivors join must be a broadcast LeftAnti on one line — the
    // cell joins inside mutualPairs are allowed to shuffle
    plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")) shouldBe true
    df.write.format("noop").mode("overwrite").save()
  }
}
