package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Build-once / search-many contract of the persisted PQ index
  * (llm_similar_pq_persist): the day-2 ADC search must read the
  * published codebook + codes from the graft-avro artifacts and contain
  * NO trace of the Lloyd training loop — zero localCheckpoint rounds
  * (which would surface as LogicalRDD/ExistingRDD leaves) — while
  * reproducing the in-job llm_similar_pq answer exactly.
  */
class PqPersistSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = "/root/testdata/sf0.001"

  test("day-2 ADC search reads the published index: no Lloyd, no checkpoints") {
    val (cbDir, codesDir) = LlmSimilarity.buildPqIndex(spark, dir)
    val search = LlmSimilarity.searchPersistedPq(spark, dir, cbDir, codesDir)

    val optimized = search.queryExecution.optimizedPlan.toString
    // codebook + codes come from the engine's own files...
    optimized should include("graft-avro")
    // ...and nothing from a checkpointed in-memory RDD — the tell-tale
    // of a Lloyd pass running inside the search job
    optimized should not include "LogicalRDD"
    optimized should not include "ExistingRDD"
    search.queryExecution.executedPlan.toString should not include "ExistingRDD"

    // day-2 equality: persisted search ≡ the in-job trainer's search
    // (same codes/codebook pairing, same oracle)
    val inJob = LlmSimilarity.queries("llm_similar_pq")(spark, dir)
    search.collect() shouldBe inJob.collect()
  }

  test("a rebuilt index version overwrites cleanly and still answers") {
    val (cbDir, codesDir) = LlmSimilarity.buildPqIndex(spark, dir)
    val before =
      LlmSimilarity.searchPersistedPq(spark, dir, cbDir, codesDir).collect()
    val (c2, d2) = LlmSimilarity.buildPqIndex(spark, dir,
      into = Some((cbDir, codesDir)))
    c2 shouldBe cbDir
    d2 shouldBe codesDir
    val after =
      LlmSimilarity.searchPersistedPq(spark, dir, cbDir, codesDir).collect()
    after shouldBe before
    after.length should be > 0
  }
}
