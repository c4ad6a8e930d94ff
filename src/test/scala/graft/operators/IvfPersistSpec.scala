package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Build-once / search-many contract of the persisted IVF index
  * (llm_similar_ivf_persist): the day-2 search job must read the
  * published centroids + assignments from the graft-avro artifacts and
  * contain NO trace of the Lloyd training loop — zero localCheckpoint
  * rounds (which would surface as LogicalRDD/ExistingRDD leaves) — while
  * reproducing the in-job llm_similar_ivf_kmeans answer exactly.
  */
class IvfPersistSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = "/root/testdata/sf0.001"

  test("day-2 search reads the published index: no Lloyd, no checkpoints") {
    val (cenDir, asgDir) = LlmSimilarity.buildIvfIndex(spark, dir)
    val search = LlmSimilarity.searchPersistedIvf(spark, dir, cenDir, asgDir)

    val optimized = search.queryExecution.optimizedPlan.toString
    // the index comes from the engine's own files (two avro scans:
    // centroids + assignments)...
    optimized should include("graft-avro")
    // ...and nothing comes from a checkpointed in-memory RDD — the
    // tell-tale of a Lloyd iteration running inside the search job
    optimized should not include "LogicalRDD"
    optimized should not include "ExistingRDD"
    search.queryExecution.executedPlan.toString should not include "ExistingRDD"

    // day-2 equality: the persisted-index search reproduces the in-job
    // plan bit for bit (both also share the DuckDB oracle)
    val inJob = LlmSimilarity.queries("llm_similar_ivf_kmeans")(spark, dir)
    search.collect() shouldBe inJob.collect()
  }

  test("a rebuilt index version overwrites cleanly and still answers") {
    val (cenDir, asgDir) = LlmSimilarity.buildIvfIndex(spark, dir)
    // nightly rebuild: same artifacts, overwrite mode — the truncate
    // commit swaps the files atomically under the same paths
    val (cenDir2, asgDir2) = LlmSimilarity.buildIvfIndex(spark, dir)
    val a = LlmSimilarity.searchPersistedIvf(spark, dir, cenDir, asgDir).collect()
    val b = LlmSimilarity.searchPersistedIvf(spark, dir, cenDir2, asgDir2).collect()
    a shouldBe b
    a.length should be > 0
  }
}
