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
    val before =
      LlmSimilarity.searchPersistedIvf(spark, dir, cenDir, asgDir).collect()
    // nightly rebuild into the SAME directories: the truncate commit
    // must swap the files under the existing paths — stale files or
    // manifests surviving the overwrite would corrupt day-2 search
    val (c2, a2) = LlmSimilarity.buildIvfIndex(spark, dir,
      into = Some((cenDir, asgDir)))
    c2 shouldBe cenDir
    a2 shouldBe asgDir
    val after =
      LlmSimilarity.searchPersistedIvf(spark, dir, cenDir, asgDir).collect()
    after shouldBe before
    after.length should be > 0
  }
}
