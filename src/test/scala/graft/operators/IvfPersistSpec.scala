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

  test("incremental append assigns without retraining; search serves it") {
    val cut = 250L // sf0.001 embeddings = 500 dense ids; day-1 = first half
    val (cenDir, asgDir) =
      LlmSimilarity.buildIvfIndex(spark, dir, below = Some(cut))
    val day1 = spark.read.format("graft-avro").load(asgDir).count()
    day1 shouldBe cut
    // the APPEND job: one broadcast assignment pass — zero Lloyd
    // iterations (no LogicalRDD/ExistingRDD from a localCheckpoint)
    LlmSimilarity.appendIvfAssignments(spark, dir, cenDir, asgDir,
      atOrAbove = cut)
    val merged = spark.read.format("graft-avro").load(asgDir)
    merged.count() shouldBe 500L
    // every appended vector landed in a real cell of the persisted index
    val cids = spark.read.format("graft-avro").load(cenDir)
      .select("cid").collect().map(_.getLong(0)).toSet
    merged.select("cid").collect().map(_.getLong(0)).toSet
      .subsetOf(cids) shouldBe true
    // day-2 search over the merged assignments: appended vectors are
    // retrievable, and the plan has no trace of training
    val search = LlmSimilarity.searchPersistedIvf(spark, dir, cenDir, asgDir)
    val optimized = search.queryExecution.optimizedPlan.toString
    optimized should not include "LogicalRDD"
    optimized should not include "ExistingRDD"
    val got = search.collect()
    got.length should be > 0
    // some appended (vec_id >= cut) vector surfaces as a neighbor —
    // the index genuinely serves the new batch
    got.map(_.getLong(1)).exists(_ >= cut) shouldBe true
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
