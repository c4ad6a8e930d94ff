package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.{Window => W}
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.SparkSpec
import graft.functions.VectorFunctions

/** Search-QUALITY contract for the ANN path: the IVF gates prove
  * determinism (the DuckDB oracle re-derives the same cells), but nothing
  * asserted that probing a few of the 8 learned cells actually FINDS the
  * true neighbors. This spec computes recall@3 of the
  * `llm_similar_ivf_kmeans` plan against exhaustive search under the same
  * full-precision metric (L2 on the 16x quantized vectors, same
  * (d, vec_id) tie-break) and pins a floor — at BOTH sf0.01 and sf0.1, so
  * the contract survives a corpus scale-up, and for the int8-quantized
  * path, where candidates are re-ranked by L2 over `llm_embed_quant`'s
  * vectors while ground truth stays full precision: recall under
  * quantization is the number a real curation pipeline cares about.
  *
  * This contract is what drove the gate to nprobe=6: the synthetic
  * embeddings are near-uniform (no cluster structure), so measured
  * recall@3 tracks the corpus fraction probed — 0.55/0.63/0.77/0.88/0.93
  * for nprobe 1..5 at sf0.01, but the 4x sf0.1 corpus measured 0.883
  * (full-precision) and 0.867 (quantized) at nprobe=5 — and 6 is the
  * smallest value holding the floor at every asserted scale.
  */
class AnnRecallSpec extends AnyWordSpec with Matchers with SparkSpec {

  /** Exhaustive full-precision top-3 (the ground truth everywhere). */
  private def exactTop3(corpus: DataFrame): Array[(Long, Long)] = {
    val q = corpus.filter(F.col("vec_id") < 20)
      .select(F.col("vec_id").as("qid"), F.col("qx16").as("qv"))
    val w = W.partitionBy("qid").orderBy(F.col("d"), F.col("vec_id"))
    corpus.crossJoin(F.broadcast(q))
      .filter(F.col("vec_id") =!= F.col("qid"))
      .select(F.col("qid"), F.col("vec_id"),
        VectorFunctions.vec_l2sq(F.col("qv"), F.col("qx16")).as("d"))
      .withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= 3)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
  }

  private def recallOf(ivf: Set[(Long, Long)],
      exact: Array[(Long, Long)], label: String): Double = {
    exact.length shouldBe ivf.size // 20 queries x 3
    val hits = exact.count(ivf.contains)
    val recall = hits.toDouble / exact.length
    info(f"$label recall@3 = $recall%.3f ($hits/${exact.length})")
    recall
  }

  private def fullPrecisionRecall(dir: String): Double = {
    val ivf = LlmSimilarity.queries("llm_similar_ivf_kmeans")(spark, dir)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (corpus, _, _) = LlmSimilarity.lloyd(spark, dir)
    recallOf(ivf, exactTop3(corpus), s"$dir full-precision")
  }

  /** Recall of the SHIPPED quantized gate (`llm_similar_ivf_quant`):
    * cell selection on the full-precision centroids, candidate re-rank
    * by L2 over the int8 vectors `llm_embed_quant` emits — so any
    * recall loss vs [[exactTop3]] is attributable to IVF +
    * quantization, the production storage layout, and the contract pins
    * the exact plan the driver oracle-checks (no spec/gate drift).
    */
  private def quantizedRecall(dir: String): Double = {
    val ivf = LlmSimilarity.queries("llm_similar_ivf_quant")(spark, dir)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (corpus, _, _) = LlmSimilarity.lloyd(spark, dir)
    recallOf(ivf, exactTop3(corpus), s"$dir int8-quantized")
  }

  "llm_similar_ivf_kmeans (nprobe=6 of 8 cells)" should {
    "achieve recall@3 >= 0.9 vs exhaustive same-metric search at sf0.01" in {
      fullPrecisionRecall("/root/testdata/sf0.01") should be >= 0.9
    }
    "hold the same floor at sf0.1 (4x corpus)" in {
      fullPrecisionRecall("/root/testdata/sf0.1") should be >= 0.9
    }
    "hold recall@3 >= 0.9 with int8-quantized candidate ranking at sf0.01" in {
      quantizedRecall("/root/testdata/sf0.01") should be >= 0.9
    }
    "hold recall@3 >= 0.9 with int8-quantized candidate ranking at sf0.1" in {
      quantizedRecall("/root/testdata/sf0.1") should be >= 0.9
    }
  }
}
