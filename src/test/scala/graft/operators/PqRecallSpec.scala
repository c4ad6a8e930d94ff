package graft.operators

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.VectorFunctions

/** Quality contract for the product-quantization family: the two-stage
  * ADC-shortlist + exact-re-rank plan (`llm_similar_pq_rerank`) must
  * hold recall@3 ≥ 0.8 against exhaustive same-metric search at sf0.01.
  * Measured 0.867 at gate parameters (m=8, k=8, shortlist 100 = 20% of
  * the 500-vector corpus). On this NEAR-UNIFORM synthetic corpus
  * shortlist containment tracks the fraction of corpus shortlisted —
  * real clustered embeddings concentrate far faster — so the floor pins
  * the composition against silent rot (a broken quantizer, a codes/dt
  * key mismatch, a re-rank ordering bug all crater it), not a
  * state-of-the-art ANN benchmark. Pure-ADC ranking (llm_similar_pq) is
  * intentionally NOT given a recall floor: with k=8 codebooks on
  * uniform data its ordering is dominated by quantization noise — the
  * honest contract for ADC alone is its oracle-exactness, and its
  * quality role is producing the shortlist asserted here.
  */
class PqRecallSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("PQ shortlist + exact re-rank holds recall@3 >= 0.8 at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    VectorFunctions.register(spark)
    val got = LlmSimilarity.queries("llm_similar_pq_rerank")(spark, dir)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    // exhaustive truth in the same integer-L2 metric space (qx16)
    val full = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(F.col("vec_id"), F.expr(
        "transform(embedding, x -> " +
          "cast(floor(cast(x as double) * 10000.0) as bigint) * 16)")
        .as("v16"))
      .localCheckpoint()
    val qv = full.filter(F.col("vec_id") < 20)
      .select(F.col("vec_id").as("qid"), F.col("v16").as("qv"))
    val w = Window.partitionBy("qid").orderBy(F.col("d"), F.col("vec_id"))
    val truth = full.crossJoin(F.broadcast(qv))
      .filter(F.col("vec_id") =!= F.col("qid"))
      .withColumn("d", VectorFunctions.vec_l2sq(F.col("v16"), F.col("qv")))
      .withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= 3)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    truth.keySet shouldBe got.keySet
    val hits = truth.keys.toSeq.map(q => (truth(q) & got(q)).size).sum
    val total = truth.values.map(_.size).sum
    val recall = hits.toDouble / total
    withClue(s"recall@3 = $recall") { recall should be >= 0.8 }
  }

  test("PQ codes compress 64 floats to 8 small cell ids per vector") {
    val (_, codes, cb) = LlmSimilarity.pqTrain(spark, "/root/testdata/sf0.01")
    val n = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .count()
    codes.count() shouldBe n * 8 // one cell id per (vector, subspace)
    val ids = codes.agg(F.min("cid"), F.max("cid")).collect().head
    ids.getLong(0) should be >= 0L
    ids.getLong(1) should be <= 7L // 3 bits per subspace -> 24-bit codes
    cb.count() shouldBe 8 * 8 // m=8 codebooks x k=8 centroids
    // every vector must code in every subspace (no dropped subvectors)
    codes.groupBy("vec_id").count()
      .filter(F.col("count") =!= 8).count() shouldBe 0
  }
}
