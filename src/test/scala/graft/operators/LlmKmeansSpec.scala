package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Specs for the Lloyd-iterated k-means gate (llm_embed_kmeans). */
class LlmKmeansSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val sf = "/root/testdata/sf0.001"

  test("kmeans partitions the whole corpus across at most 8 clusters") {
    val rows = LlmSimilarity.queries("llm_embed_kmeans")(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    rows.length should be <= 8
    rows.map(_.getAs[Long]("n_members")).sum shouldBe n
    // every member count positive, clusters keyed by the seed ids
    all(rows.map(_.getAs[Long]("n_members"))) should be > 0L
    all(rows.map(_.getAs[Long]("cid"))) should (be >= 0L and be < 8L)
  }

  test("kmeans is deterministic across runs (exact integer arithmetic)") {
    val a = LlmSimilarity.queries("llm_embed_kmeans")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val b = LlmSimilarity.queries("llm_embed_kmeans")(spark, sf)
      .collect().map(_.toSeq).toSeq
    a shouldBe b
  }

  test("iterated centroids move: 3-step result differs from the seed pass") {
    // The seed assignment (llm_embed_centroids, cosine argmax over seeds)
    // and the 3×-Lloyd result should not describe identical clusterings
    // in general; at minimum the kmeans gate must expose centroid
    // checksums that are means (bounded by the 16×-scaled component
    // range), not raw seed copies for every cluster.
    val rows = LlmSimilarity.queries("llm_embed_kmeans")(spark, sf).collect()
    val seeds = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter("vec_id < 8")
      .selectExpr("vec_id as cid",
        "aggregate(transform(embedding, x -> " +
          "16 * cast(floor(cast(x as double) * 10000.0) as bigint)), " +
          "cast(0 as bigint), (a, v) -> a + v) as seed_sum")
      .collect().map(r => r.getAs[Long]("cid") -> r.getAs[Long]("seed_sum"))
      .toMap
    val moved = rows.count { r =>
      seeds.get(r.getAs[Long]("cid")).exists(_ != r.getAs[Long]("c_sum"))
    }
    moved should be > 0
  }
}
