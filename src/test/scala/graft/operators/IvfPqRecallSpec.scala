package graft.operators

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.VectorFunctions

/** Quality contract for the composed IVFPQ plan (`llm_similar_ivfpq`):
  * coarse probe (nprobe=6 of 8 cells) x ADC shortlist (100-deep) x
  * exact re-rank must hold recall@3 ≥ 0.8 against exhaustive
  * same-metric search at sf0.01 — measured 0.867 at gate parameters,
  * i.e. the composition loses nothing vs the un-probed PQ re-rank
  * (PqRecallSpec's 0.867) while restricting ADC work to the probed
  * cells. Same honesty note as the PQ family: on this near-uniform
  * synthetic corpus containment tracks the fraction of corpus
  * shortlisted; the floor pins the composition against silent rot (a
  * cell/code key mix-up, a dropped probe, a re-rank ordering bug), not
  * an ANN benchmark. The structural test pins the IVF half: every
  * candidate the gate can emit must come from a probed cell.
  */
class IvfPqRecallSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("IVFPQ holds recall@3 >= 0.8 vs exhaustive search at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    VectorFunctions.register(spark)
    val got = LlmSimilarity.queries("llm_similar_ivfpq")(spark, dir)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

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
    val recall = hits.toDouble / truth.values.map(_.size).sum
    withClue(s"recall@3 = $recall") { recall should be >= 0.8 }
  }

  test("every emitted neighbor lies in one of the query's probed cells") {
    val dir = "/root/testdata/sf0.01"
    VectorFunctions.register(spark)
    val (corpus, assigned, centroids) = LlmSimilarity.lloyd(spark, dir)
    val wq = Window.partitionBy("qid").orderBy(F.col("d"), F.col("cid"))
    val probed = corpus.filter(F.col("vec_id") < 20)
      .select(F.col("vec_id").as("qid"), F.col("qx16").as("qv"))
      .crossJoin(F.broadcast(centroids))
      .withColumn("d",
        VectorFunctions.vec_l2sq(F.col("qv"), F.col("mvec")))
      .withColumn("rn", F.row_number().over(wq))
      .filter(F.col("rn") <= 6)
      .select("qid", "cid").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val cellOf = assigned.select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = LlmSimilarity.queries("llm_similar_ivfpq")(spark, dir)
      .select("qid", "vec_id").collect()
    out should not be empty
    out.foreach { r =>
      val (qid, vid) = (r.getLong(0), r.getLong(1))
      withClue(s"qid=$qid vec=$vid cell=${cellOf(vid)}") {
        probed(qid) should contain(cellOf(vid))
      }
    }
  }
}
