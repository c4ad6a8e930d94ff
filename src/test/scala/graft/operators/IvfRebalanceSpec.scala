package graft.operators

import java.io.File

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.{Window => W}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.VectorFunctions
import graft.sources.AvroFileSource

/** Contract of the IVF list rebalance (llm_similar_ivf_rebalance): after
  * three skewed append rounds pile the tail of the corpus onto day-1
  * centroids, splitting every list past the 1× mean must
  *  (a) repair balance — the max list size strictly drops,
  *  (b) touch only the oversized lists — every pre-existing assignment
  *      file survives BYTE-IDENTICAL (parents die via the metadata
  *      equality-delete sidecar, children append as new files),
  *  (c) keep the index consistent — every live assignment points at a
  *      live centroid, split parents serve no rows,
  *  (d) hold the recall floor vs exhaustive same-metric search. The
  *      synthetic embeddings are near-uniform, so recall tracks the
  *      corpus fraction probed: nprobe=6 over the GROWN list count
  *      probes a smaller fraction than 6-of-8, and the pinned floor
  *      (0.75; measured 0.90 at sf0.001) reflects that geometry, not a quality loss — on
  *      clustered real-world data splitting hot lists RAISES recall at
  *      fixed nprobe because probes stop drowning in one mega-cell.
  */
class IvfRebalanceSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = "/root/testdata/sf0.001"

  test("rebalance splits only oversized lists, keeps untouched files " +
      "byte-identical, and holds the recall floor") {
    val n = Catalog.load(spark, dir, "embeddings").count()
    val cut = n / 2
    val (cenDir, asgDir) =
      LlmSimilarity.buildIvfIndex(spark, dir, below = Some(cut))
    val b = (n - cut) / 3
    LlmSimilarity.appendIvfAssignments(spark, dir, cenDir, asgDir,
      cut, Some(cut + b))
    LlmSimilarity.appendIvfAssignments(spark, dir, cenDir, asgDir,
      cut + b, Some(cut + 2 * b))
    LlmSimilarity.appendIvfAssignments(spark, dir, cenDir, asgDir,
      cut + 2 * b)

    def listSizes(): Map[Long, Long] =
      spark.read.format("graft-avro").load(asgDir)
        .groupBy("cid").agg(F.count(F.lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = listSizes()
    val preFiles = AvroFileSource.listAvro(new File(asgDir))
      .map(f => f.getPath -> f.length()).toMap
    val maxCidBefore = spark.read.format("graft-avro").load(cenDir)
      .agg(F.max("cid")).head().getLong(0)

    val split = LlmSimilarity.rebalanceIvfLists(spark, dir, cenDir, asgDir)
    split should not be empty
    // exactly the lists past the 1x mean were split
    val total = before.values.sum
    val k = before.size
    split.toSet shouldBe before.collect {
      case (cid, c) if c * k > total => cid }.toSet

    // (a) balance repaired
    val after = listSizes()
    after.values.max should be < before.values.max
    // split parents serve no rows; children ids sit past the old max
    split.foreach(cid => after.get(cid) shouldBe None)
    after.keySet.filterNot(before.keySet) should not be empty
    after.keySet.filterNot(before.keySet).foreach(_ should be > maxCidBefore)
    // no row lost or duplicated
    after.values.sum shouldBe total

    // (b) untouched files byte-identical: every pre-rebalance file is
    // still there at the same length (the delete was a sidecar)
    val postFiles = AvroFileSource.listAvro(new File(asgDir))
      .map(f => f.getPath -> f.length()).toMap
    preFiles.foreach { case (p, len) => postFiles.get(p) shouldBe Some(len) }
    postFiles.size should be > preFiles.size
    new File(asgDir, "_graft_deletes").isFile shouldBe true

    // (c) consistency: every assignment's cid is a live centroid
    val liveCids = spark.read.format("graft-avro").load(cenDir)
      .select("cid").collect().map(_.getLong(0)).toSet
    after.keySet.subsetOf(liveCids) shouldBe true

    // (d) recall floor vs exhaustive same-metric search
    VectorFunctions.register(spark)
    val corpus = Catalog.load(spark, dir, "embeddings")
      .select(F.col("vec_id"), F.expr(
        "transform(embedding, x -> " +
          "cast(floor(cast(x as double) * 10000.0) as bigint) * 16)")
        .as("qx16"))
      .localCheckpoint()
    val q = corpus.filter(F.col("vec_id") < 20)
      .select(F.col("vec_id").as("qid"), F.col("qx16").as("qv"))
    val w = W.partitionBy("qid").orderBy(F.col("d"), F.col("vec_id"))
    val exact = corpus.crossJoin(F.broadcast(q))
      .filter(F.col("vec_id") =!= F.col("qid"))
      .select(F.col("qid"), F.col("vec_id"),
        VectorFunctions.vec_l2sq(F.col("qv"), F.col("qx16")).as("d"))
      .withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= 3)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = LlmSimilarity
      .searchPersistedIvf(spark, dir, cenDir, asgDir)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(got.contains).toDouble / exact.length
    info(f"post-rebalance recall@3 = $recall%.3f " +
      f"(${split.size} lists split, ${after.size} lists now)")
    recall should be >= 0.75
  }
}
