package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.{functions => F}
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.SparkSpec

/** Hot-band skew proof for the MinHash band join. DedupScaleSpec pins
  * linear growth on a near-uniform corpus and DedupGuardSpec pins the
  * exact-dup collapse; the remaining hazard is a band bucket that is hot
  * with DISTINCT shingle sets — collapse cannot absorb it, and the
  * band-signature self-join concentrates the whole bucket in one shuffle
  * partition. The engine's answer is AQE skew-join (the band join is a
  * plain equi-join, so Spark can split the hot partition at runtime with
  * no salting complexity in the operator); this spec builds such a
  * corpus — hundreds of distinct sets sharing a large anchor, so nearly
  * every doc lands in one band bucket — and asserts (a) the bucket really
  * is hot, (b) AQE physically splits it, and (c) the candidate set is
  * still exactly right (independently re-derived from the bucket
  * contents).
  */
class BandSkewSpec extends AnyWordSpec with Matchers with SparkSpec {

  "the MinHash band join" should {
    "split a deliberately hot band at runtime and keep candidates exact" in {
      import spark.implicits._
      // 500 DISTINCT shingle sets: a 200-shingle shared anchor plus 3
      // unique shingles each. A unique shingle only changes a band
      // signature if its md5 beats the anchor minimum in that band's hex
      // slice (p ≈ 3/203 per band), so nearly all docs share both band
      // signatures — one hot bucket that is NOT an exact-dup group.
      val anchor = (0 until 200).map(i => s"anchor token $i")
      val docs = (0 until 500).map { d =>
        (d.toLong, anchor ++ Seq(s"uniq ${d} a", s"uniq ${d} b", s"uniq ${d} c"))
      }.toDF("doc_id", "shs")

      val confs = Map(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      try {
        confs.foreach { case (k, v) => spark.conf.set(k, v) }

        // independent re-derivation of the band buckets (same minhash
        // definition, separate code path): per-band signature → doc list
        val sigs = docs
          .withColumn("hs", F.expr("transform(shs, x -> md5(x))"))
          .select(F.col("doc_id"), F.expr(
            "stack(2, 0, concat(array_min(transform(hs, h -> substring(h, 1, 8))), " +
              "array_min(transform(hs, h -> substring(h, 9, 8)))), " +
              "1, concat(array_min(transform(hs, h -> substring(h, 17, 8))), " +
              "array_min(transform(hs, h -> substring(h, 25, 8))))) as (k, mh)"))
          .collect().map(r => ((r.getInt(1), r.getString(2)), r.getLong(0)))
        val buckets = sigs.groupBy(_._1).view
          .mapValues(_.map(_._2).toVector.sorted).toMap
        val hot = buckets.values.map(_.length).max
        hot should be >= 400 // the bucket IS hot, and these are distinct sets
        val expected = buckets.values.flatMap { ds =>
          for (a <- ds; b <- ds if a < b) yield (a, b)
        }.toSet

        val cands = LlmDedup.bandCandidatesOf(docs)
        val got = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        got shouldBe expected // the split join dropped / duplicated nothing
        got.size should be >= hot * (hot - 1) / 2 // quadratic bucket, present

        val adaptive = cands.queryExecution.executedPlan.collect {
          case a: AdaptiveSparkPlanExec => a
        }.head
        val rendered = adaptive.executedPlan.treeString
        withClue(rendered.take(3000)) {
          rendered should include("SortMergeJoin(skew=true)")
          rendered should include("AQEShuffleRead skewed")
        }
      } finally {
        saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
    }
  }
}
