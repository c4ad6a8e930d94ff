package graft.operators

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.SparkSpec

/** AQE skew-join handling: a join keyed on a heavily-skewed column gets
  * its hot partition split at runtime (SortMergeJoin(skew=true)) — the
  * adaptive complement to the manual salting pattern in q_skew_salted.
  */
class SkewJoinSpec extends AnyWordSpec with Matchers with SparkSpec {

  "AQE" should {
    "split a skewed join partition at runtime" in {
      import spark.implicits._
      val confs = Map(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      try {
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        // 1 hot key with 200k rows + 50 cold keys with 100 rows each
        val left = spark.range(200000).select(F.lit(0L).as("k"),
            F.col("id").as("payload"))
          .unionAll(spark.range(5000).select((F.col("id") % 50 + 1).as("k"),
            F.col("id").as("payload")))
        val right = spark.range(51).select(F.col("id").as("k"),
          (F.col("id") * 10).as("v"))
        val joined = left.join(right, "k")
        // materialize through THIS QueryExecution (count() would build a
        // separate aggregate plan and leave this one unexecuted)
        joined.collect().length shouldBe 205000

        val adaptive = joined.queryExecution.executedPlan.collect {
          case a: AdaptiveSparkPlanExec => a
        }.head
        // QueryStageExec wrappers are leaves to collect(), so assert on the
        // rendered final plan: the skewed shuffle read + split join marker
        val rendered = adaptive.executedPlan.treeString
        withClue(rendered.take(2000)) {
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
