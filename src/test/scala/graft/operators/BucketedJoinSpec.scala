package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.SparkSpec

/** Co-located join via bucketing — the 100 TB fact-fact pattern: both
  * sides pre-bucketed on the join key, so the join runs with ZERO shuffle
  * exchanges (each bucket pair joins in place). Asserted on the physical
  * plan, not just the result.
  */
class BucketedJoinSpec extends AnyWordSpec with Matchers with SparkSpec {

  "bucketed tables" should {
    "join without any shuffle exchange" in {
      // warehouse dir is a temp dir configured on the shared test session
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")

      val dir = "/root/testdata/sf0.001"
      spark.read.parquet(s"$dir/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
      spark.read.parquet(s"$dir/lineitem.parquet")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")

      // disable auto-broadcast so the join would otherwise shuffle
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")

        val o = spark.table("b_orders")
        val l = spark.table("b_lineitem")
        val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(F.count(F.lit(1)).as("n"))

        val shuffles = joined.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        // exactly ONE exchange: the final groupBy on o_orderstatus.
        // The join itself reads co-bucketed data and shuffles nothing.
        shuffles should have length 1

        // and the result matches the unbucketed plan
        val expected = spark.read.parquet(s"$dir/lineitem.parquet")
          .join(spark.read.parquet(s"$dir/orders.parquet"),
            F.col("l_orderkey") === F.col("o_orderkey"))
          .groupBy("o_orderstatus").agg(F.count(F.lit(1)).as("n"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap shouldBe
          expected
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
      }
    }
  }
}
