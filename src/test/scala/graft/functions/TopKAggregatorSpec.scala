package graft.functions

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.SparkSpec

class TopKAggregatorSpec extends AnyWordSpec with Matchers with SparkSpec {

  "TopKAggregator" should {
    "match the window-function top-k on real data" in {
      import spark.implicits._
      val orders = spark.read
        .parquet("/root/testdata/sf0.001/orders.parquet")

      // typed aggregator path: bounded buffers, map-side partial top-k
      val viaAgg = orders
        .select(F.col("o_custkey"), F.col("o_orderkey").as("id"),
          F.col("o_totalprice").as("score"))
        .as[(Long, Long, Double)]
        .map { case (c, id, s) => (c, Scored(id, s)) }
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(new TopKAggregator(3).toColumn.name("top"))
        .flatMap { case (c, top) => top.map(s => (c, s.id, s.score)) }
        .collect().toSet

      // window path: full per-partition sort
      val w = Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey"))
      val viaWindow = orders
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .as[(Long, Long, Double)]
        .collect().toSet

      viaAgg shouldBe viaWindow
    }

    "keep the buffer bounded during merge" in {
      val agg = new TopKAggregator(2)
      val big = (1 to 100).map(i => Scored(i.toLong, i.toDouble)).toList
      val merged = big.foldLeft(agg.zero)(agg.reduce)
      merged should have length 2
      agg.merge(merged, merged) should have length 2
      agg.finish(merged).map(_.id) shouldBe Seq(100L, 99L)
    }
  }
}
