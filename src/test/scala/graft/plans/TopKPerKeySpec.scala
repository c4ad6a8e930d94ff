package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TopKPerKeySpec extends AnyFunSuite with SparkSpec with Matchers {

  private def data = {
    import spark.implicits._
    // 4 keys × 250 rows, deterministic values with ties (v = i % 97)
    spark.range(1000)
      .select((F.col("id") % 4).as("k"), F.col("id").as("i"),
        (F.col("id") % 97).as("v"))
  }

  private def registered = { GraftPlans.register(spark); spark }

  /** flatten an executed plan INCLUDING adaptive and query-stage subtrees
    * (AdaptiveSparkPlanExec/QueryStageExec are traversal barriers for
    * `collect`).
    */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val nested = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case _ => Seq.empty
    }
    p +: (p.children.flatMap(allNodes) ++ nested)
  }

  test("matches the window row_number formulation exactly") {
    registered
    val native = GraftPlans.topKPerKey(data,
        Seq(F.col("k")), Seq(F.col("v").desc, F.col("i")), 7)
      .select("k", "i", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val w = Window.partitionBy("k").orderBy(F.col("v").desc, F.col("i"))
    val expected = data.withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= 7).select("k", "i", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    native shouldBe expected
    native.size shouldBe 28
  }

  test("plans as a partial + final exec pair around one exchange") {
    registered
    val df = GraftPlans.topKPerKey(data, Seq(F.col("k")), Seq(F.col("v").desc), 3)
    df.collect() // finalize the adaptive plan
    val nodes = allNodes(df.queryExecution.executedPlan)
    val execs = nodes.collect { case e: TopKPerKeyExec => e }
    execs.map(_.partial).sorted shouldBe Seq(false, true)
    // the final copy must sit above a hash exchange on the keys
    val hasExchange = nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(hasExchange,
      s"expected an exchange between phases:\n${df.queryExecution.executedPlan}")
  }

  test("partial phase prunes the exchanged row count to <= partitions*keys*k") {
    registered
    val parts = 6
    val k = 5
    val df = GraftPlans.topKPerKey(data.repartition(parts),
      Seq(F.col("k")), Seq(F.col("v").desc, F.col("i")), k)
    df.collect()
    // the exchange between the phases carries only the pruned candidate
    // set — its records-written metric must be far below the 1000 inputs
    val shuffleRows = allNodes(df.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.metrics.collectFirst {
          case (k2, m) if k2.toLowerCase.contains("records") => m.value
        }
    }.flatten
    shuffleRows should not be empty
    assert(shuffleRows.min <= parts.toLong * 4 * k,
      s"expected <= ${parts * 4 * k} candidate rows, shuffled ${shuffleRows.min}")
  }

  test("partial-phase flushing under key pressure stays exact") {
    registered
    // 500 distinct keys through a 16-key partial buffer: many flushes per
    // partition, result must still equal the window formulation
    val df = spark.range(5000)
      .select((F.col("id") % 500).as("g"), F.col("id").as("i"),
        (F.col("id") % 37).as("v"))
    val native = GraftPlans.topKPerKey(df,
        Seq(F.col("g")), Seq(F.col("v").desc, F.col("i")), 3,
        maxBufferedKeys = 16)
      .select("g", "i").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("g").orderBy(F.col("v").desc, F.col("i"))
    val win = df.withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= 3).select("g", "i").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    native shouldBe win
  }

  test("final phase streams sorted runs: spillable sort planned, high key cardinality exact") {
    registered
    // 20k distinct keys: the pre-r4 hash-of-all-keys final would hold
    // every key's heap; the streaming final needs only one group at a time
    val df = spark.range(40000)
      .select((F.col("id") % 20000).as("g"), F.col("id").as("i"),
        (F.col("id") % 13).as("v"))
    val native = GraftPlans.topKPerKey(df,
      Seq(F.col("g")), Seq(F.col("v").desc, F.col("i")), 1)
    val got = native.select("g", "i").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("g").orderBy(F.col("v").desc, F.col("i"))
    val win = df.withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= 1).select("g", "i").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe win
    got.size shouldBe 20000
    // the final exec's child chain must carry a SortExec (the spillable
    // sort EnsureRequirements inserted for requiredChildOrdering)
    val nodes = allNodes(native.queryExecution.executedPlan)
    val finalExec = nodes.collect { case e: TopKPerKeyExec if !e.partial => e }
    finalExec should not be empty
    val sortBelowFinal = finalExec.exists(f =>
      allNodes(f.child).exists(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]))
    assert(sortBelowFinal,
      s"expected a SortExec below the final TopKPerKeyExec:\n${native.queryExecution.executedPlan}")
  }

  test("keeps fewer than k rows for sparse keys and handles k=1") {
    import spark.implicits._
    registered
    val tiny = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v")
    val r1 = GraftPlans.topKPerKey(tiny, Seq(F.col("k")), Seq(F.col("v").desc), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    r1.toSeq shouldBe Seq((1L, 10L), (1L, 20L), (2L, 5L))
    val r2 = GraftPlans.topKPerKey(tiny, Seq(F.col("k")), Seq(F.col("v").desc), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    r2.toSeq shouldBe Seq((1L, 20L), (2L, 5L))
  }
}
