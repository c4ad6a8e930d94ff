package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Native per-key top-k: a whole-operator extension through the full
  * custom-plan stack — logical node → planner [[SparkStrategy]] → physical
  * [[TopKPerKeyExec]] — registered via `SparkSessionExtensions`
  * (graft.functions.GraftExtensions).
  *
  * WHY a custom operator (the built-ins can express the semantics, not the
  * execution): the window formulation
  * `row_number().over(partitionBy(keys).orderBy(ord)) <= k` must SORT every
  * partition of the full input — at 100 TB that is a full-data shuffle
  * followed by a full sort, with every row materialized through the sort
  * buffer, then thrown away. This operator keeps a bounded k-row heap per
  * key on the MAP side (the top-k analogue of a partial aggregate), so the
  * exchange carries at most `partitions × keys × k` candidate rows and
  * nothing is ever fully sorted. Same two-phase shape Spark itself uses for
  * partial aggregation; memory per task is bounded by (#local keys)·k rows
  * (the hash-aggregate memory profile).
  */
case class TopKPerKey(
    partExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k requires k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Two-phase physical operator. `partial = true` runs before the exchange
  * with no distribution requirement (narrow, map-side); the final copy
  * requires [[ClusteredDistribution]] on the keys, so EnsureRequirements
  * inserts the hash exchange over the pruned candidate set only.
  */
case class TopKPerKeyExec(
    partExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(partExprs))

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val part = partExprs
    val ord = ordering
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(part, schema)
      // generated comparator: compare(a, b) < 0 ⇔ a sorts before b ⇔ a is
      // "better"; the max-heap therefore keeps the WORST retained row on
      // top, where a single compare decides replacement.
      val rowOrd: Ordering[InternalRow] = GenerateOrdering.generate(ord, schema)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](rowOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) heap += row.copy()
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.copy()
        }
      }
      // dequeueAll drains worst-first; reverse restores sort order per key.
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy: one logical [[TopKPerKey]] → partial + final exec pair. */
class TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(part, ord, k, child) =>
      TopKPerKeyExec(part, ord, k, partial = false,
        TopKPerKeyExec(part, ord, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Public DataFrame-level surface for the custom operator. */
object GraftPlans {

  /** Top `k` rows per distinct value of `keys`, ranked by `ordering`
    * (accepts `col.desc` / `col.asc`; bare columns default to ascending).
    * Requires the session to carry [[TopKStrategy]] — injected by
    * `GraftExtensions` or added programmatically via
    * `spark.experimental.extraStrategies`.
    */
  def topKPerKey(df: DataFrame, keys: Seq[Column], ordering: Seq[Column],
      k: Int): DataFrame = {
    val keyExprs = keys.map(GraftSqlBridge.expression(df.sparkSession, _))
    val sortOrders = ordering.map(GraftSqlBridge.expression(df.sparkSession, _)).map {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerKey(keyExprs, sortOrders, k, df.queryExecution.analyzed))
  }

  /** Idempotently add [[TopKStrategy]] to an existing session (the
    * extensions path covers sessions built with GraftExtensions).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.exists(_.isInstanceOf[TopKStrategy]))
      spark.experimental.extraStrategies = strategies :+ new TopKStrategy
  }
}
