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
  * exchange carries bounded candidate sets and nothing is ever fully
  * sorted. Same two-phase shape Spark itself uses for partial aggregation.
  * Partial-phase memory is HARD-bounded at maxBufferedKeys·k rows by
  * flushing under key-cardinality pressure (unlike hash aggregation there
  * is no sort-spill fallback — see [[TopKPerKey.DefaultMaxBufferedKeys]]
  * for why flushing is exact). The FINAL phase is memory-bounded too: it
  * declares `requiredChildOrdering` on (keys, ordering), so
  * EnsureRequirements plans a SPILLABLE SortExec over the already-pruned
  * candidate set and the final pass streams each key group in O(k) memory
  * — no per-partition hash of all keys, so arbitrary key cardinality
  * cannot OOM it. Sorting only the ≤ partitions·keys·k candidates is the
  * cheap side of the trade; the raw input is still never sorted.
  */
case class TopKPerKey(
    partExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    maxBufferedKeys: Int = TopKPerKey.DefaultMaxBufferedKeys) extends UnaryNode {
  require(k > 0, s"top-k requires k > 0, got $k")
  require(maxBufferedKeys > 0,
    s"top-k requires maxBufferedKeys > 0, got $maxBufferedKeys")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** Partial-phase memory bound: at most this many per-key heaps are held
    * before the buffered candidates are FLUSHED downstream and the map
    * restarts. Flushing is correct for the partial phase — a row in the
    * partition's true top-k is in the top-k of every prefix that contains
    * it, so the union of flushed prefix top-ks is a candidate superset —
    * it just prunes less. This bounds partial-phase memory at
    * maxBufferedKeys·k rows regardless of key cardinality (the final
    * phase streams over sorted runs in O(k) memory — see
    * [[TopKPerKeyExec.requiredChildOrdering]]).
    */
  val DefaultMaxBufferedKeys: Int = 1 << 16
}

/** Two-phase physical operator. `partial = true` runs before the exchange
  * with no distribution requirement (narrow, map-side); the final copy
  * requires [[ClusteredDistribution]] on the keys plus a per-partition
  * (keys, ordering) sort, so EnsureRequirements inserts the hash exchange
  * over the pruned candidate set and a spillable sort above it — the
  * final pass then streams consecutive key groups in O(k) memory.
  */
case class TopKPerKeyExec(
    partExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    maxBufferedKeys: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(partExprs))

  /** The final phase consumes key-grouped runs: (keys, ordering)-sorted
    * input lets it stream with O(k) memory. Spark satisfies this with an
    * external (spillable) sort over the pruned candidates.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(partExprs.map(SortOrder(_, Ascending)) ++ ordering)

  override def outputPartitioning = child.outputPartitioning

  /** The final pass is order-preserving, so its (keys, ordering) input
    * sort survives — downstream per-key consumers get it for free.
    */
  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil
    else partExprs.map(SortOrder(_, Ascending)) ++ ordering

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val part = partExprs
    val limit = k
    if (!partial) {
      // Streaming final: input is (keys, ordering)-sorted, so each key's
      // rows form a consecutive best-first run — keep the first k of each.
      return child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(part, schema)
        var cur: UnsafeRow = null
        var n = 0
        iter.filter { row =>
          val key = keyProj(row)
          if (cur == null || key != cur) { cur = key.copy(); n = 0 }
          n += 1
          n <= limit
        }
      }, preservesPartitioning = true)
    }
    val ord = ordering
    // the partial phase flushes under key-cardinality pressure (see
    // TopKPerKey.DefaultMaxBufferedKeys).
    val flushAt = maxBufferedKeys
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(part, schema)
      // generated comparator: compare(a, b) < 0 ⇔ a sorts before b ⇔ a is
      // "better"; the max-heap therefore keeps the WORST retained row on
      // top, where a single compare decides replacement.
      val rowOrd: Ordering[InternalRow] = GenerateOrdering.generate(ord, schema)

      new Iterator[InternalRow] {
        private var drain: Iterator[InternalRow] = Iterator.empty
        private var pending: InternalRow = null

        private def refill(): Unit = {
          val heaps =
            mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
          def add(row: InternalRow): Boolean = {
            val key = keyProj(row)
            heaps.get(key) match {
              case Some(h) =>
                if (h.size < limit) h += row.copy()
                else if (rowOrd.compare(row, h.head) < 0) {
                  h.dequeue(); h += row.copy()
                }
                true
              case None if heaps.size < flushAt =>
                val h = mutable.PriorityQueue.empty[InternalRow](rowOrd)
                h += row.copy()
                heaps.put(key.copy(), h)
                true
              case None => false // would exceed the buffer: flush first
            }
          }
          if (pending != null) { add(pending); pending = null }
          var full = false
          while (!full && iter.hasNext) {
            val row = iter.next()
            if (!add(row)) { pending = row.copy(); full = true }
          }
          // dequeueAll drains worst-first; reverse restores sort order.
          drain = heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
        }

        override def hasNext: Boolean = {
          while (!drain.hasNext && (pending != null || iter.hasNext)) refill()
          drain.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          drain.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy: one logical [[TopKPerKey]] → partial + final exec pair. */
class TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(part, ord, k, child, maxKeys) =>
      TopKPerKeyExec(part, ord, k, partial = false, maxKeys,
        TopKPerKeyExec(part, ord, k, partial = true, maxKeys,
          planLater(child))) :: Nil
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
    *
    * Determinism contract: `ordering` must be a TOTAL order per key.
    * Comparator ties are broken by arrival order (the heap keeps the
    * first-arriving of equal rows), so under a partial order the result —
    * like the `row_number()` window formulation it replaces — is
    * arrival-order-dependent and may vary run to run. Add a unique
    * tiebreaker column (e.g. a primary key) to the ordering when the
    * prefix can tie.
    */
  def topKPerKey(df: DataFrame, keys: Seq[Column], ordering: Seq[Column],
      k: Int,
      maxBufferedKeys: Int = TopKPerKey.DefaultMaxBufferedKeys): DataFrame = {
    val keyExprs = keys.map(GraftSqlBridge.expression(df.sparkSession, _))
    val sortOrders = ordering.map(GraftSqlBridge.expression(df.sparkSession, _)).map {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerKey(keyExprs, sortOrders, k, df.queryExecution.analyzed,
        maxBufferedKeys))
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
