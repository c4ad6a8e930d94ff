package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored row for [[TopKAggregator]]. */
final case class Scored(id: Long, score: Double)

/** Bounded top-k as a typed `Aggregator[IN, BUF, OUT]` — the user-facing
  * UDAF surface (SURVEY.md §2.3: extensions use Aggregator where built-ins
  * don't cover).
  *
  * The buffer never exceeds k entries, so map-side partial aggregation
  * ships at most k rows per (group × partition) to the shuffle — the
  * aggregate analogue of `TakeOrderedAndProject`, and the reason a
  * grouped top-k via Aggregator scales where `collect_list` + sort does
  * not (that buffers the whole group). Ordering is (score DESC, id ASC),
  * deterministic under ties.
  */
class TopKAggregator(k: Int)
    extends Aggregator[Scored, List[Scored], Seq[Scored]] {
  require(k > 0, "k must be positive")

  override def zero: List[Scored] = Nil

  override def reduce(buf: List[Scored], a: Scored): List[Scored] =
    trim(a :: buf)

  override def merge(x: List[Scored], y: List[Scored]): List[Scored] =
    trim(x ::: y)

  override def finish(buf: List[Scored]): Seq[Scored] = sorted(buf)

  private def sorted(l: List[Scored]): List[Scored] =
    l.sortBy(s => (-s.score, s.id))

  private def trim(l: List[Scored]): List[Scored] = sorted(l).take(k)

  override def bufferEncoder: Encoder[List[Scored]] =
    ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}
