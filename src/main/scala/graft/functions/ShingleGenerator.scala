package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, CollectionGenerator, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** UDTF surface: a custom Catalyst [[CollectionGenerator]] — the
  * table-function analogue of the engine's scalar expressions. `shingles(
  * text, n)` emits one `(pos, shingle)` row per n-word window of a
  * whitespace-tokenized document — the row-generating form of the shingle
  * arrays the dedup operators build (LlmDedup.shingleArrays), for
  * pipelines that want shingles as rows (e.g. feeding a distinct/groupBy
  * directly) without materializing the per-document array first.
  *
  * Generators run per-row with no state and no shuffle — the lateral
  * expansion scales linearly like explode. Registered through
  * GraftExtensions/VectorFunctions, so `SELECT doc_id, shingles(text, 3)`
  * and LATERAL VIEW both resolve.
  */
case class ShingleGenerate(child: Expression, nExpr: Expression)
    extends BinaryExpression with CollectionGenerator with CodegenFallback {

  override def left: Expression = child
  override def right: Expression = nExpr

  override def position: Boolean = false
  override def inline: Boolean = false

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType && nExpr.dataType == IntegerType &&
      nExpr.foldable && { val v = nExpr.eval(null); v != null && v.asInstanceOf[Int] >= 1 })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "shingles(text, n) expects (string, foldable int >= 1)")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null) return Iterator.empty
    val n = nExpr.eval(input).asInstanceOf[Int]
    // split limit -1 keeps trailing empty tokens — the convention Spark's
    // F.split and DuckDB's string_split share (Java's default drops them,
    // which would shift shingle counts on trailing-space inputs)
    val words = text.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n) return Iterator.empty
    Iterator.tabulate(words.length - n + 1) { i =>
      InternalRow(i, UTF8String.fromString(words.slice(i, i + n).mkString(" ")))
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShingleGenerate = copy(child = newLeft, nExpr = newRight)
}

object ShingleGenerate {
  /** row-count identity used in specs: a w-word doc yields max(0, w-n+1). */
  def expectedCount(words: Int, n: Int): Int = math.max(0, words - n + 1)
}
