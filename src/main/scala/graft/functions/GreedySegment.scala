package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first subword segmentation (the WordPiece /
  * SentencePiece-greedy decoding rule) against a FIXED character-gram
  * vocabulary: at each position take the longest matching vocabulary
  * gram (4 > 3 > 2), falling back to a single character. One linear
  * pass per row, embarrassingly parallel — the per-row kernel a
  * tokenizer-throughput pipeline runs over every document at 100 TB.
  *
  * The vocabulary is deliberately a compile-time constant (real
  * tokenizers ship frozen vocabs); corpus-TRAINED merges are the BPE
  * family (graft.operators.LlmBpe). The same literal lists are spliced
  * into the DuckDB oracle, whose recursive CTE re-derives the exact
  * greedy walk — so the hash pins every token boundary.
  *
  * Matching is over UTF-16 units of the decoded string; the vocabulary
  * is pure ASCII, so non-ASCII positions simply never match and advance
  * one unit at a time.
  */
object GreedySegment {

  /** Frozen vocab, longest-match-first. English-weighted character
    * grams (the documents corpus is ASCII prose).
    */
  val Grams4: Array[String] = Array(
    "tion", "atio", "ment", "ther", "with", "that", "here", "ould",
    "ight", "hich")
  val Grams3: Array[String] = Array(
    "the", "ing", "and", "ion", "ent", "for", "ati", "ter", "ate",
    "est", "res", "con", "ver", "all", "ons")
  val Grams2: Array[String] = Array(
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
    "ve", "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea",
    "ra", "ce", "li", "ch", "ll", "be", "ma", "si", "om", "ur")

  private val s4 = new java.util.HashSet[String](java.util.Arrays.asList(Grams4: _*))
  private val s3 = new java.util.HashSet[String](java.util.Arrays.asList(Grams3: _*))
  private val s2 = new java.util.HashSet[String](java.util.Arrays.asList(Grams2: _*))

  /** Returns [n_tokens, sum of squared token lengths] — the second
    * component pins the exact segmentation (two different token walks
    * with equal counts almost surely differ in their length profile).
    */
  def compute(t: UTF8String): ArrayData = {
    val s = t.toString
    val len = s.length
    var pos = 0
    var n = 0L
    var sq = 0L
    while (pos < len) {
      val rem = len - pos
      val l =
        if (rem >= 4 && s4.contains(s.substring(pos, pos + 4))) 4
        else if (rem >= 3 && s3.contains(s.substring(pos, pos + 3))) 3
        else if (rem >= 2 && s2.contains(s.substring(pos, pos + 2))) 2
        else 1
      pos += l
      n += 1
      sq += l.toLong * l
    }
    new GenericArrayData(Array(n, sq))
  }
}

/** `greedy_segment(text)` → array<bigint> [n_tokens, sum_sq_len]. */
case class GreedySegmentExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"greedy_segment expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    GreedySegment.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GreedySegment.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
