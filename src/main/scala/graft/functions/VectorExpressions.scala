package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the embedding hot path (SURVEY.md §4's
  * one sanctioned custom piece): the dot product of two `array<float>`
  * columns, accumulated left-to-right in double.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0D, +)`,
  * but that chain of higher-order functions interprets a lambda per
  * element; this expression participates in whole-stage codegen as a tight
  * primitive loop over the columnar `ArrayData` (no per-element boxing or
  * closure dispatch), which is what a 64-float × N-pair similarity scan
  * needs. Accumulation order matches the HOF form exactly, so DuckDB
  * oracles computing the ascending-index sum stay bit-identical.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null even for non-null inputs (length mismatch / null element), so
  // the default child-driven nullability would be unsound
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // HOF-equivalent semantics: zip_with over unequal lengths pads with
    // null and aggregate's sum of a null product is null — so a length
    // mismatch or a null element yields null, never a silent truncation
    // (getLong/getFloat on a null slot would read 0).
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |double $sum = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between two `array<bigint>` columns — the kernel
  * of the exact-integer k-means loop (`llm_embed_kmeans`): per-row cost
  * is k×dims of these, so the interpreted
  * `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0L, +)` lambda chain
  * is replaced by a codegen'd primitive loop. Pure integer arithmetic:
  * result is exact and order-independent, so the DuckDB oracle's
  * ascending-index `list_sum` stays bit-identical. Callers guarantee the
  * quantized components keep every (x−y)² and the 64-term sum far below
  * 2^63 (see the llm_embed_kmeans scale note).
  */
case class LongVecL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  // null even for non-null inputs (length mismatch / null element)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_l2sq expects two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // null on length mismatch or null element, matching the HOF form
    // (see FloatVecDot) — never a silent zero-fill truncation
    if (n != y.numElements()) return null
    var sum = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      sum += d * d
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |long $sum = 0L;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $sum += $d * $d;
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of common elements between two SORTED, DISTINCT arrays (string
  * or long) — a two-pointer merge, so set-intersection cardinality costs
  * O(n+m) compares with no result-array allocation (Spark's
  * `size(array_intersect(a, b))` interprets a lambda-free but
  * allocation-heavy hash build per row). Callers sort with
  * `array_sort(array_distinct(...))` once per document; the count equals
  * any set-intersection size, so DuckDB `len(list_intersect(...))`
  * oracles are unchanged.
  */
case class SortedOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private lazy val elemIsLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(t: DataType) = t match {
      case ArrayType(e @ (StringType | LongType), _) => Some(e)
      case _ => None
    }
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_overlap expects two array<string> or two array<bigint> " +
          s"arguments, got ${left.dataType.simpleString} and " +
          s"${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val cmp =
        if (elemIsLong) java.lang.Long.compare(x.getLong(i), y.getLong(j))
        else x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val cmpExpr =
        if (elemIsLong) s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  int $cmp = $cmpExpr;
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 16-bit SimHash from an array of lowercase hex digests: bit b's ±1 vote
  * per element is the parity of hex char b ('8'-'f' → +1); bit b is set
  * when the votes sum positive. One pass over the array reading 16 bytes
  * per element, replacing 16 interpreted HOF aggregates. Hex chars are
  * ASCII with '8'and'9' (0x38-39) below 'a'-'f' (0x61+), so `byte >= '8'`
  * is exactly the high-nibble test.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash16 expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](16)
    var i = 0
    while (i < n) {
      val h = arr.getUTF8String(i)
      var b = 0
      while (b < 16) {
        if (h.getByte(b) >= '8') votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 16) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val votes = ctx.freshName("votes")
      val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[16];
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $h = $a.getUTF8String($i);
         |  for (int $b = 0; $b < 16; $b++) {
         |    if ($h.getByte($b) >= (byte) '8') $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 16; $b++) {
         |  if ($votes[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {

  /** Register `vec_dot` in the session's function registry (idempotent;
    * Spark 4 constructs Columns from registered functions, not raw
    * expressions).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVecDot(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_l2sq", exprs => LongVecL2(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_overlap", exprs => SortedOverlapCount(exprs.head, exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash16", exprs => SimHash16(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "greedy_segment", exprs => GreedySegmentExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles", exprs => ShingleGenerate(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "image_dims", exprs => ImageDims(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_stats", exprs => ByteStatsExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert2", exprs => HilbertIndex(exprs.head, exprs(1),
        exprs(2).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"hilbert2 bits must be an integer literal, got $other")
        }), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash4", exprs => MinHashAgg(exprs.head).toAggregateExpression(),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash8",
      exprs => MinHashAgg(exprs.head, lanes = 8).toAggregateExpression(),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bucket", exprs => GraftBucketExpr(exprs.head, exprs(1)),
      "scala_udf")
  }

  /** 4-lane MinHash signature aggregate over a string column (see
    * [[MinHashAgg]]). Requires [[register]] on the session first.
    */
  def minhash4(a: Column): Column = F.call_function("minhash4", a)

  /** 8-lane MinHash signature (second md5 block salted with "1" — the
    * 1/sqrt(k) widening path). Requires [[register]] first.
    */
  def minhash8(a: Column): Column = F.call_function("minhash8", a)

  /** 16-bit SimHash over an `array<string>` of hex digests.
    * Requires [[register]] on the session first.
    */
  def simhash16(a: Column): Column = F.call_function("simhash16", a)

  /** Dot product of two `array<float>` columns (double accumulation).
    * Requires [[register]] on the session first.
    */
  def vec_dot(a: Column, b: Column): Column = F.call_function("vec_dot", a, b)

  /** Squared L2 distance of two `array<bigint>` columns (exact integer).
    * Requires [[register]] on the session first.
    */
  def vec_l2sq(a: Column, b: Column): Column =
    F.call_function("vec_l2sq", a, b)

  /** Squared L2 norm of an `array<float>` column. */
  def vec_norm2(a: Column): Column = vec_dot(a, a)

  /** Intersection cardinality of two sorted distinct `array<string>`
    * columns. Requires [[register]] on the session first.
    */
  def sorted_overlap(a: Column, b: Column): Column =
    F.call_function("sorted_overlap", a, b)

  /** Hilbert curve index of two bigint columns over a 2^bits grid (see
    * [[Hilbert]]). Requires [[register]] on the session first.
    */
  def hilbert2(x: Column, y: Column, bits: Int): Column =
    F.call_function("hilbert2", x.cast("long"), y.cast("long"), F.lit(bits))

  /** Header-parsed image dimensions of a `binary` column:
    * `[fmt_code, width, height]` or null (see [[ImageHeader]]).
    * Requires [[register]] on the session first.
    */
  def image_dims(a: Column): Column = F.call_function("image_dims", a)

  /** Byte-distribution features of a `binary` column:
    * `[n_bytes, distinct, modal_byte, modal_count, chi2_u]` (see
    * [[ByteStats]]). Requires [[register]] on the session first.
    */
  def byte_stats(a: Column): Column = F.call_function("byte_stats", a)
}
