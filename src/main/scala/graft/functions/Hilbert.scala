package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert curve index for multi-dimensional data layout.
  *
  * Same role as [[ZOrder.zvalue]] — range-partition/sort a table by the
  * curve index so per-file min/max stays narrow on EVERY dimension — but
  * with the Hilbert curve's defining property: consecutive index values
  * are Manhattan-adjacent grid cells (the z-curve jumps across the grid
  * at every power-of-two boundary). At 100 TB that means each file covers
  * ONE contiguous region instead of a handful of disconnected z-blocks,
  * so box predicates overlap fewer files; the curve is what
  * Iceberg/Databricks-class OPTIMIZE offers beyond plain z-order.
  *
  * The per-level rotate/reflect makes the index a sequential recurrence,
  * so unlike the z-value it is not a flat bit-interleave expression: the
  * kernel is the standard O(bits) loop (public-domain Hilbert conversion
  * algorithm), shared verbatim between interpreted eval and codegen, and
  * the DuckDB oracle replays it as `bits` unrolled CTE steps —
  * HilbertLaws proves bijectivity and unit-step adjacency, which no
  * subtly-wrong variant survives.
  */
object Hilbert {

  /** Map grid cell (x, y) — low `bits` bits of each — to its index along
    * the order-`bits` Hilbert curve. Inputs are masked to the grid, so
    * out-of-range/negative values fold in rather than corrupt the curve.
    */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate the quadrant so the sub-curve orients right
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse (index → cell), used by the laws to prove bijectivity. */
  def d2xy(bits: Int, d0: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}

/** `hilbert2(x, y, bits)`: codegen'd scalar expression over two long
  * columns. `bits` must be a foldable literal (resolved at plan time by
  * the registry lambda).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31,
    s"hilbert2 supports 1..31 bits per dimension, got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert2 expects two bigint arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    Hilbert.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Hilbert.xy2d($bits, $a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
