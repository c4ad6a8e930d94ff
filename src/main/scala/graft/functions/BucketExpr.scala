package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** The graft-avro hash-bucket function (standalone object so codegen can
  * call it through a static forwarder): first 8 bytes of the canonical
  * string's md5 as a big-endian long, floor-mod n. THE single source of
  * truth — the bucketed writer's directory routing, the scan's
  * filter-literal targets, the catalog's SPJ `bucket` function, and this
  * SQL-surface expression all delegate here; a divergence anywhere
  * breaks bucket pruning soundness.
  */
object BucketHash {
  def bucket(canonical: String, n: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (md(i) & 0xffL); i += 1 }
    java.lang.Math.floorMod(h, n.toLong).toInt
  }

  /** Canonical string of a DATE's epoch-day int (ISO LocalDate — the
    * same string `java.sql.Date.toString` yields on the writer path).
    */
  def dateCanonical(epochDay: Int): String =
    java.time.LocalDate.ofEpochDay(epochDay.toLong).toString

  /** Canonical string of a DECIMAL value (r20): scale-normalized plain
    * form — `stripTrailingZeros.toPlainString`, so 1.10 at scale 2 and
    * 1.1 at scale 1 (the same numeric value under SQL equality) hash
    * identically wherever writer values and filter literals carry
    * different scales. toPlainString keeps 100 as "100", never "1E+2".
    */
  def decimalCanonical(bd: java.math.BigDecimal): String =
    bd.stripTrailingZeros.toPlainString
}

/** `graft_bucket(col, n)`: the bucket ordinal a bucketed graft-avro
  * write routes this value to. Null in → null out (null rows route to
  * the `__null__` segment, which has no ordinal). The intended use is
  * WRITE-SIDE LAYOUT CONTROL: `df.repartition(F.expr("graft_bucket(k,
  * 8)"))` before a `bucketBy=k:8` write co-locates each bucket in one
  * task, so the job writes ~8 files instead of tasks × 8 — the same
  * lever Iceberg exposes as its bucket transform function.
  */
case class GraftBucketExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVal = left.dataType match {
      case StringType | IntegerType | LongType | ShortType | ByteType |
           BooleanType | DateType => true
      case _: DecimalType => true
      // timestamp internals are epoch-micros longs — the canonical
      // string IS String.valueOf(micros), the default branch below
      case TimestampType | TimestampNTZType => true
      case _ => false
    }
    if (!okVal) TypeCheckResult.TypeCheckFailure(
      "graft_bucket expects a string/integral/boolean/date/decimal/" +
        "timestamp value, got " + left.dataType.simpleString)
    else if (right.dataType != IntegerType) TypeCheckResult.TypeCheckFailure(
      s"graft_bucket expects an int bucket count, got " +
        right.dataType.simpleString)
    else TypeCheckResult.TypeCheckSuccess
  }

  private def canonical(v: Any): String = left.dataType match {
    case StringType => v.toString
    case DateType => BucketHash.dateCanonical(v.asInstanceOf[Int])
    case _: DecimalType => BucketHash.decimalCanonical(
      v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal)
    case _ => String.valueOf(v)
  }

  override def nullSafeEval(v: Any, n: Any): Any = {
    val nn = n.asInstanceOf[Int]
    require(nn > 0, s"graft_bucket: bucket count must be positive, got $nn")
    BucketHash.bucket(canonical(v), nn)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val canon = left.dataType match {
        case StringType => s"$v.toString()"
        case DateType => s"graft.functions.BucketHash.dateCanonical($v)"
        case _: DecimalType =>
          s"graft.functions.BucketHash.decimalCanonical(" +
            s"$v.toJavaBigDecimal())"
        case _ => s"String.valueOf($v)"
      }
      s"""
         |if ($n <= 0) throw new IllegalArgumentException(
         |  "graft_bucket: bucket count must be positive, got " + $n);
         |${ev.value} = graft.functions.BucketHash.bucket($canon, $n);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
