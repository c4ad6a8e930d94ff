package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash-signature aggregate: `minhash4(str)` / `minhash8(str)`
  * return the k-lane MinHash signature of a group's string set as
  * `array<bigint>`.
  *
  * This is the engine's [[TypedImperativeAggregate]] surface — the same
  * imperative-buffer aggregate class Spark's own sketches (HLL++,
  * percentile_approx, bloom_filter_agg) are built on, and the right shape
  * for ANY mergeable sketch at scale:
  * - `update` folds one row into a fixed 32-byte buffer of `lanes` longs;
  * - `merge` is an element-wise min — associative, commutative, and
  *   order-independent, so partial aggregation and AQE shuffle-merge
  *   order cannot change the result (determinism under Spark's
  *   nondeterministic merge order, unlike double-accumulating UDAFs);
  * - the shuffle carries 8·lanes bytes per group, never the member strings.
  *
  * Lane construction (CLAUDE.md hash rules): md5 sliced into 8-hex-char
  * (32-bit) lanes, four lanes per digest BLOCK; block 0 hashes the value
  * itself, block b > 0 hashes `b.toString + value` (the salted-widening
  * path) — reproducible in any engine with md5 (DuckDB oracle block b:
  * `min(CAST('0x' || substring(md5(CAST(b AS VARCHAR) || v), 1+8*i, 8)
  * AS BIGINT))`). Empty groups and null inputs leave a lane at
  * Long.MaxValue, mirroring `min`'s null-skipping.
  *
  * The signature estimates set resemblance: P[lane_i equal] = Jaccard
  * (Broder 1997); the estimator's std-error 1/sqrt(k) is why `minhash8`
  * exists alongside the 4-lane demonstration width.
  */
case class MinHashAgg(
    child: Expression,
    lanes: Int = MinHashAgg.Lanes,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(lanes >= 1 && lanes % 4 == 0,
    s"minhash lane count must be a positive multiple of 4 (one digest " +
      s"block yields 4 lanes), got $lanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = s"minhash$lanes"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(lanes)(Long.MaxValue)

  // one digest instance per thread: MessageDigest is stateful and the same
  // expression object can serve several local-mode tasks concurrently
  @transient private lazy val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var block = 0
      while (block * 4 < lanes) {
        val digest =
          if (block == 0) md.get().digest(bytes)
          else {
            val d = md.get()
            d.update(block.toString.getBytes("UTF-8")) // salt: md5(b || v)
            d.digest(bytes)
          }
        var i = 0
        while (i < 4 && block * 4 + i < lanes) {
          // lane = hex chars [8i, 8i+8) of the digest = bytes [4i, 4i+4),
          // read big-endian as an unsigned 32-bit value (always >= 0)
          val lane = ((digest(4 * i) & 0xffL) << 24) |
            ((digest(4 * i + 1) & 0xffL) << 16) |
            ((digest(4 * i + 2) & 0xffL) << 8) |
            (digest(4 * i + 3) & 0xffL)
          val j = block * 4 + i
          if (lane < buf(j)) buf(j) = lane
          i += 1
        }
        block += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < lanes) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(lanes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(lanes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  val Lanes = 4
}
