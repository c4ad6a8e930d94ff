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

/** Native MinHash-signature aggregate: `minhash4(str)` returns the 4-lane
  * MinHash signature of a group's string set as `array<bigint>`.
  *
  * This is the engine's [[TypedImperativeAggregate]] surface — the same
  * imperative-buffer aggregate class Spark's own sketches (HLL++,
  * percentile_approx, bloom_filter_agg) are built on, and the right shape
  * for ANY mergeable sketch at scale:
  * - `update` folds one row into a fixed 32-byte buffer (4 longs);
  * - `merge` is an element-wise min — associative, commutative, and
  *   order-independent, so partial aggregation and AQE shuffle-merge
  *   order cannot change the result (determinism under Spark's
  *   nondeterministic merge order, unlike double-accumulating UDAFs);
  * - the shuffle carries 32 bytes per group, never the member strings.
  *
  * Lane construction (CLAUDE.md hash rules): ONE md5 per value, sliced
  * into four 8-hex-char (32-bit) lanes — reproducible in any engine with
  * md5 (DuckDB oracle: `min(CAST('0x' || substring(md5(v), 1+8*i, 8) AS
  * BIGINT))`). Empty groups and null inputs leave a lane at
  * Long.MaxValue, mirroring `min`'s null-skipping.
  *
  * The signature estimates set resemblance: P[lane_i equal] = Jaccard
  * (Broder 1997); 4 lanes is a demonstration width — widen by hashing
  * `concat(lane_salt, v)` per extra md5 if a use case needs tighter
  * bounds.
  */
case class MinHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash4 requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash4"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(MinHashAgg.Lanes)(Long.MaxValue)

  // one digest instance per thread: MessageDigest is stateful and the same
  // expression object can serve several local-mode tasks concurrently
  @transient private lazy val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val digest = md.get().digest(v.asInstanceOf[UTF8String].getBytes)
      var i = 0
      while (i < MinHashAgg.Lanes) {
        // lane i = hex chars [8i, 8i+8) of the digest = bytes [4i, 4i+4),
        // read big-endian as an unsigned 32-bit value (always >= 0)
        val lane = ((digest(4 * i) & 0xffL) << 24) |
          ((digest(4 * i + 1) & 0xffL) << 16) |
          ((digest(4 * i + 2) & 0xffL) << 8) |
          (digest(4 * i + 3) & 0xffL)
        if (lane < buf(i)) buf(i) = lane
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < MinHashAgg.Lanes) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(MinHashAgg.Lanes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(MinHashAgg.Lanes)(bb.getLong)
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
