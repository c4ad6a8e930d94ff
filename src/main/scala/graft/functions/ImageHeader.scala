package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codec-free image dimension extraction from container HEADERS — the one
  * multimodal decode step that needs no image library, so it is implemented
  * for real (unlike the pixel paths, which stay in the honestly-labelled
  * [[graft.multimodal.StubDecoder]]).
  *
  * Formats (all public container specs):
  *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`; the IHDR chunk is
  *    mandatory-first, so width/height are the big-endian int32s at byte
  *    offsets 16 and 20.
  *  - JPEG: `FF D8` SOI, then a marker walk — each segment is
  *    `FF <marker> <len:uint16-BE>` (len includes its own 2 bytes); FF fill
  *    bytes before a marker are legal padding. Dimensions live in the first
  *    SOFn frame header (C0-CF minus C4/C8/CC): height uint16 at segment
  *    payload offset 1, width at offset 3.
  *  - GIF: `GIF87a`/`GIF89a`, then LITTLE-endian uint16 width, height.
  *
  * Returns null for anything unrecognized, truncated, or malformed —
  * never throws: at corpus scale a crashing row kills a 10-hour job, a
  * null routes the asset to a quarantine bucket.
  */
object ImageHeader {

  val PNG = 1
  val JPEG = 2
  val GIF = 3

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Single implementation shared by the interpreted eval AND the
    * generated code (the codegen emits a static call — same whole-stage
    * pipeline, zero duplicated parsing logic).
    */
  def parse(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 10) return null
    // PNG
    if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G' && (bytes(4) & 0xff) == 0x0d &&
        (bytes(5) & 0xff) == 0x0a && (bytes(6) & 0xff) == 0x1a &&
        (bytes(7) & 0xff) == 0x0a) {
      if (bytes.length < 24) return null
      // IHDR must be the first chunk; reject impostors
      if (!(bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' &&
          bytes(15) == 'R')) return null
      val w = be32(bytes, 16); val h = be32(bytes, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
      return new GenericArrayData(Array(PNG, w.toInt, h.toInt))
    }
    // JPEG
    if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var p = 2
      while (p + 3 < bytes.length) {
        if ((bytes(p) & 0xff) != 0xff) return null // lost marker sync
        var m = bytes(p + 1) & 0xff
        while (m == 0xff && p + 2 < bytes.length) { p += 1; m = bytes(p + 1) & 0xff } // fill bytes
        if (m == 0xd9 || m == 0xda) return null // EOI / scan start: no SOF seen
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { p += 2 } // standalone
        else {
          if (p + 3 >= bytes.length) return null
          val len = be16(bytes, p + 2)
          if (len < 2) return null
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
            m != 0xcc
          if (isSof) {
            if (p + 8 >= bytes.length || len < 7) return null
            val h = be16(bytes, p + 5); val w = be16(bytes, p + 7)
            if (w == 0 || h == 0) return null
            return new GenericArrayData(Array(JPEG, w, h))
          }
          p += 2 + len
        }
      }
      return null
    }
    // GIF
    if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') &&
        bytes(5) == 'a') {
      val w = (bytes(6) & 0xff) | ((bytes(7) & 0xff) << 8)
      val h = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
      if (w == 0 || h == 0) return null
      return new GenericArrayData(Array(GIF, w, h))
    }
    null
  }
}

/** Byte-distribution features of a binary payload — the codec-free
  * feature-extraction step of the multimodal family (file-type screening,
  * corruption detection, compressibility proxy). All quantities are exact
  * integers so a DuckDB oracle reproduces them bit-for-bit:
  * `[n_bytes, distinct_bytes, modal_byte, modal_count, chi2_u]` where
  * `chi2_u = Σ_v (256·c_v − n)²` over all 256 byte values (uniformly
  * distributed bytes — compressed/encrypted payloads — score low; text
  * scores high). Modal tie-break: smallest byte value.
  */
object ByteStats {

  /** Largest payload for which chi2_u provably fits in Int64: the maximum
    * of Σ(256·c−n)² under Σc=n is n²·(255²+255) (all mass on one byte), so
    * n ≤ 2^23 keeps the worst case ≤ 2^16·2^46 < 2^63. Larger payloads
    * return null (byte_stats is exposed as a general SQL function — a
    * silent wrap on a 16 MB low-entropy blob would be a wrong answer, not
    * an error).
    */
  val MaxBytes: Int = 1 << 23

  def compute(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length > MaxBytes) return null
    val counts = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { counts(bytes(i) & 0xff) += 1; i += 1 }
    val n = bytes.length.toLong
    var distinct = 0L; var modal = 0L; var modalCount = 0L; var chi2 = 0L
    var v = 0
    while (v < 256) {
      val c = counts(v)
      if (c > 0) distinct += 1
      if (c > modalCount) { modalCount = c; modal = v }
      val d = 256L * c - n
      chi2 += d * d
      v += 1
    }
    new GenericArrayData(Array(n, distinct, modal, modalCount, chi2))
  }
}

/** `byte_stats(binary)` → `array<bigint>` — see [[ByteStats]]. */
case class ByteStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true // payloads > ByteStats.MaxBytes

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_stats expects binary, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    ByteStats.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = graft.functions.ByteStats.compute($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `image_dims(binary)` → `array<int> [fmt_code, width, height]` (codes:
  * 1=png, 2=jpeg, 3=gif), null when the payload is not a recognized image
  * container. Codegen stays inside whole-stage pipelines via a static call
  * to [[ImageHeader.parse]].
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_dims expects binary, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    ImageHeader.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.ImageHeader.parse($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
