package graft.multimodal

import org.apache.spark.sql.Dataset

/** Raw multimodal asset row: opaque payload + typed metadata.
  * Mirrors the `llm_multimodal` column convention (binary + struct).
  */
final case class RawAsset(
    docId: Long,
    payload: Array[Byte],
    fmt: String,
    width: Int,
    height: Int,
    channels: Int)

/** Decoded asset: payload replaced by extracted features. */
final case class DecodedAsset(
    docId: Long,
    fmt: String,
    width: Int,
    height: Int,
    nBytes: Int,
    features: Array[Float])

/** One sampled frame of a (fake) video payload. */
final case class Frame(
    docId: Long,
    frameIdx: Int,
    nBytes: Int,
    frameHash: String)

/** Batched decode plumbing for multimodal columns.
  *
  * The Spark-side shape is real: a `mapPartitions` that groups rows into
  * fixed-size batches (the JVM analogue of `mapInPandas` batch semantics —
  * a native decoder amortizes per-call overhead across a batch), with
  * case-class Encoders carrying the schema. The decode itself is a STUB:
  * this environment has no image/audio codecs, so `decodeOne` derives
  * deterministic fake features from the payload bytes. Swapping in a real
  * decoder changes only the body of `decodeOne` / the batch hand-off —
  * none of the distributed plumbing. The stub now covers only feature
  * extraction and video frames: header decode is real
  * ([[graft.functions.ImageHeader]]) and pixel resize is real on BMP
  * ([[Bmp.resizeAssets]]).
  *
  * Scale notes: decode is narrow per-partition work — no shuffle, linear
  * scaling; batch size bounds peak native memory per task.
  */
object StubDecoder {

  val BatchSize = 64

  /** STUB decode — deterministic fake features standing in for a real
    * image decode (mean "pixel" from payload bytes; aspect ratio).
    */
  def decodeOne(a: RawAsset): DecodedAsset = {
    val meanByte =
      if (a.payload.isEmpty) 0f
      else a.payload.foldLeft(0L)((s, b) => s + (b & 0xff)).toFloat / a.payload.length
    DecodedAsset(a.docId, a.fmt, a.width, a.height, a.payload.length,
      Array(a.width.toFloat, a.height.toFloat,
        a.width.toFloat / a.height.toFloat, meanByte))
  }

  /** Batched decode over a distributed asset Dataset. */
  def decodeAssets(assets: Dataset[RawAsset]): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // A real implementation hands `batch` to the native decoder in one
        // call; the stub decodes element-wise.
        batch.iterator.map(decodeOne)
      }
    }
  }

  /** Frame sampling: treat the payload as a sequence of fixed-size frames
    * and keep every `everyN`-th one — a 1-to-N row expansion (flatMap),
    * the video analogue of llm_chunks. Narrow per-row work: frame count
    * scales with payload size, never with the corpus; no shuffle.
    */
  def sampleFrames(assets: Dataset[RawAsset], frameBytes: Int,
      everyN: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      a.payload.grouped(frameBytes).zipWithIndex.collect {
        case (frame, idx) if idx % everyN == 0 =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(frame).map(b => f"$b%02x").mkString
          Frame(a.docId, idx, frame.length, hex)
      }
    }
  }
}
