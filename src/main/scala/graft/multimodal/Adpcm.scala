package graft.multimodal

import org.apache.spark.sql.Dataset

/** Per-asset features of an IMA ADPCM decode: exact integers the DuckDB
  * oracle re-derives by replaying the codec's state recurrence as a
  * recursive CTE. `quantErr` is the summed |reconstruction − original|
  * — the honest measure of what this LOSSY codec threw away.
  */
final case class AdpcmFeatures(
    docId: Long,
    nSamples: Int,
    reconSum: Long,
    finalPred: Long,
    quantErr: Long,
    peak: Long)

/** REAL IMA/DVI ADPCM (WAVE format tag 0x11) — 4-bit ADAPTIVE
  * DIFFERENTIAL coding, the fourth audio/image compression family in the
  * engine after LZ77 (PNG), LZW (GIF) and entropy-coded transform (JPEG):
  * a sequential predictive state machine. Each mono block stores one
  * verbatim int16 seed sample + a step-table index, then one 4-bit code
  * per sample; the decoder reconstructs `pred += ±(step/8 + b2·step +
  * b1·step/2 + b0·step/4)` and adapts `step` through the standard
  * 89-entry table. The encoder updates its predictor with the DECODER's
  * reconstruction, so both walk identical state — which is what makes
  * the whole recurrence expressible as a recursive CTE in the oracle
  * (`llm_audio_adpcm`): every quantity is pure integer arithmetic.
  *
  * Container: byte-valid format-0x11 WAV (20-byte fmt body with
  * cbSize=2 + samplesPerBlock, the canonical IMA layout), parsed by the
  * same strict RIFF walk as the PCM and mu-law paths. Decode totality
  * (succeed or IllegalArgumentException) is fuzz-proven in
  * CodecFuzzLaws.
  */
object Adpcm {

  /** Samples per block (one seed + 63 coded nibbles → 36-byte blocks). */
  val Block = 64
  val BlockBytes: Int = 4 + (Block - 1 + 1) / 2 // header + packed nibbles

  /** The standard IMA step-size table (88 = max index). */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adaptation per code magnitude (sign bit ignored). */
  val IndexDelta: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clamp(v: Int, lo: Int, hi: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** One codec step shared by encoder and decoder: apply 4-bit `code`
    * to state (pred, idx) → (newPred, newIdx).
    */
  private def applyCode(pred: Int, idx: Int, code: Int): (Int, Int) = {
    val step = StepTable(idx)
    val diff = (step >> 3) +
      (if ((code & 4) != 0) step else 0) +
      (if ((code & 2) != 0) step >> 1 else 0) +
      (if ((code & 1) != 0) step >> 2 else 0)
    val p = clamp(if ((code & 8) != 0) pred - diff else pred + diff,
      -32768, 32767)
    (p, clamp(idx + IndexDelta(code & 7), 0, 88))
  }

  /** Quantize delta against the current step → 4-bit code (canonical
    * bit-test loop: b2 = |d| ≥ step, b1 = rem ≥ step/2, b0 = rem ≥
    * step/4, sign in bit 3).
    */
  private def quantize(delta: Int, step: Int): Int = {
    val sign = if (delta < 0) 8 else 0
    var mag = if (delta < 0) -delta else delta
    var code = 0
    if (mag >= step) { code |= 4; mag -= step }
    if (mag >= (step >> 1)) { code |= 2; mag -= step >> 1 }
    if (mag >= (step >> 2)) code |= 1
    sign | code
  }

  /** Encode mono PCM16 (length a multiple of [[Block]]) as a byte-valid
    * IMA ADPCM WAV. Block seeds store the raw sample; the step index
    * carries ACROSS blocks (the canonical streaming encoder).
    */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(samples.nonEmpty && samples.length % Block == 0,
      s"sample count ${samples.length} not a positive multiple of $Block")
    val nBlocks = samples.length / Block
    val dataSize = nBlocks * BlockBytes
    val fmtBody = 20 // 16 base + cbSize(2) + samplesPerBlock(2)
    val out = new Array[Byte](12 + 8 + fmtBody + 8 + dataSize)
    def le16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    def le32(off: Int, v: Int): Unit = {
      le16(off, v & 0xffff); le16(off + 2, v >>> 16)
    }
    def tag(off: Int, t: String): Unit = {
      var i = 0
      while (i < 4) { out(off + i) = t.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); le32(4, out.length - 8); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, fmtBody)
    le16(20, 0x11) // IMA ADPCM
    le16(22, 1) // mono
    le32(24, sampleRate)
    le32(28, sampleRate * BlockBytes / Block) // avg byte rate
    le16(32, BlockBytes) // block align
    le16(34, 4) // bits per sample
    le16(36, 2) // cbSize
    le16(38, Block) // samples per block
    tag(40, "data"); le32(44, dataSize)
    val base = 48
    var idx = 0
    var b = 0
    while (b < nBlocks) {
      val off = base + b * BlockBytes
      var pred: Int = samples(b * Block)
      le16(off, pred & 0xffff)
      out(off + 2) = idx.toByte
      out(off + 3) = 0
      var k = 1
      while (k < Block) {
        val code = quantize(samples(b * Block + k) - pred, StepTable(idx))
        val st = applyCode(pred, idx, code)
        pred = st._1; idx = st._2
        val pos = off + 4 + (k - 1) / 2
        if (((k - 1) & 1) == 0) out(pos) = (code & 0x0f).toByte
        else out(pos) = (out(pos) | (code << 4)).toByte
        k += 1
      }
      b += 1
    }
    out
  }

  /** Parse + decompress a format-0x11 WAV → (sampleRate, reconstructed
    * PCM16). Strict: block-aligned data, step indices ≤ 88.
    */
  def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
    val (rate, dataOff, dataSize) = Wav.walk(bytes, wantFormat = 0x11,
      wantBits = 4)
    require(dataSize > 0 && dataSize % BlockBytes == 0,
      s"ADPCM data size $dataSize not block-aligned")
    val nBlocks = dataSize / BlockBytes
    val out = new Array[Short](nBlocks * Block)
    var b = 0
    while (b < nBlocks) {
      val off = dataOff + b * BlockBytes
      var pred = ((bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)).toShort.toInt
      var idx = bytes(off + 2) & 0xff
      require(idx <= 88, s"ADPCM step index $idx out of range")
      out(b * Block) = pred.toShort
      var k = 1
      while (k < Block) {
        val byte = bytes(off + 4 + (k - 1) / 2) & 0xff
        val code = if (((k - 1) & 1) == 0) byte & 0x0f else byte >> 4
        val st = applyCode(pred, idx, code)
        pred = st._1; idx = st._2
        out(b * Block + k) = pred.toShort
        k += 1
      }
      b += 1
    }
    (rate, out)
  }

  /** Reconstruction-only features for the media-pipeline branch (no
    * original samples available there): position-weighted recon sum +
    * peak amplitude. Same batched mapPartitions shape as every codec.
    */
  def decodeFeatures(assets: Dataset[RawAsset]): Dataset[(Long, Long, Long)] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(StubDecoder.BatchSize).flatMap(_.iterator.map { a =>
        val (_, recon) = decode(a.payload)
        var reconSum = 0L; var peak = 0L
        var i = 0
        while (i < recon.length) {
          val r = recon(i).toLong
          reconSum += r * (i + 1)
          val m = math.abs(r)
          if (m > peak) peak = m
          i += 1
        }
        (a.docId, reconSum, peak)
      })
    }
  }

  /** Distributed decode + feature pass: re-synthesizes each doc's
    * original samples from `text` (the same deterministic function the
    * asset builder used) purely to measure the codec's quantization
    * error against the RECONSTRUCTION decoded from bytes. Same
    * mapPartitions/batch shape as every multimodal kernel.
    */
  def analyzeAssets(assets: Dataset[(Long, Array[Byte], String)],
      synth: (String, Int) => Array[Short]): Dataset[AdpcmFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(StubDecoder.BatchSize).flatMap(_.iterator.map {
        case (docId, payload, text) =>
          val (_, recon) = decode(payload)
          val orig = synth(text, recon.length)
          var reconSum = 0L; var quantErr = 0L; var peak = 0L
          var i = 0
          while (i < recon.length) {
            val r = recon(i).toLong
            reconSum += r * (i + 1)
            quantErr += math.abs(r - orig(i))
            val a = math.abs(r)
            if (a > peak) peak = a
            i += 1
          }
          AdpcmFeatures(docId, recon.length, reconSum,
            recon(recon.length - 1).toLong, quantErr, peak)
      })
    }
  }
}
