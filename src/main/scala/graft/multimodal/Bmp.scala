package graft.multimodal

import org.apache.spark.sql.Dataset

/** Resized BMP asset: original dims + the re-encoded file size + the
  * decoded top-down, unpadded pixel bytes of the resized image (what a
  * downstream feature extractor consumes, and what the oracle re-derives).
  */
final case class BmpResized(
    docId: Long,
    srcW: Int,
    srcH: Int,
    srcBytes: Int,
    nBytes: Int,
    pix: Array[Byte])

/** Exact-integer per-channel pixel statistics of a decoded BMP: channel
  * sums over the BGR triples plus the peak byte value — the real
  * feature-extract stage of the multimodal pipeline.
  */
final case class BmpFeatures(
    docId: Long,
    w: Int,
    h: Int,
    sumB: Long,
    sumG: Long,
    sumR: Long,
    peak: Long)

/** REAL pixel-level codec for the one image container that needs no
  * compression library: Windows BMP, 24-bpp uncompressed (BITMAPFILEHEADER
  * + BITMAPINFOHEADER, bottom-up rows, 4-byte row stride padding). This
  * retires the stub from the resize path: bytes written by [[encode]] are
  * a byte-valid .bmp any viewer opens, [[decode]] is a real header parse
  * (magic, pixel-array offset, dims, bpp, compression) plus the
  * bottom-up/padded → top-down/packed pixel copy, and [[resizeNearest]]
  * is real nearest-neighbor resampling over the decoded pixel grid.
  *
  * Scale notes: all three are narrow per-row kernels (no shuffle, linear
  * scaling); the batched Dataset operator below keeps the same
  * mapPartitions shape as the rest of the multimodal family so a native
  * SIMD resampler could replace the Scala loop without touching the plan.
  */
object Bmp {

  val HeaderBytes = 54 // 14 (file header) + 40 (BITMAPINFOHEADER)

  /** 24-bpp DIB rows pad to 4-byte boundaries — shared with the AVI
    * frame codec, whose '00db' frames are this exact pixel layout.
    */
  private[multimodal] def stride(w: Int): Int = (w * 3 + 3) / 4 * 4

  /** Encode top-down row-major packed BGR triples as a 24-bpp BMP. */
  def encode(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * h * 3,
      s"expected ${w * h * 3} pixel bytes, got ${pixels.length}")
    val rowBytes = stride(w)
    val out = new Array[Byte](HeaderBytes + rowBytes * h)
    def le16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    def le32(off: Int, v: Int): Unit = {
      le16(off, v & 0xffff); le16(off + 2, v >>> 16)
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, out.length) // file size
    le32(10, HeaderBytes) // pixel-array offset
    le32(14, 40) // BITMAPINFOHEADER size
    le32(18, w); le32(22, h) // positive height = bottom-up
    le16(26, 1) // planes
    le16(28, 24) // bits per pixel
    le32(30, 0) // BI_RGB, uncompressed
    le32(34, rowBytes * h) // image size
    le32(38, 2835); le32(42, 2835) // 72 DPI in px/metre
    var y = 0
    while (y < h) {
      // image row y lands at file row (h-1-y): bottom-up storage
      System.arraycopy(pixels, y * w * 3, out,
        HeaderBytes + (h - 1 - y) * rowBytes, w * 3)
      y += 1
    }
    out
  }

  /** Parse a 24-bpp uncompressed BMP → (w, h, top-down packed pixels).
    * Validates magic, bpp and compression; honors the header's own
    * pixel-array offset (extra header blocks legal in the wild).
    */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def i32(off: Int): Int = u16(off) | (u16(off + 2) << 16)
    require(bytes.length >= HeaderBytes && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val dataOff = i32(10)
    val w = i32(18)
    val h = i32(22) // positive = bottom-up (the only form encode emits)
    // dim cap keeps w*h*3 inside Int and bounds the allocation a hostile
    // header can demand; all byte-bound checks run in Long so forged
    // sizes cannot overflow their way past a require
    require(w > 0 && h > 0 && w <= (1 << 14) && h <= (1 << 14),
      s"unsupported BMP dims ${w}x$h")
    require(u16(28) == 24, s"unsupported bpp ${u16(28)}")
    require(i32(30) == 0, s"unsupported compression ${i32(30)}")
    val rowBytes = stride(w)
    require(dataOff >= HeaderBytes &&
      bytes.length.toLong >= dataOff.toLong + rowBytes.toLong * h,
      "truncated pixel array")
    val pixels = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      System.arraycopy(bytes, dataOff + (h - 1 - y) * rowBytes,
        pixels, y * w * 3, w * 3)
      y += 1
    }
    (w, h, pixels)
  }

  /** Nearest-neighbor resample of a top-down packed pixel buffer: output
    * (x, y) reads source (x·w/tw, y·h/th) — floor index mapping, exact
    * integer math (mirrored by the oracle's `//`; all operands
    * non-negative so floor == truncate in both engines).
    */
  def resizeNearest(w: Int, h: Int, pixels: Array[Byte],
      tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = y * h / th
      var x = 0
      while (x < tw) {
        val sx = x * w / tw
        val src = (sy * w + sx) * 3
        val dst = (y * tw + x) * 3
        out(dst) = pixels(src)
        out(dst + 1) = pixels(src + 1)
        out(dst + 2) = pixels(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Batched decode → per-channel exact-integer stats over a distributed
    * asset Dataset — real pixel feature extraction (sums per BGR channel,
    * peak byte), same mapPartitions/batch shape as the other multimodal
    * operators.
    */
  def decodeFeatures(assets: Dataset[RawAsset]): Dataset[BmpFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(StubDecoder.BatchSize).flatMap(_.iterator.map { a =>
        val (w, h, pixels) = decode(a.payload)
        var sb = 0L; var sg = 0L; var sr = 0L; var peak = 0L
        var j = 0
        while (j < pixels.length) {
          val v = pixels(j) & 0xff
          (j % 3: @annotation.switch) match {
            case 0 => sb += v
            case 1 => sg += v
            case _ => sr += v
          }
          if (v > peak) peak = v
          j += 1
        }
        BmpFeatures(a.docId, w, h, sb, sg, sr, peak)
      })
    }
  }

  /** Batched decode → resize → re-encode → decode-back over a distributed
    * asset Dataset (same mapPartitions/batch shape as the frame sampler).
    * The final decode of the freshly ENCODED output is deliberate: the
    * reported pixel bytes have round-tripped the container twice, so an
    * encoder/decoder asymmetry (stride padding, bottom-up copy, offset)
    * breaks the gate hash instead of hiding.
    */
  def resizeAssets(assets: Dataset[RawAsset], tw: Int,
      th: Int): Dataset[BmpResized] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(StubDecoder.BatchSize).flatMap(_.iterator.map { a =>
        val (w, h, pixels) = decode(a.payload)
        val outBmp = encode(tw, th, resizeNearest(w, h, pixels, tw, th))
        val (w2, h2, pix2) = decode(outBmp)
        require(w2 == tw && h2 == th, "resize round-trip dims mismatch")
        BmpResized(a.docId, w, h, a.payload.length, outBmp.length, pix2)
      })
    }
  }
}
