package graft.multimodal

import org.apache.spark.sql.Dataset

/** One decoded video frame: top-down packed BGR pixel bytes (the same
  * layout [[Bmp.decode]] returns), ready for hashing / feature kernels.
  */
final case class VideoFrame(
    docId: Long,
    frameIdx: Int,
    w: Int,
    h: Int,
    pix: Array[Byte])

/** Motion between consecutive frames: exact-integer sum of absolute
  * per-byte differences plus the peak single-byte difference, indexed by
  * the later frame.
  */
final case class FrameMotion(
    docId: Long,
    frameIdx: Int,
    motion: Long,
    peakDiff: Long)

/** REAL video container codec for the one format that needs no
  * compression library: RIFF AVI with uncompressed 24-bpp DIB frames
  * ('00db' chunks — the layout Video-for-Windows wrote before codecs).
  * [[encode]] emits a byte-valid .avi (RIFF/'AVI ', LIST hdrl with avih +
  * strl{strh 'vids'/'DIB ', strf BITMAPINFOHEADER}, LIST movi of '00db'
  * DIB frames — bottom-up rows, 4-byte stride padding, shared with
  * [[Bmp]]); [[decode]] is a real nested RIFF walk (unknown chunks and
  * lists skipped by declared size with the even-padding rule, frame dims
  * validated against strf, every frame's chunk size checked against the
  * stride math). This retires the stub from the video path: frame
  * sampling now walks an actual container instead of slicing bytes.
  *
  * Scale notes: narrow per-row kernels, linear in payload bytes; the
  * batched Dataset operator keeps the mapPartitions shape of the rest of
  * the multimodal family.
  */
object Avi {

  private val AvihBytes = 56
  private val StrhBytes = 56
  private val StrfBytes = 40

  /** Encode top-down packed BGR frames (each w*h*3 bytes) as an
    * uncompressed-DIB AVI at the given frame rate.
    */
  def encode(w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(fps >= 1, s"fps $fps")
    frames.foreach(f => require(f.length == w * h * 3,
      s"expected ${w * h * 3} pixel bytes, got ${f.length}"))
    val rowBytes = Bmp.stride(w)
    val frameBytes = rowBytes * h
    val hdrlSize = 4 + 8 + AvihBytes + 8 + 4 + 8 + StrhBytes + 8 + StrfBytes
    val moviSize = 4 + frames.length * (8 + frameBytes)
    val out = new Array[Byte](12 + 8 + hdrlSize + 8 + moviSize)
    var p = 0
    def le16(v: Int): Unit = {
      out(p) = v.toByte; out(p + 1) = (v >> 8).toByte; p += 2
    }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16(v >>> 16) }
    def tag(t: String): Unit = {
      var i = 0
      while (i < 4) { out(p) = t.charAt(i).toByte; p += 1; i += 1 }
    }
    tag("RIFF"); le32(out.length - 8); tag("AVI ")
    tag("LIST"); le32(hdrlSize); tag("hdrl")
    tag("avih"); le32(AvihBytes)
    le32(1000000 / fps) // microseconds per frame
    le32(fps * frameBytes) // max bytes per second
    le32(0) // padding granularity
    le32(0) // flags
    le32(frames.length) // total frames
    le32(0) // initial frames
    le32(1) // streams
    le32(frameBytes) // suggested buffer size
    le32(w); le32(h)
    le32(0); le32(0); le32(0); le32(0) // reserved
    tag("LIST"); le32(4 + 8 + StrhBytes + 8 + StrfBytes); tag("strl")
    tag("strh"); le32(StrhBytes)
    tag("vids"); tag("DIB ")
    le32(0) // flags
    le32(0) // priority + language
    le32(0) // initial frames
    le32(1) // scale
    le32(fps) // rate (rate/scale = fps)
    le32(0) // start
    le32(frames.length) // length in frames
    le32(frameBytes) // suggested buffer size
    le32(0xffffffff) // quality: -1 = default
    le32(0) // sample size (0 = one sample per chunk)
    le16(0); le16(0); le16(w); le16(h) // rcFrame
    tag("strf"); le32(StrfBytes)
    le32(StrfBytes) // BITMAPINFOHEADER size
    le32(w); le32(h) // positive height = bottom-up rows
    le16(1); le16(24) // planes, bits per pixel
    le32(0) // BI_RGB
    le32(frameBytes)
    le32(2835); le32(2835); le32(0); le32(0) // dpi, palette
    tag("LIST"); le32(moviSize); tag("movi")
    frames.foreach { f =>
      tag("00db"); le32(frameBytes)
      var y = 0
      while (y < h) {
        // image row y lands at chunk row (h-1-y): bottom-up DIB storage
        System.arraycopy(f, y * w * 3, out, p + (h - 1 - y) * rowBytes, w * 3)
        y += 1
      }
      p += frameBytes
    }
    out
  }

  // ---- Motion JPEG ('MJPG') ----------------------------------------------

  /** The 'MJPG' fourcc as the little-endian BITMAPINFOHEADER
    * biCompression value.
    */
  private val MjpgFourcc =
    'M'.toInt | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)

  /** Encode pre-compressed baseline JPEG frames as a Motion-JPEG AVI —
    * the first COMPRESSED video container: strh 'vids'/'MJPG', strf
    * biCompression 'MJPG', frames as '00dc' (compressed) chunks holding
    * the raw JPEG bytes, odd sizes padded per the RIFF rule. The
    * container is transparent: decode returns exactly what
    * [[Jpeg.decode]] yields per frame (law-pinned in AviLaws).
    */
  def encodeMjpeg(w: Int, h: Int, fps: Int,
      jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(fps >= 1, s"fps $fps")
    require(jpegFrames.nonEmpty, "no frames")
    val maxFrame = jpegFrames.map(_.length).max
    val hdrlSize = 4 + 8 + AvihBytes + 8 + 4 + 8 + StrhBytes + 8 + StrfBytes
    val moviSize = 4 + jpegFrames.map(f => 8 + f.length + (f.length & 1)).sum
    val out = new Array[Byte](12 + 8 + hdrlSize + 8 + moviSize)
    var p = 0
    def le16(v: Int): Unit = {
      out(p) = v.toByte; out(p + 1) = (v >> 8).toByte; p += 2
    }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16(v >>> 16) }
    def tag(t: String): Unit = {
      var i = 0
      while (i < 4) { out(p) = t.charAt(i).toByte; p += 1; i += 1 }
    }
    tag("RIFF"); le32(out.length - 8); tag("AVI ")
    tag("LIST"); le32(hdrlSize); tag("hdrl")
    tag("avih"); le32(AvihBytes)
    le32(1000000 / fps)
    le32(fps * maxFrame)
    le32(0); le32(0)
    le32(jpegFrames.length)
    le32(0); le32(1)
    le32(maxFrame)
    le32(w); le32(h)
    le32(0); le32(0); le32(0); le32(0)
    tag("LIST"); le32(4 + 8 + StrhBytes + 8 + StrfBytes); tag("strl")
    tag("strh"); le32(StrhBytes)
    tag("vids"); tag("MJPG")
    le32(0); le32(0); le32(0)
    le32(1); le32(fps); le32(0)
    le32(jpegFrames.length)
    le32(maxFrame)
    le32(0xffffffff)
    le32(0)
    le16(0); le16(0); le16(w); le16(h)
    tag("strf"); le32(StrfBytes)
    le32(StrfBytes)
    le32(w); le32(h)
    le16(1); le16(24)
    le32(MjpgFourcc) // biCompression: 'MJPG'
    le32(maxFrame)
    le32(2835); le32(2835); le32(0); le32(0)
    tag("LIST"); le32(moviSize); tag("movi")
    jpegFrames.foreach { f =>
      tag("00dc"); le32(f.length)
      System.arraycopy(f, 0, out, p, f.length)
      p += f.length + (f.length & 1) // RIFF even padding
    }
    out
  }

  /** Parse a Motion-JPEG AVI and DECOMPRESS every frame through the real
    * baseline-JPEG codec → (w, h, top-down grayscale planes). The same
    * nested RIFF walk as [[decode]], routed by biCompression: '00dc'
    * chunks carry entropy-coded JPEG streams, each Huffman-decoded,
    * dequantized and IDCT'd by [[Jpeg.decode]], with frame dims
    * validated against the stream header.
    */
  def decodeMjpeg(bytes: Array[Byte]): (Int, Int, Vector[Array[Byte]]) = {
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def i32(off: Int): Int = u16(off) | (u16(off + 2) << 16)
    def tag(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI ",
      "not an AVI payload")
    var w = -1; var h = -1
    var streamType = ""
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = tag(off)
        val size = i32(off + 4)
        require(size >= 0 && off.toLong + 8 + size <= to, s"truncated chunk $id")
        if (id == "LIST") {
          require(size >= 4, s"short LIST chunk $size")
          val listType = tag(off + 8)
          if (listType == "hdrl" || listType == "strl" ||
              listType == "movi" || (inMovi && listType == "rec "))
            walk(off + 12, off + 8 + size, inMovi || listType == "movi")
        } else if (id == "strh") {
          require(size >= 4, s"short strh chunk $size")
          streamType = tag(off + 8)
        } else if (id == "strf" && streamType == "vids") {
          require(w < 0, "multiple video streams")
          require(size >= StrfBytes, s"short strf chunk $size")
          require(i32(off + 8 + 16) == MjpgFourcc,
            s"not an MJPG stream (compression ${i32(off + 8 + 16)})")
          w = i32(off + 8 + 4)
          h = i32(off + 8 + 8)
          require(w > 0 && h > 0 && w <= (1 << 14) && h <= (1 << 14),
            s"unsupported frame dims ${w}x$h")
        } else if (inMovi && id == "00dc") {
          require(w > 0, "frame chunk before strf header")
          val jpeg = java.util.Arrays.copyOfRange(bytes, off + 8,
            off + 8 + size)
          val (fw, fh, pix) = Jpeg.decode(jpeg)
          require(fw == w && fh == h,
            s"frame dims ${fw}x$fh != stream dims ${w}x$h")
          frames += pix
        }
        off += 8 + size + (size & 1)
      }
    }
    walk(12, bytes.length, inMovi = false)
    require(w > 0, "missing strf header")
    (w, h, frames.result())
  }

  /** Batched MJPEG decode over a distributed asset Dataset: one row per
    * (doc, frame) with the decompressed grayscale plane — the same
    * mapPartitions/batch shape as every multimodal kernel.
    */
  def decodeMjpegAssets(assets: Dataset[RawAsset]): Dataset[VideoFrame] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(StubDecoder.BatchSize).flatMap(_.iterator.flatMap { a =>
        val (w, h, frames) = decodeMjpeg(a.payload)
        frames.iterator.zipWithIndex.map { case (pix, i) =>
          VideoFrame(a.docId, i, w, h, pix)
        }
      })
    }
  }

  /** Parse an uncompressed-DIB AVI → (w, h, top-down packed frames).
    * Real nested RIFF walk: hdrl is located by list type; each strl's
    * strh is read for its stream fourCC and strf is parsed as a
    * BITMAPINFOHEADER only for the 'vids' stream (an audio strl's
    * WAVEFORMATEX strf is skipped by TYPE, not by size, and a second
    * video stream is rejected rather than silently overwriting dims);
    * movi's '00db' chunks are collected in order — including inside
    * interleaved 'rec ' grouping lists — each size-checked against the
    * stride math; unknown chunks/lists (JUNK, idx1) skip by size.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Vector[Array[Byte]]) = {
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def i32(off: Int): Int = u16(off) | (u16(off + 2) << 16)
    def tag(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI ",
      "not an AVI payload")
    var w = -1; var h = -1
    // fccType of the most recent strh: RIFF puts strh before strf inside
    // each strl, so this routes the following strf by stream type
    var streamType = ""
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = tag(off)
        val size = i32(off + 4)
        // Long math: a forged size near Int.MaxValue must fail this
        // require, not wrap negative and walk out of bounds
        require(size >= 0 && off.toLong + 8 + size <= to, s"truncated chunk $id")
        if (id == "LIST") {
          require(size >= 4, s"short LIST chunk $size")
          val listType = tag(off + 8)
          if (listType == "hdrl" || listType == "strl" ||
              listType == "movi" || (inMovi && listType == "rec "))
            walk(off + 12, off + 8 + size, inMovi || listType == "movi")
        } else if (id == "strh") {
          require(size >= 4, s"short strh chunk $size")
          streamType = tag(off + 8)
        } else if (id == "strf" && streamType == "vids") {
          require(w < 0, "multiple video streams")
          require(size >= StrfBytes, s"short strf chunk $size")
          require(u16(off + 8 + 14) == 24,
            s"unsupported bpp ${u16(off + 8 + 14)}")
          require(i32(off + 8 + 16) == 0,
            s"unsupported compression ${i32(off + 8 + 16)}")
          w = i32(off + 8 + 4)
          h = i32(off + 8 + 8)
          // dim cap keeps stride*h and w*h*3 inside Int (see Bmp.decode)
          require(w > 0 && h > 0 && w <= (1 << 14) && h <= (1 << 14),
            s"unsupported frame dims ${w}x$h")
        } else if (inMovi && id == "00db") {
          require(w > 0, "frame chunk before strf header")
          val rowBytes = Bmp.stride(w)
          require(size == rowBytes * h, s"frame chunk size $size != stride")
          val pix = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            System.arraycopy(bytes, off + 8 + (h - 1 - y) * rowBytes,
              pix, y * w * 3, w * 3)
            y += 1
          }
          frames += pix
        }
        off += 8 + size + (size & 1) // RIFF pads odd chunks to even
      }
    }
    walk(12, bytes.length, inMovi = false)
    require(w > 0, "missing strf header")
    (w, h, frames.result())
  }

  /** Batched decode → inter-frame motion over a distributed asset
    * Dataset: for every consecutive frame pair, the exact-integer sum of
    * absolute per-byte differences and the peak single-byte difference —
    * the codec-free motion signal (static slideshows score ~0, cuts and
    * motion score high), the standard curation screen for mislabeled or
    * low-information video. One row per pair, indexed by the later frame.
    */
  def frameMotion(assets: Dataset[RawAsset]): Dataset[FrameMotion] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(StubDecoder.BatchSize).flatMap(_.iterator.flatMap { a =>
        val (_, _, frames) = decode(a.payload)
        frames.iterator.zip(frames.iterator.drop(1)).zipWithIndex.map {
          case ((prev, cur), i) =>
            var sum = 0L; var peak = 0L
            var j = 0
            while (j < cur.length) {
              val d = math.abs((cur(j) & 0xff) - (prev(j) & 0xff)).toLong
              sum += d
              if (d > peak) peak = d
              j += 1
            }
            FrameMotion(a.docId, i + 1, sum, peak)
        }
      })
    }
  }

  /** Batched decode → every-Nth-frame sampling over a distributed asset
    * Dataset: the real-container analogue of the byte-slice sampler, one
    * row per kept frame with its decoded top-down pixels.
    */
  def sampleFrames(assets: Dataset[RawAsset], everyN: Int): Dataset[VideoFrame] = {
    import assets.sparkSession.implicits._
    require(everyN >= 1, s"everyN $everyN")
    assets.mapPartitions { it =>
      it.grouped(StubDecoder.BatchSize).flatMap(_.iterator.flatMap { a =>
        val (w, h, frames) = decode(a.payload)
        frames.iterator.zipWithIndex.collect {
          case (pix, idx) if idx % everyN == 0 =>
            VideoFrame(a.docId, idx, w, h, pix)
        }
      })
    }
  }
}
