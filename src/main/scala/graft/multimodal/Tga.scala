package graft.multimodal

import org.apache.spark.sql.Dataset

/** Decoded TGA asset: dims, exact-integer pixel features, the encoded
  * byte size (the oracle REPLAYS the RLE cost model in SQL and pins
  * it), and the decoded grayscale bytes.
  */
final case class TgaDecoded(
    docId: Long,
    w: Int,
    h: Int,
    sumPix: Long,
    nBytes: Long,
    pix: Array[Byte])

/** REAL compressed-image codec #4, zero external dependencies: Truevision
  * TGA (TARGA) type-11 — RLE-compressed 8-bit grayscale — from the
  * published spec. A genuinely different compression family from PNG's
  * LZ77+Huffman, GIF's LZW dictionary and JPEG's transform coding:
  * pure RUN-LENGTH packets, which makes the ENCODER itself
  * SQL-replayable — the oracle recomputes the encoded byte count from
  * the pixel stream with two gaps-and-islands window passes (runs of
  * length ≥ 2 become 2-byte packets per 128-chunk; maximal stretches of
  * singleton islands become raw packets of ≤ 128 literals), so the gate
  * hash pins every packet-boundary decision, not just losslessness.
  *
  * [[encode]] emits a byte-valid .tga any viewer opens: the 18-byte
  * header (image type 11, 8-bit depth, top-to-bottom origin bit) and
  * per-SCANLINE greedy RLE packets — packets never cross rows, per the
  * spec's interoperability note. The greedy rule, mirrored exactly by
  * the oracle: at each position, a maximal run of ≥ 2 equal bytes
  * becomes run packets (chunked at 128); otherwise literals accumulate
  * until the next ≥ 2 run starts, emitted as raw packets (chunked at
  * 128). [[decode]] is the matching general decoder (it tolerates
  * row-crossing packets from foreign encoders; every read and write is
  * range-checked).
  *
  * Totality contract (CodecFuzzLaws): decode on arbitrary bytes either
  * succeeds or throws IllegalArgumentException.
  *
  * Scale notes: narrow per-row kernels, linear in payload bytes, no
  * shuffle; the batched Dataset operator keeps the family's
  * mapPartitions shape.
  */
object Tga {

  /** Encode a top-down row-major grayscale buffer (one byte per pixel). */
  def encode(w: Int, h: Int, pix: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff,
      s"unsupported TGA dims ${w}x$h")
    require(pix.length == w * h,
      s"pixel buffer ${pix.length} != ${w * h}")
    val out = new java.io.ByteArrayOutputStream(18 + pix.length / 2)
    out.write(0)  // id length
    out.write(0)  // no color map
    out.write(11) // RLE grayscale
    var i = 0
    while (i < 9) { out.write(0); i += 1 } // colormap spec + origin
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    out.write(8)    // bits per pixel
    out.write(0x20) // top-to-bottom
    var y = 0
    while (y < h) {
      val row = y * w
      var x = 0
      while (x < w) {
        val v = pix(row + x)
        var run = 1
        while (x + run < w && pix(row + x + run) == v) run += 1
        if (run >= 2) {
          var left = run
          while (left > 0) {
            val c = math.min(left, 128)
            out.write(0x80 | (c - 1)); out.write(v & 0xff)
            left -= c
          }
          x += run
        } else {
          // raw stretch: up to (but not including) the next >=2 run
          var j = x
          while (j < w &&
              (j + 1 >= w || pix(row + j) != pix(row + j + 1))) j += 1
          var s = x
          while (s < j) {
            val c = math.min(j - s, 128)
            out.write(c - 1)
            var t = 0
            while (t < c) { out.write(pix(row + s + t) & 0xff); t += 1 }
            s += c
          }
          x = j
        }
      }
      y += 1
    }
    out.toByteArray
  }

  /** Decode a type-11 (RLE grayscale) TGA → (w, h, top-down pixels). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 18, s"TGA too short: ${bytes.length}")
    val idLen = bytes(0) & 0xff
    require((bytes(1) & 0xff) == 0, "color-mapped TGA not supported")
    require((bytes(2) & 0xff) == 11,
      s"not an RLE-grayscale TGA (type ${bytes(2) & 0xff})")
    val w = (bytes(12) & 0xff) | ((bytes(13) & 0xff) << 8)
    val h = (bytes(14) & 0xff) | ((bytes(15) & 0xff) << 8)
    // product cap IN LONG: two 16-bit dims multiply past Int.MaxValue
    // (0xffff² ≈ 4.3e9), so an unchecked w*h from a forged header
    // wraps NEGATIVE and escapes as NegativeArraySizeException — the
    // fuzz suite's catch. 2^26 pixels bounds the allocation at 64 MB
    // while keeping every dim encode can emit decodable.
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
      s"bad TGA dims ${w}x$h")
    require((bytes(16) & 0xff) == 8, "only 8-bit grayscale supported")
    val desc = bytes(17) & 0xff
    require((desc & 0x10) == 0, "right-to-left TGA not supported")
    val topDown = (desc & 0x20) != 0
    val n = w * h
    val pix = new Array[Byte](n)
    var p = 18 + idLen
    var o = 0
    while (o < n) {
      require(p < bytes.length, "truncated TGA packet stream")
      val hd = bytes(p) & 0xff; p += 1
      val cnt = (hd & 0x7f) + 1
      require(o + cnt <= n, s"TGA packet overruns image ($o + $cnt > $n)")
      if ((hd & 0x80) != 0) {
        require(p < bytes.length, "truncated TGA run packet")
        val v = bytes(p); p += 1
        var t = 0
        while (t < cnt) { pix(o + t) = v; t += 1 }
      } else {
        require(p + cnt <= bytes.length, "truncated TGA raw packet")
        var t = 0
        while (t < cnt) { pix(o + t) = bytes(p + t); t += 1 }
        p += cnt
      }
      o += cnt
    }
    if (topDown) (w, h, pix)
    else {
      // bottom-up storage: flip rows into top-down order
      val out = new Array[Byte](n)
      var y = 0
      while (y < h) {
        System.arraycopy(pix, (h - 1 - y) * w, out, y * w, w)
        y += 1
      }
      (w, h, out)
    }
  }

  /** Batched decode → feature-extract with the family's double
    * round-trip: decoded pixels re-encode and decode again and must
    * agree, so an RLE boundary asymmetry breaks the gate hash instead
    * of hiding. `nBytes` is the ENCODED size — the quantity the oracle
    * recomputes from the pixel stream alone.
    */
  def decodeAssets(assets: Dataset[RawAsset]): Dataset[TgaDecoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(StubDecoder.BatchSize).flatMap(_.iterator.map { a =>
        val (w, h, pix) = decode(a.payload)
        val re = encode(w, h, pix)
        require(java.util.Arrays.equals(re, a.payload),
          "TGA re-encode mismatch")
        val (w2, h2, pix2) = decode(re)
        require(w2 == w && h2 == h && java.util.Arrays.equals(pix, pix2),
          "TGA round-trip mismatch")
        var sum = 0L
        var j = 0
        while (j < pix2.length) { sum += pix2(j) & 0xff; j += 1 }
        TgaDecoded(a.docId, w, h, sum, a.payload.length.toLong, pix2)
      })
    }
  }
}
