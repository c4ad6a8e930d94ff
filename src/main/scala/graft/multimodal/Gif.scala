package graft.multimodal

import org.apache.spark.sql.Dataset

/** Decoded GIF asset: dims, exact-integer index-stream features, and the
  * decoded palette-index bytes (one byte per pixel — the content a
  * downstream feature extractor consumes, and what the oracle
  * re-derives).
  */
final case class GifDecoded(
    docId: Long,
    w: Int,
    h: Int,
    sumIdx: Long,
    peakIdx: Long,
    idx: Array[Byte])

/** REAL compressed-image codec #2, zero external dependencies: GIF89a
  * with a full variable-width LZW coder — a genuinely different
  * compression family from PNG's zlib (dictionary coding vs LZ77+Huffman),
  * implemented from the published spec.
  *
  * [[encode]] emits a byte-valid .gif any viewer opens: header, logical
  * screen descriptor, 256-entry grayscale global color table, image
  * descriptor, and an LZW-compressed index stream (REAL dictionary
  * compression: (prefix, byte) chaining, code width growth 9→12 bits,
  * Clear on a full table, 255-byte sub-block framing). [[decode]] is the
  * matching general decoder: variable-width code reader, dictionary
  * rebuild, the KwKwK first-occurrence case, Clear/EOI handling — on the
  * tiled corpus payloads the dictionary genuinely compresses, so the
  * growth and width-increment paths are exercised by every gate row.
  *
  * Width-change timing (the classic off-by-one): the encoder grows the
  * code width when its next free code reaches 2^width; the decoder's
  * dictionary adds lag the encoder's by exactly one code (the first code
  * after Clear adds no entry), so the decoder grows at 2^width − 1.
  * GifLaws pins the round trip across both boundaries.
  *
  * Totality contract (CodecFuzzLaws): decode on arbitrary bytes either
  * succeeds or throws IllegalArgumentException — every table reference,
  * chain walk, and output write is range-checked.
  *
  * Scale notes: narrow per-row kernels, linear in payload bytes, no
  * shuffle; the batched Dataset operator keeps the family's
  * mapPartitions shape.
  */
object Gif {

  private val MinCodeSize = 8 // 256 literal roots
  private val ClearCode = 256
  private val EoiCode = 257
  private val MaxCode = 4095 // 12-bit ceiling per the spec

  /** Encode a top-down row-major palette-index buffer (one byte per
    * pixel; the 256-entry grayscale table maps index i → (i,i,i)).
    */
  def encode(w: Int, h: Int, indices: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff,
      s"unsupported GIF dims ${w}x$h")
    require(indices.length == w * h,
      s"expected ${w * h} index bytes, got ${indices.length}")
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 800)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xf7) // global color table present, 256 entries, 8-bit
    out.write(0); out.write(0) // background index, aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(0) // no local table, not interlaced
    out.write(MinCodeSize)

    // ---- real LZW: dictionary of (prefix code, next byte) → code ----
    val dict = new java.util.HashMap[Integer, Integer](8192)
    var nextCode = EoiCode + 1
    var codeWidth = MinCodeSize + 1
    var bitBuf = 0L; var bitCnt = 0
    val blocks = new java.io.ByteArrayOutputStream(indices.length / 2 + 64)
    def putCode(c: Int): Unit = {
      bitBuf |= c.toLong << bitCnt
      bitCnt += codeWidth
      while (bitCnt >= 8) {
        blocks.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    putCode(ClearCode)
    var prefix = -1
    i = 0
    while (i < indices.length) {
      val b = indices(i) & 0xff
      if (prefix < 0) prefix = b
      else {
        val key = (prefix << 8) | b
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          putCode(prefix)
          dict.put(key, nextCode)
          nextCode += 1
          if (nextCode == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
          if (nextCode > MaxCode) { // table full: reset, spec-standard
            putCode(ClearCode)
            dict.clear(); nextCode = EoiCode + 1; codeWidth = MinCodeSize + 1
          }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix >= 0) putCode(prefix)
    // END-OF-STREAM WIDTH EDGE: the decoder defines one more entry on
    // receiving that final data code and grows its width at 2^w − 1 —
    // if the dictionary lands exactly on that boundary, EOI must be
    // emitted at the GROWN width or the decoder starves reading it
    // (GifLaws seed pgTQQnaS… caught the truncated-stream mismatch;
    // mid-stream codes are immune because the encoder's 2^w growth
    // stays exactly one define ahead).
    if (nextCode == (1 << codeWidth) - 1 && codeWidth < 12) codeWidth += 1
    putCode(EoiCode)
    if (bitCnt > 0) blocks.write((bitBuf & 0xff).toInt)
    // 255-byte sub-block framing
    val data = blocks.toByteArray
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n); off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Parse a GIF → (w, h, palette-index bytes). General LZW decoder:
    * handles dictionary growth, width increments, Clear resets, and the
    * KwKwK case; skips extension blocks; validates structure throughout.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    var p = 0
    def u8(): Int = {
      require(p < bytes.length, "truncated GIF"); val v = bytes(p) & 0xff
      p += 1; v
    }
    def u16(): Int = u8() | (u8() << 8)
    require(bytes.length >= 13 &&
      new String(bytes, 0, 6, "US-ASCII").matches("GIF8[79]a"),
      "not a GIF payload")
    p = 6
    val sw = u16(); val sh = u16()
    val flags = u8(); u8(); u8() // bg index, aspect
    if ((flags & 0x80) != 0) p += 3 * (1 << ((flags & 7) + 1)) // global table
    require(p <= bytes.length, "truncated global color table")
    var w = -1; var h = -1; var indices: Array[Byte] = null
    var done = false
    while (!done) {
      u8() match {
        case 0x3b => done = true
        case 0x21 => // extension block: label + sub-blocks, skip by size
          u8()
          var n = u8()
          while (n != 0) {
            p += n; require(p <= bytes.length, "truncated extension"); n = u8()
          }
        case 0x2c =>
          require(indices == null, "multiple image descriptors")
          u16(); u16() // left, top
          w = u16(); h = u16()
          require(w > 0 && h > 0 && w <= (1 << 14) && h <= (1 << 14),
            s"unsupported GIF dims ${w}x$h")
          require(w <= sw && h <= sh, "image exceeds logical screen")
          val iflags = u8()
          require((iflags & 0x40) == 0, "interlaced GIF unsupported")
          if ((iflags & 0x80) != 0) p += 3 * (1 << ((iflags & 7) + 1))
          require(p <= bytes.length, "truncated local color table")
          val minCode = u8()
          require(minCode >= 2 && minCode <= 8, s"bad LZW min code $minCode")
          val data = new java.io.ByteArrayOutputStream(w * h / 2 + 64)
          var n = u8()
          while (n != 0) {
            require(p + n <= bytes.length, "truncated image data")
            data.write(bytes, p, n); p += n; n = u8()
          }
          indices = lzwDecode(data.toByteArray, minCode, w * h)
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block 0x$other%02x")
      }
    }
    require(indices != null, "missing image descriptor")
    (w, h, indices)
  }

  /** General GIF-LZW decode of `data` to exactly `n` index bytes. */
  private def lzwDecode(data: Array[Byte], minCode: Int, n: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    // dictionary as (prefix, last byte) chains — O(1) append; entries
    // materialize by walking the chain backward into the output
    val prefixOf = new Array[Int](MaxCode + 1)
    val byteOf = new Array[Byte](MaxCode + 1)
    var nextCode = eoi + 1
    var codeWidth = minCode + 1
    val out = new Array[Byte](n)
    var outLen = 0
    var bitPos = 0
    def readCode(): Int = {
      var v = 0; var got = 0
      while (got < codeWidth) {
        val byteIdx = bitPos >> 3
        require(byteIdx < data.length, "truncated LZW stream")
        val avail = 8 - (bitPos & 7)
        val take = math.min(avail, codeWidth - got)
        v |= (((data(byteIdx) & 0xff) >> (bitPos & 7)) & ((1 << take) - 1)) << got
        got += take; bitPos += take
      }
      v
    }
    def firstByteOf(code: Int): Int = {
      var c = code; var guard = 0
      while (c >= clear) {
        require(guard <= MaxCode, "cyclic LZW chain"); guard += 1
        c = prefixOf(c)
      }
      c
    }
    def emit(code: Int): Int = { // writes the entry, returns its first byte
      var c = code; var len = 1
      while (c >= clear) {
        require(len <= MaxCode + 1, "cyclic LZW chain"); len += 1
        c = prefixOf(c)
      }
      require(outLen + len <= n, "LZW output exceeds pixel count")
      var wp = outLen + len - 1
      c = code
      while (c >= clear) { out(wp) = byteOf(c); wp -= 1; c = prefixOf(c) }
      out(wp) = c.toByte
      outLen += len
      c
    }
    var prev = -1
    var finished = false
    while (!finished) {
      val code = readCode()
      if (code == clear) {
        nextCode = eoi + 1; codeWidth = minCode + 1; prev = -1
      } else if (code == eoi) {
        finished = true
      } else if (prev < 0) {
        // first code after a Clear adds no entry — the source of the
        // decoder's one-code add lag behind the encoder
        require(code < clear, s"first LZW code $code not a literal")
        require(outLen < n, "LZW output exceeds pixel count")
        out(outLen) = code.toByte; outLen += 1
        prev = code
      } else {
        if (code == nextCode) { // KwKwK: the entry being defined right now
          require(nextCode <= MaxCode, "KwKwK beyond table ceiling")
          prefixOf(nextCode) = prev
          byteOf(nextCode) = firstByteOf(prev).toByte
          nextCode += 1
          emit(code)
        } else {
          require(code < nextCode, s"LZW code $code out of range")
          val first = emit(code)
          if (nextCode <= MaxCode) {
            prefixOf(nextCode) = prev
            byteOf(nextCode) = first.toByte
            nextCode += 1
          }
        }
        // one earlier than the encoder's 2^width (see class scaladoc)
        if (nextCode == (1 << codeWidth) - 1 && codeWidth < 12) codeWidth += 1
        prev = code
      }
    }
    require(outLen == n, s"LZW decoded $outLen of $n pixels")
    out
  }

  /** Batched decode → feature-extract with the family's double
    * round-trip: decoded indices are re-encoded and decoded again, and
    * the two decodes must agree — an LZW coder asymmetry (width growth,
    * KwKwK, reset timing) breaks the gate hash instead of hiding.
    */
  def decodeAssets(assets: Dataset[RawAsset]): Dataset[GifDecoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(StubDecoder.BatchSize).flatMap(_.iterator.map { a =>
        val (w, h, idx) = decode(a.payload)
        val (w2, h2, idx2) = decode(encode(w, h, idx))
        require(w2 == w && h2 == h && java.util.Arrays.equals(idx, idx2),
          "GIF round-trip mismatch")
        var sum = 0L; var peak = 0L
        var j = 0
        while (j < idx2.length) {
          val v = idx2(j) & 0xff
          sum += v
          if (v > peak) peak = v
          j += 1
        }
        GifDecoded(a.docId, w, h, sum, peak, idx2)
      })
    }
  }
}
