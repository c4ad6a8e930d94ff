package graft.multimodal

import org.apache.spark.sql.Dataset

/** Per-asset features of a FLAC-subset decode: exact integers the oracle
  * re-derives from the synthesis formula (the codec is LOSSLESS, so the
  * reconstruction equals the original bit for bit) — plus the encoded
  * byte length, which pins the ENCODER: the oracle replays the per-frame
  * best-Rice-parameter search and the whole bit-layout arithmetic, so a
  * single drifted bit in the writer breaks the gate.
  */
final case class FlacFeatures(
    docId: Long,
    nSamples: Long,
    wsum: Long,
    peak: Long,
    nBytes: Long)

/** REAL FLAC subset — LINEAR-PREDICTIVE ENTROPY CODING, the fifth
  * compression family in the engine after LZ77 (PNG), LZW (GIF),
  * entropy-coded transform (JPEG) and adaptive differential prediction
  * (ADPCM). The encoder emits a spec-shaped FLAC stream ("fLaC" magic,
  * STREAMINFO metadata block, frames with CRC-8-protected headers and
  * CRC-16-protected bodies) restricted to the subset: mono, 16 bps,
  * fixed 256-sample blocks, one FIXED order-2 subframe per frame
  * (residual r_i = s_i − 2s_{i−1} + s_{i−2}), a single Rice partition
  * (partition order 0) with the 4-bit parameter chosen per frame by
  * exact bit-cost minimization. The decoder is more general than the
  * encoder — fixed orders 0..4, any frame count, full UTF-8 frame
  * numbers — and verifies both CRCs plus every subset bound, throwing
  * IllegalArgumentException on anything malformed (totality fuzz-proven
  * in CodecFuzzLaws, round trip included: lossless means decode ∘ encode
  * must be the identity).
  */
object Flac {

  /** Samples per frame (STREAMINFO min = max = Block). */
  val Block = 256

  // ---- CRCs (FLAC frame checksums) -----------------------------------

  /** CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0. */
  def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0. */
  def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ---- bit IO ---------------------------------------------------------

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def put(value: Long, bits: Int): Unit = {
      var b = bits - 1
      while (b >= 0) {
        cur = (cur << 1) | ((value >>> b) & 1L).toInt
        nBits += 1
        if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
        b -= 1
      }
    }
    def unary(q: Int): Unit = { put(0L, q); put(1L, 1) } // q zeros, then 1
    def alignZero(): Unit = if (nBits > 0) put(0L, 8 - nBits)
    def isAligned: Boolean = nBits == 0
    def toBytes: Array[Byte] = { require(nBits == 0); buf.toByteArray }
  }

  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    var pos: Long = startByte.toLong * 8 // absolute bit position
    private def bit(): Int = {
      val byteIdx = (pos >>> 3).toInt
      require(byteIdx < bytes.length, "flac: truncated stream")
      val b = (bytes(byteIdx) >> (7 - (pos & 7)).toInt) & 1
      pos += 1
      b
    }
    def take(bits: Int): Long = {
      var v = 0L
      var i = 0
      while (i < bits) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def takeSigned(bits: Int): Int = {
      val v = take(bits)
      (v << (64 - bits) >> (64 - bits)).toInt // sign extend
    }
    def unary(): Int = {
      var q = 0
      while (bit() == 0) {
        q += 1
        require(q <= (1 << 20), "flac: runaway unary run")
      }
      q
    }
    def align(): Unit = if ((pos & 7) != 0) {
      val fill = 8 - (pos & 7)
      require(take(fill.toInt) == 0, "flac: nonzero frame padding")
    }
    def byteIndex: Int = { require((pos & 7) == 0); (pos >>> 3).toInt }
  }

  // ---- encode ---------------------------------------------------------

  private def fold(r: Int): Long = if (r >= 0) 2L * r else -2L * r - 1

  /** Exact per-frame Rice parameter: argmin over k ∈ 0..14 of
    * Σ(u_i >> k) + 1 + k, smallest k on ties — mirrored verbatim by the
    * oracle's bit-cost search.
    */
  def bestK(folded: Array[Long]): Int = {
    var best = 0
    var bestBits = Long.MaxValue
    var k = 0
    while (k <= 14) {
      var bits = 0L
      var i = 0
      while (i < folded.length) { bits += (folded(i) >> k) + 1 + k; i += 1 }
      if (bits < bestBits) { bestBits = bits; best = k }
      k += 1
    }
    best
  }

  /** Encode mono PCM16 (length a positive multiple of [[Block]]) as a
    * FLAC-subset stream. Residual magnitudes must keep the best Rice
    * parameter ≤ 14 (no escape codes in the subset) — guaranteed for
    * inputs within ±2^13, enforced per frame.
    */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(samples.nonEmpty && samples.length % Block == 0,
      s"sample count ${samples.length} not a positive multiple of $Block")
    require(sampleRate > 0 && sampleRate < (1 << 20), s"rate $sampleRate")
    val nFrames = samples.length / Block
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO: last-metadata flag + type 0, 24-bit length 34
    val si = new BitWriter
    si.put(1, 1); si.put(0, 7); si.put(34, 24)
    si.put(Block.toLong, 16); si.put(Block.toLong, 16) // min/max blocksize
    si.put(0, 24); si.put(0, 24) // min/max frame size: unknown
    si.put(sampleRate.toLong, 20)
    si.put(0, 3)  // channels - 1
    si.put(15, 5) // bits per sample - 1
    si.put(samples.length.toLong, 36)
    si.put(0, 64); si.put(0, 64) // MD5 unset (spec: 0 = unknown)
    out.write(si.toBytes)

    var f = 0
    while (f < nFrames) {
      val w = new BitWriter
      w.put(0x3ffe, 14) // sync
      w.put(0, 1)       // reserved
      w.put(0, 1)       // fixed-blocksize strategy
      w.put(8, 4)       // blocksize code 8 = 256
      w.put(0, 4)       // sample rate: from STREAMINFO
      w.put(0, 4)       // channels: mono
      w.put(4, 3)       // sample size code 4 = 16 bps
      w.put(0, 1)       // reserved
      putUtf8Number(w, f.toLong)
      // header fields sum to whole bytes, so this snapshot is aligned
      val headBytes = w.toBytes
      w.put(crc8(headBytes, 0, headBytes.length).toLong, 8)
      // subframe header: pad bit, FIXED order 2 (0b001000|2), no wasted bits
      w.put(0, 1); w.put(0x08 | 2, 6); w.put(0, 1)
      val base = f * Block
      w.put(samples(base) & 0xffffL, 16)     // warmup 1
      w.put(samples(base + 1) & 0xffffL, 16) // warmup 2
      val folded = new Array[Long](Block - 2)
      var j = 2
      while (j < Block) {
        val r = samples(base + j) - 2 * samples(base + j - 1) +
          samples(base + j - 2)
        folded(j - 2) = fold(r)
        j += 1
      }
      val k = bestK(folded)
      require(folded.forall(u => (u >> k) < (1 << 16)),
        "flac subset: residuals too large for a 4-bit Rice parameter")
      w.put(0, 2)        // residual method: 4-bit Rice
      w.put(0, 4)        // partition order 0
      w.put(k.toLong, 4) // rice parameter
      var i = 0
      while (i < folded.length) {
        w.unary((folded(i) >> k).toInt)
        w.put(folded(i) & ((1L << k) - 1), k)
        i += 1
      }
      w.alignZero()
      val body = w.toBytes
      out.write(body)
      val c16 = crc16(body, 0, body.length)
      out.write(c16 >> 8); out.write(c16 & 0xff)
      f += 1
    }
    out.toByteArray
  }

  /** UTF-8-style coded number (the FLAC frame-number encoding): an
    * n-byte form carries 5n+1 payload bits — first byte [n ones][0]
    * [7−n payload bits], then (n−1) `10xxxxxx` continuations.
    */
  private def putUtf8Number(w: BitWriter, v: Long): Unit = {
    require(v >= 0)
    if (v < 0x80) w.put(v, 8)
    else {
      var n = 2
      while (v >= (1L << (n * 5 + 1)) && n < 7) n += 1
      w.put((1L << n) - 1, n) // n ones
      w.put(0, 1)
      w.put(v >> (6 * (n - 1)), 7 - n)
      var i = n - 2
      while (i >= 0) {
        w.put(2, 2) // 10
        w.put((v >> (6 * i)) & 0x3f, 6)
        i -= 1
      }
    }
  }

  // ---- decode ---------------------------------------------------------

  /** Fixed-predictor restoration coefficients by order. */
  private val FixedCoef: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  /** Parse + decode a FLAC-subset stream → (sampleRate, samples).
    * Strict totality: succeed or throw IllegalArgumentException.
    */
  def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 42 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C', "flac: bad magic")
    // metadata chain: STREAMINFO must come first; skip the rest
    var off = 4
    var last = false
    var rate = -1
    var total = -1L
    var blockSize = -1
    var first = true
    while (!last) {
      require(off + 4 <= bytes.length, "flac: truncated metadata header")
      last = (bytes(off) & 0x80) != 0
      val typ = bytes(off) & 0x7f
      val len = ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      require(off + 4 + len <= bytes.length, "flac: truncated metadata")
      if (first) {
        require(typ == 0 && len == 34, "flac: STREAMINFO must come first")
        val r = new BitReader(bytes, off + 4)
        val minB = r.take(16).toInt; val maxB = r.take(16).toInt
        require(minB == maxB && minB >= 16, s"flac subset: blocksize $minB")
        blockSize = minB
        r.take(24); r.take(24)
        rate = r.take(20).toInt
        require(rate > 0, "flac: zero sample rate")
        require(r.take(3) == 0, "flac subset: mono only")
        require(r.take(5) == 15, "flac subset: 16 bps only")
        total = r.take(36)
        require(total > 0 && total % blockSize == 0 && total <= (1 << 26),
          s"flac subset: total $total")
        first = false
      }
      off += 4 + len
    }
    require(total > 0, "flac: no STREAMINFO")
    val out = new Array[Short](total.toInt)
    val nFrames = (total / blockSize).toInt
    var f = 0
    var byteOff = off
    while (f < nFrames) {
      val frameStart = byteOff
      val r = new BitReader(bytes, byteOff)
      require(r.take(14) == 0x3ffe, "flac: lost frame sync")
      require(r.take(1) == 0, "flac: reserved bit set")
      require(r.take(1) == 0, "flac subset: fixed blocking only")
      require(r.take(4) == 8, "flac subset: 256-sample frames only")
      require(r.take(4) == 0, "flac subset: rate from STREAMINFO only")
      require(r.take(4) == 0, "flac subset: mono only")
      require(r.take(3) == 4, "flac subset: 16 bps only")
      require(r.take(1) == 0, "flac: reserved bit set")
      val frameNo = takeUtf8Number(r)
      require(frameNo == f, s"flac: frame number $frameNo at index $f")
      val headEnd = (r.pos >>> 3).toInt
      require((r.pos & 7) == 0, "flac: misaligned header")
      val expectCrc8 = crc8(bytes, frameStart, headEnd)
      require(r.take(8) == expectCrc8, "flac: header CRC-8 mismatch")
      // subframe header
      require(r.take(1) == 0, "flac: subframe pad bit set")
      val typ = r.take(6).toInt
      require((typ & 0x38) == 0x08 && (typ & 7) <= 4,
        s"flac subset: subframe type $typ (FIXED only)")
      val order = typ & 7
      require(r.take(1) == 0, "flac subset: wasted bits unsupported")
      val base = f * blockSize
      var j = 0
      while (j < order) { // verbatim warmup
        out(base + j) = r.takeSigned(16).toShort
        j += 1
      }
      require(r.take(2) == 0, "flac subset: 4-bit Rice only")
      require(r.take(4) == 0, "flac subset: partition order 0 only")
      val k = r.take(4).toInt
      require(k <= 14, "flac: Rice escape code in subset stream")
      val coef = FixedCoef(order)
      while (j < blockSize) {
        val q = r.unary()
        val u = (q.toLong << k) | r.take(k)
        val res = if ((u & 1) == 0) (u >> 1).toInt else (-(u >> 1) - 1).toInt
        var pred = 0L
        var c = 0
        while (c < order) { pred += coef(c).toLong * out(base + j - 1 - c); c += 1 }
        val s = pred + res
        require(s >= Short.MinValue && s <= Short.MaxValue,
          s"flac: sample $s out of 16-bit range")
        out(base + j) = s.toShort
        j += 1
      }
      r.align()
      val bodyEnd = r.byteIndex
      val expectCrc16 = crc16(bytes, frameStart, bodyEnd)
      require(bodyEnd + 2 <= bytes.length, "flac: truncated frame CRC")
      val got = ((bytes(bodyEnd) & 0xff) << 8) | (bytes(bodyEnd + 1) & 0xff)
      require(got == expectCrc16, "flac: frame CRC-16 mismatch")
      byteOff = bodyEnd + 2
      f += 1
    }
    require(byteOff == bytes.length, "flac: trailing garbage after frames")
    (rate, out)
  }

  private def takeUtf8Number(r: BitReader): Long = {
    val first = r.take(8).toInt
    if ((first & 0x80) == 0) first.toLong
    else {
      var ones = 0
      while (ones < 8 && ((first << ones) & 0x80) != 0) ones += 1
      require(ones >= 2 && ones <= 7, s"flac: bad coded number prefix")
      var v = (first & (0x7f >> ones)).toLong
      var i = 1
      while (i < ones) {
        val c = r.take(8).toInt
        require((c & 0xc0) == 0x80, "flac: bad coded number continuation")
        v = (v << 6) | (c & 0x3f)
        i += 1
      }
      v
    }
  }

  /** Distributed decode + feature pass (the every-codec mapPartitions
    * shape): n_samples, position-weighted sample sum, peak — plus the
    * ENCODED byte length, which the oracle re-derives from the Rice
    * bit-cost arithmetic.
    */
  def analyzeAssets(assets: Dataset[RawAsset]): Dataset[FlacFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(StubDecoder.BatchSize).flatMap(_.iterator.map { a =>
        val (_, samples) = decode(a.payload)
        var wsum = 0L; var peak = 0L
        var i = 0
        while (i < samples.length) {
          val s = samples(i).toLong
          wsum += s * (i + 1)
          val m = math.abs(s)
          if (m > peak) peak = m
          i += 1
        }
        FlacFeatures(a.docId, samples.length.toLong, wsum, peak,
          a.payload.length.toLong)
      })
    }
  }
}
