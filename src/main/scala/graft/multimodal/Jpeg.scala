package graft.multimodal

import org.apache.spark.sql.Dataset

/** Decoded JPEG asset: dims, exact-integer gray sum, and the decoded
  * top-down packed 8-bit gray pixels (what a feature extractor consumes
  * and what the oracle re-derives).
  */
final case class JpegDecoded(
    docId: Long,
    w: Int,
    h: Int,
    sumV: Long,
    pix: Array[Byte])

/** Decoded 4:2:0 YCbCr JPEG asset: dims, exact-integer per-plane sums,
  * and the three decoded planes (Y full-res; Cb/Cr quarter-res).
  */
final case class JpegColorDecoded(
    docId: Long,
    w: Int,
    h: Int,
    sumY: Long,
    sumCb: Long,
    sumCr: Long,
    y: Array[Byte],
    cb: Array[Byte],
    cr: Array[Byte])

/** REAL entropy-coded transform codec with zero external dependencies:
  * baseline sequential JPEG (ITU-T T.81) — 8-bit grayscale AND 4:2:0
  * YCbCr color (interleaved 16x16 MCUs: 4 luma blocks + Cb + Cr, the
  * shape virtually every camera emits) — built entirely on the JDK; the
  * THIRD compression family next to PNG's LZ77 and GIF's LZW. Restart
  * markers (DRI/RSTn with DC-prediction reset) supported on both paths.
  *
  * [[encode]] emits a byte-valid .jpg any viewer opens: SOI, DQT, SOF0,
  * two DHTs (canonical Huffman from BITS/HUFFVAL), SOS, an MSB-first
  * entropy bitstream with 0xFF00 byte stuffing, EOI. The full pipeline
  * is real: level shift, naive FDCT, quantization, zigzag, DC
  * prediction (category + ones-complement value bits), AC run-length
  * coding with ZRL and EOB. [[decode]] is the inverse the spec
  * prescribes: marker walk, canonical Huffman decode, dequant, inverse
  * zigzag, IDCT, level shift + clamp, partial-MCU crop.
  *
  * Exactness contract the gate leans on: with a flat (all-ones) quant
  * table, a BLOCK-CONSTANT image round-trips bit-exactly — a constant
  * block's DCT is a lone DC coefficient 8·(v−128), an exact power-of-two
  * multiple, and its IDCT is exactly constant again (ACs vanish
  * analytically; the ≤1e-13 float residue rounds to zero). JPEG is
  * lossy in general, so unlike PNG/GIF the oracle-exact gate data is
  * deliberately block-constant; arbitrary-content round trips are
  * bounded, not exact (JpegSpec pins both).
  *
  * Totality contract (CodecFuzzLaws): decode on arbitrary bytes either
  * succeeds or throws IllegalArgumentException; all size arithmetic is
  * bounds-checked, dims are capped, the Huffman walk and bit reader
  * fail closed at EOF, and unsupported shapes (progressive, 12-bit,
  * other subsamplings) are rejected up front.
  *
  * Scale notes: narrow per-block kernels, linear in payload bytes, no
  * shuffle; [[decodeAssets]] keeps the family's mapPartitions shape.
  */
object Jpeg {

  private val MaxPixels = 1 << 24 // 16M gray pixels = 16 MB raster cap

  /** Zigzag scan order: zig(k) = raster index of the k-th scanned
    * coefficient (T.81 Figure 5 — a public spec constant).
    */
  private val Zig: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) and the 1/√2 DC scale — shared by FDCT/IDCT. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  private val Alpha: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  // == canonical Huffman (T.81 Annex C): BITS = #codes per length 1..16,
  // HUFFVAL = symbols in code order ==

  /** Our DC table: 12 four-bit codes for categories 0..11. */
  private val DcBits: Array[Int] =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray

  /** Our AC table: all 162 baseline symbols (EOB, ZRL, every run/size)
    * as eight-bit codes — 162 ≤ 256 satisfies Kraft and keeps the
    * all-ones code unused, so the table is canonical-legal and trivially
    * complete for any stream the encoder can emit.
    */
  private val AcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals: Array[Int] =
    Array(0x00, 0xF0) ++
      (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size)

  /** symbol → (code, length) for the encoder. */
  private def encodeTable(bits: Array[Int], vals: Array[Int])
      : Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(k) -> ((code, len)); code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  private lazy val DcEnc = encodeTable(DcBits, DcVals)
  private lazy val AcEnc = encodeTable(AcBits, AcVals)

  /** Decoder-side canonical table: mincode/maxcode/valptr per length
    * (T.81 F.2.2.3). Immutable after construction.
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    require(vals.length == bits.sum && vals.length <= 256,
      "malformed Huffman table")
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
    /** Read one symbol from `br`; IAE on EOF or a code outside the table. */
    def decode(br: BitReader): Int = {
      var code = br.bit(); var len = 1
      while (len <= 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | br.bit(); len += 1
      }
      if (len > 16) throw new IllegalArgumentException(
        "Huffman code longer than 16 bits")
      vals(valPtr(len) + code - minCode(len))
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Array[Byte] = {
      while (nbits != 0) put(1, 1) // pad with 1s per spec
      out.toByteArray
    }
    /** Byte-align with 1-fill and emit RSTn (markers are never stuffed;
      * a fill byte that lands on 0xFF IS, via the normal put path).
      */
    def restartMarker(n: Int): Unit = {
      while (nbits != 0) put(1, 1)
      out.write(0xFF); out.write(0xD0 + (n & 7))
    }
  }

  /** Entropy-segment reader: un-stuffs 0xFF00, stops (fails closed) at
    * any other marker or end of input.
    */
  private final class BitReader(data: Array[Byte], start: Int) {
    private var pos = start
    private var acc = 0; private var nbits = 0
    var end: Int = -1 // first byte of the terminating marker, set on hit
    private def nextByte(): Int = {
      if (pos >= data.length)
        throw new IllegalArgumentException("truncated entropy stream")
      val b = data(pos) & 0xff; pos += 1
      if (b == 0xFF) {
        if (pos >= data.length)
          throw new IllegalArgumentException("truncated entropy stream")
        val m = data(pos) & 0xff
        if (m == 0x00) { pos += 1; 0xFF }
        else { end = pos - 1
          throw new IllegalArgumentException("entropy stream hit a marker")
        }
      } else b
    }
    def bit(): Int = {
      if (nbits == 0) { acc = nextByte(); nbits = 8 }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Resync at a restart marker: discard partial bits, skip padding
      * and orphaned stuffing bytes, consume the RSTn. IAE if the next
      * marker is not a restart — fail closed, never resynchronize onto
      * garbage.
      */
    def restart(): Unit = {
      acc = 0; nbits = 0
      while (pos + 1 < data.length &&
          !((data(pos) & 0xff) == 0xFF && (data(pos + 1) & 0xff) != 0x00))
        pos += 1
      require(pos + 1 < data.length, "missing restart marker")
      val m = data(pos + 1) & 0xff
      if (m < 0xD0 || m > 0xD7)
        throw new IllegalArgumentException(f"expected RSTn, got FF$m%02X")
      pos += 2
    }

    /** Position of the marker 0xFF that ends the scan (for EOI check). */
    def markerPos: Int = {
      // consume padding bits then locate the next marker
      while (end < 0) {
        if (pos >= data.length)
          throw new IllegalArgumentException("missing EOI")
        val b = data(pos) & 0xff
        if (b == 0xFF && pos + 1 < data.length &&
            (data(pos + 1) & 0xff) != 0x00) { end = pos }
        else pos += 1
      }
      end
    }
  }

  private def u16(b: Array[Byte], off: Int): Int = {
    require(off + 1 < b.length, "truncated segment")
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  }

  /** Bit category of a DC diff / AC value (T.81 F.1.2.1.2). */
  private def category(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Sign-extend `v` read as a `cat`-bit value (T.81 F.2.2.1 EXTEND). */
  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0
    else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
    else v

  /** FDCT + flat quant + Huffman-write one level-shifted block; returns
    * the new DC predictor (quantized units). `q` is caller scratch.
    */
  private def writeBlock(bw: BitWriter, f: Array[Double], q: Array[Int],
      prevDc: Int): Int = {
    var k = 0
    while (k < 64) {
      val u = Zig(k) % 8; val v = Zig(k) / 8
      var s = 0.0
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          s += f(yy * 8 + xx) * Cos(u)(xx) * Cos(v)(yy)
          xx += 1
        }
        yy += 1
      }
      q(k) = math.round(0.25 * Alpha(u) * Alpha(v) * s).toInt
      k += 1
    }
    // DC: category + value bits of the prediction diff
    val diff = q(0) - prevDc
    val cat = category(diff)
    val (dcode, dlen) = DcEnc(cat)
    bw.put(dcode, dlen)
    if (cat > 0)
      bw.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
    // AC: run-length with ZRL and EOB
    var run = 0; var kk = 1
    while (kk < 64) {
      if (q(kk) == 0) run += 1
      else {
        while (run > 15) { val (zc, zl) = AcEnc(0xF0); bw.put(zc, zl); run -= 16 }
        val sz = category(q(kk))
        require(sz <= 10, s"AC coefficient out of range: ${q(kk)}")
        val (c, l) = AcEnc((run << 4) | sz)
        bw.put(c, l)
        bw.put(if (q(kk) < 0) q(kk) + (1 << sz) - 1 else q(kk), sz)
        run = 0
      }
      kk += 1
    }
    if (run > 0) { val (ec, el) = AcEnc(0x00); bw.put(ec, el) }
    q(0)
  }

  /** Huffman-read + dequant one block into `coef` (raster order);
    * returns the new DC predictor (quantized units).
    */
  private def readBlock(br: BitReader, dcT: HuffTable, acT: HuffTable,
      quant: Array[Int], coef: Array[Int], prevDc: Int): Int = {
    java.util.Arrays.fill(coef, 0)
    val cat = dcT.decode(br)
    require(cat <= 11, "bad DC category")
    val dc = prevDc + extend(br.bits(cat), cat)
    coef(0) = dc * quant(0)
    var k = 1
    while (k < 64) {
      val rs = acT.decode(br)
      if (rs == 0x00) k = 64 // EOB
      else if (rs == 0xF0) k += 16 // ZRL
      else {
        k += rs >> 4
        val sz = rs & 0x0f
        require(k < 64, "AC index past block end")
        coef(Zig(k)) = extend(br.bits(sz), sz) * quant(k)
        k += 1
      }
    }
    dc
  }

  /** IDCT + level shift into `blk` (values still unclamped doubles). */
  private def idct(coef: Array[Int], blk: Array[Double]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) s += Alpha(u) * Alpha(v) * c * Cos(u)(x) * Cos(v)(y)
            u += 1
          }
          v += 1
        }
        blk(y * 8 + x) = 0.25 * s + 128.0
        x += 1
      }
      y += 1
    }
  }

  /** Level-shifted 8x8 block from `plane` at block (bx, by) with edge
    * replication — block-constant content stays block-constant.
    */
  private def loadBlock(plane: Array[Byte], w: Int, h: Int, bx: Int,
      by: Int, f: Array[Double]): Unit = {
    var y = 0
    while (y < 8) {
      val sy = math.min(by * 8 + y, h - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(bx * 8 + x, w - 1)
        f(y * 8 + x) = (plane(sy * w + sx) & 0xff) - 128.0
        x += 1
      }
      y += 1
    }
  }

  /** Clamp `blk` into the (cropped) raster at block (bx, by). */
  private def storeBlock(blk: Array[Double], plane: Array[Byte], w: Int,
      h: Int, bx: Int, by: Int): Unit = {
    var y = 0
    while (y < 8) {
      val py = by * 8 + y
      if (py < h) {
        var x = 0
        while (x < 8) {
          val px = bx * 8 + x
          if (px < w) {
            val v = math.round(blk(y * 8 + x)).toInt
            plane(py * w + px) =
              (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          x += 1
        }
      }
      y += 1
    }
  }

  /** Shared header emission for both encoders: SOI, flat DQT, SOF0 with
    * the given component spec, the two DHTs, optional DRI, SOS.
    */
  private def writeHeaders(out: java.io.ByteArrayOutputStream, w: Int,
      h: Int, sofComps: Array[Byte], sosBody: Array[Byte],
      restartInterval: Int): Unit = {
    def seg(marker: Int, body: Array[Byte]): Unit = {
      out.write(0xFF); out.write(marker)
      out.write((body.length + 2) >>> 8); out.write((body.length + 2) & 0xff)
      out.write(body, 0, body.length)
    }
    out.write(0xFF); out.write(0xD8) // SOI
    seg(0xDB, Array[Byte](0) ++ Array.fill[Byte](64)(1)) // DQT id 0, flat
    seg(0xC0, Array[Byte](8, // SOF0: 8-bit precision
      (h >>> 8).toByte, (h & 0xff).toByte,
      (w >>> 8).toByte, (w & 0xff).toByte) ++ sofComps)
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit =
      seg(0xC4, Array[Byte]((cls << 4).toByte) ++
        bits.map(_.toByte) ++ vals.map(_.toByte))
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    if (restartInterval > 0) // DRI: restart every N MCUs
      seg(0xDD, Array[Byte]((restartInterval >>> 8).toByte,
        (restartInterval & 0xff).toByte))
    seg(0xDA, sosBody)
  }

  /** Encode top-down row-major 8-bit gray pixels as a baseline
    * sequential grayscale JPEG with a flat all-ones quant table (the
    * exactness contract above). Partial edge MCUs pad by edge
    * replication, so block-constant content stays block-constant.
    */
  def encode(w: Int, h: Int, pixels: Array[Byte],
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff,
      s"bad dims ${w}x$h")
    require(pixels.length == w * h, s"expected ${w * h} bytes")
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      s"bad restart interval $restartInterval")
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h,
      sofComps = Array[Byte](1, 1, 0x11, 0), // 1 comp, 1x1, quant 0
      sosBody = Array[Byte](1, 1, 0x00, 0, 63, 0), // comp 1, DC0/AC0
      restartInterval = restartInterval)

    val bw = new BitWriter
    val wB = (w + 7) / 8; val hB = (h + 7) / 8
    val f = new Array[Double](64); val q = new Array[Int](64)
    var prevDc = 0
    var mcu = 0; var rst = 0
    var by = 0
    while (by < hB) {
      var bx = 0
      while (bx < wB) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.restartMarker(rst); rst = (rst + 1) & 7
          prevDc = 0 // DC prediction resets at every restart
        }
        mcu += 1
        loadBlock(pixels, w, h, bx, by, f)
        prevDc = writeBlock(bw, f, q, prevDc)
        bx += 1
      }
      by += 1
    }
    out.write(bw.flush())
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Encode a 4:2:0 YCbCr baseline JPEG from its three planes (Y at
    * w x h, Cb/Cr at ceil(w/2) x ceil(h/2)) with the same flat quant
    * table and exactness contract as [[encode]]: interleaved 16x16 MCUs
    * (4 luma blocks + Cb + Cr), per-component DC prediction, optional
    * restart markers.
    */
  def encodeColor(w: Int, h: Int, yP: Array[Byte], cbP: Array[Byte],
      crP: Array[Byte], restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff,
      s"bad dims ${w}x$h")
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    require(yP.length == w * h, s"expected ${w * h} luma bytes")
    require(cbP.length == cw * ch && crP.length == cw * ch,
      s"expected ${cw * ch} bytes per chroma plane")
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      s"bad restart interval $restartInterval")
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h,
      sofComps = Array[Byte](3, // 3 components: 2x2 luma, 1x1 chroma
        1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0),
      sosBody = Array[Byte](3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0),
      restartInterval = restartInterval)

    val bw = new BitWriter
    val f = new Array[Double](64); val q = new Array[Int](64)
    val prevDc = new Array[Int](3)
    val mcusX = (w + 15) / 16; val mcusY = (h + 15) / 16
    var mcu = 0; var rst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.restartMarker(rst); rst = (rst + 1) & 7
          java.util.Arrays.fill(prevDc, 0)
        }
        mcu += 1
        var i = 0
        while (i < 2) { // 4 luma blocks, left-to-right then top-to-bottom
          var j = 0
          while (j < 2) {
            loadBlock(yP, w, h, 2 * mx + j, 2 * my + i, f)
            prevDc(0) = writeBlock(bw, f, q, prevDc(0))
            j += 1
          }
          i += 1
        }
        loadBlock(cbP, cw, ch, mx, my, f)
        prevDc(1) = writeBlock(bw, f, q, prevDc(1))
        loadBlock(crP, cw, ch, mx, my, f)
        prevDc(2) = writeBlock(bw, f, q, prevDc(2))
        mx += 1
      }
      my += 1
    }
    out.write(bw.flush())
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Decode a baseline sequential GRAYSCALE JPEG. Succeeds or throws
    * IllegalArgumentException (totality fuzz-proven); progressive /
    * multi-component / 12-bit streams are rejected, not mis-decoded.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, planes) = decodePlanes(bytes, wantColor = false)
    (w, h, planes(0))
  }

  /** Decode a baseline sequential 4:2:0 YCbCr JPEG (three components,
    * sampling 2x2/1x1/1x1 — the shape virtually every camera emits) to
    * its three planes: full-resolution Y and quarter-resolution Cb/Cr
    * (ceil(w/2) x ceil(h/2)). No RGB conversion — a curation pipeline
    * featurizes planes; color-space math would add rounding the oracle
    * cannot share. Succeeds or throws IllegalArgumentException.
    */
  def decodeColor(bytes: Array[Byte])
      : (Int, Int, Array[Byte], Array[Byte], Array[Byte]) = {
    val (w, h, planes) = decodePlanes(bytes, wantColor = true)
    (w, h, planes(0), planes(1), planes(2))
  }

  /** Shared decoder: grayscale (1 component) or 4:2:0 YCbCr (3). The
    * marker walk, Huffman machinery, restart handling and totality
    * contract are one code path — the fuzz suite hardens both shapes.
    */
  private def decodePlanes(bytes: Array[Byte], wantColor: Boolean)
      : (Int, Int, Array[Array[Byte]]) = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xFF &&
      (bytes(1) & 0xff) == 0xD8, "not a JPEG (missing SOI)")
    var pos = 2
    var w = -1; var h = -1
    var nf = -1
    // per frame component: (hSamp, vSamp, quantTableId)
    var comps: Array[(Int, Int, Int)] = null
    // per scan component: (dc table, ac table)
    var scanTabs: Array[(HuffTable, HuffTable)] = null
    var restartInterval = 0
    // 16 slots: ids are 4-bit nibbles — a corrupt id must index, not
    // escape as ArrayIndexOutOfBounds (spec says 0..3, fuzz says 0..15)
    val quants = new Array[Array[Int]](16)
    val dcTabs = new Array[HuffTable](16)
    val acTabs = new Array[HuffTable](16)
    var sosAt = -1
    while (sosAt < 0) {
      require(pos + 1 < bytes.length, "truncated marker stream")
      require((bytes(pos) & 0xff) == 0xFF, "marker expected")
      val m = bytes(pos + 1) & 0xff
      if (m == 0xFF) pos += 1 // fill byte
      else if (m == 0xD8) throw new IllegalArgumentException("nested SOI")
      else if (m == 0xD9) throw new IllegalArgumentException("EOI before SOS")
      else {
        val len = u16(bytes, pos + 2)
        require(len >= 2 && pos + 2L + len <= bytes.length,
          "segment length overruns payload")
        val body = pos + 4; val bodyLen = len - 2
        m match {
          case 0xDB => // DQT: one or more 8-bit tables
            var o = body
            while (o < body + bodyLen) {
              val pq = (bytes(o) & 0xff) >> 4; val tq = bytes(o) & 0x0f
              require(pq == 0, "16-bit quant tables unsupported")
              require(o + 65 <= body + bodyLen, "truncated DQT")
              quants(tq) = Array.tabulate(64)(i => bytes(o + 1 + i) & 0xff)
              require(quants(tq).forall(_ > 0), "zero quant step")
              o += 65
            }
          case 0xC4 => // DHT: one or more tables
            var o = body
            while (o < body + bodyLen) {
              require(o + 17 <= body + bodyLen, "truncated DHT")
              val cls = (bytes(o) & 0xff) >> 4; val id = bytes(o) & 0x0f
              require(cls <= 1, "bad DHT class")
              val bits = Array.tabulate(16)(i => bytes(o + 1 + i) & 0xff)
              val n = bits.sum
              require(n <= 256 && o + 17 + n <= body + bodyLen,
                "truncated DHT values")
              val vals = Array.tabulate(n)(i => bytes(o + 17 + i) & 0xff)
              val t = new HuffTable(bits, vals)
              if (cls == 0) dcTabs(id) = t else acTabs(id) = t
              o += 17 + n
            }
          case 0xC0 => // SOF0 baseline sequential
            require(bodyLen >= 8, "truncated SOF0")
            require((bytes(body) & 0xff) == 8, "only 8-bit precision")
            h = u16(bytes, body + 1); w = u16(bytes, body + 3)
            require(w > 0 && h > 0, "empty frame")
            require(w.toLong * h <= MaxPixels, "frame too large")
            nf = bytes(body + 5) & 0xff
            require(bodyLen >= 6 + 3 * nf, "truncated SOF0 components")
            if (wantColor)
              require(nf == 3, "expected a 3-component YCbCr frame")
            else
              require(nf == 1, "only grayscale (1 component) supported")
            comps = Array.tabulate(nf) { i =>
              val hv = bytes(body + 7 + 3 * i) & 0xff
              ((hv >> 4, hv & 0x0f, bytes(body + 8 + 3 * i) & 0x0f))
            }
            if (nf == 1)
              require(comps(0)._1 == 1 && comps(0)._2 == 1,
                "subsampling on a single component")
            else
              require(comps(0) == ((2, 2, comps(0)._3)) &&
                comps(1)._1 == 1 && comps(1)._2 == 1 &&
                comps(2)._1 == 1 && comps(2)._2 == 1,
                "only 4:2:0 (2x2 luma, 1x1 chroma) supported")
          case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
               0xCB | 0xCD | 0xCE | 0xCF =>
            throw new IllegalArgumentException(
              "only baseline sequential (SOF0) supported")
          case 0xDA => // SOS
            require(w > 0, "SOS before SOF0")
            require(bodyLen >= 4 + 2 * nf, "truncated SOS")
            require((bytes(body) & 0xff) == nf,
              "scan must cover every frame component")
            scanTabs = Array.tabulate(nf) { i =>
              val tabs = bytes(body + 2 + 2 * i) & 0xff
              val dcT = dcTabs(tabs >> 4); val acT = acTabs(tabs & 0x0f)
              require(dcT != null && acT != null, "missing Huffman table")
              (dcT, acT)
            }
            comps.foreach { case (_, _, tq) =>
              require(quants(tq) != null, "missing quant table") }
            sosAt = pos + 2 + len
          case 0xDD => // DRI: restart interval in MCUs
            require(bodyLen >= 2, "truncated DRI")
            restartInterval = u16(bytes, body)
          case _ => () // APPn, COM
        }
        pos += 2 + len
      }
    }

    // plane geometry: full-res Y; 4:2:0 chroma at ceil(w/2) x ceil(h/2)
    val dims: Array[(Int, Int)] =
      if (nf == 1) Array((w, h))
      else Array((w, h), ((w + 1) / 2, (h + 1) / 2), ((w + 1) / 2, (h + 1) / 2))
    val planes = dims.map { case (pw, ph) => new Array[Byte](pw * ph) }
    val br = new BitReader(bytes, sosAt)
    val coef = new Array[Int](64); val blk = new Array[Double](64)
    val prevDc = new Array[Int](nf)
    var mcu = 0
    // MCU grid: 8x8 for grayscale, 16x16 for 4:2:0
    val mcuPx = if (nf == 1) 8 else 16
    val mcusX = (w + mcuPx - 1) / mcuPx; val mcusY = (h + mcuPx - 1) / mcuPx
    try {
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            br.restart()
            java.util.Arrays.fill(prevDc, 0) // DC prediction resets
          }
          mcu += 1
          if (nf == 1) {
            prevDc(0) = readBlock(br, scanTabs(0)._1, scanTabs(0)._2,
              quants(comps(0)._3), coef, prevDc(0))
            idct(coef, blk)
            storeBlock(blk, planes(0), w, h, mx, my)
          } else {
            // 4 luma blocks, left-to-right then top-to-bottom, then Cb, Cr
            var i = 0
            while (i < 2) {
              var j = 0
              while (j < 2) {
                prevDc(0) = readBlock(br, scanTabs(0)._1, scanTabs(0)._2,
                  quants(comps(0)._3), coef, prevDc(0))
                idct(coef, blk)
                storeBlock(blk, planes(0), w, h, 2 * mx + j, 2 * my + i)
                j += 1
              }
              i += 1
            }
            var c = 1
            while (c <= 2) {
              prevDc(c) = readBlock(br, scanTabs(c)._1, scanTabs(c)._2,
                quants(comps(c)._3), coef, prevDc(c))
              idct(coef, blk)
              storeBlock(blk, planes(c), dims(c)._1, dims(c)._2, mx, my)
              c += 1
            }
          }
          mx += 1
        }
        my += 1
      }
    } catch {
      case e: ArrayIndexOutOfBoundsException =>
        // coef(Zig(k)) with a forged k is range-checked in readBlock; any
        // other index escape is converted to honor the totality contract
        throw new IllegalArgumentException(s"corrupt scan: ${e.getMessage}")
    }
    // the scan must terminate at EOI (possibly after padding bits)
    val mp = br.markerPos
    require(mp + 1 < bytes.length && (bytes(mp + 1) & 0xff) == 0xD9,
      "scan not terminated by EOI")
    (w, h, planes)
  }

  /** Batched Dataset decode — the same mapPartitions shape as the other
    * codecs: byte-array kernels on executors, no shuffle, linear in
    * payload bytes.
    */
  def decodeAssets(assets: Dataset[RawAsset]): Dataset[JpegDecoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(StubDecoder.BatchSize).flatMap(_.iterator.map { a =>
        val (w, h, pix) = decode(a.payload)
        var sv = 0L
        var j = 0
        while (j < pix.length) { sv += pix(j) & 0xff; j += 1 }
        JpegDecoded(a.docId, w, h, sv, pix)
      })
    }
  }

  /** Batched 4:2:0 color decode — same mapPartitions shape. */
  def decodeColorAssets(assets: Dataset[RawAsset])
      : Dataset[JpegColorDecoded] = {
    import assets.sparkSession.implicits._
    def sum(p: Array[Byte]): Long = {
      var s = 0L; var j = 0
      while (j < p.length) { s += p(j) & 0xff; j += 1 }
      s
    }
    assets.mapPartitions { it =>
      it.grouped(StubDecoder.BatchSize).flatMap(_.iterator.map { a =>
        val (w, h, y, cb, cr) = decodeColor(a.payload)
        JpegColorDecoded(a.docId, w, h, sum(y), sum(cb), sum(cr), y, cb, cr)
      })
    }
  }
}
