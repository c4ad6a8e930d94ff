package graft.multimodal

/** REAL dictionary-compression codec #7, zero external dependencies:
  * LZSS (Storer & Szymanski 1982) — the sliding-window match/literal
  * scheme underlying DEFLATE's LZ77 stage, here in its textbook form
  * with parameters sized so the ORACLE can replay the parse: window 64,
  * match lengths 3..10, greedy longest-match. A different compression
  * family again from the RLE (TGA), LZW (GIF), LZ77+Huffman (PNG),
  * transform (JPEG) and predictive (FLAC/ADPCM) coders already in the
  * suite: raw back-reference coding with no entropy stage.
  *
  * The greedy parse — and therefore every stat AND the encoded size —
  * depends only on "does a match of length l exist in the window", a
  * pure substring-equality predicate DuckDB replays as a recursive CTE
  * with a correlated EXISTS over (offset, length) candidates
  * (llm_text_lzss). Overlapping matches (dist < len, the LZ77 repeat
  * trick) are found by the same predicate, because a source-vs-source
  * comparison at distance d matching for l chars is exactly what an
  * overlapping copy reproduces.
  *
  * Bit layout: flag 1 + 6-bit (dist-1) + 3-bit (len-3) = 10-bit match
  * token; flag 0 + 8 literal bits = 9-bit literal token; zero-padded to
  * a byte boundary after a 4-byte big-endian original-length header.
  *
  * Totality contract (LzssLaws): decode on arbitrary bytes either
  * succeeds or throws IllegalArgumentException; encode∘decode is the
  * identity for every byte array.
  *
  * Reference scope: lensesio/avro-sql (reference repo) has no codec
  * layer — this is suite-contributed, from the published scheme only.
  */
object Lzss {

  val Window = 64
  val MinLen = 3
  val MaxLen = 10

  final case class Stats(nLit: Int, nMatch: Int, matchChars: Int)

  /** Longest l in [MinLen, min(MaxLen, n-p)] with a source match
    * starting in [p-Window, p-1] (0-based p), and the NEAREST distance
    * achieving it. (0, 0) when no match reaches MinLen. The distance
    * choice never affects stats or size — only the emitted bytes.
    */
  private def bestMatch(b: Array[Byte], p: Int): (Int, Int) = {
    val n = b.length
    var l = math.min(MaxLen, n - p)
    while (l >= MinLen) {
      var q = p - 1
      val q0 = math.max(0, p - Window)
      while (q >= q0) {
        var i = 0
        while (i < l && b(q + i) == b(p + i)) i += 1
        if (i == l) return (l, p - q)
        q -= 1
      }
      l -= 1
    }
    (0, 0)
  }

  /** Encoded bytes plus the parse stats the oracle recomputes. */
  def encode(data: Array[Byte]): (Array[Byte], Stats) = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 8)
    out.write((data.length >>> 24) & 0xff)
    out.write((data.length >>> 16) & 0xff)
    out.write((data.length >>> 8) & 0xff)
    out.write(data.length & 0xff)
    var acc = 0L
    var nb = 0
    def put(v: Int, w: Int): Unit = {
      acc = (acc << w) | (v & ((1L << w) - 1))
      nb += w
      while (nb >= 8) {
        out.write(((acc >>> (nb - 8)) & 0xff).toInt)
        nb -= 8
      }
    }
    var p = 0
    var nLit = 0
    var nMatch = 0
    var matchChars = 0
    while (p < data.length) {
      val (l, d) = bestMatch(data, p)
      if (l >= MinLen) {
        put(1, 1); put(d - 1, 6); put(l - MinLen, 3)
        nMatch += 1; matchChars += l; p += l
      } else {
        put(0, 1); put(data(p) & 0xff, 8)
        nLit += 1; p += 1
      }
    }
    if (nb > 0) { // zero-pad the final partial byte
      out.write(((acc << (8 - nb)) & 0xff).toInt)
    }
    (out.toByteArray, Stats(nLit, nMatch, matchChars))
  }

  /** General decoder: reads tokens until the header length is produced;
    * overlapping copies run byte-at-a-time per the LZ77 rule. Every
    * read is range-checked — arbitrary input either decodes or throws
    * IllegalArgumentException.
    */
  def decode(enc: Array[Byte]): Array[Byte] = {
    require(enc.length >= 4, "lzss: truncated header")
    val n = ((enc(0) & 0xff) << 24) | ((enc(1) & 0xff) << 16) |
      ((enc(2) & 0xff) << 8) | (enc(3) & 0xff)
    require(n >= 0, "lzss: negative length")
    require(n.toLong <= (enc.length.toLong - 4) * 8, // >= 1 bit per byte
      "lzss: declared length exceeds any possible token stream")
    val out = new Array[Byte](n)
    var bitPos = 32L
    val bitEnd = enc.length.toLong * 8
    def bits(w: Int): Int = {
      require(bitPos + w <= bitEnd, "lzss: truncated token stream")
      var v = 0
      var i = 0
      while (i < w) {
        val b = (enc((bitPos >> 3).toInt) >>> (7 - (bitPos & 7)).toInt) & 1
        v = (v << 1) | b
        bitPos += 1
        i += 1
      }
      v
    }
    var p = 0
    while (p < n) {
      if (bits(1) == 1) {
        val d = bits(6) + 1
        val l = bits(3) + MinLen
        require(d <= p, s"lzss: back-reference $d before start at $p")
        require(p + l <= n, s"lzss: match overruns declared length")
        var i = 0
        while (i < l) { out(p + i) = out(p - d + i); i += 1 }
        p += l
      } else {
        out(p) = bits(8).toByte
        p += 1
      }
    }
    out
  }
}
