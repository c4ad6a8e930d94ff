package graft.multimodal

/** Perceptual image hash (pHash, DCT flavor) in EXACT integer
  * arithmetic, so the DuckDB oracle reproduces every bit:
  *
  *  1. luminance = b + g + r per pixel (integer, no /3 — the hash is
  *     invariant under uniform positive scaling),
  *  2. a 16×16 luminance raster average-pools to 8×8 as 2×2 BLOCK SUMS
  *     (again scale-invariant, no division),
  *  3. 2-D DCT-II with the FROZEN integer cosine table below
  *     (`round(cos((2x+1)uπ/16) · 2^14)` — 64 literals spliced into the
  *     oracle SQL verbatim, no runtime trig in either engine),
  *  4. the 63 AC coefficients compare against their median (the 32nd
  *     order statistic of 63 — exact in both engines),
  *  5. bit j−1 (j = u·8+v ∈ 1..63) is set iff coef > median; shifts cap
  *     at 62, inside BIGINT in both engines (the r15 `1<<63` trap).
  *
  * Near-duplicate images (one perturbed pixel, a re-encode, small
  * noise) land within a few bits of Hamming distance; unrelated images
  * sit near 31.5 — the standard image-dedup primitive for a training
  * pipeline.
  */
object Phash {

  /** round(cos((2x+1)·u·π/16) · 16384) — indexed [u][x]. */
  val Cos: Array[Array[Int]] = Array(
    Array(16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384),
    Array(16069, 13623, 9102, 3196, -3196, -9102, -13623, -16069),
    Array(15137, 6270, -6270, -15137, -15137, -6270, 6270, 15137),
    Array(13623, -3196, -16069, -9102, 9102, 16069, 3196, -13623),
    Array(11585, -11585, -11585, 11585, 11585, -11585, -11585, 11585),
    Array(9102, -16069, 3196, 13623, -13623, -3196, 16069, -9102),
    Array(6270, -15137, 15137, -6270, -6270, 15137, -15137, 6270),
    Array(3196, -9102, 13623, -16069, 16069, -13623, 9102, -3196))

  /** The same 64 entries as SQL `(u, x, c)` VALUES rows, for splicing
    * into the oracle (single source of truth — built from [[Cos]]).
    */
  def cosSqlValues: String =
    (for (u <- 0 until 8; x <- 0 until 8)
      yield s"($u, $x, ${Cos(u)(x)})").mkString(", ")

  /** 56-bit audio fingerprint of a 512-sample PCM clip (the layout
    * [[Wav.decode]] returns): 8 windows of 64 samples; per window, 8
    * BAND ENERGIES (sums of |s| over 8-sample sub-bands — integer, no
    * FFT needed for a fingerprint), a 1-D DCT-II over the band vector
    * with the same frozen [[Cos]] table, and a 7-bit median-threshold
    * code from the AC coefficients (median = the 4th order statistic
    * of 7 — exact in both engines). Window w's code packs at bit 7·w.
    * Magnitudes: band ≤ 8·32768, coefs ≤ 2^18·2^14·8 = 2^35 — exact in
    * Long, and inside BIGINT for the oracle.
    */
  def audioHash56(samples: Array[Short]): Long = {
    require(samples.length == 512,
      s"audio phash expects 512 samples, got ${samples.length}")
    var hash = 0L
    var w = 0
    while (w < 8) {
      val e = new Array[Long](8)
      var j = 0
      while (j < 64) {
        val v = samples(w * 64 + j).toInt
        e(j / 8) += (if (v < 0) -v else v).toLong
        j += 1
      }
      val f = new Array[Long](8)
      var u = 0
      while (u < 8) {
        var acc = 0L
        var b = 0
        while (b < 8) { acc += e(b) * Cos(u)(b); b += 1 }
        f(u) = acc
        u += 1
      }
      val ac = java.util.Arrays.copyOfRange(f, 1, 8)
      java.util.Arrays.sort(ac)
      val med = ac(3)
      var bits = 0L
      u = 1
      while (u < 8) {
        if (f(u) > med) bits |= 1L << (u - 1)
        u += 1
      }
      hash |= bits << (7 * w)
      w += 1
    }
    hash
  }

  /** 63-bit pHash of a 16×16 packed-BGR raster (the triple layout
    * [[Bmp.decode]] returns). Magnitudes: block sums ≤ 4·765, coefs ≤
    * 3060·2^28·64 ≈ 5.3e16 — exact in Long.
    */
  def hash64(w: Int, h: Int, pix: Array[Byte]): Long = {
    require(w == 16 && h == 16,
      s"phash expects a 16x16 raster, got ${w}x$h")
    // 2x2 block sums of per-pixel luminance (b + g + r)
    val s = Array.ofDim[Long](8, 8)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val o = (y * 16 + x) * 3
        val lum = (pix(o) & 0xff) + (pix(o + 1) & 0xff) + (pix(o + 2) & 0xff)
        s(y / 2)(x / 2) += lum
        x += 1
      }
      y += 1
    }
    // 2-D DCT-II: F(u,v) = sum_by sum_bx S[by][bx] * C[u][by] * C[v][bx]
    val coef = Array.ofDim[Long](8, 8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var by = 0
        while (by < 8) {
          var bx = 0
          while (bx < 8) {
            acc += s(by)(bx) * Cos(u)(by) * Cos(v)(bx)
            bx += 1
          }
          by += 1
        }
        coef(u)(v) = acc
        v += 1
      }
      u += 1
    }
    // median of the 63 AC coefficients = the 32nd smallest (exact)
    val ac = new Array[Long](63)
    var j = 1
    while (j < 64) { ac(j - 1) = coef(j / 8)(j % 8); j += 1 }
    val sorted = ac.sorted
    val med = sorted(31)
    var hash = 0L
    j = 1
    while (j < 64) {
      if (coef(j / 8)(j % 8) > med) hash |= 1L << (j - 1)
      j += 1
    }
    hash
  }
}
