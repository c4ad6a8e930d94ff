package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The DCT pHash's perceptual contract on deterministic rasters:
  * identical images collide exactly, a one-byte perturbation moves a
  * few bits at most, structurally different images sit far apart, and
  * the hash is invariant under uniform luminance scaling (the property
  * that lets block SUMS stand in for means with no division).
  */
class PhashSpec extends AnyFunSuite with Matchers {

  private def raster(f: Int => Int): Array[Byte] =
    Array.tabulate[Byte](16 * 16 * 3)(j => (f(j) & 0xff).toByte)

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("identical rasters collide; encode/decode round trip is invisible") {
    val pix = raster(j => (j * 37 + 11) % 251)
    val direct = Phash.hash64(16, 16, pix)
    val (w, h, dec) = Bmp.decode(Bmp.encode(16, 16, pix))
    Phash.hash64(w, h, dec) shouldBe direct
  }

  test("one perturbed byte moves at most a few bits") {
    (0 until 20).foreach { seed =>
      val pix = raster(j => (j * 31 + seed * 97) % 241)
      val h0 = Phash.hash64(16, 16, pix)
      val p2 = pix.clone()
      p2(seed * 7 % p2.length) =
        ((p2(seed * 7 % p2.length) + 9) & 0xff).toByte
      hamming(h0, Phash.hash64(16, 16, p2)) should be <= 8
    }
  }

  test("structurally different rasters sit far apart") {
    // deterministic LCG textures at BLOCK granularity (a 2x2-constant
    // pattern survives the pooling stage; pure gradients/checkerboards
    // are adversarial here — their AC spectra are sign-degenerate and
    // everything hashes to 0)
    def texture(seed: Int): Array[Byte] = raster { j =>
      val p = j / 3
      val bx = (p % 16) / 2
      val by = (p / 16) / 2
      ((bx * 31 + by * 17 + seed * 53) * 97 + seed * 29) % 256
    }
    val pairs = for (a <- 0 until 5; b <- (a + 1) until 5) yield (a, b)
    pairs.foreach { case (a, b) =>
      hamming(Phash.hash64(16, 16, texture(a)),
        Phash.hash64(16, 16, texture(b))) should be >= 10
    }
  }

  test("invariant under uniform positive luminance scaling") {
    val pix = raster(j => (j * 13 + 5) % 80)
    val tripled = raster(j => ((j * 13 + 5) % 80) * 3)
    Phash.hash64(16, 16, tripled) shouldBe Phash.hash64(16, 16, pix)
  }

  test("audio fingerprint: collision, perturbation locality, separation") {
    def clip(f: Int => Int): Array[Short] =
      Array.tabulate[Short](512)(i => ((f(i) % 65536) - 32768).toShort)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // identical clips collide; WAV round trip is invisible
    val a = clip(i => (i * 997 + 131) & 0xffff)
    val direct = Phash.audioHash56(a)
    val (_, dec) = Wav.decode(Wav.encode(8000, a))
    Phash.audioHash56(dec) shouldBe direct
    // a single perturbed sample moves a few bits at most
    (0 until 12).foreach { seed =>
      val base = clip(i => ((i * 31 + seed * 97) * 131) & 0xffff)
      val h0 = Phash.audioHash56(base)
      val p = base.clone()
      p(seed * 41 % 512) = (p(seed * 41 % 512) + 900).toShort
      ham(h0, Phash.audioHash56(p)) should be <= 7
    }
    // structurally different textures sit far apart
    def texture(seed: Int): Array[Short] =
      clip(i => ((i / 8) * 31 + (i % 8) * (17 + seed) + seed * 5081)
        * 127 & 0xffff)
    val pairs = for (x <- 0 until 4; y <- (x + 1) until 4) yield (x, y)
    pairs.foreach { case (x, y) =>
      ham(Phash.audioHash56(texture(x)),
        Phash.audioHash56(texture(y))) should be >= 8
    }
    // non-512 clips refuse
    intercept[IllegalArgumentException] {
      Phash.audioHash56(new Array[Short](256))
    }
  }

  test("rejects non-16x16 rasters; table matches the spliced SQL") {
    intercept[IllegalArgumentException] {
      Phash.hash64(8, 8, new Array[Byte](8 * 8 * 3))
    }
    // the SQL splice is generated from the SAME table — one literal per
    // (u, x) cell, spot-checked against the frozen values
    Phash.cosSqlValues should include("(0, 0, 16384)")
    Phash.cosSqlValues should include("(7, 7, -3196)")
    Phash.cosSqlValues.split(", \\(").length shouldBe 64
  }
}
