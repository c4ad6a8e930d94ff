package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}

/** Round-trip laws for the GIF/LZW codec, targeted at the coder's hard
  * edges: the 9→10-bit width boundary (the decoder grows one code
  * earlier than the encoder — the classic off-by-one), the 4095-entry
  * table reset, and the KwKwK first-occurrence case.
  */
object GifLaws extends Properties("GifLaws") {

  private def roundTrip(w: Int, h: Int, idx: Array[Byte]): Prop = {
    val (w2, h2, out) = Gif.decode(Gif.encode(w, h, idx))
    Prop(w2 == w && h2 == h && java.util.Arrays.equals(out, idx)) :|
      s"round-trip mismatch at ${w}x$h"
  }

  // noShrink: shrinking the (w, h, idx) tuple breaks the w*h ==
  // idx.length invariant (a shrunk 0x0 crashes before the property),
  // masking the real counterexample
  property("small images round-trip exactly") = Prop.forAllNoShrink(
    for {
      w <- Gen.choose(1, 16); h <- Gen.choose(1, 16)
      idx <- Gen.containerOfN[Array, Byte](w * h,
        Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (w, h, idx)) { case (w, h, idx) => roundTrip(w, h, idx) }

  // PINNED regression (found by seed pgTQQnaS…, reduced to Random(3)):
  // a 16x16 image whose dictionary lands exactly on the 2^w − 1
  // boundary at the FINAL data code — the decoder grows its width
  // before reading EOI, so the encoder must emit EOI at the grown
  // width or the stream truncates.
  property("end-of-stream width boundary round-trips (pinned)") = {
    val rnd = new scala.util.Random(3)
    val idx = Array.fill[Byte](256)(rnd.nextInt(256).toByte)
    roundTrip(16, 16, idx)
  }

  // and the same edge swept densely: many random small images, where
  // the final-code boundary is reachable (256-entry alphabet, ~2^9
  // dictionary entries at end of a 256-pixel image)
  property("dense 16x16 sweep crosses the final-code boundary") =
    Prop.forAllNoShrink(Gen.choose(0, 100000)) { seed =>
      val rnd = new scala.util.Random(seed)
      val idx = Array.fill[Byte](256)(rnd.nextInt(256).toByte)
      roundTrip(16, 16, idx)
    }

  // 64x64 random bytes build ~4k dictionary entries: the code stream
  // crosses every width boundary (9→10→11→12) AND the full-table Clear
  // reset in a single image
  property("width growth and table-reset boundaries round-trip") =
    Prop.forAll(Gen.containerOfN[Array, Byte](64 * 64,
      Gen.choose(Byte.MinValue, Byte.MaxValue))) { idx =>
      roundTrip(64, 64, idx)
    }

  // constant runs are wall-to-wall KwKwK (code == nextCode on nearly
  // every step)
  property("constant runs (KwKwK-heavy) round-trip") = Prop.forAll(
    Gen.choose(Byte.MinValue, Byte.MaxValue), Gen.choose(1, 300)) { (b, n) =>
    roundTrip(n, 1, Array.fill[Byte](n)(b))
  }

  // short repeating periods compress hard and mix KwKwK with deep chains
  property("periodic tilings round-trip") = Prop.forAll(
    Gen.choose(1, 7), Gen.choose(10, 40), Gen.choose(10, 40)) { (per, w, h) =>
    val idx = Array.tabulate[Byte](w * h)(i => (i % per).toByte)
    roundTrip(w, h, idx)
  }

  property("header fields are byte-valid") = Prop.forAll(
    Gen.choose(1, 20), Gen.choose(1, 20)) { (w, h) =>
    val b = Gif.encode(w, h, Array.fill[Byte](w * h)(7))
    Prop(new String(b, 0, 6, "US-ASCII") == "GIF89a" &&
      ((b(6) & 0xff) | ((b(7) & 0xff) << 8)) == w &&
      ((b(8) & 0xff) | ((b(9) & 0xff) << 8)) == h &&
      (b(b.length - 1) & 0xff) == 0x3b)
  }

  property("extension blocks are skipped") = Prop.forAll(
    Gen.choose(1, 12), Gen.choose(1, 12)) { (w, h) =>
    val idx = Array.tabulate[Byte](w * h)(i => (i * 31).toByte)
    val good = Gif.encode(w, h, idx)
    // splice a graphic-control extension right after the color table
    // (offset 13 + 768), before the image descriptor
    val at = 13 + 768
    val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = good.take(at) ++ ext ++ good.drop(at)
    val (w2, h2, out) = Gif.decode(spliced)
    Prop(w2 == w && h2 == h && java.util.Arrays.equals(out, idx))
  }
}
