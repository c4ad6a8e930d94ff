package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}

/** Laws for the baseline JPEG codec, targeted at what the gate leans on
  * (block-constant EXACT round trip — the oracle re-derives decoded
  * bytes, so this law carries the gate) and at the decode paths the
  * exact gate data cannot reach (AC run/size symbols, ZRL, bounded lossy
  * error on arbitrary content, DC prediction chains across many blocks).
  */
object JpegLaws extends Properties("JpegLaws") {

  private def blockConstant(w: Int, h: Int, vals: Array[Byte]): Array[Byte] = {
    val wB = (w + 7) / 8
    Array.tabulate[Byte](w * h) { j =>
      val x = j % w; val y = j / w
      vals(((y / 8) * wB + (x / 8)) % vals.length)
    }
  }

  // THE gate contract: with the flat quant table, a block-constant image
  // round-trips bit-exactly — a constant block's DCT is a lone DC
  // coefficient and its IDCT reconstructs the constant exactly.
  property("block-constant images round-trip EXACTLY (any dims)") =
    Prop.forAll(for {
      w <- Gen.choose(1, 40); h <- Gen.choose(1, 40)
      n <- Gen.choose(1, 30)
      vals <- Gen.containerOfN[Array, Byte](n,
        Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (w, h, vals)) { case (w, h, vals) =>
      val pix = blockConstant(w, h, vals)
      val (w2, h2, out) = Jpeg.decode(Jpeg.encode(w, h, pix))
      Prop(w2 == w && h2 == h && java.util.Arrays.equals(out, pix)) :|
        s"exact round-trip failed at ${w}x$h"
    }

  // long DC prediction chains (diffs both signs, categories up to 11)
  property("many-block gradients keep the DC chain exact") =
    Prop.forAll(Gen.choose(1, 6), Gen.choose(1, 6)) { (wb, hb) =>
      val vals = Array.tabulate[Byte](wb * hb)(i =>
        (if (i % 2 == 0) (i * 41) % 256 else 255 - (i * 97) % 256).toByte)
      val pix = blockConstant(wb * 8, hb * 8, vals)
      val (_, _, out) = Jpeg.decode(Jpeg.encode(wb * 8, hb * 8, pix))
      Prop(java.util.Arrays.equals(out, pix)) :| "DC chain drifted"
    }

  // arbitrary content is LOSSY but bounded: flat quant steps lose at most
  // 0.5 per coefficient; the worst-case IDCT amplification over 64
  // half-step errors stays low single digits per pixel
  property("arbitrary content round-trips within a small error bound") =
    Prop.forAll(for {
      w <- Gen.choose(1, 24); h <- Gen.choose(1, 24)
      pix <- Gen.containerOfN[Array, Byte](w * h,
        Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (w, h, pix)) { case (w, h, pix) =>
      val (w2, h2, out) = Jpeg.decode(Jpeg.encode(w, h, pix))
      val maxErr = (0 until w * h).map(i =>
        math.abs((out(i) & 0xff) - (pix(i) & 0xff))).max
      Prop(w2 == w && h2 == h && maxErr <= 4) :| s"maxErr=$maxErr"
    }

  // the arbitrary-content stream exercises real AC coding: assert the
  // payload actually carries AC symbols (it is much larger than the
  // DC-only stream of the equivalent constant image)
  property("random content emits a genuinely AC-coded stream") =
    Prop.forAll(Gen.containerOfN[Array, Byte](16 * 16,
      Gen.choose(Byte.MinValue, Byte.MaxValue))) { pix =>
      val rich = Jpeg.encode(16, 16, pix).length
      val flat = Jpeg.encode(16, 16, Array.fill[Byte](16 * 16)(0)).length
      Prop(rich > flat + 16) :| s"rich=$rich flat=$flat"
    }

  // restart markers: DRI + RSTn every N MCUs, DC prediction resetting at
  // each — the stream shape every real camera/encoder emits for error
  // resilience; alignment padding, marker cycling and resync all run
  property("restart intervals round-trip exactly (any N vs block count)") =
    Prop.forAll(for {
      wb <- Gen.choose(1, 5); hb <- Gen.choose(1, 5)
      ri <- Gen.choose(1, 8)
      vals <- Gen.containerOfN[Array, Byte](wb * hb,
        Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (wb, hb, ri, vals)) { case (wb, hb, ri, vals) =>
      val pix = blockConstant(wb * 8, hb * 8, vals)
      val enc = Jpeg.encode(wb * 8, hb * 8, pix, restartInterval = ri)
      val (w2, h2, out) = Jpeg.decode(enc)
      Prop(w2 == wb * 8 && h2 == hb * 8 &&
        java.util.Arrays.equals(out, pix)) :|
        s"restart round-trip failed (${wb}x$hb blocks, interval $ri)"
    }

  property("restart streams with arbitrary content stay bounded-lossy") =
    Prop.forAll(for {
      w <- Gen.choose(9, 24); h <- Gen.choose(9, 24)
      ri <- Gen.choose(1, 4)
      pix <- Gen.containerOfN[Array, Byte](w * h,
        Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (w, h, ri, pix)) { case (w, h, ri, pix) =>
      val (_, _, out) = Jpeg.decode(Jpeg.encode(w, h, pix, ri))
      val maxErr = (0 until w * h).map(i =>
        math.abs((out(i) & 0xff) - (pix(i) & 0xff))).max
      Prop(maxErr <= 4) :| s"maxErr=$maxErr"
    }

  // == 4:2:0 YCbCr color ==

  private def colorPlanes(w: Int, h: Int, yv: Array[Byte], cv: Array[Byte],
      rv: Array[Byte]): (Array[Byte], Array[Byte], Array[Byte]) = {
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    (blockConstant(w, h, yv),
      { val p = blockConstant(cw, ch, cv); p },
      { val p = blockConstant(cw, ch, rv); p })
  }

  property("4:2:0 block-constant planes round-trip EXACTLY (any dims)") =
    Prop.forAll(for {
      w <- Gen.choose(1, 40); h <- Gen.choose(1, 40)
      ri <- Gen.oneOf(0, 0, 1, 3)
      yv <- Gen.containerOfN[Array, Byte](9, Gen.choose(Byte.MinValue, Byte.MaxValue))
      cv <- Gen.containerOfN[Array, Byte](5, Gen.choose(Byte.MinValue, Byte.MaxValue))
      rv <- Gen.containerOfN[Array, Byte](7, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (w, h, ri, yv, cv, rv)) { case (w, h, ri, yv, cv, rv) =>
      val (yP, cbP, crP) = colorPlanes(w, h, yv, cv, rv)
      val enc = Jpeg.encodeColor(w, h, yP, cbP, crP, restartInterval = ri)
      val (w2, h2, y2, cb2, cr2) = Jpeg.decodeColor(enc)
      Prop(w2 == w && h2 == h &&
        java.util.Arrays.equals(y2, yP) &&
        java.util.Arrays.equals(cb2, cbP) &&
        java.util.Arrays.equals(cr2, crP)) :|
        s"color round-trip failed at ${w}x$h ri=$ri"
    }

  property("4:2:0 arbitrary planes stay bounded-lossy") =
    Prop.forAll(for {
      w <- Gen.choose(1, 24); h <- Gen.choose(1, 24)
      yP <- Gen.containerOfN[Array, Byte](w * h,
        Gen.choose(Byte.MinValue, Byte.MaxValue))
      c <- Gen.containerOfN[Array, Byte](((w + 1) / 2) * ((h + 1) / 2),
        Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (w, h, yP, c)) { case (w, h, yP, c) =>
      val (_, _, y2, cb2, _) = Jpeg.decodeColor(Jpeg.encodeColor(w, h, yP, c, c))
      def err(a: Array[Byte], b: Array[Byte]) =
        a.indices.map(i => math.abs((a(i) & 0xff) - (b(i) & 0xff))).max
      Prop(err(y2, yP) <= 4 && err(cb2, c) <= 4) :| "color error bound"
    }

  property("grayscale decode rejects color streams and vice versa") =
    Prop.forAll(Gen.choose(1, 16), Gen.choose(1, 16)) { (w, h) =>
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      val color = Jpeg.encodeColor(w, h, Array.fill[Byte](w * h)(7),
        Array.fill[Byte](cw * ch)(8), Array.fill[Byte](cw * ch)(9))
      val gray = Jpeg.encode(w, h, Array.fill[Byte](w * h)(7))
      def rejected(f: => Any) =
        try { f; false } catch { case _: IllegalArgumentException => true }
      Prop(rejected(Jpeg.decode(color)) && rejected(Jpeg.decodeColor(gray)))
    }

  property("header fields are byte-valid (SOI/SOF0 dims/EOI)") =
    Prop.forAll(Gen.choose(1, 40), Gen.choose(1, 40)) { (w, h) =>
      val b = Jpeg.encode(w, h, Array.fill[Byte](w * h)(42))
      def u16(off: Int) = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
      // SOI, then DQT(2+67), then SOF0 at a fixed offset for our writer
      val sof = 2 + 2 + 67
      Prop((b(0) & 0xff) == 0xFF && (b(1) & 0xff) == 0xD8 &&
        (b(sof) & 0xff) == 0xFF && (b(sof + 1) & 0xff) == 0xC0 &&
        u16(sof + 5) == h && u16(sof + 7) == w &&
        (b(b.length - 2) & 0xff) == 0xFF && (b(b.length - 1) & 0xff) == 0xD9)
    }

  property("progressive / multi-component / truncated streams are rejected") =
    Prop.forAll(Gen.choose(1, 16), Gen.choose(1, 16)) { (w, h) =>
      val good = Jpeg.encode(w, h, Array.fill[Byte](w * h)(7))
      // flip SOF0 -> SOF2 (progressive)
      val prog = good.clone()
      val sof = 2 + 2 + 67
      prog(sof + 1) = 0xC2.toByte
      val progRejected =
        try { Jpeg.decode(prog); false }
        catch { case _: IllegalArgumentException => true }
      // cut the stream mid-scan
      val cut = java.util.Arrays.copyOf(good, good.length - 3)
      val cutRejected =
        try { Jpeg.decode(cut); false }
        catch { case _: IllegalArgumentException => true }
      Prop(progRejected && cutRejected) :| "bad stream not rejected"
    }
}
