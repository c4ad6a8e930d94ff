package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck laws for the real BMP codec. Pure JVM — no Spark session:
  * encode/decode/resizeNearest are driver-side kernels; the distributed
  * wrapper is exercised in MultimodalSpec and the llm_resize gate.
  */
object BmpLaws extends Properties("BmpLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val dimGen = Gen.choose(1, 23)

  private def pixelsGen(w: Int, h: Int): Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](w * h * 3, Gen.choose(Byte.MinValue, Byte.MaxValue))

  // Round-trip identity across every stride class (w mod 4 covers padded
  // and unpadded rows) — decode must exactly invert encode.
  property("decode-encode round trip") = Prop.forAll(dimGen, dimGen) { (w, h) =>
    Prop.forAll(pixelsGen(w, h)) { pix =>
      val (w2, h2, pix2) = Bmp.decode(Bmp.encode(w, h, pix))
      w2 == w && h2 == h && java.util.Arrays.equals(pix2, pix)
    }
  }

  // The container is byte-valid: magic, declared file size, pixel-array
  // offset, bpp, compression, and the padded row stride all check out.
  property("encoded header fields") = Prop.forAll(dimGen, dimGen) { (w, h) =>
    Prop.forAll(pixelsGen(w, h)) { pix =>
      val b = Bmp.encode(w, h, pix)
      def u16(off: Int) = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      def i32(off: Int) = u16(off) | (u16(off + 2) << 16)
      val stride = (w * 3 + 3) / 4 * 4
      b(0) == 'B'.toByte && b(1) == 'M'.toByte &&
        i32(2) == b.length && i32(10) == Bmp.HeaderBytes &&
        i32(18) == w && i32(22) == h && u16(28) == 24 && i32(30) == 0 &&
        b.length == Bmp.HeaderBytes + stride * h
    }
  }

  // Identity resize is a no-op.
  property("resize identity") = Prop.forAll(dimGen, dimGen) { (w, h) =>
    Prop.forAll(pixelsGen(w, h)) { pix =>
      java.util.Arrays.equals(Bmp.resizeNearest(w, h, pix, w, h), pix)
    }
  }

  // Every output byte equals the source byte at the floor-mapped index —
  // the exact contract the DuckDB oracle re-derives per byte.
  property("nearest-neighbor index map") =
    Prop.forAll(dimGen, dimGen, dimGen, dimGen) { (w, h, tw, th) =>
      Prop.forAll(pixelsGen(w, h)) { pix =>
        val out = Bmp.resizeNearest(w, h, pix, tw, th)
        out.length == tw * th * 3 &&
          (0 until tw * th * 3).forall { i =>
            val p = i / 3; val c = i % 3
            val sx = (p % tw) * w / tw; val sy = (p / tw) * h / th
            out(i) == pix((sy * w + sx) * 3 + c)
          }
      }
    }

  // Integer upscale replicates each source pixel into a kxk block.
  property("2x upscale replicates pixels") = Prop.forAll(dimGen, dimGen) { (w, h) =>
    Prop.forAll(pixelsGen(w, h)) { pix =>
      val out = Bmp.resizeNearest(w, h, pix, 2 * w, 2 * h)
      (0 until h).forall { y =>
        (0 until w).forall { x =>
          (0 until 3).forall { c =>
            val v = pix((y * w + x) * 3 + c)
            out(((2 * y) * 2 * w + 2 * x) * 3 + c) == v &&
              out(((2 * y + 1) * 2 * w + 2 * x + 1) * 3 + c) == v
          }
        }
      }
    }
  }

  // Malformed payloads are rejected, never mis-parsed: wrong magic,
  // truncated pixel array, unsupported bpp.
  property("malformed rejection") = Prop.forAll(pixelsGen(4, 4)) { pix =>
    val good = Bmp.encode(4, 4, pix)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val truncated = java.util.Arrays.copyOf(good, good.length - 1)
    val badBpp = good.clone(); badBpp(28) = 8.toByte
    Seq(badMagic, truncated, badBpp).forall { b =>
      scala.util.Try(Bmp.decode(b)).isFailure
    }
  }
}
