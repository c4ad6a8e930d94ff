package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck laws for the real AVI codec. Pure JVM — no Spark session:
  * encode/decode are driver-side kernels; the distributed sampler is
  * exercised in MultimodalSpec and the llm_video_frames gate.
  */
object AviLaws extends Properties("AviLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val dimGen = Gen.choose(1, 12)

  private def framesGen(w: Int, h: Int): Gen[List[Array[Byte]]] = for {
    n <- Gen.choose(0, 6)
    fs <- Gen.listOfN(n, Gen.containerOfN[Array, Byte](w * h * 3,
      Gen.choose(Byte.MinValue, Byte.MaxValue)))
  } yield fs

  // Round-trip identity across stride classes and frame counts.
  property("decode-encode round trip") = Prop.forAll(dimGen, dimGen) { (w, h) =>
    Prop.forAll(framesGen(w, h)) { fs =>
      val (w2, h2, fs2) = Avi.decode(Avi.encode(w, h, 25, fs))
      w2 == w && h2 == h && fs2.length == fs.length &&
        fs2.zip(fs).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    }
  }

  // The container is byte-valid: magics, RIFF size, avih frame count and
  // dims, strf BITMAPINFOHEADER fields.
  property("encoded header fields") = Prop.forAll(dimGen, dimGen) { (w, h) =>
    Prop.forAll(framesGen(w, h)) { fs =>
      val b = Avi.encode(w, h, 25, fs)
      def u16(off: Int) = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      def i32(off: Int) = u16(off) | (u16(off + 2) << 16)
      def tag(off: Int) = new String(b, off, 4, "US-ASCII")
      tag(0) == "RIFF" && tag(8) == "AVI " && i32(4) == b.length - 8 &&
        tag(12) == "LIST" && tag(20) == "hdrl" && tag(24) == "avih" &&
        i32(32) == 40000 && // 25 fps -> 40000 us per frame
        i32(48) == fs.length && i32(64) == w && i32(68) == h
    }
  }

  // ---- Motion JPEG laws ----

  private def grayFramesGen(w: Int, h: Int): Gen[List[Array[Byte]]] = for {
    n <- Gen.choose(1, 4)
    fs <- Gen.listOfN(n, Gen.containerOfN[Array, Byte](w * h,
      Gen.choose(Byte.MinValue, Byte.MaxValue)))
  } yield fs

  // Container transparency: the MJPEG wrap adds nothing lossy — decoding
  // the container equals decoding each JPEG stream directly, for
  // arbitrary (non-block-constant, genuinely lossy) frames.
  property("mjpeg container is transparent over Jpeg.decode") =
    Prop.forAll(Gen.choose(8, 24), Gen.choose(8, 24)) { (w, h) =>
      Prop.forAll(grayFramesGen(w, h)) { fs =>
        val jpegs = fs.map(p => Jpeg.encode(w, h, p))
        val (w2, h2, out) = Avi.decodeMjpeg(Avi.encodeMjpeg(w, h, 5, jpegs))
        val direct = jpegs.map { j =>
          val (_, _, pix) = Jpeg.decode(j); pix
        }
        w2 == w && h2 == h && out.length == fs.length &&
          out.zip(direct).forall { case (a, b) =>
            java.util.Arrays.equals(a, b)
          }
      }
    }

  // Odd-sized JPEG streams force the RIFF even-padding rule through the
  // '00dc' path; frame dims that disagree with strf must be rejected.
  property("mjpeg rejects frames that disagree with the stream header") =
    Prop.forAll(Gen.choose(8, 16)) { w =>
      val good = Jpeg.encode(w, w, Array.fill[Byte](w * w)(7))
      val bad = Jpeg.encode(w + 8, w, Array.fill[Byte]((w + 8) * w)(7))
      val container = Avi.encodeMjpeg(w, w, 5, Seq(good))
      // splice the wrong-dims jpeg in place of the good one by
      // re-encoding a container that LIES about its dims
      val lying = Avi.encodeMjpeg(w, w, 5, Seq(bad))
      val rejected =
        try { Avi.decodeMjpeg(lying); false }
        catch { case _: IllegalArgumentException => true }
      val goodDecodes = Avi.decodeMjpeg(container)._3.length == 1
      rejected && goodDecodes
    }

  // Real RIFF walk: a JUNK chunk (odd size, padded) spliced between the
  // hdrl and movi lists must be skipped, not mis-parsed.
  property("chunk walk skips junk chunks") = Prop.forAll(dimGen, dimGen) { (w, h) =>
    Prop.forAll(framesGen(w, h)) { fs =>
      val base = Avi.encode(w, h, 25, fs)
      // hdrl LIST spans [12, 12 + 8 + hdrlSize); compute from its size field
      def i32(off: Int) = (base(off) & 0xff) | ((base(off + 1) & 0xff) << 8) |
        ((base(off + 2) & 0xff) << 16) | ((base(off + 3) & 0xff) << 24)
      val splice = 12 + 8 + i32(16)
      val junk = Array[Byte]('J', 'U', 'N', 'K', 5, 0, 0, 0,
        1, 2, 3, 4, 5, 0) // 5 data bytes + 1 RIFF pad
      val out = base.take(splice) ++ junk ++ base.drop(splice)
      val total = out.length - 8
      out(4) = total.toByte; out(5) = (total >> 8).toByte
      out(6) = (total >> 16).toByte; out(7) = (total >> 24).toByte
      val (w2, h2, fs2) = Avi.decode(out)
      w2 == w && h2 == h && fs2.length == fs.length &&
        fs2.zip(fs).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    }
  }

  // ---- minimal RIFF assembler for container variants the encoder never
  // emits (interleaved audio streams, 'rec ' grouping lists) ----
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)
  private def chunk(id: String, data: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
      (if ((data.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray)
  private def list(typ: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", typ.getBytes("US-ASCII") ++ body)
  private def strh(fcc: String): Array[Byte] =
    chunk("strh", fcc.getBytes("US-ASCII") ++ new Array[Byte](52))
  private def strfVids(w: Int, h: Int): Array[Byte] =
    chunk("strf", le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(((w * 3 + 3) / 4 * 4) * h) ++ le32(2835) ++
      le32(2835) ++ le32(0) ++ le32(0))
  private def strfAuds: Array[Byte] = // 16-byte WAVEFORMATEX (PCM mono)
    chunk("strf", le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
      le16(2) ++ le16(16))
  private def dib(w: Int, h: Int, pix: Array[Byte]): Array[Byte] = {
    val rb = (w * 3 + 3) / 4 * 4
    val d = new Array[Byte](rb * h)
    for (y <- 0 until h) System.arraycopy(pix, y * w * 3, d, (h - 1 - y) * rb, w * 3)
    d
  }
  private def avi(hdrl: Array[Byte], movi: Array[Byte]): Array[Byte] =
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++
      list("hdrl", hdrl) ++ list("movi", movi))

  // an interleaved audio stream must be skipped by strh TYPE: its
  // 16-byte WAVEFORMATEX strf would fail the BITMAPINFOHEADER size check
  // if mis-routed (the audio strl deliberately comes FIRST)
  property("audio strl is skipped by stream type") =
    Prop.forAll(dimGen, dimGen) { (w, h) =>
      Prop.forAll(framesGen(w, h)) { fs =>
        val bytes = avi(
          list("strl", strh("auds") ++ strfAuds) ++
            list("strl", strh("vids") ++ strfVids(w, h)),
          fs.flatMap(f => chunk("00db", dib(w, h, f))).toArray)
        val (w2, h2, got) = Avi.decode(bytes)
        w2 == w && h2 == h && got.length == fs.length &&
          got.zip(fs).forall { case (a, b) => java.util.Arrays.equals(a, b) }
      }
    }

  property("frames inside 'rec ' grouping lists are found") =
    Prop.forAll(dimGen, dimGen) { (w, h) =>
      Prop.forAll(framesGen(w, h)) { fs =>
        val bytes = avi(
          list("strl", strh("vids") ++ strfVids(w, h)),
          list("rec ", fs.flatMap(f => chunk("00db", dib(w, h, f))).toArray))
        val (w2, h2, got) = Avi.decode(bytes)
        w2 == w && h2 == h && got.length == fs.length &&
          got.zip(fs).forall { case (a, b) => java.util.Arrays.equals(a, b) }
      }
    }

  property("a second video stream is rejected, not silently adopted") =
    Prop.forAll(dimGen, dimGen) { (w, h) =>
      val bytes = avi(
        list("strl", strh("vids") ++ strfVids(w, h)) ++
          list("strl", strh("vids") ++ strfVids(w + 1, h + 1)),
        Array.emptyByteArray)
      scala.util.Try(Avi.decode(bytes)).failed.toOption
        .exists(_.isInstanceOf[IllegalArgumentException])
    }

  property("malformed rejection") = Prop.forAll(dimGen, dimGen) { (w, h) =>
    Prop.forAll(framesGen(w, h)) { fs =>
      val good = Avi.encode(w, h, 25, fs)
      val badMagic = good.clone(); badMagic(9) = 'X'.toByte
      // strf bpp field sits at hdrl list + avih + strl header offsets;
      // find it from the known fixed layout: 12+8+4+8+56+8+4+8+56+8 = 'strf'
      val strfData = 12 + 8 + 4 + 8 + 56 + 8 + 4 + 8 + 56 + 8
      val badBpp = good.clone(); badBpp(strfData + 14) = 8.toByte
      val badComp = good.clone(); badComp(strfData + 16) = 1.toByte
      val truncated = java.util.Arrays.copyOf(good, good.length - 1)
      Seq(badMagic, badBpp, badComp).forall { b =>
        scala.util.Try(Avi.decode(b)).isFailure
      } && (fs.isEmpty || scala.util.Try(Avi.decode(truncated)).isFailure)
    }
  }
}
