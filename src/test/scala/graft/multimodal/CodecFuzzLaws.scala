package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties, Test}

import scala.util.{Failure, Success, Try}

/** Totality fuzz for the three real codecs: `decode` on ARBITRARY bytes —
  * pure junk or corrupted real containers — must either succeed or fail
  * with the controlled IllegalArgumentException the `require` contract
  * promises. No ArrayIndexOutOfBounds, NegativeArraySize, or arithmetic
  * overflow may escape: at corpus scale corrupt payloads are a certainty,
  * and an uncontrolled error class in a task kills the stage retry-storm
  * way instead of landing in the quarantine path a pipeline filters on.
  * (The bounds checks run in Long and cap dims precisely so forged header
  * sizes cannot overflow past a require — this suite is the proof.)
  */
object CodecFuzzLaws extends Properties("CodecFuzzLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private def controlled(f: => Any): Prop = Try(f) match {
    case Success(_) => Prop.passed
    case Failure(_: IllegalArgumentException) => Prop.passed
    case Failure(e) => Prop.falsified :| s"uncontrolled ${e.getClass.getName}: ${e.getMessage}"
  }

  private val junkGen: Gen[Array[Byte]] = Gen.choose(0, 300).flatMap(n =>
    Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue)))

  // corruption: up to 12 (position, byte) patches over a valid container
  private def corrupt(base: Array[Byte]): Gen[Array[Byte]] =
    if (base.isEmpty) Gen.const(base)
    else Gen.listOf(Gen.zip(Gen.choose(0, base.length - 1),
        Gen.choose(Byte.MinValue, Byte.MaxValue)))
      .map { patches =>
        val out = base.clone()
        patches.take(12).foreach { case (i, b) => out(i) = b }
        out
      }

  private val bmpGen: Gen[Array[Byte]] = for {
    w <- Gen.choose(1, 9); h <- Gen.choose(1, 9)
    pix <- Gen.containerOfN[Array, Byte](w * h * 3,
      Gen.choose(Byte.MinValue, Byte.MaxValue))
    out <- corrupt(Bmp.encode(w, h, pix))
  } yield out

  private val wavGen: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 64)
    s <- Gen.containerOfN[Array, Short](n,
      Gen.choose(Short.MinValue, Short.MaxValue))
    out <- corrupt(Wav.encode(8000, s))
  } yield out

  private val aviGen: Gen[Array[Byte]] = for {
    w <- Gen.choose(1, 6); h <- Gen.choose(1, 6)
    nf <- Gen.choose(0, 3)
    fs <- Gen.listOfN(nf, Gen.containerOfN[Array, Byte](w * h * 3,
      Gen.choose(Byte.MinValue, Byte.MaxValue)))
    out <- corrupt(Avi.encode(w, h, 25, fs))
  } yield out

  private val pngGen: Gen[Array[Byte]] = for {
    w <- Gen.choose(1, 9); h <- Gen.choose(1, 9)
    pix <- Gen.containerOfN[Array, Byte](w * h * 3,
      Gen.choose(Byte.MinValue, Byte.MaxValue))
    out <- corrupt(Png.encode(w, h, pix))
  } yield out

  property("Bmp.decode total on junk") =
    Prop.forAll(junkGen)(b => controlled(Bmp.decode(b)))
  property("Bmp.decode total on corrupted containers") =
    Prop.forAll(bmpGen)(b => controlled(Bmp.decode(b)))

  property("Wav.decode total on junk") =
    Prop.forAll(junkGen)(b => controlled(Wav.decode(b)))
  property("Wav.decode total on corrupted containers") =
    Prop.forAll(wavGen)(b => controlled(Wav.decode(b)))
  property("Wav.decodeMulaw total on junk") =
    Prop.forAll(junkGen)(b => controlled(Wav.decodeMulaw(b)))
  property("Wav.decodeMulaw total on corrupted containers") =
    Prop.forAll(wavGen)(b => controlled(Wav.decodeMulaw(b)))

  private val mjpegGen: Gen[Array[Byte]] = for {
    w <- Gen.choose(8, 16)
    p <- Gen.containerOfN[Array, Byte](w * w,
      Gen.choose(Byte.MinValue, Byte.MaxValue))
    out <- corrupt(Avi.encodeMjpeg(w, w, 5, Seq(Jpeg.encode(w, w, p))))
  } yield out
  property("Avi.decodeMjpeg total on junk") =
    Prop.forAll(junkGen)(b => controlled(Avi.decodeMjpeg(b)))
  property("Avi.decodeMjpeg total on corrupted containers") =
    Prop.forAll(mjpegGen)(b => controlled(Avi.decodeMjpeg(b)))

  property("Avi.decode total on junk") =
    Prop.forAll(junkGen)(b => controlled(Avi.decode(b)))
  property("Avi.decode total on corrupted containers") =
    Prop.forAll(aviGen)(b => controlled(Avi.decode(b)))

  private val gifGen: Gen[Array[Byte]] = for {
    w <- Gen.choose(1, 9); h <- Gen.choose(1, 9)
    idx <- Gen.containerOfN[Array, Byte](w * h,
      Gen.choose(Byte.MinValue, Byte.MaxValue))
    out <- corrupt(Gif.encode(w, h, idx))
  } yield out

  property("Gif.decode total on junk") =
    Prop.forAll(junkGen)(b => controlled(Gif.decode(b)))
  property("Gif.decode total on corrupted containers") =
    Prop.forAll(gifGen)(b => controlled(Gif.decode(b)))

  private val jpegGen: Gen[Array[Byte]] = for {
    w <- Gen.choose(1, 16); h <- Gen.choose(1, 16)
    ri <- Gen.oneOf(0, 0, 1, 2) // half the corpus carries restart markers
    pix <- Gen.containerOfN[Array, Byte](w * h,
      Gen.choose(Byte.MinValue, Byte.MaxValue))
    out <- corrupt(Jpeg.encode(w, h, pix, ri))
  } yield out

  property("Jpeg.decode total on junk") =
    Prop.forAll(junkGen)(b => controlled(Jpeg.decode(b)))
  property("Jpeg.decode total on corrupted containers") =
    Prop.forAll(jpegGen)(b => controlled(Jpeg.decode(b)))

  private val jpegColorGen: Gen[Array[Byte]] = for {
    w <- Gen.choose(1, 16); h <- Gen.choose(1, 16)
    ri <- Gen.oneOf(0, 0, 1)
    y <- Gen.containerOfN[Array, Byte](w * h,
      Gen.choose(Byte.MinValue, Byte.MaxValue))
    c <- Gen.containerOfN[Array, Byte](((w + 1) / 2) * ((h + 1) / 2),
      Gen.choose(Byte.MinValue, Byte.MaxValue))
    out <- corrupt(Jpeg.encodeColor(w, h, y, c, c, ri))
  } yield out

  property("Jpeg.decodeColor total on junk") =
    Prop.forAll(junkGen)(b => controlled(Jpeg.decodeColor(b)))
  property("Jpeg.decodeColor total on corrupted containers") =
    Prop.forAll(jpegColorGen)(b => controlled(Jpeg.decodeColor(b)))

  property("Png.decode total on junk") =
    Prop.forAll(junkGen)(b => controlled(Png.decode(b)))
  property("Png.decode total on corrupted containers") =
    Prop.forAll(pngGen)(b => controlled(Png.decode(b)))

  // A zlib stream with FDICT (preset dictionary) set makes
  // Inflater.inflate() return 0 with needsInput()==false and
  // finished()==false forever: decode must throw, not spin. (Regression:
  // the quarantine path feeds decode untrusted payloads by design — a
  // crafted asset must land in quarantine, never hang the task.)
  property("Png.decode rejects FDICT zlib instead of looping") = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + data.length)
      out(0) = 0; out(1) = 0; out(2) = 0; out(3) = data.length.toByte
      typ.getBytes("US-ASCII").copyToArray(out, 4)
      data.copyToArray(out, 8)
      val crc = new java.util.zip.CRC32
      crc.update(out, 4, 4 + data.length)
      val v = crc.getValue
      out(8 + data.length) = (v >>> 24).toByte
      out(9 + data.length) = (v >>> 16).toByte
      out(10 + data.length) = (v >>> 8).toByte
      out(11 + data.length) = v.toByte
      out
    }
    val ihdr = new Array[Byte](13)
    ihdr(3) = 1; ihdr(7) = 1 // 1x1
    ihdr(8) = 8; ihdr(9) = 2 // 8-bit truecolor
    // zlib header 0x78 0x20: FDICT bit set, (CMF*256+FLG) % 31 == 0,
    // then a 4-byte DICTID and no deflate data.
    val idat = Array[Byte](0x78, 0x20, 1, 2, 3, 4)
    val sig = Array[Byte](137.toByte, 'P', 'N', 'G', 13, 10, 26, 10)
    val png = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
    Try(Png.decode(png)) match {
      case Failure(_: IllegalArgumentException) => Prop.passed
      case Success(_) => Prop.falsified :| "decoded an FDICT stream?"
      case Failure(e) => Prop.falsified :| s"uncontrolled ${e.getClass.getName}"
    }
  }

  private val adpcmGen: Gen[Array[Byte]] = for {
    nb <- Gen.choose(1, 3)
    s <- Gen.containerOfN[Array, Short](nb * Adpcm.Block,
      Gen.choose(Short.MinValue, Short.MaxValue))
    out <- corrupt(Adpcm.encode(8000, s))
  } yield out

  property("Adpcm.decode total on junk") =
    Prop.forAll(junkGen)(b => controlled(Adpcm.decode(b)))
  property("Adpcm.decode total on corrupted containers") =
    Prop.forAll(adpcmGen)(b => controlled(Adpcm.decode(b)))

  // ADPCM is LOSSY but deterministic: decode(encode(x)) must equal the
  // encoder's own reconstruction walk — verified here by an independent
  // straight-line reimplementation of the codec recurrence (the same
  // one the DuckDB oracle replays as a recursive CTE). Full-range
  // samples exercise both int16 clamps and the step table's top end.
  property("Adpcm decode equals the reference reconstruction") = Prop.forAll(
    for {
      nb <- Gen.choose(1, 3)
      s <- Gen.containerOfN[Array, Short](nb * Adpcm.Block,
        Gen.choose(Short.MinValue, Short.MaxValue))
    } yield s) { s =>
    def clamp(v: Int, lo: Int, hi: Int) = math.max(lo, math.min(hi, v))
    val recon = new Array[Short](s.length)
    var pred = 0; var idx = 0
    var i = 0
    while (i < s.length) {
      if (i % Adpcm.Block == 0) { pred = s(i).toInt; recon(i) = s(i) }
      else {
        val step = Adpcm.StepTable(idx)
        val delta = s(i) - pred
        var mag = math.abs(delta)
        var code = if (delta < 0) 8 else 0
        if (mag >= step) { code |= 4; mag -= step }
        if (mag >= step / 2) { code |= 2; mag -= step / 2 }
        if (mag >= step / 4) code |= 1
        val diff = step / 8 +
          (if ((code & 4) != 0) step else 0) +
          (if ((code & 2) != 0) step / 2 else 0) +
          (if ((code & 1) != 0) step / 4 else 0)
        pred = clamp(if ((code & 8) != 0) pred - diff else pred + diff,
          -32768, 32767)
        idx = clamp(idx + Adpcm.IndexDelta(code & 7), 0, 88)
        recon(i) = pred.toShort
      }
      i += 1
    }
    val (rate, out) = Adpcm.decode(Adpcm.encode(8000, s))
    Prop(rate == 8000 && java.util.Arrays.equals(out, recon)) :|
      s"ADPCM reconstruction mismatch over ${s.length} samples"
  }

  // Lossless round-trip: heights ≥ 5 exercise every filter type
  // (encode cycles y % 5 through None/Sub/Up/Average/Paeth).
  property("Png encode/decode round-trips pixels exactly") = Prop.forAll(
    for {
      w <- Gen.choose(1, 12); h <- Gen.choose(5, 12)
      pix <- Gen.containerOfN[Array, Byte](w * h * 3,
        Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (w, h, pix)) { case (w, h, pix) =>
    val (w2, h2, out) = Png.decode(Png.encode(w, h, pix))
    Prop(w2 == w && h2 == h && java.util.Arrays.equals(out, pix)) :|
      s"round-trip mismatch at ${w}x$h"
  }

  private val tgaGen: Gen[Array[Byte]] = for {
    w <- Gen.choose(1, 12); h <- Gen.choose(1, 12)
    // biased toward runs so both packet kinds appear in the container
    pix <- Gen.containerOfN[Array, Byte](w * h,
      Gen.frequency(3 -> Gen.const(7.toByte),
        2 -> Gen.choose(Byte.MinValue, Byte.MaxValue)))
    out <- corrupt(Tga.encode(w, h, pix))
  } yield out

  // regression pin: 0xffff × 0xffff dims overflow Int in w*h — must be
  // the controlled reject, never NegativeArraySizeException (found by
  // the corrupted-container fuzz; the Long product cap is the fix)
  property("Tga.decode rejects dim-product-overflow headers") = {
    val forged = new Array[Byte](20)
    forged(2) = 11
    forged(12) = -1; forged(13) = -1 // w = 0xffff
    forged(14) = -1; forged(15) = -1 // h = 0xffff
    forged(16) = 8
    Try(Tga.decode(forged)) match {
      case Failure(_: IllegalArgumentException) => Prop.passed
      case r => Prop.falsified :| s"expected controlled reject, got $r"
    }
  }

  property("Tga.decode total on junk") =
    Prop.forAll(junkGen)(b => controlled(Tga.decode(b)))
  property("Tga.decode total on corrupted containers") =
    Prop.forAll(tgaGen)(b => controlled(Tga.decode(b)))

  // TGA RLE is LOSSLESS, and the greedy encoder is canonical: decode
  // then re-encode must reproduce the exact byte stream (the oracle's
  // SQL cost replay depends on this canonicity).
  property("Tga encode/decode round-trips and re-encodes canonically") =
    Prop.forAll(for {
      w <- Gen.choose(1, 14); h <- Gen.choose(1, 14)
      pix <- Gen.containerOfN[Array, Byte](w * h,
        Gen.frequency(3 -> Gen.const(42.toByte),
          2 -> Gen.choose(Byte.MinValue, Byte.MaxValue)))
    } yield (w, h, pix)) { case (w, h, pix) =>
      val enc = Tga.encode(w, h, pix)
      val (w2, h2, out) = Tga.decode(enc)
      val re = Tga.encode(w2, h2, out)
      Prop(w2 == w && h2 == h && java.util.Arrays.equals(out, pix) &&
        java.util.Arrays.equals(re, enc)) :|
        s"TGA round-trip mismatch at ${w}x$h"
    }

  // long-run chunking: a constant row longer than 128 must split into
  // ceil(w/128) run packets, which the decoder reassembles exactly
  property("Tga 128-chunking round-trips wide constant images") =
    Prop.forAll(Gen.choose(129, 400)) { w =>
      val pix = Array.fill[Byte](w * 2)(9)
      val enc = Tga.encode(w, 2, pix)
      val (w2, h2, out) = Tga.decode(enc)
      Prop(w2 == w && h2 == 2 && java.util.Arrays.equals(out, pix) &&
        enc.length == 18 + 2 * 2 * ((w + 127) / 128)) :|
        s"TGA chunking mismatch at width $w (${enc.length} bytes)"
    }

  // amplitudes within ±2^13 keep the order-2 residuals inside the
  // subset's 4-bit Rice parameter bound (encode enforces it)
  private val flacSamplesGen: Gen[Array[Short]] = for {
    nf <- Gen.choose(1, 3)
    s <- Gen.containerOfN[Array, Short](nf * Flac.Block,
      Gen.choose[Short]((-8192).toShort, 8191.toShort))
  } yield s

  private val flacGen: Gen[Array[Byte]] =
    flacSamplesGen.flatMap(s => corrupt(Flac.encode(8000, s)))

  property("Flac.decode total on junk") =
    Prop.forAll(junkGen)(b => controlled(Flac.decode(b)))
  property("Flac.decode total on corrupted containers") =
    Prop.forAll(flacGen)(b => controlled(Flac.decode(b)))

  // FLAC is LOSSLESS: decode ∘ encode must be the identity — and both
  // frame CRCs must hold along the way (decode verifies them).
  property("Flac encode/decode round-trips samples exactly") =
    Prop.forAll(flacSamplesGen) { s =>
      val (rate, out) = Flac.decode(Flac.encode(44100, s))
      Prop(rate == 44100 && java.util.Arrays.equals(out, s)) :|
        s"FLAC round-trip mismatch over ${s.length} samples"
    }
}
