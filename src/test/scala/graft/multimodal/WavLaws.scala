package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck laws for the real WAV codec. Pure JVM — no Spark session:
  * encode/decode/decimate/windowFeatures are driver-side kernels; the
  * distributed wrapper is exercised in MultimodalSpec and the
  * llm_audio_features gate.
  */
object WavLaws extends Properties("WavLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val samplesGen: Gen[Array[Short]] = for {
    n <- Gen.choose(0, 400)
    s <- Gen.containerOfN[Array, Short](n,
      Gen.oneOf(Gen.choose(Short.MinValue, Short.MaxValue),
        Gen.oneOf(Short.MinValue, Short.MaxValue, 0.toShort)))
  } yield s

  private val rateGen = Gen.oneOf(8000, 16000, 44100, 48000)

  // Round-trip identity, including the extreme amplitudes.
  property("decode-encode round trip") = Prop.forAll(rateGen, samplesGen) {
    (rate, s) =>
      val (rate2, s2) = Wav.decode(Wav.encode(rate, s))
      rate2 == rate && java.util.Arrays.equals(s2, s)
  }

  // The container is byte-valid: magics, RIFF size, PCM fmt fields,
  // data size.
  property("encoded header fields") = Prop.forAll(rateGen, samplesGen) {
    (rate, s) =>
      val b = Wav.encode(rate, s)
      def u16(off: Int) = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      def i32(off: Int) = u16(off) | (u16(off + 2) << 16)
      new String(b, 0, 4, "US-ASCII") == "RIFF" &&
        new String(b, 8, 4, "US-ASCII") == "WAVE" &&
        i32(4) == b.length - 8 && u16(20) == 1 && u16(22) == 1 &&
        i32(24) == rate && i32(28) == rate * 2 && u16(34) == 16 &&
        i32(40) == 2 * s.length && b.length == Wav.HeaderBytes + 2 * s.length
  }

  // ---- G.711 mu-law laws ----

  private val ulawGen: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 400)
    b <- Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield b

  // Container round trip: format-7 encode/decode recovers the expansion
  // of every code byte.
  property("mulaw decode-encode round trip") = Prop.forAll(rateGen, ulawGen) {
    (rate, u) =>
      val (rate2, s2) = Wav.decodeMulaw(Wav.encodeMulaw(rate, u))
      rate2 == rate && s2.length == u.length &&
        s2.indices.forall(i => s2(i) == Wav.mulawExpand(u(i) & 0xff))
  }

  // The G.711 code space: compress inverts expand on every code except
  // 0xff — the one collision: 0x7f (negative zero) and 0xff (positive
  // zero) both expand to 0, and compress breaks the tie to the SMALLER
  // code, so 0x7f round-trips and 0xff is the loser.
  property("mulaw compress inverts expand") =
    Prop.forAll(Gen.choose(0, 255)) { u =>
      u == 0xff || Wav.mulawCompress(Wav.mulawExpand(u)) == u
    }
  property("the 0xff collision maps to 0x7f, the equal-valued code") =
    Prop(Wav.mulawExpand(0xff) == 0 &&
      Wav.mulawCompress(Wav.mulawExpand(0xff)) == 0x7f)

  // Expansion shape: zero codes decode to 0, magnitudes stay inside
  // PCM16, and the expansion is monotone within each positive segment.
  property("mulaw expansion is bounded and signed correctly") =
    Prop.forAll(Gen.choose(0, 255)) { u =>
      val s = Wav.mulawExpand(u).toInt
      val c = (~u) & 0xff
      math.abs(s) <= 32124 &&
        ((c & 0x80) == 0 || s <= 0) && ((c & 0x80) != 0 || s >= 0)
    }

  // Lossy-codec quantization contract: compress-then-expand lands within
  // the segment's step size of the input.
  property("mulaw quantization error bounded by segment step") =
    Prop.forAll(Gen.choose(-32124, 32124)) { x =>
      val back = Wav.mulawExpand(Wav.mulawCompress(x)).toInt
      // largest segment step is 8 << 7 = 1024; nearest-code search may
      // land half a step away on either side
      math.abs(back - x) <= 512
    }

  // Real RIFF walk: an unknown odd-sized chunk spliced before `data`
  // (with the RIFF even-padding byte) must be skipped, not mis-parsed.
  property("chunk walk skips unknown chunks") = Prop.forAll(samplesGen) { s =>
    val base = Wav.encode(8000, s)
    val junkBody = Array[Byte]('x', 'y', 'z') // odd size -> 1 pad byte
    val junk = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0) ++ junkBody ++
      Array[Byte](0)
    // splice between the fmt chunk (ends at 36) and the data chunk
    val spliced = base.take(36) ++ junk ++ base.drop(36)
    // patch the RIFF size for byte-validity
    val total = spliced.length - 8
    spliced(4) = total.toByte; spliced(5) = (total >> 8).toByte
    spliced(6) = (total >> 16).toByte; spliced(7) = (total >> 24).toByte
    val (rate2, s2) = Wav.decode(spliced)
    rate2 == 8000 && java.util.Arrays.equals(s2, s)
  }

  property("decimate keeps every k-th sample") =
    Prop.forAll(samplesGen, Gen.choose(1, 7)) { (s, k) =>
      val d = Wav.decimate(s, k)
      d.length == (s.length + k - 1) / k &&
        d.indices.forall(i => d(i) == s(i * k))
    }

  // Features agree with an independent per-window recomputation.
  property("window features match a naive recomputation") =
    Prop.forAll(samplesGen, Gen.choose(1, 50)) { (s, win) =>
      val got = Wav.windowFeatures(s, win)
      val exp = s.grouped(win).filter(_.length == win).map { w =>
        val sumsq = w.map(x => x.toLong * x).sum
        val crossings = w.sliding(2).count {
          case Array(a, b) => a.toLong * b < 0
          case _ => false
        }
        val peak = if (w.isEmpty) 0L else w.map(x => math.abs(x.toLong)).max
        (sumsq, crossings.toLong, peak)
      }.toArray
      got.toSeq == exp.toSeq
    }

  property("malformed rejection") = Prop.forAll(samplesGen) { s =>
    val good = Wav.encode(8000, s)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val stereo = good.clone(); stereo(22) = 2.toByte
    val eightBit = good.clone(); eightBit(34) = 8.toByte
    val truncated = java.util.Arrays.copyOf(good, good.length - 1)
    Seq(badMagic, stereo, eightBit).forall { b =>
      scala.util.Try(Wav.decode(b)).isFailure
    } && (s.isEmpty || scala.util.Try(Wav.decode(truncated)).isFailure)
  }
}
