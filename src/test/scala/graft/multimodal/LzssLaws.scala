package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import scala.util.{Failure, Success, Try}

/** LZSS codec laws: lossless round-trip on arbitrary byte arrays
  * (low-entropy generators force real overlapping matches — dist <
  * len, the LZ77 repeat trick — and max-length 10-byte copies), the
  * exact size model the oracle recomputes (9 bits/literal + 10
  * bits/match + 4 header bytes), stats conservation, and decode
  * totality on junk and corrupted streams (the CodecFuzzLaws
  * contract: IllegalArgumentException or success, nothing else).
  */
object LzssLaws extends Properties("LzssLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(300)

  // mixes entropy levels: 2-symbol (heavy overlap matches), runs
  // (dist-1 overlap copies), and full-range bytes (mostly literals)
  private val dataGen: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 400)
    alpha <- Gen.oneOf(2, 3, 256)
    bytes <- Gen.containerOfN[Array, Byte](n,
      Gen.choose(0, alpha - 1).map(_.toByte))
  } yield bytes

  property("round-trip identity + exact size model + conservation") =
    Prop.forAllNoShrink(dataGen) { data =>
      val (enc, st) = Lzss.encode(data)
      val dec = Lzss.decode(enc)
      val bits = 9L * st.nLit + 10L * st.nMatch
      (java.util.Arrays.equals(dec, data) :| "round trip") &&
        ((enc.length.toLong == 4 + (bits + 7) / 8) :|
          s"size ${enc.length} vs model ${4 + (bits + 7) / 8}") &&
        ((st.nLit + st.matchChars == data.length) :| "conservation") &&
        ((st.nMatch == 0 || st.matchChars >= 3L * st.nMatch) :| "min len")
    }

  private def controlled(f: => Any): Prop = Try(f) match {
    case Success(_) => Prop.passed
    case Failure(_: IllegalArgumentException) => Prop.passed
    case Failure(e) =>
      Prop.falsified :| s"uncontrolled ${e.getClass.getName}: ${e.getMessage}"
  }

  private val junkGen: Gen[Array[Byte]] = Gen.choose(0, 200).flatMap(n =>
    Gen.containerOfN[Array, Byte](n,
      Gen.choose(Byte.MinValue, Byte.MaxValue)))

  private val corruptGen: Gen[Array[Byte]] = for {
    data <- dataGen
    base = Lzss.encode(data)._1
    out <- if (base.isEmpty) Gen.const(base)
      else Gen.listOf(Gen.zip(Gen.choose(0, base.length - 1),
          Gen.choose(Byte.MinValue, Byte.MaxValue)))
        .map { patches =>
          val o = base.clone()
          patches.take(8).foreach { case (i, b) => o(i) = b }
          o
        }
  } yield out

  property("decode is total on junk") =
    Prop.forAllNoShrink(junkGen)(b => controlled(Lzss.decode(b)))

  property("decode is total on corrupted streams") =
    Prop.forAllNoShrink(corruptGen)(b => controlled(Lzss.decode(b)))
}
