package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Laws for the greedy longest-match kernel (pure — no Spark):
  * the emitted token walk is a PARTITION of the input (lengths cover
  * the string exactly), counts sit inside the ceil(len/4)..len
  * bracket, and an independent re-walk of the published rule
  * reproduces both outputs bit-for-bit.
  */
object GreedySegmentLaws extends Properties("GreedySegmentLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val asciiText: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '))).map(_.mkString)

  private def reference(s: String): (Long, Long, Long) = {
    var pos = 0; var covered = 0L; var steps = 0L; var sqSum = 0L
    while (pos < s.length) {
      val rem = s.length - pos
      val l =
        if (rem >= 4 && GreedySegment.Grams4.contains(s.substring(pos, pos + 4))) 4
        else if (rem >= 3 && GreedySegment.Grams3.contains(s.substring(pos, pos + 3))) 3
        else if (rem >= 2 && GreedySegment.Grams2.contains(s.substring(pos, pos + 2))) 2
        else 1
      pos += l; covered += l; steps += 1; sqSum += l.toLong * l
    }
    (steps, sqSum, covered)
  }

  property("partition + bracket + reference equality") =
    Prop.forAll(asciiText) { s =>
      val a = GreedySegment.compute(UTF8String.fromString(s))
      val (n, sq) = (a.getLong(0), a.getLong(1))
      val (rn, rsq, covered) = reference(s)
      n == rn && sq == rsq && covered == s.length.toLong &&
        n >= (s.length + 3) / 4 && n <= s.length.toLong &&
        (s.isEmpty || (sq >= n && sq <= 16L * n))
    }
}
