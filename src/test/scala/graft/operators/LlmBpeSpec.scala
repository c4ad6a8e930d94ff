package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.SparkSpec

/** The greedy-merge kernel under ScalaCheck: the laws that make the
  * gaps-and-islands SQL re-expression in LlmBpe's oracle equivalent to
  * the sequential scan.
  */
object LlmBpeLaws extends Properties("LlmBpeLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  // small alphabet → dense overlaps, including l == r runs
  private val symGen = Gen.oneOf("a", "b", "c")
  private val seqGen = Gen.choose(0, 30).flatMap(n =>
    Gen.containerOfN[Array, String](n, symGen))

  property("concatenation is invariant") =
    Prop.forAll(seqGen, symGen, symGen) { (s, l, r) =>
      LlmBpe.mergePair(s, l, r).mkString == s.mkString
    }

  property("no (l, r) adjacency survives a pass") =
    Prop.forAll(seqGen, symGen, symGen) { (s, l, r) =>
      val out = LlmBpe.mergePair(s, l, r)
      (0 until out.length - 1).forall(i => !(out(i) == l && out(i + 1) == r))
    }

  property("length drops by exactly the merges performed") =
    Prop.forAll(seqGen, symGen, symGen) { (s, l, r) =>
      val out = LlmBpe.mergePair(s, l, r)
      val merged = out.count(_ == l + r) - s.count(_ == l + r)
      out.length == s.length - merged
    }

  // the canonical overlap case: greedy takes the 1st, 3rd, … of a run
  property("identical-symbol runs merge at even offsets") =
    Prop.forAll(Gen.choose(0, 12)) { n =>
      val out = LlmBpe.mergePair(Array.fill(n)("a"), "a", "a")
      out.length == (n + 1) / 2 &&
        out.count(_ == "aa") == n / 2 &&
        (n % 2 == 0 || out.last == "a")
    }
}

/** End-to-end BPE over the real corpus: training converges on sensible
  * merges and encoding strictly compresses.
  */
class LlmBpeSpec extends AnyWordSpec with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  "BPE training" should {
    "learn K distinct merges with decreasing-or-tied counts" in {
      val merges = LlmBpe.train(spark, sf)
      merges should have length LlmBpe.K
      merges.map(m => (m._2, m._3)).distinct should have length LlmBpe.K
      // counts are non-increasing: each merge removes mass, and a later
      // pair can never have counted higher than an earlier winner
      merges.map(_._4).sliding(2).foreach {
        case Seq(a, b) => b should be <= a
        case _ =>
      }
    }
  }

  "BPE encoding" should {
    "strictly compress every document that contains a learned pair" in {
      val enc = LlmBpe.queries("llm_bpe_encode")(spark, sf).collect()
      enc.length should be > 0
      enc.foreach { r =>
        val syms = r.getLong(r.fieldIndex("n_syms"))
        val toks = r.getLong(r.fieldIndex("n_tokens"))
        toks should be <= syms
        toks should be > 0L
      }
      // corpus-wide, three merges of top bigrams must compress overall
      val totalSyms = enc.map(_.getLong(1)).sum
      val totalToks = enc.map(_.getLong(2)).sum
      totalToks.toDouble / totalSyms should be < 0.97
    }
  }
}
