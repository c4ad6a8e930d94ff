package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** Mergeability laws for the KMV bottom-k sketch (q_sketch_kmv /
  * q_sketch_kmv_jaccard): the property that makes bottom-k DISTRIBUTED
  * state — partial sketches per partition merge into exactly the sketch
  * of the union, so a map-side combine loses nothing. Pure-Scala
  * mirror of the SQL (distinct hashes → 64 smallest → (k-1)·2^48 // h_k).
  */
object SketchMergeLaws extends Properties("SketchMergeLaws") {

  private val K = 64
  private def bottomK(xs: Set[Long]): Vector[Long] =
    xs.toVector.sorted.take(K)
  private def estimate(xs: Set[Long]): Long = {
    val bk = bottomK(xs)
    if (bk.size < K) bk.size.toLong
    else (63L * (1L << 48)) / bk.last
  }

  private val hashGen: Gen[Set[Long]] =
    Gen.choose(0, 400).flatMap(n =>
      Gen.containerOfN[Set, Long](n, Gen.choose(0L, (1L << 48) - 1)))

  property("bottom-k of a union == bottom-k of merged partial sketches") =
    Prop.forAll(hashGen, hashGen) { (a, b) =>
      val direct = bottomK(a ++ b)
      val merged = bottomK((bottomK(a) ++ bottomK(b)).toSet)
      Prop(direct == merged) :| s"|a|=${a.size} |b|=${b.size}"
    }

  property("merge is associative and commutative through the estimate") =
    Prop.forAll(hashGen, hashGen, hashGen) { (a, b, c) =>
      def est2(x: Set[Long], y: Set[Long]) =
        estimate((bottomK(x) ++ bottomK(y)).toSet)
      val abc1 = estimate(
        (bottomK((bottomK(a) ++ bottomK(b)).toSet) ++ bottomK(c)).toSet)
      val abc2 = estimate(
        (bottomK(a) ++ bottomK((bottomK(b) ++ bottomK(c)).toSet)).toSet)
      Prop(abc1 == abc2 && est2(a, b) == est2(b, a)) :| "assoc/comm"
    }

  property("below k distinct values the estimate is exact") =
    Prop.forAll(Gen.choose(0, K - 1).flatMap(n =>
      Gen.containerOfN[Set, Long](n, Gen.choose(0L, (1L << 48) - 1)))) { s =>
      Prop(estimate(s) == s.size.toLong) :| s"|s|=${s.size}"
    }
}
