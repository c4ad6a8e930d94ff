package graft.operators

import org.apache.spark.sql.{functions => F}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Losslessness laws for llm_ngram_jaccard's prefix filtering (the public
  * AllPairs/PPJoin candidate scheme).
  *
  * The gate reports pairs with 21*common >= ni+nj (⟺ Jaccard >= 1/20) and
  * finds candidates only where two docs share a bigram among their first
  * p(n) = n - ceil(n/20) + 1 elements under a fixed total order. The laws:
  * (1) the threshold forces common >= ceil(max(ni,nj)/20) — the overlap
  * floor the prefix length is derived from; (2) for EVERY pair of sets
  * meeting the threshold, under an arbitrary total order (random 64-bit
  * elements; the gate's df-ascending order is just another fixed order),
  * the two prefixes share an element — so prefix filtering can never lose
  * a reported pair. (Proof: let c = the smallest common element; if c sat
  * outside either prefix, at most ceil(n/20) - 1 elements of that set
  * could follow c, yet all common elements besides c do, contradicting
  * common >= ceil(n/20).)
  */
object NgramPrefixLaws extends Properties("NgramPrefixLaws") {

  private def prefixLen(n: Int): Int = n - (n + 19) / 20 + 1

  property("threshold implies the per-side overlap floor") =
    Prop.forAllNoShrink(
      Gen.chooseNum(1, 1000000), Gen.chooseNum(1, 1000000)
    ) { (ni, nj) =>
      val minCommon = (ni + nj + 20) / 21 // ceil((ni+nj)/21)
      val qualifiable = minCommon <= math.min(ni, nj)
      !qualifiable || {
        val floor = (math.max(ni, nj) + 19) / 20 // ceil(max/20)
        (minCommon >= floor) :|
          s"ni=$ni nj=$nj minCommon=$minCommon floor=$floor"
      }
    }

  // Random qualifying pair: a shared core C plus disjoint extras sized so
  // 21*|C| >= ni+nj exactly at or above the threshold boundary.
  private val qualifyingPair: Gen[(Set[Long], Set[Long])] = for {
    c <- Gen.chooseNum(1, 30)
    extra <- Gen.chooseNum(0, 19 * c) // ea+eb <= 19c keeps the pair at jac>=1/20
    ea <- Gen.chooseNum(0, extra)
    core <- Gen.containerOfN[Set, Long](c, Gen.long)
    exA <- Gen.containerOfN[Set, Long](ea, Gen.long)
    exB <- Gen.containerOfN[Set, Long](extra - ea, Gen.long)
  } yield (core ++ (exA -- core), core ++ (exB -- core -- exA))

  property("threshold pairs always share a prefix element") =
    Prop.forAllNoShrink(qualifyingPair) { case (a, b) =>
      val common = a.intersect(b).size
      // duplicate-collision in the generator can push a pair below the
      // threshold; the law quantifies over qualifying pairs only
      val qualifies = common >= 1 && 21 * common >= a.size + b.size
      !qualifies || {
        val pa = a.toSeq.sorted.take(prefixLen(a.size)).toSet
        val pb = b.toSeq.sorted.take(prefixLen(b.size)).toSet
        pa.intersect(pb).nonEmpty :|
          s"ni=${a.size} nj=${b.size} common=$common prefixes disjoint"
      }
    }

  property("prefix length is sane") =
    Prop.forAllNoShrink(Gen.chooseNum(1, 1000000)) { n =>
      val p = prefixLen(n)
      (p >= 1 && p <= n && (n - p) == (n + 19) / 20 - 1) :| s"n=$n p=$p"
    }
}

/** Skew guard for the MinHash banding: a corpus of N identical documents —
  * exactly the input dedup exists for — must produce O(N) work, not the
  * O(N²) band-bucket fan-out naive banding gives, while the REPORTED pair
  * set (an oracle-semantics quantity) stays the full N(N-1)/2 at Jaccard 1.
  */
class MinHashSkewSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = Catalog.tempDir("graft_skew_docs")
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val dupText =
    "the quick brown fox jumps over the lazy dog again and again"

  test("N identical docs collapse to zero band candidates") {
    val n = 40
    val docs = (1 to n).map(i =>
      (i.toLong, dupText, "en", "web", dupText.length.toLong))
    val dir = writeDocs(docs)
    // all N rows share one shingle set → one representative → no self-pairs
    LlmDedup.bandCandidates(spark, dir).count() shouldBe 0L
  }

  test("identical docs still report all N(N-1)/2 pairs at Jaccard 1") {
    val n = 12
    val docs = (1 to n).map(i =>
      (i.toLong, dupText, "en", "web", dupText.length.toLong))
    val dir = writeDocs(docs)
    val out = LlmDedup.queries("llm_dedup_minhash")(spark, dir).collect()
    out.length shouldBe n * (n - 1) / 2
    all(out.map(_.getAs[Long]("jac_m"))) shouldBe 1000000L
    // i < j holds on every expanded pair
    all(out.map(r => r.getAs[Long]("i") < r.getAs[Long]("j"))) shouldBe true
  }

  test("identical docs: keep retains only the min id, clusters form one component") {
    val n = 15
    val docs = (1 to n).map(i =>
      (i.toLong, dupText, "en", "web", dupText.length.toLong))
    val dir = writeDocs(docs)
    // linear drop-set algebra must agree with the expanded definition
    LlmDedup.queries("llm_dedup_keep")(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSeq shouldBe Seq(1L)
    // star edges must yield ONE component labeled by the min id
    val clusters = LlmDedup.queries("llm_dedup_clusters")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster")))
    clusters.map(_._1).sorted.toSeq shouldBe (1L to n.toLong)
    all(clusters.map(_._2)) shouldBe 1L
  }

  test("mixed corpus: dup group cross near-dup expands with correct sizes") {
    // two exact-dup groups whose texts are near-duplicates of each other,
    // plus an unrelated doc; expansion must cross the groups and reorder
    // i/j with their set sizes
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val docs = Seq(
      (1L, a, "en", "web", a.length.toLong),
      (5L, b, "en", "web", b.length.toLong),
      (9L, a, "en", "web", a.length.toLong), // dup of 1
      (3L, b, "en", "web", b.length.toLong), // dup of 5
      (7L, "completely different text with no shared shingles at all zz",
        "en", "web", 60L))
    val dir = writeDocs(docs)
    val out = LlmDedup.queries("llm_dedup_minhash")(spark, dir)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSet
    // brute-force expectation via the UNCOLLAPSED definition: band-join
    // candidacy (the gate's oracle semantics) + exact Jaccard threshold,
    // replicated per-pair with no representative collapse — proving the
    // collapse+expansion rewrite is output-invisible
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    def bandSigs(sh: Set[String]): Seq[String] = {
      val hs = sh.toSeq.map(md5hex)
      Seq(hs.map(_.substring(0, 8)).min + hs.map(_.substring(8, 16)).min,
        hs.map(_.substring(16, 24)).min + hs.map(_.substring(24, 32)).min)
    }
    val brute = for {
      x <- docs; y <- docs if x._1 < y._1
      sx = shingles(x._2); sy = shingles(y._2)
      if bandSigs(sx).zip(bandSigs(sy)).exists { case (a, b) => a == b }
      c = sx.intersect(sy).size
      if c.toDouble / (sx.size + sy.size - c) >= 0.5
    } yield (x._1, y._1)
    out shouldBe brute.toSet
    out should contain((1L, 9L)) // intra-group
    out should contain((3L, 5L)) // cross-group with reordering (3 < 5)
  }
}
