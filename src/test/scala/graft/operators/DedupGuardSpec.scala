package graft.operators

import org.apache.spark.sql.{functions => F}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Losslessness law for llm_ngram_jaccard's length banding.
  *
  * The gate reports pairs with 21*common >= ni+nj (⟺ Jaccard >= 1/20) and
  * finds candidates only where two docs share a band key, each doc fanning
  * into {b..b+5} with b = floor(log2 n) = bitlength(n)-1. The law: for EVERY
  * valid (ni, nj, common) triple meeting the threshold, the two fan-out
  * ranges intersect — so banding can never lose a reported pair.
  * (Arithmetic proof: common <= min(ni,nj) and 21*common >= ni+nj give
  * max <= 20*min < 2^5*min, hence |b_i - b_j| <= 5.)
  */
object NgramBandLaws extends Properties("NgramBandLaws") {

  private def band(n: Int): Int = 32 - Integer.numberOfLeadingZeros(n) - 1

  property("threshold pairs always share a band key") =
    Prop.forAllNoShrink(
      Gen.chooseNum(1, 1000000), Gen.chooseNum(1, 1000000)
    ) { (ni, nj) =>
      // the weakest qualifying overlap: the smallest common meeting the
      // threshold (if any valid common can)
      val minCommon = (ni + nj + 20) / 21 // ceil((ni+nj)/21)
      val qualifiable = minCommon <= math.min(ni, nj)
      !qualifiable || {
        val (bi, bj) = (band(ni), band(nj))
        val overlap = (bi to bi + 5).toSet.intersect((bj to bj + 5).toSet)
        overlap.nonEmpty :| s"ni=$ni nj=$nj bands $bi,$bj disjoint"
      }
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

  test("conv-based band == bitlength band (one job, exhaustive + boundaries)") {
    // Spark's band (binary-digit count via conv) must agree with the
    // arithmetic bitlength NgramBandLaws proves with — checked for every
    // n in 1..65536 plus the power-of-2 boundaries up to 2^30, in ONE
    // DataFrame job (a per-sample job here would add ~100 Spark jobs to
    // the suite for a deterministic expression)
    import spark.implicits._
    val ns = (1 to 65536) ++ (17 to 30).flatMap(k =>
      Seq((1 << k) - 1, 1 << k, (1 << k) + 1))
    def bitBand(n: Int): Int = 32 - Integer.numberOfLeadingZeros(n) - 1
    val mismatches = ns.toDF("n")
      .select(F.col("n"),
        (F.length(F.conv(F.col("n"), 10, 2)).cast("int") - 1).as("b"))
      .collect()
      .filter(r => r.getInt(1) != bitBand(r.getInt(0)))
    mismatches shouldBe empty
  }

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
