package graft.operators

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Cross-implementation checks for llm_winnow and llm_cdc_chunks: the
  * SQL pipelines (packed-argmin window min; pure boundary predicate)
  * must agree with direct Scala reference implementations of the
  * published algorithms, and CDC chunking must be offset-invariant —
  * the property it exists for.
  *
  * Texts use a 4-letter alphabet so k-grams REPEAT within a doc:
  * equal grams hash equal, so the winnowing rightmost-tie rule is
  * genuinely exercised (distinct random hashes never tie).
  */
class ChunkFingerprintSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Reference winnowing (k=5, w=4, rightmost minimum per window):
    * the distinct (pos, hash) fingerprint set.
    */
  private def winnowRef(text: String): Set[(Long, Long)] = {
    val n = text.length - 4
    if (n < 4) return Set.empty
    val hs = (1 to n).map { i =>
      java.lang.Long.parseLong(
        md5hex(text.substring(i - 1, i + 4)).take(8), 16)
    }
    (1 to n - 3).map { j =>
      val win = (j to j + 3).map(i => (hs(i - 1), i))
      val mh = win.map(_._1).min
      val p = win.filter(_._1 == mh).map(_._2).max
      (p.toLong, mh)
    }.toSet
  }

  /** Reference CDC chunking (k=8, cut where hash % 64 == 0, forced
    * cut at 1): the ordered chunk strings.
    */
  private def cdcRef(text: String): Seq[String] = {
    val L = text.length
    if (L < 8) return Seq.empty
    val cuts = (1 to L - 7).filter { i =>
      i == 1 || java.lang.Long.parseLong(
        md5hex(text.substring(i - 1, i + 7)).take(6), 16) % 64 == 0
    }
    cuts.zip(cuts.drop(1) :+ (L + 1)).map { case (s, nx) =>
      text.substring(s - 1, nx - 1)
    }
  }

  private def synth(seed: Int, len: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(len)("abcd".charAt(rnd.nextInt(4))).mkString
  }

  private def writeDocs(docs: Seq[(Long, String, String)]): String = {
    val dir = Catalog.tempDir("graft_chunk_spec")
    val s = spark
    import s.implicits._
    docs.toDF("doc_id", "text", "lang")
      .withColumn("source", org.apache.spark.sql.functions.lit("synth"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("llm_winnow matches the reference fingerprint sets") {
    val docs = (0 until 40).map { i =>
      (i.toLong, synth(1000 + i, 8 + (i * 7) % 180), "a")
    }
    val dir = writeDocs(docs)
    val got = LlmText.queries("llm_winnow")(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    docs.foreach { case (id, text, _) =>
      val ref = winnowRef(text)
      if (ref.nonEmpty) {
        val (nFp, fpSum) = got(id)
        nFp shouldBe ref.size.toLong
        fpSum shouldBe ref.toSeq.map(_._2).sum
      } else got.contains(id) shouldBe false
    }
    // winnowing guarantee: every full window holds >= 1 fingerprint,
    // so density is at least 1/w
    docs.filter(_._2.length >= 8).foreach { case (id, text, _) =>
      val nWin = text.length - 4 - 3
      winnowRef(text).size.toDouble should be >= nWin / 4.0
    }
  }

  test("llm_cdc_chunks matches the reference chunker per lang") {
    val docs = (0 until 30).map { i =>
      (i.toLong, synth(2000 + i, 30 + (i * 13) % 400), s"l${i % 3}")
    }
    val dir = writeDocs(docs)
    val got = LlmDedup.queries("llm_cdc_chunks")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    docs.groupBy(_._3).foreach { case (lang, ds) =>
      val chunks = ds.flatMap(d => cdcRef(d._2))
      val expect = (chunks.size.toLong, chunks.distinct.size.toLong,
        chunks.map(_.length.toLong).sum, chunks.map(_.length.toLong).max)
      got(lang) shouldBe expect
    }
  }

  test("CDC chunking is offset-invariant: shared passages chunk alike") {
    // P appears at offset 0 in doc A and offset 173 in doc B; every
    // interior chunk of P (after P's first content-defined cut) must
    // appear verbatim in B's chunk set — fixed-width chunking at any
    // width not dividing 173 shares nothing
    val p = synth(42, 600)
    val prefix = synth(43, 173)
    val a = cdcRef(p).toSet
    val b = cdcRef(prefix + p).toSet
    val interior = cdcRef(p).drop(1).toSet // skip the forced-cut head
    interior should not be empty
    (interior -- b) shouldBe empty
    (a intersect b).size should be >= interior.size
  }
}
