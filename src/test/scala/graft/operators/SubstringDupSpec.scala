package graft.operators

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Exact substring-duplication spans (`llm_substring_dup`): the
  * gram/mark/island pipeline on a corpus with KNOWN planted structure,
  * plus the two semantic contracts the gaps-and-islands rewrite must
  * uphold — spans are maximal (the per-doc duplicated positions inside a
  * span are contiguous, so no two reported spans can touch or overlap)
  * and within-doc repetition counts as duplication (count(*) >= 2, not
  * distinct docs).
  */
class SubstringDupSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val K = 20

  /** Run the gate's pipeline on an in-memory corpus (same code shape as
    * the Catalog entry, parameterized by a DataFrame instead of a dir).
    */
  private def spans(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    val pos = rows.toDF("doc_id", "text")
      .filter(F.length(F.col("text")) >= K)
      .select(F.col("doc_id"),
        F.explode(F.sequence(F.lit(1),
          F.length(F.col("text")) - (K - 1))).as("i"),
        F.col("text"))
      .select(F.col("doc_id"), F.col("i"),
        F.expr(s"substring(text, i, $K)").as("gram"))
    val dup = pos.groupBy("gram").agg(F.count(F.lit(1)).as("cnt"))
      .filter(F.col("cnt") >= 2).select("gram")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
    pos.join(dup, "gram").select("doc_id", "i")
      .withColumn("grp", F.col("i") - F.row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(F.min("i").as("s"), (F.max("i") + F.lit(K - 1)).as("e"))
      .select("doc_id", "s", "e")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(x => (x._1, x._2))
  }

  private def randText(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }

  test("a shared block yields one maximal span in each document") {
    // 40-char shared block embedded in two otherwise-random docs: every
    // k-gram inside the block repeats, nothing else does, so each doc
    // reports exactly the block's char range
    val block = randText(1, 40)
    val a = randText(2, 30) + block + randText(3, 25)
    val b = randText(4, 50) + block + randText(5, 10)
    val got = spans(Seq((1L, a), (2L, b)))
    got shouldBe Array((1L, 31, 70), (2L, 51, 90))
  }

  test("within-doc repetition is duplication too") {
    // the block appears twice in ONE doc and nowhere else: both
    // occurrences must be reported (count >= 2, not distinct-doc >= 2)
    val block = randText(10, 25)
    val doc = block + randText(11, 40) + block
    val got = spans(Seq((7L, doc)))
    got shouldBe Array((7L, 1, 25), (7L, 66, 90))
  }

  test("spans shorter than k do not surface; k-length shares do") {
    val shared = randText(20, K) // exactly one k-gram
    val a = randText(21, 35) + shared + randText(22, 35)
    val b = randText(23, 5) + shared + randText(24, 60)
    val got = spans(Seq((1L, a), (2L, b)))
    got shouldBe Array((1L, 36, 55), (2L, 6, 25))
    // and a (k-1)-char share is invisible
    val small = randText(30, K - 1)
    spans(Seq(
      (1L, randText(31, 40) + small + randText(32, 40)),
      (2L, randText(33, 40) + small + randText(34, 40)))) shouldBe empty
  }

  test("reported spans are maximal in position space") {
    // random corpus with several planted repeats; structural law only
    val blocks = (0 until 4).map(i => randText(100 + i, 22 + i))
    val docs = (0 until 6).map { d =>
      val rnd = new scala.util.Random(200 + d)
      val parts = (0 until 3).map { p =>
        randText(300 + d * 10 + p, 15 + rnd.nextInt(30)) +
          blocks(rnd.nextInt(blocks.size))
      }
      (d.toLong, parts.mkString + randText(400 + d, 20))
    }
    val got = spans(docs)
    got.groupBy(_._1).values.foreach { perDoc =>
      val sorted = perDoc.sortBy(_._2)
      sorted.foreach { case (_, s, e) => (e - s + 1) should be >= K }
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) =>
          // position islands must be separated by >= 2 (a gap of one
          // start position is impossible: the island key i - row_number
          // would have merged them) — spans may still overlap in CHAR
          // space, since e extends k-1 past the last duplicated start
          s2 should be > (e1 - K + 1) + 1
        case _ => ()
      }
    }
  }
}
