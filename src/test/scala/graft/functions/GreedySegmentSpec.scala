package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The greedy longest-match kernel: hand-traced segmentations plus
  * interpreted-vs-codegen parity through a real Spark plan (the
  * partition/coverage laws live in [[GreedySegmentLaws]]).
  */
class GreedySegmentSpec extends AnyFunSuite with graft.SparkSpec
    with Matchers {

  private def seg(s: String): (Long, Long) = {
    val a = GreedySegment.compute(UTF8String.fromString(s))
    (a.getLong(0), a.getLong(1))
  }

  test("hand-traced walks") {
    seg("") shouldBe ((0L, 0L))
    seg("x") shouldBe ((1L, 1L))
    // "the cat" → the | ' ' | c | at  (no " c"/"ca" in vocab)
    seg("the cat") shouldBe ((4L, 9L + 1L + 1L + 4L))
    // longest-first: "ther" (4) wins over "the" (3); then "e" alone
    seg("there") shouldBe ((2L, 16L + 1L))
    // "tion" as a 4-gram beats "ti"/"ion"
    seg("tion") shouldBe ((1L, 16L))
  }

  test("non-ASCII input advances without matching and never throws") {
    val (n, sq) = seg("日本語テキスト")
    n shouldBe 7L
    sq shouldBe 7L
  }

  test("codegen path through a Spark plan equals interpreted eval") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val inputs = Seq("the cat", "there", "information retrieval systems",
      "", "zzzz qqq")
    val rows = inputs.toDF("t")
      .selectExpr("greedy_segment(t) AS a")
      .collect().map(r => r.getSeq[Long](0).toList)
    rows.toSeq shouldBe inputs.map { s =>
      val (n, sq) = seg(s); List(n, sq)
    }
  }
}
