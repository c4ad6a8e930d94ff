package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Degree-oriented triangle counting (Advanced.triangleCounts) vs a
  * brute-force N³ reference on seeded random graphs — every vertex's count
  * must match exactly, including graphs with self-loops, duplicate and
  * reversed edges in the raw input.
  */
class GraphSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.filter { case (u, v) => u != v }
      .map { case (u, v) => (math.min(u, v), math.max(u, v)) }
      .toSet
    val verts = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val counts = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- verts.indices; j <- (i + 1) until verts.size; k <- (j + 1) until verts.size
      a = verts(i); b = verts(j); c = verts(k)
      if und((a, b)) && und((a, c)) && und((b, c))
    } {
      counts(a) += 1; counts(b) += 1; counts(c) += 1
    }
    counts.toMap
  }

  test("triangle counts match brute force on seeded random multigraphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 12 + trial * 6
      val m = n * 3
      // raw directed multigraph: duplicates, reversals, self-loops included
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val df = edges.toDF("u", "v")
      val got = Advanced.triangleCounts(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = bruteTriangles(edges).filter(_._2 > 0)
      got shouldBe want
    }
  }

  test("triangle-free graph (star) yields an empty result") {
    import spark.implicits._
    val star = (1L to 20L).map(i => (0L, i)).toDF("u", "v")
    Advanced.triangleCounts(star).count() shouldBe 0L
  }

  test("complete graph K5: every vertex sits on C(4,2)=6 triangles") {
    import spark.implicits._
    val k5 = (for (i <- 0L until 5L; j <- 0L until 5L if i != j) yield (i, j))
      .toDF("u", "v")
    val got = Advanced.triangleCounts(k5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe (0L until 5L).map(_ -> 6L).toMap
  }
}
