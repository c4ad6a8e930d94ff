package graft.sources

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Model-based law for block-range chunk pruning: for RANDOM sorted
  * datasets (seeded — deterministic across runs) and a sweep of range /
  * point / IN predicates over both columns of a compound claim, the
  * chunk-pruned read must equal the in-memory model exactly — never a
  * lost row (unsound pruning), never a phantom. Runs a handful of
  * seeded shapes rather than ScalaCheck's 100 (each case is a full
  * Spark write+read); the shapes cover duplicate-heavy keys, negative
  * values, and run-straddling chunks.
  */
class BlockIdxLaws extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp(): String = graft.operators.Catalog.tempDir("graft_bixlaw")

  test("chunk-pruned answers equal the model over seeded random shapes " +
      "and a predicate sweep") {
    val shapes = Seq(
      // (seed, rows, gCard, rCard)
      (1L, 30000, 3, 40000),
      (2L, 25000, 500, 50),
      (3L, 20000, 1, 100000),
      (4L, 28000, 7, 11)
    )
    shapes.foreach { case (seed, n, gCard, rCard) =>
      val dir = tmp()
      // seeded pseudo-random pairs, then GLOBALLY sorted — the claim
      // verifies and chunks carry arbitrary duplicate structure
      val rng = new scala.util.Random(seed)
      val data = Array.fill(n)(
        (rng.nextInt(gCard).toLong - gCard / 2,
          rng.nextInt(rCard).toLong - rCard / 2))
        .sortBy(identity)
      import spark.implicits._
      data.toSeq.toDF("g", "r")
        .coalesce(1).sortWithinPartitions("g", "r")
        .write.format("graft-avro").option("sortedBy", "g,r")
        .mode("overwrite").save(dir)
      val t = spark.read.format("graft-avro").load(dir)
      val preds: Seq[((Long, Long)) => Boolean] = Seq(
        { case (g, _) => g == data(n / 3)._1 },
        { case (g, r) => g == data(n / 2)._1 && r >= data(n / 2)._2 },
        { case (_, r) => r == data(2 * n / 3)._2 },
        { case (g, _) => g >= data(n / 4)._1 && g <= data(3 * n / 4)._1 },
        { case (_, r) => r >= -3 && r <= 3 }
      )
      val sparkPreds = Seq(
        F.col("g") === data(n / 3)._1,
        F.col("g") === data(n / 2)._1 && F.col("r") >= data(n / 2)._2,
        F.col("r") === data(2 * n / 3)._2,
        F.col("g").between(data(n / 4)._1, data(3 * n / 4)._1),
        F.col("r").between(-3L, 3L)
      )
      preds.zip(sparkPreds).zipWithIndex.foreach {
        case ((model, cond), i) =>
          val want = data.count(model).toLong
          val got = t.filter(cond).count()
          withClue(s"seed=$seed pred=$i: ") { got shouldBe want }
      }
      // the index genuinely existed (the law must not pass vacuously)
      AvroFileSource.readBlockIdxRaw(
        AvroFileSource.blockIdxFile(new java.io.File(dir)))
        .headOption.map(_._2.size / 2).getOrElse(0) should be >= 2
    }
  }
}
