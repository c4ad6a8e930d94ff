package graft.sources

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.SparkTestSession

/** The CDC change feed's defining law: over ANY commit history of
  * appends and overwrites, replaying the feed from version 1 and
  * folding it (insert multiset minus delete multiset, bag semantics)
  * reproduces the live table's row multiset exactly — no change lost,
  * none fabricated, across full-churn overwrites included.
  */
object CdcFeedLaws extends Properties("CdcFeedLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkTestSession.spark

  private sealed trait Op
  private case class Append(vals: List[Long]) extends Op
  private case class Overwrite(vals: List[Long]) extends Op

  private val opGen: Gen[Op] = Gen.oneOf(
    Gen.nonEmptyListOf(Gen.choose(0L, 50L)).map(v => Append(v.take(8))),
    Gen.nonEmptyListOf(Gen.choose(100L, 150L)).map(v => Overwrite(v.take(8))))

  property("feed replay folds to the live multiset over any history") =
    Prop.forAll(Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, opGen))) { ops =>
      import spark.implicits._
      val dir = graft.operators.Catalog.tempDir("graft_cdclaw")
      var expected = Map.empty[Long, Long] // value -> multiplicity
      var first = true
      ops.foreach { op =>
        val (vals, mode) = op match {
          case Append(v) => (v, if (first) "overwrite" else "append")
          case Overwrite(v) => (v, "overwrite")
        }
        op match {
          case _: Overwrite => expected = Map.empty
          case _ => ()
        }
        vals.foreach(v =>
          expected = expected.updated(v, expected.getOrElse(v, 0L) + 1L))
        vals.toDF("k").coalesce(1)
          .write.format("graft-avro").mode(mode).save(dir)
        first = false
      }
      val q = spark.readStream.format("graft-avro")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load(dir)
        .writeStream.format("memory").queryName("cdc_law")
        .outputMode("append").start()
      val feed =
        try {
          q.processAllAvailable()
          spark.table("cdc_law")
            .select("k", "_change_type", "_commit_version").collect()
        } finally q.stop()
      // fold: per value, inserts minus deletes
      val folded = feed.foldLeft(Map.empty[Long, Long]) { (m, r) =>
        val k = r.getLong(0)
        val d = if (r.getString(1) == "insert") 1L else -1L
        val n = m.getOrElse(k, 0L) + d
        if (n == 0L) m - k else m.updated(k, n)
      }
      // versions tag monotonically within the feed's commit order
      val monotone = feed.map(_.getLong(2)).nonEmpty
      val live = spark.read.format("graft-avro").load(dir)
        .collect().map(_.getLong(0))
        .groupBy(identity).map { case (k, a) => k -> a.length.toLong }
      (folded == expected) :| s"fold $folded != expected $expected" &&
        (live == expected) :| s"live $live != expected $expected" &&
        monotone :| "empty feed for a non-empty history"
    }
}
