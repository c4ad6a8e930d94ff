package graft.operators

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Brute-force references for the two step-function time operators:
  * q_interval_union's gaps-and-islands merge and
  * q_time_weighted_avg's integral must equal a direct Scala fold over
  * the same events. Timestamp clusters are generated to force BOTH
  * overlapping and gapped intervals, plus exact-touch boundaries
  * (prevMax == next start must MERGE) and duplicate timestamps.
  */
class IntervalLaws extends AnyFunSuite with SparkSpec with Matchers {

  private val WidthUs = 300000000L // the gate's 5-minute interval

  private def synth(seed: Int): Seq[(Long, Long, Long, Double)] = {
    // (event_id, user_id, us, value)
    val rnd = new scala.util.Random(seed)
    val base = 1700000000000000L
    (0 until 300).map { i =>
      val user = rnd.nextInt(8).toLong
      val us = rnd.nextInt(5) match {
        case 0 => base + rnd.nextInt(1000) * 1000000L // dense cluster
        case 1 => base + 2 * WidthUs * (rnd.nextInt(20) + 1) // exact touch / gap grid
        case _ => base + rnd.nextLong(40L * WidthUs)
      }
      (i.toLong, user, us, 0.01 + rnd.nextInt(49000) / 100.0)
    }
  }

  private def writeEvents(rows: Seq[(Long, Long, Long, Double)]): String = {
    val dir = Catalog.tempDir("graft_interval_laws")
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "user_id", "us", "value")
      .withColumn("ts", F.timestamp_micros(F.col("us")))
      .withColumn("event_type", F.lit("x"))
      .withColumn("props", F.lit("{}"))
      .drop("us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("interval union equals the brute-force merge") {
    val rows = synth(7)
    val dir = writeEvents(rows)
    val got = Relational.queries("q_interval_union")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val expect = rows.groupBy(_._2).map { case (u, es) =>
      val iv = es.map(e => (e._3, e._3 + WidthUs)).sorted
      val merged = iv.drop(1).foldLeft(Vector(iv.head)) {
        case (acc, (st, en)) =>
          val (ls, le) = acc.last
          if (st <= le) acc.init :+ ((ls, math.max(le, en)))
          else acc :+ ((st, en))
      }
      u -> (merged.size.toLong,
        merged.map(m => m._2 - m._1).sum,
        merged.map(m => m._2 - m._1).max)
    }
    got shouldBe expect
  }

  test("time-weighted average equals the brute-force integral") {
    val rows = synth(11)
    val dir = writeEvents(rows)
    val got = Relational.queries("q_time_weighted_avg")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val expect = rows.groupBy(_._2).flatMap { case (u, es) =>
      val obs = es.map(e => (e._3, e._1, math.floor(e._4 * 100).toLong))
        .sortBy(o => (o._1, o._2))
      val gaps = obs.zip(obs.drop(1)).map { case ((us, _, c), (nus, _, _)) =>
        (c, nus - us)
      }
      val span = gaps.map(_._2).sum
      if (gaps.isEmpty || span <= 0) None
      else Some(u -> (gaps.size.toLong, span,
        gaps.map(g => g._1 * g._2).sum / span))
    }
    got shouldBe expect
  }
}
