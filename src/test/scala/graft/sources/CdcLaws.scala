package graft.sources

import org.apache.spark.sql.{functions => F}
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.SparkTestSession

/** Law for the CDC changes read: over a RANDOM history of appends,
  * overwrites, and in-place compactions, for every version pair
  * (i, j), the SIGNED row multiset of `changes(i, j)` (+1 per insert
  * row, -1 per delete row) must equal the versionAsOf row-multiset
  * difference rows@j − rows@i. This is the net-diff contract stated
  * multiset-exactly: intra-range churn cancels, compaction's
  * delete+insert pairs cancel, and nothing is lost or duplicated.
  */
object CdcLaws extends Properties("CdcLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkTestSession.spark

  sealed private trait Op
  private case class Append(lo: Int, n: Int) extends Op
  private case class Overwrite(lo: Int, n: Int) extends Op
  private case object Compact extends Op
  private case class DeleteW(vals: List[Long]) extends Op
  private case class PosDel(filePick: Int, posPicks: List[Int]) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> (for { lo <- Gen.chooseNum(0, 500); n <- Gen.chooseNum(1, 40) }
      yield Append(lo, n)),
    2 -> (for { lo <- Gen.chooseNum(0, 500); n <- Gen.chooseNum(1, 40) }
      yield Overwrite(lo, n)),
    1 -> Gen.const(Compact),
    // equality deleteWhere: the sidecar delta must net exactly like any
    // other history step (stamped entries, per-file applicability)
    2 -> Gen.nonEmptyListOf(Gen.chooseNum(0L, 540L))
      .map(v => DeleteW(v.take(4))),
    // positional deletes: journaled per version since r16 — both rowsAt
    // (travel applies the snapshot's overlay) and changes (row-level
    // posdel deltas) must agree across every pair
    2 -> Gen.zip(Gen.chooseNum(0, 1000),
      Gen.nonEmptyListOf(Gen.chooseNum(0, 1000)).map(_.take(3)))
      .map { case (f, ps) => PosDel(f, ps) })

  // signed multiset of k values at a version (k may repeat across ops)
  private def rowsAt(dir: String, v: Long): Map[Long, Long] =
    if (v == 0L) Map.empty
    else spark.read.format("graft-avro").option("versionAsOf", v)
      .load(dir).groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  property("changes(i,j) nets to rows@j - rows@i, every version pair") =
    Prop.forAllNoShrink(Gen.listOfN(5, opGen)) { ops =>
      val dir = graft.operators.Catalog.tempDir("graft_cdc_law")
      // v1 seed so versionAsOf(1) exists
      spark.range(3).selectExpr("id as k")
        .write.format("graft-avro").mode("overwrite").save(dir)
      ops.foreach {
        case Append(lo, n) =>
          spark.range(lo, lo + n).selectExpr("id as k")
            .write.format("graft-avro").mode("append").save(dir)
        case Overwrite(lo, n) =>
          spark.range(lo, lo + n).selectExpr("id as k")
            .write.format("graft-avro").mode("overwrite").save(dir)
        case Compact =>
          AvroMaintenance.compactInPlace(spark, dir, 512L * 1024 * 1024)
        case DeleteW(vals) =>
          AvroMaintenance.deleteWhere(spark, dir, "k", vals.distinct)
        case PosDel(filePick, posPicks) =>
          val d = new java.io.File(dir)
          val live = AvroFileSource.listLive(d)
          if (live.nonEmpty) {
            val f = live(filePick % live.size)._1
            val rel = d.getAbsoluteFile.toPath
              .relativize(f.getAbsoluteFile.toPath).toString
            val reader = new org.apache.avro.file.DataFileReader(f,
              new org.apache.avro.generic.GenericDatumReader[
                org.apache.avro.generic.GenericRecord]())
            var n = 0L
            try while (reader.hasNext) {
              n += reader.getBlockCount; reader.nextBlock()
            } finally reader.close()
            if (n > 0)
              AvroMaintenance.deleteAtPositions(dir, rel,
                posPicks.map(p => (p % n.toInt).toLong).distinct)
          }
      }
      val snaps = AvroFileSource.readSnapshots(new java.io.File(dir))
      val versions = 0L +: snaps.map(_.version)
      val pairs = for {
        i <- versions; j <- versions if j > i
      } yield (i, j)
      val atV = versions.map(v => v -> rowsAt(dir, v)).toMap
      pairs.map { case (i, j) =>
        val ch = AvroMaintenance.changes(spark, dir, i, j)
          .groupBy("k")
          .agg(F.sum(F.when(F.col("_change_type") === "insert", 1L)
            .otherwise(-1L)).as("net"))
          .collect().map(r => r.getLong(0) -> r.getLong(1))
          .filter(_._2 != 0L).toMap
        val want = (atV(j).keySet ++ atV(i).keySet).flatMap { k =>
          val d = atV(j).getOrElse(k, 0L) - atV(i).getOrElse(k, 0L)
          if (d == 0L) None else Some(k -> d)
        }.toMap
        (ch == want) :| s"pair ($i,$j): got $ch want $want"
      }.foldLeft(Prop.passed: Prop)(_ && _)
    }
}
