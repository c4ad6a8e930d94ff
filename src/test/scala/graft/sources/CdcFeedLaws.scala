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
  private case class DeleteW(vals: List[Long]) extends Op
  private case class Rollback(pick: Int) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> Gen.nonEmptyListOf(Gen.choose(0L, 50L)).map(v => Append(v.take(8))),
    2 -> Gen.nonEmptyListOf(Gen.choose(100L, 150L))
      .map(v => Overwrite(v.take(8))),
    // equality deleteWhere: values overlap BOTH ranges so deletes
    // sometimes hit live rows, sometimes nothing
    2 -> Gen.nonEmptyListOf(Gen.choose(0L, 150L)).map(v => DeleteW(v.take(4))),
    // rollback to a random earlier version: the feed must emit BOTH
    // sidecar-delta directions (files restored/archived + entries
    // appearing AND disappearing in one step)
    1 -> Gen.choose(0, 1000).map(Rollback))

  property("feed replay folds to the live multiset over any history") =
    Prop.forAll(Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, opGen))) { ops0 =>
      import spark.implicits._
      val dir = graft.operators.Catalog.tempDir("graft_cdclaw")
      // the table must exist before a deleteWhere/rollback can run
      val ops = ops0 match {
        case (_: DeleteW | _: Rollback) :: _ => Append(List(7L)) :: ops0
        case _ => ops0
      }
      var expected = Map.empty[Long, Long] // value -> multiplicity
      // per-version model states: hist(v) = the multiset at version v
      // (index 0 = the empty pre-history) — rollback targets replay it
      val hist = scala.collection.mutable.ArrayBuffer(
        Map.empty[Long, Long])
      var first = true
      ops.foreach { op =>
        op match {
          case DeleteW(vals) =>
            // an equality delete hides EVERY live copy of the value
            AvroMaintenance.deleteWhere(spark, dir, "k", vals.distinct)
            expected = expected -- vals
            hist += expected
          case Rollback(pick) =>
            val cur = hist.size - 1
            if (cur >= 2) {
              val target = 1 + (pick % (cur - 1))
              AvroMaintenance.rollbackTo(dir, target.toLong)
              expected = hist(target)
              hist += expected
            }
          case _ =>
            val (vals, mode) = op match {
              case Append(v) => (v, if (first) "overwrite" else "append")
              case Overwrite(v) => (v, "overwrite")
              case _ => throw new IllegalStateException("unreachable")
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

  /** r16: positional deletes journal per version and the feed serves
    * them as row-level deltas. Law: over ANY history of appends,
    * overwrites, equality deletes, POSITION deletes, and rollbacks,
    * the from-the-beginning feed folds to the live multiset — a
    * position-deleted row emits exactly one `delete` (and never when it
    * was already equality-hidden), a rollback across a posdel
    * re-surfaces the rows as inserts.
    */
  property("posdel deltas fold to the live multiset over any history") = {
    case class RowSt(v: Long, posDead: Boolean, eqDead: Boolean)
    case class FSt(rel: String, rows: Vector[RowSt])
    sealed trait POp
    case class PAppend(vals: List[Long]) extends POp
    case class POver(vals: List[Long]) extends POp
    case class PDelW(vals: List[Long]) extends POp
    case class PPos(filePick: Int, posPicks: List[Int]) extends POp
    case class PRoll(pick: Int) extends POp
    val pOpGen: Gen[POp] = Gen.frequency(
      3 -> Gen.nonEmptyListOf(Gen.choose(0L, 50L))
        .map(v => PAppend(v.take(6))),
      1 -> Gen.nonEmptyListOf(Gen.choose(100L, 150L))
        .map(v => POver(v.take(6))),
      1 -> Gen.nonEmptyListOf(Gen.choose(0L, 150L)).map(v => PDelW(v.take(3))),
      3 -> Gen.zip(Gen.choose(0, 1000),
        Gen.nonEmptyListOf(Gen.choose(0, 1000)).map(_.take(3)))
        .map { case (f, ps) => PPos(f, ps) },
      1 -> Gen.choose(0, 1000).map(PRoll))
    Prop.forAll(Gen.choose(2, 6).flatMap(n =>
      Gen.listOfN(n, pOpGen))) { ops0 =>
      import spark.implicits._
      val dir = graft.operators.Catalog.tempDir("graft_cdcposlaw")
      val dirF = new java.io.File(dir)
      def relsOnDisk(): Set[String] = {
        val base = dirF.getAbsoluteFile.toPath
        AvroFileSource.listLive(dirF).map { case (f, _) =>
          base.relativize(f.getAbsoluteFile.toPath).toString
        }.toSet
      }
      val ops = PAppend(List(7L, 8L, 9L)) :: ops0
      var files = Vector.empty[FSt]
      val hist = scala.collection.mutable.ArrayBuffer(files)
      var first = true
      ops.foreach {
        case PDelW(vals) =>
          if (!first) {
            AvroMaintenance.deleteWhere(spark, dir, "k", vals.distinct)
            files = files.map(f => f.copy(rows = f.rows.map(r =>
              if (vals.contains(r.v)) r.copy(eqDead = true) else r)))
            hist += files
          }
        case PPos(fp, pps) =>
          if (files.nonEmpty) {
            val i = fp % files.size
            val f = files(i)
            val fresh = pps.map(_ % f.rows.size).distinct
              .filterNot(p => f.rows(p).posDead).sorted
            if (fresh.nonEmpty) {
              AvroMaintenance.deleteAtPositions(dir, f.rel,
                fresh.map(_.toLong))
              files = files.updated(i, f.copy(rows =
                f.rows.zipWithIndex.map { case (r, p) =>
                  if (fresh.contains(p)) r.copy(posDead = true) else r
                }))
              hist += files
            }
          }
        case PRoll(pick) =>
          val cur = hist.size - 1
          if (cur >= 2) {
            val target = 1 + (pick % (cur - 1))
            AvroMaintenance.rollbackTo(dir, target.toLong)
            files = hist(target)
            hist += files
          }
        case op =>
          val (vals, mode) = op match {
            case PAppend(v) => (v, if (first) "overwrite" else "append")
            case POver(v) => (v, "overwrite")
            case _ => throw new IllegalStateException("unreachable")
          }
          val before = if (first) Set.empty[String] else relsOnDisk()
          vals.toDF("k").coalesce(1)
            .write.format("graft-avro").mode(mode).save(dir)
          val freshRel = (relsOnDisk() -- before).toSeq match {
            case Seq(one) => one
            case other => throw new IllegalStateException(
              s"expected one new file, got $other")
          }
          if (op.isInstanceOf[POver]) files = Vector.empty
          files :+= FSt(freshRel,
            vals.map(v => RowSt(v, posDead = false, eqDead = false)).toVector)
          hist += files
          first = false
      }
      val expected = files.flatMap(_.rows)
        .filter(r => !r.posDead && !r.eqDead)
        .groupBy(_.v).map { case (k, rs) => k -> rs.size.toLong }
      val q = spark.readStream.format("graft-avro")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load(dir)
        .writeStream.format("memory").queryName("cdc_poslaw")
        .outputMode("append").start()
      val feed =
        try {
          q.processAllAvailable()
          spark.table("cdc_poslaw")
            .select("k", "_change_type", "_commit_version").collect()
        } finally q.stop()
      val folded = feed.foldLeft(Map.empty[Long, Long]) { (m, r) =>
        val k = r.getLong(0)
        val d = if (r.getString(1) == "insert") 1L else -1L
        val n = m.getOrElse(k, 0L) + d
        if (n == 0L) m - k else m.updated(k, n)
      }
      val live = spark.read.format("graft-avro").load(dir)
        .collect().map(_.getLong(0))
        .groupBy(identity).map { case (k, a) => k -> a.length.toLong }
      (folded == expected) :| s"fold $folded != expected $expected" &&
        (live == expected) :| s"live $live != expected $expected"
    }
  }

  /** allowInitialSnapshot: after an expireSnapshots rebase dropped the
    * early deltas, a from-the-beginning replay serves the first
    * RETAINED version as a full insert snapshot and continues with
    * deltas — folding to the live multiset exactly, over any history.
    */
  property("initial snapshot past an expireSnapshots rebase folds exactly") =
    Prop.forAll(
      Gen.choose(2, 5).flatMap(n => Gen.listOfN(n, opGen)),
      Gen.choose(1, 2)) { (ops0, keep) =>
      import spark.implicits._
      val dir = graft.operators.Catalog.tempDir("graft_cdcsnap")
      // rollback is the main property's concern; this one pins expiry
      val ops = Append(List(3L)) :: ops0.filterNot(_.isInstanceOf[Rollback])
      var expected = Map.empty[Long, Long]
      var first = true
      ops.foreach {
        case DeleteW(vals) =>
          AvroMaintenance.deleteWhere(spark, dir, "k", vals.distinct)
          expected = expected -- vals
        case op =>
          val (vals, mode) = op match {
            case Append(v) => (v, if (first) "overwrite" else "append")
            case Overwrite(v) => (v, "overwrite")
            case _ => throw new IllegalStateException("unreachable")
          }
          if (op.isInstanceOf[Overwrite]) expected = Map.empty
          vals.foreach(v =>
            expected = expected.updated(v, expected.getOrElse(v, 0L) + 1L))
          vals.toDF("k").coalesce(1)
            .write.format("graft-avro").mode(mode).save(dir)
          first = false
      }
      AvroMaintenance.expireSnapshots(dir, keepLast = keep)
      val firstKept = AvroFileSource
        .readSnapshots(new java.io.File(dir)).head.version
      val q = spark.readStream.format("graft-avro")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .option("allowInitialSnapshot", "true")
        .load(dir)
        .writeStream.format("memory").queryName("cdc_snaplaw")
        .outputMode("append").start()
      val feed =
        try {
          q.processAllAvailable()
          spark.table("cdc_snaplaw")
            .select("k", "_change_type", "_commit_version").collect()
        } finally q.stop()
      val folded = feed.foldLeft(Map.empty[Long, Long]) { (m, r) =>
        val k = r.getLong(0)
        val d = if (r.getString(1) == "insert") 1L else -1L
        val n = m.getOrElse(k, 0L) + d
        if (n == 0L) m - k else m.updated(k, n)
      }
      val live = spark.read.format("graft-avro").load(dir)
        .collect().map(_.getLong(0))
        .groupBy(identity).map { case (k, a) => k -> a.length.toLong }
      // no version below the snapshot horizon is ever served
      val horizonOk = feed.forall(_.getLong(2) >= firstKept)
      (folded == expected) :| s"fold $folded != expected $expected" &&
        (live == expected) :| s"live $live != expected $expected" &&
        horizonOk :| s"feed served a version below horizon $firstKept"
    }
}
