package graft.sources

import java.io.File

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Model-based ScalaCheck laws for the snapshot journal: a random
  * sequence of table operations (append / overwrite-with-archive /
  * delete-sidecar update / no-op) drives the REAL journal machinery
  * (appendSnapshot / readSnapshots / resolveSnapshotFile /
  * expireSnapshots) against a trivial in-memory model. Pure file-system
  * level — no Spark — so hundreds of random histories run in seconds.
  * What this buys beyond AvroSnapshotSpec's example-based tests: the
  * delta encoder/replayer round-trips EVERY reachable history shape
  * (empty appends, repeated overwrites, delete flip-flops, vacuums at
  * random depths with random tag pins), not just the hand-picked ones.
  */
object SnapshotLaws extends Properties("SnapshotLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  sealed trait Op
  case class Append(n: Int) extends Op
  case class Overwrite(n: Int) extends Op
  case class SetDeletes(payload: String) extends Op
  case object ClearDeletes extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> Gen.choose(0, 3).map(Append),
    2 -> Gen.choose(1, 3).map(Overwrite),
    2 -> Gen.alphaNumStr.suchThat(_.nonEmpty).map(p =>
      SetDeletes(s"c\tbigint\t${p.take(8)}")),
    1 -> Gen.const(ClearDeletes))

  /** Apply one op to the REAL directory the way the commit path does
    * (same move/overwrite/sidecar mechanics), and to the model.
    */
  private def apply(d: File, op: Op, counter: Iterator[Int],
      model: Vector[(Set[String], Option[String])])
      : Vector[(Set[String], Option[String])] = {
    def live: Set[String] = AvroFileSource.listAvro(d).map(_.getName).toSet
    def mkFiles(n: Int): Set[String] = (0 until n).map { _ =>
      val name = f"part-${counter.next()}%05d.avro"
      java.nio.file.Files.write(new File(d, name).toPath,
        "x".getBytes("UTF-8"))
      name
    }.toSet
    def dels: Option[String] = {
      val f = AvroFileSource.deleteFile(d)
      if (f.isFile)
        Some(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      else None
    }
    // the journal's rule, mirrored exactly: a commit mints a version
    // unless the new state equals the LAST snapshot's state — and a
    // first commit always mints version 1 (even an empty one: a
    // zero-row first write still defines the table)
    def record(next: (Set[String], Option[String]))
        : Vector[(Set[String], Option[String])] =
      if (model.lastOption.contains(next)) model else model :+ next
    val prev = model.lastOption.getOrElse((Set.empty[String], None))
    op match {
      case Append(n) =>
        val fresh = mkFiles(n)
        AvroFileSource.appendSnapshot(d, "append")
        record((prev._1 ++ fresh, prev._2))
      case Overwrite(n) =>
        // archive the live files exactly like the batch commit
        live.foreach { name =>
          val dst = new File(AvroFileSource.archiveDir(d), name)
          dst.getParentFile.mkdirs()
          require(new File(d, name).renameTo(dst))
        }
        AvroFileSource.deleteFile(d).delete()
        val fresh = mkFiles(n)
        AvroFileSource.appendSnapshot(d, "overwrite")
        record((fresh, None))
      case SetDeletes(payload) =>
        java.nio.file.Files.write(AvroFileSource.deleteFile(d).toPath,
          (payload + "\n").getBytes("UTF-8"))
        AvroFileSource.appendSnapshot(d, "delete")
        record((prev._1, Some(payload + "\n")))
      case ClearDeletes =>
        AvroFileSource.deleteFile(d).delete()
        AvroFileSource.appendSnapshot(d, "delete")
        record((prev._1, None))
    }
  }

  property("journal replay equals the model over random histories") =
    Prop.forAll(Gen.listOfN(12, opGen)) { ops =>
      val d = new File(graft.operators.Catalog.tempDir("graft_snaplaw"))
      val counter = Iterator.from(0)
      var model = Vector.empty[(Set[String], Option[String])]
      ops.foreach { op => model = apply(d, op, counter, model) }
      val snaps = AvroFileSource.readSnapshots(d)
      val versionsOk = snaps.map(_.version) == (1L to model.size.toLong)
      val statesOk = snaps.zip(model).forall { case (s, (files, dels)) =>
        s.files.toSet == files && s.deletes == dels
      }
      // every version's every file must physically resolve (live/archive)
      val resolveOk = snaps.forall(_.files.forall { rel =>
        scala.util.Try(AvroFileSource.resolveSnapshotFile(d, rel)).isSuccess
      })
      Prop(versionsOk && statesOk && resolveOk) :|
        s"versions=${snaps.map(_.version)} modelSize=${model.size}"
    }

  property("vacuum keeps last-N plus tags and kept states still replay") =
    Prop.forAll(Gen.listOfN(10, opGen), Gen.choose(1, 3),
      Gen.choose(0, 4)) { (ops, keepLast, tagIdx) =>
      val d = new File(graft.operators.Catalog.tempDir("graft_snaplaw2"))
      val counter = Iterator.from(0)
      var model = Vector.empty[(Set[String], Option[String])]
      ops.foreach { op => model = apply(d, op, counter, model) }
      if (model.isEmpty) Prop.passed
      else {
        val tagged = (tagIdx % model.size) + 1L
        AvroMaintenance.tag(d.getPath, "pin", tagged)
        AvroMaintenance.expireSnapshots(d.getPath, keepLast)
        val snaps = AvroFileSource.readSnapshots(d)
        val expect = ((model.size - keepLast + 1).max(1).toLong to
          model.size.toLong).toSet + tagged
        val versionsOk = snaps.map(_.version).toSet == expect
        val statesOk = snaps.forall { s =>
          val (files, dels) = model((s.version - 1).toInt)
          s.files.toSet == files && s.deletes == dels &&
            s.files.forall(rel => scala.util.Try(
              AvroFileSource.resolveSnapshotFile(d, rel)).isSuccess)
        }
        Prop(versionsOk && statesOk) :|
          s"kept=${snaps.map(_.version)} expect=$expect"
      }
    }
}
