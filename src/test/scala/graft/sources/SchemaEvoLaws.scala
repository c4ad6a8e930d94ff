package graft.sources

import java.io.File

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType,
  LongType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.avro.AvroSchemaConverter

/** Model-based laws for ALTER TABLE column evolution: a random history
  * of writes / ADD COLUMN / DROP COLUMN / ALTER COLUMN TYPE drives the
  * REAL machinery (header-only avro files through the same sidecars,
  * `_graft_evo` journal entries, snapshot minting, schema inference)
  * against a trivial (name, type)-list model. Checked invariants, every
  * step and every reachable version:
  *
  *  - live inference equals the model's current visible (name, type)
  *    list, in order (adds append, drops remove in place, widens change
  *    a type in place);
  *  - `versionAsOf` inference equals the model's list AS OF that
  *    version — each ALTER's own minted version brackets it exactly;
  *  - retired names never re-add and never rename onto.
  *
  * Pure driver-side (schema inference reads only headers), so dozens
  * of random histories run in seconds with no Spark jobs.
  */
object SchemaEvoLaws extends Properties("SchemaEvoLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  sealed trait Op
  case object Write extends Op
  case object Add extends Op
  case object Drop extends Op
  case object Widen extends Op
  case object AddNested extends Op
  case object DropNested extends Op

  private val opsGen: Gen[List[Op]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.frequency(
      4 -> Gen.const(Write: Op), 3 -> Gen.const(Add: Op),
      2 -> Gen.const(Drop: Op), 2 -> Gen.const(Widen: Op),
      3 -> Gen.const(AddNested: Op), 2 -> Gen.const(DropNested: Op))))

  /** Header-only avro file carrying exactly `cols` (all nullable):
    * schema laws need real headers, not rows.
    */
  private def writeFile(d: File, cols: Seq[(String, DataType)],
      n: Int): Unit = {
    val st = StructType(cols.map { case (c, t) => StructField(c, t) })
    val schema = AvroSchemaConverter.toAvro(st, "row", None, None)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(d, f"part-$n%05d.avro"))
    w.close()
    AvroFileSource.appendSnapshot(d, "append")
  }

  private def inferred(d: File, asOf: Option[Long])
      : Seq[(String, DataType)] = {
    import scala.jdk.CollectionConverters._
    val opts = Map("path" -> d.getPath) ++
      asOf.map(v => "versionAsOf" -> v.toString)
    new AvroFileSource().inferSchema(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts.asJava))
      .fields.toSeq.map(f => (f.name, f.dataType))
  }

  private def widened(t: DataType): Option[DataType] = t match {
    case IntegerType => Some(LongType)
    case LongType => Some(DoubleType)
    case _ => None
  }

  property("live and as-of inference both equal the model at every step") =
    Prop.forAll(opsGen) { ops =>
      val d = new File(graft.operators.Catalog.tempDir("graft_evolaw"))
      val pool = Iterator.from(0).map(i => s"c$i")
      // nested model (r20): "s_base" is a struct column whose field
      // list evolves through dotted ADD/DROP alongside the top level;
      // a top-level Drop may remove the whole struct (nested ops then
      // no-op — the parent is gone and its dotted names stay retired)
      var nested = Vector[(String, DataType)](("f0", IntegerType))
      def structOf(fs: Vector[(String, DataType)]): DataType =
        StructType(fs.map { case (c, t) => StructField(c, t) })
      // model: current visible (name, type) list; new columns start
      // INT so the widen chain int -> long -> double is reachable
      var cols = Vector[(String, DataType)](("c_base", IntegerType),
        ("s_base", structOf(nested)))
      def syncStruct(): Unit = {
        val i = cols.indexWhere(_._1 == "s_base")
        if (i >= 0) cols = cols.updated(i, ("s_base", structOf(nested)))
      }
      var retired = Set.empty[String]
      var fileNo = 0
      var versions = Map.empty[Long, Vector[(String, DataType)]]
      writeFile(d, cols, { fileNo += 1; fileNo }) // the table must exist
      versions += AvroFileSource.readSnapshots(d).last.version -> cols
      var ok = true
      ops.foreach { op =>
        op match {
          case Write =>
            writeFile(d, cols, { fileNo += 1; fileNo })
          case Add =>
            val name = pool.next()
            AvroMaintenance.addColumn(d.getPath,
              StructField(name, IntegerType))
            cols :+= ((name, IntegerType))
          case Drop if cols.size >= 2 =>
            // drop a deterministic victim (the middle column) so drops
            // hit both file-born and evo-added columns across runs
            val victim = cols(cols.size / 2)._1
            AvroMaintenance.dropColumn(d.getPath, victim)
            cols = cols.filterNot(_._1 == victim)
            retired += victim
          case Drop => () // cannot drop the last column
          case Widen =>
            // widen a deterministic victim: the first still-widenable
            // column, exercising both file-born and evo-added ones
            cols.zipWithIndex.collectFirst {
              case ((n, t), i) if widened(t).isDefined => (n, t, i)
            } match {
              case Some((name, t, i)) =>
                val nt = widened(t).get
                AvroMaintenance.widenColumn(d.getPath, name, nt)
                cols = cols.updated(i, (name, nt))
              case None => () // all doubles already
            }
          case AddNested if cols.exists(_._1 == "s_base") =>
            val name = "n" + pool.next()
            AvroMaintenance.addColumn(d.getPath,
              StructField(s"s_base.$name", IntegerType))
            nested :+= ((name, IntegerType))
            syncStruct()
          case AddNested => () // the struct itself was dropped
          case DropNested
              if cols.exists(_._1 == "s_base") && nested.size >= 2 =>
            val victim = nested(nested.size / 2)._1
            AvroMaintenance.dropColumn(d.getPath, s"s_base.$victim")
            nested = nested.filterNot(_._1 == victim)
            retired += s"s_base.$victim"
            syncStruct()
          case DropNested => () // gone or down to the last field
        }
        versions += AvroFileSource.readSnapshots(d).last.version -> cols
        ok &&= inferred(d, None) == cols
      }
      // retired names are closed forever
      retired.foreach { r =>
        ok &&= scala.util.Try(
          AvroMaintenance.addColumn(d.getPath, StructField(r, LongType)))
          .isFailure
      }
      // every recorded version replays its own column list
      versions.foreach { case (v, expect) =>
        ok &&= inferred(d, Some(v)) == expect
      }
      ok
    }
}
