package graft.sql

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Flatten-mode projection compiler (reference operators O2-O7, SURVEY.md §2.2).
  *
  * Compiles a parsed select list + input `StructType` into Catalyst `Column`s
  * — planned ONCE per query, unlike the reference which replans per record
  * (AvroSql.scala:74-82). Execution is then whole-stage-codegen'd by Tungsten;
  * projections are narrow (no shuffle), so this scales linearly with input
  * splits on a cluster.
  *
  * Semantics pinned by the reference behavioural suite (AvroSqlTest.scala):
  *  - nested path `a.b.c` → one flat output column (AvroSql.scala:118-162)
  *  - `*` / `a.b.*` expands at that level MINUS sibling fields explicitly
  *    selected at the same level, interleaved at the star's select-list
  *    position (AvroSql.scala:134-153)
  *  - name collisions get `_1`, `_2`… suffixes in select order
  *    (AvroSchemaSql.scala:161-171)
  *  - duplicate explicit selection of the same field at the same level with
  *    the same output name → error (AvroSchemaSql.scala:145-159)
  *  - selecting an ARRAY or MAP typed column in flatten mode → error; bare
  *    `SELECT *` alone is identity and exempt (AvroSchemaSql.scala:113-128)
  *  - unknown path → error (AvroSqlTest.scala:238-248)
  */
object FlattenPlanner {

  /** A planned projection: either the identity (`SELECT *` alone) or an
    * explicit column list.
    */
  sealed trait Projection
  case object Identity extends Projection
  final case class Columns(cols: Seq[Column]) extends Projection

  def plan(q: SelectQuery, schema: StructType): Projection = {
    if (q.fields.lengthCompare(1) == 0 && q.fields.head.isStar &&
        !q.fields.head.hasParents) return Identity

    rejectDuplicates(q.fields)

    // Expand stars: `*` at level P → fields of the struct at P, in schema
    // order, minus names explicitly selected at the same level.
    val explicitAt: Map[Seq[String], Set[String]] =
      q.fields.filterNot(_.isStar).groupBy(_.parents)
        .map { case (p, fs) => p -> fs.map(_.name).toSet }
        .withDefaultValue(Set.empty)

    val expanded: Seq[Field] = q.fields.flatMap { f =>
      if (f.isStar) {
        val st = structAt(schema, f.parents)
        st.fields.toSeq
          .filterNot(x => explicitAt(f.parents).contains(x.name))
          .map(x => Field(x.name, x.name, f.parents))
      } else {
        resolve(schema, f.path) // throws if missing
        Seq(f)
      }
    }

    // Flatten restriction (O7): no ARRAY/MAP typed output columns.
    expanded.foreach { f =>
      resolve(schema, f.path) match {
        case _: ArrayType | _: MapType =>
          throw new IllegalArgumentException(
            s"Can't flatten '${f.path.mkString(".")}': ARRAY/MAP columns are " +
              "not allowed in flatten mode (use withstructure)")
        case _ =>
      }
    }

    // `_N` collision suffixes in select order (O5).
    val used = scala.collection.mutable.HashSet.empty[String]
    val cols = expanded.map { f =>
      val name = nextFreeName(f.alias, used)
      used += name
      F.col(quotePath(f.path)).alias(name)
    }
    Columns(cols)
  }

  private def rejectDuplicates(fields: Seq[Field]): Unit = {
    val dups = fields.filterNot(_.isStar)
      .groupBy(f => (f.parents, f.name, f.alias))
      .collect { case (k, fs) if fs.lengthCompare(1) > 0 => k }
    if (dups.nonEmpty)
      throw new IllegalArgumentException(
        s"Invalid select: field '${dups.head._2}' selected more than once at " +
          "the same level with the same output name")
  }

  private def nextFreeName(base: String, used: collection.Set[String]): String =
    if (!used.contains(base)) base
    else Iterator.from(1).map(i => s"${base}_$i").find(!used.contains(_)).get

  /** Resolve a dotted path through structs (and map values) to its type.
    * Throws IllegalArgumentException on a missing segment, matching the
    * reference's error contract (AvroSqlTest.scala:238-248).
    */
  def resolve(schema: StructType, path: Seq[String]): DataType = {
    var dt: DataType = schema
    path.foreach { seg =>
      dt = dt match {
        case st: StructType =>
          st.fields.find(_.name == seg).getOrElse(
            throw new IllegalArgumentException(
              s"Invalid field selection: '${path.mkString(".")}' — '$seg' " +
                s"not found in struct<${st.fieldNames.mkString(",")}>")
          ).dataType
        case MapType(_, v, _) => v // map navigation by key (GetMapValue)
        case other =>
          throw new IllegalArgumentException(
            s"Invalid field selection: '${path.mkString(".")}' — cannot " +
              s"descend into ${other.simpleString} at '$seg'")
      }
    }
    dt
  }

  /** The struct a (possibly empty) parent path points at; errors otherwise. */
  def structAt(schema: StructType, parents: Seq[String]): StructType =
    (if (parents.isEmpty) schema else resolve(schema, parents)) match {
      case st: StructType => st
      case other =>
        throw new IllegalArgumentException(
          s"'${parents.mkString(".")}.*' requires a struct, found " +
            other.simpleString)
    }

  def quotePath(path: Seq[String]): String =
    path.map(s => "`" + s.replace("`", "``") + "`").mkString(".")
}
