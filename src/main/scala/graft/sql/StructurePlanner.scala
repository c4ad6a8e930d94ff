package graft.sql

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

import FlattenPlanner.{Projection, Identity, Columns, quotePath}

/** Structure-preserving ("withstructure") projection compiler
  * (reference operators O8-O11, SURVEY.md §2.2).
  *
  * Recursive record rebuild: at each nesting level, apply that level's
  * selections (cherry-pick / rename / reorder); levels with no selection at
  * or below them copy the whole subtree as-is; recursion descends through
  * STRUCT, ARRAY (per element, via `transform`) and MAP (per value / key
  * cherry-pick) — reference value walk at AvroSql.scala:187-305, schema walk
  * at AvroSchemaSql.scala:244-317. Everything compiles to built-in Catalyst
  * expressions (`CreateNamedStruct`, `ArrayTransform`, `TransformValues`,
  * `MapFromEntries`) so the whole rebuild stays inside whole-stage codegen —
  * no per-row JVM object churn, safe at 100 TB.
  *
  * Level semantics pinned by AvroSqlWithRetainStructureTest.scala:
  *  - output fields appear in first-mention select-list order; a deeper
  *    selection (`ingredients.name`) pins its top segment at the position of
  *    its first mention (tests at :249-290)
  *  - `*` at a level expands the remaining (unmentioned) fields at the
  *    star's position, in schema order (tests at :83-128, 204-246)
  *  - a level with no selections below it is copied unchanged
  *  - explicit selection copies the whole subtree (`ingredients as stuff`,
  *    test :99) unless deeper selections refine it
  *
  * MAP semantics follow the documented intent of the reference's `fromMap`
  * (AvroSql.scala:246-278): explicitly selected names at a map's level are
  * KEY cherry-picks with rename (`m + (name -> alias)`); `*` keeps all keys;
  * a deeper path keeps that key and projects inside its value. (The
  * reference's own implementation of the explicit-key branch is unreachable
  * due to a filter bug at AvroSql.scala:262 and is untested — we implement
  * the intended semantics.)
  */
object StructurePlanner {

  def plan(q: SelectQuery, schema: StructType): Projection = {
    if (q.fields.lengthCompare(1) == 0 && q.fields.head.isStar &&
        !q.fields.head.hasParents) return Identity

    // Validate every explicit path resolves (arrays/maps are transparent).
    q.fields.filterNot(_.isStar).foreach(f => resolveThrough(schema, f.path))
    q.fields.filter(f => f.isStar && f.hasParents)
      .foreach(f => resolveThrough(schema, f.parents) match {
        case _: StructType | _: MapType => // map star = keep all keys (O11)
        case other => throw new IllegalArgumentException(
          s"'${f.parents.mkString(".")}.*' requires a struct or map, found " +
            other.simpleString)
      })

    val entries = q.entriesAt(Nil)
    if (entries.isEmpty)
      throw new IllegalArgumentException("empty selection")
    Columns(levelColumns(schema, Nil, n => F.col(quotePath(Seq(n))), q))
  }

  /** Columns for one struct level, in first-mention order. */
  private def levelColumns(
      st: StructType,
      path: Seq[String],
      get: String => Column,
      q: SelectQuery): Seq[Column] = {
    val entries = q.entriesAt(path)
    val explicitNames =
      entries.collect { case Left(f) if !f.isStar => f.name }.toSet
    val traversed = entries.collect { case Right(s) => s }.toSet

    entries.flatMap {
      case Left(f) if f.isStar =>
        st.fields.toSeq
          .filterNot(x => explicitNames(x.name) || traversed(x.name))
          .map(x => rebuild(x.dataType, x.nullable, get(x.name), path :+ x.name, q)
            .alias(x.name))
      case Left(f) =>
        val sf = st.fields.find(_.name == f.name).getOrElse(
          throw new IllegalArgumentException(
            s"'${(path :+ f.name).mkString(".")}' can't be found in " +
              s"struct<${st.fieldNames.mkString(",")}>"))
        Seq(rebuild(sf.dataType, sf.nullable, get(f.name), path :+ f.name, q)
          .alias(f.alias))
      case Right(seg) =>
        val sf = st.fields.find(_.name == seg).getOrElse(
          throw new IllegalArgumentException(
            s"'${(path :+ seg).mkString(".")}' can't be found in " +
              s"struct<${st.fieldNames.mkString(",")}>"))
        Seq(rebuild(sf.dataType, sf.nullable, get(seg), path :+ seg, q)
          .alias(seg))
    }
  }

  /** Rebuild a value of type `dt` located at `path`, applying any selections
    * at or below that path; returns `ref` unchanged when there are none.
    */
  private def rebuild(
      dt: DataType,
      nullable: Boolean,
      ref: Column,
      path: Seq[String],
      q: SelectQuery): Column = dt match {

    case st: StructType =>
      if (q.entriesAt(path).isEmpty && !hasSelectionBelow(q, path)) ref
      else {
        val built = F.struct(levelColumns(st, path, n => ref.getField(n), q): _*)
        if (nullable) F.when(ref.isNotNull, built) else built
      }

    case ArrayType(et, containsNull) =>
      if (!hasSelectionAtOrBelow(q, path)) ref
      else F.transform(ref, x => rebuild(et, containsNull, x, path, q))

    case MapType(_, vt, vn) =>
      val entries = q.entriesAt(path)
      if (entries.isEmpty) ref
      else {
        val lefts = entries.collect { case Left(f) => f }
        val hasStar = lefts.exists(_.isStar)
        val keptKeys = lefts.filterNot(_.isStar).map(f => f.name -> f.alias) ++
          entries.collect { case Right(seg) => seg -> seg }

        // Deeper selections project map VALUES uniformly (a Spark map has a
        // single value type, so per-key heterogeneous projection is
        // untypeable): strip the key segment from each deeper path and apply
        // the union of those selections to every kept entry's value.
        val valueFields = q.fields.collect {
          case f if f.parents.startsWith(path) &&
            f.parents.lengthCompare(path.length) > 0 =>
            f.copy(parents = path ++ f.parents.drop(path.length + 1))
        }
        val qv = q.copy(fields = valueFields)
        def projectValue(v: Column): Column =
          if (valueFields.isEmpty) v else rebuild(vt, vn, v, path, qv)

        val renames = keptKeys.filter { case (n, a) => n != a }
        if (hasStar && keptKeys.isEmpty && valueFields.isEmpty) ref
        else {
          val filtered =
            if (hasStar) F.map_entries(ref)
            else F.filter(F.map_entries(ref),
              e => e.getField("key").isin(keptKeys.map(_._1): _*))
          val rewritten = F.transform(filtered, { e =>
            val k = e.getField("key")
            val newKey = renames.foldLeft(k) { case (acc, (n, a)) =>
              F.when(k === F.lit(n), F.lit(a)).otherwise(acc)
            }
            F.struct(newKey.alias("key"),
              projectValue(e.getField("value")).alias("value"))
          })
          val built = F.map_from_entries(rewritten)
          if (nullable) F.when(ref.isNotNull, built) else built
        }
      }

    case _ =>
      if (hasSelectionBelow(q, path))
        throw new IllegalArgumentException(
          s"cannot select below scalar field '${path.mkString(".")}'")
      ref
  }

  private def hasSelectionBelow(q: SelectQuery, path: Seq[String]): Boolean =
    q.fields.exists(f =>
      f.parents.startsWith(path) && f.parents.lengthCompare(path.length) > 0)

  private def hasSelectionAtOrBelow(q: SelectQuery, path: Seq[String]): Boolean =
    q.fields.exists(f => f.parents.startsWith(path))

  /** Resolve a path where ARRAY elements and MAP values are transparent
    * (structure mode descends through them per element / per value).
    */
  def resolveThrough(schema: StructType, path: Seq[String]): DataType = {
    def unwrap(dt: DataType): DataType = dt match {
      case ArrayType(et, _) => unwrap(et)
      case other => other
    }
    var dt: DataType = schema
    path.foreach { seg =>
      dt = unwrap(dt) match {
        case st: StructType =>
          st.fields.find(_.name == seg).getOrElse(
            throw new IllegalArgumentException(
              s"Invalid field selection: '${path.mkString(".")}' — '$seg' " +
                s"not found in struct<${st.fieldNames.mkString(",")}>")
          ).dataType
        case MapType(_, v, _) => v // seg addresses a map key; value type next
        case other =>
          throw new IllegalArgumentException(
            s"Invalid field selection: '${path.mkString(".")}' — cannot " +
              s"descend into ${other.simpleString} at '$seg'")
      }
    }
    unwrap(dt)
  }
}
