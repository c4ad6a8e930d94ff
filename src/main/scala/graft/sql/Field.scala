package graft.sql

/** Select-list IR.
  *
  * Re-expresses the field descriptors of the reference's (unvendored)
  * `com.landoop:sql-core` dependency, whose API is inferred from call sites
  * (reference: AvroSql.scala:21, AvroSchemaSql.scala:19 — see SURVEY.md §2.1).
  *
  * @param name    field name at its nesting level, or the literal "*"
  * @param alias   output name (defaults to `name` when no AS clause)
  * @param parents dotted-path prefix, e.g. `address.street.name` has
  *                parents = Seq("address","street"), name = "name"
  */
final case class Field(name: String, alias: String, parents: Seq[String]) {
  def isStar: Boolean = name == "*"
  def path: Seq[String] = parents :+ name
  def hasParents: Boolean = parents.nonEmpty
}

object Field {
  def apply(name: String): Field = Field(name, name, Nil)
}

/** A parsed projection query: `SELECT <items> [FROM <table>] [withstructure]`.
  *
  * Only the select list carries semantics; FROM is decorative (the reference
  * never reads it — AvroSql.scala:75,79) but we keep it so `df.sql` /
  * multi-table contexts can resolve a source table when they want to.
  */
final case class SelectQuery(
    fields: Seq[Field],
    from: Option[String],
    withStructure: Boolean) {

  /** Ordered select entries that sit exactly at nesting level `parents`,
    * plus the child segments that must be traversed to reach deeper
    * selections — the reimplementation of sql-core's
    * `SqlContext.getFieldsForPath` (SURVEY.md §2.1).
    *
    * Left(field)  = explicitly selected at this level (may be "*")
    * Right(seg)   = intermediate path segment first mentioned here
    *
    * Entries are in first-mention select-list order; an empty result means
    * "nothing selected at/below this level → copy everything".
    */
  def entriesAt(parents: Seq[String]): Seq[Either[Field, String]] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[Either[Field, String], Unit]
    fields.foreach { f =>
      if (f.parents == parents) out.put(Left(f), ())
      else if (f.parents.startsWith(parents) && f.parents.lengthCompare(parents.length) > 0)
        out.put(Right(f.parents(parents.length)), ())
    }
    out.keys.toSeq
  }
}
