package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.StructType

/** Public API of the projection engine — the Spark-native generalisation of
  * the reference's `record.sql("SELECT …")` surface (README.md:8-13,
  * AvroSql.scala:43-65): the same record-shaping query, applied to every row
  * of a DataFrame (batch or streaming — projections are stateless).
  *
  * Two modes, exactly as the reference:
  *  - flatten (default): nested paths become flat output columns
  *  - `withstructure` (trailing keyword): nesting retained; fields are
  *    cherry-picked / renamed / reordered in place
  *
  * Planning happens once per query against the DataFrame schema (the
  * reference replans per record — AvroSql.scala:74-82); execution is a single
  * narrow `select` that Catalyst prunes/pushes down and Tungsten codegens.
  */
object GraftSql {

  /** Parse + plan a query against a schema. Errors (parse failure, unknown
    * field, illegal flatten of array/map, duplicate selection) throw
    * IllegalArgumentException, matching the reference's contract.
    */
  def plan(query: String, schema: StructType): FlattenPlanner.Projection = {
    val q = SelectParser.parse(query)
    plan(q, schema)
  }

  def plan(q: SelectQuery, schema: StructType): FlattenPlanner.Projection =
    if (q.withStructure) StructurePlanner.plan(q, schema)
    else FlattenPlanner.plan(q, schema)

  /** Columns for a planned query, or None for the identity projection. */
  def columns(query: String, schema: StructType): Option[Seq[Column]] =
    plan(query, schema) match {
      case FlattenPlanner.Identity => None
      case FlattenPlanner.Columns(cols) => Some(cols)
    }

  object implicits {
    implicit class DataFrameSqlOps(val df: DataFrame) {
      /** `df.sql("SELECT a.b as x, * [FROM t] [withstructure]")` */
      def sql(query: String): DataFrame =
        columns(query, df.schema) match {
          case None => df
          case Some(cols) => df.select(cols: _*)
        }
    }
  }
}
