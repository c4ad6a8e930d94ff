package graft.avro

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericRecord, IndexedRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.sql.{Field, GraftSql, SelectParser, SelectQuery}

import scala.jdk.CollectionConverters._

/** A bare primitive value + its schema — the engine's analogue of the
  * reference's `NonRecordContainer` input kind (AvroSql.scala:70; the
  * Confluent class itself is a Kafka-serializer type not present here).
  */
final case class AvroPrimitive(value: Any, schema: Schema)

/** The reference's public surface, re-expressed on the Spark engine
  * (reference: `record.sql("SELECT …")`, AvroSql.scala:43-65, README.md:8-13).
  *
  * A single record round-trips through a 1-row DataFrame: Avro schema →
  * `StructType` → GraftSql projection plan → projected Row → derived output
  * Avro schema (names/docs/props restored from `avro.*` metadata, O15) →
  * `GenericRecord`. Contract parity:
  *  - `null` input → `null` output (AvroSql.scala:68)
  *  - primitive containers accept only `SELECT *` (AvroSql.scala:106-131)
  *  - all planning errors are `IllegalArgumentException`s
  *
  * The per-record API exists for parity and tests; the intended bulk path
  * is [[AvroBridge.toDF]] → `df.sql(query)` → [[AvroBridge.fromDF]], where
  * one plan serves every record and Catalyst/Tungsten execute it.
  */
object AvroSql {

  object implicits {
    implicit class AvroRecordSqlOps(val record: IndexedRecord) {
      def sql(query: String)(implicit spark: SparkSession): GenericRecord =
        AvroSql.sql(record, query)
      /** EP3 parity (reference AvroSql.scala:86-103): pre-parsed fields —
        * the host-integration path where the caller already parsed KCQL.
        */
      def sql(fields: Seq[Field], flatten: Boolean)(implicit spark: SparkSession): GenericRecord =
        AvroSql.sql(record, fields, flatten)
    }
    implicit class AvroPrimitiveSqlOps(val p: AvroPrimitive) {
      def sql(query: String): AvroPrimitive = AvroSql.sqlPrimitive(p, query)
    }
  }

  def sql(record: IndexedRecord, query: String)(implicit spark: SparkSession): GenericRecord =
    run(record, df => project(df, query))

  /** EP3: pre-parsed select-list fields + explicit mode. */
  def sql(record: IndexedRecord, fields: Seq[Field], flatten: Boolean)(
      implicit spark: SparkSession): GenericRecord =
    run(record, { df =>
      val q = SelectQuery(fields, None, withStructure = !flatten)
      GraftSql.plan(q, df.schema) match {
        case graft.sql.FlattenPlanner.Identity => df
        case graft.sql.FlattenPlanner.Columns(cols) => df.select(cols: _*)
      }
    })

  private def run(record: IndexedRecord, proj: DataFrame => DataFrame)(
      implicit spark: SparkSession): GenericRecord = {
    if (record == null) return null
    val inSchema = record.getSchema
    require(inSchema.getType == Schema.Type.RECORD,
      s"only RECORD containers are supported, got ${inSchema.getType}")
    val struct = AvroSchemaConverter.toStruct(inSchema)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(AvroRowCodec.toRow(record, struct)), struct)
    val out = proj(df)
    val (name, ns, doc) = AvroSchemaConverter.recordInfo(inSchema)
    val outAvro = AvroSchemaConverter.toAvro(out.schema, name, ns, doc)
    AvroRowCodec.fromRow(out.head(), out.schema, outAvro)
  }

  /** Primitive container: only `SELECT *` is legal and is the identity
    * (AvroSql.scala:106-131); any named selection throws.
    */
  def sqlPrimitive(p: AvroPrimitive, query: String): AvroPrimitive = {
    if (p == null) return null
    val q = SelectParser.parse(query)
    val bare = q.fields match {
      case Seq(f) => f.isStar && !f.hasParents
      case _ => false
    }
    require(bare, s"only SELECT * is supported for primitive containers: $query")
    p
  }

  private def project(df: DataFrame, query: String): DataFrame = {
    import GraftSql.implicits._
    df.sql(query)
  }

  /** Derive the output Avro schema a query would produce for an input
    * schema — the reference's schema phase alone (AvroSchemaSql.scala) —
    * by planning against an empty relation (no data is touched).
    */
  def outputSchema(spark: SparkSession, inSchema: Schema, query: String): Schema = {
    val struct = AvroSchemaConverter.toStruct(inSchema)
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[Row](), struct)
    val out = project(empty, query)
    val (name, ns, doc) = AvroSchemaConverter.recordInfo(inSchema)
    AvroSchemaConverter.toAvro(out.schema, name, ns, doc)
  }
}

/** Bulk Avro ⇄ DataFrame bridge — the Spark-first path: plan once, let
  * Catalyst execute over all records.
  */
object AvroBridge {

  /** Records (all sharing `schema`) → DataFrame with `avro.*` metadata. */
  def toDF(spark: SparkSession, schema: Schema, records: Seq[IndexedRecord]): DataFrame = {
    val struct = AvroSchemaConverter.toStruct(schema)
    spark.createDataFrame(
      records.map(AvroRowCodec.toRow(_, struct)).asJava, struct)
  }

  /** DataFrame → records under a derived Avro schema. Driver-side collect:
    * intended for bounded results (tests, per-message sinks) — large sinks
    * should keep writing with DataFrame writers instead.
    */
  def fromDF(df: DataFrame, name: String, namespace: Option[String] = None,
      doc: Option[String] = None): (Schema, Seq[GenericRecord]) = {
    val avro = AvroSchemaConverter.toAvro(df.schema, name, namespace, doc)
    (avro, df.collect().toSeq.map(AvroRowCodec.fromRow(_, df.schema, avro)))
  }
}
