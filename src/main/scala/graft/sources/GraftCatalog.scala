package graft.sources

import java.io.File
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange,
  SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 [[TableCatalog]] over a directory tree of graft-avro tables —
  * the SQL-surface entry point: register as
  * `spark.sql.catalog.<name> = graft.sources.GraftCatalog` with
  * `spark.sql.catalog.<name>.root = /data/root`, then
  * `CREATE NAMESPACE`, `CREATE TABLE [AS SELECT]`, `INSERT INTO`,
  * `SELECT`, and metadata `DELETE FROM … WHERE` all work through plain
  * `spark.sql`. Layout: `root/ns…/table/` — each table directory is an
  * ordinary graft-avro dataset (every sidecar/manifest feature rides
  * along). An empty created table persists its DDL schema (and default
  * partition columns) in a `_graft_schema` sidecar; once data exists the
  * usual latest-schema-wins inference takes over, so SQL DDL and
  * path-based writes stay interchangeable.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.ViewCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog {

  private var catName: String = _
  private var root: File = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    root = new File(Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' needs option 'root'")))
    root.mkdirs()
  }

  override def name(): String = catName

  /** Declared so ALTER TABLE … ADD COLUMN … DEFAULT v reaches
    * [[alterTable]] (Spark gates DEFAULT syntax on this capability).
    */
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog
        .TableCatalogCapability] =
    Set(org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_TABLE_CONSTRAINT).asJava

  private def check(seg: String): String = {
    require(seg.nonEmpty && !seg.contains('/') && !seg.contains('\\') &&
      seg != "." && seg != ".." && !seg.startsWith("_graft"),
      s"graft catalog: illegal name segment '$seg'")
    seg
  }

  private def nsDir(ns: Array[String]): File =
    ns.foldLeft(root)((d, s) => new File(d, check(s)))

  private def tableDir(ident: Identifier): File =
    new File(nsDir(ident.namespace()), check(ident.name()))

  private def schemaFile(d: File): File = new File(d, "_graft_schema")

  private def hasData(d: File): Boolean =
    AvroFileSource.listAvro(d).nonEmpty

  // ---- tables ---------------------------------------------------------

  override def listTables(ns: Array[String]): Array[Identifier] = {
    val d = nsDir(ns)
    if (!d.isDirectory) throw new NoSuchNamespaceException(ns)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !f.getName.startsWith("_graft"))
      .filter(f => schemaFile(f).isFile || hasData(f))
      .map(f => Identifier.of(ns, f.getName))
  }

  override def tableExists(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    d.isDirectory && (schemaFile(d).isFile || hasData(d))
  }

  override def loadTable(ident: Identifier): Table = {
    // metadata-table suffix: `cat.ns.tbl.history` arrives as
    // namespace [ns, tbl] + name "history" — serve the sidecar view
    // when the base identifier is a real table and no actual table
    // shadows the suffixed name
    if (!tableExists(ident) && ident.namespace().nonEmpty &&
        GraftMetaTables.Names.contains(ident.name())) {
      val base = Identifier.of(ident.namespace().dropRight(1),
        ident.namespace().last)
      if (tableExists(base))
        return GraftMetaTables(
          (ident.namespace() :+ ident.name()).mkString("."),
          ident.name(), tableDir(base))
    }
    // `cat.ns.tbl.changes`: the streaming CDC feed as a catalog-
    // addressable view — `spark.readStream.table("cat.ns.tbl.changes")`
    // (+ startingVersion/maxVersionsPerTrigger reader options). Read-
    // only; batch SELECTs refuse with a pointer at
    // AvroMaintenance.changes. A REAL table named `changes` shadows the
    // view, same rule as the metadata tables.
    if (!tableExists(ident) && ident.namespace().nonEmpty &&
        ident.name() == "changes") {
      val base = Identifier.of(ident.namespace().dropRight(1),
        ident.namespace().last)
      if (tableExists(base)) {
        val d = tableDir(base)
        // base schema via the normal loadTable path (NOT raw file
        // inference): a DDL-created never-written or truncated table has
        // no data files to infer over — its schema lives in the
        // `_graft_schema` sidecar. The stream itself still raises the
        // CDC-specific "no snapshot journal" error at start when the
        // table was never written through the source.
        val schema = StructType(
          loadTable(base).asInstanceOf[AvroTable].tableSchema.fields.toSeq
            ++ Seq(
            org.apache.spark.sql.types.StructField(
              AvroFileSource.CdcChangeType,
              org.apache.spark.sql.types.StringType, nullable = false),
            org.apache.spark.sql.types.StructField(
              AvroFileSource.CdcCommitVersion,
              org.apache.spark.sql.types.LongType, nullable = false)))
        return AvroTable(d.getPath, schema,
          travelOptions = Map("readChangeFeed" -> "true"))
      }
    }
    val d = tableDir(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    // matview staleness budget (r18): a view that opted in via
    // CALL system.set_matview_staleness refreshes itself lazily here
    // when its last verification is older than the budget — under the
    // view lock (concurrent readers serialize, losers no-op); fresh
    // views cost one sidecar stat and zero jobs
    GraftMatviews.maybeRefreshStale(
      org.apache.spark.sql.SparkSession.active, d)
    val (ddlSchema: Option[StructType], parts: Seq[String]) =
      if (schemaFile(d).isFile) {
        val lines = new String(java.nio.file.Files.readAllBytes(
          schemaFile(d).toPath), "UTF-8").split('\n')
        (Some(org.apache.spark.sql.types.DataType.fromJson(lines(0))
          .asInstanceOf[StructType]),
          if (lines.length > 1 && lines(1).nonEmpty)
            lines(1).split(',').toSeq else Nil)
      } else (None, Nil)
    val schema =
      if (hasData(d)) {
        // live data wins (latest-schema-wins evolution, renames applied)
        val opts = new CaseInsensitiveStringMap(
          Map("path" -> d.getPath).asJava)
        new AvroFileSource().inferSchema(opts)
      } else {
        // an evolved-then-truncated table must keep its ALTERs: replay
        // renames (the DDL schema predates every rename version) and
        // the evolution journal over the sidecar schema too
        val base = ddlSchema.getOrElse(
          throw new IllegalStateException(
            s"graft catalog: table $ident has neither data nor a schema"))
        val renamed = StructType(base.fields.map { f =>
          val nn = AvroFileSource.readColmap(d)
            .foldLeft(f.name) { case (n, (_, from, to)) =>
              if (n == from) to else n
            }
          if (nn == f.name) f else f.copy(name = nn)
        })
        AvroFileSource.applyEvo(d, renamed, None)
      }
    AvroTable(d.getPath, schema, defaultPartitionBy = parts)
  }

  /** SQL `VERSION AS OF x`: numeric = snapshot version, anything else =
    * a named tag (so `VERSION AS OF 'release-1'` reads the tagged
    * snapshot). The table's schema is re-inferred over the SNAPSHOT's
    * own files — an overwrite that changed the schema must not leak the
    * new column set into a pre-overwrite version.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val d = tableDir(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val travel = scala.util.Try(version.toLong).toOption match {
      case Some(v) => Map("versionAsOf" -> v.toString)
      case None => Map("tagAsOf" -> version)
    }
    val schema = new AvroFileSource().inferSchema(
      new CaseInsensitiveStringMap(
        (travel + ("path" -> d.getPath)).asJava))
    AvroTable(d.getPath, schema, travelOptions = travel)
  }

  /** SQL `TIMESTAMP AS OF t`: DSv2 hands MICROseconds since epoch; the
    * snapshot journal stamps millis.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val d = tableDir(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val travel = Map("timestampAsOf" -> (timestamp / 1000L).toString)
    val schema = new AvroFileSource().inferSchema(
      new CaseInsensitiveStringMap(
        (travel + ("path" -> d.getPath)).asJava))
    AvroTable(d.getPath, schema, travelOptions = travel)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String])
      : Table = {
    val d = tableDir(ident)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    // mirror createView's converse guard: a table must not silently
    // shadow a persistent view (reads would resolve to the table while
    // SHOW VIEWS still lists the view)
    if (viewExists(ident)) throw new IllegalStateException(
      s"graft catalog: a view named ${ident.toString} exists — " +
        "DROP the view first (CALL system.drop_view)")
    AvroTable(d.getPath, schema,
      defaultPartitionBy = initTableDir(d, schema, partitions, properties))
  }

  /** Shared CREATE machinery: materialize a table directory's DDL
    * sidecars — schema + identity partition columns in `_graft_schema`,
    * graft.* writer-layout properties (plus any `bucket(n, col)`
    * transforms as `graft.bucketBy`) in `_graft_props`. Returns the
    * identity partition columns. Used by [[createTable]] directly and
    * by the atomic staged CTAS/RTAS path on its staging directory.
    */
  private def initTableDir(d: File, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Seq[String] = {
    // identity transforms become hive-style `k=v` directories; `bucket
    // (N, col)` transforms become the hidden hash-bucket layout
    // (`graft.bucketBy` property → `<col>_bucket=` segments + the
    // `_graft_bucket` sidecar on first write)
    val idParts = partitions.toSeq.collect {
      case t if t.name() == "identity" && t.references().length == 1 &&
          t.references()(0).fieldNames().length == 1 =>
        t.references()(0).fieldNames()(0)
    }
    val bucketParts = partitions.toSeq.collect {
      case t if t.name() == "bucket" && t.references().length == 1 &&
          t.references()(0).fieldNames().length == 1 =>
        val n = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value().isInstanceOf[Number] =>
            l.value().asInstanceOf[Number].intValue()
        }.getOrElse(throw new UnsupportedOperationException(
          s"graft catalog: bucket transform without a numeric bucket " +
            s"count: $t"))
        (t.references()(0).fieldNames()(0), n)
    }
    // temporal transforms (`PARTITIONED BY (days(ts))` — the Iceberg
    // default table idiom) + `truncate(n, col)`: hidden layouts via
    // the `graft.transformBy` property → `<col>_<kind>=` segments and
    // the `_graft_xform` sidecar on first write (see AvroTransforms)
    val temporalKind = Map("years" -> "year", "months" -> "month",
      "days" -> "day", "hours" -> "hour")
    val xformParts = partitions.toSeq.collect {
      case t if temporalKind.contains(t.name()) &&
          t.references().length == 1 &&
          t.references()(0).fieldNames().length == 1 =>
        Xform(t.references()(0).fieldNames()(0), temporalKind(t.name()), 0)
      case t if t.name() == "truncate" && t.references().length == 1 &&
          t.references()(0).fieldNames().length == 1 =>
        val w = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value().isInstanceOf[Number] =>
            l.value().asInstanceOf[Number].intValue()
        }.getOrElse(throw new UnsupportedOperationException(
          s"graft catalog: truncate transform without a numeric width: $t"))
        require(w > 0,
          s"graft catalog: truncate width must be positive, got $w")
        Xform(t.references()(0).fieldNames()(0), "trunc", w)
    }
    require(
      idParts.length + bucketParts.length + xformParts.length ==
        partitions.length,
      "graft catalog: only identity, bucket(n, col), " +
        "years/months/days/hours(col) and truncate(n, col) partitioning " +
        s"are supported, got ${partitions.mkString(", ")}")
    val parts = idParts
    (parts ++ bucketParts.map(_._1) ++ xformParts.map(_.col)).foreach(c =>
      require(schema.fieldNames.contains(c),
        s"graft catalog: partition column '$c' not in schema"))
    d.mkdirs()
    java.nio.file.Files.write(schemaFile(d).toPath,
      (schema.json + "\n" + parts.mkString(",")).getBytes("UTF-8"))
    // writer-layout properties: only graft.* keys are ours (Spark adds
    // provider/owner/etc. to every CREATE TABLE — not stored)
    val gp = properties.asScala.filter(_._1.startsWith("graft.")).toMap ++
      (if (bucketParts.nonEmpty)
        Map("graft.bucketBy" ->
          bucketParts.map { case (c, n) => s"$c:$n" }.mkString(","))
      else Map.empty) ++
      (if (xformParts.nonEmpty)
        Map("graft.transformBy" -> AvroTransforms.render(xformParts))
      else Map.empty)
    if (gp.nonEmpty) AvroFileSource.writeProps(d, gp)
    parts
  }

  // ---- atomic CTAS / RTAS (StagingTableCatalog) -----------------------
  // Without staging, Spark's fallback REPLACE TABLE AS SELECT is
  // drop-then-create: a failed query DESTROYS the table. Staged: the
  // query writes into a hidden `_graft_stage_*` directory (invisible to
  // listTables/listNamespaces, which skip the _graft prefix), and only
  // a successful write swaps it into place — the old table survives any
  // failure. The swap itself is two directory renames under the
  // namespace commit lock (milliseconds, metadata-only); an abort
  // deletes the staging directory.

  private def deleteRecursively(d: File): Unit = {
    if (!d.exists()) return
    import java.nio.file.{Files => JF, Path}
    JF.walk(d.toPath).sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(p => JF.deleteIfExists(p))
  }

  private def stage(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    require(info.constraints() == null || info.constraints().isEmpty,
      "graft catalog: staged CREATE with constraints is not supported — " +
        "ALTER TABLE ADD CONSTRAINT after creation")
    if (viewExists(ident)) throw new IllegalStateException(
      s"graft catalog: a view named ${ident.toString} exists — " +
        "DROP the view first (CALL system.drop_view)")
    val ns = nsDir(ident.namespace())
    if (!ns.isDirectory) throw new NoSuchNamespaceException(ident.namespace())
    val staging = new File(ns, s"_graft_stage_${check(ident.name())}_" +
      java.util.UUID.randomUUID().toString.take(8))
    val parts = initTableDir(staging, info.schema(), info.partitions(),
      info.properties())
    val target = tableDir(ident)
    val inner = AvroTable(staging.getPath, info.schema(),
      defaultPartitionBy = parts)
    new org.apache.spark.sql.connector.catalog.StagedTable
      with org.apache.spark.sql.connector.catalog.SupportsWrite {
      override def name(): String = ident.toString
      override def schema(): StructType = inner.schema()
      override def partitioning(): Array[Transform] = inner.partitioning()
      override def properties(): util.Map[String, String] =
        inner.properties()
      override def capabilities(): util.Set[
        org.apache.spark.sql.connector.catalog.TableCapability] =
        inner.capabilities()
      override def newWriteBuilder(
          lwi: org.apache.spark.sql.connector.write.LogicalWriteInfo)
          : org.apache.spark.sql.connector.write.WriteBuilder =
        inner.newWriteBuilder(lwi)
      override def commitStagedChanges(): Unit =
        AvroFileSource.withCommitLock(ns) {
          if (target.exists()) {
            // ALSO hold the TARGET table's commit lock (nested — the
            // ThreadLocal depth map composes): every table mutation
            // (batch/stream commit, deleteWhere, …) serializes on the
            // TABLE dir, not the namespace dir, so without this a
            // concurrent INSERT could publish its files/journal entry
            // into the renamed-away directory and be silently deleted
            // with the trash. Serialized, the insert either lands before
            // the swap (REPLACE semantics discard it, ordered) or its
            // commit fails loudly when its staged files vanished with
            // the old directory — never a silent loss.
            AvroFileSource.withCommitLock(target) {
              val trash = new File(ns, s"_graft_stage_trash_" +
                java.util.UUID.randomUUID().toString.take(8))
              if (!target.renameTo(trash)) throw new java.io.IOException(
                s"graft catalog: staged swap failed to move $target aside")
              if (!staging.renameTo(target)) {
                trash.renameTo(target) // restore — the old table survives
                throw new java.io.IOException(
                  s"graft catalog: staged swap failed $staging -> $target" +
                    " — previous table restored")
              }
              deleteRecursively(trash)
            }
          } else if (!staging.renameTo(target))
            throw new java.io.IOException(
              s"graft catalog: staged publish failed $staging -> " +
                s"$target (concurrent create?)")
        }
      override def abortStagedChanges(): Unit = deleteRecursively(staging)
    }
  }

  override def stageCreate(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    stage(ident, info)
  }

  override def stageReplace(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    stage(ident, info)
  }

  override def stageCreateOrReplace(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stage(ident, info)

  /** ALTER TABLE column evolution: ADD COLUMN (appended, forced
    * nullable), DROP COLUMN, RENAME COLUMN — all metadata-only
    * (`_graft_evo` / `_graft_colmap` sidecars, zero data files
    * rewritten) on data-backed tables, a `_graft_schema` sidecar
    * rewrite on empty DDL tables. ADD/DROP COLUMN accept dotted nested
    * paths (`a.b` — every intermediate a plain struct column; r20);
    * RENAME and ALTER TYPE stay top-level. No custom positions, and
    * names dropped from a data-backed table are retired forever —
    * nested drops retire the full dotted path (see
    * [[AvroMaintenance.dropColumn]]).
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val d = tableDir(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val withData = hasData(d)
    // empty DDL tables evolve by rewriting their schema sidecar — reuse
    // it as a tiny functional state thread so several changes compose
    def sidecarState(): (StructType, Seq[String]) = {
      val lines = new String(java.nio.file.Files.readAllBytes(
        schemaFile(d).toPath), "UTF-8").split('\n')
      (org.apache.spark.sql.types.DataType.fromJson(lines(0))
        .asInstanceOf[StructType],
        if (lines.length > 1 && lines(1).nonEmpty)
          lines(1).split(',').toSeq else Nil)
    }
    def writeSidecar(schema: StructType, parts: Seq[String]): Unit = {
      java.nio.file.Files.write(schemaFile(d).toPath,
        (schema.json + "\n" + parts.mkString(",")).getBytes("UTF-8"))
      ()
    }
    def singleName(fieldNames: Array[String], what: String): String = {
      require(fieldNames.length == 1,
        s"graft catalog: $what supports top-level columns only, got " +
          fieldNames.mkString("."))
      fieldNames(0)
    }
    changes.foreach {
      case a: TableChange.AddColumn =>
        // dotted paths (r20): ADD COLUMN a.b appends field b inside
        // struct column a — journaled as the dotted name, validated in
        // AvroMaintenance.addColumn / the sidecar path below
        val name = a.fieldNames().mkString(".")
        require(a.position() == null,
          "graft catalog: ADD COLUMN FIRST/AFTER is not supported — " +
            "columns append at the end")
        require(a.isNullable,
          "graft catalog: added columns must be nullable (existing rows " +
            "resolve to the DEFAULT, or null without one)")
        val meta = Option(a.defaultValue()).map { dv =>
          val lit = dv.getValue
          require(lit != null,
            "graft catalog: only literal DEFAULT values are supported")
          val b = new org.apache.spark.sql.types.MetadataBuilder()
          import org.apache.spark.sql.types._
          (a.dataType(), lit.value()) match {
            case (IntegerType, v: java.lang.Integer) =>
              b.putString(AvroFileSource.DefaultKindKey, "int")
                .putLong(AvroFileSource.DefaultValueKey, v.longValue())
            case (LongType, v: java.lang.Long) =>
              b.putString(AvroFileSource.DefaultKindKey, "long")
                .putLong(AvroFileSource.DefaultValueKey, v.longValue())
            case (DoubleType, v: java.lang.Double) =>
              b.putString(AvroFileSource.DefaultKindKey, "double")
                .putDouble(AvroFileSource.DefaultValueKey, v.doubleValue())
            case (BooleanType, v: java.lang.Boolean) =>
              b.putString(AvroFileSource.DefaultKindKey, "boolean")
                .putBoolean(AvroFileSource.DefaultValueKey, v.booleanValue())
            case (StringType, v: org.apache.spark.unsafe.types.UTF8String) =>
              b.putString(AvroFileSource.DefaultKindKey, "string")
                .putString(AvroFileSource.DefaultValueKey, v.toString)
            case (t, v) => throw new UnsupportedOperationException(
              s"graft catalog: DEFAULT for type ${t.simpleString} " +
                s"(literal $v) is not supported — int/long/double/" +
                "boolean/string only")
          }
          // Spark's analyzer fills INSERT column-list gaps from these
          b.putString("CURRENT_DEFAULT", dv.getSql)
            .putString("EXISTS_DEFAULT", dv.getSql)
            .build()
        }.getOrElse(org.apache.spark.sql.types.Metadata.empty)
        val field = org.apache.spark.sql.types.StructField(
          name, a.dataType(), nullable = true, metadata = meta)
        if (withData) AvroMaintenance.addColumn(d.getPath, field)
        else {
          val (st, parts) = sidecarState()
          val segs = a.fieldNames().toSeq
          if (segs.length > 1) {
            require(meta == org.apache.spark.sql.types.Metadata.empty,
              s"graft catalog: DEFAULT on nested '$name' is not " +
                "supported — nested adds fill null on existing rows")
            val parent = AvroFileSource.navStruct(st, segs.init,
              s"graft catalog: ADD COLUMN $name")
            require(!parent.fieldNames.contains(segs.last),
              s"graft catalog: field '$name' already exists")
            writeSidecar(AvroFileSource.mapStructLenient(st, segs.init) {
              inner => StructType(
                inner.fields :+ field.copy(name = segs.last))
            }, parts)
          } else {
            require(!st.fieldNames.contains(name),
              s"graft catalog: column '$name' already exists")
            writeSidecar(StructType(st.fields :+ field), parts)
          }
        }
      case del: TableChange.DeleteColumn =>
        val name = del.fieldNames().mkString(".")
        if (withData) {
          // the DDL sidecar's default-partition list outlives the data
          // inference — future INSERTs still partition by it
          require(!schemaFile(d).isFile || !sidecarState()._2.contains(name),
            s"graft catalog: '$name' is a partition column")
          AvroMaintenance.dropColumn(d.getPath, name)
        } else {
          val (st, parts) = sidecarState()
          val segs = del.fieldNames().toSeq
          if (segs.length > 1) {
            val parent = scala.util.Try(AvroFileSource.navStruct(st,
              segs.init, s"graft catalog: DROP COLUMN $name")).toOption
            val exists = parent.exists(_.fieldNames.contains(segs.last))
            require(exists || del.ifExists(),
              s"graft catalog: no field '$name' to drop")
            if (exists) {
              require(parent.get.fields.length >= 2,
                s"graft catalog: cannot drop the last field of struct " +
                  s"'${segs.init.mkString(".")}'")
              writeSidecar(AvroFileSource.mapStructLenient(st, segs.init) {
                inner =>
                  StructType(inner.fields.filterNot(_.name == segs.last))
              }, parts)
            }
          } else {
          require(st.fieldNames.contains(name) || del.ifExists(),
            s"graft catalog: no column '$name' to drop")
          require(!parts.contains(name),
            s"graft catalog: '$name' is a partition column")
          // same last-column guard as the data-backed path — a
          // zero-field schema is unwritable either way. Names are NOT
          // retired here, intentionally: there are no old data bytes a
          // re-added name could resurrect on a never-written table.
          require(!st.fieldNames.contains(name) || st.fields.length >= 2,
            s"graft catalog: cannot drop the last column '$name'")
          writeSidecar(StructType(
            st.fields.filterNot(_.name == name)), parts)
          }
        }
      case rn: TableChange.RenameColumn =>
        val from = singleName(rn.fieldNames(), "RENAME COLUMN")
        if (withData) AvroMaintenance.renameColumn(d.getPath, from,
          rn.newName())
        else {
          val (st, parts) = sidecarState()
          require(st.fieldNames.contains(from),
            s"graft catalog: no column '$from' to rename")
          require(!st.fieldNames.contains(rn.newName()),
            s"graft catalog: column '${rn.newName()}' already exists")
          require(!parts.contains(from),
            s"graft catalog: '$from' is a partition column")
          writeSidecar(StructType(st.fields.map(f =>
            if (f.name == from) f.copy(name = rn.newName()) else f)), parts)
        }
      case ut: TableChange.UpdateColumnType =>
        val name = singleName(ut.fieldNames(), "ALTER COLUMN TYPE")
        if (withData) AvroMaintenance.widenColumn(d.getPath, name,
          ut.newDataType())
        else {
          import org.apache.spark.sql.types._
          val (st, parts) = sidecarState()
          val f = st.fields.find(_.name == name).getOrElse(
            throw new IllegalArgumentException(
              s"graft catalog: no column '$name' to alter"))
          val ok = (f.dataType, ut.newDataType()) match {
            case (IntegerType, LongType | DoubleType) => true
            case (LongType, DoubleType) => true
            case (FloatType, DoubleType) => true
            case _ => false
          }
          require(ok, s"graft catalog: ${f.dataType.simpleString} -> " +
            s"${ut.newDataType().simpleString} is not a widening " +
            "promotion (int->long, int->double, long->double, " +
            "float->double)")
          require(!parts.contains(name),
            s"graft catalog: '$name' is a partition column")
          writeSidecar(StructType(st.fields.map(x =>
            if (x.name == name) x.copy(dataType = ut.newDataType())
            else x)), parts)
        }
      case ac: TableChange.AddConstraint =>
        ac.constraint() match {
          case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
            require(c.predicateSql() != null && c.predicateSql().nonEmpty,
              "graft catalog: CHECK constraint needs a predicate")
            AvroMaintenance.addConstraint(
              org.apache.spark.sql.SparkSession.active, d.getPath,
              c.name(), c.predicateSql())
          case other => throw new UnsupportedOperationException(
            "graft catalog: only CHECK constraints are enforced — " +
              s"${other.toDDL} (PK/FK/UNIQUE are informational) is not " +
              "stored")
        }
      case dcst: TableChange.DropConstraint =>
        if (AvroFileSource.readConstraints(d).exists(_._1 == dcst.name()))
          AvroMaintenance.dropConstraint(d.getPath, dcst.name())
        else require(dcst.ifExists(),
          s"graft catalog: no constraint '${dcst.name()}' to drop")
      // declarative writer-layout properties (`graft.*` only — anything
      // else is not a concept this format stores)
      case sp: TableChange.SetProperty =>
        require(sp.property().startsWith("graft."),
          s"graft catalog: only graft.* table properties are stored, " +
            s"got '${sp.property()}'")
        AvroFileSource.writeProps(d,
          AvroFileSource.readProps(d) + (sp.property() -> sp.value()))
      case rp: TableChange.RemoveProperty =>
        AvroFileSource.writeProps(d,
          AvroFileSource.readProps(d) - rp.property())
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    if (!tableExists(ident)) return false
    import java.nio.file.{Files => JF, Path}
    JF.walk(d.toPath).sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(p => JF.deleteIfExists(p))
    true
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    if (viewExists(to)) throw new IllegalStateException(
      s"graft catalog: a view named ${to.toString} exists — " +
        "DROP the view first (CALL system.drop_view)")
    val src = tableDir(from)
    val dst = tableDir(to)
    dst.getParentFile.mkdirs()
    if (!src.renameTo(dst)) throw new java.io.IOException(
      s"graft catalog: rename failed $src -> $dst")
  }

  // ---- procedures (SQL CALL) ------------------------------------------

  /** `CALL <cat>.system.<proc>('ns.tbl', …)` — the maintenance surface
    * (rollback, snapshot expiry, tags, CHECK constraints) resolved
    * against this catalog's directory layout; see [[GraftProcedures]].
    */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(GraftProcedures.Namespace),
      s"graft catalog: procedures live under the 'system' namespace, " +
        s"got ${ident.namespace().mkString(".")}")
    GraftProcedures.load(ident.name(), this)
  }

  /** Catalog-relative `ns….name` reference → the table's directory
    * (procedures' table argument).
    */
  private[sources] def resolveTableDir(tableRef: String): File = {
    val id = parseRef(tableRef)
    if (!tableExists(id)) throw new NoSuchTableException(id)
    tableDir(id)
  }

  /** Directory a NOT-yet-existing table would live at — the clone /
    * create-at target resolver (namespace must exist, name must be
    * free of tables AND views).
    */
  private[sources] def resolveNewTableDir(tableRef: String): File = {
    val id = parseRef(tableRef)
    val ns = nsDir(id.namespace())
    if (!ns.isDirectory) throw new NoSuchNamespaceException(id.namespace())
    require(!tableExists(id),
      s"graft catalog: table $tableRef already exists")
    require(!viewExists(id),
      s"graft catalog: a view named $tableRef exists")
    tableDir(id)
  }

  private[sources] def parseRef(ref: String): Identifier = {
    val parts = ref.split('.')
    require(parts.length >= 1 && parts.forall(_.nonEmpty),
      s"graft catalog: bad reference '$ref'")
    Identifier.of(parts.dropRight(1), parts.last)
  }

  private[sources] def namespaceDir(ns: Array[String]): File = nsDir(ns)
  private[sources] def tableDirIdent(id: Identifier): File = tableDir(id)
  private[sources] def catalogName: String = catName
  private[sources] def tableExistsIdent(id: Identifier): Boolean =
    tableExists(id)

  override def listProcedures(ns: Array[String]): Array[Identifier] = {
    if (!ns.sameElements(GraftProcedures.Namespace)) return Array.empty
    GraftProcedures.names
      .map(n => Identifier.of(GraftProcedures.Namespace, n)).toArray
  }

  // ---- views (SQL CREATE/DROP/ALTER/SHOW VIEW) ------------------------

  /** Persistent SQL views, stored per-namespace as `_graft_view_<name>`
    * sidecars (see [[GraftViews]]): `CREATE [OR REPLACE] VIEW`,
    * `SELECT` through them (Spark re-analyzes the stored SQL in the
    * stored catalog/namespace context), `ALTER VIEW SET/UNSET
    * TBLPROPERTIES`, `RENAME`, `DROP`, `SHOW VIEWS`.
    */
  override def listViews(ns: String*): Array[Identifier] = {
    val nsArr = ns.toArray
    val d = nsDir(nsArr)
    if (!d.isDirectory) throw new NoSuchNamespaceException(nsArr)
    GraftViews.list(d).map(n => Identifier.of(nsArr, n)).toArray
  }

  override def loadView(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.View =
    GraftViews.read(nsDir(ident.namespace()), ident).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident))

  override def viewExists(ident: Identifier): Boolean =
    GraftViews.viewFile(nsDir(ident.namespace()), ident.name()).isFile

  override def createView(info: org.apache.spark.sql.connector.catalog
      .ViewInfo): org.apache.spark.sql.connector.catalog.View = {
    val ident = info.ident()
    check(ident.name())
    val d = nsDir(ident.namespace())
    if (!d.isDirectory) throw new NoSuchNamespaceException(ident.namespace())
    if (viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    if (tableExists(ident)) throw new IllegalArgumentException(
      s"graft catalog: a table named $ident already exists")
    GraftViews.write(d, info)
    loadView(ident)
  }

  override def alterView(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.ViewChange*)
      : org.apache.spark.sql.connector.catalog.View = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val v = loadView(ident)
    val props = changes.foldLeft(v.properties().asScala.toMap) {
      case (p, set: ViewChange.SetProperty) =>
        p + (set.property() -> set.value())
      case (p, rm: ViewChange.RemoveProperty) => p - rm.property()
      case (_, other) => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER VIEW change $other")
    }
    GraftViews.write(nsDir(ident.namespace()),
      new org.apache.spark.sql.connector.catalog.ViewInfo(ident,
        v.query(), v.currentCatalog(), v.currentNamespace(), v.schema(),
        v.queryColumnNames(), v.columnAliases(), v.columnComments(),
        props.asJava))
    loadView(ident)
  }

  override def dropView(ident: Identifier): Boolean =
    GraftViews.viewFile(nsDir(ident.namespace()), ident.name()).delete()

  override def renameView(from: Identifier, to: Identifier): Unit = {
    if (!viewExists(from))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(from)
    if (viewExists(to))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(to)
    check(to.name())
    val v = loadView(from)
    GraftViews.write(nsDir(to.namespace()),
      new org.apache.spark.sql.connector.catalog.ViewInfo(to,
        v.query(), v.currentCatalog(), v.currentNamespace(), v.schema(),
        v.queryColumnNames(), v.columnAliases(), v.columnComments(),
        v.properties()))
    GraftViews.viewFile(nsDir(from.namespace()), from.name()).delete()
    ()
  }

  // ---- namespaces -----------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !f.getName.startsWith("_graft"))
      .map(f => Array(f.getName))

  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (ns.isEmpty) return listNamespaces()
    val d = nsDir(ns)
    if (!d.isDirectory) throw new NoSuchNamespaceException(ns)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !f.getName.startsWith("_graft") &&
        !schemaFile(f).isFile && !hasData(f))
      .map(f => ns :+ f.getName)
  }

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.isEmpty || nsDir(ns).isDirectory

  override def loadNamespaceMetadata(ns: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    Map("location" -> nsDir(ns).getPath).asJava
  }

  override def createNamespace(ns: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val d = nsDir(ns)
    require(!d.isDirectory, s"namespace ${ns.mkString(".")} already exists")
    d.mkdirs()
    ()
  }

  override def alterNamespace(ns: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER NAMESPACE is not supported")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    val d = nsDir(ns)
    if (!d.isDirectory) return false
    val empty = Option(d.listFiles()).forall(_.isEmpty)
    require(empty || cascade,
      s"namespace ${ns.mkString(".")} is not empty")
    import java.nio.file.{Files => JF, Path}
    JF.walk(d.toPath).sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(p => JF.deleteIfExists(p))
    true
  }

  // ---- functions ------------------------------------------------------
  // The catalog exposes exactly one function, `bucket(n, col)` — the
  // transform the scans report in their KeyGroupedPartitioning keys.
  // Spark resolves those keys against the relation's FunctionCatalog
  // (V2ExpressionUtils), and two scans whose bound functions share a
  // canonicalName are co-partitioned: that is what lets two co-bucketed
  // graft tables storage-partition-join with no exchange.

  override def listFunctions(ns: Array[String]): Array[Identifier] =
    if (ns.isEmpty || namespaceExists(ns))
      Array(Identifier.of(ns, "bucket"))
    else throw new NoSuchNamespaceException(ns)

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name() == "bucket") GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)
}

/** The catalog-exposed `bucket(n, col)` function: binds over any
  * canonical-string-stable column type and computes EXACTLY the writer's
  * directory routing ([[AvroFileSource.bucketOf]] over the value's
  * canonical string). `canonicalName` is shared across all bindings —
  * SPJ compatibility is by canonical name + equal argument literals, so
  * two tables bucketed `col:N` with the same N co-partition.
  */
object GraftBucketFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction,
    ScalarFunction}
  import org.apache.spark.sql.types._

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): graft hash bucket of col's canonical string, mod n"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"graft bucket(n, col) takes two arguments, got $inputType")
    val dt = inputType.fields(1).dataType
    dt match {
      case StringType | IntegerType | LongType | ShortType | ByteType |
           BooleanType | DateType => ()
      case _: DecimalType => ()
      case TimestampType | TimestampNTZType => ()
      case other => throw new UnsupportedOperationException(
        s"graft bucket: unsupported value type ${other.simpleString}")
    }
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def isResultNullable: Boolean = true
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        if (input.isNullAt(1)) null
        else {
          val canonical = dt match {
            case StringType => input.getUTF8String(1).toString
            case IntegerType => input.getInt(1).toString
            case LongType => input.getLong(1).toString
            case ShortType => input.getShort(1).toString
            case ByteType => input.getByte(1).toString
            case BooleanType => input.getBoolean(1).toString
            case DateType =>
              java.time.LocalDate.ofEpochDay(input.getInt(1).toLong).toString
            case d: DecimalType => graft.functions.BucketHash
              .decimalCanonical(
                input.getDecimal(1, d.precision, d.scale).toJavaBigDecimal)
            case TimestampType | TimestampNTZType =>
              input.getLong(1).toString
            case other => throw new UnsupportedOperationException(
              s"graft bucket over ${other.simpleString}")
          }
          Int.box(AvroFileSource.bucketOf(canonical, n))
        }
      }
    }
  }
}
