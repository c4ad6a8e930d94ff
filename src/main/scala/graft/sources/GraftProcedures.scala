package graft.sources

import java.io.File

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType,
  StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` maintenance procedures for [[GraftCatalog]] — the Iceberg
  * procedure set through Spark 4's DSv2 ProcedureCatalog:
  *
  * {{{
  *   CALL cat.system.rollback_to_version('ns.tbl', 3)
  *   CALL cat.system.expire_snapshots('ns.tbl', 5)
  *   CALL cat.system.create_tag('ns.tbl', 'release-1', 3)
  *   CALL cat.system.drop_tag('ns.tbl', 'release-1')
  *   CALL cat.system.add_constraint('ns.tbl', 'qty_pos', 'qty > 0')
  *   CALL cat.system.drop_constraint('ns.tbl', 'qty_pos')
  * }}}
  *
  * Each call delegates to the corresponding [[AvroMaintenance]] op and
  * returns its outcome as a one-row LocalScan. The table argument is a
  * CATALOG-RELATIVE identifier (`ns.tbl`), resolved against the same
  * directory layout as every other catalog statement. Every procedure is
  * non-deterministic (it mutates and reports on-disk state), which also
  * keeps Spark from caching or re-running the call.
  */
object GraftProcedures {

  val Namespace: Array[String] = Array("system")

  def names: Seq[String] = Seq("rollback_to_version", "expire_snapshots",
    "create_tag", "drop_tag", "add_constraint", "drop_constraint",
    "validate_constraints",
    "compact", "cluster", "remove_orphans", "add_files", "analyze",
    "clean_stages",
    "create_view",
    "set_row_level_mode",
    "drop_view", "create_matview", "create_delta_matview",
    "refresh_matview", "create_join_matview",
    "create_counting_join_matview", "create_nway_counting_matview",
    "create_nway_join_matview",
    "refresh_join_matview",
    "set_matview_staleness",
    "build_ivf_index", "append_ivf_assignments", "rebalance_ivf_index",
    "build_pq_index")

  /** One result row (catalyst values, strings as UTF8String). */
  private case class ResultScan(schema: StructType, row: Seq[Any])
      extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] =
      Array(InternalRow.fromSeq(row))
  }

  private def out(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n, t, nullable = false)
    })

  private def param(n: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(n, t).build()

  private def paramDefault(n: String, t: DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(n, t).defaultValue(default).build()

  /** A procedure over a resolved table directory. `run` gets the raw
    * argument row and returns (schema, row values).
    */
  private final class Proc(procName: String, desc: String,
      params: Array[ProcedureParameter],
      run: InternalRow => (StructType, Seq[Any]))
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (schema, row) = run(input)
      java.util.List.of(ResultScan(schema, row): Scan).iterator()
    }
  }

  def load(name: String, cat: GraftCatalog): UnboundProcedure = {
    def dirOf(input: InternalRow): String = {
      val ident = input.getUTF8String(0)
      require(ident != null, "graft procedure: table argument is null")
      cat.resolveTableDir(ident.toString).getPath
    }
    // target resolver for tables the procedure CREATES (clone)
    def dirOfName(ref: String): String =
      cat.resolveNewTableDir(ref).getPath
    name match {
      case "rollback_to_version" => new Proc(name,
        "physically restore an earlier snapshot version as a new version",
        Array(param("table", StringType), param("version", LongType)),
        in => {
          val v = AvroMaintenance.rollbackTo(dirOf(in), in.getLong(1))
          (out("restored_version" -> LongType, "current_version" -> LongType),
            Seq(in.getLong(1), v))
        })
      case "expire_snapshots" => new Proc(name,
        "vacuum: keep the last N (and tagged) versions, delete " +
          "unreferenced archive files older than the retention grace",
        Array(param("table", StringType), param("keep_last", IntegerType),
          paramDefault("grace_ms", LongType, "0")),
        in => {
          val removed = AvroMaintenance.expireSnapshots(dirOf(in),
            in.getInt(1), in.getLong(2))
          (out("removed_files" -> LongType), Seq(removed.toLong))
        })
      case "expire_snapshots_older_than" => new Proc(name,
        "time-based vacuum: expire snapshots committed before the " +
          "cutoff (epoch millis); current + tagged versions survive",
        Array(param("table", StringType),
          param("older_than_ms", LongType),
          paramDefault("grace_ms", LongType, "0")),
        in => {
          val removed = AvroMaintenance.expireSnapshotsOlderThan(
            dirOf(in), in.getLong(1), in.getLong(2))
          (out("removed_files" -> LongType), Seq(removed.toLong))
        })
      case "create_tag" => new Proc(name,
        "pin a named tag at a snapshot version",
        Array(param("table", StringType), param("tag", StringType),
          param("version", LongType)),
        in => {
          AvroMaintenance.tag(dirOf(in), in.getUTF8String(1).toString,
            in.getLong(2))
          (out("tag" -> StringType, "version" -> LongType),
            Seq(in.getUTF8String(1).copy(), in.getLong(2)))
        })
      case "drop_tag" => new Proc(name,
        "remove a named tag; its version becomes expirable",
        Array(param("table", StringType), param("tag", StringType)),
        in => {
          AvroMaintenance.dropTag(dirOf(in), in.getUTF8String(1).toString)
          (out("dropped" -> StringType), Seq(in.getUTF8String(1).copy()))
        })
      case "add_constraint" => new Proc(name,
        "add a CHECK constraint (validates existing rows first)",
        Array(param("table", StringType), param("name", StringType),
          param("expr", StringType)),
        in => {
          AvroMaintenance.addConstraint(
            org.apache.spark.sql.SparkSession.active, dirOf(in),
            in.getUTF8String(1).toString, in.getUTF8String(2).toString)
          (out("constraint" -> StringType, "expr" -> StringType),
            Seq(in.getUTF8String(1).copy(), in.getUTF8String(2).copy()))
        })
      case "validate_constraints" => new Proc(name,
        "audit every CHECK constraint against the current data in one " +
          "distributed pass — rows adopted via add_files were never " +
          "policed by a writer; returns per-constraint violation counts " +
          "(NULL passes, SQL CHECK semantics)",
        Array(param("table", StringType)),
        in => {
          val counts = AvroMaintenance.validateConstraints(
            org.apache.spark.sql.SparkSession.active, dirOf(in))
          (out("n_constraints" -> IntegerType,
            "violations" -> LongType, "detail" -> StringType),
            Seq(Int.box(counts.size),
              Long.box(counts.map(_._2).sum),
              org.apache.spark.unsafe.types.UTF8String.fromString(
                counts.map { case (n, c) => s"$n=$c" }.mkString(","))))
        })
      case "compact" => new Proc(name,
        "in-place bin-pack rewrite: applies pending deletes physically, " +
          "archives the replaced generation, fresh zone manifest",
        Array(param("table", StringType), param("target_bytes", LongType)),
        in => {
          val n = AvroMaintenance.compactInPlace(
            org.apache.spark.sql.SparkSession.active, dirOf(in),
            in.getLong(1))
          (out("files_written" -> LongType), Seq(n.toLong))
        })
      case "clone" => new Proc(name,
        "deep clone: byte-copy the current snapshot + stats manifests " +
          "into a new table with a fresh history",
        Array(param("table", StringType), param("target", StringType)),
        in => {
          val n = AvroMaintenance.cloneTo(dirOf(in),
            dirOfName(in.getUTF8String(1).toString))
          (out("files_cloned" -> LongType), Seq(n.toLong))
        })
      case "compact_partition" => new Proc(name,
        "partition-scoped in-place bin-pack: rewrite ONE hive " +
          "partition's files, others untouched",
        Array(param("table", StringType), param("col", StringType),
          param("value", StringType), param("target_bytes", LongType)),
        in => {
          val n = AvroMaintenance.compactPartition(
            org.apache.spark.sql.SparkSession.active, dirOf(in),
            in.getUTF8String(1).toString, in.getUTF8String(2).toString,
            in.getLong(3))
          (out("files_written" -> LongType), Seq(n.toLong))
        })
      case "analyze" => new Proc(name,
        "backfill pruning/statistics manifests (zones, sums, row " +
          "counts; opt-in blooms/NDV/trigrams as comma lists, '' = " +
          "none; block_index_for = comma list of columns to chunk-index " +
          "(shared chunk frame, one line per column) for " +
          "intra-file skipping; chunk_bloom_for / chunk_trigram_for = " +
          "columns getting per-chunk membership / substring cells on " +
          "that frame) for existing data without rewriting it",
        Array(param("table", StringType), param("bloom_for", StringType),
          param("ndv_for", StringType), param("trigram_for", StringType),
          paramDefault("block_index_for", StringType, "''"),
          paramDefault("chunk_bloom_for", StringType, "''"),
          paramDefault("chunk_trigram_for", StringType, "''")),
        in => {
          def cols(i: Int): Seq[String] =
            Option(in.getUTF8String(i)).map(_.toString).toSeq
              .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
          val n = AvroMaintenance.analyze(
            org.apache.spark.sql.SparkSession.active, dirOf(in),
            cols(1), cols(2), cols(3),
            blockIdxFor = Option(in.getUTF8String(4)).map(_.toString)
              .map(_.trim).filter(_.nonEmpty),
            chunkBloomFor = cols(5),
            chunkTrigramFor = cols(6))
          (out("files_analyzed" -> LongType), Seq(n.toLong))
        })
      case "set_row_level_mode" => new Proc(name,
        "row-level op execution mode: 'copy-on-write' (rewrite matched " +
          "files) or 'merge-on-read' (position-delete sidecar + appends)",
        Array(param("table", StringType), param("mode", StringType)),
        in => {
          val mode = in.getUTF8String(1).toString
          AvroMaintenance.setRowLevelMode(dirOf(in), mode)
          (out("mode" -> StringType),
            Seq(org.apache.spark.unsafe.types.UTF8String.fromString(mode)))
        })
      case "cluster" => new Proc(name,
        "in-place space-curve re-layout on two columns ('z' or " +
          "'hilbert'): co-locates value neighborhoods so zone pruning " +
          "bites on both dimensions",
        Array(param("table", StringType), param("col_x", StringType),
          param("col_y", StringType), param("target_files", IntegerType),
          param("curve", StringType)),
        in => {
          val cx = in.getUTF8String(1)
          val cy = in.getUTF8String(2)
          val curve = in.getUTF8String(4)
          require(cx != null && cy != null && curve != null,
            "graft procedure: cluster arguments must be non-null")
          val n = AvroMaintenance.clusterInPlace(
            org.apache.spark.sql.SparkSession.active, dirOf(in),
            cx.toString, cy.toString, in.getInt(3), curve.toString)
          (out("files_written" -> LongType), Seq(n.toLong))
        })
      case "remove_orphans" => new Proc(name,
        "delete live data files no snapshot references (smuggled in " +
          "outside any commit) — queries already ignore them",
        Array(param("table", StringType)),
        in => {
          val n = AvroMaintenance.removeOrphans(dirOf(in))
          (out("files_removed" -> LongType), Seq(n.toLong))
        })
      case "clean_stages" => new Proc(name,
        "delete crash-abandoned `_graft_stage_*` staging directories " +
          "older than min_age_minutes (aborts clean up after " +
          "themselves; this reclaims the crash-between-write-and-" +
          "commit leftovers — listings never see them either way)",
        Array(param("namespace", StringType),
          param("min_age_minutes", IntegerType)),
        in => {
          val nsArg = in.getUTF8String(0)
          require(nsArg != null,
            "graft procedure: namespace argument is null")
          val ns = nsArg.toString.split('.').filter(_.nonEmpty)
          val age = in.getInt(1)
          require(age >= 0,
            s"graft procedure: min_age_minutes must be >= 0, got $age")
          val d = cat.namespaceDir(ns)
          require(d.isDirectory,
            s"graft procedure: namespace ${ns.mkString(".")} not found")
          val cutoff = System.currentTimeMillis() - age * 60000L
          val victims = Option(d.listFiles()).getOrElse(Array.empty)
            .filter(f => f.isDirectory &&
              f.getName.startsWith("_graft_stage") &&
              f.lastModified() < cutoff)
          victims.foreach { v =>
            import java.nio.file.{Files => JF, Path}
            JF.walk(v.toPath)
              .sorted(java.util.Comparator.reverseOrder[Path]())
              .forEach(p => JF.deleteIfExists(p))
          }
          (out("stages_removed" -> LongType), Seq(victims.length.toLong))
        })
      case "add_files" => new Proc(name,
        "adopt data files that landed outside any commit as a new " +
          "snapshot version (import counterpart of remove_orphans)",
        Array(param("table", StringType)),
        in => {
          val n = AvroMaintenance.addFiles(dirOf(in))
          (out("files_added" -> LongType), Seq(n.toLong))
        })
      case "drop_constraint" => new Proc(name,
        "remove a CHECK constraint",
        Array(param("table", StringType), param("name", StringType)),
        in => {
          AvroMaintenance.dropConstraint(dirOf(in),
            in.getUTF8String(1).toString)
          (out("dropped" -> StringType), Seq(in.getUTF8String(1).copy()))
        })
      case "create_view" => new Proc(name,
        "store a persistent SQL view (text must fully qualify its " +
          "table references; validated by analyzing it now)",
        Array(param("view", StringType), param("sql", StringType)),
        in => {
          val ref = in.getUTF8String(0)
          val sqlText = in.getUTF8String(1)
          require(ref != null && sqlText != null,
            "graft procedure: view/sql arguments must be non-null")
          val ident = cat.parseRef(ref.toString)
          val spark = org.apache.spark.sql.SparkSession.active
          // the stored text is re-analyzed in FUTURE sessions, so every
          // table reference must be fully qualified (catalog.ns….table)
          // — a bare name would capture whatever temp view or session
          // default happens to exist at read time. CTE names are local
          // and exempt.
          locally {
            import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
            import org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith
            val parsed = spark.sessionState.sqlParser
              .parsePlan(sqlText.toString)
            val ctes = parsed.collect {
              case w: UnresolvedWith => w.cteRelations.map(_._1)
            }.flatten.toSet
            val bad = parsed.collect {
              case u: UnresolvedRelation
                  if u.multipartIdentifier.length < 3 &&
                    !(u.multipartIdentifier.length == 1 &&
                      ctes(u.multipartIdentifier.head)) =>
                u.multipartIdentifier.mkString(".")
            }
            require(bad.isEmpty,
              s"graft catalog: view SQL must fully qualify table " +
                s"references (catalog.namespace.table) — got: " +
                bad.mkString(", "))
          }
          // analyze NOW: an unreferencable or unparsable view must fail
          // at CREATE, not at first read
          val schema = spark.sql(sqlText.toString).schema
          val nsD = cat.namespaceDir(ident.namespace())
          require(nsD.isDirectory,
            s"graft catalog: no namespace ${ident.namespace().mkString(".")}")
          require(!GraftViews.viewFile(nsD, ident.name()).isFile,
            s"graft catalog: view $ident already exists (drop_view first)")
          require(!cat.tableExistsIdent(ident),
            s"graft catalog: a table named $ident already exists")
          GraftViews.write(nsD,
            new org.apache.spark.sql.connector.catalog.ViewInfo(ident,
              sqlText.toString, cat.catalogName, ident.namespace(), schema,
              schema.fieldNames, Array.empty, Array.empty,
              new java.util.HashMap[String, String]()))
          (out("view" -> StringType, "n_columns" -> LongType),
            Seq(ref.copy(), schema.fields.length.toLong))
        })
      case "drop_view" => new Proc(name,
        "remove a persistent SQL view",
        Array(param("view", StringType)),
        in => {
          val ref = in.getUTF8String(0)
          require(ref != null, "graft procedure: view argument is null")
          val ident = cat.parseRef(ref.toString)
          val f = GraftViews.viewFile(
            cat.namespaceDir(ident.namespace()), ident.name())
          require(f.isFile, s"graft catalog: no view $ident to drop")
          require(f.delete(), s"graft catalog: could not delete $f")
          (out("dropped" -> StringType), Seq(ref.copy()))
        })
      case "create_matview" => new Proc(name,
        "materialize a partial/combine aggregate over a source table " +
          "(agg_sql reads __SRC__, merge_sql combines __ACC__); " +
          "refresh_matview later folds in only new source versions",
        Array(param("view", StringType), param("source", StringType),
          param("agg_sql", StringType), param("merge_sql", StringType)),
        in => {
          val viewRef = in.getUTF8String(0)
          val srcRef = in.getUTF8String(1)
          val aggSql = in.getUTF8String(2)
          val mergeSql = in.getUTF8String(3)
          require(viewRef != null && srcRef != null && aggSql != null &&
            mergeSql != null,
            "graft procedure: create_matview arguments must be non-null")
          val ident = cat.parseRef(viewRef.toString)
          val nsD = cat.namespaceDir(ident.namespace())
          require(nsD.isDirectory,
            s"graft catalog: no namespace ${ident.namespace().mkString(".")}")
          require(!cat.tableExistsIdent(ident),
            s"graft catalog: a table named $ident already exists")
          require(!GraftViews.viewFile(nsD, ident.name()).isFile,
            s"graft catalog: a view named $ident already exists")
          val srcDir = cat.resolveTableDir(srcRef.toString)
          val v = GraftMatviews.create(
            org.apache.spark.sql.SparkSession.active,
            cat.tableDirIdent(ident).getPath, srcDir.getPath,
            aggSql.toString, mergeSql.toString)
          (out("view" -> StringType, "source_version" -> LongType),
            Seq(viewRef.copy(), v))
        })
      case "create_delta_matview" => new Proc(name,
        "materialize a DELETE-capable aggregate view: agg_sql reads " +
          "__SRC__, merge_sql combines __ACC__, delta_sql reads the " +
          "CDC changes frame __CHG__ with signed contributions " +
          "(insert positive, delete negative — the counting algorithm); " +
          "refresh_matview folds row-level deletes instead of failing",
        Array(param("view", StringType), param("source", StringType),
          param("agg_sql", StringType), param("merge_sql", StringType),
          param("delta_sql", StringType)),
        in => {
          val viewRef = in.getUTF8String(0)
          val srcRef = in.getUTF8String(1)
          val aggSql = in.getUTF8String(2)
          val mergeSql = in.getUTF8String(3)
          val deltaSql = in.getUTF8String(4)
          require(viewRef != null && srcRef != null && aggSql != null &&
            mergeSql != null && deltaSql != null,
            "graft procedure: create_delta_matview arguments must be " +
              "non-null")
          val ident = cat.parseRef(viewRef.toString)
          val nsD = cat.namespaceDir(ident.namespace())
          require(nsD.isDirectory,
            s"graft catalog: no namespace ${ident.namespace().mkString(".")}")
          require(!cat.tableExistsIdent(ident),
            s"graft catalog: a table named $ident already exists")
          require(!GraftViews.viewFile(nsD, ident.name()).isFile,
            s"graft catalog: a view named $ident already exists")
          val srcDir = cat.resolveTableDir(srcRef.toString)
          val v = GraftMatviews.create(
            org.apache.spark.sql.SparkSession.active,
            cat.tableDirIdent(ident).getPath, srcDir.getPath,
            aggSql.toString, mergeSql.toString,
            Some(deltaSql.toString))
          (out("view" -> StringType, "source_version" -> LongType),
            Seq(viewRef.copy(), v))
        })
      case "refresh_matview" => new Proc(name,
        "fold the source's new versions into a materialized view " +
          "(additive-only incremental read; rewritten history fails " +
          "loudly — recreate the view)",
        Array(param("view", StringType)),
        in => {
          val (from, to) = GraftMatviews.refresh(
            org.apache.spark.sql.SparkSession.active, dirOf(in))
          (out("from_version" -> LongType, "to_version" -> LongType),
            Seq(from, to))
        })
      case "create_join_matview" => new Proc(name,
        "materialize a join of two tables (join_sql reads __L__ and " +
          "__R__); refresh_join_matview later appends only the " +
          "delta-join terms from each side's new versions",
        Array(param("view", StringType), param("left", StringType),
          param("right", StringType), param("join_sql", StringType)),
        in => {
          val viewRef = in.getUTF8String(0)
          val leftRef = in.getUTF8String(1)
          val rightRef = in.getUTF8String(2)
          val joinSql = in.getUTF8String(3)
          require(viewRef != null && leftRef != null && rightRef != null &&
            joinSql != null,
            "graft procedure: create_join_matview arguments must be non-null")
          val ident = cat.parseRef(viewRef.toString)
          val nsD = cat.namespaceDir(ident.namespace())
          require(nsD.isDirectory,
            s"graft catalog: no namespace ${ident.namespace().mkString(".")}")
          require(!cat.tableExistsIdent(ident),
            s"graft catalog: a table named $ident already exists")
          require(!GraftViews.viewFile(nsD, ident.name()).isFile,
            s"graft catalog: a view named $ident already exists")
          val (lv, rv) = GraftMatviews.createJoin(
            org.apache.spark.sql.SparkSession.active,
            cat.tableDirIdent(ident).getPath,
            cat.resolveTableDir(leftRef.toString).getPath,
            cat.resolveTableDir(rightRef.toString).getPath,
            joinSql.toString)
          (out("view" -> StringType, "left_version" -> LongType,
            "right_version" -> LongType), Seq(viewRef.copy(), lv, rv))
        })
      case "create_counting_join_matview" => new Proc(name,
        "materialize a join with per-row multiplicities (_mv_n): " +
          "refresh_join_matview then maintains through row-level " +
          "DELETES in either source via signed CDC deltas — " +
          "zero-count rows vanish, no rebuild (join_sql must be a " +
          "pure bag join projection reading __L__ and __R__)",
        Array(param("view", StringType), param("left", StringType),
          param("right", StringType), param("join_sql", StringType)),
        in => {
          val viewRef = in.getUTF8String(0)
          val leftRef = in.getUTF8String(1)
          val rightRef = in.getUTF8String(2)
          val joinSql = in.getUTF8String(3)
          require(viewRef != null && leftRef != null && rightRef != null &&
            joinSql != null, "graft procedure: " +
            "create_counting_join_matview arguments must be non-null")
          val ident = cat.parseRef(viewRef.toString)
          val nsD = cat.namespaceDir(ident.namespace())
          require(nsD.isDirectory,
            s"graft catalog: no namespace ${ident.namespace().mkString(".")}")
          require(!cat.tableExistsIdent(ident),
            s"graft catalog: a table named $ident already exists")
          require(!GraftViews.viewFile(nsD, ident.name()).isFile,
            s"graft catalog: a view named $ident already exists")
          val (lv, rv) = GraftMatviews.createJoinCounting(
            org.apache.spark.sql.SparkSession.active,
            cat.tableDirIdent(ident).getPath,
            cat.resolveTableDir(leftRef.toString).getPath,
            cat.resolveTableDir(rightRef.toString).getPath,
            joinSql.toString)
          (out("view" -> StringType, "left_version" -> LongType,
            "right_version" -> LongType), Seq(viewRef.copy(), lv, rv))
        })
      case "create_nway_counting_matview" |
           "create_nway_join_matview" =>
        val counting = name == "create_nway_counting_matview"
        new Proc(name,
        if (counting)
          "materialize an n-way join with per-row multiplicities " +
            "(_mv_n): sources is a comma-separated table list, join_sql " +
            "reads __S1__ … __Sn__ as a pure bag projection; " +
            "refresh_join_matview maintains through row-level DELETES " +
            "in ANY source via the telescoping n-linear CDC delta sum"
        else
          "materialize an n-way join (append-only maintenance): " +
            "sources is a comma-separated table list, join_sql reads " +
            "__S1__ … __Sn__; refresh_join_matview appends the " +
            "telescoping delta terms (rewritten history fails loudly " +
            "— use the counting variant for delete maintenance)",
        Array(param("view", StringType), param("sources", StringType),
          param("join_sql", StringType)),
        in => {
          val viewRef = in.getUTF8String(0)
          val srcsRef = in.getUTF8String(1)
          val joinSql = in.getUTF8String(2)
          require(viewRef != null && srcsRef != null && joinSql != null,
            s"graft procedure: $name arguments must be non-null")
          val srcs = srcsRef.toString.split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq
          require(srcs.length >= 2,
            s"graft procedure: $name needs >= 2 sources")
          val ident = cat.parseRef(viewRef.toString)
          val nsD = cat.namespaceDir(ident.namespace())
          require(nsD.isDirectory,
            s"graft catalog: no namespace ${ident.namespace().mkString(".")}")
          require(!cat.tableExistsIdent(ident),
            s"graft catalog: a table named $ident already exists")
          require(!GraftViews.viewFile(nsD, ident.name()).isFile,
            s"graft catalog: a view named $ident already exists")
          val vs = GraftMatviews.createJoinN(
            org.apache.spark.sql.SparkSession.active,
            cat.tableDirIdent(ident).getPath,
            srcs.map(s => cat.resolveTableDir(s).getPath),
            joinSql.toString, counting = counting)
          (out("view" -> StringType, "versions" -> StringType),
            Seq(viewRef.copy(),
              org.apache.spark.unsafe.types.UTF8String.fromString(
                vs.mkString(","))))
        })
      case "refresh_join_matview" => new Proc(name,
        "append the delta-join terms of both sources' new versions to " +
          "a join materialized view (additive-only; rewritten history " +
          "fails loudly unless allow_rebuild=true opts into a pinned " +
          "full re-join)",
        Array(param("view", StringType),
          paramDefault("allow_rebuild", BooleanType, "false")),
        in => {
          val allowRebuild = !in.isNullAt(1) && in.getBoolean(1)
          val windows = GraftMatviews.refreshJoinN(
            org.apache.spark.sql.SparkSession.active, dirOf(in),
            allowRebuild)
          if (windows.length == 2) {
            val ((fl, tl), (fr, tr)) = (windows(0), windows(1))
            (out("left_from" -> LongType, "left_to" -> LongType,
              "right_from" -> LongType, "right_to" -> LongType),
              Seq(fl, tl, fr, tr))
          } else
            (out("windows" -> StringType),
              Seq(org.apache.spark.unsafe.types.UTF8String.fromString(
                windows.map { case (f, t) => s"$f..$t" }.mkString(","))))
        })
      case "set_matview_staleness" => new Proc(name,
        "opt a materialized view into lazy refresh-on-read: a catalog " +
          "read older than max_ms runs the incremental refresh first " +
          "(under the view lock; fresh reads stay zero-job); " +
          "max_ms < 0 turns it off",
        Array(param("view", StringType), param("max_ms", LongType)),
        in => {
          GraftMatviews.setMaxStaleness(dirOf(in), in.getLong(1))
          (out("max_staleness_ms" -> LongType), Seq(in.getLong(1)))
        })
      case "build_ivf_index" => new Proc(name,
        "train an IVF coarse quantizer over a corpus table " +
          "(id_col BIGINT-castable, vec_col ARRAY of FLOAT/DOUBLE) and " +
          "publish it as <index>_centroids / <index>_assign catalog " +
          "tables; search via the ivf_search(...) TVF",
        Array(param("table", StringType), param("id_col", StringType),
          param("vec_col", StringType), param("index", StringType)),
        in => {
          val srcRef = in.getUTF8String(0)
          val idCol = in.getUTF8String(1)
          val vecCol = in.getUTF8String(2)
          val idxRef = in.getUTF8String(3)
          require(srcRef != null && idCol != null && vecCol != null &&
            idxRef != null,
            "graft procedure: build_ivf_index arguments must be non-null")
          val nLists = GraftAnnIndex.build(
            org.apache.spark.sql.SparkSession.active, cat,
            srcRef.toString, idCol.toString, vecCol.toString,
            idxRef.toString)
          (out("index" -> StringType, "n_lists" -> LongType),
            Seq(idxRef.copy(), nLists))
        })
      case "append_ivf_assignments" => new Proc(name,
        "assign corpus rows with at_or_above <= id (< until; -1 = " +
          "unbounded) to the persisted centroids — one broadcast argmin " +
          "pass, zero retraining — and append them to the assignment " +
          "table",
        Array(param("index", StringType), param("at_or_above", LongType),
          paramDefault("until", LongType, "-1")),
        in => {
          val idxRef = in.getUTF8String(0)
          require(idxRef != null,
            "graft procedure: append_ivf_assignments index is null")
          val until = Some(in.getLong(2)).filter(_ >= 0)
          val v = GraftAnnIndex.append(
            org.apache.spark.sql.SparkSession.active, cat,
            idxRef.toString, in.getLong(1), until)
          (out("assign_version" -> LongType), Seq(v))
        })
      case "build_pq_index" => new Proc(name,
        "train the per-subspace product-quantization codebooks over a " +
          "corpus table and publish <index>_codebook / <index>_codes " +
          "catalog tables (85x compression); search via the " +
          "pq_search(...) TVF",
        Array(param("table", StringType), param("id_col", StringType),
          param("vec_col", StringType), param("index", StringType)),
        in => {
          val srcRef = in.getUTF8String(0)
          val idCol = in.getUTF8String(1)
          val vecCol = in.getUTF8String(2)
          val idxRef = in.getUTF8String(3)
          require(srcRef != null && idCol != null && vecCol != null &&
            idxRef != null,
            "graft procedure: build_pq_index arguments must be non-null")
          val nRows = GraftAnnIndex.buildPq(
            org.apache.spark.sql.SparkSession.active, cat,
            srcRef.toString, idCol.toString, vecCol.toString,
            idxRef.toString)
          (out("index" -> StringType, "codebook_rows" -> LongType),
            Seq(idxRef.copy(), nRows))
        })
      case "rebalance_ivf_index" => new Proc(name,
        "split every IVF list past the 1x mean 2-way (skew repair " +
          "after incremental appends): parents die by metadata delete, " +
          "children append, untouched files stay byte-identical",
        Array(param("index", StringType)),
        in => {
          val idxRef = in.getUTF8String(0)
          require(idxRef != null,
            "graft procedure: rebalance_ivf_index index is null")
          val n = GraftAnnIndex.rebalance(
            org.apache.spark.sql.SparkSession.active, cat, idxRef.toString)
          (out("n_split" -> LongType), Seq(n))
        })
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unknown procedure system.$other " +
          s"(have ${names.mkString(", ")})")
    }
  }
}
