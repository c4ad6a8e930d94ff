package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared TVF argument plumbing: literal extraction and the
  * fully-qualified-ref → GraftCatalog resolution every graft TVF needs
  * (one place to grow literal handling — three copies would silently
  * diverge).
  */
private[sources] object GraftTvfArgs {

  def str(e: Expression): Option[String] = e match {
    case Literal(v: UTF8String, StringType) => Some(v.toString)
    case _ => None
  }

  def lng(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case _ => None
  }

  /** Resolve `'cat.ns....name'` to its graft catalog + the
    * catalog-relative remainder; every failure is loud under the TVF's
    * name (a claimed TVF name must never silently resolve elsewhere).
    */
  def graftCatalog(spark: SparkSession, ref: String, fn: String,
      what: String): (GraftCatalog, Seq[String]) = {
    val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(ref)
    require(parts.length >= 3,
      s"$fn: fully qualify the $what as 'cat.ns.$what' (got '$ref')")
    val mgr = spark.sessionState.catalogManager
    require(mgr.isCatalogRegistered(parts.head),
      s"$fn: no catalog named '${parts.head}' is registered")
    mgr.catalog(parts.head) match {
      case g: GraftCatalog => (g, parts.tail)
      case other => throw new IllegalArgumentException(
        s"$fn: catalog '${parts.head}' is not a graft catalog " +
          s"(${other.getClass.getName})")
    }
  }
}

/** Pure-SQL batch CDC: the `table_changes` TABLE-VALUED function,
  * registered through `SparkSessionExtensions.injectTableFunction`
  * (GraftExtensions) so Spark's own `ResolveFunctions` finds it like a
  * builtin:
  *
  * {{{
  *   SELECT * FROM table_changes('cat.ns.tbl', <fromVersion> [, <toVersion>])
  * }}}
  *
  * expands to [[AvroMaintenance.changes]]'s plan — the net file-delta
  * changelog between two journal versions ((from, to], `fromVersion`
  * exclusive, Delta Lake's function surface) with `_change_type`
  * tagging, so a SQL-only user never calls Scala for the batch change
  * feed. The expansion is the fully distributed plan `changes` builds
  * (versionAsOf-pinned restricted reads, broadcast position joins past
  * the inline limit) — no driver-side row materialization, which is why
  * this is a TVF and not a CALL procedure returning a LocalScan.
  * Omitting `toVersion` reads up to the current version. All argument
  * errors are loud (a TVF name, once claimed, must never silently
  * resolve to something else).
  */
object GraftTableChanges {
  import GraftTvfArgs.{lng, str}

  private val usage =
    "table_changes expects ('cat.ns.tbl', fromVersion [, toVersion]) " +
      "with literal arguments"

  def plan(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val (tableRef, from, to) = args match {
      case Seq(t, f, tv) =>
        (str(t).getOrElse(throw new IllegalArgumentException(usage)),
          lng(f).getOrElse(throw new IllegalArgumentException(usage)),
          Some(lng(tv).getOrElse(
            throw new IllegalArgumentException(usage))))
      case Seq(t, f) =>
        (str(t).getOrElse(throw new IllegalArgumentException(usage)),
          lng(f).getOrElse(throw new IllegalArgumentException(usage)),
          None)
      case _ => throw new IllegalArgumentException(usage)
    }
    val (g, rel) = GraftTvfArgs.graftCatalog(spark, tableRef,
      "table_changes", "tbl")
    val ident = Identifier.of(rel.dropRight(1).toArray, rel.last)
    val dir = g.tableDirIdent(ident)
    require(dir.isDirectory,
      s"table_changes: no graft table at '$tableRef'")
    val toV = to.getOrElse(
      AvroFileSource.readSnapshots(dir).lastOption.map(_.version)
        .getOrElse(throw new IllegalArgumentException(
          s"table_changes: '$tableRef' has no snapshot journal — " +
            "write through the source at least once")))
    // re-entrant analysis, the stored-view pattern: the changes
    // frame is already analyzed; alias it so column references
    // resolve under the TVF's name
    SubqueryAlias("table_changes",
      AvroMaintenance.changes(spark, dir.getPath, from, toV)
        .queryExecution.analyzed)
  }
}

/** Pure-SQL ANN search: the `ivf_search` TABLE-VALUED function over an
  * index built by `CALL system.build_ivf_index`:
  *
  * {{{
  *   SELECT * FROM ivf_search('cat.ns.idx', <qMaxId> [, <nprobe>, <k>])
  * }}}
  *
  * expands to [[GraftAnnIndex.search]]'s plan — queries are the corpus
  * rows with id < qMaxId, each probing its `nprobe` (default 6) nearest
  * lists of the persisted index, exact integer-L2 top-`k` (default 3)
  * within them — returning (qid, vec_id, d, rn). The corpus table and
  * its column names resolve through the index's own `_graft_annidx`
  * sidecar; the expansion contains ZERO training jobs (the index tables
  * are read as ordinary graft-avro scans — AnnSqlSpec plan-guards it).
  * Like `table_changes`, this is a TVF rather than a procedure because
  * the result is a fully distributed plan, not a driver-side row.
  */
object GraftIvfSearch {
  import GraftTvfArgs.{lng, str}

  private val usage =
    "ivf_search expects ('cat.ns.index', qMaxId [, nprobe, k]) with " +
      "literal arguments"

  def plan(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    def bad() = throw new IllegalArgumentException(usage)
    val (idxRef, qMax, nprobe, k) = args match {
      case Seq(t, q) =>
        (str(t).getOrElse(bad()), lng(q).getOrElse(bad()), 6L, 3L)
      case Seq(t, q, np, kk) =>
        (str(t).getOrElse(bad()), lng(q).getOrElse(bad()),
          lng(np).getOrElse(bad()), lng(kk).getOrElse(bad()))
      case _ => bad()
    }
    require(nprobe > 0 && k > 0,
      s"ivf_search: nprobe and k must be positive (got $nprobe, $k)")
    val (g, rel) = GraftTvfArgs.graftCatalog(spark, idxRef,
      "ivf_search", "index")
    SubqueryAlias("ivf_search",
      GraftAnnIndex.search(spark, g, rel.mkString("."), qMax,
        nprobe.toInt, k.toInt).queryExecution.analyzed)
  }
}

/** Pure-SQL PQ/ADC search over an index built by
  * `CALL system.build_pq_index`:
  *
  * {{{
  *   SELECT * FROM pq_search('cat.ns.idx', <qMaxId> [, <k>])
  * }}}
  *
  * expands to [[GraftAnnIndex.searchPq]]'s plan — each query (corpus id
  * < qMaxId) builds its 8×8 integer distance table against the
  * broadcast codebook, every stored code contributes 8 table lookups,
  * top-`k` (default 3) by (adc_d, vec_id) — returning
  * (qid, rn, vec_id, adc_d). Full vectors are never touched at query
  * time; the corpus/column resolution and zero-training guarantee
  * mirror [[GraftIvfSearch]].
  */
object GraftPqSearch {
  import GraftTvfArgs.{lng, str}

  private val usage =
    "pq_search expects ('cat.ns.index', qMaxId [, k]) with literal " +
      "arguments"

  def plan(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    def bad() = throw new IllegalArgumentException(usage)
    val (idxRef, qMax, k) = args match {
      case Seq(t, q) =>
        (str(t).getOrElse(bad()), lng(q).getOrElse(bad()), 3L)
      case Seq(t, q, kk) =>
        (str(t).getOrElse(bad()), lng(q).getOrElse(bad()),
          lng(kk).getOrElse(bad()))
      case _ => bad()
    }
    require(k > 0, s"pq_search: k must be positive (got $k)")
    val (g, rel) = GraftTvfArgs.graftCatalog(spark, idxRef,
      "pq_search", "index")
    SubqueryAlias("pq_search",
      GraftAnnIndex.searchPq(spark, g, rel.mkString("."), qMax, k.toInt)
        .queryExecution.analyzed)
  }
}
