package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression, Literal, UnaryMinus}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType, LongType, StringType}
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

  /** One numeric literal as double. TVF args arrive PARSED but
    * unresolved, so `-2.5` is UnaryMinus over a Decimal literal and
    * `0.25` is a Decimal — accept every numeric literal spelling. */
  def num(e: Expression): Option[Double] = e match {
    case Literal(v: org.apache.spark.sql.types.Decimal, _: DecimalType) =>
      Some(v.toDouble)
    case Literal(v: Double, DoubleType) => Some(v)
    case Literal(v: Float, FloatType) => Some(v.toDouble)
    case Literal(v: Int, IntegerType) => Some(v.toDouble)
    case Literal(v: Long, LongType) => Some(v.toDouble)
    case UnaryMinus(c, _) => num(c).map(v => -v)
    // the analyzer resolves `array(-2.5, 0.25)` before the TVF builder
    // runs, wrapping each element in a common-type Cast — unwrap (our
    // vectors are exact binary quarters, value-preserved by any
    // numeric cast wide enough to have passed analysis)
    case c: org.apache.spark.sql.catalyst.expressions.Cast => num(c.child)
    case _ => None
  }

  /** A literal `array(…)` argument as a float vector — the external
    * ANN query. Matches the unresolved parse shape
    * (UnresolvedFunction "array"), the analyzer-resolved CreateArray
    * (cast-wrapped elements), and a constant-folded array literal;
    * every element must itself be a numeric literal. */
  def vecF(e: Expression): Option[Seq[Float]] = {
    val elems = e match {
      case f: UnresolvedFunction
          if f.nameParts.map(_.toLowerCase(java.util.Locale.ROOT)) ==
            Seq("array") => Some(f.arguments)
      case CreateArray(children, _) => Some(children)
      case _ => None
    }
    elems match {
      case Some(es) =>
        val vs = es.map(num)
        if (vs.nonEmpty && vs.forall(_.isDefined))
          Some(vs.map(_.get.toFloat)) else None
      case None => e match {
        case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
            org.apache.spark.sql.types.ArrayType(et, _)) =>
          val n = v.numElements()
          if (n == 0) None
          else {
            val ds = (0 until n).map(i =>
              num(Literal(v.get(i, et), et)))
            if (ds.forall(_.isDefined)) Some(ds.map(_.get.toFloat))
            else None
          }
        case _ => None
      }
    }
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
  import GraftTvfArgs.{lng, str, vecF}

  private val usage =
    "ivf_search expects ('cat.ns.index', qMaxId | array(…) | " +
      "'cat.ns.queryTable' [, nprobe, k]) with literal arguments"

  def plan(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    def bad() = throw new IllegalArgumentException(usage)
    val (idxRef, query, nprobe, k) = args match {
      case Seq(t, q) =>
        (str(t).getOrElse(bad()), q, 6L, 3L)
      case Seq(t, q, np, kk) =>
        (str(t).getOrElse(bad()), q,
          lng(np).getOrElse(bad()), lng(kk).getOrElse(bad()))
      case _ => bad()
    }
    require(nprobe > 0 && k > 0,
      s"ivf_search: nprobe and k must be positive (got $nprobe, $k)")
    val (g, rel) = GraftTvfArgs.graftCatalog(spark, idxRef,
      "ivf_search", "index")
    // EXTERNAL query vector (r19): `ivf_search('idx', array(…), np, k)`
    // ranks corpus neighbors of a NEW embedding — the canonical ANN
    // call, no corpus insert needed; returns (vec_id, d, rn) with no
    // qid (the query is the caller's). A second STRING literal is a
    // catalog QUERY TABLE ref — batch external queries, one call per
    // table of fresh (qid, qvec) embeddings, returning (qid, vec_id,
    // d, rn). The long form keeps the corpus-internal qMaxId
    // semantics and the qid column.
    val df = vecF(query) match {
      case Some(v) =>
        GraftAnnIndex.searchVec(spark, g, rel.mkString("."), v,
          nprobe.toInt, k.toInt)
      case None => str(query) match {
        case Some(qRef) =>
          val (qg, qRel) = GraftTvfArgs.graftCatalog(spark, qRef,
            "ivf_search", "queryTable")
          require(qg eq g, "ivf_search: the query table must live in " +
            "the index's catalog")
          GraftAnnIndex.searchVecTable(spark, g, rel.mkString("."),
            qRel.mkString("."), nprobe.toInt, k.toInt)
        case None =>
          GraftAnnIndex.search(spark, g, rel.mkString("."),
            lng(query).getOrElse(bad()), nprobe.toInt, k.toInt)
      }
    }
    SubqueryAlias("ivf_search", df.queryExecution.analyzed)
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
  import GraftTvfArgs.{lng, str, vecF}

  private val usage =
    "pq_search expects ('cat.ns.index', qMaxId | array(…) | " +
      "'cat.ns.queryTable' [, k]) with literal arguments"

  def plan(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    def bad() = throw new IllegalArgumentException(usage)
    val (idxRef, query, k) = args match {
      case Seq(t, q) =>
        (str(t).getOrElse(bad()), q, 3L)
      case Seq(t, q, kk) =>
        (str(t).getOrElse(bad()), q, lng(kk).getOrElse(bad()))
      case _ => bad()
    }
    require(k > 0, s"pq_search: k must be positive (got $k)")
    val (g, rel) = GraftTvfArgs.graftCatalog(spark, idxRef,
      "pq_search", "index")
    // external query vector: ADC neighbors of a NEW embedding —
    // returns (rn, vec_id, adc_d), no qid; a STRING literal is a batch
    // (qid, qvec) query-table ref (see GraftIvfSearch)
    val df = vecF(query) match {
      case Some(v) =>
        GraftAnnIndex.searchPqVec(spark, g, rel.mkString("."), v, k.toInt)
      case None => str(query) match {
        case Some(qRef) =>
          val (qg, qRel) = GraftTvfArgs.graftCatalog(spark, qRef,
            "pq_search", "queryTable")
          require(qg eq g, "pq_search: the query table must live in " +
            "the index's catalog")
          GraftAnnIndex.searchPqVecTable(spark, g, rel.mkString("."),
            qRel.mkString("."), k.toInt)
        case None =>
          GraftAnnIndex.searchPq(spark, g, rel.mkString("."),
            lng(query).getOrElse(bad()), k.toInt)
      }
    }
    SubqueryAlias("pq_search", df.queryExecution.analyzed)
  }
}
