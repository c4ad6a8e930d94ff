package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector for the engine's native functions —
  * the deployment-grade registration path:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)             // programmatic
  *   // or: --conf spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * Sessions built this way resolve `vec_dot`, `sorted_overlap` and
  * `simhash16` in SQL text and `F.call_function` without any per-session
  * [[VectorFunctions.register]] call (which remains for ad-hoc sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - double dot product of two array<float>"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_l2sq"),
      info("vec_l2sq",
        "vec_l2sq(a, b) - exact squared L2 distance of two array<bigint>"),
      (exprs: Seq[Expression]) => LongVecL2(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("sorted_overlap"),
      info("sorted_overlap",
        "sorted_overlap(a, b) - intersection count of sorted distinct arrays"),
      (exprs: Seq[Expression]) => SortedOverlapCount(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("simhash16"),
      info("simhash16", "simhash16(hashes) - 16-bit simhash of hex digests"),
      (exprs: Seq[Expression]) => SimHash16(exprs.head)))
    ext.injectFunction((FunctionIdentifier("image_dims"),
      info("image_dims",
        "image_dims(bin) - [fmt_code, width, height] from a PNG/JPEG/GIF header"),
      (exprs: Seq[Expression]) => ImageDims(exprs.head)))
    ext.injectFunction((FunctionIdentifier("byte_stats"),
      info("byte_stats",
        "byte_stats(bin) - [n, distinct, modal_byte, modal_count, chi2_u] byte features"),
      (exprs: Seq[Expression]) => ByteStatsExpr(exprs.head)))
    // UDTF surface: generator (table function) usable in a select list or
    // LATERAL VIEW
    ext.injectFunction((FunctionIdentifier("shingles"),
      info("shingles", "shingles(text, n) - one (pos, shingle) row per n-word window"),
      (exprs: Seq[Expression]) => ShingleGenerate(exprs.head, exprs(1))))
    // native sketch aggregate (TypedImperativeAggregate)
    ext.injectFunction((FunctionIdentifier("minhash4"),
      info("minhash4", "minhash4(str) - 4-lane MinHash signature as array<bigint>"),
      (exprs: Seq[Expression]) => MinHashAgg(exprs.head).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("minhash8"),
      info("minhash8", "minhash8(str) - 8-lane MinHash signature as array<bigint>"),
      (exprs: Seq[Expression]) =>
        MinHashAgg(exprs.head, lanes = 8).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("graft_bucket"),
      info("graft_bucket",
        "graft_bucket(col, n) - the hash bucket a bucketBy=col:n write routes this value to"),
      (exprs: Seq[Expression]) => GraftBucketExpr(exprs.head, exprs(1))))
    // whole-operator extension: logical TopKPerKey → partial/final exec
    // pair (see graft.plans.TopKPerKey)
    ext.injectPlannerStrategy(_ => new graft.plans.TopKStrategy)
    // persistent-view relation resolution for GraftCatalog (OSS Spark
    // ships the ViewCatalog API without the analyzer wiring)
    ext.injectResolutionRule(session =>
      graft.sources.ResolveGraftViews(session))
    // pure-SQL batch CDC: SELECT * FROM table_changes('cat.ns.t', f, t)
    // — a TABLE function (returns a LogicalPlan), resolved by Spark's
    // own ResolveFunctions through the table-function registry
    ext.injectTableFunction((FunctionIdentifier("table_changes"),
      info("table_changes",
        "table_changes(tbl, from[, to]) - net changelog of a graft table " +
          "between two journal versions"),
      (exprs: Seq[Expression]) =>
        graft.sources.GraftTableChanges.plan(exprs)))
    // pure-SQL ANN: SELECT * FROM ivf_search('cat.ns.idx', qMax[, np, k])
    // over an index built by CALL system.build_ivf_index
    ext.injectTableFunction((FunctionIdentifier("ivf_search"),
      info("ivf_search",
        "ivf_search(idx, qMaxId[, nprobe, k]) - top-k IVF probe search " +
          "over a persisted graft ANN index"),
      (exprs: Seq[Expression]) =>
        graft.sources.GraftIvfSearch.plan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("pq_search"),
      info("pq_search",
        "pq_search(idx, qMaxId[, k]) - top-k ADC search over a " +
          "persisted graft PQ index"),
      (exprs: Seq[Expression]) =>
        graft.sources.GraftPqSearch.plan(exprs)))
  }
}
