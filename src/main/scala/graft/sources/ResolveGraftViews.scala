package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier

/** Relation resolution for graft PERSISTENT VIEWS. OSS Spark 4.1 ships
  * the DSv2 ViewCatalog API but wires neither `CREATE VIEW` execution
  * nor relation lookup for it — connectors inject both themselves
  * (Iceberg's Spark extension does exactly this). This rule fills the
  * read half: a fully-qualified `cat.ns….v` reference whose catalog is
  * a [[GraftCatalog]] and whose identifier names a stored view expands
  * to the view's parsed SQL under a SubqueryAlias; the surrounding
  * fixed-point analysis then resolves the expansion (views over views
  * converge pass-by-pass; a self-referential view hits the analyzer's
  * iteration limit and fails loudly). View DDL goes through the CALL
  * procedures (`system.create_view` / `system.drop_view`) — stored SQL
  * must fully qualify its table references, which `create_view`
  * verifies by analyzing the text before storing it.
  */
case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.multipartIdentifier.length >= 3 =>
        expand(u.multipartIdentifier).getOrElse(u)
    }

  /** Views currently being expanded on this thread: nested analysis
    * re-enters this rule for views-over-views, so a definition cycle
    * would otherwise recurse to stack overflow instead of failing with
    * a diagnosable error.
    */
  private def expanding: java.util.ArrayDeque[String] =
    ResolveGraftViews.expandStack.get()

  private def expand(parts: Seq[String]): Option[LogicalPlan] = {
    // (companion holds the per-thread stack so every rule instance —
    // one per session — shares it within a thread)
    val mgr = spark.sessionState.catalogManager
    if (!mgr.isCatalogRegistered(parts.head)) return None
    mgr.catalog(parts.head) match {
      case g: GraftCatalog =>
        val ident = Identifier.of(parts.tail.dropRight(1).toArray, parts.last)
        if (!g.viewExists(ident)) None
        else {
          val key = parts.mkString(".")
          if (expanding.contains(key)) throw new IllegalStateException(
            s"graft catalog: recursive view definition — $key references " +
              s"itself through ${expanding.toArray.mkString(" -> ")}")
          val v = g.loadView(ident)
          // NESTED analysis of the stored text (the same re-entrant
          // pattern session views use): substitution-batch rules like
          // CTESubstitution already ran for the OUTER plan, so a merely
          // parsed subtree would leave the view's own CTE references
          // unresolved. Unresolvable leftovers still surface at the
          // outer CheckAnalysis.
          val parsed = spark.sessionState.sqlParser.parsePlan(v.query())
          expanding.push(key)
          try Some(SubqueryAlias(parts.last,
            spark.sessionState.analyzer.execute(parsed)))
          finally { expanding.pop(); () }
        }
      case _ => None
    }
  }
}

object ResolveGraftViews {
  private val expandStack
      : ThreadLocal[java.util.ArrayDeque[String]] =
    ThreadLocal.withInitial(() => new java.util.ArrayDeque[String]())
}
