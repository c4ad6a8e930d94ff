package graft.operators

import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import org.apache.spark.sql.execution.{FileSourceScanExec, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.SparkSpec

/** Plan-shape regression guards: the scale rules README documents are
  * asserted on real plans so a future edit can't silently reintroduce a
  * fact-side broadcast hint, lose scan pruning/pushdown, or degrade the
  * global top-k into a full sort.
  */
class PlanGuardSpec extends AnyWordSpec with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  "q3_top_orders" should {
    "force a broadcast hint ONLY on the customer dimension" in {
      val df = Relational.queries("q3_top_orders")(spark, dir)
      val hints = df.queryExecution.analyzed.collect {
        case h: ResolvedHint => h
      }
      hints should have length 1
      // the hinted subtree reads customer columns, not fact columns
      val scanned = hints.head.collectLeaves().map(_.toString).mkString
      scanned should include("c_mktsegment")
      scanned should not include "l_orderkey"
      scanned should not include "o_orderkey"
    }
  }

  "q_filter" should {
    "push its predicates into the parquet scan" in {
      val df = Relational.queries("q_filter")(spark, dir)
      val scans = df.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case s: FileSourceScanExec => s
        }
        case s: FileSourceScanExec => Seq(s)
      }.flatten
      val scan = scans.head
      scan.metadata("PushedFilters") should include("l_discount")
      // column pruning: only the 5 selected columns are read
      scan.output.map(_.name).toSet shouldBe Set("l_orderkey", "l_linenumber",
        "l_quantity", "l_discount", "l_extendedprice")
    }
  }

  "q_sort_topk" should {
    "compile to TakeOrderedAndProject, not a full sort" in {
      val df = Relational.queries("q_sort_topk")(spark, dir)
      val plan = df.queryExecution.executedPlan
      val hasTopK = plan.collectFirst {
        case t: TakeOrderedAndProjectExec => t
      }.isDefined || plan.toString.contains("TakeOrderedAndProject")
      hasTopK shouldBe true
    }
  }

  "proj_rename" should {
    "prune the scan to exactly the projected columns" in {
      val df = Projections.queries("proj_rename")(spark, dir)
      val scans = df.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case s: FileSourceScanExec => s
        }
        case s: FileSourceScanExec => Seq(s)
      }.flatten
      scans.head.output.map(_.name).toSet shouldBe
        Set("c_custkey", "c_name", "c_acctbal")
    }
  }

  "llm_bm25" should {
    "broadcast the one-row stats side and never sort-merge the corpus" in {
      val df = LlmRetrieval.queries("llm_bm25")(spark, dir)
      val s = df.queryExecution.executedPlan.toString
      // corpus x stats is a broadcast nested-loop of a single-row side —
      // the only acceptable "cross join" shape; anything exchanging the
      // corpus for the join is a regression
      s should include("BroadcastNestedLoopJoin")
      s should not include "SortMergeJoin"
      s should not include "CartesianProduct"
    }
  }

  "q_gapfill" should {
    "broadcast the day spine and never materialize a cartesian product" in {
      val df = Relational.queries("q_gapfill")(spark, dir)
      val s = df.queryExecution.executedPlan.toString
      // keys × day-spine must be the broadcast nested-loop of the tiny
      // generated spine; a CartesianProduct here would shuffle the key
      // set against itself at scale
      s should include("BroadcastNestedLoopJoin")
      s should not include "CartesianProduct"
    }
  }

  "llm_similar_ivf_kmeans" should {
    "keep every join broadcast-shaped (no corpus sort-merge, no cartesian)" in {
      val df = LlmSimilarity.queries("llm_similar_ivf_kmeans")(spark, dir)
      val s = df.queryExecution.executedPlan.toString
      s should not include "CartesianProduct"
      s should not include "SortMergeJoin"
    }
  }

  "llm_similar_ivf_quant" should {
    "keep the int8 candidate join cell-keyed and cartesian-free" in {
      // the production storage-layout search must keep the same plan
      // shape as the full-precision gate: probes broadcast into the
      // cell-id equality join, never a pairwise blow-up
      val df = LlmSimilarity.queries("llm_similar_ivf_quant")(spark, dir)
      val s = df.queryExecution.executedPlan.toString
      s should not include "CartesianProduct"
      s should include("BroadcastHashJoin")
    }
  }

  // The four heaviest TPC-H flavours, pinned: no cartesian anywhere, the
  // dimension tables broadcast, and the date/flag predicates reach the
  // parquet scans. Helpers recurse through AQE/stage wrappers because the
  // executed plan hides finalized subtrees from a flat collect(). These
  // run at sf0.01: at sf0.001 the selective filters leave zero rows and
  // AQE legitimately collapses the whole plan to EmptyRelation — no scans
  // left to assert on.
  private val sfDir = "/root/testdata/sf0.01"
  private def executedString(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE so join strategies are the real ones
    df.queryExecution.executedPlan.toString
  }

  /** Every physical node, descending through AQE stage wrappers and
    * reused exchanges (a flat collect() hides finalized subtrees).
    */
  private def walkPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(walkPlan)
  }

  private def scansOf(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] =
    walkPlan(df.queryExecution.executedPlan).collect { case s: FileSourceScanExec => s }

  private def pushedFilterOn(df: org.apache.spark.sql.DataFrame, col: String): Unit = {
    val hit = scansOf(df).exists(_.metadata.get("PushedFilters")
      .exists(_.contains(col)))
    assert(hit, s"no parquet scan pushes a filter on $col")
  }

  "q2_min_cost_supp" should {
    "broadcast the dims, push the part filters, and avoid cartesians" in {
      val df = TpchMore.queries("q2_min_cost_supp")(spark, sfDir)
      val s = executedString(df)
      s should not include "CartesianProduct"
      s should include("BroadcastHashJoin")
      // The gate checkpoints the candidate subtree (it feeds both sides of
      // the min-join), so the final plan scans an RDD — assert the p_size
      // pushdown on the pre-checkpoint subtree the gate actually builds.
      val cand = TpchMore.q2Candidates(spark, sfDir)
      val cs = executedString(cand)
      cs should not include "CartesianProduct"
      pushedFilterOn(cand, "p_size")
    }
  }

  "q9_profit" should {
    "push the part name filter and keep every join hash-shaped" in {
      val df = TpchMore.queries("q9_profit")(spark, sfDir)
      val s = executedString(df)
      s should not include "CartesianProduct"
      s should include("BroadcastHashJoin")
      pushedFilterOn(df, "p_name")
    }
  }

  "q18_big_orders" should {
    "avoid cartesians and read only the aggregation's lineitem columns" in {
      val df = Relational.queries("q18_big_orders")(spark, sfDir)
      val s = executedString(df)
      s should not include "CartesianProduct"
      // the big-order qualifying scan needs only the two agg columns
      val liScans = scansOf(df).filter(
        _.output.exists(_.name == "l_quantity"))
      liScans should not be empty
      all(liScans.map(_.output.map(_.name).toSet)) shouldBe
        Set("l_orderkey", "l_quantity")
    }
  }

  "q21_waiting_supplier" should {
    "broadcast nation/supplier dims, push the order-status filter" in {
      val df = TpchMore.queries("q21_waiting_supplier")(spark, sfDir)
      val s = executedString(df)
      s should not include "CartesianProduct"
      s should include("BroadcastHashJoin")
      pushedFilterOn(df, "o_orderstatus")
    }
  }

  /** The r7 verdict's scale flag: the selective nation/region predicate
    * must land BEFORE the first fact-side shuffle exchange, not ride on
    * the fully-joined row. Two assertions each: (a) the predicate is
    * pushed into the dim's parquet scan (scan-level = before every
    * exchange by construction); (b) any shuffle exchange whose subtree
    * carries the fact also carries the filtered dim below it — i.e. the
    * dim join happened pre-shuffle. (b) is checked over every shuffle so
    * AQE's runtime broadcast conversions can't mask a regression.
    */
  private def shufflesOf(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    walkPlan(df.queryExecution.executedPlan).collect { case e: ShuffleExchangeLike => e }
  }

  private def subtreeScanCols(p: org.apache.spark.sql.execution.SparkPlan): Set[String] =
    walkPlan(p).collect { case s: FileSourceScanExec => s }
      .flatMap(_.output.map(_.name)).toSet

  "q7_volume_shipping" should {
    "apply the nation-pair filter before any fact-side exchange" in {
      val df = TpchMore.queries("q7_volume_shipping")(spark, sfDir)
      val s = executedString(df)
      s should not include "CartesianProduct"
      pushedFilterOn(df, "n_name") // pair predicate sits ON the nation scan
      for (e <- shufflesOf(df)) {
        val cols = subtreeScanCols(e)
        if (cols.contains("l_suppkey"))
          assert(cols.contains("n_name"),
            "lineitem shuffled before the nation-filtered supplier join")
        if (cols.contains("o_custkey"))
          assert(cols.contains("n_name"),
            "orders shuffled before the nation-filtered customer join")
      }
    }
  }

  "q8_market_share" should {
    "apply the ASIA region filter before any fact-side exchange" in {
      val df = TpchMore.queries("q8_market_share")(spark, sfDir)
      val s = executedString(df)
      s should not include "CartesianProduct"
      pushedFilterOn(df, "r_name") // ASIA predicate sits ON the region scan
      for (e <- shufflesOf(df)) {
        val cols = subtreeScanCols(e)
        if (cols.contains("o_custkey"))
          assert(cols.contains("r_name"),
            "orders shuffled before the region-filtered customer join")
      }
    }
  }

  "llm_ngram_jaccard" should {
    "form candidates via an equality join on the band key, never a cartesian" in {
      val df = LlmDedup.queries("llm_ngram_jaccard")(spark, dir)
      val s = df.queryExecution.executedPlan.toString
      s should not include "CartesianProduct"
      s should not include "BroadcastNestedLoopJoin"
    }
  }

  "llm_simhash_pairs" should {
    "form candidates via an equality join on the chunk key, never a cartesian" in {
      val df = LlmDedup.queries("llm_simhash_pairs")(spark, dir)
      val s = df.queryExecution.executedPlan.toString
      s should not include "CartesianProduct"
      s should not include "BroadcastNestedLoopJoin"
    }
  }

  "llm_inverted_index" should {
    "build in one aggregation exchange (partial + final collect_set)" in {
      val df = LlmRetrieval.queries("llm_inverted_index")(spark, dir)
      val s = df.queryExecution.executedPlan.toString
      // two ObjectHashAggregates (partial/final) around one exchange; a
      // reintroduced distinct() would add a second full-width exchange
      s.sliding("ObjectHashAggregate".length)
        .count(_ == "ObjectHashAggregate") shouldBe 2
      // exchanges: the parallelism repartition, the agg shuffle, and the
      // oracle ORDER BY's range exchange — nothing else
      s.sliding("Exchange".length).count(_ == "Exchange") should be <= 3
    }
  }
}
