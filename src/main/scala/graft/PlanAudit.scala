package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain(formatted)` for selected gate queries so plan
  * regressions (fact-side broadcasts, unpruned scans, lost pushdown) are
  * visible. Usage: `runMain graft.PlanAudit [queryName ...]`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions",
        classOf[graft.functions.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q3_top_orders", "q_filter", "proj_rename", "llm_dedup_minhash",
        "llm_similar_ivf", "llm_multimodal")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
