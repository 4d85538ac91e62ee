package graft

/** Dev tool: dump formatted physical plans for the audit queries
  * (pushdown / broadcast / codegen review per SURVEY.md §5).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q01_pricing_summary", "q02_filter_project", "q05_local_supplier",
      "q06_revenue_filter", "q19_broadcast_enrich", "ann_brute_topk")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
