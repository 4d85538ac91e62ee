package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[8]", "plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"=== $name ===")
      val plan = SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
      println(plan.linesIterator.map(_.take(150)).take(45).mkString("\n"))
    }
    spark.stop()
  }
}
