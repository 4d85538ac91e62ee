package graft

/** Dev tool: time individual operators (or all) at a given SF.
  *
  * Usage: runMain graft.Profile <sfDir> [queryName ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    spark.range(1).count()
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, d).count()
      println(f"[profile] $n%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }
    spark.stop()
  }
}
