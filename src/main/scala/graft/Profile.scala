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
    names.foreach {
      case "--containment-volume" =>
        // the dd_containment scale diagnostic: candidate volume is what
        // the 2%-df cap must keep bounded as the corpus grows
        val nDocs = operators.Dedup.documentsCount(spark, d)
        // Persist the candidate stage so the verify timing below reuses
        // it through the CacheManager (dd_containment rebuilds the
        // identical candidate plan internally) — without the persist,
        // the "verified" number re-pays the whole candidate join and
        // the stage split this flag exists to measure is double-counted.
        val cands = operators.Dedup.containmentCandidates(spark, d).persist()
        val t0 = System.nanoTime()
        val cand = cands.count()
        val t1 = System.nanoTime()
        val verified = SparkEntry.queries("dd_containment")(spark, d).count()
        val t2 = System.nanoTime()
        cands.unpersist()
        println(f"[profile] containment-volume docs=$nDocs candidates=$cand " +
          f"(${(t1 - t0) / 1e9}%.2f s) verified=$verified (${(t2 - t1) / 1e9}%.2f s) " +
          f"cand_per_doc=${cand.toDouble / nDocs}%.2f")
      case n =>
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, d).count()
        println(f"[profile] $n%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }
    spark.stop()
  }
}
