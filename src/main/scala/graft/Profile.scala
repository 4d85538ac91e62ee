package graft

import org.apache.spark.sql.functions.col

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
      case "--cc-compare" =>
        // head-to-head of the two DISTRIBUTED CC algorithms on the same
        // pair graph (driver fast path disabled): pointer-jumping
        // fixpoint vs alternating large-star/small-star. Informs which
        // one ddCluster's >threshold route should use at a given graph
        // shape.
        val pairs = operators.Dedup
          .minhashPairs(spark, d).select(col("doc_a"), col("doc_b"))
          .persist()
        val nPairs = pairs.count()
        val t0 = System.nanoTime()
        val pj = operators.Dedup.connectedComponentsPointerJump(pairs)
        val pjRows = pj.count()
        val t1 = System.nanoTime()
        val st = operators.Dedup.connectedComponentsStar(pairs)
        val stRows = st.count()
        val t2 = System.nanoTime()
        val diff = pj.exceptAll(st).count() + st.exceptAll(pj).count()
        pairs.unpersist()
        println(f"[profile] cc-compare pairs=$nPairs " +
          f"pointer_jump=${(t1 - t0) / 1e9}%.2f s ($pjRows nodes) " +
          f"star=${(t2 - t1) / 1e9}%.2f s ($stRows nodes) label_diff=$diff")
      case "--decontam-crossover" =>
        // exact join vs bloom-gated at growing eval-set sizes, with NO
        // broadcast hint — the planner shifts broadcast → shuffle as
        // the eval side outgrows the threshold, and the sweep locates
        // the crossover where the map-only gate starts winning
        Seq(20L, 500L, 5000L, 20000L).foreach { b =>
          def time(useBloom: Boolean): (Double, Long) = {
            val t0 = System.nanoTime()
            val rows = operators.TextAnalysis.decontamMeasure(spark, d, b, useBloom).count()
            ((System.nanoTime() - t0) / 1e9, rows)
          }
          val (te, re) = time(false)
          val (tb, rb) = time(true)
          println(f"[profile] decontam-crossover bench=$b exact=$te%.2f s " +
            f"bloom=$tb%.2f s rows=$re/$rb")
          require(re == rb, s"bloom gate changed the output at bench=$b")
        }
      case n =>
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, d).count()
        println(f"[profile] $n%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }
    spark.stop()
  }
}
