package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Headline set: a stable representative core (scan/agg, joins,
    * windows, ETL, dedup, ANN, streaming-semantics) whose total is
    * comparable across rounds regardless of how many additional
    * operators the library registers. Every registered query is still
    * timed individually in "queries"; "all_total" sums the full sweep.
    */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q03_shipping_priority", "q05_local_supplier",
    "q06_revenue_filter", "q09_window_rank", "q18_large_orders",
    "etl_master_table", "etl_standardize_union",
    "dd_exact", "dd_minhash_lsh", "ann_brute_topk",
    "tx_clean_corpus", "st_sessionize")

  /** DRIFT SENTINELS (round 14, the r13 verdict's ask #2): ten ops
    * whose code has been untouched for many rounds, paired with their
    * official BENCH_QUERIES_r13 min values. Two same-code runs in
    * round 13 differed 24% (builder 5.667 s vs driver 7.03 s headline)
    * with the shift uniform across files without commits — machine
    * state, not plans. drift_factor = median(current/r13 reference)
    * over these ops names that machine state explicitly, so
    * `headline_drift_normalized = headline / drift_factor` compares
    * rounds on identical terms. The references are the DRIVER's r13
    * numbers (the gating artifact), so a driver-run r14 bench under
    * the same machine state reads drift ≈ 1.
    */
  val driftSentinels: Seq[(String, Double)] = Seq(
    "q01_pricing_summary" -> 0.387, "q03_shipping_priority" -> 0.960,
    "q05_local_supplier" -> 0.841, "q06_revenue_filter" -> 0.244,
    "q16_having" -> 0.396, "q34_stats" -> 0.316,
    "etl_classify" -> 0.206, "mm_resize" -> 0.136,
    "tx_clean_corpus" -> 0.485, "ann_brute_topk" -> 0.328)

  /** SECOND headline list (round 12, the verdict's ask #5): the
    * composed flagship DAGs, benched alongside the stable headline so
    * a regression in operator COMPOSITION (a lost cache barrier, a
    * stage that starts recomputing) surfaces round-over-round even
    * when every individual operator stays flat. The four registry
    * flagships are timed inside the normal sweep (so flagship_total is
    * derived from the same samples as everything else); the streaming
    * flagship's batch probe — statementPipelineApplyBatch on the full
    * statement corpus, cold store, batch 0 — is NOT a registry query
    * and is timed separately ([[timeStatementBatch]]), reported under
    * the reserved name "statement_batch_probe".
    */
  val flagships: Seq[String] =
    Seq("etl_e2e", "dd_pipeline", "mm_pipeline", "tx_pipeline")

  /** FROZEN flagship headline set (round 14, the r13 verdict's ask
    * #5): the six composed DAGs — the four registry flagships plus the
    * stateful curation twin and the streaming batch probe — as a FIXED
    * cross-round list, separate from `flagships` (whose total has
    * r11-r13 continuity). flagshipHeadlineR13 is the back-reference:
    * the sum of BENCH_r13.json's values for exactly these six
    * (etl_e2e 1.007 + dd_pipeline 3.869 + mm_pipeline 0.982 +
    * tx_pipeline 0.131 + tx_curation_incremental 4.094 +
    * statement_batch_probe 2.107).
    */
  val flagshipHeadline: Seq[String] =
    Seq("etl_e2e", "dd_pipeline", "mm_pipeline", "tx_pipeline",
      "tx_curation_incremental")
  val flagshipHeadlineR13: Double = 12.190

  /** Operators whose SEMANTICS changed this round: their bench deltas
    * vs the prior round are operator changes, not perf regressions
    * (the q22/q37 lesson — reset each round). Round 14: dd_simhash's
    * output GREW — the r13 4×16-bit banding was pigeonhole-exact only
    * to hamming ≤ 3 while the verify admitted ≤ 4, so hamming-4 pairs
    * spread one-bit-per-chunk were unreachable (85,014 such pairs at
    * 25×: 2,114,379 → 2,199,393 rows). The round-14 exact banding
    * emits ALL pairs at hamming ≤ 4, so its rows (and the sf0.1
    * bench delta) reflect a recall fix, not a perf regression.
    * etl_dict_maintain is NEW, not changed. dd_pair_quality_sampled's
    * sample predicate moved from md5 to the shared integer hash (the
    * per-pair md5 out-costed the verify stage it gates — see
    * Dedup.pairSamplePredicate), so its sample membership, and
    * therefore its output rows, changed.
    */
  val semanticsChanged: Seq[String] =
    Seq("dd_simhash", "dd_pair_quality_sampled")

  /** One COLD apply of the streaming flagship's micro-batch kernel:
    * the whole statement corpus as batch 0 — extract + classify, the
    * MinHash index build + probe, the IVF index build + probe — into
    * throwaway dirs/tables, mirroring EventStreamsSpec's construction.
    * Fresh table names + temp dirs per call so each sample pays the
    * full per-batch cost (this probe measures the foreachBatch body,
    * not a warm store).
    */
  private def timeStatementBatch(spark: SparkSession,
      errors: scala.collection.mutable.Map[String, String]): Double = {
    import org.apache.spark.sql.functions._
    val fe = graft.operators.FundEtl
    val docs = fe.loadStatements(spark, fe.statementsDir)
    val seedNames = docs.select(col("file_name")).orderBy(col("file_name"))
      .limit(4).collect().map(_.getString(0)).toSeq
    val centroids: Seq[(Long, Seq[Float])] = docs
      .filter(col("file_name").isin(seedNames: _*))
      .select(xxhash64(col("file_name")).as("id"),
        graft.functions.VectorFunctions.hashedTextEmbedding(col("content"))
          .as("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench-stmt").toString
    val tag = java.lang.Long.toHexString(System.nanoTime())
    val ddTbl = s"bench_stmt_dd_$tag"
    val annTbl = s"bench_stmt_ann_$tag"
    val t0 = System.nanoTime()
    try {
      graft.streaming.EventStreams.statementPipelineApplyBatch(
        docs, 0L, s"$tmp/extracted", ddTbl, s"$tmp/pairs", centroids,
        annTbl, s"$tmp/topk", nprobe = 2, k = 3)
      (System.nanoTime() - t0) / 1e9
    } catch { case t: Throwable =>
      // record WHAT broke (round-12 advice: a silent -1.0 made a dead
      // streaming flagship undiagnosable from BENCH json); sanitize so
      // the message can't break the hand-built JSON
      errors.getOrElseUpdate("statement_batch_probe",
        t.toString.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(160))
      -1.0
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $ddTbl")
      spark.sql(s"DROP TABLE IF EXISTS $annTbl")
      // each sample creates its own temp dir — delete it (round-12
      // advice: three leaked parquet-filled dirs per bench run)
      try {
        val root = java.nio.file.Paths.get(tmp)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case _: Throwable => () }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", "graft-bench")
    // Warm each query once on the tiny SF: identical plans modulo the
    // input path, so the generated-code cache is hot and the timed runs
    // measure execution, not Janino compilation.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => }
    }
    spark.catalog.clearCache()
    // A failed query must be a loud error marker, not a plausible wall
    // time — otherwise a regression hides inside a "fast" number.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // MEDIAN OF 3 ACROSS INTERLEAVED SWEEPS (round 11). The previous
    // shape — 3 back-to-back runs per op — could not absorb the noise
    // it was built for: JVM state (GC debt, JIT recompilation, malloc
    // arenas) carries over from the PRECEDING operator, so all three
    // back-to-back runs of one op share the same bad neighborhood and
    // the median keeps the bias. Round 10's "3-4x regressions with
    // untouched code" were exactly this: queries is a hash Map, so
    // registering 36 new ops reshuffled the sweep order and handed
    // several ops new expensive predecessors. Two fixes here:
    // (a) the sweep order is pinned to sorted names — stable as the
    //     registry grows, so round-over-round neighbors stay fixed;
    // (b) the 3 runs of an op come from 3 FULL sweeps, so each sample
    //     sees a different JVM epoch and the median really is a
    //     median over machine states, not over one state thrice.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to 3).foreach { _ =>
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case t: Throwable =>
            errors.getOrElseUpdate(name, t.getClass.getSimpleName); false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // Each measurement is self-contained: drop this operator's
        // persisted intermediates so they don't distort the next one.
        spark.catalog.clearCache()
        samples(name) = (if (ok) dt else -1.0) :: samples(name)
      }
    }
    // TWO statistics from the same 3 samples (round 11): the MIN
    // across epochs is the op's achievable warm time — semantically
    // the closest match to the previous back-to-back median (whose
    // runs 2-3 were JIT-warm), so it's the round-over-round
    // comparison statistic and feeds the headline. The MEDIAN across
    // epochs is systematically ~1.3x higher (a mid-sweep sample often
    // runs with this op's JIT state evicted by the other 171 ops —
    // measured uniformly, e.g. q01 0.20→0.28 on untouched code) and
    // is kept alongside as the conservative steady-state number.
    val mins = names.map { name =>
      val times = samples(name)
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    val medians = names.map { name =>
      val times = samples(name)
      name -> (if (times.exists(_ < 0)) -1.0 else times.sorted.apply(1))
    }
    val results = mins
    val succeeded = results.filter(_._2 >= 0).toMap
    // Flagship probe: min of 3 cold applies (after the sweeps so its
    // JVM state matches the sweep samples' steady state).
    val stmtProbe = (1 to 3).map(_ => timeStatementBatch(spark, errors))
    val stmtBatch =
      if (stmtProbe.exists(_ < 0)) -1.0 else stmtProbe.min
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val headlineTotal = headline.flatMap(succeeded.get).sum
    // A failed headline query shrinks headlineTotal, which would read as a
    // SPEEDUP round-over-round — flag incompleteness so the headline number
    // can't be compared as-is.
    val headlineComplete = headline.forall(succeeded.contains)
    val allTotal = if (succeeded.nonEmpty) succeeded.values.sum else 0.0
    val hs = headline.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sc = semanticsChanged.map("\"" + _ + "\"").mkString("[", ",", "]")
    val qsMed = medians.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Flagship second headline: registry flagships from the sweep's
    // own min samples + the separately-timed streaming-batch probe.
    val flagshipMap = flagships.map(k =>
      k -> succeeded.getOrElse(k, -1.0)) :+ ("statement_batch_probe" -> stmtBatch)
    val flagshipComplete = flagshipMap.forall(_._2 >= 0)
    val flagshipTotal =
      if (flagshipComplete) flagshipMap.map(_._2).sum else -1.0
    val fj = flagshipMap.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // The frozen 6-op flagship headline (registry five + the probe)
    // with its r13 back-reference — see flagshipHeadline's scaladoc.
    val fhMap = flagshipHeadline.map(k =>
      k -> succeeded.getOrElse(k, -1.0)) :+ ("statement_batch_probe" -> stmtBatch)
    val fhTotal = if (fhMap.forall(_._2 >= 0)) fhMap.map(_._2).sum else -1.0
    // Drift normalization: median(current min / r13 driver reference)
    // over the sentinel ops; -1 when fewer than 5 sentinels succeeded
    // (a drift factor from a broken sweep would be noise, not signal).
    val driftRatios = driftSentinels.flatMap { case (k, ref) =>
      succeeded.get(k).filter(_ > 0).map(_ / ref)
    }.sorted
    // true median: even counts average the middle two — taking only
    // the upper-middle order statistic would shift the normalized
    // headline by the gap between them
    val driftFactor =
      if (driftRatios.size < 5) -1.0
      else if (driftRatios.size % 2 == 1) driftRatios(driftRatios.size / 2)
      else (driftRatios(driftRatios.size / 2 - 1) + driftRatios(driftRatios.size / 2)) / 2.0
    val headlineNorm =
      if (driftFactor > 0 && headlineComplete) headlineTotal / driftFactor else -1.0
    val driftJson = driftSentinels.map { case (k, ref) =>
      s"\"" + k + "\":{\"ref_r13\":" + ref + ",\"cur\":" + succeeded.getOrElse(k, -1.0) + "}"
    }.mkString("{", ",", "}")
    // "stat" names the headline statistic EXPLICITLY (the round-11
    // advice): min across 3 interleaved full sweeps, pinned sorted
    // order — round-over-round deltas are only meaningful against a
    // BENCH_r*.json carrying the same marker. queries_median is the
    // conservative steady-state companion from the same samples.
    val fullJson = s"""{"metric":"total","value":$headlineTotal,"unit":"sec","stat":"min_of_3_interleaved_sweeps","headline_complete":$headlineComplete,"drift_factor":$driftFactor,"headline_drift_normalized":$headlineNorm,"drift_sentinels":$driftJson,"flagship_headline_total":$fhTotal,"flagship_headline_r13":$flagshipHeadlineR13,"queries":$qs,""" +
      s""""queries_median":$qsMed,"errors":$es,"headline":$hs,"flagship_total":$flagshipTotal,"flagship_complete":$flagshipComplete,"flagship_queries":$fj,"semantics_changed":$sc,"all_total":$allTotal,"n_queries":${results.size},"sf":"$sfDir"}"""
    println(fullJson)
    // The driver's stdout tail capture is character-bounded and has
    // truncated the per-query map to ~40% in past rounds — persist the
    // full map to its own file so per-query times stay comparable
    // across rounds regardless of capture limits.
    val benchOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      new java.io.File("BENCH_QUERIES_LATEST.json").getAbsolutePath)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(benchOut), fullJson + "\n")
    catch { case t: Throwable =>
      // never fail the bench over the fallback file, but never lose it
      // silently either — the file exists precisely because stdout gets
      // truncated
      System.err.println(s"[bench] could not persist per-query map to $benchOut: $t")
    }
    // Also persist a PER-ROUND copy so medians stay comparable across
    // rounds after LATEST is overwritten. SPARK_GRAFT_ROUND pins the
    // label explicitly (a same-round re-run after the driver already
    // wrote BENCH_r{N}.json would otherwise infer N+1); the fallback
    // infers one past the highest BENCH_r{N}.json already on disk.
    try {
      val dir = java.nio.file.Paths.get(benchOut).toAbsolutePath.getParent
      val rnd = sys.env.get("SPARK_GRAFT_ROUND").flatMap(_.toIntOption)
        .getOrElse {
          // Files.list holds an open directory handle until closed
          val listing = java.nio.file.Files.list(dir)
          try {
            scala.jdk.CollectionConverters
              .IteratorHasAsScala(listing.iterator()).asScala
              .flatMap { p =>
                "^BENCH_r(\\d+)\\.json$".r.findFirstMatchIn(p.getFileName.toString)
                  .map(_.group(1).toInt)
              }.foldLeft(0)(math.max) + 1
          } finally listing.close()
        }
      java.nio.file.Files.writeString(
        dir.resolve(f"BENCH_QUERIES_r$rnd%02d.json"), fullJson + "\n")
    } catch { case t: Throwable =>
      System.err.println(s"[bench] could not persist per-round map: $t")
    }
    // Compact repeat on its own FINAL line: the driver's tail capture is
    // character-bounded and once truncated the leading "value" field out
    // of the long line above. This line is short enough to always survive.
    println(s"""{"metric":"total","value":$headlineTotal,"unit":"sec","stat":"min_of_3_interleaved_sweeps","headline_complete":$headlineComplete,"drift_factor":$driftFactor,"headline_drift_normalized":$headlineNorm,"flagship_total":$flagshipTotal,"flagship_headline_total":$fhTotal,"all_total":$allTotal,"n_queries":${results.size},"n_errors":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
