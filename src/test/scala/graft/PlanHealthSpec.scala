package graft

/** Physical-plan regression guards over the whole operator surface —
  * the properties SURVEY.md §5 claims, asserted so a future operator
  * can't silently lose them.
  */
class PlanHealthSpec extends SparkTestBase {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("no operator plans a CartesianProduct") {
    SparkEntry.queries.keys.foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans an unbounded cartesian product")
    }
  }

  test("selective scans push their filters into the parquet reader") {
    Seq("q02_filter_project", "q06_revenue_filter", "q03_shipping_priority").foreach { n =>
      val plan = planOf(n)
      assert("PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
        s"$n: no non-empty PushedFilters in\n$plan")
    }
  }

  test("dimension joins broadcast instead of shuffling the fact side") {
    Seq("q05_local_supplier", "q19_broadcast_enrich", "etl_enrich_lookup",
      "ann_ivf_topk").foreach { n =>
      val plan = planOf(n)
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
        s"$n: expected a broadcast join in\n$plan")
    }
  }

  test("etl_e2e composes its stages without redundant shuffles") {
    // decode → classify → extract → enrich → master are one map-only
    // pipeline over the file scan (round 17: classification is a
    // COMPILED when-chain — the old per-file priority window and its
    // shuffle are gone); the whole DAG may exchange only for the dedup
    // window (text_hash) and the presentation sort. More exchanges
    // means a stage stopped composing.
    val plan = planOf("etl_e2e")
    val exchanges = "Exchange (hash|range)partitioning".r.findAllIn(plan).toList
    assert(exchanges.size <= 2,
      s"etl_e2e plans ${exchanges.size} exchanges (${exchanges.mkString(", ")}):\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"every e2e join must broadcast (rules + dict are tiny):\n$plan")
  }

  test("redemption family: compiled classify + broadcast labels stay map-only") {
    // the redemption chain (redeem ingest / multi-record explode /
    // positional rows) mirrors etl_ingest_files' shape: compiled
    // when-chain classification, broadcast-only label and dict joins,
    // zero hash exchanges — the only exchange is the presentation
    // sort's range partitioning.
    Seq("etl_redeem_ingest", "etl_redeem_multi", "etl_redeem_rows",
      "etl_div_ingest", "etl_div_multi", "etl_div_rows",
      "etl_apply_ingest", "etl_apply_multi", "etl_apply_rows",
      "etl_conv_ingest").foreach { n =>
      val plan = planOf(n)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"$n must classify/extract without a hash shuffle:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$n: rule/dict joins must broadcast:\n$plan")
    }
    // the merge is the one legitimately-aggregating member: its only
    // hash exchanges are the two partial-agg levels
    val plan = planOf("etl_div_merge")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 2, s"etl_div_merge plans $hashEx hash exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"etl_div_merge: the dict join must broadcast:\n$plan")
  }

  test("dd_pipeline composes its stages without redundant shuffles") {
    // exact → pairs → CC → canonical → split as ONE DAG: the final
    // composed plan (everything downstream of the CC labels, which
    // cross a materialization barrier) may exchange only for the
    // exact-stage digest groupBy, the canonical window (cluster_id),
    // the fan-back join keying (keeper_id, both sides) and the
    // presentation sort. A sixth exchange means a stage stopped
    // composing — e.g. the split stage re-deriving labels instead of
    // reading the canonical stage's output.
    // AQE's INITIAL plan keys the label/quality joins as SMJ (their
    // subtree sizes aren't statically known below the broadcast
    // threshold); the runtime-finalized plan is the one the guard is
    // about, so execute first and read the adaptive plan's final form.
    val df = SparkEntry.queries("dd_pipeline")(spark, sfDir)
    df.collect()
    // the finalized AdaptiveSparkPlan prints "final plan == Initial
    // Plan ==" — count only the final section
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = "Exchange (hash|range)partitioning".r.findAllIn(plan).toList
    assert(exchanges.size <= 5,
      s"dd_pipeline plans ${exchanges.size} exchanges (${exchanges.mkString(", ")}):\n$plan")
    // label + quality joins stay hash-family (broadcast at harness SF);
    // a nested loop here means an equi key fell out
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"dd_pipeline joins must all be equi joins:\n$plan")
  }

  test("mm_pipeline composes its stages without redundant shuffles") {
    // decode → pairs → CC → keep-one as ONE DAG: the decoded frame is
    // a localCheckpoint barrier feeding every consumer, so the final
    // plan (downstream of the CC labels, which cross their own
    // materialization barrier) may exchange only for the label window,
    // the per-label rollup keying, and the presentation sort — and the
    // binary corpus must never re-scan past the checkpoint. Like the
    // dd_pipeline pin, read the runtime-finalized adaptive plan.
    val df = SparkEntry.queries("mm_pipeline")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = "Exchange (hash|range)partitioning".r.findAllIn(plan).toList
    assert(exchanges.size <= 4,
      s"mm_pipeline plans ${exchanges.size} exchanges (${exchanges.mkString(", ")}):\n$plan")
    assert(!plan.contains("FileScan binaryFile"),
      s"decode barrier lost — the image corpus re-scans:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"mm_pipeline joins must all be equi joins:\n$plan")
  }

  test("dd_semantic: the within-cluster self-join is an equi join, assignment broadcasts") {
    // the Σ cluster² bound rests on the self-join keying on cent_id —
    // if the equi component ever fell out of the condition, Spark
    // would plan a nested-loop over vectors² and the operator's whole
    // scale story would be silently gone
    val plan = planOf("dd_semantic")
    // the semi self-join must be a HASH-family join (broadcast at tiny
    // SF, shuffled/sort-merge at scale — all key on cent_id); a nested
    // loop here means the equi component fell out
    assert("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \\[cent_id[^\\]]*\\].*LeftSemi".r
        .findFirstIn(plan).isDefined,
      s"dd_semantic self-join must key on cent_id (hash-family equi join):\n$plan")
    assert(!"BroadcastNestedLoopJoin.*LeftSemi".r.findFirstIn(plan).isDefined,
      s"dd_semantic self-join degenerated to a nested loop:\n$plan")
    // round 17: at harness SF the assignment takes the LITERAL route
    // (one codegen'd CASE projection — no joins at all), so the whole
    // dd_semantic plan must now be free of nested loops entirely
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"dd_semantic literal-route assignment should plan no nested loop:\n$plan")
  }

  test("three-level DISTRIBUTED assignment: coarse broadcasts, mid/fine equi-join") {
    // the scale-path kernel's plan shape, audited directly (harness-SF
    // operators route to the literal form, so this is the only place
    // the distributed chain's joins stay pinned): the coarse level is
    // the one legitimate bounded nested loop (broadcast cross against
    // the k^(1/3)-row coarse table); mid and fine must equi-join on
    // coarse_id / mid_id — a cross at either level is the n·k flat
    // assignment the three-level quantizer exists to avoid
    val emb = sources.Tables.embeddings(spark, sfDir)
    val k = operators.Similarity.annK(emb.count())
    val kc = operators.Similarity.cubeRootCeil(k)
    val (_, _, assignD) =
      operators.Similarity.threeLevelDistributed(spark, emb, k, kc, kc * kc)
    val plan = assignD(emb, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"coarse assignment must broadcast:\n$plan")
    assert("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \\[coarse_id".r
        .findFirstIn(plan).isDefined,
      s"mid assignment must equi-join on coarse_id:\n$plan")
    assert("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \\[mid_id".r
        .findFirstIn(plan).isDefined,
      s"fine assignment must equi-join on mid_id:\n$plan")
  }

  test("tx_decontaminate_bloom: the bloom gate filters BELOW the shingle join") {
    // the operator exists to prune the corpus stream before any join;
    // the probe must appear as a Filter(might_contain) in the plan,
    // not vanish into (or float above) the join
    val plan = planOf("tx_decontaminate_bloom")
    assert(plan.toLowerCase.contains("might_contain"),
      s"bloom probe missing from the physical plan:\n$plan")
    val gateIdx = plan.toLowerCase.indexOf("might_contain")
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    assert(joinIdx >= 0 && gateIdx > joinIdx,
      s"bloom gate should sit below (print after) the join it feeds:\n$plan")
  }

  test("tx_lm_score: the scoring join broadcasts the pruned model") {
    // the exploded bigram stream is Zipf-skewed on (w1, w2); the whole
    // design rests on the pruned (≤1M-row by construction) model
    // broadcasting so scoring is map-only. A SortMergeJoin against the
    // per-document stream means the prune-or-broadcast fell out and
    // the operator is back to the plan that dies at 100 TB.
    val plan = planOf("tx_lm_score")
    assert("BroadcastHashJoin \\[w1[^\\]]*w2[^\\]]*\\].*LeftOuter".r.findFirstIn(plan).isDefined,
      s"tx_lm_score scoring join must be a broadcast left join on (w1, w2):\n$plan")
    assert(!plan.contains("SortMergeJoin [w1"),
      s"tx_lm_score must never shuffle the exploded bigram stream:\n$plan")
  }

  test("tx_repeated_passages: only the distinct-agg exchanges plus the presentation sort") {
    // explode stays map-side; the aggregation is an EXACT
    // count(distinct doc_id), whose distributed shape is inherently
    // two-phase (partial distinct on (passage, doc_id), then the final
    // passage aggregate) — so exactly TWO hash exchanges, both on
    // passage-derived keys. A third means the explode or a join snuck a
    // shuffle in.
    val plan = planOf("tx_repeated_passages")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).toList
    assert(hashEx.size <= 2,
      s"tx_repeated_passages plans ${hashEx.size} hash exchanges:\n$plan")
    assert(plan.contains("Generate explode"), s"expected a declarative explode in:\n$plan")
  }

  test("q45_basket_pairs: pair expansion is map-side, no self-join") {
    // the naive basket-pairs plan self-joins the fact table on
    // orderkey (two scans + a join); the Spark-first plan groups once
    // and expands C(n,2) pairs with an indexed-transform HOF on the
    // grouped rows. Any join in this plan means the expansion
    // regressed to the self-join; more than three exchanges (basket
    // groupBy, pair agg, presentation range sort) means the explode
    // or the HOF snuck a shuffle in.
    val plan = planOf("q45_basket_pairs")
    assert(!plan.contains("Join"), s"q45_basket_pairs must not join:\n$plan")
    val ex = "Exchange".r.findAllIn(plan).size
    assert(ex <= 3, s"q45_basket_pairs plans $ex exchanges:\n$plan")
    assert(plan.contains("Generate explode"),
      s"expected the declarative pair explode in:\n$plan")
  }

  test("q46_rfm_segment: no global window — boundary scoring is map-only") {
    // round 18: the three exact ntile(4) windows were single-partition
    // sorts of the per-customer aggregate — the r17 verdict's #1
    // scale-killer. Quartiles now come from distributed exact rank
    // selection (Relational.exactRankPairs: iterated-histogram rounds,
    // never a global sort) and the scoring plan is a map-only
    // projection over the checkpointed aggregate: NO window node, NO
    // single-partition exchange, NO join anywhere in the final plan —
    // the only exchanges are the 64-cell segment aggregate and the
    // presentation sort.
    val full = planOf("q46_rfm_segment")
    assert(!full.contains("Join"), s"q46_rfm_segment must not join:\n$full")
    assert(!full.contains("Window"),
      s"q46_rfm_segment must not plan a window:\n$full")
    assert(!full.contains("Exchange SinglePartition"),
      s"q46_rfm_segment must not single-partition:\n$full")
    // the custkey reduction is localCheckpointed (measured faster
    // than persist — every consumer plans over a bare ExistingRDD
    // scan), so the scoring plan's leaf is the checkpoint RDD and the
    // fact scan appears NOWHERE in the final plan
    val hashEx = "Exchange hashpartitioning".r.findAllIn(full).size
    assert(hashEx <= 1, s"q46_rfm_segment plans $hashEx hash exchanges:\n$full")
    assert(!full.contains("FileScan parquet"),
      s"q46_rfm_segment re-scans the facts past the checkpointed reduction:\n$full")
    assert(full.contains("Scan ExistingRDD"),
      s"scoring must read the checkpointed reduction:\n$full")
  }

  test("q59_markov_transitions: map-side pair expansion, no self-join, bounded window") {
    // the naive formulation self-joins events on user_id (explodes on
    // heavy users); the q45 shape groups once and expands adjacent
    // pairs map-side. The only window runs over the <=types^2
    // aggregate — its input chain must contain the (f, t)-keyed
    // HashAggregate, never the fact scan directly.
    val plan = planOf("q59_markov_transitions")
    assert(!plan.contains("Join"), s"q59 must not join:\n$plan")
    val scans = "FileScan parquet|Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"q59 scans events $scans times:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 3, s"q59 plans $hashEx hash exchanges:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"q59 plans a global exchange:\n$plan")
    assert(plan.contains("Generate explode"),
      s"expected the declarative pair explode in:\n$plan")
  }

  test("q61_rolling_median: one user window, one scan, no global sort") {
    val plan = planOf("q61_rolling_median")
    assert("windowspecdefinition\\(user_id#\\d+L?, ts#\\d+".r.findFirstIn(plan).isDefined,
      s"median frame must partition by user_id:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"q61 plans a global exchange:\n$plan")
    val scans = "FileScan parquet|Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"q61 scans events $scans times:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 1, s"q61 plans $hashEx hash exchanges:\n$plan")
    val windows = "Window ".r.findAllIn(plan).size
    assert(windows == 1, s"q61 plans $windows window nodes:\n$plan")
  }

  test("q60_window_funnel: one grouping shuffle, the state machine folds map-side") {
    // st_funnel's shape re-joins the fact table once per step; the
    // windowed funnel must do the whole march in ONE user grouping —
    // no join anywhere, one scan, one hash exchange, and the only
    // SinglePartition exchange carries the 3-counter aggregate row
    val plan = planOf("q60_window_funnel")
    assert(!plan.contains("Join"), s"q60 plans a join:\n$plan")
    val scans = "FileScan parquet|Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"q60 scans events $scans times:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 1, s"q60 plans $hashEx hash exchanges:\n$plan")
    val single = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(single <= 1, s"q60 plans $single global exchanges:\n$plan")
  }

  test("q46_rfm_sketch: no window anywhere — cut-points collected, scoring map-only") {
    // the whole point of the sketch twin: quartile assignment without
    // ANY sort of the per-customer aggregate. Round 12 split the op
    // into two pinned plans. (1) The cut-point JOB (rfmCutpointsFrame
    // over the per-customer aggregate): its only SinglePartition
    // exchange carries the three approx_percentile sketch buffers
    // (one aggregate row), never data rows, and the sketch must
    // partial-aggregate map-side. (2) The SCORING plan the operator
    // returns: cut-points are literals, so it may contain no Window,
    // no Join of any kind, and no SinglePartition exchange at all —
    // just the checkpointed frame scan, the literal projection, the
    // segment groupBy and the presentation sort.
    val sketch = operators.Relational.rfmCutpointsPlanProbe(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("HashAggregate\\(keys=\\[o_custkey".r.findFirstIn(sketch).isDefined,
      s"no custkey-reducing aggregate in:\n$sketch")
    assert(sketch.contains("partial_approx_percentile"),
      s"cut-point sketch must partial-aggregate map-side:\n$sketch")
    val sketchSingle = "Exchange SinglePartition".r.findAllIn(sketch).size
    assert(sketchSingle <= 1, s"cut-point job plans $sketchSingle global exchanges:\n$sketch")
    assert(!sketch.contains("Window"), s"cut-point job plans a window sort:\n$sketch")
    val plan = planOf("q46_rfm_sketch")
    assert(!plan.contains("Window"), s"q46_rfm_sketch plans a window sort:\n$plan")
    assert(!plan.contains("Join"), s"scoring must use literals, not a join:\n$plan")
    val single = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(single == 0, s"scoring plans $single global exchanges:\n$plan")
  }

  test("q47_ohlc_bars: open/close come from the aggregate, not a per-key sort") {
    // first/last-in-bucket as min/max over a (ts, event_id, value)
    // struct keeps the bar computation ONE grouping aggregate; a
    // Window (per-key sort of the fact table) or a join means the
    // open/close regressed to the row_number shape the oracle uses
    val plan = planOf("q47_ohlc_bars")
    assert(!plan.contains("Window"), s"q47_ohlc_bars must not window-sort the facts:\n$plan")
    assert(!plan.contains("Join"), s"q47_ohlc_bars must not join:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 1, s"q47_ohlc_bars plans $hashEx hash exchanges:\n$plan")
  }

  test("q48_profile_table: unpivot-first profiling never plans an Expand") {
    // stack's map-side 4x row inflation + ONE distinct per group keeps
    // the plan a two-phase aggregate; the multi-count(distinct)
    // formulation would plan an Expand multiplying the scan by the
    // number of profiled columns (the q22 lesson)
    val plan = planOf("q48_profile_table")
    assert(!plan.contains("Expand"), s"q48_profile_table plans an Expand:\n$plan")
    assert(!plan.contains("Join"), s"q48_profile_table must not join:\n$plan")
    val scans = "FileScan parquet|Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"q48_profile_table scans the facts $scans times:\n$plan")
  }

  test("q50_interval_sweep: day-partitioned sweep, one scan, one data exchange") {
    // the classic sweep line is a GLOBAL sort — a single-partition
    // window that dies at scale. The split-at-day-boundaries shape must
    // keep the running-sum window partitioned by day, explode both
    // boundaries from ONE scan (no union of two reads), and let the
    // window's hash(day) exchange satisfy the (day, hr) aggregate — one
    // hash exchange total plus the presentation sort.
    val plan = planOf("q50_interval_sweep")
    assert("windowspecdefinition\\(day#\\d+, t#\\d+".r.findFirstIn(plan).isDefined,
      s"running sum must partition by day:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"q50_interval_sweep fell back to a global window:\n$plan")
    val scans = "FileScan parquet|Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"q50_interval_sweep scans events $scans times:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 1, s"q50_interval_sweep plans $hashEx hash exchanges:\n$plan")
  }

  test("q58_attribution: the touch lookup is a window, never a self-join") {
    // last-touch per purchase must ride the user-partitioned window
    // (one exchange the per-user semantics need anyway, plus the tiny
    // channel rollup) — a purchases×touches self-join formulation
    // would shuffle the fact table twice and explode on active users
    val plan = planOf("q58_attribution")
    assert(!plan.contains("Join"), s"q58_attribution plans a join:\n$plan")
    assert("windowspecdefinition\\(user_id#\\d+L?, ts#\\d+".r.findFirstIn(plan).isDefined,
      s"touch carry must partition by user_id:\n$plan")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"q58_attribution scans events $scans times:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 2, s"q58_attribution plans $hashEx hash exchanges:\n$plan")
  }

  test("q56_decile_lift: no window anywhere — the bounded tail is driver math") {
    // round 18: the fact table reaches ONE map-side-aggregated bucket
    // histogram (≤1024 rows by construction), the histogram is
    // collected, and the decile/lift tail is driver arithmetic — the
    // result plan is a local relation with zero window nodes and zero
    // single-partition exchanges. The histogram job itself (run at
    // construction) is pinned separately below.
    val plan = planOf("q56_decile_lift")
    assert(!plan.contains("Window"), s"q56_decile_lift plans a window:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"q56_decile_lift single-partitions:\n$plan")
    assert(!plan.contains("FileScan parquet"),
      s"the lift table must not re-scan the facts:\n$plan")
    // the distributed side: the histogram aggregate partial-aggregates
    // map-side and carries only (bkt, n, r) through its one exchange
    import org.apache.spark.sql.functions._
    val histPlan = sources.Tables.orders(spark, sfDir)
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("w_e2"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("resp"))
      .groupBy(expr("((w_e2 - 0L) * 1024) div 1024").as("bkt"))
      .agg(count(lit(1)).as("n"), sum(col("resp")).as("r"))
      .queryExecution.executedPlan.toString
    assert(histPlan.contains("partial_count"),
      s"bucket histogram must partial-aggregate map-side:\n$histPlan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(histPlan).size
    assert(hashEx <= 1, s"histogram plans $hashEx hash exchanges:\n$histPlan")
  }

  test("dd_lsh_stats: two partial-agg exchanges, never a bucket sort") {
    // the histogram is (band, bucket) grouping → per-band rollup, both
    // with map-side partials; any third data exchange or a global sort
    // below the presentation orderBy means the diagnostic got more
    // expensive than the join it prices
    val plan = planOf("dd_lsh_stats")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 2, s"dd_lsh_stats plans $hashEx hash exchanges:\n$plan")
    assert(plan.contains("partial_count"),
      s"bucket sizing must partial-aggregate map-side:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"dd_lsh_stats plans a global exchange:\n$plan")
  }

  test("ann_range_search: stateless map-side radius filter on the probe join") {
    // radius selection must be a filter fused into the probe join
    // (codegen'd, no per-query heap, no window over scored rows) —
    // the only window in the plan belongs to the nprobe centroid
    // ranking over queries×16 rows, and scored rows reach no extra
    // exchange beyond the presentation sort
    val plan = planOf("ann_range_search")
    val windows = "windowspecdefinition\\(query_id".r.findAllIn(plan).size
    assert(windows == 1, s"expected only the nprobe ranking window:\n$plan")
    assert(plan.contains(">= 0.25"), s"radius filter missing from the plan:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 2, s"ann_range_search plans $hashEx hash exchanges:\n$plan")
  }

  test("tx_span_dedup: span table materialized once, partial-agg reassembly") {
    // the span table feeds BOTH the global duplicate aggregate and the
    // mark join — the localCheckpoint barrier must hold (zero FileScan
    // in the final plan: both branches read the materialized RDD, the
    // corpus is never re-exploded), reassembly must collapse map-side
    // (partial collect_list before the doc_id exchange), and the
    // whole job needs at most the dedup-distinct pair + the doc
    // grouping hash exchanges
    val plan = planOf("tx_span_dedup")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0, s"checkpoint barrier lost — corpus re-scanned $scans times:\n$plan")
    assert(plan.contains("partial_collect_list"),
      s"reassembly must partial-aggregate map-side:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 3, s"tx_span_dedup plans $hashEx hash exchanges:\n$plan")
  }

  test("q54_ewma_smooth: one user-partitioned window, one scan, no global sort") {
    // the truncated-EWMA lags must all ride ONE window over the
    // user-clustered sort — a second window spec or a SinglePartition
    // exchange would mean the per-key series op regressed to either
    // repeated sorts or a global one
    val plan = planOf("q54_ewma_smooth")
    assert("windowspecdefinition\\(user_id#\\d+L?, ts#\\d+".r.findFirstIn(plan).isDefined,
      s"lags must partition by user_id:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"q54_ewma_smooth plans a global exchange:\n$plan")
    val scans = "FileScan parquet|Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"q54_ewma_smooth scans events $scans times:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 1, s"q54_ewma_smooth plans $hashEx hash exchanges:\n$plan")
    val windows = "Window ".r.findAllIn(plan).size
    assert(windows == 1, s"q54_ewma_smooth plans $windows window nodes:\n$plan")
  }

  test("q55_drift_chi2: one scan, one histogram exchange, map-side period flag") {
    // both periods count from ONE conditional-aggregate scan (no union
    // of two reads); after the (event_type, bkt) histogram shuffle the
    // ppm/χ² algebra runs over tiny rows — the window and final
    // aggregate may reuse the event_type clustering but never add a
    // scan
    val plan = planOf("q55_drift_chi2")
    val scans = "FileScan parquet|Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"q55_drift_chi2 scans events $scans times:\n$plan")
    assert(!plan.contains("Union"), s"q55_drift_chi2 unions two period reads:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 2, s"q55_drift_chi2 plans $hashEx hash exchanges:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial"),
      s"histogram must partial-aggregate map-side:\n$plan")
  }

  test("q51_gap_fill: every stage clusters by user, fill never re-sorts globally") {
    // densification and forward fill are per-user: the observation
    // aggregate, the span aggregate, the dense-hour Generate and the
    // last-non-null window all key on user_id; a SinglePartition
    // exchange would mean the fill regressed to a global sort
    val plan = planOf("q51_gap_fill")
    assert("windowspecdefinition\\(user_id#\\d+L?, hr#\\d+".r.findFirstIn(plan).isDefined,
      s"forward fill must partition by user_id:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"q51_gap_fill plans a global exchange:\n$plan")
    assert(plan.contains("Generate explode(sequence"),
      s"expected the declarative hour densification in:\n$plan")
  }

  test("tx_textrank: hash vocab ids leave the text family window-free") {
    // round 11: the vocab id is xxhash64(word) — the rank kernel is
    // purely topological, so ids need distinctness, not order. No
    // Window node and no SinglePartition exchange may appear anywhere
    // in the final plan (the row_number id this replaced was the text
    // family's last single-partition sort), and the top-30 must be a
    // bounded TakeOrdered, never a global sort.
    val plan = planOf("tx_textrank")
    assert(!plan.contains("Window"), s"tx_textrank plans a window:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"tx_textrank plans a single-partition exchange:\n$plan")
    // the id assignment itself runs inside the kernel's eager routing
    // jobs, so assert it at the source: the vocab frame's plan carries
    // the hash projection and no window
    import org.apache.spark.sql.functions.{col, explode, split, xxhash64}
    val vocabPlan = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .withColumn("doc_id", xxhash64(col("w")))
      .queryExecution.optimizedPlan.toString
    assert(vocabPlan.contains("xxhash64") && !vocabPlan.contains("Window"),
      s"vocab ids must be hash-assigned, window-free:\n$vocabPlan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-30 must TakeOrdered, not globally sort:\n$plan")
  }

  test("tx_pipeline: one scan, two partitioned windows, no join, no global sort") {
    // the curation manifest composes quality → dedup → pack in one
    // DAG: scoring is map-side, the only exchanges are the text_hash
    // window, the source window and the presentation sort — a join or
    // a SinglePartition exchange means a stage stopped composing
    val plan = planOf("tx_pipeline")
    assert(!plan.contains("Join"), s"tx_pipeline plans a join:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"tx_pipeline plans a global exchange:\n$plan")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"tx_pipeline scans documents $scans times:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 2, s"tx_pipeline plans $hashEx hash exchanges:\n$plan")
  }

  test("tx_char_diversity: diversity scoring is one map-only projection") {
    // the per-doc char histogram must NEVER materialize as rows — the
    // sort+run-length fold keeps everything inside a single projection
    // over the scan: zero hash exchanges, zero Generates, zero joins
    val plan = planOf("tx_char_diversity")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"tx_char_diversity shuffles:\n$plan")
    assert(!plan.contains("Generate"), s"tx_char_diversity explodes rows:\n$plan")
    assert(!plan.contains("Join"), s"tx_char_diversity joins:\n$plan")
    val scans = "FileScan parquet|Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"tx_char_diversity scans documents $scans times:\n$plan")
  }

  test("tx_collocations: vocabulary joins broadcast and reuse one exchange") {
    // the unigram table joins BOTH bigram sides as broadcasts (vocab ≪
    // corpus), the second side reusing the first's exchange; the final
    // ranking is a TakeOrdered, never a global sort of the pair table
    // the exchange-reuse rule runs at execution, so pin the FINAL
    // adaptive plan (the initial one still prints both unigram aggs)
    val df = SparkEntry.queries("tx_collocations")(spark, sfDir)
    df.queryExecution.toRdd.count()
    // toString prints "== Final Plan ==" then "== Initial Plan ==";
    // count joins in the final section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("SortMergeJoin"),
      s"tx_collocations sort-merges the corpus:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must TakeOrdered, not globally sort:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 2,
      s"both unigram joins must broadcast:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"the second unigram join must reuse the first's exchange:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 3, s"tx_collocations plans $hashEx hash exchanges:\n$plan")
  }

  test("q52_skyline: no global window on either refine route") {
    // round 18: the exact refine SIZE-ROUTES (the CC-router
    // precedent) — survivors within budget refine on the driver (the
    // registered op's plan at test SFs: a local relation, no window,
    // no exchange), larger sets run the distributed two-pass prefix
    // scan (partitionBy(__pid) window + broadcast prefix maxima —
    // asserted below by forcing driverMax = 0). Neither route may
    // single-partition.
    val plan = planOf("q52_skyline")
    assert(!plan.contains("Window"), s"driver route plans a window:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"q52_skyline still single-partitions:\n$plan")
    assert(!plan.contains("FileScan parquet"),
      s"skyline re-scans the fact table past the checkpointed aggregate:\n$plan")
    import org.apache.spark.sql.functions._
    val agg = sources.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey").as("id"))
      .agg(expr("CAST(min(floor(l_extendedprice * 100 + 0.5)) AS BIGINT)").as("cost_c"),
        expr("CAST(floor(sum(l_quantity) + 0.5) AS BIGINT)").as("qty_l"))
      .localCheckpoint()
    // the prefilter leg: broadcast literal join on prev_bqty, no window
    val svPlan = operators.Relational.skylineSurvivors(agg)
      .get.queryExecution.executedPlan.toString
    assert(svPlan.contains("prev_bqty") && svPlan.contains("BroadcastHashJoin"),
      s"bucket-cummax prefilter missing from:\n$svPlan")
    assert(!svPlan.contains("Window"), s"prefilter leg plans a window:\n$svPlan")
    // the distributed refine route (driverMax = 0): a __pid-partitioned
    // window over the survivor checkpoint + broadcast prefix maxima,
    // still never a single-partition exchange
    val distPlan = operators.Relational.skyline(agg, driverMax = 0L)
      .queryExecution.executedPlan.toString
    assert(distPlan.contains("prefix_max") && distPlan.contains("__pid"),
      s"two-pass prefix refine missing from:\n$distPlan")
    assert("Window \\[max\\(qty_l".r.findFirstIn(distPlan).isDefined &&
      "windowspecdefinition\\(__pid".r.findFirstIn(distPlan).isDefined,
      s"refine window must partition by __pid:\n$distPlan")
    assert(!distPlan.contains("Exchange SinglePartition"),
      s"distributed refine single-partitions:\n$distPlan")
    assert(!plan.contains("CartesianProduct"), s"unbounded product in:\n$plan")
  }

  test("ann_rrf_fusion: both legs end in bounded top-k before the fusion join") {
    // the fusion join runs over two 10-rows-per-query legs; the
    // semantic leg must select through the bounded-heap TopK operator
    // (k rows per partition reach the shuffle) and the lexical leg
    // through tx_bm25's own TopK — never a full-corpus window sort
    val plan = planOf("ann_rrf_fusion")
    assert("TopK(Partial|Final)".r.findAllIn(plan).nonEmpty,
      s"expected the bounded-heap TopK operator in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unbounded product in:\n$plan")
  }

  test("q53_priority_sample: selection is bounded-heap, never a fact-table sort") {
    // the per-stratum weighted pick must run through the TopK operator
    // (k candidates per partition reach the shuffle); the only Window
    // is the rank label over k×strata survivor rows — a Window whose
    // input is the fact scan would mean the sample regressed to a
    // per-stratum full sort
    val plan = planOf("q53_priority_sample")
    assert("TopK(Partial|Final)".r.findFirstIn(plan).isDefined,
      s"expected the bounded-heap TopK operator in:\n$plan")
    val idxWin = plan.indexOf("Window")
    val idxTopK = "TopK(Partial|Final)".r.findFirstMatchIn(plan).get.start
    assert(idxWin >= 0 && idxWin < idxTopK,
      s"the rank window must sit above the TopK selection:\n$plan")
  }

  test("ann_filtered_topk: the label predicate rides the probe join itself") {
    // filter-then-search: the metadata equality must be part of the
    // list-probe join's condition (enforced at list-scan time), never
    // a filter applied after cosines are computed — the
    // search-then-filter shape that under-fills k and wastes scoring
    val plan = planOf("ann_filtered_topk")
    val bhj = plan.linesIterator.find(_.contains("BroadcastHashJoin"))
    assert(bhj.exists(l => l.contains("label") && l.contains("q_label")),
      s"label equality is not in the probe join's condition:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("ann_incremental: the store side never pays a nested-loop join") {
    // centroid assignment is a map-only literal fold; the only
    // nested-loop join allowed is the tiny broadcast centroid cross
    // (16 rows). The store-probe join must be an equi join on cent_id —
    // a nested-loop there would score every (stored, probe) pair and
    // the probe would stop being an index probe.
    val plan = planOf("ann_incremental")
    assert(!plan.contains("CartesianProduct"), plan)
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nlj <= 1, s"ann_incremental plans $nlj nested-loop joins (only the 16-row centroid cross may):\n$plan")
    assert(plan.contains("HashJoin"),
      s"the store-probe join must hash on cent_id:\n$plan")
  }

  test("ann_incremental_adaptive: three-level quantizer joins stay broadcast-or-hash") {
    // k tracks the corpus, so nothing may be linear in k except the
    // fine table itself: the only nested-loop joins allowed are the
    // ⌈k^(1/3)⌉-row broadcast coarse crosses. Each toMid invocation
    // plans one coarse cross of its own plus the mid subtree's cross
    // (mid = toCoarse over kc² rows, replicated per consumer — a
    // kc²-row, kc³-cosine subtree, cheap to recompute), and the plan
    // holds four toMid consumers (stored, probes, and the fine
    // subtree under each of them) — 8 crosses total, every one a
    // bounded ≤k^(1/3)-row broadcast. The mid/fine/store-probe joins
    // must hash (equi on coarse_id / mid_id / cent_id). A
    // CartesianProduct anywhere means the probe degenerated to
    // all-pairs.
    val plan = planOf("ann_incremental_adaptive")
    assert(!plan.contains("CartesianProduct"), plan)
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nlj <= 8,
      s"ann_incremental_adaptive plans $nlj nested-loop joins (only the 8 coarse crosses may):\n$plan")
    assert(plan.contains("HashJoin"),
      s"the fine-cell and store-probe joins must hash:\n$plan")
    // the corpus-size lever itself: occupancy-flat growth, floor 16,
    // prefix-nesting is inherited from fixedCentroids
    assert(operators.Similarity.annK(500) == 16 &&
      operators.Similarity.annK(2000) == 32 &&
      operators.Similarity.annK(50000) == 782 &&
      operators.Similarity.annK(1L << 30) == (1 << 30) / 64)
  }

  test("tx_bm25: every scoring join broadcasts, nothing sort-merges the corpus") {
    // df and the term relation are tiny, avgdl is one row: if any of
    // them sort-merge joins, the corpus token stream shuffles on a
    // Zipf-skewed key — the tx_lm_score lesson.
    val plan = planOf("tx_bm25")
    assert(!plan.contains("SortMergeJoin"),
      s"tx_bm25 should broadcast its model-side joins:\n$plan")
  }

  test("q44_zorder_layout: one stats broadcast + one aggregation exchange") {
    // the min/max stats ride in as a broadcast 1-row aggregate, the
    // z-bucket groupBy is the only hash exchange; a second means the
    // stats stopped broadcasting and the corpus shuffled for them
    val plan = planOf("q44_zorder_layout")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).toList
    assert(hashEx.size <= 1,
      s"q44_zorder_layout plans ${hashEx.size} hash exchanges:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the stats row must broadcast:\n$plan")
  }

  test("tx_mix_temperature: rates broadcast back, one corpus-width exchange") {
    // the lang-count and total aggregates are lang-cardinality tiny and
    // must come back as broadcasts; the corpus itself reaches exactly
    // one hash exchange (the summary groupBy, partial map-side) — a
    // second one means the rate join stopped broadcasting and
    // reshuffled the corpus
    val plan = planOf("tx_mix_temperature")
    assert(plan.contains("BroadcastHashJoin"),
      s"the rate table must broadcast:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 2, s"tx_mix_temperature plans $hashEx hash exchanges:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"summary must partial-aggregate map-side:\n$plan")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans <= 2, s"tx_mix_temperature scans the corpus $scans times:\n$plan")
  }

  test("dd_simhash: eq leg is join-free generators, cross leg equi-joins the packed band key") {
    // the round-14 two-leg shape: identical-signature pairs expand
    // through chained generators (posexplode + explode(slice) — never
    // a self-join), and the cross-value candidate join is an EQUI
    // join on the packed band_key long with the native
    // first-matching-chunk kernel as its residual (an HOF there was
    // the measured r13 disaster class). The plan starts at the
    // localCheckpoint'd groups, so these pins see exactly the pair
    // emission stages.
    val pairs = operators.Dedup.ddSimhash(spark, sfDir)
    pairs.queryExecution.toRdd.count()
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("posexplode"),
      s"eq leg must expand map-side through generators:\n$plan")
    assert(plan.contains("band_key"),
      s"cross leg must join on the packed band key:\n$plan")
    assert(plan.contains("graft_first_matching_chunk"),
      s"first-band-wins emission must be the native kernel:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop join anywhere in pair emission:\n$plan")
    assert(!plan.toLowerCase.contains("lambdafunction") ||
      "lambdafunction".r.findAllIn(plan.toLowerCase).size <=
        "array_sort".r.findAllIn(plan.toLowerCase).size * 2,
      s"no interpreted HOF beyond array_sort's comparator in the hot path:\n$plan")
  }

  test("etl_fuzzy_product_match: the dictionary broadcasts, distance is map-side") {
    // candidates = lines ⋈ dict on the length key — the dict is
    // product-cardinality tiny and must broadcast. The optimizer folds
    // the hamming filter into that join's residual condition; that HOF
    // runs once per (file × same-length dict entry) row — dict-bounded
    // (≤3 candidates/file), NOT the collision-stream shape the
    // HOF-in-join-condition lesson bans. The file-keyed fan-back join
    // (lines ⟕ best) is file-cardinality both sides and may shuffle.
    // The decode frame is a localCheckpoint inside the operator, so
    // the public plan shows the real joins (only the decode subtree
    // is an ExistingRDD scan).
    val plan = planOf("etl_fuzzy_product_match")
    assert("BroadcastHashJoin \\[len#\\d+\\], \\[len#\\d+\\]".r.findFirstIn(plan).isDefined,
      s"the dict join must broadcast on the length key:\n$plan")
  }

  test("narrow projections prune the scan schema") {
    val plan = planOf("q02_filter_project")
    // q02 reads 3 output columns + 3 filter columns; the full lineitem
    // table has 16 — a pruned ReadSchema must not mention l_comment.
    assert(!plan.contains("l_comment"), s"q02 reads unprojected columns:\n$plan")
  }
}
