package graft

import graft.queries.Relational

/** Physical-plan audits: the 100 TB posture is only real if the plans
  * keep it — filters reach the parquet scan, dimensions broadcast, global
  * sort+limit never materializes a full sort, and the hot path stays in
  * whole-stage codegen. A regression here is a scale bug even when the
  * sf0.01 answers stay right. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("q02: predicates and projection push down to the parquet scan") {
    val p = plan("q02_filter_project")
    // the toString truncates the PushedFilters list; match its head
    assert(p.contains("PushedFilters: [IsNotNull"), "no filter pushdown in scan")
    assert(p.contains("GreaterThanOrEqual(l_shipda"),
      s"expected shipdate range filter pushed, got:\n$p")
    assert(!p.contains("l_tax"), "scan must prune unused columns (l_tax unused)")
  }

  test("round-7 queries prune their scans to the columns they use") {
    // winnow reads (doc_id, text) only; ER reads three customer columns;
    // a scan dragging unused columns through a fingerprint explode or a
    // blocked self-join is pure wasted IO at 100 TB
    val pw = plan("doc_winnow_fps")
    assert(!pw.contains("n_chars") && !pw.contains("lang"),
      s"winnow scan must prune documents to (doc_id, text):\n$pw")
    val pe = plan("cust_entity_resolution")
    assert(!pe.contains("c_mktsegment") && !pe.contains("c_nationkey"),
      s"ER scan must prune customer to (key, name, acctbal):\n$pe")
    val ph = plan("ev_equidepth_hist")
    assert(!ph.contains("props") && !ph.contains("user_id"),
      s"histogram must scan only (event_type?, value) columns:\n$ph")
    val pt = plan("doc_ttr_diversity")
    assert(!pt.contains("n_chars") && !pt.contains("lang#") && !pt.contains("doc_id#"),
      s"term-frequency scan must prune documents to (source, text):\n$pt")
    val pz = plan("doc_zipf_slope")
    assert(!pz.contains("n_chars") && !pz.contains("lang#") && !pz.contains("doc_id#"),
      s"zipf scan must prune documents to (source, text):\n$pz")
  }

  test("q05: star-join dimensions broadcast, fact join shuffles") {
    val p = plan("q05_local_supplier")
    assert(p.contains("BroadcastHashJoin"), "dimension joins must broadcast")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), "fact join missing")
  }

  test("q19: sort+limit plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q19_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$p")
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial"),
      s"expected partial aggregation before the shuffle:\n$p")
  }

  test("q52: statistical aggregates are partial+final like any sum") {
    // corr/covar/regr_* are algebraic — losing map-side combine would
    // shuffle every event row to the |types| reducers at corpus scale
    val p = plan("q52_value_regression")
    assert(p.toLowerCase.contains("partial"),
      s"expected partial aggregation of the moment sums:\n$p")
  }

  test("doc_incremental_dedup: best-match rank prunes through WindowGroupLimit") {
    // the per-incoming-doc rank-1 filter must push below the shuffle —
    // a full rank over every verified pair is wasted sort work at scale
    val df = SparkEntry.queries("doc_incremental_dedup")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"rank pushdown lost:\n$p")
    // and the gram-scale band join must never broadcast a corpus side
    // (both sides are corpus-sized; only dimension-sized frames may
    // broadcast in this plan)
    assert(!p.contains("BroadcastNestedLoopJoin"), s"degenerate join:\n$p")
  }

  test("hot paths run inside whole-stage codegen") {
    Seq("q01_pricing_summary", "q02_filter_project", "doc_quality_score")
      .foreach { q =>
        val df = SparkEntry.queries(q)(spark, sf0001)
        df.collect() // finalize the adaptive plan
        val p = df.queryExecution.executedPlan.toString
        // codegen'd stages print as "*(n) Operator" in the final plan
        assert(p.contains("WholeStageCodegen") || p.contains("*("),
          s"$q fell out of codegen:\n$p")
      }
  }

  test("ANN bucket/centroid assignment survives codegen with fallback disabled") {
    // The r3 failure mode: per-plane expression folds blew the JVM 64 KB
    // method cap, Janino failed, and the stage silently ran interpreted.
    // With fallback off a compile failure THROWS instead — so completing
    // these queries proves the fused-matrix hot loops actually compile.
    val prevFb = spark.conf.get("spark.sql.codegen.fallback", "true")
    val prevFm = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      // doc_contamination: its bloom pre-filter was the repo's last UDF
      // (always interpreted); BloomContains must compile in the stage
      Seq("vec_lsh_topk", "vec_ivf_topk", "vec_lsh_near_dups",
          "vec_kmeans", "doc_contamination").foreach { q =>
        assert(SparkEntry.queries(q)(spark, sf0001).collect() != null, q)
      }
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFb)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }

  test("q33: explicit pivot values keep the plan single-pass (no distinct-collect job)") {
    // pivot WITHOUT a value list first runs a separate job collecting
    // distinct pivot values to the driver — two scans of the fact table.
    // With the explicit list the plan is one scan + one aggregate, and
    // pivot cells evaluate inside the aggregate (no extra exchange).
    val df = SparkEntry.queries("q33_pivot")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(p).length
    assert(scans == 1, s"pivot must scan lineitem exactly once, found $scans:\n$p")
  }

  test("q34: unpivot is a shuffle-free Expand; only the presentation sort exchanges") {
    val df = SparkEntry.queries("q34_unpivot")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Expand"), s"unpivot should plan as Expand:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1,
      s"unpivot itself must not shuffle (only the final orderBy may), found $exchanges:\n$p")
  }

  test("top-k windows plan as WindowGroupLimit (rank pushdown, no full rank)") {
    // Spark 3.5+ pushes row_number()<=k below the shuffle as a partial
    // WindowGroupLimit — per-group top-k without materializing the full
    // ranking. Losing this silently turns q09/doc_bigram_lm/the ANN
    // rerank stages into full sorts per group at corpus scale.
    Seq("doc_bigram_lm", "q09_topk_per_group", "vec_quantized_topk",
        "doc_rrf_fusion", "doc_rrf_fusion_indexed").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf0001)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("WindowGroupLimit"), s"$q lost rank pushdown:\n$p")
      assert(p.contains("Partial"), s"$q WindowGroupLimit not map-side:\n$p")
    }
  }

  test("doc_repetition_score: token-count filter reaches the scan; 2-col read") {
    val df = SparkEntry.queries("doc_repetition_score")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("DataFilters: [(size(split("),
      s"length guard must evaluate scan-side:\n$p")
    assert(!p.contains("lang#"), s"scan must prune unused columns:\n$p")
  }

  test("quantized top-k probes broadcast; corpus never shuffles pre-rank") {
    val df = SparkEntry.queries("vec_quantized_topk")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"probe side must broadcast:\n$p")
  }

  test("runtime bloom-filter join pruning engages on a selective join") {
    // At 100 TB the cheapest row is the one the probe side never reads:
    // Spark's runtime row-level filtering injects a bloom filter built
    // from the (filtered) creation side into the probe side's scan.
    // Local fixtures are below the default size thresholds, so the
    // thresholds are lowered to prove the rewrite itself engages —
    // production keeps the defaults.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      val ord = spark.read.parquet(s"$sf001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("BloomFilter"),
        s"runtime bloom filter not injected:\n$p")
      assert(j.collect().nonEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q40: stacked sessionize windows share one exchange+sort (no double shuffle)") {
    // the lag window and the running-count window use the same
    // (partition, order); Catalyst must collapse them into one Window
    // chain behind a single hashpartitioning(user_id) exchange — a
    // second exchange would double the query's shuffle for nothing
    val df = SparkEntry.queries("q40_sessionize")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    val parts = "hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(parts === 1, s"expected one user_id exchange, got $parts:\n$p")
    assert(!p.contains("SinglePartition"), s"sessionize must stay distributed:\n$p")
  }

  test("q41: stratified sample plans as WindowGroupLimit (top-n pruned per source)") {
    val df = SparkEntry.queries("q41_stratified_sample")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"sample rank must prune below k:\n$p")
  }

  test("doc_pack_shards: running-offset packing never plans a single-partition exchange") {
    val df = SparkEntry.queries("doc_pack_shards")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      s"packing must stay distributed across (split, bucket):\n$p")
  }

  test("doc_vocab_build: dense-id assignment never plans a single-partition exchange") {
    // The r5 verdict's one scale-killer: a global row_number window pulls
    // the whole vocabulary through one task. DenseIds replaces it; this
    // gate keeps it replaced. (The final presentation orderBy is a range
    // exchange, which is fine — only SinglePartition is banned.)
    val df = SparkEntry.queries("doc_vocab_build")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      s"vocab dense-id must stay distributed:\n$p")
  }

  test("doc_editdist_pairs: blocked equi-join, never a cartesian product") {
    val p = plan("doc_editdist_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"edit-distance candidates must join on (lang, bucket), not cross:\n$p")
  }

  test("q42/q43: dimensions broadcast, only fact joins shuffle") {
    val p42 = plan("q42_market_share")
    assert(p42.contains("BroadcastHashJoin"), "q42 dims must broadcast")
    val p43 = plan("q43_product_profit")
    assert(p43.contains("BroadcastHashJoin"), "q43 dims must broadcast")
    // part/supplier/nation all broadcast: at most ONE shuffled join
    // (lineitem ⋈ orders) may remain in q43
    val shuffledJoins = "SortMergeJoin|ShuffledHashJoin".r
      .findAllIn(p43).length
    assert(shuffledJoins <= 1,
      s"q43 should shuffle only the fact-fact join, found $shuffledJoins:\n$p43")
  }

  test("doc_tfidf_terms: per-doc top-3 prunes through WindowGroupLimit") {
    val p = plan("doc_tfidf_terms")
    assert(p.contains("WindowGroupLimit"),
      s"rank filter must push into WindowGroupLimit:\n$p")
  }

  test("doc_bm25_topk: per-query top-k prunes through WindowGroupLimit; postings never cartesian") {
    val p = plan("doc_bm25_topk")
    assert(p.contains("WindowGroupLimit"),
      s"rank filter must push into WindowGroupLimit:\n$p")
    // the one-row (n, avgdl) stats frame rides a broadcast cross join
    // (the doc_tfidf_terms pattern) — bounded by construction; what must
    // never appear is a non-broadcast cartesian over the postings
    assert(!p.contains("CartesianProduct"),
      s"query-term joins must stay equi/broadcast:\n$p")
  }

  test("vec_knn_join: cell-blocked join, probes never cross-join the corpus") {
    val p = plan("vec_knn_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"kNN join must block on the IVF cell id:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"top-k filter must push into WindowGroupLimit:\n$p")
  }

  test("q49: cumulative window consumes the per-day aggregate, not the raw event stream") {
    // the r6 skew finding: a running sum partitioned by low-cardinality
    // event_type over RAW events funnels each type's entire history
    // through one window task at scale. Restructured, the plan must read
    // (top-down) running-sum Window -> HashAggregate(type, day) ->
    // row_number Window -> scan: the only window over raw events is the
    // high-cardinality (type, user) first-occurrence ranking.
    val df = SparkEntry.queries("q49_running_distinct")(spark, sf0001)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    val runningAt = p.indexOf("distinct_users_to_date")
    val aggAt = p.indexOf("HashAggregate")
    val firstSeenAt = p.indexOf("row_number")
    assert(runningAt >= 0 && aggAt >= 0 && firstSeenAt >= 0, s"plan shape changed:\n$p")
    assert(runningAt < aggAt,
      s"the cumulative window must sit ABOVE the per-(type, day) aggregate:\n$p")
    assert(aggAt < firstSeenAt,
      s"the per-day aggregate must sit above the first-occurrence ranking:\n$p")
  }

  test("NO query plans a CartesianProduct; SinglePartition only for bounded one-row aggregates") {
    // The blanket form of the per-query gates above: sweep every plan in
    // the contract. SinglePartition is allowed ONLY where the exchanged
    // data is bounded by construction — a global no-group aggregate's
    // partial rows (one per partition) or a generated constant grid —
    // verified by eye per entry below; anything new failing here is
    // either a scale bug or needs the same review.
    val singlePartitionOk = Set(
      "doc_tfidf_terms",      // global N: one count row per partition
      "doc_bm25_topk",        // global N/avgdl: one partial row per partition
      "doc_bm25_index_topk",  // same stats aggregate, over the dl table
      "doc_rrf_fusion",       // same BM25 N/avgdl partial-row aggregate
      "doc_dsir_weights",     // global corpus totals: one partial row per partition
      "ev_equidepth_hist",    // single-row decile-boundary aggregate
      "q54_top_supplier",     // single-row max-revenue aggregate
      "dq_checks",            // 7 single-row check aggregates unioned
      "q06_revenue_forecast", // single-row global aggregate
      "q37_gap_fill",         // bounded hour-grid generator
      "q46_profile",          // single-row stats aggregate
      "q47_hourly_zscore",    // single-row mean/std aggregate
      "scan_binaryfile",      // one-file summary row
      "scan_text_roundtrip")  // one-line summary row
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = fn(spark, sf0001).queryExecution.executedPlan.toString
      val bad = Seq(
        Option.when(p.contains("CartesianProduct"))(s"$name: CartesianProduct"),
        Option.when(p.contains("Exchange SinglePartition")
          && !singlePartitionOk(name))(s"$name: unreviewed SinglePartition"))
      bad.flatten
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("LSH band-cap masking joins broadcast — no shuffle added to the hot path") {
    import spark.implicits._
    val withBh = (1L to 50L).map(i => (i, Seq(i, i * 7, i * 13)))
      .toDF("id", "_bh")
    val df = graft.operators.Dedup.candidatePairsFirstBand(withBh, "id", 10)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    // the capped-docs mask table must come in via broadcast (it is empty
    // on healthy input); a SortMergeJoin here would mean the masking
    // added a per-call shuffle of the banded rows
    assert(p.contains("BroadcastHashJoin"),
      s"capped-docs masking join must broadcast:\n$p")
    val bandedToMask = p.linesIterator.count(_.contains("SortMergeJoin"))
    assert(bandedToMask <= 1,
      s"only the band-bucket candidate join may sort-merge, saw $bandedToMask:\n$p")
  }
}
