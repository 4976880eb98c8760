package graft

/** Shuffle-budget regression guard: every headline query's executed plan
  * carries AT MOST the exchange count its design calls for. An extra
  * Exchange that slips in (a lost broadcast hint, a projection that blocks
  * ReuseExchange, a window acquiring its own repartition) multiplies
  * shuffled bytes at 100 TB long before it shows up in a local bench —
  * the plan property is the early warning.
  *
  * The unit is "ShuffleExchange matches in the executed-plan string",
  * which under AQE includes both the initial and final plan renderings —
  * roughly 2× the logical shuffle count, but DETERMINISTIC at spec scale
  * (fixed sizes → fixed AQE decisions). Budgets are the exact round-8
  * measurements used as upper bounds: AQE replacing a shuffle join with a
  * broadcast only lowers the count, so an increase means a plan gained a
  * shuffle. Raising a budget is a deliberate design decision that belongs
  * in the diff alongside the plan change that caused it.
  */
class ExchangeBudgetSpec extends SparkSpec {

  private def exchanges(name: String): Int = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // ShuffleExchange only: broadcasts move dims, not data volume
    "(?<!Broadcast|Reused)Exchange".r.findAllIn(p).length
  }

  /** Round-8 measured counts (record mode below regenerates them). */
  private val budget: Map[String, Int] = Map(
    "q01_latest_wins" -> 2, "q02_snapshot_merge" -> 4, "q03_rowfilter" -> 0,
    "q04_backfill_range" -> 0, "q05_pk_dedup" -> 2, "q06_json_extract" -> 0,
    "q07_tracking" -> 2, "q08_profiles_view" -> 2, "q09_graph_degree" -> 4,
    "q10_edge_merge" -> 2, "q11_salted_agg" -> 4, "q17_priority_counts" -> 2,
    "q19_registry_sync" -> 20, "q20_json_struct" -> 2, "q23_tumbling_daily" -> 2,
    "q31_profile" -> 4, "q33_node_merge" -> 2, "q39_typed_sync" -> 2,
    "q12_pricing_summary" -> 2, "q13_region_revenue" -> 2, "q14_top_customers" -> 2,
    "q15_event_sessions" -> 2, "q16_brand_volume" -> 2, "q18_nation_rollup" -> 2,
    "q21_asof_join" -> 2, "q22_range_join" -> 2, "q24_scd2_intervals" -> 2,
    "q25_mutual_edges" -> 4, "q26_price_percentiles" -> 10, "q27_age_metrics" -> 4,
    "q28_asof_native" -> 4, "q29_salted_join" -> 2, "q30_incremental_agg" -> 8,
    "q32_ship_priority" -> 2, "q34_nation_trade" -> 1, "q35_returned_items" -> 4,
    "q36_cheapest_supplier" -> 2, "q37_follow_suggest" -> 4, "q38_cu_accounting" -> 8,
    "q57_sync_checksum" -> 4, "q40_market_share" -> 6, "q41_product_profit" -> 2,
    "q42_cust_order_dist" -> 4, "q43_idle_customers" -> 6, "q44_rolling_metrics" -> 2,
    "q45_funnel" -> 4, "q46_retention_cohorts" -> 6, "q47_gap_fill" -> 4,
    "q48_revenue_forecast" -> 2, "q49_promo_share" -> 2, "q50_rolling_active" -> 10,
    "q51_triangles" -> 6, "q52_pagerank" -> 0, "q53_small_order_revenue" -> 4,
    "q54_large_orders" -> 2, "q55_disjunctive_revenue" -> 2, "q56_top_supplier" -> 2,
    "q58_event_pivot" -> 4, "q59_cube_volume" -> 2, "q60_sole_shipper" -> 4,
    "q61_part_variety" -> 6, "q62_shipmode_priority" -> 2, "q63_kmv_distinct" -> 2,
    "q64_kmv_mergeable" -> 6, "q65_sketch_quantiles" -> 2, "q66_bfs_depths" -> 0,
    "q67_excess_shippers" -> 4, "q68_nation_value" -> 6, "q69_kmv_intersection" -> 6,
    "q70_decile_bins" -> 10, "q71_sketch_bins" -> 2,
    "d01_dedup_exact" -> 2, "d02_dedup_minhash" -> 4, "d03_dedup_simhash" -> 4,
    "d04_ngram_jaccard" -> 4, "d06_dedup_clusters" -> 0, "d07_embed_neardup_lsh" -> 4,
    "d08_dedup_incremental" -> 6, "d09_embed_delta" -> 6, "d10_passage_dedup" -> 6,
    "d11_semantic_dedup" -> 8, "d12_dedup_pipeline" -> 4, "d13_semantic_dedup_trained" -> 8,
    "s01_ann_brute" -> 2, "s02_ann_lsh" -> 2, "s03_ann_ivf" -> 2, "s05_range_search" -> 0,
    "s06_quantize" -> 4, "s07_mmr_diversify" -> 32, "s08_pq_encode" -> 0,
    "s09_adc_search" -> 2, "s10_ivfpq" -> 2, "s11_kmeans_train" -> 2,
    "s12_ann_ivf_trained" -> 2,
    "m01_multimodal" -> 2, "m02_frame_sample" -> 2, "m03_resize_plan" -> 0,
    "m06_frame_phash" -> 0, "m07_frame_neardup" -> 6,
    "t01_langid" -> 0, "t02_quality" -> 0, "t03_tokens" -> 0, "t04_fingerprint" -> 0,
    "t05_normalize" -> 0, "t06_stratified_sample" -> 2, "t07_cap_per_source" -> 2,
    "t08_contamination" -> 6, "t09_repetition" -> 4, "t10_pii_redact" -> 0,
    "t11_curation" -> 2, "t12_sequence_pack" -> 10, "t13_url_domains" -> 4,
    "t14_mixture_sample" -> 16, "t15_chunk_plan" -> 0, "t16_vocab_top" -> 2,
    "t17_bloom_contamination" -> 6, "t18_gopher_rules" -> 0)

  test("headline plans stay within their shuffle budgets") {
    val missing = Bench.headline.filterNot(budget.contains)
    assert(missing.isEmpty, s"new headliners need a recorded budget: $missing")
    // ±1 tolerance: AQE's replan occasionally renders one more or fewer
    // exchange for the same logical plan across sessions (observed on
    // q40); a REAL added shuffle shows as +2 because the plan string
    // holds both the initial and final renderings
    val over = Bench.headline.flatMap { n =>
      val got = exchanges(n)
      if (got > budget(n) + 1) Some(s"$n: $got > ${budget(n)} + 1") else None
    }
    assert(over.isEmpty,
      "plans gained shuffles (raise the budget ONLY with the design change that justifies it):\n" +
        over.mkString("\n"))
  }

  test("record mode: print exchange counts") {
    assume(sys.env.contains("GRAFT_PLAN_BUDGET_RECORD"))
    Bench.headline.foreach { n =>
      try println(f"BUDGET $n ${exchanges(n)}")
      catch { case e: Throwable => println(s"BUDGET $n ERR $e") }
    }
  }
}
