package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has either a DuckDB-equivalent SQL string in
  * `oracleSql` (hash-compared by the driver at sf0.01) or is a
  * non-SQL-expressible operator checked rows-only + unit tests.
  *
  * Determinism contract for oracle-checked queries:
  *  - output fully sorted with a unique tie-break;
  *  - double aggregates computed via decimal(18,6) per-value casts
  *    (order-independent exact sum) then one cast back to double;
  *  - counts cast to BIGINT on both engines, no current_date().
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.snapshot(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1-§2.4 scans / filters / joins / pipeline shapes
    "p_snapshot" -> (Relational.snapshot _),
    "s1_scan_project" -> (Relational.scanProject _),
    "f1_digit_filter" -> (Relational.digitIdFilter _),
    "s3_full_dump" -> (Relational.fullDump _),
    "j2_left_enrich" -> (Relational.leftEnrich _),
    "j3_join_revenue" -> (Relational.join3Revenue _),
    "j_anti" -> (Relational.antiJoin _),
    "j4_promo_revenue" -> (Relational.promoRevenue _),
    "j5_local_supplier" -> (Relational.q5LocalSupplier _),
    // classic OLAP join shapes (TPC-H Q3/Q7/Q8/Q10/Q13/Q19)
    "j03_shipping_priority" -> (Relational.q3ShippingPriority _),
    "j04_priority_check" -> (Relational.q4PriorityCheck _),
    "j06_forecast_revenue" -> (Relational.q6ForecastRevenue _),
    "j7_volume_shipping" -> (Relational.q7VolumeShipping _),
    "j8_market_share" -> (Relational.q8MarketShare _),
    "j09_product_profit" -> (Relational.q9ProductProfit _),
    "j10_returned_items" -> (Relational.q10ReturnedItems _),
    "j12_shipmode_priority" -> (Relational.q12ShipmodePriority _),
    "j13_order_histogram" -> (Relational.q13OrderHistogram _),
    "j19_disjunctive_revenue" -> (Relational.q19DisjunctiveRevenue _),
    "mv_summary_rewrite" -> (MaterializedView.rollupRewrite _),
    // partition-level incremental MV maintenance: month-partitioned
    // summary, late-arriving delta merged into ONLY its months
    // (partition-pruned base read + dynamic partition overwrite);
    // oracle recomputes the rollup from the raw fact
    "mv_incremental_refresh" -> (MaterializedView.incrementalRollup _),
    // delta-rule maintenance of a JOIN view (retract ∪ re-derive ∪
    // insert, with a dimension UPDATE delta); oracle recomputes
    // O_new ⋈ C_new from the raw tables
    "mv_join_delta" -> (MaterializedView.joinDeltaRollup _),
    // decorrelated-subquery family (TPC-H Q15/Q17/Q18/Q21/Q22 shapes)
    "j02_min_cost_supplier" -> (Subqueries.q2MinCostSupplier _),
    "j11_important_parts" -> (Subqueries.q11ImportantParts _),
    "j16_supplier_count" -> (Subqueries.q16SupplierCount _),
    "j20_dominant_supplier" -> (Subqueries.q20DominantSupplier _),
    "j15_top_supplier" -> (Subqueries.q15TopSupplier _),
    "j17_small_qty_revenue" -> (Subqueries.q17SmallQtyRevenue _),
    "j18_large_orders" -> (Subqueries.q18LargeOrders _),
    "j21_sole_failing_supplier" -> (Subqueries.q21SoleFailingSupplier _),
    "j22_idle_customers" -> (Subqueries.q22IdleCustomers _),
    "s2_jdbc_source" -> (Relational.jdbcSnapshot _),
    "s2_jdbc_agg_pushdown" -> (sources.JdbcSource.nationRollupPushdown _),
    // §2.5 aggregations
    "a1_pricing_summary" -> (Aggregates.pricingSummary _),
    "a1_explode_sum" -> (Aggregates.explodeSum _),
    "a2_pivot_daily" -> (Aggregates.pivotDaily _),
    "a3_count_if" -> (Aggregates.countIf _),
    "a4_argmax" -> (Aggregates.argmaxLatest _),
    "a5_count_gate" -> (Aggregates.countGate _),
    "a6_daily_counts" -> (Aggregates.dailyCounts _),
    "a7_exists_flag" -> (Aggregates.existsFlag _),
    "a8_round_avg" -> (Aggregates.roundAvg _),
    // KMV distinct sketch set algebra: exact sub-k regime at test sf
    "agg_kmv_overlap" -> (Aggregates.kmvOverlap _),
    // pairwise co-occurrence; the self-joined distinct's exchange is
    // computed once and reused (ReusedExchange pinned in spec)
    "agg_cooccurrence" -> (Aggregates.typeCooccurrence _),
    "agg_median_scale" -> (Aggregates.exactMedianScale _),
    // weighted sampling w/o replacement (A-ES keys + TopKAgg);
    // deterministic arithmetic hash → the oracle replays it exactly
    "agg_weighted_sample" -> ((s, d) => Aggregates.weightedSample(s, d)),
    // count-min frequency point queries, daily sketches driver-merged
    "agg_cms_pointq" -> (Aggregates.cmsPointQueries _),
    // dyadic half-life decayed counters (integer 1/256th units —
    // order-independent sums, no libm pow)
    "agg_decay_halflife" -> (Aggregates.decayHalflife _),
    // §2.7 sorts / limits / windows / set ops
    "w_topk" -> (Analytics.topCustomers _),
    // per-group top-k via mergeable aggregate, not a window
    "w_topk_group" -> ((s, d) => Analytics.topkPerGroup(s, d)),
    "w_running" -> (Analytics.windowRunning _),
    "set_union" -> (Analytics.unionNations _),
    "set_distinct" -> (Analytics.distinctPriorities _),
    "set_rollup" -> (Analytics.rollupCustomers _),
    "set_intersect" -> (Analytics.intersectNations _),
    "set_grouping_sets" -> (Analytics.groupingSets _),
    "set_except" -> (Analytics.exceptNations _),
    // §2.8 streaming cadences (batch analogs)
    "st1_tumbling_daily" -> (Analytics.tumblingDaily _),
    "st2_sliding_7day" -> (Analytics.sliding7Day _),
    // ST3 end-to-end STREAMING run: DSv2 MicroBatchStream drained with
    // Trigger.AvailableNow through update-mode foreachBatch upsert,
    // then the materialized table read back for the oracle compare
    "stream_feed_daily" -> (graft.streaming.StreamingAnalogs.feedDaily _),
    "stream_sessionize" -> (graft.streaming.StreamingAnalogs.feedSessions _),
    // running distinct per key: KMV sketch as transformWithState state
    "stream_distinct_running" ->
      (graft.streaming.StreamingAnalogs.feedDistinct _),
    // streaming trailing-7-day distinct: day→sketch MAPSTATE ledger
    // with horizon eviction — bounded state at any stream length
    "stream_sliding_distinct" ->
      (graft.streaming.StreamingAnalogs.feedSlidingDistinct _),
    // streaming weighted reservoir: TopKAgg buffer as TWS state,
    // deterministic A-ES keys → the drain is hash-exact vs the
    // generator replay
    "stream_weighted_sample" ->
      (graft.streaming.StreamingAnalogs.feedWeightedSample _),
    // streaming Misra-Gries heavy hitters: MG counter map as TWS
    // state (<= m counters at any stream length), id-ordered fold for
    // determinism; assertion form verifies MG completeness + the
    // undercount law against an in-plan exact generator replay
    "stream_heavy_hitters" ->
      (graft.streaming.StreamingAnalogs.feedHeavyHitters _),
    // streaming mergeable quantiles: HistSketch bins as TWS state;
    // HASH-EXACT (no bound booleans) — integer bin counts + the
    // deterministic bin-edge read-off replay fully in the oracle
    "stream_quantiles" ->
      (graft.streaming.StreamingAnalogs.feedQuantiles _),
    "stream_versioned_ingest" -> (Versioned.streamVersionedIngest _),
    // streaming exact dedup: a doubled at-least-once feed through
    // dropDuplicatesWithinWatermark — output = the generator, exactly
    "stream_dedup_feed" -> (graft.streaming.StreamingAnalogs.feedDedup _),
    // streaming per-event EWMA: one double of TWS state per key,
    // power-of-two decay → the drained level replays bit-for-bit
    "stream_ewma" -> (graft.streaming.StreamingAnalogs.feedEwma _),
    // streaming one-sided CUSUM drift alarm: four longs of TWS state
    // per key, integer-exact; oracle replays the closed form
    "stream_cusum" -> (graft.streaming.StreamingAnalogs.feedCusum _),
    // streaming open-interval concurrency: priority-queue state of
    // open ends, logical event-time sweep (deterministic, no timers)
    "stream_concurrency" ->
      (graft.streaming.StreamingAnalogs.feedConcurrency _),
    // stream-static ANTI join: admit only ids absent from the static
    // already-ingested index; no join state accumulates
    "stream_dedup_history" ->
      (graft.streaming.StreamingAnalogs.feedDedupHistory _),
    // streaming point-in-time enrichment: stream-static temporal join
    // against a versioned dim — the serving twin of p_pit_lookup
    "stream_pit_enrich" ->
      (graft.streaming.StreamingAnalogs.feedPitEnrich _),
    // S4/S5 custom DataSource V2 (paginated REST shape)
    "s4_rest_source" -> ((s, _) => {
      import org.apache.spark.sql.functions._
      s.read.format("graft.sources.RestSource")
        .option("pages", "16").option("pageSize", "250").load()
        .groupBy("page")
        .agg(count(lit(1)).as("n"),
          sum(col("score").cast("decimal(18,6)")).cast("double")
            .as("score_sum"),
          count(when(col("status") === "inactive", 1)).as("n_inactive"))
        .orderBy("page")
    }),
    // advanced joins / windows / skew tools
    "adv_asof_join" -> (Advanced.asofJoin _),
    // nearest-in-time join (both directions, ±24h band): day-exploded
    // equi candidates, one struct-argmin aggregate
    "adv_nearest_join" -> (Advanced.nearestJoin _),
    "adv_interval_join" -> (Advanced.intervalJoin _),
    "adv_session_window" -> (Advanced.sessionWindows _),
    "adv_salted_agg" -> (Advanced.saltedAgg _),
    // AQE runtime skew-join split (manual salt's runtime complement)
    "adv_skew_join" -> (Advanced.skewJoin _),
    "adv_dpp_prune" -> ((s: SparkSession, dir: String) =>
      Advanced.dppPrune(s, dir)),
    // spatial radius self-join via grid-cell blocking (cell = radius,
    // 9-cell probe explode, row-local exact distance); oracle = the
    // O(n²) brute-force scan the cells avoid
    "geo_cell_join" -> ((s, d) => Geo.cellJoin(s, d)),
    "adv_bucketed_join" -> ((s, d) => Advanced.bucketedJoin(s, d)),
    "adv_recursive_cte" -> (Advanced.recursiveChain _),
    // two Pareto frontiers over (price, size) via the bucketed
    // distributed min-min core — never a quadratic self-join or a
    // single-partition running min
    "adv_skyline" -> (Advanced.skyline _),
    "s_hash_sample" -> (Relational.hashSample _),
    "s_file_skipping" -> ((s, d) =>
      graft.sources.SkippingIndex.userSliceAgg(s, d)),
    "s_partition_prune" -> ((s, d) =>
      graft.sources.SkippingIndex.daySliceAgg(s, d)),
    "s_stratified_sample" -> ((s, d) => Relational.stratifiedSample(s, d)),
    "f4_housekeeping" -> (Relational.fileHousekeeping _),
    // window/aggregate extensions
    "w_leadlag" -> (Analytics.leadLagGaps _),
    "w_ntile" -> (Analytics.spendQuartiles _),
    "agg_percentile" -> (Analytics.percentiles _),
    "set_cube" -> (Analytics.cubeFlags _),
    // assertion form: HLL estimates vs exact distincts (Assertions)
    "agg_approx_distinct" -> (Assertions.approxDistinctBound _),
    // bitmap-word exact distinct (the bitmap-index pattern); oracle
    // counts DISTINCT directly — hash proves the planes equal
    "agg_bitmap_distinct" -> (Aggregates.bitmapDistinct _),
    // bitmap-index REUSE: per-type + TOTAL distincts answered from
    // the pooled word table; the fact is never rescanned
    "agg_bitmap_rollup" -> (Aggregates.bitmapRollup _),
    // exact pairwise Jaccard/overlap via word AND — the exact plane
    // of agg_kmv_overlap's sketch question, third index reuse
    "agg_bitmap_jaccard" -> (Aggregates.bitmapJaccard _),
    // assertion form: merged-sketch rollup vs exact per-level distincts
    "agg_sketch_rollup" -> (Assertions.sketchRollupBound _),
    "agg_profile" -> (Analytics.profileOrders _),
    "agg_histogram" -> (Analytics.histogram _),
    "agg_funnel" -> (Analytics.funnel _),
    "agg_cohort" -> (Analytics.cohortRetention _),
    "agg_quantile_rollup" -> (Analytics.quantileRollup _),
    // trailing-7-day moving median from merged day HistSketches
    "st_moving_median" -> ((s, d) => Analytics.movingMedian(s, d)),
    "j_fuzzy_match" -> (Advanced.fuzzyMatch _),
    "sim_random_proj" -> ((s, d) => Similarity.randomProjection(s, d)),
    // assertion form: orthonormality/eigen/variance invariants
    "sim_pca" -> ((s, d) => Assertions.pcaInvariants(s, d)),
    // Matryoshka retained-energy audit per truncation level
    "sim_mrl_energy" -> ((s, d) => Similarity.mrlEnergy(s, d)),
    // one NN-descent round over the IVF-seeded kNN graph: 2-hop
    // candidates rescored exactly; monotone by construction
    "sim_nn_descent" -> ((s, d) => Similarity.nnDescentRound(s, d)),
    "sim_corr_matrix" -> (Similarity.corrMatrix _),
    "sim_standardize" -> (Similarity.standardize _),
    "text_heavy_hitters" -> ((s, d) => TextAnalysis.heavyHitters(s, d)),
    // phrase search off the positional index: top-10 trigrams answered
    // by posting-list intersection (oracle = direct corpus slide)
    "text_phrase_search" -> ((s, d) => TextAnalysis.phraseSearch(s, d)),
    // per-doc OOV mass vs the broadcast top-16 vocabulary, div-ppm
    "text_oov_rate" -> ((s, d) => TextAnalysis.oovRate(s, d)),
    "st_gap_fill" -> (Analytics.gapFill _),
    // gaps-and-islands consecutive-day streaks (day − rank run id,
    // one window shuffle, no re-exchange after it)
    "w_streaks" -> (Analytics.streaks _),
    // LOCF forward fill per series over a calendar spine
    "st_locf" -> (Analytics.locfFill _),
    // exact EWMA: power-of-two decay folds bit-identically in both
    // engines (exponent decrements + in-mantissa integer adds)
    "st_ewma" -> ((s, d) => Analytics.ewmaDaily(s, d)),
    // CUSUM change point: n·prefix − t·total keeps the mean-deviation
    // sum in BIGINTs — argmax day + peak are hash-exact
    "st_cusum" -> (Analytics.cusumChangePoint _),
    // Mann–Kendall S over calendar-bounded day pairs, all integers
    "st_trend" -> (Analytics.trendTest _),
    // lag-1..3 autocorrelation from exact BIGINT moments; the signed
    // square r·|r| dodges sqrt (libm) across engines
    "st_autocorr" -> ((s, d) => Analytics.autocorr(s, d)),
    // day-of-week chi-square uniformity in rational form
    // (7·Σo² − n²)/n; weekday = epoch-day mod 7, engine-neutral
    "st_seasonality" -> (Analytics.seasonality _),
    // sweep-line max open 30-min intervals per user (+1/−1 running
    // sum; −1 first at equal instants = half-open semantics)
    "st_concurrency" -> (Analytics.concurrency _),
    // coalesced interval coverage per user (islands via running
    // max-end; covered µs exact integers)
    "st_interval_union" -> (Analytics.intervalUnion _),
    // OHLC bars: open/close via min/max(struct) argmin — one
    // aggregate pass, no window over raw events; exact integer cents
    "st_ohlc" -> (Analytics.ohlcBars _),
    // MATCH_RECOGNIZE-lite: calendar-consecutive declining runs per
    // series via day-arithmetic lag + the islands trick
    "w_pattern_runs" -> (Analytics.patternRuns _),
    // step-function time-weighted average per user; exact cents×µs
    // integrals, arithmetic mean emitted alongside for the gap
    "st_twap" -> (Analytics.twap _),
    // max peak-to-trough drawdown per user: running sum + running max
    // share one window spec; first-attaining argmax, exact BIGINT
    "st_drawdown" -> (Analytics.drawdown _),
    // YoY monthly growth: exact 1e-4-unit revenue, (y−1, m) self
    // join (never lag(12) — month gaps misalign it), IEEE ratio
    "st_yoy" -> (Analytics.yoyGrowth _),
    // Fano-factor dispersion per type: exact rational moments, one
    // IEEE division; Poisson = 1, bursts above
    "st_burstiness" -> (Analytics.burstiness _),
    // records test: record-high days vs the exact scaled harmonic
    // expectation Σ 1e6 div k — trend evidence with no logs
    "st_records" -> (Analytics.recordsTest _),
    // anchored-window funnel: signup → click ≤7d → purchase ≤7d of
    // the click; each stage one argmin, conversions exact div-ppm
    "agg_funnel_windowed" -> (Analytics.funnelWindowed _),
    // additive trend/seasonal/residual decomposition; exact BIGINT
    // numerators, one division per emitted double
    "st_decompose" -> (Analytics.decompose _),
    // gap-sessionized top event-type flows (funnel discovery)
    "agg_session_paths" -> ((s, d) => Analytics.sessionPaths(s, d)),
    // week-over-week retention off one reused (user, week) distinct
    "agg_wow_retention" -> (Analytics.wowRetention _),
    // RFM customer-value grid: three bucketed global rankings, zero
    // single-partition windows, integer quintile-of-rank scores
    "agg_rfm" -> (Analytics.rfmSegments _),
    // linear multi-touch attribution: exact 1e6 div/mod credit split,
    // conservation-law checkable
    "agg_attribution" -> (Analytics.attribution _),
    // heavy-change top-k: first-half vs second-half per-user deltas,
    // one conditional-count groupBy + TakeOrdered
    "agg_heavy_change" -> ((s, d) => Aggregates.heavyChange(s, d)),
    // AQP audit: 1/16 hash-sample estimates (uniform HT vs
    // day-stratified ratio) with exact div-ppm errors, one scan
    "agg_aqp_estimate" -> (Aggregates.aqpEstimate _),
    // Pareto contribution analysis: brand revenue shares, cumulative
    // 80% head; exact 1e-4-unit BIGINTs, decimal floor-div ppm
    "agg_pareto" -> (Aggregates.pareto _),
    "p_entity_resolution" -> (Pipelines.entityResolution _),
    // dense alphabetical surrogate keys via the bucketed global rank
    // (order-preserving proxy; no single-partition window)
    "p_surrogate_keys" -> (Pipelines.surrogateKeys _),
    // partition backfill planner: day-grain truth vs manifest, missing/
    // stale/orphan classification, newest-first bounded batch
    "p_backfill_plan" -> (Pipelines.backfillPlan _),
    // per-language floor + global-quality fill (two-level quota);
    // global rank via the bucketed core, quota from a 1-row broadcast
    "p_quota_fill" -> ((s, d) => Pipelines.quotaFill(s, d)),
    // shard-rebalance audit: mod vs rendezvous-hash key movement when
    // 16 shards grow to 17; one 17-way explode + max(struct) argmax
    "p_shard_rebalance" -> (Pipelines.shardRebalance _),
    // VACUUM planner: keep-last-2 + 365d guard per key; kept-by-count
    // vs kept-by-time-only split; per-key windows
    "p_retention_gc" -> ((s, d) => Pipelines.retentionGc(s, d)),
    // GDPR erasure work list: per-table row/key counts for a subject
    // batch, incl. the transitive lineitem-via-orders hop
    "p_erasure_plan" -> (Pipelines.erasurePlan _),
    // PPS budget split by Hamilton largest-remainder apportionment:
    // exact floors + mod-ranked extras, Σseats = budget by law
    "p_pps_alloc" -> ((s, d) => Pipelines.ppsAlloc(s, d)),
    // survivorship merge after ER: one master row per entity cluster,
    // each attribute by its own deterministic rule (mode/max/min)
    "p_golden_record" -> (Pipelines.goldenRecord _),
    // first-order Markov transition matrix over per-user sequences
    "agg_transitions" -> (Analytics.transitions _),
    // trailing-7-day distinct users per day from merged day sketches
    // (sub-k regime → the oracle demands exact equality)
    "agg_sliding_distinct" -> ((s, d) => Aggregates.slidingDistinct(s, d)),
    // RLHF/DPO prep: per-source (chosen, rejected) quality pairs via
    // one groupBy argmax/argmin — no window, no per-source sort
    "p_preference_pairs" -> (Pipelines.preferencePairs _),
    // cluster-aware train/val/test split: near-dup components are the
    // split unit, so no near-dup pair straddles train/test; the
    // straddle count is proven in-plan and re-derived by the oracle
    "p_split_leakage_safe" -> (Dedup.leakageSafeSplit _),
    // contrastive batch packing: source-disjoint by construction
    "p_contrastive_batches" -> (Pipelines.contrastiveBatches _),
    "p_merge_cdc" -> (Pipelines.mergeCdc _),
    "p_incremental_agg" -> (Pipelines.incrementalAggRefresh _),
    "agg_mode" -> (Analytics.modePriority _),
    "agg_correlation" -> (Analytics.correlation _),
    "w_percent_rank" -> (Analytics.spendStanding _),
    "agg_weighted_avg" -> (Analytics.weightedAvg _),
    "graph_pagerank" -> ((s, d) => Graph.pagerank(s, d)),
    // personalized PageRank: teleport mass on a seed cohort — the
    // recommendation form of the rank loop; deterministic top-20
    "graph_ppr" -> ((s, d) => Graph.personalizedPagerank(s, d)),
    // synchronous label propagation, exact-integer scores + min-label
    // tie-break → the oracle replays every round deterministically
    "graph_label_prop" -> ((s, d) => Graph.labelPropagation(s, d)),
    // weighted modularity of the LPA communities: exact BIGINT
    // numerators, one IEEE division; rides the pooled LPA build
    "graph_modularity" -> ((s, d) => Graph.modularity(s, d)),
    // per-node local clustering: degree-ordered wedges, inner close,
    // 3 incidence rows per triangle, div-ppm coefficient
    "graph_local_cc" -> (Graph.localClustering _),
    // bounded-round k-core peel; the oracle unrolls the same rounds
    "graph_kcore" -> ((s, d) => Graph.kcore(s, d)),
    // multi-source BFS hop distances, level-synchronous frontier
    // rounds; the oracle unrolls the same rounds as chained CTEs
    "graph_bfs_hops" -> ((s, d) => Graph.bfsHops(s, d)),
    // weighted SSSP: 3 Bellman-Ford relaxation rounds, integer edge
    // lengths 1e6 div sup; exact ≤-3-edge shortest distances
    "graph_sssp" -> ((s, d) => Graph.sssp(s, d)),
    // §2.2 sinks (write → read-back round trips)
    "sink_csv_roundtrip" -> (Sinks.csvRoundTrip _),
    "sink_json_archive" -> (Sinks.jsonArchive _),
    "sink_latest_snapshot" -> (Sinks.latestSnapshot _),
    "sink_ctas_promote" -> (Sinks.ctasPromote _),
    "sink_upsert_by_date" -> (Sinks.upsertByDate _),
    "sink_time_travel" -> (Versioned.timeTravel _),
    // change data feed: diff two versions via the table's own asOf
    // reads — insert/delete/update classification, unchanged rows cut
    "sink_versioned_cdf" -> (Versioned.changeFeed _),
    "sink_versioned_merge" -> (Versioned.versionedMerge _),
    "sink_versioned_delete" -> (Versioned.versionedDelete _),
    "sink_compact" -> (Sinks.compact _),
    "sink_schema_evolution" -> (Sinks.schemaEvolution _),
    "sink_zorder" -> (Sinks.zorderCluster _),
    // data-quality gates
    "dq_expectations" -> (Quality.expectations _),
    "dq_observed_audit" -> (Quality.observedAudit _),
    "dq_volume_anomaly" -> (Quality.volumeAnomaly _),
    // total-variation drift between two slices, all-integer ppm
    "dq_dist_drift" -> (Quality.distributionDrift _),
    // Benford first-digit authenticity screen, literal ppm curve
    "dq_benford" -> (Quality.benfordAudit _),
    // per-column null-rate / ndv-density drift between two slices —
    // the profile diff of the observability stack, exact integer ppm
    "dq_profile_drift" -> (Quality.profileDrift _),
    // watermark-sizing audit: per-key max/p95 event-time disorder in
    // exact integer micros (ceiling-rank p95, no interpolation)
    "dq_late_arrivals" -> (Quality.lateArrivals _),
    // timeline causality gate: purchase before (or without) signup
    "dq_order_violations" -> (Quality.orderingViolations _),
    // candidate-key uniqueness audit over single + composite keys
    "dq_key_discovery" -> (Quality.keyDiscovery _),
    // sort-free sequence-gap audit: min/max/count arithmetic + a
    // shifted self anti join for run starts — no window, no lag
    "dq_id_gaps" -> (Quality.idGaps _),
    // CBO join-size audit: exact Σ cl·cr off ndv-sized count tables
    // vs the |L|·|R|/max(ndv) uniform estimate, div-ppm error
    "dq_join_card" -> (Quality.joinCard _),
    // FK fanout distribution incl. the k=0 class inner joins drop;
    // two groupBys + one anti join, no window
    "dq_fanout_profile" -> (Quality.fanoutProfile _),
    // k-anonymity audit over the QI tuple; suppression cost div-ppm
    "dq_k_anonymity" -> ((s, d) => Quality.kAnonymity(s, d)),
    "dq_referential" -> (Quality.referentialAudit _),
    // confusion matrix + rational Cohen's kappa: langId vs labels
    "dq_agreement_kappa" -> (Quality.agreementKappa _),
    // two-sample chi-square: hash sample vs population, Euclidean-
    // split integer quotients (no wide intermediates)
    "dq_sample_fit" -> (Quality.sampleFit _),
    // join-key skew audit: exact Gini coefficient per candidate key
    // via the bucketed global-rank core; integer num/den + div-ppm
    "dq_skew_gini" -> (Quality.skewGini _),
    // robust |x-med| > 3*MAD gate, discrete medians, integer cents
    "dq_outlier_mad" -> (Quality.madOutliers _),
    // the same gate with mergeable HistSketch medians — the 100 TB
    // form, with within-bin agreement columns vs the exact medians
    "dq_outlier_mad_sketch" -> (Quality.madOutliersSketch _),
    "dq_snapshot_diff" -> (Quality.snapshotDiff _),
    "set_unpivot" -> (Analytics.unpivotMetrics _),
    "w_range_frame" -> (Analytics.rangeFrameTrailing _),
    "set_union_evolve" -> (Analytics.unionEvolve _),
    "sim_ivfpq_topk" -> (Assertions.ivfPqTopKRecall _),
    "sink_infer_csv" -> (Sinks.inferredCsv _),
    "sink_orc_roundtrip" -> (Sinks.orcRoundTrip _),
    "sink_xml_roundtrip" -> (Sinks.xmlRoundTrip _),
    // federated-format union: parquet + csv + json + orc, one contract
    "sink_multi_format" -> (Sinks.multiFormatUnion _),
    // §3.2 pipeline B gold table
    "p_insight_gold" -> (Pipelines.insightGold _),
    // column-level lineage of the gold pipeline, extracted from the
    // ANALYZED plan (graft.plans.Lineage — never touches data); the
    // oracle is the hand-derived edge set, so a refactor that silently
    // changes which physical columns feed an output column fails here
    "plan_lineage" -> ((s, d) =>
      graft.plans.Lineage.edgesDf(Pipelines.insightGold(s, d))),
    // physical-plan linter over a deliberately pathological query
    // (graft.plans.PlanAudit — plan-only, never touches data); the
    // oracle is the hand-derived finding set, so a rule regression or
    // a planner change that flips a trigger shape fails the compare
    "plan_audit" -> (graft.plans.PlanAudit.lintDemo _),
    // ANALYZE-stats audit: catalog rowCount/ndv vs exact ground truth
    // (assertion form; raw estimates spec-asserted)
    "plan_stats_audit" -> ((s, d) => graft.plans.StatsAudit.audit(s, d)),
    "p_scd2" -> (Pipelines.scd2 _),
    // incremental SCD2 merge: stored history read back, delta-sized
    // close + chain; oracle = the full rebuild (incremental ≡ rebuild)
    "p_scd2_merge" -> (Pipelines.scd2Merge _),
    // point-in-time SCD2 lookup: facts enriched with the attribute in
    // effect at their OWN event time (training-serving skew guard)
    "p_pit_lookup" -> (Pipelines.pitLookup _),
    "p_corpus_clean" -> (Pipelines.corpusClean _),
    // §2.6 scalar function families
    "x_string_suite" -> (ScalarSuite.stringSuite _),
    "x_date_suite" -> (ScalarSuite.dateSuite _),
    "x11_ts_roundtrip" -> (ScalarSuite.timestampRoundtrip _),
    "x18_kv_parse" -> (ScalarSuite.kvParse _),
    "x8_status_case" -> (ScalarSuite.statusCase _),
    "x4_address" -> (ScalarSuite.addressConcat _),
    "x7_map_construct" -> (ScalarSuite.mapConstruct _),
    "x_hof_suite" -> (ScalarSuite.hofSuite _),
    // business-day SLA lateness via the closed-form weekday prefix
    // W(e) = 5·⌊(e+3)/7⌋ + min((e+3)%7+1, 5); exact both engines
    "x_business_days" -> (ScalarSuite.businessDays _),
    // semi-structured JSON layer (S4-S6, X3/X6)
    "ss_json_flatten" -> (SemiStructured.jsonFlatten _),
    "ss_props_extract" -> (SemiStructured.propsExtract _),
    "ss_variant_path" -> (SemiStructured.variantPath _),
    "ss_struct_traversal" -> (SemiStructured.structTraversal _),
    "ss_gmb_roundtrip" -> (SemiStructured.gmbPerformanceRoundTrip _),
    "ss_gmb_media" -> (SemiStructured.gmbMediaRoundTrip _),
    "ss_gmb_vom" -> (SemiStructured.gmbVomRoundTrip _),
    "ss_gmb_location" -> (SemiStructured.gmbLocationRoundTrip _),
    "ss_gmb_localposts" -> (SemiStructured.gmbLocalPostsRoundTrip _),
    "ss_quarantine" -> (SemiStructured.qualityQuarantine _),
    "ss_gmb_reviews" -> (SemiStructured.gmbReviewsRoundTrip _),
    "ss_gmb_services" -> (SemiStructured.gmbServicesRoundTrip _),
    // §2.10 north-star: deduplication
    "dedup_exact" -> (Dedup.exact _),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    // asymmetric containment |A∩B|/min — catches short-doc-inside-
    // long-doc duplication symmetric Jaccard structurally misses
    "dedup_containment" -> ((s, d) => Dedup.containmentPairs(s, d)),
    // prefix-filtered EXACT Jaccard join — same output as the full
    // index, candidate set provably complete and far smaller
    "dedup_prefix_jaccard" -> ((s, d) => Dedup.prefixJaccard(s, d)),
    // the prefix filter's pruning ratio through the gate: candidate
    // counts (prefix vs full index) re-derived independently in SQL
    "dedup_prefix_stats" -> ((s, d) => Dedup.prefixFilterStats(s, d)),
    // assertion forms: recall/precision vs the ngram-Jaccard truth
    "dedup_minhash" -> (Assertions.minhashRecall _),
    "dedup_simhash" -> (Assertions.simhashConsistency _),
    "dedup_simhash_pairs" -> (Assertions.simhashPairsRecall _),
    "dedup_cosine" -> (Similarity.cosineNearDup _),
    "dedup_clusters" -> (Dedup.nearDupClusters _),
    "graph_triangles" -> (Graph.triangleCount _),
    "graph_clustering_coeff" -> (Graph.clusteringCoeff _),
    // resource-allocation link prediction: integer 1e6 div deg(w)
    // contributions over the wedge space, anti-joined vs existing
    // edges, deterministic top-100
    "graph_linkpred" -> ((s, d) => Graph.linkPrediction(s, d)),
    // item-item CF: rational cosine² ppm over co-purchase counts,
    // per-item top-5 (basket-bounded pair space)
    "graph_item_cf" -> ((s, d) => Graph.itemCf(s, d)),
    "dedup_clusters_star" -> (Dedup.nearDupClustersStar _),
    "text_decontaminate" -> (Dedup.decontaminate _),
    // duplicate-8-gram coverage per doc (RefinedWeb metric), string
    // shingles joined verbatim, div-ppm law
    "text_dup_coverage" -> ((s, d) => TextAnalysis.dupCoverage(s, d)),
    // maximal duplicated-span extraction (islands over dup positions)
    "text_dup_spans" -> ((s, d) => TextAnalysis.dupSpans(s, d)),
    // Simpson diversity + type-token ratio, div-ppm laws
    "text_diversity" -> (TextAnalysis.diversity _),
    "dedup_incremental" -> (Dedup.incremental _),
    // the index-probe form: history band buckets pooled, delta
    // signatures probe them, candidates exact-verified (assertion
    // form — precision-1 law + recall bound vs the exact cross pairs)
    "dedup_incremental_lsh" -> (Dedup.incrementalLsh _),
    // quality-aware representative per near-dup cluster (argmax
    // quality, min-id tie-break) — the keep-best policy layer
    "dedup_keep_best" -> (Dedup.keepBestPerCluster _),
    // the persisted-index form: history bands as a bucketed table, so
    // the probe join has NO exchange on the (big) history side
    "dedup_lsh_index" -> ((s, d) => Dedup.incrementalLshBucketed(s, d)),
    // bloom-prefiltered semi join: candidates-only exact verify
    "j_bloom_semi" -> (Dedup.bloomSemiJoin _),
    // §2.10 north-star: similarity search
    "sim_topk" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    // assertion forms: ANN recall vs the exact baselines
    "sim_ann_lsh" -> (Assertions.annLshRecall _),
    "sim_ann_ivf" -> (Assertions.annIvfRecall _),
    // corpus-wide mutual-kNN graph (SemDeDup/SNN substrate): IVF
    // multi-probe candidates, round-3 rank, mutuality filter; exact
    // full-pair graph computed in-plan as the assertion ground truth
    "sim_knn_graph" -> ((s, d) => Assertions.knnGraphBounds(s, d)),
    "sim_quantize" -> (Assertions.quantizeBound _),
    "sim_centroids" -> (Similarity.labelCentroids _),
    // corrupt-embedding screen: integer-exact centroid distances
    // (n·x − Σx residuals), squared 3σ law — no sqrt, no division
    "sim_outlier_gate" -> (Similarity.outlierGate _),
    "sim_kmeans" -> ((s, d) => Similarity.kmeans(s, d)),
    "sim_pq" -> ((s, d) => Similarity.pqCodes(s, d)),
    "sim_pq_topk" -> (Assertions.pqTopKRecall _),
    "sim_hard_negatives" -> ((s, d) => Similarity.hardNegatives(s, d)),
    "sim_hybrid_rrf" -> ((s, d) => TextAnalysis.hybridRrf(s, d)),
    "sim_mmr_rerank" -> ((s, d) => Similarity.mmrRerank(s, d)),
    "dedup_semantic" -> ((s, d) => Similarity.semanticDedup(s, d)),
    "p_diverse_subset" -> ((s, d) => Pipelines.diverseSubset(s, d)),
    // §2.10 north-star: text analysis
    "text_lang_id" -> (TextAnalysis.langId _),
    "text_quality" -> (TextAnalysis.qualityScore _),
    "text_token_count" -> (TextAnalysis.tokenCount _),
    "text_fingerprint" -> (TextAnalysis.fingerprint _),
    // assertion forms: fingerprint determinism + coverage
    "text_winnow" -> (Assertions.winnowConsistency _),
    "dedup_winnow_pairs" -> (Assertions.winnowPairsRecall _),
    "text_vocab" -> (TextAnalysis.vocab _),
    "text_bigrams" -> (TextAnalysis.bigrams _),
    // interpolated Kneser–Ney bigram LM (continuation counts from the
    // one bigram-types table; rational probability, no logs)
    "text_kn_bigram" -> ((s, d) => TextAnalysis.knBigram(s, d)),
    // PMI collocations ranked by the exact integer ratio (log-free)
    "text_collocations" -> ((s, d) => TextAnalysis.collocations(s, d)),
    // Heaps-law vocabulary growth per corpus decile (saturation report)
    "text_vocab_growth" -> (TextAnalysis.vocabGrowth _),
    "text_chunk" -> ((s, d) => TextAnalysis.chunk(s, d)),
    "text_pack" -> ((s, d) => TextAnalysis.packSequences(s, d)),
    "text_tfidf" -> ((s, d) => TextAnalysis.tfidf(s, d)),
    "text_bm25" -> ((s, d) => TextAnalysis.bm25(s, d)),
    "text_lm_score" -> (TextAnalysis.lmScore _),
    // CCNet head/middle/tail terciles over the LM score — the
    // quality-stratification mixture knob; exact integer tercile law
    "text_ppl_buckets" -> (TextAnalysis.perplexityBuckets _),
    "text_pii_scrub" -> (TextAnalysis.piiScrub _),
    "text_holdout_split" -> (TextAnalysis.holdoutSplit _),
    "text_repetition" -> (TextAnalysis.repetition _),
    "text_gopher_quality" -> (TextAnalysis.gopherQuality _),
    "text_token_mixture" -> (TextAnalysis.tokenMixture _),
    "text_train_classifier" -> ((s, d) =>
      Learn.trainQualityClassifier(s, d)),
    "text_classifier_score" -> ((s, d) =>
      Learn.scoreQualityClassifier(s, d)),
    "text_quality_filter" -> (TextAnalysis.qualityFilter _),
    "text_resample" -> (TextAnalysis.resample _),
    // DSIR importance resampling: target/proposal bigram-LM ratio as
    // the weight, deterministic A-ES draw — fully oracle-replayed
    "text_dsir_resample" -> ((s, d) => TextAnalysis.dsirResample(s, d)),
    "text_token_budget" -> ((s: SparkSession, dir: String) =>
      TextAnalysis.tokenBudgetFill(s, dir)),
    "text_unicode_norm" -> (TextAnalysis.unicodeNormalize _),
    "text_compression_ratio" -> (Assertions.compressionInvariants _),
    "text_span_dedup" -> ((s, d) => TextAnalysis.spanDedup(s, d)),
    "text_bpe_train" -> ((s, d) => TextAnalysis.bpeTrain(s, d)),
    "text_bpe_apply" -> ((s, d) => TextAnalysis.bpeApply(s, d)),
    "text_wordpiece_apply" -> ((s, d) => TextAnalysis.wordpieceApply(s, d)),
    // unigram-LM tokenizer (SentencePiece family): hard-EM training
    // over the compressed word table, Viterbi apply; assertion form
    // (reconstruction partition law, fertility range, vocab target,
    // EM-objective monotonicity) with replayable corpus totals
    "text_unigram_lm" -> ((s, d) => Unigram.unigramLm(s, d)),
    // §2.10 north-star: multimodal plumbing
    "mm_decode_meta" -> (Multimodal.decodeMeta _),
    "mm_frame_sample" -> (Multimodal.frameSample _),
    "mm_payload_neardup" -> (Multimodal.payloadNearDup _),
    // WebDataset shard packing: prefix-sum div law per source, shard-
    // grain manifest (counts/bytes/id range)
    "mm_shard_plan" -> ((s, d) => Multimodal.shardPlan(s, d)),
    // epoch-shuffled reader order over the shard manifest: row-local
    // multiplicative permutation key, bucketed global rank
    "p_epoch_shuffle" -> ((s, d) => Multimodal.epochShuffle(s, d)),
    "mm_resize" -> (Multimodal.resize _),
    "mm_features" -> (Multimodal.featureExtract _),
  )

  /** Queries whose builder functions eagerly EXECUTE work (writes,
    * CTAS) before returning the DataFrame — the write IS the operator.
    * Registered here, next to the queries, so plan-only tooling
    * (PlanQualitySpec's sweep) can skip them without maintaining a
    * drifting name list. Keep in sync when adding a query that runs
    * jobs inside its builder.
    */
  val eagerWriters: Set[String] =
    queries.keySet.filter(_.startsWith("sink_")) +
      "adv_bucketed_join" +
      "s2_jdbc_source" + // builder seeds the embedded Derby db (a write job)
      "s2_jdbc_agg_pushdown" + // same Derby seed job
      "dedup_clusters" + // builder runs the iterative CC fixpoint jobs
      "dedup_clusters_star" + // same fixpoint via star alternation
      "dedup_keep_best" + // reads the same CC fixpoint labels
      "dedup_lsh_index" + // builder writes the bucketed index table
      "p_entity_resolution" + // composes the CC fixpoint on fuzzy pairs
      "graph_pagerank" + // builder runs the rank-iteration jobs
      "graph_ppr" + // same loop with the seeded teleport
      "graph_label_prop" + // builder runs the propagation-round jobs
      "graph_modularity" + // rides the same pooled LPA round jobs
      "graph_local_cc" + // builder checkpoints the oriented edge set
      "graph_triangles" + // builder checkpoints the oriented edge set
      "graph_clustering_coeff" + // same checkpointed edge pipeline
      "sim_kmeans" +     // builder runs the Lloyd-iteration jobs
      "sim_pq" +         // builder runs per-subspace Lloyd jobs
      "sim_pq_topk" +    // builder trains the PQ books (Lloyd jobs)
      "p_diverse_subset" + // composes sim_kmeans (Lloyd jobs)
      "dedup_semantic" +   // composes sim_kmeans (Lloyd jobs)
      "text_bpe_train" + // builder runs the merge-iteration jobs
      "text_bpe_apply" + // builder trains (or reads the memo) first
      "text_wordpiece_apply" + // builder collects the vocab first
      "text_unigram_lm" + // builder runs the EM-round jobs
      "stream_feed_daily" + // builder runs the AvailableNow stream drain
      "stream_sessionize" + // same drain, append-mode session windows
      "stream_distinct_running" + // same drain, TWS KMV state
      "stream_sliding_distinct" + // same drain, TWS day→sketch MapState
      "stream_weighted_sample" + // same drain, TWS A-ES reservoir state
      "stream_heavy_hitters" + // same drain, TWS Misra-Gries state
      "stream_quantiles" + // same drain, TWS histogram-sketch state
      "stream_versioned_ingest" + // drain committing versions per batch
      "text_heavy_hitters" + // builder checkpoints the sketch pass
      "w_percent_rank" + // builder collects quantile bounds + bucket counts
      "w_ntile" +        // same bucket-rank machinery (ntile from rank)
      "dedup_minhash" +  // builder counts candidates to gate the broadcast
      "j15_top_supplier" + // builder checkpoints the per-supplier revenue
      "j11_important_parts" + // builder checkpoints the per-part values
      "dq_snapshot_diff" + // builder checkpoints the base projection
      "sim_ivfpq_topk" + // builder trains the PQ books (Lloyd jobs)
      "sim_pca" +        // builder runs the covariance pass + eigensolve
      "mv_summary_rewrite" + // builder materializes the rollup summary
      "adv_dpp_prune" +  // builder writes the partitioned fact copy
      "adv_skew_join" +  // builder executes the join under tuned AQE confs
      "agg_median_scale" + // builder runs the stats + histogram jobs
      "dq_observed_audit" + // builder runs the observed pass
      "mv_incremental_refresh" + // builder writes base + merges the delta
      "mv_join_delta" + // builder materializes the stored join view
      "graph_bfs_hops" + // builder runs the frontier-round jobs
      "graph_sssp" + // builder runs the relaxation-round jobs
      "stream_concurrency" + // AvailableNow drain, TWS open-ends state
      "stream_dedup_history" + // AvailableNow drain, stream-static anti
      "p_scd2_merge" + // builder materializes the stored history table
      "plan_stats_audit" + // builder saves the table + runs ANALYZE
      "agg_kmv_overlap" + // builder collects the per-group sketches
      "agg_cms_pointq" + // builder merges day sketches (O(days) rows)
      "s_partition_prune" // builder writes the events_by_day layout (once)

  /** DuckDB replay of Graph.pagerank: the same scaled-integer
    * contribution sums, chained one CTE pair (c_i, r_i) per
    * iteration — generated because the SQL repeats per round.
    */
  private def pagerankOracle(iters: Int): String = {
    val base =
      """WITH pair AS (SELECT -(l_suppkey + 1) AS supp_node,
        |    o_custkey AS cust_node, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |edges AS (SELECT supp_node AS src, cust_node AS dst, w FROM pair
        |  UNION ALL SELECT cust_node, supp_node, w FROM pair),
        |deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outdeg
        |  FROM edges GROUP BY src),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
        |r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) / nn.n AS rank
        |  FROM deg, nn)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.dst,
         |    CAST(round(r.rank * e.w / d.outdeg * 1e12) AS BIGINT) AS c
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node
         |  JOIN deg d ON e.src = d.src),
         |r$i AS (SELECT dst AS node, CAST(0.15 AS DOUBLE) / nn.n +
         |    CAST(0.85 AS DOUBLE) * (CAST(SUM(c) AS BIGINT) / 1e12) AS rank
         |  FROM c$i, nn GROUP BY dst, nn.n)""".stripMargin
    }
    (base +: rounds).mkString(",\n") +
      s"\nSELECT node, rank FROM r$iters ORDER BY node"
  }

  /** DuckDB replay of Graph.personalizedPagerank: same edge chain,
    * seeded teleport via a full outer join per round, identical
    * double operand structure.
    */
  private def pprOracle(iters: Int): String = {
    val base =
      """WITH pair AS (SELECT -(l_suppkey + 1) AS supp_node,
        |    o_custkey AS cust_node, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |edges AS (SELECT supp_node AS src, cust_node AS dst, w FROM pair
        |  UNION ALL SELECT cust_node, supp_node, w FROM pair),
        |deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outdeg
        |  FROM edges GROUP BY src),
        |seeds AS (SELECT c_custkey AS node FROM customer
        |  WHERE c_nationkey = 1
        |    AND c_custkey IN (SELECT src FROM deg)),
        |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM seeds),
        |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / ns.n AS rank
        |  FROM seeds, ns)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.dst,
         |    CAST(round(r.rank * e.w / d.outdeg * 1e12) AS BIGINT) AS c
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node
         |  JOIN deg d ON e.src = d.src),
         |w$i AS (SELECT dst AS node,
         |    CAST(0.85 AS DOUBLE) * (CAST(SUM(c) AS BIGINT) / 1e12)
         |      AS walk
         |  FROM c$i GROUP BY 1),
         |r$i AS (SELECT COALESCE(w.node, s.node) AS node,
         |    CASE WHEN s.node IS NOT NULL
         |      THEN CAST(0.15 AS DOUBLE) / ns.n
         |      ELSE CAST(0.0 AS DOUBLE) END
         |      + COALESCE(w.walk, CAST(0.0 AS DOUBLE)) AS rank
         |  FROM w$i w FULL OUTER JOIN seeds s ON w.node = s.node, ns)"""
        .stripMargin
    }
    (base +: rounds).mkString(",\n") +
      s"""\nSELECT -(node) - 1 AS s_suppkey, rank FROM r$iters
         |WHERE node < 0 ORDER BY rank DESC, s_suppkey LIMIT 20"""
        .stripMargin
  }

  /** DuckDB replay of Graph.labelPropagation: the same edge set, one
    * (score-sum, argmax) CTE pair per synchronous round — exact
    * BIGINT scores + smallest-label tie-break make every round
    * deterministic, so the replay matches label for label.
    */
  private def lpaOracle(iters: Int): String = {
    val base =
      """WITH pair AS (SELECT -(l_suppkey + 1) AS supp_node,
        |    o_custkey AS cust_node, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |edges AS (SELECT supp_node AS src, cust_node AS dst, w FROM pair
        |  UNION ALL SELECT cust_node, supp_node, w FROM pair),
        |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges)"""
        .stripMargin
    val rounds = (1 to iters).map { i =>
      s"""s$i AS (SELECT e.dst AS node, l.lbl AS lbl,
         |    CAST(SUM(e.w) AS BIGINT) AS score
         |  FROM edges e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2),
         |l$i AS (SELECT node, lbl FROM (
         |  SELECT node, lbl, row_number() OVER (PARTITION BY node
         |    ORDER BY score DESC, lbl ASC) AS rn FROM s$i) WHERE rn = 1)"""
        .stripMargin
    }
    (base +: rounds).mkString(",\n") +
      s"\nSELECT node, lbl AS community FROM l$iters ORDER BY node"
  }

  /** DuckDB replay of Graph.modularity: the same synchronous LPA
    * rounds over the UNIPARTITE co-purchase symmetric edges, then
    * the degree/in-weight rollup and the S·sym_in − d² identity;
    * the final division is the same IEEE op.
    */
  private def modularityOracle(iters: Int): String = {
    val base =
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |ed AS (SELECT x.pk AS a, y.pk AS b, count(*) AS sup FROM li x
        |  JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |edges AS (SELECT a AS src, b AS dst, sup AS w FROM ed
        |  UNION ALL SELECT b, a, sup FROM ed),
        |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges)"""
        .stripMargin
    val rounds = (1 to iters).map { i =>
      s"""s$i AS (SELECT e.dst AS node, l.lbl AS lbl,
         |    CAST(SUM(e.w) AS BIGINT) AS score
         |  FROM edges e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2),
         |l$i AS (SELECT node, lbl FROM (
         |  SELECT node, lbl, row_number() OVER (PARTITION BY node
         |    ORDER BY score DESC, lbl ASC) AS rn FROM s$i) WHERE rn = 1)"""
        .stripMargin
    }
    (base +: rounds).mkString(",\n") + s""",
      |deg AS (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS k
      |  FROM edges GROUP BY 1),
      |dc AS (SELECT l.lbl AS community,
      |    CAST(SUM(d.k) AS BIGINT) AS d_c,
      |    CAST(COUNT(*) AS BIGINT) AS n_nodes
      |  FROM deg d JOIN l$iters l ON d.node = l.node GROUP BY 1),
      |win AS (SELECT a.lbl AS community,
      |    CAST(SUM(e.w) AS BIGINT) AS w_in_sym
      |  FROM edges e JOIN l$iters a ON e.src = a.node
      |  JOIN l$iters b ON e.dst = b.node AND a.lbl = b.lbl
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS s2m FROM edges),
      |per AS (SELECT dc.community, n_nodes, d_c,
      |    CAST(coalesce(w_in_sym, 0) AS BIGINT) AS w_in_sym,
      |    CAST(s2m * coalesce(w_in_sym, 0) - d_c * d_c AS BIGINT)
      |      AS contrib_num, s2m
      |  FROM dc LEFT JOIN win ON dc.community = win.community, tot),
      |q AS (SELECT CAST(SUM(contrib_num) AS BIGINT) AS q_num FROM per)
      |SELECT community, n_nodes, d_c, w_in_sym, contrib_num, s2m,
      |  q_num, CAST(q_num AS DOUBLE) / CAST(s2m * s2m AS DOUBLE) AS q
      |FROM per, q ORDER BY community""".stripMargin
  }

  /** DuckDB replay of Similarity.kmeans (two Lloyd iterations with the
    * scaled-int centroid means) — shared: the sim_kmeans oracle and
    * p_diverse_subset's km CTE both use it.
    */
  private val kmeansOracle: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |c1 AS (SELECT CAST(vec_id AS INT) AS ck, v AS cv
      |  FROM e ORDER BY vec_id LIMIT 8),
      |d1 AS (SELECT e.vec_id, e.v, c1.ck,
      |    list_reduce(list_transform(list_zip(e.v, c1.cv),
      |      s -> (s[1]-s[2])*(s[1]-s[2])), (a,b) -> a+b) AS dist
      |  FROM e CROSS JOIN c1),
      |a1 AS (SELECT vec_id, v, ck AS cluster FROM
      |    (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      |        ORDER BY dist, ck) AS rn FROM d1) WHERE rn = 1),
      |x1 AS (SELECT cluster, CAST(unnest(range(len(v))) AS INT) AS dim,
      |    unnest(v) AS x FROM a1),
      |c2 AS (SELECT cluster AS ck, list(mu ORDER BY dim) AS cv FROM
      |    (SELECT cluster, dim,
      |       SUM(CAST(round(x*1e6) AS BIGINT)) / (COUNT(*)*1e6) AS mu
      |     FROM x1 GROUP BY cluster, dim) GROUP BY cluster),
      |d2 AS (SELECT e.vec_id, c2.ck,
      |    list_reduce(list_transform(list_zip(e.v, c2.cv),
      |      s -> (s[1]-s[2])*(s[1]-s[2])), (a,b) -> a+b) AS dist
      |  FROM e CROSS JOIN c2)
      |SELECT vec_id, ck AS cluster, round(dist, 6) AS dist_sq FROM
      |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      |      ORDER BY dist, ck) AS rn FROM d2) WHERE rn = 1
      |ORDER BY vec_id""".stripMargin

  /** DuckDB replay of Similarity.pqCodes — one kmeans chain per
    * subspace (generated like the BPE chain; the SQL repeats per
    * subspace): slice the vectors, seed codewords from the first k
    * vectors in vec_id order (code id = seed rank), one scaled-BIGINT
    * mean update, final argmin assignment with the (dist, code)
    * tie-break, per-subspace error rounded to 6 then summed
    * left-to-right — the identical arithmetic the Spark side runs.
    */
  private def pqOracle(m: Int, k: Int, subDim: Int): String = {
    val subs = (0 until m).map { j =>
      val lo = j * subDim + 1
      val hi = (j + 1) * subDim
      s"""e$j AS (SELECT vec_id, v[$lo:$hi] AS v FROM e),
         |c${j}a AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1
         |      AS INT) AS ck, v AS cv
         |  FROM e$j ORDER BY vec_id LIMIT $k),
         |d${j}a AS (SELECT s.vec_id, s.v, c.ck,
         |    list_reduce(list_transform(list_zip(s.v, c.cv),
         |      z -> (z[1]-z[2])*(z[1]-z[2])), (a,b) -> a+b) AS dist
         |  FROM e$j s CROSS JOIN c${j}a c),
         |a${j}a AS (SELECT vec_id, v, ck AS cluster FROM
         |    (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |        ORDER BY dist, ck) AS rn FROM d${j}a) WHERE rn = 1),
         |x$j AS (SELECT cluster, CAST(unnest(range(len(v))) AS INT) AS dim,
         |    unnest(v) AS x FROM a${j}a),
         |c${j}b AS (SELECT cluster AS ck, list(mu ORDER BY dim) AS cv FROM
         |    (SELECT cluster, dim,
         |       SUM(CAST(round(x*1e6) AS BIGINT)) / (COUNT(*)*1e6) AS mu
         |     FROM x$j GROUP BY cluster, dim) GROUP BY cluster),
         |d${j}b AS (SELECT s.vec_id, c.ck,
         |    list_reduce(list_transform(list_zip(s.v, c.cv),
         |      z -> (z[1]-z[2])*(z[1]-z[2])), (a,b) -> a+b) AS dist
         |  FROM e$j s CROSS JOIN c${j}b c),
         |a${j}b AS (SELECT vec_id, ck AS code, round(dist, 6) AS err FROM
         |    (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |        ORDER BY dist, ck) AS rn FROM d${j}b) WHERE rn = 1)"""
        .stripMargin
    }
    val codeCols = (0 until m)
      .map(j => s"a${j}b.code AS code_$j").mkString(", ")
    val errSum = (0 until m).map(j => s"a${j}b.err")
      .reduceLeft((a, b) => s"($a + $b)")
    val joins = (1 until m)
      .map(j => s"JOIN a${j}b ON a${j}b.vec_id = a0b.vec_id")
      .mkString("\n")
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |${subs.mkString(",\n")}
       |SELECT a0b.vec_id, $codeCols, $errSum AS recon_err
       |FROM a0b
       |$joins
       |ORDER BY a0b.vec_id""".stripMargin
  }

  /** The shared CTE chain w0..wn / m1..mn of the DuckDB replay of
    * TextAnalysis.bpeTrain — generated because the SQL repeats per
    * merge rank: w_r = word encodings after r merges (original word
    * carried through), m_r = the r-th learned merge. bpeOracle reads
    * the m's; the bpeApply oracle reads wn.
    */
  private def bpeChain(n: Int): String = {
    val w0 =
      raw"""w0 AS (SELECT word, '(' ||
           |    array_to_string(string_split(word, ''), ')(') || ')' AS w, n
           |  FROM (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM
           |         (SELECT unnest(string_split_regex(trim(lower(text)),
           |            '\s+')) AS word FROM documents)
           |        WHERE word != '' GROUP BY word))""".stripMargin
    val rounds = (1 to n).flatMap { r =>
      val m =
        s"""m$r AS (SELECT pair, cnt,
           |    string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b
           |  FROM (SELECT pair, SUM(n) AS cnt FROM
           |         (SELECT unnest(list_transform(list_zip(syms[1:len(syms)-1],
           |            syms[2:len(syms)]), s -> s[1] || ' ' || s[2])) AS pair, n
           |          FROM (SELECT string_split(trim(w, '()'), ')(') AS syms,
           |                  n FROM w${r - 1}))
           |        GROUP BY pair)
           |  ORDER BY cnt DESC, pair LIMIT 1)""".stripMargin
      val w =
        s"""w$r AS (SELECT word, replace(w, '(' || m$r.a || ')(' || m$r.b ||
           |    ')', '(' || m$r.a || m$r.b || ')') AS w, n
           |  FROM w${r - 1} CROSS JOIN m$r)""".stripMargin
      Seq(m, w)
    }
    (w0 +: rounds).mkString(",\n")
  }

  /** DuckDB replay of Learn.trainQualityClassifier — the identical
    * chained batch-GD arithmetic (6-decimal-rounded sigmoid, scaled
    * BIGINT gradient sums), so the learned weights hash-match
    * bit-for-bit.
    */
  private def logregOracle(iters: Int): String =
    logregChain(iters) +
      s"""
         |SELECT feature, weight_micro FROM (
         |  SELECT 'bias' AS feature,
         |    CAST(round(w0 * 1e6) AS BIGINT) AS weight_micro FROM w$iters
         |  UNION ALL SELECT 'x_chars_h', CAST(round(w1 * 1e6) AS BIGINT)
         |    FROM w$iters
         |  UNION ALL SELECT 'x_src0', CAST(round(w2 * 1e6) AS BIGINT)
         |    FROM w$iters)
         |ORDER BY feature""".stripMargin

  /** Learn.scoreQualityClassifier replay: the same trained chain, the
    * same MICRO-ROUNDED weights re-entering scoring (the trainer's
    * surfaced precision, not the raw doubles), bucketed histogram.
    */
  private def logregScoreOracle(iters: Int): String =
    logregChain(iters) +
      s""",
         |wm AS (SELECT CAST(round(w0 * 1e6) AS BIGINT) / 1e6 AS b,
         |    CAST(round(w1 * 1e6) AS BIGINT) / 1e6 AS c,
         |    CAST(round(w2 * 1e6) AS BIGINT) / 1e6 AS ww FROM w$iters),
         |scored AS (SELECT round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) +
         |    exp(-(wm.b * CAST(1 AS DOUBLE) +
         |      wm.c * (CAST(n_chars AS DOUBLE) / CAST(100 AS DOUBLE)) +
         |      wm.ww * (CASE WHEN source = 'src0' THEN CAST(1 AS DOUBLE)
         |        ELSE CAST(0 AS DOUBLE) END)))), 6) AS p
         |  FROM documents, wm)
         |SELECT CAST(floor(p * 100) AS INT) AS p_bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CAST(round(p * 1e6) AS BIGINT)) AS BIGINT)
         |    AS p_mass_micro
         |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin

  private def logregChain(iters: Int): String = {
    val base =
      """WITH f AS (SELECT CAST(1 AS DOUBLE) AS x0,
        |    CAST(n_chars AS DOUBLE) / CAST(100 AS DOUBLE) AS x1,
        |    CASE WHEN source = 'src0' THEN CAST(1 AS DOUBLE)
        |      ELSE CAST(0 AS DOUBLE) END AS x2,
        |    CASE WHEN lang = 'en' THEN CAST(1 AS DOUBLE)
        |      ELSE CAST(0 AS DOUBLE) END AS y
        |  FROM documents),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM f),
        |w0 AS (SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
        |  CAST(0 AS DOUBLE) AS w2)""".stripMargin
    def contrib(x: String) =
      s"""SUM(CAST(round((round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) +
         |      exp(-(w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2))), 6)
         |      - f.y) * f.$x * 1e9) AS BIGINT))""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""g$i AS (SELECT ${contrib("x0")} AS g0,
         |    ${contrib("x1")} AS g1,
         |    ${contrib("x2")} AS g2
         |  FROM f, w${i - 1} w),
         |w$i AS (SELECT
         |    w.w0 - CAST(0.5 AS DOUBLE) * (g.g0 / 1e9) / nn.c AS w0,
         |    w.w1 - CAST(0.5 AS DOUBLE) * (g.g1 / 1e9) / nn.c AS w1,
         |    w.w2 - CAST(0.5 AS DOUBLE) * (g.g2 / 1e9) / nn.c AS w2
         |  FROM w${i - 1} w, g$i g, nn)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** DuckDB replay of TextAnalysis.wordpieceApply: rebuild the vocab
    * from the merge chain's final encodings (w_n symbols ∪ single
    * chars), compute the LONGEST match per (word, position) with a
    * window argmax (non-recursive — SQL's recursive term cannot
    * aggregate), then walk each word with a recursive CTE that hops
    * `len(best piece)` forward; the visited positions' pieces,
    * weighted by word frequency, are the token counts.
    */
  private def wordpieceOracle(n: Int): String =
    s"""WITH RECURSIVE ${bpeChain(n)},
       |vocab AS (
       |  SELECT DISTINCT piece FROM (
       |    SELECT unnest(string_split(trim(w, '()'), ')(')) AS piece
       |    FROM w$n
       |    UNION ALL
       |    SELECT unnest(string_split(word, '')) FROM w0)
       |  WHERE piece != ''),
       |pos AS (SELECT word, n,
       |    unnest(generate_series(1, len(word))) AS p FROM w0),
       |best AS (
       |  SELECT word, n, p, piece FROM (
       |    SELECT pos.word, pos.n, pos.p, v.piece,
       |      ROW_NUMBER() OVER (PARTITION BY pos.word, pos.p
       |        ORDER BY len(v.piece) DESC) AS rk
       |    FROM pos JOIN vocab v
       |      ON substr(pos.word, pos.p, len(v.piece)) = v.piece)
       |  WHERE rk = 1),
       |walk AS (
       |  SELECT word, n, CAST(1 AS BIGINT) AS p FROM w0
       |  UNION ALL
       |  SELECT b.word, b.n, wk.p + len(b.piece)
       |  FROM walk wk JOIN best b ON b.word = wk.word AND b.p = wk.p)
       |SELECT b.piece, CAST(SUM(b.n) AS BIGINT) AS n_tokens
       |FROM walk wk JOIN best b ON b.word = wk.word AND b.p = wk.p
       |GROUP BY 1 ORDER BY n_tokens DESC, piece""".stripMargin

  /** The text_bpe_train oracle: the chain's n learned merges, ranked. */
  private def bpeOracle(n: Int): String = {
    val sel = (1 to n).map { r =>
      s"""SELECT $r AS merge_rank, a AS left_sym, b AS right_sym,
         |  CAST(cnt AS BIGINT) AS pair_count FROM m$r""".stripMargin
    }.mkString("\nUNION ALL ")
    "WITH " + bpeChain(n) + "\n" + sel + "\nORDER BY merge_rank"
  }

  /** DuckDB replay of TextAnalysis.bpeApply: final encodings from the
    * chain's wn, joined to the corpus token stream.
    */
  private def bpeApplyOracle(n: Int): String =
    s"""WITH ${bpeChain(n)},
       |vocab AS (SELECT word,
       |    CAST(len(string_split(trim(w, '()'), ')(')) AS INT) AS bpe_len
       |  FROM w$n),
       |toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)),
       |    '\\s+')) AS word FROM documents)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ws_tokens,
       |  CAST(SUM(bpe_len) AS BIGINT) AS bpe_tokens,
       |  CAST(SUM(bpe_len) AS BIGINT) / CAST(COUNT(*) AS BIGINT)
       |    AS tokens_per_word
       |FROM toks JOIN vocab USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Shared by dedup_clusters and dedup_clusters_star: both CC
    * variants must converge to the identical cluster labeling, so one
    * recursive-CTE replay oracles both.
    */
  /** The shared pair-graph + transitive-closure CTE chain (3-gram
    * shingles, Jaccard ≥ 0.5, min-id labels) — prefix of every oracle
    * that replays the near-dup clusters.
    */
  private val ccPairsLabCte: String =
    """toks AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
      |    unnest(generate_series(1,
      |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win AS s
      |  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
      |  QUALIFY lead(w,2) OVER win IS NOT NULL),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pr AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM pr
      |  JOIN sz na ON na.doc_id = doc_a
      |  JOIN sz nb ON nb.doc_id = doc_b
      |  WHERE n_inter / (na.n + nb.n - n_inter) >= 0.5),
      |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |lab AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
      |        FROM reach GROUP BY 1)""".stripMargin

  private val ccClustersOracle: String =
    s"""WITH RECURSIVE $ccPairsLabCte,
       |cs AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |       FROM lab GROUP BY 1)
       |SELECT l.doc_id, l.cluster_id, cs.cluster_size,
       |  CAST(l.doc_id = l.cluster_id AS INT) AS is_keeper
       |FROM lab l JOIN cs ON l.cluster_id = cs.cluster_id
       |ORDER BY l.doc_id""".stripMargin

  /** p_split_leakage_safe oracle: clusters re-derived by the closure
    * CTE, the same masked Knuth bucket on the cluster unit, and the
    * straddle count RECOUNTED from the pair set (must come out 0).
    */
  private val leakageSplitOracle: String =
    s"""WITH RECURSIVE $ccPairsLabCte,
       |units AS (SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS unit
       |          FROM documents d LEFT JOIN lab l ON l.doc_id = d.doc_id),
       |asg AS (SELECT doc_id, unit,
       |    CASE WHEN ((unit % 2147483648) * 2654435761) % 100 < 80
       |           THEN 'train'
       |         WHEN ((unit % 2147483648) * 2654435761) % 100 < 90
       |           THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM units),
       |strad AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_straddle
       |  FROM pairs p JOIN asg x ON x.doc_id = p.doc_a
       |  JOIN asg y ON y.doc_id = p.doc_b WHERE x.split <> y.split)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT unit) AS BIGINT) AS n_units,
       |  MIN(doc_id) AS min_doc_id, n_straddle
       |FROM asg CROSS JOIN strad
       |GROUP BY split, n_straddle ORDER BY split""".stripMargin

  /** Shared oracle of both incremental-LSH audit forms: the exact
    * delta→history near-pair truth from the ngram CTEs.
    */
  private val lshAuditOracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
      |    unnest(generate_series(1,
      |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win AS s
      |  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
      |  QUALIFY lead(w,2) OVER win IS NOT NULL),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |jc AS (
      |  SELECT a.doc_id AS doc_id, b.doc_id AS hist_id
      |  FROM sh a JOIN sh b ON a.s = b.s
      |    AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
      |  JOIN sz na ON na.doc_id = a.doc_id
      |  JOIN sz nb ON nb.doc_id = b.doc_id
      |  GROUP BY 1, 2, na.n, nb.n
      |  HAVING count(*) / (na.n + nb.n - count(*)) >= 0.5)
      |SELECT
      |  (SELECT CAST(count(*) AS BIGINT) FROM jc) AS n_true_cross_pairs,
      |  (SELECT CAST(count(*) AS BIGINT) FROM documents
      |    WHERE doc_id % 5 = 0) AS n_delta,
      |  TRUE AS recall_ok, TRUE AS all_matches_true""".stripMargin

  /** dedup_keep_best oracle: the recursive-CTE transitive closure
    * (ccClustersOracle's CTE chain) extended with the text_quality
    * score and a per-cluster (quality desc, doc_id) argmax window —
    * the keep-best policy replayed end to end.
    */
  private val keepBestOracle: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
      |    unnest(generate_series(1,
      |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win AS s
      |  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
      |  QUALIFY lead(w,2) OVER win IS NOT NULL),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pr AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM pr
      |  JOIN sz na ON na.doc_id = doc_a
      |  JOIN sz nb ON nb.doc_id = doc_b
      |  WHERE n_inter / (na.n + nb.n - n_inter) >= 0.5),
      |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |lab AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
      |        FROM reach GROUP BY 1),
      |cs AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      |       FROM lab GROUP BY 1),
      |q AS (SELECT doc_id,
      |    round(0.5 * (CAST(len(list_distinct(string_split_regex(
      |        trim(lower(text)), '\s+'))) AS INT)
      |      / CAST(len(string_split_regex(trim(lower(text)), '\s+'))
      |        AS INT))
      |      + 0.5 * least(CAST(len(string_split_regex(trim(lower(text)),
      |        '\s+')) AS INT) / 100.0, 1.0), 4) AS quality_score
      |  FROM documents),
      |keep AS (SELECT cluster_id, doc_id AS keeper_doc_id FROM (
      |    SELECT l.cluster_id, l.doc_id,
      |      row_number() OVER (PARTITION BY l.cluster_id
      |        ORDER BY q.quality_score DESC, l.doc_id) AS rn
      |    FROM lab l JOIN q USING (doc_id)) WHERE rn = 1)
      |SELECT l.doc_id, l.cluster_id, cs.cluster_size, q.quality_score,
      |  k.keeper_doc_id,
      |  CAST(l.doc_id = k.keeper_doc_id AS INT) AS kept
      |FROM lab l JOIN cs USING (cluster_id) JOIN q USING (doc_id)
      |  JOIN keep k USING (cluster_id)
      |ORDER BY l.doc_id""".stripMargin

  /** Shared by p_merge_cdc and sink_versioned_merge: the versioned
    * MERGE applies the identical I/U/D batch (Pipelines.cdcChanges),
    * so one full-outer replay oracles both.
    */
  private val mergeCdcOracle: String =
    """WITH snap AS (SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders),
      |changes AS (
      |  SELECT o_orderkey, 'U' AS op, 'R' AS c_status,
      |      o_totalprice + CAST(1000.0 AS DOUBLE) AS c_total
      |    FROM snap WHERE o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0
      |  UNION ALL
      |  SELECT o_orderkey, 'D', CAST(NULL AS VARCHAR),
      |      CAST(NULL AS DOUBLE)
      |    FROM snap WHERE o_orderkey % 11 = 0
      |  UNION ALL
      |  SELECT -(o_orderkey + 1), 'I', 'N', CAST(50000.0 AS DOUBLE)
      |    FROM snap WHERE o_orderkey % 13 = 0)
      |SELECT COALESCE(s.o_orderkey, c.o_orderkey) AS o_orderkey,
      |  COALESCE(c.c_status, s.o_orderstatus) AS o_orderstatus,
      |  COALESCE(c.c_total, s.o_totalprice) AS o_totalprice
      |FROM snap s FULL OUTER JOIN changes c
      |  ON s.o_orderkey = c.o_orderkey
      |WHERE c.op IS NULL OR c.op <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  /** The exact 3-gram-Jaccard near-dup pair set in DuckDB SQL — the
    * dedup_ngram_jaccard oracle, factored out because the
    * minhash/simhash/winnow RECALL assertions replay its pair COUNT
    * as their oracle-exact column (Assertions.pairRecall).
    */
  private val ngramPairSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
      |    unnest(generate_series(1,
      |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win AS s
      |  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
      |  QUALIFY lead(w,2) OVER win IS NOT NULL),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pr AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  n_inter / (na.n + nb.n - n_inter) AS jaccard
      |FROM pr
      |JOIN sz na ON na.doc_id = doc_a
      |JOIN sz nb ON nb.doc_id = doc_b
      |WHERE n_inter / (na.n + nb.n - n_inter) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** dedup_prefix_stats oracle: the prefix index REBUILT in plain SQL
    * (document frequencies, a rarest-first rank window, prefix length
    * n − ⌈t·n⌉ + 1, the length-filtered self-join) so candidate
    * counts and both comparison booleans replay independently —
    * nothing is a literal-true bound.
    */
  private val prefixStatsSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
      |    unnest(generate_series(1,
      |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win AS s
      |  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
      |  QUALIFY lead(w,2) OVER win IS NOT NULL),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pr AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |truth AS (SELECT CAST(count(*) AS BIGINT) AS n_true_pairs
      |  FROM pr JOIN sz na ON na.doc_id = doc_a
      |  JOIN sz nb ON nb.doc_id = doc_b
      |  WHERE n_inter / (na.n + nb.n - n_inter) >= 0.5),
      |fullc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand_full
      |  FROM (SELECT DISTINCT a.doc_id, b.doc_id
      |    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id)),
      |dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
      |ord AS (SELECT sh.doc_id, sh.s,
      |    row_number() OVER (PARTITION BY sh.doc_id
      |      ORDER BY dfreq.df, sh.s) AS r,
      |    count(*) OVER (PARTITION BY sh.doc_id) AS n
      |  FROM sh JOIN dfreq USING (s)),
      |pref AS (SELECT doc_id, s, n FROM ord
      |  WHERE r <= n - CAST(ceil(n * 0.5) AS BIGINT) + 1),
      |prefc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand_prefix
      |  FROM (SELECT DISTINCT a.doc_id, b.doc_id
      |    FROM pref a JOIN pref b ON a.s = b.s AND a.doc_id < b.doc_id
      |      AND b.n >= a.n * 0.5 AND a.n >= b.n * 0.5)),
      |probef AS (SELECT CAST(COALESCE(SUM(df * (df - 1) // 2), 0)
      |    AS BIGINT) AS n_probe_full FROM dfreq),
      |probep AS (SELECT CAST(COALESCE(SUM(df2 * (df2 - 1) // 2), 0)
      |    AS BIGINT) AS n_probe_prefix
      |  FROM (SELECT s, count(*) AS df2 FROM pref GROUP BY s))
      |SELECT n_true_pairs, n_cand_prefix, n_cand_full,
      |  n_probe_prefix, n_probe_full,
      |  (n_cand_prefix < n_cand_full) AS prefix_prunes,
      |  (n_probe_prefix < n_probe_full) AS probe_prunes,
      |  (n_cand_prefix >= n_true_pairs) AS covers_truth
      |FROM truth, prefc, fullc, probep, probef""".stripMargin

  /** Oracle for the pair-recall assertion queries: the truth-pair
    * count replays exactly; the bound booleans replay as `true` —
    * the Spark side computes them for real, so a recall/precision
    * regression hash-mismatches.
    */
  private val pairRecallOracle: String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
       | true AS recall_ok, true AS precision_ok
       |FROM ($ngramPairSql) t""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "text_bpe_train" -> bpeOracle(8),
    "text_train_classifier" -> logregOracle(3),
    "text_classifier_score" -> logregScoreOracle(3),
    "text_bpe_apply" -> bpeApplyOracle(8),
    "text_wordpiece_apply" -> wordpieceOracle(8),
    "text_unigram_lm" ->
      // corpus totals replay from the same tokenization; the booleans
      // are deterministic model laws (segmentation-is-a-partition,
      // fertility within [words, chars], vocab bound + char coverage,
      // hard-EM objective monotone) — oracle: literal true
      """WITH w AS (SELECT unnest(string_split_regex(trim(lower(text)),
        |    '\s+')) AS word FROM documents),
        |f AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM w
        |  WHERE word <> '' GROUP BY 1)
        |SELECT CAST(sum(n) AS BIGINT) AS n_words,
        |  CAST(count(*) AS BIGINT) AS n_distinct_words,
        |  CAST(sum(len(word) * n) AS BIGINT) AS n_chars,
        |  TRUE AS all_words_reconstruct, TRUE AS fertility_in_range,
        |  TRUE AS vocab_at_target, TRUE AS em_ll_monotone
        |FROM f""".stripMargin,
    "graph_pagerank" -> pagerankOracle(3),
    "graph_ppr" -> pprOracle(3),
    "graph_label_prop" -> lpaOracle(3),
    "graph_modularity" -> modularityOracle(3),
    "graph_local_cc" ->
      // independent path: direct a<b<c triangle enumeration
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |ed AS (SELECT x.pk AS a, y.pk AS b FROM li x
        |  JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |tr AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM ed e1 JOIN ed e2 ON e1.b = e2.a
        |  JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
        |inc AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
        |  SELECT x AS node FROM tr
        |  UNION ALL SELECT y FROM tr
        |  UNION ALL SELECT z FROM tr) GROUP BY 1),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        |  SELECT a AS node FROM ed
        |  UNION ALL SELECT b FROM ed) GROUP BY 1)
        |SELECT deg.node AS node, d AS degree,
        |  CAST(coalesce(n_tri, 0) AS BIGINT) AS n_triangles,
        |  CAST(CASE WHEN d >= 2 THEN coalesce(n_tri, 0) * 2000000
        |    // (d * (d - 1)) ELSE 0 END AS BIGINT) AS lcc_ppm
        |FROM deg LEFT JOIN inc ON deg.node = inc.node
        |ORDER BY 1""".stripMargin,
    "graph_kcore" ->
      // the same three peel rounds unrolled, k = lower-median degree
      // + 1 re-derived in SQL; counts only, no floats
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |ed AS (SELECT x.pk AS a, y.pk AS b FROM li x
        |  JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e0 AS (SELECT a AS src, b AS dst FROM ed
        |  UNION ALL SELECT b, a FROM ed),
        |d0 AS (SELECT src, count(*) AS deg FROM e0 GROUP BY 1),
        |dc AS (SELECT deg, CAST(count(*) AS BIGINT) AS cnt
        |  FROM d0 GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d0),
        |cum AS (SELECT l.deg, CAST(SUM(r.cnt) AS BIGINT) AS cum
        |  FROM dc l JOIN dc r ON r.deg <= l.deg GROUP BY 1),
        |kk AS (SELECT MIN(deg) + 1 AS k FROM cum, nn
        |  WHERE cum >= (n + 1) // 2),
        |d1 AS (SELECT src, count(*) AS deg FROM e0 GROUP BY 1),
        |k1 AS (SELECT src FROM d1, kk WHERE deg >= k),
        |e1 AS (SELECT e.src, e.dst FROM e0 e
        |  JOIN k1 a ON e.src = a.src JOIN k1 b ON e.dst = b.src),
        |d2 AS (SELECT src, count(*) AS deg FROM e1 GROUP BY 1),
        |k2 AS (SELECT src FROM d2, kk WHERE deg >= k),
        |e2 AS (SELECT e.src, e.dst FROM e1 e
        |  JOIN k2 a ON e.src = a.src JOIN k2 b ON e.dst = b.src),
        |d3 AS (SELECT src, count(*) AS deg FROM e2 GROUP BY 1),
        |k3 AS (SELECT src FROM d3, kk WHERE deg >= k),
        |e3 AS (SELECT e.src, e.dst FROM e2 e
        |  JOIN k3 a ON e.src = a.src JOIN k3 b ON e.dst = b.src)
        |SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        |FROM e3 GROUP BY 1 ORDER BY 1""".stripMargin,
    "graph_bfs_hops" ->
      // the same level-synchronous frontier rounds unrolled: v_k =
      // visited after k rounds, f_k = the round-k frontier (reached,
      // not yet visited); distances are the round constants
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |ed AS (SELECT x.pk AS a, y.pk AS b FROM li x
        |  JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT a AS src, b AS dst FROM ed
        |  UNION ALL SELECT b, a FROM ed),
        |f0 AS (SELECT DISTINCT src AS node FROM sym WHERE src % 50 = 0),
        |f1 AS (SELECT DISTINCT e.dst AS node FROM sym e
        |  JOIN f0 ON e.src = f0.node
        |  WHERE e.dst NOT IN (SELECT node FROM f0)),
        |v1 AS (SELECT node FROM f0 UNION ALL SELECT node FROM f1),
        |f2 AS (SELECT DISTINCT e.dst AS node FROM sym e
        |  JOIN f1 ON e.src = f1.node
        |  WHERE e.dst NOT IN (SELECT node FROM v1)),
        |v2 AS (SELECT node FROM v1 UNION ALL SELECT node FROM f2),
        |f3 AS (SELECT DISTINCT e.dst AS node FROM sym e
        |  JOIN f2 ON e.src = f2.node
        |  WHERE e.dst NOT IN (SELECT node FROM v2))
        |SELECT node, CAST(0 AS INT) AS dist FROM f0
        |UNION ALL SELECT node, 1 FROM f1
        |UNION ALL SELECT node, 2 FROM f2
        |UNION ALL SELECT node, 3 FROM f3
        |ORDER BY node""".stripMargin,
    "graph_sssp" ->
      // the same Bellman-Ford relaxation rounds unrolled: d_k holds
      // the exact shortest distance among paths of ≤ k edges
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |ed AS (SELECT x.pk AS a, y.pk AS b, count(*) AS sup FROM li x
        |  JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT a AS src, b AS dst, 1000000 // sup AS w FROM ed
        |  UNION ALL SELECT b, a, 1000000 // sup FROM ed),
        |d0 AS (SELECT DISTINCT src AS node,
        |    CAST(0 AS BIGINT) AS dist FROM sym WHERE src % 50 = 0),
        |d1 AS (SELECT node, min(dist) AS dist FROM (
        |  SELECT node, dist FROM d0
        |  UNION ALL SELECT s.dst, d.dist + s.w FROM d0 d
        |    JOIN sym s ON d.node = s.src) GROUP BY 1),
        |d2 AS (SELECT node, min(dist) AS dist FROM (
        |  SELECT node, dist FROM d1
        |  UNION ALL SELECT s.dst, d.dist + s.w FROM d1 d
        |    JOIN sym s ON d.node = s.src) GROUP BY 1),
        |d3 AS (SELECT node, min(dist) AS dist FROM (
        |  SELECT node, dist FROM d2
        |  UNION ALL SELECT s.dst, d.dist + s.w FROM d2 d
        |    JOIN sym s ON d.node = s.src) GROUP BY 1)
        |SELECT node, CAST(dist AS BIGINT) AS dist FROM d3
        |ORDER BY node""".stripMargin,
    "p_shard_rebalance" ->
      // independent argmax path: row_number over (h desc, s desc)
      """WITH ks AS (SELECT c_custkey AS k FROM customer),
        |ex AS (SELECT k, s,
        |    ((k * 2654435761 + s * 2246822519) % 1000000007
        |      * 48271) % 1000000007 AS h
        |  FROM ks, (SELECT unnest(range(17)) AS s)),
        |a16 AS (SELECT k, s AS hrw16 FROM (
        |  SELECT k, s, row_number() OVER (PARTITION BY k
        |    ORDER BY h DESC, s DESC) AS rn FROM ex WHERE s < 16)
        |  WHERE rn = 1),
        |a17 AS (SELECT k, s AS hrw17 FROM (
        |  SELECT k, s, row_number() OVER (PARTITION BY k
        |    ORDER BY h DESC, s DESC) AS rn FROM ex)
        |  WHERE rn = 1),
        |j AS (SELECT a16.k, hrw16, hrw17 FROM a16
        |  JOIN a17 ON a16.k = a17.k)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(CASE WHEN k % 16 <> k % 17 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS moved_mod,
        |  CAST(sum(CASE WHEN k % 16 <> k % 17 THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS moved_mod_ppm,
        |  CAST(sum(CASE WHEN hrw16 <> hrw17 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS moved_hrw,
        |  CAST(sum(CASE WHEN hrw16 <> hrw17 THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS moved_hrw_ppm
        |FROM j""".stripMargin,
    "p_retention_gc" ->
      """WITH v AS (SELECT o_custkey, o_orderkey,
        |    CAST(o_orderdate AS DATE) AS vdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY CAST(o_orderdate AS DATE) DESC,
        |        o_orderkey DESC) AS vrank,
        |    max(CAST(o_orderdate AS DATE)) OVER
        |      (PARTITION BY o_custkey) AS newest
        |  FROM orders),
        |f AS (SELECT o_custkey, vdate, vrank <= 2 AS by_count,
        |    vdate >= newest - 365 AS by_time FROM v)
        |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_versions,
        |  CAST(sum(CASE WHEN by_count OR by_time THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_keep,
        |  CAST(sum(CASE WHEN NOT by_count AND NOT by_time
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_gc,
        |  CAST(sum(CASE WHEN by_time AND NOT by_count
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_by_time_only,
        |  min(CASE WHEN by_count OR by_time THEN vdate END)
        |    AS oldest_kept
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "w_pattern_runs" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS eday,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |f AS (SELECT event_type, eday, cnt,
        |    lag(eday) OVER (PARTITION BY event_type ORDER BY eday)
        |      AS pd,
        |    lag(cnt) OVER (PARTITION BY event_type ORDER BY eday)
        |      AS pc
        |  FROM daily),
        |fl AS (SELECT event_type, eday,
        |    (pd = eday - 1 AND cnt < pc) AS declining FROM f),
        |r AS (SELECT event_type, eday - row_number() OVER
        |    (PARTITION BY event_type ORDER BY eday) AS grp
        |  FROM fl WHERE declining),
        |rl AS (SELECT event_type, grp, count(*) AS run_len
        |  FROM r GROUP BY 1, 2),
        |a1 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(CASE WHEN declining THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_declining_days
        |  FROM fl GROUP BY 1),
        |a2 AS (SELECT event_type,
        |    CAST(max(run_len) AS BIGINT) AS longest_run,
        |    CAST(sum(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_runs_ge3
        |  FROM rl GROUP BY 1)
        |SELECT a1.event_type, n_days, n_declining_days,
        |  CAST(coalesce(longest_run, 0) AS BIGINT) AS longest_run,
        |  CAST(coalesce(n_runs_ge3, 0) AS BIGINT) AS n_runs_ge3
        |FROM a1 LEFT JOIN a2 ON a1.event_type = a2.event_type
        |ORDER BY 1""".stripMargin,
    "st_ohlc" ->
      // independent argmin path: row_number both directions
      """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    epoch_us(ts) AS t, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |r AS (SELECT event_type, day, cents,
        |    row_number() OVER (PARTITION BY event_type, day
        |      ORDER BY t, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, day
        |      ORDER BY t DESC, event_id DESC) AS rn_d
        |  FROM e)
        |SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT)
        |    AS open_cents,
        |  CAST(max(cents) AS BIGINT) AS high_cents,
        |  CAST(min(cents) AS BIGINT) AS low_cents,
        |  CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT)
        |    AS close_cents,
        |  CAST(sum(cents) AS BIGINT) AS vol_cents
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "agg_funnel_windowed" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t
        |  FROM events),
        |s AS (SELECT user_id, min(t) AS signup_t FROM ev
        |  WHERE event_type = 'signup' GROUP BY 1),
        |c AS (SELECT s.user_id, min(e.t) AS click_t FROM s
        |  JOIN ev e ON e.user_id = s.user_id
        |    AND e.event_type = 'click' AND e.t >= s.signup_t
        |    AND e.t < s.signup_t + 604800000000 GROUP BY 1),
        |p AS (SELECT c.user_id, min(e.t) AS purchase_t FROM c
        |  JOIN ev e ON e.user_id = c.user_id
        |    AND e.event_type = 'purchase' AND e.t >= c.click_t
        |    AND e.t < c.click_t + 604800000000 GROUP BY 1)
        |SELECT n_signup, n_click_7d, n_purchase_7d,
        |  n_click_7d * 1000000 // n_signup AS conv1_ppm,
        |  n_purchase_7d * 1000000 // n_click_7d AS conv2_ppm
        |FROM (SELECT CAST(count(*) AS BIGINT) AS n_signup FROM s),
        |  (SELECT CAST(count(*) AS BIGINT) AS n_click_7d FROM c),
        |  (SELECT CAST(count(*) AS BIGINT) AS n_purchase_7d FROM p)
        |""".stripMargin,
    "x_business_days" ->
      """WITH j AS (SELECT o_orderpriority,
        |    date_diff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS ea,
        |    date_diff('day', DATE '1970-01-01',
        |      CAST(l_shipdate AS DATE)) AS eb
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |b AS (SELECT o_orderpriority,
        |    (5 * ((eb + 3) // 7) + least((eb + 3) % 7 + 1, 5))
        |      - (5 * ((ea + 3) // 7) + least((ea + 3) % 7 + 1, 5))
        |      AS bd
        |  FROM j)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN bd >= 0 AND bd <= 5 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_within_sla,
        |  CAST(sum(CASE WHEN bd >= 0 AND bd <= 5 THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS sla_ppm,
        |  CAST(sum(bd) AS BIGINT) AS bd_sum,
        |  CAST(min(bd) AS BIGINT) AS bd_min,
        |  CAST(max(bd) AS BIGINT) AS bd_max
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "dq_fanout_profile" ->
      """WITH pp AS (SELECT o_custkey AS parent,
        |    CAST(count(*) AS BIGINT) AS k FROM orders GROUP BY 1),
        |z AS (SELECT CAST(0 AS BIGINT) AS k,
        |    CAST(count(*) AS BIGINT) AS n_parents
        |  FROM customer
        |  WHERE c_custkey NOT IN (SELECT parent FROM pp)),
        |d0 AS (SELECT k, CAST(count(*) AS BIGINT) AS n_parents
        |  FROM pp GROUP BY 1
        |  UNION ALL SELECT k, n_parents FROM z WHERE n_parents > 0),
        |t AS (SELECT CAST(sum(n_parents) AS BIGINT) AS total_parents,
        |    CAST(sum(k * n_parents) AS BIGINT) AS total_children
        |  FROM d0)
        |SELECT d0.k, n_parents, k * n_parents AS n_children,
        |  total_parents, total_children,
        |  (SELECT k FROM d0 ORDER BY n_parents DESC, k DESC LIMIT 1)
        |    AS mode_k,
        |  CAST(n_parents * 1000000 // total_parents AS BIGINT)
        |    AS share_ppm
        |FROM d0, t ORDER BY k""".stripMargin,
    "dq_k_anonymity" ->
      """WITH cls AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 5000) AS BIGINT) AS bal_band,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(cnt) AS BIGINT) AS min_class_size,
        |  CAST(sum(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_small_classes,
        |  CAST(sum(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk,
        |  CAST(sum(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) * 1000000
        |    // sum(cnt) AS BIGINT) AS suppress_ppm
        |FROM cls""".stripMargin,
    "dq_id_gaps" ->
      """WITH ids AS (SELECT DISTINCT event_type, event_id AS id
        |  FROM events),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_ids,
        |    min(id) AS id_min, max(id) AS id_max,
        |    CAST(max(id) - min(id) + 1 - count(*) AS BIGINT)
        |      AS n_missing
        |  FROM ids GROUP BY 1),
        |g AS (SELECT x.event_type,
        |    CAST(count(*) - 1 AS BIGINT) AS n_gap_runs
        |  FROM ids x LEFT JOIN ids y
        |    ON x.event_type = y.event_type AND x.id = y.id + 1
        |  WHERE y.id IS NULL GROUP BY 1)
        |SELECT st.event_type, n_ids, id_min, id_max, n_missing,
        |  n_gap_runs
        |FROM st JOIN g ON st.event_type = g.event_type
        |ORDER BY 1""".stripMargin,
    "dq_join_card" -> {
      def block(name: String, lsel: String, rsel: String) =
        s"""SELECT '$name' AS join_key, n_left, ndv_left, n_right,
           |  ndv_right, exact_rows,
           |  n_left * n_right
           |    // greatest(ndv_left, ndv_right) AS est_rows,
           |  abs(n_left * n_right
           |      // greatest(ndv_left, ndv_right) - exact_rows)
           |    * 1000000 // exact_rows AS err_ppm
           |FROM
           |  (SELECT CAST(count(*) AS BIGINT) AS n_left,
           |     CAST(count(DISTINCT k) AS BIGINT) AS ndv_left
           |   FROM ($lsel)),
           |  (SELECT CAST(count(*) AS BIGINT) AS n_right,
           |     CAST(count(DISTINCT k) AS BIGINT) AS ndv_right
           |   FROM ($rsel)),
           |  (SELECT CAST(coalesce(sum(cl * cr), 0) AS BIGINT)
           |     AS exact_rows
           |   FROM (SELECT k, count(*) AS cl FROM ($lsel) GROUP BY 1) l
           |   JOIN (SELECT k, count(*) AS cr FROM ($rsel) GROUP BY 1) r
           |   ON l.k = r.k)
           |""".stripMargin
      block("orderkey", "SELECT l_orderkey AS k FROM lineitem",
        "SELECT o_orderkey AS k FROM orders") +
        "UNION ALL " +
        block("partkey", "SELECT l_partkey AS k FROM lineitem",
          "SELECT p_partkey AS k FROM part") +
        "UNION ALL " +
        block("suppkey", "SELECT l_suppkey AS k FROM lineitem",
          "SELECT s_suppkey AS k FROM supplier") +
        "ORDER BY join_key"
    },
    "graph_clustering_coeff" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pp AS (
        |  SELECT a, b FROM (
        |    SELECT x.l_partkey AS a, y.l_partkey AS b,
        |      COUNT(*) AS sup
        |    FROM li x JOIN li y
        |      ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |    GROUP BY 1, 2) WHERE sup >= 2),
        |tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        |  FROM pp e1
        |  JOIN pp e2 ON e2.a = e1.b
        |  JOIN pp e3 ON e3.a = e1.a AND e3.b = e2.b),
        |wg AS (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges
        |  FROM (SELECT v, COUNT(*) AS d FROM
        |          (SELECT a AS v FROM pp UNION ALL SELECT b FROM pp)
        |        GROUP BY v))
        |SELECT n_triangles, n_wedges,
        |  n_triangles * 3.0 / n_wedges AS global_coeff
        |FROM tri, wg""".stripMargin,
    "graph_linkpred" ->
      // full RA-index replay: same support-pruned edge CTE, integer
      // // contributions, NOT EXISTS anti join, same total order
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pp AS (
        |  SELECT a, b FROM (
        |    SELECT x.l_partkey AS a, y.l_partkey AS b,
        |      COUNT(*) AS sup
        |    FROM li x JOIN li y
        |      ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |    GROUP BY 1, 2) WHERE sup >= 2),
        |sym AS (SELECT a AS w, b AS v FROM pp
        |        UNION ALL SELECT b, a FROM pp),
        |deg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS d
        |        FROM sym GROUP BY 1),
        |adj AS (SELECT s.w, s.v, 1000000 // d.d AS contrib
        |        FROM sym s JOIN deg d ON s.w = d.w),
        |wed AS (SELECT x.v AS a, y.v AS b, x.contrib
        |        FROM adj x JOIN adj y ON x.w = y.w AND x.v < y.v),
        |sc AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_common,
        |         CAST(SUM(contrib) AS BIGINT) AS ra_score
        |       FROM wed GROUP BY 1, 2)
        |SELECT a, b, n_common, ra_score FROM sc
        |WHERE NOT EXISTS
        |  (SELECT 1 FROM pp WHERE pp.a = sc.a AND pp.b = sc.b)
        |ORDER BY ra_score DESC, a, b LIMIT 100""".stripMargin,
    "graph_item_cf" ->
      // same support-pruned pair counts; the cos² ppm law in HUGEINT
      // (// is floor division — matches the decimal floor), same
      // (cos2_ppm desc, sup desc, neighbor) rank order
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |ic AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM li GROUP BY 1),
        |pr AS (SELECT x.pk AS a, y.pk AS b,
        |    CAST(COUNT(*) AS BIGINT) AS sup
        |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |sym AS (SELECT a, b, sup FROM pr
        |  UNION ALL SELECT b, a, sup FROM pr),
        |sc AS (SELECT sym.a AS item, sym.b AS neighbor, sup,
        |    ia.c AS c_item, ib.c AS c_neighbor,
        |    CAST(CAST(sup AS HUGEINT) * sup * 1000000
        |      // (ia.c * ib.c) AS BIGINT) AS cos2_ppm
        |  FROM sym JOIN ic ia ON sym.a = ia.pk
        |           JOIN ic ib ON sym.b = ib.pk),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY item
        |    ORDER BY cos2_ppm DESC, sup DESC, neighbor) AS rank
        |  FROM sc)
        |SELECT item, neighbor, sup, c_item, c_neighbor, cos2_ppm,
        |  CAST(rank AS INT) AS rank
        |FROM rk WHERE rank <= 5 ORDER BY item, rank""".stripMargin,
    "graph_triangles" ->
      // naive a<b<c replay; the engine's degree-ordered orientation
      // must count the identical triangle set
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pp AS (
        |  SELECT a, b FROM (
        |    SELECT x.l_partkey AS a, y.l_partkey AS b,
        |      COUNT(*) AS sup
        |    FROM li x JOIN li y
        |      ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |    GROUP BY 1, 2) WHERE sup >= 2),
        |nodes AS (SELECT a AS v FROM pp UNION SELECT b FROM pp)
        |SELECT
        |  CAST((SELECT COUNT(*) FROM pp e1
        |        JOIN pp e2 ON e2.a = e1.b
        |        JOIN pp e3 ON e3.a = e1.a AND e3.b = e2.b) AS BIGINT)
        |    AS n_triangles,
        |  CAST((SELECT COUNT(*) FROM pp) AS BIGINT) AS n_edges,
        |  CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_nodes""".stripMargin,
    "p_snapshot" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        | o_orderdate, o_orderpriority,
        | CAST(o_orderstatus = 'F' AS INT) AS is_fulfilled,
        | CAST(NULL AS VARCHAR) AS geolocation,
        | DATE '2024-01-01' AS snapshot_date
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_acctbal > 0 AND c_name IS NOT NULL)
        |ORDER BY o_orderkey""".stripMargin,
    "s1_scan_project" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey",
    "f1_digit_filter" ->
      """SELECT c_custkey, id_str, CAST(id_str AS BIGINT) AS id_num
        |FROM (SELECT c_custkey,
        |        trim(regexp_extract(c_name, '#([0-9]+)$', 1)) AS id_str
        |      FROM customer)
        |WHERE id_str IS NOT NULL AND regexp_matches(id_str, '^[0-9]+$')
        |ORDER BY c_custkey""".stripMargin,
    "s3_full_dump" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        | CAST(n_nationkey < 12 AS INT) AS is_low_key
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "j2_left_enrich" ->
      """SELECT c.c_custkey, c.c_name,
        | COALESCE(r.n_orders_2001, 0) AS n_orders_2001,
        | COALESCE(r.spend_2001, 0.0) AS spend_2001,
        | COALESCE(r.last_status, 'Not_Found') AS last_status
        |FROM customer c
        |LEFT JOIN (SELECT o_custkey,
        |        CAST(COUNT(*) AS BIGINT) AS n_orders_2001,
        |        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |          AS spend_2001,
        |        MAX(o_orderstatus) AS last_status
        |      FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
        |      GROUP BY o_custkey) r
        |  ON c.c_custkey = r.o_custkey
        |ORDER BY c.c_custkey""".stripMargin,
    "j3_join_revenue" ->
      """SELECT c_mktsegment, CAST(year(o_orderdate) AS INT) AS order_year,
        | CAST(SUM(CAST(order_revenue AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders
        |JOIN (SELECT l_orderkey,
        |        CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |          AS DECIMAL(18,6))) AS DOUBLE) AS order_revenue
        |      FROM lineitem GROUP BY l_orderkey) lo
        |  ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "j_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2001-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "j4_promo_revenue" ->
      """SELECT p_brand,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |   THEN l_extendedprice * (1 - l_discount) ELSE 0 END
        |   AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_items,
        | CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |   THEN l_extendedprice * (1 - l_discount) ELSE 0 END
        |   AS DECIMAL(18,6))) AS DOUBLE) /
        |   CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |     AS DECIMAL(18,6))) AS DOUBLE) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j5_local_supplier" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN orders ON c_custkey = o_custkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND s_nationkey = c_nationkey
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "j03_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |JOIN lineitem ON o_orderkey = l_orderkey
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "j04_priority_check" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate >= TIMESTAMP '1996-04-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j06_forecast_revenue" ->
      """SELECT
        | CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
        |   AS DOUBLE) AS revenue_delta,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "j7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS INT) AS l_year,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM supplier
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  AND n1.n_name IN ('NATION_1', 'NATION_2')
        |JOIN lineitem ON s_suppkey = l_suppkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  AND n2.n_name IN ('NATION_1', 'NATION_2')
        |WHERE n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "j8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        | CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_3'
        |   THEN l_extendedprice * (1 - l_discount) ELSE 0 END
        |   AS DECIMAL(18,6))) AS DOUBLE) AS nation_volume,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS total_volume,
        | CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_3'
        |   THEN l_extendedprice * (1 - l_discount) ELSE 0 END
        |   AS DECIMAL(18,6))) AS DOUBLE) /
        |   CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |     AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN orders ON l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE EXISTS (SELECT 1 FROM nation cn JOIN region
        |    ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  WHERE c_nationkey = cn.n_nationkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |JOIN lineitem ON o_orderkey = l_orderkey AND l_returnflag = 'R'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "j13_order_histogram" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey,
        |        CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey
        |        AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "j19_disjunctive_revenue" ->
      """SELECT p_brand,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "mv_summary_rewrite" ->
      // computed from the RAW fact: a green row proves the optimizer's
      // summary rewrite returns exactly what the fact scan would
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |   AS sum_base_price,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
        |   AS avg_qty,
        | CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "mv_incremental_refresh" ->
      // full month-grain recompute from the raw fact: a green row
      // proves initial-load + merged-delta partials equal the direct
      // aggregate, including the month straddling the 1998-06-15
      // cutoff (merged, not appended)
      """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |   AS sum_base_price,
        | CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "mv_join_delta" ->
      // full O_new ⋈ C_new recompute: a green row proves the
      // retract ∪ re-derive ∪ insert delta algebra lands on exactly
      // the recomputed join view (dimension UPDATE included)
      """WITH cnew AS (SELECT c_custkey,
        |  CASE WHEN c_custkey % 97 = 0 THEN 'PROMOTED'
        |       ELSE c_mktsegment END AS c_mktsegment
        | FROM customer)
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |   AS revenue
        |FROM orders JOIN cnew ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j09_product_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2
        |ORDER BY n_name, o_year DESC""".stripMargin,
    "j12_shipmode_priority" ->
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j02_min_cost_supplier" ->
      // textbook CORRELATED form — the min re-runs per outer row in
      // the SQL; Spark's decorrelated window plan must match it
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, p_type,
        |    CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,6)))
        |      AS DOUBLE) AS supply_cost
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |    AND p_type = 'ECONOMY' AND p_size < 10
        |  GROUP BY 1, 2, 3),
        |eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |    AND r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey,
        |  p_type, supply_cost
        |FROM ps JOIN eu ON l_suppkey = s_suppkey
        |WHERE supply_cost = (
        |  SELECT MIN(ps2.supply_cost)
        |  FROM ps ps2 JOIN eu eu2 ON ps2.l_suppkey = eu2.s_suppkey
        |  WHERE ps2.l_partkey = ps.l_partkey)
        |ORDER BY p_partkey, s_name""".stripMargin,
    "j11_important_parts" ->
      // decimal threshold (part*10000 > total) on both sides; the
      // HAVING subquery re-aggregates the fact — Spark's plan reads
      // the materialized per-part table instead (same values)
      """SELECT l_partkey AS p_partkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
        |    AS DOUBLE) AS part_value
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |  AND n_name = 'NATION_7'
        |GROUP BY 1
        |HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 10000 > (
        |  SELECT SUM(CAST(l2.l_extendedprice AS DECIMAL(18,6)))
        |  FROM lineitem l2
        |  JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
        |  JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    AND n2.n_name = 'NATION_7')
        |ORDER BY part_value DESC, p_partkey""".stripMargin,
    "j16_supplier_count" ->
      """SELECT p_brand, p_type, p_size,
        | COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#13'
        |  AND p_size IN (1, 7, 14, 23, 30, 36, 42, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 1500)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "j20_dominant_supplier" ->
      // correlated scalar inside HAVING (this part's 1998 total);
      // the part prune inside the IN chain is implied by the
      // correlation equality, so the inner query needs no p_name test
      """SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_name LIKE 'cold%')
        |    AND l_shipdate >= TIMESTAMP '1998-01-01'
        |    AND l_shipdate < TIMESTAMP '1999-01-01'
        |  GROUP BY l_partkey, l_suppkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) * 2 > (
        |    SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
        |    FROM lineitem l2
        |    WHERE l2.l_partkey = lineitem.l_partkey
        |      AND l2.l_shipdate >= TIMESTAMP '1998-01-01'
        |      AND l2.l_shipdate < TIMESTAMP '1999-01-01'))
        |ORDER BY s_suppkey""".stripMargin,
    "j15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "j17_small_qty_revenue" ->
      // the threshold compare is the EXACT rearranged integer form
      // (qty*5*n < sum_qty in decimal) on both sides — see
      // Subqueries.q17SmallQtyRevenue
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part
        |    ON l_partkey = p_partkey AND p_brand = 'Brand#23'),
        |pp AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty,
        |    COUNT(*) AS n_lines
        |  FROM li GROUP BY 1)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
        |    AS DOUBLE) / 7.0 AS avg_yearly,
        |  CAST(COUNT(*) AS BIGINT) AS n_small_lines
        |FROM li JOIN pp USING (l_partkey)
        |WHERE CAST(l_quantity AS DECIMAL(18,6)) * 5 * n_lines
        |  < sum_qty""".stripMargin,
    "j18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |      AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
        |    AS DOUBLE) > 120)
        |SELECT o_orderkey, o_orderdate, o_totalprice, sum_qty,
        |  c_custkey, c_name
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "j21_sole_failing_supplier" ->
      """WITH pos AS (
        |  SELECT l_orderkey, l_suppkey,
        |    MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS failed
        |  FROM lineitem GROUP BY 1, 2),
        |po AS (
        |  SELECT l_orderkey FROM pos GROUP BY 1
        |  HAVING COUNT(*) > 1 AND SUM(failed) = 1)
        |SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM pos
        |JOIN po USING (l_orderkey)
        |JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE failed = 1
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey""".stripMargin,
    "j22_idle_customers" ->
      """WITH st AS (
        |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS sum_bal,
        |    COUNT(*) AS n_pos
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_custs,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
        |    AS total_bal
        |FROM customer, st
        |WHERE CAST(c_acctbal AS DECIMAL(18,6)) * n_pos > sum_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s2_jdbc_source" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        |WHERE s_acctbal > 0 AND s_nationkey IN
        |  (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
        |ORDER BY s_suppkey""".stripMargin,
    "s2_jdbc_agg_pushdown" ->
      // the rollup the DATABASE computes under aggregate pushdown,
      // restated over the parquet seed
      """SELECT s_nationkey,
        | CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS bal,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | MIN(s_acctbal) AS lo,
        | MAX(s_acctbal) AS hi
        |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_infer_csv" ->
      """SELECT c_custkey, c_name,
        | CAST(c_acctbal > 0 AS INT) AS is_positive,
        | CAST(c_acctbal AS DOUBLE) AS c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "sink_orc_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier WHERE s_acctbal > 0
        |ORDER BY s_suppkey""".stripMargin,
    "sink_xml_roundtrip" ->
      """SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations,
        | MAX(n_name) AS max_name
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_multi_format" ->
      // four format arms of the same table: 4x the rows per region,
      // the same distinct nation keys
      """SELECT n_regionkey, CAST(4 * COUNT(*) AS BIGINT) AS n_rows,
        | CAST(COUNT(DISTINCT n_nationkey) AS BIGINT) AS n_nations
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin,
    "a1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |   AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        |   AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
        |   AS avg_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |   / COUNT(*) AS avg_price,
        | CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a1_explode_sum" ->
      """SELECT event_type AS metric,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS metric_sum,
        | CAST(COUNT(*) AS BIGINT) AS n_points
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a2_pivot_daily" ->
      """SELECT CAST(ts AS DATE) AS day,
        | CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
        |   AS click,
        | CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
        |   AS error,
        | CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
        |   AS purchase,
        | CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT)
        |   AS signup,
        | CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
        |   AS view,
        | CAST(COUNT(CASE WHEN event_type IN
        |   ('click','error','purchase','signup','view') THEN 1 END)
        |   AS BIGINT) AS total_events,
        | CAST(COUNT(CASE WHEN event_type IN ('click','purchase') THEN 1 END)
        |   AS BIGINT) AS total_engagement
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a3_count_if" ->
      """SELECT user_id,
        | CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
        |   AS n_click,
        | CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
        |   AS n_error,
        | CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a4_argmax" ->
      """SELECT o_custkey, o_orderdate AS last_orderdate,
        | o_orderkey AS last_orderkey
        |FROM (SELECT o_custkey, o_orderdate, o_orderkey,
        |        ROW_NUMBER() OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "a5_count_gate" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS input_rows,
        | CAST(COUNT(*) AS BIGINT) AS output_rows,
        | CAST(1 AS INT) AS gate_passed
        |FROM lineitem""".stripMargin,
    "a6_daily_counts" ->
      """SELECT CAST(ts AS DATE) AS day,
        | CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a7_exists_flag" ->
      """SELECT user_id,
        | CASE WHEN MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
        |   THEN 'Yes' ELSE 'No' END AS has_purchase,
        | CASE WHEN MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) = 1
        |   THEN 'Yes' ELSE 'No' END AS has_error,
        | CAST(COUNT(*) AS BIGINT) AS total_event_count
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a8_round_avg" ->
      """SELECT c_nationkey,
        | ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
        |   / COUNT(*), 1) AS avg_acctbal,
        | CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_kmv_overlap" ->
      // k=16384 exceeds every test sf's distinct-customer count, so
      // the sketch is in its exact regime and the oracle demands the
      // true distinct counts and the true intersection
      """SELECT
        | CAST(count(DISTINCT CASE WHEN o_orderpriority = '1-URGENT'
        |   THEN o_custkey END) AS BIGINT) AS n_urgent,
        | CAST(count(DISTINCT CASE WHEN o_orderpriority = '2-HIGH'
        |   THEN o_custkey END) AS BIGINT) AS n_high,
        | CAST(count(DISTINCT CASE WHEN o_orderpriority IN
        |   ('1-URGENT', '2-HIGH') THEN o_custkey END) AS BIGINT)
        |   AS n_union,
        | (SELECT CAST(count(*) AS BIGINT) FROM
        |   (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |    INTERSECT
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'))
        |   AS n_both
        |FROM orders""".stripMargin,
    "agg_weighted_sample" ->
      // replays the Efraimidis–Spirakis keys verbatim: u is a Knuth
      // multiplicative hash in plain integer arithmetic, so both
      // engines derive the IDENTICAL sample; rank-over-key window =
      // the aggregate's top-k (ties impossible: u is injective for
      // id < 2^31 — the 2^31 pre-mask mirrors the Spark side's
      // overflow guard so both engines multiply in BIGINT range)
      """WITH keyed AS (
        |  SELECT event_type, event_id,
        |    ln((CAST(((event_id % 2147483648) * 2654435761)
        |          % 4294967296 AS DOUBLE) + 1.0)
        |        / 4294967297.0) / greatest("value", 1e-6) AS es_key
        |  FROM events),
        |ranked AS (
        |  SELECT event_type, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY es_key DESC, event_id) AS rk
        |  FROM keyed)
        |SELECT event_type, CAST(rk AS BIGINT) AS rk, event_id
        |FROM ranked WHERE rk <= 20
        |ORDER BY event_type, rk""".stripMargin,
    "agg_cms_pointq" ->
      // exact probe counts replayed; est_ok is the CMS guarantee
      // (est ≥ true always; est ≤ true + ceil(ε·N) only with
      // confidence 0.99 — it HAPPENS to hold for every probe under
      // the fixed seed 42 on this data, which is what makes the
      // literal-true oracle legitimate; changing eps/seed/fixtures
      // can legitimately flip a probe, and CmsPointQuerySpec asserts
      // the same inequality per probe with a failure message that
      // explains the w.h.p. caveat rather than reading as a wrong
      // answer)
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact,
        |  TRUE AS est_ok
        |FROM events WHERE user_id % 13 = 0
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_decay_halflife" ->
      // same dyadic 1/256th-unit integer sums; the only float ops are
      // the two post-aggregate divisions (/2^8 exact, /100 rounded
      // once — identical IEEE in both engines)
      """WITH nw AS (SELECT MAX(CAST(ts AS DATE)) AS now_day FROM events),
        |w AS (SELECT event_type,
        |   (CAST(1 AS BIGINT) << CAST(8 - LEAST(
        |      date_diff('day', CAST(ts AS DATE), now_day) // 7, 8)
        |      AS INT)) AS u,
        |   CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events, nw)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(u) AS BIGINT) AS decayed_units,
        |  CAST(SUM(cents * u) AS BIGINT) AS decayed_cent_units,
        |  CAST(SUM(u) AS BIGINT) / 256.0 AS decayed_count,
        |  CAST(SUM(cents * u) AS BIGINT) / 256.0 / 100.0 AS decayed_value
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_cooccurrence" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        | CAST(count(*) AS BIGINT) AS n_users
        |FROM ut a JOIN ut b ON a.user_id = b.user_id
        |  AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "agg_median_scale" ->
      // rank-based lower median: the value at rank ceil(n/2)
      """SELECT v AS median_price, n AS n_rows FROM (
        |  SELECT o_totalprice AS v,
        |    row_number() OVER (ORDER BY o_totalprice) AS rn,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM orders)
        |WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)""".stripMargin,
    "w_topk" ->
      """SELECT o_custkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |   AS total_spend,
        | CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY 1
        |ORDER BY total_spend DESC, o_custkey LIMIT 10""".stripMargin,
    "w_topk_group" ->
      // the window formulation the aggregator replaces — identical
      // rows, including the o_orderkey tie-break
      """SELECT o_orderpriority, rk,
        | CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderkey
        |FROM (SELECT o_orderpriority, o_totalprice, o_orderkey,
        |   row_number() OVER (PARTITION BY o_orderpriority
        |     ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders)
        |WHERE rk <= 3 ORDER BY 1, 2""".stripMargin,
    "w_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | CAST(ROW_NUMBER() OVER w AS INT) AS order_seq,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
        |     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_seq""".stripMargin,
    "set_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "set_distinct" ->
      "SELECT DISTINCT o_orderpriority FROM orders ORDER BY 1",
    "set_rollup" ->
      """SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "set_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "dq_observed_audit" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_input,
        | CAST(COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT)
        |   AS n_nonpos_price,
        | CAST(COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END)
        |   AS BIGINT) AS n_bad_status,
        | CAST(COUNT(CASE WHEN o_totalprice > 0 THEN 1 END) AS BIGINT)
        |   AS n_output
        |FROM orders""".stripMargin,
    "dq_expectations" ->
      """WITH r AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_checked,
        |    CAST(COUNT(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE)
        |      THEN 1 END) AS BIGINT) AS v1,
        |    CAST(COUNT(CASE WHEN NOT COALESCE(o_orderdate IS NOT NULL,
        |      FALSE) THEN 1 END) AS BIGINT) AS v2,
        |    CAST(COUNT(CASE WHEN NOT COALESCE(o_orderstatus IN
        |      ('O','F','P'), FALSE) THEN 1 END) AS BIGINT) AS v3
        |  FROM orders),
        |fk AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_checked,
        |    CAST(COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END)
        |      AS BIGINT) AS v
        |  FROM orders o LEFT JOIN customer c
        |    ON o.o_custkey = c.c_custkey)
        |SELECT rule, n_checked, n_violations,
        |  CAST(n_violations = 0 AS INT) AS pass
        |FROM (
        |  SELECT 'totalprice_positive' AS rule, n_checked,
        |    v1 AS n_violations FROM r
        |  UNION ALL SELECT 'orderdate_not_null', n_checked, v2 FROM r
        |  UNION ALL SELECT 'status_in_domain', n_checked, v3 FROM r
        |  UNION ALL SELECT 'custkey_resolves', n_checked, v FROM fk)
        |ORDER BY rule""".stripMargin,
    "dq_benford" ->
      // same literal ppm curve, digit from the exact cents string,
      // same integer share law and halved abs-sum distance
      """WITH e(digit, benford_ppm) AS (VALUES
        |  (1, 301030), (2, 176091), (3, 124939), (4, 96910),
        |  (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757)),
        |c AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM c),
        |sh AS (SELECT e.digit, COALESCE(c.n, 0) AS n,
        |    CAST(e.benford_ppm AS BIGINT) AS benford_ppm,
        |    COALESCE(c.n, 0) * 1000000 // t.n_total AS observed_ppm
        |  FROM e LEFT JOIN c USING (digit) CROSS JOIN t),
        |tv AS (SELECT CAST(SUM(abs(observed_ppm - benford_ppm)) // 2
        |    AS BIGINT) AS tvd_vs_benford_ppm FROM sh)
        |SELECT sh.digit, sh.n, sh.benford_ppm, sh.observed_ppm,
        |  tv.tvd_vs_benford_ppm
        |FROM sh CROSS JOIN tv ORDER BY sh.digit""".stripMargin,
    "dq_profile_drift" ->
      // one conditional-aggregation block per profiled column (same
      // slice cut, same ppm div law, same literal thresholds), unioned
      """WITH src AS (SELECT o_orderstatus, o_orderpriority, o_custkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT)
        |      AS o_totalprice_cents,
        |    (o_orderdate < TIMESTAMP '1996-01-01') AS in_a
        |  FROM orders),
        |c1 AS (SELECT o_orderstatus AS v,
        |    SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS cnt_a,
        |    SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS cnt_b
        |  FROM src GROUP BY 1),
        |c2 AS (SELECT o_orderpriority AS v,
        |    SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS cnt_a,
        |    SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS cnt_b
        |  FROM src GROUP BY 1),
        |c3 AS (SELECT o_custkey AS v,
        |    SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS cnt_a,
        |    SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS cnt_b
        |  FROM src GROUP BY 1),
        |c4 AS (SELECT o_totalprice_cents AS v,
        |    SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS cnt_a,
        |    SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS cnt_b
        |  FROM src GROUP BY 1),
        |u AS (
        |  SELECT 'o_orderstatus' AS column_name,
        |    CAST(SUM(cnt_a) AS BIGINT) AS n_a,
        |    CAST(SUM(cnt_b) AS BIGINT) AS n_b,
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_a END), 0)
        |      AS BIGINT) AS null_a,
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_b END), 0)
        |      AS BIGINT) AS null_b,
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_a > 0 THEN 1
        |      END) AS BIGINT) AS ndv_a,
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_b > 0 THEN 1
        |      END) AS BIGINT) AS ndv_b FROM c1
        |  UNION ALL
        |  SELECT 'o_orderpriority', CAST(SUM(cnt_a) AS BIGINT),
        |    CAST(SUM(cnt_b) AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_a END), 0)
        |      AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_b END), 0)
        |      AS BIGINT),
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_a > 0 THEN 1
        |      END) AS BIGINT),
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_b > 0 THEN 1
        |      END) AS BIGINT) FROM c2
        |  UNION ALL
        |  SELECT 'o_custkey', CAST(SUM(cnt_a) AS BIGINT),
        |    CAST(SUM(cnt_b) AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_a END), 0)
        |      AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_b END), 0)
        |      AS BIGINT),
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_a > 0 THEN 1
        |      END) AS BIGINT),
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_b > 0 THEN 1
        |      END) AS BIGINT) FROM c3
        |  UNION ALL
        |  SELECT 'o_totalprice_cents', CAST(SUM(cnt_a) AS BIGINT),
        |    CAST(SUM(cnt_b) AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_a END), 0)
        |      AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_b END), 0)
        |      AS BIGINT),
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_a > 0 THEN 1
        |      END) AS BIGINT),
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_b > 0 THEN 1
        |      END) AS BIGINT) FROM c4),
        |d AS (SELECT column_name, n_a, n_b,
        |    null_a * 1000000 // greatest(n_a, 1) AS null_ppm_a,
        |    null_b * 1000000 // greatest(n_b, 1) AS null_ppm_b,
        |    ndv_a, ndv_b,
        |    ndv_a * 1000000 // greatest(n_a, 1) AS ndv_ppm_a,
        |    ndv_b * 1000000 // greatest(n_b, 1) AS ndv_ppm_b
        |  FROM u)
        |SELECT column_name, n_a, n_b, null_ppm_a, null_ppm_b,
        |  null_ppm_b - null_ppm_a AS null_delta_ppm, ndv_a, ndv_b,
        |  ndv_ppm_b - ndv_ppm_a AS ndv_delta_ppm,
        |  (abs(null_ppm_b - null_ppm_a) > 10000 OR
        |   abs(ndv_ppm_b - ndv_ppm_a) > 50000) AS drift_flag
        |FROM d ORDER BY column_name""".stripMargin,
    "dq_late_arrivals" ->
      // same simulated delivery order (multiplicative shuffle), same
      // running max, exact micros diffs, same ceiling-rank p95 law
      """WITH late AS (SELECT event_type, event_id,
        |    MAX(epoch_us(ts)) OVER (PARTITION BY event_type
        |      ORDER BY (event_id * 2654435761) % 100000000, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) - epoch_us(ts) AS late_us
        |  FROM events),
        |r AS (SELECT event_type, late_us,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY late_us, event_id) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS n_events,
        |    CAST(MAX(late_us) OVER (PARTITION BY event_type)
        |      AS BIGINT) AS max_late_us
        |  FROM late)
        |SELECT event_type, n_events, max_late_us,
        |  CAST(late_us AS BIGINT) AS p95_late_us
        |FROM r WHERE rk = (n_events * 95 + 99) // 100
        |ORDER BY event_type""".stripMargin,
    "dq_dist_drift" ->
      // same ppm share law (integer //) and the same halved abs-sum
      """WITH c AS (SELECT o_orderpriority AS bin,
        |    CAST(COUNT(*) FILTER (o_orderdate < TIMESTAMP '1996-01-01')
        |      AS BIGINT) AS cnt_a,
        |    CAST(COUNT(*) FILTER (o_orderdate >= TIMESTAMP '1996-01-01')
        |      AS BIGINT) AS cnt_b
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS n_a,
        |    CAST(SUM(cnt_b) AS BIGINT) AS n_b FROM c),
        |sh AS (SELECT bin, cnt_a, cnt_b,
        |    cnt_a * 1000000 // t.n_a AS p_ppm,
        |    cnt_b * 1000000 // t.n_b AS q_ppm
        |  FROM c CROSS JOIN t),
        |tv AS (SELECT CAST(SUM(abs(p_ppm - q_ppm)) / 2 AS BIGINT)
        |    AS tvd_ppm FROM sh)
        |SELECT sh.bin, sh.cnt_a, sh.cnt_b, sh.p_ppm, sh.q_ppm,
        |  tv.tvd_ppm
        |FROM sh CROSS JOIN tv ORDER BY sh.bin""".stripMargin,
    "dq_order_violations" ->
      // same conditional-min timeline and classification
      """WITH f AS (SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN ts END)
        |      AS first_signup,
        |    MIN(CASE WHEN event_type = 'purchase' THEN ts END)
        |      AS first_purchase
        |  FROM events WHERE event_type IN ('signup', 'purchase')
        |  GROUP BY 1),
        |p AS (SELECT * FROM f WHERE first_purchase IS NOT NULL),
        |fl AS (SELECT user_id, first_signup, first_purchase,
        |    CASE WHEN first_signup IS NULL THEN 'no_signup'
        |         WHEN first_purchase < first_signup
        |           THEN 'purchase_before_signup' END AS violation
        |  FROM p),
        |cn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_purchasers,
        |    CAST(COUNT(*) FILTER (violation IS NOT NULL) AS BIGINT)
        |      AS n_violations FROM fl)
        |SELECT fl.user_id, fl.first_signup, fl.first_purchase,
        |  fl.violation, cn.n_purchasers, cn.n_violations
        |FROM fl CROSS JOIN cn WHERE fl.violation IS NOT NULL
        |ORDER BY fl.user_id""".stripMargin,
    "dq_key_discovery" ->
      // one group-count pass per candidate, re-aggregated to
      // (groups, rows, worst multiplicity); integer-only
      """WITH g1 AS (SELECT COUNT(*) AS cnt FROM orders
        |  GROUP BY o_orderkey),
        |g2 AS (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_custkey),
        |g3 AS (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderdate),
        |g4 AS (SELECT COUNT(*) AS cnt FROM orders
        |  GROUP BY o_custkey, o_orderdate),
        |g5 AS (SELECT COUNT(*) AS cnt FROM orders
        |  GROUP BY o_custkey, o_orderdate, o_orderstatus)
        |SELECT 'o_orderkey' AS candidate,
        |  CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(MAX(cnt) AS BIGINT) AS max_dup, MAX(cnt) = 1 AS is_key
        |FROM g1
        |UNION ALL SELECT 'o_custkey', CAST(SUM(cnt) AS BIGINT),
        |  CAST(COUNT(*) AS BIGINT), CAST(MAX(cnt) AS BIGINT),
        |  MAX(cnt) = 1 FROM g2
        |UNION ALL SELECT 'o_orderdate', CAST(SUM(cnt) AS BIGINT),
        |  CAST(COUNT(*) AS BIGINT), CAST(MAX(cnt) AS BIGINT),
        |  MAX(cnt) = 1 FROM g3
        |UNION ALL SELECT 'o_custkey+o_orderdate',
        |  CAST(SUM(cnt) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(MAX(cnt) AS BIGINT), MAX(cnt) = 1 FROM g4
        |UNION ALL SELECT 'o_custkey+o_orderdate+o_orderstatus',
        |  CAST(SUM(cnt) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(MAX(cnt) AS BIGINT), MAX(cnt) = 1 FROM g5
        |ORDER BY candidate""".stripMargin,
    "dq_volume_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1),
        |st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n_events) AS BIGINT) AS s1,
        |    CAST(SUM(n_events * n_events) AS BIGINT) AS s2
        |  FROM daily)
        |SELECT day, n_events, s1 / k AS mean_events,
        |  CAST((n_events - s1 / k) * (n_events - s1 / k) >
        |    4.0 * (s2 / k - (s1 / k) * (s1 / k)) AS INT) AS is_anomaly
        |FROM daily, st ORDER BY day""".stripMargin,
    "sink_zorder" ->
      """SELECT CAST(ts AS DATE) AS day,
        | CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_funnel" ->
      """WITH su AS (SELECT user_id, min(ts) AS ts_signup FROM events
        |    WHERE event_type = 'signup' GROUP BY user_id),
        |cl AS (SELECT e.user_id, min(e.ts) AS ts_click FROM events e
        |    JOIN su ON e.user_id = su.user_id AND e.ts > su.ts_signup
        |    WHERE e.event_type = 'click' GROUP BY e.user_id),
        |pu AS (SELECT e.user_id, min(e.ts) AS ts_purchase FROM events e
        |    JOIN cl ON e.user_id = cl.user_id AND e.ts > cl.ts_click
        |    WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT 1 AS stage_ord, 'signup' AS stage,
        |  CAST(count(*) AS BIGINT) AS users FROM su
        |UNION ALL SELECT 2 AS stage_ord, 'click_after_signup' AS stage,
        |  CAST(count(*) AS BIGINT) AS users FROM cl
        |UNION ALL SELECT 3 AS stage_ord, 'purchase_after_click' AS stage,
        |  CAST(count(*) AS BIGINT) AS users FROM pu
        |ORDER BY stage_ord""".stripMargin,
    "agg_cohort" ->
      """WITH w AS (SELECT o_custkey,
        |    date_trunc('month', CAST(o_orderdate AS DATE)) AS omonth,
        |    min(date_trunc('month', CAST(o_orderdate AS DATE)))
        |      OVER (PARTITION BY o_custkey) AS cohort
        |  FROM orders)
        |SELECT cohort,
        |  CAST(date_diff('month', cohort, omonth) AS INTEGER) AS month_offset,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_customers
        |FROM w WHERE date_diff('month', cohort, omonth) <= 6
        |GROUP BY cohort, month_offset
        |ORDER BY cohort, month_offset""".stripMargin,
    "st_moving_median" ->
      // full sketch-path replay: same bins, same 7-day fan-out, same
      // lower-median rank and upper-bin-edge read-off
      """WITH b AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    LEAST(GREATEST(CAST(floor(o_totalprice / 25000.0) AS INTEGER),
        |      0), 63) AS bin,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM b),
        |wb AS (SELECT d.day AS wday, b.bin,
        |    CAST(SUM(b.cnt) AS BIGINT) AS cnt
        |  FROM days d JOIN b ON b.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY 1, 2),
        |c AS (SELECT wday,
        |    CAST(SUM(cnt) OVER (PARTITION BY wday) AS BIGINT) AS n,
        |    bin,
        |    CAST(SUM(cnt) OVER (PARTITION BY wday ORDER BY bin)
        |      AS BIGINT) AS cum
        |  FROM wb WHERE cnt > 0)
        |SELECT wday AS day, n AS n_orders,
        |  (MIN(CASE WHEN cum >= floor(n * 0.5 + 0.5) THEN bin END) + 1)
        |    * CAST(25000.0 AS DOUBLE) AS p50_est
        |FROM c GROUP BY wday, n ORDER BY day""".stripMargin,
    "agg_quantile_rollup" ->
      """WITH b AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
        |      AS scope,
        |    LEAST(GREATEST(CAST(floor(o_totalprice / 25000.0) AS INTEGER),
        |      0), 63) AS bin,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |n AS (SELECT scope, CAST(SUM(cnt) AS BIGINT) AS n_orders
        |  FROM b GROUP BY scope),
        |tb AS (SELECT bin, CAST(SUM(cnt) AS BIGINT) AS cnt
        |  FROM b GROUP BY bin),
        |allb AS (SELECT b.scope, b.bin, b.cnt, n.n_orders
        |    FROM b JOIN n USING (scope)
        |  UNION ALL SELECT 'TOTAL' AS scope, tb.bin, tb.cnt,
        |    (SELECT CAST(SUM(cnt) AS BIGINT) FROM tb) AS n_orders FROM tb),
        |c AS (SELECT scope, n_orders, bin,
        |    CAST(SUM(cnt) OVER (PARTITION BY scope ORDER BY bin) AS BIGINT)
        |      AS cum
        |  FROM allb WHERE cnt > 0)
        |SELECT scope, n_orders,
        |  (MIN(CASE WHEN cum >= floor(n_orders * 0.5 + (1 - 0.5))
        |     THEN bin END) + 1) * CAST(25000.0 AS DOUBLE) AS p50_est,
        |  (MIN(CASE WHEN cum >= floor(n_orders * 0.95 + (1 - 0.95))
        |     THEN bin END) + 1) * CAST(25000.0 AS DOUBLE) AS p95_est
        |FROM c GROUP BY scope, n_orders ORDER BY scope""".stripMargin,
    "j_fuzzy_match" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        |b AS (SELECT name, list_extract(string_split(name, ' '),
        |    len(string_split(name, ' '))) AS block FROM names)
        |SELECT a.name AS name_a, bb.name AS name_b,
        |  CAST(levenshtein(a.name, bb.name) AS INTEGER) AS dist
        |FROM b a JOIN b bb ON a.block = bb.block AND a.name < bb.name
        |WHERE levenshtein(a.name, bb.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
    "sim_random_proj" ->
      """WITH k AS (SELECT CAST(unnest(range(16)) AS INTEGER) AS dim)
        |SELECT e.vec_id, k.dim,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(list_zip(e.embedding, range(len(e.embedding))),
        |      s -> CAST(s[1] AS DOUBLE) *
        |        (1 - 2 * (((((CAST(k.dim AS BIGINT) + 1) * 2654435761
        |            % 1048573 + 1) *
        |          ((CAST(s[2] AS BIGINT) + 1) * 2654435761
        |            % 1048573 + 1)) >> 10) & 1)))),
        |    (a, b) -> a + b) AS val
        |FROM embeddings e CROSS JOIN k
        |ORDER BY vec_id, dim""".stripMargin,
    "w_percent_rank" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |      AS total_spend
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, total_spend,
        |  percent_rank() OVER (ORDER BY total_spend, o_custkey)
        |    AS spend_pct_rank,
        |  cume_dist() OVER (ORDER BY total_spend, o_custkey)
        |    AS spend_cume_dist
        |FROM spend ORDER BY o_custkey""".stripMargin,
    "agg_weighted_avg" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_discount * l_extendedprice AS DECIMAL(18,6)))
        |      AS DOUBLE) /
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |    AS wavg_discount
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "agg_correlation" ->
      """WITH m AS (SELECT l_returnflag,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(xs) AS BIGINT) AS sx, CAST(SUM(ys) AS BIGINT) AS sy,
        |    CAST(SUM(xs * xs) AS BIGINT) AS sxx,
        |    CAST(SUM(ys * ys) AS BIGINT) AS syy,
        |    CAST(SUM(xs * ys) AS BIGINT) AS sxy
        |  FROM (SELECT l_returnflag,
        |      CAST(round(l_discount * 100) AS BIGINT) AS xs,
        |      CAST(round(l_quantity) AS BIGINT) AS ys
        |    FROM lineitem)
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |  sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |    (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS pearson_r,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |  (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 100
        |    AS beta_qty_per_discount
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "dq_agreement_kappa" ->
      // same marker argmax as text_lang_id, then the confusion cells,
      // marginals off the cells, and the rational kappa
      """WITH p AS (SELECT lang AS labeled,
        |    CASE WHEN s_en >= s_zh AND s_en >= s_de THEN 'en'
        |         WHEN s_zh >= s_de THEN 'zh' ELSE 'de' END AS predicted
        |  FROM (SELECT lang,
        |      len(regexp_extract_all(text, '\b(the|a|of)\b')) AS s_en,
        |      len(regexp_extract_all(text, '\b(data|query|row)\b'))
        |        AS s_zh,
        |      len(regexp_extract_all(text, '\b(fast|slow|small)\b'))
        |        AS s_de
        |    FROM documents)),
        |cells AS (SELECT labeled, predicted,
        |    CAST(COUNT(*) AS BIGINT) AS n_cell
        |  FROM p GROUP BY 1, 2),
        |r AS (SELECT labeled, CAST(SUM(n_cell) AS BIGINT) AS n_row
        |  FROM cells GROUP BY 1),
        |c AS (SELECT predicted, CAST(SUM(n_cell) AS BIGINT) AS n_col
        |  FROM cells GROUP BY 1),
        |st AS (SELECT
        |    (SELECT CAST(SUM(n_cell) AS BIGINT) FROM cells) AS n,
        |    (SELECT CAST(COALESCE(SUM(n_cell), 0) AS BIGINT)
        |      FROM cells WHERE labeled = predicted) AS sum_diag,
        |    (SELECT CAST(COALESCE(SUM(n_row * n_col), 0) AS BIGINT)
        |      FROM r JOIN c ON r.labeled = c.predicted) AS sum_rc)
        |SELECT cells.labeled, cells.predicted, n_cell, n_row, n_col,
        |  n, sum_diag,
        |  n * sum_diag - sum_rc AS kappa_num,
        |  n * n - sum_rc AS kappa_den,
        |  CAST(n * sum_diag - sum_rc AS DOUBLE) / (n * n - sum_rc)
        |    AS kappa
        |FROM cells JOIN r USING (labeled) JOIN c USING (predicted), st
        |ORDER BY labeled, predicted""".stripMargin,
    "dq_sample_fit" ->
      // same hash-sample law, same Euclidean-split quotient — plain
      // BIGINT ops on both engines (abs first, so // and % agree)
      """WITH cells AS (SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS o1,
        |    CAST(SUM(CASE WHEN ((event_id % 2147483648)
        |      * 2654435761) % 97 < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS o2
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(SUM(o1) AS BIGINT) AS n1,
        |    CAST(SUM(o2) AS BIGINT) AS n2 FROM cells),
        |sp AS (SELECT event_type, o1, o2, n1, n2,
        |    abs(n2 * o1 - n1 * o2) AS d, o1 + o2 AS m
        |  FROM cells, t),
        |q AS (SELECT event_type, o1, o2, n1, n2,
        |    (d // m) * (d // m) * m + 2 * (d // m) * (d % m)
        |      + (d % m) * (d % m) // m AS term_q
        |  FROM sp),
        |c AS (SELECT CAST(SUM(term_q) AS BIGINT) AS sum_q FROM q)
        |SELECT event_type, o1, o2, n1, n2, term_q, sum_q,
        |  CAST(sum_q AS DOUBLE) / (n1 * n2) AS chi2,
        |  CAST(sum_q AS DOUBLE) / (n1 * n2) < 9.488 AS is_fit
        |FROM q, c ORDER BY event_type""".stripMargin,
    "dq_referential" ->
      """SELECT 'customer->nation' AS fk_edge, CAST(count(*) AS BIGINT)
        |  AS n_orphans FROM customer WHERE c_nationkey IS NOT NULL
        |  AND c_nationkey NOT IN (SELECT n_nationkey FROM nation)
        |UNION ALL
        |SELECT 'lineitem->orders', CAST(count(*) AS BIGINT)
        |  FROM lineitem WHERE l_orderkey IS NOT NULL
        |  AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |UNION ALL
        |SELECT 'nation->region', CAST(count(*) AS BIGINT)
        |  FROM nation WHERE n_regionkey IS NOT NULL
        |  AND n_regionkey NOT IN (SELECT r_regionkey FROM region)
        |UNION ALL
        |SELECT 'orders->customer', CAST(count(*) AS BIGINT)
        |  FROM orders WHERE o_custkey IS NOT NULL
        |  AND o_custkey NOT IN (SELECT c_custkey FROM customer)
        |UNION ALL
        |SELECT 'supplier->nation', CAST(count(*) AS BIGINT)
        |  FROM supplier WHERE s_nationkey IS NOT NULL
        |  AND s_nationkey NOT IN (SELECT n_nationkey FROM nation)
        |ORDER BY fk_edge""".stripMargin,
    "agg_mode" ->
      """SELECT o_orderstatus, mode_priority, n_rows FROM (
        |  SELECT o_orderstatus, o_orderpriority AS mode_priority,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |      ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,
    "dq_outlier_mad" ->
      // pure integer replay: cents, discrete lower medians via
      // rn = (n+1)//2 (integer div on BOTH sides — a double cast
      // truncates in Spark but rounds in DuckDB), integer flag compare
      """WITH e AS (SELECT event_type,
        |    CAST(round("value" * 100) AS BIGINT) AS vc FROM events),
        |m AS (SELECT event_type, vc AS medc FROM (
        |  SELECT event_type, vc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM e)
        |  WHERE rn = (n + 1) // 2),
        |d AS (SELECT e.event_type, abs(vc - medc) AS devc
        |  FROM e JOIN m USING (event_type)),
        |mm AS (SELECT event_type, devc AS madc FROM (
        |  SELECT event_type, devc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY devc) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM d)
        |  WHERE rn = (n + 1) // 2)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |  min(medc) AS med_cents, min(madc) AS mad_cents,
        |  CAST(count(CASE WHEN devc > madc * 3 THEN 1 END) AS BIGINT)
        |    AS n_outliers
        |FROM d JOIN mm USING (event_type) JOIN m USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    "dq_outlier_mad_sketch" ->
      // FULL sketch-path replay: the fixed-bin estimate is
      // deterministic SQL — the upper edge of the exact lower
      // median's bin ((LEAST(v // 250, 255) + 1) * 250, by the
      // cumulative-count identity) — so the oracle re-derives the
      // estimates, the sketch-world deviations, the outlier count
      // AND the within-bin agreement booleans; nothing is a literal
      """WITH e AS (SELECT event_type,
        |    CAST(round("value" * 100) AS BIGINT) AS vc FROM events),
        |m AS (SELECT event_type, vc AS medc FROM (
        |  SELECT event_type, vc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM e)
        |  WHERE rn = (n + 1) // 2),
        |mest AS (SELECT event_type,
        |    (LEAST(medc // 250, 255) + 1) * 250 AS med_est FROM m),
        |d AS (SELECT e.event_type, vc, abs(vc - med_est) AS devc
        |  FROM e JOIN mest USING (event_type)),
        |dm AS (SELECT event_type, devc AS dmed FROM (
        |  SELECT event_type, devc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY devc) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM d)
        |  WHERE rn = (n + 1) // 2),
        |mmest AS (SELECT event_type,
        |    (LEAST(dmed // 250, 255) + 1) * 250 AS mad_est FROM dm),
        |dx AS (SELECT e.event_type, abs(vc - medc) AS devx
        |  FROM e JOIN m USING (event_type)),
        |mx AS (SELECT event_type, devx AS madc FROM (
        |  SELECT event_type, devx,
        |    row_number() OVER (PARTITION BY event_type ORDER BY devx) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM dx)
        |  WHERE rn = (n + 1) // 2)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |  min(med_est) AS med_est_cents, min(mad_est) AS mad_est_cents,
        |  CAST(count(CASE WHEN devc > mad_est * 3 THEN 1 END) AS BIGINT)
        |    AS n_outliers_sketch,
        |  (min(med_est) - min(medc) BETWEEN 1 AND 250) AS med_within_bin,
        |  (abs(min(mad_est) - min(madc)) <= 500) AS mad_within_2bins
        |FROM d JOIN mmest USING (event_type) JOIN m USING (event_type)
        |  JOIN mx USING (event_type) JOIN mest USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    "p_merge_cdc" -> mergeCdcOracle,
    // value-compare classification (the Spark side fingerprints rows;
    // identical classes unless xxhash64 collides)
    "dq_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |n AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM o WHERE o_orderkey % 13 <> 0
        |  UNION ALL
        |  SELECT -(o_orderkey + 1), o_orderstatus, o_totalprice
        |  FROM o WHERE o_orderkey % 17 = 0),
        |c AS (SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |         WHEN n.o_orderkey IS NULL THEN 'removed'
        |         WHEN o.o_orderstatus <> n.o_orderstatus
        |           OR o.o_totalprice <> n.o_totalprice THEN 'changed'
        |         ELSE 'unchanged' END AS change
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT change, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  min(k) AS min_key, max(k) AS max_key
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "set_unpivot" ->
      """SELECT p_partkey, 'p_size' AS metric,
        |  CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
        |ORDER BY p_partkey, metric""".stripMargin,
    "set_union_evolve" ->
      """SELECT o_orderkey, o_totalprice,
        |  CAST(NULL AS VARCHAR) AS o_orderstatus
        |FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, o_orderstatus
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        |ORDER BY o_orderkey""".stripMargin,
    "w_range_frame" ->
      """SELECT event_id, user_id, ts,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY user_id
        |    ORDER BY CAST(epoch(ts) AS BIGINT)
        |    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        |  AS DOUBLE) AS trailing_7d_value
        |FROM events
        |ORDER BY user_id, ts, event_id""".stripMargin,
    // direct aggregation over the SURVIVING rows — the incremental
    // merge must equal it exactly (additive count + decimal sum)
    "p_incremental_agg" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |    AS spend
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        |   OR o_orderkey % 10 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the versioned-table MERGE applies the same change batch, so the
    // same oracle checks the write -> publish -> read round trip
    "sink_versioned_merge" -> mergeCdcOracle,
    "sink_versioned_cdf" ->
      // v2 rebuilt from the deterministic change law, then the same
      // full-outer diff + classification
      """WITH snap AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |changes AS (
        |  SELECT o_orderkey, 'U' AS op, 'R' AS c_status,
        |      o_totalprice + CAST(1000.0 AS DOUBLE) AS c_total
        |    FROM snap WHERE o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, 'D', CAST(NULL AS VARCHAR),
        |      CAST(NULL AS DOUBLE)
        |    FROM snap WHERE o_orderkey % 11 = 0
        |  UNION ALL
        |  SELECT -(o_orderkey + 1), 'I', 'N', CAST(50000.0 AS DOUBLE)
        |    FROM snap WHERE o_orderkey % 13 = 0),
        |merged AS (SELECT COALESCE(s.o_orderkey, c.o_orderkey)
        |      AS o_orderkey,
        |    COALESCE(c.c_status, s.o_orderstatus) AS o_orderstatus,
        |    COALESCE(c.c_total, s.o_totalprice) AS o_totalprice
        |  FROM snap s FULL OUTER JOIN changes c
        |    ON s.o_orderkey = c.o_orderkey
        |  WHERE c.op IS NULL OR c.op <> 'D')
        |SELECT COALESCE(s.o_orderkey, m.o_orderkey) AS o_orderkey,
        |  CASE WHEN s.o_orderkey IS NULL THEN 'insert'
        |       WHEN m.o_orderkey IS NULL THEN 'delete'
        |       ELSE 'update' END AS change_type,
        |  s.o_orderstatus AS old_status, m.o_orderstatus AS new_status,
        |  s.o_totalprice AS old_total, m.o_totalprice AS new_total
        |FROM snap s FULL OUTER JOIN merged m
        |  ON s.o_orderkey = m.o_orderkey
        |WHERE s.o_orderkey IS NULL OR m.o_orderkey IS NULL
        |   OR s.o_orderstatus <> m.o_orderstatus
        |   OR s.o_totalprice <> m.o_totalprice
        |ORDER BY o_orderkey""".stripMargin,
    "sink_versioned_delete" ->
      // the erasure batch removes keys ≡ 3 (mod 10); the post-delete
      // version must equal the surviving predicate over the raw table
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT (c_custkey % 10 = 3)
        |ORDER BY c_custkey""".stripMargin,
    "st_gap_fill" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |  FROM events WHERE value >= 250.0 GROUP BY 1),
        |spine AS (SELECT unnest(generate_series(
        |    (SELECT min(day) FROM daily), (SELECT max(day) FROM daily),
        |    INTERVAL 1 DAY)) AS day)
        |SELECT CAST(spine.day AS DATE) AS day,
        |  COALESCE(daily.n_events, 0) AS n_events,
        |  COALESCE(daily.sum_value, 0.0) AS sum_value
        |FROM spine LEFT JOIN daily ON CAST(spine.day AS DATE) = daily.day
        |ORDER BY day""".stripMargin,
    "agg_rfm" ->
      // rank-window replay of all three rankings + the same integer
      // quintile-of-rank formula
      """WITH base AS (SELECT o_custkey,
        |    CAST((SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
        |      - MAX(CAST(o_orderdate AS DATE)) AS BIGINT) AS recency,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) * 100
        |      AS BIGINT) AS monetary_cents
        |  FROM orders GROUP BY 1),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
        |r AS (SELECT o_custkey,
        |    ROW_NUMBER() OVER (ORDER BY recency, o_custkey) AS rr,
        |    ROW_NUMBER() OVER (ORDER BY frequency DESC, o_custkey) AS fr,
        |    ROW_NUMBER() OVER (ORDER BY monetary_cents DESC, o_custkey)
        |      AS mr
        |  FROM base),
        |sc AS (SELECT o_custkey,
        |    CAST(5 - (rr - 1) * 5 // nn.n AS INT) AS r_score,
        |    CAST(5 - (fr - 1) * 5 // nn.n AS INT) AS f_score,
        |    CAST(5 - (mr - 1) * 5 // nn.n AS INT) AS m_score
        |  FROM r CROSS JOIN nn)
        |SELECT r_score, f_score, m_score,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  MIN(o_custkey) AS min_custkey
        |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "agg_wow_retention" ->
      // same Monday-truncated weeks, self-join on week−7, ppm rate
      """WITH uw AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
        |act AS (SELECT week, CAST(COUNT(*) AS BIGINT) AS n_active
        |  FROM uw GROUP BY 1),
        |ret AS (SELECT c.week, CAST(COUNT(*) AS BIGINT) AS n_retained
        |  FROM uw c JOIN uw p ON p.user_id = c.user_id
        |    AND p.week = c.week - 7
        |  GROUP BY 1)
        |SELECT a.week, a.n_active,
        |  COALESCE(r.n_retained, 0) AS n_retained,
        |  COALESCE(r.n_retained, 0) * 1000000 // a.n_active
        |    AS retention_ppm
        |FROM act a LEFT JOIN ret r USING (week)
        |ORDER BY a.week""".stripMargin,
    "agg_session_paths" ->
      // same micros gap law, session cumsum, 8-event cap, total order
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS us FROM events),
        |l AS (SELECT *, lag(us) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
        |  FROM e),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL
        |      OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM l),
        |se AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM f),
        |ranked AS (SELECT user_id, sess, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, sess
        |      ORDER BY us, event_id) AS rn
        |  FROM se),
        |pa AS (SELECT user_id, sess,
        |    string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM ranked WHERE rn <= 8 GROUP BY 1, 2)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM pa GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    "st_trend" ->
      // triangular day-pair self-join per series, integer sign sum
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1
        |      ELSE 0 END AS sgn
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |agg AS (SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat,
        |    CAST(COUNT(*) AS BIGINT) AS n_pairs
        |  FROM p GROUP BY 1),
        |nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1)
        |SELECT agg.event_type, agg.s_stat, agg.n_pairs, nd.n_days,
        |  CASE WHEN s_stat > 0 THEN 'increasing'
        |       WHEN s_stat < 0 THEN 'decreasing'
        |       ELSE 'none' END AS trend
        |FROM agg JOIN nd USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "st_autocorr" ->
      // same observed-sequence lags and BIGINT moments; the signed
      // square (num/den1)·(|num|/den2) is the sqrt-free IEEE tree
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, 1 AS lag, x, lag(x, 1) OVER
        |    (PARTITION BY event_type ORDER BY day) AS y FROM daily
        |  UNION ALL SELECT event_type, 2, x, lag(x, 2) OVER
        |    (PARTITION BY event_type ORDER BY day) FROM daily
        |  UNION ALL SELECT event_type, 3, x, lag(x, 3) OVER
        |    (PARTITION BY event_type ORDER BY day) FROM daily),
        |m AS (SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM lagged WHERE y IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, CAST(lag AS INT) AS lag, n,
        |  n * sxy - sx * sy AS num, n * sxx - sx * sx AS den1,
        |  n * syy - sy * sy AS den2,
        |  CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0
        |    THEN ((n * sxy - sx * sy) / (n * sxx - sx * sx))
        |       * (abs(n * sxy - sx * sy) / (n * syy - sy * sy))
        |  END AS acf_sq_signed
        |FROM m ORDER BY event_type, lag""".stripMargin,
    "st_seasonality" ->
      // rational chi-square (7·Σo² − n²)/n; weekday = epoch-day mod 7
      // (both engines' dayofweek() disagree on week start — unused)
      """WITH bd AS (SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
        |      AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS n_dow
        |  FROM events GROUP BY 1, 2),
        |bt AS (SELECT event_type, CAST(SUM(n_dow) AS BIGINT) AS n,
        |    CAST(SUM(n_dow * n_dow) AS BIGINT) AS so2
        |  FROM bd GROUP BY 1)
        |SELECT bd.event_type, CAST(dow AS INT) AS dow, n_dow, n,
        |  7 * so2 - n * n AS chi2_num,
        |  (7 * so2 - n * n) / n AS chi2,
        |  (7 * so2 - n * n) / n < 12.592 AS is_uniform
        |FROM bd JOIN bt USING (event_type)
        |ORDER BY event_type, dow""".stripMargin,
    "st_decompose" ->
      // same observed-row 7-window, same per-dow moments off the
      // interior, each double one division of the exact integers
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
        |      AS dow
        |  FROM events GROUP BY 1, 2),
        |tr AS (SELECT event_type, day, dow, x,
        |    CAST(SUM(x) OVER w AS BIGINT) AS trend_sum7,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS n_win
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dt AS (SELECT *, CASE WHEN n_win = 7
        |    THEN 7 * x - trend_sum7 END AS detrend_num FROM tr),
        |se AS (SELECT event_type, dow,
        |    CAST(SUM(detrend_num) AS BIGINT) AS s_num,
        |    CAST(COUNT(*) AS BIGINT) AS s_cnt
        |  FROM dt WHERE detrend_num IS NOT NULL GROUP BY 1, 2)
        |SELECT dt.event_type, dt.day, CAST(dt.dow AS INT) AS dow,
        |  dt.x, dt.trend_sum7, dt.n_win, dt.detrend_num,
        |  se.s_num, se.s_cnt,
        |  CASE WHEN n_win = 7
        |    THEN CAST(trend_sum7 AS DOUBLE) / 7 END AS trend,
        |  CAST(s_num AS DOUBLE) / (7 * s_cnt) AS seasonal,
        |  CAST(s_cnt * detrend_num - s_num AS DOUBLE) / (7 * s_cnt)
        |    AS residual
        |FROM dt LEFT JOIN se
        |  ON dt.event_type = se.event_type AND dt.dow = se.dow
        |ORDER BY dt.event_type, dt.day""".stripMargin,
    "agg_heavy_change" ->
      // same derived mid-point, conditional halves, total order + cut
      """WITH md AS (SELECT MIN(CAST(ts AS DATE)) + 15 AS mid
        |  FROM events),
        |g AS (SELECT user_id,
        |    CAST(SUM(CASE WHEN CAST(ts AS DATE) < mid
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_before,
        |    CAST(SUM(CASE WHEN CAST(ts AS DATE) >= mid
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_after
        |  FROM events, md GROUP BY 1)
        |SELECT user_id, n_before, n_after, n_after - n_before AS delta
        |FROM g ORDER BY abs(n_after - n_before) DESC, user_id
        |LIMIT 20""".stripMargin,
    "agg_pareto" ->
      // same 1e-4-unit revenue (double product is within 1e-7 of the
      // exact 4-decimal integer, so round() recovers it identically),
      // HUGEINT replay of the decimal floor-div ppm law
      """WITH bb AS (SELECT p_brand AS brand,
        |    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
        |      * 10000) AS BIGINT)) AS BIGINT) AS rev_u
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1),
        |t AS (SELECT CAST(SUM(rev_u) AS BIGINT) AS total_u FROM bb),
        |c AS (SELECT brand, rev_u,
        |    CAST(SUM(rev_u) OVER (ORDER BY rev_u DESC, brand
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_u
        |  FROM bb)
        |SELECT brand, rev_u, total_u,
        |  CAST(CAST(rev_u AS HUGEINT) * 1000000 // total_u AS BIGINT)
        |    AS share_ppm,
        |  CAST(CAST(cum_u AS HUGEINT) * 1000000 // total_u AS BIGINT)
        |    AS cum_ppm,
        |  CAST(CAST(cum_u - rev_u AS HUGEINT) * 1000000 // total_u
        |    AS BIGINT) < 800000 AS in_head
        |FROM c, t ORDER BY rev_u DESC, brand""".stripMargin,
    "agg_attribution" ->
      // same interval residual, window credit split, and audit columns
      """WITH cl AS (SELECT user_id, ts AS cts, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |pu AS (SELECT user_id, ts AS pts, event_id AS purchase_id
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT pu.purchase_id, cl.click_id, cl.cts
        |  FROM pu JOIN cl USING (user_id)
        |  WHERE cl.cts < pu.pts AND cl.cts >= pu.pts - INTERVAL 7 DAY),
        |cr AS (SELECT purchase_id, cts,
        |    COUNT(*) OVER (PARTITION BY purchase_id) AS n_touch,
        |    ROW_NUMBER() OVER (PARTITION BY purchase_id
        |      ORDER BY cts, click_id) AS rk
        |  FROM t),
        |cc AS (SELECT CAST(cts AS DATE) AS day,
        |    1000000 // n_touch +
        |      CASE WHEN rk = 1 THEN 1000000 % n_touch ELSE 0 END AS credit
        |  FROM cr),
        |na AS (SELECT CAST(COUNT(DISTINCT purchase_id) AS BIGINT)
        |    AS n_attributed FROM t),
        |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases FROM pu)
        |SELECT day, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(SUM(credit) AS BIGINT) AS credit_ppm,
        |  na.n_attributed, np.n_purchases
        |FROM cc CROSS JOIN na CROSS JOIN np
        |GROUP BY day, na.n_attributed, np.n_purchases
        |ORDER BY day""".stripMargin,
    "st_cusum" ->
      // same scaled deviation sum n·prefix − t·total in BIGINTs; the
      // argmax replayed by a rank window (abs desc, day asc)
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, day,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS t,
        |    CAST(SUM(x) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS BIGINT) AS prefix,
        |    CAST(COUNT(*) OVER p AS BIGINT) AS n_days,
        |    CAST(SUM(x) OVER p AS BIGINT) AS total_cents
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day),
        |         p AS (PARTITION BY event_type)),
        |s AS (SELECT event_type, day,
        |    abs(n_days * prefix - t * total_cents) AS a,
        |    n_days, total_cents,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY abs(n_days * prefix - t * total_cents) DESC, day)
        |      AS rk
        |  FROM c)
        |SELECT event_type, day AS change_day, CAST(a AS BIGINT)
        |    AS cusum_peak, n_days, total_cents
        |FROM s WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "st_ewma" ->
      // same left fold over the same 10-day frame list: acc/2 + x is
      // an exponent decrement plus an in-mantissa add, so the doubles
      // are bit-identical across engines (see ewmaDaily's scaladoc);
      // list_prepend(0.0) mirrors Spark aggregate's zero seed
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
        |      AS total_cents
        |  FROM events GROUP BY 1, 2),
        |fr AS (SELECT event_type, day, total_cents,
        |    list(CAST(total_cents AS DOUBLE)) OVER (
        |      PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS frame
        |  FROM daily)
        |SELECT event_type, day, total_cents,
        |  list_reduce(list_prepend(0.0, frame),
        |    (acc, x) -> acc / 2 + x) AS ewma
        |FROM fr ORDER BY event_type, day""".stripMargin,
    "st_locf" ->
      // LOCF replay: same spine, last_value IGNORE NULLS over the
      // same running frame; integer cents → hash-exact fill
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
        |      AS sum_cents
        |  FROM events WHERE "value" >= 250.0 GROUP BY 1, 2),
        |spine AS (SELECT t.event_type, CAST(d.day AS DATE) AS day
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN (SELECT unnest(generate_series(
        |    (SELECT min(CAST(ts AS DATE)) FROM events),
        |    (SELECT max(CAST(ts AS DATE)) FROM events),
        |    INTERVAL 1 DAY)) AS day) d)
        |SELECT s.event_type, s.day,
        |  daily.sum_cents IS NOT NULL AS observed,
        |  last_value(daily.sum_cents IGNORE NULLS) OVER (
        |    PARTITION BY s.event_type ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS sum_cents_filled
        |FROM spine s LEFT JOIN daily
        |  ON s.event_type = daily.event_type AND s.day = daily.day
        |ORDER BY s.event_type, s.day""".stripMargin,
    "p_preference_pairs" ->
      // text_quality's exact score formula, argmax/argmin replayed as
      // rank windows with the same (score, doc_id) tie-breaks
      """WITH scored AS (SELECT doc_id, source,
        |    round(0.5 * (nd / nw) + 0.5 * least(nw / 100.0, 1.0), 4)
        |      AS score
        |  FROM (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |      AS DOUBLE) AS nw,
        |    CAST(len(list_distinct(string_split_regex(trim(lower(text)),
        |      '\s+'))) AS DOUBLE) AS nd
        |   FROM documents)),
        |hi AS (SELECT source, doc_id AS chosen_doc, score AS s_hi FROM (
        |  SELECT source, doc_id, score, row_number() OVER (
        |    PARTITION BY source ORDER BY score DESC, doc_id ASC) AS rn
        |  FROM scored) WHERE rn = 1),
        |lo AS (SELECT source, doc_id AS rejected_doc, score AS s_lo FROM (
        |  SELECT source, doc_id, score, row_number() OVER (
        |    PARTITION BY source ORDER BY score ASC, doc_id ASC) AS rn
        |  FROM scored) WHERE rn = 1)
        |SELECT hi.source, chosen_doc, rejected_doc,
        |  round(s_hi - s_lo, 4) AS score_gap
        |FROM hi JOIN lo ON hi.source = lo.source
        |WHERE s_hi > s_lo ORDER BY hi.source""".stripMargin,
    "p_contrastive_batches" ->
      """SELECT CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY doc_id) - 1 AS BIGINT) AS batch_id,
        |  doc_id, source
        |FROM documents ORDER BY batch_id, source""".stripMargin,
    "agg_sliding_distinct" ->
      // the exact windowed distinct the sketch plane must match in
      // its sub-k regime
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM du)
        |SELECT d.day,
        |  CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_users_7d
        |FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p_surrogate_keys" ->
      // the proxy is bucketing-only: the contract is the plain
      // alphabetical dense rank
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part)
        |SELECT name,
        |  CAST(ROW_NUMBER() OVER (ORDER BY name) AS BIGINT)
        |    AS surrogate_key,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM names) AS n_names
        |FROM names ORDER BY name""".stripMargin,
    "p_backfill_plan" ->
      // same derived manifest (every 7th epoch-day a hole, every 5th
      // a 90% partial load), same full-outer classification, same
      // newest-first rank and 30-day batch cap
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_source,
        |    CAST(SUM(CASE WHEN event_id % 10 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_partial,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS epoch
        |  FROM events GROUP BY 1, 4),
        |man AS (SELECT day,
        |    CASE WHEN epoch % 5 = 0 THEN n_partial ELSE n_source END
        |      AS n_manifest
        |  FROM daily WHERE epoch % 7 <> 3),
        |j AS (SELECT COALESCE(s.day, m.day) AS day, s.n_source,
        |    m.n_manifest,
        |    CASE WHEN s.day IS NULL THEN 'orphan'
        |         WHEN m.day IS NULL THEN 'missing'
        |         WHEN m.n_manifest <> s.n_source THEN 'stale'
        |    END AS status
        |  FROM daily s FULL OUTER JOIN man m ON s.day = m.day),
        |work AS (SELECT day, n_source, n_manifest, status,
        |    CAST(ROW_NUMBER() OVER (ORDER BY day DESC) AS BIGINT)
        |      AS backfill_rank
        |  FROM j WHERE status IS NOT NULL)
        |SELECT day, n_source, n_manifest, status, backfill_rank,
        |  backfill_rank <= 30 AS in_batch
        |FROM work ORDER BY day DESC""".stripMargin,
    "agg_transitions" ->
      """WITH seq AS (SELECT user_id, event_type,
        |    lead(event_type, 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |adj AS (SELECT event_type AS prev_type, next_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_trans
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
        |  FROM adj GROUP BY 1)
        |SELECT a.prev_type, a.next_type, a.n_trans, t.n_from,
        |  CAST(a.n_trans AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p_trans
        |FROM adj a JOIN tot t USING (prev_type)
        |ORDER BY prev_type, next_type""".stripMargin,
    "p_quota_fill" ->
      // two rank windows under the same (n_chars desc, doc_id) total
      // order; the fill quota derives from the actual floor count
      """WITH ranked AS (SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id) AS lr
        |  FROM documents),
        |fl AS (SELECT doc_id, lang, n_chars FROM ranked WHERE lr <= 5),
        |nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_floor FROM fl),
        |rest AS (SELECT doc_id, lang, n_chars,
        |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS grn
        |  FROM ranked WHERE lr > 5)
        |SELECT doc_id, lang, n_chars, 'floor' AS reason FROM fl
        |UNION ALL SELECT doc_id, lang, n_chars, 'fill'
        |FROM rest, nf WHERE grn <= 100 - n_floor
        |ORDER BY doc_id""".stripMargin,
    "p_golden_record" ->
      // same fuzzy-name closure as p_entity_resolution, then every
      // survivorship rule replayed: mode brand (count desc, brand asc),
      // max price, min size
      """WITH RECURSIVE names AS (SELECT DISTINCT p_name AS name FROM part),
        |b AS (SELECT name, list_extract(string_split(name, ' '),
        |    len(string_split(name, ' '))) AS block FROM names),
        |pairs AS (SELECT a.name AS na, bb.name AS nb
        |  FROM b a JOIN b bb ON a.block = bb.block AND a.name < bb.name
        |  WHERE levenshtein(a.name, bb.name) <= 2),
        |edges AS (SELECT na AS src, nb AS dst FROM pairs
        |  UNION ALL SELECT nb, na FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (SELECT src AS name, MIN(dst) AS canonical_name
        |  FROM reach GROUP BY 1),
        |mem AS (SELECT COALESCE(l.canonical_name, p.p_name)
        |      AS canonical_name,
        |    p.p_brand, p.p_size,
        |    CAST(round(p.p_retailprice * 100) AS BIGINT) AS price_cents
        |  FROM part p LEFT JOIN lab l ON p.p_name = l.name),
        |bm AS (SELECT canonical_name, p_brand,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM mem GROUP BY 1, 2),
        |bmx AS (SELECT canonical_name, p_brand AS mode_brand,
        |    cnt AS brand_n FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY canonical_name
        |        ORDER BY cnt DESC, p_brand) AS rk FROM bm)
        |  WHERE rk = 1),
        |g AS (SELECT canonical_name, CAST(COUNT(*) AS BIGINT) AS n_members,
        |    MAX(price_cents) AS max_price_cents, MIN(p_size) AS min_size
        |  FROM mem GROUP BY 1)
        |SELECT g.canonical_name, g.n_members, g.max_price_cents,
        |  g.min_size, x.mode_brand, x.brand_n
        |FROM g JOIN bmx x USING (canonical_name)
        |ORDER BY g.canonical_name""".stripMargin,
    "p_entity_resolution" ->
      """WITH RECURSIVE names AS (SELECT DISTINCT p_name AS name FROM part),
        |b AS (SELECT name, list_extract(string_split(name, ' '),
        |    len(string_split(name, ' '))) AS block FROM names),
        |pairs AS (SELECT a.name AS na, bb.name AS nb
        |  FROM b a JOIN b bb ON a.block = bb.block AND a.name < bb.name
        |  WHERE levenshtein(a.name, bb.name) <= 2),
        |edges AS (SELECT na AS src, nb AS dst FROM pairs
        |  UNION ALL SELECT nb, na FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (SELECT src AS name, MIN(dst) AS canonical_name
        |  FROM reach GROUP BY 1),
        |resolved AS (SELECT n.name,
        |    COALESCE(l.canonical_name, n.name) AS canonical_name
        |  FROM names n LEFT JOIN lab l ON n.name = l.name),
        |cs AS (SELECT canonical_name, CAST(COUNT(*) AS BIGINT)
        |    AS cluster_size
        |  FROM resolved GROUP BY 1)
        |SELECT r.name, r.canonical_name, cs.cluster_size
        |FROM resolved r JOIN cs USING (canonical_name)
        |ORDER BY r.name""".stripMargin,
    "sim_corr_matrix" ->
      // exact BIGINT moments (the sf-bounded form of Spark's
      // DECIMAL(38,0)); the float tail (cast, sqrt, divide) mirrors
      // the Spark expression operation-for-operation
      """WITH x AS (SELECT vec_id,
        |    CAST(unnest(range(len(embedding))) AS INTEGER) AS dim,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
        |      AS xs
        |  FROM embeddings),
        |p AS (SELECT a.dim AS j, b.dim AS k,
        |    CAST(SUM(a.xs * b.xs) AS BIGINT) AS spp
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        |  GROUP BY 1, 2),
        |st AS (SELECT dim, CAST(SUM(xs) AS BIGINT) AS sx,
        |    CAST(SUM(xs * xs) AS BIGINT) AS sqq,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM x GROUP BY dim)
        |SELECT p.j AS dim_a, p.k AS dim_b,
        |  CAST(sa.n * p.spp - sa.sx * sb.sx AS DOUBLE) /
        |    (sqrt(CAST(sa.n * sa.sqq - sa.sx * sa.sx AS DOUBLE)) *
        |     sqrt(CAST(sb.n * sb.sqq - sb.sx * sb.sx AS DOUBLE))) AS corr
        |FROM p JOIN st sa ON sa.dim = p.j JOIN st sb ON sb.dim = p.k
        |ORDER BY dim_a, dim_b""".stripMargin,
    "sim_standardize" ->
      """WITH x AS (SELECT vec_id,
        |    CAST(unnest(range(len(embedding))) AS INTEGER) AS dim,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
        |      AS xs
        |  FROM embeddings),
        |st AS (SELECT dim, CAST(SUM(xs) AS BIGINT) AS s1,
        |    CAST(SUM(xs * xs) AS BIGINT) AS s2,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM x GROUP BY dim)
        |SELECT x.vec_id, x.dim,
        |  (CAST(x.xs AS DOUBLE) - CAST(st.s1 AS DOUBLE) / st.n) /
        |    sqrt(CAST(st.s2 AS DOUBLE) / st.n -
        |      (CAST(st.s1 AS DOUBLE) / st.n) *
        |      (CAST(st.s1 AS DOUBLE) / st.n) + 1e-12) AS z
        |FROM x JOIN st USING (dim)
        |ORDER BY vec_id, dim""".stripMargin,
    "text_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)),
        |    '\s+')) AS token
        |  FROM documents),
        |cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM toks GROUP BY token),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks)
        |SELECT token, n, CAST(n * 65 > n_total AS INT) AS guaranteed
        |FROM cnt, tot ORDER BY n DESC, token LIMIT 10""".stripMargin,
    "st1_tumbling_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
        | CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_feed_daily" ->
      // DuckDB replay of the deterministic feed generator
      // (FeedSource.tsOf/kindOf/amountOf) + the daily rollup the
      // stream materializes
      """WITH feed AS (
        |  SELECT range AS id,
        |    TIMESTAMP '2024-01-01 00:00:00' + range * INTERVAL 1 MINUTE
        |      AS ts,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |    CAST((range * 2654435761) % 100000 AS DOUBLE) / 100.0 AS amount
        |  FROM range(5000))
        |SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DOUBLE)
        |    AS total_amount,
        |  CAST(SUM(CASE WHEN kind = 'credit' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_credit
        |FROM feed GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_dedup_feed" ->
      // the doubled feed deduplicates back to the generator itself
      """SELECT range AS id,
        |  TIMESTAMP '2024-01-01 00:00:00' + range * INTERVAL 1 MINUTE
        |    AS ts,
        |  CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |  CAST((range * 2654435761) % 100000 AS DOUBLE) / 100.0 AS amount
        |FROM range(5000) ORDER BY id""".stripMargin,
    "stream_pit_enrich" ->
      // ts(id) = base + id minutes ⇒ the interval match reduces to
      // id div 1000; rate and revenue re-derived in exact BIGINTs
      """WITH feed AS (SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |    (range * 2654435761) % 100000 AS cents,
        |    range // 1000 AS rate_version
        |  FROM range(5000))
        |SELECT kind, CAST(rate_version AS BIGINT) AS rate_version,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(cents * (100 + 7 * rate_version)) AS BIGINT)
        |    AS revenue_cents
        |FROM feed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_ewma" ->
      // the identical id-ordered acc/2 + x fold over the generator:
      // every step is an exponent decrement plus an add, so the level
      // is bit-identical (see RunningEwmaProcessor / ewmaDaily)
      """WITH feed AS (
        |  SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |    CAST((range * 2654435761) % 100000 AS DOUBLE) AS cents
        |  FROM range(5000)),
        |fr AS (SELECT kind, list(cents ORDER BY id) AS xs
        |       FROM feed GROUP BY 1)
        |SELECT kind, list_reduce(list_prepend(0.0, xs),
        |  (acc, x) -> acc / 2 + x) AS ewma
        |FROM fr ORDER BY kind""".stripMargin,
    "stream_cusum" ->
      // the recursion S_t = max(0, S_{t-1} + x - 50000) replayed via
      // its closed form S_t = P_t - least(0, min_{i<=t} P_i)
      // (reflection at zero) — two windows, all BIGINT; peak ties
      // keep the first id (rank cusum DESC, id ASC = the fold's
      // strict >)
      """WITH feed AS (
        |  SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |    (range * 2654435761) % 100000 AS x
        |  FROM range(5000)),
        |w AS (SELECT kind, id,
        |    SUM(x - 50000) OVER (PARTITION BY kind ORDER BY id) AS p
        |  FROM feed),
        |s AS (SELECT kind, id,
        |    p - least(0, MIN(p) OVER (PARTITION BY kind ORDER BY id))
        |      AS cusum
        |  FROM w),
        |r AS (SELECT kind, id, cusum,
        |    ROW_NUMBER() OVER (PARTITION BY kind
        |      ORDER BY cusum DESC, id) AS rk,
        |    ROW_NUMBER() OVER (PARTITION BY kind ORDER BY id DESC)
        |      AS rlast
        |  FROM s)
        |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(MAX(CASE WHEN rlast = 1 THEN cusum END) AS BIGINT)
        |    AS cusum,
        |  CAST(MAX(CASE WHEN rk = 1 THEN cusum END) AS BIGINT)
        |    AS cusum_peak,
        |  CAST(MAX(CASE WHEN rk = 1 THEN id END) AS BIGINT) AS peak_id
        |FROM r GROUP BY kind ORDER BY kind""".stripMargin,
    "stream_concurrency" ->
      // generator replay: open(i) = |{j : t_j ≤ t_i < t_j + len_j}|
      // per kind (relative micros — the epoch constant cancels in
      // every comparison); final = intervals outliving the last event
      """WITH feed AS (
        |  SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END
        |      AS kind,
        |    range * 60000000 AS t,
        |    (1 + (range * 2654435761) % 30) * 60000000 AS len
        |  FROM range(5000)),
        |o AS (SELECT i.kind, i.id, count(*) AS open
        |  FROM feed i JOIN feed j ON j.kind = i.kind
        |    AND j.t <= i.t AND i.t < j.t + j.len
        |  GROUP BY 1, 2),
        |mx AS (SELECT kind, max(t) AS tl FROM feed GROUP BY 1),
        |fin AS (SELECT f.kind,
        |    CAST(sum(CASE WHEN f.t + f.len > mx.tl THEN 1 ELSE 0 END)
        |      AS BIGINT) AS open_final
        |  FROM feed f JOIN mx ON f.kind = mx.kind GROUP BY 1)
        |SELECT o.kind, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(open) AS BIGINT) AS max_open, fin.open_final
        |FROM o JOIN fin ON o.kind = fin.kind
        |GROUP BY o.kind, fin.open_final ORDER BY o.kind""".stripMargin,
    "stream_sliding_distinct" ->
      // generator replay: the retained window set (day > max − 7 per
      // kind) and each day's trailing-7 exact windowed distinct
      """WITH feed AS (
        |  SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |    CAST(range // 500 AS INT) AS day,
        |    (range * 2654435761) % 100000 % 101 AS user_id
        |  FROM range(5000)),
        |mx AS (SELECT kind, MAX(day) AS maxd FROM feed GROUP BY 1),
        |keep AS (SELECT DISTINCT f.kind, f.day FROM feed f
        |  JOIN mx USING (kind) WHERE f.day > maxd - 7)
        |SELECT k.kind, k.day,
        |  CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users_7d
        |FROM keep k JOIN feed f ON f.kind = k.kind
        |  AND f.day > k.day - 7 AND f.day <= k.day
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_distinct_running" ->
      // generator replay + plain COUNT(DISTINCT): the streaming KMV
      // runs in its exact sub-k regime (101-user domain, k=1024)
      """WITH feed AS (
        |  SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |    (range * 2654435761) % 100000 % 101 AS user_id
        |  FROM range(5000))
        |SELECT kind, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM feed GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_weighted_sample" ->
      // generator replay + the same A-ES keys re-derived + a rank
      // window: the streaming reservoir's full-stream drain must
      // equal the batch weighted sample exactly (see
      // agg_weighted_sample for the hash-exactness argument)
      """WITH feed AS (
        |  SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |    greatest(CAST((range * 2654435761) % 100000 AS DOUBLE) / 100.0,
        |      1e-6) AS w
        |  FROM range(5000)),
        |keyed AS (
        |  SELECT kind, id,
        |    ln((CAST((id * 2654435761) % 4294967296 AS DOUBLE) + 1.0)
        |        / 4294967297.0) / w AS es_key
        |  FROM feed),
        |ranked AS (
        |  SELECT kind, id, row_number() OVER (PARTITION BY kind
        |    ORDER BY es_key DESC, id) AS rk
        |  FROM keyed)
        |SELECT kind, CAST(rk AS BIGINT) AS rk, id
        |FROM ranked WHERE rk <= 20 ORDER BY kind, rk""".stripMargin,
    "stream_heavy_hitters" ->
      // generator replay of the skewed token law; n_heavy_found
      // deliberately re-derives the SAME exact expression as
      // n_heavy_true — MG completeness (every token above the
      // N/(m+1) bar is nominated) makes them equal, so a recall
      // regression hash-mismatches on a replayed number, not a
      // literal. The two bound booleans are deterministic MG laws
      // under the id-ordered fold (oracle: literal true).
      """WITH t AS (
        |  SELECT CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END
        |      AS kind,
        |    CASE WHEN ((range * 2654435761) % 100000) % 4 <> 0
        |      THEN ((range * 2654435761) % 100000) % 16
        |      ELSE 16 + ((range * 2654435761) % 100000) % 499 END AS tokno
        |  FROM range(5000)),
        |c AS (SELECT kind, tokno, count(*) AS n FROM t GROUP BY 1, 2),
        |tot AS (SELECT kind, CAST(count(*) AS BIGINT) AS n_total
        |  FROM t GROUP BY 1),
        |heavy AS (SELECT c.kind, CAST(count(*) AS BIGINT) AS nh
        |  FROM c JOIN tot USING (kind) WHERE n * 33 > n_total GROUP BY 1)
        |SELECT kind, n_total,
        |  COALESCE(nh, 0) AS n_heavy_true,
        |  COALESCE(nh, 0) AS n_heavy_found,
        |  TRUE AS est_bounds_ok, TRUE AS candidates_bounded
        |FROM tot LEFT JOIN heavy USING (kind) ORDER BY kind""".stripMargin,
    "stream_quantiles" ->
      // the ESTIMATES replay, not just bounds: the sketch read-off is
      // the upper edge of the exact rank element's 400-cent bin (the
      // bin-edge identity), with the same rank law as the batch
      // quantile rollup — floor(n*frac + (1-frac))
      """WITH f AS (
        |  SELECT CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END
        |      AS kind,
        |    (range * 2654435761) % 100000 AS v
        |  FROM range(5000)),
        |r AS (SELECT kind, v,
        |    row_number() OVER (PARTITION BY kind ORDER BY v) AS rn,
        |    CAST(count(*) OVER (PARTITION BY kind) AS BIGINT) AS n
        |  FROM f),
        |sel AS (SELECT kind, n,
        |    MAX(CASE WHEN rn = CAST(floor(n * 0.5 + 0.5) AS BIGINT)
        |      THEN v END) AS v50,
        |    MAX(CASE WHEN rn = CAST(floor(n * 0.95 + 0.05) AS BIGINT)
        |      THEN v END) AS v95
        |  FROM r GROUP BY kind, n)
        |SELECT kind, n AS n_events,
        |  (LEAST(v50 // 400, 255) + 1) * 400 AS p50_est_cents,
        |  (LEAST(v95 // 400, 255) + 1) * 400 AS p95_est_cents
        |FROM sel ORDER BY kind""".stripMargin,
    "stream_versioned_ingest" ->
      // exactly-once proof: every generated row lands in exactly one
      // committed version, so the all-versions rollup equals the
      // plain generator replay
      """WITH feed AS (
        |  SELECT CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END
        |      AS kind,
        |    CAST((range * 2654435761) % 100000 AS DOUBLE) / 100.0
        |      AS amount
        |  FROM range(3000))
        |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DOUBLE)
        |    AS total_amount
        |FROM feed GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_sessionize" ->
      // generator replay + gaps-and-islands sessionization + the
      // final-watermark cutoff append mode imposes: the feed's max ts
      // is 2024-01-04 11:19 (id 4999), the watermark delay 1 hour, so
      // sessions ending after 2024-01-04 10:19 are still open when
      // the drain terminates and must NOT appear. A new session
      // starts when the gap is >= 2 hours (Spark's session window is
      // [start, last + gap) — an event AT the boundary starts anew);
      // session_end = last event + gap, as in adv_session_window.
      """WITH feed AS (
        |  SELECT range AS id,
        |    TIMESTAMP '2024-01-01 00:00:00' + range * INTERVAL 1 MINUTE
        |      AS ts,
        |    (range * 2654435761) % 100000 % 101 AS user_id,
        |    CAST((range * 2654435761) % 100000 AS DOUBLE) / 100.0
        |      AS amount
        |  FROM range(5000)),
        |marked AS (
        |  SELECT *, CASE WHEN
        |      LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |        >= INTERVAL 2 HOUR
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM feed),
        |sessions AS (
        |  SELECT *, SUM(new_sess)
        |    OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 2 HOUR AS session_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DOUBLE)
        |    AS session_amount
        |FROM sessions GROUP BY user_id, sid
        |HAVING MAX(ts) + INTERVAL 2 HOUR <= TIMESTAMP '2024-01-04 10:19:00'
        |ORDER BY user_id, session_start""".stripMargin,
    "st2_sliding_7day" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS daily_events
        |  FROM events GROUP BY 1)
        |SELECT day, daily_events,
        | CAST(SUM(daily_events) OVER (
        |     ORDER BY date_diff('day', DATE '1970-01-01', day)
        |     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS trailing_7d_events
        |FROM daily ORDER BY day""".stripMargin,
    "s4_rest_source" ->
      """WITH ids AS (SELECT unnest(generate_series(0, 3999)) AS id),
        |v AS (SELECT id, CAST(id // 250 AS INT) AS page,
        |        (id * 1103515245 + 12345) % 1000 AS v
        |      FROM ids)
        |SELECT page, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(v / 10.0 AS DECIMAL(18,6))) AS DOUBLE) AS score_sum,
        | CAST(COUNT(CASE WHEN v % 5 = 0 THEN 1 END) AS BIGINT)
        |   AS n_inactive
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    "adv_asof_join" ->
      """WITH lastord AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts,
        | o.o_orderkey AS last_orderkey,
        | o.o_orderdate AS last_orderdate
        |FROM events e
        |ASOF LEFT JOIN lastord o
        |  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |ORDER BY e.event_id""".stripMargin,
    "adv_nearest_join" ->
      // independent path: a raw band filter + row_number argmin under
      // the same (abs_us, ts, id) total order — no day explode
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
        |    FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS click_id, ts AS c_ts
        |    FROM events WHERE event_type = 'click'),
        |cand AS (SELECT p.purchase_id, c.click_id, c.c_ts,
        |    abs(epoch_us(c.c_ts) - epoch_us(p.p_ts)) AS abs_us
        |  FROM p JOIN c ON p.user_id = c.user_id
        |  WHERE abs(epoch_us(c.c_ts) - epoch_us(p.p_ts))
        |    <= 86400000000),
        |best AS (SELECT purchase_id, click_id, c_ts, abs_us,
        |    row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY abs_us, c_ts, click_id) AS rn
        |  FROM cand)
        |SELECT p.purchase_id, p.user_id, p.p_ts AS purchase_ts,
        |  b.click_id, b.c_ts AS click_ts, b.abs_us
        |FROM p LEFT JOIN best b
        |  ON p.purchase_id = b.purchase_id AND b.rn = 1
        |ORDER BY p.purchase_id""".stripMargin,
    "adv_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts >= lag(ts) OVER w + INTERVAL 2 HOUR
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start,
        | max(ts) + INTERVAL 2 HOUR AS session_end,
        | CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "adv_bucketed_join" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_items,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |   AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "adv_dpp_prune" ->
      // the dim join is semantically the quarter predicate — computed
      // directly here, so a green row proves the DPP'd join exact
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
        | CAST(COUNT(*) AS BIGINT) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE year(o_orderdate) = 1996 AND month(o_orderdate) <= 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "adv_recursive_cte" ->
      """WITH RECURSIVE chain AS (
        |  SELECT c_custkey, c_custkey AS root, 1 AS depth
        |  FROM customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey, ch.root, ch.depth + 1
        |  FROM customer c
        |  JOIN chain ch
        |    ON CAST(FLOOR(c.c_custkey / 10.0) AS BIGINT) = ch.c_custkey
        |  WHERE c.c_custkey >= 10
        |)
        |SELECT c_custkey, root, depth FROM chain
        |ORDER BY c_custkey""".stripMargin,
    "adv_salted_agg" ->
      """SELECT event_type,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
        | CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "adv_skyline" ->
      // independent formulation: the quadratic NOT EXISTS dominance
      // test the engine's bucketed core must agree with exactly
      """WITH p AS (SELECT p_partkey,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS pc, p_size
        |  FROM part)
        |SELECT 'cheap_small' AS frontier, p_partkey,
        |  pc AS price_cents, p_size
        |FROM p x WHERE NOT EXISTS (SELECT 1 FROM p y
        |  WHERE y.pc <= x.pc AND y.p_size <= x.p_size
        |    AND (y.pc < x.pc OR y.p_size < x.p_size))
        |UNION ALL
        |SELECT 'cheap_large' AS frontier, p_partkey,
        |  pc AS price_cents, p_size
        |FROM p x WHERE NOT EXISTS (SELECT 1 FROM p y
        |  WHERE y.pc <= x.pc AND y.p_size >= x.p_size
        |    AND (y.pc < x.pc OR y.p_size > x.p_size))
        |ORDER BY frontier, p_partkey""".stripMargin,
    "adv_skew_join" ->
      // the runtime split must not change the answer: plain replay of
      // the skewed-key join + rollup (integer cents)
      """WITH f AS (SELECT CASE WHEN user_id % 2 = 0 THEN 0
        |      ELSE user_id END AS k,
        |    CAST(round("value" * 100) AS BIGINT) AS cents FROM events),
        |d AS (SELECT DISTINCT k, k % 7 AS bucket FROM f)
        |SELECT d.bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM f JOIN d ON f.k = d.k
        |GROUP BY d.bucket ORDER BY d.bucket""".stripMargin,
    "adv_interval_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        | CAST(count(e.ts) AS BIGINT) AS n_prior_events,
        | coalesce(CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE),
        |   0.0) AS prior_value
        |FROM events p LEFT JOIN events e
        |  ON e.user_id = p.user_id AND e.ts < p.ts
        |  AND e.ts >= p.ts - INTERVAL 10 MINUTE
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1, 2 ORDER BY purchase_id""".stripMargin,
    "s_file_skipping" ->
      // the manifest prune is a pure file-planning optimization — the
      // result must equal the raw slice, which is what DuckDB computes
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events WHERE user_id BETWEEN 3 AND 7
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "plan_lineage" ->
      // hand-derived from Pipelines.insightGold: every output column's
      // physical sources (count(*)-derived columns and literals have
      // none → empty src); a plan refactor that changes the wiring
      // fails the value compare
      """SELECT * FROM (VALUES
        | ('avg_order_value', 'orders.o_totalprice'),
        | ('c_custkey', 'customer.c_custkey'),
        | ('c_mktsegment', 'customer.c_mktsegment'),
        | ('c_name', 'customer.c_name'),
        | ('data_date', ''),
        | ('has_purchase', 'events.event_type'),
        | ('last_orderdate', 'orders.o_orderdate'),
        | ('last_orderdate', 'orders.o_orderkey'),
        | ('last_orderkey', 'orders.o_orderdate'),
        | ('last_orderkey', 'orders.o_orderkey'),
        | ('last_status', 'orders.o_orderstatus'),
        | ('n_events', ''),
        | ('n_lineitems', ''),
        | ('n_orders', ''),
        | ('n_purchases', 'events.event_type'),
        | ('nation', 'nation.n_name'),
        | ('profile_status', 'customer.c_acctbal'),
        | ('profile_status', 'events.event_type'),
        | ('region', 'region.r_name'),
        | ('total_qty', 'lineitem.l_quantity'),
        | ('total_spend', 'orders.o_totalprice')
        |) AS t(out_col, src_col) ORDER BY out_col, src_col""".stripMargin,
    "plan_audit" ->
      // hand-derived from PlanAudit.lintDemo's plan: the UDF filter
      // fires scala-udf AND unconvertible-predicate on its Filter,
      // the rand filter (never offered to the scan) unpushed-filter,
      // the bare-ORDER-BY window one global-window, the crossJoin one
      // cross-product (region is 5 rows at every sf, so the planner's
      // broadcast-nested-loop choice never flips), the final orderBy
      // one global-sort, plus the per-plan exchange-count summary row
      """SELECT * FROM (VALUES
        | ('warn', 'cross-product', 'BroadcastNestedLoopJoin'),
        | ('info', 'exchange-count', 'plan'),
        | ('info', 'global-sort', 'Sort'),
        | ('warn', 'global-window', 'Window'),
        | ('warn', 'scala-udf', 'Filter'),
        | ('info', 'unconvertible-predicate', 'Filter'),
        | ('warn', 'unpushed-filter', 'Filter')
        |) AS t(severity, rule, node) ORDER BY rule, node, severity""".stripMargin,
    "s_partition_prune" ->
      // partition pruning is a planning optimization — the pruned
      // partitioned read must equal the raw daily slice
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        | CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-11'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s_hash_sample" ->
      """SELECT l_returnflag,
        | CAST(count(*) AS BIGINT) AS n_sampled,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |   AS sum_price
        |FROM lineitem
        |WHERE (l_orderkey * 2654435761 + l_linenumber * 40503) % 97 < 5
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s_stratified_sample" ->
      """SELECT source, lang, doc_id, CAST(rk AS INT) AS rk
        |FROM (SELECT source, lang, doc_id,
        |  ROW_NUMBER() OVER (PARTITION BY source, lang
        |    ORDER BY (doc_id * 2654435761) % 97, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 5 ORDER BY source, lang, rk""".stripMargin,
    "p_pit_lookup" ->
      // the scd2 interval table rebuilt, then a key-equi + interval-
      // residual left join: at most one version covers each ship date
      """WITH scd AS (SELECT o_custkey AS cust_id,
        |    o_orderpriority AS attr, o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM orders),
        |pr AS (SELECT l.l_orderkey, l.l_linenumber,
        |    o.o_custkey AS cust_id, l.l_shipdate
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT pr.l_orderkey, pr.l_linenumber, pr.cust_id, pr.l_shipdate,
        |  COALESCE(scd.attr, 'Not_Found') AS attr_at_ship
        |FROM pr LEFT JOIN scd ON pr.cust_id = scd.cust_id
        |  AND scd.valid_from <= pr.l_shipdate
        |  AND (scd.valid_to IS NULL OR pr.l_shipdate < scd.valid_to)
        |ORDER BY l_orderkey, l_linenumber, l_shipdate""".stripMargin,
    "p_scd2" ->
      """SELECT cust_id, version_key, attr, valid_from, valid_to,
        | CAST(valid_to IS NULL AS INT) AS is_current
        |FROM (SELECT o_custkey AS cust_id, o_orderkey AS version_key,
        |        o_orderpriority AS attr, o_orderdate AS valid_from,
        |        LEAD(o_orderdate) OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate, o_orderkey) AS valid_to
        |      FROM orders)
        |ORDER BY cust_id, valid_from, version_key""".stripMargin,
    "plan_stats_audit" ->
      // ground truth replays; catalog estimates cross as law booleans
      """SELECT col_name,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS actual_rows,
        |  ndv_exact, true AS rowcount_exact, true AS ndv_in_envelope
        |FROM (
        |  SELECT 'o_custkey' AS col_name,
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv_exact
        |  FROM orders
        |  UNION ALL SELECT 'o_orderpriority',
        |    CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'o_orderstatus',
        |    CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders)
        |ORDER BY col_name""".stripMargin,
    "p_scd2_merge" ->
      // the FULL rebuild — equality proves the incremental path
      """SELECT cust_id, version_key, attr, valid_from, valid_to,
        | CAST(valid_to IS NULL AS INT) AS is_current
        |FROM (SELECT o_custkey AS cust_id, o_orderkey AS version_key,
        |        o_orderpriority AS attr, o_orderdate AS valid_from,
        |        LEAD(o_orderdate) OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate, o_orderkey) AS valid_to
        |      FROM orders)
        |ORDER BY cust_id, valid_from, version_key""".stripMargin,
    "p_corpus_clean" ->
      """WITH scored AS (
        |  SELECT doc_id, text,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT)
        |      AS n_words,
        |    CAST(len(list_distinct(string_split_regex(trim(lower(text)),
        |      '\s+'))) AS INT) AS n_distinct_words,
        |    CAST(len(regexp_extract_all(text, '\b(the|a|of)\b')) AS INT)
        |      AS s_en,
        |    CAST(len(regexp_extract_all(text, '\b(data|query|row)\b'))
        |      AS INT) AS s_zh,
        |    CAST(len(regexp_extract_all(text, '\b(fast|slow|small)\b'))
        |      AS INT) AS s_de
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, text, n_words,
        |    round(0.5 * (n_distinct_words / n_words) +
        |      0.5 * least(n_words / 100.0, 1.0), 4) AS quality_score
        |  FROM scored
        |  WHERE (CASE WHEN s_en >= s_zh AND s_en >= s_de THEN 'en'
        |              WHEN s_zh >= s_de THEN 'zh' ELSE 'de' END) = 'en'
        |    AND round(0.5 * (n_distinct_words / n_words) +
        |      0.5 * least(n_words / 100.0, 1.0), 4) >= 0.5),
        |keepers AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY text),
        |ek AS (SELECT f.* FROM f JOIN keepers USING (doc_id)),
        |toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM ek),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win AS s
        |  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        |  QUALIFY lead(w,2) OVER win IS NOT NULL),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |drops AS (
        |  SELECT DISTINCT b_id FROM (
        |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
        |    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |    GROUP BY 1, 2) pr
        |  JOIN sz na ON na.doc_id = a_id
        |  JOIN sz nb ON nb.doc_id = b_id
        |  WHERE n_inter / (na.n + nb.n - n_inter) >= 0.8)
        |SELECT doc_id, n_words, quality_score
        |FROM ek WHERE doc_id NOT IN (SELECT b_id FROM drops)
        |ORDER BY doc_id""".stripMargin,
    "w_leadlag" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
        | CAST(date_diff('day', lag(CAST(o_orderdate AS DATE), 1) OVER w,
        |   CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "w_streaks" ->
      // the same day − ROW_NUMBER run id; all-integer output
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |  FROM events),
        |isl AS (SELECT user_id, d,
        |    d - CAST(ROW_NUMBER() OVER
        |          (PARTITION BY user_id ORDER BY d) AS INT) AS grp
        |  FROM days),
        |runs AS (SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_streaks,
        |  MAX(len) AS longest_streak,
        |  CAST(SUM(len) AS BIGINT) AS n_active_days
        |FROM runs GROUP BY 1 ORDER BY user_id""".stripMargin,
    "w_ntile" ->
      """SELECT o_custkey, total_spend,
        | CAST(NTILE(4) OVER (ORDER BY total_spend DESC, o_custkey) AS INT)
        |   AS quartile
        |FROM (SELECT o_custkey,
        |        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |          AS total_spend
        |      FROM orders GROUP BY 1)
        |ORDER BY o_custkey""".stripMargin,
    "agg_percentile" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "set_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "sink_csv_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "sink_json_archive" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        | CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_latest_snapshot" ->
      """SELECT '2024-01-01' AS snapshot_date,
        | CAST(COUNT(*) AS BIGINT) AS n_rows,
        | CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys
        |FROM orders""".stripMargin,
    "sink_ctas_promote" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_acctbal > 0 ORDER BY c_custkey""".stripMargin,
    "sink_upsert_by_date" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        | CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_compact" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        | CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys
        |FROM orders""".stripMargin,
    "sink_time_travel" ->
      // each committed version is a pure filter of orders, so the
      // as-of read replays as the same filter over the base table
      """SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |   AS total_price
        |FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
        |UNION ALL
        |SELECT 2 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |   AS total_price
        |FROM orders
        |ORDER BY version""".stripMargin,
    "ss_gmb_roundtrip" ->
      """WITH m AS (
        |  SELECT user_id AS id,
        |    CASE event_type
        |      WHEN 'click' THEN 'CALL_CLICKS'
        |      WHEN 'view' THEN 'WEBSITE_CLICKS'
        |      WHEN 'purchase' THEN 'BUSINESS_CONVERSATIONS'
        |      WHEN 'signup' THEN 'BUSINESS_IMPRESSIONS_DESKTOP_MAPS'
        |      ELSE 'BUSINESS_DIRECTION_REQUESTS' END AS metric,
        |    CAST(floor(value) AS BIGINT) AS v
        |  FROM events),
        |p AS (
        |  SELECT id,
        |    CAST(coalesce(SUM(CASE WHEN metric = 'WEBSITE_CLICKS'
        |      THEN v END), 0) AS BIGINT) AS "WEBSITE_CLICKS",
        |    CAST(coalesce(SUM(CASE WHEN metric = 'CALL_CLICKS'
        |      THEN v END), 0) AS BIGINT) AS "CALL_CLICKS",
        |    CAST(coalesce(SUM(CASE WHEN metric =
        |      'BUSINESS_IMPRESSIONS_DESKTOP_MAPS' THEN v END), 0)
        |      AS BIGINT) AS "BUSINESS_IMPRESSIONS_DESKTOP_MAPS",
        |    CAST(coalesce(SUM(CASE WHEN metric =
        |      'BUSINESS_IMPRESSIONS_DESKTOP_SEARCH' THEN v END), 0)
        |      AS BIGINT) AS "BUSINESS_IMPRESSIONS_DESKTOP_SEARCH",
        |    CAST(coalesce(SUM(CASE WHEN metric =
        |      'BUSINESS_IMPRESSIONS_MOBILE_MAPS' THEN v END), 0)
        |      AS BIGINT) AS "BUSINESS_IMPRESSIONS_MOBILE_MAPS",
        |    CAST(coalesce(SUM(CASE WHEN metric =
        |      'BUSINESS_IMPRESSIONS_MOBILE_SEARCH' THEN v END), 0)
        |      AS BIGINT) AS "BUSINESS_IMPRESSIONS_MOBILE_SEARCH",
        |    CAST(coalesce(SUM(CASE WHEN metric = 'BUSINESS_CONVERSATIONS'
        |      THEN v END), 0) AS BIGINT) AS "BUSINESS_CONVERSATIONS",
        |    CAST(coalesce(SUM(CASE WHEN metric =
        |      'BUSINESS_DIRECTION_REQUESTS' THEN v END), 0) AS BIGINT)
        |      AS "BUSINESS_DIRECTION_REQUESTS"
        |  FROM m GROUP BY id)
        |SELECT id, "WEBSITE_CLICKS", "CALL_CLICKS",
        |  "BUSINESS_IMPRESSIONS_DESKTOP_MAPS",
        |  "BUSINESS_IMPRESSIONS_DESKTOP_SEARCH",
        |  "BUSINESS_IMPRESSIONS_MOBILE_MAPS",
        |  "BUSINESS_IMPRESSIONS_MOBILE_SEARCH",
        |  "BUSINESS_CONVERSATIONS", "BUSINESS_DIRECTION_REQUESTS",
        |  "CALL_CLICKS" + "WEBSITE_CLICKS" +
        |    "BUSINESS_DIRECTION_REQUESTS" AS total_actions,
        |  "BUSINESS_IMPRESSIONS_DESKTOP_MAPS" +
        |    "BUSINESS_IMPRESSIONS_MOBILE_MAPS" AS map_impressions,
        |  "BUSINESS_IMPRESSIONS_DESKTOP_SEARCH" +
        |    "BUSINESS_IMPRESSIONS_MOBILE_SEARCH" AS search_impressions,
        |  "BUSINESS_IMPRESSIONS_DESKTOP_MAPS" +
        |    "BUSINESS_IMPRESSIONS_MOBILE_MAPS" +
        |    "BUSINESS_IMPRESSIONS_DESKTOP_SEARCH" +
        |    "BUSINESS_IMPRESSIONS_MOBILE_SEARCH" AS total_impressions
        |FROM p ORDER BY id""".stripMargin,
    "ss_gmb_media" ->
      """SELECT o_custkey AS id,
        | CASE WHEN SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |   > 0 THEN 'Yes' ELSE 'No' END AS has_cover,
        | CASE WHEN SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
        |   > 0 THEN 'Yes' ELSE 'No' END AS has_menu,
        | CAST(COUNT(*) AS BIGINT) AS total_media_item_count
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "ss_gmb_vom" ->
      """SELECT c_custkey AS id,
        | CASE c_custkey % 8
        |   WHEN 0 THEN 'suspended'
        |   WHEN 1 THEN 'location_disabled'
        |   WHEN 2 THEN 'processing'
        |   WHEN 3 THEN 'verified'
        |   WHEN 4 THEN 'duplicate'
        |   WHEN 5 THEN 'verification_required'
        |   WHEN 6 THEN 'unexpected_status'
        |   ELSE 'verification_required' END AS profile_status
        |FROM customer ORDER BY 1""".stripMargin,
    "ss_gmb_location" ->
      """SELECT c_custkey AS id, c_name AS business_name,
        | CASE WHEN c_custkey % 11 = 0 THEN NULL
        |   WHEN c_custkey % 2 = 0
        |   THEN '+1-' || CAST(c_custkey AS VARCHAR)
        |   ELSE 'Not_Found' END AS phone,
        | CASE WHEN c_custkey % 11 = 0 THEN NULL
        |   WHEN c_custkey % 4 = 0
        |   THEN '+1-' || CAST(c_custkey AS VARCHAR) || '-a'
        |   ELSE 'Not_Found' END AS additional_phone,
        | CASE WHEN c_custkey % 11 = 0 THEN NULL
        |   WHEN c_custkey % 5 = 0
        |   THEN 'http://ex.com/' || CAST(c_custkey AS VARCHAR)
        |   ELSE 'Not_Found' END AS website,
        | CASE WHEN c_custkey % 11 = 0 THEN ', None 9'
        |   WHEN c_custkey % 3 = 2 THEN 'Not_Found' ELSE
        |   (CASE WHEN c_custkey % 3 = 0
        |      THEN c_mktsegment || ', ' || n_name ELSE '' END) ||
        |   (CASE WHEN c_custkey % 2 = 0 THEN ', ' || n_name ELSE '' END) ||
        |   ' ' || CAST(c_custkey % 100000 AS VARCHAR) END AS address,
        | CASE WHEN c_custkey % 11 = 0 THEN 'Not_Found'
        |   WHEN c_custkey % 7 = 0
        |   THEN 'SC' || CAST(c_custkey AS VARCHAR)
        |   ELSE 'Not_Found' END AS store_code,
        | CASE WHEN c_custkey % 11 = 0 THEN 'Not_Found'
        |   WHEN c_custkey % 4 = 2 THEN 'MONDAY=10-18'
        |   WHEN c_custkey % 4 = 3 THEN 'WEDNESDAY=8-16'
        |   ELSE 'Not_Found' END AS regular_hours,
        | CASE WHEN c_custkey % 11 = 0 THEN 'Not_Found'
        |   WHEN c_custkey % 2 = 0 THEN c_mktsegment
        |   ELSE 'Not_Found' END AS primary_category,
        | CAST(CASE WHEN c_custkey % 11 = 0 THEN 1
        |   WHEN c_custkey % 4 = 0 THEN 1 ELSE 0 END AS INT)
        |   AS additional_categories_count,
        | CASE WHEN c_custkey % 11 = 0 THEN 'Not_Found'
        |   WHEN c_custkey % 5 = 0
        |   THEN 'rev://' || CAST(c_custkey AS VARCHAR)
        |   ELSE 'Not_Found' END AS review_url,
        | 'Not_Found' AS map_url
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY 1""".stripMargin,
    "ss_gmb_localposts" ->
      """WITH agg AS (
        |  SELECT o_custkey AS id,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
        |      AS INT) AS offer_count,
        |    CAST(SUM(CASE WHEN o_orderstatus <> 'O' THEN 1 ELSE 0 END)
        |      AS INT) AS promo_count
        |  FROM orders GROUP BY 1),
        |best AS (
        |  SELECT id, o_orderdate FROM (
        |    SELECT o_custkey AS id, o_orderdate, o_orderkey,
        |      ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
        |    FROM orders WHERE o_orderstatus = 'O') WHERE rn = 1)
        |SELECT agg.id, offer_count, promo_count,
        |  CAST(best.o_orderdate AS DATE) AS offer_starts_at,
        |  CAST(best.o_orderdate + INTERVAL 7 DAY AS DATE) AS offer_ends_at,
        |  CAST(best.o_orderdate + INTERVAL 1 DAY AS DATE)
        |    AS offer_updates_at
        |FROM agg LEFT JOIN best ON agg.id = best.id
        |ORDER BY agg.id""".stripMargin,
    "f4_housekeeping" ->
      """SELECT 'live/' || n_name || '/2024-01-01_snap.csv' AS name,
        | 'live/' || n_name || '/2024-01-01_snap' AS renamed_to
        |FROM nation ORDER BY 1""".stripMargin,
    "agg_profile" ->
      """WITH s AS (SELECT
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(o_orderkey) AS BIGINT) AS k_nn,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS k_nd,
        |  CAST(MIN(o_orderkey) AS VARCHAR) AS k_min,
        |  CAST(MAX(o_orderkey) AS VARCHAR) AS k_max,
        |  CAST(COUNT(o_custkey) AS BIGINT) AS c_nn,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS c_nd,
        |  CAST(MIN(o_custkey) AS VARCHAR) AS c_min,
        |  CAST(MAX(o_custkey) AS VARCHAR) AS c_max,
        |  CAST(COUNT(o_orderstatus) AS BIGINT) AS st_nn,
        |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS st_nd,
        |  MIN(o_orderstatus) AS st_min, MAX(o_orderstatus) AS st_max,
        |  CAST(COUNT(o_orderpriority) AS BIGINT) AS p_nn,
        |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS p_nd,
        |  MIN(o_orderpriority) AS p_min, MAX(o_orderpriority) AS p_max
        | FROM orders)
        |SELECT n_rows, u.* FROM s, LATERAL (
        |  SELECT 'o_orderkey' AS column_name, k_nn AS n_nonnull,
        |    k_nd AS n_distinct, k_min AS min_value, k_max AS max_value
        |  UNION ALL SELECT 'o_custkey', c_nn, c_nd, c_min, c_max
        |  UNION ALL SELECT 'o_orderstatus', st_nn, st_nd, st_min, st_max
        |  UNION ALL SELECT 'o_orderpriority', p_nn, p_nd, p_min, p_max
        |) u ORDER BY column_name""".stripMargin,
    "agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
        | CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "ss_quarantine" ->
      """SELECT event_type,
        | CAST(SUM(CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_good,
        | CAST(SUM(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_quarantined,
        | CAST(coalesce(SUM(CASE WHEN event_id % 7 <> 0
        |   THEN CAST(json_extract(props, '$.k') AS BIGINT) END), 0)
        |   AS BIGINT) AS k_sum_good
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "ss_gmb_reviews" ->
      """SELECT c_custkey AS id,
        | CASE WHEN c_custkey % 7 <> 0 AND c_custkey % 5 <> 0
        |   THEN round(CAST((c_custkey % 40) / 10.0 +
        |     (c_custkey % 3 + 1) / 100.0 AS DOUBLE), 1)
        |   ELSE NULL END AS average_rating,
        | CAST(CASE WHEN c_custkey % 7 <> 0 THEN c_custkey % 1000
        |   ELSE NULL END AS BIGINT) AS total_review_count
        |FROM customer ORDER BY 1""".stripMargin,
    "ss_gmb_services" ->
      """SELECT o_custkey AS id,
        | CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F')
        |   OR (o_orderstatus = 'P' AND o_orderkey % 2 = 0)
        |   THEN 1 ELSE 0 END) AS INT) AS service_count
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_schema_evolution" ->
      """SELECT o_orderstatus,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CASE WHEN year(o_orderdate) >= 1998 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_with_priority,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "p_insight_gold" ->
      """WITH oa AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |      AS total_spend,
        |    MAX(o_orderstatus) AS max_status
        |  FROM orders GROUP BY 1),
        |lastord AS (
        |  SELECT o_custkey, o_orderdate AS last_orderdate,
        |    o_orderkey AS last_orderkey
        |  FROM (SELECT o_custkey, o_orderdate, o_orderkey,
        |          ROW_NUMBER() OVER (PARTITION BY o_custkey
        |            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |        FROM orders) WHERE rn = 1),
        |ia AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_lineitems,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |      AS total_qty
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1),
        |ea AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      AS BIGINT) AS n_purchases
        |  FROM events GROUP BY 1)
        |SELECT c_custkey, c_name, c_mktsegment, n_name AS nation,
        | r_name AS region,
        | COALESCE(n_orders, 0) AS n_orders,
        | COALESCE(total_spend, 0.0) AS total_spend,
        | last_orderdate,
        | COALESCE(last_orderkey, -1) AS last_orderkey,
        | COALESCE(max_status, 'Not_Found') AS last_status,
        | COALESCE(n_lineitems, 0) AS n_lineitems,
        | COALESCE(total_qty, 0.0) AS total_qty,
        | COALESCE(ea.n_events, 0) AS n_events,
        | COALESCE(ea.n_purchases, 0) AS n_purchases,
        | CASE WHEN COALESCE(ea.n_purchases, 0) > 0 THEN 'Yes' ELSE 'No' END
        |   AS has_purchase,
        | COALESCE(total_spend, 0.0) /
        |   greatest(COALESCE(n_orders, 0), 1) AS avg_order_value,
        | CASE WHEN c_acctbal <= 0 THEN 'suspended'
        |      WHEN COALESCE(n_orders, 0) = 0 THEN 'inactive'
        |      WHEN COALESCE(ea.n_purchases, 0) > 0 THEN 'engaged'
        |      ELSE 'active' END AS profile_status,
        | DATE '2024-01-01' AS data_date
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |LEFT JOIN oa ON oa.o_custkey = c_custkey
        |LEFT JOIN lastord ON lastord.o_custkey = c_custkey
        |LEFT JOIN ia ON ia.o_custkey = c_custkey
        |LEFT JOIN ea ON ea.user_id = c_custkey
        |ORDER BY c_custkey""".stripMargin,
    "x_string_suite" ->
      """SELECT c_custkey, trim(c_name) AS tname,
        | concat_ws(', ', c_name, c_mktsegment) AS name_seg,
        | regexp_replace(c_name, '#[0-9]+$', '') AS name_prefix,
        | string_split(c_name, '#')[1] AS name_part,
        | upper(c_mktsegment) AS seg_upper,
        | substr(c_name, 1, 8) AS name_head,
        | CASE WHEN c_acctbal > 5000 THEN 'high'
        |      WHEN c_acctbal > 0 THEN 'mid' ELSE 'low' END AS bal_band,
        | CAST(c_acctbal > 0 AS INT) AS is_positive
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "x_date_suite" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
        | CAST(o_orderdate AS DATE) - 7 AS week_before,
        | strftime(o_orderdate, '%Y-%m-%d') AS od_str,
        | make_date(CAST(year(o_orderdate) AS INT),
        |   CAST(month(o_orderdate) AS INT),
        |   CAST(day(o_orderdate) AS INT)) AS od_rebuilt,
        | CAST(year(o_orderdate) AS INT) AS o_year,
        | CAST(month(o_orderdate) AS INT) AS o_month,
        | CAST(day(o_orderdate) AS INT) AS o_day,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
        |   AS INT) AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "x11_ts_roundtrip" ->
      """SELECT event_id,
        | strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS iso,
        | strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ'),
        |   '%Y-%m-%dT%H:%M:%S.%fZ') AS parsed
        |FROM events ORDER BY event_id""".stripMargin,
    "x18_kv_parse" ->
      """SELECT event_id, event_type AS evt, CAST(user_id AS BIGINT) AS uid
        |FROM events ORDER BY event_id""".stripMargin,
    "x8_status_case" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderstatus = 'F' THEN 'fulfilled'
        |      WHEN o_orderpriority LIKE '1%' THEN 'urgent_open'
        |      WHEN o_totalprice > 300000 THEN 'big_open'
        |      WHEN o_orderstatus = 'P' THEN 'processing'
        |      ELSE 'open' END AS status_class
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "x4_address" ->
      """SELECT c_custkey,
        | CASE WHEN length(concat_ws(', ', c_name, n_name, r_name)) = 0
        |      THEN 'Not_Found'
        |      ELSE concat_ws(', ', c_name, n_name, r_name) END AS address
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,
    "x7_map_construct" ->
      """WITH pc AS (SELECT user_id, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        | string_agg(event_type || '=' || CAST(cnt AS VARCHAR), ','
        |   ORDER BY event_type) AS type_counts
        |FROM pc GROUP BY user_id ORDER BY user_id""".stripMargin,
    "x_hof_suite" ->
      """WITH per AS (
        |  SELECT l_orderkey,
        |    array_agg(l_quantity ORDER BY l_linenumber, l_quantity)
        |      AS qtys
        |  FROM lineitem GROUP BY 1)
        |SELECT l_orderkey,
        |  CAST(len(qtys) AS BIGINT) AS n_lines,
        |  list_sum(list_transform(qtys, x -> x * 2)) AS doubled_sum,
        |  CAST(len(list_filter(qtys, x -> x >= 25)) AS BIGINT)
        |    AS n_heavy,
        |  CAST(list_contains(qtys, 50.0) AS INT) AS has_max,
        |  list_sum(list_transform(
        |      range(1, CAST(len(qtys) AS BIGINT) + 1),
        |      i -> qtys[i] * i)) AS pos_weighted
        |FROM per ORDER BY l_orderkey""".stripMargin,
    "ss_json_flatten" ->
      """SELECT l_returnflag AS flag,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "ss_props_extract" ->
      """SELECT event_type,
        | CAST(SUM(CAST(regexp_extract(props, '"k": *([0-9]+)', 1)
        |   AS BIGINT)) AS BIGINT) AS k_sum,
        | CAST(0 AS BIGINT) AS n_missing_present,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "ss_struct_traversal" ->
      """SELECT c_custkey, c_name AS name, c_mktsegment AS segment,
        | 'Not_Found' AS uri
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "ss_variant_path" ->
      // the variant round trip is the thing under test, so the oracle
      // replays straight from the flat columns; the absent path must
      // contribute nothing (n_missing_present = 0)
      """SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
        |   AS total_balance,
        | CAST(0 AS BIGINT) AS n_missing_present,
        | CAST(MIN(c_custkey) AS BIGINT) AS min_id
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS keeper_doc_id,
        | CAST(COUNT(*) AS BIGINT) AS n_copies,
        | md5(text) AS content_hash
        |FROM documents GROUP BY text ORDER BY keeper_doc_id""".stripMargin,
    "dedup_ngram_jaccard" -> ngramPairSql,
    "dedup_containment" ->
      // same shingle/pair CTEs, containment score + direction
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win AS s
        |  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        |  QUALIFY lead(w,2) OVER win IS NOT NULL),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pr AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, CAST(n_inter AS BIGINT) AS n_inter,
        |  CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
        |  n_inter / least(na.n, nb.n) AS containment,
        |  CASE WHEN na.n < nb.n THEN 'a_in_b'
        |       WHEN nb.n < na.n THEN 'b_in_a'
        |       ELSE 'mutual' END AS direction
        |FROM pr
        |JOIN sz na ON na.doc_id = doc_a
        |JOIN sz nb ON nb.doc_id = doc_b
        |WHERE n_inter / least(na.n, nb.n) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,
    // prefix filtering is exact: same oracle as the full-index join
    "dedup_prefix_jaccard" -> ngramPairSql,
    "dedup_prefix_stats" -> prefixStatsSql,
    // --- assertion-form oracles (approx/hash-family queries) ---
    "dedup_minhash" -> pairRecallOracle,
    "dedup_simhash_pairs" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
         | true AS recall_ok, true AS candidates_bounded
         |FROM ($ngramPairSql) t""".stripMargin,
    "dedup_winnow_pairs" -> pairRecallOracle,
    "dedup_simhash" ->
      s"""SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         | CAST(count(*) AS BIGINT) AS n_true_pairs,
         | true AS neardup_hamming_ok, true AS all_docs_signed
         |FROM ($ngramPairSql) t""".stripMargin,
    "text_winnow" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | true AS density_in_corridor, true AS long_docs_fingerprinted
        |FROM documents""".stripMargin,
    "text_compression_ratio" ->
      s"""SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         | CAST(count(*) AS BIGINT) AS n_true_pairs,
         | true AS range_ok, true AS neardup_ratio_close,
         | true AS flag_consistent
         |FROM ($ngramPairSql) t""".stripMargin,
    "agg_approx_distinct" ->
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
        | true AS parts_ok, true AS supps_ok FROM lineitem""".stripMargin,
    "agg_bitmap_distinct" ->
      // independent path: DISTINCT counts directly — equality with the
      // OR-folded bitmap words is the exactness proof
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(DISTINCT user_id // 32) AS BIGINT) AS n_words,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_dedup_history" ->
      // generator replay: history = ids ≡ 3 (mod 7), admitted = rest
      """WITH feed AS (SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END
        |      AS kind,
        |    (range * 2654435761) % 100000 AS cents
        |  FROM range(5000))
        |SELECT kind, CAST(count(*) AS BIGINT) AS n_admitted,
        |  CAST(sum(cents) AS BIGINT) AS cents_admitted,
        |  CAST(max(id) AS BIGINT) AS max_id
        |FROM feed WHERE id % 7 <> 3 GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_bitmap_rollup" ->
      // raw DISTINCTs both planes: per type AND the cross-type union
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1
        |UNION ALL
        |SELECT 'TOTAL', CAST(count(DISTINCT user_id) AS BIGINT)
        |FROM events
        |ORDER BY 1""".stripMargin,
    "agg_bitmap_jaccard" ->
      // raw distinct-pair join both planes; AND-merge ≡ intersection
      """WITH s AS (SELECT event_type,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |du AS (SELECT DISTINCT event_type, user_id FROM events),
        |i AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS n_inter
        |  FROM du a JOIN du b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_inter,
        |  sa.n + sb.n - n_inter AS n_union,
        |  n_inter * 1000000 // (sa.n + sb.n - n_inter)
        |    AS jaccard_ppm,
        |  n_inter * 1000000 // least(sa.n, sb.n) AS overlap_ppm
        |FROM i JOIN s sa ON i.type_a = sa.event_type
        |JOIN s sb ON i.type_b = sb.event_type
        |ORDER BY 1, 2""".stripMargin,
    "p_erasure_plan" ->
      """WITH subj AS (SELECT c_custkey AS s FROM customer
        |  WHERE c_custkey % 97 = 0)
        |SELECT 'customer' AS table_name,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_keys
        |FROM customer JOIN subj ON c_custkey = s
        |UNION ALL
        |SELECT 'events', CAST(count(*) AS BIGINT),
        |  CAST(count(DISTINCT user_id) AS BIGINT)
        |FROM events JOIN subj ON user_id = s
        |UNION ALL
        |SELECT 'lineitem_via_orders', CAST(count(*) AS BIGINT),
        |  CAST(count(DISTINCT o_custkey) AS BIGINT)
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN subj ON o_custkey = s
        |UNION ALL
        |SELECT 'orders', CAST(count(*) AS BIGINT),
        |  CAST(count(DISTINCT o_custkey) AS BIGINT)
        |FROM orders JOIN subj ON o_custkey = s
        |ORDER BY table_name""".stripMargin,
    "p_pps_alloc" ->
      """WITH st AS (SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS weight
        |  FROM events GROUP BY 1),
        |t AS (SELECT *, (SELECT sum(weight) FROM st) AS total_w
        |  FROM st),
        |b AS (SELECT event_type, n_rows, weight,
        |    1000 * weight // total_w AS base_seats,
        |    1000 * weight % total_w AS rem FROM t),
        |e AS (SELECT *, row_number() OVER
        |    (ORDER BY rem DESC, event_type) AS rk,
        |    (SELECT 1000 - sum(base_seats) FROM b) AS extra_n FROM b)
        |SELECT event_type, n_rows, weight,
        |  CAST(base_seats AS BIGINT) AS base_seats,
        |  CAST(CASE WHEN rk <= extra_n THEN 1 ELSE 0 END AS BIGINT)
        |    AS extra,
        |  CAST(base_seats + CASE WHEN rk <= extra_n THEN 1 ELSE 0 END
        |    AS BIGINT) AS seats
        |FROM e ORDER BY event_type""".stripMargin,
    "st_twap" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |d AS (SELECT user_id, t, cents,
        |    lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
        |      - t AS dt
        |  FROM e),
        |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(max(t) - min(t) AS BIGINT) AS span_us,
        |    CAST(sum(cents * dt) AS BIGINT) AS wsum,
        |    CAST(sum(cents) AS BIGINT) AS csum
        |  FROM d GROUP BY 1)
        |SELECT user_id, n_events, span_us,
        |  wsum // span_us AS twap_cents,
        |  csum // n_events AS mean_cents
        |FROM g WHERE span_us > 0 ORDER BY 1""".stripMargin,
    "st_yoy" ->
      """WITH monthly AS (SELECT CAST(year(o_orderdate) AS INT) AS y,
        |    CAST(month(o_orderdate) AS INT) AS m,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,6))
        |      * 10000 AS BIGINT)) AS BIGINT) AS rev_u,
        |    CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1, 2)
        |SELECT c.y, c.m, c.n_orders, c.rev_u,
        |  p.rev_u AS prev_rev_u,
        |  c.rev_u - p.rev_u AS diff_u,
        |  CAST(c.rev_u AS DOUBLE) / CAST(p.rev_u AS DOUBLE)
        |    AS yoy_ratio
        |FROM monthly c LEFT JOIN monthly p
        |  ON c.y - 1 = p.y AND c.m = p.m
        |ORDER BY 1, 2""".stripMargin,
    "st_burstiness" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sx2
        |  FROM d GROUP BY 1)
        |SELECT event_type, n_days, sx,
        |  n_days * sx2 - sx * sx AS fano_num,
        |  (n_days - 1) * sx AS fano_den,
        |  CAST(n_days * sx2 - sx * sx AS DOUBLE)
        |    / CAST((n_days - 1) * sx AS DOUBLE) AS fano
        |FROM g ORDER BY 1""".stripMargin,
    "st_records" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |f AS (SELECT event_type, cnt,
        |    max(cnt) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS pm
        |  FROM d),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(CASE WHEN pm IS NULL OR cnt > pm
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_records
        |  FROM f GROUP BY 1),
        |h AS (SELECT event_type,
        |    CAST(sum(1000000 // (s + 1)) AS BIGINT) AS h_scaled
        |  FROM g, unnest(range(n_days)) AS t(s) GROUP BY 1)
        |SELECT g.event_type, n_days, n_records, h_scaled,
        |  n_records * 1000000 - h_scaled AS excess_scaled
        |FROM g JOIN h ON g.event_type = h.event_type
        |ORDER BY 1""".stripMargin,
    "st_drawdown" ->
      // independent argmax path: row_number under (dd DESC, t, id)
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CASE WHEN event_type = 'purchase'
        |      THEN -CAST(round(value * 100) AS BIGINT)
        |      ELSE CAST(round(value * 100) AS BIGINT) END AS sc
        |  FROM events),
        |b AS (SELECT user_id, event_id, t,
        |    sum(sc) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS balance
        |  FROM e),
        |p AS (SELECT user_id, event_id, t, balance,
        |    max(balance) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - balance AS dd
        |  FROM b),
        |r AS (SELECT user_id, event_id, balance, dd,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY dd DESC, t, event_id) AS rk
        |  FROM p)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(balance) AS BIGINT) AS peak_balance,
        |  CAST(min(balance) AS BIGINT) AS trough_balance,
        |  CAST(max(CASE WHEN rk = 1 THEN dd END) AS BIGINT)
        |    AS max_drawdown,
        |  CAST(max(CASE WHEN rk = 1 THEN event_id END) AS BIGINT)
        |    AS dd_event_id
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "geo_cell_join" ->
      // independent path: the O(n²) brute-force distance scan the
      // grid cells exist to avoid — hash equality proves zero
      // recall loss from the blocking
      """WITH n AS (SELECT count(*) * 700 AS side FROM customer),
        |p AS (SELECT c_custkey AS id,
        |    (c_custkey * 2654435761) % 1000000 AS lat,
        |    (c_custkey * 2246822519) % (SELECT side FROM n) AS lon
        |  FROM customer)
        |SELECT a.id AS a_id, b.id AS b_id,
        |  (a.lat - b.lat) * (a.lat - b.lat)
        |    + (a.lon - b.lon) * (a.lon - b.lon) AS dist2
        |FROM p a JOIN p b ON a.id < b.id
        |WHERE (a.lat - b.lat) * (a.lat - b.lat)
        |    + (a.lon - b.lon) * (a.lon - b.lon) <= 400000000
        |ORDER BY a_id, b_id""".stripMargin,
    "st_concurrency" ->
      """WITH ep AS (
        |  SELECT user_id, epoch_us(ts) AS t, 1 AS delta FROM events
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts) + 1800000000, -1 FROM events),
        |r AS (SELECT user_id, sum(delta) OVER (PARTITION BY user_id
        |    ORDER BY t, delta
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
        |  FROM ep)
        |SELECT user_id, CAST(count(*) // 2 AS BIGINT) AS n_intervals,
        |  CAST(max(open) AS BIGINT) AS max_concurrent
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "st_interval_union" ->
      """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + 1800000000 AS e FROM events),
        |m AS (SELECT user_id, event_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM iv),
        |isl AS (SELECT user_id, s, e,
        |    sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY s, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS island
        |  FROM m),
        |grp AS (SELECT user_id, island, count(*) AS n_iv,
        |    max(e) - min(s) AS covered
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
        |  CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(covered) AS BIGINT) AS covered_us
        |FROM grp GROUP BY 1 ORDER BY 1""".stripMargin,
    "dq_skew_gini" -> {
      def block(name: String, sel: String) =
        s"""SELECT '$name' AS key_col, n_keys, total_rows, gini_num,
           |  gini_den, gini_num * 1000000 // gini_den AS gini_ppm,
           |  CAST(gini_num AS DOUBLE) / CAST(gini_den AS DOUBLE)
           |    AS gini
           |FROM (
           |  SELECT CAST(max(n) AS BIGINT) AS n_keys,
           |    CAST(sum(cnt) AS BIGINT) AS total_rows,
           |    CAST(2 * sum(i * cnt)
           |      - (max(n) + 1) * sum(cnt) AS BIGINT) AS gini_num,
           |    CAST(max(n) * sum(cnt) AS BIGINT) AS gini_den
           |  FROM (
           |    SELECT cnt, row_number() OVER (ORDER BY cnt, k) AS i,
           |      count(*) OVER () AS n
           |    FROM (SELECT k, count(*) AS cnt FROM ($sel) GROUP BY 1)))
           |""".stripMargin
      block("l_suppkey", "SELECT l_suppkey AS k FROM lineitem") +
        "UNION ALL " +
        block("l_partkey", "SELECT l_partkey AS k FROM lineitem") +
        "UNION ALL " +
        block("user_id", "SELECT user_id AS k FROM events") +
        "ORDER BY key_col"
    },
    "agg_aqp_estimate" ->
      """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    (event_id * 2654435761) % 16 = 0 AS in_sample
        |  FROM events),
        |cells AS (SELECT event_type, day, count(*) AS n_cell,
        |    sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS s_cell
        |  FROM ev GROUP BY 1, 2),
        |days AS (SELECT day, sum(n_cell) AS n_day,
        |    sum(s_cell) AS s_day FROM cells GROUP BY 1),
        |t AS (SELECT event_type,
        |    CAST(sum(n_cell) AS BIGINT) AS n_exact,
        |    CAST(sum(s_cell) AS BIGINT) AS n_sampled,
        |    CAST(sum(CASE WHEN s_day > 0
        |      THEN n_day * s_cell // s_day ELSE 0 END) AS BIGINT)
        |      AS n_est_ratio
        |  FROM cells JOIN days USING (day) GROUP BY 1)
        |SELECT event_type, n_exact, n_sampled,
        |  n_sampled * 16 AS n_est_uniform, n_est_ratio,
        |  abs(n_sampled * 16 - n_exact) * 1000000 // n_exact
        |    AS err_uniform_ppm,
        |  abs(n_est_ratio - n_exact) * 1000000 // n_exact
        |    AS err_ratio_ppm
        |FROM t ORDER BY 1""".stripMargin,
    "agg_sketch_rollup" ->
      """SELECT day, n_events, n_users_exact, true AS est_ok FROM (
        |  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact
        |  FROM events GROUP BY 1
        |  UNION ALL
        |  SELECT 'TOTAL', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT user_id) AS BIGINT) FROM events
        |) ORDER BY day""".stripMargin,
    "sim_ann_lsh" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        | true AS all_probes_answered, true AS sims_exact
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "sim_ann_ivf" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "sim_pq_topk" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "sim_knn_graph" ->
      // the exact mutual-kNN edge count replays through the same
      // round-3 rank windows (rank by rounded sim DESC, dst — the
      // dedup_cosine-pinned stable currency); the IVF graph's
      // agreement enters as the bound booleans
      """WITH e AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst,
        |    round(CAST(list_cosine_similarity(a.embedding,
        |      b.embedding) AS DOUBLE), 3) AS sim
        |  FROM embeddings a JOIN embeddings b
        |    ON a.vec_id <> b.vec_id),
        |r AS (SELECT src, dst,
        |    ROW_NUMBER() OVER (PARTITION BY src
        |      ORDER BY sim DESC, dst) AS rk
        |  FROM e),
        |k AS (SELECT src, dst FROM r WHERE rk <= 5),
        |m AS (SELECT x.src FROM k x
        |  JOIN k y ON x.src = y.dst AND x.dst = y.src
        |  WHERE x.src < x.dst)
        |SELECT CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT)
        |    AS n_nodes,
        |  CAST(COUNT(*) AS BIGINT) AS n_edges_exact,
        |  true AS recall_ok, true AS precision_ok
        |FROM m""".stripMargin,
    "sim_ivfpq_topk" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "sim_quantize" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vectors, true AS recon_ok
        |FROM embeddings""".stripMargin,
    "sim_pca" ->
      """SELECT CAST(count(*) * 8 AS BIGINT) AS n_proj_rows,
        | true AS orthonormal_ok, true AS eigs_desc_ok,
        | true AS var_matches_eig FROM embeddings""".stripMargin,
    "sim_nn_descent" ->
      // laws only: monotone is a theorem (top-k of a superset),
      // found_any measured true with margin at both verify sfs;
      // the raw hit counts are spec-asserted (IVF-dependent)
      """SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |  true AS monotone_ok, true AS found_any
        |FROM embeddings WHERE vec_id < 8 ORDER BY 1""".stripMargin,
    "sim_mrl_energy" ->
      // same quantized per-element energies, same div-ppm laws
      """WITH el AS (SELECT vec_id,
        |    CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000)
        |      AS BIGINT) AS xq
        |  FROM embeddings),
        |pv AS (SELECT vec_id,
        |    CAST(SUM(CASE WHEN pos < 4 THEN xq * xq ELSE 0 END)
        |      AS BIGINT) AS e4,
        |    CAST(SUM(CASE WHEN pos < 16 THEN xq * xq ELSE 0 END)
        |      AS BIGINT) AS e16,
        |    CAST(SUM(xq * xq) AS BIGINT) AS e64
        |  FROM el GROUP BY 1),
        |lv AS (SELECT vec_id, 4 AS dim_level, e4 AS e_d, e64 AS e_full
        |    FROM pv
        |  UNION ALL SELECT vec_id, 16, e16, e64 FROM pv
        |  UNION ALL SELECT vec_id, 64, e64, e64 FROM pv),
        |r AS (SELECT dim_level, e_d * 1000000 // e_full AS ppm
        |  FROM lv WHERE e_full > 0)
        |SELECT CAST(dim_level AS INT) AS dim_level,
        |  CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  CAST(SUM(ppm) // COUNT(*) AS BIGINT) AS mean_retained_ppm,
        |  CAST(MIN(ppm) AS BIGINT) AS min_retained_ppm,
        |  CAST(MAX(ppm) AS BIGINT) AS max_retained_ppm,
        |  CAST(SUM(CASE WHEN ppm >= 990000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_above_99pct
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_clusters" -> ccClustersOracle,
    "p_split_leakage_safe" -> leakageSplitOracle,
    "dedup_keep_best" -> keepBestOracle,
    // the star-alternation variant computes the SAME clusters
    "dedup_clusters_star" -> ccClustersOracle,
    "text_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win
        |      || ' ' || lead(w,3) OVER win || ' ' || lead(w,4) OVER win
        |      || ' ' || lead(w,5) OVER win || ' ' || lead(w,6) OVER win
        |      || ' ' || lead(w,7) OVER win AS s
        |  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        |  QUALIFY lead(w,7) OVER win IS NOT NULL),
        |bench AS (SELECT doc_id AS bench_doc, s FROM sh
        |          WHERE doc_id % 25 = 0),
        |train AS (SELECT doc_id, s FROM sh WHERE doc_id % 25 <> 0)
        |SELECT t.doc_id,
        |  CAST(COUNT(DISTINCT t.s) AS BIGINT) AS n_shared_ngrams,
        |  CAST(COUNT(DISTINCT b.bench_doc) AS BIGINT) AS n_bench_docs
        |FROM train t JOIN bench b ON t.s = b.s
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_dup_coverage" ->
      // same distinct (doc, 8-gram) space joined verbatim on the
      // shingle string; coverage via the declared div-ppm law
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |sg AS (SELECT DISTINCT doc_id,
        |    array_to_string(ts[i : i + 7], ' ') AS sh
        |  FROM (SELECT doc_id, ts,
        |          unnest(generate_series(1, len(ts) - 7)) AS i
        |        FROM t WHERE len(ts) >= 8)),
        |df AS (SELECT sh, CAST(COUNT(*) AS BIGINT) AS df
        |  FROM sg GROUP BY 1)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |  CAST(COUNT(*) FILTER (df > 1) AS BIGINT) AS n_dup,
        |  CAST(COUNT(*) FILTER (df > 1) * 1000000 // COUNT(*)
        |    AS BIGINT) AS dup_ppm
        |FROM sg JOIN df USING (sh)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_phrase_search" ->
      // independent path: direct 3-window slide over each document's
      // token array — proves the index probe equals a corpus scan
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |tri AS (SELECT doc_id, array_to_string(ts[i : i + 2], ' ')
        |      AS phrase
        |  FROM (SELECT doc_id, ts,
        |          unnest(generate_series(1, len(ts) - 2)) AS i
        |        FROM t WHERE len(ts) >= 3)),
        |top AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM tri GROUP BY 1 ORDER BY n_occ DESC, phrase LIMIT 10)
        |SELECT phrase, n_occ, n_docs FROM top
        |ORDER BY n_occ DESC, phrase""".stripMargin,
    "text_oov_rate" ->
      // same tokenizer, same (count desc, token) vocab cut, same
      // div-ppm law
      """WITH tf AS (SELECT doc_id, tok AS token,
        |    CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |      unnest(string_split_regex(trim(lower(text)), '\s+'))
        |        AS tok
        |    FROM documents) GROUP BY 1, 2),
        |vocab AS (SELECT token FROM (
        |    SELECT token, SUM(tf) AS cnt FROM tf GROUP BY 1
        |    ORDER BY cnt DESC, token LIMIT 16))
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.token IS NULL THEN tf ELSE 0 END)
        |    AS BIGINT) AS n_oov,
        |  CAST(SUM(CASE WHEN v.token IS NULL THEN tf ELSE 0 END)
        |    * 1000000 // SUM(tf) AS BIGINT) AS oov_ppm
        |FROM tf LEFT JOIN vocab v ON tf.token = v.token
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_dup_spans" ->
      // same positional shingles, cross-doc df, islands merge
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |sg AS (SELECT doc_id, i AS pos,
        |    array_to_string(ts[i : i + 7], ' ') AS sh
        |  FROM (SELECT doc_id, ts,
        |          unnest(generate_series(1, len(ts) - 7)) AS i
        |        FROM t WHERE len(ts) >= 8)),
        |df AS (SELECT sh, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM sg GROUP BY 1),
        |dup AS (SELECT doc_id, pos FROM sg JOIN df USING (sh)
        |  WHERE df.df > 1),
        |g AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
        |      AS grp
        |  FROM dup)
        |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
        |  CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
        |  CAST(MAX(pos) + 7 - MIN(pos) + 1 AS BIGINT) AS span_tokens
        |FROM g GROUP BY doc_id, grp
        |ORDER BY doc_id, span_start""".stripMargin,
    "text_diversity" ->
      // same pooled term frequencies; both div-ppm laws replayed
      """WITH tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |      unnest(string_split_regex(trim(lower(text)), '\s+'))
        |        AS tok
        |    FROM documents) GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(tf * tf) AS BIGINT) AS sum_c2,
        |  CAST((SUM(tf) * SUM(tf) - SUM(tf * tf)) * 1000000
        |    // (SUM(tf) * SUM(tf)) AS BIGINT) AS simpson_ppm,
        |  CAST(COUNT(*) * 1000000 // SUM(tf) AS BIGINT) AS ttr_ppm
        |FROM tf GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
        |          FROM tf GROUP BY 1),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
        |    CAST(tf.tf AS DOUBLE) * n.n_docs / dfreq.df AS tfidf
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n)
        |SELECT doc_id, CAST(rank AS INT) AS rank, token, tf, df, tfidf
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |        ORDER BY tfidf DESC, token) AS rank FROM scored)
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "text_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
        |       FROM tf GROUP BY 1),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |              CAST(SUM(dl) AS BIGINT) AS total_len FROM dl),
        |q(query_id, token) AS (VALUES
        |  ('q1', 'hash'), ('q1', 'join'),
        |  ('q2', 'vector'), ('q2', 'scan'), ('q2', 'filter'),
        |  ('q3', 'spark'), ('q3', 'stream')),
        |dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf
        |        WHERE token IN (SELECT token FROM q) GROUP BY 1),
        |sc AS (SELECT q.query_id, tf.doc_id,
        |    CAST(round(((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
        |      * (tf.tf * 2.2)
        |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
        |          / (CAST(st.total_len AS DOUBLE) / st.n_docs)))
        |      * 1e6) AS BIGINT) AS s
        |  FROM tf JOIN q USING (token) JOIN dfq USING (token)
        |    JOIN dl USING (doc_id) CROSS JOIN st),
        |agg AS (SELECT query_id, doc_id, SUM(s) AS ssum
        |        FROM sc GROUP BY 1, 2)
        |SELECT query_id, CAST(rank AS INT) AS rank, doc_id,
        |  ssum / 1e6 AS score
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY ssum DESC, doc_id) AS rank FROM agg)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "text_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |bg AS (SELECT doc_id, w AS w1,
        |         lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
        |       FROM toks),
        |b AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
        |c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
        |       FROM b GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
        |       FROM b GROUP BY 1),
        |sc AS (SELECT b.doc_id,
        |    CAST(round((CAST(c2.c2 AS DOUBLE) / c1.c1) * 1e6) AS BIGINT)
        |      AS s
        |  FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  SUM(s) / (COUNT(*) * 1e6) AS avg_p
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_ppl_buckets" ->
      // lmScore's exact rational mean, a rank window on it (desc,
      // doc_id tie-break — the same doubles both engines derive from
      // exact integers), and the integer tercile law
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |bg AS (SELECT doc_id, w AS w1,
        |         lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
        |       FROM toks),
        |b AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
        |c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
        |       FROM b GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
        |       FROM b GROUP BY 1),
        |sc AS (SELECT b.doc_id,
        |    CAST(round((CAST(c2.c2 AS DOUBLE) / c1.c1) * 1e6) AS BIGINT)
        |      AS s
        |  FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
        |d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    SUM(s) / (COUNT(*) * 1e6) AS avg_p
        |  FROM sc GROUP BY 1),
        |r AS (SELECT doc_id, n_bigrams, avg_p,
        |    CAST(ROW_NUMBER() OVER (ORDER BY avg_p DESC, doc_id)
        |      AS BIGINT) AS lm_rank,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM d)
        |SELECT doc_id, n_bigrams, avg_p, lm_rank,
        |  CASE (lm_rank - 1) * 3 // n WHEN 0 THEN 'head'
        |    WHEN 1 THEN 'middle' ELSE 'tail' END AS ppl_bucket
        |FROM r ORDER BY doc_id""".stripMargin,
    "dedup_incremental" ->
      """WITH d AS (SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |delta AS (SELECT * FROM d WHERE doc_id % 5 = 0),
        |hist AS (SELECT * FROM d WHERE doc_id % 5 <> 0),
        |ex AS (SELECT delta.doc_id, MIN(hist.doc_id) AS e_id
        |       FROM delta JOIN hist USING (fp) GROUP BY 1),
        |toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win AS s
        |  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        |  QUALIFY lead(w,2) OVER win IS NOT NULL),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |jc AS (
        |  SELECT a.doc_id AS doc_id, b.doc_id AS hist_id,
        |    count(*) / (na.n + nb.n - count(*)) AS j
        |  FROM sh a JOIN sh b ON a.s = b.s
        |    AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
        |  JOIN sz na ON na.doc_id = a.doc_id
        |  JOIN sz nb ON nb.doc_id = b.doc_id
        |  GROUP BY 1, 2, na.n, nb.n
        |  HAVING count(*) / (na.n + nb.n - count(*)) >= 0.5),
        |nr AS (SELECT doc_id, MIN(hist_id) AS near_id,
        |         arg_min(j, hist_id) AS near_j
        |       FROM jc GROUP BY 1)
        |SELECT delta.doc_id,
        |  CASE WHEN ex.e_id IS NOT NULL THEN 'exact'
        |       WHEN nr.near_id IS NOT NULL THEN 'near'
        |       ELSE 'new' END AS verdict,
        |  COALESCE(ex.e_id, nr.near_id) AS match_doc_id,
        |  CASE WHEN ex.e_id IS NULL THEN nr.near_j END AS jaccard
        |FROM delta LEFT JOIN ex USING (doc_id) LEFT JOIN nr USING (doc_id)
        |ORDER BY delta.doc_id""".stripMargin,
    // exact cross (delta->history) near-pair count + delta size
    // replayed; precision-1 (exact-verified candidates) and the
    // banded recall bound are deterministic under the fixed seeds —
    // oracle: literal true (same discipline as the recall assertion
    // queries). Shared by both LSH forms — the persisted bucketed
    // index changes the plan, never the result.
    "dedup_incremental_lsh" -> lshAuditOracle,
    "dedup_lsh_index" -> lshAuditOracle,
    "j_bloom_semi" ->
      // the bloom prefilter is exact end-to-end (false positives die
      // in the verify semi join, false negatives can't exist), so the
      // oracle is simply the plain EXISTS semi join
      """SELECT o_orderkey, o_custkey FROM orders d
        |WHERE o_orderdate >= DATE '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM orders h
        |    WHERE h.o_orderdate < DATE '1997-01-01'
        |      AND h.o_custkey = d.o_custkey)
        |ORDER BY 1""".stripMargin,
    "text_token_mixture" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT)
        |      AS n_tokens,
        |    (doc_id * 2654435761) % 1000000007 AS mix,
        |    CASE WHEN source = 'src0' THEN 1200
        |         WHEN source = 'src1' THEN 400 ELSE 800 END AS budget
        |  FROM documents)
        |SELECT doc_id, source, n_tokens,
        |  CAST(cum_tokens AS BIGINT) AS cum_tokens, budget
        |FROM (SELECT *, SUM(n_tokens) OVER (PARTITION BY source
        |        ORDER BY mix ROWS UNBOUNDED PRECEDING) AS cum_tokens
        |      FROM t)
        |WHERE cum_tokens - n_tokens < budget
        |ORDER BY doc_id""".stripMargin,
    "text_quality_filter" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT)
        |      AS n_words,
        |    CAST(len(list_distinct(string_split_regex(trim(lower(text)),
        |      '\s+'))) AS INT) AS n_distinct_words
        |  FROM documents),
        |sc AS (SELECT doc_id, source,
        |    round(0.5 * (n_distinct_words / n_words) +
        |      0.5 * least(n_words / 100.0, 1.0), 4) AS quality_score
        |  FROM t)
        |SELECT doc_id, source, quality_score, q_rank
        |FROM (SELECT *, percent_rank() OVER (PARTITION BY source
        |        ORDER BY quality_score, doc_id) AS q_rank,
        |        COUNT(*) OVER (PARTITION BY source) AS n_src FROM sc)
        |WHERE q_rank >= 0.5 OR n_src = 1
        |ORDER BY doc_id""".stripMargin,
    "text_dsir_resample" ->
      // full replay: bigram models from the tokenized stream, scaled-
      // integer mean-probability sums (n cancels in the ratio), the
      // Knuth-hash A-ES keys, and the identical top-32 draw
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |bgr AS (SELECT doc_id, w AS w1,
        |         lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
        |       FROM toks),
        |b AS (SELECT doc_id, w1, w2 FROM bgr WHERE w2 IS NOT NULL),
        |tb AS (SELECT b.doc_id, b.w1, b.w2 FROM b
        |       JOIN documents d ON b.doc_id = d.doc_id
        |       WHERE d.lang = 'en'),
        |p2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2p
        |       FROM b GROUP BY 1, 2),
        |p1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1p
        |       FROM b GROUP BY 1),
        |t2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2t
        |       FROM tb GROUP BY 1, 2),
        |t1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1t
        |       FROM tb GROUP BY 1),
        |v AS (SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v_sz FROM b),
        |sums AS (SELECT b.doc_id,
        |    CAST(SUM(CAST(round(CAST(p2.c2p + 1 AS DOUBLE)
        |      / (p1.c1p + v.v_sz) * 1e6) AS BIGINT)) AS BIGINT) AS s_p,
        |    CAST(SUM(CAST(round(CAST(COALESCE(t2.c2t, 0) + 1 AS DOUBLE)
        |      / (COALESCE(t1.c1t, 0) + v.v_sz) * 1e6) AS BIGINT))
        |      AS BIGINT) AS s_t
        |  FROM b JOIN p2 USING (w1, w2) JOIN p1 USING (w1)
        |    LEFT JOIN t2 USING (w1, w2) LEFT JOIN t1 USING (w1)
        |    CROSS JOIN v
        |  GROUP BY 1),
        |w0 AS (SELECT doc_id, s_t, s_p,
        |    CAST(s_t AS DOUBLE) / s_p AS weight FROM sums),
        |w2 AS (SELECT *, weight * weight AS ww2 FROM w0),
        |w4 AS (SELECT *, ww2 * ww2 AS ww4 FROM w2),
        |w8 AS (SELECT *, ww4 * ww4 AS ww8 FROM w4),
        |keyed AS (SELECT doc_id, s_t, s_p, weight,
        |    ln((CAST(((doc_id % 2147483648) * 2654435761) % 4294967296
        |          AS DOUBLE) + 1.0) / 4294967297.0)
        |      / greatest(ww8 * ww8, 1e-6) AS es_key
        |  FROM w8),
        |ranked AS (SELECT *, row_number() OVER (ORDER BY es_key DESC,
        |    doc_id) AS rk FROM keyed)
        |SELECT CAST(rk AS BIGINT) AS rk, doc_id, s_t, s_p, weight
        |FROM ranked WHERE rk <= 32 ORDER BY rk""".stripMargin,
    "text_resample" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(CASE WHEN source = 'src0' THEN 2.5
        |              WHEN source = 'src1' THEN 0.5
        |              ELSE 1.0 END AS DOUBLE) AS weight,
        |    (doc_id * 2654435761) % 100 AS bucket
        |  FROM documents),
        |c AS (SELECT doc_id, source, weight,
        |    CAST(floor(weight) + CASE WHEN bucket <
        |      (weight - floor(weight)) * 100 THEN 1 ELSE 0 END AS INT)
        |      AS n_copies
        |  FROM t)
        |SELECT doc_id, source, weight, n_copies, CAST(epoch AS INT) AS epoch
        |FROM (SELECT doc_id, source, weight, n_copies,
        |        unnest(generate_series(1, n_copies)) AS epoch
        |      FROM c WHERE n_copies > 0)
        |ORDER BY doc_id, epoch""".stripMargin,
    "text_unicode_norm" ->
      // identical decomposed bytes built in DuckDB (chr(769)/chr(771)
      // are the combining acute/tilde), replayed through its own NFC
      """SELECT doc_id,
        | CAST(length(d_txt) AS INT) AS n_before,
        | CAST(length(nfc_normalize(d_txt)) AS INT) AS n_after,
        | md5(nfc_normalize(d_txt)) AS fp,
        | CAST(length(nfc_normalize(d_txt)) < length(d_txt) AS INT)
        |   AS composed
        |FROM (SELECT doc_id,
        |  substring(text, 1, 20) || 'e' || chr(769) || 'n' || chr(771)
        |    AS d_txt FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "text_token_budget" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT)
        |      AS n_tokens,
        |    CAST(len(list_distinct(string_split_regex(trim(lower(text)),
        |      '\s+'))) AS INT) AS n_distinct_words
        |  FROM documents),
        |q AS (SELECT doc_id, source, n_tokens,
        |    round(0.5 * (n_distinct_words / n_tokens) +
        |      0.5 * least(n_tokens / 100.0, 1.0), 4) AS quality_score
        |  FROM t),
        |c AS (SELECT doc_id, source, n_tokens, quality_score,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY quality_score DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM q)
        |SELECT doc_id, source, n_tokens, quality_score, cum_tokens
        |FROM c WHERE cum_tokens <= 600
        |ORDER BY doc_id""".stripMargin,
    "text_span_dedup" ->
      """WITH d AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |s0 AS (SELECT doc_id, ws,
        |    CAST(ceil(len(ws) / 10.0) AS INT) AS n_spans FROM d),
        |sp AS (SELECT doc_id, n_spans,
        |    unnest(list_transform(range(n_spans),
        |      i -> array_to_string(ws[i*10+1 : i*10+10], ' '))) AS span,
        |    CAST(unnest(range(n_spans)) AS INT) AS span_idx
        |  FROM s0),
        |k AS (SELECT doc_id, span_idx, span FROM
        |    (SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(span)
        |        ORDER BY doc_id, span_idx) AS rn FROM sp)
        |  WHERE rn = 1),
        |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |    string_agg(span, ' ' ORDER BY span_idx) AS clean_text
        |  FROM k GROUP BY doc_id)
        |SELECT s0.doc_id, n_spans, COALESCE(n_kept, 0) AS n_kept,
        |  (n_spans - COALESCE(n_kept, 0)) / n_spans AS dup_span_frac,
        |  COALESCE(clean_text, '') AS clean_text
        |FROM s0 LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH b AS (SELECT doc_id, ws,
        |    list_transform(list_zip(ws[1:len(ws)-1], ws[2:len(ws)]),
        |      s -> s[1] || ' ' || s[2]) AS bgs
        |  FROM (SELECT doc_id,
        |          string_split_regex(trim(lower(text)), '\s+') AS ws
        |        FROM documents)),
        |wx AS (SELECT doc_id, MAX(c) AS top_word_n FROM
        |    (SELECT doc_id, word, COUNT(*) AS c
        |     FROM (SELECT doc_id, unnest(ws) AS word FROM b)
        |     GROUP BY 1, 2) GROUP BY 1),
        |bx AS (SELECT doc_id, MAX(c) AS top_bigram_n FROM
        |    (SELECT doc_id, bg, COUNT(*) AS c
        |     FROM (SELECT doc_id, unnest(bgs) AS bg FROM b)
        |     GROUP BY 1, 2) GROUP BY 1)
        |SELECT b.doc_id, CAST(len(ws) AS INT) AS n_words,
        |  CAST(top_word_n AS INT) AS top_word_n,
        |  CAST(len(bgs) AS INT) AS n_bigrams,
        |  CAST(COALESCE(top_bigram_n, 0) AS INT) AS top_bigram_n,
        |  top_word_n / len(ws) AS top_word_frac,
        |  CASE WHEN len(bgs) = 0 THEN 0.0
        |       ELSE top_bigram_n / len(bgs) END AS top_bigram_frac,
        |  CAST(top_word_n / len(ws) <= 0.2 AND
        |    (CASE WHEN len(bgs) = 0 THEN 0.0
        |          ELSE top_bigram_n / len(bgs) END) <= 0.18 AS INT)
        |    AS pass_repetition
        |FROM b JOIN wx USING (doc_id) LEFT JOIN bx USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_gopher_quality" ->
      """SELECT doc_id, n_words, sum_word_len, n_symbol_chars,
        |  n_chars_calc, n_alpha_words, stopword_n,
        |  sum_word_len / n_words AS mean_word_len,
        |  n_symbol_chars / n_chars_calc AS symbol_ratio,
        |  n_alpha_words / n_words AS alpha_word_frac,
        |  CAST(n_words BETWEEN 10 AND 1000 AND
        |    sum_word_len / n_words BETWEEN 2.0 AND 12.0 AND
        |    n_symbol_chars / n_chars_calc < 0.1 AND
        |    n_alpha_words / n_words > 0.8 AND
        |    stopword_n >= 1 AS INT) AS pass_gopher
        |FROM (SELECT doc_id,
        |  CAST(len(ws) AS INT) AS n_words,
        |  CAST(list_sum(list_transform(ws, w -> length(w))) AS INT)
        |    AS sum_word_len,
        |  CAST(length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g'))
        |    AS INT) AS n_symbol_chars,
        |  CAST(length(text) AS INT) AS n_chars_calc,
        |  CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
        |    AS INT) AS n_alpha_words,
        |  CAST(len(regexp_extract_all(text, '\b(the|a|of)\b')) AS INT)
        |    AS stopword_n
        |  FROM (SELECT doc_id, text,
        |          string_split_regex(trim(lower(text)), '\s+') AS ws
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "sim_centroids" ->
      """SELECT label, CAST(dim AS INT) AS dim,
        |  SUM(CAST(round(CAST(v AS DOUBLE) * 1e6) AS BIGINT))
        |    / (COUNT(*) * 1e6) AS centroid,
        |  CAST(COUNT(*) AS BIGINT) AS n_vecs
        |FROM (SELECT label, unnest(embedding) AS v,
        |        unnest(range(len(embedding))) AS dim
        |      FROM embeddings)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    "sim_outlier_gate" ->
      // same 1e3 scaled-integer law, same n·x − Σx residuals (BIGINT
      // throughout; the fourth-power moments ride HUGEINT), same
      // squared 3σ comparison in doubles derived from exact sums
      """WITH x AS (SELECT vec_id, label,
        |    unnest(range(len(embedding))) AS dim,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e3)
        |      AS BIGINT) AS xs
        |  FROM embeddings),
        |st AS (SELECT label, dim, CAST(SUM(xs) AS BIGINT) AS s1,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM x GROUP BY 1, 2),
        |d2 AS (SELECT vec_id, x.label,
        |    CAST(SUM((n * xs - s1) * (n * xs - s1)) AS BIGINT) AS d2s
        |  FROM x JOIN st ON x.label = st.label AND x.dim = st.dim
        |  GROUP BY 1, 2),
        |lb AS (SELECT label, COUNT(*) AS k,
        |    SUM(CAST(d2s AS HUGEINT)) AS t1,
        |    SUM(CAST(d2s AS HUGEINT) * d2s) AS t2
        |  FROM d2 GROUP BY 1),
        |z AS (SELECT vec_id, d2.label, d2s,
        |    CAST(t1 AS DOUBLE) / k AS mean_d2,
        |    CAST(t2 AS DOUBLE) / k -
        |      (CAST(t1 AS DOUBLE) / k) * (CAST(t1 AS DOUBLE) / k)
        |      AS var_d2
        |  FROM d2 JOIN lb ON d2.label = lb.label)
        |SELECT vec_id, label, d2s,
        |  CAST((d2s - mean_d2) * (d2s - mean_d2) > 9.0 * var_d2
        |    AS INT) AS is_outlier
        |FROM z ORDER BY vec_id""".stripMargin,
    "sim_kmeans" -> kmeansOracle,
    "sim_pq" -> pqOracle(4, 16, 16),
    "p_diverse_subset" ->
      s"""WITH km AS ($kmeansOracle),
        |q AS (SELECT doc_id, source,
        |    round(0.5 * (n_distinct_words / n_words) +
        |      0.5 * least(n_words / 100.0, 1.0), 4) AS quality_score
        |  FROM (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT)
        |      AS n_words,
        |    CAST(len(list_distinct(string_split_regex(trim(lower(text)),
        |      '\\s+'))) AS INT) AS n_distinct_words
        |  FROM documents))
        |SELECT cluster, CAST(rank AS INT) AS rank, doc_id, source,
        |  quality_score
        |FROM (SELECT km.cluster, q.doc_id, q.source, q.quality_score,
        |        ROW_NUMBER() OVER (PARTITION BY km.cluster
        |          ORDER BY q.quality_score DESC, q.doc_id) AS rank
        |      FROM q JOIN km ON q.doc_id = km.vec_id)
        |WHERE rank <= 3
        |ORDER BY cluster, rank""".stripMargin,
    "dedup_semantic" ->
      s"""WITH km AS ($kmeansOracle),
        |j AS (SELECT km.vec_id, km.cluster, km.dist_sq, e.embedding
        |      FROM km JOIN embeddings e USING (vec_id)),
        |p AS (SELECT a.vec_id AS va, a.dist_sq AS da,
        |             b.vec_id AS vb, b.dist_sq AS db
        |      FROM j a JOIN j b
        |        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |      WHERE round(CAST(list_cosine_similarity(a.embedding,
        |              b.embedding) AS DOUBLE), 3) >= 0.4),
        |drp AS (SELECT DISTINCT
        |          CASE WHEN da < db THEN va ELSE vb END AS vec_id
        |        FROM p)
        |SELECT km.vec_id, km.cluster,
        |  CAST(CASE WHEN drp.vec_id IS NULL THEN 1 ELSE 0 END AS INT)
        |    AS keep
        |FROM km LEFT JOIN drp USING (vec_id)
        |ORDER BY km.vec_id""".stripMargin,
    "text_holdout_split" ->
      """SELECT CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
        |  WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
        |  ELSE 'test' END AS split,
        | lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        | MIN(doc_id) AS min_doc_id
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_pii_scrub" ->
      """WITH dirty AS (
        |  SELECT doc_id, text || ' contact user' ||
        |    CAST(doc_id AS VARCHAR) || '@example.com or +1-555-01' ||
        |    CAST(doc_id AS VARCHAR) AS d
        |  FROM documents),
        |scrub AS (
        |  SELECT doc_id, d,
        |    regexp_replace(regexp_replace(d,
        |      '[a-z0-9._]+@[a-z0-9.]+\.[a-z]+', '[EMAIL]', 'g'),
        |      '\+1-555-[0-9]+', '[PHONE]', 'g') AS sc
        |  FROM dirty)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(d,
        |    '[a-z0-9._]+@[a-z0-9.]+\.[a-z]+')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(d, '\+1-555-[0-9]+')) AS INT)
        |    AS n_phones,
        |  CAST(len(d) AS INT) AS len_before,
        |  CAST(len(sc) AS INT) AS len_after,
        |  md5(sc) AS scrubbed_md5
        |FROM scrub ORDER BY doc_id""".stripMargin,
    "dedup_cosine" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        | round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 3) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 3)
        |      >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
    "sim_topk" ->
      """WITH s AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 3)
        |      AS sim
        |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 8)
        |SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, neighbor_id) AS rank FROM s)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "sim_hybrid_rrf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY 1, 2),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
        |          FROM tf GROUP BY 1),
        |ti AS (SELECT tf.doc_id, tf.token,
        |    CAST(tf.tf AS DOUBLE) * n.n_docs / dfreq.df AS tfidf
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
        |q AS (SELECT doc_id AS query_id, token FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, token) AS r
        |    FROM ti WHERE doc_id < 4) WHERE r <= 3),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
        |       FROM tf GROUP BY 1),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |              CAST(SUM(dl) AS BIGINT) AS total_len FROM dl),
        |dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf
        |        WHERE token IN (SELECT token FROM q) GROUP BY 1),
        |sc AS (SELECT q.query_id, tf.doc_id,
        |    CAST(round(((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
        |      * (tf.tf * 2.2)
        |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
        |          / (CAST(st.total_len AS DOUBLE) / st.n_docs)))
        |      * 1e6) AS BIGINT) AS s
        |  FROM tf JOIN q USING (token) JOIN dfq USING (token)
        |    JOIN dl USING (doc_id) CROSS JOIN st
        |  WHERE tf.doc_id <> q.query_id),
        |lexagg AS (SELECT query_id, doc_id AS cand_id, SUM(s) AS ssum
        |           FROM sc GROUP BY 1, 2),
        |lex AS (SELECT query_id, cand_id, CAST(r AS INT) AS lex_rank
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |          ORDER BY ssum DESC, cand_id) AS r FROM lexagg)
        |  WHERE r <= 20),
        |simsc AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
        |    round(CAST(list_cosine_similarity(a.embedding, b.embedding)
        |      AS DOUBLE), 3) AS sim
        |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 4),
        |sem AS (SELECT query_id, cand_id, CAST(r AS INT) AS sem_rank
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |          ORDER BY sim DESC, cand_id) AS r FROM simsc)
        |  WHERE r <= 20),
        |fused AS (SELECT COALESCE(lex.query_id, sem.query_id) AS query_id,
        |    COALESCE(lex.cand_id, sem.cand_id) AS cand_id,
        |    lex_rank, sem_rank,
        |    COALESCE(CAST(round(1e6 / (60 + lex_rank)) AS BIGINT), 0)
        |      + COALESCE(CAST(round(1e6 / (60 + sem_rank)) AS BIGINT), 0)
        |      AS fused
        |  FROM lex FULL JOIN sem
        |    ON lex.query_id = sem.query_id AND lex.cand_id = sem.cand_id)
        |SELECT query_id, CAST(r AS INT) AS rank, cand_id, fused,
        |  lex_rank, sem_rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY fused DESC, cand_id) AS r FROM fused)
        |WHERE r <= 5 ORDER BY query_id, rank""".stripMargin,
    "sim_mmr_rerank" ->
      """WITH pool0 AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
        |    CAST(round(CAST(list_cosine_similarity(a.embedding, b.embedding)
        |      AS DOUBLE) * 1000) AS BIGINT) AS rel_m
        |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 4),
        |pool AS (SELECT query_id, cand_id, rel_m FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY rel_m DESC, cand_id) AS r FROM pool0)
        |  WHERE r <= 20),
        |ps AS (SELECT p.query_id, p.cand_id AS a_cand, q.cand_id AS b_cand,
        |    CAST(round(CAST(list_cosine_similarity(ea.embedding, eb.embedding)
        |      AS DOUBLE) * 1000) AS BIGINT) AS sim_m
        |  FROM pool p JOIN pool q
        |    ON p.query_id = q.query_id AND p.cand_id <> q.cand_id
        |  JOIN embeddings ea ON ea.vec_id = p.cand_id
        |  JOIN embeddings eb ON eb.vec_id = q.cand_id),
        |s1 AS (SELECT query_id, cand_id, rel_m,
        |    CAST(0 AS BIGINT) AS maxsim_m, 700 * rel_m AS score_m
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |          ORDER BY 700 * rel_m DESC, cand_id) AS r FROM pool)
        |  WHERE r = 1),
        |m2 AS (SELECT ps.query_id, ps.a_cand AS cand_id,
        |    MAX(ps.sim_m) AS maxsim_m
        |  FROM ps JOIN s1 ON ps.query_id = s1.query_id
        |    AND ps.b_cand = s1.cand_id GROUP BY 1, 2),
        |s2 AS (SELECT query_id, cand_id, rel_m, maxsim_m, score_m FROM (
        |    SELECT p.query_id, p.cand_id, p.rel_m, m.maxsim_m,
        |      700 * p.rel_m - 300 * m.maxsim_m AS score_m,
        |      ROW_NUMBER() OVER (PARTITION BY p.query_id
        |        ORDER BY 700 * p.rel_m - 300 * m.maxsim_m DESC, p.cand_id)
        |        AS r
        |    FROM pool p JOIN m2 m USING (query_id, cand_id)
        |    WHERE NOT EXISTS (SELECT 1 FROM s1
        |      WHERE s1.query_id = p.query_id AND s1.cand_id = p.cand_id))
        |  WHERE r = 1),
        |sel2 AS (SELECT query_id, cand_id FROM s1
        |  UNION ALL SELECT query_id, cand_id FROM s2),
        |m3 AS (SELECT ps.query_id, ps.a_cand AS cand_id,
        |    MAX(ps.sim_m) AS maxsim_m
        |  FROM ps JOIN sel2 ON ps.query_id = sel2.query_id
        |    AND ps.b_cand = sel2.cand_id GROUP BY 1, 2),
        |s3 AS (SELECT query_id, cand_id, rel_m, maxsim_m, score_m FROM (
        |    SELECT p.query_id, p.cand_id, p.rel_m, m.maxsim_m,
        |      700 * p.rel_m - 300 * m.maxsim_m AS score_m,
        |      ROW_NUMBER() OVER (PARTITION BY p.query_id
        |        ORDER BY 700 * p.rel_m - 300 * m.maxsim_m DESC, p.cand_id)
        |        AS r
        |    FROM pool p JOIN m3 m USING (query_id, cand_id)
        |    WHERE NOT EXISTS (SELECT 1 FROM sel2
        |      WHERE sel2.query_id = p.query_id AND sel2.cand_id = p.cand_id))
        |  WHERE r = 1),
        |sel3 AS (SELECT query_id, cand_id FROM sel2
        |  UNION ALL SELECT query_id, cand_id FROM s3),
        |m4 AS (SELECT ps.query_id, ps.a_cand AS cand_id,
        |    MAX(ps.sim_m) AS maxsim_m
        |  FROM ps JOIN sel3 ON ps.query_id = sel3.query_id
        |    AND ps.b_cand = sel3.cand_id GROUP BY 1, 2),
        |s4 AS (SELECT query_id, cand_id, rel_m, maxsim_m, score_m FROM (
        |    SELECT p.query_id, p.cand_id, p.rel_m, m.maxsim_m,
        |      700 * p.rel_m - 300 * m.maxsim_m AS score_m,
        |      ROW_NUMBER() OVER (PARTITION BY p.query_id
        |        ORDER BY 700 * p.rel_m - 300 * m.maxsim_m DESC, p.cand_id)
        |        AS r
        |    FROM pool p JOIN m4 m USING (query_id, cand_id)
        |    WHERE NOT EXISTS (SELECT 1 FROM sel3
        |      WHERE sel3.query_id = p.query_id AND sel3.cand_id = p.cand_id))
        |  WHERE r = 1),
        |sel4 AS (SELECT query_id, cand_id FROM sel3
        |  UNION ALL SELECT query_id, cand_id FROM s4),
        |m5 AS (SELECT ps.query_id, ps.a_cand AS cand_id,
        |    MAX(ps.sim_m) AS maxsim_m
        |  FROM ps JOIN sel4 ON ps.query_id = sel4.query_id
        |    AND ps.b_cand = sel4.cand_id GROUP BY 1, 2),
        |s5 AS (SELECT query_id, cand_id, rel_m, maxsim_m, score_m FROM (
        |    SELECT p.query_id, p.cand_id, p.rel_m, m.maxsim_m,
        |      700 * p.rel_m - 300 * m.maxsim_m AS score_m,
        |      ROW_NUMBER() OVER (PARTITION BY p.query_id
        |        ORDER BY 700 * p.rel_m - 300 * m.maxsim_m DESC, p.cand_id)
        |        AS r
        |    FROM pool p JOIN m5 m USING (query_id, cand_id)
        |    WHERE NOT EXISTS (SELECT 1 FROM sel4
        |      WHERE sel4.query_id = p.query_id AND sel4.cand_id = p.cand_id))
        |  WHERE r = 1)
        |SELECT query_id, CAST(step AS INT) AS step, cand_id, rel_m,
        |  maxsim_m, score_m
        |FROM (
        |  SELECT *, 1 AS step FROM s1
        |  UNION ALL SELECT *, 2 AS step FROM s2
        |  UNION ALL SELECT *, 3 AS step FROM s3
        |  UNION ALL SELECT *, 4 AS step FROM s4
        |  UNION ALL SELECT *, 5 AS step FROM s5)
        |ORDER BY query_id, step""".stripMargin,
    "sim_hard_negatives" ->
      """WITH s AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS negative_id,
        |    round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 3)
        |      AS sim
        |  FROM embeddings a JOIN embeddings b
        |    ON b.vec_id <> a.vec_id AND b.label <> a.label
        |  WHERE a.vec_id < 8)
        |SELECT query_id, negative_id, sim, CAST(rank AS INT) AS rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, negative_id) AS rank FROM s)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "text_lang_id" ->
      """SELECT doc_id, labeled_lang, s_en, s_zh, s_de,
        | CASE WHEN s_en >= s_zh AND s_en >= s_de THEN 'en'
        |      WHEN s_zh >= s_de THEN 'zh' ELSE 'de' END AS predicted_lang
        |FROM (SELECT doc_id, lang AS labeled_lang,
        |  CAST(len(regexp_extract_all(text, '\b(the|a|of)\b')) AS INT)
        |    AS s_en,
        |  CAST(len(regexp_extract_all(text, '\b(data|query|row)\b')) AS INT)
        |    AS s_zh,
        |  CAST(len(regexp_extract_all(text, '\b(fast|slow|small)\b')) AS INT)
        |    AS s_de
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """SELECT doc_id, n_chars_calc, n_words, n_distinct_words,
        | n_distinct_words / n_words AS distinct_ratio,
        | round(0.5 * (n_distinct_words / n_words) +
        |   0.5 * least(n_words / 100.0, 1.0), 4) AS quality_score
        |FROM (SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars_calc,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT)
        |    AS n_words,
        |  CAST(len(list_distinct(string_split_regex(trim(lower(text)),
        |    '\s+'))) AS INT) AS n_distinct_words
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        | CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT)
        |   AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))
        |   AS INT) AS bpe_ish_tokens,
        | round(length(text) /
        |   len(string_split_regex(trim(lower(text)), '\s+')), 2)
        |   AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """WITH fp AS (SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |      AS fingerprint
        |  FROM documents)
        |SELECT doc_id, fingerprint, CAST(cnt AS BIGINT) AS n_same
        |FROM fp JOIN (SELECT fingerprint AS f2, COUNT(*) AS cnt
        |              FROM fp GROUP BY 1) g ON fingerprint = f2
        |ORDER BY doc_id""".stripMargin,
    "text_vocab" ->
      """SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split_regex(trim(lower(text)),
        |        '\s+')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,
    "text_vocab_growth" ->
      // same value-range decile law (integer floor; Spark's double
      // truncate agrees — quotient <= 10 so fp error ~1e-15 << 1/den)
      """WITH b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi
        |  FROM documents),
        |toks AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY 1, 2),
        |dp AS (SELECT CAST((doc_id - b.lo) * 10 // (b.hi - b.lo + 1)
        |      AS INT) + 1 AS decile,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents CROSS JOIN b GROUP BY 1),
        |tp AS (SELECT CAST((doc_id - b.lo) * 10 // (b.hi - b.lo + 1)
        |      AS INT) + 1 AS decile,
        |    CAST(SUM(tf) AS BIGINT) AS n_tokens
        |  FROM tf CROSS JOIN b GROUP BY 1),
        |ft AS (SELECT token, MIN(doc_id) AS first_doc FROM tf GROUP BY 1),
        |nt AS (SELECT CAST((first_doc - b.lo) * 10 // (b.hi - b.lo + 1)
        |      AS INT) + 1 AS decile,
        |    CAST(COUNT(*) AS BIGINT) AS new_types
        |  FROM ft CROSS JOIN b GROUP BY 1),
        |pd AS (SELECT dp.decile, dp.n_docs, tp.n_tokens,
        |    COALESCE(nt.new_types, 0) AS new_types
        |  FROM dp JOIN tp USING (decile) LEFT JOIN nt USING (decile))
        |SELECT p.decile, p.n_docs, p.n_tokens, p.new_types,
        |  CAST((SELECT SUM(q.new_types) FROM pd q
        |        WHERE q.decile <= p.decile) AS BIGINT) AS vocab_cumulative
        |FROM pd p ORDER BY p.decile""".stripMargin,
    "text_collocations" ->
      // same staged integer ratio ((n_ab·1e6 div n_a)·N div n_b) and
      // the same (ratio desc, w1, w2) total order
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |bgr AS (SELECT doc_id, w AS w1,
        |    lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
        |  FROM toks),
        |b AS (SELECT w1, w2 FROM bgr WHERE w2 IS NOT NULL),
        |ab AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM b GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |la AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS n_a
        |  FROM b GROUP BY 1),
        |rb AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_b
        |  FROM b GROUP BY 1),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM b)
        |SELECT ab.w1, ab.w2, ab.n_ab, la.n_a, rb.n_b,
        |  CAST(((ab.n_ab * 1000000 // la.n_a) * nt.n_total) // rb.n_b
        |    AS BIGINT) AS pmi_ratio_ppm
        |FROM ab JOIN la USING (w1) JOIN rb USING (w2) CROSS JOIN nt
        |ORDER BY pmi_ratio_ppm DESC, w1, w2 LIMIT 50""".stripMargin,
    "text_bigrams" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |bg AS (
        |  SELECT w || ' ' || lead(w, 1) OVER
        |    (PARTITION BY doc_id ORDER BY i) AS bigram
        |  FROM toks QUALIFY bigram IS NOT NULL)
        |SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
        |FROM bg GROUP BY 1 ORDER BY n DESC, bigram LIMIT 50""".stripMargin,
    "text_kn_bigram" ->
      // same one-bigram-table derivation; DuckDB's decimal literals
      // stay exact here because the 0.75 discount is dyadic (c−0.75
      // and 0.75·n land on exactly-representable doubles), and `/`
      // promotes to DOUBLE — five IEEE ops in the same tree
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |bg AS (
        |  SELECT w AS w1, lead(w, 1) OVER
        |    (PARTITION BY doc_id ORDER BY i) AS w2
        |  FROM toks QUALIFY w2 IS NOT NULL),
        |bc AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |lf AS (SELECT w1, SUM(c) AS cw1, COUNT(*) AS n1w1
        |  FROM bc GROUP BY 1),
        |ct AS (SELECT w2, COUNT(*) AS n1cont FROM bc GROUP BY 1),
        |bt AS (SELECT COUNT(*) AS bt FROM bc)
        |SELECT w1, w2, CAST(c AS BIGINT) AS c,
        |  (c - 0.75) / cw1 + ((0.75 * n1w1) / cw1) * (n1cont / bt)
        |    AS p_kn
        |FROM bc JOIN lf USING (w1) JOIN ct USING (w2), bt
        |WHERE c >= 5 ORDER BY w1, w2""".stripMargin,
    "text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents WHERE length(trim(text)) > 0),
        |e AS (
        |  SELECT doc_id, ts,
        |    unnest(generate_series(0,
        |      CAST(ceil(len(ts) / 40.0) AS INT) - 1)) AS i
        |  FROM t)
        |SELECT doc_id, CAST(i AS INT) AS chunk_no,
        |  CAST(len(ts[i*40+1 : least(i*40+50, len(ts))]) AS INT)
        |    AS n_chunk_tokens,
        |  md5(array_to_string(ts[i*40+1 : least(i*40+50, len(ts))], ' '))
        |    AS chunk_md5
        |FROM e ORDER BY doc_id, chunk_no""".stripMargin,
    "text_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    coalesce(CAST(SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cum_before
        |  FROM t)
        |SELECT doc_id, source, n_tokens, cum_before,
        |  cum_before // 512 AS bin_first,
        |  (cum_before + n_tokens - 1) // 512 AS bin_last,
        |  CAST(cum_before // 512 <>
        |    (cum_before + n_tokens - 1) // 512 AS INT) AS spans_boundary
        |FROM c ORDER BY doc_id""".stripMargin,
    "mm_decode_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        | CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        | CAST(doc_id % 480 AS INT) AS height,
        | CASE CAST(octet_length(encode(text)) % 3 AS INT)
        |   WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
        | hex(encode(substr(text, 1, 8))) AS head_hex,
        | CAST(octet_length(encode(text)) // 16 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        | CAST(doc_id % 480 AS INT) AS height,
        | CAST((octet_length(encode(text)) % 640) // 2 AS INT) AS out_width,
        | CAST((doc_id % 480) // 2 AS INT) AS out_height,
        | CAST((octet_length(encode(text)) + 3) // 4 AS INT)
        |   AS n_sample_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_shard_plan" ->
      // same prefix-sum div assignment (bytes BEFORE the item over
      // the per-source doc order), same shard-grain rollup
      """WITH sz AS (SELECT source, doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |pre AS (SELECT source, doc_id, n_bytes,
        |    SUM(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_bytes AS before
        |  FROM sz)
        |SELECT source, CAST(before // 32768 AS BIGINT) AS shard_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
        |  CAST(MIN(doc_id) AS BIGINT) AS doc_lo,
        |  CAST(MAX(doc_id) AS BIGINT) AS doc_hi
        |FROM pre GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "p_epoch_shuffle" ->
      // same manifest derivation, same dense index g (shard_id, sk
      // order), same multiplicative permutation law, rank replayed
      // per epoch (h, then source:shard tie-break)
      """WITH sz AS (SELECT source, doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |pre AS (SELECT source, doc_id, n_bytes,
        |    SUM(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_bytes AS before
        |  FROM sz),
        |man AS (SELECT DISTINCT source,
        |    CAST(before // 32768 AS BIGINT) AS shard_id,
        |    source || ':' || CAST(before // 32768 AS BIGINT) AS sk
        |  FROM pre),
        |gi AS (SELECT source, shard_id, sk,
        |    CAST(ROW_NUMBER() OVER (ORDER BY shard_id, sk) AS BIGINT)
        |      AS g
        |  FROM man),
        |e(epoch) AS (VALUES (1), (2), (3)),
        |k AS (SELECT epoch, source, shard_id, sk,
        |    ((g * 3 + epoch) * 2654435761) % 1000000007 AS h
        |  FROM gi CROSS JOIN e)
        |SELECT epoch, source, shard_id, CAST(h AS BIGINT) AS h,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch
        |    ORDER BY h, sk) AS BIGINT) AS position
        |FROM k ORDER BY epoch, position""".stripMargin,
    "mm_payload_neardup" ->
      // candidates: the quantized byte-histogram rank hash replayed
      // bit-for-bit (same LCG index pairs, 1-based lists, BIGINT bit
      // sums); verify: 3-gram Jaccard restricted to the candidates
      """WITH cc AS (
        |  SELECT doc_id,
        |    list_transform(range(26), i -> (length(text) -
        |      length(replace(text, chr(CAST(97 + i AS INT)), ''))) // 8)
        |      AS cs
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(60), k ->
        |      CASE WHEN cs[CAST(1 + ((k+1) * 2654435761) % 26 AS INT)] >
        |                cs[CAST(1 + (((k+1) * 2654435761) // 26 + k) % 26
        |                  AS INT)]
        |      THEN 1::BIGINT << CAST(k AS INT) ELSE 0 END))
        |      AS BIGINT) AS fingerprint
        |  FROM cc),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.fingerprint
        |  FROM h a JOIN h b
        |    ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id),
        |toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win AS s
        |  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        |  QUALIFY lead(w,2) OVER win IS NOT NULL),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |iv AS (
        |  SELECT doc_a, doc_b, count(*) AS n_inter
        |  FROM cand JOIN sh a ON a.doc_id = doc_a
        |  JOIN sh b ON b.doc_id = doc_b AND a.s = b.s
        |  GROUP BY 1, 2)
        |SELECT c.doc_a, c.doc_b, c.fingerprint,
        |  iv.n_inter / (na.n + nb.n - iv.n_inter) AS jaccard
        |FROM cand c
        |JOIN iv ON iv.doc_a = c.doc_a AND iv.doc_b = c.doc_b
        |JOIN sz na ON na.doc_id = c.doc_a
        |JOIN sz nb ON nb.doc_id = c.doc_b
        |WHERE iv.n_inter / (na.n + nb.n - iv.n_inter) >= 0.5
        |ORDER BY c.doc_a, c.doc_b""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, CAST(f AS INT) AS frame_no,
        | CAST(f * 16 AS INT) AS byte_offset,
        | hex(encode(substr(text, f * 16 + 1, 1))) AS frame_byte_hex
        |FROM documents, (SELECT unnest(generate_series(0, 3)) AS f)
        |WHERE f < octet_length(encode(text)) // 16
        |ORDER BY doc_id, frame_no""".stripMargin,
    // documents.text is ASCII (octet_length == length over the corpus),
    // so ascii(substr(...)) is exact per-byte extraction; the LEFT JOIN
    // keeps a zero row for zero-length payloads (featureExtract's
    // max(len, 1) divisor emits mean_byte = 0.0 for them)
    "mm_features" ->
      """WITH e AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(1, length(text))) AS i
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) AS bv
        |  FROM e
        |), g AS (
        |  SELECT doc_id,
        |   CAST(sum(CASE WHEN bv < 64 THEN 1 ELSE 0 END) AS BIGINT)
        |     AS hist0,
        |   CAST(sum(CASE WHEN bv >= 64 AND bv < 128 THEN 1 ELSE 0 END)
        |     AS BIGINT) AS hist1,
        |   CAST(sum(CASE WHEN bv >= 128 AND bv < 192 THEN 1 ELSE 0 END)
        |     AS BIGINT) AS hist2,
        |   CAST(sum(CASE WHEN bv >= 192 THEN 1 ELSE 0 END) AS BIGINT)
        |     AS hist3,
        |   CAST(sum(bv) AS DOUBLE) / count(*) AS mean_byte
        |  FROM b GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        | coalesce(hist0, 0) AS hist0, coalesce(hist1, 0) AS hist1,
        | coalesce(hist2, 0) AS hist2, coalesce(hist3, 0) AS hist3,
        | coalesce(mean_byte, 0.0) AS mean_byte
        |FROM documents d LEFT JOIN g ON d.doc_id = g.doc_id
        |ORDER BY d.doc_id""".stripMargin,
  )
}
