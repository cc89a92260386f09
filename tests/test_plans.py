"""Physical-plan shape tests: the scale contract, asserted.

Correctness says the operators return the right rows; these say the
plans are the ones that survive a 100x scale-up — broadcasts where a
side is small, filters reaching the parquet scan, column pruning, and
no more shuffles than the algorithm requires.
"""

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import queries
from ffiec_pq_spark.plans.audit import (
    assert_plan,
    count_exchanges,
    has_broadcast_join,
    pushed_filters,
    scan_read_schema,
)
from ffiec_pq_spark.session import load_table


def test_flagship_join_broadcasts_dims(spark, sf_dir):
    """q5: region/nation/customer/supplier dims must broadcast — only
    the fact-fact join may shuffle."""
    df = queries()["q5_nation_revenue"](spark, sf_dir)
    assert has_broadcast_join(df)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    ).select("l_orderkey", "l_quantity")
    assert "l_shipdate" in pushed_filters(li)


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    got = scan_read_schema(li)
    assert set(got) == {"l_orderkey", "l_quantity"}, got


def test_single_shuffle_aggregate(spark, sf_dir):
    """q1 is one grouped aggregate: exactly one exchange."""
    df = queries()["q1_pricing_summary"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    assert count_exchanges(df) <= 1


def test_pivot_single_shuffle(spark, sf_dir):
    """Conditional-aggregation pivot: one exchange, not DataFrame.pivot's
    two."""
    df = queries()["pivot_roundtrip"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    assert count_exchanges(df) <= 1


def test_unpivot_no_shuffle(spark, sf_dir):
    """Unpivot is a narrow generator — zero exchanges."""
    df = queries()["unpivot_measures"](spark, sf_dir)
    assert_plan(df, max_exchanges=0)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Date-partitioned long-table layout: a date predicate must become
    a PartitionFilter (zero I/O on other partitions), not a data
    filter."""
    from ffiec_pq_spark.plans.audit import physical_plan
    from ffiec_pq_spark.sources.parquet import write_partitioned

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", F.col("l_shipdate").cast("date").alias("d")
    )
    out = str(tmp_path / "li_by_date")
    write_partitioned(li, out, ["d"])
    scan = spark.read.parquet(out).filter(F.col("d") == "1996-03-13")
    plan = physical_plan(scan)
    assert "PartitionFilters" in plan
    m = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("isnotnull(d" in ln or "d#" in ln for ln in m), plan


def test_ann_topk_no_global_sort(spark, sf_dir):
    """Brute-force top-k must be TakeOrderedAndProject (per-partition
    heads + driver merge), never a global Sort."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["ann_cosine_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_q6_all_predicates_pushed(spark, sf_dir):
    """Q6 is the canonical pushdown probe: every conjunct reaches the
    lineitem scan and the projection is 3 columns."""
    df = queries()["q6_forecast_revenue"](spark, sf_dir)
    pf = pushed_filters(df)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pf, pf
    assert set(scan_read_schema(df)) <= {
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    }


def test_q19_part_predicate_derived_below_join(spark, sf_dir):
    """The OR-of-ANDs mixes both join sides; Catalyst must still derive
    the part-only disjunction (brand/size) and push it below the
    broadcast join into the part scan."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["q19_disjunctive_pushdown"](spark, sf_dir)
    assert has_broadcast_join(df)
    plan = physical_plan(df)
    # the part-side filter shows up before the join (as a Filter or a
    # pushed-down scan predicate over p_brand/p_size)
    assert "p_brand" in plan and "p_size" in plan


def test_funnel_single_exchange(spark, sf_dir):
    """Four stacked min-over-user windows + distinct + agg share the
    user_id partitioning: at most 2 exchanges (user_id, then stage)."""
    df = queries()["events_funnel"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    assert count_exchanges(df) <= 2


def test_pack_sequences_single_exchange(spark, sf_dir):
    """Packing is one window shuffle on the shard key; the stats
    group-by rides the same partitioning where AQE allows, so the whole
    query needs at most 2 exchanges."""
    df = queries()["pack_sequences_stats"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    assert count_exchanges(df) <= 2


def test_quantize_is_map_only(spark, sf_dir):
    """int8 quantization is pure array expressions — zero exchanges."""
    df = queries()["embedding_quantize_int8"](spark, sf_dir)
    assert_plan(df, max_exchanges=0)


def test_bloom_bits_join_broadcasts(spark, sf_dir):
    """The Bloom bit table (<= 8192 rows) must broadcast against the
    probe side — the whole point of the pattern at 100 TB."""
    df = queries()["bloom_membership_filter"](spark, sf_dir)
    assert has_broadcast_join(df)


def test_knn_no_cartesian(spark, sf_dir):
    """Exact kNN must NOT plan a cartesian/broadcast-nested-loop over
    (probes x corpus); candidates come from the tiled mapInPandas."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["knn_label_propagation"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_pairs_on_cell(spark, sf_dir):
    """SemDeDup's pair join must key on the cell id (bounded fan-out),
    never a cartesian of the full corpus."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["semantic_dedup_cells"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "cell" in plan


def test_hll_state_is_grouped_aggregate(spark, sf_dir):
    """The portable HLL reduces to (event_type, bucket) registers via a
    grouped aggregate with map-side partials — no window over raw rows,
    no collect."""
    df = queries()["hll_portable_sketch"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    # registers + per-type rollup + exact-count join: a handful of
    # exchanges over 64-row-per-type state, never a raw-row window
    from ffiec_pq_spark.plans.audit import physical_plan

    plan = physical_plan(df)
    assert "HashAggregate" in plan


def test_upsert_merge_bounded_exchanges(spark, sf_dir):
    """Upsert keep-latest: the merge is one grouped max_by exchange on
    the key, the reporting rollup one more — never a window sort."""
    df = queries()["upsert_keep_latest"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    assert count_exchanges(df) <= 2
    from ffiec_pq_spark.plans.audit import physical_plan

    assert "Window" not in physical_plan(df)


def test_histogram_single_exchange(spark, sf_dir):
    """The equi-width histogram is one grouped aggregation with
    map-side partials — exactly one exchange."""
    df = queries()["events_value_histogram"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    assert count_exchanges(df) <= 1


def test_range_join_is_equi_not_nested_loop(spark, sf_dir):
    """The bin-decomposed range join must plan a hash equi-join on the
    bin — never the broadcast-nested-loop a naive BETWEEN join gets."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["events_range_join_tiers"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert has_broadcast_join(df)


def test_ewma_single_exchange(spark, sf_dir):
    """Truncated EWMA is one keyed exchange + a partition-local window
    (all K lag terms share the same frame)."""
    df = queries()["events_ewma_value"](spark, sf_dir)
    assert count_exchanges(df) == 1


def test_gapfill_bounded_exchanges(spark, sf_dir):
    """Gap fill: bucket aggregation + span/calendar + forward-fill
    window — the window must reuse the key partitioning (<= 2
    exchanges total, none proportional to the calendar length)."""
    df = queries()["events_gapfill_ffill"](spark, sf_dir)
    assert count_exchanges(df) <= 2


def test_weighted_topk_no_global_sort(spark, sf_dir):
    """Weighted priority sampling must plan TakeOrderedAndProject
    (per-partition top-k), zero exchanges — no global sort."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["weighted_sample_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert count_exchanges(df) == 0


def test_linkage_no_cartesian(spark, sf_dir):
    """Blocked linkage joins on the blocking key — the plan must never
    degenerate to a cartesian/nested-loop over all pairs."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["linkage_blocked_pairs"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sorted_neighborhood_no_single_partition_window(spark, sf_dir):
    """The global rank must come from per-prefix windows + offsets —
    never an unpartitioned window (single-partition funnel) or a
    cartesian pair join."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["linkage_sorted_neighborhood"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_basket_pairs_join_on_order_key(spark, sf_dir):
    """Market-basket pair generation must join on the order id (bounded
    basket fan-out) — no cartesian over the catalog.  The only nested
    loop allowed is the one-row scalar N broadcast (IdentityBroadcast),
    the registry's standard way to avoid a driver-side collect."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["basket_part_pairs"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    if "BroadcastNestedLoopJoin" in plan:
        assert "IdentityBroadcastMode" in plan
    # the pair self-join itself must key on the order id
    assert "BroadcastHashJoin [o#" in plan or "SortMergeJoin [o#" in plan


def test_pca_scores_projection_is_map_only(spark, sf_dir):
    """After the driver-side fit, the data-sized PCA scoring pass must
    be a pure projection: zero exchanges, no window, no join."""
    df = queries()["embedding_pca_scores"](spark, sf_dir)
    assert count_exchanges(df) == 0


def test_prefix_jaccard_no_cartesian(spark, sf_dir):
    """Prefix-filtered Jaccard must stay keyed end to end: prefix join
    on the shingle, verification joins on (doc, shingle) — never a
    cartesian or nested loop."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["dedup_jaccard_prefix"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rfm_no_global_ntile(spark, sf_dir):
    """RFM segmentation must bucket against broadcast quartile
    boundaries — no ntile, no window at all, the only single-partition
    exchange being the 9-scalar boundary aggregate."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["orders_rfm_segments"](spark, sf_dir)
    plan = physical_plan(df)
    assert "ntile(4)" not in plan
    assert "row_number" not in plan
    assert plan.count("Exchange SinglePartition") <= 1  # boundary scalars
    assert has_broadcast_join(df)


def test_zipf_rank_is_range_partitioned(spark, sf_dir):
    """The Zipf rank must be the distributed two-pass rank: the
    data-sized row_number window partitions by the range id (_pid);
    single-partition exchanges only for the tiny offset relation and
    the final scalar aggregate."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["corpus_zipf_slope"](spark, sf_dir)
    plan = physical_plan(df)
    assert "row_number() windowspecdefinition(_pid" in plan
    assert plan.count("Exchange SinglePartition") <= 2


def test_equidepth_no_per_type_total_sort(spark, sf_dir):
    """Equi-depth buckets must come from distributed_rank +
    ntile_from_rank — no ntile window, no single-partition exchange,
    rank window partitioned by (range id, event_type)."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["events_value_equidepth"](spark, sf_dir)
    plan = physical_plan(df)
    assert "ntile(4)" not in plan
    assert "row_number() windowspecdefinition(_pid" in plan
    assert plan.count("Exchange SinglePartition") == 0


def test_source_overlap_distinct_before_pair_join(spark, sf_dir):
    """The cross-source overlap matrix must collapse to distinct
    (hash, source) BEFORE the pair self-join (no cartesian, no
    nested-loop), with the per-source sizes broadcast."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["source_overlap_matrix"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert has_broadcast_join(df)
    assert plan.count("Exchange SinglePartition") == 0


def test_softdedup_no_window_no_single_partition(spark, sf_dir):
    """Soft-dedup reweighting is two keyed aggs + one keyed join —
    no window function, no single-partition exchange anywhere."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["docs_softdedup_weights"](spark, sf_dir)
    plan = physical_plan(df)
    assert "windowspecdefinition" not in plan
    assert plan.count("Exchange SinglePartition") == 0


def test_vocab_coverage_rank_is_range_partitioned(spark, sf_dir):
    """The vocabulary-coverage rank must be distributed_rank (local
    row_number per range id), with single-partition exchanges only for
    the tiny offset relation and the final scalar aggregate."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["corpus_vocab_coverage"](spark, sf_dir)
    plan = physical_plan(df)
    assert "row_number() windowspecdefinition(_pid" in plan
    assert plan.count("Exchange SinglePartition") <= 2


def test_dsir_bucket_relation_broadcasts(spark, sf_dir):
    """DSIR importance: the 256-bucket log-ratio relation must attach
    to the bigram stream via a BROADCAST join (never a shuffled join on
    the bucket key — 256 keys over billions of rows is pure skew), with
    no cartesian and the only single-partition exchange the one-row
    totals aggregate."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["docs_dsir_importance"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert has_broadcast_join(df)
    assert "windowspecdefinition" not in plan
    assert plan.count("Exchange SinglePartition") <= 1


def test_kl_drift_grid_stays_tiny(spark, sf_dir):
    """Per-source KL drift: after the bucket aggregations the smoothed
    source x bucket grid is built from broadcast tiny relations — no
    cartesian product, no window, single-partition exchange only for
    the one-row corpus total."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["source_bigram_kl_drift"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert has_broadcast_join(df)
    assert "windowspecdefinition" not in plan
    assert plan.count("Exchange SinglePartition") <= 1


def test_k_anonymity_single_rollup_pass(spark, sf_dir):
    """The k-anonymity ladder must come from ONE rollup aggregation
    (Expand + partial agg before the exchange), never three separate
    scans — and nothing in the plan is a window or cartesian."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["customer_k_anonymity"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1
    assert "windowspecdefinition" not in plan
    assert "CartesianProduct" not in plan


def test_q6_predicates_reach_the_scan(spark, sf_dir):
    """Q6 is the pushdown benchmark: date/discount/quantity predicates
    must appear as PushedFilters on the parquet scan, and the plan is
    join-free."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["q6_forecast_revenue"](spark, sf_dir)
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_discount)" in plan or "GreaterThan" in plan
    assert "Join" not in plan


def test_q4_exists_decorrelates_to_grouped_max(spark, sf_dir):
    """Q4's EXISTS must run as the aggregate-decorrelation rewrite: a
    partial-aggregated grouped max on the order key (map-side combine
    BEFORE the exchange — never a fact-sized semi-join hash build),
    then one keyed join; the ship-date envelope reaches the scan."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["q4_late_shipment_exists"](spark, sf_dir)
    plan = physical_plan(df)
    assert "partial_max" in plan or "partial max" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "PushedFilters: [" in plan


def test_q17_threshold_join_pruned_and_broadcast(spark, sf_dir):
    """Q17's correlated threshold must decorrelate into a grouped avg
    joined back (broadcast — the brand/size prune makes it tiny), with
    the part prune applied BEFORE the fact join (semi)."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["q17_small_quantity"](spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftSemi" in plan
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in plan


def test_q19_disjunction_no_cartesian_scan_pruned(spark, sf_dir):
    """Q19's join-spanning disjunction must still be a keyed hash join
    (part side broadcast) with Catalyst's derived part-side disjunction
    pushed below the join — never a cartesian with a post-filter."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["q19_disjunctive_pushdown"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert has_broadcast_join(df)
    assert "PushedFilters: [" in plan


def test_q10_top20_is_take_ordered(spark, sf_dir):
    """Q10's top-20 must be TakeOrderedAndProject (heap per partition +
    driver merge), never a global sort."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["q10_returned_revenue_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_theta_sketch_no_per_flag_total_sort(spark, sf_dir):
    """The theta/KMV sketch must be built two-phase (per-partition
    bottom-k, then a merge of <= partitions*k candidates) — no window
    function, so no per-flag single-reducer total sort of the distinct
    hash space."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["lineitem_theta_sketch_overlap"](spark, sf_dir)
    plan = physical_plan(df)
    assert "windowspecdefinition" not in plan
    assert "row_number" not in plan


def test_exactsubstr_join_stays_keyed(spark, sf_dir):
    """ExactSubstr must never go all-pairs: the duplicated-gram
    restriction is one KEYED shuffle on the 60-bit gram hash + a
    count-over-window partition-local filter (gram_plan="window" — the
    single-pass shape the 8x/16x measurements picked; no cartesian, no
    broadcast-nested-loop), run extension is a per-doc window (no
    single-partition window), and the whole pipeline is the two keyed
    shuffles the operator contract states (+1 slack for an AQE split)."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = queries()["docs_exactsubstr_spans"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # run extension must be a PER-DOC window, not a global sort: no
    # single-partition exchange anywhere
    assert "SinglePartition" not in plan
    assert count_exchanges(df) <= 3, physical_plan(df)


def test_exactsubstr_contamination_train_aggregates_before_join(
    spark, sf_dir
):
    """Eval decontamination must probe |train vocab|, not |train
    positions|: the train side reduces to DISTINCT gram hashes via an
    AGGREGATE that sits BELOW the semi-join in the plan, the join is
    keyed on the hash (no cartesian / BNLJ), and run extension stays a
    per-doc window (no single-partition exchange)."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["eval_exactsubstr_contamination"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan
    # the train-side distinct is a HashAggregate on the gram hash: it
    # must appear (the join probes an aggregated relation, not raw
    # positions).  LeftSemi marks the keyed anchor restriction.
    assert "LeftSemi" in plan, plan
    assert "HashAggregate" in plan, plan


def test_exactsubstr_cleaned_no_positional_explode(spark, sf_dir):
    """The removal transform must strip via a narrow higher-order
    filter over the token array, NOT by exploding |token positions|
    rows through the join: no cartesian/BNLJ, no single-partition
    exchange, and no more exchanges than the spans pipeline itself
    (the span collect + doc join ride the existing per-doc
    partitioning, +1 slack for an AQE split)."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = queries()["docs_exactsubstr_cleaned"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan
    assert count_exchanges(df) <= 3, physical_plan(df)


def test_nb_classifier_model_join_keyed(spark, sf_dir):
    """The NB model must join the test token stream as a KEYED hash /
    sort-merge join on the token (never a cartesian of model x tokens);
    the only nested-loop sites are the broadcast single-row scalar
    relations (vocab size / class totals / priors / unseen fallbacks),
    and the whole pipeline stays within the train-agg + model-join +
    doc-sum exchange budget."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = queries()["docs_nb_lang_confusion"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # the data-sized join (token stream x model) is keyed
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert count_exchanges(df) <= 6, plan


def test_epoch_shuffle_no_sort_no_single_partition(spark, sf_dir):
    """The epoch shuffle must assign shards WITHOUT any global sort:
    shard = top bits of the seeded hash, so the plan is projection +
    grouped aggregate + a broadcast join-back of the 16-row group
    relation — no window, no single-partition exchange, no sort of the
    keyed stream, no cartesian."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = queries()["docs_epoch_shuffle_shards"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan
    assert "windowspecdefinition" not in plan
    assert "BroadcastHashJoin" in plan, plan
    assert count_exchanges(df) <= 4, plan


def test_nb_kappa_rides_keyed_model_join(spark, sf_dir):
    """Kappa aggregates the |classes|^2 confusion relation on top of
    the shared NB scorer: the data-sized join stays the KEYED token x
    model join (no cartesian anywhere; the only nested-loop sites are
    broadcast single-row scalars), and no window sneaks in for the
    marginals."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["docs_nb_agreement_kappa"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_nb_margin_reliability_is_projection_plus_agg(spark, sf_dir):
    """The margin curve must be a per-row sorted-array projection over
    the shared NB scorer plus ONE grouped aggregate on the bucket id:
    no window function (the top-2 margin comes from array_sort, not
    row_number), no cartesian, and the keyed model join intact."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["docs_nb_margin_reliability"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_datacard_mode_join_broadcasts_no_window(spark, sf_dir):
    """The per-source data card must stay grouped-aggregate-shaped:
    the dominant-language mode resolves via the max-count join on the
    tiny (source, lang) relation — broadcast, never a window over the
    corpus — and the single-row corpus total is the only nested-loop
    (broadcast) site."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["corpus_datacard_by_source"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan
    assert "BroadcastHashJoin" in plan, plan


def test_normalized_dedup_single_exchange(spark, sf_dir):
    """Normalized exact dedup must keep dedup_exact's profile: per-row
    JVM normalization expressions + ONE grouped aggregate keyed on the
    normalized content hash (two-phase distinct partials ride the same
    exchange) — no window, no join, no single-partition stage."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = queries()["dedup_normalized_exact"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan
    assert "SinglePartition" not in plan
    assert "Join" not in plan, plan
    assert count_exchanges(df) <= 2, plan


def test_pq_codebook_rollup_no_join_one_exchange(spark, sf_dir):
    """PQ code histogram: encoding is a pure column expression against
    the broadcast codebook literal, so the whole query is scan ->
    project -> ONE grouped aggregate (m*k groups) — no join anywhere,
    no window, no single-partition stage."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = queries()["embedding_pq_codebook"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, plan
    assert "windowspecdefinition" not in plan
    assert "SinglePartition" not in plan
    assert count_exchanges(df) <= 1, plan


def test_pq_codebook_k64_single_arrow_stage(spark, sf_dir):
    """Production-parameter (k=64) PQ rollup: the pandas-UDF scorer is
    the ONLY Python stage — one ArrowEvalPython map node over the
    subvector projection (never row-at-a-time BatchEvalPython), and the
    rest of the plan is the same no-join single-aggregate shape as the
    k=4 literal-expression rollup."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = queries()["embedding_pq_codebook_k64"](spark, sf_dir)
    plan = physical_plan(df)
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, plan
    assert "windowspecdefinition" not in plan
    assert "SinglePartition" not in plan
    assert count_exchanges(df) <= 1, plan


def test_pq_adc_topk_is_take_ordered_no_join(spark, sf_dir):
    """ADC top-k: per-id integer distance sum (one keyed exchange) then
    TakeOrderedAndProject — never a global sort, never a join against
    raw vectors (the probe-to-centroid table rides as literals)."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = queries()["ann_pq_adc_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, plan
    assert count_exchanges(df) <= 1, plan


def test_pq_recall_overlap_join_broadcasts(spark, sf_dir):
    """Recall@k: both top-k relations are k rows, so the overlap join
    must broadcast — and the exact side's ranking must be a
    TakeOrderedAndProject over the scan, never a global sort."""
    from ffiec_pq_spark.plans.audit import has_broadcast_join, physical_plan

    df = queries()["ann_pq_recall_at_k"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert has_broadcast_join(df), plan


def test_ivfpq_search_no_join_prunes_before_exchange(spark, sf_dir):
    """IVF-PQ: coarse assign, residual, and PQ encode are all
    literal-codebook projections, so the search plan has NO join; the
    probed-cell filter must sit below the single keyed integer-sum
    exchange; top-k = TakeOrderedAndProject."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = queries()["ann_ivfpq_residual_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, plan
    assert count_exchanges(df) <= 1, plan


def test_lsh_recall_eval_joins_stay_keyed(spark, sf_dir):
    """The recall audit's heavy relations (truth self-join, candidate
    banding, hit overlap) must all join KEYED (shingle / band / pair
    ids) — the only nested-loop joins are the three single-row count
    aggregates crossed into the report row, and no window appears."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["dedup_lsh_recall_eval"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan
    # the three 1-row aggregates may BNLJ; a data-sized BNLJ would show
    # as a join with a non-aggregate child — pin by forbidding any
    # ShuffledHashJoin/SortMergeJoin-free plan from degrading is
    # covered by the keyed-join asserts in the operator tests; here we
    # additionally require the shingle join to be an equi-join
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or \
        "BroadcastHashJoin" in plan


def test_incremental_dedup_is_asymmetric(spark, sf_dir):
    """Incremental ingest dedup must never pair the corpus with itself:
    every join is keyed (hash / band / shingle / pair id), no cartesian
    over data relations, no window — the nested loops are the 1-row
    count aggregates crossed into the report row.

    Round-10 addition: the exact verify must be PAIR-DRIVEN — no join
    anywhere in the plan keyed on the shingle ALONE (the hot-shingle
    quadratic magnet); shingles may only be joined together with a doc
    id already pruned to candidates ((id_c, shingle))."""
    import re

    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["dedup_incremental_newbatch"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or \
        "BroadcastHashJoin" in plan
    assert not re.search(
        r"Join \[shingle#\d+L?\], \[shingle#\d+L?\]", plan
    ), "shingle-only equi-join precedes the candidate prune:\n" + plan


def test_banding_curve_one_join_no_pow(spark, sf_dir):
    """The design curve must reuse ONE shingle self-join for all four
    configs (the jx relation is persisted) and keep the S-curve as
    multiplication chains — no POWER/EXP expression (libm is not
    bit-portable), no window, no cartesian."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["dedup_banding_design_curve"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan
    assert "POWER" not in plan and "EXP(" not in plan
    assert "InMemoryTableScan" in plan  # the persisted shared jx relation


def test_knn_outlier_pairs_keyed_on_cell(spark, sf_dir):
    """Outlier scores: pair generation must key on the k-means cell
    (SemDeDup's quadratic-per-cell bound) — no cartesian, no BNLJ over
    data relations; the final top-N is a TakeOrderedAndProject."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["embedding_knn_outlier_scores"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_recall_panel_reuses_codes_no_cartesian(spark, sf_dir):
    """The recall panel must fit once and reuse the persisted code
    relation (InMemoryTableScan present) — per probe only a keyed
    aggregation + TakeOrdered + k-row broadcast overlap; no cartesian
    over data relations."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["ann_pq_recall_panel"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "InMemoryTableScan" in plan


def test_pq_codebook_k256_production_shape(spark, sf_dir):
    """k=256/m=8 (full production geometry): still the pandas-UDF
    single-Python-stage shape — one ArrowEvalPython, no join, one
    grouped aggregate, no row-at-a-time Python anywhere."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = queries()["embedding_pq_codebook_k256"](spark, sf_dir)
    plan = physical_plan(df)
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan, plan
    assert "windowspecdefinition" not in plan
    assert count_exchanges(df) <= 1, plan


def test_pq_semantic_buckets_no_join_two_exchanges(spark, sf_dir):
    """PQ-code semantic buckets: encode is a pure projection (k=4
    geometry stays on the literal-expression path), then exactly the
    two keyed aggregations (per-id tuple assembly, per-key rollup) —
    no join, no window, no Python stage, no single-partition stage."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = queries()["dedup_pq_semantic_buckets"](spark, sf_dir)
    plan = physical_plan(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Join" not in plan, plan
    assert "windowspecdefinition" not in plan
    assert "SinglePartition" not in plan
    assert count_exchanges(df) <= 2, plan


def test_heaps_curve_bounded_window(spark, sf_dir):
    """Heaps curve: the only data-sized shuffle is the token
    first-occurrence aggregate; the scalar max rides a broadcast
    cross join; the cumulative window runs over the B bucket rows
    ONLY (a bounded SinglePartition is the design, never data-sized
    — the window input is the B-group aggregate, not the corpus)."""
    from ffiec_pq_spark.plans.audit import (
        count_exchanges,
        has_broadcast_join,
        physical_plan,
    )

    df = queries()["corpus_heaps_law_curve"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert has_broadcast_join(df), plan
    assert "windowspecdefinition" in plan  # the B-row cumsum
    assert count_exchanges(df) <= 4, plan


def test_ivf_incremental_is_projection_plus_rollup(spark, sf_dir):
    """Frozen-model incremental assignment: the model rides as
    broadcast literals (no join against a centroid relation), the
    whole query is scan -> assignment projection -> ONE k-group
    aggregate — the asymmetric daily-ingest shape."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = queries()["ann_ivf_incremental_newvecs"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan
    assert count_exchanges(df) <= 1, plan


def test_isotropy_datacard_two_aggregates(spark, sf_dir):
    """Isotropy datacard: one explode feeding two grouped aggregates
    (64 dim groups; per-vector norms), two scalar reductions combined
    by 1-row broadcast crosses — no data-sized join or window."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["embedding_isotropy_datacard"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan  # 1-row combine broadcasts
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_nprobe_curve_single_pass_sweep(spark, sf_dir):
    """The nprobe sweep must be SINGLE-PASS over one persisted
    per-vector ADC relation (round 11): the plan reads it through
    InMemoryTableScan, the only TakeOrderedAndProject is the shared
    exact top-k (never one per sweep point), every rank<=nprobe gate
    lives inside shared conditional aggregates so the aggregate count
    is INDEPENDENT of sweep length (12 = 6 logical aggs x
    partial/final; the round-10 per-point shape scaled linearly), and
    no cartesian appears (the 1-row combines are broadcast
    nested-loop)."""
    import re

    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["ann_ivfpq_nprobe_recall_curve"](spark, sf_dir)
    plan = physical_plan(df)
    assert "InMemoryTableScan" in plan, plan
    assert plan.count("TakeOrderedAndProject") == 1, plan
    # ONE ladder aggregate (partial+final) carries every gate's
    # strictly-smaller count — a per-sweep-point implementation would
    # plan one keyed aggregate per nprobe.  (Total HashAggregate count
    # is NOT pinned: cached-relation lineage blocks repeat a variable
    # number of times depending on session cache state.)
    assert plan.count("HashAggregate(keys=[e_id") == 2, plan
    # the only other gate-conditional aggregates are the two global
    # rollups (scan counts; recall hits), partial+final each
    glob_aggs = re.findall(r"HashAggregate\(keys=\[\], functions=\[[^\n]*", plan)
    gate_aggs = [g for g in glob_aggs if "rk#" in g]
    assert len(gate_aggs) == 4, plan
    assert "CartesianProduct" not in plan


def test_drop_bias_single_hash_key_join(spark, sf_dir):
    """Dedup drop bias: the only data-sized join keys on the content
    hash (the same key the keeper aggregate groups on); no window, no
    cartesian, at most three exchanges (hash agg, join side, source
    rollup — AQE may reuse the first for the second)."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = queries()["dedup_drop_bias_by_source"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan
    assert count_exchanges(df) <= 3, plan


def test_curation_funnel_shares_score_pass(spark, sf_dir):
    """Funnel-by-source: no cartesian, no window; the dedup keeper join
    keys on the content hash; the three source rollups join on the
    tiny source dimension (broadcast)."""
    from ffiec_pq_spark.plans.audit import has_broadcast_join, physical_plan

    df = queries()["corpus_curation_funnel_by_source"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan
    assert has_broadcast_join(df), plan


def test_compression_curve_shared_truth_no_cartesian(spark, sf_dir):
    """Compression curve: every arm's top-k is TakeOrderedAndProject,
    overlaps broadcast against the one shared truth, the k=64 arm is
    the single Python (Arrow) stage, and nothing plans a cartesian."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["ann_pq_compression_recall_curve"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan, plan  # the k=64 arm


def test_q2_broadcasts_dims_takeordered(spark, sf_dir):
    """Q2 on the derived partsupp: dims broadcast, grouped-min and
    equality join share the part key, bounded top-100 — never a
    global sort or cartesian over data relations."""
    from ffiec_pq_spark.plans.audit import (
        has_broadcast_join,
        physical_plan,
    )

    df = queries()["q2_min_cost_supplier"](spark, sf_dir)
    plan = physical_plan(df)
    assert has_broadcast_join(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan


def test_q20_single_fact_shuffle(spark, sf_dir):
    """Q20: the lineitem quantity rollup is the only data-sized
    shuffle; part/supplier/nation broadcast; no window."""
    from ffiec_pq_spark.plans.audit import (
        count_exchanges,
        has_broadcast_join,
        physical_plan,
    )

    df = queries()["q20_potential_promotion"](spark, sf_dir)
    plan = physical_plan(df)
    assert has_broadcast_join(df)
    assert "windowspecdefinition" not in plan
    assert count_exchanges(df) <= 4, plan


def test_q2_skew_hot_key_never_shuffled(spark, sf_dir):
    """Q2 skew variant: the relation plants a hot ps_suppkey (supplier
    7 on 25% of rows), so the plan must keep every suppkey-keyed join
    BROADCAST — a shuffled join there would hotspot one partition.
    The only data-sized exchanges key on ps_partkey (grouped min +
    tie-break min), which the skew variant leaves uniform."""
    from ffiec_pq_spark.plans.audit import has_broadcast_join, physical_plan

    df = queries()["q2_min_cost_supplier_skew"](spark, sf_dir)
    plan = physical_plan(df)
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in plan
    # no shuffled (SortMergeJoin) join anywhere: the only SMJ candidate
    # keys would be ps_suppkey (hot) — broadcast keeps it map-side
    assert "SortMergeJoin" not in plan, plan


def test_scd2_windows_share_key_exchange(spark, sf_dir):
    """SCD2 history: both windows partition on user_id, so the plan
    needs at most 2 exchanges (key shuffle + AQE artifacts) and never
    a global (empty-partition-spec) window."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = queries()["users_scd2_history"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    assert count_exchanges(df) <= 2
    plan = physical_plan(df)
    assert "SinglePartition" not in plan, plan


def test_leakage_split_is_join_plus_projection_over_labels(spark, sf_dir):
    """With the component labelling resident (``component_labels``
    memo), docs_leakage_safe_split must add ONLY a join of the
    checkpointed label relation onto the doc scan plus a stateless
    hash projection — no aggregate anywhere (the CC machinery is all
    HashAggregates, so one leaking in means the labelling was
    rebuilt), and the label side must read from the checkpoint RDD,
    not a re-derived plan."""
    from ffiec_pq_spark.plans.audit import physical_plan
    from ffiec_pq_spark.queries.dedup import component_labels

    component_labels(spark, sf_dir)  # ensure resident
    df = queries()["docs_leakage_safe_split"](spark, sf_dir)
    plan = physical_plan(df)
    assert "HashAggregate" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan
    # exactly the one outer join that attaches the labels
    n_joins = sum(plan.count(j) for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"))
    assert n_joins == 1, plan


def test_snapshot_scd2_keyed_windows_only(spark, sf_dir):
    """users_weekly_snapshot_scd2: the snapshot aggregate plus both
    SCD2 windows all key on user_id — no global (SinglePartition)
    window may appear, and the whole plan needs at most 3 exchanges
    (snapshot groupBy + the shared window exchange + AQE artifacts)."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = queries()["users_weekly_snapshot_scd2"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    assert count_exchanges(df) <= 3
    assert "SinglePartition" not in physical_plan(df)


def test_bm25_inverted_index_no_cartesian(spark, sf_dir):
    """docs_bm25_topk: query terms meet the corpus posting list through
    keyed equi-joins only — a query x corpus cartesian (the naive
    all-pairs scorer) must never appear, the only nested-loop join
    allowed is the broadcast of the one-row stats relation, and the
    final top-k window keys on q_id (never global)."""
    # cache-free capture: another test's persisted arm would
    # reprint its lineage (scalar BNLJ / one-row rollups) into
    # this plan and make the counts suite-order-dependent
    spark.catalog.clearCache()
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["docs_bm25_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    # the one-row stats broadcast is the only nested-loop join, and
    # the only SinglePartition exchange is that scalar aggregate's
    # final rollup (a handful of partial-agg rows, not fact data)
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    from ffiec_pq_spark.plans.audit import unexplained_single_partitions
    assert not unexplained_single_partitions(plan), (
        unexplained_single_partitions(plan)
    )
    # the top-k window keys on q_id, never a global sort
    assert "windowspecdefinition(q_id" in plan, plan


def test_incremental_clusters_asymmetric_over_stored_state(spark, sf_dir):
    """dedup_clusters_incremental must never pair the corpus with
    itself: no cartesian over data relations, shingles join only
    alongside a doc id already pruned to candidates (the pair-driven
    verify), and with the corpus state resident the plan consumes the
    checkpointed tables (Scan ExistingRDD) instead of re-deriving the
    corpus labelling (whose propagation is all joins over the corpus
    scan)."""
    import re

    from ffiec_pq_spark.plans.audit import physical_plan
    from ffiec_pq_spark.queries.round12 import _inc_corpus_state

    _inc_corpus_state(spark, sf_dir)  # ensure resident
    df = queries()["dedup_clusters_incremental"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan
    assert not re.search(
        r"Join \[shingle#\d+L?\], \[shingle#\d+L?\]", plan
    ), "shingle-only equi-join precedes the candidate prune:\n" + plan


def test_interleave_order_no_single_reducer(spark, sf_dir):
    """corpus_source_interleave_order emits a TOTAL order over the
    corpus, yet no single-partition window may appear — both the
    within-source rank and the global interleave position are
    distributed_rank constructions (range-partitioned local sorts +
    broadcast offset relation)."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["corpus_source_interleave_order"](spark, sf_dir)
    plan = physical_plan(df)
    # both ranks are the _pid-keyed local row_number construction
    assert "row_number() windowspecdefinition(_pid" in plan, plan
    # single-partition exchanges only for the global rank's tiny
    # (<= n_ranges rows) offset relation — never for doc-sized data
    assert plan.count("Exchange SinglePartition") <= 1, plan


def test_moore_lewis_keyed_joins_distributed_rank(spark, sf_dir):
    """doc_moore_lewis_select: both models attach to the bigram-type
    stream through KEYED joins only (no cartesian over data
    relations); the only nested-loop joins are the one-row scalar
    broadcasts (two type totals + the keep-gate count); the global
    rank is the distributed_rank construction, never a
    single-reducer window over the corpus."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["doc_moore_lewis_select"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    # the scored relation is persisted: all three consumers (keep-gate
    # count, rank local pass, rank offset pass) read the cache, so the
    # six-join scoring subtree (with its two in-tree scalar
    # crossJoins) EXECUTES once — the printed plan repeats the cached
    # subtree per scan, so assert the reuse, not a textual join count
    assert plan.count("InMemoryTableScan [doc_id") >= 2, plan
    assert "row_number() windowspecdefinition(_pid" in plan, plan


def test_kn_unlearn_consumes_resident_counts(spark, sf_dir):
    """doc_kn_unlearn: with the full-corpus count table resident, the
    plan consumes the checkpointed state (Scan ExistingRDD) and
    corrects it with a keyed LEFT join against the erased slice's
    counts — never re-counting the survivors; the only nested-loop
    join is the one-row type-total broadcast."""
    from ffiec_pq_spark.plans.audit import physical_plan
    from ffiec_pq_spark.queries.round13b import _kn_full_counts

    _kn_full_counts(spark, sf_dir)  # ensure resident
    df = queries()["doc_kn_unlearn"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_kn_stream_serve_scores_from_folded_state(spark, sf_dir):
    """The LM stream's serve scores the corpus against the FOLDED
    parquet count table (keyed joins + one scalar broadcast), not a
    recount of the corpus: the pre-checkpoint plan reads the state
    directory and contains no cartesian."""
    from ffiec_pq_spark.plans.audit import physical_plan
    from ffiec_pq_spark.queries.round13b import (
        _KN_STREAM_STATE,
        _bigrams,
        _kn_scores,
        stream_kn_counts_fold,
    )
    from ffiec_pq_spark.session import load_table

    from ffiec_pq_spark.session import dataset_key

    stream_kn_counts_fold(spark, sf_dir)  # ensure resident state
    st = _KN_STREAM_STATE[dataset_key(spark, sf_dir)]
    docs = load_table(spark, sf_dir, "documents")
    served = _kn_scores(spark.read.parquet(st["c2"]), _bigrams(docs))
    plan = physical_plan(served)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "Scan parquet" in plan, plan


def test_rrf_hybrid_no_cartesian_keyed_windows(spark, sf_dir):
    """retrieval_rrf_hybrid: the lexical side is the shared BM25
    inverted-index pass and the dense side reaches candidates through
    the cell equi-join with the query side broadcast — no cartesian
    over data relations anywhere, the only nested-loop join is the
    one-row BM25 stats broadcast, and every rank window keys on q_id
    (never a global window)."""
    # cache-free capture: another test's persisted arm would
    # reprint its lineage (scalar BNLJ / one-row rollups) into
    # this plan and make the counts suite-order-dependent
    spark.catalog.clearCache()
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["retrieval_rrf_hybrid"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "windowspecdefinition(q_id" in plan, plan
    # the only single-partition exchange is the BM25 pass's one-row
    # stats rollup (the docs_bm25_topk pin's allowance) — never fact
    # data
    from ffiec_pq_spark.plans.audit import unexplained_single_partitions
    assert not unexplained_single_partitions(plan), (
        unexplained_single_partitions(plan)
    )


def test_ndcg_eval_integer_terms_broadcast_counts(spark, sf_dir):
    """retrieval_ndcg_eval: no runtime logarithm may appear anywhere
    in the plan (every DCG term is a precomputed integer literal),
    the ideal-count relations join by broadcast, and no cartesian
    beyond the fused pass's one-row stats broadcast."""
    # cache-free capture: another test's persisted arm would
    # reprint its lineage (scalar BNLJ / one-row rollups) into
    # this plan and make the counts suite-order-dependent
    spark.catalog.clearCache()
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["retrieval_ndcg_eval"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "LOG(" not in plan and "ln(" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "BroadcastHashJoin" in plan, plan


def test_kn_gate_single_rank_pass(spark, sf_dir):
    """kn_gate_calibration: one distributed_rank over the certified
    KN3 scores feeds every rung — the rank is the _pid-keyed local
    row_number construction, never a single-reducer window over the
    corpus, and the 5-rung explode adds no data-sized shuffle
    (single-partition exchanges only for the rank's offset relation
    and the 1-row count broadcast)."""
    # cache-free capture: another test's persisted arm would
    # reprint its lineage (scalar BNLJ / one-row rollups) into
    # this plan and make the counts suite-order-dependent
    spark.catalog.clearCache()
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["kn_gate_calibration"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "row_number() windowspecdefinition(_pid" in plan, plan
    from ffiec_pq_spark.plans.audit import unexplained_single_partitions
    assert not unexplained_single_partitions(plan), (
        unexplained_single_partitions(plan)
    )


def test_fusion_gain_no_cartesian_keyed_everything(spark, sf_dir):
    """retrieval_fusion_gain: the three arm passes keep their pinned
    shapes (no cartesian over data relations; the only nested-loop
    joins are the BM25 one-row stats broadcast and the 3-row arm
    explode base's own build), label joins are hash joins, and no
    global windows appear (every row_number keys on q_id or _pid)."""
    # cache-free capture: another test's persisted arm would
    # reprint its lineage (scalar BNLJ / one-row rollups) into
    # this plan and make the counts suite-order-dependent
    spark.catalog.clearCache()
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["retrieval_fusion_gain"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # every window is keyed — a bare global windowspecdefinition
    # would render with a leading sort column, not a partition key
    assert "windowspecdefinition(q_id" in plan, plan
    # the BM25 one-row stats rollup appears once per lexical pass —
    # the standalone lex arm and the one inside the hybrid arm — and
    # nothing else may be single-partition
    from ffiec_pq_spark.plans.audit import unexplained_single_partitions
    assert not unexplained_single_partitions(plan), (
        unexplained_single_partitions(plan)
    )


def test_gate_agreement_three_distributed_ranks(spark, sf_dir):
    """The gate CONSTRUCTION (shared by gate_agreement_matrix /
    gate_stack_yield / the ensemble trainer, now checkpoint-memoized
    per session+dataset): all three ranks are the _pid-keyed
    distributed construction (exactly three of them), the budget is a
    broadcast, there is no corpus-sized single-partition exchange
    (the allowed ones are the three rank offset relations + the 1-row
    budget), and the shared population is reused via InMemoryRelation
    rather than re-running the KN scoring pass per rank.  The
    CONSUMER plan then reads the checkpointed relation (no rank
    windows re-planned per consumer)."""
    from ffiec_pq_spark.plans.audit import physical_plan
    from ffiec_pq_spark.queries.round13c import _gated_frame_build

    pop, built = _gated_frame_build(spark, sf_dir)
    plan = physical_plan(built)
    pop.unpersist()
    assert "CartesianProduct" not in plan, plan
    assert plan.count("row_number() windowspecdefinition(_pid") == 3, plan
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, plan
    # allowed single-partition exchanges: the 3 rank offset relations
    # + the 1-row budget; AQE's runtime bloom-filter merges (one-row
    # sketch state per join) are excluded from the count
    lines = plan.splitlines()
    singles = 0
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln and not any(
            "bloom_filter_agg" in nx for nx in lines[i + 1 : i + 3]
        ):
            singles += 1
    assert singles <= 4, plan
    # consumer serve: the matrix reads the resident checkpointed
    # relation — no rank window, no KN pass in ITS plan
    cplan = physical_plan(queries()["gate_agreement_matrix"](spark, sf_dir))
    assert "CartesianProduct" not in cplan, cplan
    assert "Scan ExistingRDD" in cplan, cplan
    assert "row_number() windowspecdefinition(_pid" not in cplan, cplan


def test_dim_ablation_single_scan_take_ordered(spark, sf_dir):
    """embedding_dim_ablation: the four truncated cosines come from
    ONE corpus projection (the persisted slim relation appears as an
    InMemoryRelation reused by every arm), every top-k is a
    TakeOrderedAndProject (no global sort, no PARTITION BY dim window
    that would put the corpus in 4 reducers), and the ground-truth
    join is a broadcast."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["embedding_dim_ablation"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "windowspecdefinition(dim" not in plan, plan
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_shard_assignment_one_agg_one_broadcast(spark, sf_dir):
    """corpus_shard_assignment: one data-sized aggregate (16 groups,
    map-side partials), the corpus total is a 1-row broadcast
    nested-loop cross, and nothing else is single-partition."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["corpus_shard_assignment"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_weight_sweep_keyed_windows_no_cartesian(spark, sf_dir):
    """retrieval_rrf_weight_sweep: the rank window keys on
    (w_pct, q_id) — never a global window — the weight rungs are a
    literal explode (no data-sized cross join), and the only
    single-partition exchange is the BM25 pass's one-row stats
    rollup."""
    # cache-free capture: another test's persisted arm would
    # reprint its lineage (scalar BNLJ / one-row rollups) into
    # this plan and make the counts suite-order-dependent
    spark.catalog.clearCache()
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["retrieval_rrf_weight_sweep"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "windowspecdefinition(w_pct" in plan, plan
    from ffiec_pq_spark.plans.audit import unexplained_single_partitions
    assert not unexplained_single_partitions(plan), (
        unexplained_single_partitions(plan)
    )


def test_scorecard_two_left_joins_one_rollup(spark, sf_dir):
    """source_quality_scorecard: the scorecard layer adds only two
    LEFT hash joins on doc_id and one |sources|-group aggregate with
    map-side partials over the certified scoring passes — no
    cartesian, and the only windows are the KN pass's keyed
    duplicate-collapse windows (_chash), never a global one."""
    import re

    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["source_quality_scorecard"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    for key in re.findall(r"windowspecdefinition\((\w+)", plan):
        assert key == "_chash", plan


def test_cross_shard_rate_keeps_the_lsh_shape(spark, sf_dir):
    """dedup_cross_shard_rate: the pair pass keeps the pinned LSH
    shape (band equi-join, no CartesianProduct), the locality join is
    a hash join against the slim (id, shard) projection, and the
    rollup is 2 groups."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["dedup_cross_shard_rate"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_epoch_budget_one_agg_one_broadcast(spark, sf_dir):
    """epoch_token_budget: one data-sized grouped sum (map-side
    partials), a 1-row normalizer broadcast, then a narrow
    projection."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["epoch_token_budget"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "partial_sum" in plan, plan


def test_sc_stream_serve_reads_folded_state(spark, sf_dir):
    """stream_scorecard_fold: the serve is one projection over the
    folded |sources|-row parquet state — a parquet scan, no window,
    no join, no data-sized shuffle."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["stream_scorecard_fold"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "Scan parquet" in plan, plan
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan


def test_scorecard_unlearn_is_keyed_subtraction(spark, sf_dir):
    """scorecard_unlearn: full stats LEFT-join erased-slice stats on
    the source key (a hash join over |sources| rows), no cartesian,
    no window."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["scorecard_unlearn"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" not in plan, plan


def test_recall_eval_no_cartesian_keyed_windows(spark, sf_dir):
    """retrieval_recall_eval: the three arm passes keep their pinned
    shapes, the achievable-set join is a broadcast, every window keys
    on q_id, and only the BM25 one-row stats rollups (once per
    lexical pass: standalone + inside hybrid) are single-partition."""
    # cache-free capture: another test's persisted arm would
    # reprint its lineage (scalar BNLJ / one-row rollups) into
    # this plan and make the counts suite-order-dependent
    spark.catalog.clearCache()
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["retrieval_recall_eval"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "windowspecdefinition(q_id" in plan, plan
    from ffiec_pq_spark.plans.audit import unexplained_single_partitions
    assert not unexplained_single_partitions(plan), (
        unexplained_single_partitions(plan)
    )


def test_mixture_realization_broadcast_plan_no_explode(spark, sf_dir):
    """mixture_realized_counts: the |sources|-row plan relation
    broadcasts against the corpus scan, repetition is counted (not
    materialized — no Generate/explode in the plan), and the audit is
    one grouped aggregate with map-side partials."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["mixture_realized_counts"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Generate" not in plan, plan
    assert "partial_sum" in plan, plan


def test_gate_stack_shares_the_gate_construction(spark, sf_dir):
    """gate_stack_yield: the gate construction is the SHARED resident
    one (its plan reads the checkpointed relation — the ranks run in
    the memoized build, pinned by
    test_gate_agreement_three_distributed_ranks, never re-planned per
    consumer), the combo expansion is a literal explode over slim
    booleans — no cartesian, no rank window in the consumer plan."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["gate_stack_yield"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan
    assert "row_number() windowspecdefinition(_pid" not in plan, plan
    assert "Generate explode" in plan, plan


def test_rrf_fold_serves_resident_checkpoint(spark, sf_dir):
    """stream_rrf_fold / retrieval_unlearn: the consumer plan IS the
    resident fused top-k (a checkpointed-RDD scan) — the arms run once
    in the fold/build, never re-planned per call; and the BUILD's
    serve plan (a fresh ephemeral state) carries no cartesian and
    broadcasts the query side into the cell join."""
    from ffiec_pq_spark.plans.audit import physical_plan

    for name in ("stream_rrf_fold", "retrieval_unlearn"):
        plan = physical_plan(queries()[name](spark, sf_dir))
        assert "Scan ExistingRDD" in plan, (name, plan)
        assert "CartesianProduct" not in plan, (name, plan)


def test_gate_ensemble_single_rank_over_resident_population(spark, sf_dir):
    """gate_ensemble_calibration: scoring reads the resident gated
    population (checkpoint scan, no KN/probe re-plan), the ladder is
    ONE _pid-keyed distributed rank + a literal rung explode — the
    token-count relation is equi-joined into the population BEFORE the
    rank with NO hint; no cartesian beyond the 1-row budget
    broadcast."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["gate_ensemble_calibration"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Scan ExistingRDD" in plan, plan
    assert plan.count("row_number() windowspecdefinition(_pid") == 1, plan
    assert "Generate explode" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_calibration_ladders_no_forced_corpus_broadcast(spark, sf_dir):
    """The three calibration ladders (ensemble calibration + unlearn,
    probe gate) must carry exactly the two SANCTIONED broadcast hints
    — the 1-row budget crossJoin and distributed_rank's bounded
    per-range offset join — and NEITHER may sit on the corpus-keyed
    token join (``doc_id``/``vec_id``).  A forced broadcast of the
    one-row-per-document token relation would build a corpus-sized
    hash table on every executor at 100 TB (and trip the 8 GB
    broadcast cap long before); the fix joins it through the shuffle
    the rank already pays, hint-free, so AQE decides from measured
    sizes."""
    from ffiec_pq_spark.plans.audit import broadcast_hints

    for name in (
        "gate_ensemble_calibration",
        "gate_ensemble_unlearn",
        "probe_gate_calibration",
    ):
        df = queries()[name](spark, sf_dir)
        hints = broadcast_hints(df)
        assert len(hints) == 2, (name, hints)
        for ln in hints:
            assert "Join Cross" in ln or "_pid#" in ln, (name, ln)


def test_cells_recall_curve_no_cartesian_truth(spark, sf_dir):
    """retrieval_cells_recall_curve: the n_cells=1 truth arm is brute
    force EXPRESSED as an equi-join on a constant cell id — the plan
    must contain broadcast hash joins and NO CartesianProduct /
    BroadcastNestedLoopJoin anywhere; every arm's rank window keys on
    q_id."""
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["retrieval_cells_recall_curve"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "windowspecdefinition(q_id" in plan, plan
