#!/usr/bin/env python
"""Regenerate PLANS.md: the executed physical plan (AQE final) of each
headline query with a one-line note on why that shape is the one that
survives a 100 TB scale-up.  The same shapes are asserted in
tests/test_plans.py; this file just makes them reviewable."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ffiec_pq_spark import catalog
from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan
from ffiec_pq_spark.session import get_spark

NOTES = {
    "q1_pricing_summary": "one hash exchange (8 aggregates fold map-side) + the ordered output's range exchange",
    "q3_shipping_priority": "customer broadcast; orders-lineitem exchange reused by the aggregation (same key); TakeOrdered top-k",
    "q5_nation_revenue": "all four dimensions broadcast; single fact-fact exchange",
    "full_outer_coalesce": "full outer cannot broadcast: sort-merge join, both sides exchange once",
    "unpivot_measures": "narrow Expand generator: ZERO exchanges",
    "pivot_roundtrip": "conditional-aggregation pivot: ONE exchange (DataFrame.pivot would plan two)",
    "dup_key_groups": "single-shuffle grouped count with map-side partials",
    "union_distinct_keys": "union + distinct: one exchange on the key",
    "events_asof_join": "union-interleave as-of join: one exchange + partition-local window (no range explosion)",
    "ann_cosine_topk": "TakeOrderedAndProject: per-partition heads, no global sort",
    "curation_pipeline": "scalar filters pushed to scan; dedup group-by is the only shuffle; sample gate is a free filter; observe() fence keeps the token split projected once",
    "corpus_tfidf_top_terms": "two keyed exchanges (doc-term tf, then term df); scalar N broadcast in; TakeOrdered top-k",
    "text_winnow_fingerprints": "zero exchanges: per-row array pipeline (gram hash -> window minima) with fenced stages so each lambda reads a bound column",
    "events_sliding_rollup": "one Expand (2 windows/event) + one exchange with map-side partials",
    "cube_revenue": "all 4 grouping sets in one Expand + one exchange",
    "dedup_minhash_lsh": "banding join restricted to candidate docs — no full shingle self-join",
    "decontaminate_eval_overlap": "one shingle equi-join shuffle (train side df-capped first) + per-eval-doc aggregation",
    "stratified_balance_counts": "gates broadcast to both branches; one exchange per grouped count",
    "bloom_membership_filter": "bit table (<=8192 rows) broadcast against the probe side; probe path is scan -> explode -> grouped min",
    "hll_portable_sketch": "registers reduce map-side to (event_type, bucket) maxima; estimate math runs on 64-row state",
    "knn_label_propagation": "tiled mapInPandas candidates (no cartesian, no broadcast-nested-loop); tiny global window re-rank",
    "semantic_dedup_cells": "pair join keys on the k-means cell id — quadratic work bounded per cell; rep collapse removes duplicate fan-out",
    "upsert_keep_latest": "the merge itself is ONE grouped max_by exchange on the key (no window sort); the second exchange is the reporting rollup",
    "snapshot_diff_counts": "two snapshot scans -> one full-outer sort-merge join on the key -> grouped class counts; no broadcast possible (both sides fact-sized), exactly one join exchange pair",
    "cooccurrence_triangles": "degree-ordered orientation: wedges generated at the lowest-(degree,id) apex, closed against the oriented adjacency — fan-out bounded by arboricity, no unordered self-join blowup",
    "events_range_join_tiers": "bin-decomposed range join: hash equi-join on floor(value/W) + residual filter — never the broadcast-nested-loop a BETWEEN join plans",
    "events_gapfill_ffill": "bucket agg + per-key calendar explode + forward-fill window reusing the key partitioning: <= 2 exchanges, output bounded by the calendar",
    "events_ewma_value": "K lag terms in ONE keyed exchange + partition-local window frame",
    "weighted_sample_topk": "TakeOrderedAndProject on the integer priority: per-partition top-k, zero exchanges",
    "linkage_blocked_pairs": "self-equi-join on the blocking key only (no cartesian); bounded 3-arg levenshtein DP; distinct-content collapse first",
    "linkage_sorted_neighborhood": "distributed global rank (per-prefix row_number + driver offsets — no single-partition window) then ONE position equi-join of n x window rows",
    "doc_bigram_logprob": "array-side bigram build (zip_with over slices, no posexplode self-join); weighted duplicate collapse; probability join keyed on the bigram",
    "tfidf_cosine_pairs": "df-capped inverted-index self-join (term-keyed, skew-bounded); integer pair gate; distinct-content collapse",
    "embedding_pca_scores": "covariance as ONE grouped aggregation with map-side partials (d rows out); eigenvector fit on driver-side d x d state; scores are a narrow projection",
    "basket_part_pairs": "pair self-join keyed on the ORDER id: fan-out C(basket,2), bounded by basket size, never by the catalog",
    "events_attribution_last_touch": "one ignore-nulls window carry on (user, time) — no purchase x touch range join",
    "dedup_jaccard_prefix": "prefix filter: candidates join on the rarest shingles only; per-candidate verify keyed on (doc, shingle) — exact, uncapped, no stopword fan-out",
    "dedup_simhash_hamming": "bit-band candidates (pigeonhole) + popcount verify — no all-pairs XOR",
    "multimodal_phash_pairs": "same banding plumbing over the byte-sampled average-hash; raw-byte duplicate collapse",
    "events_rolling_dau": "bounded window-day explode (<=7 rows per activity day) + one distinct count — no day x activity BETWEEN join",
    "orders_open_backlog": "sweep-line: +1/-1 deltas, running sum over the DAILY table (orders of magnitude below the fact)",
    # round 6
    "events_asof_join_rates": "union-interleave as-of join against the rates table: one keyed exchange + ignore-nulls carry — no range explosion",
    "docs_minhash_containment": "bottom-k probe join keyed on the shingle hash (df-capped); containment from signature intersection — no all-pairs",
    "dedup_lsh_cosine_buckets": "sign-random-projection band equi-join on (band, signature) + exact verify on candidates only",
    "orders_rfm_segments": "approx-free exact quartiles from a percentile AGGREGATE broadcast back — zero ntile windows, zero single-partition exchanges",
    "corpus_zipf_slope": "distributed rank: range exchange + partition-local row_number + tiny offset join — no global window",
    "customer_k_anonymity": "ONE rollup Expand + one exchange yields every generalization rung; per-level reduce runs on the tiny class relation",
    "docs_dsir_importance": "bucket distribution = one <=256-key agg; log-ratios broadcast back onto the bigram stream; per-doc and per-source rollups are the only data-sized exchanges",
    "source_bigram_kl_drift": "corpus and per-source bucket aggs (map-side combined) -> broadcast grid of sources x 256 buckets; KL reduces the grid",
    "events_selfjoin_size_audit": "exact self-join output size sum(d^2) per log2-degree bucket: two grouped aggs, zero joined pairs materialized",
    "q4_late_shipment_exists": "EXISTS via aggregate decorrelation: grouped max(ship) per order (map-side combined, envelope pushed to scan) + one keyed join — no fact-sized semi-join build",
    "q15_top_supplier": "grouped revenue on the supplier key; rounded argmax broadcast back as a one-row cross; supplier enrich broadcast",
    "q17_small_quantity": "correlated threshold decorrelated: brand/size-pruned parts semi-filter the fact BEFORE the per-part avg; threshold joins back broadcast",
    # round 7/8
    "lineitem_theta_sketch_overlap": "two-phase reducible bottom-k: per-partition slice(sort_array(collect_list)) then a merge of <= partitions*k candidates — no per-flag total sort, no window; the Cross joins are 1-row sketch relations",
    "dedup_clusters": "pair relation pinned once (localCheckpoint) so the MinHash candidate+verify DAG runs ONCE; per-round cost is one edge join + grouped min + label-of-label jump join, rounds bounded ~O(log diameter)",
    "docs_exactsubstr_spans": "ExactSubstr (round-9 single-pass gram_plan='window'): ONE keyed shuffle on the gram hash + count-over-window duplicated filter (gram expression evaluated once) -> per-doc gaps-and-islands window; two keyed shuffles, no all-pairs, no suffix array",
    "eval_exactsubstr_contamination": "substring eval decontamination: train side aggregates to DISTINCT gram hashes (map-side combined) before the keyed semi-join — probes |train vocab|, not |train positions|; eval anchors -> per-doc window -> inner join back to flagged eval docs",
    "docs_stratified_sample": "per-stratum hash gate: pure column expressions, ZERO exchanges, scan-prunable",
    "docs_exactsubstr_cleaned": "ExactSubstr removal transform: span relation compacts to one (id, spans) row per flagged doc (grouped collect), joins back KEYED on doc id, strip is a narrow higher-order filter over the token array — no |positions| explode through the join",
    "docs_nb_lang_confusion": "Naive-Bayes classifier filter: token counts via map-side-combined grouped aggregates; model joins the test token stream KEYED on token; scalar relations (vocab size, class totals, priors) broadcast; scores are exact integer micro-nat sums",
    # round-9 second wave
    "docs_epoch_shuffle_shards": "reproducible epoch shuffle: shard = top bits of the seeded portable hash (no global sort, no range-sampling pass); one grouped agg on (epoch, shard) + broadcast min-key join-back for the deterministic first-doc",
    "docs_nb_margin_reliability": "reliability curve rides the NB scorer: per-row 5-element array_sort margin (integer micro-nats, no window) + one <=10-group aggregate",
    "corpus_datacard_by_source": "per-source data card: two keyed grouped aggs (source / source,lang with two-phase distinct), single-row total broadcast, mode via max-count broadcast join + min(lang) tie-break — no window over the corpus",
    # round-9 third wave (PQ family)
    "embedding_pq_codebook": "PQ training + code histogram: encoding is a pure column expression vs the broadcast codebook literal (NO join anywhere), one groupBy(sub, cell) exchange with map-side-combined integer-nano partials",
    "ann_pq_adc_topk": "ADC top-k: scan -> literal-LUT projection -> one keyed integer-sum exchange per id -> TakeOrderedAndProject; probe never touches raw vectors",
    "ann_pq_recall_at_k": "recall@k: both top-k sides are k rows (TakeOrderedAndProject each), overlap join broadcasts k ids; exact side is the one-probe brute scan you CAN afford for validation",
    "ann_ivfpq_residual_topk": "IVF-PQ: coarse assign + residual + PQ encode are ALL literal-codebook projections (no join in the search plan); probed-cell filter prunes before the one keyed integer-sum exchange; TakeOrderedAndProject top-k",
    "embedding_kcenter_coreset": "greedy k-center: per round one literal-center projection (no join, zero exchanges) + TakeOrderedAndProject(1); one row to the driver per round; result relation is the k driver-built picks",
    "dedup_lsh_recall_eval": "LSH recall audit: banding + hit joins keyed; the UNCAPPED shingle self-join is the deliberate afford-once truth side (run on a sample at 100 TB); the only nested loops cross three 1-row counts",
    "dedup_banding_design_curve": "banding design curve: ONE shingle self-join feeds all four (b, r) configs (persisted jx relation); per config a single-row aggregate of the analytic S-curve — no signatures built, no window",
    "embedding_knn_outlier_scores": "cell-bounded kNN outliers: pair join keys on the k-means cell (quadratic only within a cell, SemDeDup's bound); neighbor rank = per-id partition-local window; TakeOrderedAndProject top-N",
    "ann_pq_recall_panel": "recall panel: codebooks fit once, codes persisted; per probe one keyed integer-sum agg + TakeOrdered + a k-row broadcast overlap — probe count multiplies only the cheap final stages",
    "embedding_pq_codebook_k64": "production assignment path: ONE ArrowEvalPython map stage (vectorized numpy scorer, codebook in the auto-broadcast command) over the subvector generator, then the single m*k-group aggregate — no join, no window",
    "embedding_pq_codebook_k256": "full production geometry (k=256, m=D/8): same single-Arrow-stage shape as k64 — the expression path stopped compiling two orders of magnitude earlier",
    "dedup_pq_semantic_buckets": "compressed semantic dedup: encode projection + groupBy(id) tuple assembly + groupBy(code_key) rollup — exactly two keyed exchanges, shuffle carries the m-byte key, never raw floats",
    "corpus_heaps_law_curve": "one token-keyed exchange (first-occurrence min); scalar max broadcast-crossed; cumulative window over the B bucket rows only",
    "stream_pq_encode": "drain of the streamed encode state: flat LogicalRDD (foreachBatch ran the pandas scorer per micro-batch; encoding is stateless so the drain is batch-order invariant)",
    "ann_ivf_incremental_newvecs": "frozen-model incremental assign: broadcast-literal centroids, one scan projection, ONE k-group rollup — daily cost independent of corpus retraining",
    "embedding_isotropy_datacard": "one explode feeding the 64-group dim-variance agg and the per-vector norm agg; two 1-row reductions broadcast-crossed",
    "dedup_incremental_newbatch": "asymmetric ingest dedup with the round-10 PAIR-DRIVEN verify: candidates expand by batch-doc shingles keyed on id_b, probe corpus reps keyed on (id_c, shingle) — no shingle-only join key anywhere",
    "ann_ivfpq_nprobe_recall_curve": "single-pass sweep (r11): one persisted per-vector ADC relation (InMemoryTableScan); scan costs + exact-top-k membership for EVERY nprobe come from shared conditional aggregates gated on cell rank — aggregate count independent of sweep length; only TakeOrdered is the shared exact top-k",
    "dedup_drop_bias_by_source": "keeper min-agg and join share the content-hash key; one source rollup — three keyed exchanges max",
    "corpus_curation_funnel_by_source": "one scoring pass (token array projected once), hash-keyed dedup keeper join, three source rollups broadcast-joined on the tiny source dim",
    "ann_pq_compression_recall_curve": "per arm: keyed integer-sum ADC agg + TakeOrdered + k-row broadcast overlap vs ONE shared brute truth; k=64 arm is the single ArrowEvalPython stage",
    "corpus_token_budget_greedy": "global quality-ordered running token sum via distributed_prefix_sum (range repartition + local window + tiny broadcast offset join); budget = 1-row broadcast cross; one (source) rollup",
    "stream_ivf_delete_log": "drain of the streamed tombstone fold: flat LogicalRDD (foreachBatch appended delete ids per trigger); search = cell-pruned scan + broadcast LeftAnti + TakeOrdered, identical to the batch tombstone query",
    "docs_ccnet_lm_partition": "duplicate-collapsed LM scoring feeds distributed_rank (range repartition + local row_number + tiny offset join) and an arithmetic ntile; one (source,bucket) rollup — no SinglePartition window",
    "users_scd2_history": "two keyed windows (lag change-detect, lead interval-chain) sharing the user_id exchange; never a SinglePartition window (plan-pinned)",
    "ann_ivf_topk_deletes": "ann_ivf_topk plus ONE broadcast anti-join (LeftAnti, BuildRight) against the tombstone ids between the cell-pruned shortlist and the TakeOrdered re-rank",
    "docs_leakage_safe_split": "dedup_clusters' collapsed-rep CC feeds a left join onto the doc scan; split = stateless hash projection of the cluster rep — no new shuffle beyond the CC itself",
    "stream_minhash_neardup_bounded": "drain of the bounded-state stream: flat LogicalRDD (foreachBatch kept one (min id, last event) entry per live band signature, vectorized keyed min-merge + horizon eviction; pairs emitted per trigger, final groupBy(id) min over pairs only)",
    "q2_min_cost_supplier_skew": "skew variant: generator relation plants a hot suppkey; both argmax aggregations key on ps_partkey (uniform); every suppkey join broadcast — no SortMergeJoin anywhere (plan-pinned)",
    # round-12 first wave
    "docs_bm25_topk": "inverted-index retrieval: query terms equi-join the persisted posting list AFTER the df-cap prune (fan-out bounded per term); idf/tf math is log-free rational scaled to integer micros BEFORE the per-(q,doc) sum; per-query top-k window keyed on q_id",
    "retrieval_mrr_by_source": "shares the BM25 scoring pass; hit@3 and reciprocal-rank mass fold to integers per (query, source) then one source rollup — the eval adds two keyed exchanges to the scoring plan",
    "users_weekly_snapshot_scd2": "weekly snapshots by one grouped max(struct(...)) (never a raw-event window); change-detect + interval-chain share a single user_id exchange",
    "dedup_clusters_incremental": "quotient-graph fold: batch attaches to RESIDENT corpus state (Scan ExistingRDD — content groups, labels, rep bands as checkpointed tables); exact layer = content-hash join, near layer = asymmetric batch x corpus-rep LSH, CC runs on old-cluster-CONTRACTED nodes only",
    "corpus_source_interleave_order": "two distributed_rank constructions (within-source quality rank; global interleave position on the (rank, source-rr) key) — range repartition + local row_number + tiny offset broadcasts; no SinglePartition window",
    # round-12 second wave
    "embedding_probe_train_scores": "trained probe: Gram/moment sufficient statistics collected in the builder (one 64-group aggregation); the shipped plan is the pure int64 zip_with margin fold + top-10%% distributed_rank keep gate + 1-row count broadcast",
    "embedding_probe_heldout_eval": "no-leakage eval: train-slice Gram in the builder; shipped plan = margin fold + PER-SPLIT distributed_rank (part_cols=split) + 2-row split-count broadcast + one (split,y,kept) rollup",
    "doc_kneser_ney_bigram": "Kneser-Ney on duplicate-collapsed content: ONE grouped agg on the persisted bigram-type table yields c(w1 .) AND the forward continuation count; backward continuation a second keyed agg; type total broadcast; copies re-attach by the rep join",
    "dedup_clusters_retract": "right-to-be-forgotten retraction: resident labelling (Scan ExistingRDD) semi-joined against retracted ids -> touched-cluster ids BROADCAST; the pair+CC pipeline re-runs on the touched clusters' surviving members only (no corpus-wide propagation)",
    "embedding_probe_unlearn": "exact unlearning: resident Gram stats minus one deleted-slice aggregation (cost ~ |deleted|) in the builder; shipped plan = survivor margin fold + top-10%% distributed_rank + 1-row count broadcast — identical shape to the train query",
    # round-13
    "doc_kn_trigram": "modified-KN trigrams on duplicate-collapsed content: nested zip_with trigram build (no self-joins); keyed aggs on the persisted trigram-type table (top counts, continuation counts, both context rollups); six discounts (clamped into [0,k]) from two collected 4-int count-of-count rows; scoring = five keyed joins + per-row float tree; scored relation RESIDENT per (session,dataset) — estimation once (cold), repeat calls + downstream consumers serve the checkpoint",
    "probe_gate_calibration": "trained-probe threshold ladder: margin fold over the resident weights, ONE distributed_rank shared by all rungs, 5-row literal explode, broadcast token-count join, <=5-group rollup",
    "doc_moore_lewis_select": "cross-entropy-difference selection: in-domain and general count tables from ONE shared bigram-type stream (two keyed aggs, in-domain weighted by per-rep in-lang copy count); scoring = six LEFT keyed joins + two broadcast scalar totals + the CASE backoff ladder; keep gate = ONE distributed_rank on the rounded score + 1-row count broadcast",
    "doc_kn_unlearn": "exact LM unlearning: resident full-corpus bigram counts (Scan ExistingRDD) minus one erased-slice aggregation (cost ~ |deleted|) via a keyed LEFT-join subtraction; survivor scoring re-derives context/continuation tables from the corrected integer state — identical shape to the batch KN query",
    "stream_kn_counts_fold": "drain of the LM count maintenance stream: serve reads the folded versioned count table (parquet scan), derives context/continuation tables with the batch query's exact keyed-agg plan; per-trigger fold was batch bigram counts + vocab-squared-bounded keyed merge",
    # round-13 third wave
    "retrieval_rrf_hybrid": "RRF fusion: the shared BM25 inverted-index pass (df-cap-pruned term equi-join) FULL-OUTER-merged with the dense list (corpus argmax cell from one sorted struct array — no shuffle; query probe cells BROADCAST to the cell equi-join; exact cosine only on cell candidates); both rank windows partitioned by q_id; fusion arithmetic integer div",
    "retrieval_ndcg_eval": "graded nDCG: fused top-k joins two slim doc-dim projections; the six DCG terms are integer LITERALS (no runtime ln); ideal-DCG counts from one (lang,bucket) aggregate broadcast back; |sources|-group rollup with map-side partials",
    "kn_gate_calibration": "LM-scorer threshold ladder: the certified KN3 scoring pass, ONE distributed_rank on (rounded logprob, doc_id) shared by all rungs, 5-row literal explode, source join, <=5-group rollup",
    # round-13 fourth wave
    "retrieval_fusion_gain": "fusion ablation: the three pinned list passes union by name (each <= k rows/query), ONE label join against two slim doc-dim projections, per-(arm,q) min, 3-literal arm explode on the query base, 3-group rollup — all rank mass integer micros",
    "gate_agreement_matrix": "gate redundancy audit: shared population persisted ONCE (the KN pass is the expensive input), THREE distributed_rank passes (one per score, never a global window) joined back on doc_id, 1-row budget broadcast, 3-literal pair explode, 3-group rollup; kappa one double expression over integer confusion counts",
    # round-13 fifth wave
    "embedding_dim_ablation": "Matryoshka truncation curve: ONE corpus projection computes all four truncated cosines (slice + fold, JVM-side), slim (vec_id,dim,cos) relation persisted, every top-k a TakeOrderedAndProject over it (a PARTITION BY dim window would put the corpus in 4 reducers), 10-row ground-truth broadcast join",
    "corpus_shard_assignment": "deterministic hash-sharding audit: one scan computes shard id + token count JVM-side, 16-group aggregate with map-side partials, 1-row total broadcast; at scale the shard expression IS the write's repartition key",
    "retrieval_rrf_weight_sweep": "weighted-RRF ladder: the pinned full-outer fusion relation crossed with a 5-row literal weight relation, every rank window keyed on (w_pct,q_id), label join on two slim dim projections, <=5-group rollup — all mass integer micros x integer percents",
    # round-13 sixth wave
    "source_quality_scorecard": "per-source scorecard: the three certified scoring passes feed two LEFT hash joins on doc_id + ONE |sources|-group aggregate with map-side partials; means round once at the end",
    "dedup_cross_shard_rate": "cross-shard dup audit: the pinned LSH pair pass (band equi-join on representatives) + two hash joins against a slim (id,shard) projection + a 2-group rollup",
    "epoch_token_budget": "sampling plan: one grouped token sum (map-side partials), 1-row normalizer broadcast, narrow projection — q_weight rounded once, every downstream number derived from the pinned double",
    # round-13 seventh wave
    "stream_scorecard_fold": "drain of the telemetry maintenance stream: serve is one projection over the folded |sources|-row parquet state; per-trigger fold was batch stats + a |sources|-bounded keyed integer merge (emit_versioned crash/replay contract)",
    "scorecard_unlearn": "exact telemetry correction: full per-source stats LEFT-join the erased slice's stats (cost ~ |deleted|) and subtract int64 fields; serve projection identical to the fold's",
    "retrieval_recall_eval": "recall@3 per arm: the three pinned list passes union by name, one label join + (arm,q) count, achievable-set sizes from one (lang,bucket) aggregate broadcast back, 3-group rollup — recall micros integer div",
    "mixture_realized_counts": "realize the sampling plan: |sources|-row plan relation (grouped sum + 1-row normalizer) broadcast against the corpus scan; repetition counted not materialized (no Generate); gate = portable hash vs floor(frac*2^20) of the pinned 4dp repeat; |sources|-group audit rollup",
    "gate_stack_yield": "stack ROI: the SHARED gate construction (one persisted population, three distributed ranks, 1-row budget broadcast) + token join + 8-combo literal explode over slim booleans + 8-group rollup; oracle expands combos by zipped unnest (ONE gt scan — a UNION ALL inlined the gate chain 8x, 318 s vs 13 s)",
    "stream_rrf_fold": "fused maintained-asset serve: resident checkpointed top-k (the state is immutable between folds); the plan is the checkpoint scan — the build's arms (postings rank + cell-join rank + full-outer RRF merge) run once in the fold, pinned by test_round14",
    "retrieval_unlearn": "erasure-corrected fused serve: same resident-checkpoint scan; the correction itself is broadcast tombstone anti-joins on both arms + keyed df/meta decrements sized by the erasure batch",
    "gate_ensemble_calibration": "learned gate: scoring is a shuffle-free zip_with fold over the resident gated population (checkpoint scan); token counts equi-joined in BEFORE the rank with NO hint (a forced broadcast of the corpus-sized relation was round 14's one weak grade); ONE distributed_rank + 5-literal rung explode + <=5-group rollup; training was one 4-row Gram aggregation + driver GD",
    "stream_ensemble_stats_fold": "streamed ensemble statistics: the serve refits driver-side on the drained 4-row relation and reuses the calibration ladder's exact plan (resident-population scan + pre-rank token join + one distributed_rank); the fold itself is one batch-sized aggregation + 4-row keyed add per trigger",
    "gate_mcnemar_accuracy": "paired gate-accuracy test: resident gated-frame checkpoint scan + broadcast label join + 3-literal pair explode + 3-group rollup; the chi2 is integer div arithmetic over the rollup",
    "source_keyness_terms": "per-source keyness: one tokenize+explode scan, the per-(source,term) aggregate is the only data-sized shuffle, per-term join + broadcast source totals + 1-row grand total, source-keyed rank window",
    "gate_ensemble_ablation": "leave-one-out ensemble: four driver-side GD refits on the resident 128-byte statistics, 4-literal arm explode over ONE population scan, one (arm,_pid)-keyed distributed_rank, 1-row budget broadcast, 4-group rollup",
    "probe_margin_reliability": "probe calibration curve: scoring projection vs resident weights (no Python), one range-partitioned distributed_rank, ntile from rank arithmetic (no second window), 10-group rollup",
    "retrieval_cells_recall_curve": "recall-vs-cells: four cell-join arms through the shared dense helpers (the n_cells=1 arm IS brute force via an equi-join on a constant cell — no CartesianProduct node); truth list persisted + broadcast into each overlap join; 4-group rollup",
    "q2_min_cost_supplier": "derived partsupp (generator over part scan); dims broadcast; grouped-min + equality join share the part key; bounded top-100",
    "q11_important_stock": "one grouped sum; scalar total broadcast-crossed; threshold compares rounded-vs-rounded doubles",
    "q20_potential_promotion": "lineitem rollup is the only data-sized shuffle; partsupp joins it on the same composite key; dims broadcast",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("dump_plans", cpus=8)
    qs = catalog.queries()
    out = [
        "# PLANS — captured physical plans (sf0.01, local[8], AQE final)",
        "",
        "Regenerated by `python scripts/dump_plans.py`; the same shapes are",
        "asserted in `tests/test_plans.py`.",
        "",
    ]
    for name, note in NOTES.items():
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        tree = physical_plan(df).split("\n\n")[0].strip()
        # InMemoryRelation reprints its entire cached subtree at every
        # scan (nested caches multiply) — a multi-thousand-line section
        # adds nothing reviewable; keep the head, which holds the
        # driving plan, and mark the cut
        lines = tree.split("\n")
        if len(lines) > 600:
            kept = lines[:600]
            kept.append(
                f"... [{len(lines) - 600} lines of repeated cached "
                "subtrees truncated — shapes asserted in "
                "tests/test_plans.py]"
            )
            tree = "\n".join(kept)
        out += [
            f"## {name}",
            "",
            f"**{note}** (exchanges: {count_exchanges(df)})",
            "",
            "```",
            tree,
            "```",
            "",
        ]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
