"""Algebraic invariants of the round-6 decision/audit queries — the
statements a user relies on when READING these outputs, beyond the
value-hash oracle (which proves the numbers, not the shape of the
curve):

- a generalization ladder can only merge equivalence classes, so
  k-anonymity is monotone in the level;
- threshold ladders (dedup ROI, quality sweep) are monotone in the
  threshold by construction;
- KL divergence of a smoothed full-support distribution is
  non-negative (Gibbs);
- hard negatives are, by definition, cross-label and unique per probe;
- temperature-smoothed mixture weights are distributions.
"""

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import queries


def test_k_anonymity_ladder_is_monotone(spark, sf_dir):
    rows = {
        r["level"]: r
        for r in queries()["customer_k_anonymity"](spark, sf_dir).collect()
    }
    assert set(rows) == {0, 1, 2}
    # generalizing merges classes: fewer classes, larger smallest class,
    # no more people at risk
    for lo, hi in [(0, 1), (1, 2)]:
        assert rows[hi]["n_classes"] <= rows[lo]["n_classes"]
        assert rows[hi]["k_anonymity"] >= rows[lo]["k_anonymity"]
        assert rows[hi]["n_at_risk"] <= rows[lo]["n_at_risk"]


def test_dedup_roi_curve_is_monotone_in_threshold(spark, sf_dir):
    rows = sorted(
        queries()["dedup_roi_curve"](spark, sf_dir).collect(),
        key=lambda r: r["thr"],
    )
    assert rows, "fixture corpus has near-dup pairs by design"
    for a, b in zip(rows, rows[1:]):
        assert b["n_pairs"] <= a["n_pairs"]
        assert b["n_docs_dropped"] <= a["n_docs_dropped"]
        assert b["tokens_dropped"] <= a["tokens_dropped"]


def test_quality_sweep_is_monotone_and_conserves_total(spark, sf_dir):
    rows = sorted(
        queries()["quality_threshold_sweep"](spark, sf_dir).collect(),
        key=lambda r: r["thr"],
    )
    assert len(rows) == 6
    assert len({r["n_total"] for r in rows}) == 1  # same corpus each rung
    for a, b in zip(rows, rows[1:]):
        assert b["n_kept"] <= a["n_kept"]
        assert b["tokens_kept"] <= a["tokens_kept"]


def test_kl_drift_is_nonnegative(spark, sf_dir):
    rows = queries()["source_bigram_kl_drift"](spark, sf_dir).collect()
    assert rows
    # smoothed distributions share full support over the observed
    # bucket grid -> Gibbs' inequality (tolerance for the 6dp rounding)
    for r in rows:
        assert r["kl_vs_corpus"] >= -1e-6, r


def test_hard_negatives_are_cross_label_and_unique(spark, sf_dir):
    df = queries()["hard_negative_mining"](spark, sf_dir)
    rows = df.collect()
    assert rows
    assert len({r["probe_id"] for r in rows}) == len(rows)  # one per probe
    for r in rows:
        assert r["neg_label"] != r["probe_label"]
        assert -1.000001 <= r["score"] <= 1.000001


def test_sampling_temperature_weights_are_distributions(spark, sf_dir):
    rows = queries()["corpus_sampling_temperature"](spark, sf_dir).collect()
    assert rows
    for col in ["p_raw", "q_a03", "q_a07"]:
        s = sum(r[col] for r in rows)
        assert abs(s - 1.0) < 1e-3, (col, s)  # 6dp rounding x |sources|
    # alpha < 1 compresses the mixture: the spread of q is strictly
    # inside the spread of p whenever sources differ in size
    p = [r["p_raw"] for r in rows]
    q = [r["q_a03"] for r in rows]
    if max(p) > min(p):
        assert max(q) - min(q) < max(p) - min(p)


def test_selfjoin_audit_conserves_rows_and_bounds_pairs(spark, sf_dir):
    from ffiec_pq_spark.session import load_table

    rows = queries()["events_selfjoin_size_audit"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r["n_rows"] for r in rows) == ev.count()
    for r in rows:
        # the histogram bound must actually bound (cap >= max degree in
        # the bucket), and pairs >= keys (each key contributes >= 1)
        assert r["ub_pairs"] >= r["exact_pairs"] >= r["n_keys"]


def test_distributed_rank_keeps_null_partition_groups(spark, sf_dir):
    """PARTITION BY treats NULL as a real group; the offset join must be
    null-safe or the whole NULL-keyed group silently disappears."""
    from pyspark.sql import Window

    from ffiec_pq_spark.operators.windows import distributed_rank

    df = spark.createDataFrame(
        [(None, 3, 1), (None, 1, 2), ("a", 2, 3), ("a", 5, 4), (None, 2, 5)],
        "grp string, v int, id int",
    )
    got = {
        (r["grp"], r["id"]): r["r"]
        for r in distributed_rank(
            df, ["v", "id"], part_cols=["grp"], n_ranges=4
        ).collect()
    }
    w = Window.partitionBy("grp").orderBy("v", "id")
    want = {
        (r["grp"], r["id"]): r["r"]
        for r in df.withColumn("r", F.row_number().over(w)).collect()
    }
    assert got == want


def test_stopword_entropy_drops_empty_docs_on_both_engines(spark):
    """An empty-text document must be excluded from the per-lang
    profile identically on both engines (Spark's char filter removes
    the '' element; the oracle mirrors it with ch <> '')."""
    import tempfile

    import duckdb as ddb
    import pandas as pd

    from ffiec_pq_spark.catalog import oracles, queries
    from tests.oracle_compare import compare

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["the quick brown fox the", "", "a b the c of"],
            "lang": ["en", "en", "de"],
            "source": ["s1", "s1", "s2"],
            "n_chars": [23, 0, 12],
        }
    )
    d = tempfile.mkdtemp(prefix="entropy_edge_")
    con = ddb.connect()
    con.execute(
        f"COPY (SELECT * FROM pdf) TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    sdf = queries()["docs_stopword_entropy_lang"](spark, d)
    rel = con.sql(oracles()["docs_stopword_entropy_lang"])
    problems = compare(sdf, rel)
    con.close()
    assert not problems, problems
    # and the empty doc is really gone: en counts only the non-empty doc
    en = {r["lang"]: r["n_docs"] for r in sdf.collect()}
    assert en == {"en": 1, "de": 1}


def test_knn_spill_dir_reuse_is_isolated(spark):
    """Two knn_exact_topk calls sharing one spill_dir must not see each
    other's candidate files (each call spills into a fresh subdir)."""
    import tempfile

    from ffiec_pq_spark.operators.similarity import knn_exact_topk

    base = tempfile.mkdtemp(prefix="knn_spill_base_")
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0], i % 2) for i in range(20)],
        "vec_id long, embedding array<double>, label int",
    )
    probes_a = corpus.filter(F.col("vec_id") < 4)
    probes_b = corpus.filter(F.col("vec_id") >= 16)
    # tiny tile budget forces BOTH calls down the spill path
    a = knn_exact_topk(
        corpus, probes_a, k=1, tile_size=1, max_union_tiles=0,
        spill_dir=base,
    )
    a_qids = {r["q_id"] for r in a.collect()}
    b = knn_exact_topk(
        corpus, probes_b, k=1, tile_size=1, max_union_tiles=0,
        spill_dir=base,
    )
    b_qids = {r["q_id"] for r in b.collect()}
    assert a_qids == {0, 1, 2, 3}
    assert b_qids == {16, 17, 18, 19}  # no bleed-through from call A


def test_connected_components_releases_round_storage(spark):
    """Each propagation round must free the previous round's
    checkpoint blocks — a long chain graph may not stack O(rounds)
    label-set copies in executor storage (only the final round's
    checkpoint, which backs the returned frame, may remain)."""
    from ffiec_pq_spark.operators.dedup import connected_components

    n = 10  # chain 0-1-2-...-9: diameter forces many rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )

    def n_cached():
        return len(
            [
                i
                for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
                if i.numCachedPartitions() > 0
            ]
        )

    before = n_cached()
    labels = connected_components(pairs, max_iter=20, driver_max_edges=0)
    got = {r["id"]: r["cluster"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    after = n_cached()
    # final checkpoint (+ possible session-cache noise of 1)
    assert after - before <= 2, (before, after)


def test_derived_partsupp_invariants(spark, sf_dir, duck):
    """The derived partsupp (round-11 modulus = actual supplier
    count): exactly 4 rows per part, the 4 suppkeys DISTINCT within a
    part (17 stays coprime to the power-of-ten domains and the i*17
    offsets are distinct for any modulus > 51), every suppkey inside
    the REAL supplier key range so no partsupp row drops out of the
    supplier join — and the Spark relation row-for-row equals the
    oracle's CTE build (the trio's certification rests on the two
    relations being identical by construction, so pin it directly,
    not just through Q2/Q11/Q20)."""
    from ffiec_pq_spark.queries.tpch_fill import _PS_SQL, _partsupp
    from ffiec_pq_spark.session import load_table
    from tests.oracle_compare import compare

    ps = _partsupp(spark, sf_dir)
    from pyspark.sql import functions as F

    per_part = ps.groupBy("ps_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("ps_suppkey").alias("nd"),
    )
    bad = per_part.filter(
        (F.col("n") != 4) | (F.col("nd") != 4)
    ).count()
    assert bad == 0
    n_supp = load_table(spark, sf_dir, "supplier").count()
    rng = ps.agg(
        F.min("ps_suppkey").alias("lo"), F.max("ps_suppkey").alias("hi")
    ).first()
    assert rng["lo"] >= 0 and rng["hi"] <= n_supp - 1
    # full-domain coverage (the round-10 fixed %100 left 90% of the
    # sf0.1 suppliers with zero partsupp rows)
    n_parts = ps.select("ps_partkey").distinct().count()
    if n_parts * 4 >= n_supp * 8:  # enough rows to expect coverage
        used = ps.select("ps_suppkey").distinct().count()
        assert used == n_supp, (used, n_supp)

    rel = duck.sql(f"WITH {_PS_SQL} SELECT * FROM partsupp")
    assert not compare(ps, rel)


def test_skewed_partsupp_manufactures_ties_and_heat(spark, sf_dir):
    """The skew variant is only a meaningful Q2 test if its relation
    actually manufactures what the uniform one lacks: (a) parts whose
    minimum supply cost is SHARED by several suppliers (the argmax tie
    path), (b) one supplier holding ~25% of all rows (the hot join
    key), and (c) one deterministic winner row per qualifying part."""
    from ffiec_pq_spark.queries.round11 import (
        _partsupp_skew,
        q2_min_cost_supplier_skew,
    )

    ps = _partsupp_skew(spark, sf_dir)
    mc = ps.groupBy("ps_partkey").agg(F.min("ps_supplycost").alias("mc"))
    tied = (
        ps.join(mc.withColumnRenamed("ps_partkey", "_pk"),
                (F.col("ps_partkey") == F.col("_pk"))
                & (F.col("ps_supplycost") == F.col("mc")))
        .groupBy("ps_partkey")
        .agg(F.countDistinct("ps_suppkey").alias("n_min"))
        .filter(F.col("n_min") >= 2)
        .count()
    )
    assert tied > 0, "no part has a tied minimum — the tie path is dead"

    total = ps.count()
    hot = ps.filter(F.col("ps_suppkey") == 7).count()
    assert abs(hot / total - 0.25) < 0.05, (hot, total)

    out = q2_min_cost_supplier_skew(spark, sf_dir)
    dup_winners = (
        out.groupBy("p_partkey").count().filter(F.col("count") > 1).count()
    )
    assert dup_winners == 0


def test_leakage_safe_split_never_straddles(spark, sf_dir):
    """The split's whole point: no near-dup PAIR (and no exact copy)
    may straddle train/heldout, every doc gets exactly one side, and
    both sides are non-empty on the fixture corpus."""
    from ffiec_pq_spark.operators.dedup import minhash_near_dups
    from ffiec_pq_spark.queries.dedup import _K, _N_BANDS, _N_PERM, _THRESHOLD
    from ffiec_pq_spark.session import load_table

    out = queries()["docs_leakage_safe_split"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    assert out.count() == docs.count()
    sides = {r["split"] for r in out.select("split").distinct().collect()}
    assert sides == {"train", "heldout"}

    side = {r["doc_id"]: r["split"] for r in out.collect()}
    pairs = minhash_near_dups(
        docs, k=_K, n_perm=_N_PERM, n_bands=_N_BANDS, threshold=_THRESHOLD
    ).collect()
    assert pairs, "fixture corpus has near-dup pairs by design"
    for r in pairs:
        assert side[r["id_a"]] == side[r["id_b"]], (r["id_a"], r["id_b"])


def test_distributed_prefix_sum_matches_window(spark):
    """distributed_prefix_sum must be bit-identical to the
    single-reducer running-sum window, including NULL partition groups
    and values landing across range boundaries."""
    from pyspark.sql import Window

    from ffiec_pq_spark.operators.windows import distributed_prefix_sum

    df = spark.createDataFrame(
        [(None, 3, 1, 10), (None, 1, 2, 5), ("a", 2, 3, 7),
         ("a", 5, 4, 1), (None, 2, 5, 2), ("a", 2, 6, 4)],
        "grp string, v int, id int, tok long",
    )
    got = {
        (r["grp"], r["id"]): r["cum"]
        for r in distributed_prefix_sum(
            df, "tok", ["v", "id"], part_cols=["grp"], n_ranges=4
        ).collect()
    }
    w = (
        Window.partitionBy("grp")
        .orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r["grp"], r["id"]): r["cum"]
        for r in df.withColumn("cum", F.sum("tok").over(w)).collect()
    }
    assert got == want


def test_token_budget_greedy_is_a_maximal_prefix(spark, sf_dir):
    """The kept set must be exactly the maximal quality-ordered prefix
    fitting the budget: total kept tokens <= 40% of corpus tokens, and
    adding the single next-best document would overshoot."""
    from ffiec_pq_spark.operators.text import quality_score, tokens
    from ffiec_pq_spark.operators.windows import distributed_prefix_sum
    from ffiec_pq_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = queries()["corpus_token_budget_greedy"](spark, sf_dir).collect()
    total = sum(r["n_tokens"] for r in out)
    kept = sum(r["tokens_kept"] for r in out)
    budget = total * 2 // 5
    assert kept <= budget
    # maximality: the first not-kept doc in quality order overshoots
    q = docs.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("n_tok"),
        quality_score("text").alias("q"),
    )
    c = distributed_prefix_sum(
        q, "n_tok", order_cols=[F.col("q").desc(), F.col("doc_id")]
    )
    first_out = (
        c.filter(F.col("cum") > budget)
        .orderBy("cum")
        .limit(1)
        .collect()
    )
    if first_out:
        assert kept + first_out[0]["n_tok"] > budget
