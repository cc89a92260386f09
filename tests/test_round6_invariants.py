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
