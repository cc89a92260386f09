"""Round-13 sixth wave contracts: the scorecard's coverage counts and
masses reconcile against the constituent scorers, the cross-shard
audit partitions exactly the certified near-dup pairs, and the token
budget is a conserved allocation with correct exhaustion flags."""

import math

import pyspark.sql.functions as F

from ffiec_pq_spark.queries.round13d import _N_SHARDS, _SHARD_SEED
from ffiec_pq_spark.queries.round13e import (
    _ETB_EPOCHS,
    _ETB_MAX_REPEAT,
)
from ffiec_pq_spark.session import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_scorecard_reconciles_with_constituents(spark, sf_dir):
    """Per-source doc counts and token sums equal the documents
    table's own rollup; probe and KN coverage sums equal the
    constituent scorers' populations; every mean lies within its
    score's range."""
    from ffiec_pq_spark.catalog import queries
    from ffiec_pq_spark.operators.text import token_count
    from ffiec_pq_spark.queries.round12b import probe_corpus
    from ffiec_pq_spark.queries.round13 import doc_kn_trigram

    got = {
        r["source"]: r
        for r in queries()["source_quality_scorecard"](
            spark, sf_dir
        ).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    base = {
        r["source"]: (r["n"], r["t"])
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(token_count("text")).alias("t"),
        )
        .collect()
    }
    assert set(got) == set(base)
    for s, (n, t) in base.items():
        assert got[s]["n_docs"] == n
        assert got[s]["n_tokens"] == t
        assert 0.0 <= got[s]["mean_quality"] <= 1.0
    n_probe = probe_corpus(spark, sf_dir).count()
    n_kn = doc_kn_trigram(spark, sf_dir).count()
    assert sum(r["n_probe"] for r in got.values()) == n_probe
    assert sum(r["n_kn"] for r in got.values()) == n_kn
    assert all(
        r["mean_kn_logprob"] < 0 for r in got.values() if r["n_kn"] > 0
    )


def test_cross_shard_rate_partitions_the_pair_set(spark, sf_dir):
    """The locality rollup is a partition of exactly the certified
    minhash pair relation: pair counts sum to |pairs|, each pair's
    locality matches a from-scratch shard computation, and on a
    16-shard uniform hash the cross side dominates."""
    from ffiec_pq_spark.catalog import queries
    from ffiec_pq_spark.functions.hashing import hash60

    pairs = queries()["dedup_minhash_lsh"](spark, sf_dir).collect()
    ids = load_table(spark, sf_dir, "documents").select(
        "doc_id", (hash60("doc_id", seed=_SHARD_SEED) % _N_SHARDS).alias("s")
    )
    shard = {r["doc_id"]: r["s"] for r in ids.collect()}
    n_within = sum(
        1 for p in pairs if shard[p["id_a"]] == shard[p["id_b"]]
    )
    got = {
        r["locality"]: r
        for r in queries()["dedup_cross_shard_rate"](spark, sf_dir).collect()
    }
    assert sum(r["n_pairs"] for r in got.values()) == len(pairs)
    assert got.get("within", {"n_pairs": 0})["n_pairs"] == n_within
    if len(pairs) >= _N_SHARDS:
        assert got["cross"]["n_pairs"] > got.get(
            "within", {"n_pairs": 0}
        )["n_pairs"]


def test_epoch_budget_is_conserved_and_flags_correctly(spark, sf_dir):
    """Allocated tokens sum to ~the budget (floor rounding loses < 1
    token per source), each repeat factor is alloc-consistent, and the
    exhausted flag is exactly repeat_factor > the ceiling."""
    from ffiec_pq_spark.catalog import queries
    from ffiec_pq_spark.operators.text import token_count

    rows = queries()["epoch_token_budget"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(F.sum(token_count("text")).alias("t")).collect()[0][
        "t"
    ]
    budget = _ETB_EPOCHS * total
    alloc = sum(r["alloc_tokens"] for r in rows)
    # floors + the 6dp weight rounding lose at most a sliver
    assert abs(alloc - budget) <= max(1.0, 1e-4 * budget) + len(rows)
    for r in rows:
        assert r["exhausted"] == (r["repeat_factor"] > _ETB_MAX_REPEAT)
        assert math.isclose(
            r["repeat_factor"],
            round(r["q_weight"] * budget / r["n_tok"], 4),
            abs_tol=1e-9,
        )
    assert any(r["exhausted"] for r in rows) or all(
        r["repeat_factor"] <= _ETB_MAX_REPEAT for r in rows
    )


def test_mixture_realization_matches_pure_python(spark, sf_dir):
    """mixture_realized_counts equals a from-scratch Python
    realization (pinned 4dp repeat factors, floor(frac*2^20) gate
    thresholds, the portable hash), and the realized total tracks the
    planned budget within the Bernoulli-rounding band."""
    import hashlib

    from ffiec_pq_spark.catalog import queries
    from ffiec_pq_spark.queries.round13e import (
        _ETB_ALPHA,
        _MIX_GRID,
        _MIX_SEED,
    )

    docs = [
        (r["doc_id"], r["source"], len(r["text"].strip().split()))
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    per_src = {}
    for _, s, t in docs:
        per_src[s] = per_src.get(s, 0) + t
    n = sum(per_src.values())
    z = sum(v ** _ETB_ALPHA for v in per_src.values())
    plan = {}
    for s, t in per_src.items():
        q = round(t ** _ETB_ALPHA / z, 6)
        alloc = math.floor(q * (_ETB_EPOCHS * n))
        rf = round(q * (_ETB_EPOCHS * n) / t, 4)
        plan[s] = (t, alloc, math.floor(rf),
                   math.floor((rf - math.floor(rf)) * _MIX_GRID))

    def h60(doc_id):
        return int(
            hashlib.md5(f"s{_MIX_SEED}:{doc_id}".encode()).hexdigest()[:15],
            16,
        )

    realized = {}
    for d, s, t in docs:
        base, thr = plan[s][2], plan[s][3]
        rep = base + (1 if h60(d) % _MIX_GRID < thr else 0)
        realized[s] = realized.get(s, 0) + rep * t
    expected = sorted(
        (
            s,
            plan[s][0],
            plan[s][1],
            realized.get(s, 0),
            round(realized.get(s, 0) / plan[s][1], 4)
            if plan[s][1] else None,
        )
        for s in per_src
    )
    got = _rows(queries()["mixture_realized_counts"](spark, sf_dir))
    assert got == expected
    planned_total = sum(r[2] for r in got)
    realized_total = sum(r[3] for r in got)
    assert abs(realized_total - planned_total) < 0.2 * planned_total
