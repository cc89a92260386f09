"""Round-13 fifth wave contracts: the dim ablation reproduces a
pure-Python truncated-cosine eval, the shard assignment is a
deterministic total partition of the corpus, and the weight sweep's
endpoints coincide with the pure arms' MRR."""

import math

from ffiec_pq_spark.queries.round13d import (
    _ABL_DIMS,
    _ABL_K,
    _N_SHARDS,
    _SHARD_SEED,
    _W_PCTS,
    _abl_probe,
)
from ffiec_pq_spark.session import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_dim_ablation_matches_pure_python(spark, sf_dir):
    """embedding_dim_ablation equals a from-scratch Python eval:
    per-dim truncated cosine (rounded 6 dp before rank, vec_id ties),
    top-10 per dim, overlap with the full-dim top-10 — and the
    full-dim rung is exactly recall 1.0."""
    from ffiec_pq_spark.catalog import queries

    probe = _abl_probe()
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
        if r["embedding"] is not None and len(r["embedding"]) > 0
    }

    def topk(d):
        scored = []
        for vid, e in vecs.items():
            dot = sum(float(a) * b for a, b in zip(e[:d], probe[:d]))
            ne = math.sqrt(sum(float(a) * a for a in e[:d]))
            nq = math.sqrt(sum(b * b for b in probe[:d]))
            if ne * nq == 0:
                continue
            scored.append((-round(dot / (ne * nq), 6), vid))
        return [v for _, v in sorted(scored)[:_ABL_K]]

    full = set(topk(_ABL_DIMS[-1]))
    expected = sorted(
        (
            d,
            len(set(topk(d)) & full),
            round(len(set(topk(d)) & full) / _ABL_K, 6),
        )
        for d in _ABL_DIMS
    )
    got = _rows(queries()["embedding_dim_ablation"](spark, sf_dir))
    assert got == expected
    by_dim = {r[0]: r for r in got}
    assert by_dim[_ABL_DIMS[-1]][1] == _ABL_K  # full dim recalls itself


def test_shard_assignment_is_total_and_deterministic(spark, sf_dir):
    """corpus_shard_assignment partitions every document exactly once
    (doc and token totals equal the corpus totals), shard ids cover
    [0, 16), balance ratios average 1.0 by construction, and a second
    run returns the identical assignment."""
    from ffiec_pq_spark.catalog import queries
    from ffiec_pq_spark.operators.text import token_count

    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_tok = docs.select(F.sum(token_count("text")).alias("s")).collect()[0][
        "s"
    ]
    got = _rows(queries()["corpus_shard_assignment"](spark, sf_dir))
    assert all(0 <= r[0] < _N_SHARDS for r in got)
    assert sum(r[1] for r in got) == n_docs
    assert sum(r[2] for r in got) == n_tok
    assert abs(
        sum(r[4] for r in got) / len(got) - 1.0
    ) < 0.02  # ratios straddle 1
    again = _rows(queries()["corpus_shard_assignment"](spark, sf_dir))
    assert got == again
    assert _SHARD_SEED == 13  # the seed is part of the contract


def test_weight_sweep_endpoints_are_the_pure_arms(spark, sf_dir):
    """retrieval_rrf_weight_sweep at w=100 equals the lexical arm's
    MRR from retrieval_fusion_gain, and at w=0 the dense arm's —
    the sweep's endpoints ARE the ablation's pure rows."""
    from ffiec_pq_spark.catalog import queries

    sweep = {
        r["w_pct"]: (r["n_queries"], r["n_hits"], r["sum_rr_micro"])
        for r in queries()["retrieval_rrf_weight_sweep"](
            spark, sf_dir
        ).collect()
    }
    assert sorted(sweep) == sorted(_W_PCTS)
    gain = {
        r["arm"]: (r["n_queries"], r["n_hits"], r["sum_rr_micro"])
        for r in queries()["retrieval_fusion_gain"](spark, sf_dir).collect()
    }
    assert sweep[100] == gain["lex"]
    assert sweep[0] == gain["dense"]
    # w=50 scales the symmetric RRF mass by 50 — same order, same
    # ties — so its MRR is exactly the hybrid arm's
    assert sweep[50] == gain["hybrid"]
