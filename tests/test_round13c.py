"""Round-13 third wave contracts: the RRF fusion reproduces an
independent pure-Python merge of its two input lists, the graded nDCG
reproduces a pure-Python per-query eval (second oracle besides DuckDB),
and the KN gate ladder is monotone in the threshold."""

import math

from pyspark.sql import functions as F

from ffiec_pq_spark.queries.round13c import (
    _FUSE_TOPK,
    _G,
    _NDCG_BUCKET,
    _NDCG_K,
    _RRF_K,
    _dense_topk_frame,
    _rrf_hybrid_frame,
)
from ffiec_pq_spark.session import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_rrf_fusion_matches_pure_python_merge(spark, sf_dir):
    """The fused ranking equals an independent dict-based RRF merge of
    the two constituent lists (collected separately): per (q, doc),
    rrf_micro = 1e6 div (60+lex_rank) + 1e6 div (60+dense_rank) with
    missing-list contributions zero, fused rank by (-rrf, doc_id)."""
    from ffiec_pq_spark.queries.round12 import _bm25_topk_frame

    lex = {
        (r["q_id"], r["doc_id"]): r["rank"]
        for r in _bm25_topk_frame(spark, sf_dir).collect()
    }
    dense = {
        (r["q_id"], r["doc_id"]): r["d_rank"]
        for r in _dense_topk_frame(spark, sf_dir).collect()
    }
    scores = {}
    for (q, d), rk in lex.items():
        scores[(q, d)] = scores.get((q, d), 0) + 1000000 // (_RRF_K + rk)
    for (q, d), rk in dense.items():
        scores[(q, d)] = scores.get((q, d), 0) + 1000000 // (_RRF_K + rk)
    by_q = {}
    for (q, d), s in scores.items():
        by_q.setdefault(q, []).append((-s, d))
    expected = []
    for q, lst in by_q.items():
        for i, (neg_s, d) in enumerate(sorted(lst)[:_FUSE_TOPK], 1):
            expected.append(
                (
                    q,
                    i,
                    d,
                    -neg_s,
                    1 if (q, d) in lex else 0,
                    1 if (q, d) in dense else 0,
                )
            )
    got = _rows(_rrf_hybrid_frame(spark, sf_dir))
    assert got == sorted(expected)
    # the fusion is genuinely hybrid on this corpus: some fused rows
    # come from each list alone and at least one from both
    assert any(r[4] == 1 and r[5] == 0 for r in got)
    assert any(r[4] == 0 and r[5] == 1 for r in got)


def test_ndcg_matches_pure_python_eval(spark, sf_dir):
    """retrieval_ndcg_eval equals a from-scratch Python eval: graded
    gains from the doc dims, DCG/IDCG from the same six precomputed
    integer terms, per-query integer-division ratio, source rollup."""
    from ffiec_pq_spark.catalog import queries

    docs = {
        r["doc_id"]: (r["source"], r["lang"], r["n_chars"] // _NDCG_BUCKET)
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    corpus = {d: v for d, v in docs.items() if d % 10 != 0}
    topk = {}
    for r in _rrf_hybrid_frame(spark, sf_dir).collect():
        topk.setdefault(r["q_id"], []).append((r["rank"], r["doc_id"]))
    per_source = {}
    for q, (q_src, q_lang, q_b) in docs.items():
        if q % 10 != 0:
            continue
        n_sl = sum(
            1 for (lg, b) in ((v[1], v[2]) for v in corpus.values())
            if lg == q_lang and b == q_b
        )
        n_s = sum(1 for v in corpus.values() if v[1] == q_lang)
        t = min(_NDCG_K, n_sl)
        o = min(_NDCG_K - t, n_s - n_sl)
        idcg = sum(
            _G[(2, r)] if t >= r else (_G[(1, r)] if t + o >= r else 0)
            for r in (1, 2, 3)
        )
        dcg = 0
        for rank, d in topk.get(q, []):
            c_lang, c_b = corpus[d][1], corpus[d][2]
            gain = 2 if (c_lang, c_b) == (q_lang, q_b) else (
                1 if c_lang == q_lang else 0
            )
            if gain:
                dcg += _G[(gain, rank)]
        agg = per_source.setdefault(q_src, [0, 0, 0, 0])
        agg[0] += 1
        if idcg > 0:
            ndcg = dcg * 1000000 // idcg
            agg[1] += 1
            agg[2] += ndcg
            agg[3] += 1 if ndcg == 1000000 else 0
    expected = sorted(
        (s, a[0], a[1], a[2], a[3]) for s, a in per_source.items()
    )
    got = _rows(queries()["retrieval_ndcg_eval"](spark, sf_dir))
    assert got == expected
    # the proxy is non-degenerate on this corpus: something evaluable,
    # something scored above zero
    assert sum(r[2] for r in got) > 0
    assert sum(r[3] for r in got) > 0


def test_fusion_gain_matches_pure_python_mrr(spark, sf_dir):
    """retrieval_fusion_gain equals a from-scratch Python MRR over the
    three arm lists (each collected independently), and the fused
    arm's reciprocal-rank mass is >= each constituent's minus the mass
    the constituent had in ranks the fused list truncated (sanity:
    here we just assert the exact per-arm numbers)."""
    from ffiec_pq_spark.catalog import queries
    from ffiec_pq_spark.queries.round12 import _bm25_topk_frame

    docs = {
        r["doc_id"]: (r["lang"], r["n_chars"] // _NDCG_BUCKET)
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    q_ids = [d for d in docs if d % 10 == 0]
    arms = {
        "lex": [
            (r["q_id"], r["rank"], r["doc_id"])
            for r in _bm25_topk_frame(spark, sf_dir).collect()
        ],
        "dense": [
            (r["q_id"], r["d_rank"], r["doc_id"])
            for r in _dense_topk_frame(spark, sf_dir).collect()
        ],
        "hybrid": [
            (r["q_id"], r["rank"], r["doc_id"])
            for r in _rrf_hybrid_frame(spark, sf_dir).collect()
        ],
    }
    expected = []
    for arm, lst in arms.items():
        first = {}
        for q, rk, d in lst:
            if d % 10 != 0 and docs[d] == docs[q]:
                first[q] = min(first.get(q, rk), rk)
        expected.append(
            (
                arm,
                len(q_ids),
                len(first),
                sum(1000000 // r for r in first.values()),
            )
        )
    got = _rows(queries()["retrieval_fusion_gain"](spark, sf_dir))
    assert got == sorted(expected)
    by_arm = {r[0]: r for r in got}
    # the fused arm can't lose to BOTH constituents on hits (it
    # contains the union's head) — and on this corpus it wins
    assert by_arm["hybrid"][2] >= max(
        by_arm["lex"][2], by_arm["dense"][2]
    ) or by_arm["hybrid"][3] >= max(by_arm["lex"][3], by_arm["dense"][3])


def test_gate_agreement_matches_pure_python_kappa(spark, sf_dir):
    """gate_agreement_matrix equals a from-scratch Python computation:
    shared population, three independent top-20% cuts, pairwise
    confusion counts and kappa — and the equal-budget invariants hold
    (n_kept identical across pairs, n_disagree even)."""
    from ffiec_pq_spark.catalog import queries
    from ffiec_pq_spark.queries.round13c import _AGREE_PCT

    pops = queries()["gate_agreement_matrix"](spark, sf_dir).collect()
    rows = {r["pair"]: r for r in pops}
    assert set(rows) == {"heuristic~probe", "heuristic~kn", "probe~kn"}
    n = rows["heuristic~probe"]["n"]
    kb = max(n * _AGREE_PCT // 100, 1)
    for r in rows.values():
        assert r["n"] == n
        assert r["n_kept"] == kb
        # equal marginals -> disagreements come in pairs
        assert r["n_disagree"] % 2 == 0
        assert (
            r["n_both_kept"] + r["n_both_dropped"] + r["n_disagree"] == n
        )
        if 0 < kb < n:
            po = (r["n_both_kept"] + r["n_both_dropped"]) / n
            pe = (kb * kb + (n - kb) * (n - kb)) / (n * n)
            assert math.isclose(
                r["kappa"], round((po - pe) / (1 - pe), 6), abs_tol=1e-6
            )


def test_kn_gate_ladder_is_monotone(spark, sf_dir):
    """Widening the keep percentile can only add documents: n_kept,
    trigrams_kept and n_sources_kept are nondecreasing in thr_pct, and
    every rung keeps at least one document (the greatest(..., 1)
    floor)."""
    from ffiec_pq_spark.catalog import queries

    rows = {
        r["thr_pct"]: r
        for r in queries()["kn_gate_calibration"](spark, sf_dir).collect()
    }
    pcts = sorted(rows)
    assert pcts == [5, 10, 20, 30, 50]
    for lo, hi in zip(pcts, pcts[1:]):
        assert rows[lo]["n_kept"] <= rows[hi]["n_kept"]
        assert rows[lo]["trigrams_kept"] <= rows[hi]["trigrams_kept"]
        assert rows[lo]["n_sources_kept"] <= rows[hi]["n_sources_kept"]
    assert rows[5]["n_kept"] >= 1
    n_total = rows[5]["n_total"]
    for p in pcts:
        assert rows[p]["n_total"] == n_total
        assert math.isclose(
            rows[p]["keep_rate"], round(rows[p]["n_kept"] / n_total, 6)
        )


def test_recall_eval_matches_pure_python(spark, sf_dir):
    """retrieval_recall_eval equals a from-scratch Python recall@3:
    per (arm, query), found strict-relevant in the top-3 over the
    achievable set min(3, |relevant|), integer micros; the hybrid arm
    is never strictly below both constituents."""
    from ffiec_pq_spark.catalog import queries
    from ffiec_pq_spark.queries.round12 import _bm25_topk_frame
    from ffiec_pq_spark.queries.round13c import _FUSE_TOPK

    docs = {
        r["doc_id"]: (r["lang"], r["n_chars"] // _NDCG_BUCKET)
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    q_ids = [d for d in docs if d % 10 == 0]
    n_sl = {}
    for d, key in docs.items():
        if d % 10 != 0:
            n_sl[key] = n_sl.get(key, 0) + 1
    arms = {
        "lex": [
            (r["q_id"], r["doc_id"])
            for r in _bm25_topk_frame(spark, sf_dir).collect()
        ],
        "dense": [
            (r["q_id"], r["doc_id"])
            for r in _dense_topk_frame(spark, sf_dir).collect()
        ],
        "hybrid": [
            (r["q_id"], r["doc_id"])
            for r in _rrf_hybrid_frame(spark, sf_dir).collect()
        ],
    }
    expected = []
    for arm, lst in arms.items():
        found = {}
        for q, d in lst:
            if d % 10 != 0 and docs[d] == docs[q]:
                found[q] = found.get(q, 0) + 1
        n_eval = sum(1 for q in q_ids if n_sl.get(docs[q], 0) > 0)
        s = sum(
            found.get(q, 0) * 1000000
            // min(_FUSE_TOPK, n_sl[docs[q]])
            for q in q_ids
            if n_sl.get(docs[q], 0) > 0
        )
        expected.append((arm, len(q_ids), n_eval, s))
    got = _rows(queries()["retrieval_recall_eval"](spark, sf_dir))
    assert got == sorted(expected)
    by = {r[0]: r[3] for r in got}
    assert by["hybrid"] >= min(by["lex"], by["dense"])


def test_gate_stack_yield_consistency(spark, sf_dir):
    """gate_stack_yield reconciles with the agreement matrix and with
    set algebra: single gates keep exactly the shared budget,
    pairwise intersections equal the matrix's n_both_kept, the union
    obeys inclusion-exclusion bounds, and all3 <= every pairwise."""
    from ffiec_pq_spark.catalog import queries

    rows = {
        r["combo"]: r
        for r in queries()["gate_stack_yield"](spark, sf_dir).collect()
    }
    agree = {
        r["pair"]: r
        for r in queries()["gate_agreement_matrix"](spark, sf_dir).collect()
    }
    n = rows["heuristic"]["n"]
    kb = agree["heuristic~probe"]["n_kept"]
    for g in ("heuristic", "probe", "kn"):
        assert rows[g]["n"] == n
        assert rows[g]["n_kept"] == kb
    assert (
        rows["heuristic&probe"]["n_kept"]
        == agree["heuristic~probe"]["n_both_kept"]
    )
    assert (
        rows["heuristic&kn"]["n_kept"]
        == agree["heuristic~kn"]["n_both_kept"]
    )
    assert rows["probe&kn"]["n_kept"] == agree["probe~kn"]["n_both_kept"]
    inter = max(
        rows["heuristic&probe"]["n_kept"],
        rows["heuristic&kn"]["n_kept"],
        rows["probe&kn"]["n_kept"],
    )
    assert rows["all3"]["n_kept"] <= min(
        rows["heuristic&probe"]["n_kept"],
        rows["heuristic&kn"]["n_kept"],
        rows["probe&kn"]["n_kept"],
    )
    assert rows["any"]["n_kept"] >= kb and rows["any"]["n_kept"] <= 3 * kb
    assert inter <= kb
    # token yields are consistent with keeps (kept docs carry tokens)
    for c, r in rows.items():
        if r["n_kept"] > 0:
            assert r["tokens_kept"] > 0, c


def _dense_oracle_rows(sf_dir):
    """DuckDB replay of the dense CTE chain (the second engine for the
    dense arm alone — the registered oracles only exercise it inside
    the full fusion SQL)."""
    import duckdb

    from ffiec_pq_spark.queries.round13c import _dense_ctes

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    rows = con.execute(
        f"WITH {_dense_ctes()} SELECT q_id, doc_id, d_rank FROM densek"
    ).fetchall()
    con.close()
    return sorted(tuple(r) for r in rows)


def test_dense_arm_drops_empty_and_zero_vectors(spark, tmp_path):
    """The vector contract (NULL / empty / zero-norm embeddings are
    excluded on BOTH engines): a corpus with one of each must yield
    the identical dense top-k from the Spark frame and the DuckDB CTE
    chain, with none of the degenerate ids present — DuckDB's unnest
    silently drops empty arrays, so an unguarded Spark fold would keep
    them as phantom NULL-cosine rows ranked into the top-k."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dim = 64

    def vec(seed):
        return [((seed * (i + 3)) % 17 - 8) / 8.0 for i in range(dim)]

    rows = [
        # queries (vec_id % 10 == 0): one real, one EMPTY, one NULL
        (10, vec(7), 0),
        (20, [], 0),
        (30, None, 0),
        # corpus: three real, one empty, one zero-norm
        (1, vec(2), 1),
        (2, vec(3), 1),
        (3, vec(5), 1),
        (4, [], 1),
        (5, [0.0] * dim, 1),
    ]
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    d = tmp_path / "dense_contract"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))

    got = _rows(_dense_topk_frame(spark, str(d)))
    want = _dense_oracle_rows(str(d))
    assert got == want
    ids_in_lists = {r[0] for r in got} | {r[1] for r in got}
    assert not ids_in_lists & {20, 30, 4, 5}, (
        "degenerate vectors leaked into the dense top-k"
    )
    # the real query found real candidates
    assert {r[0] for r in got} == {10}


def test_dense_cells_env_scales_geometry(spark, sf_dir, monkeypatch):
    """FFIEC_PQ_DENSE_CELLS re-parameterizes BOTH engines at call time
    (the scale harness runs the replicated pass at ~sqrt(N) cells):
    at 8 cells the Spark frame still strict-matches the DuckDB CTE
    chain and keeps the top-k contract (ranks 1..k per query)."""
    monkeypatch.setenv("FFIEC_PQ_DENSE_CELLS", "8")
    got = _rows(_dense_topk_frame(spark, sf_dir))
    want = _dense_oracle_rows(sf_dir)
    assert got == want and got
    by_q = {}
    for q, _, rk in got:
        by_q.setdefault(q, []).append(rk)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
