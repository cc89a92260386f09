"""Round-13 LM-family contracts: Moore-Lewis selection against an
independent pure-Python reimplementation, streaming count-fold order
invariance + bounded versioned state + replay guard, and exact KN
unlearning against from-scratch retraining."""

import os
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ffiec_pq_spark.queries.round13b import (
    _KN_FORGET_MOD,
    _KN_FORGET_SLOT,
    _ML_KEEP_PCT,
    _ML_LANG,
    _bigrams,
    _kn_insert_fold,
    _kn_scores,
    _kn_stream_build,
)
from ffiec_pq_spark.session import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _py_bigrams(text):
    toks = re.split(r"\s+", text.strip())
    return list(zip(toks, toks[1:]))


def _py_kn_model(texts):
    """Naive dict-based KN bigram tables (counts, context totals,
    continuation counts) — the independent second oracle."""
    c2 = Counter()
    for t in texts:
        c2.update(_py_bigrams(t))
    n1, nfw, nbw = Counter(), Counter(), Counter()
    for (w1, w2), c in c2.items():
        n1[w1] += c
        nfw[w1] += 1
        nbw[w2] += 1
    return c2, n1, nfw, nbw, len(c2)


def _py_p_backoff(bg, m):
    """The CASE ladder of ``_p_backoff`` in pure Python, with the
    identical float op sequence."""
    c2, n1, nfw, nbw, nall = m
    w1, w2 = bg
    if bg in c2:
        return (c2[bg] - 0.75) / n1[w1] + (0.75 * nfw[w1] / n1[w1]) * (
            nbw[w2] / nall
        )
    if w1 in n1 and w2 in nbw:
        return (0.75 * nfw[w1] / n1[w1]) * (nbw[w2] / nall)
    if w2 in nbw:
        return nbw[w2] / nall
    return 1.0 / float(2 * nall)


def test_moore_lewis_matches_pure_python(spark, sf_dir):
    """doc_moore_lewis_select reproduces an independent dict-based
    reimplementation of both models and the backoff ladder on every
    document (scores at the rounded 6 dp, selection at the exact
    rank gate) — a second oracle besides DuckDB, immune to shared-SQL
    blind spots."""
    import math

    from ffiec_pq_spark.queries.round13b import doc_moore_lewis_select

    docs = {
        r["doc_id"]: (r["text"], r["lang"])
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    gen = _py_kn_model([t for t, _ in docs.values()])
    ind = _py_kn_model(
        [t for t, lang in docs.values() if lang == _ML_LANG]
    )
    expect = {}
    for doc_id, (text, _) in docs.items():
        bgs = _py_bigrams(text)
        if not bgs:
            continue
        lp_in = round(
            sum(math.log(_py_p_backoff(b, ind)) for b in bgs) / len(bgs), 6
        )
        lp_gen = round(
            sum(math.log(_py_p_backoff(b, gen)) for b in bgs) / len(bgs), 6
        )
        expect[doc_id] = (
            len(bgs), lp_in, lp_gen, round(lp_in - lp_gen, 6)
        )
    got = {
        r["doc_id"]: (
            r["n_bigrams"], r["lp_in"], r["lp_gen"], r["ml_score"],
            r["rank"], r["selected"],
        )
        for r in doc_moore_lewis_select(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for doc_id, exp in expect.items():
        assert got[doc_id][:4] == pytest.approx(exp, abs=1.5e-6), doc_id
    # the rank gate: selected iff rank <= max(n // KEEP_PCT, 1), and
    # ranks are the dense 1..n ordering of (ml_score desc, doc_id asc)
    n = len(expect)
    cut = max(n // _ML_KEEP_PCT, 1)
    order = sorted(got, key=lambda d: (-got[d][3], d))
    for pos, doc_id in enumerate(order, start=1):
        assert got[doc_id][4] == pos
        assert got[doc_id][5] == (pos <= cut)


def test_kn_stream_fold_order_invariant_and_bounded(spark, sf_dir):
    """The count fold is key-commutative: ANY arrival order serves the
    identical scores, equal to the batch doc_kneser_ney_bigram result;
    and the versioned state stays constant-bounded (<= 2 c2 version
    dirs) at a trigger count well past the retention window."""
    import shutil

    from ffiec_pq_spark.queries.round12b import doc_kneser_ney_bigram
    from ffiec_pq_spark.queries.round13b import (
        _kn_serve,
        stream_kn_counts_fold,
    )

    batch = _rows(doc_kneser_ney_bigram(spark, sf_dir))
    assert _rows(stream_kn_counts_fold(spark, sf_dir)) == batch
    assert (
        _rows(stream_kn_counts_fold(spark, sf_dir, chunk_order=[2, 0, 3, 1]))
        == batch
    )
    # bounded state: 10 triggers, at most `keep=2` c2_v dirs remain
    docs = load_table(spark, sf_dir, "documents")
    st = _kn_stream_build(spark, docs, n_chunks=10)
    try:
        vdirs = [
            d for d in os.listdir(st["workdir"]) if re.match(r"c2_v\d+$", d)
        ]
        assert len(vdirs) <= 2, vdirs
        assert _rows(_kn_serve(spark, docs, st)) == batch
    finally:
        shutil.rmtree(st["workdir"], ignore_errors=True)


def test_kn_fold_replay_guard(spark, sf_dir, tmp_path):
    """At-least-once redelivery of a COMPLETED epoch is a no-op; a
    fresh epoch folds exactly once (no double counting)."""
    docs = load_table(spark, sf_dir, "documents").limit(40).cache()
    state = {"c2": None, "version": 0, "epoch": -1}
    fold = _kn_insert_fold(spark, state, str(tmp_path))
    fold(docs, 0)
    once = _rows(spark.read.parquet(state["c2"]))
    fold(docs, 0)  # duplicate delivery of the finished epoch
    assert _rows(spark.read.parquet(state["c2"])) == once
    fold(docs, 1)  # a genuinely new epoch DOES fold
    twice = {
        (r[0], r[1]): r[2] for r in _rows(spark.read.parquet(state["c2"]))
    }
    assert twice == {(r[0], r[1]): 2 * r[2] for r in once}
    docs.unpersist()


def test_kn_unlearn_equals_retrain_from_scratch(spark, sf_dir):
    """Count subtraction reproduces from-scratch re-estimation on the
    survivors EXACTLY (integer counts -> bit-for-bit, the
    embedding_probe_unlearn contract)."""
    from ffiec_pq_spark.queries.round13b import doc_kn_unlearn

    docs = load_table(spark, sf_dir, "documents")
    erased = (
        F.col("doc_id") % _KN_FORGET_MOD == _KN_FORGET_SLOT
    )
    survivors = docs.filter(~erased)
    scratch_c2 = (
        _bigrams(survivors)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n2"))
    )
    scratch = _rows(_kn_scores(scratch_c2, _bigrams(survivors)))
    assert _rows(doc_kn_unlearn(spark, sf_dir)) == scratch
    # the erased slice is really gone from the output
    kept_ids = {r[0] for r in scratch}
    assert all(
        i % _KN_FORGET_MOD != _KN_FORGET_SLOT for i in kept_ids
    )
    assert len(kept_ids) > 0
