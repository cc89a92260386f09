"""Round-14 contracts: the fused-retrieval maintenance lifecycle.

- the insert fold is order-invariant (any arrival order serves the
  exact batch fusion) with bounded versioned state;
- the replay guard makes a redelivered epoch a no-op, and the
  per-epoch OVERWRITE discipline makes the data-sized appends
  idempotent across a mid-fold crash + redelivery (a strictly
  stronger contract than the round-12 append-mode folds);
- exact erasure equals a from-scratch survivor recompute, fused ranks
  and idf shifts included.
"""

import os
import re

import pyspark.sql.functions as F

from ffiec_pq_spark.queries.round14 import (
    _RRF_FORGET_MOD,
    _RRF_FORGET_SLOT,
    _fusion_corpus,
    _rrf_insert_fold,
    _rrf_serve,
    _rrf_stream_build,
)
from ffiec_pq_spark.session import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_rrf_fold_order_invariant_and_bounded(spark, sf_dir):
    """ANY arrival order serves the identical fused top-k, equal to
    the batch hybrid pass; versioned df/meta state stays
    constant-bounded past the retention window."""
    import shutil

    from ffiec_pq_spark.queries.round13c import _rrf_hybrid_frame
    from ffiec_pq_spark.queries.round14 import stream_rrf_fold

    batch = _rows(_rrf_hybrid_frame(spark, sf_dir))
    assert _rows(stream_rrf_fold(spark, sf_dir)) == batch
    assert (
        _rows(stream_rrf_fold(spark, sf_dir, chunk_order=[3, 1, 0, 2]))
        == batch
    )
    st = _rrf_stream_build(spark, _fusion_corpus(spark, sf_dir), n_chunks=10)
    try:
        for name in ("df", "meta"):
            vdirs = [
                d
                for d in os.listdir(st["workdir"])
                if re.match(name + r"_v\d+$", d)
            ]
            assert len(vdirs) <= 2, (name, vdirs)
        assert _rows(_rrf_serve(spark, sf_dir, st)) == batch
    finally:
        shutil.rmtree(st["workdir"], ignore_errors=True)


def test_rrf_fold_replay_guard_and_crash_idempotence(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Redelivery of a COMPLETED epoch is a no-op; a crash INSIDE the
    versioned write (appends already on disk) leaves pointers intact
    and the epoch unrecorded, and the redelivered epoch OVERWRITES its
    own append directories — postings, lengths, and cell rows must NOT
    double (the per-epoch idempotent-append contract)."""
    import ffiec_pq_spark.streaming.state as stmod
    from ffiec_pq_spark.queries.round13c import _n_cells

    corpus = _fusion_corpus(spark, sf_dir).limit(40).cache()
    b0 = corpus.filter(F.col("id") % 2 == 0).cache()
    b1 = corpus.filter(F.col("id") % 2 == 1).cache()

    real_emit = stmod.emit_versioned
    boom = {"armed": False}

    def crashing_emit(st, wd, rels):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("simulated mid-fold crash")
        return real_emit(st, wd, rels)

    monkeypatch.setattr(stmod, "emit_versioned", crashing_emit)
    wd = str(tmp_path)
    tf_dir = os.path.join(wd, "tf")
    dl_dir = os.path.join(wd, "dl")
    cells_dir = os.path.join(wd, "cells")
    state = {
        "df": None, "meta": None, "version": 0, "epoch": -1,
        "nc": _n_cells(),
    }
    fold = _rrf_insert_fold(spark, state, wd, tf_dir, dl_dir, cells_dir)

    fold(b0, 0)
    df_once = _rows(spark.read.parquet(state["df"]))
    tf_once = _rows(spark.read.parquet(tf_dir).select("doc_id", "term", "tf"))
    fold(b0, 0)  # duplicate delivery of the finished epoch: no-op
    assert _rows(spark.read.parquet(state["df"])) == df_once
    assert (
        _rows(spark.read.parquet(tf_dir).select("doc_id", "term", "tf"))
        == tf_once
    )

    # crash inside epoch 1's versioned write: the appends for epoch 1
    # are already on disk, the pointers/guard are not
    boom["armed"] = True
    try:
        fold(b1, 1)
    except RuntimeError:
        pass
    assert _rows(spark.read.parquet(state["df"])) == df_once
    assert state["epoch"] == 0
    fold(b1, 1)  # redelivery after the crash
    # postings did NOT double: per-doc tf equals a one-shot build
    from ffiec_pq_spark.operators.text import tokens

    expect_tf = _rows(
        corpus.filter(F.col("text").isNotNull())
        .select(F.col("id").alias("doc_id"),
                F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    assert (
        _rows(spark.read.parquet(tf_dir).select("doc_id", "term", "tf"))
        == expect_tf
    )
    # cell rows did not double either
    n_vec = corpus.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
    ).count()
    assert spark.read.parquet(cells_dir).count() == n_vec
    # df state equals the one-shot document frequencies
    expect_df = _rows(
        corpus.filter(F.col("text").isNotNull())
        .select(F.col("id").alias("doc_id"),
                F.explode(F.array_distinct(tokens("text"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    got_df = _rows(
        spark.read.parquet(state["df"]).select(
            "term", F.col("df").cast("long").alias("df")
        )
    )
    assert got_df == expect_df
    for c in (corpus, b0, b1):
        c.unpersist()


def test_retrieval_unlearn_equals_survivor_recompute(spark, sf_dir):
    """The erasure-folded serve equals a from-scratch fused recompute
    over the survivors EXACTLY (idf shifts and rank reshuffles
    included), no erased id appears in any fused list, and the erasure
    visibly changed the full-corpus ranking."""
    from ffiec_pq_spark.catalog import queries
    from ffiec_pq_spark.queries.round12 import _bm25_rank_postings
    from ffiec_pq_spark.queries.round13c import (
        _corpus_cells,
        _dense_rank_cells,
        _n_cells,
        _query_cells,
        _rrf_fuse,
        _rrf_hybrid_frame,
        _valid_vectors,
    )
    from ffiec_pq_spark.operators.text import tokens

    erased = lambda c: c % _RRF_FORGET_MOD == _RRF_FORGET_SLOT  # noqa: E731
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter((F.col("doc_id") % 10 != 0) & ~erased(F.col("doc_id")))
    tf = (
        corpus.select("doc_id", F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = corpus.join(dl, "doc_id", "left").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.coalesce(F.sum("dl"), F.lit(0)).cast("double")
            / F.nullif(F.count(F.lit(1)), F.lit(0))
        ).alias("avdl"),
    )
    lex = _bm25_rank_postings(
        tf, dl, df_t, stats, d.filter(F.col("doc_id") % 10 == 0)
    )
    emb = _valid_vectors(load_table(spark, sf_dir, "embeddings"))
    nc = _n_cells()
    dense = _dense_rank_cells(
        _query_cells(emb.filter(F.col("vec_id") % 10 == 0), nc),
        _corpus_cells(
            emb.filter(
                (F.col("vec_id") % 10 != 0) & ~erased(F.col("vec_id"))
            ),
            nc,
        ),
    )
    scratch = _rows(_rrf_fuse(lex, dense))
    got = _rows(queries()["retrieval_unlearn"](spark, sf_dir))
    assert got == scratch
    assert not any(erased(r[2]) for r in got), "erased doc served"
    full = _rows(_rrf_hybrid_frame(spark, sf_dir))
    assert got != full, "erasure did not change the fused ranking"
    tf.unpersist()


def test_gate_ensemble_trained_and_monotone(spark, sf_dir):
    """The ensemble combiner carries real signal (non-zero trained
    weights; its driver-side integer GD replays exactly from the
    collected statistics), the ladder is monotone in the threshold,
    and the population is EXACTLY the shared gated population."""
    from ffiec_pq_spark.catalog import queries
    from ffiec_pq_spark.operators.linear_probe import probe_fit_int
    from ffiec_pq_spark.queries.round13c import _gated_frame
    from ffiec_pq_spark.queries.round14 import (
        _ENS_DIM,
        _ens_population,
        ensemble_weights,
    )

    w = ensemble_weights(spark, sf_dir)
    assert len(w) == _ENS_DIM and any(v != 0 for v in w)

    # pure-python replay: rebuild (A, B, n) from the collected
    # population rows and assert probe_fit_int reproduces the memoized
    # weights (the second oracle besides DuckDB's unrolled CTEs)
    rows = _ens_population(spark, sf_dir).collect()
    a = [[0] * _ENS_DIM for _ in range(_ENS_DIM)]
    b = [0] * _ENS_DIM
    for r in rows:
        xq, y = r["_xqa"], r["y"]
        for i in range(_ENS_DIM):
            b[i] += xq[i] * y
            for j in range(_ENS_DIM):
                a[i][j] += xq[i] * xq[j]
    assert probe_fit_int(a, b, len(rows)) == w

    lad = {
        r["thr_pct"]: r
        for r in queries()["gate_ensemble_calibration"](
            spark, sf_dir
        ).collect()
    }
    pcts = sorted(lad)
    n_pop = _gated_frame(spark, sf_dir).count()
    assert all(lad[p]["n_total"] == n_pop for p in pcts)
    for lo, hi in zip(pcts, pcts[1:]):
        assert lad[lo]["n_kept"] <= lad[hi]["n_kept"]
        assert lad[lo]["tokens_kept"] <= lad[hi]["tokens_kept"]
        assert lad[lo]["pos_kept"] <= lad[hi]["pos_kept"]


def test_resident_state_report_audits_and_clear_frees(spark, sf_dir):
    """The residency AUDIT: after building maintained state the report
    shows live entries and nonzero on-disk bytes for the dir-backed
    caches; clear_all_resident_state() then frees the disk bytes and
    empties every registered container (exactly — not by convention).
    The Spark storage section is present as the monitoring input
    (checkpointed-relation memory is released asynchronously by the
    context cleaner, so it is reported, not asserted zero)."""
    from ffiec_pq_spark.catalog import queries
    from ffiec_pq_spark.resident import (
        clear_all_resident_state,
        resident_state_report,
    )

    # build dir-backed and memo-backed state
    queries()["stream_rrf_fold"](spark, sf_dir)
    queries()["doc_kn_trigram"](spark, sf_dir)
    rep = resident_state_report(spark)
    assert rep["rrf_stream_state"]["entries"] >= 1
    assert rep["rrf_stream_state"]["disk_bytes"] > 0
    assert rep["kn3_scores"]["entries"] >= 1
    st = rep["_spark_storage"]
    assert st["cached_rdds"] >= 1 and st["mem_bytes"] >= 0

    cleared = clear_all_resident_state()
    assert "rrf_stream_state" in cleared and "kn3_scores" in cleared
    rep2 = resident_state_report()
    for name, row in rep2.items():
        if name.startswith("_"):
            continue
        assert row["entries"] == 0, (name, row)
        assert row["disk_bytes"] == 0, (name, row)


def test_cells_recall_curve_anchor_and_bounds(spark, sf_dir):
    """The n_cells=1 arm IS the exact ground truth (recall_micro =
    1000000 by construction — the anchor that certifies the curve's
    plumbing), every arm's overlap is bounded by the achievable 3 per
    query, and nprobe=2 over 2 cells probes everything (recall 1.0 at
    n_cells=2 as well)."""
    from ffiec_pq_spark.catalog import queries

    rows = {
        r["n_cells"]: r
        for r in queries()["retrieval_cells_recall_curve"](
            spark, sf_dir
        ).collect()
    }
    assert rows[1]["recall_micro"] == 1_000_000
    assert rows[2]["recall_micro"] == 1_000_000
    for n, r in rows.items():
        assert 0 <= r["n_overlap"] <= 3 * r["n_queries"], (n, r)
        assert r["recall_micro"] <= 1_000_000
