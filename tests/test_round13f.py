"""Round-13 seventh wave contracts: the scorecard telemetry fold is
order-invariant with bounded versioned state and a correct replay
guard, and the unlearn path equals a from-scratch recompute over the
survivors."""

import os
import re

import pyspark.sql.functions as F

from ffiec_pq_spark.queries.round13f import (
    _SC_FORGET_MOD,
    _SC_FORGET_SLOT,
    _sc_insert_fold,
    _sc_serve,
    _sc_stats,
    _sc_stream_build,
)
from ffiec_pq_spark.session import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sc_stream_fold_order_invariant_and_bounded(spark, sf_dir):
    """The statistics fold is key-commutative: ANY arrival order
    serves the identical scorecard, equal to a one-shot statistics
    pass; and the versioned state stays constant-bounded (<= 2 stats
    version dirs) at a trigger count past the retention window."""
    import shutil

    from ffiec_pq_spark.queries.round13f import stream_scorecard_fold

    docs = load_table(spark, sf_dir, "documents")
    batch = _rows(_sc_serve(_sc_stats(docs)))
    assert _rows(stream_scorecard_fold(spark, sf_dir)) == batch
    assert (
        _rows(
            stream_scorecard_fold(spark, sf_dir, chunk_order=[3, 1, 0, 2])
        )
        == batch
    )
    st = _sc_stream_build(spark, docs, n_chunks=10)
    try:
        vdirs = [
            d
            for d in os.listdir(st["workdir"])
            if re.match(r"stats_v\d+$", d)
        ]
        assert len(vdirs) <= 2, vdirs
        assert _rows(_sc_serve(spark.read.parquet(st["stats"]))) == batch
    finally:
        shutil.rmtree(st["workdir"], ignore_errors=True)


def test_sc_fold_replay_guard(spark, sf_dir, tmp_path):
    """At-least-once redelivery of a COMPLETED epoch is a no-op; a
    genuinely new epoch folds exactly once (statistics double)."""
    docs = load_table(spark, sf_dir, "documents").limit(40).cache()
    state = {"stats": None, "version": 0, "epoch": -1}
    fold = _sc_insert_fold(spark, state, str(tmp_path))
    fold(docs, 0)
    once = _rows(spark.read.parquet(state["stats"]))
    fold(docs, 0)  # duplicate delivery of the finished epoch
    assert _rows(spark.read.parquet(state["stats"])) == once
    fold(docs, 1)  # a genuinely new epoch DOES fold
    twice = {r[0]: r[1:] for r in _rows(spark.read.parquet(state["stats"]))}
    assert twice == {
        r[0]: (2 * r[1], 2 * r[2], 2 * r[3]) for r in once
    }
    docs.unpersist()


def test_sc_fold_crash_window_reruns_epoch(spark, sf_dir, tmp_path,
                                           monkeypatch):
    """A crash INSIDE the versioned write (before the pointer flip)
    leaves the previous state intact and the epoch unrecorded, so the
    redelivered epoch re-runs and the final state is correct — the
    write-all-then-flip contract shared with the BM25/KN folds."""
    import ffiec_pq_spark.streaming.state as stmod

    docs = load_table(spark, sf_dir, "documents").limit(40).cache()
    state = {"stats": None, "version": 0, "epoch": -1}

    real_emit = stmod.emit_versioned
    boom = {"armed": False}

    def crashing_emit(st, wd, rels):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("simulated mid-fold crash")
        return real_emit(st, wd, rels)

    # patch BEFORE the factory binds emit_versioned into the closure
    monkeypatch.setattr(stmod, "emit_versioned", crashing_emit)
    fold = _sc_insert_fold(spark, state, str(tmp_path))
    fold(docs, 0)
    good = _rows(spark.read.parquet(state["stats"]))

    boom["armed"] = True
    try:
        fold(docs, 1)
    except RuntimeError:
        pass
    # pointers untouched, epoch unrecorded -> the guard lets epoch 1
    # re-run on redelivery
    assert _rows(spark.read.parquet(state["stats"])) == good
    assert state["epoch"] == 0
    fold(docs, 1)  # redelivery after the crash
    twice = {r[0]: r[1:] for r in _rows(spark.read.parquet(state["stats"]))}
    assert twice == {r[0]: (2 * r[1], 2 * r[2], 2 * r[3]) for r in good}
    docs.unpersist()


def test_scorecard_unlearn_equals_survivor_recompute(spark, sf_dir):
    """Statistics subtraction reproduces the from-scratch scorecard of
    the survivors EXACTLY (integer state -> bit-for-bit), and the
    erased slice's mass is really gone."""
    from ffiec_pq_spark.catalog import queries

    docs = load_table(spark, sf_dir, "documents")
    erased = F.col("doc_id") % _SC_FORGET_MOD == _SC_FORGET_SLOT
    scratch = _rows(_sc_serve(_sc_stats(docs.filter(~erased))))
    got = _rows(queries()["scorecard_unlearn"](spark, sf_dir))
    assert got == scratch
    full = {r[0]: r for r in _rows(_sc_serve(_sc_stats(docs)))}
    corrected = {r[0]: r for r in got}
    n_erased = docs.filter(erased).count()
    assert n_erased > 0
    assert (
        sum(full[s][1] for s in full)
        - sum(corrected[s][1] for s in corrected)
        == n_erased
    )
