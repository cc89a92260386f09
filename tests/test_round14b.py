"""Round-14 second wave contracts: the ensemble lifecycle.

- exact unlearning: statistics subtraction reproduces the
  survivors-only retrain bit-for-bit (integer state), and the served
  ladder ranks only survivors;
- the heldout eval's contingency is internally consistent (split
  sizes, per-split keep budgets).
"""

import pyspark.sql.functions as F

from ffiec_pq_spark.queries.round14 import _ens_population, _ens_stats
from ffiec_pq_spark.queries.round14b import (
    _ENS_FORGET_MOD,
    _ENS_FORGET_SLOT,
)


def test_ensemble_unlearn_equals_survivor_retrain(spark, sf_dir):
    """A' = A - dA etc. re-fit bit-equals probe_fit_int on statistics
    computed fresh from the survivors (the certified-deletion claim,
    checked without the oracle in the loop)."""
    from ffiec_pq_spark.operators.linear_probe import probe_fit_int
    from ffiec_pq_spark.queries.round14 import _ENS_DIM

    base = _ens_population(spark, sf_dir)
    erased = F.col("doc_id") % _ENS_FORGET_MOD == _ENS_FORGET_SLOT
    a, b, n = _ens_stats(base)
    da, db, dn = _ens_stats(base.filter(erased))
    assert dn > 0, "forget slot empty at this sf"
    sub = probe_fit_int(
        [[a[i][j] - da[i][j] for j in range(_ENS_DIM)]
         for i in range(_ENS_DIM)],
        [b[i] - db[i] for i in range(_ENS_DIM)],
        n - dn,
    )
    scratch = probe_fit_int(*_ens_stats(base.filter(~erased)))
    assert sub == scratch
    # the served ladder counts only survivors
    from ffiec_pq_spark.catalog import queries

    lad = queries()["gate_ensemble_unlearn"](spark, sf_dir).collect()
    n_surv = base.filter(~erased).count()
    assert all(r["n_total"] == n_surv for r in lad)


def test_ensemble_heldout_contingency_consistent(spark, sf_dir):
    """Split totals equal the population split sizes and each split's
    kept count equals its own top-10% budget."""
    from ffiec_pq_spark.catalog import queries

    base = _ens_population(spark, sf_dir)
    sizes = {
        ("train" if r["k"] else "heldout"): r["n"]
        for r in base.groupBy(
            (F.col("doc_id") % 5 != 0).alias("k")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = queries()["gate_ensemble_heldout_eval"](spark, sf_dir).collect()
    for split, n_split in sizes.items():
        tot = sum(r["n"] for r in rows if r["split"] == split)
        kept = sum(
            r["n"] for r in rows if r["split"] == split and r["kept"]
        )
        assert tot == n_split, (split, tot, n_split)
        assert kept == max(n_split // 10, 1), (split, kept, n_split)


def test_fusion_significance_deterministic_and_bounded(spark, sf_dir):
    """The bootstrap is hash-seeded: two invocations return the
    identical row; p is the add-one estimator in [1/(R+1), 1] micros;
    the replicate count is pinned."""
    from ffiec_pq_spark.catalog import queries
    from ffiec_pq_spark.queries.round14b import _SIG_REPS

    fn = queries()["retrieval_fusion_significance"]
    r1 = fn(spark, sf_dir).collect()[0]
    r2 = fn(spark, sf_dir).collect()[0]
    assert tuple(r1) == tuple(r2)
    assert r1["n_reps"] == _SIG_REPS
    lo = 1_000_000 // (_SIG_REPS + 1)
    assert lo <= r1["p_micro"] <= 1_000_000
    assert (
        r1["p_micro"]
        == (r1["n_reps_nonpos"] + 1) * 1_000_000 // (_SIG_REPS + 1)
    )


def _ladder_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ensemble_stream_fold_order_invariant_equals_batch(
    spark, sf_dir
):
    """Integer sufficient statistics are commutative sums: ANY arrival
    order must drain to statistics that refit to the batch trainer's
    exact weights, so the served ladder equals gate_ensemble_calibration
    row-for-row — and the versioned statistics state stays bounded
    (current + predecessor) past the retention window."""
    import os
    import re
    import shutil

    from ffiec_pq_spark.catalog import queries
    from ffiec_pq_spark.queries.round14b import (
        _ens_stream_build,
        stream_ensemble_stats_fold,
    )

    batch = _ladder_rows(
        queries()["gate_ensemble_calibration"](spark, sf_dir)
    )
    assert len(batch) > 0
    assert (
        _ladder_rows(stream_ensemble_stats_fold(spark, sf_dir)) == batch
    )
    assert (
        _ladder_rows(
            stream_ensemble_stats_fold(
                spark, sf_dir, chunk_order=[3, 1, 0, 2]
            )
        )
        == batch
    )
    # bounded versioned state: many more epochs than the retention
    # window must still leave <= 2 stats_v* dirs on disk
    st = _ens_stream_build(
        spark, _ens_population(spark, sf_dir), n_chunks=10
    )
    try:
        vdirs = [
            d
            for d in os.listdir(st["workdir"])
            if re.match(r"stats_v\d+$", d)
        ]
        assert len(vdirs) <= 2, vdirs
    finally:
        shutil.rmtree(st["workdir"], ignore_errors=True)


def test_ensemble_stream_fold_replay_guard_and_crash(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Redelivery of a completed epoch is a no-op (keyed adds would
    double-count); a crash inside the versioned write leaves the
    pointer on the previous statistics and the epoch unrecorded, so
    the redelivered epoch merges exactly once."""
    import ffiec_pq_spark.streaming.state as stmod
    from ffiec_pq_spark.queries.round14b import _ens_stats_fold

    pop = _ens_population(spark, sf_dir).limit(40).cache()
    b0 = pop.filter(F.col("doc_id") % 2 == 0).cache()
    b1 = pop.filter(F.col("doc_id") % 2 == 1).cache()
    assert b0.count() > 0 and b1.count() > 0

    real_emit = stmod.emit_versioned
    boom = {"armed": False}

    def crashing_emit(st, wd, rels):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("simulated mid-fold crash")
        return real_emit(st, wd, rels)

    monkeypatch.setattr(stmod, "emit_versioned", crashing_emit)
    state = {"stats": None, "version": 0, "epoch": -1}
    fold = _ens_stats_fold(spark, state, str(tmp_path))

    fold(b0, 0)
    once = _ladder_rows(spark.read.parquet(state["stats"]))
    fold(b0, 0)  # duplicate delivery: no-op
    assert _ladder_rows(spark.read.parquet(state["stats"])) == once

    boom["armed"] = True
    try:
        fold(b1, 1)
    except RuntimeError:
        pass
    assert _ladder_rows(spark.read.parquet(state["stats"])) == once
    assert state["epoch"] == 0
    fold(b1, 1)  # redelivery merges exactly once
    drained = _ladder_rows(spark.read.parquet(state["stats"]))
    from ffiec_pq_spark.queries.round14 import _ens_stats_rows

    expect = _ladder_rows(_ens_stats_rows(pop))
    assert drained == expect
