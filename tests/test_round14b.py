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
