"""Greedy k-center coreset tests (operators/coreset.py): hand-checked
farthest-point order, tie-breaks, early stop, and the per-round plan
shape (the certified query's rows are driver-built, so the scale
contract is asserted on the internal round relations here)."""

import pytest
from pyspark.sql import functions as F

from ffiec_pq_spark.operators.coreset import (
    _nano_dist,
    kcenter_coreset_df,
    kcenter_select,
)

# Points on a line (second dim constant): 0, 1, 10, 11, 5.
# Greedy from the lowest id (id 0 at x=0): pick 11 (id 3), then 5
# (id 4, dmin 25), then the {1, 10} tie at dmin 1 -> lowest id wins.
_LINE = [
    (0, [0.0, 0.0]),
    (1, [1.0, 0.0]),
    (2, [10.0, 0.0]),
    (3, [11.0, 0.0]),
    (4, [5.0, 0.0]),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kcenter_order_and_tiebreak(spark):
    picks = kcenter_select(_df(spark, _LINE), k=4)
    assert [(o, i) for o, i, _ in picks] == [(1, 0), (2, 3), (3, 4), (4, 1)]
    assert picks[1][2] == 121 * 10**9
    assert picks[2][2] == 25 * 10**9
    assert picks[3][2] == 1 * 10**9  # the tie value; id 1 < id 2


def test_kcenter_early_stop_on_duplicates(spark):
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [3.0, 4.0])]
    picks = kcenter_select(_df(spark, rows), k=3)
    # after (0, then 2) every remaining point has dmin 0 -> stop
    assert [(o, i) for o, i, _ in picks] == [(1, 0), (2, 2)]


def test_kcenter_empty_raises(spark):
    with pytest.raises(ValueError, match="empty"):
        kcenter_select(_df(spark, _LINE).where(F.lit(False)), k=2)


def test_kcenter_df_shape(spark):
    out = kcenter_coreset_df(spark, _df(spark, _LINE), k=3).collect()
    assert [r["pick_order"] for r in out] == [1, 2, 3]
    assert out[0]["dmin_sel"] == 0.0
    assert out[1]["dmin_sel"] == 121.0


def test_kcenter_round_plan_is_projection_plus_top1(spark):
    """Per-round scale contract: the dmin update is a literal-center
    projection (no join, no exchange); the selection is a
    TakeOrderedAndProject(1)."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = _df(spark, _LINE)
    state = df.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
        _nano_dist(F.col("embedding").cast("array<double>"), [0.0, 0.0]).alias(
            "dmin"
        ),
    )
    updated = state.select(
        "id", "v", F.least(F.col("dmin"), _nano_dist(F.col("v"), [1.0, 0.0])).alias("dmin")
    )
    plan = physical_plan(updated)
    assert "Join" not in plan
    assert count_exchanges(updated) == 0
    sel = updated.orderBy(F.col("dmin").desc(), F.col("id").asc()).limit(1)
    assert "TakeOrderedAndProject" in physical_plan(sel)


def test_kcenter_checkpoint_bounds_plan_depth(spark):
    """Round-10 lineage pin: with checkpoint_every=4 over a 40-round
    run, the deepest analyzed state plan must stay BOUNDED (a pinned
    state is a flat LogicalRDD plus at most checkpoint_every stacked
    projections) instead of deepening linearly in k — and the
    checkpointed run must pick the identical coreset."""
    rows = [(i, [float(3 * i % 41), float(7 * i % 29)]) for i in range(60)]
    df = _df(spark, rows)

    s_ck: dict = {}
    picks_ck = kcenter_select(df, k=40, checkpoint_every=4, stats=s_ck)
    s_no: dict = {}
    picks_no = kcenter_select(df, k=40, checkpoint_every=0, stats=s_no)

    assert picks_ck == picks_no
    assert s_ck["checkpoints"] >= 9
    assert s_no["checkpoints"] == 0
    # unpinned: ~1 projection node per round -> depth tracks k.
    # pinned: depth resets at each pin; bound = flat source + ~4 selects.
    assert s_no["max_plan_nodes"] > 2 * s_ck["max_plan_nodes"], (
        s_ck,
        s_no,
    )
    assert s_ck["max_plan_nodes"] <= 12, s_ck
