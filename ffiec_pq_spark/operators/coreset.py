"""Greedy k-center coreset selection (Gonzalez 1985 farthest-point
traversal) over an embedding column — the classic diversity-maximizing
data-selection primitive: pick the k points that 2-approximate the
optimal k-center cover, so a tiny subset spans the corpus's embedding
space (active-learning seed sets, eval-panel selection, dedup-aware
"one doc per region" curation).

Reference parity: no vector surface in the reference (iangow/ffiec.pq);
this extends the engine's data-selection family (sampling, SemDeDup,
DSIR) with the geometric coverage member.

Scalable shape: the loop state is ONE narrow relation (id, v, dmin) —
dmin is each point's distance to the nearest already-picked center.
Per round: one literal-vs-column projection updates dmin (least of the
old value and the distance to the newest center — no join, the center
is a broadcast literal) and one TakeOrderedAndProject(1) finds the
farthest point.  The base state is persisted and the select chain is
localCheckpoint-pinned every ``checkpoint_every`` rounds, so plan
depth and per-round input cost stay BOUNDED in k; nothing ever
shuffles except the per-round top-1 reduce, and only one row reaches
the driver per round.

Cross-engine determinism is STRONGER than the Lloyd trainers': centers
are actual data points (no averaging), so coordinates are exact parquet
values on both engines; distances are round(·, 9) integer nano units
and the argmax tie-breaks on the lowest id — fully bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffiec_pq_spark.functions.lits import double_array


def _nano_dist(vec, cent: list[float]):
    """round(Σ (x-c)^2, 9) in integer nano units — the portable
    distance (same fold order and rounding as operators/kmeans)."""
    c_arr = double_array(cent)
    d = F.round(
        F.aggregate(
            F.zip_with(vec, c_arr, lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, e: acc + e,
        ),
        9,
    )
    return F.round(d * F.lit(1e9), 0).cast("long")


def kcenter_select(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    checkpoint_every: int = 32,
    stats: dict | None = None,
) -> list[tuple[int, object, int]]:
    """Greedy k-center: returns [(pick_order, id, dmin_nano)] where
    dmin_nano is the point's distance (integer nano units) to the
    previously-picked set at selection time (0 for the seed, which is
    the lowest-id point).  One top-1 job per round; only the picked
    row's id + vector reach the driver.

    Lineage control (round-10): the base (id, v, dmin) state is
    PERSISTED (each round re-reads it — uncached, every round would
    re-scan and re-cast the parquet source), and every
    ``checkpoint_every`` rounds the state is pinned with an eager
    ``localCheckpoint`` that truncates the select-on-select chain —
    without it the plan deepens linearly in k (one ``least(...)``
    projection per round) and both Catalyst analysis time and the
    re-read of the base scan grow with the round number.  Storage for
    the superseded pin is released as soon as the next pin
    materializes (the CC family's pattern).  Measured A/B
    (scripts/kcenter_plan_bench.py, k=64, min-of-3): pinned
    21.66s/22.19s vs unpinned 32.99s/37.27s at 1x/8x sf0.1 — a
    1.5-1.7x win that WIDENS with data (the unpinned chain re-reads
    the scan through t stacked projections in round t).

    Pass ``stats={}`` to read back ``stats["checkpoints"]`` and
    ``stats["max_plan_nodes"]`` (the deepest analyzed state plan seen
    before any round's top-1 — the bounded-depth test pins this;
    tree-string accounting only runs when ``stats`` is supplied)."""

    def _free_ckpt(frame):
        # same best-effort release as connected_components: the blocks
        # belong to the checkpointed LogicalRDD
        try:
            frame._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass

    def _plan_nodes(frame) -> int:
        return frame._jdf.queryExecution().analyzed().treeString().count(
            "\n"
        )

    seed = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy("id")
        .limit(1)
        .collect()
    )
    if not seed:
        raise ValueError("kcenter_select: cannot seed from an empty input")
    picks = [(1, seed[0]["id"], 0)]
    cur_v = list(seed[0]["v"])
    state = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        _nano_dist(F.col(vec_col).cast("array<double>"), cur_v).alias("dmin"),
    ).persist()
    base = state
    prev_ckpt = None
    n_ckpt = 0
    max_nodes = 0
    try:
        for t in range(2, k + 1):
            if stats is not None:
                max_nodes = max(max_nodes, _plan_nodes(state))
            far = (
                state.orderBy(F.col("dmin").desc(), F.col("id").asc())
                .limit(1)
                .collect()
            )
            if not far or far[0]["dmin"] == 0:
                break  # fewer than k distinct points — cover is complete
            picks.append((t, far[0]["id"], far[0]["dmin"]))
            cur_v = list(far[0]["v"])
            state = state.select(
                "id",
                "v",
                F.least(
                    F.col("dmin"), _nano_dist(F.col("v"), cur_v)
                ).alias("dmin"),
            )
            if checkpoint_every and (t - 1) % checkpoint_every == 0:
                state = state.localCheckpoint(eager=True)
                n_ckpt += 1
                # release the superseded pin only AFTER the new one is
                # materialized (lineage is truncated — nothing reads
                # the old blocks again); the base cache stays for the
                # seed round chain until the first pin replaces it
                if prev_ckpt is None:
                    base.unpersist()
                else:
                    _free_ckpt(prev_ckpt)
                prev_ckpt = state
    finally:
        if prev_ckpt is None:
            base.unpersist()
        else:
            _free_ckpt(prev_ckpt)
        if stats is not None:
            stats["checkpoints"] = n_ckpt
            stats["max_plan_nodes"] = max_nodes
    return picks


def kcenter_coreset_df(
    spark,
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(pick_order, id, dmin_sel): the greedy k-center picks with their
    selection distance, rounded to 6 dp from the exact nano units."""
    picks = kcenter_select(df, k, vec_col, id_col)
    out = spark.createDataFrame(
        [(o, i, n) for o, i, n in picks],
        ["pick_order", "id", "nano"],
    )
    return out.select(
        "pick_order",
        "id",
        F.round(F.col("nano").cast("double") / F.lit(1e9), 6).alias("dmin_sel"),
    )
