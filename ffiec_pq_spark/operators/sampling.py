"""Deterministic sampling for training-data curation.

``df.sample()`` draws from a per-partition RNG: the subset changes with
partitioning, retries, and engine version — useless for reproducible
train/eval splits or for auditing what went into a model.  Hash-gate
sampling keys the decision on a *content* hash of a stable key column:
the same row lands on the same side of the split on any engine, any
partitioning, any day (and the portable ``hash60`` makes the exact
subset verifiable against the SQL oracle).

All pure column expressions — narrow, shuffle-free, prunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffiec_pq_spark.functions.hashing import hash60, hash60_sql

_BUCKETS = 10_000


def _gate_buckets(rate: float) -> int:
    """Bucket cutoff for ``rate``: round-to-nearest, NOT truncation —
    int(0.3 * 10_000) is 2999 on binary floats, silently under-sampling
    every rate whose product lands just below an integer."""
    return int(round(rate * _BUCKETS))


def sample_gate(key_col: str, rate: float, seed: int = 0):
    """Boolean column: True for the deterministic ``rate`` fraction."""
    return (hash60(key_col, seed) % _BUCKETS) < _gate_buckets(rate)


def sample_gate_sql(key_expr: str, rate: float, seed: int = 0) -> str:
    return f"({hash60_sql(key_expr, seed)} % {_BUCKETS}) < {_gate_buckets(rate)}"


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, seed: int = 0
) -> DataFrame:
    """The stable ``rate`` fraction of rows, keyed on ``key_col``."""
    return df.filter(sample_gate(key_col, rate, seed))


def train_eval_split(
    df: DataFrame, key_col: str, eval_rate: float = 0.1, seed: int = 0
) -> DataFrame:
    """Adds ``split`` ('train' | 'eval'): disjoint, exhaustive, stable.

    Because membership is content-keyed, late-arriving rows of the same
    key always join the same split — no eval-set contamination across
    pipeline re-runs."""
    return df.withColumn(
        "split",
        F.when(sample_gate(key_col, eval_rate, seed), "eval").otherwise("train"),
    )


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, rates: dict[str, float],
    default_rate: float = 0.0, seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downsample the dominant
    class, keep all of the rare one)."""
    h = hash60(key_col, seed) % _BUCKETS
    expr = F.lit(_gate_buckets(default_rate))
    for value, rate in sorted(rates.items()):
        expr = F.when(
            F.col(strata_col) == value, F.lit(_gate_buckets(rate))
        ).otherwise(expr)
    return df.filter(h < expr)


def balanced_sample(
    df: DataFrame, key_col: str, strata_col: str, seed: int = 0
) -> DataFrame:
    """Class-balanced downsample: every stratum is hash-gate-sampled at
    ``min_stratum_count / stratum_count``, so the dominant classes fall
    to (approximately) the rarest one's size — the training-data
    rebalancing pass, fully deterministic and engine-portable.

    Two aggregations (stratum counts + global min), both tiny; the
    per-row gate is a broadcast join + narrow filter, so the data-sized
    path stays one scan with no shuffle.  The gate threshold uses pure
    INTEGER arithmetic (``min_count * BUCKETS div count``) so an SQL
    replay computes the identical bucket cutoff with no FP rounding
    hazard."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_cnt"))
    min_c = counts.agg(F.min("_cnt").alias("_min_cnt"))
    gates = counts.crossJoin(F.broadcast(min_c)).select(
        strata_col,
        # `div` = integer division: exact floor on both engines (a
        # double divide + cast would round-vs-truncate differently)
        F.expr(f"(_min_cnt * {_BUCKETS}) div _cnt").alias("_gate"),
    )
    h = hash60(key_col, seed) % _BUCKETS
    return (
        df.join(F.broadcast(gates), strata_col)
        .filter(h < F.col("_gate"))
        .drop("_gate")
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    token_col: str,
    weights: dict[str, int],
    budget_tokens: int,
    seed: int = 0,
) -> DataFrame:
    """Training-mixture sampling: downsample each source shard toward a
    target token budget split by integer ``weights`` (e.g.
    ``{"web": 6, "wiki": 3, "code": 1}`` with ``budget_tokens=1e9``
    targets 600M/300M/100M tokens).  A source already under its target
    is kept whole (gate caps at 100%) — classic under-represented-
    source protection; sources not in ``weights`` are dropped.

    The per-source gate is ``least(BUCKETS, target_tokens * BUCKETS div
    source_tokens)`` — pure integer arithmetic, so the SQL oracle
    computes the identical cutoff, and membership is a content hash of
    ``key_col``: the same document is in or out on any engine, any
    partitioning, any re-run (auditable training mixes).

    One tiny per-source aggregate broadcast back onto the scan; the
    data-sized path stays a single pass with no shuffle.
    """
    total_w = sum(weights.values())
    tok = F.col(token_col)
    totals = df.groupBy(source_col).agg(F.sum(tok).alias("_src_tok"))
    gate_expr = F.lit(None).cast("long")
    for src, w in sorted(weights.items()):
        t = (budget_tokens * w) // total_w
        gate_expr = F.when(
            F.col(source_col) == src,
            F.least(
                F.lit(_BUCKETS).cast("long"),
                # a source whose token total is 0 (or NULL) divides to
                # NULL; it is by definition under its target, so the
                # keep-whole contract applies — coalesce to keep-all
                F.coalesce(
                    F.expr(f"({t} * {_BUCKETS}) div _src_tok"),
                    F.lit(_BUCKETS).cast("long"),
                ),
            ),
        ).otherwise(gate_expr)
    gates = totals.select(source_col, gate_expr.alias("_gate"))
    h = hash60(key_col, seed) % _BUCKETS
    return (
        df.join(F.broadcast(gates), source_col)
        .filter(h < F.col("_gate"))
        .drop("_gate")
    )


def mixture_gate_sql(
    key_expr: str,
    source_col: str,
    src_tok_expr: str,
    weights: dict[str, int],
    budget_tokens: int,
    seed: int = 0,
) -> str:
    """DuckDB mirror of the per-row mixture gate (same integer
    arithmetic, same hash)."""
    total_w = sum(weights.values())
    cases = " ".join(
        f"WHEN {source_col} = '{s}' THEN least({_BUCKETS}, coalesce("
        f"({(budget_tokens * w) // total_w} * {_BUCKETS}) // {src_tok_expr}, "
        f"{_BUCKETS}))"
        for s, w in sorted(weights.items())
    )
    return (
        f"(({hash60_sql(key_expr, seed)} % {_BUCKETS}) < "
        f"(CASE {cases} END))"
    )


def weighted_priority_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weight-biased top-k: each row gets an integer
    priority ``hash60(key) div weight`` and the ``k`` smallest
    priorities win — a heavier row divides its (uniform) hash by a
    larger weight, so its expected priority shrinks proportionally,
    the integer-only analogue of exponential-key (A-ES) weighted
    reservoir sampling.  Pure integer arithmetic end to end, so the
    SQL oracle replays the identical subset; ``key_col`` tie-breaks.

    Plan shape: no global sort — Spark plans the ORDER BY+LIMIT as
    TakeOrderedAndProject (per-partition top-k, merged on the driver),
    exactly the shape that survives a 1000-executor scan.  Rows with
    NULL or non-positive weight are excluded up front (a div-by-zero
    priority is undefined on both engines).
    """
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_h", hash60(key_col, seed))
        # integer div, NOT `/`: float division of a 60-bit hash loses
        # bits past the 53-bit mantissa and the subset would drift
        # from the oracle's integer arithmetic
        .withColumn("_priority", F.expr(f"_h div {weight_col}"))
        .drop("_h")
        .orderBy("_priority", key_col)
        .limit(k)
    )
