"""Time-series operators the reference's relational surface lacks but a
production event pipeline needs: bin-decomposed range joins, calendar
gap-filling with forward fill, and bounded-window exponential smoothing.

All three are declarative DataFrame plans (no Python UDFs).

Scale design
------------
- ``range_join_binned``: a value-vs-[lo, hi) lookup expressed as an
  EQUI-join.  A naive range join (``fact.value BETWEEN dim.lo AND
  dim.hi``) has no equi-key, so Spark plans a broadcast-nested-loop —
  O(|fact| x |dim|) comparisons, the classic scale-killer for IP-range
  or tier lookups where the dim has millions of ranges.  Decomposing
  every range into the fixed-width bins it covers turns the lookup into
  ``fact.bin == dim.bin`` (hash join, shuffle- or broadcast-able) plus a
  residual post-filter; each fact row meets only the ranges overlapping
  its one bin.  Per-bin fan-out is bounded by ranges-per-bin (pick
  ``bin_width`` ~ median range width), so the join stays linear at
  100 TB where the nested loop is quadratic.
- ``gap_fill``: output is |keys| x |calendar buckets| — bounded by the
  time span, not the event count, so it scales with the calendar.  The
  calendar is generated per key with ``sequence()`` (no driver-side
  loop, no cross join against a global calendar — each key only
  materializes its own span).
- ``ewma_bounded``: a K-term truncated exponential moving average as a
  fixed expression over ``lag`` columns — one shuffle on the key, the
  frame evaluated in the partition-local sort, identical to any other
  window aggregate.  Truncation at K terms keeps the expression
  codegen-friendly and makes the result an exact finite sum both
  engines can replay (alpha = 0.5 gives exactly-representable binary
  weights, so the oracle comparison is bit-stable before rounding).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join_binned(
    fact: DataFrame,
    value_col: str,
    ranges: DataFrame,
    bin_width: float,
    lo_col: str = "lo",
    hi_col: str = "hi",
    broadcast_ranges: bool = True,
    max_bins_per_range: int = 100_000,
) -> DataFrame:
    """Join each fact row to the range(s) with ``lo <= value < hi``.

    ``ranges`` is decomposed into one row per fixed-width bin the range
    overlaps (``sequence(floor(lo/W), floor(hi/W))`` exploded); the fact
    side computes ``floor(value/W)`` once, and the join is a pure
    equi-join on the bin with a residual ``lo <= value < hi`` filter.
    ``broadcast_ranges`` hints the expanded dim (tier tables are tiny;
    flip it off for multi-million-range dims and let the bin hash join
    shuffle both sides).

    Returns ``fact`` columns + ``ranges`` columns (minus the bin).

    Guards: inverted ranges (``lo > hi`` — a descending ``sequence``
    would otherwise explode the *reversed* interval silently) are
    dropped; a range spanning more than ``max_bins_per_range`` bins
    (a too-small ``bin_width`` against a wide range would blow past
    Spark's sequence length cap, or quietly materialize millions of
    rows per range) fails fast with a raise_error.
    """
    w = F.lit(float(bin_width))
    lo_b = F.floor(F.col(lo_col) / w).cast("long")
    hi_b = F.floor(F.col(hi_col) / w).cast("long")
    guarded_seq = F.when(
        hi_b - lo_b < F.lit(max_bins_per_range),
        F.sequence(lo_b, hi_b),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "range_join_binned: range spans more than "
                    f"{max_bins_per_range} bins of width {bin_width} — "
                    "raise bin_width or max_bins_per_range ("
                ),
                F.col(lo_col).cast("string"),
                F.lit(", "),
                F.col(hi_col).cast("string"),
                F.lit(")"),
            )
        )
    )
    expanded = ranges.filter(F.col(lo_col) <= F.col(hi_col)).select(
        "*", F.explode(guarded_seq).alias("_bin")
    )
    if broadcast_ranges:
        expanded = F.broadcast(expanded)
    f = fact.withColumn("_bin", F.floor(F.col(value_col) / w).cast("long"))
    v = F.col(value_col)
    return (
        f.join(expanded, "_bin")
        .filter((v >= F.col(lo_col)) & (v < F.col(hi_col)))
        .drop("_bin")
    )


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "day",
    ndigits: int = 4,
) -> DataFrame:
    """Calendar gap-filling with forward fill, per key.

    Aggregates ``value_col`` into ``bucket``-sized event-time buckets
    (sum, rounded), generates each key's complete calendar from its
    first to its last bucket, left-joins the observed buckets in, and
    forward-fills missing buckets with the last observed value.

    Output: ``(key, bucket_ts, observed_value, filled_value,
    is_observed)`` — ``observed_value`` is NULL on generated rows,
    ``filled_value`` carries the forward fill (never NULL because every
    key's calendar starts at its own first observation).

    One shuffle to aggregate buckets, the calendar explode is
    partition-local, and the forward fill is a window over the same key
    partitioning (exchange reuse).  Output size is bounded by
    |keys| x |span buckets|, independent of event density.
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    observed = (
        df.groupBy(F.col(key_col), b.alias("bucket_ts"))
        .agg(F.round(F.sum(value_col), ndigits).alias("observed_value"))
    )
    spans = observed.groupBy(key_col).agg(
        F.min("bucket_ts").alias("_t0"), F.max("bucket_ts").alias("_t1")
    )
    calendar = spans.select(
        key_col,
        F.explode(
            F.expr(f"sequence(_t0, _t1, interval 1 {bucket})")
        ).alias("bucket_ts"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        calendar.join(observed, [key_col, "bucket_ts"], "left")
        .select(
            key_col,
            "bucket_ts",
            "observed_value",
            F.last("observed_value", ignorenulls=True)
            .over(w)
            .alias("filled_value"),
            F.col("observed_value").isNotNull().alias("is_observed"),
        )
    )


def ewma_bounded(
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.5,
    k: int = 8,
    ndigits: int = 6,
) -> Column:
    """Truncated exponentially-weighted moving average as a window
    expression: ``ewma_t = (Σ_{j<k} w_j·x_{t-j}) / (Σ_{j<k} w_j)`` with
    ``w_j = (1-alpha)^j``, summing only the lags that exist (the first
    rows of each key average over their shorter history, pandas
    ``ewm(adjust=True)`` style).

    Terms are summed in FIXED j-ascending order as one left-associated
    expression — the oracle SQL spells the identical chain, so both
    engines round identically; with ``alpha=0.5`` every weight is an
    exact binary fraction and the numerator/denominator are exact until
    the final division.  Returns the rounded Column (caller selects it).
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    num: Column | None = None
    den: Column | None = None
    for j in range(k):
        x = F.col(value_col) if j == 0 else F.lag(value_col, j).over(w)
        wj = F.lit(float((1.0 - alpha) ** j))
        t = F.when(x.isNotNull(), x * wj).otherwise(F.lit(0.0))
        d = F.when(x.isNotNull(), wj).otherwise(F.lit(0.0))
        num = t if num is None else num + t
        den = d if den is None else den + d
    return F.round(num / den, ndigits)


def ewma_sql(
    value_expr: str,
    partition_by: str,
    order_by: str,
    alpha: float = 0.5,
    k: int = 8,
    ndigits: int = 6,
) -> str:
    """The DuckDB mirror of :func:`ewma_bounded` — the same fixed-order
    left-associated term chain, so rounding matches bit-for-bit."""
    over = f"OVER (PARTITION BY {partition_by} ORDER BY {order_by})"
    nums, dens = [], []
    for j in range(k):
        x = value_expr if j == 0 else f"lag({value_expr}, {j}) {over}"
        wj = repr(float((1.0 - alpha) ** j))
        nums.append(f"CASE WHEN {x} IS NOT NULL THEN {x} * {wj} ELSE 0.0 END")
        dens.append(f"CASE WHEN {x} IS NOT NULL THEN {wj} ELSE 0.0 END")
    return f"round(({' + '.join(nums)}) / ({' + '.join(dens)}), {ndigits})"
