"""Column profiler: per-column data-quality stats in ONE scan.

The curation question "what is in this 100 TB table" must not cost one
job per column: every statistic here (count, nulls, distinct, min, max)
is an aggregate expression in a single ``agg`` pass, unpivoted to one
row per column.  min/max are cast to string so heterogeneous column
types fit one output schema (the same trick ``df.summary()`` uses).

Exact ``count(DISTINCT)`` per column is the oracle-checkable default;
pass ``approx=True`` for HyperLogLog (``approx_count_distinct``) when
the exactness doesn't justify the extra shuffle at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str] | None = None, approx: bool = False
) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_str, max_str) per column."""
    cols = list(cols) if cols is not None else df.columns
    distinct_fn = F.approx_count_distinct if approx else F.countDistinct
    aggs = []
    for c in cols:
        aggs.extend(
            [
                F.count(F.lit(1)).alias(f"{c}__n"),
                F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nnull"),
                distinct_fn(c).alias(f"{c}__ndist"),
                F.min(c).cast("string").alias(f"{c}__min"),
                F.max(c).cast("string").alias(f"{c}__max"),
            ]
        )
    one = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__nnull").alias("n_null"),
            F.col(f"{c}__ndist").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")
