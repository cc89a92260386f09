"""Integrity / validation operators (SURVEY.md §2.11, V1-V6).

The reference's substitute for tests: runtime invariant queries.
- ``pk_violations``: groups of key columns appearing more than once
  (reference ffiec_check_pq_keys, R/ffiec_manifest.R:352-374).
- ``null_counts_long``: per-column NULL counts, long form
  (reference check_pk_and_non_null, R/ffiec_manifest.R:382-396).
- ``assert_no_dups``: fail-fast duplicate assertion
  (reference R/ffiec_make_long_pqs.R:131-154).

All are single-shuffle grouped aggregates with map-side partials; the
null-count scan is one pass over all requested columns at once (not one
job per column).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pk_violations(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows (key..., n) for every key group with count > 1."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def assert_no_dups(df: DataFrame, keys: Sequence[str]) -> None:
    """Raise ``ValueError`` if any duplicate key group exists."""
    dups = pk_violations(df, keys).limit(1).count()
    if dups:
        raise ValueError(f"duplicate keys found for {list(keys)}")


def null_counts_long(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """One row per column: (column, n_na).  Single aggregate pass, then a
    driver-free unpivot of the 1-row result."""
    cols = list(cols) if cols is not None else df.columns
    agg = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    )
    return agg.unpivot(
        ids=[], values=cols, variableColumnName="column", valueColumnName="n_na"
    )


def check_pk_and_non_null(
    df: DataFrame, keys: Sequence[str], non_null: Sequence[str] | None = None
) -> dict:
    """Driver-side audit summary: duplicate-group count + null counts.

    Mirrors the reference's user-facing check (both sub-checks share one
    cached scan when the caller caches ``df``)."""
    n_dup_groups = pk_violations(df, keys).count()
    nn = [r.asDict() for r in null_counts_long(df, non_null).filter(F.col("n_na") > 0).collect()]
    return {"n_dup_key_groups": n_dup_groups, "null_columns": nn, "ok": n_dup_groups == 0 and not nn}
