"""Bucketed table layout: co-located joins and aggregations without a
shuffle.

At 100 TB the dominant cost of a fact-fact equi-join (lineitem x orders
on orderkey) is shuffling both sides.  Writing both tables bucketed by
the join key with the same bucket count makes the join a zip of
pre-partitioned buckets: Catalyst plans SortMergeJoin with NO Exchange
on either side.  Likewise groupBy on the bucket key skips its exchange.

This is the Spark-native analogue of the reference's "one parquet file
per (schedule, date)" physical contract (R/ffiec_process.R:228): layout
chosen at write time so reads never re-partition.  Bucketed tables must
live in the session catalog (saveAsTable) — plain parquet paths do not
carry bucket metadata.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-ordered) table.

    ``n_buckets`` should divide evenly into the cluster's parallelism
    and keep each bucket's data within an executor's memory at the
    target scale (e.g. 100 TB / 4096 buckets ~ 25 GB per bucket of the
    fact table — sized for spill-free sort-merge).  ``path`` makes it an
    external table at that location (the warehouse dir is a static
    conf, so tests pass an explicit path)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: with matching
    bucket counts Catalyst elides both Exchanges (verify with
    ``plans.audit.count_exchanges == 0``)."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
