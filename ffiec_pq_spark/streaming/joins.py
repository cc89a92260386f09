"""Watermarked stream-stream interval join.

Joining two live streams needs bounded buffering on both sides: each
side holds rows only until the other side's watermark proves no more
matches can arrive.  The interval condition (right event within
[left_ts, left_ts + window]) plus BOTH watermarks is what lets Spark
evict state — an unbounded-condition stream join would grow state
forever and is rejected in append mode.

Batch equivalence: the same join expression on static DataFrames gives
the ground truth (tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within: str = "30 minutes",
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """Rows of ``left`` matched to ``right`` rows of the same key with
    ``right_ts`` in [left_ts, left_ts + within].

    Works identically on streaming and static inputs; ``streaming=True``
    adds the watermarks both sides need for state eviction."""
    if streaming:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (left[key] == right[key])
        & (right[right_ts] >= left[left_ts])
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return left.join(right, cond, "inner").drop(right[key])
