"""Multi-way full-outer-join + coalesce combination — the reference's
signature operator (``combine_call_parts``, reference R/ffiec_process.R:14-33).

Semantics: fold N part-DataFrames sharing a key; rows align on the key
via FULL OUTER join; for every non-key column present on both sides the
surviving value is ``coalesce(left, right)`` (left wins when both are
non-null); single-sided columns pass through (NULL where the row came
from the other side).

Scale notes
-----------
The reference's parts are slices of one schedule (≤ thousands of rows ×
hundreds of columns), so Catalyst will broadcast each successive side.
At 100 TB the same fold is correct but each join shuffles on the key —
callers combining genuinely large parts should ``repartition(key)`` all
parts identically first so AQE reuses one exchange, or pass
``pre_partition=n`` here to do it.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def combine_parts(
    parts: Sequence[DataFrame],
    keys: Sequence[str],
    pre_partition: int | None = None,
) -> DataFrame:
    """Fold ``parts`` with FULL OUTER join on ``keys`` + coalesce-merge.

    Column order of the result: keys, then non-key columns in first-seen
    order across parts (matching the reference's left-to-right fold).
    """
    if not parts:
        raise ValueError("combine_parts: need at least one part")
    keys = list(keys)
    if pre_partition:
        parts = [p.repartition(pre_partition, *keys) for p in parts]

    def merge(left: DataFrame, right: DataFrame) -> DataFrame:
        overlap = [
            c for c in left.columns if c in set(right.columns) and c not in keys
        ]
        left_only = [c for c in left.columns if c not in keys and c not in overlap]
        right_only = [c for c in right.columns if c not in keys and c not in overlap]
        l, r = left.alias("l"), right.alias("r")
        joined = l.join(r, on=keys, how="full")
        # `on=keys` already coalesces the key columns in Spark's USING-join.
        cols = (
            [F.col(k) for k in keys]
            + [F.col(f"l.{c}") for c in left_only]
            + [F.coalesce(F.col(f"l.{c}"), F.col(f"r.{c}")).alias(c) for c in overlap]
            + [F.col(f"r.{c}") for c in right_only]
        )
        return joined.select(*cols)

    return reduce(merge, parts)
