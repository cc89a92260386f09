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

    Column order of the result: FIRST-SEEN order across parts — each
    merge keeps the left frame's columns at their positions (keys where
    they sat, overlap columns coalesced IN PLACE) and appends the right
    frame's new columns, exactly the reference's dplyr full_join +
    in-place coalesce (R/ffiec_process.R:14-33).
    """
    if not parts:
        raise ValueError("combine_parts: need at least one part")
    keys = list(keys)
    if pre_partition:
        parts = [p.repartition(pre_partition, *keys) for p in parts]

    def merge(left: DataFrame, right: DataFrame) -> DataFrame:
        key_set = set(keys)
        overlap = {
            c for c in left.columns if c in set(right.columns) and c not in key_set
        }
        right_only = [
            c for c in right.columns if c not in key_set and c not in overlap
        ]
        l, r = left.alias("l"), right.alias("r")
        joined = l.join(r, on=keys, how="full")
        # `on=keys` already coalesces the key columns in Spark's USING-join.
        cols = [
            F.col(c)
            if c in key_set
            else (
                F.coalesce(F.col(f"l.{c}"), F.col(f"r.{c}")).alias(c)
                if c in overlap
                else F.col(f"l.{c}")
            )
            for c in left.columns
        ] + [F.col(f"r.{c}") for c in right_only]
        return joined.select(*cols)

    return reduce(merge, parts)
