"""Blocked record linkage: approximate-match pairing with a blocking
key, the classic entity-resolution shape (Fellegi-Sunter blocking +
edit-distance comparison) for catalog/contact/document-title matching.

Scale design
------------
All-pairs edit distance is O(n²) and unshardable; blocking makes it
O(Σ block²) with block sizes the operator's real cost knob.  The plan
is: project the compare key, self-equi-join on the blocking key (hash
join — shuffles on the block, so blocks land whole on one reducer
exactly like a groupBy), filter ``id_a < id_b``, and evaluate
``levenshtein`` ONLY within the block.  Spark's ``levenshtein(l, r,
threshold)`` three-arg form short-circuits the DP once the running
distance exceeds the threshold — O(threshold·len) per pair instead of
O(len²) — which is the built-in to use at 100 TB.

A ``max_block_rows`` guard fails fast when a blocking key is too coarse
(one giant block would quietly re-create the quadratic blow-up the
blocking exists to prevent): production pipelines tighten the key
(add a length bucket, a sorted-neighborhood window, a second hash)
rather than eat the block.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    compare_col: Column | str,
    block_cols: Sequence[str],
    max_dist: int,
    max_block_rows: int | None = None,
) -> DataFrame:
    """Pairs ``(block_cols..., id_a, id_b, dist)`` with ``id_a < id_b``
    and ``levenshtein(compare_a, compare_b) <= max_dist``, compared only
    within identical blocking keys.

    ``compare_col`` may be an expression (e.g. a title prefix); it is
    materialized once per row before the self-join so the DP never
    re-derives it per pair.
    """
    cmp = F.col(compare_col) if isinstance(compare_col, str) else compare_col
    base = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("_id"),
        cmp.alias("_cmp"),
    )
    if max_block_rows is not None:
        from pyspark.sql import Window

        over = F.count(F.lit(1)).over(
            Window.partitionBy(*[F.col(c) for c in block_cols])
        )
        # fail fast inside the plan, as a FILTER predicate (a projected
        # column would be pruned away as dead code and never fire)
        base = base.withColumn("_bn", over).filter(
            F.when(F.col("_bn") <= max_block_rows, F.lit(True)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"blocked_levenshtein_pairs: block exceeds "
                            f"{max_block_rows} rows for key "
                        ),
                        F.concat_ws("/", *[F.col(c) for c in block_cols]),
                    ).cast("string")
                ).cast("boolean")
            )
        ).drop("_bn")
    a = base.select(
        *block_cols, F.col("_id").alias("id_a"), F.col("_cmp").alias("_ca")
    )
    b = base.select(
        *block_cols, F.col("_id").alias("id_b"), F.col("_cmp").alias("_cb")
    )
    dist = F.levenshtein("_ca", "_cb", max_dist + 1)
    # three-arg levenshtein returns -1 once the bound is exceeded:
    # keep 0 <= dist <= max_dist
    return (
        a.join(b, list(block_cols))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", dist)
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .drop("_ca", "_cb")
    )
