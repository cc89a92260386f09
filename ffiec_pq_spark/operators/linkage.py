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


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_key: Column | str,
    compare_col: Column | str,
    window: int,
    max_dist: int,
    prefix: Column | str | None = None,
) -> DataFrame:
    """Sorted-neighborhood record linkage: order all rows by
    ``sort_key`` and compare each row only to its ``window`` successors
    — the classic complement to hard blocking
    (:func:`blocked_levenshtein_pairs`): near-matches that straddle a
    block boundary still meet, and the comparison count is exactly
    ``n * window`` instead of Σ block².

    Distributed global ordering WITHOUT a single-partition window (an
    unpartitioned ``row_number`` funnels the whole table through one
    task — the textbook Spark scale-killer): rows partition by a
    MONOTONE coarse ``prefix`` of the sort key (default: its first
    character), ``row_number`` runs per prefix in parallel, and the
    tiny per-prefix counts come to the driver once to compute additive
    offsets — global position = prefix offset + local rank, exactly.
    Candidate pairs are then ONE equi-join of each row against its
    ``window`` successor positions (an explode of j=1..window), gated
    by the bounded levenshtein.  Total cost: one keyed exchange for the
    rank, one position equi-join of n·window rows.

    ``prefix`` must order-agree with ``sort_key`` (a string prefix
    does); pick its granularity so per-prefix row counts fit a task.

    Returns (id_a, id_b, dist) with (id_a, id_b) in sort order.
    """
    from pyspark.sql import Window as W

    cmp = F.col(compare_col) if isinstance(compare_col, str) else compare_col
    key = F.col(sort_key) if isinstance(sort_key, str) else sort_key
    if prefix is None:
        pfx = F.substring(key, 1, 1)
    else:
        pfx = F.col(prefix) if isinstance(prefix, str) else prefix
    base = df.select(
        F.col(id_col).alias("_id"),
        key.alias("_k"),
        cmp.alias("_c"),
        pfx.alias("_p"),
    )
    counts = sorted(
        (r["_p"], r["n"])
        for r in base.groupBy("_p").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    if not counts:
        # empty input: no prefixes, no pairs (an argless create_map
        # would type as map<void,void> and fail analysis)
        return base.select(
            F.col("_id").alias("id_a"),
            F.col("_id").alias("id_b"),
            F.lit(0).alias("dist"),
        ).limit(0)
    offsets, acc = {}, 0
    for p, n in counts:
        offsets[p] = acc
        acc += n
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    rn = F.row_number().over(W.partitionBy("_p").orderBy("_k", "_id"))
    pos = (off_map[F.col("_p")] + rn).alias("_pos")
    ranked = base.select("_id", "_c", pos)
    probe = ranked.select(
        F.col("_id").alias("id_a"),
        F.col("_c").alias("_ca"),
        F.explode(
            F.array(*[F.col("_pos") + j for j in range(1, window + 1)])
        ).alias("_pos"),
    )
    right = ranked.select(
        F.col("_id").alias("id_b"), F.col("_c").alias("_cb"), "_pos"
    )
    dist = F.levenshtein("_ca", "_cb", max_dist + 1)
    return (
        probe.join(right, "_pos")
        .withColumn("dist", dist)
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("id_a", "id_b", "dist")
    )
