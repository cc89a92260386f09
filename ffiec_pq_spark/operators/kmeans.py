"""Deterministic Lloyd k-means over an embedding column — the iterative
-algorithm pattern on Spark, and the trainer for the IVF coarse
quantizer (operators/similarity.py uses fixed centroids; this fits real
ones).

The canonical scalable shape: per iteration ONE grouped aggregation —
assign each vector to its nearest centroid (centroids are a broadcast
literal, comparison is a pure column expression) and reduce per-cluster
elementwise sums + counts.  Only k×dim floats ever reach the driver per
iteration; the data never moves except one shuffle by cluster id, and
AQE coalesces it (k groups).  Iteration count is fixed (no convergence
RNG) and initialization is the k lowest-id data vectors, so runs are
reproducible anywhere.

For k or dim large enough that k×dim literals bloat the plan, switch
the assignment to a pandas UDF over a broadcast numpy array — same
loop, same aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec, cent: list[float]):
    """Σ (x_i - c_i)^2 as a fold over the array column, quantized to
    9 dp.  The quantization makes the nearest-centroid tie-break robust
    to summation order: Spark folds dimensions in array order while a
    SQL replay (or a different partitioning) may sum in any order, and a
    last-ulp difference on a near-tie would otherwise flip the
    assignment."""
    from ffiec_pq_spark.functions.lits import double_array

    c_arr = double_array(cent)
    return F.round(
        F.aggregate(
            F.zip_with(vec, c_arr, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
        9,
    )


def assign_cells(df: DataFrame, centroids: list[list[float]], vec_col: str):
    """Column: index of the nearest centroid (ties -> lowest index)."""
    k = len(centroids)
    entries = [
        F.struct(
            _sq_dist(F.col(vec_col), c).alias("d"),
            F.lit(j).alias("j"),
        )
        for j, c in enumerate(centroids)
    ]
    # array_min on (distance, index) structs: min distance, tie -> min index
    return F.array_min(F.array(*entries))["j"]


def kmeans_init(
    df: DataFrame, vec_col: str, id_col: str, k: int
) -> list[list[float]]:
    """Deterministic data-point init: the k lowest-id vectors.  Points
    off the data manifold (e.g. random directions) make one centroid
    swallow everything in step 1 — seeding from the data avoids the
    empty-cluster collapse without any RNG."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if not rows:
        # fail fast with a diagnosable error: an empty centroid list
        # would otherwise surface as an obscure VOID-type
        # AnalysisException from array_min(array()) in assign_cells
        raise ValueError("kmeans_init: cannot seed centroids from an empty input")
    return [list(r["v"]) for r in rows]


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    dim: int = 64,
    iters: int = 5,
) -> list[list[float]]:
    """Fit k centroids with ``iters`` Lloyd steps from the deterministic
    data-point init.  Each step is one job: groupBy(cluster) with
    per-dimension sum aggregates + count."""
    cents = kmeans_init(df, vec_col, id_col, k)
    for _ in range(iters):
        assigned = df.select(
            assign_cells(df, cents, vec_col).alias("cell"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        # per-dimension sum aggregates: map-side partials reduce every
        # partition to k rows x dim scalars before the shuffle — never
        # materialize a cluster's vectors together (collect_list would)
        stats = (
            assigned.groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("v", i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new = list(cents)
        for r in stats:
            if r["n"]:
                new[r["cell"]] = [r[f"s{i}"] / r["n"] for i in range(dim)]
        cents = new
    return cents


def kmeans_assignments(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    dim: int = 64,
    iters: int = 5,
) -> DataFrame:
    """(id, cell) under the fitted centroids."""
    cents = kmeans_fit(df, vec_col, id_col, k, dim, iters)
    return df.select(
        F.col(id_col).alias("id"), assign_cells(df, cents, vec_col).alias("cell")
    )
