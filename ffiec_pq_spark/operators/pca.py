"""Principal-component extraction over an embedding column: covariance
by grouped aggregation, top eigenvector by INTEGER power iteration,
PCA scores as a cluster-side projection.

Scale design (same family as operators/kmeans.py)
-------------------------------------------------
- The covariance matrix is d x d — tiny state — but computing it
  touches every vector: the plan explodes each vector to d rows that
  CARRY the centered array, and one grouped aggregation per dimension i
  produces the d sums ``Σ xc_i * xc_j``.  Map-side partials reduce every
  partition to d rows x d scalars before the single shuffle; no vector
  pair, no n x d² row materialization (the flops are inherent, the
  memory shape is not).
- Power iteration runs DRIVER-side on the collected d x d matrix (4 KB
  at d=64) — the sanctioned small-state collect, like k-means centroids.
- Scores (the data-sized output) are a pure projection expression.

Cross-engine determinism — why INTEGER iteration
------------------------------------------------
A rounded floating recursion (round each matvec at k dp) fails here:
quantized inputs make the matvec sums land ON the decimal rounding
boundary systematically, and engines disagree at exact halves (decimal
HALF_UP vs multiply-round-divide vs Python's half-even).  Instead the
eigenvector lives on an integer grid:

- covariance quantized once to ``c_int = round(c_7dp * 1e7)`` (the raw
  7-dp covariance was verified boundary-free: real-data sums sit ~1e-15
  relative from any boundary);
- iteration state ``x`` is an integer vector with ``max|x| ~ SCALE``
  (L-inf normalization): ``y = C_int · x`` is an EXACT int64 sum on any
  engine in any order; the shrink divisor ``D = max|y| div SCALE + 1``
  is integer; ``x' = trunc(y / D)`` — the only float op, and its trunc
  can never straddle an integer because a non-exact ``y/D`` is at least
  ``1/D`` from one while the double error is ulp-sized (bounds in
  :func:`power_iteration_int`);
- the final normalization ``v = x / sqrt(Σ x²)`` divides by the sqrt of
  an EXACT integer (Σ x² <= d·SCALE² < 2^53), so it is one correctly-
  rounded op — bit-identical everywhere, no rounding step at all.

The SQL oracle replays the identical integer recursion as unrolled
CTEs.  Precondition: |cov_int·x| sums must stay exact int64 AND within
2^53 for the float shrink — |c| <= ~1e4 covers any normalized-embedding
corpus by orders of magnitude.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffiec_pq_spark.functions.lits import double_array

PCA_SCALE = 1_000_000  # L-inf magnitude of the integer iteration state
PCA_COV_Q = 10_000_000  # covariance quantization (7 dp)


def embedding_means(
    df: DataFrame, vec_col: str, dim: int, ndigits: int = 9
) -> list[float]:
    """Per-dimension mean, rounded — one aggregate row to the driver."""
    row = df.agg(
        *[
            F.round(F.avg(F.element_at(F.col(vec_col), i + 1)), ndigits).alias(
                f"m{i}"
            )
            for i in range(dim)
        ]
    ).collect()[0]
    return [float(row[f"m{i}"]) for i in range(dim)]


def covariance_matrix(
    df: DataFrame,
    vec_col: str,
    dim: int,
    means: list[float],
    n: int,
    ndigits: int = 7,
) -> list[list[float]]:
    """Sample covariance (rounded), via the explode-i / sum-j grouped
    aggregation described in the module docstring."""
    m_arr = double_array(means)
    cv = df.select(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            m_arr,
            lambda x, m: x - m,
        ).alias("_cv")
    )
    exploded = cv.select(F.posexplode("_cv").alias("i", "xi"), F.col("_cv"))
    sums = exploded.groupBy("i").agg(
        *[
            F.sum(F.col("xi") * F.element_at("_cv", j + 1)).alias(f"s{j}")
            for j in range(dim)
        ]
    )
    rows = sums.collect()
    cov = [[0.0] * dim for _ in range(dim)]
    for r in rows:
        i = r["i"]
        for j in range(dim):
            cov[i][j] = round(r[f"s{j}"] / (n - 1), ndigits)
    return cov


def power_iteration_int(
    cov: list[list[float]], iters: int = 5
) -> list[float]:
    """Top eigenvector via the integer recursion (module docstring).

    Exactness bounds with |c_int| <= C, |x| <= S=PCA_SCALE, dim=d:
    ``|y| <= d·C·S`` must stay int64-exact AND <= 2^53 for the float
    shrink — C <= 1e4·PCA_COV_Q gives 6e19 (too big), real covariance
    C ~ 1e7-1e9 gives |y| <= ~6e16; asserted below at 2^53 so a
    violating corpus fails loudly instead of drifting.  The trunc in
    ``x' = int(y / D)`` is safe because a non-exact y/D is >= 1/D from
    an integer while the double division error is <= ulp(|y|/D) —
    with |y| <= 2^53 and quotient <= S the error is < 2^-52·S ~ 2e-10
    < 1/D for any D < 5e9."""
    d = len(cov)
    ci = [[int(round(c * PCA_COV_Q)) for c in row] for row in cov]
    x = [PCA_SCALE] * d
    for _ in range(iters):
        y = [sum(ci[i][j] * x[j] for j in range(d)) for i in range(d)]
        mx = max(abs(v) for v in y)
        assert mx < 2 ** 53, "pca: covariance magnitude breaks exactness bound"
        dvs = mx // PCA_SCALE + 1
        x = [int(v / dvs) for v in y]
    # deterministic sign: first dimension with a clearly nonzero loading
    for v in x:
        if abs(v) > PCA_SCALE // 100:
            if v < 0:
                x = [-v2 for v2 in x]
            break
    nrm = math.sqrt(sum(v * v for v in x))  # exact int under 2^53
    if nrm == 0.0:
        # zero covariance (constant data): the PC is undefined; pick
        # the first axis deterministically rather than divide by zero
        return [1.0] + [0.0] * (d - 1)
    return [v / nrm for v in x]


def pca_fit(
    df: DataFrame, vec_col: str, dim: int, iters: int = 5
) -> tuple[list[float], list[float]] | None:
    """Fit the PC1 model driver-side: (means, eigenvector), or None
    when the sample covariance is undefined (< 2 vectors).  Split out
    of ``pca_scores`` so a resident pipeline can fit ONCE and project
    many times — the fit is the iterative cost (count + means +
    covariance rollup + power iteration), the projection is a narrow
    stateless expression."""
    n = df.count()
    if n < 2:
        return None
    means = embedding_means(df, vec_col, dim)
    cov = covariance_matrix(df, vec_col, dim, means, n)
    v = power_iteration_int(cov, iters)
    return (list(means), list(v))


_UNFITTED = object()  # pca_fit legitimately returns None (degenerate)


def pca_scores(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    iters: int = 5,
    ndigits: int = 6,
    model=_UNFITTED,
) -> DataFrame:
    """(id, pc1_score): each vector's projection onto the top principal
    component — fit driver-side on d x d state (or reuse a
    ``pca_fit`` model, including a degenerate None one), scored
    cluster-side as one narrow expression over the scan."""
    if model is _UNFITTED:
        model = pca_fit(df, vec_col, dim, iters)
    if model is None:
        # no sample covariance from < 2 vectors: empty/undefined scores
        # (the empty-partition edge a 100 TB pipeline hits routinely)
        return df.select(
            F.col(id_col).alias("id"),
            F.lit(None).cast("double").alias("pc1_score"),
        )
    means, v = model
    m_arr = double_array(means)
    v_arr = double_array(v)
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), m_arr, lambda x, m: x - m
    )
    score = F.aggregate(
        F.zip_with(centered, v_arr, lambda x, w: x * w),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    return df.select(
        F.col(id_col).alias("id"), F.round(score, ndigits).alias("pc1_score")
    )
