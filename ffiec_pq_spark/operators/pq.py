"""Product quantization (PQ) over an embedding column — the vector
compression stage of an IVF-PQ index (Jegou et al. 2011, "Product
Quantization for Nearest Neighbor Search"), which is THE standard way
a 100 TB corpus's embeddings fit in memory: dim-D vectors become m
uint8 codes (m bytes instead of 4·D), and queries scan codes with a
per-subspace lookup table instead of touching raw floats.

Reference parity: the reference repo (iangow/ffiec.pq) has no vector
surface at all; this extends the engine's ANN family
(operators/similarity.py — brute / IVF / LSH) with its scale path.

Scalable shape, mirroring operators/kmeans.py:

- the vector relation is exploded ONCE into (id, sub, v) subvector
  rows — m rows per vector, each carrying dim/m floats, so per-row
  work in every downstream stage is bounded by the SUBspace dim;
- training is Lloyd's loop per subspace, all m subspaces in the SAME
  job: one groupBy(sub, cell) per iteration with per-dimension sum
  aggregates (map-side partials reduce each partition to m·k rows
  before the shuffle), m·k·(dim/m) floats to the driver per iteration
  — the data itself never moves except that one shuffle;
- encoding (code assignment) is a pure column expression against the
  broadcast codebook literal — no join, no shuffle;
- asymmetric-distance (ADC) scoring of a probe is one groupBy(id) over
  the code rows with an INTEGER-scaled distance sum (order-independent
  — cross-engine safe) and a TakeOrderedAndProject top-k.

Determinism follows the kmeans conventions exactly: init = the k
lowest-id vectors' subvectors (no RNG), distances round(·, 9) on both
engines so summation-order ulps cannot flip a near-tie assignment.

At real scale you'd raise k to 256 (one byte per code) and m to D/8;
the plan shapes are identical — only the assignment stage switches
from the literal expression to the Arrow-batched pandas-UDF scorer
(``_make_assign_udf``) past ``_EXPR_MAX_FLOATS`` codebook floats: the
literal path emits k struct entries each holding a sub_dim-element
fold, so its expression tree grows as k·sub_dim and blows past
whole-stage-codegen limits long before k=256, while the UDF path is a
single vectorized numpy distance matrix per Arrow batch against a
codebook that rides the pickled UDF command (which PySpark itself
ships as a broadcast once it exceeds the 1 MB command threshold — the
"broadcast numpy codebook" path, with zero explicit broadcast-handle
lifetime to manage).  ``pq_fit``/``pq_codes`` pick the path by size
(``assign="auto"``) or explicitly (``"expr"``/``"pandas"``).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ffiec_pq_spark.functions.lits import double_array, double_array2

# Past this many codebook floats (m·k·sub_dim) the literal assignment
# expression is replaced by the pandas-UDF scorer.  Set from the A/B
# (scripts/pq_assign_bench.py, sf0.1 + 8x/16x replicas, full
# fit(iters=2)+encode, min-of-3, clean machine):
#
#     k=4  (256 floats):  expr 2.17/1.83/2.10s   pandas 1.36/1.18/1.51s
#     k=16 (1024):        expr 6.00/5.94/7.27s   pandas 1.35/1.39/1.58s
#     k=64 (4096):        expr 44.9/46.9/49.2s   pandas 1.48/3.34/1.89s
#
# The expr column is FLAT in data size — it measures Catalyst/codegen
# compile of the k·sub_dim-node expression tree, which passes 45s at
# k=64 and would only worsen at k=256: the expression path is unusable
# at production parameters regardless of data volume.  k=16 already
# loses 4-5x locally -> 1024 floats lands on the UDF path (threshold
# 512).  k=4 also loses locally (~0.7s, again pure compile), but stays
# on the expression path: at 100 TB per-row cost dominates compile,
# and 256 fused JVM multiply-adds with no Arrow transfer is the better
# per-row deal — plus it keeps tiny-codebook encodes free of any
# Python-worker dependency (streaming stages, JVM-only deployments).
_EXPR_MAX_FLOATS = 512


def pq_subvectors(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    sub_dim: int = 16,
) -> DataFrame:
    """Explode each vector into m (id, sub, v) subvector rows.

    ``inline`` of a literal-indexed struct array — narrow, no shuffle;
    the m·|rows| relation is the working set for training and coding,
    each row holding only dim/m doubles.
    """
    parts = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(
                    F.col(vec_col).cast("array<double>"), s * sub_dim + 1, sub_dim
                ).alias("v"),
            )
            for s in range(m)
        ]
    )
    return df.select(F.col(id_col).alias("id"), F.inline(parts))


def _codebook_lit(codebooks: list[list[list[float]]]):
    """The full [sub][cell][j] codebook as one nested array literal
    (single-``F.expr`` rendering — the element-wise ``F.lit`` form paid
    one py4j round trip per coordinate and dominated ANN warm reps)."""
    from ffiec_pq_spark.functions.lits import double_array3

    return double_array3(codebooks)


def _assign_expr(codebooks: list[list[list[float]]]):
    """(cell, d) struct column: nearest centroid of this row's subspace
    (ties -> lowest cell) and its round(·, 9) squared distance.  Pure
    expression — the codebook rides the plan as a broadcast literal."""
    cb_sub = F.element_at(_codebook_lit(codebooks), F.col("sub") + 1)
    k = len(codebooks[0])
    entries = [
        F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("v"),
                        F.element_at(cb_sub, c + 1),
                        lambda x, cv: (x - cv) * (x - cv),
                    ),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                ),
                9,
            ).alias("d"),
            F.lit(c).alias("cell"),
        )
        for c in range(k)
    ]
    return F.array_min(F.array(*entries))


def _np_round9(a):
    """Vectorized Spark-compatible ``round(x, 9)`` (HALF_UP on the
    shortest decimal repr, i.e. java BigDecimal.valueOf().setScale(9,
    HALF_UP)) for non-negative doubles.

    Fast path: floor(x·1e9 + 0.5)/1e9 on the binary value.  That
    differs from decimal HALF_UP only when the true decimal expansion
    sits within the binary representation error of the .5 boundary, so
    values whose scaled fractional part lands inside ±0.01 of 0.5 are
    re-rounded exactly through ``decimal.Decimal`` (repr(float) is the
    shortest round-trip string, matching BigDecimal.valueOf).  The
    band is ~1e3× wider than the worst-case product error at the
    distance magnitudes involved (d ≤ ~1e3 → x·1e9 ulp ≤ ~1e-4), and
    the slow path triggers on ~2% of uniform values — vectorized cost
    everywhere else."""
    x = np.asarray(a, dtype=np.float64)
    scaled = x * 1e9
    fl = np.floor(scaled)
    frac = scaled - fl
    out = np.where(frac >= 0.5, fl + 1.0, fl) / 1e9
    risky = np.abs(frac - 0.5) < 1e-2
    if risky.any():
        flat = out.reshape(-1)
        xf = x.reshape(-1)
        for i in np.nonzero(risky.reshape(-1))[0]:
            flat[i] = float(
                Decimal(repr(float(xf[i]))).quantize(
                    Decimal("1e-9"), rounding=ROUND_HALF_UP
                )
            )
    return out


def _make_assign_udf(codebooks: list[list[list[float]]]):
    """Arrow-batched pandas-UDF scorer over the full numpy codebook —
    the production-parameter (k=256, m=D/8) assignment path.

    Per batch: one (rows × k) squared-distance matrix per subspace
    present in the batch, ``_np_round9``-pinned so the (d, cell)
    ordering matches the literal-expression path and the DuckDB oracle
    (ties → lowest cell via argmin's first-min rule), then the chosen
    cell's rounded distance is reported.  The codebook ndarray is
    closure-captured: PySpark ships pickled UDF commands above 1 MB as
    a broadcast automatically, so a production-size codebook reaches
    executors exactly once per stage with no handle lifetime to
    manage.

    This is the package's ONE intentional Python-side stage (mandated
    scale path — the k·sub_dim-node literal expression stops
    compiling near k≈128): vectorized numpy on Arrow batches, never
    row-at-a-time.  The 9-dp decimal pinning exists for cross-engine
    oracle replay; a production encode job free of replay constraints
    may drop it and keep raw float distances."""
    from pyspark.sql.functions import pandas_udf

    cb = np.asarray(codebooks, dtype=np.float64)  # (m, k, sub_dim)

    @pandas_udf("struct<cell:int,d:double>")
    def assign(sub: pd.Series, v: pd.Series) -> pd.DataFrame:
        subs = sub.to_numpy(dtype=np.int64)
        if len(subs) == 0:
            # Spark may hand a zero-row Arrow batch; np.stack on an
            # empty sequence raises, so short-circuit to an empty frame
            return pd.DataFrame(
                {
                    "cell": pd.array([], dtype="int32"),
                    "d": pd.array([], dtype="float64"),
                }
            )
        X = np.stack(v.to_numpy())  # (n, sub_dim) float64
        n = len(subs)
        cell = np.zeros(n, dtype=np.int64)
        dist = np.zeros(n, dtype=np.float64)
        for s in np.unique(subs):
            m_ = subs == s
            diff = X[m_][:, None, :] - cb[s][None, :, :]
            r = _np_round9((diff * diff).sum(axis=-1))  # (ns, k)
            c = np.argmin(r, axis=1)  # ties -> lowest cell
            cell[m_] = c
            dist[m_] = r[np.arange(len(c)), c]
        return pd.DataFrame(
            {"cell": cell.astype("int32"), "d": dist}
        )

    return assign


def _assign_struct(
    codebooks: list[list[list[float]]], assign: str = "auto"
) -> Column:
    """The (cell, d) assignment column under the chosen path: ``expr``
    (literal codebook, pure JVM expression), ``pandas`` (Arrow-batched
    numpy scorer), or ``auto`` (size switch at ``_EXPR_MAX_FLOATS``).
    Both paths produce identical (cell, d) values — same round(·, 9)
    distances, same ties→lowest-cell rule (pinned by
    tests/test_pq.py::test_pandas_assign_matches_expr)."""
    if assign == "auto":
        n_floats = (
            len(codebooks) * len(codebooks[0]) * len(codebooks[0][0])
        )
        assign = "pandas" if n_floats > _EXPR_MAX_FLOATS else "expr"
    if assign == "expr":
        return _assign_expr(codebooks)
    if assign == "pandas":
        return _make_assign_udf(codebooks)(F.col("sub"), F.col("v"))
    raise ValueError(f"assign must be auto|expr|pandas, got {assign!r}")


def pq_init(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    sub_dim: int = 16,
    k: int = 4,
) -> list[list[list[float]]]:
    """Deterministic init: the k lowest-id vectors' subvectors, per
    subspace (same ids in every subspace — one bounded collect)."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("pq_init: cannot seed codebooks from an empty input")
    return [
        [list(r["v"][s * sub_dim : (s + 1) * sub_dim]) for r in rows]
        for s in range(m)
    ]


def pq_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    sub_dim: int = 16,
    k: int = 4,
    iters: int = 3,
    assign: str = "auto",
) -> list[list[list[float]]]:
    """Fit the m per-subspace codebooks with ``iters`` Lloyd steps.

    One job per step: all m subspaces assign and reduce together in a
    single groupBy(sub, cell) with per-dimension sums — m·k rows of
    sub_dim floats reach the driver; empty cells keep their previous
    centroid (matching the kmeans convention and the SQL oracle).
    ``assign`` picks the assignment path (see ``_assign_struct``)."""
    sv = pq_subvectors(df, vec_col, id_col, m, sub_dim)
    books = pq_init(df, vec_col, id_col, m, sub_dim, k)
    for _ in range(iters):
        assigned = sv.select(
            "sub", _assign_struct(books, assign)["cell"].alias("cell"), "v"
        )
        stats = (
            assigned.groupBy("sub", "cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("v", j + 1)).alias(f"s{j}")
                    for j in range(sub_dim)
                ],
            )
            .collect()
        )
        new = [list(cents) for cents in books]
        for r in stats:
            if r["n"]:
                new[r["sub"]][r["cell"]] = [
                    r[f"s{j}"] / r["n"] for j in range(sub_dim)
                ]
        books = new
    return books


def pq_codes(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign: str = "auto",
) -> DataFrame:
    """(id, sub, cell, d): each vector's m PQ codes under the fitted
    codebooks, with the round(·, 9) squared reconstruction distance of
    the chosen centroid.  Pure projection — no shuffle on either
    assignment path (the pandas path adds one ArrowEvalPython map
    stage, still shuffle-free)."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    sv = pq_subvectors(df, vec_col, id_col, m, sub_dim)
    a = _assign_struct(codebooks, assign)
    return sv.select("id", "sub", a["cell"].alias("cell"), a["d"].alias("d"))


def pq_adc_topk(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    probe: list[float],
    top_k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k: approximate squared distance from
    ``probe`` to every coded vector = Σ_sub d(probe_sub, centroid of
    the vector's code in sub).

    The per-(sub, cell) probe distance is evaluated IN-PLAN (same
    zip_with fold, round(·, 9)) so the oracle replays it bit-for-bit,
    then scaled to integer nano-units before the per-id sum — integer
    sums are summation-order-independent, so the ranking cannot
    ulp-flip between engines.  The final top-k is a
    TakeOrderedAndProject (never a global sort).
    """
    cb_sub = F.element_at(_codebook_lit(codebooks), F.col("sub") + 1)
    sub_dim = len(codebooks[0][0])
    d_q = F.round(
        F.aggregate(
            F.zip_with(
                F.slice(
                    double_array(probe),
                    F.col("sub") * sub_dim + 1,
                    sub_dim,
                ),
                F.element_at(cb_sub, F.col("cell") + 1),
                lambda x, cv: (x - cv) * (x - cv),
            ),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
        9,
    )
    nano = F.round(d_q * F.lit(1e9), 0).cast("long")
    return (
        codes.select("id", nano.alias("nano"))
        .groupBy("id")
        .agg(F.sum("nano").alias("nano"))
        .orderBy(F.col("nano").asc(), F.col("id").asc())
        .limit(top_k)
        .select(
            "id",
            F.round(F.col("nano").cast("double") / F.lit(1e9), 6).alias("adc_dist"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-PQ composition: coarse quantizer (operators/kmeans.py) + PQ over
# RESIDUALS + probed-cell ADC search — the full production ANN shape
# (FAISS IVFPQ lineage): the coarse cell prunes the scan (at scale it
# is the partition column, as in ann_ivf_topk), the residual PQ codes
# compress what remains, and the probe pays m·k·nprobe centroid
# distances instead of touching any raw vector.


def ivfpq_residuals(
    df: DataFrame,
    coarse: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, ccell, rv): each vector's coarse cell and its round(·, 9)
    residual (x - coarse centroid).  The per-element 9 dp rounding pins
    the second-stage (PQ) training input bit-for-bit across engines —
    a last-ulp difference in a centroid coordinate cannot propagate
    into the residual Lloyd loop.  Pure projection — no shuffle."""
    from ffiec_pq_spark.operators.kmeans import assign_cells

    cc = double_array2(coarse)
    base = df.select(
        F.col(id_col).alias("id"),
        assign_cells(df, coarse, vec_col).alias("ccell"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    return base.select(
        "id",
        "ccell",
        F.transform(
            F.zip_with(
                F.col("v"),
                F.element_at(cc, F.col("ccell") + 1),
                lambda x, c: x - c,
            ),
            lambda r: F.round(r, 9),
        ).alias("rv"),
    )


def ivfpq_codes(
    resid: DataFrame,
    codebooks: list[list[list[float]]],
    assign: str = "auto",
) -> DataFrame:
    """(id, ccell, sub, cell): PQ codes of the residual vectors, the
    coarse cell carried through (it keys the probed-cell filter and, at
    scale, the partition layout).  Pure projection — no shuffle on
    either assignment path (the pandas path, taken automatically past
    ``_EXPR_MAX_FLOATS``, adds one ArrowEvalPython map stage; the ADC
    probe side needs no switch — its per-row work is one O(sub_dim)
    lambda against the constant-folded codebook literal regardless of
    k)."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    parts = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(F.col("rv"), s * sub_dim + 1, sub_dim).alias("v"),
            )
            for s in range(m)
        ]
    )
    sv = resid.select("id", "ccell", F.inline(parts))
    a = _assign_struct(codebooks, assign)
    return sv.select("id", "ccell", "sub", a["cell"].alias("cell"))


def ivfpq_cell_ranks(
    spark, coarse: list[list[float]], probe: list[float]
) -> list[int]:
    """ALL coarse cells in probe-distance rank order (nearest first,
    ties -> lowest cell), evaluated as a SPARK expression over literals
    so the round(·, 9) discipline matches the engine's (and the
    oracle's) — never Python float rounding, whose half-to-even
    differs from both engines.  The full ranking drives the
    single-pass nprobe design sweep (``rank <= nprobe`` gates); the
    probed set for any nprobe is its prefix."""
    q = double_array(probe)
    entries = [
        F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(
                        q,
                        double_array(c),
                        lambda x, cv: (x - cv) * (x - cv),
                    ),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                ),
                9,
            ).alias("d"),
            F.lit(j).alias("c"),
        )
        for j, c in enumerate(coarse)
    ]
    row = (
        spark.range(1)
        .select(F.array_sort(F.array(*entries)).alias("p"))
        .collect()[0]
    )
    return [s["c"] for s in row["p"]]


def ivfpq_probed_cells(
    spark, coarse: list[list[float]], probe: list[float], nprobe: int
) -> list[int]:
    """The nprobe coarse cells nearest the probe (ties -> lowest cell):
    the rank-order prefix — see :func:`ivfpq_cell_ranks`."""
    return sorted(ivfpq_cell_ranks(spark, coarse, probe)[:nprobe])


def ivfpq_adc_nano_expr(
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    probe: list[float],
) -> Column:
    """The per-code-row ADC integer nano distance of ``probe`` against
    a (ccell, sub, cell) code — the probe's residual in the row's
    coarse cell (round(·, 9) per element, exactly like the doc
    residuals) scored against the row's PQ centroid.  Shared by the
    probed top-k search and the nprobe design sweep (which scores ALL
    cells once and gates by cell rank)."""
    # rendered as ONE SQL string / F.expr call: the element-wise
    # DataFrame construction of this expression (nested lambdas +
    # nested codebook literals) cost ~540 py4j round trips per build —
    # the dominant warm cost of the BUILD_TIMED ANN reps (guide §1.2:
    # per-task work includes the DRIVER's plan construction).  The
    # parsed tree is the identical zip_with/aggregate/round pipeline.
    from ffiec_pq_spark.functions.lits import (
        double_array2_sql,
        double_array3_sql,
        double_array_sql,
    )

    cc = double_array2_sql(coarse)
    cb = double_array3_sql(codebooks)
    sub_dim = len(codebooks[0][0])
    q = double_array_sql(probe)
    q_res = (
        f"transform(zip_with({q}, element_at({cc}, ccell + 1), "
        "(x, c) -> x - c), r -> round(r, 9))"
    )
    qr_sub = f"slice({q_res}, sub * {sub_dim} + 1, {sub_dim})"
    d_q = (
        f"round(aggregate(zip_with({qr_sub}, "
        f"element_at(element_at({cb}, sub + 1), cell + 1), "
        "(x, cv) -> (x - cv) * (x - cv)), 0.0D, (acc, d) -> acc + d), 9)"
    )
    return F.expr(f"CAST(round({d_q} * 1.0E9D, 0) AS BIGINT)")


def ivfpq_adc_topk(
    codes: DataFrame,
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    probe: list[float],
    probed: list[int],
    top_k: int = 10,
) -> DataFrame:
    """Probed-cell ADC top-k: scan only codes whose coarse cell is in
    ``probed`` (at scale this is partition pruning), score each code
    against the probe (``ivfpq_adc_nano_expr``), reduce per-id as
    integer nano sums, TakeOrderedAndProject the top-k."""
    nano = ivfpq_adc_nano_expr(coarse, codebooks, probe)
    return (
        codes.filter(F.col("ccell").isin([int(c) for c in probed]))
        .select("id", nano.alias("nano"))
        .groupBy("id")
        .agg(F.sum("nano").alias("nano"))
        .orderBy(F.col("nano").asc(), F.col("id").asc())
        .limit(top_k)
        .select(
            "id",
            F.round(F.col("nano").cast("double") / F.lit(1e9), 6).alias(
                "adc_dist"
            ),
        )
    )
