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
the plan shapes are identical — only the literal codebook grows, and
past ~64k floats you switch the assignment expression to a pandas UDF
over a broadcast numpy array (same loop, same aggregation), as noted
in operators/kmeans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    """The full [sub][cell][j] codebook as one nested array literal."""
    return F.array(
        *[
            F.array(
                *[F.array(*[F.lit(float(x)) for x in cent]) for cent in sub_cents]
            )
            for sub_cents in codebooks
        ]
    )


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
) -> list[list[list[float]]]:
    """Fit the m per-subspace codebooks with ``iters`` Lloyd steps.

    One job per step: all m subspaces assign and reduce together in a
    single groupBy(sub, cell) with per-dimension sums — m·k rows of
    sub_dim floats reach the driver; empty cells keep their previous
    centroid (matching the kmeans convention and the SQL oracle)."""
    sv = pq_subvectors(df, vec_col, id_col, m, sub_dim)
    books = pq_init(df, vec_col, id_col, m, sub_dim, k)
    for _ in range(iters):
        assigned = sv.select(
            "sub", _assign_expr(books)["cell"].alias("cell"), "v"
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
) -> DataFrame:
    """(id, sub, cell, d): each vector's m PQ codes under the fitted
    codebooks, with the round(·, 9) squared reconstruction distance of
    the chosen centroid.  Pure projection — no shuffle."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    sv = pq_subvectors(df, vec_col, id_col, m, sub_dim)
    a = _assign_expr(codebooks)
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
                    F.array(*[F.lit(float(x)) for x in probe]),
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

    cc = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in coarse]
    )
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
    resid: DataFrame, codebooks: list[list[list[float]]]
) -> DataFrame:
    """(id, ccell, sub, cell): PQ codes of the residual vectors, the
    coarse cell carried through (it keys the probed-cell filter and, at
    scale, the partition layout).  Pure projection — no shuffle."""
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
    a = _assign_expr(codebooks)
    return sv.select("id", "ccell", "sub", a["cell"].alias("cell"))


def ivfpq_probed_cells(
    spark, coarse: list[list[float]], probe: list[float], nprobe: int
) -> list[int]:
    """The nprobe coarse cells nearest the probe (ties -> lowest cell),
    evaluated as a SPARK expression over literals so the round(·, 9)
    discipline matches the engine's (and the oracle's) — never Python
    float rounding, whose half-to-even differs from both engines."""
    q = F.array(*[F.lit(float(x)) for x in probe])
    entries = [
        F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(
                        q,
                        F.array(*[F.lit(float(v)) for v in c]),
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
        .select(F.slice(F.array_sort(F.array(*entries)), 1, nprobe).alias("p"))
        .collect()[0]
    )
    return sorted(s["c"] for s in row["p"])


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
    against the PROBE's residual in that cell (round(·, 9) per element,
    exactly like the doc residuals), reduce per-id as integer nano
    sums, TakeOrderedAndProject the top-k."""
    cc = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in coarse])
    cb = _codebook_lit(codebooks)
    sub_dim = len(codebooks[0][0])
    q = F.array(*[F.lit(float(x)) for x in probe])
    q_res = F.transform(
        F.zip_with(q, F.element_at(cc, F.col("ccell") + 1), lambda x, c: x - c),
        lambda r: F.round(r, 9),
    )
    qr_sub = F.slice(q_res, F.col("sub") * sub_dim + 1, sub_dim)
    d_q = F.round(
        F.aggregate(
            F.zip_with(
                qr_sub,
                F.element_at(
                    F.element_at(cb, F.col("sub") + 1), F.col("cell") + 1
                ),
                lambda x, cv: (x - cv) * (x - cv),
            ),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
        9,
    )
    nano = F.round(d_q * F.lit(1e9), 0).cast("long")
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
