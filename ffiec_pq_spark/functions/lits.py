"""Fast literal-array construction (round 15, guide §1.2 step 2).

``F.array(*[F.lit(x) for x in vals])`` costs one py4j round trip per
element; a trained model embedded as plan literals (PQ codebooks,
k-means centroids, PCA components — thousands of doubles) made DRIVER
plan construction the dominant warm cost of the ANN family
(ann_ivfpq_residual_topk: 2.0 s build vs 0.4 s execution per rep).
Rendering the same values as ONE SQL array literal parsed by a single
``F.expr`` call produces the identical expression tree (``array()`` ->
CreateArray over double Literals, so plan canonicalization and cache
matching are unaffected) at ~1/250th the driver cost.

``repr(float)`` is the shortest exact decimal representation and both
Python and the JVM parse decimal doubles correctly rounded, so the
literal round-trips bit-for-bit.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fmt(v: float) -> str:
    v = float(v)
    if v != v or v in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite array literal: {v!r}")
    return repr(v) + "D"


def double_array_sql(vals: Iterable[float]) -> str:
    """The SQL rendering of a literal ``array<double>`` — for callers
    composing a whole expression as ONE ``F.expr`` string."""
    return "array(" + ",".join(_fmt(v) for v in vals) + ")"


def double_array2_sql(rows: Iterable[Sequence[float]]) -> str:
    """SQL rendering of a literal ``array<array<double>>``."""
    return (
        "array(" + ",".join(double_array_sql(r) for r in rows) + ")"
    )


def double_array3_sql(cubes) -> str:
    """SQL rendering of a literal ``array<array<array<double>>>``."""
    return (
        "array(" + ",".join(double_array2_sql(p) for p in cubes) + ")"
    )


def double_array(vals: Iterable[float]) -> Column:
    """Literal ``array<double>`` column from Python floats — one py4j
    call regardless of length."""
    vals = list(vals)
    if not vals:
        return F.lit([]).cast("array<double>")
    return F.expr(double_array_sql(vals))


def double_array3(cubes) -> Column:
    """Literal ``array<array<array<double>>>`` column (the full
    [sub][cell][j] PQ codebook) — one py4j call regardless of size."""
    cubes = [[list(r) for r in plane] for plane in cubes]
    if not cubes:
        return F.lit([]).cast("array<array<array<double>>>")
    return F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(
                "array(" + ",".join(_fmt(v) for v in r) + ")" for r in plane
            )
            + ")"
            for plane in cubes
        )
        + ")"
    )


def double_array2(rows: Iterable[Sequence[float]]) -> Column:
    """Literal ``array<array<double>>`` column (codebooks, centroid
    tables) — one py4j call regardless of size."""
    rows = [list(r) for r in rows]
    if not rows:
        return F.lit([]).cast("array<array<double>>")
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_fmt(v) for v in r) + ")" for r in rows
        )
        + ")"
    )
