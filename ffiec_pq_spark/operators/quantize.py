"""Embedding quantization: per-vector symmetric int8 scalar
quantization (the storage/serving compression step of an embedding
pipeline — 4x smaller than float32, distance-preserving to ~1/127).

Everything is a pure array expression (``transform`` / ``aggregate``
over the embedding column) — no UDF, no explode, no shuffle; at 100 TB
this runs entirely inside whole-stage codegen as a map-only stage.

Determinism contract (what lets the oracle hash-match): the code for
element ``x`` is ``floor(x * scale)`` clamped to [-127, 127] with
``scale = 127 / max_abs`` — floor of an IEEE double product is
bit-deterministic across engines, unlike round() whose half-way rule
differs (Spark HALF_UP vs banker's variants elsewhere).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ffiec_pq_spark.functions.lits import double_array

# guard for the all-zero vector: scale stays finite, codes all 0
_EPS = 1e-30


def quantize_scale(vec: Column) -> Column:
    """Per-vector symmetric scale ``127 / max_abs`` (eps-guarded)."""
    max_abs = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    return F.lit(127.0) / F.greatest(max_abs, F.lit(_EPS))


_scale = quantize_scale


def quantize_codes_int8(vec: Column) -> Column:
    """``array<bigint>`` of int8-range codes for an ``array<float>``."""
    s = _scale(vec)
    return F.transform(
        vec,
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.floor(x.cast("double") * s))
        ),
    )


def reconstruction_err(vec: Column) -> Column:
    """Max absolute elementwise error of dequantized codes,
    ``max_i |x_i - code_i / scale|`` — bounded by 1/scale (one code
    step) by construction; the oracle pins that bound as a boolean."""
    s = _scale(vec)
    codes = quantize_codes_int8(vec)
    errs = F.zip_with(
        vec, codes, lambda x, c: F.abs(x.cast("double") - c / s)
    )
    return F.array_max(errs)


def quantize_int8_sql(vec_expr: str) -> dict[str, str]:
    """DuckDB mirrors keyed by concept: scale, codes, max error.
    Same eps guard, same floor-clamp, same double arithmetic."""
    max_abs = f"list_max(list_transform({vec_expr}, x -> abs(CAST(x AS DOUBLE))))"
    scale = f"(127.0 / greatest({max_abs}, {_EPS}))"
    codes = (
        f"list_transform({vec_expr}, x -> greatest(-127, least(127, "
        f"CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))))"
    )
    err = (
        f"list_max(list_transform(generate_series(1, len({vec_expr})), "
        f"i -> abs(CAST({vec_expr}[i] AS DOUBLE) - ({codes})[i] / {scale})))"
    )
    return {"scale": scale, "codes": codes, "max_err": err}


def linear_score(vec: Column, weights: list[float], bias: float) -> Column:
    """Model-inference-as-a-column: the dot product of an embedding
    against a fixed weight vector plus bias — the quality-classifier /
    reward-model scoring stage of a curation pipeline, expressed as a
    broadcast-free JVM fold (the weights ride inside the plan as a
    literal array; at 100 TB this is a map-only stage in whole-stage
    codegen, no Python, no shuffle).

    Determinism contract: ``F.aggregate`` folds left-to-right in array
    order, matching a sequential SQL sum over the index — same IEEE
    operation order, bit-identical doubles on both engines (unlike a
    parallel/tree reduction)."""
    w = double_array(weights)
    prods = F.zip_with(vec, w, lambda x, y: x.cast("double") * y)
    return (
        F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p) + F.lit(float(bias))
    )


def linear_score_sql(vec_expr: str, weights: list[float], bias: float) -> str:
    """DuckDB mirror: list_reduce over the same literal weights, same
    left-to-right order, same double arithmetic."""
    lits = ", ".join(repr(float(x)) for x in weights)
    return (
        f"(list_reduce(list_prepend(0.0, list_transform("
        f"list_zip({vec_expr}, [{lits}]), "
        f"p -> CAST(p[1] AS DOUBLE) * p[2])), (a, b) -> a + b) "
        f"+ {float(bias)!r})"
    )
