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
