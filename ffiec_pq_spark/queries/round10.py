"""Round-10 wave: production-parameter vector quantization.

- ``embedding_pq_codebook_k64`` — the k=64 PQ codebook train+encode
  rollup, exercising the Arrow-batched pandas-UDF assignment scorer
  (operators/pq.py::_make_assign_udf): the documented scale path for
  production codebooks (k=256, m=D/8), where the k·sub_dim-node
  literal assignment expression stops being viable.  Same Lloyd
  chain, same round(·, 9)/integer-nano float discipline as
  ``embedding_pq_codebook`` — only the assignment stage moves from a
  JVM literal expression to one vectorized numpy distance matrix per
  Arrow batch (codebook closure-captured; PySpark ships >1 MB pickled
  commands as broadcasts automatically).

Reference parity: the reference repo (iangow/ffiec.pq) has no vector
surface; this is the scale-extension ANN family's production
parameterization (VERDICT r9 "What's missing #1").

Float discipline (see round9c module docstring): distances round(·, 9)
in-engine before any cross-row reduction — the pandas path emulates
Spark's HALF_UP decimal rounding exactly (operators/pq.py::_np_round9)
so ties break identically on both engines; reductions are integer
nano-unit sums (order-independent).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.operators.pq import pq_codes, pq_fit
from ffiec_pq_spark.queries.round9c import _ITERS, _M, _SUB_DIM, _pq_ctes
from ffiec_pq_spark.session import load_table

# Production-shaped codebook size: k=64 codes per subspace (6 bits of
# the one-byte production code space) — past the _EXPR_MAX_FLOATS
# switch, so assignment runs on the pandas-UDF path; m/sub_dim/iters
# match the certified k=4 query so the two rollups differ ONLY in the
# assignment path and k.
_K64 = 64


def _pq_codebook_k64_sql() -> str:
    ctes = _pq_ctes(_M, _SUB_DIM, _K64, _ITERS)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT sub, c AS cell, count(*) AS n,
           round(CAST(sum(CAST(round(d * 1e9, 0) AS BIGINT)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) / 1e9, 6) AS mean_err
    FROM asg{_ITERS}
    GROUP BY 1, 2"""
    )


@register(
    "embedding_pq_codebook_k64",
    _pq_codebook_k64_sql(),
    tags=["similarity", "quantize", "iterative", "pandas-udf"],
)
def embedding_pq_codebook_k64(spark, sf_dir):
    """k=64 PQ codebook histogram + mean quantization error — the
    production-parameter assignment path (Arrow-batched numpy scorer).

    Scale shape: identical to embedding_pq_codebook except the
    assignment stage — one ArrowEvalPython map stage per Lloyd step
    (vectorized (rows × k) distance matrix per batch, no shuffle
    added), with the codebook shipped once per stage via the pickled
    command's automatic broadcast.  Still one groupBy(sub, cell) job
    per step, still a single m·k-group rollup, no join, no global
    sort.  Plan-pinned: tests/test_plans.py::
    test_pq_codebook_k64_single_arrow_stage."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_fit(emb, m=_M, sub_dim=_SUB_DIM, k=_K64, iters=_ITERS)
    codes = pq_codes(emb, books)
    nano = F.round(F.col("d") * F.lit(1e9), 0).cast("long")
    return (
        codes.select("sub", "cell", nano.alias("nano"))
        .groupBy("sub", "cell")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("nano").alias("nano"))
        .select(
            "sub",
            "cell",
            "n",
            F.round(
                F.col("nano").cast("double")
                / F.col("n").cast("double")
                / F.lit(1e9),
                6,
            ).alias("mean_err"),
        )
    )
