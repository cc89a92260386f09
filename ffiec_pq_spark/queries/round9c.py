"""Round-9 third wave: the product-quantization (PQ) vector-compression
family (operators/pq.py) — the scale path that lets a 100 TB corpus's
embeddings live in memory as m one-byte codes per vector.

- ``embedding_pq_codebook`` — train m per-subspace codebooks with
  deterministic Lloyd steps and report the code histogram + mean
  quantization error per (subspace, code): the artifact that tells an
  index team whether the codebook is balanced (no dead codes, no
  one-code-swallows-all collapse) before a 100 TB encode job is paid.
- ``ann_pq_adc_topk`` — asymmetric-distance (ADC) top-k search against
  the PQ codes: the probe is compared to CENTROIDS only (m·k lookup
  entries), never to raw vectors, so query cost is independent of dim
  and the scan reads m bytes per vector.

Both are strict-oracle certified: the DuckDB SQL replays the identical
deterministic Lloyd chain per subspace (same lowest-id init, same
round(·, 9) distance discipline, same empty-cell carry-forward), then
the same integer nano-unit distance sums, so results match
bit-for-bit.  Float discipline notes: distances are rounded to 9 dp
IN-ENGINE before any cross-row reduction, reductions over distances
are integer sums (order-independent), and every derived double is
rounded identically on both sides after aggregation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.operators.pq import pq_adc_topk, pq_codes, pq_fit
from ffiec_pq_spark.queries.similarity import _DIM, _PROBE
from ffiec_pq_spark.session import load_table

# PQ geometry for the certified queries: 64-dim embeddings split into
# m=4 subspaces of 16 dims, k=4 codes per subspace, 3 Lloyd steps —
# tiny but shape-identical to a production m=D/8, k=256 setup (see
# operators/pq.py docstring for the literal-size switchover note).
_M = 4
_SUB_DIM = _DIM // _M
_K = 4
_ITERS = 3


def _pq_ctes(m: int, sub_dim: int, k: int, iters: int) -> list[str]:
    """The per-subspace deterministic Lloyd loop as a literal CTE chain
    (the PQ generalization of queries/similarity._kmeans_ctes — the
    subspace id joins every relation's key).  ``asg{iters}`` is the
    final (vec_id, sub) -> code assignment with its round(·, 9)
    squared distance."""
    ctes = [
        """ex AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings
    )""",
        f"""sx AS (
      SELECT vec_id, CAST((i - 1) // {sub_dim} AS INTEGER) AS sub,
             (i - 1) % {sub_dim} AS j, x
      FROM ex
    )""",
        f"""cent0 AS (
      SELECT sub,
             CAST(dense_rank() OVER (PARTITION BY sub ORDER BY vec_id) - 1
                  AS INTEGER) AS c,
             j, x AS v
      FROM sx
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
    )""",
    ]
    for it in range(iters + 1):
        ctes.append(
            f"""d{it} AS (
      SELECT s.vec_id, s.sub, c.c,
             round(sum((s.x - c.v) * (s.x - c.v)), 9) AS d
      FROM sx s JOIN cent{it} c ON c.sub = s.sub AND c.j = s.j
      GROUP BY 1, 2, 3
    )"""
        )
        ctes.append(
            f"""asg{it} AS (
      SELECT vec_id, sub, c, d FROM (
        SELECT vec_id, sub, c, d,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d ASC, c ASC) AS rn
        FROM d{it}
      ) WHERE rn = 1
    )"""
        )
        if it < iters:
            ctes.append(
                f"""upd{it} AS (
      SELECT a.sub, a.c, s.j, avg(s.x) AS v
      FROM asg{it} a JOIN sx s ON s.vec_id = a.vec_id AND s.sub = a.sub
      GROUP BY 1, 2, 3
    )"""
            )
            ctes.append(
                f"""cent{it + 1} AS (
      SELECT p.sub, p.c, p.j, coalesce(u.v, p.v) AS v
      FROM cent{it} p
      LEFT JOIN upd{it} u ON u.sub = p.sub AND u.c = p.c AND u.j = p.j
    )"""
            )
    return ctes


def _pq_codebook_sql() -> str:
    ctes = _pq_ctes(_M, _SUB_DIM, _K, _ITERS)
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
    "embedding_pq_codebook",
    _pq_codebook_sql(),
    tags=["similarity", "quantize", "iterative"],
)
def embedding_pq_codebook(spark, sf_dir):
    """Train the PQ codebooks (operators/pq.py) and report, per
    (subspace, code): member count and mean round(·, 9) quantization
    error (integer nano-unit sum, so the mean is order-independent).

    Scale shape: training is one groupBy(sub, cell) job per Lloyd step
    with per-dimension map-side-combined sums (m·k·sub_dim floats to
    the driver per step); encoding is a pure column expression against
    the broadcast codebook literal; this rollup is one m·k-group
    aggregation.  No global sort, no cartesian, no per-row Python."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_fit(emb, m=_M, sub_dim=_SUB_DIM, k=_K, iters=_ITERS)
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


def _pq_adc_sql(top_k: int = 10) -> str:
    ctes = _pq_ctes(_M, _SUB_DIM, _K, _ITERS)
    probe_lit = "[" + ", ".join(repr(float(x)) for x in _PROBE) + "]::DOUBLE[]"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    qx AS (
      SELECT generate_subscripts(q, 1) AS i, unnest(q)::DOUBLE AS x
      FROM (SELECT {probe_lit} AS q)
    ),
    qsub AS (
      SELECT CAST((i - 1) // {_SUB_DIM} AS INTEGER) AS sub,
             (i - 1) % {_SUB_DIM} AS j, x
      FROM qx
    ),
    lut AS (
      SELECT c.sub, c.c, round(sum((q.x - c.v) * (q.x - c.v)), 9) AS d
      FROM cent{_ITERS} c JOIN qsub q ON q.sub = c.sub AND q.j = c.j
      GROUP BY 1, 2
    ),
    adc AS (
      SELECT a.vec_id, sum(CAST(round(l.d * 1e9, 0) AS BIGINT)) AS nano
      FROM asg{_ITERS} a JOIN lut l ON l.sub = a.sub AND l.c = a.c
      GROUP BY 1
    )
    SELECT vec_id AS id, round(CAST(nano AS DOUBLE) / 1e9, 6) AS adc_dist
    FROM adc
    ORDER BY nano ASC, vec_id ASC
    LIMIT {top_k}"""
    )


@register(
    "ann_pq_adc_topk",
    _pq_adc_sql(),
    tags=["similarity", "quantize"],
)
def ann_pq_adc_topk(spark, sf_dir):
    """PQ asymmetric-distance top-10 for the shared probe vector
    (queries/similarity._PROBE): approximate squared distance =
    Σ_sub d(probe_sub, centroid of the vector's code).

    The 100 TB query path of an IVF-PQ index: the probe touches
    centroids only (m·k lookup entries), the scan reads m CODES per
    vector (not dim floats), the per-id reduction is an
    order-independent integer sum, and the top-k is a
    TakeOrderedAndProject — never a global sort."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_fit(emb, m=_M, sub_dim=_SUB_DIM, k=_K, iters=_ITERS)
    codes = pq_codes(emb, books)
    return pq_adc_topk(codes, books, _PROBE, top_k=10)


def _pq_recall_sql(top_k: int = 10) -> str:
    ctes = _pq_ctes(_M, _SUB_DIM, _K, _ITERS)
    probe_lit = "[" + ", ".join(repr(float(x)) for x in _PROBE) + "]::DOUBLE[]"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    qx AS (
      SELECT generate_subscripts(q, 1) AS i, unnest(q)::DOUBLE AS x
      FROM (SELECT {probe_lit} AS q)
    ),
    qsub AS (
      SELECT CAST((i - 1) // {_SUB_DIM} AS INTEGER) AS sub,
             (i - 1) % {_SUB_DIM} AS j, x
      FROM qx
    ),
    lut AS (
      SELECT c.sub, c.c, round(sum((q.x - c.v) * (q.x - c.v)), 9) AS d
      FROM cent{_ITERS} c JOIN qsub q ON q.sub = c.sub AND q.j = c.j
      GROUP BY 1, 2
    ),
    adc_top AS (
      SELECT a.vec_id
      FROM asg{_ITERS} a JOIN lut l ON l.sub = a.sub AND l.c = a.c
      GROUP BY a.vec_id
      ORDER BY sum(CAST(round(l.d * 1e9, 0) AS BIGINT)) ASC, a.vec_id ASC
      LIMIT {top_k}
    ),
    exact_d AS (
      SELECT e.vec_id, round(sum((e.x - q.x) * (e.x - q.x)), 9) AS d
      FROM ex e JOIN qx q ON q.i = e.i
      GROUP BY 1
    ),
    exact_top AS (
      SELECT vec_id FROM exact_d
      ORDER BY CAST(round(d * 1e9, 0) AS BIGINT) ASC, vec_id ASC
      LIMIT {top_k}
    )
    SELECT {top_k} AS k, count(*) AS n_hit,
           round(CAST(count(*) AS DOUBLE) / {float(top_k)!r}, 6) AS recall
    FROM adc_top JOIN exact_top USING (vec_id)"""
    )


@register(
    "ann_pq_recall_at_k",
    _pq_recall_sql(),
    tags=["similarity", "quantize", "evaluation"],
)
def ann_pq_recall_at_k(spark, sf_dir):
    """Recall@10 of the PQ/ADC index against brute-force ground truth
    for the shared probe — the acceptance metric an index team gates a
    100 TB encode job on (is m=4/k=4 compression keeping enough of the
    true neighborhood?).

    Scale shape: the ground-truth side is the brute-force
    TakeOrderedAndProject scan (the thing you CAN afford once per probe
    panel, to validate); the ADC side reads codes only; both top-k
    relations are k rows, so the overlap join is a broadcast of k ids.
    Distances reduce as integer nano sums — no cross-engine ulp."""
    from ffiec_pq_spark.operators.pq import pq_adc_topk, pq_codes, pq_fit

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_fit(emb, m=_M, sub_dim=_SUB_DIM, k=_K, iters=_ITERS)
    codes = pq_codes(emb, books)
    top_k = 10
    approx = pq_adc_topk(codes, books, _PROBE, top_k=top_k).select("id")

    q_arr = F.array(*[F.lit(float(x)) for x in _PROBE])
    d_exact = F.round(
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                q_arr,
                lambda x, qv: (x - qv) * (x - qv),
            ),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
        9,
    )
    nano = F.round(d_exact * F.lit(1e9), 0).cast("long")
    exact = (
        emb.select(F.col("vec_id").alias("id"), nano.alias("nano"))
        .orderBy(F.col("nano").asc(), F.col("id").asc())
        .limit(top_k)
        .select("id")
    )
    hit = approx.join(F.broadcast(exact), "id")
    return hit.agg(F.count(F.lit(1)).alias("n_hit")).select(
        F.lit(top_k).alias("k"),
        F.col("n_hit"),
        F.round(
            F.col("n_hit").cast("double") / F.lit(float(top_k)), 6
        ).alias("recall"),
    )
