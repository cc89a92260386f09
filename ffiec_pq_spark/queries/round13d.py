"""Round-13 fifth wave: embedding-dimension ablation, deterministic
shard assignment, and the fusion-weight tuning sweep.

- ``embedding_dim_ablation`` — Matryoshka-style truncation curve
  (Kusupati et al. 2022): recall@10 of cosine top-k computed on the
  first 8/16/32/64 embedding components against the full-dimension
  ground truth, for the shared probe vector.  The readout that decides
  how many dimensions the ANN index actually has to store.
- ``corpus_shard_assignment`` — deterministic hash-sharding of the
  corpus into training shards plus the balance audit (per-shard doc /
  token counts, source coverage, token-balance ratio vs the perfect
  split).  The write-side op every 100 TB training-data job runs
  before materializing shards.
- ``retrieval_rrf_weight_sweep`` — the weighted-RRF tuning ladder:
  lexical-arm weight 0/25/50/75/100 % in exact integer arithmetic,
  MRR under the strict relevance label per rung — how a fusion weight
  is actually picked.

The reference (iangow/ffiec.pq) has no embedding/retrieval surface;
these extend the mandated training-data-pipeline layer under the
established certification discipline (strict DuckDB value-hash
oracles; rank arithmetic in integer micros; rounded-before-rank
scores with id tiebreaks)."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.functions.lits import double_array
from ffiec_pq_spark.operators.similarity import dot, norm
from ffiec_pq_spark.session import load_table

# --------------------------------------------------------------------------
# embedding_dim_ablation

_ABL_DIMS = (8, 16, 32, 64)
_ABL_K = 10


def _abl_probe() -> list:
    from ffiec_pq_spark.queries.similarity import _PROBE

    return _PROBE


def _dim_ablation_sql() -> str:
    from ffiec_pq_spark.queries.similarity import _PROBE_SQL

    dims = ", ".join(str(d) for d in _ABL_DIMS)
    return f"""
    WITH ex AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) > 0
    ),
    qx AS (
      SELECT generate_subscripts(q, 1) AS i, unnest(q)::DOUBLE AS x
      FROM (SELECT {_PROBE_SQL} AS q)
    ),
    dims AS (SELECT unnest(CAST([{dims}] AS BIGINT[])) AS dim),
    scores AS (
      SELECT d.dim, e.vec_id,
             round(sum(e.x * q.x)
               / nullif(sqrt(sum(e.x * e.x)) * sqrt(sum(q.x * q.x)), 0.0),
               6) AS cos
      FROM dims d
      JOIN ex e ON e.i <= d.dim
      JOIN qx q ON q.i = e.i
      GROUP BY 1, 2
    ),
    full_top AS (
      SELECT vec_id FROM scores WHERE dim = {_ABL_DIMS[-1]}
      ORDER BY cos DESC, vec_id ASC LIMIT {_ABL_K}
    ),
    trunc_top AS (
      SELECT dim, vec_id FROM (
        SELECT dim, vec_id, row_number() OVER (
          PARTITION BY dim ORDER BY cos DESC, vec_id ASC
        ) AS rn FROM scores
      ) WHERE rn <= {_ABL_K}
    ),
    hits AS (
      SELECT t.dim, CAST(count(*) AS BIGINT) AS n_hit
      FROM trunc_top t JOIN full_top f USING (vec_id)
      GROUP BY 1
    )
    SELECT d.dim, CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           round(coalesce(h.n_hit, 0) / {float(_ABL_K)!r}, 6)
             AS recall_at_{_ABL_K}
    FROM dims d LEFT JOIN hits h ON h.dim = d.dim
    """


@register(
    "embedding_dim_ablation",
    _dim_ablation_sql(),
    tags=["similarity", "eval", "quantize"],
)
def embedding_dim_ablation(spark, sf_dir):
    """Matryoshka truncation curve: cosine top-10 for the shared probe
    computed on the first 8/16/32/64 components, scored as recall@10
    against the full-dimension exact top-10 — the ablation that
    decides how many dimensions the serving index stores (storing 16
    of 64 is a 4x index-size cut if the curve holds).

    Cross-engine exactness: cosines are rounded to 6 dp BEFORE the
    rank with vec_id tiebreaks; zero-norm prefixes score NULL on both
    engines (nulls sort last under DESC in both); recall is a count
    divided by a literal.

    Plan: ONE corpus scan computes all four truncated cosines in a
    single JVM projection (slice + fold, no per-dim re-scan), the
    4-way explode is a literal array, the slim (vec_id, dim, cos)
    relation is persisted, and every top-k — ground truth and the
    four arms — is a TakeOrderedAndProject over it (never a global
    sort, never a data-sized window; a PARTITION BY dim window would
    put the whole corpus in 4 reducers).  Ground truth joins back by
    a 10-row broadcast."""
    probe = _abl_probe()
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
    )
    entries = []
    for d in _ABL_DIMS:
        psl = probe[:d]
        qn = math.sqrt(sum(x * x for x in psl))
        sl = F.slice(F.col("embedding"), 1, d)
        plit = double_array(psl)
        cos = F.round(
            dot(sl, plit)
            / F.nullif(norm(sl) * F.lit(qn), F.lit(0.0)),
            6,
        )
        entries.append(
            F.struct(F.lit(d).cast("long").alias("dim"), cos.alias("cos"))
        )
    scores = (
        emb.select("vec_id", F.explode(F.array(*entries)).alias("s"))
        .select("vec_id", "s.dim", "s.cos")
        .persist()
    )
    full_top = (
        scores.filter(F.col("dim") == _ABL_DIMS[-1])
        .orderBy(F.desc_nulls_last("cos"), F.asc("vec_id"))
        .limit(_ABL_K)
        .select("vec_id")
    )
    arms = None
    for d in _ABL_DIMS:
        top_d = (
            scores.filter(F.col("dim") == d)
            .orderBy(F.desc_nulls_last("cos"), F.asc("vec_id"))
            .limit(_ABL_K)
            .select("dim", "vec_id")
        )
        arms = top_d if arms is None else arms.unionByName(top_d)
    hits = (
        arms.join(F.broadcast(full_top), "vec_id")
        .groupBy("dim")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    dims_lit = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(d).cast("long") for d in _ABL_DIMS])
        ).alias("dim")
    )
    return dims_lit.join(F.broadcast(hits), "dim", "left").select(
        "dim",
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        F.round(
            F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(float(_ABL_K)), 6
        ).alias(f"recall_at_{_ABL_K}"),
    )


# --------------------------------------------------------------------------
# corpus_shard_assignment

_N_SHARDS = 16
_SHARD_SEED = 13


def _shard_sql() -> str:
    from ffiec_pq_spark.functions.hashing import hash60_sql

    h = hash60_sql("doc_id", seed=_SHARD_SEED)
    tok = r"len(string_split_regex(trim(text), '\s+'))"
    return f"""
    WITH sharded AS (
      SELECT ({h} % {_N_SHARDS}) AS shard, source, {tok} AS n_tok
      FROM documents
    ),
    tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS n FROM sharded)
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           round(sum(n_tok) * {float(_N_SHARDS)!r} / tot.n, 6)
             AS balance_ratio
    FROM sharded CROSS JOIN tot
    GROUP BY shard, tot.n
    """


@register(
    "corpus_shard_assignment",
    _shard_sql(),
    tags=["corpus", "curation"],
)
def corpus_shard_assignment(spark, sf_dir):
    """Deterministic hash-sharding of the corpus into 16 training
    shards (portable 60-bit hash of doc_id, so the assignment is
    reproducible across engines and reruns) plus the balance audit a
    write job gates on: per-shard doc and token counts, how many
    sources each shard still covers, and the token-balance ratio
    against the perfect 1/16 split (a ratio far from 1.0 means a
    shard that finishes late and stalls the training epoch).

    Plan: one scan computes the shard id and token count JVM-side
    (hash + split, no explode), the rollup is a 16-group aggregate
    with map-side partials, and the corpus total is a 1-row broadcast
    cross join.  At 100 TB the same shard expression IS the
    ``repartition(shard)`` key for the materializing write, so the
    audit and the write share one plan."""
    from ffiec_pq_spark.functions.hashing import hash60
    from ffiec_pq_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    sharded = docs.select(
        (hash60("doc_id", seed=_SHARD_SEED) % _N_SHARDS).alias("shard"),
        "source",
        token_count("text").alias("n_tok"),
    )
    tot = sharded.agg(F.sum("n_tok").cast("long").alias("n"))
    return (
        sharded.crossJoin(F.broadcast(tot))
        .groupBy("shard", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.round(
                F.sum("n_tok") * F.lit(float(_N_SHARDS)) / F.col("n"), 6
            ).alias("balance_ratio"),
        )
        .select(
            "shard", "n_docs", "n_tokens", "n_sources", "balance_ratio"
        )
    )


# --------------------------------------------------------------------------
# retrieval_rrf_weight_sweep

_W_PCTS = (0, 25, 50, 75, 100)


def _weight_sweep_sql() -> str:
    from ffiec_pq_spark.queries.round13c import (
        _FUSE_TOPK,
        _NDCG_BUCKET,
        _RRF_K,
        _dense_ctes,
    )
    from ffiec_pq_spark.queries.round12 import _BM25_TOPK_SQL

    pcts = ", ".join(str(p) for p in _W_PCTS)
    return f"""
    WITH lex AS (
      {_BM25_TOPK_SQL}
    ),
    {_dense_ctes()},
    fused AS (
      SELECT coalesce(l.q_id, d.q_id) AS q_id,
             coalesce(l.doc_id, d.doc_id) AS doc_id,
             l.rank AS l_rank, d.d_rank AS d_rank
      FROM lex l
      FULL JOIN densek d ON d.q_id = l.q_id AND d.doc_id = l.doc_id
    ),
    wt AS (SELECT unnest(CAST([{pcts}] AS BIGINT[])) AS w_pct),
    wscored AS (
      SELECT w.w_pct, f.q_id, f.doc_id,
             CAST(w.w_pct * coalesce(1000000 // ({_RRF_K} + f.l_rank), 0)
                + (100 - w.w_pct)
                  * coalesce(1000000 // ({_RRF_K} + f.d_rank), 0)
               AS BIGINT) AS wrrf
      FROM fused f CROSS JOIN wt w
    ),
    wtop AS (
      SELECT w_pct, q_id, doc_id, rank FROM (
        SELECT w_pct, q_id, doc_id,
               CAST(row_number() OVER (
                 PARTITION BY w_pct, q_id
                 ORDER BY wrrf DESC, doc_id ASC
               ) AS BIGINT) AS rank
        FROM wscored WHERE wrrf > 0
      ) WHERE rank <= {_FUSE_TOPK}
    ),
    qdim AS (
      SELECT doc_id AS q_id, lang AS q_lang,
             n_chars // {_NDCG_BUCKET} AS q_bucket
      FROM documents WHERE doc_id % 10 = 0
    ),
    cdim AS (
      SELECT doc_id, lang AS c_lang, n_chars // {_NDCG_BUCKET} AS c_bucket
      FROM documents WHERE doc_id % 10 <> 0
    ),
    firstrel AS (
      SELECT t.w_pct, t.q_id,
             min(CASE WHEN q.q_lang = c.c_lang
                       AND q.q_bucket = c.c_bucket THEN t.rank END)
               AS first_rel
      FROM wtop t
      JOIN qdim q ON q.q_id = t.q_id
      JOIN cdim c ON c.doc_id = t.doc_id
      GROUP BY t.w_pct, t.q_id
    )
    SELECT w.w_pct,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN fr.first_rel IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           CAST(coalesce(sum(1000000 // fr.first_rel), 0) AS BIGINT)
             AS sum_rr_micro
    FROM qdim q CROSS JOIN wt w
    LEFT JOIN firstrel fr ON fr.w_pct = w.w_pct AND fr.q_id = q.q_id
    GROUP BY w.w_pct
    """


@register(
    "retrieval_rrf_weight_sweep",
    _weight_sweep_sql(),
    tags=["retrieval", "eval"],
)
def retrieval_rrf_weight_sweep(spark, sf_dir):
    """The fusion-weight tuning ladder: weighted RRF with the lexical
    arm at 0/25/50/75/100 % (dense gets the complement), scored as
    MRR@3 under the strict relevance label per rung — 0 and 100 are
    the pure arms, the interior rungs show whether a tilt beats the
    symmetric fusion.  All arithmetic stays exact: per-list RRF mass
    in integer micros times an integer percentage, rank ties by
    doc_id; docs absent from both lists (weighted mass 0) never enter
    a list.

    Plan: ONE fused relation (the pinned full-outer merge of the two
    ≤ k·|queries| lists) crossed with a 5-row literal weight
    relation; every rank window keys on (w_pct, q_id); the label join
    and rollup reuse the fusion-gain shapes (two slim dim
    projections, ≤ 5 groups, map-side partials)."""
    from ffiec_pq_spark.queries.round12 import _bm25_topk_frame
    from ffiec_pq_spark.queries.round13c import (
        _FUSE_TOPK,
        _NDCG_BUCKET,
        _RRF_K,
        _dense_topk_frame,
    )

    lex = _bm25_topk_frame(spark, sf_dir).select(
        "q_id", "doc_id", F.col("rank").alias("l_rank")
    )
    dense = _dense_topk_frame(spark, sf_dir)
    fused = lex.join(dense, ["q_id", "doc_id"], "full_outer")
    wt = F.explode(
        F.array(*[F.lit(p).cast("long") for p in _W_PCTS])
    ).alias("w_pct")
    lmass = F.coalesce(
        F.expr(f"1000000 div ({_RRF_K} + l_rank)"), F.lit(0)
    )
    dmass = F.coalesce(
        F.expr(f"1000000 div ({_RRF_K} + d_rank)"), F.lit(0)
    )
    wscored = fused.select("q_id", "doc_id", "l_rank", "d_rank", wt).select(
        "w_pct",
        "q_id",
        "doc_id",
        (F.col("w_pct") * lmass + (F.lit(100) - F.col("w_pct")) * dmass)
        .cast("long")
        .alias("wrrf"),
    )
    w = Window.partitionBy("w_pct", "q_id").orderBy(
        F.desc("wrrf"), F.asc("doc_id")
    )
    wtop = (
        wscored.filter(F.col("wrrf") > 0)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _FUSE_TOPK)
    )
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(f"n_chars div {_NDCG_BUCKET}")
    qdim = d.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.col("lang").alias("q_lang"),
        bucket.alias("q_bucket"),
    )
    cdim = d.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.col("lang").alias("c_lang"),
        bucket.alias("c_bucket"),
    )
    rel = (F.col("q_lang") == F.col("c_lang")) & (
        F.col("q_bucket") == F.col("c_bucket")
    )
    firstrel = (
        wtop.join(qdim, "q_id")
        .join(cdim, "doc_id")
        .groupBy("w_pct", "q_id")
        .agg(F.min(F.when(rel, F.col("rank"))).alias("first_rel"))
    )
    base = qdim.select("q_id").select(
        "q_id",
        F.explode(
            F.array(*[F.lit(p).cast("long") for p in _W_PCTS])
        ).alias("w_pct"),
    )
    return (
        base.join(firstrel, ["w_pct", "q_id"], "left")
        .groupBy("w_pct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum(
                F.when(F.col("first_rel").isNotNull(), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).cast("long").alias("n_hits"),
            F.coalesce(F.sum(F.expr("1000000 div first_rel")), F.lit(0))
            .cast("long")
            .alias("sum_rr_micro"),
        )
    )
