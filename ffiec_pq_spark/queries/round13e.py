"""Round-13 sixth wave: the source scorecard, the cross-shard
duplicate audit, and the epoch token-budget planner.

- ``source_quality_scorecard`` — per-source rollup of the three
  certified quality scores (heuristic, trained-probe margin,
  modified-KN trigram log-prob) plus doc/token mass: the one-page
  scorecard a data lead reads before setting per-source treatment.
- ``dedup_cross_shard_rate`` — how the certified MinHash near-dup
  pairs straddle the deterministic training shards
  (``corpus_shard_assignment``'s hash): the within- vs cross-shard
  pair split.  The number that says how much a shard-LOCAL dedup
  pass under-deletes — the reason dedup must run before (or across)
  sharding at 100 TB.
- ``epoch_token_budget`` — the sampling plan: temperature-smoothed
  source weights (alpha 0.3, the ``corpus_sampling_temperature``
  convention) allocated against a fixed multi-epoch token budget,
  with per-source repeat factors and the >4-repeats exhaustion flag
  (the data-constrained-scaling rule of thumb for when repeating
  unique tokens stops helping).

All three reuse already-certified building blocks (scores, shard
hash, temperature weights) so their cross-engine exactness rests on
pinned contracts; new arithmetic is integer or rounds once at the
end."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.session import load_table

# --------------------------------------------------------------------------
# source_quality_scorecard


def _scorecard_sql() -> str:
    from ffiec_pq_spark.operators.text import quality_score_sql
    from ffiec_pq_spark.queries.round12b import _probe_ctes
    from ffiec_pq_spark.queries.round13 import _KN3_SQL

    tok = r"len(string_split_regex(trim(text), '\s+'))"
    ctes, last = _probe_ctes()
    ctes.append(
        f"""pmarg AS (
      SELECT ex.vec_id, CAST(sum(ex.xq * w.v) AS BIGINT) AS margin_micro
      FROM ex JOIN {last} w USING (i)
      GROUP BY ex.vec_id
    )"""
    )
    ctes.append(f"knd AS ({_KN3_SQL})")
    ctes.append(
        f"""base AS (
      SELECT d.source, {tok} AS n_tok,
             {quality_score_sql()} AS quality,
             p.margin_micro, k.avg_kn3_logprob
      FROM documents d
      LEFT JOIN pmarg p ON p.vec_id = d.doc_id
      LEFT JOIN knd k ON k.doc_id = d.doc_id
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           round(sum(CAST(round(quality * 1000000, 0) AS BIGINT))
                 / (count(*) * 1000000.0), 6) AS mean_quality,
           CAST(count(margin_micro) AS BIGINT) AS n_probe,
           CASE WHEN count(margin_micro) = 0 THEN NULL
                ELSE round(sum(margin_micro)
                           / CAST(count(margin_micro) AS DOUBLE), 6)
           END AS mean_margin_micro,
           CAST(count(avg_kn3_logprob) AS BIGINT) AS n_kn,
           CASE WHEN count(avg_kn3_logprob) = 0 THEN NULL
                ELSE round(sum(CAST(round(avg_kn3_logprob * 1000000, 0)
                                    AS BIGINT))
                           / (count(avg_kn3_logprob) * 1000000.0), 6)
           END AS mean_kn_logprob
    FROM base
    GROUP BY source
    """
    )


@register(
    "source_quality_scorecard",
    _scorecard_sql(),
    tags=["quality", "curation", "corpus"],
)
def source_quality_scorecard(spark, sf_dir):
    """Per-source scorecard: document and token mass plus the mean of
    each certified quality score — the heuristic composite (all
    docs), the trained probe's exact integer margin (docs with a
    non-empty embedding), and the modified-KN trigram log-prob (docs
    with ≥ 3 tokens) — with per-scorer coverage counts so a source
    whose docs systematically miss a scorer is visible.  This is the
    one-page readout a data lead reads before deciding per-source
    keep rates, upsampling, or exclusion.

    Cross-engine exactness: each per-doc score is already pinned
    (6 dp heuristic, integer margin, 6 dp KN log-prob); each mean is
    accumulated as an exact INT64 micro sum (the ``round13f``
    sufficient-statistics pattern — the pinned per-doc double maps to
    one integer, summation order cannot drift) and divided ONCE by the
    integer count, so the only double op per cell is that final
    division of two exactly-representable integers; coverage counts
    are integers.

    Plan: the three scoring passes are the certified ones (one scan +
    keyed aggregates each); the scorecard itself is two LEFT hash
    joins on doc_id and ONE |sources|-group aggregate with map-side
    partials — nothing new grows with the corpus."""
    from ffiec_pq_spark.operators.linear_probe import probe_margins
    from ffiec_pq_spark.operators.text import (
        quality_score_tok,
        token_count,
        tokens,
    )
    from ffiec_pq_spark.queries.round12b import probe_corpus, probe_weights
    from ffiec_pq_spark.queries.round13 import doc_kn_trigram

    docs = load_table(spark, sf_dir, "documents")
    y = (F.coalesce(F.col("label"), F.lit(0)) == 0).cast("long")
    pm = probe_margins(
        probe_corpus(spark, sf_dir).withColumn("_yy", y),
        "embedding", "vec_id", "_yy",
        probe_weights(spark, sf_dir),
    ).select(F.col("vec_id").alias("doc_id"), "margin_micro")
    kn = doc_kn_trigram(spark, sf_dir).select("doc_id", "avg_kn3_logprob")
    base = (
        docs.select(
            "doc_id",
            "source",
            token_count("text").alias("n_tok"),
            F.round(
                quality_score_tok(tokens("text"), "text") * F.lit(1e6), 0
            )
            .cast("long")
            .alias("q_micro"),
        )
        .join(pm, "doc_id", "left")
        .join(
            kn.select(
                "doc_id",
                F.round(F.col("avg_kn3_logprob") * F.lit(1e6), 0)
                .cast("long")
                .alias("kn_micro"),
            ),
            "doc_id",
            "left",
        )
    )
    n_probe = F.count("margin_micro")
    n_kn = F.count("kn_micro")
    return base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.round(
            F.sum("q_micro") / (F.count(F.lit(1)) * F.lit(1000000.0)), 6
        ).alias("mean_quality"),
        n_probe.cast("long").alias("n_probe"),
        F.when(n_probe == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.sum("margin_micro") / n_probe.cast("double"), 6)
        )
        .alias("mean_margin_micro"),
        n_kn.cast("long").alias("n_kn"),
        F.when(n_kn == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.sum("kn_micro") / (n_kn * F.lit(1000000.0)), 6))
        .alias("mean_kn_logprob"),
    )


# --------------------------------------------------------------------------
# dedup_cross_shard_rate


def _cross_shard_sql() -> str:
    from ffiec_pq_spark.functions.hashing import hash60_sql
    from ffiec_pq_spark.queries.dedup import _minhash_oracle
    from ffiec_pq_spark.queries.round13d import _N_SHARDS, _SHARD_SEED

    h = hash60_sql("doc_id", seed=_SHARD_SEED)
    return f"""
    WITH pairs AS (
      {_minhash_oracle()}
    ),
    shards AS (
      SELECT doc_id AS id, ({h} % {_N_SHARDS}) AS shard FROM documents
    )
    SELECT CASE WHEN sa.shard = sb.shard THEN 'within' ELSE 'cross' END
             AS locality,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(p.jaccard), 6) AS avg_jaccard
    FROM pairs p
    JOIN shards sa ON sa.id = p.id_a
    JOIN shards sb ON sb.id = p.id_b
    GROUP BY 1
    """


@register(
    "dedup_cross_shard_rate",
    _cross_shard_sql(),
    tags=["dedup", "corpus"],
)
def dedup_cross_shard_rate(spark, sf_dir):
    """How the certified MinHash near-dup pairs
    (``dedup_minhash_lsh``'s exact contract: 32 perms, 8x4 banding,
    exact-Jaccard verification at 0.2) fall against the deterministic
    training shards of ``corpus_shard_assignment``: pairs whose two
    docs share a shard (a shard-LOCAL dedup pass would catch them)
    vs pairs that straddle shards (it would NOT).  With a 1/16
    uniform hash, ~15/16 of pairs land cross-shard — this query
    measures the actual split, the quantified argument that dedup
    must run globally before sharding at 100 TB.

    Cross-engine exactness: the pair relation is the already-pinned
    minhash contract; shard ids are the portable hash; the rollup is
    integer counts plus one end-rounded mean.

    Plan: the pair pass is the pinned LSH shape (band equi-join on
    representatives, never all-pairs); the locality join hits a slim
    (id, shard) projection twice by hash join; the rollup is a
    2-group aggregate with map-side partials."""
    from ffiec_pq_spark.functions.hashing import hash60
    from ffiec_pq_spark.operators.dedup import minhash_near_dups
    from ffiec_pq_spark.queries.dedup import (
        _K,
        _N_BANDS,
        _N_PERM,
        _THRESHOLD,
    )
    from ffiec_pq_spark.queries.round13d import _N_SHARDS, _SHARD_SEED

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dups(
        docs, k=_K, n_perm=_N_PERM, n_bands=_N_BANDS, threshold=_THRESHOLD
    )
    shards = docs.select(
        F.col("doc_id").alias("id"),
        (hash60("doc_id", seed=_SHARD_SEED) % _N_SHARDS).alias("shard"),
    )
    sa = shards.select(
        F.col("id").alias("id_a"), F.col("shard").alias("shard_a")
    )
    sb = shards.select(
        F.col("id").alias("id_b"), F.col("shard").alias("shard_b")
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.when(F.col("shard_a") == F.col("shard_b"), F.lit("within"))
            .otherwise(F.lit("cross"))
            .alias("locality")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
        )
    )


# --------------------------------------------------------------------------
# epoch_token_budget

_ETB_ALPHA = 0.3
_ETB_EPOCHS = 4.0       # budget = 4 x the unique corpus tokens
_ETB_MAX_REPEAT = 4.0   # the data-constrained rule-of-thumb ceiling


def _etb_sql() -> str:
    tok = r"len(string_split_regex(trim(text), '\s+'))"
    a = _ETB_ALPHA
    return f"""
    WITH per_src AS (
      SELECT source, CAST(sum({tok}) AS BIGINT) AS n_tok
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_tok) AS BIGINT) AS n,
             sum(pow(n_tok, {a})) AS z
      FROM per_src
    )
    SELECT source, n_tok,
           round(pow(n_tok, {a}) / z, 6) AS q_weight,
           CAST(floor(round(pow(n_tok, {a}) / z, 6)
                      * ({_ETB_EPOCHS} * n)) AS BIGINT) AS alloc_tokens,
           round(round(pow(n_tok, {a}) / z, 6) * ({_ETB_EPOCHS} * n)
                 / n_tok, 4) AS repeat_factor,
           (round(round(pow(n_tok, {a}) / z, 6) * ({_ETB_EPOCHS} * n)
                  / n_tok, 4) > {_ETB_MAX_REPEAT}) AS exhausted
    FROM per_src CROSS JOIN tot
    """


@register(
    "epoch_token_budget",
    _etb_sql(),
    tags=["corpus", "sampling", "curation"],
)
def epoch_token_budget(spark, sf_dir):
    """The sampling plan a pretraining run is configured from:
    temperature-smoothed source weights (alpha 0.3, the
    ``corpus_sampling_temperature`` convention) allocated against a
    fixed budget of 4x the unique corpus tokens, reported per source
    as the weight, the allocated token count, the implied repeat
    factor over the source's unique tokens, and the exhaustion flag
    at > 4 repeats — the data-constrained-scaling rule of thumb for
    where repeating stops substituting for fresh data.  Exhausted
    sources are where a data lead either caps the weight or goes
    sourcing.

    Cross-engine exactness: the smoothed weight is rounded to 6 dp
    once and every downstream number (floor for the allocation,
    4 dp repeat, the flag) derives from that pinned double with
    literal multipliers.

    Plan: per-source token counts are one grouped sum with map-side
    partials (token counting is a JVM expression); the normalizer is
    a 1-row broadcast; the plan math is a narrow projection.  Nothing
    grows faster than the scan."""
    from ffiec_pq_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum(token_count("text")).cast("long").alias("n_tok")
    )
    tot = per_src.agg(
        F.sum("n_tok").cast("long").alias("n"),
        F.sum(F.pow("n_tok", F.lit(_ETB_ALPHA))).alias("z"),
    )
    q = F.round(F.pow("n_tok", F.lit(_ETB_ALPHA)) / F.col("z"), 6)
    budget = F.lit(_ETB_EPOCHS) * F.col("n")
    rf = F.round(q * budget / F.col("n_tok"), 4)
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tok",
        q.alias("q_weight"),
        F.floor(q * budget).cast("long").alias("alloc_tokens"),
        rf.alias("repeat_factor"),
        (rf > F.lit(_ETB_MAX_REPEAT)).alias("exhausted"),
    )


# --------------------------------------------------------------------------
# mixture_realized_counts — materialize the epoch_token_budget plan with
# deterministic per-document sampling and audit realized vs planned.

_MIX_GRID = 1 << 20
_MIX_SEED = 31


def _mix_sql() -> str:
    from ffiec_pq_spark.functions.hashing import hash60_sql

    tok = r"len(string_split_regex(trim(text), '\s+'))"
    a = _ETB_ALPHA
    h = hash60_sql("doc_id", seed=_MIX_SEED)
    rf = (
        f"round(round(pow(n_tok, {a}) / z, 6) * ({_ETB_EPOCHS} * n)"
        f" / n_tok, 4)"
    )
    return f"""
    WITH per_src AS (
      SELECT source, CAST(sum({tok}) AS BIGINT) AS n_tok
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_tok) AS BIGINT) AS n,
             sum(pow(n_tok, {a})) AS z
      FROM per_src
    ),
    plan AS (
      SELECT source, n_tok AS src_tokens,
             CAST(floor(round(pow(n_tok, {a}) / z, 6)
                        * ({_ETB_EPOCHS} * n)) AS BIGINT)
               AS planned_tokens,
             CAST(floor({rf}) AS BIGINT) AS base_rep,
             CAST(floor(({rf} - floor({rf})) * {_MIX_GRID}) AS BIGINT)
               AS thr
      FROM per_src CROSS JOIN tot
    )
    SELECT p.source, p.src_tokens, p.planned_tokens,
           CAST(sum((p.base_rep
                     + CASE WHEN ({h} % {_MIX_GRID}) < p.thr
                            THEN 1 ELSE 0 END) * {tok}) AS BIGINT)
             AS realized_tokens,
           CASE WHEN p.planned_tokens = 0 THEN NULL
                ELSE round(sum((p.base_rep
                       + CASE WHEN ({h} % {_MIX_GRID}) < p.thr
                              THEN 1 ELSE 0 END) * {tok})
                     / CAST(p.planned_tokens AS DOUBLE), 4)
           END AS realized_ratio
    FROM documents d JOIN plan p ON p.source = d.source
    GROUP BY p.source, p.src_tokens, p.planned_tokens
    """


@register(
    "mixture_realized_counts",
    _mix_sql(),
    tags=["corpus", "sampling", "curation"],
)
def mixture_realized_counts(spark, sf_dir):
    """Materialize the ``epoch_token_budget`` plan: every document
    repeats ``floor(repeat_factor)`` times plus one more epoch behind
    a deterministic hash gate with probability ``frac(repeat_factor)``
    (Bernoulli-rounded repetition — the standard way a sampler
    realizes a fractional epoch count without coordination), then
    audit realized against planned tokens per source.  A ratio far
    from 1.0 flags sources whose within-source token distribution
    makes the gate a biased estimator of the fractional epoch — the
    check a data lead runs BEFORE launching the tokenizer job.

    Cross-engine exactness: the repeat factor is the planner's pinned
    4 dp value; the gate threshold is ``floor(frac · 2^20)`` of that
    pinned double; the gate itself is the portable 60-bit hash — so
    the realized counts are integers both engines agree on exactly.

    Plan: the |sources|-row plan relation (one grouped sum + 1-row
    normalizer) broadcasts against the corpus scan; the realization
    is a narrow projection (hash + integer arithmetic, no explode —
    repetition is counted, not materialized); the audit rollup has
    |sources| groups with map-side partials."""
    from ffiec_pq_spark.functions.hashing import hash60
    from ffiec_pq_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum(token_count("text")).cast("long").alias("n_tok")
    )
    tot = per_src.agg(
        F.sum("n_tok").cast("long").alias("n"),
        F.sum(F.pow("n_tok", F.lit(_ETB_ALPHA))).alias("z"),
    )
    q = F.round(F.pow("n_tok", F.lit(_ETB_ALPHA)) / F.col("z"), 6)
    budget = F.lit(_ETB_EPOCHS) * F.col("n")
    rf = F.round(q * budget / F.col("n_tok"), 4)
    plan = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_tok").alias("src_tokens"),
        F.floor(q * budget).cast("long").alias("planned_tokens"),
        F.floor(rf).cast("long").alias("base_rep"),
        F.floor((rf - F.floor(rf)) * F.lit(_MIX_GRID))
        .cast("long")
        .alias("thr"),
    )
    gate = (
        hash60("doc_id", seed=_MIX_SEED) % _MIX_GRID < F.col("thr")
    ).cast("long")
    realized = (F.col("base_rep") + gate) * token_count("text")
    return (
        docs.join(F.broadcast(plan), "source")
        .groupBy("source", "src_tokens", "planned_tokens")
        .agg(F.sum(realized).cast("long").alias("realized_tokens"))
        .select(
            "source",
            "src_tokens",
            "planned_tokens",
            "realized_tokens",
            F.when(
                F.col("planned_tokens") == 0, F.lit(None).cast("double")
            )
            .otherwise(
                F.round(
                    F.col("realized_tokens")
                    / F.col("planned_tokens").cast("double"),
                    4,
                )
            )
            .alias("realized_ratio"),
        )
    )
