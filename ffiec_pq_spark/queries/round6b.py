"""Round-6 second wave: corpus-composition operators for a training-data
pipeline — cross-source duplication audit, duplicate-aware soft
reweighting (the "count each content once" correction to source mixture
math), and vocabulary coverage curves over the exact distributed rank.

No reference analogue (iangow/ffiec.pq has no corpus surface — cf.
`R/ffeic_read.R` which stops at typed ingest); these extend SURVEY.md
§2's scale-extension rows.  Every query has an exact DuckDB oracle;
doubles are rounded identically on both sides so summation order cannot
flip the hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.functions.hashing import hash60, hash60_sql
from ffiec_pq_spark.operators.windows import distributed_rank
from ffiec_pq_spark.session import local_frame, load_table

# ---------------------------------------------------------------------------
# source_overlap_matrix — cross-source exact-duplication matrix
# ---------------------------------------------------------------------------


def _overlap_sql() -> str:
    h = hash60_sql("text", seed=13)
    return f"""
    WITH hs AS (
      SELECT DISTINCT source, {h} AS h FROM documents
    ),
    sz AS (SELECT source, count(*) AS n FROM hs GROUP BY source),
    pr AS (
      SELECT a.source AS s1, b.source AS s2, count(*) AS shared_contents
      FROM hs a JOIN hs b USING (h)
      WHERE a.source < b.source
      GROUP BY 1, 2
    )
    SELECT pr.s1, pr.s2, CAST(pr.shared_contents AS BIGINT)
             AS shared_contents,
           CAST(za.n AS BIGINT) AS n_s1, CAST(zb.n AS BIGINT) AS n_s2,
           round(pr.shared_contents
                 / CAST(za.n + zb.n - pr.shared_contents AS DOUBLE), 6)
             AS jaccard
    FROM pr
    JOIN sz za ON za.source = pr.s1
    JOIN sz zb ON zb.source = pr.s2
    """


@register("source_overlap_matrix", _overlap_sql(), tags=["dedup", "corpus"])
def source_overlap_matrix(spark, sf_dir):
    """Cross-source contamination matrix: for every pair of sources, how
    many distinct document CONTENTS they share, plus the Jaccard overlap
    of their content sets.  This is the audit that tells you two crawls
    ingested the same site, or that a "curated" subset is really a
    replica of another source — the decision input for dropping a whole
    source rather than deduping row by row.

    Scale shape: contents are reduced to a distinct ``(hash, source)``
    relation FIRST (one shuffle, output bounded by the corpus's distinct
    contents), so the pair self-join is keyed on the content hash over
    an already-collapsed relation — a duplicate appearing k times in
    each of two sources still contributes exactly one pair.  Source
    cardinality is small by construction, so the per-source size lookup
    is a broadcast join."""
    docs = load_table(spark, sf_dir, "documents")
    hs = docs.select(
        "source", hash60(F.col("text"), seed=13).alias("h")
    ).distinct()
    sz = hs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = hs.alias("a"), hs.alias("b")
    pr = (
        a.join(b, "h")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("s1"), F.col("b.source").alias("s2")
        )
        .agg(F.count(F.lit(1)).alias("shared_contents"))
    )
    za = sz.select(F.col("source").alias("s1"), F.col("n").alias("n_s1"))
    zb = sz.select(F.col("source").alias("s2"), F.col("n").alias("n_s2"))
    return (
        pr.join(F.broadcast(za), "s1")
        .join(F.broadcast(zb), "s2")
        .select(
            "s1",
            "s2",
            "shared_contents",
            "n_s1",
            "n_s2",
            F.round(
                F.col("shared_contents")
                / (
                    F.col("n_s1") + F.col("n_s2") - F.col("shared_contents")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# docs_softdedup_weights — duplicate-aware source reweighting
# ---------------------------------------------------------------------------


def _softdedup_sql() -> str:
    h = hash60_sql("text", seed=29)
    tok = "len(string_split_regex(trim(text), '\\s+'))"
    return f"""
    WITH base AS (
      SELECT source, {h} AS h, {tok} AS n_tok FROM documents
    ),
    grp AS (SELECT h, count(*) AS c FROM base GROUP BY h)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS raw_tokens,
           round(sum(n_tok / CAST(c AS DOUBLE)), 4) AS eff_tokens,
           round(sum(1.0 / c), 4) AS eff_docs,
           round(sum(n_tok / CAST(c AS DOUBLE)) / sum(CAST(n_tok AS DOUBLE)),
                 6) AS keep_ratio
    FROM base JOIN grp USING (h)
    GROUP BY source
    """


@register("docs_softdedup_weights", _softdedup_sql(), tags=["dedup", "corpus"])
def docs_softdedup_weights(spark, sf_dir):
    """Duplicate-aware soft reweighting: weight every document by
    ``1 / (number of exact copies corpus-wide)`` so each distinct
    content contributes exactly one document's worth of mass, then
    report per source the raw vs effective token counts.  The
    ``eff_tokens`` column is the number that should feed mixture-weight
    math (``mixture_temperature_weights``) — raw token counts
    overweight sources whose bulk is replicated boilerplate.

    Scale shape: one grouped count on the content hash, one keyed join
    back (both on the same key — a single shuffle under AQE reuse), one
    grouped agg on the low-cardinality source key.  No windows, no
    driver collection; the duplicate-group relation is bounded by the
    corpus's distinct contents."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        hash60(F.col("text"), seed=29).alias("h"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
    )
    grp = base.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    w_tok = F.col("n_tok") / F.col("c").cast("double")
    return (
        base.join(grp, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("raw_tokens"),
            F.round(F.sum(w_tok), 4).alias("eff_tokens"),
            F.round(F.sum(F.lit(1.0) / F.col("c")), 4).alias("eff_docs"),
            F.round(
                F.sum(w_tok) / F.sum(F.col("n_tok").cast("double")), 6
            ).alias("keep_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# corpus_vocab_coverage — token-mass coverage of top-k vocabularies
# ---------------------------------------------------------------------------

_CUTOFFS = [10, 25, 100]


def _coverage_sql() -> str:
    cases = ", ".join(
        f"CAST(sum(CASE WHEN r <= {k} THEN f ELSE 0 END) AS BIGINT) AS c{k}"
        for k in _CUTOFFS
    )
    values = ", ".join(f"({k})" for k in _CUTOFFS)
    pick = " ".join(f"WHEN {k} THEN a.c{k}" for k in _CUTOFFS)
    return f"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    freq AS (
      SELECT tok, count(*) AS f FROM toks WHERE tok <> '' GROUP BY tok
    ),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r FROM freq
    ),
    agg AS (
      SELECT CAST(sum(f) AS BIGINT) AS total,
             count(*) AS n_types, {cases}
      FROM ranked
    )
    SELECT c.k AS cutoff,
           CAST(least(c.k, a.n_types) AS BIGINT) AS vocab_size,
           CAST(CASE c.k {pick} END AS BIGINT) AS covered_tokens,
           round((CASE c.k {pick} END) / CAST(a.total AS DOUBLE), 6)
             AS coverage,
           round(1.0 - (CASE c.k {pick} END) / CAST(a.total AS DOUBLE), 6)
             AS oov_rate
    FROM agg a CROSS JOIN (VALUES {values}) c(k)
    """


@register("corpus_vocab_coverage", _coverage_sql(), tags=["text", "corpus"])
def corpus_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve: what fraction of the corpus's token
    mass is covered by keeping only the top-k most frequent types, for a
    ladder of candidate vocabulary sizes — the tokenizer-budget /
    OOV-rate tradeoff read directly off the corpus before training a
    vocabulary.

    Scale shape: the frequency table is one grouped count on the token;
    the exact global frequency rank uses :func:`distributed_rank`
    (range-partition on ``(f DESC, tok)`` + parallel local
    ``row_number`` + broadcast offsets) instead of a single-partition
    window, so the rank survives a billion-type table; the ladder is
    ONE conditional aggregation over the ranked relation (no per-cutoff
    rescans), cross-joined against a 3-row literal."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    ranked = distributed_rank(
        freq, order_cols=[F.col("f").desc(), F.col("tok")], rank_col="r"
    )
    agg = ranked.agg(
        F.sum("f").alias("total"),
        F.count(F.lit(1)).alias("n_types"),
        *[
            F.sum(F.when(F.col("r") <= k, F.col("f")).otherwise(0)).alias(
                f"c{k}"
            )
            for k in _CUTOFFS
        ],
    )
    cutoffs = local_frame(spark, [(k,) for k in _CUTOFFS], "k int")
    covered = F.coalesce(
        *[
            F.when(F.col("k") == k, F.col(f"c{k}"))
            for k in _CUTOFFS
        ]
    )
    return (
        cutoffs.crossJoin(F.broadcast(agg))
        .select(
            F.col("k").alias("cutoff"),
            F.least(F.col("k").cast("long"), F.col("n_types")).alias(
                "vocab_size"
            ),
            covered.alias("covered_tokens"),
            F.round(covered / F.col("total").cast("double"), 6).alias(
                "coverage"
            ),
            F.round(
                F.lit(1.0) - covered / F.col("total").cast("double"), 6
            ).alias("oov_rate"),
        )
    )


# ---------------------------------------------------------------------------
# events_selfjoin_size_audit — pre-join cardinality / skew audit
# ---------------------------------------------------------------------------


def _selfjoin_audit_sql() -> str:
    cap = "((1::BIGINT << (bucket + 1)) - 1)"
    return f"""
    WITH deg AS (
      SELECT user_id, count(*) AS d FROM events GROUP BY user_id
    ),
    b AS (SELECT CAST(floor(log2(d)) AS INT) AS bucket, d FROM deg)
    SELECT bucket,
           count(*) AS n_keys,
           CAST(sum(d) AS BIGINT) AS n_rows,
           CAST(max(d) AS BIGINT) AS max_d,
           CAST(sum(d * d) AS BIGINT) AS exact_pairs,
           CAST(count(*) * {cap} * {cap} AS BIGINT) AS ub_pairs,
           round(count(*) * {cap} * {cap}
                 / CAST(sum(d * d) AS DOUBLE), 4) AS overest
    FROM b GROUP BY bucket
    """


@register(
    "events_selfjoin_size_audit",
    _selfjoin_audit_sql(),
    tags=["skew", "planning"],
)
def events_selfjoin_size_audit(spark, sf_dir):
    """Pre-join cardinality and skew audit: the exact output size of a
    self-join on ``user_id`` is ``sum(d^2)`` over per-key degrees — the
    number a planner needs BEFORE committing to a session-stitch or
    pair-generation join at 100 TB.  Keys are bucketed by
    ``floor(log2(degree))``; each bucket reports its exact pair count
    next to the log2-histogram upper bound (``n_keys * (2^(b+1)-1)^2``
    — what a sketch-only planner would estimate), so the ``overest``
    column is the price of keeping only the histogram.  A heavy tail
    bucket (large ``max_d``, pairs concentrated in few keys) is the
    salting trigger.

    Scale shape: one grouped count on the join key, then one grouped
    agg on ~60 log buckets — two shuffles, the second on a provably
    tiny key space.  The audit never materializes a single joined pair.
    ``2^(b+1)`` via ``pow(2.0, b+1)`` is exact in float64 for every
    representable degree, matching DuckDB's integer shift."""
    ev = load_table(spark, sf_dir, "events")
    deg = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("d"))
    b = deg.select(
        F.floor(F.log2("d")).cast("int").alias("bucket"), "d"
    )
    stats = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("d").alias("n_rows"),
        F.max("d").alias("max_d"),
        F.sum(F.col("d") * F.col("d")).alias("exact_pairs"),
    )
    cap = F.pow(F.lit(2.0), F.col("bucket") + 1).cast("long") - 1
    ub = (F.col("n_keys") * cap * cap).cast("long")
    return stats.select(
        "bucket",
        "n_keys",
        "n_rows",
        "max_d",
        "exact_pairs",
        ub.alias("ub_pairs"),
        F.round(ub / F.col("exact_pairs").cast("double"), 4).alias(
            "overest"
        ),
    )


# ---------------------------------------------------------------------------
# docs_dsir_importance — hashed-feature importance reweighting (DSIR)
# ---------------------------------------------------------------------------

_DSIR_B = 256  # hashed feature buckets
_DSIR_SEED = 29
_DSIR_TARGET_LANG = "en"


def _bigram_bucket_cte(cols: str) -> str:
    """Shared DuckDB CTE: word-bigram occurrences hashed into the
    ``_DSIR_B`` fixed buckets (the single source for the DSIR and
    KL-drift oracles — one edit reaches both)."""
    h = hash60_sql("t[i] || ' ' || t[i + 1]", seed=_DSIR_SEED)
    return rf"""toks AS (
      SELECT doc_id, {cols},
             string_split_regex(trim(text), '\s+') AS t
      FROM documents
    ),
    bg AS (
      SELECT doc_id, {cols}, {h} % {_DSIR_B} AS b
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
    )"""


def _dsir_sql() -> str:
    b = float(_DSIR_B)
    return rf"""
    WITH {_bigram_bucket_cte('source, lang')},
    dist AS (
      SELECT b, count(*) AS c_r,
             sum(CASE WHEN lang = '{_DSIR_TARGET_LANG}'
                      THEN 1 ELSE 0 END) AS c_t
      FROM bg GROUP BY b
    ),
    tot AS (SELECT sum(c_r) AS n_r, sum(c_t) AS n_t FROM dist),
    lr AS (
      SELECT b,
             ln((c_t + 1.0) / (n_t + {b}))
               - ln((c_r + 1.0) / (n_r + {b})) AS logratio
      FROM dist CROSS JOIN tot
    ),
    doc AS (
      SELECT doc_id, source, round(sum(logratio), 6) AS logw
      FROM bg JOIN lr USING (b)
      GROUP BY doc_id, source
    )
    SELECT source,
           count(*) AS n_docs,
           round(avg(logw), 6) AS avg_logw,
           CAST(sum(CASE WHEN logw > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_selected,
           round(sum(CASE WHEN logw > 0 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS select_rate
    FROM doc GROUP BY source
    """


def _hashed_bigrams(docs):
    """(doc_id, source, lang, b): one row per word-bigram occurrence,
    bucketed by the portable 60-bit hash into ``_DSIR_B`` buckets.
    Built array-side (zip_with over two slices) — the explode is the
    only row expansion and it is narrow (no shuffle)."""
    return (
        docs.select(
            "doc_id",
            "source",
            "lang",
            F.split(F.trim(F.col("text")), r"\s+").alias("_t"),
        )
        .select(
            "doc_id",
            "source",
            "lang",
            F.explode(
                F.expr(
                    "zip_with(slice(_t, 1, size(_t) - 1),"
                    "         slice(_t, 2, size(_t) - 1),"
                    "         (a, b) -> concat(a, ' ', b))"
                )
            ).alias("_g"),
        )
        .select(
            "doc_id",
            "source",
            "lang",
            (hash60("_g", seed=_DSIR_SEED) % _DSIR_B).alias("b"),
        )
    )


@register("docs_dsir_importance", _dsir_sql(), tags=["curation", "sampling"])
def docs_dsir_importance(spark, sf_dir):
    """Data Selection via Importance Resampling (Xie et al., NeurIPS
    2023, public): per-document importance weight under hashed n-gram
    bag-of-words models of a TARGET domain vs the RAW corpus —
    ``logw(doc) = sum over its bigram occurrences of
    ln p_target(bucket) - ln p_raw(bucket)`` with add-1 smoothing over
    the ``_DSIR_B`` fixed buckets.  Target here = the ``lang = 'en'``
    slice (stand-in for "looks like the high-quality domain"); docs
    with ``logw > 0`` are the ones resampling keeps.  Reported as the
    per-source audit a data lead reviews: mean weight + selection rate.

    Scale shape: one narrow explode to bigram occurrences; the bucket
    distribution is ONE grouped agg on <= 256 keys (map-side combine
    collapses every partition to 256 partials); log-ratios attach back
    via a broadcast join of the 256-row relation; per-doc sums then the
    source rollup are the only real shuffles (doc_id, then source).
    No pairwise anything — linear in corpus size, skew-free keys.
    Per-doc sums are rounded to 6dp on BOTH engines before the > 0
    gate and the avg, so float summation order cannot flip a decision
    (repo-wide oracle-portability rule)."""
    docs = load_table(spark, sf_dir, "documents")
    bg = _hashed_bigrams(docs)
    dist = bg.groupBy("b").agg(
        F.count(F.lit(1)).alias("c_r"),
        F.sum(
            (F.col("lang") == _DSIR_TARGET_LANG).cast("long")
        ).alias("c_t"),
    )
    tot = dist.agg(
        F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t")
    )
    B = float(_DSIR_B)
    lr = dist.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("c_t") + 1.0) / (F.col("n_t") + B))
            - F.log((F.col("c_r") + 1.0) / (F.col("n_r") + B))
        ).alias("logratio"),
    )
    doc = (
        bg.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "source")
        .agg(F.round(F.sum("logratio"), 6).alias("logw"))
    )
    kept = (F.col("logw") > 0).cast("long")
    return doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("logw"), 6).alias("avg_logw"),
        F.sum(kept).alias("n_selected"),
        F.round(F.sum(kept) / F.count(F.lit(1)).cast("double"), 6).alias(
            "select_rate"
        ),
    )


# ---------------------------------------------------------------------------
# source_bigram_kl_drift — per-source distribution drift vs the corpus
# ---------------------------------------------------------------------------


def _kl_sql() -> str:
    b = float(_DSIR_B)
    return rf"""
    WITH {_bigram_bucket_cte('source')},
    corpus AS (SELECT b, count(*) AS c_r FROM bg GROUP BY b),
    tot AS (SELECT sum(c_r) AS n_r FROM corpus),
    per_src AS (SELECT source, b, count(*) AS c_s FROM bg GROUP BY 1, 2),
    stot AS (SELECT source, sum(c_s) AS n_s FROM per_src GROUP BY 1),
    grid AS (
      SELECT s.source, c.b, c.c_r, coalesce(p.c_s, 0) AS c_s
      FROM stot s CROSS JOIN corpus c
      LEFT JOIN per_src p ON p.source = s.source AND p.b = c.b
    )
    SELECT g.source,
           CAST(st.n_s AS BIGINT) AS n_bigrams,
           round(sum(
             ((g.c_s + 1.0) / (st.n_s + {b}))
             * (ln((g.c_s + 1.0) / (st.n_s + {b}))
                - ln((g.c_r + 1.0) / (t.n_r + {b})))
           ), 6) AS kl_vs_corpus
    FROM grid g
    JOIN stot st ON st.source = g.source
    CROSS JOIN tot t
    GROUP BY g.source, st.n_s
    """


@register("source_bigram_kl_drift", _kl_sql(), tags=["corpus", "quality"])
def source_bigram_kl_drift(spark, sf_dir):
    """Per-source domain-shift audit: KL(p_source || p_corpus) over the
    same add-1-smoothed hashed-bigram buckets as
    :func:`docs_dsir_importance`.  A source whose KL spikes is the one
    whose text stopped looking like the rest of the corpus — the
    upstream-drift alarm a corpus pipeline checks before a source's
    next crawl lands in the mixture.

    Scale shape: the corpus-wide and per-source bucket distributions
    are grouped aggs on <= 256 and <= n_sources x 256 keys (map-side
    combine does the heavy lifting); the smoothed full-domain grid is a
    broadcast cross of two provably tiny relations (sources x buckets),
    never touching row-level data again.  Everything after the explode
    is sub-linear; the KL itself reduces n_sources x 256 rows."""
    docs = load_table(spark, sf_dir, "documents")
    bg = _hashed_bigrams(docs).select("source", "b")
    corpus = bg.groupBy("b").agg(F.count(F.lit(1)).alias("c_r"))
    tot = corpus.agg(F.sum("c_r").alias("n_r"))
    per_src = bg.groupBy("source", "b").agg(
        F.count(F.lit(1)).alias("c_s")
    )
    stot = per_src.groupBy("source").agg(F.sum("c_s").alias("n_s"))
    grid = (
        stot.crossJoin(F.broadcast(corpus))
        .join(F.broadcast(per_src), ["source", "b"], "left")
        .select(
            "source",
            "n_s",
            "b",
            "c_r",
            F.coalesce(F.col("c_s"), F.lit(0)).alias("c_s"),
        )
    )
    B = float(_DSIR_B)
    p_s = (F.col("c_s") + 1.0) / (F.col("n_s") + B)
    p_r = (F.col("c_r") + 1.0) / (F.col("n_r") + B)
    return (
        grid.crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.max("n_s").alias("n_bigrams"),
            F.round(F.sum(p_s * (F.log(p_s) - F.log(p_r))), 6).alias(
                "kl_vs_corpus"
            ),
        )
    )


# ---------------------------------------------------------------------------
# customer_k_anonymity — generalization-ladder re-identification audit
# ---------------------------------------------------------------------------

_KANON_K = 5  # classes smaller than this are "at risk"


def _kanon_sql() -> str:
    return f"""
    WITH classes AS (
      SELECT grouping(c_nationkey) + grouping(c_mktsegment)
               + grouping(band) AS lvl,
             count(*) AS g
      FROM (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000.0) AS INT) AS band
        FROM customer
      )
      GROUP BY ROLLUP (c_nationkey, c_mktsegment, band)
    )
    SELECT lvl AS level,
           count(*) AS n_classes,
           CAST(min(g) AS BIGINT) AS k_anonymity,
           CAST(sum(CASE WHEN g < {_KANON_K} THEN g ELSE 0 END) AS BIGINT)
             AS n_at_risk,
           round(sum(CASE WHEN g < {_KANON_K} THEN g ELSE 0 END)
                 / CAST(sum(g) AS DOUBLE), 6) AS risk_rate
    FROM classes
    WHERE lvl <= 2
    GROUP BY lvl
    """


@register("customer_k_anonymity", _kanon_sql(), tags=["privacy", "audit"])
def customer_k_anonymity(spark, sf_dir):
    """Re-identification audit before a data release: k-anonymity of
    the quasi-identifier tuple (nation, market segment, account-balance
    band) at each rung of the generalization ladder — level 0 keeps all
    three QIs, level 1 drops the balance band, level 2 keeps nation
    only.  Per level: equivalence-class count, the k-anonymity value
    (smallest class), and how many people sit in classes smaller than
    ``_KANON_K`` (the rows an attacker can pin down).  The audit answers
    "how much must we generalize before release" in one query.

    Scale shape: ONE rollup aggregation computes every ladder rung in a
    single shuffle (Spark expands the grouping sets map-side, partial
    aggregation collapses each partition to the class space before the
    exchange); the per-level reduction then runs on the tiny class
    relation.  No self-joins, no windows — this is the cheapest shape
    that yields all levels, and it beats three separate scans 3:1 on
    I/O at 100 TB."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("int").alias("band"),
    )
    classes = (
        cust.rollup("c_nationkey", "c_mktsegment", "band")
        .agg(
            F.count(F.lit(1)).alias("g"),
            (
                F.grouping("c_nationkey")
                + F.grouping("c_mktsegment")
                + F.grouping("band")
            ).alias("lvl"),
        )
        .filter(F.col("lvl") <= 2)
    )
    at_risk = F.sum(F.when(F.col("g") < _KANON_K, F.col("g")).otherwise(0))
    return classes.groupBy(F.col("lvl").alias("level")).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("g").alias("k_anonymity"),
        at_risk.alias("n_at_risk"),
        F.round(at_risk / F.sum("g").cast("double"), 6).alias("risk_rate"),
    )


# ---------------------------------------------------------------------------
# corpus_sampling_temperature — exponential-smoothing mixture weights
# ---------------------------------------------------------------------------

_TEMP_ALPHAS = (0.3, 0.7)


def _temperature_sql() -> str:
    tok = r"len(string_split_regex(trim(text), '\s+'))"
    a1, a2 = _TEMP_ALPHAS
    return f"""
    WITH per_src AS (
      SELECT source, CAST(sum({tok}) AS BIGINT) AS n_tok
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT sum(n_tok) AS n,
             sum(pow(n_tok, {a1})) AS z1,
             sum(pow(n_tok, {a2})) AS z2
      FROM per_src
    )
    SELECT source, n_tok,
           round(n_tok / CAST(n AS DOUBLE), 6) AS p_raw,
           round(pow(n_tok, {a1}) / z1, 6) AS q_a03,
           round(pow(n_tok, {a2}) / z2, 6) AS q_a07,
           round((pow(n_tok, {a1}) / z1) / (n_tok / CAST(n AS DOUBLE)), 4)
             AS boost_a03
    FROM per_src CROSS JOIN tot
    """


@register(
    "corpus_sampling_temperature",
    _temperature_sql(),
    tags=["corpus", "sampling"],
)
def corpus_sampling_temperature(spark, sf_dir):
    """Temperature-smoothed mixture weights: the multilingual-LM
    sampling rule (XLM-R / mBERT style) ``q_s(alpha) proportional to
    p_s^alpha`` that lifts low-resource sources without flattening the
    mixture — reported per source as the raw token share, the smoothed
    weight at alpha 0.3 and 0.7, and the resulting up/down-sampling
    boost at the aggressive setting.  This is the number that decides
    how many epochs each source runs in the next pretraining mix.

    Scale shape: per-source token counts are one grouped sum with
    map-side partials (token counting is a JVM expression, no explode);
    the normalizers reduce the ~|sources| relation to one broadcast row;
    the weight math is a narrow projection.  Nothing here grows faster
    than the scan."""
    from ffiec_pq_spark.operators.text import token_count

    a1, a2 = _TEMP_ALPHAS
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum(token_count("text")).alias("n_tok")
    )
    tot = per_src.agg(
        F.sum("n_tok").alias("n"),
        F.sum(F.pow("n_tok", F.lit(a1))).alias("z1"),
        F.sum(F.pow("n_tok", F.lit(a2))).alias("z2"),
    )
    p = F.col("n_tok") / F.col("n").cast("double")
    q1 = F.pow("n_tok", F.lit(a1)) / F.col("z1")
    q2 = F.pow("n_tok", F.lit(a2)) / F.col("z2")
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tok",
        F.round(p, 6).alias("p_raw"),
        F.round(q1, 6).alias("q_a03"),
        F.round(q2, 6).alias("q_a07"),
        F.round(q1 / p, 4).alias("boost_a03"),
    )


# ---------------------------------------------------------------------------
# quality_threshold_sweep — calibration curve for the quality gate
# ---------------------------------------------------------------------------

_QT_THRESHOLDS = (0.2, 0.3, 0.4, 0.5, 0.6, 0.7)
_QT_TARGET_LANG = "en"


def _qsweep_sql() -> str:
    from ffiec_pq_spark.operators.text import quality_score_sql

    tok = r"string_split_regex(trim(text), '\s+')"
    quality = quality_score_sql()
    thr_list = ", ".join(str(t) for t in _QT_THRESHOLDS)
    return f"""
    WITH scored AS (
      SELECT lang, len({tok}) AS n_tok, {quality} AS quality
      FROM documents
    ),
    t AS (SELECT unnest(CAST([{thr_list}] AS DOUBLE[])) AS thr)
    SELECT thr,
           count(*) AS n_total,
           CAST(sum(CASE WHEN quality >= thr THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           round(sum(CASE WHEN quality >= thr THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS keep_rate,
           CAST(sum(CASE WHEN quality >= thr THEN n_tok ELSE 0 END)
                AS BIGINT) AS tokens_kept,
           CASE WHEN sum(CASE WHEN quality >= thr THEN 1 ELSE 0 END) = 0
                THEN NULL
                ELSE round(
                  sum(CASE WHEN quality >= thr
                            AND lang = '{_QT_TARGET_LANG}'
                           THEN 1 ELSE 0 END)
                  / CAST(sum(CASE WHEN quality >= thr
                                  THEN 1 ELSE 0 END) AS DOUBLE), 6)
           END AS target_lang_precision
    FROM scored CROSS JOIN t
    GROUP BY thr
    """


@register(
    "quality_threshold_sweep", _qsweep_sql(), tags=["text", "curation"]
)
def quality_threshold_sweep(spark, sf_dir):
    """Calibration curve for the quality gate: at each candidate
    threshold, the keep rate, the surviving token budget, and the
    share of kept docs in the target language (the proxy-precision a
    data lead uses to pick the production cutoff — the elbow where
    precision stops improving but tokens keep falling).  Same fixed
    quality formula as ``quality_composite_filter``, so the sweep IS
    that gate's tuning view.

    Scale shape: one scan computes the score once; the 6-rung ladder
    is a cross join against a 6-row literal relation (cheaper than 6
    passes, and every rung aggregates map-side into <= 6 groups).
    Nothing grows with the corpus but the single scan."""
    from ffiec_pq_spark.operators.text import quality_score_tok, tokens

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        F.size(tokens("text")).alias("n_tok"),
        quality_score_tok(tokens("text"), "text").alias("quality"),
    )
    lad = scored.withColumn(
        "thr", F.explode(F.array(*[F.lit(t) for t in _QT_THRESHOLDS]))
    )
    kept = (F.col("quality") >= F.col("thr")).cast("long")
    kept_en = (
        (F.col("quality") >= F.col("thr"))
        & (F.col("lang") == _QT_TARGET_LANG)
    ).cast("long")
    return lad.groupBy("thr").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept).alias("n_kept"),
        F.round(F.sum(kept) / F.count(F.lit(1)).cast("double"), 6).alias(
            "keep_rate"
        ),
        F.sum(F.col("n_tok") * kept).alias("tokens_kept"),
        F.when(F.sum(kept) == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.sum(kept_en) / F.sum(kept).cast("double"), 6)
        )
        .alias("target_lang_precision"),
    )


# ---------------------------------------------------------------------------
# weighted_reservoir_per_type — Efraimidis-Spirakis weighted sampling
# ---------------------------------------------------------------------------

_WRES_K = 5
_WRES_SEED = 23
_WRES_GRID = 1 << 20  # uniform grid for the deterministic u


def _wres_sql() -> str:
    h = hash60_sql("event_id", seed=_WRES_SEED)
    return f"""
    WITH src AS (
      SELECT event_type, event_id,
             abs(value) + 1.0 AS w,
             (({h} % {_WRES_GRID}) + 0.5) / {_WRES_GRID}.0 AS u
      FROM events
    ),
    keyed AS (
      SELECT event_type, event_id,
             round(pow(u, 1.0 / w), 6) AS es_key
      FROM src
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY es_key DESC, event_id) AS slot
      FROM keyed
    )
    SELECT event_type, event_id, es_key, slot
    FROM r WHERE slot <= {_WRES_K}
    """


@register(
    "weighted_reservoir_per_type", _wres_sql(), tags=["sampling"]
)
def weighted_reservoir_per_type(spark, sf_dir):
    """WEIGHTED sampling without replacement, per group: the
    Efraimidis-Spirakis scheme (key = u^(1/w), take the k largest keys
    — inclusion probability proportional to weight, here |value|+1),
    with ``u`` drawn deterministically from the portable hash so the
    sample is rerun-stable and oracle-checkable.  This is the mixing
    primitive for "sample documents proportional to token count /
    quality" steps in corpus construction.

    Scale shape: same two-phase salted top-k as the uniform reservoir
    (``reservoir_sample_per_type``): stage 1 ranks per (type, salt
    bucket) so no reducer sees a whole low-cardinality group; stage 2
    re-ranks the <= 64k survivors.  The ES key rounds to 6 dp BEFORE
    ranking on both engines (event_id breaks the ties), so a 1-ulp
    libm difference in pow between JVM and DuckDB cannot reorder the
    sample."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        (F.abs(F.col("value")) + 1.0).alias("w"),
        hash60("event_id", seed=_WRES_SEED).alias("h"),
    )
    u = ((F.col("h") % _WRES_GRID) + 0.5) / float(_WRES_GRID)
    keyed = ev.select(
        "event_type",
        "event_id",
        "h",
        F.round(F.pow(u, 1.0 / F.col("w")), 6).alias("es_key"),
    )
    from pyspark.sql import Window

    salted = keyed.withColumn("salt", (F.col("h") % 64).cast("int"))
    w1 = Window.partitionBy("event_type", "salt").orderBy(
        F.desc("es_key"), F.asc("event_id")
    )
    stage1 = (
        salted.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= _WRES_K)
        .drop("rn1", "salt", "h")
    )
    w2 = Window.partitionBy("event_type").orderBy(
        F.desc("es_key"), F.asc("event_id")
    )
    return (
        stage1.withColumn("slot", F.row_number().over(w2))
        .filter(F.col("slot") <= _WRES_K)
        .select("event_type", "event_id", "es_key", "slot")
    )


# ---------------------------------------------------------------------------
# packing_capacity_sweep — context-length decision curve
# ---------------------------------------------------------------------------

_PACK_LENGTHS = (32, 64, 128, 256)


def _pack_sweep_sql() -> str:
    tok = r"len(string_split_regex(trim(text), '\s+'))"
    l_list = ", ".join(str(x) for x in _PACK_LENGTHS)
    return f"""
    WITH d AS (SELECT {tok} AS n_tok FROM documents),
    t AS (SELECT unnest([{l_list}]) AS cap)
    SELECT cap,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN n_tok > cap THEN 1 ELSE 0 END) AS BIGINT)
             AS n_truncated,
           CAST(sum(greatest(n_tok - cap, 0)) AS BIGINT)
             AS tokens_lost,
           CAST(sum(least(n_tok, cap)) AS BIGINT) AS tokens_kept,
           CAST(ceil(sum(least(n_tok, cap)) / CAST(cap AS DOUBLE))
                AS BIGINT) AS min_bins,
           round(sum(least(n_tok, cap))
                 / (ceil(sum(least(n_tok, cap)) / CAST(cap AS DOUBLE))
                    * cap), 6) AS packing_efficiency_ub
    FROM d CROSS JOIN t
    GROUP BY cap
    """


@register(
    "packing_capacity_sweep", _pack_sweep_sql(), tags=["packing", "curation"]
)
def packing_capacity_sweep(spark, sf_dir):
    """Context-length decision curve: for each candidate sequence
    capacity, the truncation casualty count, tokens lost to the cut,
    and the best-case packing efficiency (total kept tokens over the
    bin lower bound ``ceil(kept/cap)`` — no packer can beat it, so the
    curve bounds what the real FFD packer in ``operators/packing.py``
    can achieve at each capacity).  The elbow of ``tokens_lost`` vs
    ``packing_efficiency_ub`` is how a pretraining run picks its
    sequence length.

    Scale shape: token counts are a JVM expression on one scan; the
    4-rung ladder cross-joins a literal relation and every aggregate
    is integer map-side-combined into <= 4 groups.  Nothing grows
    with the corpus but the scan."""
    from ffiec_pq_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(token_count("text").alias("n_tok"))
    lad = d.withColumn(
        "cap", F.explode(F.array(*[F.lit(x) for x in _PACK_LENGTHS]))
    )
    kept = F.least(F.col("n_tok"), F.col("cap"))
    agg = lad.groupBy("cap").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_tok") > F.col("cap")).cast("long")).alias(
            "n_truncated"
        ),
        F.sum(F.greatest(F.col("n_tok") - F.col("cap"), F.lit(0))).alias(
            "tokens_lost"
        ),
        F.sum(kept).alias("tokens_kept"),
    )
    min_bins = F.ceil(
        F.col("tokens_kept") / F.col("cap").cast("double")
    )
    return agg.select(
        "cap",
        "n_docs",
        "n_truncated",
        "tokens_lost",
        "tokens_kept",
        min_bins.alias("min_bins"),
        F.round(
            F.col("tokens_kept")
            / (min_bins * F.col("cap")).cast("double"),
            6,
        ).alias("packing_efficiency_ub"),
    )


# ---------------------------------------------------------------------------
# metric_subsample_ci — deterministic subsampling confidence intervals
# ---------------------------------------------------------------------------

_CI_REPLICAS = 32
_CI_SEED = 41


def _subsample_ci_sql() -> str:
    h = hash60_sql("event_id", seed=_CI_SEED)
    return f"""
    WITH rep AS (SELECT unnest(generate_series(0, {_CI_REPLICAS - 1})) AS r),
    halves AS (
      SELECT e.event_type, rep.r, e.value
      FROM events e CROSS JOIN rep
      WHERE (({h} >> (rep.r % 32)) & 1) = 0
    ),
    rmeans AS (
      SELECT event_type, r, avg(value) AS m
      FROM halves GROUP BY 1, 2
    )
    SELECT event_type,
           count(*) AS n_replicas,
           round(avg(m), 6) AS mean_of_means,
           round(min(m), 6) AS ci_lo,
           round(max(m), 6) AS ci_hi,
           round(stddev_pop(m), 6) AS replica_sd
    FROM rmeans GROUP BY event_type
    """


@register("metric_subsample_ci", _subsample_ci_sql(), tags=["stats", "audit"])
def metric_subsample_ci(spark, sf_dir):
    """Uncertainty for a corpus metric without a second pass over
    anything random: 32 deterministic HALF-samples (replica r keeps a
    row iff bit ``r`` of its portable hash is 0 — each an independent
    ~50% subsample), the metric (mean event value per type) recomputed
    on each, and the replica spread reported as a subsampling
    confidence band (Politis-Romano subsampling; the envelope and SD
    over replicas bound the estimator's sampling noise).  This is how
    a pipeline tells "the quality metric moved" from "the quality
    metric wobbled".

    Scale shape: the replica dimension is a 32-way explode of the
    SCAN (bounded constant fan-out, no shuffle growth: the per-replica
    partial means combine map-side into |types| x 32 groups); the
    final envelope reduces 32 rows per type.  All replica membership
    tests are bit-tests on one hash — zero rand(), rerun-stable,
    oracle-checkable."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", hash60("event_id", seed=_CI_SEED).alias("h")
    )
    reps = F.array(*[F.lit(r) for r in range(_CI_REPLICAS)])
    lad = ev.withColumn("r", F.explode(reps)).filter(
        F.expr("(shiftright(h, CAST(r % 32 AS INT)) & 1) = 0")
    )
    rmeans = lad.groupBy("event_type", "r").agg(F.avg("value").alias("m"))
    return rmeans.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_replicas"),
        F.round(F.avg("m"), 6).alias("mean_of_means"),
        F.round(F.min("m"), 6).alias("ci_lo"),
        F.round(F.max("m"), 6).alias("ci_hi"),
        F.round(F.stddev_pop("m"), 6).alias("replica_sd"),
    )
