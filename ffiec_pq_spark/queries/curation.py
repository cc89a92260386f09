"""Training-data curation queries: deterministic sampling / splits and
single-pass column profiling."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.functions.hashing import hash60, hash60_sql
from ffiec_pq_spark.operators.profile import profile_columns
from ffiec_pq_spark.operators.sampling import (
    deterministic_sample,
    sample_gate_sql,
    train_eval_split,
)
from ffiec_pq_spark.session import load_table


@register(
    "deterministic_sample_orders",
    f"""
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders
    WHERE {sample_gate_sql("o_orderkey", 0.1, seed=7)}
    """,
    tags=["curation", "sampling"],
)
def deterministic_sample_orders(spark, sf_dir):
    """Hash-gate 10% sample keyed on o_orderkey: the exact same subset
    on any engine / partitioning / rerun (df.sample's RNG is none of
    those), verified subset-exactly by the oracle."""
    o = load_table(spark, sf_dir, "orders")
    return deterministic_sample(o, "o_orderkey", 0.1, seed=7).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("total")
    )


@register(
    "train_eval_split_counts",
    f"""
    SELECT CASE WHEN {sample_gate_sql("o_orderkey", 0.2, seed=13)}
                THEN 'eval' ELSE 'train' END AS split,
           count(*) AS n,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY 1
    """,
    tags=["curation", "sampling"],
)
def train_eval_split_counts(spark, sf_dir):
    """Disjoint, exhaustive, content-keyed train/eval split — late
    re-runs can never leak a key across splits."""
    o = load_table(spark, sf_dir, "orders")
    split = train_eval_split(o, "o_orderkey", eval_rate=0.2, seed=13)
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "profile_customer",
    """
    SELECT 'c_custkey' AS "column", count(*) AS n_rows,
           CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           count(DISTINCT c_custkey) AS n_distinct,
           CAST(min(c_custkey) AS VARCHAR) AS min_str,
           CAST(max(c_custkey) AS VARCHAR) AS max_str
    FROM customer
    UNION ALL
    SELECT 'c_nationkey', count(*),
           CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT c_nationkey),
           CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR)
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', count(*),
           CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT c_mktsegment),
           CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR)
    FROM customer
    """,
    tags=["curation", "profile"],
)
def profile_customer(spark, sf_dir):
    """Single-scan column profile (count / nulls / distinct / min / max
    per column) — the 'what is in this table' pass priced as ONE job,
    not one per column."""
    c = load_table(spark, sf_dir, "customer")
    return profile_columns(c, ["c_custkey", "c_nationkey", "c_mktsegment"])


def _scored_exprs() -> dict[str, str]:
    """The curation pipeline's scoring expressions as SQL snippets
    (quality formula, language-ID case, tokenizer, normalized-content
    fingerprint) — ONE definition shared by ``_pipeline_sql`` and the
    round-10 per-source funnel oracle, so the two can never drift a
    formula apart (the hash-compare would catch it as a flake)."""
    from ffiec_pq_spark.operators.text import LANG_MARKERS, STOPWORDS

    tok = "string_split_regex(trim(text), '\\s+')"
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    quality = f"""round(greatest(least(
             0.5 * least(len({tok}) / 50.0, 1.0)
             + 0.5 * least(5.0 * len(list_intersect({tok}, [{stop}]))
                           / greatest(len({tok}), 1), 1.0)
             - 0.2 * least(len(regexp_extract_all(text, '[.,;:!?]'))
                           / greatest(CAST(len({tok}) AS DOUBLE), 1.0), 1.0),
             1.0), 0.0), 6)"""
    scores = {
        lang: f"len(list_intersect({tok}, [{', '.join(repr(m) for m in ms)}]))"
        for lang, ms in LANG_MARKERS.items()
    }
    greatest = "greatest(" + ", ".join(scores[l] for l in LANG_MARKERS) + ")"
    lang_case = (
        "CASE "
        + " ".join(f"WHEN {scores[l]} = {greatest} THEN '{l}'" for l in LANG_MARKERS)
        + " END"
    )
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    return {
        "tok": tok,
        "quality": quality,
        "lang_case": lang_case,
        "norm": norm,
    }


def _pipeline_sql() -> str:
    e = _scored_exprs()
    tok, quality, lang_case, norm = (
        e["tok"], e["quality"], e["lang_case"], e["norm"],
    )
    return f"""
    WITH scored AS (
      SELECT doc_id,
             len({tok})   AS n_tokens,
             {quality}    AS quality,
             {lang_case}  AS lang_guess,
             md5({norm})  AS fp
      FROM documents
    ),
    filtered AS (
      SELECT * FROM scored WHERE lang_guess = 'en' AND quality >= 0.3
    ),
    reps AS (SELECT fp, min(doc_id) AS doc_id FROM filtered GROUP BY fp)
    SELECT f.doc_id, f.n_tokens, f.quality
    FROM filtered f JOIN reps r ON f.doc_id = r.doc_id
    WHERE {sample_gate_sql("f.doc_id", 0.5, seed=99)}
    """


@register("curation_pipeline", _pipeline_sql(), tags=["curation", "pipeline"])
def curation_pipeline(spark, sf_dir):
    """The end-to-end curation composition every stage above exists for:
    language-ID filter -> quality-score filter -> exact dedup (keep the
    min-id representative per content fingerprint) -> deterministic 50%
    sample.  One declarative plan: Catalyst pushes the scalar filters to
    the scan, the dedup is the only shuffle, and the hash-gate sample is
    a free post-join filter — the 100 TB shape of a corpus-prep job."""
    from ffiec_pq_spark.operators.sampling import sample_gate
    from ffiec_pq_spark.operators.text import (
        LANG_MARKERS,
        fingerprint_md5,
        lang_scores_tok,
        quality_score_tok,
        tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    # project the token array ONCE, build every condition over it:
    # Catalyst does not CSE a split() referenced in many boolean
    # branches, so the direct form re-ran the tokenizer ~70x per row
    toksdf = d.select("doc_id", "text", tokens("text").alias("toks"))
    scores = lang_scores_tok(F.col("toks"))
    greatest = F.greatest(*scores.values())
    lang_expr = None
    for lang in LANG_MARKERS:
        cond = scores[lang] == greatest
        lang_expr = F.when(cond, lang) if lang_expr is None else lang_expr.when(cond, lang)
    scored = toksdf.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        quality_score_tok(F.col("toks"), "text").alias("quality"),
        lang_expr.alias("lang_guess"),
        fingerprint_md5("text").alias("fp"),
    )
    # observe() is a zero-cost optimizer fence: predicate pushdown would
    # otherwise substitute quality/lang_guess back into split()-per-branch
    # form below the projection; as a bonus it emits a free row-count
    # metric for the curation funnel
    scored = scored.observe(
        "curation_scored", F.count(F.lit(1)).alias("n_scored")
    )
    filtered = scored.filter(
        (F.col("lang_guess") == "en") & (F.col("quality") >= 0.3)
    )
    reps = filtered.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return (
        filtered.join(reps.select("doc_id"), "doc_id", "left_semi")
        .filter(sample_gate("doc_id", 0.5, seed=99))
        .select("doc_id", "n_tokens", "quality")
    )


def _balanced_sql() -> str:
    from ffiec_pq_spark.functions.hashing import hash60_sql

    gate = f"({hash60_sql('o.o_orderkey', 21)} % 10000)"
    return f"""
    WITH counts AS (
      SELECT o_orderstatus, count(*) AS cnt FROM orders GROUP BY 1
    ),
    mn AS (SELECT min(cnt) AS min_cnt FROM counts),
    gates AS (
      SELECT o_orderstatus, (min_cnt * 10000) // cnt AS gate
      FROM counts, mn
    ),
    sampled AS (
      SELECT o.o_orderstatus
      FROM orders o JOIN gates g USING (o_orderstatus)
      WHERE {gate} < g.gate
    )
    SELECT c.o_orderstatus,
           CAST(c.cnt AS BIGINT) AS n_total,
           CAST(count(s.o_orderstatus) AS BIGINT) AS n_sampled
    FROM counts c LEFT JOIN sampled s USING (o_orderstatus)
    GROUP BY 1, c.cnt
    """


@register(
    "stratified_balance_counts",
    _balanced_sql(),
    tags=["curation", "sampling"],
)
def stratified_balance_counts(spark, sf_dir):
    """Class-balanced downsampling audit: every order-status stratum is
    deterministically hash-gate-sampled at min_count/count, so the
    dominant statuses fall to roughly the rarest one's size — per
    stratum the original and sampled counts.  The gate threshold is
    integer arithmetic on both engines, so the exact subset (not just
    its size) is engine-portable."""
    from ffiec_pq_spark.operators.sampling import balanced_sample

    o = load_table(spark, sf_dir, "orders")
    totals = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_total")
    )
    sampled = balanced_sample(o, "o_orderkey", "o_orderstatus", seed=21)
    n_sampled = sampled.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )
    return totals.join(n_sampled, "o_orderstatus", "left").select(
        "o_orderstatus",
        "n_total",
        F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
    )


@register(
    "leakage_safe_split_counts",
    f"""
    WITH g AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS chash
      FROM documents
    ),
    assigned AS (
      SELECT doc_id, chash,
             CASE
               WHEN ({hash60_sql('chash', seed=7)}) % 10 < 8 THEN 'train'
               WHEN ({hash60_sql('chash', seed=7)}) % 10 = 8 THEN 'val'
               ELSE 'test'
             END AS split
      FROM g
    ),
    straddle AS (
      SELECT CAST(count(*) AS BIGINT) AS n_straddling_groups
      FROM (
        SELECT chash FROM assigned GROUP BY chash
        HAVING count(DISTINCT split) > 1
      )
    )
    SELECT a.split,
           count(*) AS n_docs,
           count(DISTINCT a.chash) AS n_groups,
           s.n_straddling_groups
    FROM assigned a CROSS JOIN straddle s
    GROUP BY a.split, s.n_straddling_groups
    """,
    tags=["curation", "split", "dedup"],
)
def leakage_safe_split_counts(spark, sf_dir):
    """Dedup-aware train/val/test split: the split is a deterministic
    hash of the document's NORMALIZED CONTENT (the same canonical form
    the dedup family keys on), so byte-identical duplicates always land
    in the same split — the leakage mode a row-hash split permits (one
    copy in train, one in eval) is structurally impossible, and the
    oracle hash-checks that as a pinned-zero ``n_straddling_groups``
    column.  80/10/10 by integer bucket arithmetic; per split: row and
    distinct-group counts.

    Scale: one narrow projection + two grouped aggregations; the
    content hash rides the scan (no join with a dedup table needed),
    and the same chash column is what the exact-dedup and SemDeDup
    collapse steps key on — the split composes with them for free."""
    from ffiec_pq_spark.operators.text import normalize_text

    d = load_table(spark, sf_dir, "documents")
    g = d.select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("chash")
    )
    bucket = hash60(F.col("chash"), seed=7) % 10
    assigned = g.select(
        "doc_id",
        "chash",
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
    )
    straddle = (
        assigned.groupBy("chash")
        .agg(F.countDistinct("split").alias("ns"))
        .agg(
            F.sum((F.col("ns") > 1).cast("long")).alias(
                "n_straddling_groups"
            )
        )
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("chash").alias("n_groups"),
        )
        .crossJoin(F.broadcast(straddle))
    )


_TEMP_BUDGET = 20_000  # target token budget across all sources


@register(
    "mixture_temperature_weights",
    f"""
    WITH tok AS (
      SELECT source,
             CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_tokens, n_docs, sqrt(CAST(n_tokens AS DOUBLE)) AS wt
      FROM tok
    ),
    tot AS (SELECT sum(wt) AS z FROM w)
    SELECT w.source,
           w.n_tokens,
           w.n_docs,
           round(w.wt / t.z, 6) AS share,
           CAST(floor(round(w.wt / t.z, 6) * {_TEMP_BUDGET}) AS BIGINT)
             AS target_tokens,
           CAST(least(1000000,
                CAST(floor(CAST(floor(round(w.wt / t.z, 6) * {_TEMP_BUDGET})
                     AS DOUBLE) / w.n_tokens * 1000000) AS BIGINT))
             AS BIGINT) AS keep_permil
    FROM w, tot t
    """,
    tags=["curation", "mixture"],
)
def mixture_temperature_weights(spark, sf_dir):
    """Temperature-based mixture reweighting (the multilingual-LLM
    resampling scheme): per-source sampling share ∝ n_tokens^alpha
    with alpha = 0.5, so low-resource sources are up-weighted relative
    to their raw share.  Emits the share, the token target under a
    fixed budget, and the per-source keep rate in integer permille
    (the deterministic hash-gate threshold ``mixture_sample`` consumes).

    alpha is fixed at 0.5 deliberately: ``pow(n, 0.5)`` IS ``sqrt``,
    which IEEE 754 requires to be correctly rounded — so both engines
    compute bit-identical weights (an arbitrary alpha would go through
    libm ``pow``, whose last-ulp rounding differs across engines and
    would poison the strict hash).  One grouped aggregation + a
    broadcast one-row total; everything else is scalar arithmetic."""
    from ffiec_pq_spark.operators.text import token_count

    d = load_table(spark, sf_dir, "documents")
    tok = d.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).alias("n_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    w = tok.select(
        "source",
        "n_tokens",
        "n_docs",
        F.sqrt(F.col("n_tokens").cast("double")).alias("wt"),
    )
    tot = w.agg(F.sum("wt").alias("z"))
    share = F.round(F.col("wt") / F.col("z"), 6)
    target = F.floor(share * _TEMP_BUDGET).cast("long")
    keep = F.least(
        F.lit(1_000_000).cast("long"),
        F.floor(
            target.cast("double") / F.col("n_tokens") * 1_000_000
        ).cast("long"),
    )
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        "n_docs",
        share.alias("share"),
        target.alias("target_tokens"),
        keep.alias("keep_permil"),
    )


@register(
    "weighted_sample_topk",
    f"""
    SELECT doc_id, lang, source, n_chars
    FROM (
      SELECT doc_id, lang, source, n_chars,
             {hash60_sql('doc_id')} // n_chars AS _priority
      FROM documents WHERE n_chars > 0
    )
    ORDER BY _priority, doc_id LIMIT 100
    """,
    tags=["sampling", "curation"],
)
def weighted_sample_topk(spark, sf_dir):
    """Deterministic weight-biased sample: the 100 documents with the
    smallest ``hash60(doc_id) div n_chars`` priority — longer documents
    proportionally more likely, same subset on any engine / partitioning
    (integer-only A-ES analogue).  Plans as TakeOrderedAndProject:
    per-partition top-k merged at the driver, no global sort."""
    from ffiec_pq_spark.operators.sampling import weighted_priority_topk

    docs = load_table(spark, sf_dir, "documents")
    return weighted_priority_topk(
        docs.select("doc_id", "lang", "source", "n_chars"),
        key_col="doc_id",
        weight_col="n_chars",
        k=100,
    ).drop("_priority")
