"""Blocked record-linkage query over ``documents``: the
entity-resolution shape (blocking key + edit-distance comparison),
oracle-checked against the naive within-block levenshtein join."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.operators.linkage import blocked_levenshtein_pairs
from ffiec_pq_spark.session import load_table

_PREFIX_LEN = 24
_MAX_DIST = 10


@register(
    "linkage_blocked_pairs",
    f"""
    WITH reps AS (
      SELECT min(doc_id) AS id
      FROM (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS ch
        FROM documents
      ) GROUP BY ch
    ),
    base AS (
      SELECT d.lang, d.doc_id AS id,
             substr(d.text, 1, {_PREFIX_LEN}) AS cmp
      FROM documents d JOIN reps r ON r.id = d.doc_id
    )
    SELECT a.lang,
           a.id AS id_a, b.id AS id_b,
           levenshtein(a.cmp, b.cmp) AS dist
    FROM base a
    JOIN base b
      ON a.lang = b.lang AND a.id < b.id
    WHERE levenshtein(a.cmp, b.cmp) <= {_MAX_DIST}
    """,
    tags=["linkage", "dedup"],
)
def linkage_blocked_pairs(spark, sf_dir):
    """Record linkage with language blocking, on DISTINCT content only
    (exact copies collapse to their min-id representative first — the
    same duplicate-collapse that keeps every pairwise operator linear
    on duplicate-heavy corpora): candidate pairs whose 24-char title
    prefixes are within levenshtein distance 10, compared ONLY within
    a block — O(Σ block²) instead of O(n²), with a fail-fast
    block-size guard and Spark's bounded three-arg ``levenshtein``
    (the DP short-circuits past the threshold).  The oracle runs the
    naive unbounded within-block join."""
    from ffiec_pq_spark.operators.dedup import exact_dedup_groups

    docs = load_table(spark, sf_dir, "documents")
    reps = exact_dedup_groups(docs).select(F.col("rep_id").alias("doc_id"))
    rd = docs.join(reps, "doc_id", "left_semi")
    return blocked_levenshtein_pairs(
        rd,
        id_col="doc_id",
        compare_col=F.substring("text", 1, _PREFIX_LEN),
        block_cols=["lang"],
        max_dist=_MAX_DIST,
        max_block_rows=100_000,
    )


_SN_WINDOW = 5


@register(
    "linkage_sorted_neighborhood",
    f"""
    WITH reps AS (
      SELECT min(doc_id) AS id
      FROM (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS ch
        FROM documents
      ) GROUP BY ch
    ),
    base AS (
      SELECT d.doc_id AS id, substr(d.text, 1, {_PREFIX_LEN}) AS cmp
      FROM documents d JOIN reps r ON r.id = d.doc_id
    ),
    ranked AS (
      SELECT id, cmp, row_number() OVER (ORDER BY cmp, id) AS pos
      FROM base
    )
    SELECT a.id AS id_a, b.id AS id_b,
           levenshtein(a.cmp, b.cmp) AS dist
    FROM ranked a
    JOIN ranked b ON b.pos BETWEEN a.pos + 1 AND a.pos + {_SN_WINDOW}
    WHERE levenshtein(a.cmp, b.cmp) <= {_MAX_DIST}
    """,
    tags=["linkage", "dedup"],
)
def linkage_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood linkage on distinct content: rows sort by
    the 24-char title prefix and each compares to its 5 successors —
    n x 5 comparisons total, catching near-matches that hard blocking
    splits across blocks.  The global order is computed WITHOUT a
    single-partition window (per-prefix parallel ranks + driver-side
    additive offsets); the oracle replays the naive global row_number
    formulation."""
    from ffiec_pq_spark.operators.dedup import exact_dedup_groups
    from ffiec_pq_spark.operators.linkage import sorted_neighborhood_pairs

    docs = load_table(spark, sf_dir, "documents")
    reps = exact_dedup_groups(docs).select(F.col("rep_id").alias("doc_id"))
    rd = docs.join(reps, "doc_id", "left_semi")
    return sorted_neighborhood_pairs(
        rd,
        id_col="doc_id",
        sort_key=F.substring("text", 1, _PREFIX_LEN),
        compare_col=F.substring("text", 1, _PREFIX_LEN),
        window=_SN_WINDOW,
        max_dist=_MAX_DIST,
    )
