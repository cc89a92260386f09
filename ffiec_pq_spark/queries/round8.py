"""Round-8 queries: substring-level exact dedup (ExactSubstr) and
streaming MinHash-LSH near-duplicate detection — the two dedup
granularities the document-pair family (queries/dedup.py) does not
cover.  Both are strict-oracle certified: the DuckDB SQL replays the
identical pipeline (portable md5-prefix hashes, same permutation
constants), so banding, anchoring, and run extension are verified
cross-engine bit-for-bit, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.functions.hashing import hash60_sql
from ffiec_pq_spark.operators.exactsubstr import (
    exact_substring_dup_rate,
    exact_substring_spans,
)
from ffiec_pq_spark.session import load_table

# ExactSubstr knobs: k=8-token anchors (long enough that chance repeats
# in natural text are rare; the synthetic corpus's planted near-dup
# spans are comfortably longer), >= 2 occurrences anywhere = duplicated.
_ES_K = 8
_ES_MIN_OCC = 2


def _exactsubstr_anchor_cte(k: int) -> str:
    """Shared oracle CTEs: positional k-gram hashes -> duplicated-gram
    anchors -> gaps-and-islands regions (mirrors
    operators/exactsubstr.py stage for stage)."""
    w = "string_split_regex(trim(text), '\\s+')"
    gl = (
        f"CASE WHEN len({w}) < {k} THEN []::VARCHAR[] "
        f"ELSE list_transform(generate_series(1, len({w}) - {k - 1}), "
        f"i -> array_to_string(list_slice({w}, i, i + {k - 1}), ' ')) END"
    )
    return f"""
    g AS (
      SELECT id, generate_subscripts(gl, 1) AS pos, unnest(gl) AS gram
      FROM (SELECT doc_id AS id, {gl} AS gl FROM documents)
    ),
    hashed AS (SELECT id, pos, {hash60_sql('gram')} AS h FROM g),
    dup AS (SELECT h FROM hashed GROUP BY h HAVING count(*) >= {_ES_MIN_OCC}),
    anch AS (SELECT id, pos FROM hashed JOIN dup USING (h)),
    flg AS (
      SELECT id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY id ORDER BY pos)
                       <= {k}
                  THEN 0 ELSE 1 END AS brk
      FROM anch
    ),
    reg AS (
      SELECT id, pos,
             sum(brk) OVER (PARTITION BY id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS rid
      FROM flg
    ),
    spans AS (
      SELECT id, min(pos) AS span_start,
             max(pos) + {k - 1} AS span_end,
             count(*) AS n_anchors,
             max(pos) + {k - 1} - min(pos) + 1 AS span_tokens
      FROM reg GROUP BY id, rid
    )"""


@register(
    "docs_exactsubstr_spans",
    f"""
    WITH {_exactsubstr_anchor_cte(_ES_K)}
    SELECT id AS doc_id, span_start, span_end, n_anchors, span_tokens
    FROM spans
    """,
    tags=["dedup", "exactsubstr"],
)
def docs_exactsubstr_spans(spark, sf_dir):
    """Substring-level exact dedup (ExactSubstr, k-gram-anchor form):
    maximal token regions repeated verbatim >= 2 times anywhere in the
    corpus — within- or cross-document — as (doc_id, span_start,
    span_end, n_anchors, span_tokens) with 1-based inclusive token
    positions.  Scale shape: |token positions| rows through two keyed
    shuffles (gram-hash window count, per-doc window) with the gram
    expression — the dominant CPU — evaluated once; never all-pairs,
    never a global suffix array (operator docstring + ``gram_plan``
    measurements: operators/exactsubstr.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_substring_spans(
        docs, k=_ES_K, min_occurrences=_ES_MIN_OCC
    ).select(
        F.col("id").alias("doc_id"),
        "span_start",
        "span_end",
        "n_anchors",
        "span_tokens",
    )


@register(
    "docs_exactsubstr_dup_rate",
    f"""
    WITH {_exactsubstr_anchor_cte(_ES_K)},
    per_doc AS (
      -- sum(BIGINT) is HUGEINT in DuckDB; pin back to BIGINT so the
      -- driver's typed value-hash matches Spark's long
      SELECT id, sum(span_tokens)::BIGINT AS dup_tokens,
             count(*) AS n_spans
      FROM spans GROUP BY id
    )
    SELECT d.doc_id,
           len(string_split_regex(trim(d.text), '\\s+')) AS n_tokens,
           coalesce(p.dup_tokens, 0) AS dup_tokens,
           coalesce(p.n_spans, 0) AS n_spans,
           round(coalesce(p.dup_tokens, 0)
                 / greatest(len(string_split_regex(trim(d.text), '\\s+')), 1),
                 6) AS dup_rate
    FROM documents d LEFT JOIN per_doc p ON p.id = d.doc_id
    """,
    tags=["dedup", "exactsubstr"],
)
def docs_exactsubstr_dup_rate(spark, sf_dir):
    """Per-document duplicated-token budget from the ExactSubstr
    regions: (doc_id, n_tokens, dup_tokens, n_spans, dup_rate) for EVERY
    document (zeros when clean) — the thresholdable curation signal
    ("drop docs that are >30% boilerplate").  Regions are disjoint by
    construction so dup_tokens is a true token count, not an
    overcounted overlap sum."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_substring_dup_rate(
        docs, k=_ES_K, min_occurrences=_ES_MIN_OCC
    ).select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        "dup_tokens",
        "n_spans",
        "dup_rate",
    )


def _stream_neardup_oracle() -> str:
    """Batch replay of the streaming fold: a doc is a near-dup arrival
    iff some LSH band signature of it is shared with a SMALLER-id doc;
    dup_of = the smallest such first-owner over its bands."""
    from ffiec_pq_spark.queries.dedup import (
        _N_BANDS,
        _N_PERM,
        _P,
        _ROWS_PER_BAND,
        _SHINGLE_CTE,
    )
    from ffiec_pq_spark.operators.dedup import perm_params

    perms = perm_params(_N_PERM)
    mh_exprs = ",\n             ".join(
        f"min(({a} * (h % {_P}) + {b}) % {_P}) AS mh{i}" for i, a, b in perms
    )
    band_arms = "\n      UNION ALL\n".join(
        "      SELECT id, {bi} AS band, md5({concat}) AS bkey FROM sig".format(
            bi=bi,
            concat=" || ',' || ".join(
                f"CAST(mh{bi * _ROWS_PER_BAND + ri} AS VARCHAR)"
                for ri in range(_ROWS_PER_BAND)
            ),
        )
        for bi in range(_N_BANDS)
    )
    return f"""
    WITH {_SHINGLE_CTE},
    hashed AS (SELECT id, {hash60_sql('shingle')} AS h FROM sh),
    sig AS (
      SELECT id, {mh_exprs}
      FROM hashed GROUP BY id
    ),
    bands AS (
{band_arms}
    ),
    first_seen AS (
      SELECT band, bkey, min(id) AS first_id FROM bands GROUP BY band, bkey
    )
    SELECT b.id AS doc_id, min(f.first_id) AS dup_of
    FROM bands b
    JOIN first_seen f
      ON b.band = f.band AND b.bkey = f.bkey AND f.first_id < b.id
    GROUP BY b.id
    """


@register(
    "stream_minhash_neardup",
    _stream_neardup_oracle(),
    tags=["streaming", "dedup", "approx"],
)
def stream_minhash_neardup(spark, sf_dir):
    """Streaming NEAR-duplicate dedup — incremental MinHash-LSH via
    ``foreachBatch``: documents arrive in micro-batches (staged as four
    files, one per trigger), each batch computes its docs' MinHash
    signatures ONCE on arrival and folds only the compact band-signature
    rows (id, band, bkey — n_bands rows per doc, ~50 bytes each vs the
    raw text) into the accumulating state; the drained state alone —
    never a re-read of any document text — yields each doc's earliest
    same-band partner.  Output: (doc_id, dup_of) where dup_of = the
    smallest doc id sharing >= 1 of its 8 band signatures.

    Certification: the fold is a pure SET UNION (each doc's band rows
    depend only on its own text), so the drained state equals the batch
    band relation for ANY batch order/sizing, and the result is
    hash-equal to the batch LSH answer the oracle replays in SQL — the
    same contract ``stream_upsert_latest`` pins for associative merge
    state.

    Bounded state at scale: band rows are the canonical streaming-dedup
    state (O(corpus) like any seen-key dedup); run the same plan with a
    watermark-expired state store (dropDuplicatesWithinWatermark
    semantics, queries/streaming_queries.py) when dedup only needs a
    lateness horizon rather than all history.  Deploy shape for the
    parquet-fold variant: the append writes one file per micro-batch, so
    a long-lived stream (thousands of triggers) should either run the
    band state through the state store as above, or periodically COMPACT
    the band relation (read + coalesce + rewrite between triggers, or a
    second availableNow maintenance stream) so the drain never pays a
    small-files scan — the fold is a set union, so compaction commutes
    with it; ``stream_neardup_compacted`` (queries/round9.py) RUNS that
    maintenance step mid-stream and certifies the commutation against
    this query's own oracle.  The decision pass is one
    (band, bkey)-keyed aggregation + one same-keyed join — wide hashed
    key space, no skew magnet, no all-pairs."""
    from ffiec_pq_spark.streaming.neardup import run_neardup_stream

    return run_neardup_stream(spark, sf_dir)
