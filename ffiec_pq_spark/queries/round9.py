"""Round-9 queries: substring-level eval-set decontamination (the
eval-vs-train member of the ExactSubstr family — the audit an evals
team runs FIRST: "is any benchmark answer string pasted verbatim into
the training corpus?") and the per-stratum deterministic sampler.

Both are strict-oracle certified: the DuckDB SQL replays the identical
pipeline (portable md5-prefix hashes, same k-gram anchoring and
gaps-and-islands run extension), so the cross-corpus anchoring is
verified bit-for-bit, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.functions.hashing import hash60_sql
from ffiec_pq_spark.operators.exactsubstr import exact_substring_contamination
from ffiec_pq_spark.session import load_table

# Same anchor knobs as the corpus-internal ExactSubstr queries
# (queries/round8.py): k=8-token grams.
_ES_K = 8

# Deterministic eval/train split of the documents table: content-keyed
# on doc_id so the same doc always lands on the same side (the split
# itself is the certified train_eval_split semantics — here a modulus
# keeps the oracle SQL trivial and the eval side ~10%).
_EVAL_MOD = 10
_EVAL_RESIDUE = 7


def _contamination_oracle(k: int) -> str:
    """Stage-for-stage DuckDB replay of
    :func:`exact_substring_contamination` over the modulus split:
    eval-side positional k-gram hashes, train side reduced to DISTINCT
    hashes, anchors = eval positions whose hash occurs in train, then
    the shared gaps-and-islands run extension and per-doc rollup."""
    w = "string_split_regex(trim(text), '\\s+')"
    gl = (
        f"CASE WHEN len({w}) < {k} THEN []::VARCHAR[] "
        f"ELSE list_transform(generate_series(1, len({w}) - {k - 1}), "
        f"i -> array_to_string(list_slice({w}, i, i + {k - 1}), ' ')) END"
    )
    split = f"doc_id % {_EVAL_MOD} = {_EVAL_RESIDUE}"
    return f"""
    WITH ev_g AS (
      SELECT id, generate_subscripts(gl, 1) AS pos, unnest(gl) AS gram
      FROM (SELECT doc_id AS id, {gl} AS gl FROM documents WHERE {split})
    ),
    ev AS (SELECT id, pos, {hash60_sql('gram')} AS h FROM ev_g),
    tr_g AS (
      SELECT unnest(gl) AS gram
      FROM (SELECT {gl} AS gl FROM documents WHERE NOT ({split}))
    ),
    tr_h AS (SELECT DISTINCT {hash60_sql('gram')} AS h FROM tr_g),
    anch AS (SELECT id, pos FROM ev JOIN tr_h USING (h)),
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
             max(pos) + {k - 1} - min(pos) + 1 AS span_tokens
      FROM reg GROUP BY id, rid
    ),
    per_doc AS (
      -- sum(BIGINT) is HUGEINT in DuckDB; pin back to BIGINT so the
      -- driver's typed value-hash matches Spark's long
      SELECT id, sum(span_tokens)::BIGINT AS contaminated_tokens,
             count(*) AS n_spans
      FROM spans GROUP BY id
    )
    SELECT d.doc_id,
           len(string_split_regex(trim(d.text), '\\s+')) AS n_tokens,
           p.contaminated_tokens,
           p.n_spans,
           round(p.contaminated_tokens
                 / greatest(len(string_split_regex(trim(d.text), '\\s+')), 1),
                 6) AS contamination_rate
    FROM documents d JOIN per_doc p ON p.id = d.doc_id
    WHERE {split}
    """


@register(
    "eval_exactsubstr_contamination",
    _contamination_oracle(_ES_K),
    tags=["dedup", "exactsubstr", "decontamination"],
)
def eval_exactsubstr_contamination(spark, sf_dir):
    """Substring-level eval-set decontamination: eval docs (a stable
    ~10% modulus split of ``documents``) carrying >= 1 verbatim k-token
    run that appears ANYWHERE in the train split, as (doc_id, n_tokens,
    contaminated_tokens, n_spans, contamination_rate).  Unlike the
    shingle-overlap report (``contamination_overlap``, order-free SET
    overlap), this finds CONTIGUOUS >= k-token verbatim runs — a pasted
    benchmark answer trips it even when the documents are otherwise
    unrelated.

    Scale shape (operators/exactsubstr.py): train side is reduced to
    DISTINCT gram hashes BEFORE the semi-join (one map-side-combined
    aggregate — the join probes |train vocab|, never |train positions|),
    anchors ride one keyed semi-join on the 60-bit hash, run extension
    is one per-doc window.  Never all-pairs, never a cross-corpus scan
    per eval doc; the plan-pin test forbids cartesian/BNLJ/
    single-partition regressions."""
    docs = load_table(spark, sf_dir, "documents")
    is_eval = (F.col("doc_id") % _EVAL_MOD) == _EVAL_RESIDUE
    return exact_substring_contamination(
        docs.filter(is_eval), docs.filter(~is_eval), k=_ES_K
    ).select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        "contaminated_tokens",
        "n_spans",
        "contamination_rate",
    )


def _cleaned_oracle() -> str:
    """Replay of :func:`exact_substring_cleaned`: the shared corpus
    anchor/span CTEs (queries/round8.py — identical k and
    min_occurrences), then positional removal via NOT EXISTS against
    the span intervals and an ordered string_agg rebuild."""
    from ffiec_pq_spark.queries.round8 import _ES_K as K8
    from ffiec_pq_spark.queries.round8 import _exactsubstr_anchor_cte

    assert K8 == _ES_K
    return f"""
    WITH {_exactsubstr_anchor_cte(_ES_K)},
    tok AS (
      SELECT id, generate_subscripts(w, 1) AS pos, unnest(w) AS tok
      FROM (SELECT doc_id AS id,
                   string_split_regex(trim(text), '\\s+') AS w
            FROM documents)
    ),
    kept AS (
      SELECT t.id, t.pos, t.tok
      FROM tok t
      WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.id = t.id AND t.pos BETWEEN s.span_start AND s.span_end
      )
    ),
    kc AS (
      SELECT id, count(*) AS kept_tokens,
             string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
      FROM kept GROUP BY id
    )
    SELECT d.doc_id,
           len(string_split_regex(trim(d.text), '\\s+')) AS n_tokens,
           coalesce(kc.kept_tokens, 0) AS kept_tokens,
           len(string_split_regex(trim(d.text), '\\s+'))
             - coalesce(kc.kept_tokens, 0) AS removed_tokens,
           coalesce(kc.cleaned_text, '') AS cleaned_text
    FROM documents d LEFT JOIN kc ON kc.id = d.doc_id
    """


@register(
    "docs_exactsubstr_cleaned",
    _cleaned_oracle(),
    tags=["dedup", "exactsubstr"],
)
def docs_exactsubstr_cleaned(spark, sf_dir):
    """The ExactSubstr REMOVAL transform: every document with its
    duplicated (>= 2 occurrences corpus-wide) token regions stripped —
    (doc_id, n_tokens, kept_tokens, removed_tokens, cleaned_text), a
    total function of the corpus (clean docs pass through).  This is
    the step that actually PRODUCES the deduplicated training corpus;
    the spans/dup_rate queries are its audit views.  Strip policy and
    scale shape: operator docstring (operators/exactsubstr.py) — span
    relation compacts to one (id, spans) row per flagged doc, joins
    back KEYED on doc id, removal is a narrow higher-order filter over
    the token array; no |positions|-sized explode through the join."""
    from ffiec_pq_spark.operators.exactsubstr import exact_substring_cleaned
    from ffiec_pq_spark.queries.round8 import _ES_MIN_OCC

    docs = load_table(spark, sf_dir, "documents")
    return exact_substring_cleaned(
        docs, k=_ES_K, min_occurrences=_ES_MIN_OCC
    ).select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        "kept_tokens",
        "removed_tokens",
        "cleaned_text",
    )


# Per-language sampling rates: keep ALL of the rarest class, downsample
# the dominant one, and exercise the default-rate path for the
# unnamed strata ('es', 'de').
_STRATA_RATES = {"en": 0.3, "zh": 1.0, "fr": 0.8}
_STRATA_DEFAULT = 0.5


def _stratified_oracle() -> str:
    from ffiec_pq_spark.operators.sampling import _BUCKETS, _gate_buckets

    arms = "\n                ".join(
        f"WHEN '{lang}' THEN {_gate_buckets(rate)}"
        for lang, rate in sorted(_STRATA_RATES.items())
    )
    return f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE ({hash60_sql('doc_id')} % {_BUCKETS}) <
          CASE lang
                {arms}
                ELSE {_gate_buckets(_STRATA_DEFAULT)} END
    """


@register(
    "docs_stratified_sample",
    _stratified_oracle(),
    tags=["sampling", "curation"],
)
def docs_stratified_sample(spark, sf_dir):
    """Per-stratum deterministic sampling: each language is hash-gate
    sampled at its OWN rate (keep all of the rare class, downsample the
    dominant one, default rate for unnamed strata) — the class-rebalance
    step of a curation pipeline, fully reproducible on any engine /
    partitioning / day because membership is a pure function of the
    content key (operators/sampling.py docstring).  Pure column
    expressions: one scan, no shuffle, prunable."""
    from ffiec_pq_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs,
        key_col="doc_id",
        strata_col="lang",
        rates=_STRATA_RATES,
        default_rate=_STRATA_DEFAULT,
    ).select("doc_id", "lang", "source")
