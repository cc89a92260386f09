"""Text-analysis operators for large-scale training-data pipelines:
tokenization, language-ID heuristic, quality scoring, fingerprinting,
shingling.  Everything is a built-in column expression (no Python UDFs)
so the hot path stays inside whole-stage codegen at 100 TB.

Each helper returns a ``Column`` (composable) and has an exact SQL
mirror used by the oracle-checked queries in
``ffiec_pq_spark/queries/text.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# distinct-marker sets for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de", "shi", "zai", "le", "he"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def normalize_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace (canonical form for fingerprints)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization -> array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# RE2-safe (no lookarounds) so the DuckDB oracle can run the identical
# pattern: camelCase splits at each capitalized piece, digit runs are
# their own pieces
BPE_PIECE_RE = r"[A-Z][a-z]*|[a-z]+|[0-9]+"


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count (a cheap BPE proxy): word pieces =
    capitalized runs, lowercase runs, digit runs — so ``fooBar2000``
    counts 3 pieces where whitespace tokenization counts 1."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PIECE_RE), 0))


def marker_score(col: Column | str, markers: list[str]) -> Column:
    """|distinct tokens ∩ markers| — the language-ID score primitive."""
    return F.size(F.array_intersect(tokens(col), F.array(*[F.lit(m) for m in markers])))


def marker_score_tok(tok_col: Column, markers: list[str]) -> Column:
    """:func:`marker_score` over a PRE-PROJECTED token array column —
    the CSE-friendly form: project ``tokens(text)`` once, then build all
    conditions over it (Catalyst does not dedup a ``split`` referenced
    inside many separate boolean branches)."""
    return F.size(
        F.array_intersect(tok_col, F.array(*[F.lit(m) for m in markers]))
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    return {lang: marker_score(col, ms) for lang, ms in LANG_MARKERS.items()}


def lang_scores_tok(tok_col: Column) -> dict[str, Column]:
    return {
        lang: marker_score_tok(tok_col, ms) for lang, ms in LANG_MARKERS.items()
    }


def stopword_ratio(col: Column | str) -> Column:
    """distinct-stopword hits / token count."""
    return marker_score(col, STOPWORDS) / F.greatest(token_count(col), F.lit(1))


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[.,;:!?]"), 0))


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: length band + stopword
    presence - punctuation excess.  (Formula is arbitrary but fixed; the
    oracle mirrors it exactly.)"""
    return quality_score_tok(tokens(col), col)


def quality_score_tok(tok_col: Column, text_col: Column | str) -> Column:
    """:func:`quality_score` over a pre-projected token array (same
    formula bit-for-bit; punctuation still reads the raw text)."""
    n_tok = F.size(tok_col).cast("double")
    len_band = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    sw = (
        marker_score_tok(tok_col, STOPWORDS)
        / F.greatest(F.size(tok_col), F.lit(1))
    ) * 5.0
    punct_pen = F.least(
        punct_count(text_col).cast("double") / F.greatest(n_tok, F.lit(1.0)),
        F.lit(1.0),
    )
    return F.round(
        F.greatest(
            F.least(0.5 * len_band + 0.5 * F.least(sw, F.lit(1.0)) - 0.2 * punct_pen, F.lit(1.0)),
            F.lit(0.0),
        ),
        6,
    )


def quality_score_sql(text_col: str = "text") -> str:
    """DuckDB mirror of :func:`quality_score` — THE single source of
    the oracle-side formula (quality_composite_filter and
    quality_threshold_sweep both embed this string, so the gate and its
    tuning sweep can never drift apart).

    Association is pinned IDENTICAL to :func:`quality_score_tok` on the
    Spark side: the stopword term is ``(count / n) * 5.0`` in BOTH
    engines (not ``5.0 * count / n``) — a different association can
    differ by 1 ulp and flip the 6-dp round the strict compare hashes."""
    tok = f"string_split_regex(trim({text_col}), '\\s+')"
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""round(greatest(least(
             0.5 * least(len({tok}) / 50.0, 1.0)
             + 0.5 * least((len(list_intersect({tok}, [{stops}]))
                            / greatest(len({tok}), 1)) * 5.0, 1.0)
             - 0.2 * least(len(regexp_extract_all({text_col}, '[.,;:!?]'))
                           / greatest(CAST(len({tok}) AS DOUBLE), 1.0), 1.0),
             1.0), 0.0), 6)"""


def fingerprint_md5(col: Column | str) -> Column:
    """Content fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(col))


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-gram shingle array (may contain duplicates; wrap in
    ``array_distinct`` for set semantics).

    Pure expression — ``transform(sequence(...))`` over the token array,
    no explode/shuffle, so it composes into any downstream plan.
    """
    w = tokens(col)
    n = F.size(w)
    return F.when(n < k, F.array(F.concat_ws(" ", w))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, k)),
        )
    )


import itertools as _itertools

_WINNOW_IDS = _itertools.count()


def winnow_fingerprints_df(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    hash_fn=None,
    collapse_exact: bool = True,
):
    """Winnowed rolling-hash fingerprints (the MOSS scheme):
    (id, fps array<long>) where fps = distinct minima of each sliding
    ``window`` of char-k-gram hashes over the normalized text.
    Guarantees every shared substring of length >= window+k-1 shares a
    fingerprint, at ~2/(window+1) the storage of all grams.

    This is deliberately a DataFrame-level operator, NOT a single
    Column: a lambda body re-evaluates any non-attribute subexpression
    PER ARRAY ELEMENT, so composing gram-hashing and window-minima in
    one expression re-hashes the whole gram array once per window —
    O(n²) md5 calls per row (measured: ~2 s/doc).  Materializing each
    stage as a real column behind an ``observe`` fence (CollapseProject
    does not merge through CollectMetrics) makes the lambda reference a
    bound attribute instead, restoring O(n).  No explode, no shuffle.

    Default ``fast_hash64`` (xxhash64, whole-stage codegen) is the
    100 TB path — md5-per-character-gram measured 5.4× wall at 8× data
    vs 2.9× for xxhash64 (SCALECHECK).  Pass ``hash_fn=hash60`` only
    when cross-engine oracle verification is needed (the portable md5
    hash is reproducible in ANSI SQL; xxhash64 is not).

    ``collapse_exact`` (default): fingerprints are a pure function of
    the normalized text, so they are computed ONCE per distinct
    content (keyed by one md5 of the whole text) and joined back to
    every carrying document — the per-character-gram hashing, the
    dominant cost, stops scaling with duplication.  The join key is
    the 32-char content hash, not the text itself, so the rejoin
    shuffles narrow rows."""
    from ffiec_pq_spark.functions.hashing import fast_hash64
    from ffiec_pq_spark.session import spread

    hash_fn = hash_fn or fast_hash64
    uid = next(_WINNOW_IDS)
    if collapse_exact:
        keyed = spread(df.select(F.col(id_col), F.col(text_col))).select(
            F.col(id_col), fingerprint_md5(text_col).alias("_chash"),
            F.col(text_col),
        )
        distinct_docs = (
            keyed.groupBy("_chash")
            .agg(F.first(text_col).alias(text_col))
            .withColumnRenamed("_chash", "_rep_chash")
        )
        rep_fps = winnow_fingerprints_df(
            distinct_docs.select(
                F.col("_rep_chash").alias(id_col), F.col(text_col)
            ),
            text_col, id_col, k, window, hash_fn, collapse_exact=False,
        ).select(F.col(id_col).alias("_rep_chash"), "fps")
        return keyed.select(id_col, "_chash").join(
            rep_fps, F.col("_chash") == F.col("_rep_chash")
        ).select(id_col, "fps")
    # spread first: gram hashing is the CPU-heavy stage, and small-file
    # corpora arrive as few scan splits (same call as doc_shingles)
    normed = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), normalize_text(text_col).alias("_norm")
    ).observe(f"winnow_norm_{uid}", F.count(F.lit(1)).alias("n_rows"))
    n_grams = F.greatest(F.length("_norm") - (k - 1), F.lit(1))
    hashed = normed.select(
        id_col,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: hash_fn(F.substring(F.col("_norm"), i, k)),
        ).alias("_hs"),
    ).observe(f"winnow_hashed_{uid}", F.count(F.lit(1)).alias("n_rows"))
    n_wins = F.greatest(F.size("_hs") - (window - 1), F.lit(1))
    wins = F.transform(
        F.sequence(F.lit(1), n_wins),
        lambda j: F.array_min(F.slice(F.col("_hs"), j, window)),
    )
    return hashed.select(id_col, F.array_distinct(wins).alias("fps"))


def gram_dup_fraction(col: Column | str, k: int = 2) -> Column:
    """Gopher-style repetition signal: the fraction of word ``k``-grams
    that are repeats of an earlier gram in the same document,
    ``(n_grams - n_distinct_grams) / n_grams``.

    Pure expression over :func:`shingles` — no explode, no shuffle; the
    ratio is integer/integer so both engines compute the identical
    double before rounding."""
    sh = shingles(col, k)
    n = F.size(sh)
    return (n - F.size(F.array_distinct(sh))) / n.cast("double")


def gram_dup_fraction_sql(expr: str, k: int = 2) -> str:
    """DuckDB mirror of :func:`gram_dup_fraction`."""
    sh = shingles_sql(expr, k)
    return (
        f"(len({sh}) - len(list_distinct({sh}))) / CAST(len({sh}) AS DOUBLE)"
    )


# PII patterns, RE2-safe (no lookarounds, no backreferences) so the
# DuckDB oracle runs the IDENTICAL pattern strings.  Deliberately
# simple/high-precision forms — production corpora tune these; the
# operator contract is "regex sweep + replace + count, JVM-side".
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}-\d{4}\b", "<PHONE>"),
}


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-pattern match counts (the audit half of PII scrubbing)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        for name, (pat, _) in PII_PATTERNS.items()
    }


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its placeholder token.  Order is
    fixed (email -> ipv4 -> phone) so an email's domain dots are
    consumed before the IPv4 sweep.  All JVM regexp_replace — the
    100 TB path stays in whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in PII_PATTERNS.values():
        c = F.regexp_replace(c, pat, repl)
    return c


def redact_pii_sql(expr: str) -> str:
    """DuckDB mirror of :func:`redact_pii` (global-flag replaces,
    same order)."""
    e = expr
    for pat, repl in PII_PATTERNS.values():
        e = f"regexp_replace({e}, '{pat}', '{repl}', 'g')"
    return e


def shingles_sql(expr: str, k: int = 3) -> str:
    """DuckDB mirror of :func:`shingles` (oracle side)."""
    w = f"string_split_regex(trim({expr}), '\\s+')"
    return (
        f"CASE WHEN len({w}) < {k} THEN [array_to_string({w}, ' ')] "
        f"ELSE list_transform(generate_series(1, len({w}) - {k - 1}), "
        f"i -> array_to_string(list_slice({w}, i, i + {k - 1}), ' ')) END"
    )
