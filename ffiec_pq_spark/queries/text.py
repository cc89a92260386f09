"""Text-analysis queries over the ``documents`` table: token stats,
language-ID heuristic, quality scoring, fingerprinting.  All pure column
expressions mirrored exactly in the SQL oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.functions.hashing import hash60, hash60_sql
from ffiec_pq_spark.operators.text import (
    LANG_MARKERS,
    STOPWORDS,
    fingerprint_md5,
    lang_scores,
    normalize_text,
    punct_count,
    quality_score,
    shingles_sql,
    stopword_ratio,
    token_count,
    tokens,
)
from ffiec_pq_spark.session import load_table

_TOK = "string_split_regex(trim(text), '\\s+')"


def _markers_sql(markers: list[str]) -> str:
    lits = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_intersect({_TOK}, [{lits}]))"


@register(
    "text_token_stats",
    f"""
    SELECT doc_id,
           len({_TOK})                 AS n_tokens,
           n_chars,
           round(CAST(n_chars AS DOUBLE) / len({_TOK}), 4) AS chars_per_token
    FROM documents
    """,
    tags=["text"],
)
def text_token_stats(spark, sf_dir):
    """Whitespace token counting (the 100 TB hot path: one split+size
    expression, no UDF)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        "n_chars",
        F.round(F.col("n_chars").cast("double") / token_count("text"), 4).alias(
            "chars_per_token"
        ),
    )


def _lang_case_sql() -> str:
    scores = {lang: _markers_sql(ms) for lang, ms in LANG_MARKERS.items()}
    greatest = "greatest(" + ", ".join(scores[l] for l in LANG_MARKERS) + ")"
    # first language (in fixed dict order) achieving the max — same
    # tie-break as the Spark CASE chain
    whens = " ".join(
        f"WHEN {scores[l]} = {greatest} THEN '{l}'" for l in LANG_MARKERS
    )
    return f"CASE {whens} END"


@register(
    "text_lang_id",
    f"""
    SELECT doc_id, lang AS labeled_lang,
           {_lang_case_sql()} AS guessed_lang
    FROM documents
    """,
    tags=["text"],
)
def text_lang_id(spark, sf_dir):
    """Language-ID heuristic: distinct-marker-token overlap per language,
    argmax with fixed-order tie-break."""
    d = load_table(spark, sf_dir, "documents")
    scores = lang_scores("text")
    greatest = F.greatest(*scores.values())
    expr = None
    for lang in LANG_MARKERS:
        cond = scores[lang] == greatest
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return d.select(
        "doc_id", F.col("lang").alias("labeled_lang"), expr.alias("guessed_lang")
    )


_STOP_LITS = ", ".join(f"'{s}'" for s in STOPWORDS)


@register(
    "text_quality_score",
    f"""
    SELECT doc_id,
           len({_TOK}) AS n_tokens,
           round(len(list_intersect({_TOK}, [{_STOP_LITS}]))
                 / greatest(len({_TOK}), 1), 6)                      AS stop_ratio,
           len(regexp_extract_all(text, '[.,;:!?]'))                 AS n_punct,
           round(greatest(least(
             0.5 * least(len({_TOK}) / 50.0, 1.0)
             + 0.5 * least(5.0 * len(list_intersect({_TOK}, [{_STOP_LITS}]))
                           / greatest(len({_TOK}), 1), 1.0)
             - 0.2 * least(len(regexp_extract_all(text, '[.,;:!?]'))
                           / greatest(CAST(len({_TOK}) AS DOUBLE), 1.0), 1.0),
             1.0), 0.0), 6)                                          AS quality
    FROM documents
    """,
    tags=["text"],
)
def text_quality_score(spark, sf_dir):
    """Quality scoring: length band + stopword ratio - punctuation excess
    (weights arbitrary but fixed; oracle mirrors exactly)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.round(stopword_ratio("text"), 6).alias("stop_ratio"),
        punct_count("text").alias("n_punct"),
        quality_score("text").alias("quality"),
    )


_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_FP_INT_SQL = hash60_sql(_NORM_SQL)


@register(
    "text_fingerprint",
    f"""
    SELECT doc_id,
           md5({_NORM_SQL}) AS fp_md5,
           {_FP_INT_SQL} AS fp_int
    FROM documents
    """,
    tags=["text"],
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 content hash + portable 60-bit
    integer fingerprint of the normalized text."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        fingerprint_md5("text").alias("fp_md5"),
        hash60(normalize_text("text")).alias("fp_int"),
    )


@register(
    "text_bpe_token_stats",
    f"""
    SELECT doc_id,
           len({_TOK}) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Z][a-z]*|[a-z]+|[0-9]+'))
             AS bpe_pieces,
           round(len(regexp_extract_all(text, '[A-Z][a-z]*|[a-z]+|[0-9]+'))
                 / greatest(CAST(len({_TOK}) AS DOUBLE), 1.0), 4)
             AS pieces_per_token
    FROM documents
    """,
    tags=["text", "tokens"],
)
def text_bpe_token_stats(spark, sf_dir):
    """Sub-word (BPE-proxy) token counting next to whitespace counting:
    pieces = capitalized / lowercase / digit runs (the fertility-style
    ratio pieces-per-word is the budget metric tokenizer pipelines
    track).  The piece regex is RE2-safe so the oracle runs the
    identical pattern."""
    from ffiec_pq_spark.operators.text import bpe_ish_token_count

    d = load_table(spark, sf_dir, "documents")
    ws = token_count("text")
    bpe = bpe_ish_token_count("text")
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_pieces"),
        F.round(bpe / F.greatest(ws.cast("double"), F.lit(1.0)), 4).alias(
            "pieces_per_token"
        ),
    )


@register(
    "text_winnow_fingerprints",
    f"""
    WITH g AS (
      SELECT doc_id, {_NORM_SQL} AS norm FROM documents
    ),
    h AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(length(norm) - 4, 1)),
               i -> (('0x' || substr(md5('s0:' || substr(norm, i, 5)), 1, 15))::BIGINT)
             ) AS hs
      FROM g
    ),
    w AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(hs) - 3, 1)),
               j -> list_min(hs[j:j+3])
             )) AS fps
      FROM h
    )
    SELECT doc_id, unnest(fps) AS fp FROM w
    """,
    tags=["text", "fingerprint"],
)
def text_winnow_fingerprints(spark, sf_dir):
    """Winnowing (rolling-hash) document fingerprints: min hash of each
    4-window of char-5-gram hashes, distinct per doc, exploded to
    (doc_id, fp) rows.  The local-min selection is what makes
    fingerprints robust to insertions — shared substrings of length
    >= 8 chars always share a fingerprint — and the oracle replays the
    same grams, hashes, and window minima element for element."""
    from ffiec_pq_spark.functions.hashing import hash60
    from ffiec_pq_spark.operators.text import winnow_fingerprints_df

    d = load_table(spark, sf_dir, "documents")
    # hash60 (portable md5) ONLY here, so the oracle can replay it; the
    # operator's default is fast_hash64 (the production path at scale).
    fps = winnow_fingerprints_df(
        d, "text", "doc_id", k=5, window=4, hash_fn=hash60
    )
    return fps.select("doc_id", F.explode("fps").alias("fp"))


@register(
    "substring_containment",
    f"""
    WITH g AS (
      SELECT doc_id, {{norm}} AS norm FROM documents
    ),
    h AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(length(norm) - 4, 1)),
               i -> (('0x' || substr(md5('s0:' || substr(norm, i, 5)), 1, 15))::BIGINT)
             ) AS hs
      FROM g
    ),
    w AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(hs) - 3, 1)),
               j -> list_min(hs[j:j+3])
             )) AS fps
      FROM h
    ),
    fps AS (SELECT doc_id, unnest(fps) AS fp FROM w),
    ev AS (SELECT doc_id, fp FROM fps WHERE doc_id % 10 = 0),
    tr AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 10 <> 0),
    shared AS (
      SELECT e.doc_id, count(*) AS n_shared
      FROM ev e JOIN tr t ON e.fp = t.fp
      GROUP BY 1
    )
    SELECT ev.doc_id,
           count(*) AS n_fps,
           coalesce(max(s.n_shared), 0) AS n_shared,
           round(CAST(coalesce(max(s.n_shared), 0) AS DOUBLE) / count(*), 6)
             AS containment
    FROM ev LEFT JOIN shared s ON ev.doc_id = s.doc_id
    GROUP BY 1
    """.replace("{norm}", _NORM_SQL),
    tags=["text", "fingerprint", "decontamination"],
)
def substring_containment(spark, sf_dir):
    """Substring-level containment (quote/contamination detection): for
    each held-out document, the fraction of its winnowing fingerprints
    that also occur anywhere in the train slice — catches verbatim
    reuse of >=8-char substrings, which shingle-level decontamination
    (word 3-grams) can miss across tokenization changes.  Reuses the
    winnowing operator on both slices; the join key is a 60-bit
    fingerprint, so the semi-join is uniform and the per-doc aggregate
    bounded."""
    from ffiec_pq_spark.operators.text import winnow_fingerprints_df

    d = load_table(spark, sf_dir, "documents")
    # persist: the fingerprint table feeds both the eval and train
    # slices; uncached, the winnowing (the CPU-heavy stage) runs twice.
    # Session-lifetime cache by design (CacheManager dedupes same-plan
    # persists; clearCache() between pipelines on long-lived sessions)
    fps = (
        winnow_fingerprints_df(d, "text", "doc_id", k=5, window=4, hash_fn=hash60)
        .select("doc_id", F.explode("fps").alias("fp"))
        .persist()
    )
    ev = fps.filter(F.col("doc_id") % 10 == 0)
    tr = fps.filter(F.col("doc_id") % 10 != 0).select("fp").distinct()
    shared = (
        ev.join(tr, "fp")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        ev.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_fps"))
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            "n_fps",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.round(
                F.coalesce("n_shared", F.lit(0)).cast("double") / F.col("n_fps"), 6
            ).alias("containment"),
        )
    )


@register(
    "fuzzy_token_pairs_ed1",
    """
    WITH toks AS (
      SELECT DISTINCT t AS tok FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
        FROM documents
        UNION ALL
        SELECT unnest(regexp_extract_all(lower(p_name), '[a-z]+')) AS t
        FROM part
      ) WHERE length(t) BETWEEN 3 AND 12
    ),
    vars AS (
      SELECT tok, unnest(list_append(
        list_transform(generate_series(1, length(tok)),
          i -> substr(tok, 1, i - 1) || substr(tok, i + 1, length(tok) - i)),
        tok)) AS v
      FROM toks
    ),
    pairs AS (
      SELECT DISTINCT a.tok AS tok_a, b.tok AS tok_b
      FROM vars a JOIN vars b ON a.v = b.v AND a.tok < b.tok
    )
    SELECT length(tok_a) AS len_a, count(*) AS n_pairs
    FROM pairs WHERE levenshtein(tok_a, tok_b) = 1
    GROUP BY 1
    """,
    tags=["text", "fuzzy-join"],
)
def fuzzy_token_pairs_ed1(spark, sf_dir):
    """Fuzzy string self-join at edit distance 1 via DELETION
    NEIGHBORHOODS (the SymSpell scheme): every token expands to its
    1-deletion variants plus itself, candidates are pairs sharing a
    variant (this covers substitutions — same position deleted on both
    — and insertions/deletions — one side's deletion equals the other
    token), and the built-in ``levenshtein`` verifies candidates
    exactly.  Output: ED-1 pair counts by token length.

    The scale contract is the whole point: a naive fuzzy join is
    O(|vocab|^2) levenshtein calls; the neighborhood join generates
    O(L) narrow variant rows per token, shuffles once on the variant
    key, and verifies only candidates.  Hot variants (short tokens'
    deletions) can be df-capped exactly like shingles
    (`operators/dedup.py`) if a real vocabulary needs it."""
    d = load_table(spark, sf_dir, "documents")
    p = load_table(spark, sf_dir, "part")
    words = d.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("tok")
    ).unionByName(
        p.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("p_name")), F.lit("[a-z]+"), 0
                )
            ).alias("tok")
        )
    )
    toks = words.filter(F.length("tok").between(3, 12)).distinct()
    vars_df = toks.select(
        "tok",
        F.explode(
            F.expr(
                "array_append(transform(sequence(1, length(tok)), "
                "i -> concat(substring(tok, 1, i - 1), "
                "substring(tok, i + 1, length(tok) - i))), tok)"
            )
        ).alias("v"),
    )
    a = vars_df.select(F.col("tok").alias("tok_a"), "v")
    b = vars_df.select(F.col("tok").alias("tok_b"), "v")
    pairs = (
        a.join(b, "v")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .select("tok_a", "tok_b")
        .distinct()
    )
    return (
        pairs.filter(F.levenshtein("tok_a", "tok_b") == 1)
        .groupBy(F.length("tok_a").alias("len_a"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "langid_confusion",
    f"""
    SELECT lang AS labeled_lang,
           {_lang_case_sql()} AS guessed_lang,
           count(*) AS n_docs,
           round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY lang)
                                 AS DOUBLE), 6) AS row_share
    FROM documents GROUP BY 1, 2
    """,
    tags=["text", "eval"],
)
def langid_confusion(spark, sf_dir):
    """Classifier-evaluation pattern: the lang-id heuristic's CONFUSION
    MATRIX against the labeled language — per (labeled, guessed) cell,
    doc count and the row-normalized share (recall on the diagonal).
    One grouped count + a window share over the tiny cell table; the
    heuristic itself is the same marker-overlap argmax the oracle
    mirrors."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    scores = lang_scores("text")
    greatest = F.greatest(*scores.values())
    expr = None
    for lang in LANG_MARKERS:
        cond = scores[lang] == greatest
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    cells = d.groupBy(
        F.col("lang").alias("labeled_lang"), expr.alias("guessed_lang")
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    share = F.col("n_docs") / F.sum("n_docs").over(
        Window.partitionBy("labeled_lang")
    ).cast("double")
    return cells.select(
        "labeled_lang",
        "guessed_lang",
        "n_docs",
        F.round(share, 6).alias("row_share"),
    )


@register(
    "doc_novelty_score",
    f"""
    WITH sh AS (
      SELECT doc_id AS id,
             unnest(list_distinct({shingles_sql('text', 3)})) AS shingle
      FROM documents
    ),
    dfs AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
    SELECT id AS doc_id,
           count(*) AS set_size,
           count(*) FILTER (WHERE df = 1) AS n_unique,
           round(count(*) FILTER (WHERE df = 1)
                 / CAST(count(*) AS DOUBLE), 6) AS novelty
    FROM sh JOIN dfs USING (shingle)
    GROUP BY id
    """,
    tags=["text", "dedup", "memorization"],
)
def doc_novelty_score(spark, sf_dir):
    """N-gram novelty: the share of a document's distinct 3-grams that
    appear NOWHERE else in the corpus — high novelty marks unique
    content worth keeping, zero novelty marks boilerplate/copies (the
    memorization-risk signal for training-data audits).

    Duplicate collapse (house pattern): document frequency is the
    copy-weighted sum over distinct content (Σ g == the naive corpus
    df exactly — a duplicated doc's shingles all have df >= 2, hence
    novelty 0, exactly as the naive full-corpus oracle computes),
    scored per rep and expanded to copies."""
    from ffiec_pq_spark.operators.dedup import _content_groups, doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    groups = _content_groups(docs).persist()
    reps = groups.filter(F.col("id") == F.col("rep")).select(
        F.col("id").alias("doc_id"), "g"
    )
    rd = docs.join(reps.select("doc_id"), "doc_id", "left_semi")
    sh = doc_shingles(rd, k=3).persist()
    dfs = (
        sh.join(reps.withColumnRenamed("doc_id", "id"), "id")
        .groupBy("shingle")
        .agg(F.sum("g").alias("df"))
    )
    rep_scores = (
        sh.join(dfs, "shingle")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("set_size"),
            F.count(F.when(F.col("df") == 1, 1)).alias("n_unique"),
        )
        .withColumn(
            "novelty",
            F.round(
                F.col("n_unique") / F.col("set_size").cast("double"), 6
            ),
        )
    )
    return (
        groups.select("id", "rep")
        .join(rep_scores.withColumnRenamed("id", "rep"), "rep")
        .select(
            F.col("id").alias("doc_id"), "set_size", "n_unique", "novelty"
        )
    )


@register(
    "corpus_zipf_slope",
    f"""
    WITH occ AS (
      SELECT unnest({shingles_sql('text', 3)}) AS gram FROM documents
    ),
    freq AS (SELECT gram, count(*) AS f FROM occ GROUP BY gram),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, gram ASC) AS r
      FROM freq
    )
    SELECT count(*) AS n_types,
           CAST(sum(f) AS BIGINT) AS n_occurrences,
           round(regr_slope(ln(f), ln(r)), 4) AS zipf_slope
    FROM ranked
    """,
    tags=["text", "stats"],
)
def corpus_zipf_slope(spark, sf_dir):
    """Zipf-law fit over the 3-gram frequency spectrum: regression
    slope of ln(frequency) on ln(rank) — the corpus-health probe that
    flags template-generated or deduplication-damaged text (natural
    language sits near -1).

    Scale shape: the rank is a DISTRIBUTED total order via
    ``distributed_rank`` (operators/windows.py): range-partition on
    (f DESC, gram ASC) — unique composite keys, so ranges cannot
    straddle ties — rank each range in parallel, add the preceding
    ranges' row counts from a provably tiny offset relation.  Ranks
    are bit-identical to the oracle's single ``row_number`` window; at
    a billion-type table this is N parallel sorts of 1/N each instead
    of one reducer sorting everything.  ``regr_slope`` then folds
    map-side like any algebraic aggregate."""
    from ffiec_pq_spark.operators.text import shingles
    from ffiec_pq_spark.operators.windows import distributed_rank

    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(F.explode(shingles("text", 3)).alias("gram"))
    freq = occ.groupBy("gram").agg(F.count(F.lit(1)).alias("f"))
    ranked = distributed_rank(
        freq, order_cols=[F.desc("f"), F.asc("gram")]
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("f").cast("long").alias("n_occurrences"),
        F.round(F.regr_slope(F.log("f"), F.log("r")), 4).alias("zipf_slope"),
    )
