"""Corpus-language-model quality scoring: a bigram LM estimated from
the corpus itself scores every document by mean log-probability — the
CCNet/Gopher-style "how typical is this text" signal (perplexity proxy)
used to rank training documents, here as one declarative plan with a
DuckDB oracle replaying the identical estimation."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.session import load_table


# Shared with docs_ccnet_lm_partition (queries/round11.py), which
# buckets the corpus by exactly these scores.
_BIGRAM_LOGPROB_SQL = r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents
    ),
    bg AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM tok, unnest(generate_series(1, len(t) - 1)) AS u(i)
    ),
    c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY 1)
    SELECT doc_id,
           count(*) AS n_bigrams,
           round(avg(ln(n2 / n1)), 6) AS avg_logprob
    FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
    GROUP BY doc_id
    """


@register(
    "doc_bigram_logprob",
    _BIGRAM_LOGPROB_SQL,
    tags=["lm", "quality", "text"],
)
def doc_bigram_logprob(spark, sf_dir):
    """Per-document mean bigram log-probability under the corpus's own
    bigram model: P(w2|w1) = c(w1 w2) / c(w1 ·), score = avg ln P over
    the document's bigram instances.  Low scores mark atypical text
    (boilerplate, mojibake, wrong-language shards) — the classic
    LM-filter signal for training-data curation.

    Plan: bigrams are built array-side (zip_with over two slices — no
    posexplode self-join), counts are two grouped aggregates whose
    join keys are the bigram/unigram (high-cardinality, no skew
    beyond natural Zipf — the df-cap pattern applies if a stopword
    bigram ever dominates), and the probability table joins back to
    the bigram stream.  n2/n1 is one exact-integer IEEE division on
    both engines; only the per-doc mean is rounded.

    Duplicate collapse: the bigram stream runs on DISTINCT content
    only, each representative weighted by its copy count g — weighted
    sums equal the naive corpus counts EXACTLY (every copy contributes
    the same bigrams), per-rep scores expand back to copies as pure
    output materialization.  The oracle replays the naive full-corpus
    estimation, proving the collapse; a d-way duplicated corpus costs
    ~1x the distinct corpus instead of d x."""
    from ffiec_pq_spark.operators.dedup import _content_groups

    docs = load_table(spark, sf_dir, "documents")
    groups = _content_groups(docs).persist()
    rep_docs = docs.join(
        groups.filter(F.col("id") == F.col("rep")).select(
            F.col("id").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    )
    g_of = groups.filter(F.col("id") == F.col("rep")).select(
        F.col("id").alias("doc_id"), "g"
    )
    bg = rep_docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("_t")
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(_t, 1, size(_t) - 1),"
                "         slice(_t, 2, size(_t) - 1),"
                "         (a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("_bg"),
    ).select("doc_id", "_bg.w1", "_bg.w2").join(g_of, "doc_id")
    # weighted counts == naive full-corpus counts (each copy repeats
    # the rep's bigrams verbatim)
    c2 = bg.groupBy("w1", "w2").agg(F.sum("g").alias("n2"))
    c1 = bg.groupBy("w1").agg(F.sum("g").alias("n1"))
    prob = c2.join(c1, "w1").select(
        "w1", "w2", (F.col("n2") / F.col("n1")).alias("_p")
    )
    rep_scores = (
        bg.join(prob, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log("_p")), 6).alias("avg_logprob"),
        )
    )
    # expand rep scores to every copy
    return (
        groups.select("id", "rep")
        .join(rep_scores.withColumnRenamed("doc_id", "rep"), "rep")
        .select(F.col("id").alias("doc_id"), "n_bigrams", "avg_logprob")
    )


def _bpe_sql(n_merges: int = 6, max_types: int = 300) -> str:
    """Unrolled BPE training loop (see operators/bpe.py): vocabulary ->
    padded char symbols -> per-iteration [pair counts -> argmax ->
    double padded replace].  Pure integer counting and string ops —
    bit-identical on both engines."""
    ctes = [
        r"""wc AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        FROM documents
      ) WHERE word <> ''
      GROUP BY word ORDER BY freq DESC, word ASC LIMIT %d
    )""" % max_types,
        r"""sym0 AS (
      SELECT word, freq,
             ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS s
      FROM wc
    )""",
    ]
    for t in range(n_merges):
        ctes.append(
            f"""pr{t} AS (
      SELECT p1 AS l, p2 AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
        SELECT freq, t[i] AS p1, t[i + 1] AS p2
        FROM (SELECT freq, string_split(trim(s), ' ') AS t FROM sym{t}),
             unnest(generate_series(1, len(t) - 1)) AS u(i)
      ) GROUP BY 1, 2
    )"""
        )
        ctes.append(
            f"best{t} AS (SELECT l, r, c FROM pr{t} ORDER BY c DESC, l, r LIMIT 1)"
        )
        ctes.append(
            f"""sym{t + 1} AS (
      SELECT word, freq,
             replace(replace(s, ' ' || l || ' ' || r || ' ',
                             ' ' || l || r || ' '),
                     ' ' || l || ' ' || r || ' ', ' ' || l || r || ' ') AS s
      FROM sym{t} CROSS JOIN best{t}
    )"""
        )
    arms = "\n    UNION ALL\n    ".join(
        f"SELECT {t + 1} AS merge_rank, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, c AS pair_freq FROM best{t}"
        for t in range(n_merges)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + arms


@register("bpe_train_merges", _bpe_sql(), tags=["lm", "tokenizer", "iterative"])
def bpe_train_merges_q(spark, sf_dir):
    """BPE tokenizer training, first 6 merges learned from the corpus:
    the tokenizer-construction step of an LLM pipeline.  The cluster
    computes the word-frequency TYPE table (one map-side-combined
    shuffle + deterministic top-300 types); the merge loop runs
    driver-side on that bounded state (the k-means pattern) with
    integer pair counting and a two-pass padded-replace merge whose
    semantics Python and SQL share exactly — the oracle unrolls the
    identical loop."""
    from ffiec_pq_spark.operators.bpe import bpe_train_merges

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train_merges(docs, "text", n_merges=6, max_types=300)


def _bpe_apply_sql(n_merges: int = 6, max_types: int = 300) -> str:
    """Re-train (same CTE chain) then tokenize the whole corpus with
    the learned merges: per-language token counts and the compression
    vs raw characters."""
    train = _bpe_sql(n_merges, max_types)
    ctes = train[len("WITH "): train.index("\n    SELECT 1 AS merge_rank")
                 if "\n    SELECT 1 AS merge_rank" in train
                 else train.index("SELECT 1 AS merge_rank")].rstrip()
    ctes = ctes.rstrip().rstrip(",")
    return f"""WITH {ctes},
    tokc AS (
      SELECT word, len(string_split(trim(s), ' ')) AS ntok
      FROM sym{n_merges}
    ),
    cw AS (
      SELECT lang, word FROM (
        SELECT lang,
               unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents
      ) WHERE word <> ''
    )
    SELECT lang,
           count(*) AS n_words,
           CAST(sum(coalesce(t.ntok, length(cw.word))) AS BIGINT)
             AS total_tokens,
           CAST(sum(length(cw.word)) AS BIGINT) AS total_chars,
           round(sum(coalesce(t.ntok, length(cw.word)))
                 / CAST(sum(length(cw.word)) AS DOUBLE), 6)
             AS tokens_per_char
    FROM cw LEFT JOIN tokc t USING (word)
    GROUP BY lang
    """


@register("bpe_apply_stats", _bpe_apply_sql(), tags=["lm", "tokenizer"])
def bpe_apply_stats(spark, sf_dir):
    """Train-then-apply: the 6 learned BPE merges tokenize the whole
    corpus (chained padded replaces over the distinct-word table, then
    a join back onto the word stream — type-level work, corpus-level
    accounting), reporting per-language token totals and the
    tokens-per-character compression the merges bought.  Words outside
    the trained type table fall back to character segmentation, exactly
    like an OOV path.  The oracle re-trains and re-applies in SQL."""
    from pyspark.sql import functions as F

    from ffiec_pq_spark.operators.bpe import bpe_train_merges
    from ffiec_pq_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train_merges(
            docs, "text", n_merges=6, max_types=300
        ).collect()
    ]
    words = (
        docs.select(F.explode(tokens("text")).alias("word"), "lang")
        .filter(F.col("word") != "")
    )
    types = words.select("word").distinct()
    s = F.concat(
        F.lit(" "),
        F.regexp_replace(F.col("word"), "(.)", "$1 "),
    )
    for left, right in merges:
        pat = F.lit(f" {left} {right} ")
        rep = F.lit(f" {left}{right} ")
        s = F.replace(F.replace(s, pat, rep), pat, rep)
    tokc = types.select(
        "word", F.size(F.split(F.trim(s), " ")).alias("ntok")
    )
    joined = words.join(tokc, "word", "left")
    ntok = F.coalesce(F.col("ntok"), F.length("word"))
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(ntok).cast("long").alias("total_tokens"),
        F.sum(F.length("word")).cast("long").alias("total_chars"),
        F.round(
            F.sum(ntok) / F.sum(F.length("word")).cast("double"), 6
        ).alias("tokens_per_char"),
    )
