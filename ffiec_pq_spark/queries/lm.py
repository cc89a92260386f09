"""Corpus-language-model quality scoring: a bigram LM estimated from
the corpus itself scores every document by mean log-probability — the
CCNet/Gopher-style "how typical is this text" signal (perplexity proxy)
used to rank training documents, here as one declarative plan with a
DuckDB oracle replaying the identical estimation."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.session import load_table


@register(
    "doc_bigram_logprob",
    r"""
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
    """,
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
