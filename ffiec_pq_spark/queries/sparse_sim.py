"""Sparse-vector similarity: TF-IDF cosine pairs via an inverted-index
join — the weighted-bag complement to the embedding (dense) and
shingle-set (Jaccard) near-dup detectors.  Terms are word-3-grams
(unigrams are degenerate on a small-vocabulary corpus and, in general,
high-df unigrams carry no similarity signal anyway — the same reason
search engines index phrases).  Oracle-checked bit-for-bit:
membership gates are pure integers, floats only appear rounded in the
output."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.operators.text import shingles_sql
from ffiec_pq_spark.session import load_table

_MAX_DF = 100  # vocabulary document-frequency cap (over distinct content)
_MIN_COMMON = 5  # integer pair gate: >= this many shared terms


@register(
    "tfidf_cosine_pairs",
    f"""
    WITH reps AS (
      SELECT min(doc_id) AS id
      FROM (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS ch
        FROM documents
      ) GROUP BY ch
    ),
    docs2 AS (
      SELECT d.doc_id AS id, d.text
      FROM documents d JOIN reps r ON r.id = d.doc_id
    ),
    tok AS (
      SELECT id, unnest({shingles_sql('text', 3)}) AS term
      FROM docs2
    ),
    tf AS (
      SELECT id, term, count(*) AS tf
      FROM tok GROUP BY 1, 2
    ),
    stats AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nn AS (SELECT count(*) AS n FROM docs2),
    w AS (
      SELECT id, term, tf * ((n - df + 0.5) / (df + 0.5)) AS w
      FROM tf JOIN stats USING (term), nn
      WHERE df <= {_MAX_DF}
    ),
    norms AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY id),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             count(*) AS n_common_terms,
             sum(a.w * b.w) AS num
      FROM w a JOIN w b ON a.term = b.term AND a.id < b.id
      GROUP BY 1, 2
      HAVING count(*) >= {_MIN_COMMON}
    )
    SELECT id_a, id_b, n_common_terms,
           round(num / (na.nrm * nb.nrm), 6) AS cosine
    FROM pairs
    JOIN norms na ON na.id = id_a
    JOIN norms nb ON nb.id = id_b
    """,
    tags=["similarity", "tfidf", "dedup"],
)
def tfidf_cosine_pairs(spark, sf_dir):
    """TF-IDF cosine similarity join on DISTINCT content: BM25-style
    rational idf (log-free, so both engines compute identical IEEE
    doubles), inverted-index self-join restricted to the df <=
    {_MAX_DF} vocabulary (the cap bounds per-term pair fan-out exactly
    like the Jaccard df-cap — high-df terms are both the skew risk AND
    similarity noise), and an INTEGER pair gate (>= {_MIN_COMMON}
    shared terms) instead of a float threshold, so pair membership can
    never flip on a last-ulp summation difference; the cosine itself
    appears only rounded.

    One exchange for tf, one for df (rides back as a term join), one
    for the pair aggregation — the same plan family as jaccard_pairs,
    with the duplicate collapse making it replica-flat."""
    docs = load_table(spark, sf_dir, "documents")
    from ffiec_pq_spark.operators.dedup import exact_dedup_groups
    from ffiec_pq_spark.operators.text import shingles
    from ffiec_pq_spark.resident import tracked_persist
    from ffiec_pq_spark.session import spread

    reps = exact_dedup_groups(docs).select(F.col("rep_id").alias("doc_id"))
    rd = docs.join(reps, "doc_id", "left_semi")
    tok = spread(rd.select("doc_id", "text")).select(
        F.col("doc_id").alias("id"),
        F.explode(shingles("text", 3)).alias("term"),
    )
    tf = tok.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nn = rd.agg(F.count(F.lit(1)).alias("n"))
    # MATERIALIZED EAGERLY: w feeds THREE plan references (norms + both
    # pair sides) that execute as concurrent subquery jobs — a lazy
    # persist let each race recompute the shingle -> tf -> df chain
    # before any published the cache (round-15 profile: two 7-12 s-CPU
    # jobs over the same scan per warm rep)
    w = tracked_persist(
        tf.join(stats, "term")
        .crossJoin(F.broadcast(nn))
        .filter(F.col("df") <= _MAX_DF)
        .select(
            "id",
            "term",
            (
                F.col("tf")
                * ((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            ).alias("w"),
        )
    )
    # one row per doc, consumed by BOTH cosine divisor sides; this ONE
    # materialization job populates w AND norms (nested chain) before
    # the racing pair-side consumers launch
    norms = tracked_persist(
        w.groupBy("id").agg(
            F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
        )
    )
    norms.count()
    a = w.select(F.col("id").alias("id_a"), "term", F.col("w").alias("wa"))
    b = w.select(F.col("id").alias("id_b"), "term", F.col("w").alias("wb"))
    pairs = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_common_terms"),
            F.sum(F.col("wa") * F.col("wb")).alias("num"),
        )
        .filter(F.col("n_common_terms") >= _MIN_COMMON)
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("nrm").alias("nb"))
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common_terms",
            F.round(F.col("num") / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
    )


@register(
    "doc_top_terms",
    f"""
    WITH tok AS (
      SELECT doc_id AS id, unnest({shingles_sql('text', 3)}) AS term
      FROM documents
    ),
    tf AS (SELECT id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    stats AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nn AS (SELECT count(*) AS n FROM documents),
    w AS (
      SELECT id, term, tf * ((n - df + 0.5) / (df + 0.5)) AS w
      FROM tf JOIN stats USING (term), nn
    ),
    ranked AS (
      SELECT id, term, w,
             row_number() OVER (
               PARTITION BY id ORDER BY w DESC, term ASC
             ) AS rank
      FROM w
    )
    SELECT id, term, rank, round(w, 6) AS tfidf
    FROM ranked WHERE rank <= 3
    """,
    tags=["text", "tfidf", "keywords"],
)
def doc_top_terms(spark, sf_dir):
    """Keyword extraction: each document's top-3 word-3-grams by
    TF-IDF (rational log-free idf — the weight is ONE IEEE multiply,
    so the rank order is bit-identical cross-engine; no summation
    anywhere).  Per-doc window rank over the (doc, term) table — the
    partition key is the document, so the rank is embarrassingly
    parallel at any corpus size.

    Duplicate collapse (house pattern): tf, df and N are computed on
    DISTINCT content with copy-count weights (df = Σ g over reps, N =
    Σ g — exactly the naive corpus statistics, since every copy
    contains the same terms), ranks derive per rep, and the rows
    expand back to copies as output materialization.  The naive
    full-corpus oracle proves the collapse."""
    from pyspark.sql import Window

    from ffiec_pq_spark.operators.dedup import _content_groups
    from ffiec_pq_spark.operators.text import shingles
    from ffiec_pq_spark.resident import tracked_persist
    from ffiec_pq_spark.session import spread

    docs = load_table(spark, sf_dir, "documents")
    # eager: feeds the rep slice AND the copy-expansion join (two
    # concurrent subquery consumers; the lazy-persist race precedent)
    groups = tracked_persist(_content_groups(docs))
    groups.count()
    reps = groups.filter(F.col("id") == F.col("rep")).select(
        F.col("id").alias("doc_id"), "g"
    )
    rd = docs.join(reps.select("doc_id"), "doc_id", "left_semi")
    tok = spread(rd.select("doc_id", "text")).select(
        F.col("doc_id").alias("id"), F.explode(shingles("text", 3)).alias("term")
    )
    tf = tok.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tfg = tf.join(reps.withColumnRenamed("doc_id", "id"), "id")
    stats = tfg.groupBy("term").agg(F.sum("g").alias("df"))
    nn = docs.agg(F.count(F.lit(1)).alias("n"))
    w = (
        tf.join(stats, "term")
        .crossJoin(F.broadcast(nn))
        .select(
            "id",
            "term",
            (
                F.col("tf")
                * ((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            ).alias("w"),
        )
    )
    rank = F.row_number().over(
        Window.partitionBy("id").orderBy(F.desc("w"), F.asc("term"))
    )
    rep_rows = (
        w.withColumn("rank", rank)
        .filter(F.col("rank") <= 3)
        .select("id", "term", "rank", F.round("w", 6).alias("tfidf"))
    )
    return (
        groups.select("id", "rep")
        .join(rep_rows.withColumnRenamed("id", "rep"), "rep")
        .select("id", "term", "rank", "tfidf")
    )
