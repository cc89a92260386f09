"""Round-9 second wave: training-pipeline operations layered on the
certified round-9 surface.

- ``docs_epoch_shuffle_shards`` — deterministic per-epoch global
  shuffle + range-contiguous shard assignment (the reproducible
  training-order primitive: every epoch reshuffles the corpus with a
  seeded portable hash, shards are contiguous key ranges so a trainer
  streams its shard in hash order with NO global sort anywhere).
- ``docs_nb_agreement_kappa`` — Cohen's kappa between the NB
  classifier's predictions and the gold labels (chance-corrected
  agreement: the one-number go/no-go for a learned curation filter,
  complementing the raw confusion matrix).
- ``docs_nb_margin_reliability`` — margin-bucketed reliability curve:
  accuracy as a function of the (exact, integer micro-nat) score margin
  between the top-2 classes.  The calibration artifact that tells a
  curation team where to put the abstention threshold.  Margins stay
  INTEGER end-to-end (sorted-array difference of integer scores), so
  the bucketing cannot ulp-flip between engines — the reason this is a
  margin curve and not a softmax-ECE (exp() is the one step that is
  not bit-portable across engines).
- ``corpus_datacard_by_source`` — the per-source data card: volume,
  corpus share, language spread, exact-duplicate rate and dominant
  language per source — the summary table a data-governance review
  asks for before a source is admitted to the training mix.
- ``dedup_normalized_exact`` — normalization-collapsed exact dedup
  (the CCNet-style first pass: lowercase, punctuation strip,
  whitespace collapse, then one content-hash groupBy).

All are strict-oracle certified (DuckDB replays the identical
pipeline: same md5-prefix portable hashes, same integer scaling, same
rounding discipline).  Scale notes live on each docstring; none of the
plans contains a global sort, a cartesian product, or a
driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.queries.round9 import _nb_pred_cte_sql, nb_scored_predictions
from ffiec_pq_spark.session import load_table

# ---------------------------------------------------------------------------
# docs_epoch_shuffle_shards

_EPOCHS = [0, 1]
_N_SHARDS = 8
# hash60 keys are 60-bit; 8 contiguous shards = top 3 bits = key >> 57.
_SHARD_SHIFT = 57


def _epoch_shuffle_oracle() -> str:
    return f"""
    WITH e AS (
      SELECT doc_id, n_chars, unnest([{", ".join(str(x) for x in _EPOCHS)}]) AS epoch
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, n_chars, epoch,
             ('0x' || substr(md5('e' || CAST(epoch AS VARCHAR) || ':'
                 || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS key
      FROM e
    ),
    k2 AS (SELECT *, key >> {_SHARD_SHIFT} AS shard FROM keyed),
    grp AS (
      SELECT epoch, shard, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             min(key) AS min_key, max(key) AS max_key
      FROM k2 GROUP BY epoch, shard
    ),
    first AS (
      SELECT k.epoch, k.shard, min(k.doc_id) AS first_doc
      FROM k2 k JOIN grp g
        ON k.epoch = g.epoch AND k.shard = g.shard AND k.key = g.min_key
      GROUP BY k.epoch, k.shard
    )
    SELECT g.epoch, g.shard, g.n_docs, g.sum_chars, g.min_key, g.max_key,
           f.first_doc
    FROM grp g JOIN first f ON g.epoch = f.epoch AND g.shard = f.shard
    """


@register(
    "docs_epoch_shuffle_shards",
    _epoch_shuffle_oracle(),
    tags=["curation", "sampling", "layout"],
)
def docs_epoch_shuffle_shards(spark, sf_dir):
    """Reproducible epoch shuffle + shard audit.

    Training at 100 TB needs a GLOBAL shuffle per epoch that is (a)
    reproducible from a seed, (b) different across epochs, and (c)
    computed without any global sort: key every doc with a seeded
    portable hash (md5-prefix, bit-identical in the oracle), make the
    shard the TOP bits of the key (``key >> 57`` for 8 shards), and let
    each trainer rank its shard by key locally.  Shards are contiguous
    key ranges, so "read shard s in key order" IS the epoch order — a
    ``repartitionByRange``-shaped layout where the range boundaries are
    known a priori (hash-uniform), so not even a range-sampling pass is
    needed.

    Output: one row per (epoch, shard) with the doc/char volume, the
    key range actually observed, and the first document of the shard's
    training order (min-key doc, resolved by a deterministic join-back
    on the min key — NOT ``min_by``, whose tie-break on a hash
    collision is engine-defined).

    Scale shape: one scan -> 2 rows/doc projection (epoch explode) ->
    one grouped aggregate on (epoch, shard) with map-side combine (16
    groups); the first-doc resolution joins the 16-row group relation
    back BROADCAST against the keyed stream and re-aggregates.  No
    sort, no window, no single-partition stage; the shuffle volume is
    |epochs| * n_shards rows."""
    docs = load_table(spark, sf_dir, "documents")
    e = docs.select("doc_id", "n_chars").withColumn(
        "epoch", F.explode(F.array(*[F.lit(x) for x in _EPOCHS]))
    )
    key = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("e"),
                    F.col("epoch").cast("string"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    keyed = e.withColumn("key", key).withColumn(
        "shard", F.shiftright(F.col("key"), _SHARD_SHIFT)
    )
    grp = keyed.groupBy("epoch", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("key").alias("min_key"),
        F.max("key").alias("max_key"),
    )
    first = (
        keyed.join(
            F.broadcast(
                grp.select(
                    F.col("epoch").alias("g_epoch"),
                    F.col("shard").alias("g_shard"),
                    "min_key",
                )
            ),
            (F.col("epoch") == F.col("g_epoch"))
            & (F.col("shard") == F.col("g_shard"))
            & (F.col("key") == F.col("min_key")),
        )
        .groupBy("epoch", "shard")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    return grp.join(first, ["epoch", "shard"])


# ---------------------------------------------------------------------------
# docs_nb_agreement_kappa


def _kappa_oracle() -> str:
    return (
        _nb_pred_cte_sql()
        + """
    , conf AS (
      SELECT actual, predicted, count(*) AS n
      FROM pred GROUP BY actual, predicted
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN actual = predicted THEN n ELSE 0 END)
                  AS BIGINT) AS agree
      FROM conf
    ),
    rows_ AS (
      SELECT actual AS lab, CAST(sum(n) AS BIGINT) AS rn
      FROM conf GROUP BY actual
    ),
    cols_ AS (
      SELECT predicted AS lab, CAST(sum(n) AS BIGINT) AS cn
      FROM conf GROUP BY predicted
    ),
    pe_num AS (
      SELECT CAST(sum(r.rn * c.cn) AS BIGINT) AS pn
      FROM rows_ r JOIN cols_ c ON r.lab = c.lab
    ),
    k AS (
      SELECT t.n_test,
             round(CAST(t.agree AS DOUBLE) / t.n_test, 6) AS po,
             round(CAST(p.pn AS DOUBLE)
                   / (CAST(t.n_test AS DOUBLE) * t.n_test), 6) AS pe
      FROM tot t CROSS JOIN pe_num p
    )
    SELECT n_test, po, pe,
           round((po - pe) / nullif(1 - pe, 0.0), 6) AS kappa
    FROM k
    """
    )


@register(
    "docs_nb_agreement_kappa",
    _kappa_oracle(),
    tags=["quality", "classifier", "curation"],
)
def docs_nb_agreement_kappa(spark, sf_dir):
    """Cohen's kappa for the NB curation classifier vs the gold labels
    on the held-out split: chance-corrected agreement
    ``(po - pe) / (1 - pe)`` where ``po`` is observed accuracy and
    ``pe`` the marginal-product chance agreement.  The single-number
    admission gate for a learned filter (a skew-robust complement to
    the confusion matrix: accuracy 0.8 on a 0.8-majority corpus has
    kappa ~0).

    Float discipline: po/pe are single divisions of EXACT integer
    sums (counts and a sum of count products), rounded to 6 dp on both
    engines before kappa is computed from the ROUNDED values — no
    multi-term float accumulation anywhere, so the result is
    bit-stable cross-engine.

    Scale shape: rides the shared NB scorer (keyed model join — see
    ``docs_nb_lang_confusion``); everything after it aggregates the
    |classes|^2 confusion relation — constant-size, broadcast-joined
    marginals."""
    scored = nb_scored_predictions(spark, sf_dir)
    conf = scored.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = conf.agg(
        F.sum("n").alias("n_test"),
        F.sum(
            F.when(F.col("actual") == F.col("predicted"), F.col("n")).otherwise(
                F.lit(0)
            )
        ).alias("agree"),
    )
    rows_ = conf.groupBy(F.col("actual").alias("lab")).agg(
        F.sum("n").alias("rn")
    )
    cols_ = conf.groupBy(F.col("predicted").alias("lab")).agg(
        F.sum("n").alias("cn")
    )
    pe_num = (
        rows_.join(cols_, "lab")
        .agg(F.sum(F.col("rn") * F.col("cn")).alias("pn"))
    )
    k = tot.crossJoin(F.broadcast(pe_num)).select(
        "n_test",
        F.round(F.col("agree").cast("double") / F.col("n_test"), 6).alias(
            "po"
        ),
        F.round(
            F.col("pn").cast("double")
            / (F.col("n_test").cast("double") * F.col("n_test")),
            6,
        ).alias("pe"),
    )
    # pe = 1.0 on a degenerate single-class test split makes kappa
    # 0/0: nullif-guarded per the repo's Spark-4 ANSI convention (ANSI
    # double division RAISES on /0), NULL identically on both engines
    return k.select(
        "n_test",
        "po",
        "pe",
        F.round(
            (F.col("po") - F.col("pe"))
            / F.nullif(F.lit(1.0) - F.col("pe"), F.lit(0.0)),
            6,
        ).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# docs_nb_margin_reliability

_MARGIN_BUCKET = 250_000  # 0.25 nats in integer micro-nat units
_MARGIN_MAX_BUCKET = 9


def _margin_reliability_oracle() -> str:
    return (
        _nb_pred_cte_sql()
        + f"""
    , m AS (
      SELECT CASE WHEN actual = predicted THEN 1 ELSE 0 END AS correct,
             -- t_* sums are HUGEINT in DuckDB: cast back so the margin
             -- (and everything derived) stays BIGINT like Spark's long
             CAST(ls[5] - ls[4] AS BIGINT) AS margin
      FROM (
        SELECT actual, predicted,
               list_sort([t_de, t_en, t_es, t_fr, t_zh]) AS ls
        FROM pred
      )
    ),
    b AS (
      SELECT least(margin // {_MARGIN_BUCKET}, {_MARGIN_MAX_BUCKET}) AS bucket,
             correct, margin
      FROM m
    )
    SELECT bucket, count(*) AS n_docs,
           CAST(sum(correct) AS BIGINT) AS n_correct,
           round(CAST(sum(correct) AS DOUBLE) / count(*), 6) AS accuracy,
           min(margin) AS min_margin, max(margin) AS max_margin
    FROM b GROUP BY bucket
    """
    )


@register(
    "docs_nb_margin_reliability",
    _margin_reliability_oracle(),
    tags=["quality", "classifier", "curation"],
)
def docs_nb_margin_reliability(spark, sf_dir):
    """Reliability curve of the NB curation classifier, bucketed by the
    top-2 score margin: per 0.25-nat margin bucket (capped at bucket
    9), how often is the argmax actually right?  This is the artifact
    that sets an ABSTENTION threshold for a learned filter ("trust the
    label only when the margin clears b buckets") — the decision the
    softmax-ECE reliability diagram informs, made portable: the margin
    is a difference of the INTEGER micro-nat scores (sorted-array
    top-2), so bucket edges are exact integer arithmetic on both
    engines and cannot ulp-flip, unlike exp()-based confidences.

    Scale shape: rides the shared NB scorer; the margin is a per-row
    sorted-array projection (|classes| = 5 elements) and the curve is
    one grouped aggregate on the bucket id (<= 10 groups, map-side
    combined)."""
    langs_t = ["t_de", "t_en", "t_es", "t_fr", "t_zh"]
    scored = nb_scored_predictions(spark, sf_dir)
    ls = F.array_sort(F.array(*[F.col(c) for c in langs_t]))
    m = scored.select(
        F.when(F.col("actual") == F.col("predicted"), 1)
        .otherwise(0)
        .alias("correct"),
        (F.element_at(ls, 5) - F.element_at(ls, 4)).alias("margin"),
    )
    b = m.select(
        F.least(
            F.expr(f"margin DIV {_MARGIN_BUCKET}"),
            F.lit(_MARGIN_MAX_BUCKET).cast("long"),
        ).alias("bucket"),
        "correct",
        "margin",
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("correct").alias("n_correct"),
        F.round(
            F.sum("correct").cast("double") / F.count(F.lit(1)), 6
        ).alias("accuracy"),
        F.min("margin").alias("min_margin"),
        F.max("margin").alias("max_margin"),
    )


# ---------------------------------------------------------------------------
# corpus_datacard_by_source


def _datacard_oracle() -> str:
    return """
    WITH base AS (
      SELECT source, lang, n_chars, md5(text) AS th FROM documents
    ),
    per_source AS (
      SELECT source,
             count(*) AS n_docs,
             count(DISTINCT lang) AS n_langs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             count(DISTINCT th) AS n_distinct_texts
      FROM base GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs FROM per_source),
    lc AS (
      SELECT source, lang, count(*) AS n
      FROM base GROUP BY source, lang
    ),
    mx AS (SELECT source, max(n) AS mx_n FROM lc GROUP BY source),
    top AS (
      SELECT l.source, min(l.lang) AS top_lang, min(m.mx_n) AS top_n
      FROM lc l JOIN mx m ON l.source = m.source AND l.n = m.mx_n
      GROUP BY l.source
    )
    SELECT p.source, p.n_docs,
           round(CAST(p.n_docs AS DOUBLE) / t.total_docs, 6) AS share,
           p.n_langs,
           round(CAST(p.sum_chars AS DOUBLE) / p.n_docs, 6) AS avg_chars,
           round(1 - CAST(p.n_distinct_texts AS DOUBLE) / p.n_docs, 6)
             AS dup_rate,
           tp.top_lang,
           round(CAST(tp.top_n AS DOUBLE) / p.n_docs, 6) AS top_lang_share
    FROM per_source p
    CROSS JOIN tot t
    JOIN top tp ON tp.source = p.source
    """


@register(
    "corpus_datacard_by_source",
    _datacard_oracle(),
    tags=["curation", "governance", "analytics"],
)
def corpus_datacard_by_source(spark, sf_dir):
    """Per-source data card: for every source, its document volume and
    corpus share, language spread, mean length, exact-duplicate rate
    (1 - distinct-content/docs, md5-keyed) and the dominant language
    with its share — the admission-review table for a training mix
    ("is src7 80% near-empty duplicated en boilerplate?").

    Determinism: the dominant language resolves count ties to the
    alphabetically-first language via an explicit max-count join +
    ``min(lang)`` — identical on both engines (never ``max_by``, whose
    tie-break is engine-defined).

    Scale shape: two grouped aggregates keyed on source / (source,
    lang) (both map-side combined; distinct counts are Spark's
    two-phase partial distinct), a BROADCAST single-row total, and a
    broadcast join of the |sources|-row mode relation.  No window, no
    sort, no per-row UDF; at 100 TB the only material shuffle is the
    (source, lang[, text-hash]) aggregation — keyed on low-cardinality
    dimensions plus the content hash, the same profile as the certified
    exact-dedup pass."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source", "lang", "n_chars", F.md5(F.col("text")).alias("th")
    )
    per_source = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("sum_chars"),
        F.countDistinct("th").alias("n_distinct_texts"),
    )
    tot = per_source.agg(F.sum("n_docs").alias("total_docs"))
    lc = base.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    mx = lc.groupBy("source").agg(F.max("n").alias("mx_n")).select(
        F.col("source").alias("mx_source"), "mx_n"
    )
    top = (
        lc.join(
            mx,
            (F.col("source") == F.col("mx_source"))
            & (F.col("n") == F.col("mx_n")),
        )
        .groupBy("source")
        .agg(F.min("lang").alias("top_lang"), F.min("mx_n").alias("top_n"))
    )
    return (
        per_source.crossJoin(F.broadcast(tot))
        .join(F.broadcast(top), "source")
        .select(
            "source",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") / F.col("total_docs"), 6
            ).alias("share"),
            "n_langs",
            F.round(
                F.col("sum_chars").cast("double") / F.col("n_docs"), 6
            ).alias("avg_chars"),
            F.round(
                1
                - F.col("n_distinct_texts").cast("double") / F.col("n_docs"),
                6,
            ).alias("dup_rate"),
            "top_lang",
            F.round(F.col("top_n").cast("double") / F.col("n_docs"), 6).alias(
                "top_lang_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# dedup_normalized_exact

# ASCII punctuation as four explicit ranges (0x21-2F, 3A-40, 5B-60,
# 7B-7E) written IDENTICALLY for Java regex and RE2 — \p{Punct} /
# [[:punct:]] spellings differ between engines, explicit ranges don't.
_PUNCT_CLASS = r"[!-/:-@\[-`{-~]"
_WS_CLASS = "[ \\t\\n\\r]+"


def _normalized_dedup_oracle() -> str:
    return f"""
    WITH norm AS (
      SELECT doc_id, source, lang,
             md5(text) AS raw_hash,
             md5(trim(regexp_replace(
                 regexp_replace(lower(text), '{_PUNCT_CLASS}', ' ', 'g'),
                 '{_WS_CLASS}', ' ', 'g'))) AS nh
      FROM documents
    )
    SELECT min(doc_id) AS rep,
           count(*) AS n_docs,
           count(DISTINCT raw_hash) AS raw_variants,
           count(DISTINCT source) AS n_sources,
           count(DISTINCT lang) AS n_langs
    FROM norm
    GROUP BY nh
    HAVING count(*) >= 2
    """


@register(
    "dedup_normalized_exact",
    _normalized_dedup_oracle(),
    tags=["dedup", "curation"],
)
def dedup_normalized_exact(spark, sf_dir):
    """Normalization-collapsed exact dedup (the CCNet-style first pass):
    lowercase, ASCII punctuation -> space, whitespace collapse, trim,
    then group on the md5 of the normalized text.  Catches the
    reformatted-but-identical duplicates raw-hash dedup misses; the
    ``raw_variants`` column counts how many distinct raw payloads each
    normalized cluster collapses (rows with raw_variants >= 2 are the
    wins over ``dedup_exact``).

    The punctuation class is written as explicit ASCII ranges so the
    SAME pattern string compiles identically under Java regex (Spark)
    and RE2 (DuckDB) — \\p{{Punct}} spellings differ between engines.

    Scale shape: one scan -> per-row normalization expressions (JVM,
    whole-stage codegen) -> ONE grouped aggregate keyed on the
    normalized content hash (map-side combined; distinct counts are
    the standard two-phase partial distinct).  Identical profile to
    the certified ``dedup_exact`` pass — one shuffle at any corpus
    size."""
    docs = load_table(spark, sf_dir, "documents")
    nh = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), _PUNCT_CLASS, " "),
                _WS_CLASS,
                " ",
            )
        )
    )
    norm = docs.select(
        "doc_id",
        "source",
        "lang",
        F.md5(F.col("text")).alias("raw_hash"),
        nh.alias("nh"),
    )
    return (
        norm.groupBy("nh")
        .agg(
            F.min("doc_id").alias("rep"),
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("raw_hash").alias("raw_variants"),
            F.countDistinct("source").alias("n_sources"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .filter(F.col("n_docs") >= 2)
        .drop("nh")
    )
