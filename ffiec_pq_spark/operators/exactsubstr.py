"""Substring-level exact deduplication (ExactSubstr): find maximal
token spans that occur verbatim at two or more places in the corpus —
the train-set memorization risk document-pair dedup cannot see (two
documents 2% similar can still share one long boilerplate paragraph).

Reference point: the suffix-array ExactSubstr of Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better") finds
substrings of >= N tokens repeated anywhere in the corpus.  A global
suffix array does not shard, so the Spark-native formulation uses the
standard scalable surrogate, hashed k-gram ANCHORS:

1. every token position p of every doc emits the hash of its k-token
   gram (one narrow array projection + posexplode — no shuffle yet);
2. a gram hash occurring at >= min_occurrences positions corpus-wide is
   "duplicated": ONE shuffle of the (id, pos, h) rows on the 60-bit
   gram hash, then ``count() OVER (PARTITION BY h)`` + a partition-
   local filter — the gram expression (tokenize + md5, the dominant
   CPU) is evaluated exactly once (``gram_plan`` in
   :func:`duplicated_anchors` documents the alternatives and the
   8x/16x measurements that picked this default);
3. per-doc RUN EXTENSION: anchor positions whose gap is <= k merge into
   maximal duplicated REGIONS (their gram windows overlap or touch), a
   gaps-and-islands pass inside ONE per-doc window partition (second
   shuffle, keyed on doc id).

Every duplicated span of length >= 2k-1 tokens is guaranteed to be
covered by a region (all k-grams inside it repeat); spans in
[k, 2k-2] are covered when their k-gram alignment repeats.  Regions are
a conservative SUPERSET of true ExactSubstr spans (two anchors may be
duplicated from different sources), which is the safe direction for a
removal/flagging pipeline; k is the precision knob.

No step is ever all-pairs: cost = |token positions| rows through two
keyed shuffles.  At 100 TB the df cap (``max_anchor_df``) bounds the
anchor fan-in of degenerate grams (whitespace runs, boilerplate
headers) exactly like the high-df term drop in the Jaccard operators.

Reference parity: the reference has no substring operator (its unit is
the (IDRSSD, date, item) fact — see SURVEY.md §2); this extends the
dedup family of SURVEY.md §7 Phase 5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ffiec_pq_spark.functions.hashing import hash60
from ffiec_pq_spark.operators.text import tokens


def positional_gram_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """(id, pos, h): the 60-bit hash of the k-token gram starting at
    1-based token position ``pos``, for every position with a full
    k-token window (docs shorter than k tokens emit nothing).

    Narrow per-row work: one tokenize + one transform over a sequence +
    posexplode — no shuffle, stays in whole-stage codegen except the
    generator itself."""
    from ffiec_pq_spark.session import spread

    w = tokens(F.col(text_col))
    n = F.size(w)
    grams = F.when(
        n < F.lit(k), F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, k)),
        )
    )
    return (
        spread(df.select(F.col(id_col).alias("id"), F.col(text_col)))
        .select(F.col("id"), F.posexplode(grams).alias("pos0", "gram"))
        .select(
            "id",
            (F.col("pos0") + 1).alias("pos"),
            hash60(F.col("gram")).alias("h"),
        )
    )


def duplicated_anchors(
    grams: DataFrame,
    min_occurrences: int = 2,
    max_anchor_df: int | None = None,
    gram_plan: str = "window",
) -> DataFrame:
    """(id, pos) anchor positions whose k-gram hash occurs at
    >= min_occurrences positions corpus-wide (within- AND cross-doc
    repeats both count — a doc pasting its own paragraph twice is the
    same memorization risk).

    ``max_anchor_df`` additionally DROPS grams above a document-
    frequency-style occurrence cap: degenerate ultra-common grams
    otherwise dominate both the group fan-in and the region output at
    scale (same rationale as ``max_shingle_df`` in the Jaccard ops).

    ``gram_plan`` picks how the occurrence restriction is computed —
    the gram relation (tokenize + md5 per position) is the operator's
    dominant CPU cost, so whether it is evaluated once or twice is the
    headline knob (measured head-to-head at 8x/16x replicated sf0.1;
    numbers in SCALECHECK.json notes):

    - ``"window"`` (default, measured fastest): ONE pass — shuffle the
      (id, pos, h) rows once on the gram hash and take
      ``count() OVER (PARTITION BY h)``; the duplicated-gram filter
      then runs partition-locally and the gram expression is never
      re-evaluated.  One fewer exchange than the join shape and half
      its tokenize+md5 work.  Caveat: a degenerate ultra-common gram
      lands its whole position set in one window partition (AQE cannot
      split window skew the way it splits join skew) — ``max_anchor_df``
      still drops it from the OUTPUT, and the 60-bit hash key space
      makes a natural-language gram hot enough to matter a data bug,
      not a plan property.
    - ``"recompute"``: the two-branch shape (map-side-combined groupBy
      -> distinct duplicated hashes -> keyed semi-join back), which
      evaluates the gram expression twice but never materializes it;
      shuffles stay AQE-skew-splittable.  The right choice if the
      window caveat above is live (pathological key skew AND the df cap
      must still count the hot gram exactly).
    - ``"persist"``: the join shape probing an eagerly materialized
      (``localCheckpoint``) gram relation — one tokenize+md5 pass AND
      skew-splittable joins, at the cost of materializing |positions|
      rows to executor storage and pinning those blocks until session
      GC (this builder returns a lazy plan, so there is no safe point
      to free them).  Use only when both caveats bite at once.
    """
    cond = F.col("occ") >= min_occurrences
    if max_anchor_df is not None:
        cond = cond & (F.col("occ") <= max_anchor_df)
    if gram_plan == "window":
        w = Window.partitionBy("h")
        return (
            grams.withColumn("occ", F.count(F.lit(1)).over(w))
            .filter(cond)
            .select("id", "pos")
        )
    if gram_plan == "persist":
        grams = grams.localCheckpoint(eager=True)
    elif gram_plan != "recompute":
        raise ValueError(
            f"gram_plan must be window|recompute|persist, got {gram_plan!r}"
        )
    agg = grams.groupBy("h").agg(F.count(F.lit(1)).alias("occ"))
    dup = agg.filter(cond).select("h")
    return grams.join(dup, "h", "left_semi").select("id", "pos")


def spans_from_anchors(anchors: DataFrame, k: int) -> DataFrame:
    """Run extension shared by the corpus-dedup and decontamination
    paths: merge anchor positions with gap <= k into maximal disjoint
    regions (gaps-and-islands inside ONE per-doc window partition).
    Input: (id, pos); output: (id, span_start, span_end, n_anchors,
    span_tokens)."""
    wdoc = Window.partitionBy("id").orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(wdoc) <= F.lit(k), F.lit(0)
    ).otherwise(F.lit(1))  # first row: lag is NULL -> otherwise -> 1
    rid = F.sum("brk").over(
        wdoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        anchors.withColumn("brk", brk)
        .withColumn("rid", rid)
        .groupBy("id", "rid")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_anchors"),
        )
        .select(
            "id",
            "span_start",
            "span_end",
            "n_anchors",
            (F.col("span_end") - F.col("span_start") + 1).alias(
                "span_tokens"
            ),
        )
    )


def exact_substring_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_occurrences: int = 2,
    max_anchor_df: int | None = None,
    gram_plan: str = "window",
) -> DataFrame:
    """Maximal duplicated token regions per document:
    (id, span_start, span_end, n_anchors, span_tokens) with 1-based
    inclusive token positions.

    Run extension: duplicated anchors at positions p, q (p < q) belong
    to one region when q - p <= k — anchor p's gram covers tokens
    [p, p+k-1], so q <= p+k means the two gram windows overlap or are
    exactly adjacent and the covered token interval is contiguous.
    Regions are therefore disjoint, maximal, and independent of anchor
    discovery order.  Implemented as the standard gaps-and-islands:
    break flag via lag(), region id via a running sum, both inside the
    SAME per-doc window partition (one exchange on the doc id, window
    work is partition-local)."""
    anchors = duplicated_anchors(
        positional_gram_hashes(df, text_col, id_col, k),
        min_occurrences,
        max_anchor_df,
        gram_plan,
    )
    return spans_from_anchors(anchors, k)


def exact_substring_contamination(
    eval_df: DataFrame,
    train_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    max_anchor_df: int | None = None,
) -> DataFrame:
    """Substring-level eval-set decontamination: for each eval document
    with >= 1 verbatim k-token span present ANYWHERE in the train
    corpus, the merged contaminated regions summed to
    (id, n_tokens, contaminated_tokens, n_spans, contamination_rate).

    This is the memorization-risk variant of the shingle-overlap
    decontamination report (``contamination_overlap``): that one counts
    SET overlap (any shared 3-grams, order-free); this one finds
    CONTIGUOUS >= k-token verbatim runs — a benchmark answer string
    pasted into a train doc trips this even when the documents are
    otherwise unrelated.  Anchor = eval position whose gram hash occurs
    in train (train side reduced to DISTINCT hashes first — one narrow
    aggregate — so the semi-join probes |train vocab|, not |train
    positions|); run extension is the shared gaps-and-islands pass.
    ``max_anchor_df`` drops train grams above an occurrence cap
    (boilerplate that would flag everything).

    Return contract: one row PER CONTAMINATED eval doc (inner join —
    clean eval docs are absent, so the output is the flag list an evals
    team acts on).  This deliberately differs from
    :func:`exact_substring_dup_rate`, which is a total function of its
    corpus (zeros for clean docs); left-join this result back onto the
    eval relation with ``coalesce(.., 0)`` when a total report is
    needed."""
    ev_g = positional_gram_hashes(eval_df, text_col, id_col, k)
    tr_g = positional_gram_hashes(train_df, text_col, id_col, k)
    if max_anchor_df is not None:
        tr_h = (
            tr_g.groupBy("h")
            .agg(F.count(F.lit(1)).alias("occ"))
            .filter(F.col("occ") <= max_anchor_df)
            .select("h")
        )
    else:
        tr_h = tr_g.select("h").distinct()
    anchors = ev_g.join(tr_h, "h", "left_semi").select("id", "pos")
    spans = spans_from_anchors(anchors, k)
    per_doc = spans.groupBy("id").agg(
        F.sum("span_tokens").alias("contaminated_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    base = eval_df.select(
        F.col(id_col).alias("id"),
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
    )
    return base.join(per_doc, "id").select(
        "id",
        "n_tokens",
        "contaminated_tokens",
        "n_spans",
        F.round(
            F.col("contaminated_tokens")
            / F.greatest(F.col("n_tokens"), F.lit(1)),
            6,
        ).alias("contamination_rate"),
    )


def exact_substring_cleaned(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_occurrences: int = 2,
    max_anchor_df: int | None = None,
    gram_plan: str = "window",
) -> DataFrame:
    """The REMOVAL transform of the ExactSubstr pipeline: every document
    with its duplicated regions stripped, as (id, n_tokens, kept_tokens,
    removed_tokens, cleaned_text).  Clean docs pass through verbatim
    (left join from the doc relation — total function of the corpus).

    Removal policy: ALL occurrences of a duplicated region are removed
    ("strip boilerplate entirely") — regions mark every repeat, and
    their extents are not content-keyed across documents (two copies of
    a pasted paragraph can merge with different surrounding duplication
    per doc), so a keep-one-canonical-copy policy has no well-defined
    region identity to key on.  Pipelines that want to RETAIN one copy
    of shared content should instead threshold on
    :func:`exact_substring_dup_rate` (drop only docs that are mostly
    boilerplate) — the conservative direction for a training corpus.

    Scale shape: the span relation aggregates to one compact
    (id, spans array) row per flagged doc (grouped collect of disjoint
    [start, end] pairs — bounded by tokens/k per doc), joins back to
    the doc relation KEYED on the doc id, and the strip itself is a
    narrow higher-order ``filter`` over the token array (position
    not in any span) — no explode of |token positions| rows through
    the join, no shuffle beyond the span aggregation + one keyed
    join."""
    spans = exact_substring_spans(
        df, text_col, id_col, k, min_occurrences, max_anchor_df, gram_plan
    )
    per_doc = spans.groupBy("id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    base = df.select(
        F.col(id_col).alias("id"),
        tokens(F.col(text_col)).alias("toks"),
    )
    kept = F.when(F.col("spans").isNull(), F.col("toks")).otherwise(
        F.expr(
            "filter(toks, (t, i) -> NOT exists(spans, "
            "s -> i + 1 >= s.span_start AND i + 1 <= s.span_end))"
        )
    )
    return (
        base.join(per_doc, "id", "left")
        .withColumn("kept", kept)
        .select(
            "id",
            F.size("toks").alias("n_tokens"),
            F.size("kept").alias("kept_tokens"),
            (F.size("toks") - F.size("kept")).alias("removed_tokens"),
            F.concat_ws(" ", F.col("kept")).alias("cleaned_text"),
        )
    )


def exact_substring_dup_rate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_occurrences: int = 2,
    max_anchor_df: int | None = None,
    gram_plan: str = "window",
) -> DataFrame:
    """Per-document duplicated-token budget:
    (id, n_tokens, dup_tokens, n_spans, dup_rate) — ``dup_tokens`` sums
    the disjoint region lengths, ``dup_rate`` = dup_tokens/n_tokens
    rounded to 6 dp.  Docs with no duplicated span report zeros (left
    join from the doc relation), so the output is a total function of
    the corpus — the gating signal a curation pipeline thresholds on."""
    spans = exact_substring_spans(
        df, text_col, id_col, k, min_occurrences, max_anchor_df, gram_plan
    )
    per_doc = spans.groupBy("id").agg(
        F.sum("span_tokens").alias("dup_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
    )
    return (
        base.join(per_doc, "id", "left")
        .select(
            "id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_rate"),
        )
    )
