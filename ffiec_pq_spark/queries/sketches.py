"""Deterministic sketches + semantic dedup (round-4 additions).

Three operators a 100 TB training-data pipeline leans on, each built so
the DuckDB oracle can verify the SKETCH STATE itself bit-for-bit, not
just an error bound:

- a portable HyperLogLog (md5-derived hash -> 64 registers) whose
  estimate is computed in integer arithmetic up to one final IEEE
  division, so both engines produce the identical double;
- a Bloom filter built and probed entirely as relational algebra
  (distinct bit positions + broadcast membership join), with the
  "no false negatives" guarantee pinned to a zero column the oracle
  hash-checks;
- SemDeDup-style semantic dedup: k-means cells bound the quadratic
  cosine pairing to within-cell candidates — the canonical way
  embedding-level near-dup removal survives a 100 TB corpus.

No reference analogue (iangow/ffiec.pq has no sketch surface); these
extend SURVEY.md §2's scale-extension rows alongside dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.functions.hashing import hash60, hash60_sql
from ffiec_pq_spark.session import load_table

# ---------------------------------------------------------------------------
# Portable HyperLogLog
# ---------------------------------------------------------------------------

_HLL_M = 64  # registers (p = 6 bits)
_HLL_ALPHA = 0.709  # standard alpha_64
_HLL_WBITS = 54  # 60-bit hash minus 6 bucket bits


def _bits_case(col: Column) -> Column:
    """Highest-set-bit position + 1 (binary digit count) of a
    non-negative < 2^54 integer, as a branch chain — exact on both
    engines, unlike floor(log2(x)) whose libm rounding can flip the
    floor at 2^k - 1 boundaries."""
    expr = F.lit(0)
    for b in range(1, _HLL_WBITS + 1):
        expr = F.when(col >= F.lit(1 << (b - 1)), F.lit(b)).otherwise(expr)
    return expr


def _bits_case_sql(expr: str) -> str:
    branches = " ".join(
        f"WHEN {expr} >= {1 << (b - 1)} THEN {b}"
        for b in range(_HLL_WBITS, 0, -1)
    )
    return f"(CASE {branches} ELSE 0 END)"


def _hll_sql() -> str:
    h = hash60_sql("user_id")
    bits = _bits_case_sql("w")
    return f"""
    WITH hashed AS (
      SELECT event_type,
             ({h}) % {_HLL_M} AS bucket,
             ({h}) // {_HLL_M} AS w
      FROM events
    ),
    regs AS (
      SELECT event_type, bucket,
             max({_HLL_WBITS + 1} - {bits}) AS m_j
      FROM hashed GROUP BY 1, 2
    ),
    rmax AS (
      SELECT event_type, bucket, m_j,
             max(m_j) OVER (PARTITION BY event_type) AS r
      FROM regs
    ),
    state AS (
      SELECT event_type, max(r) AS rmax, count(*) AS n_hit,
             CAST(sum((1::BIGINT) << (r - m_j)) AS BIGINT) AS s_hit
      FROM rmax GROUP BY event_type
    )
    SELECT s.event_type,
           s.n_hit AS n_hit_buckets,
           s.rmax,
           s.s_hit + ({_HLL_M} - s.n_hit) * ((1::BIGINT) << s.rmax) AS s_scaled,
           round((({_HLL_ALPHA} * {_HLL_M}) * {_HLL_M}) * pow(2.0, s.rmax)
                 / (s.s_hit + ({_HLL_M} - s.n_hit) * ((1::BIGINT) << s.rmax)),
                 2) AS hll_est,
           x.n_exact
    FROM state s
    JOIN (SELECT event_type, count(DISTINCT user_id) AS n_exact
          FROM events GROUP BY event_type) x USING (event_type)
    """


@register("hll_portable_sketch", _hll_sql(), tags=["sketch", "approx"])
def hll_portable_sketch(spark, sf_dir):
    """Hand-rolled HyperLogLog whose REGISTer state and estimate are
    bit-identical cross-engine: portable 60-bit hash -> 6-bit bucket +
    54-bit suffix, register = max(55 - bits(suffix)), and the harmonic
    denominator kept in INTEGER arithmetic (sum of left-shifts scaled
    by 2^rmax, <= 64 * 2^55 < 2^63) so the only float op is one final
    multiply/divide — IEEE-exact-rounded identically on both engines
    (no libm call anywhere: see _bits_case vs floor(log2)).

    The production path at 100 TB is one shuffle to (event_type,
    bucket) with map-side max partials — fixed 64-register state per
    group, mergeable across any partitioning; ``approx_distinct_users``
    covers Spark's native HLL++, this one proves the sketch algebra
    under the strict oracle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    h = hash60(F.col("user_id"))
    # shiftright, not "/ 64": the hash is 60-bit and double division
    # loses integer exactness above 2^52
    hashed = ev.select("event_type", h.alias("_h")).select(
        "event_type",
        (F.col("_h") % _HLL_M).alias("bucket"),
        F.shiftright(F.col("_h"), 6).alias("w"),
    )
    regs = hashed.groupBy("event_type", "bucket").agg(
        F.max(F.lit(_HLL_WBITS + 1) - _bits_case(F.col("w"))).alias("m_j")
    )
    r = F.max("m_j").over(Window.partitionBy("event_type"))
    state = (
        regs.withColumn("r", r)
        .groupBy("event_type")
        .agg(
            F.max("r").alias("rmax"),
            F.count(F.lit(1)).alias("n_hit"),
            # F.shiftleft takes only a literal shift — SQL form for a
            # column-valued shift count
            F.sum(F.expr("shiftleft(1L, cast(r - m_j AS int))")).alias("s_hit"),
        )
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    s_scaled = F.col("s_hit") + (F.lit(_HLL_M) - F.col("n_hit")) * F.expr(
        "shiftleft(1L, cast(rmax AS int))"
    )
    est = (
        F.lit(_HLL_ALPHA * _HLL_M)
        * F.lit(float(_HLL_M))
        * F.pow(F.lit(2.0), F.col("rmax"))
        / s_scaled
    )
    return (
        state.join(exact, "event_type")
        .select(
            "event_type",
            F.col("n_hit").alias("n_hit_buckets"),
            "rmax",
            s_scaled.alias("s_scaled"),
            F.round(est, 2).alias("hll_est"),
            "n_exact",
        )
    )


def _hll_merge_sql() -> str:
    h = hash60_sql("user_id")
    bits = _bits_case_sql("w")
    return f"""
    WITH hashed AS (
      SELECT user_id % 2 AS half,
             ({h}) % {_HLL_M} AS bucket,
             max({_HLL_WBITS + 1} - {bits}) AS m_j
      FROM (SELECT user_id, ({h}) // {_HLL_M} AS w FROM events)
      GROUP BY 1, 2
    ),
    merged AS (
      SELECT bucket, max(m_j) AS m_j FROM hashed GROUP BY bucket
    ),
    whole AS (
      SELECT ({h}) % {_HLL_M} AS bucket,
             max({_HLL_WBITS + 1} - {bits}) AS m_j
      FROM (SELECT user_id, ({h}) // {_HLL_M} AS w FROM events)
      GROUP BY 1
    ),
    cmp AS (
      SELECT count(*) AS n_buckets,
             CAST(sum(CASE WHEN m.m_j = w.m_j THEN 1 ELSE 0 END) AS BIGINT)
               AS n_equal
      FROM merged m JOIN whole w USING (bucket)
    ),
    state AS (
      SELECT max(m_j) AS rmax, count(*) AS n_hit,
             CAST(sum((1::BIGINT) << (max_all - m_j)) AS BIGINT) AS s_hit
      FROM (SELECT m_j, max(m_j) OVER () AS max_all FROM merged)
    )
    SELECT c.n_buckets, c.n_equal,
           c.n_buckets = c.n_equal AS merge_lossless,
           round((({_HLL_ALPHA} * {_HLL_M}) * {_HLL_M}) * pow(2.0, s.rmax)
                 / (s.s_hit + ({_HLL_M} - s.n_hit) * ((1::BIGINT) << s.rmax)),
                 2) AS hll_est,
           (SELECT count(DISTINCT user_id) FROM events) AS n_exact
    FROM cmp c, state s
    """


@register("hll_merge_check", _hll_merge_sql(), tags=["sketch", "approx"])
def hll_merge_check(spark, sf_dir):
    """The property that makes HLL usable at 100 TB: registers computed
    on DISJOINT partitions merge by per-bucket max into exactly the
    whole-corpus registers — so the sketch reduces map-side, ships 64
    bytes per partition, and never rescans.  The query computes both
    sides (halves split on ``user_id % 2``, then merged; whole corpus
    directly), pins ``merge_lossless`` for the oracle to hash-check,
    and reports the merged estimate next to the exact count (same
    integer-exact arithmetic as ``hll_portable_sketch``)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    h = hash60(F.col("user_id"))
    base = ev.select(
        (F.col("user_id") % 2).alias("half"), h.alias("_h")
    ).select(
        "half",
        (F.col("_h") % _HLL_M).alias("bucket"),
        F.shiftright(F.col("_h"), 6).alias("w"),
    )
    rho = F.lit(_HLL_WBITS + 1) - _bits_case(F.col("w"))
    halves = base.groupBy("half", "bucket").agg(F.max(rho).alias("m_j"))
    merged = halves.groupBy("bucket").agg(F.max("m_j").alias("m_j"))
    whole = base.groupBy("bucket").agg(F.max(rho).alias("m_j"))
    cmp_df = (
        merged.withColumnRenamed("m_j", "m_m")
        .join(whole.withColumnRenamed("m_j", "m_w"), "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum((F.col("m_m") == F.col("m_w")).cast("long")).alias(
                "n_equal"
            ),
        )
    )
    w_all = Window.partitionBy()
    state = (
        merged.withColumn("r", F.max("m_j").over(w_all))
        .groupBy()
        .agg(
            F.max("r").alias("rmax"),
            F.count(F.lit(1)).alias("n_hit"),
            F.sum(F.expr("shiftleft(1L, cast(r - m_j AS int))")).alias(
                "s_hit"
            ),
        )
    )
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    s_scaled = F.col("s_hit") + (F.lit(_HLL_M) - F.col("n_hit")) * F.expr(
        "shiftleft(1L, cast(rmax AS int))"
    )
    est = (
        F.lit(_HLL_ALPHA * _HLL_M)
        * F.lit(float(_HLL_M))
        * F.pow(F.lit(2.0), F.col("rmax"))
        / s_scaled
    )
    return (
        cmp_df.crossJoin(state)
        .crossJoin(exact)
        .select(
            "n_buckets",
            "n_equal",
            (F.col("n_buckets") == F.col("n_equal")).alias("merge_lossless"),
            F.round(est, 2).alias("hll_est"),
            "n_exact",
        )
    )


# ---------------------------------------------------------------------------
# Relational Bloom filter
# ---------------------------------------------------------------------------

_BLOOM_BITS = 8192
_BLOOM_K = 3
_BLOOM_BAL = 5000  # membership set: customers with c_acctbal > this


def _bloom_sql() -> str:
    pos = lambda j: f"({hash60_sql('c_custkey', seed=j)}) % {_BLOOM_BITS}"
    probe_pos = " UNION ALL ".join(
        f"SELECT c_custkey, c_mktsegment, is_member, {pos(j)} AS bit FROM probes"
        for j in range(_BLOOM_K)
    )
    member_pos = " UNION ALL ".join(
        f"SELECT {pos(j)} AS bit FROM members" for j in range(_BLOOM_K)
    )
    return f"""
    WITH members AS (
      SELECT c_custkey FROM customer WHERE c_acctbal > {_BLOOM_BAL}
    ),
    bits AS (SELECT DISTINCT bit FROM ({member_pos})),
    probes AS (
      SELECT c_custkey, c_mktsegment, c_acctbal > {_BLOOM_BAL} AS is_member
      FROM customer
    ),
    pp AS ({probe_pos}),
    hits AS (
      SELECT p.c_custkey, p.c_mktsegment, p.is_member,
             min(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END) AS all_set
      FROM pp p LEFT JOIN bits b ON p.bit = b.bit
      GROUP BY 1, 2, 3
    )
    SELECT c_mktsegment,
           count(*) AS n_probes,
           CAST(sum(CASE WHEN all_set = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged,
           CAST(sum(CASE WHEN all_set = 1 AND NOT is_member THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN all_set = 0 AND is_member THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_neg
    FROM hits GROUP BY c_mktsegment
    """


@register("bloom_membership_filter", _bloom_sql(), tags=["sketch", "join"])
def bloom_membership_filter(spark, sf_dir):
    """Bloom filter as relational algebra: the filter is the DISTINCT
    set of k=3 portable-hash bit positions of the member keys (<= 8192
    rows — broadcast side at any corpus size); a probe is flagged iff
    ALL its positions hit.  Per-segment counts report flagged / false
    positives, and the ``n_false_neg`` column is the Bloom guarantee
    itself — structurally zero, and the oracle hash-checks it.

    At 100 TB this is the pre-join pruning pattern: the bit table
    broadcasts where the member key set cannot, and the probe side is
    one narrow projection + groupBy riding its own scan."""
    c = load_table(spark, sf_dir, "customer")
    members = c.filter(F.col("c_acctbal") > _BLOOM_BAL).select("c_custkey")
    positions = F.array(
        *[
            (hash60(F.col("c_custkey"), seed=j) % _BLOOM_BITS)
            for j in range(_BLOOM_K)
        ]
    )
    bits = (
        members.select(F.explode(positions).alias("bit")).distinct()
    )
    probes = c.select(
        "c_custkey",
        "c_mktsegment",
        (F.col("c_acctbal") > _BLOOM_BAL).alias("is_member"),
        F.explode(positions).alias("bit"),
    )
    hits = (
        probes.join(F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left")
        .groupBy("c_custkey", "c_mktsegment", "is_member")
        .agg(F.min(F.coalesce(F.col("_set"), F.lit(0))).alias("all_set"))
    )
    return hits.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum((F.col("all_set") == 1).cast("long")).alias("n_flagged"),
        F.sum(((F.col("all_set") == 1) & ~F.col("is_member")).cast("long")).alias(
            "n_false_pos"
        ),
        F.sum(((F.col("all_set") == 0) & F.col("is_member")).cast("long")).alias(
            "n_false_neg"
        ),
    )


# ---------------------------------------------------------------------------
# Character-entropy quality scoring
# ---------------------------------------------------------------------------


@register(
    "char_entropy_quality",
    """
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ),
    counts AS (
      SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2
    ),
    ent AS (
      SELECT doc_id,
             sum(c) AS n,
             count(*) AS n_distinct_chars,
             round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS entropy
      FROM counts GROUP BY doc_id
    )
    SELECT doc_id, n_distinct_chars, entropy,
           CASE WHEN entropy < 3.0 THEN 'low'
                WHEN entropy < 4.2 THEN 'mid'
                ELSE 'high' END AS entropy_band
    FROM ent
    """,
    tags=["text", "quality"],
)
def char_entropy_quality(spark, sf_dir):
    """Per-document character Shannon entropy — the classic cheap
    gibberish/boilerplate detector in LLM corpus filtering (low entropy
    = repeated filler, high = random noise).  Computed as
    ``log2(n) - sum(c*log2 c)/n`` so there is ONE log per distinct
    (doc, char) class; rounded at 4 dp, far above libm ulp + summation
    -order noise, and banded for the downstream filter.

    Scale shape: explode to (doc, char) then two grouped aggregations —
    the fan-out is bounded by text length and collapses map-side to at
    most |alphabet| rows per document before the shuffle."""
    d = load_table(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    ent = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.round(
            F.log2(F.sum("c"))
            - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
            4,
        ).alias("entropy"),
    )
    band = (
        F.when(F.col("entropy") < 3.0, "low")
        .when(F.col("entropy") < 4.2, "mid")
        .otherwise("high")
    )
    return ent.select(
        "doc_id", "n_distinct_chars", "entropy", band.alias("entropy_band")
    )
