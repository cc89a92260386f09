"""Round-6 additions: the 17 queries promised by the round-5 catalog
rotation, now real.  Eight event/order/lineitem operators (as-of join,
session funnel, distributed reservoir sampling, median inter-order gap,
discrete hazard rate, brand-affinity lift, KMV/theta set-overlap sketch,
watermark-lateness audit) and nine document/embedding operators
(bottom-k MinHash containment, banded SRP cosine LSH, composite quality
filter, robust scaling, interpolated trigram LM, token-bucket stats,
scalar residual quantization, per-language stopword/entropy profile,
paragraph-level dedup rate).

No reference analogue (iangow/ffiec.pq has no temporal/similarity
surface); these extend SURVEY.md §2's scale-extension rows.  Every
query has an exact DuckDB oracle; doubles are rounded identically on
both sides so summation order cannot flip the hash.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.functions.hashing import hash60, hash60_sql
from ffiec_pq_spark.session import load_table

# ---------------------------------------------------------------------------
# events_asof_join_rates — as-of (point-in-time) join
# ---------------------------------------------------------------------------


@register(
    "events_asof_join_rates",
    """
    WITH rates AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             avg(value) AS rate
      FROM events GROUP BY 1, 2
    ),
    u AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             0 AS role, event_id, value, CAST(NULL AS DOUBLE) AS rate
      FROM events
      UNION ALL
      SELECT event_type, d, 1 AS role, -1 AS event_id,
             CAST(NULL AS DOUBLE) AS value, rate
      FROM rates
    ),
    w AS (
      SELECT event_type, role, value,
             last_value(rate IGNORE NULLS) OVER (
               PARTITION BY event_type
               ORDER BY d, role, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_rate
      FROM u
    )
    SELECT event_type,
           count(*) AS n_events,
           round(avg(value - asof_rate), 6) AS avg_resid
    FROM w
    WHERE role = 0 AND asof_rate IS NOT NULL
    GROUP BY event_type
    """,
    tags=["temporal", "join", "asof"],
)
def events_asof_join_rates(spark, sf_dir):
    """As-of join, Spark-first: each event picks the most recent
    *prior-day* reference rate for its type (daily avg value), without
    a range join.  The union-then-``last(ignorenulls)`` window is the
    canonical distributed as-of: tag rate rows and event rows, sort
    within the join key only, and carry the last seen rate forward.
    One shuffle on ``event_type`` (the as-of key), no per-row range
    probe, no broadcastable-interval blow-up — the shape that survives
    a 100 TB fact stream as long as the key has cardinality (salt the
    key with a date bucket if a single key dominates).

    Implemented on the shared :func:`operators.windows.asof_join`
    operator (``strict=True``): same-day rates sort after events, so
    the carried rate is strictly from an earlier day — a
    point-in-time-correct feature with no label leakage.  First-day
    events have no prior rate and are dropped by the IS NOT NULL gate
    on both engines."""
    from ffiec_pq_spark.operators.windows import asof_join

    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    rates = ev.groupBy("event_type", d.alias("d")).agg(
        F.avg("value").alias("rate")
    )
    joined = asof_join(
        ev.select("event_type", d.alias("d"), "event_id", "value"),
        rates,
        key="event_type",
        left_ts="d",
        right_ts="d",
        right_vals=["rate"],
        strict=True,  # same-day rates excluded: strictly prior-day carry
    )
    return (
        joined.filter(F.col("rate").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg(F.col("value") - F.col("rate")), 6).alias(
                "avg_resid"
            ),
        )
    )


# ---------------------------------------------------------------------------
# events_session_funnel_time — sessionize + view→purchase funnel timing
# ---------------------------------------------------------------------------

_SESSION_GAP_SEC = 1800.0


@register(
    "events_session_funnel_time",
    f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type,
             epoch(CAST(ts AS TIMESTAMP)) AS sec
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, event_type, sec,
             CASE WHEN sec - lag(sec) OVER (
                    PARTITION BY user_id ORDER BY sec, event_id)
                    > {_SESSION_GAP_SEC}
                  OR lag(sec) OVER (
                    PARTITION BY user_id ORDER BY sec, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM ev
    ),
    sess AS (
      SELECT user_id, event_type, sec,
             sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY sec, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM flagged
    ),
    per_sess AS (
      SELECT user_id, sess_id,
             min(CASE WHEN event_type = 'view' THEN sec END) AS first_view,
             min(CASE WHEN event_type = 'purchase' THEN sec END) AS first_purchase
      FROM sess GROUP BY 1, 2
    )
    SELECT count(*) AS n_sessions,
           CAST(sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_view,
           CAST(sum(CASE WHEN first_purchase >= first_view THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converted,
           round(avg(CASE WHEN first_purchase >= first_view
                          THEN first_purchase - first_view END), 3)
             AS avg_view_to_purchase_sec
    FROM per_sess
    """,
    tags=["temporal", "session", "funnel"],
)
def events_session_funnel_time(spark, sf_dir):
    """Session funnel timing: 30-minute-gap sessionization per user,
    then per-session first-view → first-purchase latency.  A session
    "converts" iff its first purchase is at-or-after its first view —
    a fixed, order-independent definition (min() per type) so the
    result is deterministic under any shuffle order.

    Scale shape: both windows partition by ``user_id`` (high
    cardinality — parallel, no global sort); the funnel itself is one
    grouped conditional aggregation.  Timestamps flow as exact double
    seconds (microseconds/1e6 — lossless in float64 for epoch-scale
    values) on both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").cast("double").alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        (
            F.lag("sec").over(w).isNull()
            | ((F.col("sec") - F.lag("sec").over(w)) > _SESSION_GAP_SEC)
        ).cast("int"),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("sess_id", F.sum("new_sess").over(cum))
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("sec"))).alias(
            "first_view"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("sec"))
        ).alias("first_purchase"),
    )
    converted = F.col("first_purchase") >= F.col("first_view")
    return per_sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.col("first_view").isNotNull().cast("long")).alias(
            "n_with_view"
        ),
        F.sum(F.coalesce(converted.cast("long"), F.lit(0))).alias(
            "n_converted"
        ),
        F.round(
            F.avg(
                F.when(converted, F.col("first_purchase") - F.col("first_view"))
            ),
            3,
        ).alias("avg_view_to_purchase_sec"),
    )


# ---------------------------------------------------------------------------
# reservoir_sample_per_type — deterministic k-per-group sample
# ---------------------------------------------------------------------------

_RESERVOIR_K = 5


def _reservoir_sql() -> str:
    h = hash60_sql("event_id", seed=7)
    return f"""
    SELECT event_type, event_id, rn AS slot
    FROM (
      SELECT event_type, event_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY {h}, event_id) AS rn
      FROM events
    )
    WHERE rn <= {_RESERVOIR_K}
    """


@register("reservoir_sample_per_type", _reservoir_sql(), tags=["sampling"])
def reservoir_sample_per_type(spark, sf_dir):
    """Deterministic reservoir sample: k=5 events per event_type, chosen
    by smallest seeded portable hash — the same uniform-without-
    replacement marginal distribution as a classic reservoir, but
    rerun-stable and embarrassingly parallel (Efraimidis-Spirmpakos
    weight = hash order).

    Scale shape: ``event_type`` has tiny cardinality, so a naive
    per-type window would funnel the whole table through a handful of
    reducers.  Instead: stage 1 takes the per-(type, salt) top-k over
    64 hash-derived salt buckets (parallel, each reducer sees ~1/64 of
    a type), stage 2 re-ranks the ≤64·k survivors per type.  The
    global top-k by hash always survives its salt bucket, so the
    two-phase result is IDENTICAL to the single-window oracle."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", hash60("event_id", seed=7).alias("h")
    )
    salted = ev.withColumn("salt", (F.col("h") % 64).cast("int"))
    w1 = Window.partitionBy("event_type", "salt").orderBy("h", "event_id")
    stage1 = (
        salted.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= _RESERVOIR_K)
        .drop("rn1", "salt")
    )
    w2 = Window.partitionBy("event_type").orderBy("h", "event_id")
    return (
        stage1.withColumn("slot", F.row_number().over(w2))
        .filter(F.col("slot") <= _RESERVOIR_K)
        .select("event_type", "event_id", "slot")
    )


# ---------------------------------------------------------------------------
# orders_median_gap_days — per-customer median inter-order gap
# ---------------------------------------------------------------------------


@register(
    "orders_median_gap_days",
    """
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(CAST(o_orderdate AS DATE)) OVER (
                         PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey),
                       CAST(o_orderdate AS DATE)) AS gap
      FROM orders
    )
    SELECT o_custkey,
           count(*) + 1 AS n_orders,
           round(quantile_cont(gap, 0.5), 3) AS median_gap_days
    FROM gaps
    WHERE gap IS NOT NULL
    GROUP BY o_custkey
    HAVING count(*) >= 2
    """,
    tags=["temporal", "window"],
)
def orders_median_gap_days(spark, sf_dir):
    """Median days between consecutive orders per customer (cadence
    signal for retention/churn features).  ``lag`` runs in a
    per-customer window (high-cardinality partition key — parallel);
    the median is an exact per-group ``percentile`` with linear
    interpolation, matching DuckDB ``quantile_cont`` bit-for-bit on
    integer day gaps (interpolated halves are exact in float64).
    Customers with fewer than 3 orders (fewer than 2 gaps) are
    excluded on both engines."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"), F.lag(F.to_date("o_orderdate")).over(w)
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    return (
        gaps.groupBy("o_custkey")
        .agg(
            (F.count(F.lit(1)) + 1).alias("n_orders"),
            F.round(F.percentile(F.col("gap"), F.lit(0.5)), 3).alias(
                "median_gap_days"
            ),
        )
        .filter(F.col("n_orders") >= 3)
    )


# ---------------------------------------------------------------------------
# events_hazard_rate — discrete-time survival hazard
# ---------------------------------------------------------------------------


@register(
    "events_hazard_rate",
    """
    WITH life AS (
      SELECT user_id,
             date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
               AS t
      FROM events GROUP BY user_id
    ),
    deaths AS (SELECT t, count(*) AS deaths FROM life GROUP BY t)
    SELECT t, deaths,
           CAST(sum(deaths) OVER (
             ORDER BY t
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
             AS at_risk,
           round(deaths / sum(deaths) OVER (
             ORDER BY t
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 6) AS hazard
    FROM deaths
    """,
    tags=["temporal", "survival"],
)
def events_hazard_rate(spark, sf_dir):
    """Discrete-time hazard: user "lifetime" = days between first and
    last event; hazard(t) = users ending at t / users surviving to t.
    The classic churn-curve estimator (Kaplan-Meier denominator).

    Scale shape: lifetimes are one grouped agg on ``user_id``
    (parallel); the hazard window then runs over the *lifetime
    histogram*, whose row count is bounded by the observation span in
    days (~30 here, thousands at most in production) — a global window
    over a provably tiny relation, not over the data."""
    ev = load_table(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts"))).alias("t")
    )
    deaths = life.groupBy("t").agg(F.count(F.lit(1)).alias("deaths"))
    w = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    at_risk = F.sum("deaths").over(w)
    return deaths.select(
        "t",
        "deaths",
        at_risk.alias("at_risk"),
        F.round(F.col("deaths") / at_risk, 6).alias("hazard"),
    )


# ---------------------------------------------------------------------------
# part_brand_affinity_lift — market-basket lift between brands
# ---------------------------------------------------------------------------

_LIFT_MIN_PAIRS = 3


@register(
    "part_brand_affinity_lift",
    f"""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT count(DISTINCT okey) AS n_orders FROM ob),
    bc AS (SELECT brand, count(*) AS n_b FROM ob GROUP BY brand),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_ab
      FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, n_ab,
           round(CAST(n_ab AS DOUBLE) * n.n_orders
                 / (ca.n_b * CAST(cb.n_b AS DOUBLE)), 6) AS lift
    FROM pairs
    JOIN bc ca ON ca.brand = brand_a
    JOIN bc cb ON cb.brand = brand_b
    CROSS JOIN n
    WHERE n_ab >= {_LIFT_MIN_PAIRS}
    """,
    tags=["basket", "stats"],
)
def part_brand_affinity_lift(spark, sf_dir):
    """Brand-affinity lift: for brands A,B co-occurring in an order,
    lift = P(A,B) / (P(A)·P(B)) — >1 means the pair co-occurs more than
    independence predicts (the association-rule screen).

    Scale shape: the order→brand basket relation is distinct-collapsed
    first (bounds the self-join fan-out by basket size, not line
    count); the pair join is keyed on ``l_orderkey`` (parallel,
    skew-bounded by the largest basket); brand marginals and the order
    total are tiny aggregates broadcast back.  One exact integer ratio
    per pair, rounded identically on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    ob = (
        li.join(
            F.broadcast(pt.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n = ob.agg(F.countDistinct("okey").alias("n_orders"))
    bc = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("n_b"))
    a = ob.alias("a")
    b = ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _LIFT_MIN_PAIRS)
    )
    ca = bc.select(F.col("brand").alias("brand_a"), F.col("n_b").alias("na"))
    cb = bc.select(F.col("brand").alias("brand_b"), F.col("n_b").alias("nb"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n_orders")
                / (F.col("na") * F.col("nb").cast("double")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# lineitem_theta_sketch_overlap — KMV/theta set-intersection estimate
# ---------------------------------------------------------------------------

_THETA_K = 128
_H_MAX = 1 << 60  # hash60 range


def _theta_sql() -> str:
    h = hash60_sql("l_partkey", seed=3)
    return f"""
    WITH hashes AS (
      SELECT DISTINCT l_returnflag AS flag, {h} AS h
      FROM lineitem WHERE l_returnflag IN ('R', 'A')
    ),
    ranked AS (
      SELECT flag, h,
             row_number() OVER (PARTITION BY flag ORDER BY h) AS rn,
             count(*) OVER (PARTITION BY flag) AS n
      FROM hashes
    ),
    sk AS (SELECT flag, h, rn, n FROM ranked WHERE rn <= {_THETA_K}),
    theta AS (
      SELECT flag,
             CASE WHEN max(n) >= {_THETA_K} THEN max(h) ELSE {_H_MAX} END
               AS th
      FROM sk GROUP BY flag
    ),
    t AS (
      SELECT least(ta.th, tb.th) AS th_min, ta.th AS th_a, tb.th AS th_b
      FROM theta ta, theta tb WHERE ta.flag = 'R' AND tb.flag = 'A'
    ),
    matched AS (
      SELECT count(*) AS m
      FROM sk a JOIN sk b ON a.h = b.h AND a.flag = 'R' AND b.flag = 'A'
      CROSS JOIN t
      WHERE a.h < t.th_min
    ),
    est AS (
      SELECT
        round(CASE WHEN t.th_a >= {_H_MAX}
                   THEN (SELECT max(n) FROM sk WHERE flag = 'R')
                   ELSE ({_THETA_K} - 1) / (CAST(t.th_a AS DOUBLE) / {_H_MAX})
              END, 6) AS est_distinct_r,
        round(CASE WHEN t.th_b >= {_H_MAX}
                   THEN (SELECT max(n) FROM sk WHERE flag = 'A')
                   ELSE ({_THETA_K} - 1) / (CAST(t.th_b AS DOUBLE) / {_H_MAX})
              END, 6) AS est_distinct_a,
        round(matched.m / (CAST(t.th_min AS DOUBLE) / {_H_MAX}), 6)
          AS est_intersection
      FROM t CROSS JOIN matched
    )
    SELECT est_distinct_r, est_distinct_a, est_intersection,
           (SELECT count(*) FROM
              (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R')
              x JOIN
              (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'A')
              y USING (l_partkey)) AS exact_intersection
    FROM est
    """


@register("lineitem_theta_sketch_overlap", _theta_sql(), tags=["sketch", "approx"])
def lineitem_theta_sketch_overlap(spark, sf_dir):
    """Theta/KMV set-overlap sketch: the k=128 smallest portable hashes
    of each side's distinct partkeys form its sketch; θ = k-th smallest
    (or hash-max when the set is smaller than k, making the sketch
    exact).  Intersection estimate = |shared hashes below min(θ_A,θ_B)|
    / θ_fraction — the standard theta-sketch a-priori intersection,
    here verified against the exact distinct-join answer in the same
    row.

    Everything is integer arithmetic (hash compares, array slices,
    counts) until the final IEEE divisions, so both engines produce the
    identical doubles.  Scale shape: the sketch is built in the
    two-phase reducible form — each task reduces its partition of the
    distinct hashes to its k smallest (`slice(sort_array(collect_list))`
    per (partition id, flag)), then a merge of <= partitions*k
    candidates per flag yields the global bottom-k.  No per-flag total
    sort, no window function anywhere (plan-pinned by
    `test_plans.py::test_theta_sketch_no_per_flag_total_sort`);
    mergeable across shards.  Memory is bounded by partition size, not
    constant: the phase-1 collect_list buffers a task's distinct hashes
    before slice truncates to k (repartition upstream to cap task input
    on skewed data; the removed window sort could spill but paid a
    per-flag total sort).  The exact-join verification column is the
    part you DROP at 100 TB (it exists to certify the sketch)."""
    li = load_table(spark, sf_dir, "lineitem")
    h = hash60("l_partkey", seed=3)
    hashes = (
        li.filter(F.col("l_returnflag").isin("R", "A"))
        .select(F.col("l_returnflag").alias("flag"), h.alias("h"))
        .distinct()
    )
    # Phase 1: per-partition bottom-k.  (partition id, flag) groups never
    # span tasks, so the shuffle carries <= partitions*2 ROWS — but the
    # partial collect_list buffers a partition's FULL distinct-hash list
    # pre-slice (the slice projection runs after the final aggregation),
    # so per-row payload is O(partition distinct hashes), not <= k.
    # Volume = distinct hashes, unavoidable for an exact bottom-k sketch;
    # the win vs the old shape is no single-reducer per-flag total sort.
    part_bk = hashes.groupBy(
        F.spark_partition_id().alias("_pid"), "flag"
    ).agg(
        F.slice(F.sort_array(F.collect_list("h")), 1, _THETA_K).alias("bk"),
        F.count(F.lit(1)).alias("pn"),
    )
    # Phase 2: merge the bounded candidate sets into the global bottom-k
    # per flag; n (total distinct per flag) rides the same aggregate.
    merged = part_bk.groupBy("flag").agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("bk"))), 1, _THETA_K
        ).alias("bk"),
        F.sum("pn").alias("n"),
    )
    sk = merged.select("flag", F.explode("bk").alias("h"))
    theta = merged.select(
        "flag",
        F.when(F.col("n") >= _THETA_K, F.element_at("bk", _THETA_K))
        .otherwise(F.lit(_H_MAX))
        .alias("th"),
        F.col("n").alias("sk_n"),
    )
    ta = theta.filter(F.col("flag") == "R").select(
        F.col("th").alias("th_a"), F.col("sk_n").alias("n_a")
    )
    tb = theta.filter(F.col("flag") == "A").select(
        F.col("th").alias("th_b"), F.col("sk_n").alias("n_b")
    )
    t = ta.crossJoin(tb).select(
        "th_a", "th_b", "n_a", "n_b", F.least("th_a", "th_b").alias("th_min")
    )
    ska = sk.filter(F.col("flag") == "R").select(F.col("h").alias("ha"))
    skb = sk.filter(F.col("flag") == "A").select(F.col("h").alias("hb"))
    matched = (
        ska.join(skb, F.col("ha") == F.col("hb"))
        .crossJoin(F.broadcast(t.select("th_min")))
        .filter(F.col("ha") < F.col("th_min"))
        .agg(F.count(F.lit(1)).alias("m"))
    )
    est_r = F.when(
        F.col("th_a") >= _H_MAX, F.col("n_a").cast("double")
    ).otherwise(
        F.lit(float(_THETA_K - 1)) / (F.col("th_a").cast("double") / _H_MAX)
    )
    est_a = F.when(
        F.col("th_b") >= _H_MAX, F.col("n_b").cast("double")
    ).otherwise(
        F.lit(float(_THETA_K - 1)) / (F.col("th_b").cast("double") / _H_MAX)
    )
    xr = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_partkey")
        .distinct()
    )
    xa = (
        li.filter(F.col("l_returnflag") == "A")
        .select("l_partkey")
        .distinct()
    )
    exact = xr.join(xa, "l_partkey").agg(
        F.count(F.lit(1)).alias("exact_intersection")
    )
    return (
        t.crossJoin(matched)
        .crossJoin(exact)
        .select(
            F.round(est_r, 6).alias("est_distinct_r"),
            F.round(est_a, 6).alias("est_distinct_a"),
            F.round(
                F.col("m") / (F.col("th_min").cast("double") / _H_MAX), 6
            ).alias("est_intersection"),
            "exact_intersection",
        )
    )


# ---------------------------------------------------------------------------
# events_watermark_lateness_audit — out-of-orderness profile
# ---------------------------------------------------------------------------


@register(
    "events_watermark_lateness_audit",
    """
    WITH arr AS (
      SELECT event_type, event_id, user_id,
             epoch(CAST(ts AS TIMESTAMP)) AS sec
      FROM events
    ),
    late AS (
      SELECT event_type,
             max(sec) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - sec
               AS late_sec
      FROM arr
    )
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CASE WHEN late_sec > 60 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late_1m,
           CAST(sum(CASE WHEN late_sec > 600 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late_10m,
           CAST(sum(CASE WHEN late_sec > 3600 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late_1h,
           round(max(late_sec), 3) AS max_late_sec
    FROM late
    GROUP BY event_type
    """,
    tags=["temporal", "streaming", "audit"],
)
def events_watermark_lateness_audit(spark, sf_dir):
    """Watermark-lateness audit: replay each user's stream in arrival
    order (event_id) and measure every event's lateness against the
    running max event-time — exactly the quantity a Structured
    Streaming watermark trades off.  The per-type tier counts (1m /
    10m / 1h) tell you what ``withWatermark`` delay keeps the drop
    rate acceptable BEFORE you deploy the streaming job; pair with
    ``stream_incremental_agg``.

    Scale shape: the running max partitions by ``user_id`` (parallel);
    the audit is one grouped aggregation.  Exact double-second
    arithmetic on both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "user_id",
        F.col("ts").cast("double").alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = ev.select(
        "event_type", (F.max("sec").over(w) - F.col("sec")).alias("late_sec")
    )
    return late.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("late_sec") > 60).cast("long")).alias("n_late_1m"),
        F.sum((F.col("late_sec") > 600).cast("long")).alias("n_late_10m"),
        F.sum((F.col("late_sec") > 3600).cast("long")).alias("n_late_1h"),
        F.round(F.max("late_sec"), 3).alias("max_late_sec"),
    )


# ---------------------------------------------------------------------------
# docs_minhash_containment — bottom-k containment estimator
# ---------------------------------------------------------------------------

_CONT_K = 16
_CONT_DF_CAP = 20
_CONT_MIN = 0.5


def _containment_sql() -> str:
    from ffiec_pq_spark.operators.text import shingles_sql

    h = hash60_sql("s", seed=5)
    return f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, {h} AS h
      FROM (SELECT doc_id, unnest({shingles_sql('text')}) AS s FROM documents)
    ),
    capped AS (SELECT h FROM sh GROUP BY h HAVING count(*) <= {_CONT_DF_CAP}),
    shc AS (SELECT sh.doc_id, sh.h FROM sh JOIN capped USING (h)),
    sz AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
    bk AS (
      SELECT doc_id, h FROM (
        SELECT doc_id, h,
               row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn
        FROM shc)
      WHERE rn <= {_CONT_K}
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_matched
      FROM bk a JOIN shc b ON a.h = b.h AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_matched,
           round(n_matched / least({_CONT_K}, sz.n), 6) AS containment
    FROM pairs JOIN sz ON sz.doc_id = doc_a
    WHERE round(n_matched / least({_CONT_K}, sz.n), 6) >= {_CONT_MIN}
    """


@register("docs_minhash_containment", _containment_sql(), tags=["dedup", "sketch"])
def docs_minhash_containment(spark, sf_dir):
    """Bottom-k MinHash CONTAINMENT (Broder): sample doc A's shingle set
    by its k=16 smallest portable hashes and measure what fraction of
    the sample appears in doc B's full shingle set — estimating
    |A∩B|/|A|, the ASYMMETRIC overlap the Jaccard family cannot see
    (a snippet fully contained in a larger doc scores ~1.0 here but
    low Jaccard).  Exact when |A| ≤ k.

    Scale shape: the probe join is keyed on the shingle hash with the
    repo's standard document-frequency cap (boilerplate shingles in
    more than 20 docs are excluded on BOTH engines, bounding join
    fan-out); the bottom-k window partitions by doc_id (parallel).
    All-integer counts; one exact division, rounded identically."""
    from ffiec_pq_spark.operators.text import shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select("doc_id", F.explode(shingles("text")).alias("s"))
        .select("doc_id", hash60("s", seed=5).alias("h"))
        .distinct()
    )
    capped = sh.groupBy("h").count().filter(F.col("count") <= _CONT_DF_CAP)
    shc = sh.join(capped.select("h"), "h")
    sz = shc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("doc_id").orderBy("h")
    bk = (
        shc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _CONT_K)
        .select(F.col("doc_id").alias("doc_a"), "h")
    )
    pairs = (
        bk.join(
            shc.select(F.col("doc_id").alias("doc_b"), "h"),
            ["h"],
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    cont = F.round(
        F.col("n_matched") / F.least(F.lit(_CONT_K), F.col("n")), 6
    )
    return (
        pairs.join(sz.select(F.col("doc_id").alias("doc_a"), "n"), "doc_a")
        .select("doc_a", "doc_b", "n_matched", cont.alias("containment"))
        .filter(F.col("containment") >= _CONT_MIN)
    )


# ---------------------------------------------------------------------------
# dedup_lsh_cosine_buckets — banded sign-random-projection LSH + verify
# ---------------------------------------------------------------------------

_LSH_BANDS = 2
_LSH_BITS = 8
_LSH_DIM = 64
_LSH_COS_MIN = 0.8


def _srp_planes() -> list[list[float]]:
    from ffiec_pq_spark.operators.similarity import _pseudo_plane

    return [
        _pseudo_plane(_LSH_DIM, 200 + p) for p in range(_LSH_BANDS * _LSH_BITS)
    ]


def _srp_sql() -> str:
    planes = _srp_planes()
    rows = ", ".join(
        f"({p // _LSH_BITS}, {p % _LSH_BITS}, {i + 1}, {v!r}::DOUBLE)"
        for p, plane in enumerate(planes)
        for i, v in enumerate(plane)
    )
    return f"""
    WITH planes AS (SELECT * FROM (VALUES {rows}) AS t(band, bit, i, v)),
    ex AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings
    ),
    dots AS (
      SELECT e.vec_id, p.band, p.bit, sum(e.x * p.v) AS d
      FROM ex e JOIN planes p ON e.i = p.i
      GROUP BY 1, 2, 3
    ),
    sigs AS (
      SELECT vec_id, band,
             sum(CASE WHEN d > 0 THEN 1 << bit ELSE 0 END) AS sig
      FROM dots GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a
      JOIN sigs b ON a.band = b.band AND a.sig = b.sig
                  AND a.vec_id < b.vec_id
    ),
    verified AS (
      SELECT c.id_a, c.id_b,
             sum(ea.x * eb.x)
               / (sqrt(sum(ea.x * ea.x)) * sqrt(sum(eb.x * eb.x))) AS raw
      FROM cand c
      JOIN ex ea ON ea.vec_id = c.id_a
      JOIN ex eb ON eb.vec_id = c.id_b AND ea.i = eb.i
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, round(raw, 6) AS cosine
    FROM verified
    WHERE round(raw, 6) >= {_LSH_COS_MIN}
    """


@register("dedup_lsh_cosine_buckets", _srp_sql(), tags=["dedup", "similarity"])
def dedup_lsh_cosine_buckets(spark, sf_dir):
    """Cosine near-dup via banded sign-random-projection LSH: 2 bands of
    8 fixed hyperplanes each; vectors agreeing on ALL 8 sign bits of
    any band become candidates (Charikar SRP — collision probability
    (1-θ/π)^8 per band), then candidates are verified with the exact
    cosine and gated at 0.8.

    Scale shape: this is the label-free counterpart of
    ``embedding_near_dup_pairs`` — no partition column needed.  The
    candidate join is an equi-join on (band, 8-bit signature); the
    verify join touches only candidate pairs.  At 100 TB you widen
    bits-per-band (shrinking buckets) and add bands (preserving
    recall) — the plan shape is unchanged.  Sign bits compare exact
    dot products whose operands are identical float64 on both engines;
    the verified cosine is rounded at 6 dp before the gate."""
    from ffiec_pq_spark.operators.similarity import dot

    emb = load_table(spark, sf_dir, "embeddings")
    planes = _srp_planes()
    band_cols = []
    for b in range(_LSH_BANDS):
        sig = F.lit(0).cast("long")
        for bit in range(_LSH_BITS):
            plane = F.array(
                *[F.lit(v) for v in planes[b * _LSH_BITS + bit]]
            )
            sig = sig + (dot(F.col("embedding"), plane) > 0).cast(
                "long"
            ) * F.lit(1 << bit)
        band_cols.append(
            F.struct(F.lit(b).alias("band"), sig.alias("sig"))
        )
    sigs = emb.select(
        "vec_id", F.explode(F.array(*band_cols)).alias("bs")
    ).select("vec_id", "bs.band", "bs.sig")
    a = sigs.select(
        F.col("vec_id").alias("id_a"), "band", "sig"
    )
    b = sigs.select(
        F.col("vec_id").alias("id_b"), "band", "sig"
    )
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    cos = dot(F.col("va"), F.col("vb")) / (
        F.sqrt(dot(F.col("va"), F.col("va")))
        * F.sqrt(dot(F.col("vb"), F.col("vb")))
    )
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= _LSH_COS_MIN)
    )


# ---------------------------------------------------------------------------
# quality_composite_filter — multi-signal curation gate
# ---------------------------------------------------------------------------

_QF_MIN_QUALITY = 0.45
_QF_MIN_TOK = 20
_QF_MAX_TOK = 1000


def _quality_filter_sql() -> str:
    from ffiec_pq_spark.operators.text import quality_score_sql

    tok = "string_split_regex(trim(text), '\\s+')"
    quality = quality_score_sql()
    return f"""
    WITH scored AS (
      SELECT source, len({tok}) AS n_tok, {quality} AS quality
      FROM documents
    ),
    gated AS (
      SELECT source, quality,
             CASE WHEN quality >= {_QF_MIN_QUALITY}
                   AND n_tok BETWEEN {_QF_MIN_TOK} AND {_QF_MAX_TOK}
                  THEN 1 ELSE 0 END AS kept
      FROM scored
    )
    SELECT source,
           count(*) AS n_total,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           round(sum(kept) / CAST(count(*) AS DOUBLE), 6) AS kept_rate,
           round(avg(CASE WHEN kept = 1 THEN quality END), 6)
             AS avg_kept_quality
    FROM gated
    GROUP BY source
    """


@register("quality_composite_filter", _quality_filter_sql(), tags=["text", "curation"])
def quality_composite_filter(spark, sf_dir):
    """The curation gate every pretraining pipeline runs before
    tokenization: composite quality score (length band + stopword
    presence − punctuation excess, the repo's fixed formula) AND a
    token-count band — reported as per-source keep rates, the number a
    data lead actually reviews before dropping a source.

    Scale shape: pure column expressions over one scan (the token
    array is projected ONCE and shared by every signal — CSE-friendly
    form), then a single grouped aggregation on the low-cardinality
    source key.  Zero joins, zero windows: at 100 TB this is a
    map-side-combine scan."""
    from ffiec_pq_spark.operators.text import quality_score_tok, tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", tokens("text").alias("t"), F.col("text")
    )
    scored = t.select(
        "source",
        F.size("t").alias("n_tok"),
        quality_score_tok(F.col("t"), "text").alias("quality"),
    )
    kept = (
        (F.col("quality") >= _QF_MIN_QUALITY)
        & F.col("n_tok").between(_QF_MIN_TOK, _QF_MAX_TOK)
    ).cast("long")
    gated = scored.select("source", "quality", kept.alias("kept"))
    return gated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("kept").alias("n_kept"),
        F.round(F.sum("kept") / F.count(F.lit(1)).cast("double"), 6).alias(
            "kept_rate"
        ),
        F.round(F.avg(F.when(F.col("kept") == 1, F.col("quality"))), 6).alias(
            "avg_kept_quality"
        ),
    )


# ---------------------------------------------------------------------------
# docs_robust_scaled_quality — median/IQR robust scaling per language
# ---------------------------------------------------------------------------


@register(
    "docs_robust_scaled_quality",
    """
    WITH stats AS (
      SELECT lang,
             quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS q1,
             quantile_cont(CAST(n_chars AS DOUBLE), 0.50) AS med,
             quantile_cont(CAST(n_chars AS DOUBLE), 0.75) AS q3
      FROM documents GROUP BY lang
    ),
    z AS (
      SELECT d.lang, s.med, s.q3 - s.q1 AS iqr,
             CASE WHEN s.q3 > s.q1
                  THEN (d.n_chars - s.med) / (s.q3 - s.q1) END AS z
      FROM documents d JOIN stats s ON d.lang = s.lang
    )
    SELECT lang,
           count(*) AS n_docs,
           round(any_value(med), 6) AS median_chars,
           round(any_value(iqr), 6) AS iqr_chars,
           CAST(sum(CASE WHEN abs(z) > 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           round(avg(abs(z)), 6) AS avg_abs_z
    FROM z
    GROUP BY lang
    """,
    tags=["text", "stats"],
)
def docs_robust_scaled_quality(spark, sf_dir):
    """Robust scaling (median/IQR — the outlier-insensitive alternative
    to z-scoring) of document length per language: z = (len − median) /
    IQR, with |z| > 2 flagged as length outliers (truncation/
    concatenation artifacts in a crawl).

    Scale shape: exact per-group percentiles (one grouped agg on the
    language key), broadcast back over the fact scan, re-aggregate —
    two shuffles on a low-cardinality key, no global sort.  Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the linear-
    interpolation definition, so the boundaries are identical float64;
    degenerate IQR=0 groups yield NULL z on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    nc = F.col("n_chars").cast("double")
    stats = docs.groupBy("lang").agg(
        F.percentile(nc, F.lit(0.25)).alias("q1"),
        F.percentile(nc, F.lit(0.50)).alias("med"),
        F.percentile(nc, F.lit(0.75)).alias("q3"),
    )
    z = (
        docs.join(F.broadcast(stats), "lang")
        .select(
            "lang",
            "med",
            (F.col("q3") - F.col("q1")).alias("iqr"),
            F.when(
                F.col("q3") > F.col("q1"),
                (nc - F.col("med")) / (F.col("q3") - F.col("q1")),
            ).alias("z"),
        )
    )
    return z.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.any_value("med"), 6).alias("median_chars"),
        F.round(F.any_value("iqr"), 6).alias("iqr_chars"),
        F.sum((F.abs(F.col("z")) > 2).cast("long")).alias("n_outliers"),
        F.round(F.avg(F.abs(F.col("z"))), 6).alias("avg_abs_z"),
    )


# ---------------------------------------------------------------------------
# doc_trigram_interpolated_lm — Jelinek-Mercer interpolated trigram LM
# ---------------------------------------------------------------------------

_L3, _L2, _L1 = 0.6, 0.3, 0.1


@register(
    "doc_trigram_interpolated_lm",
    rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents
    ),
    uni AS (
      SELECT t[i] AS w, count(*) AS c
      FROM toks, unnest(generate_series(1, len(t))) AS u(i)
      GROUP BY 1
    ),
    n AS (SELECT sum(c) AS n FROM uni),
    bi AS (
      SELECT t[i] AS w1, t[i + 1] AS w2, count(*) AS c
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
      GROUP BY 1, 2
    ),
    trid AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3,
             count(*) AS m
      FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
      WHERE len(t) >= 3
      GROUP BY 1, 2, 3, 4
    ),
    tric AS (SELECT w1, w2, w3, sum(m) AS c3 FROM trid GROUP BY 1, 2, 3)
    SELECT doc_id,
           CAST(sum(m) AS BIGINT) AS n_trigrams,
           round(sum(m * ln({_L3} * (tric.c3 / b12.c)
                            + {_L2} * (b23.c / u2.c)
                            + {_L1} * (u3.c / n.n))) / sum(m), 6) AS score
    FROM trid
    JOIN tric USING (w1, w2, w3)
    JOIN bi b12 ON b12.w1 = trid.w1 AND b12.w2 = trid.w2
    JOIN bi b23 ON b23.w1 = trid.w2 AND b23.w2 = trid.w3
    JOIN uni u2 ON u2.w = trid.w2
    JOIN uni u3 ON u3.w = trid.w3
    CROSS JOIN n
    GROUP BY doc_id
    """,
    tags=["lm", "quality", "text"],
)
def doc_trigram_interpolated_lm(spark, sf_dir):
    """Jelinek-Mercer interpolated trigram LM score per document:
    P(w3|w1 w2) = 0.6·p̂3 + 0.3·p̂2 + 0.1·p̂1 with MLE components from
    the corpus's own trigram/bigram/unigram counts — the smoothing that
    makes a trigram perplexity filter usable (unseen trigrams back off
    to bigram/unigram mass instead of −∞).  Extends
    ``doc_bigram_logprob`` one order up.

    Scale shape: n-gram streams are built ARRAY-side (transform over
    index sequences, no posexplode self-joins); per-document trigram
    multiplicities collapse before the probability joins, so the join
    stream is distinct (doc, trigram) rows, each keyed on its n-gram
    (natural Zipf skew — df-cap the heads if a stopword trigram ever
    dominates); the corpus total is a broadcast scalar.  All counts are
    exact integers; each MLE ratio is one IEEE division identical on
    both engines; only the per-doc weighted mean is rounded."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = uni.agg(F.sum("c").alias("n"))
    bi = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.expr(
                "explode(transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i-1] AS w1, t[i] AS w2)))"
            ).alias("g")
        )
        .select("g.*")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    trid = (
        toks.filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.expr(
                "explode(transform(sequence(1, size(t) - 2),"
                " i -> struct(t[i-1] AS w1, t[i] AS w2, t[i+1] AS w3)))"
            ).alias("g"),
        )
        .select("doc_id", "g.*")
        .groupBy("doc_id", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    tric = trid.groupBy("w1", "w2", "w3").agg(F.sum("m").alias("c3"))
    b12 = bi.select(
        F.col("w1").alias("w1"), F.col("w2").alias("w2"), F.col("c").alias("c12")
    )
    b23 = bi.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("c").alias("c23")
    )
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("cu2"))
    u3 = uni.select(F.col("w").alias("w3"), F.col("c").alias("cu3"))
    p = (
        F.lit(_L3) * (F.col("c3") / F.col("c12"))
        + F.lit(_L2) * (F.col("c23") / F.col("cu2"))
        + F.lit(_L1) * (F.col("cu3") / F.col("n"))
    )
    return (
        trid.join(tric, ["w1", "w2", "w3"])
        .join(b12, ["w1", "w2"])
        .join(b23, ["w2", "w3"])
        .join(u2, "w2")
        .join(u3, "w3")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_trigrams"),
            F.round(
                F.sum(F.col("m") * F.log(p)) / F.sum("m"), 6
            ).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# docs_token_bucket_stats — token-length histogram for packing planning
# ---------------------------------------------------------------------------

_TB_WIDTH = 16


@register(
    "docs_token_bucket_stats",
    rf"""
    WITH t AS (
      SELECT len(string_split_regex(trim(text), '\s+')) AS n_tok, n_chars
      FROM documents
    )
    SELECT (n_tok // {_TB_WIDTH}) * {_TB_WIDTH} AS bucket,
           count(*) AS n_docs,
           min(n_tok) AS min_tok,
           max(n_tok) AS max_tok,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           round(avg(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
    FROM t
    GROUP BY 1
    """,
    tags=["text", "stats"],
)
def docs_token_bucket_stats(spark, sf_dir):
    """Token-length histogram (16-token buckets): the distribution a
    sequence-packing planner reads to size context windows and predict
    padding waste (pair with ``operators/packing.py``).

    Scale shape: one scan, one integer-keyed grouped aggregation —
    map-side combinable to at most |buckets| rows per partition."""
    from ffiec_pq_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        token_count("text").alias("n_tok"),
        F.col("n_chars").cast("double").alias("n_chars"),
    )
    bucket = (F.expr(f"n_tok div {_TB_WIDTH}") * _TB_WIDTH).alias("bucket")
    return t.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tok").alias("min_tok"),
        F.max("n_tok").alias("max_tok"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# embedding_residual_quantize — scalar quantization error profile
# ---------------------------------------------------------------------------

_RQ_LEVELS = 8.0  # 1/8 grid step


@register(
    "embedding_residual_quantize",
    f"""
    WITH ex AS (
      SELECT vec_id, label, unnest(embedding)::DOUBLE AS x
      FROM embeddings
    ),
    per_vec AS (
      SELECT vec_id, label,
             sqrt(sum(pow(x - floor(x * {_RQ_LEVELS} + 0.5) / {_RQ_LEVELS}, 2)))
               AS rnorm,
             sqrt(sum(pow(floor(x * {_RQ_LEVELS} + 0.5) / {_RQ_LEVELS}, 2)))
               AS qnorm
      FROM ex GROUP BY 1, 2
    )
    SELECT label,
           count(*) AS n_vecs,
           round(avg(rnorm), 6) AS avg_residual_norm,
           round(max(rnorm), 6) AS max_residual_norm,
           round(avg(qnorm), 6) AS avg_quantized_norm
    FROM per_vec
    GROUP BY label
    """,
    tags=["similarity", "quantize"],
)
def embedding_residual_quantize(spark, sf_dir):
    """Scalar-quantization residual profile: snap every embedding
    coordinate to a 1/8 grid (``floor(x·8 + 0.5)/8`` — floor-based
    half-up so both engines round ties identically, unlike
    banker's-vs-half-away ``round``) and measure the per-vector
    residual L2 norm by label — the error budget you check before
    shipping int-quantized vectors to an ANN index.

    Scale shape: per-vector math is array-local (no joins); the
    profile is one grouped agg on label.  The float widening
    (float32→float64) is bit-identical on both engines, so the grid
    assignment is exact; only the norms' final aggregation is
    rounded."""
    emb = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    q = lambda x: F.floor(xd(x) * _RQ_LEVELS + 0.5) / _RQ_LEVELS  # noqa: E731
    rsq = F.aggregate(
        F.transform("embedding", lambda x: F.pow(xd(x) - q(x), F.lit(2.0))),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    qsq = F.aggregate(
        F.transform("embedding", lambda x: F.pow(q(x), F.lit(2.0))),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    per_vec = emb.select(
        "label", F.sqrt(rsq).alias("rnorm"), F.sqrt(qsq).alias("qnorm")
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("rnorm"), 6).alias("avg_residual_norm"),
        F.round(F.max("rnorm"), 6).alias("max_residual_norm"),
        F.round(F.avg("qnorm"), 6).alias("avg_quantized_norm"),
    )


# ---------------------------------------------------------------------------
# docs_stopword_entropy_lang — per-language curation profile
# ---------------------------------------------------------------------------


def _stop_entropy_sql() -> str:
    from ffiec_pq_spark.operators.text import STOPWORDS

    tok = "string_split_regex(trim(text), '\\s+')"
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    WITH ent AS (
      SELECT doc_id,
             round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS entropy
      FROM (
        SELECT doc_id, ch, count(*) AS c
        FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
              FROM documents)
        WHERE ch <> ''
        GROUP BY 1, 2
      ) GROUP BY doc_id
    ),
    sw AS (
      SELECT doc_id, lang,
             round(len(list_intersect({tok}, [{stops}]))
                   / greatest(len({tok}), 1), 6) AS stop_ratio
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           round(avg(stop_ratio), 6) AS avg_stop_ratio,
           round(avg(entropy), 6) AS avg_entropy,
           round(max(entropy), 4) AS max_entropy
    FROM sw JOIN ent USING (doc_id)
    GROUP BY lang
    """


@register("docs_stopword_entropy_lang", _stop_entropy_sql(), tags=["text", "quality"])
def docs_stopword_entropy_lang(spark, sf_dir):
    """Per-language curation profile: average stopword ratio (does the
    text look like running prose in SOME language?) × average character
    entropy (is it gibberish/boilerplate?) — the 2-D signal used to set
    per-language quality thresholds, since entropy and stopword
    baselines differ by script.

    Scale shape: entropy is the repo's bounded char-class explode
    (collapses map-side to ≤|alphabet| rows per doc); stopword ratio is
    a pure column expression; one equi-join on doc_id and one grouped
    agg on the language key.  Per-doc values are rounded BEFORE
    averaging on both engines, so cross-engine summation noise cannot
    reach the hash."""
    from ffiec_pq_spark.operators.text import stopword_ratio

    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    ent = counts.groupBy("doc_id").agg(
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
            4,
        ).alias("entropy")
    )
    sw = docs.select(
        "doc_id", "lang", F.round(stopword_ratio("text"), 6).alias("stop_ratio")
    )
    return (
        sw.join(ent, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("stop_ratio"), 6).alias("avg_stop_ratio"),
            F.round(F.avg("entropy"), 6).alias("avg_entropy"),
            F.round(F.max("entropy"), 4).alias("max_entropy"),
        )
    )


# ---------------------------------------------------------------------------
# docs_paragraph_dedup_rate — sub-document dedup pressure
# ---------------------------------------------------------------------------

_PARA_TOKENS = 12


def _para_dedup_sql() -> str:
    tok = "string_split_regex(trim(text), '\\s+')"
    h = hash60_sql("para", seed=11)
    return f"""
    WITH toks AS (
      SELECT source, {tok} AS t FROM documents WHERE len({tok}) >= 1
    ),
    paras AS (
      SELECT source,
             array_to_string(t[(i * {_PARA_TOKENS} + 1)
                              :(i * {_PARA_TOKENS} + {_PARA_TOKENS})], ' ')
               AS para
      FROM toks,
           unnest(generate_series(
             0, CAST(ceil(len(t) / {_PARA_TOKENS}.0) AS BIGINT) - 1)) AS u(i)
    ),
    hp AS (SELECT source, {h} AS h FROM paras),
    freq AS (SELECT h, count(*) AS f FROM hp GROUP BY h)
    SELECT source,
           count(*) AS n_paras,
           CAST(sum(CASE WHEN f > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_paras,
           round(sum(CASE WHEN f > 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS dup_rate
    FROM hp JOIN freq USING (h)
    GROUP BY source
    """


@register("docs_paragraph_dedup_rate", _para_dedup_sql(), tags=["dedup", "text"])
def docs_paragraph_dedup_rate(spark, sf_dir):
    """Sub-document dedup pressure: chunk every document into fixed
    12-token "paragraphs", fingerprint each, and report per source the
    fraction of its paragraphs that are duplicated ANYWHERE in the
    corpus — the signal that tells you whether doc-level dedup left
    boilerplate (headers, licenses, navbars) that paragraph-level
    dedup would still remove.

    Scale shape: chunking is array-local (transform over an index
    sequence — no window); duplication is one grouped count on the
    paragraph hash joined back (keyed on the hash — natural skew from
    boilerplate is exactly what the df distribution reveals); the rate
    is one grouped agg on the source key."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= 1)
    paras = toks.select(
        "source",
        F.expr(
            f"explode(transform(sequence(0, cast(ceil(size(t) / {_PARA_TOKENS}.0)"
            f" as int) - 1), i -> concat_ws(' ',"
            f" slice(t, i * {_PARA_TOKENS} + 1, {_PARA_TOKENS}))))"
        ).alias("para"),
    )
    hp = paras.select("source", hash60("para", seed=11).alias("h"))
    freq = hp.groupBy("h").agg(F.count(F.lit(1)).alias("f"))
    dup = (F.col("f") > 1).cast("long")
    return (
        hp.join(freq, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(dup).alias("n_dup_paras"),
            F.round(F.sum(dup) / F.count(F.lit(1)).cast("double"), 6).alias(
                "dup_rate"
            ),
        )
    )
