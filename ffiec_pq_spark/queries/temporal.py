"""Event-time queries over the ``events`` table: tumbling rollup,
sessionization, as-of join, top-k per group, plus a JSON-props probe.
DuckDB reads the parquet as TIMESTAMP_NS; both sides cast/truncate to
microseconds (Spark's native precision) before comparing."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.operators.windows import (
    asof_join,
    sessionize,
    topk_per_group,
    tumbling_rollup,
)
from ffiec_pq_spark.session import load_table


@register(
    "events_hourly_rollup",
    """
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*)              AS n_events,
           round(sum(value), 4) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    tags=["temporal"],
)
def events_hourly_rollup(spark, sf_dir):
    """Tumbling 1-hour event-time rollup (batch form of the streaming
    windowed agg; one shuffle, map-side partials)."""
    ev = load_table(spark, sf_dir, "events")
    out = tumbling_rollup(
        ev,
        "ts",
        ["event_type"],
        {
            "n_events": "count(1)",
            "total_value": "round(sum(value), 4)",
            "n_users": "count(DISTINCT user_id)",
        },
        "1 hour",
    )
    return out


@register(
    "events_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN epoch(CAST(ts AS TIMESTAMP))
                       - lag(epoch(CAST(ts AS TIMESTAMP)))
                         OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
                       > 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sids AS (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*)       AS n_events,
           min(ts)        AS session_start,
           max(ts)        AS session_end,
           round(epoch(max(ts)) - epoch(min(ts)), 6) AS duration_sec
    FROM sids
    GROUP BY user_id, session_id
    """,
    tags=["temporal"],
)
def events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min gap): lag -> flag -> cumulative
    sum -> per-session aggregate.  One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return sessionize(ev, key="user_id", ts_col="ts", gap_minutes=30)


@register(
    "events_sliding_rollup",
    """
    SELECT ws AS window_start, event_type,
           count(*)             AS n_events,
           round(sum(value), 4) AS total_value
    FROM (
      SELECT unnest([
               time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
               time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                 - INTERVAL '30 minutes'
             ]) AS ws,
             event_type, value
      FROM events
    )
    GROUP BY 1, 2
    """,
    tags=["temporal", "window"],
)
def events_sliding_rollup(spark, sf_dir):
    """Sliding (hopping) event-time windows: 1-hour window every 30
    minutes, so each event lands in exactly two windows.  Spark's
    native ``window(ts, '1 hour', '30 minutes')`` plans this as one
    Expand (2 rows per event) + one shuffle — the oracle replays the
    two bucket assignments with ``time_bucket``."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_session_window",
    """
    WITH flagged AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             CASE WHEN epoch(CAST(ts AS TIMESTAMP))
                       - lag(epoch(CAST(ts AS TIMESTAMP)))
                         OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
                       >= 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sids AS (
      SELECT user_id, ts, value,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM sids
    GROUP BY user_id, sid
    """,
    tags=["temporal", "window", "session"],
)
def events_session_window(spark, sf_dir):
    """Spark's NATIVE gap-based ``session_window`` aggregation (one
    shuffle, sessions merged in the agg itself — the batch face of the
    streaming session window).  Boundary semantics differ from the
    custom ``sessionize`` operator: the native window is half-open, so
    a gap of EXACTLY 30 min starts a new session (oracle uses >= 1800
    where sessionize uses > 1800)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "events_asof_join",
    """
    SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
           round(p.value, 4) AS purchase_value,
           CAST(s.ts AS TIMESTAMP) AS signup_ts,
           round(s.value, 4) AS signup_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND CAST(p.ts AS TIMESTAMP) >= CAST(s.ts AS TIMESTAMP)
    """,
    tags=["temporal", "signature"],
)
def events_asof_join(spark, sf_dir):
    """As-of join (Spark has no native one): per purchase event, the most
    recent signup event of the same user.  Implemented as the
    union-interleave + last(ignorenulls) window — one shuffle on the key
    vs DuckDB's native ASOF JOIN as the oracle."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 4).alias("purchase_value")
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("sts"),
        F.round("value", 4).alias("signup_value"),
    )
    joined = asof_join(
        purchases.withColumnRenamed("ts", "pts"),
        signups.withColumn("signup_ts", F.col("sts")),
        key="user_id",
        left_ts="pts",
        right_ts="sts",
        right_vals=["signup_ts", "signup_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("pts").alias("ts"),
        "purchase_value",
        "signup_ts",
        "signup_value",
    )


@register(
    "events_topk_per_user",
    """
    SELECT user_id, event_id, round(value, 4) AS value
    FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rk
      FROM events
    )
    WHERE rk <= 3
    """,
    tags=["temporal"],
)
def events_topk_per_user(spark, sf_dir):
    """Top-3 events by value per user (row_number window; single
    shuffle + local sort — no global sort at any scale)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    out = topk_per_group(
        ev, keys=["user_id"], order_col="value", k=3, tiebreak=["event_id"]
    )
    return out.select("user_id", "event_id", F.round("value", 4).alias("value"))


@register(
    "events_json_props",
    """
    SELECT event_type,
           count(*) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k
    FROM events
    GROUP BY event_type
    """,
    tags=["temporal", "scalar"],
)
def events_json_props(spark, sf_dir):
    """JSON field extraction from the string props column
    (get_json_object -> JVM-side JSON path, no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.avg(F.get_json_object("props", "$.k").cast("double")), 4
        ).alias("avg_k"),
    )


@register(
    "salted_skew_agg",
    """
    SELECT event_type,
           count(*)              AS n_events,
           round(sum(value), 4)  AS total_value,
           round(max(value), 6)  AS max_value
    FROM events
    GROUP BY event_type
    """,
    tags=["temporal", "skew"],
)
def salted_skew_agg(spark, sf_dir):
    """Two-stage salted aggregation over the skewed low-cardinality key
    (event_type): identical answer to the plain groupBy, but the heavy
    stage spreads each hot key across 16 sub-groups — the shape that
    survives a hot key holding 30% of 100 TB."""
    from ffiec_pq_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        keys=["event_type"],
        salt_from="event_id",
        metrics={
            "n_events": ("count(1)", "sum"),
            "total_value": ("sum(value)", "sum"),
            "max_value": ("max(value)", "max"),
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("total_value", 4).alias("total_value"),
        F.round("max_value", 6).alias("max_value"),
    )


@register(
    "events_moving_avg",
    """
    SELECT user_id, event_id,
           round(avg(value) OVER (
             PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 4) AS mov_avg
    FROM events
    """,
    tags=["temporal", "window"],
)
def events_moving_avg(spark, sf_dir):
    """3-row moving average per user over event time (deterministic
    tie-break on event_id): one shuffle on the key, frame evaluated in
    the partition-local sort."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id", F.round(F.avg("value").over(w), 4).alias("mov_avg")
    )


@register(
    "events_interarrival",
    """
    SELECT user_id,
           count(*) AS n_gaps,
           round(avg(gap_s), 4) AS avg_gap_s,
           round(max(gap_s), 6) AS max_gap_s
    FROM (
      SELECT user_id,
             epoch(CAST(ts AS TIMESTAMP)
                   - lag(CAST(ts AS TIMESTAMP)) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS gap_s
      FROM events
    )
    WHERE gap_s IS NOT NULL
    GROUP BY user_id
    """,
    tags=["temporal", "window"],
)
def events_interarrival(spark, sf_dir):
    """Inter-arrival-time stats per user via lag: the feature-extraction
    shape for activity modeling (one shuffle + partition-local sort,
    then a reuse-exchange aggregation on the same key)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # subtract exact microsecond longs, then scale: casting each ts to
    # double first would lose sub-second precision to cancellation
    us = F.unix_micros("ts")
    gaps = ev.select(
        "user_id",
        ((us - F.lag(us).over(w)) / F.lit(1_000_000.0)).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    # max is rounded to 6 dp, not 4: gaps are exact microsecond
    # multiples, so a 4-dp round hits true .xxxx5 ties where the two
    # engines' double-rounding algorithms can disagree by 1e-4; at 6 dp
    # the value is already exact and no rounding ever occurs
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap_s"), 4).alias("avg_gap_s"),
        F.round(F.max("gap_s"), 6).alias("max_gap_s"),
    )


@register(
    "customer_quartiles",
    """
    SELECT c_custkey, c_mktsegment,
           ntile(4) OVER (
             PARTITION BY c_mktsegment
             ORDER BY c_acctbal, c_custkey
           ) AS quartile
    FROM customer
    """,
    tags=["window"],
)
def customer_quartiles(spark, sf_dir):
    """ntile quartiles per segment with a total (deterministic) order —
    positional bucketing matches across engines only when the ORDER BY
    is a total order, hence the custkey tie-break."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey", "c_mktsegment", F.ntile(4).over(w).alias("quartile")
    )


@register(
    "events_hourly_seasonality",
    """
    SELECT dayofweek(CAST(ts AS TIMESTAMP)) AS dow,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hod,
           count(*) AS n_events,
           round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=["temporal", "seasonality"],
)
def events_hourly_seasonality(spark, sf_dir):
    """Hour-of-week seasonality profile (day-of-week x hour-of-day
    activity/value heatmap) — the capacity-planning/anomaly-baseline
    rollup.  One grouped aggregate; Spark's dayofweek is 1-based
    Sunday=1 where DuckDB's is 0-based Sunday=0, so the Spark side
    shifts by one (the cross-engine calendar pitfall made explicit)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.dayofweek("ts") - 1).alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


@register(
    "events_rolling_dau",
    """
    WITH ev AS (
      SELECT DISTINCT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
               AS d, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM ev)
    SELECT days.d,
           count(DISTINCT ev.user_id) AS dau_7d
    FROM days JOIN ev
      ON ev.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
    GROUP BY days.d
    """,
    tags=["temporal", "window"],
)
def events_rolling_dau(spark, sf_dir):
    """Rolling 7-day distinct active users per day — the canonical
    product metric whose naive form is a day-by-activity range join.
    The scale rewrite: each (day, user) activity row EXPANDS to the <=7
    window days it contributes to (a bounded explode — the same
    bin-decomposition idea as the range join), then one distinct count
    per window day; no BETWEEN join, no per-day rescan.  The oracle
    runs the naive range join."""
    ev = load_table(spark, sf_dir, "events")
    day_user = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("d"), "user_id"
    ).distinct()
    expanded = day_user.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add("d", 6))
        ).alias("wd"),
        "user_id",
    )
    days = day_user.select("d").distinct()
    return (
        expanded.join(days, expanded.wd == days.d, "left_semi")
        .groupBy(F.col("wd").alias("d"))
        .agg(F.countDistinct("user_id").alias("dau_7d"))
    )
