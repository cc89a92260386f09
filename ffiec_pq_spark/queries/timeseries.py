"""Time-series queries over ``events``: bin-decomposed range join,
calendar gap-fill with forward fill, and truncated-EWMA smoothing —
each oracle-checked against the naive SQL formulation (the oracle runs
the BETWEEN range join / generate_series calendar / identical
fixed-order EWMA chain, so the scale-safe rewrites are proven, not just
exercised)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.operators.timeseries import (
    ewma_bounded,
    ewma_sql,
    gap_fill,
    range_join_binned,
)
from ffiec_pq_spark.session import local_frame, load_table

# Value tiers: [lo, hi) half-open, covering the events.value domain.
_TIERS = [
    ("micro", 0.0, 10.0),
    ("small", 10.0, 50.0),
    ("mid", 50.0, 100.0),
    ("large", 100.0, 200.0),
    ("xl", 200.0, 350.0),
    ("jumbo", 350.0, 500.0),
]
_BIN_W = 25.0

_TIERS_VALUES = ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in _TIERS)


@register(
    "events_range_join_tiers",
    f"""
    WITH tiers(tier, lo, hi) AS (VALUES {_TIERS_VALUES})
    SELECT tier,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(sum(value), 4) AS total_value
    FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
    GROUP BY tier
    """,
    tags=["timeseries", "range-join"],
)
def events_range_join_tiers(spark, sf_dir):
    """Value-tier lookup as a bin-decomposed EQUI-join (hash join on
    ``floor(value/W)`` + residual filter) instead of the
    broadcast-nested-loop a naive BETWEEN join plans — the IP-range /
    tier-lookup shape that stays linear when the dim has millions of
    ranges.  The oracle runs the naive BETWEEN join, proving the
    decomposition."""
    ev = load_table(spark, sf_dir, "events")
    tiers = local_frame(spark, _TIERS, "tier string, lo double, hi double")
    joined = range_join_binned(ev, "value", tiers, _BIN_W)
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@register(
    "events_gapfill_ffill",
    """
    WITH obs AS (
      SELECT user_id,
             date_trunc('day', CAST(ts AS TIMESTAMP)) AS bucket_ts,
             round(sum(value), 4) AS observed_value
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id, min(bucket_ts) AS t0, max(bucket_ts) AS t1
      FROM obs GROUP BY user_id
    ),
    cal AS (
      SELECT user_id,
             unnest(generate_series(t0, t1, INTERVAL 1 DAY)) AS bucket_ts
      FROM spans
    )
    SELECT c.user_id, c.bucket_ts,
           o.observed_value,
           last_value(o.observed_value IGNORE NULLS) OVER (
             PARTITION BY c.user_id ORDER BY c.bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value,
           o.observed_value IS NOT NULL AS is_observed
    FROM cal c LEFT JOIN obs o USING (user_id, bucket_ts)
    """,
    tags=["timeseries", "gapfill"],
)
def events_gapfill_ffill(spark, sf_dir):
    """Per-user daily calendar with forward-filled totals: the
    resample-and-fill shape behind every activity dashboard and
    training-curriculum schedule.  Each key generates only its own
    span (no global calendar cross join); output is bounded by
    |users| x |span days| regardless of event density."""
    ev = load_table(spark, sf_dir, "events")
    return gap_fill(ev, "user_id", "ts", "value", bucket="day")


@register(
    "events_ewma_value",
    f"""
    SELECT user_id, event_id,
           {ewma_sql("value", "user_id", "CAST(ts AS TIMESTAMP), event_id")} AS ewma
    FROM events
    """,
    tags=["timeseries", "window"],
)
def events_ewma_value(spark, sf_dir):
    """8-term truncated EWMA (alpha=0.5) of event values per user over
    event time: one shuffle on the key, the K lag terms evaluated in
    the partition-local sort as a single fixed-order expression —
    alpha=0.5 makes every weight an exact binary fraction, so the
    oracle's identical chain matches before rounding."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        ewma_bounded("user_id", ["ts", "event_id"], "value").alias("ewma"),
    )


_ANOM_THRESHOLD = 150.0


@register(
    "events_anomaly_ewma",
    f"""
    WITH sm0 AS (
      SELECT user_id, event_id, event_type, value,
             CAST(ts AS TIMESTAMP) AS tss,
             {ewma_sql("value", "user_id", "CAST(ts AS TIMESTAMP), event_id")} AS ewma
      FROM events
    ),
    sm AS (
      SELECT event_type, value,
             lag(ewma) OVER (
               PARTITION BY user_id ORDER BY tss, event_id
             ) AS forecast
      FROM sm0
    )
    SELECT event_type,
           count(*) FILTER (WHERE abs(value - forecast) > {_ANOM_THRESHOLD})
             AS n_anomalies,
           count(*) FILTER (WHERE forecast IS NOT NULL) AS n_scored,
           round(max(abs(value - forecast)), 4) AS max_deviation
    FROM sm
    GROUP BY event_type
    """,
    tags=["timeseries", "anomaly"],
)
def events_anomaly_ewma(spark, sf_dir):
    """Forecast-residual anomaly detection: each event's value is
    compared against the previous EWMA (the one-step-ahead forecast of
    exponential smoothing); a residual beyond the threshold flags an
    anomaly.  Per type: anomaly count, scored count, worst residual.
    One keyed exchange — the EWMA, its lag, and the tallies all ride
    the same (user, time) window partitioning; the forecast chain is
    the deterministic fixed-order EWMA both engines replay exactly."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sm0 = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        ewma_bounded("user_id", ["ts", "event_id"], "value").alias("ewma"),
    )
    sm = sm0.select(
        "event_type",
        "value",
        F.lag("ewma").over(w).alias("forecast"),
    )
    dev = F.abs(F.col("value") - F.col("forecast"))
    return sm.groupBy("event_type").agg(
        F.count(F.when(dev > _ANOM_THRESHOLD, 1)).alias("n_anomalies"),
        F.count(F.when(F.col("forecast").isNotNull(), 1)).alias("n_scored"),
        F.round(F.max(dev), 4).alias("max_deviation"),
    )


@register(
    "events_cusum_drift",
    """
    WITH m AS (SELECT round(avg(value), 6) AS mu FROM events),
    cs1 AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS tss, event_id,
             sum(value - mu) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS s
      FROM events CROSS JOIN m
    ),
    cs AS (
      SELECT user_id, s,
             min(s) OVER (
               PARTITION BY user_id ORDER BY tss, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS smin
      FROM cs1
    )
    SELECT user_id,
           count(*) AS n_events,
           round(max(s - smin), 4) AS max_drift
    FROM cs GROUP BY user_id
    """,
    tags=["timeseries", "anomaly"],
)
def events_cusum_drift(spark, sf_dir):
    """One-sided CUSUM change detection per user: the classic recursive
    statistic ``c_t = max(0, c_{t-1} + (x_t - mu))`` is NOT a window
    aggregate — but its closed form ``S_t - min_{i<=t} S_i`` (running
    cumsum minus its running minimum) is, so the whole detector runs as
    two stacked frames over ONE keyed exchange.  ``mu`` is the pinned
    (rounded) global mean riding in as a broadcast scalar; both engines
    then accumulate the identical ordered sequence, so even the
    unrounded intermediate drifts agree bit-for-bit."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    m = ev.agg(F.round(F.avg("value"), 6).alias("mu"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cs = (
        ev.crossJoin(F.broadcast(m))
        .withColumn("s", F.sum(F.col("value") - F.col("mu")).over(w))
        .withColumn("smin", F.min("s").over(w))
    )
    return cs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.max(F.col("s") - F.col("smin")), 4).alias("max_drift"),
    )
