"""Marketing-analytics queries over ``events``: last-touch conversion
attribution (the window-carry pattern) and a chi-square independence
probe over the documents corpus — both oracle-checked."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.session import load_table

_TOUCHES = ("click", "view", "signup")
_WINDOW_S = 3 * 86400  # attribution lookback


@register(
    "events_attribution_last_touch",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             last_value(
               CASE WHEN event_type IN {_TOUCHES} THEN event_type END
               IGNORE NULLS
             ) OVER w AS touch_type,
             last_value(
               CASE WHEN event_type IN {_TOUCHES}
                    THEN CAST(ts AS TIMESTAMP) END
               IGNORE NULLS
             ) OVER w AS touch_ts
      FROM events
      WINDOW w AS (
        PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      )
    )
    SELECT coalesce(
             CASE WHEN epoch(ts) - epoch(touch_ts) <= {_WINDOW_S}
                  THEN touch_type END,
             'none') AS touch_type,
           count(*) AS n_conversions,
           count(DISTINCT user_id) AS n_users
    FROM ordered
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    tags=["attribution", "window"],
)
def events_attribution_last_touch(spark, sf_dir):
    """Last-touch attribution: each purchase credits the user's most
    recent click/view/signup within a 3-day lookback ('none' when the
    purchase had no prior touch in window).  The carry is a single
    ignore-nulls window over (user, time) — one keyed exchange, no
    self-join against the touch stream (the naive formulation joins
    every purchase to every prior touch and takes the max: a range
    join that explodes on active users)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*_TOUCHES)
    touch_type = F.last(
        F.when(is_touch, F.col("event_type")), ignorenulls=True
    ).over(w)
    touch_ts = F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w)
    attributed = (
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            "ts",
            touch_type.alias("touch_type"),
            touch_ts.alias("touch_ts"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.coalesce(
                F.when(
                    F.unix_micros("ts") - F.unix_micros("touch_ts")
                    <= _WINDOW_S * 1_000_000,
                    F.col("touch_type"),
                ),
                F.lit("none"),
            ).alias("touch_type"),
        )
    )
    return attributed.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "chi_square_lang_source",
    """
    WITH obs AS (
      SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2
    ),
    rows_ AS (SELECT lang, sum(o) AS rt FROM obs GROUP BY lang),
    cols_ AS (SELECT source, sum(o) AS ct FROM obs GROUP BY source),
    n AS (SELECT sum(o) AS total FROM obs)
    SELECT lang,
           count(*) AS n_cells,
           round(sum(
             (o - rt * ct / total) * (o - rt * ct / total)
             / (rt * ct / total)
           ), 6) AS chi2_contrib
    FROM obs JOIN rows_ USING (lang) JOIN cols_ USING (source), n
    GROUP BY lang
    """,
    tags=["stats", "bias"],
)
def chi_square_lang_source(spark, sf_dir):
    """Chi-square independence probe for the lang x source contingency
    table (per-language contribution): the statistical backbone of a
    corpus-bias audit — are sources language-skewed beyond chance?
    Expected counts are exact integer-ratio doubles; only OBSERVED
    cells contribute (classic sparse contingency handling, identical
    on both engines).  Three tiny grouped aggregates + broadcast joins
    back onto the cell table — no shuffle proportional to the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("lang").agg(F.sum("o").alias("rt"))
    ct = obs.groupBy("source").agg(F.sum("o").alias("ct"))
    n = obs.agg(F.sum("o").alias("total"))
    e = F.col("rt") * F.col("ct") / F.col("total")
    return (
        obs.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.round(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 6).alias(
                "chi2_contrib"
            ),
        )
    )


@register(
    "events_top_paths",
    """
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (
        PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
      )
    )
    SELECT e1, e2, e3, count(*) AS n_paths
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n_paths DESC, e1, e2, e3
    LIMIT 15
    """,
    tags=["attribution", "sequence"],
)
def events_top_paths(spark, sf_dir):
    """Sequential-pattern mining, level 3: the 15 most frequent
    3-step event-type paths across user timelines (lead-window triple
    extraction — no self-joins on the event stream), deterministic
    tie-break, TakeOrderedAndProject top-k."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), "e1", "e2", "e3")
        .limit(15)
    )


_COOLDOWN_S = 1800


@register(
    "events_cooldown_filter",
    f"""
    WITH gaps AS (
      SELECT event_type,
             epoch(CAST(ts AS TIMESTAMP)
                   - lag(CAST(ts AS TIMESTAMP)) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS gap_s
      FROM events
    )
    SELECT event_type,
           count(*) FILTER (WHERE gap_s IS NULL OR gap_s > {_COOLDOWN_S})
             AS n_kept,
           count(*) FILTER (WHERE gap_s <= {_COOLDOWN_S}) AS n_dropped
    FROM gaps GROUP BY event_type
    """,
    tags=["dedup", "temporal"],
)
def events_cooldown_filter(spark, sf_dir):
    """Temporal dedup (cooldown): a repeat of the same (user, type)
    within 30 minutes is a duplicate signal (double-fired trackers,
    retry storms) — the batch face of the streaming
    ``dropDuplicatesWithinWatermark`` state bound.  One lag over the
    (user, type) partition; kept/dropped tallies per type."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gaps = ev.select(
        "event_type",
        ((us - F.lag(us).over(w)) / F.lit(1_000_000.0)).alias("gap_s"),
    )
    keep = F.col("gap_s").isNull() | (F.col("gap_s") > _COOLDOWN_S)
    return gaps.groupBy("event_type").agg(
        F.count(F.when(keep, 1)).alias("n_kept"),
        F.count(F.when(F.col("gap_s") <= _COOLDOWN_S, 1)).alias("n_dropped"),
    )
