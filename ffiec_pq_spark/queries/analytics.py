"""Analytical aggregates: built-in bivariate statistics (JVM path) and
a grouped-map ``applyInPandas`` normalization (the Arrow UDAF-style
path) — both under the exact oracle."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.session import load_table


@register(
    "regression_price_qty",
    """
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(corr(l_extendedprice, l_quantity), 6)           AS r
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=["analytics"],
)
def regression_price_qty(spark, sf_dir):
    """Per-group OLS slope/intercept/correlation with the built-in
    aggregates — single shuffle, map-side partials, no Python."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(
            F.regr_intercept("l_extendedprice", "l_quantity"), 4
        ).alias("intercept"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("r"),
    )


@register(
    "zscore_by_segment",
    """
    SELECT c_custkey,
           c_mktsegment,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment),
                 4) AS z
    FROM customer
    """,
    tags=["analytics", "pandas-udf"],
)
def zscore_by_segment(spark, sf_dir):
    """Per-group z-score via grouped-map ``applyInPandas`` — the shape
    for group-local Python transforms built-ins can't express (model
    scoring, per-entity calibration).  One shuffle on the group key;
    each group becomes one Arrow batch in the Python worker.  The
    oracle replays it with window functions, so the Python path itself
    is value-hash-checked.

    Scale: a group must fit one worker's memory — fine for
    segment-sized groups; for giant groups, pre-aggregate the moments
    JVM-side and broadcast-join them back instead."""

    def z(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        z = (bal - bal.mean()) / bal.std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "z": z.round(4),
            }
        )

    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(z, schema="c_custkey long, c_mktsegment string, z double")
    )
