"""Group-local normalization with a giant-group guard.

``applyInPandas`` ships each group to one Python worker as one Arrow
batch, so a group must fit that worker's memory — fine for segment-sized
groups, fatal when one key holds half the corpus.  ``zscore_by_group``
keeps the pandas path for normal groups (the template for group-local
Python transforms built-ins can't express) and reroutes oversize groups
through a pure-JVM equivalent: aggregate the group moments (mean,
stddev) map-side, broadcast-join them back, and compute the z-score as
a column expression.  Same result to the rounding digit, no Python
stage, no group-size ceiling — the same guard shape as
``cosine_pairs_within(max_group_size=...)`` (operators/similarity.py).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_by_group(
    df: DataFrame,
    key_col: str,
    val_col: str,
    id_col: str,
    max_group_rows: Optional[int] = None,
    ndigits: int = 4,
) -> DataFrame:
    """(id, key, z) where z = (val - mean_group) / stddev_samp_group,
    rounded to ``ndigits``.

    ``max_group_rows`` is the giant-group guard: groups above it skip
    the pandas worker entirely and run as JVM moments + broadcast join.
    Unset keeps every group on the grouped-map pandas path.  Both paths
    agree at ``ndigits`` rounding (pandas ``mean``/``std(ddof=1)`` ==
    Spark ``avg``/``stddev_samp`` up to summation-order ulps).
    """
    import pandas as pd

    out_schema = f"{id_col} long, {key_col} string, z double"
    cols = [id_col, key_col, val_col]

    def z_fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        vals = pdf[val_col]
        z = (vals - vals.mean()) / vals.std(ddof=1)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                key_col: pdf[key_col],
                "z": z.round(ndigits),
            }
        )

    base = df.select(*cols)
    if max_group_rows is None:
        return base.groupBy(key_col).applyInPandas(z_fn, schema=out_schema)

    counts = base.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    flagged = base.join(F.broadcast(counts), key_col)
    small = flagged.filter(F.col("_n") <= max_group_rows).drop("_n")
    hot = flagged.filter(F.col("_n") > max_group_rows).drop("_n")

    small_z = small.groupBy(key_col).applyInPandas(z_fn, schema=out_schema)
    moments = hot.groupBy(key_col).agg(
        F.avg(val_col).alias("_mu"),
        F.stddev_samp(val_col).alias("_sd"),
    )
    hot_z = hot.join(F.broadcast(moments), key_col).select(
        F.col(id_col),
        F.col(key_col),
        F.round((F.col(val_col) - F.col("_mu")) / F.col("_sd"), ndigits).alias(
            "z"
        ),
    )
    return small_z.unionByName(hot_z)
