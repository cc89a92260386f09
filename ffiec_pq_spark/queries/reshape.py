"""Reshaping operators (SURVEY.md §2.5): unpivot wide->long, pivot
long->wide, explode, regex column split — the core query semantics of the
reference engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.operators.reshape import pivot_long_df, unpivot_typed
from ffiec_pq_spark.session import load_table

_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _unpivot_sql(measures=_MEASURES, rounded: bool = True) -> str:
    arms = "\n      UNION ALL\n".join(
        f"      SELECT l_orderkey, l_linenumber, '{m}' AS item, "
        + (f"round({m}, 4)" if rounded else m)
        + " AS value FROM lineitem"
        for m in measures
    )
    return arms


@register(
    "unpivot_measures",
    f"""
    SELECT l_orderkey, l_linenumber, item, value FROM (
{_unpivot_sql()}
    )
    WHERE value IS NOT NULL
    """,
    tags=["reshape", "signature"],
)
def unpivot_measures(spark, sf_dir):
    """R1 — UNPIVOT wide->long with NULL-drop (sparse long encoding;
    reference get_long, R/ffiec_make_long_pqs.R:39-73).

    Uses the native ``DataFrame.unpivot`` (Spark >= 3.4): a narrow,
    shuffle-free generator — each input row yields k output rows within
    its partition, so the op scales linearly with no exchange.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        *[F.round(m, 4).alias(m) for m in _MEASURES],
    )
    return unpivot_typed(li, ids=["l_orderkey", "l_linenumber"], values=_MEASURES)


@register(
    "pivot_roundtrip",
    f"""
    WITH long AS (
      SELECT l_orderkey, l_linenumber, item, value FROM (
{_unpivot_sql(rounded=False)}
      ) WHERE value IS NOT NULL
    )
    SELECT l_orderkey, l_linenumber,
           round(sum(CASE WHEN item = 'l_quantity'      THEN value END), 4) AS l_quantity,
           round(sum(CASE WHEN item = 'l_extendedprice' THEN value END), 4) AS l_extendedprice,
           round(sum(CASE WHEN item = 'l_discount'      THEN value END), 4) AS l_discount,
           round(sum(CASE WHEN item = 'l_tax'           THEN value END), 4) AS l_tax
    FROM long
    GROUP BY l_orderkey, l_linenumber
    """,
    tags=["reshape", "signature"],
)
def pivot_roundtrip(spark, sf_dir):
    """R2 — PIVOT long->wide with an explicit item list and values_fn
    (reference ffiec_pivot, R/ffiec_pivot.R:61-116).  Wide -> long ->
    wide must reproduce the original measures (long-roundtrip property).

    Rounding happens ONCE, after the aggregate: a pre-Expand rounding
    projection doubled the Expand input width (4 raw + 4 rounded
    columns flowing into the generator) for no semantic gain — the
    post-aggregate round alone pins the cross-engine hash, and group
    sums here are order-insensitive (groups are the dup-key pairs, 1-2
    rows).  The oracle mirrors: raw values in the long CTE, round after
    sum."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", *_MEASURES
    )
    long = unpivot_typed(li, ids=["l_orderkey", "l_linenumber"], values=_MEASURES)
    wide = pivot_long_df(
        long,
        id_cols=["l_orderkey", "l_linenumber"],
        names_from="item",
        values_from="value",
        items=_MEASURES,
        values_fn="sum",
    )
    return wide.select(
        "l_orderkey",
        "l_linenumber",
        *[F.round(m, 4).alias(m) for m in _MEASURES],
    )


@register(
    "explode_tokens",
    """
    SELECT p_partkey, unnest(string_split(p_type, ' ')) AS token
    FROM part
    """,
    tags=["reshape"],
)
def explode_tokens(spark, sf_dir):
    """R4 — explode a list column into rows
    (reference tidyr::unnest, R/ffiec_create_item_schedules_pq.R:125-133)."""
    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", F.explode(F.split("p_type", " ")).alias("token"))


@register(
    "regex_split_context",
    """
    WITH ctx AS (
      SELECT c_custkey,
             'SEG_' || c_mktsegment || '_' || CAST(c_custkey AS VARCHAR)
               || '_' || CAST(c_nationkey AS VARCHAR) AS contextRef
      FROM customer
    )
    SELECT c_custkey,
           regexp_extract(contextRef, '^SEG_([^_]+)_([0-9]+)_([0-9]+)$', 1) AS segment,
           CAST(regexp_extract(contextRef, '^SEG_([^_]+)_([0-9]+)_([0-9]+)$', 2) AS BIGINT) AS entity_id,
           CAST(regexp_extract(contextRef, '^SEG_([^_]+)_([0-9]+)_([0-9]+)$', 3) AS INTEGER) AS nation_id
    FROM ctx
    """,
    tags=["reshape", "scalar"],
)
def regex_split_context(spark, sf_dir):
    """R5 — anchored-regex column split (reference contextRef ->
    (schedule, IDRSSD, date), R/ffiec_process_xbrls.R:190-197)."""
    c = load_table(spark, sf_dir, "customer")
    ctx = c.select(
        "c_custkey",
        F.concat_ws(
            "_",
            F.lit("SEG"),
            "c_mktsegment",
            F.col("c_custkey").cast("string"),
            F.col("c_nationkey").cast("string"),
        ).alias("contextRef"),
    )
    pat = r"^SEG_([^_]+)_([0-9]+)_([0-9]+)$"
    return ctx.select(
        "c_custkey",
        F.regexp_extract("contextRef", pat, 1).alias("segment"),
        F.regexp_extract("contextRef", pat, 2).cast("bigint").alias("entity_id"),
        F.regexp_extract("contextRef", pat, 3).cast("int").alias("nation_id"),
    )
