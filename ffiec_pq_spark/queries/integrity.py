"""Integrity-check operators as oracle-checked queries (SURVEY.md §2.11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.operators.checks import null_counts_long, pk_violations
from ffiec_pq_spark.session import load_table


@register(
    "pk_check_lineitem",
    """
    SELECT l_orderkey, l_linenumber, count(*) AS n
    FROM lineitem
    GROUP BY l_orderkey, l_linenumber
    HAVING count(*) > 1
    """,
    tags=["integrity"],
)
def pk_check_lineitem(spark, sf_dir):
    """V1/V3 — primary-key check on (l_orderkey, l_linenumber).

    Note: the synthetic lineitem deliberately has duplicate
    (orderkey, linenumber) pairs, so this returns a non-empty
    violation set that must match the oracle's."""
    li = load_table(spark, sf_dir, "lineitem")
    return pk_violations(li, ["l_orderkey", "l_linenumber"])


_ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@register(
    "null_counts_orders",
    "\n      UNION ALL\n".join(
        f"SELECT '{c}' AS col_name, CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_na FROM orders"
        for c in _ORDER_COLS
    )
    + "\n    ORDER BY col_name",
    tags=["integrity"],
)
def null_counts_orders(spark, sf_dir):
    """V2 — per-column NULL counts in long form (single scan + unpivot)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        null_counts_long(o, _ORDER_COLS)
        .withColumnRenamed("column", "col_name")
        .orderBy("col_name")
    )


@register(
    "type_integrity_probe",
    """
    SELECT count(*) AS n_bad
    FROM part
    WHERE CAST(CAST(p_size AS DOUBLE) AS INTEGER) <> p_size
    """,
    tags=["integrity"],
)
def type_integrity_probe(spark, sf_dir):
    """V6 — int<->double roundtrip probe (reference
    data-raw/ffiec_schema.R:147-153): violating-row count must be 0."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").cast("double").cast("int") != F.col("p_size")
    ).agg(F.count(F.lit(1)).alias("n_bad"))
