"""Training-data curation queries: deterministic sampling / splits and
single-pass column profiling."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.operators.profile import profile_columns
from ffiec_pq_spark.operators.sampling import (
    deterministic_sample,
    sample_gate_sql,
    train_eval_split,
)
from ffiec_pq_spark.session import load_table


@register(
    "deterministic_sample_orders",
    f"""
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders
    WHERE {sample_gate_sql("o_orderkey", 0.1, seed=7)}
    """,
    tags=["curation", "sampling"],
)
def deterministic_sample_orders(spark, sf_dir):
    """Hash-gate 10% sample keyed on o_orderkey: the exact same subset
    on any engine / partitioning / rerun (df.sample's RNG is none of
    those), verified subset-exactly by the oracle."""
    o = load_table(spark, sf_dir, "orders")
    return deterministic_sample(o, "o_orderkey", 0.1, seed=7).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("total")
    )


@register(
    "train_eval_split_counts",
    f"""
    SELECT CASE WHEN {sample_gate_sql("o_orderkey", 0.2, seed=13)}
                THEN 'eval' ELSE 'train' END AS split,
           count(*) AS n,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY 1
    """,
    tags=["curation", "sampling"],
)
def train_eval_split_counts(spark, sf_dir):
    """Disjoint, exhaustive, content-keyed train/eval split — late
    re-runs can never leak a key across splits."""
    o = load_table(spark, sf_dir, "orders")
    split = train_eval_split(o, "o_orderkey", eval_rate=0.2, seed=13)
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "profile_customer",
    """
    SELECT 'c_custkey' AS "column", count(*) AS n_rows,
           sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS n_null,
           count(DISTINCT c_custkey) AS n_distinct,
           CAST(min(c_custkey) AS VARCHAR) AS min_str,
           CAST(max(c_custkey) AS VARCHAR) AS max_str
    FROM customer
    UNION ALL
    SELECT 'c_nationkey', count(*),
           sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END),
           count(DISTINCT c_nationkey),
           CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR)
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', count(*),
           sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END),
           count(DISTINCT c_mktsegment),
           CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR)
    FROM customer
    """,
    tags=["curation", "profile"],
)
def profile_customer(spark, sf_dir):
    """Single-scan column profile (count / nulls / distinct / min / max
    per column) — the 'what is in this table' pass priced as ONE job,
    not one per column."""
    c = load_table(spark, sf_dir, "customer")
    return profile_columns(c, ["c_custkey", "c_nationkey", "c_mktsegment"])
