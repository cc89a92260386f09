"""The two remaining expressible classic TPC-H shapes — Q15 (view
reused as join input AND scalar-subquery max) and Q17 (correlated
per-part scalar threshold) — completing the suite: Q1/Q3/Q5 in
``core_relational.py``, Q7/Q8/Q9/Q13/Q16/Q18/Q21/Q22 in
``tpch_extra.py``, Q4/Q6/Q10/Q12/Q14/Q19 shapes in ``extensions.py``.
Q2, Q11 and Q20 are NOT implementable on the driver's trimmed schema —
they require the ``partsupp`` table, which does not exist in
`/root/testdata` — so the suite stops at 19 of 22 by data, not by
engine capability.

Adaptations (same policy as tpch_extra.py): Q17 swaps the missing
``p_container`` for a ``p_size`` band; the correlated scalar subquery
— the part of Q17 worth having — survives intact.

Float discipline (repo-wide rule): monetary sums round at 4 dp on both
engines before any comparison (Q15's argmax compares ROUNDED revenue,
so the winner set is engine-stable); Q17's correlated threshold
``0.2 * avg(l_quantity)`` is EXACT because quantities are integral
doubles (integer sums are order-independent in float64), so the gate
cannot split engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.session import load_table

_REV = "l_extendedprice * (1 - l_discount)"


def _rev():
    # built lazily: PySpark 4 asserts an active SparkContext inside
    # F.col, so a module-level Column would break bare imports
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _d(col: str):
    return F.col(col).cast("date")


@register(
    "q15_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, round(sum({_REV}), 4) AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON supplier_no = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    tags=["relational", "tpch"],
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the top supplier by quarterly revenue — a
    derived revenue relation consumed twice (once as the join input,
    once reduced to its max as a scalar subquery), the classic
    view-reuse test.  Revenue rounds at 4 dp BEFORE the max and the
    equality, so the argmax set is engine-stable.

    Scale shape: one grouped agg on the supplier key; the scalar max
    reduces the same small relation and broadcasts back as a one-row
    cross; supplier enrich broadcasts.  No window, no global sort."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (_d("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (_d("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 4).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND p_size < 15
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    tags=["relational", "tpch"],
)
def q17_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape: revenue locked in small-quantity orders of one
    brand — the CORRELATED scalar subquery (per-part average quantity)
    gating the outer fact rows.  The container predicate becomes a
    size band (schema has no p_container).

    Scale shape: the correlation decorrelates into one grouped avg on
    the part key joined back to the fact (exactly what Catalyst does
    to the SQL form); the brand/size filter prunes parts BEFORE both
    the threshold join and the fact join (left-semi first, so the
    grouped avg only aggregates surviving parts' lines).  The
    threshold is exact: quantities are integral doubles, so their sum
    (and hence the avg) is order-independent — the 0.2x gate cannot
    split engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") < 15)
    )
    # per-part threshold ONLY for surviving parts (semi-prune first)
    li_k = li.join(
        F.broadcast(p.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    thr = li_k.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("_thr")
    )
    gated = li_k.join(
        F.broadcast(thr), F.col("l_partkey") == F.col("_pk")
    ).filter(F.col("l_quantity") < F.col("_thr"))
    return gated.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )
