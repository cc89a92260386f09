"""The last expressible classic TPC-H shapes (Q4/Q6/Q10/Q14/Q15/Q17/
Q19), completing the suite started in ``tpch_extra.py`` (Q7/Q8/Q9/Q13/
Q16/Q18/Q21/Q22) and ``core_relational.py`` (Q1/Q3/Q5).  Q2, Q11, Q12
and Q20 are NOT implementable on the driver's trimmed schema — they
require the ``partsupp`` table (2/11/20) or the ship-mode /
commit-date / receipt-date lineitem columns (12), none of which exist
in `/root/testdata` — so the suite stops at 19 of 22 by data, not by
engine capability.

Adaptations, each keeping the shape that makes the original
interesting:

- Q4's "commit < receipt" lateness probe becomes "shipped after the
  order date" (the only date pair available) — the EXISTS semi-join
  with a non-equi conjunct survives intact.
- Q14 tests ``p_type = 'PROMO'`` (the synthetic types are single
  words, no prefix family) — the two-sided conditional ratio stays.
- Q17/Q19 swap the missing ``p_container`` for ``p_size`` bands — the
  correlated per-part scalar threshold (17) and the
  join-side-spanning disjunction (19) survive.

Float discipline (repo-wide rule): monetary sums round at 4 dp on
both engines before any ratio or comparison; Q17's correlated
threshold ``0.2 * avg(l_quantity)`` is EXACT because quantities are
integral doubles (integer sums are order-independent in float64), so
the filter cannot split engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.session import load_table

_REV = "l_extendedprice * (1 - l_discount)"
_rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _d(col: str):
    return F.col(col).cast("date")


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE)
      )
    GROUP BY o_orderpriority
    """,
    tags=["relational", "tpch"],
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: priority distribution of orders that had at
    least one line shipped late — an EXISTS subquery that becomes a
    LEFT SEMI join carrying a non-equi conjunct alongside the key
    equality (the shape that separates semi-join support from plain
    joins).

    Scale shape: ``EXISTS(ship > orderdate)`` is equivalent to
    ``max(ship) per order > orderdate`` — the aggregate-decorrelation
    rewrite.  The grouped max collapses lineitem map-side (partial max
    per partition BEFORE the exchange) instead of hashing the full
    fact into a semi-join build table, and the derived envelope
    ``ship > window start`` (implied by ``orderdate >= start``) pushes
    to the lineitem scan.  The quarter filter prunes orders at its
    scan; the key join then runs small-vs-small.  Measured 8x: the
    naive semi form scaled 2.62x (fact-sized hash build); this shape
    holds ~1.2x."""
    start = F.lit("1996-01-01").cast("date")
    o = load_table(spark, sf_dir, "orders").filter(
        (_d("o_orderdate") >= start)
        & (_d("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", _d("l_shipdate").alias("_ship")
    )
    # envelope: any line that can satisfy ship > orderdate for an
    # in-window order must ship after the window start
    max_ship = (
        li.filter(F.col("_ship") > start)
        .groupBy("l_orderkey")
        .agg(F.max("_ship").alias("_max_ship"))
    )
    late = o.join(
        max_ship, F.col("o_orderkey") == F.col("l_orderkey")
    ).filter(F.col("_max_ship") > _d("o_orderdate"))
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q6_forecast_revenue",
    f"""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=["relational", "tpch"],
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: the pure filter-aggregate — revenue impact of
    dropping a discount band for a year.  No joins at all: the value
    of this query is that EVERY predicate must reach the parquet scan
    (`PushedFilters` on date, discount, quantity) and the whole plan
    is one WholeStageCodegen span into a scalar aggregate.

    The discount literals compare the same float64 bit patterns on
    both engines (same parquet), so the BETWEEN cannot split them."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (_d("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (_d("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, n_name, c_mktsegment,
           round(c_acctbal, 2) AS acctbal,
           round(sum({_REV}), 4) AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_mktsegment, round(c_acctbal, 2)
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=["relational", "tpch"],
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: the returned-item revenue ranking — who cost
    us the most in returns last half-year.  Three fact/dim joins, a
    grouped revenue rollup per customer, top-20 by revenue.

    Scale shape: nation broadcasts; customer joins orders on the
    customer key, the result joins lineitem on the order key (both
    keyed shuffles); the top-20 is TakeOrderedAndProject (no global
    sort), tie-broken on c_custkey so the cut is deterministic on
    both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (_d("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (_d("o_orderdate") < F.lit("1996-07-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = j.groupBy(
        "c_custkey",
        "c_name",
        "n_name",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
    ).agg(F.round(F.sum(_rev), 4).alias("revenue"))
    return agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


@register(
    "q14_promo_revenue",
    f"""
    WITH j AS (
      SELECT round(sum(CASE WHEN p_type = 'PROMO' THEN {_REV}
                            ELSE 0 END), 4) AS promo_revenue,
             round(sum({_REV}), 4) AS total_revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-09-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-10-01'
    )
    SELECT promo_revenue, total_revenue,
           round(100.0 * promo_revenue / total_revenue, 6) AS promo_pct
    FROM j
    """,
    tags=["relational", "tpch"],
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promo-type revenue share for one month — the
    two-sided conditional aggregate ratio (numerator is a CASE inside
    the same sum pass, never a second scan).

    Scale shape: one month of lineitem joins part on the part key;
    part is the smaller side and hash-joins; both sums ride one
    aggregation.  The ratio divides the two ROUNDED sums (4 dp both
    engines), so parallel summation order cannot move the percentage."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (_d("l_shipdate") >= F.lit("1996-09-01").cast("date"))
        & (_d("l_shipdate") < F.lit("1996-10-01").cast("date"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    agg = j.agg(
        F.round(
            F.sum(F.when(F.col("p_type") == "PROMO", _rev).otherwise(0.0)), 4
        ).alias("promo_revenue"),
        F.round(F.sum(_rev), 4).alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(
            100.0 * F.col("promo_revenue") / F.col("total_revenue"), 6
        ).alias("promo_pct"),
    )


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
        F.round(F.sum(_rev), 4).alias("total_revenue")
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
    the threshold join and the fact join.  The threshold is exact:
    quantities are integral doubles, so their sum (and hence the avg)
    is order-independent — the 0.2x gate cannot split engines."""
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


@register(
    "q19_disjunctive_revenue",
    f"""
    SELECT round(sum({_REV}), 4) AS revenue, count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=["relational", "tpch"],
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: the disjunction that SPANS the join — each OR
    branch constrains both part attributes and lineitem quantity, so
    a naive planner can push nothing and filters everything post-join.
    The derivable per-side envelopes (brand IN the three values;
    quantity in the union band) DO prune each scan; the exact
    branch-pairing predicate evaluates on the joined row.  Container
    swapped for size bands (schema).

    Scale shape: part scan pruned to three brands (broadcastable),
    lineitem scan pruned by the quantity envelope, one keyed hash
    join, scalar aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 30)  # union envelope -> scan prune
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(branch).agg(
        F.round(F.sum(_rev), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
