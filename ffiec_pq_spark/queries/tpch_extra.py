"""The remaining classic TPC-H query SHAPES (Q7/Q8/Q9/Q13/Q16/Q18/
Q21/Q22), adapted to the driver's trimmed schema (no partsupp, no
comments/phones, ship date only).  What each query preserves is the
relational shape that makes the original interesting — the cross-nation
double-role join, the market-share conditional ratio, the outer-join
count distribution, the NOT-IN + grouped-distinct supplier cut, the
HAVING-gated IN subquery, the double-correlated EXISTS/NOT-EXISTS, and
the scalar-subquery + anti-join — because those shapes, not the
literal predicates, are what a migrating user needs to run.

All monetary aggregates round at 4 dp on both engines (parallel-vs-
sequential summation order); joins keep dims broadcast-able and facts
keyed, matching the plan discipline asserted in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.session import load_table

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q7_volume_shipping",
    f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           round(sum({_REV}), 4) AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    """,
    tags=["relational", "tpch"],
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: cross-nation trade volume — the nation dim joins
    TWICE in different roles (supplier side, customer side), the
    classic alias-join test.  Both nation joins broadcast; the only
    data-sized exchange is lineitem-orders."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .filter(
            F.col("supp_nation").isin("NATION_1", "NATION_2")
            & F.col("cust_nation").isin("NATION_1", "NATION_2")
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.round(F.sum(rev), 4).alias("revenue"))
    )


@register(
    "q8_market_share",
    f"""
    WITH all_rev AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {_REV} AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN part     ON p_partkey = l_partkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE p_type = 'ECONOMY'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE 0 END), 4) AS nation_volume,
           round(sum(volume), 4) AS total_volume,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE 0 END) / sum(volume), 6) AS mkt_share
    FROM all_rev GROUP BY o_year
    """,
    tags=["relational", "tpch"],
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a part-type market per
    order year — conditional-sum ratio over a 5-way join.  The share
    divides two sums from the SAME aggregation (one pass); part/nation
    broadcast, lineitem-orders is the only big exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(p.filter(F.col("p_type") == "ECONOMY")),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    is_n3 = F.col("supp_nation") == "NATION_3"
    nat = F.sum(F.when(is_n3, F.col("volume")).otherwise(0.0))
    tot = F.sum("volume")
    return base.groupBy("o_year").agg(
        F.round(nat, 4).alias("nation_volume"),
        F.round(tot, 4).alias("total_volume"),
        F.round(nat / tot, 6).alias("mkt_share"),
    )


@register(
    "q9_product_profit",
    f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(sum({_REV}), 4) AS profit
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN part     ON p_partkey = l_partkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%ge%'
    GROUP BY 1, 2
    """,
    tags=["relational", "tpch"],
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (sans partsupp, absent from the trimmed schema):
    profit proxy per supplier nation and order year for parts matching
    a name pattern — the LIKE-filtered dim broadcast prunes the fact
    join before the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(p.filter(F.col("p_name").like("%ge%"))),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(rev), 4).alias("profit"))
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON o_custkey = c_custkey
                       AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
    tags=["relational", "tpch"],
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: order-count distribution INCLUDING zero-order
    customers — the left join with a join-side (not WHERE) predicate,
    then count(col) that skips NULLs, then a distribution re-group.
    Two exchanges: custkey, then c_count."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(
        o,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("o_orderpriority") != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q16_supplier_part_cut",
    """
    SELECT p_brand, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (5, 11, 17, 23, 28, 37, 42, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2
    """,
    tags=["relational", "tpch"],
)
def q16_supplier_part_cut(spark, sf_dir):
    """TPC-H Q16 shape (supplier-part relation derived from lineitem —
    the trimmed schema has no partsupp): distinct supplier counts per
    (brand, size) excluding a NOT-IN supplier set.  The exclusion is an
    anti join against a broadcast dim slice; the distinct count
    shuffles once on the group key."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(
            F.broadcast(
                p.filter(
                    (F.col("p_brand") != "Brand#1")
                    & F.col("p_size").isin(5, 11, 17, 23, 28, 37, 42, 49)
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           CAST(sum(l_quantity) AS BIGINT) AS total_qty
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY 1, 2, 3, 4
    """,
    tags=["relational", "tpch"],
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: orders whose total quantity clears a HAVING
    gate, re-joined to their lines and customers — the IN-subquery
    becomes a semi join against the gated aggregate (one extra keyed
    exchange, reused by the final aggregation)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
    )


@register(
    "q21_waiting_supplier",
    """
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    ),
    multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) > 1
    ),
    sole_late AS (
      SELECT l_orderkey, min(l_suppkey) AS l_suppkey
      FROM late GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) = 1
    )
    SELECT s_name, count(*) AS numwait
    FROM sole_late
    JOIN multi USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    """,
    tags=["relational", "tpch"],
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape (lateness = shipped >60 days after the order,
    the trimmed schema's only date pair): suppliers who were the SOLE
    late supplier on a multi-supplier order.  The original's correlated
    EXISTS / NOT EXISTS pair decomposes into two grouped gates
    (multi-supplier orders; exactly-one-late orders) semi-joined back —
    each gate is one keyed aggregation, no correlated re-scan."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .select("l_orderkey", "l_suppkey")
    )
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("nl"),
            F.min("l_suppkey").alias("l_suppkey"),
        )
        .filter(F.col("nl") == 1)
        .select("l_orderkey", "l_suppkey")
    )
    # the multi-supplier gate only matters for orders that already have
    # exactly one late supplier: semi-join lineitem down to that small
    # candidate set BEFORE the corpus-wide distinct aggregation — same
    # answer, and the distinct-agg input shrinks from every order to
    # the late ones
    multi = (
        li.join(
            sole_late.select("l_orderkey"), "l_orderkey", "left_semi"
        )
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("l_orderkey")
    )
    return (
        sole_late.join(multi, "l_orderkey")
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_global_sales_opportunity",
    """
    WITH codes AS (
      SELECT c_custkey, c_acctbal,
             substr(c_name, 16, 2) AS cntrycode
      FROM customer
    ),
    avg_bal AS (
      SELECT round(avg(c_acctbal), 6) AS ab FROM codes
      WHERE c_acctbal > 0.0
        AND cntrycode IN ('01', '05', '09', '12', '18', '23', '27', '34', '41', '45', '52', '56', '63', '67', '74', '88')
    )
    SELECT cntrycode,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM codes, avg_bal
    WHERE cntrycode IN ('01', '05', '09', '12', '18', '23', '27', '34', '41', '45', '52', '56', '63', '67', '74', '88')
      AND c_acctbal > ab
      AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    GROUP BY cntrycode
    """,
    tags=["relational", "tpch"],
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers in selected
    code buckets with no urgent order on file (the synthetic data has
    no order-less customers, so the anti join cuts on the urgent
    subset) — a scalar aggregate subquery
    (broadcast one-row cross join, no collect) + an anti join against
    orders.  The code comes from the name digits (the trimmed schema
    has no phone column)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    codes = c.select(
        "c_custkey",
        "c_acctbal",
        F.substring("c_name", 16, 2).alias("cntrycode"),
    )
    sel = F.col("cntrycode").isin(
        "01", "05", "09", "12", "18", "23", "27", "34",
        "41", "45", "52", "56", "63", "67", "74", "88",
    )
    # rounded on both engines: the scalar average is a parallel sum
    # whose last-ulp could otherwise flip a boundary customer
    avg_bal = codes.filter(sel & (F.col("c_acctbal") > 0.0)).agg(
        F.round(F.avg("c_acctbal"), 6).alias("ab")
    )
    return (
        codes.filter(sel)
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT")
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct(),
            "c_custkey",
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
