"""Core relational operators over the driver test tables.

Covers SURVEY.md §2.2 (projections/filters), §2.3 (joins incl. the
full-outer+coalesce fold), §2.4 (aggregations), §2.6 (set ops), §2.7
(sorts/limits), §2.9 (scalar functions).  Each query has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.operators.combine import combine_parts
from ffiec_pq_spark.session import load_table


# --------------------------------------------------------------------------
# Aggregation pipelines (A2/A5/A6 + scalar math) — TPC-H-shaped headliners
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=["agg", "sort"],
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan -> filter -> grouped 8-agg -> sort.

    One shuffle on the two low-cardinality group keys; partial (map-side)
    aggregation makes the shuffle tiny regardless of input scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    """
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE)                                  AS o_orderdate,
           o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)        AS revenue
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags=["join", "agg", "topk"],
)
def q3_shipping_priority(spark, sf_dir):
    """3-way join -> agg -> deterministic top-k.

    customer is the small side (filtered on segment) -> broadcast; the
    orders<->lineitem join shuffles on the orderkey, which is also the
    aggregation key, so Catalyst reuses one exchange for join + agg.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_nation_revenue",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n    ON n.n_regionkey = r.r_regionkey
    JOIN customer c  ON c.c_nationkey = n.n_nationkey
    JOIN orders o    ON o.o_custkey = c.c_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=["join", "agg"],
)
def q5_nation_revenue(spark, sf_dir):
    """5-way star join: every dimension side broadcast, one fact shuffle."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dim), o.o_custkey == dim.c_custkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# --------------------------------------------------------------------------
# Filters / predicates / conditional columns (P1-P6)
# --------------------------------------------------------------------------

@register(
    "filter_predicates",
    """
    SELECT o_orderkey,
           o_orderstatus,
           o_orderpriority,
           round(o_totalprice, 2) AS o_totalprice,
           CASE WHEN o_totalprice > 200000 THEN 'large'
                WHEN o_totalprice > 50000  THEN 'medium'
                ELSE 'small' END AS size_band
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND regexp_matches(o_orderpriority, '^[12]-')
      AND o_totalprice IS NOT NULL
      AND o_totalprice > 1000
    """,
    tags=["filter"],
)
def filter_predicates(spark, sf_dir):
    """P1-P6 in one plan: IN-list, regex, null guard, threshold, CASE add.

    All four predicates are Catalyst-pushable; the IN and ``>`` reach the
    parquet row-group filter (verified in tests/test_plans.py).
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus").isin("O", "F"))
        .filter(F.col("o_orderpriority").rlike("^[12]-"))
        .filter(F.col("o_totalprice").isNotNull() & (F.col("o_totalprice") > 1000))
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.when(F.col("o_totalprice") > 200000, "large")
            .when(F.col("o_totalprice") > 50000, "medium")
            .otherwise("small")
            .alias("size_band"),
        )
    )


# --------------------------------------------------------------------------
# Joins (J1-J4)
# --------------------------------------------------------------------------

@register(
    "full_outer_coalesce",
    """
    WITH p1 AS (
      SELECT c_custkey, c_name, c_acctbal
      FROM customer WHERE c_custkey % 3 <> 0
    ), p2 AS (
      SELECT c_custkey, c_mktsegment, c_acctbal
      FROM customer WHERE c_custkey % 3 <> 1
    )
    SELECT COALESCE(p1.c_custkey, p2.c_custkey)  AS c_custkey,
           p1.c_name                              AS c_name,
           round(COALESCE(p1.c_acctbal, p2.c_acctbal), 2) AS c_acctbal,
           p2.c_mktsegment                        AS c_mktsegment
    FROM p1 FULL JOIN p2 ON p1.c_custkey = p2.c_custkey
    """,
    tags=["join", "signature"],
)
def full_outer_coalesce(spark, sf_dir):
    """J1 — the reference's signature combine-parts fold
    (reference R/ffiec_process.R:14-33): FULL OUTER join on the key,
    coalesce-merge of overlapping non-key columns.
    """
    c = load_table(spark, sf_dir, "customer")
    p1 = c.filter(F.col("c_custkey") % 3 != 0).select("c_custkey", "c_name", "c_acctbal")
    p2 = c.filter(F.col("c_custkey") % 3 != 1).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    out = combine_parts([p1, p2], keys=["c_custkey"])
    return out.select(
        "c_custkey",
        "c_name",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )


@register(
    "left_join_enrich",
    """
    SELECT p.p_brand,
           count(*)                            AS n_lines,
           round(sum(l.l_extendedprice), 2)    AS gross
    FROM lineitem l
    LEFT JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    tags=["join", "agg"],
)
def left_join_enrich(spark, sf_dir):
    """J2 — dimension enrich via broadcast LEFT join (dict-table pattern)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("gross"),
        )
    )


@register(
    "anti_join_idle_customers",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=["join"],
)
def anti_join_idle_customers(spark, sf_dir):
    """J3 — anti join (customers that never ordered)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "semi_join_active_customers",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    tags=["join"],
)
def semi_join_active_customers(spark, sf_dir):
    """J4 counterpart — semi join (EXISTS) on a filtered right side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


# --------------------------------------------------------------------------
# Aggregations (A1-A6)
# --------------------------------------------------------------------------

@register(
    "distinct_dims",
    """
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    """,
    tags=["agg"],
)
def distinct_dims(spark, sf_dir):
    """A1 — distinct (dedup) over a projection."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


@register(
    "dup_key_groups",
    """
    SELECT l_partkey, l_suppkey, count(*) AS n
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
    HAVING count(*) > 1
    """,
    tags=["agg", "integrity"],
)
def dup_key_groups(spark, sf_dir):
    """A2 — duplicate-key detection: GROUP BY ... HAVING count > 1
    (reference assert_no_dups, R/ffiec_make_long_pqs.R:131-154)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


@register(
    "group_collect_sorted",
    """
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           count(DISTINCT l_orderkey)             AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=["agg", "list"],
)
def group_collect_sorted(spark, sf_dir):
    """A4 — group-by list-aggregate: sorted distinct set per group
    (reference item->dates list, R/ffiec_create_item_schedules_pq.R:135-139).

    The list is emitted comma-joined (not array-typed) because the
    driver's canonicalizer cannot sort array columns; the array-typed
    API remains available via the underlying expressions."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("l_linestatus")), ","
            ).alias("statuses"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "pivot_linestatus",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=["reshape", "agg"],
)
def pivot_linestatus(spark, sf_dir):
    """A5/R2 — pivot with an explicit value list (fixed output schema,
    no extra distinct-scan pass; reference ffiec_pivot, R/ffiec_pivot.R:99-113)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_o"),
            F.col("F").alias("qty_f"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "scalar_max_counts",
    """
    SELECT count(*)                          AS n_rows,
           count(DISTINCT o_custkey)         AS n_custs,
           round(max(o_totalprice), 2)       AS max_price,
           round(min(o_totalprice), 2)       AS min_price,
           CAST(max(CAST(o_orderdate AS DATE)) AS DATE) AS last_date
    FROM orders
    """,
    tags=["agg"],
)
def scalar_max_counts(spark, sf_dir):
    """A6 — scalar aggregates (max/min/counts) in a single global group."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_custs"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_date"),
    )


# --------------------------------------------------------------------------
# Set operations (U1-U3)
# --------------------------------------------------------------------------

@register(
    "union_all_fold",
    """
    SELECT src, count(*) AS n FROM (
      SELECT 'urgent' AS src, o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT 'high'   AS src, o_orderkey FROM orders WHERE o_orderpriority = '2-HIGH'
      UNION ALL
      SELECT 'open'   AS src, o_orderkey FROM orders WHERE o_orderstatus = 'O'
    ) GROUP BY src ORDER BY src
    """,
    tags=["setop"],
)
def union_all_fold(spark, sf_dir):
    """U1 — UNION ALL fold over N lazy relations
    (reference Reduce(union_all), R/ffiec_make_long_pqs.R:77-91)."""
    from functools import reduce

    o = load_table(spark, sf_dir, "orders")
    parts = [
        o.filter(F.col("o_orderpriority") == "1-URGENT").select(
            F.lit("urgent").alias("src"), "o_orderkey"
        ),
        o.filter(F.col("o_orderpriority") == "2-HIGH").select(
            F.lit("high").alias("src"), "o_orderkey"
        ),
        o.filter(F.col("o_orderstatus") == "O").select(
            F.lit("open").alias("src"), "o_orderkey"
        ),
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    return unioned.groupBy("src").agg(F.count(F.lit(1)).alias("n")).orderBy("src")


@register(
    "union_distinct_keys",
    """
    SELECT k FROM (
      SELECT o_custkey AS k FROM orders
      UNION
      SELECT c_custkey AS k FROM customer
    )
    """,
    tags=["setop"],
)
def union_distinct_keys(spark, sf_dir):
    """U2 — UNION (distinct) of two key sets."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return o.union(c).distinct()


@register(
    "union_by_name_missing",
    """
    SELECT c_custkey, c_name, c_acctbal FROM (
      SELECT c_custkey, c_name, NULL::DOUBLE AS c_acctbal
      FROM customer WHERE c_nationkey = 1
      UNION ALL
      SELECT c_custkey, NULL::VARCHAR AS c_name, round(c_acctbal, 2) AS c_acctbal
      FROM customer WHERE c_nationkey = 2
    )
    """,
    tags=["setop"],
)
def union_by_name_missing(spark, sf_dir):
    """U3 — schema-aligning concat: union with missing columns NULL-filled
    (reference bind_rows, R/ffiec_process.R:245,445)."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_nationkey") == 1).select("c_custkey", "c_name")
    b = c.filter(F.col("c_nationkey") == 2).select(
        "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    return (
        a.unionByName(b, allowMissingColumns=True)
        .select("c_custkey", "c_name", F.col("c_acctbal").cast("double"))
    )


@register(
    "intersect_except_keys",
    """
    SELECT 'both' AS side, k FROM (
      SELECT o_custkey AS k FROM orders
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_acctbal > 0
    )
    UNION ALL
    SELECT 'only_neg', k FROM (
      SELECT c_custkey AS k FROM customer WHERE c_acctbal <= 0
      EXCEPT
      SELECT o_custkey FROM orders
    )
    """,
    tags=["setop"],
)
def intersect_except_keys(spark, sf_dir):
    """Set-op extension beyond the reference's unions: INTERSECT
    (customers with positive balance who ordered) and EXCEPT
    (non-positive-balance customers who never ordered), both planned as
    distinct-aggregated semi/anti joins — one shuffle each, no
    row-by-row comparison."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = load_table(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 0).select(F.col("c_custkey").alias("k"))
    neg = c.filter(F.col("c_acctbal") <= 0).select(F.col("c_custkey").alias("k"))
    both = o.intersect(pos).select(F.lit("both").alias("side"), "k")
    # subtract == EXCEPT (set semantics): a key present on both sides is
    # dropped regardless of multiplicity (exceptAll+distinct would leak
    # a key whose left count exceeds its right count)
    only = neg.subtract(o).select(F.lit("only_neg").alias("side"), "k")
    return both.unionByName(only)


@register(
    "posexplode_tokens",
    """
    SELECT p_partkey,
           CAST(generate_subscripts(string_split(p_type, ' '), 1) - 1
                AS INTEGER) AS pos,
           unnest(string_split(p_type, ' ')) AS token
    FROM part
    """,
    tags=["reshape"],
)
def posexplode_tokens(spark, sf_dir):
    """R4 extension — positional explode (token + its 0-based index),
    the shape tokenizer pipelines need to preserve word order."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.posexplode(F.split("p_type", " ")).alias("pos", "token"),
    )


@register(
    "group_string_agg",
    """
    SELECT c_nationkey,
           string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment)
             AS segments,
           count(*) AS n
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=["agg", "list"],
)
def group_string_agg(spark, sf_dir):
    """A4 extension — ordered string aggregation per group (DuckDB
    ``string_agg ... ORDER BY`` vs Spark sort_array(collect_set) +
    array_join: deterministic on both engines, single shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(
            F.sort_array(F.collect_set("c_mktsegment")), "|"
        ).alias("segments"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "cube_revenue",
    """
    SELECT coalesce(l_returnflag, '<all>') AS flag,
           coalesce(l_linestatus, '<all>') AS status,
           count(*) AS n,
           round(sum(l_extendedprice), 2) AS gross
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=["agg", "rollup"],
)
def cube_revenue(spark, sf_dir):
    """Full CUBE over two grouping dimensions (all 4 grouping sets in
    one pass — Spark plans one Expand + one shuffle, same as ROLLUP);
    NULL grouping markers coalesced to a sentinel so they can't collide
    with real values in the hash compare."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("gross"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("status"),
            "n",
            "gross",
        )
    )


# --------------------------------------------------------------------------
# Sorts / limits (O1-O2)
# --------------------------------------------------------------------------

@register(
    "sort_multi_limit",
    """
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 20
    """,
    tags=["sort"],
)
def sort_multi_limit(spark, sf_dir):
    """O1/O2 — multi-column global sort with deterministic tie-break + limit.

    Spark implements this as TakeOrderedAndProject: no global sort is
    materialized, each partition contributes its local top-k.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("l_extendedprice")
        )
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Scalar function surface (§2.9)
# --------------------------------------------------------------------------

@register(
    "scalar_functions",
    """
    SELECT o_orderkey,
           lower(o_orderstatus)                                    AS status_lc,
           substr(o_orderpriority, 1, 1)                           AS prio_digit,
           regexp_extract(o_orderpriority, '^(\\d)-(\\w+)$', 2)    AS prio_word,
           regexp_replace(o_orderpriority, '[^A-Z]', '', 'g')     AS prio_upper_only,
           o_orderpriority || '/' || o_orderstatus                 AS prio_status,
           CAST(o_orderdate AS DATE)                               AS order_date,
           strftime(CAST(o_orderdate AS DATE), '%Y%m%d')           AS date_yyyymmdd,
           CAST(o_orderkey AS VARCHAR)                             AS key_str,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING')         AS status_fixed,
           round(o_totalprice / 100.0, 4)                          AS price_pct
    FROM orders
    WHERE o_orderkey % 97 = 0
    """,
    tags=["scalar"],
)
def scalar_functions(spark, sf_dir):
    """§2.9 scalar surface: case/substr/regex extract+replace/concat/date
    format/casts/coalesce/percent->proportion — all JVM-side built-ins
    (the reference applies these as R vector fns; here they stay in
    whole-stage codegen)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            F.lower("o_orderstatus").alias("status_lc"),
            F.substring("o_orderpriority", 1, 1).alias("prio_digit"),
            F.regexp_extract("o_orderpriority", r"^(\d)-(\w+)$", 2).alias("prio_word"),
            F.regexp_replace("o_orderpriority", "[^A-Z]", "").alias("prio_upper_only"),
            F.concat_ws("/", "o_orderpriority", "o_orderstatus").alias("prio_status"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.date_format("o_orderdate", "yyyyMMdd").alias("date_yyyymmdd"),
            F.col("o_orderkey").cast("string").alias("key_str"),
            F.coalesce(
                F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
            ).alias("status_fixed"),
            F.round(F.col("o_totalprice") / 100.0, 4).alias("price_pct"),
        )
    )


@register(
    "subquery_large_orders",
    """
    SELECT o.o_orderkey, o.o_orderdate, round(o.o_totalprice, 2) AS total,
           round(agg.sum_qty, 2) AS sum_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    ) agg ON o.o_orderkey = agg.l_orderkey
    """,
    tags=["relational", "subquery"],
)
def subquery_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: orders whose lineitems sum past a threshold —
    aggregate subquery as join input (group-having pushed below the
    join, one shuffle each side on the same key)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    agg = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return o.join(agg, o.o_orderkey == agg.l_orderkey).select(
        "o_orderkey",
        "o_orderdate",
        F.round("o_totalprice", 2).alias("total"),
        F.round("sum_qty", 2).alias("sum_qty"),
    )


@register(
    "correlated_exists_returns",
    """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R'
    )
    """,
    tags=["relational", "subquery"],
)
def correlated_exists_returns(spark, sf_dir):
    """Correlated EXISTS via spark.sql: Catalyst de-correlates it into a
    left-semi join (the same plan the hand-written semi join produces —
    declaring the subquery costs nothing)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment
        FROM v_customer c
        WHERE EXISTS (
          SELECT 1 FROM v_orders o
          JOIN v_lineitem l ON l.l_orderkey = o.o_orderkey
          WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R'
        )
        """
    )


@register(
    "quantiles_by_flag",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=["relational", "stats"],
)
def quantiles_by_flag(spark, sf_dir):
    """Exact interpolated percentiles per group (both engines implement
    the same continuous-quantile definition).  At 100 TB switch to
    approx_percentile: one pass, mergeable sketches, bounded memory —
    exact percentile must materialize each group's values."""
    from ffiec_pq_spark.session import spread

    # spread: exact percentile buffers each group's values in the
    # partial aggregate, so a near-single-split scan serializes the
    # buffering on few tasks (no-op on real multi-split inputs)
    li = spread(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_extendedprice"
        )
    )
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.expr(f"percentile(l_extendedprice, {q})"), 4).alias(name)
            for name, q in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]
        ]
    )


@register(
    "rollup_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=["relational", "agg"],
)
def rollup_revenue(spark, sf_dir):
    """ROLLUP hierarchy totals (flag, status) -> (flag) -> grand total in
    one pass — Spark expands grouping sets map-side, so it is still a
    single shuffle, not one job per level."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "upsert_keep_latest",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderpriority AS pri,
             o_totalprice AS total, 1 AS version
      FROM orders WHERE o_orderkey % 5 != 0
    ),
    updates AS (
      SELECT o_orderkey AS k, o_orderpriority AS pri,
             o_totalprice + 100.0 AS total, 2 AS version
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    merged AS (
      SELECT k,
             max_by(pri, version)     AS pri,
             max_by(total, version)   AS total,
             max(version)             AS version
      FROM (SELECT * FROM base UNION ALL SELECT * FROM updates)
      GROUP BY k
    )
    SELECT pri AS o_orderpriority,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN version = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_from_updates,
           round(sum(total), 2) AS sum_total
    FROM merged GROUP BY pri
    """,
    tags=["merge", "agg"],
)
def upsert_keep_latest(spark, sf_dir):
    """MERGE/upsert keep-latest semantics — the restated-filing case
    the reference handles by re-writing whole parquet files
    (R/ffiec_process.R overwrite flow): a base table and an update
    batch with overlapping keys fold to the highest-version row per
    key.

    Spark-first shape: ``unionByName`` + ONE grouped ``max_by(payload,
    version)`` aggregation — a single shuffle on the key with map-side
    partials, no window sort, no per-key row_number.  At 100 TB the
    update batch is typically partition-pruned (only affected dates
    rescanned) and the same one-shuffle merge applies per partition.
    Versions are distinct per key by construction (each side
    contributes at most one row per key), so max_by is deterministic;
    the output aggregates per priority so the oracle hash is
    schema-stable."""
    o = load_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").alias("total"),
        F.lit(1).alias("version"),
    )
    updates = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        (F.col("o_totalprice") + 100.0).alias("total"),
        F.lit(2).alias("version"),
    )
    merged = (
        base.unionByName(updates)
        .groupBy("k")
        .agg(
            F.max_by("pri", "version").alias("pri"),
            F.max_by("total", "version").alias("total"),
            F.max("version").alias("version"),
        )
    )
    return merged.groupBy(F.col("pri").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("version") == 2).cast("long")).alias("n_from_updates"),
        F.round(F.sum("total"), 2).alias("sum_total"),
    )


@register(
    "snapshot_diff_counts",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_totalprice AS total, o_orderstatus AS st
      FROM orders WHERE o_orderkey % 7 != 0
    ),
    new AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 50.0
                  ELSE o_totalprice END AS total,
             o_orderstatus AS st
      FROM orders WHERE o_orderkey % 5 != 0
    )
    SELECT CASE
             WHEN b.k IS NULL THEN 'added'
             WHEN n.k IS NULL THEN 'removed'
             WHEN b.total != n.total OR b.st != n.st THEN 'changed'
             ELSE 'unchanged'
           END AS status,
           count(*) AS n,
           round(sum(coalesce(n.total, b.total)), 2) AS sum_total
    FROM base b FULL OUTER JOIN new n ON b.k = n.k
    GROUP BY 1
    """,
    tags=["merge", "diff"],
)
def snapshot_diff_counts(spark, sf_dir):
    """Snapshot diff (the CDC building block): two table versions fold
    through ONE full-outer join on the key into added / removed /
    changed / unchanged classes with per-class row counts and totals.
    This is how a pipeline derives an incremental update feed from
    periodic full snapshots (the reference re-publishes whole parquet
    files per quarter — this operator is what turns two of those into
    a delta).  One shuffle on the key; payload comparison is column
    equality, no hashing needed when the payload is narrow."""
    o = load_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("bk"),
        F.col("o_totalprice").alias("btotal"),
        F.col("o_orderstatus").alias("bst"),
    )
    new = o.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("nk"),
        F.when(
            F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") + 50.0
        ).otherwise(F.col("o_totalprice")).alias("ntotal"),
        F.col("o_orderstatus").alias("nst"),
    )
    joined = base.join(new, base.bk == new.nk, "full_outer")
    status = (
        F.when(F.col("bk").isNull(), "added")
        .when(F.col("nk").isNull(), "removed")
        .when(
            (F.col("btotal") != F.col("ntotal"))
            | (F.col("bst") != F.col("nst")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return joined.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.coalesce("ntotal", "btotal")), 2).alias("sum_total"),
    )
