"""Analytical aggregates: built-in bivariate statistics (JVM path) and
a grouped-map ``applyInPandas`` normalization (the Arrow UDAF-style
path) — both under the exact oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.functions.hashing import hash60, hash60_sql
from ffiec_pq_spark.session import local_frame, load_table


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
    "approx_distinct_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_exact,
           true AS approx_within_5pct
    FROM events
    GROUP BY event_type
    """,
    tags=["analytics", "approx", "sketch"],
)
def approx_distinct_users(spark, sf_dir):
    """HyperLogLog distinct counting under the oracle gate: the query
    emits the exact distinct count plus a boolean asserting the
    ``approx_count_distinct`` sketch (rsd=2%) landed within 5% of it —
    the oracle pins that boolean to ``true``, so the hash check
    certifies the sketch's error bound, the honest way to
    oracle-verify an approximate operator.  At 100 TB the sketch is
    the serving path: mergeable, one pass, fixed memory per group."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_approx"),
    )
    # greatest(n_exact, 1): an all-NULL group has countDistinct 0 and a
    # bare /n_exact would make the pinned boolean NULL, failing the gate
    return agg.select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            / F.greatest(F.col("n_exact"), F.lit(1))
            <= 0.05
        ).alias("approx_within_5pct"),
    )


@register(
    "approx_quantile_check",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS median_exact,
           true AS approx_within_1pct
    FROM events
    GROUP BY event_type
    """,
    tags=["analytics", "approx", "sketch"],
)
def approx_quantile_check(spark, sf_dir):
    """Approximate quantiles under the oracle gate, same pattern:
    exact interpolated median (Spark ``percentile`` == DuckDB
    ``quantile_cont``) plus a boolean asserting ``percentile_approx``
    (accuracy 10000) is within 1% — the sketch path that replaces a
    full sort at scale."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("m_exact"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("m_approx"),
    )
    # mixed bound: relative 1% with an absolute 1e-6 floor, so a group
    # whose exact median is 0 (or epsilon) can't blow up the division
    # and flip the pinned boolean
    tol = F.greatest(0.01 * F.abs(F.col("m_exact")), F.lit(1e-6))
    return agg.select(
        "event_type",
        F.round("m_exact", 4).alias("median_exact"),
        (F.abs(F.col("m_approx") - F.col("m_exact")) <= tol).alias(
            "approx_within_1pct"
        ),
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

    Scale: ``zscore_by_group`` (operators/normalize.py) carries the
    giant-group guard — pass ``max_group_rows`` and oversize groups
    run as JVM moments + broadcast join instead of a pandas worker
    (guard pinned by tests/test_hardening.py with a 90%-skewed key).
    Here every segment is worker-sized, so the grouped-map path runs
    for all of them."""
    from ffiec_pq_spark.operators.normalize import zscore_by_group

    c = load_table(spark, sf_dir, "customer")
    return zscore_by_group(
        c, key_col="c_mktsegment", val_col="c_acctbal", id_col="c_custkey"
    )


@register(
    "events_value_histogram",
    """
    SELECT event_type,
           CAST(least(9, greatest(0, floor(value / 10.0))) AS INTEGER)
             AS bucket,
           count(*) AS n,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
    FROM events
    GROUP BY 1, 2
    """,
    tags=["analytics", "histogram"],
)
def events_value_histogram(spark, sf_dir):
    """Equi-width histogram (10 buckets of width 10, clamped) per event
    type — the profiling primitive behind range-partition planning and
    skew detection.  One grouped aggregation with map-side partials;
    the bucket expression is pure floor arithmetic so both engines
    compute the identical bucket for every row (DuckDB has no
    width_bucket; the explicit form is engine-portable)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.lit(9), F.greatest(F.lit(0), F.floor(F.col("value") / 10.0))
    ).cast("int")
    return ev.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 4).alias("lo"),
        F.round(F.max("value"), 4).alias("hi"),
    )


@register(
    "range_sharded_export",
    """
    SELECT 8 AS n_shards,
           count(*) AS n_rows,
           true AS ranges_disjoint,
           true AS counts_complete
    FROM events
    """,
    tags=["layout", "export"],
)
def range_sharded_export(spark, sf_dir):
    """Training-data export layout: ``repartitionByRange`` shards the
    corpus into totally-ordered, non-overlapping key ranges — the
    shape a dataloader wants (shard N's every key < shard N+1's) and
    the only way to get a global order at 100 TB without a single-node
    sort.  The query materializes the 8-shard layout, then PROVES the
    contract and pins it for the oracle: per-shard (min, max, count)
    via one aggregation, disjointness checked shard-to-shard with a
    window over the 8 stat rows, row conservation against the source
    count.  Spark's range sampler is seeded deterministically, so the
    layout is reproducible run-to-run."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    key = F.struct("user_id", "event_id")  # unique -> strict total order
    sharded = ev.repartitionByRange(8, "user_id", "event_id").select(
        F.spark_partition_id().alias("pid"), key.alias("k")
    )
    stats = sharded.groupBy("pid").agg(
        F.min("k").alias("kmin"),
        F.max("k").alias("kmax"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.orderBy("pid")
    flagged = stats.withColumn("next_min", F.lead("kmin").over(w)).withColumn(
        "ok", F.col("next_min").isNull() | (F.col("kmax") < F.col("next_min"))
    )
    # row-conservation check as an in-plan scalar branch (broadcast of
    # one row) — no separate driver-side count() job
    total = ev.agg(F.count(F.lit(1)).alias("_total"))
    return flagged.crossJoin(F.broadcast(total)).agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.sum("n").alias("n_rows"),
        F.min(F.col("ok").cast("int")).cast("boolean").alias(
            "ranges_disjoint"
        ),
        (F.sum("n") == F.max("_total")).alias("counts_complete"),
    )


@register(
    "events_value_equidepth",
    """
    WITH t AS (
      SELECT event_type, value,
             ntile(4) OVER (
               PARTITION BY event_type ORDER BY value, event_id
             ) AS q
      FROM events
    )
    SELECT event_type, q,
           count(*) AS n,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
    FROM t GROUP BY 1, 2
    """,
    tags=["analytics", "histogram"],
)
def events_value_equidepth(spark, sf_dir):
    """Equi-DEPTH histogram (quartile buckets of equal row count) per
    event type — the complement of `events_value_histogram`'s
    equi-width buckets, and the statistic behind range-boundary
    planning on skewed values.

    Scale shape: ``event_type`` has single-digit cardinality, so a
    per-type ``ntile`` window would totally sort n/|types| rows per
    reducer.  Instead the rank comes from ``distributed_rank`` (range-
    partitioned parallel sort + tiny offset join — see
    operators/windows.py) and the bucket from ``ntile_from_rank``,
    which reproduces the ANSI ntile distribution from (rank, group
    count) arithmetically.  Bit-identical to the oracle's ntile window
    — ties split by the same (value, event_id) order — with no
    single-reducer sort anywhere."""
    from ffiec_pq_spark.operators.windows import (
        distributed_rank,
        ntile_from_rank,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "event_id"
    )
    ranked = distributed_rank(
        ev, order_cols=["value", "event_id"], part_cols=["event_type"]
    )
    counts = ranked.groupBy("event_type").agg(F.count(F.lit(1)).alias("nt"))
    q = ntile_from_rank(F.col("r"), F.col("nt"), 4).cast("int")
    return (
        ranked.join(F.broadcast(counts), "event_type")
        .select("event_type", "value", q.alias("q"))
        .groupBy("event_type", "q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


@register(
    "cooccurrence_triangles",
    """
    WITH occ AS (
      SELECT DISTINCT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS w,
             event_type, user_id
      FROM events
    ),
    e AS (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM occ a
      JOIN occ b ON a.w = b.w AND a.event_type = b.event_type
                AND a.user_id < b.user_id
    ),
    nodes AS (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) GROUP BY node
    ),
    tri AS (
      SELECT count(*) AS t
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    wed AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS w FROM nodes)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           CAST(t.t AS BIGINT) AS n_triangles,
           round(3.0 * t.t / greatest(w.w, 1), 6) AS clustering_coeff
    FROM tri t, wed w
    """,
    tags=["graph", "analytics"],
)
def cooccurrence_triangles(spark, sf_dir):
    """Distributed triangle counting over the user co-occurrence graph
    (users sharing a (minute, event_type) context are connected) — the
    graph-analytics primitive behind community/cohesion metrics, plus
    the global clustering coefficient (3·triangles / wedges).

    The Spark plan is the DEGREE-ORDERED enumeration (the shape that
    survives skew at scale): each edge is oriented from the endpoint
    with lexicographically smaller (degree, id) toward the larger, so
    every wedge is generated at its lowest-degree apex — per-node
    fan-out is bounded by arboricity, not by the max degree, which is
    what makes the self-join survive a power-law graph.  The oracle
    replays the naive id-ordered triple join; both enumerate each
    triangle exactly once, so the counts hash-match while the physical
    strategies differ — the check certifies the rewrite."""
    from pyspark.sql import Window  # noqa: F401  (kept local-import style)

    ev = load_table(spark, sf_dir, "events")
    occ = ev.select(
        F.date_trunc("minute", F.col("ts")).alias("w"),
        "event_type",
        "user_id",
    ).distinct()
    a = occ.select("w", "event_type", F.col("user_id").alias("u"))
    b = occ.select("w", "event_type", F.col("user_id").alias("v"))
    e = (
        a.join(b, ["w", "event_type"])
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient by (degree, id): adj rows carry the rank struct of BOTH
    # endpoints so the wedge join can order its two legs without
    # another lookup
    du = deg.select(
        F.col("node").alias("u"), F.struct("d", "node").alias("ru")
    )
    dv = deg.select(
        F.col("node").alias("v"), F.struct("d", "node").alias("rv")
    )
    ranked = e.join(du, "u").join(dv, "v")
    adj = ranked.select(
        F.when(F.col("ru") < F.col("rv"), F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(F.col("ru") < F.col("rv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(F.col("ru") < F.col("rv"), F.col("rv")).otherwise(F.col("ru")).alias("rdst"),
    )
    l1 = adj.select(F.col("src"), F.col("dst").alias("b"), F.col("rdst").alias("rb"))
    l2 = adj.select(F.col("src"), F.col("dst").alias("c"), F.col("rdst").alias("rc"))
    wedges = l1.join(l2, "src").filter(F.col("rb") < F.col("rc"))
    closing = adj.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"]).agg(
        F.count(F.lit(1)).alias("t")
    )
    wed = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).alias("wedges")
    )
    counts = e.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    return (
        counts.crossJoin(tri)
        .crossJoin(wed)
        .select(
            "n_nodes",
            "n_edges",
            F.col("t").alias("n_triangles"),
            F.round(
                F.lit(3.0) * F.col("t") / F.greatest("wedges", F.lit(1)), 6
            ).alias("clustering_coeff"),
        )
    )


_PR_D = 0.85
_PR_ITERS = 3


def _pagerank_sql(iters: int = _PR_ITERS) -> str:
    ctes = [
        """occ AS (
      SELECT DISTINCT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS w,
             event_type, user_id
      FROM events
    )""",
        """e AS (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM occ a
      JOIN occ b ON a.w = b.w AND a.event_type = b.event_type
                AND a.user_id < b.user_id
    )""",
        "ed AS (SELECT u AS s, v AS t FROM e UNION ALL SELECT v AS s, u AS t FROM e)",
        "deg AS (SELECT s, count(*) AS d FROM ed GROUP BY s)",
        "n AS (SELECT count(*) AS c FROM deg)",
        "r0 AS (SELECT deg.s AS node, round(1.0 / n.c, 9) AS r FROM deg, n)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (
      SELECT ed.t AS node,
             round((1.0 - {_PR_D}) / max(n.c)
                   + {_PR_D} * sum(r{i - 1}.r / deg.d), 9) AS r
      FROM ed
      JOIN r{i - 1} ON r{i - 1}.node = ed.s
      JOIN deg ON deg.s = ed.s, n
      GROUP BY ed.t
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node AS user_id, round(r, 6) AS rank
    FROM r{iters} ORDER BY r DESC, node LIMIT 10
    """
    )


@register(
    "cooccurrence_pagerank",
    _pagerank_sql(),
    tags=["graph", "iterative"],
)
def cooccurrence_pagerank(spark, sf_dir):
    """PageRank (3 damped power iterations, d=0.85) over the user
    co-occurrence graph — the canonical iterative graph algorithm on
    Spark: per iteration ONE join of the edge list with the current
    rank vector and one grouped sum; no collect, no lineage blowup
    (three iterations compose as a fixed plan; longer runs would
    localCheckpoint every ~5 like dedup_clusters).  The undirected
    graph gives every node out-edges, so there is no dangling mass.

    Determinism: each iteration's ranks round at 9 dp on BOTH engines
    before feeding the next (the kmeans-oracle trick) — neighbor sums
    in different orders agree after the round, so the unrolled-CTE
    replay hash-matches exactly.  Output: top-10 users by rank
    (6 dp, tie-broken on user_id)."""
    ev = load_table(spark, sf_dir, "events")
    occ = ev.select(
        F.date_trunc("minute", F.col("ts")).alias("w"),
        "event_type",
        "user_id",
    ).distinct()
    a = occ.select("w", "event_type", F.col("user_id").alias("u"))
    b = occ.select("w", "event_type", F.col("user_id").alias("v"))
    e = (
        a.join(b, ["w", "event_type"])
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    ed = e.select(F.col("u").alias("s"), F.col("v").alias("t")).unionByName(
        e.select(F.col("v").alias("s"), F.col("u").alias("t"))
    )
    deg = ed.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    n_nodes = deg.count()  # scalar: rides into the plan as a literal
    if n_nodes == 0:
        # no co-occurrence edges (tiny or empty input): the oracle's
        # iteration CTEs are empty too — return the empty top-10
        return spark.createDataFrame([], "user_id long, rank double")
    ranks = deg.select(
        F.col("s").alias("node"),
        F.round(F.lit(1.0) / n_nodes, 9).alias("r"),
    )
    contrib_src = ed.join(deg, "s")
    for _ in range(_PR_ITERS):
        ranks = (
            contrib_src.join(ranks, contrib_src.s == ranks.node)
            .groupBy("t")
            .agg(
                F.round(
                    F.lit((1.0 - _PR_D) / n_nodes)
                    + F.lit(_PR_D) * F.sum(F.col("r") / F.col("d")),
                    9,
                ).alias("r")
            )
            .select(F.col("t").alias("node"), "r")
        )
    return (
        ranks.orderBy(F.desc("r"), F.asc("node"))
        .limit(10)
        .select(F.col("node").alias("user_id"), F.round("r", 6).alias("rank"))
    )


_CH_SHARDS = 8
_CH_VNODES = 16
_CH_RING = 1 << 32


def _ring_sql(n_shards: int) -> str:
    parts = []
    for s in range(n_shards):
        for r in range(_CH_VNODES):
            h = hash60_sql("'s:%d:r:%d'" % (s, r))
            parts.append("(%d, (%s) %% %d)" % (s, h, _CH_RING))
    return "(VALUES " + ", ".join(parts) + ") AS vn(shard, pos)"


def _assign_sql(n_shards: int, alias: str) -> str:
    """Per doc: the owning shard = vnode at the smallest ring position
    >= the key position, wrapping to the global minimum vnode."""
    return f"""
    {alias} AS (
      SELECT d.doc_id,
             coalesce(
               (SELECT vn.shard FROM {_ring_sql(n_shards)}
                WHERE vn.pos >= d.kpos ORDER BY vn.pos, vn.shard LIMIT 1),
               (SELECT vn.shard FROM {_ring_sql(n_shards)}
                ORDER BY vn.pos, vn.shard LIMIT 1)
             ) AS shard
      FROM (SELECT doc_id, ({hash60_sql('doc_id')}) % {_CH_RING} AS kpos
            FROM documents) d
    )"""


@register(
    "consistent_hash_routing",
    f"""
    WITH {_assign_sql(_CH_SHARDS, 'a8')},
    {_assign_sql(_CH_SHARDS + 1, 'a9')},
    moved AS (
      SELECT CAST(count(*) AS BIGINT) AS n_moved
      FROM a8 JOIN a9 USING (doc_id) WHERE a8.shard != a9.shard
    ),
    total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM a8)
    SELECT a8.shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           m.n_moved,
           (CAST(m.n_moved AS DOUBLE) / t.n) <= (2.0 / {_CH_SHARDS + 1})
             AS elastic
    FROM a8, moved m, total t
    GROUP BY a8.shard, m.n_moved, t.n
    """,
    tags=["layout", "routing"],
)
def consistent_hash_routing(spark, sf_dir):
    """Consistent-hash routing with virtual nodes — how a 100 TB system
    assigns keys to shards so that RESIZING moves only ~1/(n+1) of the
    data instead of rehashing everything: 16 vnodes per shard on a
    2^32 ring, each key owned by the next vnode clockwise.  The query
    assigns every document under 8 shards AND under 9, reports the
    per-shard counts, the number of keys that moved, and pins the
    elasticity bound (moved fraction <= 2/(n+1)) as an oracle-hashed
    boolean — the property that makes the scheme worth its complexity.

    The ring is a 128-row literal dimension (broadcast); assignment is
    one sort-merge-free lookup per key expressed as min-over-filtered
    -broadcast, i.e. a map-side operation at any scale."""
    ring8 = [
        (s, r) for s in range(_CH_SHARDS) for r in range(_CH_VNODES)
    ]
    ring9 = [
        (s, r) for s in range(_CH_SHARDS + 1) for r in range(_CH_VNODES)
    ]

    def ring_df(pairs):
        rows = local_frame(spark, pairs, "shard int, r int")
        pos = hash60(
            F.concat(
                F.lit("s:"), F.col("shard"), F.lit(":r:"), F.col("r")
            )
        ) % _CH_RING
        return rows.select("shard", pos.alias("pos"))

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", (hash60(F.col("doc_id")) % _CH_RING).alias("kpos")
    )

    def assign(ring):
        # broadcast the 128/144-row ring; per key keep the smallest
        # (pos, shard) among vnodes clockwise of kpos, wrapping to the
        # ring's global minimum
        r = ring.select(
            "shard", "pos", F.struct("pos", "shard").alias("ps")
        )
        wrap = r.orderBy("pos", "shard").limit(1).select(
            F.col("shard").alias("_wrap_shard")
        )
        cand = (
            d.join(F.broadcast(r), F.col("pos") >= F.col("kpos"), "left")
            .groupBy("doc_id")
            .agg(F.min("ps").alias("best"))
            .crossJoin(F.broadcast(wrap))
            .select(
                "doc_id",
                F.coalesce(F.col("best.shard"), F.col("_wrap_shard")).alias(
                    "shard"
                ),
            )
        )
        return cand

    a8 = assign(ring_df(ring8))
    a9 = assign(ring_df(ring9))
    moved = (
        a8.withColumnRenamed("shard", "s8")
        .join(a9.withColumnRenamed("shard", "s9"), "doc_id")
        .agg(F.sum((F.col("s8") != F.col("s9")).cast("long")).alias("n_moved"))
    )
    total = a8.agg(F.count(F.lit(1)).alias("n"))
    return (
        a8.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(moved))
        .crossJoin(F.broadcast(total))
        .select(
            "shard",
            "n_docs",
            "n_moved",
            (
                (F.col("n_moved").cast("double") / F.col("n"))
                <= 2.0 / (_CH_SHARDS + 1)
            ).alias("elastic"),
        )
    )


@register(
    "basket_part_pairs",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    nn AS (SELECT count(DISTINCT o) AS n_orders FROM items),
    cnt AS (SELECT p, count(*) AS c FROM items GROUP BY p),
    pairs AS (
      SELECT a.p AS part_a, b.p AS part_b, count(*) AS support
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2
      HAVING count(*) >= 3
    )
    SELECT part_a, part_b, support,
           round(CAST(support * nn.n_orders AS DOUBLE) / (ca.c * cb.c), 6)
             AS lift
    FROM pairs
    JOIN cnt ca ON ca.p = part_a
    JOIN cnt cb ON cb.p = part_b
    CROSS JOIN nn
    """,
    tags=["analytics", "basket"],
)
def basket_part_pairs(spark, sf_dir):
    """Market-basket co-occurrence (A-priori level 2): part pairs
    bought together in >= 3 orders, with lift = P(a,b)/(P(a)P(b)).
    The pair generation is a self-equi-join on the ORDER key, so the
    fan-out per order is C(basket, 2) — bounded by the basket size,
    never by the catalog — and the join shuffles on the order id like
    any grouped aggregate.  Lift is one exact integer-ratio division,
    rounded only in the output."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    nn = items.agg(F.countDistinct("o").alias("n_orders"))
    cnt = items.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    a = items.select(F.col("o"), F.col("p").alias("part_a"))
    b = items.select(F.col("o"), F.col("p").alias("part_b"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 3)
    )
    ca = cnt.select(F.col("p").alias("part_a"), F.col("c").alias("ca"))
    cb = cnt.select(F.col("p").alias("part_b"), F.col("c").alias("cb"))
    lift = F.round(
        (F.col("support") * F.col("n_orders")).cast("double")
        / (F.col("ca") * F.col("cb")),
        6,
    )
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(nn))
        .select("part_a", "part_b", "support", lift.alias("lift"))
    )


@register(
    "orders_pareto_abc",
    """
    WITH rev AS (
      SELECT o_custkey AS cust, round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT cust, revenue,
             sum(revenue) OVER (
               PARTITION BY cust % 10
               ORDER BY revenue DESC, cust
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_rev
      FROM rev
    ),
    tot AS (
      SELECT *, max(cum_rev) OVER (PARTITION BY cust % 10) AS tot_rev
      FROM ranked
    )
    SELECT cust % 10 AS shard,
           CASE WHEN cum_rev / tot_rev <= 0.5 THEN 'A'
                WHEN cum_rev / tot_rev <= 0.8 THEN 'B'
                ELSE 'C' END AS abc_class,
           count(*) AS n_customers,
           round(sum(revenue), 2) AS class_revenue
    FROM tot
    GROUP BY 1, 2
    """,
    tags=["analytics", "window"],
)
def orders_pareto_abc(spark, sf_dir):
    """Pareto/ABC segmentation per shard: customers ranked by revenue,
    classified by cumulative share (A: top 50%% of revenue, B: to 80%%,
    C: tail).  The cumulative window partitions by a shard key — an
    unsharded Pareto needs ONE total order (the single-partition
    window anti-pattern); sharding keeps each ordering parallel, the
    way a 100 TB segmentation actually runs.  Revenue is rounded
    BEFORE the cumulative sum so the running totals are identical
    decimal sequences on both engines, and the denominator is the MAX
    of that ordered running sum (not an unordered partition sum whose
    re-association could differ per engine at the last ulp)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    shard = F.col("cust") % 10
    w = (
        Window.partitionBy(shard)
        .orderBy(F.desc("revenue"), F.asc("cust"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = rev.select(
        shard.alias("shard"),
        "revenue",
        F.sum("revenue").over(w).alias("cum_rev"),
    )
    # total = MAX of the ORDERED running sum (revenues are positive):
    # both engines accumulate the same decimal sequence in the same
    # order, so the total is bit-identical — an unordered partition
    # SUM would re-associate differently per engine
    ranked = ranked.withColumn(
        "tot_rev", F.max("cum_rev").over(Window.partitionBy("shard"))
    )
    share = F.col("cum_rev") / F.col("tot_rev")
    cls = (
        F.when(share <= 0.5, "A").when(share <= 0.8, "B").otherwise("C")
    )
    return ranked.groupBy("shard", cls.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("revenue"), 2).alias("class_revenue"),
    )


@register(
    "orders_open_backlog",
    """
    WITH spans AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             CAST(o.o_orderdate AS DATE) AS open_d,
             CAST(max(l.l_shipdate) AS DATE) AS close_d
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2, 3
    ),
    deltas AS (
      SELECT o_orderpriority, open_d AS d, 1 AS delta FROM spans
      UNION ALL
      SELECT o_orderpriority, close_d + INTERVAL 1 DAY, -1 FROM spans
    ),
    daily AS (
      SELECT o_orderpriority, CAST(d AS DATE) AS d,
             CAST(sum(delta) AS BIGINT) AS net
      FROM deltas GROUP BY 1, 2
    )
    SELECT o_orderpriority, d,
           CAST(sum(net) OVER (
             PARTITION BY o_orderpriority ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS open_orders
    FROM daily
    """,
    tags=["analytics", "interval"],
)
def orders_open_backlog(spark, sf_dir):
    """Concurrent-interval counting: how many orders are OPEN (placed
    but not fully shipped) each day, per priority — the classic
    sweep-line rewrite: each interval becomes a +1 at open and a -1
    after close, daily deltas aggregate, and a running sum per
    priority yields the backlog.  No interval self-join (the naive
    day-x-order containment join is quadratic); the only ordered pass
    runs over the DAILY DELTA table, orders of magnitude smaller than
    the fact."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_orderdate").cast("date").alias("open_d"),
        )
        .agg(F.max("l_shipdate").cast("date").alias("close_d"))
    )
    opens = spans.select(
        "o_orderpriority", F.col("open_d").alias("d"), F.lit(1).alias("delta")
    )
    closes = spans.select(
        "o_orderpriority",
        F.date_add("close_d", 1).alias("d"),
        F.lit(-1).alias("delta"),
    )
    daily = (
        opens.unionByName(closes)
        .groupBy("o_orderpriority", "d")
        .agg(F.sum("delta").cast("long").alias("net"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "o_orderpriority",
        "d",
        F.sum("net").over(w).cast("long").alias("open_orders"),
    )


_BENFORD_ROWS = [(1, 0.3010299956639812), (2, 0.17609125905568124), (3, 0.12493873660829992), (4, 0.09691001300805642), (5, 0.07918124604762482), (6, 0.06694678963061322), (7, 0.05799194697768673), (8, 0.05115252244738129), (9, 0.04575749056067514)]
_BENFORD_VALUES = "(1, 0.3010299956639812), (2, 0.17609125905568124), (3, 0.12493873660829992), (4, 0.09691001300805642), (5, 0.07918124604762482), (6, 0.06694678963061322), (7, 0.05799194697768673), (8, 0.05115252244738129), (9, 0.04575749056067514)"


@register(
    "benford_first_digit",
    f"""
    WITH cents AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders WHERE o_totalprice > 0
    ),
    digits AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM cents
    ),
    nn AS (SELECT count(*) AS n FROM digits),
    exp_ AS (
      SELECT digit, CAST(p AS DOUBLE) AS p
      FROM (VALUES {_BENFORD_VALUES}) AS t(digit, p)
    )
    SELECT d.digit,
           count(*) AS n_obs,
           round(e.p * nn.n, 4) AS n_expected,
           round((count(*) - e.p * nn.n) * (count(*) - e.p * nn.n)
                 / (e.p * nn.n), 6) AS chi2_contrib
    FROM digits d
    JOIN exp_ e USING (digit)
    CROSS JOIN nn
    GROUP BY d.digit, e.p, nn.n
    """,
    tags=["stats", "quality"],
)
def benford_first_digit(spark, sf_dir):
    """Benford's-law audit of order totals: observed vs expected
    leading-digit frequencies with per-digit chi-square contributions —
    the fraud/synthetic-data smell test.  The leading digit comes from
    the INTEGER cents rendered as a string (both engines format
    integers identically), never from log10 of a double (libm floor
    boundaries); the Benford expectations are shared Python-computed
    literals, so no runtime log appears on either engine."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.filter(F.col("o_totalprice") > 0).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    digits = cents.select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit")
    )
    nn = digits.agg(F.count(F.lit(1)).alias("n"))
    exp_ = local_frame(spark, _BENFORD_ROWS, "digit long, p double")
    e = F.col("p") * F.col("n")
    return (
        digits.join(F.broadcast(exp_), "digit")
        .crossJoin(F.broadcast(nn))
        .groupBy("digit", "p", "n")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .select(
            "digit",
            "n_obs",
            F.round(e, 4).alias("n_expected"),
            F.round((F.col("n_obs") - e) * (F.col("n_obs") - e) / e, 6).alias(
                "chi2_contrib"
            ),
        )
    )


@register(
    "orders_rfm_segments",
    """
    WITH per_cust AS (
      SELECT o_custkey AS cust,
             date_diff('day', DATE '1970-01-01',
                       max(CAST(o_orderdate AS DATE))) AS r_days,
             count(*) AS frequency,
             CAST(floor(round(sum(o_totalprice), 2)) AS BIGINT) AS monetary
      FROM orders GROUP BY 1
    ),
    b AS (
      SELECT quantile_cont(CAST(r_days AS DOUBLE), 0.25) AS r25,
             quantile_cont(CAST(r_days AS DOUBLE), 0.50) AS r50,
             quantile_cont(CAST(r_days AS DOUBLE), 0.75) AS r75,
             quantile_cont(CAST(frequency AS DOUBLE), 0.25) AS f25,
             quantile_cont(CAST(frequency AS DOUBLE), 0.50) AS f50,
             quantile_cont(CAST(frequency AS DOUBLE), 0.75) AS f75,
             quantile_cont(CAST(monetary AS DOUBLE), 0.25) AS m25,
             quantile_cont(CAST(monetary AS DOUBLE), 0.50) AS m50,
             quantile_cont(CAST(monetary AS DOUBLE), 0.75) AS m75
      FROM per_cust
    ),
    scored AS (
      SELECT 1 + CAST(r_days < r75 AS INT) + CAST(r_days < r50 AS INT)
               + CAST(r_days < r25 AS INT) AS r,
             1 + CAST(frequency < f75 AS INT) + CAST(frequency < f50 AS INT)
               + CAST(frequency < f25 AS INT) AS f,
             1 + CAST(monetary < m75 AS INT) + CAST(monetary < m50 AS INT)
               + CAST(monetary < m25 AS INT) AS m
      FROM per_cust CROSS JOIN b
    )
    SELECT r, f, m,
           count(*) AS n_customers
    FROM scored GROUP BY 1, 2, 3
    """,
    tags=["analytics", "segmentation"],
)
def orders_rfm_segments(spark, sf_dir):
    """RFM segmentation without a global sort: per-customer Recency /
    Frequency / Monetary scores from exact quartile BOUNDARIES + value
    bucketing (1 = top quartile), cross-tabulated into segment counts.

    Scale shape: the old form ranked every customer through three
    unpartitioned ``ntile(4)`` windows — three one-reducer total sorts.
    Here the boundaries come from one ``percentile`` aggregate
    (partial-aggregated per partition; state is bounded by DISTINCT
    values, which is why monetary is floored to whole dollars and
    recency to epoch days — both bounded by the domain, not by
    customer count), broadcast back over the per-customer relation,
    and bucketed with plain comparisons.  No single-partition exchange
    anywhere (pinned in tests/test_plans.py).

    Determinism: ``round(sum, 2)`` canonicalizes the monetary double
    before ``floor`` (both engines produce the identical 2-dp double,
    so the floor cannot straddle an integer boundary); boundaries are
    linear-interpolated quantiles of integer-valued doubles — quarter
    fractions, exact in float64 on both engines."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.unix_date(F.max(F.col("o_orderdate").cast("date"))).alias("r_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.floor(F.round(F.sum("o_totalprice"), 2)).cast("long").alias("monetary"),
    )
    bounds = per_cust.agg(
        *[
            F.percentile(F.col(c).cast("double"), F.lit(p)).alias(f"{c[0]}{int(p * 100)}")
            for c in ("r_days", "frequency", "monetary")
            for p in (0.25, 0.50, 0.75)
        ]
    )

    def _score(col: str, lo: str, mid: str, hi: str):
        v = F.col(col)
        return (
            F.lit(1)
            + (v < F.col(hi)).cast("int")
            + (v < F.col(mid)).cast("int")
            + (v < F.col(lo)).cast("int")
        )

    scored = per_cust.crossJoin(F.broadcast(bounds)).select(
        _score("r_days", "r25", "r50", "r75").alias("r"),
        _score("frequency", "f25", "f50", "f75").alias("f"),
        _score("monetary", "m25", "m50", "m75").alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "supplier_hhi_concentration",
    """
    WITH vol AS (
      SELECT p_type, l_suppkey,
             sum(l_extendedprice * (1 - l_discount)) AS v
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT p_type, sum(v) AS tv FROM vol GROUP BY 1)
    SELECT p_type,
           count(*) AS n_suppliers,
           round(sum((v / tv) * (v / tv)), 6) AS hhi
    FROM vol JOIN tot USING (p_type)
    GROUP BY p_type
    """,
    tags=["analytics", "concentration"],
)
def supplier_hhi_concentration(spark, sf_dir):
    """Supplier concentration per part type: the Herfindahl-Hirschman
    index (sum of squared revenue shares — 1/n for perfect competition,
    1.0 for monopoly), the supply-chain-risk audit.  Two grouped
    aggregates reusing the (p_type) partitioning; shares divide two
    unrounded sums computed identically enough that the 6-dp-rounded
    HHI absorbs summation-order ulps."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    vol = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum(rev).alias("v"))
    )
    tot = vol.groupBy("p_type").agg(F.sum("v").alias("tv"))
    share = F.col("v") / F.col("tv")
    return (
        vol.join(tot, "p_type")
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(share * share), 6).alias("hhi"),
        )
    )
