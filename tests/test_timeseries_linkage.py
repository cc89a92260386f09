"""Targeted properties for the round-4 continuation operators: the
oracle gate pins them on the driver tables; these pin the semantics on
adversarial synthetic inputs and the partitioning invariances."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ffiec_pq_spark.operators.linkage import (
    blocked_levenshtein_pairs,
    sorted_neighborhood_pairs,
)
from ffiec_pq_spark.operators.sampling import weighted_priority_topk
from ffiec_pq_spark.operators.timeseries import gap_fill, range_join_binned


def test_range_join_equals_naive_between(spark):
    """Bin decomposition == naive BETWEEN join on ranges that straddle,
    align with, and nest inside bin boundaries (incl. a range narrower
    than one bin and values exactly ON lo/hi edges)."""
    facts = spark.createDataFrame(
        [(i, v) for i, v in enumerate(
            [0.0, 9.999, 10.0, 24.9, 25.0, 25.1, 49.9, 50.0, 77.7, 99.9,
             100.0, 101.0, 124.9, 125.0, 200.0, 349.0, 350.0, 499.0]
        )],
        ["fid", "value"],
    )
    ranges = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 50.0), ("c", 50.0, 100.0),
         ("nest", 26.0, 27.0), ("wide", 0.0, 500.0), ("edge", 25.0, 25.1)],
        ["tier", "lo", "hi"],
    )
    got = sorted(
        (r["fid"], r["tier"])
        for r in range_join_binned(facts, "value", ranges, 25.0).collect()
    )
    naive = sorted(
        (r["fid"], r["tier"])
        for r in facts.join(
            ranges,
            (facts.value >= ranges.lo) & (facts.value < ranges.hi),
        ).collect()
    )
    assert got == naive and len(got) > 0


def test_gap_fill_calendar_and_ffill(spark):
    """Gaps materialize with the LAST observed value carried forward;
    calendar spans exactly first..last bucket per key."""
    rows = [
        (1, "2024-01-01 05:00:00", 10.0),
        (1, "2024-01-04 07:00:00", 5.0),   # 2-day gap
        (2, "2024-01-02 00:00:00", 1.0),   # single-day key
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), F.col("v")
    )
    out = {
        (r["k"], str(r["bucket_ts"])[:10]): (
            r["observed_value"], r["filled_value"], r["is_observed"]
        )
        for r in gap_fill(df, "k", "ts", "v", bucket="day").collect()
    }
    assert out[(1, "2024-01-01")] == (10.0, 10.0, True)
    assert out[(1, "2024-01-02")] == (None, 10.0, False)
    assert out[(1, "2024-01-03")] == (None, 10.0, False)
    assert out[(1, "2024-01-04")] == (5.0, 5.0, True)
    assert out[(2, "2024-01-02")] == (1.0, 1.0, True)
    assert len(out) == 5  # no buckets beyond each key's span


def test_blocked_linkage_guard_trips(spark):
    """A block larger than max_block_rows must fail fast, not silently
    run the quadratic pairing."""
    df = spark.createDataFrame(
        [(i, "blk", f"text{i}") for i in range(50)], ["id", "b", "t"]
    )
    pairs = blocked_levenshtein_pairs(
        df, "id", "t", ["b"], max_dist=2, max_block_rows=10
    )
    with pytest.raises(Exception, match="block exceeds"):
        pairs.collect()


def test_sorted_neighborhood_matches_global_order(spark):
    """Distributed rank (prefix windows + offsets) must equal the naive
    global row_number pairing — exercised across many prefixes."""
    import random

    rnd = random.Random(7)
    rows = [
        (i, "".join(rnd.choice("abcdef") for _ in range(6))) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["id", "s"]).repartition(7)
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in sorted_neighborhood_pairs(
            df, "id", "s", "s", window=3, max_dist=4
        ).collect()
    )
    ordered = sorted(rows, key=lambda t: (t[1], t[0]))

    def lev(a, b):
        import functools

        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(
                d(i - 1, j) + 1,
                d(i, j - 1) + 1,
                d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )

        return d(len(a), len(b))

    naive = []
    for i, (ida, sa) in enumerate(ordered):
        for j in range(i + 1, min(i + 4, len(ordered))):
            idb, sb = ordered[j]
            dd = lev(sa, sb)
            if dd <= 4:
                naive.append((ida, idb, dd))
    assert got == sorted(naive) and len(got) > 0


def test_weighted_topk_partition_invariant(spark):
    """The weighted sample is a function of content, not partitioning."""
    rows = [(i, (i * 37) % 90 + 10) for i in range(500)]
    df1 = spark.createDataFrame(rows, ["id", "w"])
    df2 = df1.repartition(13)
    pick = lambda d: sorted(
        r["id"] for r in weighted_priority_topk(d, "id", "w", 50).collect()
    )
    assert pick(df1) == pick(df2) and len(pick(df1)) == 50


def test_pca_scores_unit_direction_and_spread(spark):
    """PCA sanity: the fitted direction is unit-norm, and projecting on
    it spreads the data at least as widely as a coordinate axis."""
    import random

    from ffiec_pq_spark.operators.pca import (
        covariance_matrix,
        embedding_means,
        power_iteration_int,
    )

    rnd = random.Random(3)
    # anisotropic cloud: dim 0 has 10x the spread
    rows = [
        (i, [rnd.gauss(0, 10.0)] + [rnd.gauss(0, 1.0) for _ in range(7)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    means = embedding_means(df, "embedding", 8)
    cov = covariance_matrix(df, "embedding", 8, means, 300)
    v = power_iteration_int(cov, iters=5)
    assert abs(sum(c * c for c in v) - 1.0) < 1e-9
    # the dominant axis must dominate the loading
    assert abs(v[0]) > 0.9
