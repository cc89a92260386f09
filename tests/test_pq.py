"""Product-quantization operator tests (operators/pq.py): unit-level
semantics on toy vectors (the oracle queries certify the full chain at
sf0.01 — these pin the operator contract in isolation)."""

from pyspark.sql import functions as F

from ffiec_pq_spark.operators.pq import (
    pq_adc_topk,
    pq_codes,
    pq_fit,
    pq_init,
    pq_subvectors,
)

# Two obvious clusters per subspace: ids 0-3 near (0,0 | 0,0), ids 4-7
# near (10,10 | 10,10) — Lloyd must separate them in every subspace.
_TOY = [
    (0, [0.0, 0.1, 0.0, 0.1]),
    (1, [0.1, 0.0, 0.1, 0.0]),
    (2, [0.2, 0.1, 0.2, 0.1]),
    (3, [0.0, 0.2, 0.0, 0.2]),
    (4, [10.0, 10.1, 10.0, 10.1]),
    (5, [10.1, 10.0, 10.1, 10.0]),
    (6, [10.2, 10.1, 10.2, 10.1]),
    (7, [10.0, 10.2, 10.0, 10.2]),
]


def _toy_df(spark):
    return spark.createDataFrame(_TOY, ["vec_id", "embedding"])


def test_pq_subvectors_shape(spark):
    sv = pq_subvectors(_toy_df(spark), m=2, sub_dim=2)
    rows = sv.collect()
    assert len(rows) == len(_TOY) * 2
    r = next(x for x in rows if x["id"] == 0 and x["sub"] == 1)
    assert r["v"] == [0.0, 0.1]


def test_pq_init_is_lowest_ids(spark):
    books = pq_init(_toy_df(spark), m=2, sub_dim=2, k=2)
    # subspace 0, code 0 = vec 0's first half; code 1 = vec 1's
    assert books[0][0] == [0.0, 0.1]
    assert books[0][1] == [0.1, 0.0]
    assert books[1][0] == [0.0, 0.1]


def test_pq_fit_separates_clusters(spark):
    df = _toy_df(spark)
    books = pq_fit(df, m=2, sub_dim=2, k=2, iters=3)
    codes = pq_codes(df, books).collect()
    # within each subspace, ids 0-3 share one code and 4-7 the other
    for sub in (0, 1):
        lo = {r["cell"] for r in codes if r["sub"] == sub and r["id"] < 4}
        hi = {r["cell"] for r in codes if r["sub"] == sub and r["id"] >= 4}
        assert len(lo) == 1 and len(hi) == 1 and lo != hi
    # the far cluster's centroid must have moved to ~10 (not stayed at
    # the lowest-id init, which was all in the low cluster)
    far = [r for r in codes if r["id"] >= 4]
    assert all(r["d"] < 1.0 for r in far), far


def test_pq_adc_probe_ranks_own_cluster_first(spark):
    df = _toy_df(spark)
    books = pq_fit(df, m=2, sub_dim=2, k=2, iters=3)
    codes = pq_codes(df, books)
    top = pq_adc_topk(codes, books, [10.0, 10.1, 10.0, 10.1], top_k=4).collect()
    assert {r["id"] for r in top} == {4, 5, 6, 7}
    assert all(r["adc_dist"] < 1.0 for r in top)


def test_pq_codes_are_pure_projection(spark):
    """Encoding must add NO exchange and NO join over the scan — the
    codebook rides the plan as a literal."""
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = _toy_df(spark)
    books = pq_fit(df, m=2, sub_dim=2, k=2, iters=1)
    codes = pq_codes(df, books)
    plan = physical_plan(codes)
    assert "Join" not in plan
    assert count_exchanges(codes) == 0, plan


def test_pq_empty_input_raises(spark):
    import pytest

    empty = _toy_df(spark).where(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        pq_init(empty, m=2, sub_dim=2, k=2)


def test_ivfpq_residuals_and_probed_cells(spark):
    """Residuals are round(·,9)(x - own-cell centroid); probed cells
    are the nprobe nearest to the probe with the lowest-cell tie-break."""
    from ffiec_pq_spark.operators.kmeans import kmeans_fit
    from ffiec_pq_spark.operators.pq import ivfpq_probed_cells, ivfpq_residuals

    df = _toy_df(spark)
    coarse = kmeans_fit(df, k=2, dim=4, iters=2)
    resid = ivfpq_residuals(df, coarse).collect()
    assert len(resid) == len(_TOY)
    # every residual is small once the centroid matches the cluster
    for r in resid:
        assert all(abs(x) < 1.0 for x in r["rv"]), r
    probed = ivfpq_probed_cells(spark, coarse, [10.0, 10.1, 10.0, 10.1], 1)
    hi_cell = next(r["ccell"] for r in resid if r["id"] == 4)
    assert probed == [hi_cell]


def test_ivfpq_adc_scans_probed_cells_only(spark):
    """With nprobe=1 aimed at the far cluster, the near cluster's ids
    must not appear — the cell filter prunes them before scoring."""
    from ffiec_pq_spark.operators.kmeans import kmeans_fit
    from ffiec_pq_spark.operators.pq import (
        ivfpq_adc_topk,
        ivfpq_codes,
        ivfpq_probed_cells,
        ivfpq_residuals,
        pq_fit,
    )

    df = _toy_df(spark)
    coarse = kmeans_fit(df, k=2, dim=4, iters=2)
    resid = ivfpq_residuals(df, coarse)
    books = pq_fit(resid, vec_col="rv", id_col="id", m=2, sub_dim=2, k=2, iters=1)
    codes = ivfpq_codes(resid, books)
    probe = [10.0, 10.1, 10.0, 10.1]
    probed = ivfpq_probed_cells(spark, coarse, probe, 1)
    top = ivfpq_adc_topk(codes, coarse, books, probe, probed, top_k=8).collect()
    assert {r["id"] for r in top} == {4, 5, 6, 7}


# --- round-10: production-parameter (pandas-UDF) assignment path ---


def test_np_round9_matches_spark_round(spark):
    """_np_round9 must reproduce Spark's round(double, 9) (BigDecimal
    HALF_UP on the shortest decimal repr) exactly, including values
    engineered onto the .5 boundary at the 9th decimal where binary
    half-up and decimal half-up diverge."""
    from ffiec_pq_spark.operators.pq import _np_round9

    vals = [
        0.0,
        1.2345678935,          # boundary: ...35 at 10th dp
        0.0000000005,          # exactly .5e-9 in decimal repr
        2.5e-9,
        1.9999999995,
        0.1 + 0.2,             # classic repr-vs-binary value
        123.4567890125,
        7.00000000049999,      # just under the boundary
        7.00000000050001,      # just over
        64.0,
        3.141592653589793,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    expected = [
        r["r"] for r in df.select(F.round("x", 9).alias("r")).collect()
    ]
    got = list(_np_round9(vals))
    assert got == expected, list(zip(vals, got, expected))


def test_pandas_assign_matches_expr(spark, sf_dir):
    """The Arrow-batched numpy scorer and the literal expression must
    produce identical (cell, d) assignments — same round(·, 9)
    distances, same ties→lowest-cell rule — and therefore identical
    fitted codebooks through the Lloyd loop."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = pq_fit(emb, m=4, sub_dim=16, k=8, iters=1, assign="expr")
    a = pq_codes(emb, books, assign="expr").orderBy("id", "sub").collect()
    b = pq_codes(emb, books, assign="pandas").orderBy("id", "sub").collect()
    assert a == b
    assert pq_fit(
        emb, m=4, sub_dim=16, k=8, iters=1, assign="pandas"
    ) == books


def test_assign_auto_switches_on_codebook_size(spark):
    """auto = expr at k·m·sub_dim ≤ _EXPR_MAX_FLOATS, pandas above —
    and the pandas plan is ONE ArrowEvalPython map stage (the struct is
    projected twice but evaluated once), no row-at-a-time Python, no
    exchange added over the scan."""
    from ffiec_pq_spark.operators.pq import _EXPR_MAX_FLOATS
    from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan

    df = _toy_df(spark)
    books_small = pq_fit(df, m=2, sub_dim=2, k=2, iters=1)
    plan_small = physical_plan(pq_codes(df, books_small, assign="auto"))
    assert "ArrowEvalPython" not in plan_small  # 8 floats -> expr path

    big = pq_codes(df, books_small, assign="pandas")
    plan_big = physical_plan(big)
    assert plan_big.count("ArrowEvalPython") == 1, plan_big
    assert "BatchEvalPython" not in plan_big
    assert "Exchange" not in plan_big, plan_big
    assert count_exchanges(big) == 0
    assert 2 * 2 * 2 <= _EXPR_MAX_FLOATS  # the toy stays on expr


def test_ivfpq_codes_dispatches_assign_path(spark, sf_dir):
    """ivfpq_codes must ride the same size-based assignment switch as
    pq_codes: identical codes on both paths at a forced small k, and
    at k=64 the auto path is the single-ArrowEvalPython pandas stage
    (the full production IVF-PQ composition stays viable past the
    expression path's compile wall)."""
    from ffiec_pq_spark.operators.kmeans import kmeans_fit
    from ffiec_pq_spark.operators.pq import ivfpq_codes, ivfpq_residuals
    from ffiec_pq_spark.plans.audit import physical_plan

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    coarse = kmeans_fit(emb, k=2, dim=64, iters=1)
    resid = ivfpq_residuals(emb, coarse)
    books8 = pq_fit(
        resid, vec_col="rv", id_col="id", m=4, sub_dim=16, k=8, iters=1
    )
    a = (
        ivfpq_codes(resid, books8, assign="expr")
        .orderBy("id", "sub")
        .collect()
    )
    b = (
        ivfpq_codes(resid, books8, assign="pandas")
        .orderBy("id", "sub")
        .collect()
    )
    assert a == b

    books64 = pq_fit(
        resid, vec_col="rv", id_col="id", m=4, sub_dim=16, k=64, iters=1
    )
    codes64 = ivfpq_codes(resid, books64)  # auto -> pandas at 4096 floats
    plan = physical_plan(codes64)
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan, plan
    assert codes64.count() == emb.count() * 4
