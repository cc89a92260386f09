"""ANN quality bounds: approximate variants must trade scan for recall
on a realistic (data-vector) probe, not just run.

Measured on the synthetic embeddings (weakly clustered — neighbor
cosines are moderate, which is the HARD case for sign-LSH): IVF
nprobe=2/4 gives ~0.7 recall at ~50% scan; multi-probe LSH radius 2
gives ~0.5 recall at ~15% scan.  The bounds below are safely under the
measured values so the tests pin regressions, not noise."""

from pyspark.sql import functions as F

from ffiec_pq_spark.operators.similarity import (
    ann_topk_bruteforce,
    ann_topk_ivf,
    ann_topk_lsh,
    hyperplane_lsh_buckets,
    probe_buckets_multiprobe,
)
from ffiec_pq_spark.session import load_table

DIM = 64


def _data_probe(emb):
    row = emb.filter("vec_id = 0").collect()[0]["embedding"]
    return [float(x) for x in row]


def test_ivf_recall_with_data_probe(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    probe = _data_probe(emb)
    exact = {r["vec_id"] for r in ann_topk_bruteforce(emb, probe, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in ann_topk_ivf(emb, probe, dim=DIM, k=10, n_cells=4, nprobe=2).collect()
    }
    assert len(exact & approx) / 10 >= 0.5


def test_lsh_multiprobe_recall_and_pruning(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    probe = _data_probe(emb)
    exact = {r["vec_id"] for r in ann_topk_bruteforce(emb, probe, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in ann_topk_lsh(
            emb, probe, dim=DIM, k=10, n_planes=8, hamming_radius=2
        ).collect()
    }
    assert len(exact & approx) / 10 >= 0.3, (exact, approx)
    # and it genuinely prunes: candidate set must be a fraction of the data
    buckets = hyperplane_lsh_buckets(emb, DIM, 8)
    cells = probe_buckets_multiprobe(probe, DIM, 8, hamming_radius=2)
    n_cand = buckets.filter(F.col("bucket").isin(cells)).count()
    assert n_cand / emb.count() <= 0.37  # 37/256 buckets at radius 2


def test_multiprobe_strictly_beats_single_bucket(spark, sf_dir):
    """Radius-r candidate sets are supersets of radius-(r-1): recall is
    monotone in the probe radius."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe = _data_probe(emb)
    sets = []
    for r in (0, 1, 2):
        cells = set(probe_buckets_multiprobe(probe, DIM, 8, hamming_radius=r))
        sets.append(cells)
    assert sets[0] < sets[1] < sets[2]


def test_ivf_trained_quantizer_recall(spark, sf_dir):
    """IVF with a k-means-TRAINED coarse quantizer: data-shaped cells
    must hold the fixed-centroid recall bound at the same nprobe, and
    still genuinely prune (candidate set strictly smaller than the
    corpus).  Closes the loop kmeans_fit exists for."""
    from ffiec_pq_spark.operators.kmeans import kmeans_fit
    from ffiec_pq_spark.operators.similarity import ivf_cell, probe_cells

    emb = load_table(spark, sf_dir, "embeddings")
    probe = _data_probe(emb)
    cents = kmeans_fit(emb, k=4, dim=DIM, iters=3)
    exact = {r["vec_id"] for r in ann_topk_bruteforce(emb, probe, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in ann_topk_ivf(
            emb, probe, dim=DIM, k=10, n_cells=4, nprobe=2, centroids=cents
        ).collect()
    }
    assert len(exact & approx) / 10 >= 0.5
    n_cand = (
        emb.withColumn("cell", ivf_cell(F.col("embedding"), DIM, 4, cents))
        .filter(F.col("cell").isin(probe_cells(probe, DIM, 4, 2, cents)))
        .count()
    )
    assert n_cand < emb.count()


def test_knn_job_per_tile_spill_matches_union(spark, sf_dir, tmp_path):
    """Forcing many tiles (tile_size smaller than the probe count and
    more tiles than max_union_tiles) must switch knn_exact_topk to
    job-per-tile spill and return the SAME candidate set as the lazy
    union path — flat plan size, identical rows."""
    from ffiec_pq_spark.operators.similarity import knn_exact_topk
    from ffiec_pq_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(emb.vec_id % 10 == 0).limit(40)
    base = knn_exact_topk(emb, q, k=3, tile_size=4096)
    spilled = knn_exact_topk(
        emb,
        q,
        k=3,
        tile_size=5,  # 40 probes -> 8 tiles > max_union_tiles
        max_union_tiles=2,
        spill_dir=str(tmp_path / "tiles"),
    )
    key = lambda r: (r["q_id"], r["t_id"], r["s"])  # noqa: E731
    assert sorted(map(key, base.collect())) == sorted(
        map(key, spilled.collect())
    )


def test_knn_spill_raises_on_nonlocal_master_without_spill_dir(
    spark, sf_dir, monkeypatch
):
    """Cluster-safety contract: when the spill path is reached with
    spill_dir=None on a non-local master, the builder must raise — a
    driver-local tempdir would silently lose executor task commits
    (missing candidates = silent wrong answer)."""
    import pytest

    from ffiec_pq_spark.operators.similarity import knn_exact_topk
    from ffiec_pq_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(emb.vec_id % 10 == 0).limit(40)
    monkeypatch.setattr(spark.sparkContext, "master", "spark://fake:7077")
    with pytest.raises(ValueError, match="spill_dir"):
        knn_exact_topk(emb, q, k=3, tile_size=5, max_union_tiles=2)


def test_knn_spill_tempdir_registered_for_cleanup(
    spark, sf_dir, monkeypatch
):
    """On a local master the auto-created spill tempdir must be added
    to the module-level pending set behind the SINGLE atexit handler
    (repeated calls must not stack one handler per call), and
    ``knn_discard_spill`` must free it early."""
    import os

    from ffiec_pq_spark.operators import similarity
    from ffiec_pq_spark.session import load_table

    before = set(similarity._PENDING_SPILL_DIRS)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(emb.vec_id % 10 == 0).limit(40)
    out = similarity.knn_exact_topk(
        emb, q, k=3, tile_size=5, max_union_tiles=2
    )
    assert out.count() > 0
    new_dirs = similarity._PENDING_SPILL_DIRS - before
    assert new_dirs, "spill tempdir was not registered for atexit cleanup"
    assert similarity._SPILL_ATEXIT_REGISTERED
    (spill_dir,) = new_dirs
    assert os.path.isdir(spill_dir)
    # early free (this test is done reading the result)
    similarity.knn_discard_spill(spill_dir)
    assert spill_dir not in similarity._PENDING_SPILL_DIRS
    assert not os.path.isdir(spill_dir)


def test_ivf_deletes_exclude_and_backfill(spark, sf_dir):
    """Tombstoned ids must never surface, the top-k must backfill from
    the surviving shortlist (still k rows), and the anti-join must be
    broadcast (the plan the tombstone pattern is FOR)."""
    from ffiec_pq_spark.catalog import queries
    from ffiec_pq_spark.plans.audit import physical_plan

    df = queries()["ann_ivf_topk_deletes"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 10
    assert all(r["vec_id"] % 7 != 3 for r in rows)
    base = {r["vec_id"] for r in queries()["ann_ivf_topk"](spark, sf_dir).collect()}
    deleted_in_base = {v for v in base if v % 7 == 3}
    got = {r["vec_id"] for r in rows}
    # every surviving base hit is still there; deleted ones are gone
    assert (base - deleted_in_base) <= got
    assert got.isdisjoint(deleted_in_base)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
