"""Deterministic k-means: reproducibility and Lloyd-step invariants."""

from pyspark.sql import functions as F

from ffiec_pq_spark.operators.kmeans import (
    assign_cells,
    kmeans_assignments,
    kmeans_fit,
)
from ffiec_pq_spark.session import load_table


def _wcss(spark, df, cents):
    """Within-cluster sum of squared distances under an assignment."""
    from ffiec_pq_spark.operators.kmeans import _sq_dist

    entries = [_sq_dist(F.col("embedding"), c) for c in cents]
    best = F.array_min(F.array(*entries))
    return df.select(F.sum(best).alias("s")).collect()[0]["s"]


def test_kmeans_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    c1 = kmeans_fit(emb, k=3, dim=64, iters=3)
    c2 = kmeans_fit(emb, k=3, dim=64, iters=3)
    assert c1 == c2, "same input + fixed init must reproduce exactly"


def test_kmeans_improves_wcss(spark, sf_dir):
    """Each Lloyd iteration must not increase the objective."""
    from ffiec_pq_spark.operators.kmeans import kmeans_init

    emb = load_table(spark, sf_dir, "embeddings")
    init = kmeans_init(emb, "embedding", "vec_id", 3)
    w0 = _wcss(spark, emb, init)
    w3 = _wcss(spark, emb, kmeans_fit(emb, k=3, dim=64, iters=3))
    assert w3 <= w0 + 1e-9, f"objective rose: {w0} -> {w3}"


def test_kmeans_assignments_cover(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    asg = kmeans_assignments(emb, k=3, dim=64, iters=2)
    assert asg.count() == emb.count()
    cells = {r["cell"] for r in asg.select("cell").distinct().collect()}
    assert cells <= {0, 1, 2} and len(cells) >= 2
