"""Empty-input robustness: every registry query must run (possibly to
zero rows) against schema-correct EMPTY tables — the empty-partition /
empty-snapshot edge a 100 TB pipeline hits routinely (a new date
partition, a filtered-out shard, a cold-start corpus).

Trainers that genuinely cannot proceed without data (k-means seeding)
must fail fast with a clear diagnostic, never an analyzer artifact.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ffiec_pq_spark.catalog import queries

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# trainers that fail fast (with a clear error) on empty input by design
EXPECT_RAISE = {
    "kmeans_cell_sizes": ValueError,
    # seeds the same k-means trainer before its cell-bounded pairing
    "semantic_dedup_cells": ValueError,
    # BPE training cannot proceed without a vocabulary (same trainer
    # fail-fast contract as k-means)
    "bpe_train_merges": ValueError,
    "bpe_apply_stats": ValueError,
    # PQ codebook training seeds from the k lowest-id vectors — same
    # trainer fail-fast contract as k-means (operators/pq.py::pq_init)
    "embedding_pq_codebook": ValueError,
    "ann_pq_adc_topk": ValueError,
    "ann_pq_recall_at_k": ValueError,
    "ann_pq_recall_panel": ValueError,
    # IVF-PQ seeds its coarse quantizer from the k lowest-id vectors
    "ann_ivfpq_residual_topk": ValueError,
    # k-center seeds from the lowest-id vector
    "embedding_kcenter_coreset": ValueError,
    # round-10 PQ family: all seed codebooks via pq_init (k lowest-id
    # vectors) — same trainer fail-fast contract
    "embedding_pq_codebook_k64": ValueError,
    "embedding_pq_codebook_k256": ValueError,
    "dedup_pq_semantic_buckets": ValueError,
    "stream_pq_encode": ValueError,
    # frozen coarse quantizer seeds from the corpus's k lowest ids
    "ann_ivf_incremental_newvecs": ValueError,
    # the nprobe sweep builds the IVF-PQ index (coarse seed) first
    "ann_ivfpq_nprobe_recall_curve": ValueError,
    # the compression sweep fits a codebook per arm (pq_init seed)
    "ann_pq_compression_recall_curve": ValueError,
    # rides the k-means trainer (same fail-fast as kmeans_cell_sizes)
    "embedding_knn_outlier_scores": ValueError,
}


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory, sf_dir):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(os.path.join(sf_dir, f"{t}.parquet"))
        empty = pa.table({f.name: pa.array([], type=f.type) for f in schema})
        pq.write_table(empty, str(out / f"{t}.parquet"))
    return str(out)


def test_all_queries_survive_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, fn in queries().items():
        expected = EXPECT_RAISE.get(name)
        try:
            fn(spark, empty_sf_dir).limit(5).collect()
            if expected is not None:
                failures.append(f"{name}: expected {expected.__name__}, ran fine")
        except Exception as e:  # noqa: BLE001 - classifying everything
            if expected is None or not isinstance(e, expected):
                failures.append(f"{name}: {type(e).__name__}: {str(e)[:140]}")
    assert not failures, "\n".join(failures)
