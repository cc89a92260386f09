"""Round-12 second wave: Kneser-Ney duplicate-collapse invariance and
the streaming BM25 fold's batch-equivalence / plan contracts.

(The strict cross-engine value certification for all three queries is
the driver gate — scripts/driver_check.py; these tests pin the
operator-level invariants the oracle can't see.)"""

import pyspark.sql.functions as F

from ffiec_pq_spark.catalog import queries
from ffiec_pq_spark.plans.audit import physical_plan


def test_kneser_ney_duplicate_collapse(spark, tmp_path):
    """A d-way duplicated corpus must score every copy identically to
    its representative, and the model must equal the naive estimation
    (weighted rep counts == naive counts; continuation counts are
    duplication-invariant)."""
    base = [
        (1, "the cat sat on the mat", "en", "web", 22),
        (2, "the dog sat on the log", "en", "web", 22),
        (3, "a cat and a dog", "en", "book", 15),
    ]
    rows = list(base)
    # 3 extra copies of doc 1's text under new ids
    for k, did in enumerate((10, 11, 12)):
        rows.append((did, base[0][1], "en", "web", 22))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        src = f"/root/testdata/sf0.001/{t}.parquet"
        spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(
            str(tmp_path / f"{t}.parquet")
        )
    out = {
        r["doc_id"]: (r["n_bigrams"], r["avg_kn_logprob"])
        for r in queries()["doc_kneser_ney_bigram"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {1, 2, 3, 10, 11, 12}
    assert out[10] == out[11] == out[12] == out[1]
    # KN probabilities are a proper distribution-ish score: more
    # repeated bigrams ("the cat sat ..." x4 copies) -> higher prob
    assert out[1][1] > out[3][1]


def test_kneser_ney_plan_no_cartesian(spark, sf_dir):
    df = queries()["doc_kneser_ney_bigram"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # the type-total scalar must attach as a broadcast, never shuffle
    assert "BroadcastExchange" in plan


def test_stream_bm25_fold_equals_batch(spark, sf_dir):
    """Folding the index from micro-batches must reproduce the batch
    query's scores row-for-row (same oracle, but assert engine-side
    too so a fold bug can't hide behind a flaky oracle run)."""
    batch = {
        (r["q_id"], r["rank"]): (r["doc_id"], r["score_micro"])
        for r in queries()["docs_bm25_topk"](spark, sf_dir).collect()
    }
    streamed = {
        (r["q_id"], r["rank"]): (r["doc_id"], r["score_micro"])
        for r in queries()["stream_bm25_index_fold"](
            spark, sf_dir
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_stream_bm25_fold_arrival_order_invariant(spark, sf_dir):
    """The fold is key-commutative (appends + keyed sums), so a
    permuted arrival order must drain to the identical serve — the
    claim that distinguishes this fold from the order-pinned SCD2."""
    from ffiec_pq_spark.queries.round12b import stream_bm25_index_fold

    fwd = {
        (r["q_id"], r["rank"]): (r["doc_id"], r["score_micro"])
        for r in stream_bm25_index_fold(
            spark, sf_dir, chunk_order=[0, 1, 2, 3]
        ).collect()
    }
    rev = {
        (r["q_id"], r["rank"]): (r["doc_id"], r["score_micro"])
        for r in stream_bm25_index_fold(
            spark, sf_dir, chunk_order=[2, 0, 3, 1]
        ).collect()
    }
    assert fwd == rev and len(fwd) > 0


def test_stream_bm25_serve_plan(spark, sf_dir):
    """The serve step scores against resident state: its plan is the
    drained localCheckpoint (no cartesian, no re-tokenization of the
    corpus — the scan reads the postings state, not documents.text)."""
    df = queries()["stream_bm25_index_fold"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
