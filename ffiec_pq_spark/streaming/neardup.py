"""Shared runner for the streaming MinHash-LSH near-dup queries
(``stream_minhash_neardup`` and its compaction-maintenance variant
``stream_neardup_compacted`` — see their registry docstrings in
queries/round8.py / round9.py for the full contracts).

The fold is a pure associative SET UNION of compact band-signature
rows, so the drained state is batch-order-invariant AND invariant under
mid-stream compaction — both queries certify against the same batch
LSH oracle.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_neardup_stream(
    spark: SparkSession,
    sf_dir: str,
    compact_every: int | None = None,
    workdir_prefix: str = "stream_neardup_",
) -> DataFrame:
    """Stage ``documents`` as four files, fold each micro-batch's LSH
    band rows into the parquet band state (signatures computed ONCE per
    arriving doc), optionally COMPACT the state (pin + rewrite to a
    sibling dir + atomic rename swap — crash-safe at every point)
    after every ``compact_every``-th trigger, then drain
    (doc_id, dup_of = smallest doc id sharing >= 1 band signature).

    Returns an eagerly localCheckpoint'ed result so the staging/state
    dirs can be removed before returning (at scale you would keep the
    state dir and return the lazy plan)."""
    from ffiec_pq_spark.operators.dedup import lsh_bands, minhash_signatures
    from ffiec_pq_spark.queries.dedup import _K, _N_BANDS, _N_PERM, _ROWS_PER_BAND
    from ffiec_pq_spark.session import ensure_session_confs, load_table

    ensure_session_confs(spark)
    docs = load_table(spark, sf_dir, "documents")
    workdir = tempfile.mkdtemp(prefix=workdir_prefix)
    try:
        src = os.path.join(workdir, "src")
        (
            docs.repartition(4, F.col("doc_id") % 4)
            .write.mode("overwrite")
            .parquet(src)
        )
        state_dir = os.path.join(workdir, "band_state")
        n_batches = {"n": 0}

        def fold_batch(batch_df, epoch_id):
            # incremental work per batch: signatures for NEW docs only;
            # the append IS the state fold (set union, associative)
            sig = minhash_signatures(
                batch_df, id_col="doc_id", k=_K, n_perm=_N_PERM
            )
            bands = lsh_bands(sig, _N_BANDS, _ROWS_PER_BAND)
            bands.write.mode("append").parquet(state_dir)
            n_batches["n"] += 1
            if compact_every and n_batches["n"] % compact_every == 0:
                # COMPACT: foreachBatch calls are strictly sequential,
                # so pin the current state OFF its files (eager
                # localCheckpoint), write the compacted copy to a
                # SIBLING dir, then swap it in with two renames.  The
                # old delete-then-rewrite order had a crash window
                # between rmtree and the rewrite that permanently lost
                # state for micro-batches the stream checkpoint already
                # marked committed (non-replayable); after the swap the
                # old files are deleted only once the rewrite is fully
                # committed, so a crash at any point leaves either the
                # old state or the new state intact on disk.
                pinned = spark.read.parquet(state_dir).localCheckpoint(
                    eager=True
                )
                compact_dir = state_dir + ".compact"
                old_dir = state_dir + ".old"
                shutil.rmtree(compact_dir, ignore_errors=True)
                shutil.rmtree(old_dir, ignore_errors=True)
                pinned.coalesce(1).write.mode("overwrite").parquet(
                    compact_dir
                )
                os.rename(state_dir, old_dir)
                os.rename(compact_dir, state_dir)  # atomic swap-in
                shutil.rmtree(old_dir)

        q = (
            spark.readStream.format("parquet")
            .schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .load(src)
            .writeStream.foreachBatch(fold_batch)
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        state = spark.read.parquet(state_dir)
        first_seen = state.groupBy("band", "bkey").agg(
            F.min("id").alias("first_id")
        )
        out = (
            state.join(first_seen, ["band", "bkey"])
            .filter(F.col("first_id") < F.col("id"))
            .groupBy("id")
            .agg(F.min("first_id").alias("dup_of"))
            .select(F.col("id").alias("doc_id"), "dup_of")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
