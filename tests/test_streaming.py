"""Structured Streaming smoke: watermarked windowed agg over event
files must equal the batch tumbling rollup on the same data (for
windows the watermark has finalized)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from ffiec_pq_spark.operators.windows import tumbling_rollup
from ffiec_pq_spark.session import load_table
from ffiec_pq_spark.streaming.events import (
    read_event_stream,
    run_to_memory,
    windowed_counts,
)


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    """Split events into several parquet files (micro-batches)."""
    d = str(tmp_path_factory.mktemp("event_stream"))
    ev = load_table(spark, sf_dir, "events")
    # micro-batches must arrive in event-time order for the watermark
    # test to be meaningful: bucket by contiguous day ranges
    ev = ev.withColumn(
        "bucket", F.least(F.lit(3), ((F.dayofmonth("ts") - 1) / 8).cast("int"))
    )
    for b in range(4):
        ev.filter(F.col("bucket") == b).drop("bucket").coalesce(1).write.parquet(
            os.path.join(d, f"batch_{b}")
        )
    # flatten: file source watches one dir
    flat = os.path.join(d, "flat")
    os.makedirs(flat)
    i = 0
    for b in range(4):
        bdir = os.path.join(d, f"batch_{b}")
        for f in sorted(os.listdir(bdir)):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(bdir, f), os.path.join(flat, f"{i:03d}.parquet"))
                i += 1
    return flat


def test_stream_matches_batch(spark, sf_dir, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
    run_to_memory(agg, "stream_out")
    got = spark.sql(
        "SELECT window_start, event_type, n_events FROM stream_out"
    )

    batch = tumbling_rollup(
        load_table(spark, sf_dir, "events"),
        "ts",
        ["event_type"],
        {"n_events": "count(1)"},
        "1 hour",
    )
    # append mode emits only watermark-finalized windows: every emitted
    # window must exactly match the batch result for that window
    got_rows = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()
    }
    assert got_rows, "stream emitted no finalized windows"
    batch_rows = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()
    }
    for k, v in got_rows.items():
        assert batch_rows.get(k) == v, f"window {k}: stream={v} batch={batch_rows.get(k)}"


def test_applyinpandaswithstate_sessionizer(spark, sf_dir, stream_dir):
    """Custom per-key state machine (applyInPandasWithState): every
    emitted session must exactly match the batch sessionizer's output
    for that (user, session_start)."""
    from ffiec_pq_spark.operators.windows import sessionize
    from ffiec_pq_spark.streaming.stateful import sessionize_stream

    stream = read_event_stream(spark, stream_dir)
    sess = sessionize_stream(stream, gap_minutes=30, watermark="2 hours")
    run_to_memory(sess, "state_sess_out")
    got = spark.sql("SELECT * FROM state_sess_out").collect()
    assert got, "stateful sessionizer emitted nothing"

    batch = sessionize(
        load_table(spark, sf_dir, "events"), "user_id", "ts", gap_minutes=30
    ).collect()
    batch_by_key = {(r["user_id"], r["session_start"]): r for r in batch}
    for r in got:
        b = batch_by_key.get((r["user_id"], r["session_start"]))
        assert b is not None, f"no batch session at {r['user_id']}, {r['session_start']}"
        assert b["session_end"] == r["session_end"]
        assert b["n_events"] == r["n_events"]


def test_stream_stream_interval_join(spark, sf_dir, stream_dir):
    """Watermarked stream-stream interval join: every emitted pair must
    appear in the batch join of the same data (append mode may hold
    back tail rows the watermark hasn't released; nothing may be wrong
    or duplicated)."""
    from ffiec_pq_spark.streaming.joins import interval_join

    def sides(df):
        purchases = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id"), F.col("ts").alias("l_ts"),
            F.col("event_id").alias("l_id"),
        )
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("user_id"), F.col("ts").alias("r_ts"),
            F.col("event_id").alias("r_id"),
        )
        return purchases, clicks

    sl, sr = sides(read_event_stream(spark, stream_dir))
    joined = interval_join(sl, sr, "user_id", within="60 minutes")
    run_to_memory(joined, "ssj_out")
    got = {
        (r["l_id"], r["r_id"])
        for r in spark.sql("SELECT l_id, r_id FROM ssj_out").collect()
    }
    assert got, "stream-stream join emitted nothing"

    bl, br = sides(load_table(spark, sf_dir, "events"))
    batch = {
        (r["l_id"], r["r_id"])
        for r in interval_join(
            bl, br, "user_id", within="60 minutes", streaming=False
        ).collect()
    }
    assert got <= batch, f"stream emitted pairs not in batch: {got - batch}"
    # duplicates check: memory table row count == distinct pair count
    n_rows = spark.sql("SELECT count(*) AS n FROM ssj_out").collect()[0]["n"]
    assert n_rows == len(got)


def test_checkpoint_resume_exactly_once(spark, sf_dir, stream_dir, tmp_path):
    """Stop a checkpointed stream mid-input, deliver more files, restart
    from the checkpoint: the final state must equal the batch answer —
    no lost and no double-counted micro-batches."""
    import os
    import shutil

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    files = sorted(
        f for f in os.listdir(stream_dir) if f.endswith(".parquet")
    )
    assert len(files) >= 2
    half = max(1, len(files) // 2)

    def run_once():
        stream = read_event_stream(spark, src)
        agg = (
            stream.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # memory sink + checkpointed source offsets + checkpointed agg
        # state: the restart must resume, not re-read, the first half
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("ckpt_out")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    for f in files[:half]:
        shutil.copy(os.path.join(stream_dir, f), os.path.join(src, f))
    run_once()
    mid = {r["event_type"]: r["n"] for r in spark.sql("SELECT * FROM ckpt_out").collect()}
    assert mid, "first run emitted nothing"

    for f in files[half:]:
        shutil.copy(os.path.join(stream_dir, f), os.path.join(src, f))
    run_once()
    got = {r["event_type"]: r["n"] for r in spark.sql("SELECT * FROM ckpt_out").collect()}

    batch = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == batch, f"resume diverged: {got} != {batch}"


def test_stateful_session_stream(spark, stream_dir):
    """session_window streaming aggregation (stateful custom-ish op)."""
    stream = read_event_stream(spark, stream_dir)
    sess = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    run_to_memory(sess, "sess_out")
    out = spark.sql("SELECT * FROM sess_out")
    assert out.count() > 0
    assert {"w", "user_id", "n_events"} <= set(out.columns)


def test_transform_with_state_running_totals(spark, sf_dir):
    """Spark 4 transformWithStateInPandas parity: the drained running
    totals equal the batch GROUP BY.  Skipped where the protobuf
    state-client dependency is absent (this container); the gate and
    error contract are still asserted."""
    import pytest

    from ffiec_pq_spark.session import load_table
    from ffiec_pq_spark.streaming.transform_with_state import (
        running_totals_tws,
        tws_available,
    )

    if not tws_available():
        with pytest.raises(RuntimeError, match="protobuf"):
            running_totals_tws(spark, sf_dir)
        pytest.skip("protobuf absent: transformWithState runtime unavailable")
    from pyspark.sql import functions as F

    got = sorted(
        (r["user_id"], r["n_events"], r["total_value"])
        for r in running_totals_tws(spark, sf_dir).collect()
    )
    ev = load_table(spark, sf_dir, "events")
    want = sorted(
        (r["user_id"], r["n_events"], r["total_value"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .collect()
    )
    assert got == want


def test_stream_pq_encode_equals_batch_encode(spark, sf_dir):
    """The streamed PQ encode (micro-batched pandas-UDF scorer via
    foreachBatch) must produce EXACTLY the batch encode's code rows —
    encoding is stateless per row, so the drain is batch-order
    invariant by construction; this pins it against the real batch
    operator (the registry oracle pins it against the SQL chain)."""
    from ffiec_pq_spark.catalog import queries
    from ffiec_pq_spark.operators.pq import pq_codes, pq_fit
    from ffiec_pq_spark.queries.round10 import _K64
    from ffiec_pq_spark.queries.round9c import _ITERS, _M, _SUB_DIM
    from ffiec_pq_spark.session import load_table

    streamed = (
        queries()["stream_pq_encode"](spark, sf_dir)
        .orderBy("id", "sub")
        .collect()
    )
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_fit(emb, m=_M, sub_dim=_SUB_DIM, k=_K64, iters=_ITERS)
    batch = (
        pq_codes(emb, books)
        .select("id", "sub", "cell")
        .orderBy("id", "sub")
        .collect()
    )
    assert streamed == batch


def test_minhash_sig_expr_matches_grouped(spark, sf_dir):
    """The pure-expression signature (minhash_sig_expr) must be
    value-identical to the explode+groupBy minhash_signatures on every
    doc — it is the documented fallback for plans that cannot contain
    an aggregation, so drift here would silently change LSH buckets."""
    from ffiec_pq_spark.operators.dedup import (
        minhash_sig_expr,
        minhash_signatures,
    )
    from ffiec_pq_spark.queries.dedup import _K, _N_PERM

    docs = load_table(spark, sf_dir, "documents")
    expr_sig = docs.select(
        F.col("doc_id").alias("id"),
        minhash_sig_expr("text", _K, _N_PERM).alias("sig"),
    )
    grouped_sig = minhash_signatures(docs, id_col="doc_id", k=_K, n_perm=_N_PERM)
    n_docs = docs.count()
    joined = expr_sig.join(
        grouped_sig.withColumnRenamed("sig", "sig2"), "id"
    )
    assert joined.count() == n_docs
    assert joined.filter(F.col("sig") != F.col("sig2")).count() == 0


def test_minhash_sig_expr_null_on_shingleless(spark):
    """Docs the grouped form DROPS (no shingle rows reach the groupBy)
    must signature to NULL in the expression form, never to a non-null
    sentinel — the old risk was the untouched init accumulator
    [P]*n_perm, which would band-hash every such doc into the SAME LSH
    buckets and emit spurious near-dup pairs (round-11 ADVICE).

    With the repo's ``shingles`` whole-text fallback (< k tokens ->
    one whole-text shingle, so even "" has one shingle) the reachable
    shingle-less input is NULL text; the n==0 guard in the fold's
    finish lambda additionally covers any empty shingle array a future
    ``shingles`` change could produce.  Short docs must keep exact
    parity with the grouped form."""
    from ffiec_pq_spark.operators.dedup import (
        minhash_sig_expr,
        minhash_signatures,
    )
    from ffiec_pq_spark.queries.dedup import _K, _N_PERM

    docs = spark.createDataFrame(
        [
            (1, None),  # NULL text: grouped drops it -> expr NULL
            (2, ""),  # whole-text fallback: one "" shingle
            (3, "one two"),  # < k tokens: one "one two" shingle
            (4, "alpha beta gamma delta"),  # 2 proper shingles
            (5, "alpha beta gamma delta"),  # exact copy of 4
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["sig"]
        for r in docs.select(
            "doc_id", minhash_sig_expr("text", _K, _N_PERM).alias("sig")
        ).collect()
    }
    assert got[1] is None
    assert got[4] is not None and got[4] == got[5]
    # grouped form drops exactly the NULL-text doc; every survivor
    # (including the short-doc whole-text-shingle cases) must match
    # the expression form value-for-value
    grouped = {
        r["id"]: r["sig"]
        for r in minhash_signatures(
            docs, id_col="doc_id", k=_K, n_perm=_N_PERM
        ).collect()
    }
    assert set(grouped) == {2, 3, 4, 5}
    for i in (2, 3, 4, 5):
        assert grouped[i] == got[i]


def test_bounded_neardup_matches_unbounded(spark, sf_dir):
    """The watermark-evicting bounded-state stream must drain the same
    (doc_id, dup_of) relation as the unbounded parquet-fold stream when
    the horizon exceeds the stream's timespan (bounding state must not
    change results within the lateness horizon) — and a ZERO horizon
    must kill every cross-batch pair (eviction actually evicts)."""
    from ffiec_pq_spark.streaming.neardup import (
        run_neardup_bounded_stream,
        run_neardup_stream,
    )

    unbounded = run_neardup_stream(spark, sf_dir)
    bounded = run_neardup_bounded_stream(spark, sf_dir)
    a = sorted(map(tuple, unbounded.collect()))
    b = sorted(map(tuple, bounded.collect()))
    assert a == b

    # horizon 0: every state entry is evicted at the end of its own
    # trigger, so only same-batch pairs can survive — a strict subset
    zero = run_neardup_bounded_stream(spark, sf_dir, horizon_ms=0)
    z = set(map(tuple, zero.collect()))
    assert z <= set(b)


def test_neardup_reattach_heals_compaction_crash(spark, sf_dir):
    """Re-attach must heal the compaction swap's crash window even
    when NO new files arrive: a prior process that died between the
    two compaction renames leaves only ``band_state.old`` on disk, and
    a zero-new-file re-attach never enters fold_batch (the other
    caller of the recovery hook) — the drain path has to re-adopt the
    ``.old`` copy itself (round-11 ADVICE)."""
    import os

    from ffiec_pq_spark.streaming import neardup

    baseline = sorted(
        map(tuple, neardup.run_neardup_stream(spark, sf_dir).collect())
    )
    from ffiec_pq_spark.session import dataset_key

    workdir = neardup._LIVE_RUNS[dataset_key(None, sf_dir) + (None,)]
    state_dir = os.path.join(workdir, "band_state")
    # simulate the crash landing between the two renames: only the
    # .old sibling exists when the next attach starts
    os.rename(state_dir, state_dir + ".old")
    healed = sorted(
        map(tuple, neardup.run_neardup_stream(spark, sf_dir).collect())
    )
    assert healed == baseline
    assert os.path.isdir(state_dir)
    assert not os.path.exists(state_dir + ".old")


def test_stream_scd2_fold_matches_batch(spark, sf_dir):
    """The foreachBatch SCD2 merge must drain the exact history the
    batch operator computes — stitching per-batch runs onto the open
    tail (absorb on unchanged value, close on change, pass through on
    absence) cannot alter intervals when snapshots arrive in week
    order."""
    from ffiec_pq_spark.catalog import queries

    batch = queries()["users_weekly_snapshot_scd2"](spark, sf_dir)
    stream = queries()["stream_scd2_snapshot_fold"](spark, sf_dir)
    a = sorted(map(tuple, batch.collect()))
    b = sorted(map(tuple, stream.collect()))
    assert a and a == b


def test_scd2_from_snapshots_nullsafe_change_detect(spark):
    """NULL attribute values must neither swallow a real change nor
    merge across a NULL gap: NULL->X and X->NULL both open intervals
    (the null-safe struct comparison), and equal runs collapse."""
    import datetime as dt

    from ffiec_pq_spark.operators.windows import scd2_from_snapshots

    d0 = dt.date(2024, 1, 1)
    rows = [
        (1, d0, None),
        (1, dt.date(2024, 1, 8), "a"),
        (1, dt.date(2024, 1, 15), "a"),
        (1, dt.date(2024, 1, 22), None),
        (2, d0, "b"),
    ]
    df = spark.createDataFrame(rows, "k long, snap date, v string")
    got = sorted(
        map(tuple, scd2_from_snapshots(df, "k", ["v"], "snap").collect()),
        key=lambda t: (t[0], t[2]),  # (key, valid_from) is unique
    )
    assert got == [
        (1, None, d0, dt.date(2024, 1, 8), 0),
        (1, "a", dt.date(2024, 1, 8), dt.date(2024, 1, 22), 0),
        (1, None, dt.date(2024, 1, 22), None, 1),
        (2, "b", d0, None, 1),
    ]
