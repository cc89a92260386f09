"""Unit tests for the round-3 extension operators: sequence packing,
int8 quantization, PII redaction, gram-duplication, funnel staging.
The end-to-end oracle equivalence of the registered queries is covered
by test_oracle.py; these pin the operator semantics directly on small
hand-built frames where the expected values are checkable by eye.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ffiec_pq_spark.operators.packing import pack_sequences
from ffiec_pq_spark.operators.quantize import (
    quantize_codes_int8,
    quantize_scale,
    reconstruction_err,
)
from ffiec_pq_spark.operators.text import (
    gram_dup_fraction,
    pii_counts,
    redact_pii,
)


def test_pack_sequences_whole_doc_boundaries(spark):
    # budget 10; docs of 4,4,4 tokens: doc3 starts at offset 8 -> seq 0
    # (whole-doc packing lets a sequence overflow); doc4 at offset 12 -> seq 1.
    rows = [("a", 1, 4), ("a", 2, 4), ("a", 3, 4), ("a", 4, 3), ("b", 1, 25)]
    df = spark.createDataFrame(rows, "src string, doc_id int, tok int")
    out = pack_sequences(df, "tok", 10, part_col="src", order_col="doc_id")
    got = {(r.src, r.doc_id): r.seq_id for r in out.collect()}
    assert got == {("a", 1): 0, ("a", 2): 0, ("a", 3): 0, ("a", 4): 1, ("b", 1): 0}


def test_pack_sequences_is_per_partition(spark):
    # the running sum restarts per part_col: identical doc streams in two
    # shards produce identical seq ids independently.
    rows = [(s, i, 7) for s in ("x", "y") for i in range(1, 7)]
    df = spark.createDataFrame(rows, "src string, doc_id int, tok int")
    out = pack_sequences(df, "tok", 21, part_col="src", order_col="doc_id")
    by_src = {}
    for r in out.collect():
        by_src.setdefault(r.src, {})[r.doc_id] = r.seq_id
    assert by_src["x"] == by_src["y"] == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1}


def test_quantize_int8_roundtrip_bound(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0]), (3, [-2.0, 2.0, 0.001])],
        "id int, v array<double>",
    )
    out = df.select(
        "id",
        quantize_codes_int8(F.col("v")).alias("codes"),
        reconstruction_err(F.col("v")).alias("err"),
        (F.lit(1.0) / quantize_scale(F.col("v"))).alias("step"),
    ).collect()
    by_id = {r.id: r for r in out}
    # max-abs element maps to ±127 exactly (floor(127.0) = 127)
    assert by_id[1].codes[0] == 127
    assert by_id[3].codes[0] == -127 or by_id[3].codes[1] == 127
    # all-zero vector: eps guard keeps codes at 0, err at 0
    assert by_id[2].codes == [0, 0, 0] and by_id[2].err == 0.0
    for r in out:
        assert all(-127 <= c <= 127 for c in r.codes)
        assert r.err <= r.step + 1e-12


def test_pii_redact_and_counts(spark):
    txt = "mail bob.smith@example.com or 10.0.0.1 call 555-1234 done"
    df = spark.createDataFrame([(txt,), ("clean text",)], "t string")
    counts = pii_counts("t")
    out = df.select(
        redact_pii("t").alias("red"),
        counts["email"].alias("e"),
        counts["ipv4"].alias("i"),
        counts["phone"].alias("p"),
    ).collect()
    hit = next(r for r in out if "<EMAIL>" in r.red)
    assert (hit.e, hit.i, hit.p) == (1, 1, 1)
    assert hit.red == "mail <EMAIL> or <IP> call <PHONE> done"
    clean = next(r for r in out if r.red == "clean text")
    assert (clean.e, clean.i, clean.p) == (0, 0, 0)


def test_gram_dup_fraction_values(spark):
    # "a b a b a" -> 2-grams: [a b, b a, a b, b a] -> 4 grams, 2 distinct -> 0.5
    df = spark.createDataFrame([("a b a b a",), ("w x y z",)], "text string")
    out = df.select(
        "text", F.round(gram_dup_fraction("text", 2), 6).alias("f")
    ).collect()
    got = {r.text: r.f for r in out}
    assert got["a b a b a"] == pytest.approx(0.5)
    assert got["w x y z"] == 0.0


def test_funnel_requires_stage_order(spark, sf_dir):
    # a purchase BEFORE any click must not count as stage 4
    from ffiec_pq_spark.queries.extensions import events_funnel

    rows = [
        (1, "signup", "2024-01-01 00:00:00"),
        (1, "purchase", "2024-01-01 01:00:00"),  # no view/click yet -> stage 1
        (2, "signup", "2024-01-01 00:00:00"),
        (2, "view", "2024-01-01 01:00:00"),
        (2, "click", "2024-01-01 02:00:00"),
        (2, "purchase", "2024-01-01 03:00:00"),  # full funnel -> stage 4
    ]
    ev = spark.createDataFrame(rows, "user_id int, event_type string, ts string")
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        out = {r.stage: r.n_users for r in events_funnel(spark, d).collect()}
    assert out == {1: 1, 4: 1}


def test_salted_join_equals_plain_join(spark, sf_dir):
    from ffiec_pq_spark.operators.skew import salted_join
    from ffiec_pq_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = (
        ev.select("event_type").distinct()
        .withColumn("w", F.length("event_type").cast("double"))
    )
    plain = ev.join(dim, "event_type").select("event_id", "event_type", "w")
    salted = salted_join(ev, dim, "event_type", F.col("event_id"), 8).select(
        "event_id", "event_type", "w"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_mixture_sample_respects_budget_and_caps(spark):
    from ffiec_pq_spark.operators.sampling import mixture_sample

    rows = [("big", i, 100) for i in range(200)] + [("small", i, 100) for i in range(3)]
    df = spark.createDataFrame(rows, "source string, doc_id int, tok int")
    # big has 20_000 tokens, small 300; weights 1:1, budget 2_000 ->
    # big targets 1_000 tokens (rate 5%), small targets 1_000 but only
    # has 300 -> gate caps at 100% and keeps every row.
    kept = mixture_sample(df, "doc_id", "source", "tok", {"big": 1, "small": 1}, 2_000)
    counts = {r.source: r.n for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["small"] == 3
    assert 0 < counts.get("big", 0) < 40  # ~5% of 200, hash-gate variance
    # deterministic: same membership on re-run
    again = mixture_sample(df, "doc_id", "source", "tok", {"big": 1, "small": 1}, 2_000)
    assert kept.exceptAll(again).count() == 0
    # unweighted sources are dropped entirely
    only_big = mixture_sample(df, "doc_id", "source", "tok", {"big": 1}, 2_000)
    assert only_big.filter(F.col("source") == "small").count() == 0


def test_chunk_documents_overlap_and_reconstruction(spark):
    from ffiec_pq_spark.operators.chunking import chunk_documents

    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words), (2, "a b c")], "doc_id int, text string")
    out = chunk_documents(df, "text", "doc_id", chunk_tokens=40, overlap=10)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_id))
    short = [r for r in rows if r.doc_id == 2]
    assert len(short) == 1 and short[0].chunk_text == "a b c"
    long = [r for r in rows if r.doc_id == 1]
    # n=100, chunk=40, stride=30 -> 1 + ceil(60/30) = 3 chunks
    assert [r.chunk_id for r in long] == [0, 1, 2]
    assert [r.n_chunk_tokens for r in long] == [40, 40, 40]  # 60+40 = clamp at 100
    # consecutive chunks share exactly `overlap` tokens
    for a, b in zip(long, long[1:]):
        assert a.chunk_text.split()[-10:] == b.chunk_text.split()[:10]
    # de-overlapped concatenation reconstructs the document
    rebuilt = long[0].chunk_text.split()
    for r in long[1:]:
        rebuilt += r.chunk_text.split()[10:]
    assert " ".join(rebuilt) == words


def test_zorder_write_clusters_both_dims(spark, tmp_path):
    import pyarrow.parquet as pq

    from ffiec_pq_spark.operators.layout import zorder_write

    # uniform grid over (a, b): any single-column sort leaves the other
    # column spanning the full range in every file; z-order bounds both.
    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = str(tmp_path / "zordered")
    zorder_write(df, out, "a", "b", bits=6, n_files=16)

    import glob

    boxes = []
    for f in sorted(glob.glob(out + "/part-*.parquet")):
        t = pq.read_table(f)
        pa, pb = t.column("a").to_pylist(), t.column("b").to_pylist()
        boxes.append((max(pa) - min(pa), max(pb) - min(pb)))
    assert len(boxes) >= 8
    # every file's bounding box is narrow on BOTH axes (global span 63);
    # a lexicographic sort would give span ~63 on the trailing column.
    for da, db in boxes:
        assert da <= 32 and db <= 32, boxes


def test_interleave_bits_roundtrip(spark):
    from ffiec_pq_spark.operators.layout import interleave_bits

    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 63, 64, 1023) for b in (0, 2, 7, 100, 1023)],
        "a long, b long",
    )
    z = interleave_bits(F.col("a"), F.col("b"), bits=10)
    # de-interleave in-plan: gather even bits back into a, odd into b
    back_a = sum(
        (F.shiftright(z, 2 * i).bitwiseAND(F.lit(1)) * F.lit(2**i) for i in range(10)),
        F.lit(0).cast("long"),
    )
    back_b = sum(
        (F.shiftright(z, 2 * i + 1).bitwiseAND(F.lit(1)) * F.lit(2**i) for i in range(10)),
        F.lit(0).cast("long"),
    )
    bad = df.select(
        "a", "b", back_a.alias("ra"), back_b.alias("rb")
    ).filter((F.col("a") != F.col("ra")) | (F.col("b") != F.col("rb")))
    assert bad.count() == 0
