"""Multimodal binary-column queries: the metadata path is pure column
expressions (oracle-checked); the decode/feature stages are mapInPandas
(tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.session import load_table


@register(
    "multimodal_binary_meta",
    """
    SELECT doc_id,
           octet_length(encode(text))                  AS n_bytes,
           md5(text)                                   AS content_md5,
           lower(hex(encode(substring(text, 1, 4))))   AS magic_hex
    FROM documents
    """,
    tags=["multimodal"],
)
def multimodal_binary_meta(spark, sf_dir):
    """Opaque binary payload + typed metadata (byte length, content
    hash, magic prefix) — all JVM-side; the payload column itself stays
    prunable so metadata-only scans never read the bytes."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 4), "UTF-8"))).alias("magic_hex"),
    )


@register(
    "multimodal_frame_sample",
    """
    SELECT doc_id,
           CAST(f AS INTEGER) AS frame_idx,
           md5(substring(text, f * 64 + 1, 64)) AS frame_md5,
           octet_length(encode(substring(text, f * 64 + 1, 64))) AS n_frame_bytes
    FROM (
      SELECT doc_id, text,
             unnest(generate_series(
               0, CAST(floor((octet_length(encode(text)) - 1) / 64.0) AS BIGINT)
             )) AS f
      FROM documents
      WHERE octet_length(encode(text)) > 0
    )
    """,
    tags=["multimodal"],
)
def multimodal_frame_sample(spark, sf_dir):
    """The 1->N mapInPandas frame-sampling stage (video keyframe shape,
    operators/multimodal.py:frame_sample) over the documents payloads:
    one row per fixed-stride 64-byte 'frame' with its hash and length.
    The oracle replays the slicing in SQL — valid because the synthetic
    corpus is pure ASCII, so DuckDB's character substring equals the
    byte slicing the operator does (non-ASCII media bytes keep the same
    Spark-side plumbing; only the oracle trick needs ASCII)."""
    from ffiec_pq_spark.operators.multimodal import binarize, frame_sample

    d = load_table(spark, sf_dir, "documents")
    frames = frame_sample(binarize(d, "text", "doc_id"), every_n_bytes=64)
    return frames.select(
        F.col("id").alias("doc_id"),
        "frame_idx",
        F.md5("frame").alias("frame_md5"),
        F.length("frame").alias("n_frame_bytes"),
    )


@register(
    "multimodal_resize_stub",
    """
    SELECT doc_id,
           md5(substring(repeat(text,
                 CAST(ceil(96.0 / greatest(length(text), 1)) AS INTEGER)),
               1, 96)) AS resized_md5,
           96 AS n_bytes
    FROM documents
    WHERE length(text) > 0
    """,
    tags=["multimodal"],
)
def multimodal_resize_stub(spark, sf_dir):
    """The resize/resample mapInPandas stage (operators/multimodal.py:
    resize_payload) over the documents payloads: every payload becomes
    exactly 96 bytes (cycle-pad or truncate — the deterministic stand-in
    for a pixel/sample rescale), hashed for the oracle, which replays
    the cycle-pad with repeat+substring (ASCII corpus, as with
    frame-sampling)."""
    from ffiec_pq_spark.operators.multimodal import binarize, resize_payload

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    resized = resize_payload(binarize(d, "text", "doc_id"), target_bytes=96)
    return resized.select(
        F.col("id").alias("doc_id"),
        F.md5("resized").alias("resized_md5"),
        F.length("resized").alias("n_bytes"),
    )


_FDIM = 8


def _features_sql() -> str:
    # each element quantized to integer microunits: round(x * 1e6) is
    # EXACT here (x is a dyadic rational k/2^15 - 1, so x*1e6 = j*5^6/2^9
    # fits a double exactly) and both engines round ties away from zero,
    # so the comma-joined integer string is engine-stable — unlike a
    # joined double rendering (1e-05 vs 1E-5)
    terms = ", ".join(
        f"CAST(round(((('0x' || substr(md5(text), {4 * i + 1}, 4))::INTEGER"
        f" / 32768.0) - 1.0) * 1000000.0) AS BIGINT)"
        for i in range(_FDIM)
    )
    return (
        f"SELECT doc_id, array_to_string([{terms}], ',') AS feature_micros"
        " FROM documents"
    )


@register("multimodal_feature_extract", _features_sql(), tags=["multimodal"])
def multimodal_feature_extract(spark, sf_dir):
    """The mapInPandas feature-extraction stage (operators/multimodal.py)
    over the documents payloads, verified EXACTLY by the oracle: the
    stub features are md5-derived, so DuckDB replays the same math on
    the same bytes — i.e. the Arrow-batched Python plumbing itself is
    under the hash check, not just JVM expressions.  The vector is
    emitted as a comma-joined string of integer microunits because the
    driver's canonicalizer can't sort array columns; the array-typed
    API stays on ``extract_features``."""
    from ffiec_pq_spark.operators.multimodal import binarize, extract_features

    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(binarize(d, "text", "doc_id"), dim=_FDIM)
    return feats.select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                "feature",
                lambda x: F.round(x * F.lit(1000000.0)).cast("long").cast("string"),
            ),
            ",",
        ).alias("feature_micros"),
    )


_PHASH_HAMMING = 9


def _phash_sql() -> str:
    n = 60
    bdefs = ",\n             ".join(
        f"ascii(substr(text, 1 + (({i} * (length(text) - 1)) // {n - 1}), 1)) AS b{i}"
        for i in range(n)
    )
    total = " + ".join(f"b{i}" for i in range(n))
    fp = " + ".join(
        f"(CASE WHEN b{i} > ({total}) / 60.0 THEN {1 << i}::BIGINT ELSE 0::BIGINT END)"
        for i in range(n)
    )
    return f"""
    WITH bcols AS (
      SELECT doc_id AS id, {bdefs}
      FROM documents
    ),
    fps AS (SELECT id, {fp} AS fp FROM bcols)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
    FROM fps a JOIN fps b ON a.id < b.id
    WHERE bit_count(xor(a.fp, b.fp)) <= {_PHASH_HAMMING}
    """


@register("multimodal_phash_pairs", _phash_sql(), tags=["multimodal", "dedup"])
def multimodal_phash_pairs(spark, sf_dir):
    """Perceptual-hash near-dup join over the binary payloads: a 60-bit
    average-hash (strided byte sampling, mean threshold — the pHash
    family's simplest member; a real image pipeline swaps the sampler
    for decoded-pixel DCT inside the mapInPandas decode stage and
    keeps this exact fingerprint/banding plumbing), candidates by
    10-way bit-banding (pigeonhole covers Hamming <= 9), popcount
    verification, exact-duplicate collapse.  The oracle runs the naive
    all-pairs XOR over the same fingerprints."""
    from pyspark.sql import Window

    from ffiec_pq_spark.operators.dedup import (
        _expand_rep_pairs,
        _within_group_pairs,
    )
    from ffiec_pq_spark.operators.multimodal import PHASH_BITS, avg_hash60

    docs = load_table(spark, sf_dir, "documents")
    # collapse by RAW bytes (md5 of the payload as-is), NOT the
    # normalized-text groups the shingle family uses: the fingerprint
    # reads raw bytes, so only byte-identical payloads share it
    wg = Window.partitionBy("_chash")
    groups = (
        docs.select(F.col("doc_id").alias("id"), F.md5("text").alias("_chash"))
        .withColumn("rep", F.min("id").over(wg))
        .withColumn("g", F.count(F.lit(1)).over(wg))
        .drop("_chash")
        .persist()
    )
    rep_ids = groups.filter(F.col("id") == F.col("rep")).select("id", "g")
    rep_docs = docs.join(
        rep_ids.select(F.col("id").alias("doc_id")), "doc_id", "left_semi"
    )
    fps = rep_docs.select(
        F.col("doc_id").alias("id"), avg_hash60("text").alias("fp")
    ).persist()
    n_bands, band_w = 10, PHASH_BITS // 10
    bands = fps.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("fp", b * band_w)
                        .bitwiseAND(F.lit((1 << band_w) - 1))
                        .alias("bval"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "fp", "bk.band", "bk.bval")
    l = bands.select(F.col("id").alias("id_a"), F.col("fp").alias("_fa"), "band", "bval")
    r = bands.select(F.col("id").alias("id_b"), F.col("fp").alias("_fb"), "band", "bval")
    ham = F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb"))).cast("long")
    rep_pairs = (
        l.join(r, ["band", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= _PHASH_HAMMING)
        .distinct()
    )
    copies = groups.select("rep", "id")
    cross = _expand_rep_pairs(rep_pairs, copies, "hamming")
    qual = rep_ids.filter(F.col("g") >= 2).select(
        "id", F.lit(0).cast("long").alias("hamming")
    )
    within = _within_group_pairs(qual, copies, "hamming")
    return cross.unionByName(within)
