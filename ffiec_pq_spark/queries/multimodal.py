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
