"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed by Arrow-batched
``mapInPandas`` stages.

The decode step itself is STUBBED (no image/audio libs in this
environment): ``decode_image_meta`` parses only magic bytes + length
(real, deterministic), while ``extract_features`` produces a
deterministic fake feature vector derived from the content hash, with
the real implementation point marked.  Everything Spark-side — schema,
partition flow, UDF signatures, Arrow batch shapes — is real and
tested (tests/test_multimodal.py).

Scale notes
-----------
Binary payloads ride in the same row as their metadata; keep payload
columns pruned (select only ``meta`` when scoring) so parquet column
pruning skips the heavy bytes.  ``mapInPandas`` batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low (e.g.
64) for multi-MB media rows to cap executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",  # wav/avi container
    b"GIF8": "gif",
}

META_SCHEMA = (
    "id long, format string, n_bytes long, content_md5 string"
)
FEATURE_DIM = 8
FEATURE_SCHEMA = f"id long, feature array<double>"


def binarize(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Treat a column's bytes as an opaque media payload:
    (id, payload binary)."""
    return df.select(
        F.col(id_col).alias("id"), F.col(col).cast("binary").alias("payload")
    )


def sniff_format(payload: bytes) -> str:
    for magic, fmt in MAGIC.items():
        if payload[: len(magic)] == magic:
            return fmt
    return "unknown"


def decode_image_meta(df: DataFrame) -> DataFrame:
    """(id, payload) -> (id, format, n_bytes, content_md5).

    Magic-byte sniff + hash are real; pixel decode would slot in here
    (see ``extract_features``)."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "format": [sniff_format(bytes(p)) for p in payloads],
                    "n_bytes": [len(p) for p in payloads],
                    "content_md5": [
                        hashlib.md5(bytes(p)).hexdigest() for p in payloads
                    ],
                }
            )

    return df.mapInPandas(meta, schema=META_SCHEMA)


def stub_decoder(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """The environment's default decoder: a deterministic hash-derived
    vector in [-1, 1) (no media libs here — a real deployment injects
    PIL/torchaudio/ffmpeg + an encoder via ``extract_features``'s
    ``decoder=``)."""
    digest = hashlib.md5(payload).digest()
    return [
        (int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 32768.0) - 1.0
        for i in range(dim)
    ]


def extract_features(
    df: DataFrame, dim: int = FEATURE_DIM, decoder=None
) -> DataFrame:
    """(id, payload) -> (id, feature array<double>).

    ``decoder`` is the pluggable implementation point: any callable
    ``bytes -> list[float] (length dim)`` — a real deployment passes a
    decode+encode closure (PIL/torchaudio/ffmpeg + model); it is
    closure-captured into the ``mapInPandas`` stage, so PySpark ships
    it (and anything it pickles in) to executors like any other UDF
    body.  Default: :func:`stub_decoder` (deterministic hash vector —
    no media libs in this environment), so the distributed plumbing
    (Arrow batching, schema, downstream ANN compatibility) is
    exercised end-to-end either way; injection is parity-tested in
    tests/test_multimodal.py."""
    if decoder is None:
        decode = lambda p: stub_decoder(p, dim)  # noqa: E731
    else:
        decode = decoder

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [list(map(float, decode(bytes(p)))) for p in pdf["payload"]]
            for v in out:
                if len(v) != dim:
                    raise ValueError(
                        f"decoder returned {len(v)} dims, expected {dim}"
                    )
            yield pd.DataFrame({"id": pdf["id"], "feature": out})

    return df.mapInPandas(feats, schema=FEATURE_SCHEMA)


def resize_payload(df: DataFrame, target_bytes: int = 96) -> DataFrame:
    """(id, payload) -> (id, resized binary of exactly target_bytes).

    STUB for image/audio resize-resample: cycle-pads or truncates the
    raw bytes to a fixed size (deterministic; a real implementation
    decodes and rescales via PIL/torchaudio here).  The fixed-size
    output contract is the real point: downstream feature extractors
    and collation want constant-shape payloads, and the Arrow batch
    plumbing (binary in, binary out, 1:1) is exercised for real."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                b = bytes(p)
                if not b:
                    out.append(b"\x00" * target_bytes)
                else:
                    reps = -(-target_bytes // len(b))
                    out.append((b * reps)[:target_bytes])
            yield pd.DataFrame({"id": pdf["id"], "resized": out})

    return df.mapInPandas(resize, schema="id long, resized binary")


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """(id, payload) -> one row per sampled 'frame' (id, frame_idx,
    frame binary).  STUB for video frame sampling: slices the payload at
    fixed strides; a real implementation seeks keyframes via ffmpeg.
    Demonstrates the 1->N mapInPandas expansion shape."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for i, p in zip(pdf["id"], pdf["payload"]):
                b = bytes(p)
                for j, off in enumerate(range(0, len(b), every_n_bytes)):
                    ids.append(i)
                    idxs.append(j)
                    blobs.append(b[off : off + every_n_bytes])
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": blobs})

    return df.mapInPandas(frames, schema="id long, frame_idx int, frame binary")


PHASH_BITS = 60  # positive in signed-64 on both engines (like SimHash)


def avg_hash60(payload_text_col, length_col=None):
    """60-bit average-hash fingerprint of an (ASCII-oracle-checkable)
    payload column: sample 60 byte positions strided across the whole
    payload (``pos_i = 1 + (i·(len-1)) div 59``), threshold each byte
    at the sample mean, assemble the sign bits — the pHash family's
    simplest member, here as pure column expressions (the real image
    pHash swaps the byte sampler for a decoded-pixel DCT inside the
    mapInPandas decode stage; the fingerprint/banding plumbing is
    identical).

    Returns a Column (long).  Deterministic: integer positions, integer
    bytes, one exact mean division; the bit threshold compares an
    integer against that exact double on both engines.

    Built with higher-order array functions (transform/aggregate), not
    60 unrolled column expressions: the unrolled form inlined the
    60-term sample sum into every one of the 60 threshold terms
    (~3600-node expression tree), which cost ~15 s of Catalyst
    analysis + a codegen fallback per query build — pure fixed
    overhead, measured before/after in SCALECHECK's
    multimodal_phash_pairs note.  The HOF form is a ~constant-size
    tree with identical bit-for-bit semantics (same strided positions,
    same integer sum, same mean threshold), so the DuckDB oracle SQL
    is unchanged.
    """
    from pyspark.sql import functions as F

    c = F.col(payload_text_col) if isinstance(payload_text_col, str) else payload_text_col
    ln = F.length(c) if length_col is None else F.col(length_col)
    # sampled bytes as ONE array column: pos_i = 1 + (i*(len-1)) div 59
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(PHASH_BITS - 1)),
        lambda i: F.ascii(
            c.substr(
                (F.lit(1) + ((i * (ln - 1)) / F.lit(PHASH_BITS - 1)).cast("long")),
                F.lit(1),
            )
        ),
    )
    total = F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    mean = total / F.lit(float(PHASH_BITS))
    powers = F.array(
        *[F.lit(1 << i).cast("long") for i in range(PHASH_BITS)]
    )
    return F.aggregate(
        F.zip_with(
            arr,
            powers,
            lambda b, p: F.when(b > mean, p).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
