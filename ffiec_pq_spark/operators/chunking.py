"""Document chunking for embedding/RAG pipelines: split each document
into fixed-token-window chunks with overlap (the preprocessing step
before embedding — context windows are bounded, retrieval wants
passage-sized units, and overlap keeps boundary sentences findable).

All pure array expressions — ``sequence`` for the chunk index range,
``slice`` for each window, one ``explode`` to rows.  No UDF, no
shuffle: a map-only stage whose output is ~``1/stride`` × the token
count regardless of document skew, so at 100 TB it pipelines straight
into the embedding stage's ``mapInPandas`` batches.

Chunk math (mirrored exactly in the SQL oracle): ``stride =
chunk_tokens - overlap``; a document with ``n`` tokens yields ``1 +
ceil((n - chunk_tokens) / stride)`` chunks (one if ``n <=
chunk_tokens``); chunk ``i`` covers tokens ``[i*stride, i*stride +
chunk_tokens)`` with the final chunk clamped at ``n``.  Every count is
integer arithmetic — no FP in the boundary decisions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ffiec_pq_spark.operators.text import tokens


def n_chunks(tok: Column, chunk_tokens: int, overlap: int) -> Column:
    """Number of chunks for a token array (integer-exact)."""
    stride = chunk_tokens - overlap
    n = F.size(tok)
    extra = F.greatest(n - F.lit(chunk_tokens), F.lit(0))
    return (F.lit(1) + F.floor((extra + F.lit(stride - 1)) / F.lit(stride))).cast(
        "long"
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """One row per (document, chunk): ``id_col``, ``chunk_id``,
    ``chunk_text``, ``n_chunk_tokens``."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    tok = tokens(text_col)
    count = n_chunks(tok, chunk_tokens, overlap)
    chunks = F.transform(
        F.sequence(F.lit(0), (count - 1).cast("int")),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.array_join(
                F.slice(tok, i * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.size(F.slice(tok, i * stride + 1, chunk_tokens))
            .cast("long")
            .alias("n_chunk_tokens"),
        ),
    )
    return df.select(id_col, F.explode(chunks).alias("c")).select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
    )


def chunk_sql(
    text_expr: str, chunk_tokens: int, overlap: int
) -> dict[str, str]:
    """DuckDB mirrors: per-document chunk count and, given a chunk
    index column ``i`` (0-based), the chunk text and token count."""
    stride = chunk_tokens - overlap
    tok = f"string_split_regex(trim({text_expr}), '\\s+')"
    count = (
        f"(1 + (greatest(len({tok}) - {chunk_tokens}, 0) + {stride - 1}) "
        f"// {stride})"
    )
    text = (
        f"array_to_string(list_slice({tok}, i * {stride} + 1, "
        f"i * {stride} + {chunk_tokens}), ' ')"
    )
    ntok = (
        f"len(list_slice({tok}, i * {stride} + 1, i * {stride} + {chunk_tokens}))"
    )
    return {"count": count, "text": text, "ntok": ntok}
