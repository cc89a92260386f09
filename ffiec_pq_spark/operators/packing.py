"""Sequence packing for LLM training-data pipelines: assign documents
to fixed-token-budget training sequences ("concat-and-chunk" packing).

Semantics: within each ``part_col`` group, documents are laid end to
end in ``order_col`` order and the running token offset decides the
sequence id: ``seq_id = floor(cum_tokens_before / budget)``.  A
document straddling a boundary stays in the sequence where it started
(whole-document packing), so a sequence can overflow by at most one
document — the ``overflow`` column in the stats query reports by how
much.  This is the deterministic streaming-friendly packing used when
shuffling/bin-packing globally is too expensive; first-fit-decreasing
would need a global sort + sequential state.

Scale design: the only wide operation is ONE window (sum over
``partitionBy(part_col) orderBy(order_col)``), i.e. a single hash
shuffle on ``part_col``.  Parallelism = number of groups (source,
shard, date bucket, ...), so at 100 TB you pack per shard — a GLOBAL
running sum would serialize on one partition, which is exactly what
this operator refuses to do (pass a constant ``part_col`` only on toy
data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str | Column,
    budget: int,
    part_col: str = "source",
    order_col: str = "doc_id",
    seq_col: str = "seq_id",
) -> DataFrame:
    """Add ``seq_col``: the 0-based training-sequence index within
    ``part_col``, packing documents in ``order_col`` order into
    ``budget``-token sequences."""
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tok).over(w), F.lit(0))
    return df.withColumn(seq_col, F.floor(cum_before / F.lit(float(budget))))


def pack_sequences_sql(
    token_expr: str,
    budget: int,
    part_col: str = "source",
    order_col: str = "doc_id",
) -> str:
    """DuckDB mirror of the ``seq_id`` expression (same window frame,
    same double division before floor)."""
    return (
        f"CAST(floor(coalesce(sum({token_expr}) OVER ("
        f"PARTITION BY {part_col} ORDER BY {order_col} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        f"/ {float(budget)}) AS BIGINT)"
    )
