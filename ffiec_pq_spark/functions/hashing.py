"""Hashing primitives for dedup / fingerprinting.

Two tiers:

- ``hash60``: a *portable* 60-bit hash (md5 hex prefix -> integer) whose
  value is bit-identical in Spark and in ANSI SQL engines
  (``('0x' || substr(md5(x),1,15))::BIGINT``).  Used by the
  oracle-checked dedup queries so MinHash/SimHash results can be
  verified cross-engine.  60 bits keeps the value positive in a signed
  64-bit integer on both sides.
- ``fast_hash64``: Spark's native ``xxhash64`` — the production path at
  100 TB scale (no md5 string materialization, whole-stage codegen).
  Swap it in via the ``hash_fn`` parameter of the dedup operators when
  cross-engine verification isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH60_MASK_BITS = 60


def hash60(col: Column | str, seed: int = 0) -> Column:
    """Portable 60-bit integer hash of a string column (+ integer seed)."""
    c = F.col(col) if isinstance(col, str) else col
    seeded = F.concat(F.lit(f"s{seed}:"), c.cast("string"))
    return F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str, seed: int = 0) -> str:
    """The DuckDB-equivalent SQL for :func:`hash60` (oracle side)."""
    return f"(('0x' || substr(md5('s{seed}:' || CAST({expr} AS VARCHAR)), 1, 15))::BIGINT)"


def fast_hash64(col: Column | str, seed: int = 42) -> Column:
    """Production 64-bit hash (xxhash64, JVM-side, no string round-trip)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c, F.lit(seed))
