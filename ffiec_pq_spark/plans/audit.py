"""Physical-plan audit helpers: assert that a DataFrame's executed plan
has the shape you designed for scale (broadcast joins where intended,
filters/column pruning pushed into the parquet scan, no stray
exchanges).  Used by tests and available interactively — the codified
version of "``.explain()`` and iterate until it's the plan you'd want".
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text.

    Scan metadata (PushedFilters, ReadSchema, ...) is rendered under a
    temporarily-raised ``spark.sql.maxMetadataStringLength`` — the
    100-char default truncates long filter lists mid-entry, which would
    make pushdown assertions silently vacuous.

    NOT thread-safe: the conf raise is session-wide for the duration of
    the render, so a concurrent thread planning on the same session
    observes the mutated value (restored in ``finally``).  This module
    is a test/interactive audit tool by design — don't call it from
    production query paths."""
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "10000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        if old is not None:
            spark.conf.set(key, old)
        else:
            spark.conf.unset(key)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (AQE reuse/coalesce not counted
    twice — each Exchange node is one logical shuffle boundary)."""
    return len(re.findall(r"\bExchange hashpartitioning", physical_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in (
        physical_plan(df)
    )


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in each parquet scan's ReadSchema — verifies column
    pruning reached the source (a 2-col projection must not read 16)."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        out.extend(f.split(":")[0] for f in m.group(1).split(",") if f)
    return out


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan, empty string if none."""
    m = re.search(r"PushedFilters: \[([^\]]*)\]", physical_plan(df))
    return m.group(1) if m else ""


def assert_plan(
    df: DataFrame,
    max_exchanges: int | None = None,
    broadcast: bool | None = None,
    pushed: str | None = None,
    pruned_to: set[str] | None = None,
) -> None:
    """Raise AssertionError when the plan violates the stated shape."""
    if max_exchanges is not None:
        n = count_exchanges(df)
        if n > max_exchanges:
            raise AssertionError(
                f"plan has {n} exchanges, expected <= {max_exchanges}:\n"
                + physical_plan(df)
            )
    if broadcast is not None and has_broadcast_join(df) != broadcast:
        raise AssertionError(
            f"broadcast join expected={broadcast}:\n" + physical_plan(df)
        )
    if pushed is not None and pushed not in pushed_filters(df):
        raise AssertionError(
            f"expected pushed filter {pushed!r}, got {pushed_filters(df)!r}"
        )
    if pruned_to is not None:
        got = set(scan_read_schema(df))
        if not got <= pruned_to:
            raise AssertionError(
                f"scan reads {sorted(got - pruned_to)} beyond the expected "
                f"pruned set {sorted(pruned_to)}"
            )


def unexplained_single_partitions(plan: str, context: int = 3) -> list[str]:
    """Single-partition exchanges NOT attributable to a one-row global
    rollup (a ``HashAggregate(keys=[]`` within ``context`` lines) or an
    AQE runtime bloom-filter merge.  The raw ``plan.count("Exchange
    SinglePartition") <= N`` pins proved cache-state-sensitive: a
    persisted relation's InMemoryRelation REPRINTS its build lineage
    (one-row stats rollups included) at every scan, so the textual
    count depends on which session cached what first — this checks the
    SEMANTIC invariant instead (nothing data-sized funnels into one
    partition) and is reprint-invariant."""
    lines = plan.splitlines()
    bad: list[str] = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        ctx = lines[max(0, i - context): i + context + 1]
        joined = "\n".join(ctx)
        if "HashAggregate(keys=[]" in joined or "bloom_filter" in joined:
            continue
        # distributed_rank's offset relation: per-range counts (one row
        # per shuffle partition) funneled through one cumulative window
        # — bounded by the partition count, never by the data
        if "_pid#" in joined or "_off#" in joined:
            continue
        bad.append(joined)
    return bad
