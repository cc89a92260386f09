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


def broadcast_hints(df: DataFrame) -> list[str]:
    """Optimized-logical-plan lines carrying an explicit broadcast
    JOIN HINT (``strategy=broadcast``) — i.e. every place the query
    author FORCED a broadcast with ``F.broadcast``/``hint("broadcast")``
    rather than letting AQE choose from measured sizes.  Plan pins use
    this to assert forced broadcasts exist only on provably bounded
    relations (1-row totals, per-range offsets, top-k lists): a hint on
    a corpus-derived side overrides AQE's size check and is the 100 TB
    scale killer the audit exists to catch."""
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    return [ln for ln in opt.splitlines() if "strategy=broadcast" in ln]


def _tree_depth(line: str) -> int:
    """Indentation depth of a plan-tree line: the column where its
    ``+-``/``:-`` connector starts (root lines, with no connector,
    are depth -1 so every child is deeper)."""
    m = re.search(r"[+:]-", line)
    return m.start() if m else -1


def unexplained_single_partitions(
    plan: str, max_total: int | None = 8
) -> list[str]:
    """Single-partition exchanges NOT attributable to a one-row global
    rollup, an AQE runtime bloom-filter merge, or
    ``distributed_rank``'s bounded per-range offset relation.  The raw
    ``plan.count("Exchange SinglePartition") <= N`` pins proved
    cache-state-sensitive: a persisted relation's InMemoryRelation
    REPRINTS its build lineage (one-row stats rollups included) at
    every scan, so the textual count depends on which session cached
    what first — this checks the SEMANTIC invariant instead (nothing
    data-sized funnels into one partition) and is reprint-invariant.

    The excuse is judged on the exchange's own INPUT: only the lines
    strictly deeper in the tree immediately below the exchange (its
    child subtree's first two operators) may carry the
    ``HashAggregate(keys=[]`` / ``bloom_filter`` / ``_pid#``/``_off#``
    marker — a data-sized exchange that merely sits NEAR a one-row
    rollup reprint no longer passes.  ``max_total`` is a backstop
    upper bound on DISTINCT SinglePartition exchange SITES, excused or
    not — keyed on the exchange + child-subtree text, so an
    InMemoryRelation reprinting one site at every scan counts once
    (reprint-invariant, like the rest of the check) while N genuinely
    different funnels count N; exceeding it reports the overflow even
    when every site is individually excused."""
    lines = plan.splitlines()
    bad: list[str] = []
    sites: set = set()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        depth = _tree_depth(ln)
        child_ctx: list[str] = []
        for nxt in lines[i + 1: i + 6]:
            if _tree_depth(nxt) <= depth:
                break
            child_ctx.append(nxt)
            if len(child_ctx) == 2:
                break
        joined = "\n".join(child_ctx)
        sites.add(
            "\n".join(re.sub(r"^[\s:+-]*", "", x) for x in [ln] + child_ctx)
        )
        if "HashAggregate(keys=[]" in joined or "bloom_filter" in joined:
            continue
        # distributed_rank's offset relation: per-range counts (one row
        # per shuffle partition) funneled through one cumulative window
        # — bounded by the partition count, never by the data
        if "_pid#" in joined or "_off#" in joined:
            continue
        bad.append("\n".join([ln] + child_ctx))
    if max_total is not None and len(sites) > max_total:
        bad.append(
            f"{len(sites)} distinct Exchange SinglePartition sites "
            f"exceed the backstop bound {max_total}"
        )
    return bad
