"""Unified governance for resident (per-session, per-dataset) state.

The engine memoizes expensive one-time builds — trained models
(PCA / k-means-PQ / linear probe), maintained stream state (BM25
postings, near-dup band state, incremental cluster corpus state), and
shared relations (component labels) — keyed on
``os.path.abspath(sf_dir)`` (plus the application id for stream
state).  Each owning module has always shipped an explicit
``clear_*()`` hook (the ``spark.catalog.clearCache()`` contract: a
dataset rewritten in place must be explicitly invalidated), but with
10+ caches the per-cache convention became the failure mode: a caller
that forgets ONE hook serves stale state for that family only.

This module closes that by construction: every cache registers its
clear hook at import time (``register_clear_hook``), and
:func:`clear_all_resident_state` invalidates everything in one call.
Importing :mod:`ffiec_pq_spark.catalog` (which loads every query
module) guarantees all hooks are registered.
"""

from __future__ import annotations

import os
from typing import Callable

_CLEAR_HOOKS: dict[str, Callable[[], None]] = {}
_STATE_REFS: dict[str, dict] = {}


def register_clear_hook(
    name: str, fn: Callable[[], None], state: dict | None = None
) -> None:
    """Register a resident cache's clear hook under a stable name.
    Called at module import; re-registering the same name overwrites
    (idempotent under re-import).

    ``state`` (optional) is the cache's backing container itself —
    registering it lets :func:`resident_state_report` AUDIT the
    footprint (entry count; disk bytes for states whose values carry a
    ``workdir`` path) instead of trusting the clear convention."""
    _CLEAR_HOOKS[name] = fn
    if state is not None:
        _STATE_REFS[name] = state


def registered_hooks() -> dict[str, Callable[[], None]]:
    """Snapshot of the registered hooks (name -> callable)."""
    return dict(_CLEAR_HOOKS)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def resident_state_report(spark=None) -> dict:
    """AUDIT the resident-state footprint: per registered cache, the
    entry count and the on-disk bytes of any backing directories
    (state values carrying a ``workdir`` key, or plain path strings —
    the versioned-parquet stream states); plus, when a session is
    passed, the Spark storage totals (memory + disk bytes of every
    cached/checkpointed RDD via the storage-status API — the memoized
    ``localCheckpoint`` relations live there).

    This is the eviction-policy input a long-lived multi-tenant driver
    needs: the clear-all registry governs INVALIDATION, this measures
    RESIDENCY COST.  Disk bytes are exact and freed synchronously by
    the clear hooks (the hardening test pins that); Spark storage for
    checkpointed relations is released by the context cleaner once the
    cleared Python references are collected — asynchronous by Spark's
    design, so the report exposes it for monitoring rather than
    asserting it zero after a clear."""
    report: dict = {}
    for name in sorted(_STATE_REFS):
        st = _STATE_REFS[name]
        disk = 0
        for v in st.values():
            wd = None
            if isinstance(v, dict):
                wd = v.get("workdir")
            elif isinstance(v, str) and os.path.sep in v:
                wd = v
            if wd and os.path.isdir(wd):
                disk += _dir_bytes(wd)
        report[name] = {"entries": len(st), "disk_bytes": disk}
    if spark is not None:
        mem = dsk = n = 0
        for info in spark.sparkContext._jsc.sc().getRDDStorageInfo():
            n += 1
            mem += info.memSize()
            dsk += info.diskSize()
        report["_spark_storage"] = {
            "cached_rdds": n,
            "mem_bytes": int(mem),
            "disk_bytes": int(dsk),
        }
    return report


def clear_all_resident_state() -> list[str]:
    """Invalidate EVERY resident cache (models, stream state, shared
    relations) and return the names cleared, sorted.  The one call a
    caller makes after rewriting any dataset in place; individual
    ``clear_*()`` hooks remain for targeted invalidation.

    Hooks that raise do not stop the sweep — every remaining cache is
    still cleared, then the first error re-raises (a half-cleared
    session is worse than a reported failure)."""
    errors: list[BaseException] = []
    cleared: list[str] = []
    for name in sorted(_CLEAR_HOOKS):
        try:
            _CLEAR_HOOKS[name]()
            cleared.append(name)
        except BaseException as exc:  # noqa: BLE001 — resweep then raise
            errors.append(exc)
    if errors:
        raise errors[0]
    return cleared


_TRACKED_PERSISTS: dict = {}


def tracked_persist(df):
    """``df.persist()`` + registration under the resident registry:
    per-query lazy builders persist shared sub-relations (a fused arm
    feeding several consumers in one plan) without a natural
    self-unpersist point — historically these relied on the documented
    "clearCache() between pipelines" caveat and sat OUTSIDE the
    governance registry.  Tracking the reference here puts them under
    :func:`clear_all_resident_state` and the footprint report's entry
    count (their bytes appear in the report's ``_spark_storage``
    totals), so a long-lived multi-tenant driver has ONE invalidation
    call for everything resident."""
    out = df.persist()
    _TRACKED_PERSISTS[id(out._jdf)] = out
    return out


def clear_tracked_persists() -> None:
    """Unpersist every tracked per-query persist."""
    for df in _TRACKED_PERSISTS.values():
        try:
            df.unpersist()
        except Exception:  # session may already be stopped
            pass
    _TRACKED_PERSISTS.clear()


register_clear_hook(
    "query_persists", clear_tracked_persists, state=_TRACKED_PERSISTS
)
