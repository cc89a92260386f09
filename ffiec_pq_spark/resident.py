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

from typing import Callable

_CLEAR_HOOKS: dict[str, Callable[[], None]] = {}


def register_clear_hook(name: str, fn: Callable[[], None]) -> None:
    """Register a resident cache's clear hook under a stable name.
    Called at module import; re-registering the same name overwrites
    (idempotent under re-import)."""
    _CLEAR_HOOKS[name] = fn


def registered_hooks() -> dict[str, Callable[[], None]]:
    """Snapshot of the registered hooks (name -> callable)."""
    return dict(_CLEAR_HOOKS)


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
