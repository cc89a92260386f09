"""Versioned parquet state for foreachBatch folds.

The BM25 / probe / SCD2 folds keep their keyed-merge state as
immutable versioned directories (``{name}_v{N}``) — each trigger
writes a NEW version and flips an in-memory pointer only after the
write completes, so at every crash point the previous version is
intact on disk (the MERGE-INTO stand-in documented in the fold
docstrings).  Left alone, that scheme accumulates one directory per
trigger: invisible at the benched 3-4 triggers, thousands of small
files for a 1000-trigger deployment.

:func:`retire_versions` bounds it: after a trigger commits version N,
every version <= N - keep is deleted.  The default ``keep=2`` retains
the current version plus its predecessor — the predecessor is the
crash-recovery copy (a crash between the version write and anything
that follows leaves the pointer on N-1, which must still exist), and
nothing ever references versions older than that.  Partial directories
from a mid-write crash are swept by the same rule once two newer
versions commit.

This is the versioned-dir counterpart of the near-dup stream's
rename-swap compaction (``streaming/neardup.py:_recover_state_swap``):
there the state is one mutable dir with a swap window to protect; here
every version is immutable and retirement only touches versions no
pointer can reach.
"""

from __future__ import annotations

import os
import re
import shutil

# Loaded state-directory DataFrames per (applicationId, abspath,
# on-disk fingerprint): every serve re-read its state dirs with
# spark.read.parquet, paying schema inference + file listing per call
# (profiled round 16: 5 x ~70 ms per warm BM25 serve = ~0.35 s of its
# 1.07 s).  Versioned dirs are immutable so the fingerprint never
# changes for them; append-mode dirs (the BM25 postings) grow new part
# files, which changes the fingerprint and naturally invalidates the
# entry.  DataFrames are immutable plans — reuse is safe.
_STATE_FRAMES: dict = {}


def read_state(spark, path: str):
    """Memoized ``spark.read.parquet(path)`` for fold state
    directories, keyed on the directory's on-disk fingerprint (see
    ``session.dataset_fingerprint``) so both immutable versioned dirs
    and append-mode dirs serve fresh relations."""
    from ffiec_pq_spark.session import dataset_fingerprint

    try:
        app = spark.sparkContext.applicationId
    except Exception:
        return spark.read.parquet(path)
    key = (app, os.path.abspath(path), dataset_fingerprint(path))
    df = _STATE_FRAMES.get(key)
    if df is None:
        df = spark.read.parquet(path)
        _STATE_FRAMES[key] = df
    return df


def _register_state_hook() -> None:
    from ffiec_pq_spark.resident import register_clear_hook

    register_clear_hook(
        "stream_state_frames", _STATE_FRAMES.clear, state=_STATE_FRAMES
    )


_register_state_hook()


def retire_versions(
    workdir: str, name: str, current: int, keep: int = 2
) -> None:
    """Delete superseded state versions ``{name}_v{k}`` (k <= current
    - keep) under ``workdir``.  ``current`` is the just-committed
    version; the retained window is ``current - keep + 1 .. current``.
    Safe to call after every trigger: deletion is idempotent and never
    touches the version any pointer (current) or crash-recovery path
    (current - 1) can reference."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    pat = re.compile(re.escape(name) + r"_v(\d+)$")
    try:
        entries = os.listdir(workdir)
    except OSError:
        return
    for entry in entries:
        m = pat.match(entry)
        if m and int(m.group(1)) <= current - keep:
            shutil.rmtree(os.path.join(workdir, entry), ignore_errors=True)


def emit_versioned(state: dict, workdir: str, rels: dict) -> None:
    """Write each relation in ``rels`` (name -> DataFrame) to a fresh
    ``{name}_v{N}`` directory under ``workdir`` (one shared version
    counter ``state['version']``), flip the state pointers ONLY after
    every write committed, then retire superseded versions.

    The write-all-then-flip order is the fold's crash contract: a
    failure mid-way leaves every pointer on the previous version (and
    the replay guard unrecorded, so the epoch re-runs — see the fold
    docstrings).  Tests monkeypatch this single seam to simulate
    mid-fold crashes for every fold that uses it."""
    state["version"] += 1
    v = state["version"]
    paths = {}
    if len(rels) > 1:
        # the versioned relations are independent write jobs — overlap
        # them (guide §2.6).  The flip below still happens only after
        # EVERY write returned (futures joined), so the write-all-
        # then-flip crash contract is unchanged: a failure in any
        # write leaves every pointer on the previous version (the
        # partially written v-dirs are unreferenced and swept by
        # retire_versions once two newer versions commit).
        from concurrent.futures import ThreadPoolExecutor

        def _write(item):
            name, rel = item
            out = os.path.join(workdir, f"{name}_v{v}")
            rel.write.parquet(out)
            return name, out

        with ThreadPoolExecutor(max_workers=min(3, len(rels))) as pool:
            paths = dict(pool.map(_write, rels.items()))
    else:
        for name, rel in rels.items():
            out = os.path.join(workdir, f"{name}_v{v}")
            rel.write.parquet(out)
            paths[name] = out
    state.update(paths)
    for name in rels:
        retire_versions(workdir, name, v)
