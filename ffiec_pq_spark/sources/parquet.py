"""Parquet scan surface (SURVEY.md §2.1 S7-S10).

- ``scan_pqs``: multi-file scan with schema-union by column name +
  optional provenance column, fail-fast glob validation before any job
  (reference ffiec_scan_pqs, R/ffiec_manifest.R:217-290 — its
  ``union_by_name=true``/``filename=true`` semantics map to Spark's
  ``mergeSchema`` + ``input_file_name``).
- ``pq_schema`` / ``pq_cols_by_type``: footer-metadata-only reads via
  pyarrow on the driver — deliberately *not* a Spark job, matching the
  reference's schema-only scans (R/ffiec_make_long_pqs.R:11-24).
- ``list_pqs``: output-dir listing with the ``{schedule}_{YYYYMMDD}``
  filename contract (reference ffiec_list_pqs, R/ffiec_process.R:622-652).
- ``write_single_parquet``: the reference's one-file-per-dataset output
  contract (coalesce(1) + rename); directory output is the scale mode.
"""

from __future__ import annotations

import os
import re
import shutil
from glob import glob as _glob

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PQ_NAME_RE = re.compile(r"(.+)_(\d{8})\.parquet$")


def scan_pqs(
    spark: SparkSession,
    pattern: str,
    union_by_name: bool = True,
    filename: bool = False,
) -> DataFrame:
    """Lazy scan over a parquet glob with schema union + provenance.

    Fails fast (before building the plan) if the glob matches nothing,
    like the reference's Sys.glob check."""
    paths = sorted(_glob(pattern))
    if not paths:
        raise FileNotFoundError(f"scan_pqs: no files match {pattern!r}")
    reader = spark.read.option("mergeSchema", str(union_by_name).lower())
    df = reader.parquet(*paths)
    if filename:
        df = df.withColumn("filename", F.input_file_name())
    return df


def scan_schedule(
    spark: SparkSession, data_dir: str, schedule: str, **kw
) -> DataFrame:
    """Scan every quarter of one schedule by name — the reference's
    ``ffiec_scan_pqs(conn, "rc")`` entry (R/ffiec_manifest.R:217-290):
    a name-union scan over ``{schedule}_{YYYYMMDD}.parquet``."""
    return scan_pqs(
        spark, os.path.join(data_dir, f"{schedule}_[0-9]*.parquet"), **kw
    )


def pq_schema(path: str):
    """Footer-only schema read (no data I/O, no Spark job)."""
    import pyarrow.parquet as pq

    return pq.read_schema(path)


def pq_cols(path: str) -> list[str]:
    return list(pq_schema(path).names)


def pq_cols_by_type(path: str) -> dict[str, list[str]]:
    """{arrow type string: [column names]} from the footer only."""
    schema = pq_schema(path)
    out: dict[str, list[str]] = {}
    for field in schema:
        out.setdefault(str(field.type), []).append(field.name)
    return out


def list_pqs(data_dir: str) -> list[dict]:
    """List ``{schedule}_{YYYYMMDD}.parquet`` outputs with parsed fields."""
    rows = []
    for p in sorted(_glob(os.path.join(data_dir, "*.parquet"))):
        m = PQ_NAME_RE.search(os.path.basename(p))
        if m:
            rows.append(
                {"path": p, "schedule": m.group(1), "date_raw": m.group(2)}
            )
    return rows


def write_partitioned(
    df: DataFrame,
    out_dir: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> str:
    """The scale-mode sink: hive-partitioned directory layout.

    For the long EAV tables the natural key is ``date`` (one quarterly
    report per partition, mirroring the reference's one-file-per-
    (schedule, date) contract at directory granularity): a reader's
    ``WHERE date = ...`` then becomes partition pruning — zero I/O on
    other quarters, visible as PartitionFilters in the scan node.
    Low-cardinality partition keys only (date, schedule); never
    high-cardinality ones (IDRSSD) — millions of tiny directories kill
    any filesystem."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(out_dir)
    return out_dir


def compact_parquet_dir(
    spark,
    data_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 1,
) -> dict:
    """Small-files compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` balanced files.

    The maintenance operator every long-running ingest needs at scale —
    each incremental append adds files, and scan task-scheduling cost
    grows with file count until compaction folds them back to
    target-sized row groups.  Round-robin ``repartition(n)`` (not
    ``coalesce``) so output files are balanced regardless of input
    skew.

    The swap is two renames, NOT atomic: a crash between them leaves
    the data at ``<dir>._compact_old`` (recoverable by hand, nothing
    lost); stale ``._compact_tmp``/``._compact_old`` leftovers from a
    crashed run are cleaned up on entry so a retry always succeeds.
    On an object store / HDFS deployment, use a table format's commit
    (Iceberg/Delta rewrite) instead of directory renames."""
    tmp = data_dir.rstrip("/") + "._compact_tmp"
    old = data_dir.rstrip("/") + "._compact_old"
    for stale in (tmp, old):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    files = [
        p for p in _glob(os.path.join(data_dir, "*.parquet"))
        if os.path.isfile(p)
    ] + [
        p for p in _glob(os.path.join(data_dir, "part-*"))
        if os.path.isfile(p) and p.endswith(".parquet")
    ]
    files = sorted(set(files))
    if not files:
        raise ValueError(f"no parquet files found under {data_dir}")
    total = sum(os.path.getsize(p) for p in files)
    n_out = max(min_files, -(-total // target_file_bytes))
    # mergeSchema: incrementally-appended dirs are exactly where file
    # schemas drift; a bare read would silently adopt one file's schema
    # and the compaction would permanently drop the other files' columns.
    df = spark.read.option("mergeSchema", "true").parquet(*files)
    from pyspark.sql import Observation

    obs = Observation()
    df.observe(obs, F.count(F.lit(1)).alias("n")).repartition(n_out).write.mode(
        "overwrite"
    ).parquet(tmp)
    n_written = obs.get["n"]
    check = spark.read.parquet(tmp)
    n_check = check.count()
    if n_check != n_written or set(check.columns) != set(df.columns):
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compaction verify failed for {data_dir}: "
            f"rows {n_written} -> {n_check}, "
            f"cols {sorted(df.columns)} -> {sorted(check.columns)}; "
            "originals left untouched"
        )
    # Swap only after the rewrite is verified; the old dir survives any
    # crash between the renames (recoverable at <dir>._compact_old).
    os.rename(data_dir, old)
    os.rename(tmp, data_dir)
    shutil.rmtree(old)
    after = [
        p for p in _glob(os.path.join(data_dir, "part-*"))
        if p.endswith(".parquet")
    ]
    return {
        "files_before": len(files),
        "files_after": len(after),
        "bytes_before": total,
        "target_file_bytes": target_file_bytes,
    }


def write_single_parquet(
    df: DataFrame, out_path: str, sort_by: "list[str] | None" = None
) -> str:
    """Write exactly one parquet *file* at ``out_path`` (the reference's
    per-dataset contract).  Implemented as a single-partition directory
    write + rename; callers at scale should use ``df.write.parquet`` on
    a directory instead.

    ``sort_by``: optional column names establishing the FILE row order.
    The round-robin ``repartition(1)`` below discards any upstream
    ``orderBy`` (a shuffle does not preserve order), so callers that
    want a sorted file must say so here — the sink then runs
    ``sortWithinPartitions`` AFTER the final exchange, inside the one
    writing task, where it is a local sort of finished rows.  Without
    ``sort_by`` the file row order is explicitly NOT contractual.

    ``repartition(1)``, NOT ``coalesce(1)``: coalesce propagates the
    1-partition constraint INTO the upstream stage, so a grouped
    aggregation feeding the sink would execute its entire reduce side
    in one task — the round-14 ETL stage clock named exactly that
    (``long_build`` warm 1.7 s -> 5.8 s at 8x, the ingest's top
    grower).  repartition keeps the upstream plan at full parallelism
    and pays one extra exchange of the FINISHED rows; the single task
    then only encodes and writes.  A/B at 8x (80k banks,
    scripts/etl_bench.py warm pass, two samples each): long_build
    5.8 s -> 4.7/5.0 s, whole warm ingest 18.2 s -> 16.6/16.8 s; 1x
    warm 10.5 s -> 9.3 s.  The remaining long_build growth is the
    single-FILE contract's measured floor: one task per type must
    encode every row (4.8 M at 8x), linear work no core count can
    absorb — the at-scale paths are ``write_partitioned`` /
    ``merge_long_increment``, which this sink's callers document."""
    tmp = out_path + "._tmp"
    one = df.repartition(1)
    if sort_by:
        one = one.sortWithinPartitions(*sort_by)
    one.write.mode("overwrite").parquet(tmp)
    part = next(
        p for p in _glob(os.path.join(tmp, "part-*.parquet"))
    )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    if os.path.exists(out_path):
        os.remove(out_path)
    shutil.move(part, out_path)
    shutil.rmtree(tmp)
    return out_path
