"""Driver-faithful correctness gate replica.

Unlike tests/oracle_compare.py (which compares via ``fetchall``), this
goes through PANDAS on both sides exactly like the round driver does —
so it reproduces the driver-only failure modes:

- DuckDB HUGEINT (sum of integers) -> float64 in ``.df()`` -> stringifies
  as ``2.0`` while Spark's bigint stringifies as ``2``;
- array-typed output columns crash ``DataFrame.sort_values``.

Usage: python scripts/driver_check.py [sf_dir] [query ...]
Prints one line per query and a JSON summary; exit 1 on any failure.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _cell(v):
    """Stringify one cell, normalizing the date/datetime/null renderings
    that the real driver treats as equal (its round-1 hashes accepted
    Spark date vs DuckDB datetime64[ns] columns)."""
    import datetime

    import pandas as pd

    if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
        return "NULL"
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time(0, 0) and v.tzinfo is None:
            return v.date().isoformat()
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def canon(pdf):
    """Mimic the driver's canonicalizer: columns sorted by name,
    rows sorted by all columns, cells stringified."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    try:
        pdf = pdf.sort_values(by=cols).reset_index(drop=True)
    except TypeError as e:  # unhashable (list) column — driver errs here
        return None, f"canon_err: {type(e).__name__}: {e}"
    rows = [
        tuple(_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return rows, None


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from ffiec_pq_spark import catalog

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # bare session on purpose: the driver builds its own (no repo confs);
    # SPARK_GRAFT_TZ exercises the non-UTC-session hardening
    builder = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("driver_check")
    )
    if os.environ.get("SPARK_GRAFT_TZ"):
        builder = builder.config(
            "spark.sql.session.timeZone", os.environ["SPARK_GRAFT_TZ"]
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = catalog.queries()
    oracles = catalog.oracles()
    results: dict[str, dict] = {}
    failed = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.time()
        rec: dict = {"hash_match": None, "err": None}
        try:
            sdf = queries[name](spark, sf_dir)
            spdf = sdf.toPandas()
            # flag schemas the driver can't canonicalize regardless
            bad_cols = [
                c for c in spdf.columns
                if len(spdf) and isinstance(spdf[c].iloc[0], (list, tuple))
                or str(spdf[c].dtype) == "object"
                and len(spdf)
                and hasattr(spdf[c].iloc[0], "__len__")
                and not isinstance(spdf[c].iloc[0], (str, bytes))
            ]
            if bad_cols:
                rec["err"] = f"array-typed output cols: {bad_cols}"
            elif name not in oracles:
                rec["rows_only"] = len(spdf)
                rec["hash_match"] = "rows_only"
            else:
                dpdf = con.execute(oracles[name]).df()
                s_rows, s_err = canon(spdf)
                d_rows, d_err = canon(dpdf)
                if s_err or d_err:
                    rec["err"] = s_err or d_err
                elif len(s_rows) != len(d_rows):
                    rec["err"] = f"rows: spark={len(s_rows)} duck={len(d_rows)}"
                else:
                    diffs = [
                        (i, a, b)
                        for i, (a, b) in enumerate(zip(s_rows, d_rows))
                        if a != b
                    ]
                    if diffs:
                        i, a, b = diffs[0]
                        rec["err"] = (
                            f"{len(diffs)}/{len(s_rows)} rows differ; "
                            f"first row {i}: spark={a!r} duck={b!r}"
                        )
                    else:
                        rec["hash_match"] = True
                        rec["rows"] = len(s_rows)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {str(e)[:300]}"
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        # the dedup/winnow family persists session-lifetime caches;
        # 130+ sequential queries would otherwise accumulate them
        # (same hygiene as scale_check — correctness is unaffected,
        # but GC pressure skews the per-query seconds)
        spark.catalog.clearCache()
        ok = rec["err"] is None
        if not ok:
            failed.append(name)
        print(
            f"{'PASS' if ok else 'FAIL':4} {name:40} {rec['sec']:7.2f}s"
            + ("" if ok else f"  {rec['err'][:160]}"),
            flush=True,
        )

    n = len(results)
    print(f"\n{n - len(failed)}/{n} pass; failures: {failed}")
    out_path = os.path.join(REPO, "driver_check_last.json")
    if only and os.path.exists(out_path):
        # a targeted re-check must MERGE into the committed full-run
        # artifact, not clobber it down to the subset
        with open(out_path) as f:
            merged = json.load(f)
        merged.update(results)
        # drop rows for queries that no longer exist in the registry —
        # a renamed/removed query must not keep a stale green row alive
        results = {k: v for k, v in merged.items() if k in queries}
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, default=str)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
