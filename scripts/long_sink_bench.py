"""At-scale long-sink A/B: does the date-partitioned directory sink
(``write_partitioned``) scale near-linearly where the single-FILE
contract (``write_single_parquet``) has a measured floor?

Round 14's ETL stage clock proved the single-file long sink's residual
8x growth is the contract itself — one task per type must encode every
row.  The documented at-scale paths are ``write_partitioned`` (hive
layout, parallel encode per partition) and ``merge_long_increment``;
this script gives the partitioned sink its own 8x SCALECHECK row.

Input is the long-EAV shape the ETL emits (IDRSSD, date, item, value)
at 1x and 8x row counts (8x matches the ETL bench's 4.8M-row long
build), deterministic values, pre-split across the session's default
parallelism.  Each sink is timed min-of-N on a fresh tmp dir; the
single-file sink runs on the same frames as the contrast line.

Usage: python scripts/long_sink_bench.py [n_rows_1x] [reps]
Prints one JSON line {"sinks": {name: {"t1": s, "tN": s, "ratio": r}}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _long_frame(spark, n_rows: int):
    from pyspark.sql import functions as F

    # 4 quarterly dates x 150 items x enough banks to hit n_rows —
    # the ETL's long-EAV shape with its real partition cardinality
    # (dates are the partition key: low-cardinality by design)
    return (
        spark.range(n_rows)
        .select(
            (F.col("id") % 10_000 + 37).cast("int").alias("IDRSSD"),
            F.make_date(
                F.lit(2024),
                ((F.col("id") / 10_000).cast("long") % 4 * 3 + 1).cast("int"),
                F.lit(1),
            ).alias("date"),
            F.concat(
                F.lit("RCON"), (((F.col("id") / 40_000).cast("long")) % 150).cast("string")
            ).alias("item"),
            (F.col("id") % 997).cast("double").cast("string").alias("value"),
        )
        .repartition(32)
        .persist()
    )


def main() -> int:
    from ffiec_pq_spark.session import get_spark
    from ffiec_pq_spark.sources.parquet import (
        write_partitioned,
        write_single_parquet,
    )

    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    factor = 8
    spark = get_spark("long_sink_bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    frames = {}
    for scale, n in (("t1", n1), ("tN", n1 * factor)):
        df = _long_frame(spark, n)
        df.count()  # materialize the persisted input out of the timing
        frames[scale] = df

    sinks = {
        "write_partitioned_date": lambda df, d: write_partitioned(
            df, os.path.join(d, "long"), ["date"]
        ),
        "write_single_parquet": lambda df, d: write_single_parquet(
            df, os.path.join(d, "long.parquet")
        ),
    }
    out: dict = {}
    for name, fn in sinks.items():
        row = {}
        for scale, df in frames.items():
            best = float("inf")
            for _ in range(reps):
                d = tempfile.mkdtemp(prefix="long_sink_")
                try:
                    t0 = time.perf_counter()
                    fn(df, d)
                    best = min(best, time.perf_counter() - t0)
                finally:
                    shutil.rmtree(d, ignore_errors=True)
            row[scale] = round(best, 3)
        row["ratio"] = round(row["tN"] / row["t1"], 2)
        out[name] = row

    for df in frames.values():
        df.unpersist()
    print(
        json.dumps(
            {
                "metric": "long_sink_8x",
                "n_rows_1x": n1,
                "factor": factor,
                "reps": reps,
                "sinks": out,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
