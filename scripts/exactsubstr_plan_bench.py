"""Head-to-head of the ExactSubstr gram_plan variants (window /
recompute / persist) at base, 8x and 16x replicated documents.

The gram relation (tokenize + per-position md5) is the operator's
dominant CPU; `recompute` (the original two-branch shape) evaluates it
twice, `window` and `persist` once.  This measures all three on the
registered query shape (docs_exactsubstr_dup_rate without the oracle)
so the shipped default is the measured winner, per-round reproducible.

Usage: python scripts/exactsubstr_plan_bench.py [base_sf_dir] [factors...]
Prints one JSON line {"factor": {plan: best_sec, ...}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import getpass
    import hashlib
    import tempfile

    from scripts.scale_check import build_scaled

    from ffiec_pq_spark.operators.exactsubstr import exact_substring_dup_rate
    from ffiec_pq_spark.session import get_spark

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [8, 16]
    spark = get_spark("exactsubstr_plan_bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    dirs = {1: base}
    base_key = hashlib.md5(os.path.abspath(base).encode()).hexdigest()[:10]
    user = getpass.getuser()
    for f in factors:
        scaled = os.path.join(
            tempfile.gettempdir(), f"ffiec_scale{f}_{user}_{base_key}_cache"
        )
        build_scaled(spark, base, scaled, f)
        dirs[f] = scaled

    out: dict[str, dict[str, float]] = {}
    for f, d in dirs.items():
        docs = spark.read.parquet(f"{d}/documents.parquet")
        row: dict[str, float] = {}
        for plan in ("window", "recompute", "persist"):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                exact_substring_dup_rate(
                    docs, k=8, min_occurrences=2, gram_plan=plan
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                # persist pins checkpoint blocks; clear between reps so
                # the NEXT variant isn't measured under its storage
                spark.catalog.clearCache()
            row[plan] = round(best, 3)
            print(f"x{f:<3} {plan:10} {best:7.3f}s", file=sys.stderr, flush=True)
        out[f"x{f}"] = row
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
