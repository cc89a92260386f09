"""Head-to-head of the k-center loop's lineage strategies (round-10
localCheckpoint pin vs the unpinned select-on-select chain) at k=64 on
base and 8x replicated embeddings.

The unpinned loop deepens the state plan by one ``least(...)``
projection per round: Catalyst re-analyzes the whole chain before
every round's top-1 job and the base scan is re-read through k stacked
projections.  The pinned loop (checkpoint_every=32, the shipped
default) truncates the chain and persists the base relation, so both
analysis time and per-round input cost stay bounded in k.

Usage: python scripts/kcenter_plan_bench.py [base_sf_dir] [factors...]
Prints one JSON line {"x1": {"pinned": sec, "unpinned": sec}, ...}.
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

    from ffiec_pq_spark.operators.coreset import kcenter_select
    from ffiec_pq_spark.session import get_spark

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [8]
    spark = get_spark("kcenter_plan_bench")
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
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        row: dict[str, float] = {}
        for label, every in (("pinned", 32), ("unpinned", 0)):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                kcenter_select(emb, k=64, checkpoint_every=every)
                best = min(best, time.perf_counter() - t0)
            row[label] = round(best, 3)
            print(
                f"x{f:<3} {label:9} {best:7.3f}s",
                file=sys.stderr,
                flush=True,
            )
        out[f"x{f}"] = row
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
