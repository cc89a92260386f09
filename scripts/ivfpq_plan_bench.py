"""Head-to-head of the IVF-PQ residual-relation variants (recompute /
persist) at base, 8x and 16x replicated embeddings.

The residual relation (coarse assignment fold + per-element rounded
subtraction) is recomputed from the parquet scan by every PQ Lloyd
iteration and by the final encode under the lazy `recompute` shape
(4+ evaluations); `persist` pins it once in memory.  At the certified
geometry the coarse fold is k_co x dim multiply-adds per row per
evaluation — this measures whether pinning beats recomputing on the
full registered pipeline shape (ann_ivfpq_residual_topk without the
oracle), per-round reproducible.

Usage: python scripts/ivfpq_plan_bench.py [base_sf_dir] [factors...]
Prints one JSON line {"x1": {plan: best_sec, ...}, ...}.
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

    from ffiec_pq_spark.operators.kmeans import kmeans_fit
    from ffiec_pq_spark.operators.pq import (
        ivfpq_adc_topk,
        ivfpq_codes,
        ivfpq_probed_cells,
        ivfpq_residuals,
        pq_fit,
    )
    from ffiec_pq_spark.queries.similarity import _DIM, _PROBE
    from ffiec_pq_spark.session import get_spark

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [8, 16]
    spark = get_spark("ivfpq_plan_bench")
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

    def pipeline(d: str, persist: bool) -> None:
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        coarse = kmeans_fit(emb, k=4, dim=_DIM, iters=2)
        resid = ivfpq_residuals(emb, coarse)
        if persist:
            resid = resid.persist()
        books = pq_fit(
            resid, vec_col="rv", id_col="id", m=4, sub_dim=16, k=4, iters=2
        )
        codes = ivfpq_codes(resid, books)
        probed = ivfpq_probed_cells(spark, coarse, _PROBE, 2)
        ivfpq_adc_topk(codes, coarse, books, _PROBE, probed, top_k=10).write.format(
            "noop"
        ).mode("overwrite").save()
        if persist:
            resid.unpersist()

    out: dict[str, dict[str, float]] = {}
    for f, d in dirs.items():
        row: dict[str, float] = {}
        for plan in ("recompute", "persist"):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                pipeline(d, plan == "persist")
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            row[plan] = round(best, 3)
            print(f"x{f:<3} {plan:10} {best:7.3f}s", file=sys.stderr, flush=True)
        out[f"x{f}"] = row
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
