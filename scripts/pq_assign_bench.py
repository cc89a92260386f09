"""Head-to-head of the two PQ assignment paths (literal expression vs
Arrow-batched pandas-UDF numpy scorer) across codebook sizes at base,
8x and 16x replicated embeddings.

The literal path emits k struct entries per row, each a sub_dim-element
zip_with fold — an expression tree of ~k·sub_dim nodes that grows with
codebook size until whole-stage-codegen degrades and ultimately fails;
the pandas path pays a fixed Arrow round-trip but its per-batch cost is
one vectorized (rows × k) distance matrix.  This measures the
crossover so the ``assign="auto"`` switch (_EXPR_MAX_FLOATS) is set
from data, not guessed: a full encode (pq_fit iters=2 + pq_codes to a
noop sink) per (k, path, factor) cell.

Usage: python scripts/pq_assign_bench.py [base_sf_dir] [factors...]
Prints one JSON line {"x8": {"k4_expr": sec, "k4_pandas": sec,
"k64_expr": sec, "k64_pandas": sec, ...}, ...}.
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

    from ffiec_pq_spark.operators.pq import pq_codes, pq_fit
    from ffiec_pq_spark.session import get_spark

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [8, 16]
    spark = get_spark("pq_assign_bench")
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

    def pipeline(d: str, k: int, assign: str) -> None:
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        books = pq_fit(
            emb, m=4, sub_dim=16, k=k, iters=2, assign=assign
        )
        pq_codes(emb, books, assign=assign).write.format("noop").mode(
            "overwrite"
        ).save()

    out: dict[str, dict[str, float]] = {}
    for f, d in dirs.items():
        row: dict[str, float] = {}
        for k in (4, 16, 64):
            for assign in ("expr", "pandas"):
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    pipeline(d, k, assign)
                    best = min(best, time.perf_counter() - t0)
                row[f"k{k}_{assign}"] = round(best, 3)
                print(
                    f"x{f:<3} k{k:<3} {assign:7} {best:7.3f}s",
                    file=sys.stderr,
                    flush=True,
                )
        out[f"x{f}"] = row
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
