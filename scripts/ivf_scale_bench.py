"""Dense-arm (IVF cell-join) scale A/B: does sqrt(N)-scaled cell count
keep the PER-QUERY candidate work bounded when the corpus grows?

The SCALECHECK harness replicates BOTH sides of the retrieval queries —
corpus AND the eval-slice query set — so its wall ratio compounds
(8x queries) x (per-query cost), which no deployment sees: a corpus
8x-ing does not 8x your query set.  This script separates the two, the
``scripts/pq_assign_bench.py`` / ``exactsubstr_plan_bench.py``
precedent for measured scale annotations:

- ``base``      : sf0.1 corpus, sf0.1 queries, 4 cells (the registered
                  geometry — the oracle-certified configuration);
- ``scaled_qfix``: 8x corpus, BASE query set, round(4*sqrt(8))=11
                  cells — the production shape (corpus grows, query
                  set does not; cells sized ~sqrt(N));
- ``scaled_qrep``: 8x corpus, 8x queries, 11 cells — the SCALECHECK
                  harness's both-sides shape, for reference.

Each config reports min-of-3 wall seconds for the full dense top-k
(cell assignment + candidate cell-join + exact cosine re-rank) and the
candidate-pair count (the cell join's output size — the quantity the
cell geometry is supposed to bound).

Usage: python scripts/ivf_scale_bench.py [base_sf_dir] [factor]
Prints one JSON line {"configs": {name: {"sec": s, "pairs": n,
"cells": k, "queries": q}}}.
"""

from __future__ import annotations

import getpass
import hashlib
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import functions as F

    from ffiec_pq_spark.queries.round13c import (
        _corpus_cells,
        _dense_rank_cells,
        _query_cells,
        _valid_vectors,
    )
    from ffiec_pq_spark.session import get_spark
    from scripts.scale_check import build_scaled

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    base_key = hashlib.md5(os.path.abspath(base).encode()).hexdigest()[:10]
    scaled = os.path.join(
        tempfile.gettempdir(),
        f"ffiec_scale{factor}_{getpass.getuser()}_{base_key}_cache",
    )
    spark = get_spark("ffiec_ivf_scale_bench")
    build_scaled(spark, base, scaled, factor)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    def emb(d):
        return _valid_vectors(spark.read.parquet(f"{d}/embeddings.parquet"))

    cells_scaled = max(4, round(4 * factor ** 0.5))
    configs = {
        "base": (base, base, 4),
        "scaled_qfix": (base, scaled, cells_scaled),
        "scaled_qrep": (scaled, scaled, cells_scaled),
    }
    out = {}
    for name, (qdir, cdir, nc) in configs.items():
        q = emb(qdir).filter(F.col("vec_id") % 10 == 0)
        c = emb(cdir).filter(F.col("vec_id") % 10 != 0)
        qcell = _query_cells(q, nc)
        ccell = _corpus_cells(c, nc)
        pairs = ccell.join(F.broadcast(qcell), "cell").count()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _dense_rank_cells(
                _query_cells(q, nc), _corpus_cells(c, nc)
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = {
            "sec": round(best, 3),
            "pairs": pairs,
            "cells": nc,
            "queries": q.count(),
        }
        print(f"{name:12} cells={nc:3} pairs={pairs:>12,} "
              f"sec={out[name]['sec']}", file=sys.stderr, flush=True)
        spark.catalog.clearCache()
    print(json.dumps({"factor": factor, "configs": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
