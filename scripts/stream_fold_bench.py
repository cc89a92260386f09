"""Stream-fold amortization A/B: does the per-trigger fixed cost of
the dual-arm insert fold amortize as micro-batches carry more files at
FIXED corpus?

The README's class-(2) annotation says the ``stream_rrf_fold`` cold
(the full ingest-stream replay) is dominated by per-trigger fixed cost
— checkpoint round-trips, fold planning, the versioned-state merge —
that a deployment amortizes across thousands of documents per trigger.
This script measures that claim the ``scripts/ivf_scale_bench.py``
way: stage the SAME fusion corpus as 16 single-file chunks, then run
the identical fold with ``maxFilesPerTrigger`` in {1, 4, 16} (16, 4,
and 1 triggers respectively) and record the cold fold+serve wall.  If
the claim holds, wall drops steeply as trigger count falls while the
drained state stays hash-identical.

Usage: python scripts/stream_fold_bench.py [sf_dir] [reps]
Prints one JSON line {"configs": {files_per_trigger: {"sec": s,
"triggers": n}}, "corpus_rows": n}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from ffiec_pq_spark.queries.round14 import (
        _fusion_corpus,
        _rrf_serve,
        _rrf_stream_build,
    )
    from ffiec_pq_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_chunks = 16
    spark = get_spark("stream_fold_bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    corpus = _fusion_corpus(spark, sf_dir)
    n_rows = corpus.count()

    configs: dict = {}
    fingerprints: dict = {}
    for fpt in (1, 4, 16):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            st = _rrf_stream_build(
                spark, corpus, n_chunks=n_chunks, files_per_trigger=fpt
            )
            try:
                # serve forces the drained state end-to-end (the same
                # cold protocol bench.py times for stream_rrf_fold)
                served = _rrf_serve(spark, sf_dir, st)
                served.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                fingerprints[fpt] = sorted(
                    tuple(r) for r in served.collect()
                )
            finally:
                shutil.rmtree(st["workdir"], ignore_errors=True)
            spark.catalog.clearCache()
        configs[str(fpt)] = {
            "sec": round(best, 3),
            "triggers": (n_chunks + fpt - 1) // fpt,
        }
    assert (
        fingerprints[1] == fingerprints[4] == fingerprints[16]
    ), "drained serves diverged across trigger sizes"
    out = {
        "metric": "rrf_fold_cold_vs_files_per_trigger",
        "sf_dir": sf_dir,
        "corpus_rows": n_rows,
        "n_chunks": n_chunks,
        "reps": reps,
        "configs": configs,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
