"""BPE tokenizer training (first k merges) on the corpus — the
tokenizer-construction step of an LLM data pipeline, expressed in the
small-state driver pattern of operators/kmeans.py and operators/pca.py.

Scale design
------------
BPE trains on the TYPE table (distinct word, corpus frequency), not the
token stream: the cluster computes word frequencies (one shuffle with
map-side combine — the corpus-sized stage) and selects the top
``max_types`` types deterministically (TakeOrdered, no global sort).
The merge loop then runs driver-side over that bounded table — the same
shape as k-means centroids: per-iteration state is O(types · word_len),
independent of corpus size.

Deterministic cross-engine semantics (the SQL oracle unrolls the
identical loop):

- symbols are space-separated, padded (`` a b c ``); pair frequencies
  count every ADJACENT SYMBOL POSITION (so ``aaa`` counts (a,a) twice),
  weighted by type frequency — pure integer sums;
- the merge pair is argmax by (count DESC, left ASC, right ASC) —
  integer-deterministic;
- the merge applies as exactly TWO padded ``replace`` passes
  (`` l r `` -> `` lr ``).  One pass misses every second occurrence in
  a run (the consumed separator), two passes close the runs that occur
  in natural text; the double-replace IS the contract, and Python
  ``str.replace`` and SQL ``replace`` share its left-to-right
  non-overlapping semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_counts(sym: dict[str, str], freq: dict[str, int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for w, s in sym.items():
        parts = s.split()
        fw = freq[w]
        for a, b in zip(parts, parts[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + fw
    return counts


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    max_types: int = 300,
) -> DataFrame:
    """Train the first ``n_merges`` BPE merges on the corpus; returns a
    DataFrame (merge_rank, left_sym, right_sym, merged, pair_freq).

    Raises ``ValueError`` when the corpus runs out of mergeable pairs
    before ``n_merges`` (degenerate vocabulary) — fail fast rather than
    emit a short table the oracle can't replay."""
    from ffiec_pq_spark.operators.text import tokens

    spark = df.sparkSession
    wc = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_types)
        .collect()
    )
    freq = {r["word"]: r["freq"] for r in wc}
    sym = {w: " " + " ".join(w) + " " for w in freq}
    records = []
    for rank in range(1, n_merges + 1):
        counts = _pair_counts(sym, freq)
        if not counts:
            raise ValueError(
                f"bpe_train_merges: no adjacent pairs left after "
                f"{rank - 1} merges (vocabulary too small for "
                f"{n_merges})"
            )
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        pat = f" {left} {right} "
        rep = f" {left}{right} "
        sym = {w: s.replace(pat, rep).replace(pat, rep) for w, s in sym.items()}
        records.append((rank, left, right, left + right, c))
    return spark.createDataFrame(
        records,
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, pair_freq long",
    )
