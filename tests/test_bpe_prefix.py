"""Adversarial-input properties for BPE training and the prefix-filter
Jaccard join (their oracles pin the driver tables; these pin semantics
on constructed corners)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.operators.bpe import bpe_train_merges
from ffiec_pq_spark.operators.dedup import jaccard_pairs, jaccard_pairs_prefix


def test_bpe_first_merge_is_most_frequent_pair(spark):
    """On a corpus dominated by one bigram, that bigram merges first,
    and a run of repeats collapses fully under the two-pass contract."""
    rows = [(i, "abab abab cd") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = bpe_train_merges(df, "text", n_merges=3, max_types=10).collect()
    first = merges[0]
    assert (first["left_sym"], first["right_sym"]) == ("a", "b")
    # 'abab' has two (a,b) positions x 2 occurrences x 10 docs = 40;
    # tie-break and counting are deterministic
    assert first["pair_freq"] == 40
    second = merges[1]
    # after merging every 'a b' -> 'ab', the dominant pair is (ab, ab)
    assert (second["left_sym"], second["right_sym"]) == ("ab", "ab")


def test_bpe_merge_application_runs(spark):
    """A 4-long run 'a a a a' must fully collapse within the two-pass
    replace (pass one merges positions 1 and 3, pass two the rest)."""
    df = spark.createDataFrame([(1, "aaaa aaaa")], ["doc_id", "text"])
    merges = bpe_train_merges(df, "text", n_merges=2, max_types=10).collect()
    assert (merges[0]["left_sym"], merges[0]["right_sym"]) == ("a", "a")
    # second merge operates on the collapsed 'aa' symbols
    assert merges[1]["left_sym"] == "aa"


def test_prefix_filter_equals_naive_jaccard(spark):
    """jaccard_pairs_prefix == the uncapped naive join on a corpus with
    duplicates, near-dups, disjoint docs, and a doc too short to
    shingle."""
    import random

    rnd = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    base = [" ".join(rnd.choice(vocab) for _ in range(12)) for _ in range(12)]
    texts = []
    for t in base:
        texts.append(t)
        words = t.split()
        words[3] = "zz"  # near-dup
        texts.append(" ".join(words))
    texts += [texts[0], texts[0], "xx yy"]  # exact copies + short doc
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    fast = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_pairs_prefix(df, k=3, threshold=0.5).collect()
    )
    naive = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_pairs(
            df, k=3, threshold=0.5, max_shingle_df=None, collapse_exact=False
        ).collect()
    )
    assert fast == naive and len(fast) > 0
