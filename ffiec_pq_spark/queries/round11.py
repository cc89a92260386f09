"""Round-11 queries: the bounded-state streaming near-dup variant
(watermark-expiring band-signature state — the long-lived-deploy shape
``stream_minhash_neardup``'s docstring names) and the skewed derived-
partsupp TPC-H Q2 variant (min-cost argmax under manufactured ties and
a hot supplier).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.queries.round8 import _stream_neardup_oracle
from ffiec_pq_spark.session import load_table


@register(
    "stream_minhash_neardup_bounded",
    _stream_neardup_oracle(),
    tags=["streaming", "dedup", "approx", "stateful"],
)
def stream_minhash_neardup_bounded(spark, sf_dir):
    """Streaming NEAR-duplicate dedup with BOUNDED state — the variant
    a 1000-trigger deploy runs: instead of folding band rows into an
    ever-growing parquet relation (``stream_minhash_neardup``), each
    live band signature keeps one (min doc id, last event time) state
    entry, EVICTED once it falls a full watermark horizon behind the
    stream's event-time high water mark.  State is O(band signatures
    active within the horizon), not O(corpus history) — the same bound
    ``stream_dedup_bounded_state`` certifies for exact dedup, applied
    to LSH bands.

    Per trigger: signatures for the arriving docs only (codegen'd
    explode+groupBy — see ``run_neardup_bounded_stream`` for why the
    per-key Python state store and the pure-HOF signature both lost
    the A/B), one keyed min-merge into the pinned state relation, an
    emit join producing each later doc's (id, smallest earlier id in
    bucket) immediately, and the horizon eviction filter.  Docs are
    staged in doc-id order (event time = epoch + doc_id seconds), so
    the drained pairs reproduce the batch LSH answer exactly —
    certified against the SAME oracle as the parquet-fold variant
    (with the horizon wider than the stream's timespan, bounding
    state must not change results).

    Output: (doc_id, dup_of) where dup_of = the smallest doc id
    sharing >= 1 of its 8 band signatures."""
    from ffiec_pq_spark.streaming.neardup import run_neardup_bounded_stream

    return run_neardup_bounded_stream(spark, sf_dir)
