"""Structured Streaming over the events table: watermarked tumbling
window aggregation and an incremental-ingest pattern.

The batch engine's ``tumbling_rollup`` (operators/windows.py) and this
streaming version share the same groupBy(window(...)) logical shape —
Catalyst plans the stateful incremental version automatically under
``readStream``.  The watermark bounds state: rows later than the
watermark relative to the max seen event time are dropped, and window
state older than it is evicted — that is what makes the aggregation
runnable forever at scale.

Local smoke: parquet source dir + memory sink + processAllAvailable()
(synchronous drain), tested in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the driver's ``events`` table with ``ts``
    normalized to native TIMESTAMP, whatever the parquet's rendering
    (ns-as-long legacy, µs NTZ, or native).

    ``readStream`` requires an explicit schema; hardcoding one silently
    mis-reads regenerated testdata (µs values integer-divided as if
    they were ns collapse onto epoch), so the schema comes from a batch
    footer read of the same file — a metadata-only operation."""
    import os

    from ffiec_pq_spark.session import ensure_session_confs, normalize_event_ts

    ensure_session_confs(spark)
    batch = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    stream = (
        spark.readStream.format("parquet")
        .schema(batch.schema)
        # file sources stream a directory; glob-filter to the one table
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return normalize_event_ts(stream)


def read_event_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of event parquet/json drops (one file per
    micro-batch locally; kafka source at scale — same downstream plan)."""
    return (
        spark.readStream.format("parquet")
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(source_dir)
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregate per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drive a streaming plan to completion against current files
    (append mode with watermark: only finalized windows emit)."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
