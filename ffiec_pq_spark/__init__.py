"""ffiec_pq_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference package ``iangow/ffiec.pq``.

The reference (see SURVEY.md) is an ETL + query system that turns FFIEC
bulk zip files into typed Parquet and exposes a small lazy relational
surface (schema-union scans, wide<->long reshaping, integrity checks)
executed by DuckDB.  This package re-expresses every one of those
capabilities Spark-first: declarative DataFrame plans optimized by
Catalyst, broadcast joins for the small dimension sides, Arrow-batched
Pandas UDFs only where built-ins genuinely cannot express the semantics
(XBRL XML parsing, malformed-TSV repair).

Layout
------
- ``session``    : SparkSession factory tuned for the target cluster.
- ``sources``    : parquet scan-union, zip manifests, TSV/POR readers, XBRL.
- ``functions``  : scalar column expressions (NULL tokens, pct->prop, tz).
- ``operators``  : relational ops (combine-parts join, pivot/unpivot,
                   integrity checks) + scale extensions (dedup, similarity,
                   text analysis, multimodal plumbing).
- ``streaming``  : Structured Streaming over the events table.
- ``plans``      : plan-inspection helpers (pushdown / broadcast asserts).
"""

from ffiec_pq_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
