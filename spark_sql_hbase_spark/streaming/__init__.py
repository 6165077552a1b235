"""Structured Streaming surface of the engine.

The reference registers Spark's stock streaming resolution rule
(``ResolveWriteToStream``, ``HBaseSessionStateBuilder.scala:62``) but ships
no streaming code of its own (SURVEY §1.1 "Stream" row) — the capability it
exposes is *stock Structured Streaming*. This package provides that surface
Spark-first, plus the stateful operators a training-data ingest pipeline
needs: watermarked tumbling/sliding aggregation, streaming dedup, and
custom session windows via ``applyInPandasWithState``.
"""

from spark_sql_hbase_spark.streaming.pipelines import (
    sessionize_stream,
    streaming_dedup,
    windowed_event_counts,
)

__all__ = ["windowed_event_counts", "streaming_dedup", "sessionize_stream"]
