"""spark_sql_hbase_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference system
``wangpy1995/Spark-SQL-HBase`` (a Scala extension of Spark SQL that makes
HBase tables first-class: custom session, external catalog, scan exec with
predicate pushdown, insert path with pluggable row-key generation, HFile
bulk read/write — see SURVEY.md), re-expressed Spark-first:

- keyed tables = key-sorted, range-partitioned Parquet ("regions" =
  range partitions; "HFiles" = sorted parquet files) — pruning/pushdown
  come from Catalyst + the Parquet reader instead of hand-built filters;
- full Spark SQL surface (joins/aggs/windows/set-ops/UDFs/streaming) via
  ``spark.sql`` / DataFrame API, exactly as the reference inherits it;
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns) designed for 100 TB scale: partition-parallel,
  shuffle-bounded, no driver materialization.
"""

from spark_sql_hbase_spark.session import EngineSession, build_spark

__version__ = "0.1.0"

__all__ = ["EngineSession", "build_spark", "__version__"]
