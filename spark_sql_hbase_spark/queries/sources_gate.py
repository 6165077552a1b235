"""Source-format gate queries: CSV, JSON, and ORC.

SURVEY §2.B's "Scans/sources" row inherits ALL Spark file sources
(reference registers the stock `FileSourceStrategy` /
`DataSourceStrategy`, ``HBaseSessionStateBuilder.scala:97-99``); the rest
of the query packs exercise parquet and the custom ``keyedtable``
DataSource. These gates cover the remaining text + columnar formats by
ROUND-TRIP: rewrite a projection of ``lineitem`` through the format, read
it back, aggregate — so the oracle (DuckDB over the original parquet)
checks both the writer and the reader for value fidelity.

Fidelity notes per format:

- **CSV** is text: doubles survive because Spark writes shortest-roundtrip
  decimal strings and parses them back to the identical IEEE double;
  timestamps are excluded (format-string round-trips are
  precision/locale-lossy by design — parquet/ORC are the typed paths).
- **JSON** (JSON-lines): same textual-number argument; schema is supplied
  on read (inference would widen types).
- **ORC** is fully typed — timestamps included to prove it.

Scale: a round-trip gate is IO-shaped like a real ingest (write N rows,
read N rows, one map-side-combined agg); nothing here is driver-side.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_hbase_spark.functions.det import dsum, dsum_sql
from spark_sql_hbase_spark.queries import register, table

_AGG_ORACLE = f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           {dsum_sql('l_quantity', 'sum_qty')},
           {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem
    GROUP BY l_returnflag
"""

_COLS = ["l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"]


def _roundtrip(
    spark: SparkSession, sf_dir: str, fmt: str, with_ts: bool
) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        *_COLS, *(["l_shipdate"] if with_ts else [])
    )
    out = os.path.join(tempfile.mkdtemp(prefix=f"src_gate_{fmt}_"), "data")
    li.write.format(fmt).option("header", "true").mode("overwrite").save(out)
    # explicit schema on read: inference would widen/reorder types
    return (
        spark.read.format(fmt).schema(li.schema).option("header", "true").load(out)
    )


def _agg(back: DataFrame) -> list[F.Column]:
    return [
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_quantity", "sum_qty"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
    ]


@register(
    "q37_csv_source_roundtrip",
    oracle=_AGG_ORACLE,
    description="CSV write→read round-trip (text source), aggregate fidelity",
)
def q37_csv_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    back = _roundtrip(spark, sf_dir, "csv", with_ts=False)
    return back.groupBy("l_returnflag").agg(*_agg(back))


@register(
    "q38_json_source_roundtrip",
    oracle=_AGG_ORACLE,
    description="JSON-lines write→read round-trip, aggregate fidelity",
)
def q38_json_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    back = _roundtrip(spark, sf_dir, "json", with_ts=False)
    return back.groupBy("l_returnflag").agg(*_agg(back))


@register(
    "q39_orc_source_roundtrip",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           {dsum_sql('l_quantity', 'sum_qty')},
           {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')},
           strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_shipdate
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="ORC write→read round-trip (typed columnar), timestamps included",
)
def q39_orc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    back = _roundtrip(spark, sf_dir, "orc", with_ts=True)
    return back.groupBy("l_returnflag").agg(
        *_agg(back),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias(
            "max_shipdate"
        ),
    )
