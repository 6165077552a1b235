"""Source-format gate query: CSV, JSON, ORC, and XML round-trips in one gate.

SURVEY §2.B's "Scans/sources" row inherits ALL Spark file sources
(reference registers the stock `FileSourceStrategy` /
`DataSourceStrategy`, ``HBaseSessionStateBuilder.scala:97-99``); the rest
of the query packs exercise parquet and the custom ``keyedtable``
DataSource. This gate covers the remaining text + columnar formats by
ROUND-TRIP: rewrite a projection of ``lineitem`` through each format, read
it back, aggregate, union the tagged results — so the oracle (DuckDB
over the original parquet) checks writer AND reader value fidelity for all
four formats in one driver row (merged round-1 q37/q38/q39 so the whole
family carries driver signal inside the 50-entry window).

Fidelity notes per format:

- **CSV** is text: doubles survive because Spark writes shortest-roundtrip
  decimal strings and parses them back to the identical IEEE double;
  timestamps are excluded (format-string round-trips are
  precision/locale-lossy by design — parquet/ORC are the typed paths), so
  the csv/json branches carry a NULL ``max_shipdate``.
- **JSON** (JSON-lines): same textual-number argument; schema is supplied
  on read (inference would widen types).
- **ORC** is fully typed — timestamps included to prove it.
- **XML** (Spark 4 built-in source): text-typed like CSV/JSON — same
  shortest-roundtrip double argument; schema supplied on read.

Scale: a round-trip gate is IO-shaped like a real ingest (write N rows,
read N rows, one map-side-combined agg per format); nothing here is
driver-side, and the branches share nothing, so they pipeline as
independent stages.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_hbase_spark.functions.det import dsum, dsum_sql
from spark_sql_hbase_spark.queries import register, table

_AGG_BODY = f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           {dsum_sql('l_quantity', 'sum_qty')},
           {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')},
           {{max_shipdate}} AS max_shipdate
    FROM lineitem
    GROUP BY l_returnflag
"""

_ORACLE = " UNION ALL ".join(
    f"SELECT '{fmt}' AS fmt, * FROM ({_AGG_BODY.format(max_shipdate=ms)})"
    for fmt, ms in [
        ("csv", "CAST(NULL AS VARCHAR)"),
        ("json", "CAST(NULL AS VARCHAR)"),
        ("orc", "strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S')"),
        ("xml", "CAST(NULL AS VARCHAR)"),
    ]
)

_COLS = ["l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"]


_FMT_OPTS = {
    "csv": {"header": "true"},
    # XML is native in Spark 4 (built-in spark-xml); rowTag is mandatory
    "xml": {"rootTag": "rows", "rowTag": "row"},
}


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str, with_ts: bool) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        *_COLS, *(["l_shipdate"] if with_ts else [])
    )
    out = os.path.join(tempfile.mkdtemp(prefix=f"src_gate_{fmt}_"), "data")
    opts = _FMT_OPTS.get(fmt, {})
    li.write.format(fmt).options(**opts).mode("overwrite").save(out)
    # explicit schema on read: inference would widen/reorder types
    return spark.read.format(fmt).schema(li.schema).options(**opts).load(out)


def _branch(spark: SparkSession, sf_dir: str, fmt: str, with_ts: bool) -> DataFrame:
    back = _roundtrip(spark, sf_dir, fmt, with_ts)
    max_ship = (
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd HH:mm:ss")
        if with_ts
        else F.max(F.lit(None).cast("string"))
    )
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity", "sum_qty"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            max_ship.alias("max_shipdate"),
        )
        .select(F.lit(fmt).alias("fmt"), "*")
    )


@register(
    "zb04_multiformat_roundtrip",
    oracle=_ORACLE,
    description="CSV + JSON + ORC + XML write→read round-trips, tagged "
    "aggregate fidelity union (ORC branch proves typed timestamps; XML is "
    "Spark 4's built-in source)",
)
def zb04_multiformat_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _branch(spark, sf_dir, "csv", with_ts=False)
        .unionAll(_branch(spark, sf_dir, "json", with_ts=False))
        .unionAll(_branch(spark, sf_dir, "orc", with_ts=True))
        .unionAll(_branch(spark, sf_dir, "xml", with_ts=False))
    )
