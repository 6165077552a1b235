"""Query registry: every operator from SURVEY.md §2 is exercised by at
least one named query with (where SQL-expressible) a DuckDB oracle.

``REGISTRY`` maps name → :class:`QueryDef`; ``__spark_entry__.py`` exposes
it to the driver via ``queries()`` / ``oracle_sql()``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    description: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, description: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, description=description)
        return fn

    return deco


def _nanos_ts_columns(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) — Spark's reader
    rejects them outright (PARQUET_TYPE_ILLEGAL), so they need the
    nanosAsLong escape hatch + explicit µs conversion."""
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    return [f.name for f in schema if str(f.type) == "timestamp[ns]"]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver parquet table, normalizing ns-timestamps to µs.

    The µs value is ``nanos div 1000`` (integer floor-division — double
    arithmetic would lose precision above 2^53), matching the truncation
    DuckDB applies when it reads the same file.
    """
    from pyspark.sql import functions as F

    # Deterministic timestamp semantics regardless of who built the
    # session (the driver's harness session may not pin a timezone).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_ts_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # µs-precision naive parquet timestamps (isAdjustedToUTC=false) come
    # back as TIMESTAMP_NTZ under Spark's inferTimestampNTZ default; the
    # streaming operators need event-time columns to be TIMESTAMP (LTZ),
    # and with the session timezone pinned to UTC the cast maps the naive
    # value to the identical instant — same semantics the ns path above
    # (timestamp_micros → LTZ) has always produced.
    from pyspark.sql.types import TimestampNTZType

    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def assert_multiset_equal(a: DataFrame, b: DataFrame) -> None:
    """Assert two DataFrames are multiset-equal in ONE Spark action.

    ``a == b`` as multisets iff BOTH ``a.exceptAll(b)`` and
    ``b.exceptAll(a)`` are empty iff their union is empty — so the
    replication gates' convergence check runs as one ``isEmpty`` job
    over the unioned symmetric difference instead of two separate
    actions that each re-scan both stores (guide §1.2: fewer passes)."""
    diff = a.exceptAll(b).unionAll(b.exceptAll(a))
    assert diff.isEmpty(), "multiset divergence between source and replica"


def load_all() -> dict[str, QueryDef]:
    """Import every query module so REGISTRY is fully populated."""
    from spark_sql_hbase_spark.queries import relational  # noqa: F401
    from spark_sql_hbase_spark.queries import llm  # noqa: F401
    from spark_sql_hbase_spark.queries import keyed  # noqa: F401
    from spark_sql_hbase_spark.queries import streaming_gate  # noqa: F401
    from spark_sql_hbase_spark.queries import sources_gate  # noqa: F401

    return REGISTRY
