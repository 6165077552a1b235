"""Local replica of the driver's DuckDB-oracle comparison: run a Spark
query and its oracle SQL on the same parquet tables, compare row count,
column names, and order-insensitive values (columns sorted by name).

The comparison is TYPE-SENSITIVE, like the driver's hash. Two traps this
catches that a stringified compare is blind to (round-1 failure class):

* DuckDB returns a bare integer ``SUM`` as HUGEINT (int128). Through
  ``fetchall()`` that is an ordinary Python int — indistinguishable from
  BIGINT — but through Arrow (the driver's path) HUGEINT materializes as
  float64, so the driver's hash differs from Spark's bigint even when
  every value matches. We therefore fetch the oracle result through
  ``.arrow()`` so the same widening happens locally, and we tag every
  value with its Python type class before comparing.
* Array/map-typed result columns kill the driver's rows-only digest
  (``pandas.unique`` on unhashable lists). ``compare`` fails fast on any
  non-scalar cell from either side.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os

import duckdb

from spark_sql_hbase_spark.queries import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


class UnhashableCell(Exception):
    """A result cell is a list/dict/set — breaks the driver's row digest."""


def _norm(v):
    """Normalize one cell to a (type-tag, canonical-value) pair.

    The tag separates the type *classes* the driver's hash is sensitive
    to: int vs float vs Decimal vs str vs bytes vs temporal vs None.
    """
    if v is None:
        return ("null", "")
    if isinstance(v, bool):
        return ("bool", str(v))
    if isinstance(v, int):
        return ("int", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", repr(v + 0.0))  # collapse -0.0 vs 0.0
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, bytes):
        return ("bytes", v.hex())
    if isinstance(v, _dt.datetime):
        return ("timestamp", v.isoformat())
    if isinstance(v, _dt.date):
        return ("date", v.isoformat())
    if isinstance(v, str):
        return ("str", v)
    if isinstance(v, (list, dict, set, tuple)):
        raise UnhashableCell(
            f"non-scalar result cell of type {type(v).__name__}: the driver's "
            "rows-only digest (pandas unique) dies on unhashable values — "
            "project arrays/maps into scalar columns"
        )
    return (type(v).__name__, str(v))


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    con = duck_connection(sf_dir)
    # Arrow path: HUGEINT/DECIMAL widenings surface exactly as the driver
    # sees them (HUGEINT -> float64), unlike fetchall()'s python ints.
    duck_tbl = con.sql(oracle_sql).arrow()
    duck_cols = duck_tbl.column_names
    duck_rows = [tuple(d.values()) for d in duck_tbl.to_pylist()]

    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    try:
        a = _canon(spark_rows, spark_cols)
    except UnhashableCell as e:
        return False, f"spark result: {e}"
    try:
        b = _canon(duck_rows, duck_cols)
    except UnhashableCell as e:
        return False, f"oracle result: {e}"
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"values differ; first diffs: {diff}"
    return True, "ok"
