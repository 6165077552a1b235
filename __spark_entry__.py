"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2, as
(spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
genuinely engine-specific ops, e.g. approximate sketches).

All real logic lives in the ``spark_sql_hbase_spark`` package; this module
is only the wiring.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-style multi-way
    join + deterministic aggregation (exercises scan, broadcast + shuffle
    joins, and hash aggregation in one plan)."""
    from spark_sql_hbase_spark.queries import load_all

    return load_all()["a01_regional_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spark_sql_hbase_spark.queries import load_all

    return {name: qd.fn for name, qd in sorted(load_all().items())}


def oracle_sql() -> dict[str, str]:
    from spark_sql_hbase_spark.queries import load_all

    return {
        name: qd.oracle
        for name, qd in sorted(load_all().items())
        if qd.oracle is not None
    }
