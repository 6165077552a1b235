"""Pluggable row-key generators — the PySpark rebuild of the reference's
``RowKeyGenerator`` extension point (``execution/RowKeyGenerator.scala:6-10``;
default impl ``execution/DefaultRowKeyGenerator.java:11-19``; reflective
per-table loading ``InsertIntoHBaseTable.scala:37-46``; declared per table
in the schema registry, reference ``test.yml:4-5`` / ``README.md:24-26``).

A generator is a callable ``(df, start_at) -> df`` that adds/overwrites the
``row_key`` column. Names are resolved through :data:`GENERATORS`, the
analogue of the reference's reflective class loading.

Scale notes: the reference's default generator is an in-process atomic
counter, explicitly "unusable in distributed env" (its own comment,
``DefaultRowKeyGenerator.java:9``). We keep its *observable* semantics
(zero-padded dense sequence) for parity/tests via a global window — a
driver-side bottleneck by construction — and provide ``uuid`` and
``snowflake`` generators as the distributed-safe choices for real scale.
"""

from __future__ import annotations

from typing import Callable, Protocol

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from spark_sql_hbase_spark.catalog import ROW_KEY


def sequence_row_key(df: DataFrame, start_at: int = 0, width: int = 4) -> DataFrame:
    """Dense zero-padded sequence continuing from ``start_at`` (reference
    default-generator semantics: ignores any user-supplied key and assigns
    ``%0{width}d`` counters — ``DefaultRowKeyGenerator.java:11-19``).

    Global ``row_number`` = one single-partition exchange; correct but
    intentionally not for big data — exactly like the reference's default.
    """
    w = W.orderBy(F.monotonically_increasing_id())
    return df.withColumn(
        ROW_KEY,
        F.format_string(f"%0{width}d", F.row_number().over(w) + F.lit(start_at)),
    )


def uuid_row_key(df: DataFrame, start_at: int = 0) -> DataFrame:
    """Random UUID keys — fully parallel, collision-negligible."""
    return df.withColumn(ROW_KEY, F.uuid())


def snowflake_row_key(df: DataFrame, start_at: int = 0) -> DataFrame:
    """Sortable distributed keys from ``monotonically_increasing_id``
    (partition-id ⊕ per-partition counter), zero-padded hex — the
    shuffle-free scale path that still yields a usable sort key."""
    return df.withColumn(
        ROW_KEY, F.format_string("%016x", F.monotonically_increasing_id())
    )


GENERATORS: dict[str, Callable[..., DataFrame]] = {
    "sequence": sequence_row_key,
    "default": sequence_row_key,  # reference's DefaultRowKeyGenerator analogue
    "uuid": uuid_row_key,
    "snowflake": snowflake_row_key,
}


def resolve(name: str | None) -> Callable[..., DataFrame]:
    """Resolve a generator by registry name (analogue of the reflective
    ``Utils.classForName`` load in ``InsertIntoHBaseTable.scala:37-46``)."""
    if not name:
        return sequence_row_key
    key = name.rsplit(".", 1)[-1].lower().replace("rowkeygenerator", "") or "default"
    try:
        return GENERATORS[key]
    except KeyError:
        raise ValueError(
            f"Unknown row-key generator {name!r}; known: {sorted(GENERATORS)}"
        ) from None
