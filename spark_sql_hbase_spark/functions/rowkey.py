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
(zero-padded dense sequence) but assign it distributed (two-pass
per-partition count + offset, the classic zipWithIndex shape — no
single-partition exchange anywhere); ``uuid`` and ``snowflake`` remain
the coordination-free choices for write-heavy scale.
"""

from __future__ import annotations

from typing import Callable, Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_sql_hbase_spark.catalog import ROW_KEY

# monotonically_increasing_id layout: partition id in the upper 31 bits,
# dense 0-based record number within the partition in the lower 33
_MID_RECORD_BITS = 33


def sequence_row_key(df: DataFrame, start_at: int = 0, width: int = 4) -> DataFrame:
    """Dense zero-padded sequence continuing from ``start_at`` (reference
    default-generator semantics: ignores any user-supplied key and assigns
    ``%0{width}d`` counters — ``DefaultRowKeyGenerator.java:11-19``).

    Distributed two-pass assignment (the zipWithIndex shape): pass 1
    counts rows per partition (one tiny job, one row per partition —
    bounded driver metadata, same class as the store's max-key lookup);
    pass 2 assigns ``start_at + offset[pid] + local_idx + 1`` row-locally,
    where ``local_idx`` is the dense per-partition record number carried
    in ``monotonically_increasing_id``'s low bits.  No window, no
    single-partition exchange — the round-2 global ``row_number`` was the
    last single-partition shape left in the write path.  Requires the
    usual Spark determinism assumption (identical partition sizes across
    the two passes), which also underpinned the old window's ordering.
    """
    pid = F.spark_partition_id()
    sizes = df.groupBy(pid.alias("__pid")).agg(F.count(F.lit(1)).alias("__n")).collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(sizes, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["__n"]
    if offsets:
        off = F.element_at(
            F.create_map(*[F.lit(x) for p_o in sorted(offsets.items()) for x in p_o]),
            pid,
        )
    else:
        off = F.lit(0)
    local = F.monotonically_increasing_id() - (
        pid.cast("long") * F.lit(1 << _MID_RECORD_BITS)
    )
    return df.withColumn(
        ROW_KEY,
        F.format_string(
            f"%0{width}d", F.lit(start_at) + F.coalesce(off, F.lit(0)) + local + 1
        ),
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
