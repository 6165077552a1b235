"""Reference-parity fixtures: deterministic tables reproducing the
reference's test corpus (FIXTURES.md; fixture law from the reference's
``TestHBase.insertData``, ``src/test/scala/.../client/TestHBase.scala:43-83``).

Value law for ``pw.test``: cell of column ``{cf}:{cf}_{qq}`` at row
``rrrr`` is the string ``"{cf}_{qq}_{rrrr}"`` (zero-padded widths 2/4) —
every cell derivable from (cf, qualifier, rowkey), the reference's
substitute for golden files.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_hbase_spark.catalog import TableSpec
from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore

N_ROWS = 1000
N_QUALIFIERS = 10
CFS = ("A", "B")


def pw_test_spec() -> TableSpec:
    return TableSpec(
        namespace="pw",
        name="test",
        key_type="string",
        families={cf: {f"{cf}_{q:02d}": "string" for q in range(N_QUALIFIERS)} for cf in CFS},
        split_keys=["0250", "0500", "0750"],
    )


def pw_test_df(spark: SparkSession) -> DataFrame:
    base = spark.range(N_ROWS).select(
        F.format_string("%04d", F.col("id")).alias("row_key")
    )
    cols = [
        F.concat(F.lit(f"{cf}_{q:02d}_"), F.col("row_key")).alias(f"{cf}:{cf}_{q:02d}")
        for cf in CFS
        for q in range(N_QUALIFIERS)
    ]
    return base.select("row_key", *cols)


def pw_test_insert_spec() -> TableSpec:
    return TableSpec(
        namespace="pw",
        name="test_insert",
        key_type="string",
        families={"T": {"T_00": "string"}},
        generator="default",  # reference's DefaultRowKeyGenerator (overrides keys)
    )


def pw_typed_spec() -> TableSpec:
    return TableSpec(
        namespace="pw",
        name="typed",
        key_type="string",
        families={
            "t": {
                "c_bool": "boolean",
                "c_byte": "byte",
                "c_short": "short",
                "c_int": "int",
                "c_long": "long",
                "c_float": "float",
                "c_double": "double",
                "c_string": "string",
                "c_ts": "timestamp",
                "c_bin": "binary",
            }
        },
    )


def pw_typed_df(spark: SparkSession) -> DataFrame:
    """Full primitive-type coverage incl. negatives and NULL stripes
    (every column except row_key NULL when i % 97 == 0)."""
    i = F.col("id")
    null_stripe = (i % 97) == 0

    def n(col):  # apply the null stripe
        return F.when(~null_stripe, col)

    epoch = datetime.datetime(2024, 1, 1)
    return spark.range(N_ROWS).select(
        F.format_string("%04d", i).alias("row_key"),
        n((i % 2) == 0).alias("t:c_bool"),
        n((i % 128).cast("byte")).alias("t:c_byte"),
        n((i - 500).cast("short")).alias("t:c_short"),
        n((i * 1001 - 500000).cast("int")).alias("t:c_int"),
        n(i * 1000003).alias("t:c_long"),
        n((i / 7.0).cast("float")).alias("t:c_float"),
        n(i * 3.14159).alias("t:c_double"),
        n(F.format_string("s_%04d", i)).alias("t:c_string"),
        n(F.timestamp_millis(F.lit(int(epoch.timestamp() * 1000)) + i * 60000)).alias(
            "t:c_ts"
        ),
        n(F.encode(F.format_string("%04d", i), "UTF-8")).alias("t:c_bin"),
    )


def hbase_meta_spec() -> TableSpec:
    """The reference's ``hbase:meta`` type-diversity fixture (FIXTURES.md
    §1.3); ``info:regioninfo`` is the RegionInfo-UDT-as-binary column."""
    return TableSpec(
        namespace="hbase",
        name="meta",
        key_type="string",
        families={
            "ns": {"d": "string"},
            "table": {"state": "string"},
            "info": {
                "regioninfo": "regioninfo",
                "seqnumDuringOpen": "long",
                "server": "string",
                "serverstartcode": "timestamp",
                "sn": "string",
                "state": "string",
            },
        },
    )


def hbase_meta_df(spark: SparkSession) -> DataFrame:
    i = F.col("id")
    epoch_ms = 1704067200000  # 2024-01-01 UTC
    return spark.range(50).select(
        F.format_string("region_%03d", i).alias("row_key"),
        F.format_string("ns%d", i % 5).alias("ns:d"),
        F.when(i % 2 == 0, "ENABLED").otherwise("DISABLED").alias("table:state"),
        F.encode(F.format_string("regioninfo_%03d", i), "UTF-8").alias("info:regioninfo"),
        (i * 17).alias("info:seqnumDuringOpen"),
        F.format_string("server_%02d.example:16020", i % 10).alias("info:server"),
        F.timestamp_millis(F.lit(epoch_ms) + i * 1000).alias("info:serverstartcode"),
        F.format_string("sn_%03d", i).alias("info:sn"),
        F.lit("OPEN").alias("info:state"),
    )


def install_all(store: KeyedTableStore) -> None:
    """Create + load every reference-parity fixture into the store."""
    spark = store.spark
    store.create_table(pw_test_spec(), ignore_if_exists=True)
    store.insert("pw.test", pw_test_df(spark), overwrite=True, generate_row_key=False)
    store.create_table(pw_test_insert_spec(), ignore_if_exists=True)
    store.create_table(pw_typed_spec(), ignore_if_exists=True)
    store.insert("pw.typed", pw_typed_df(spark), overwrite=True, generate_row_key=False)
    store.create_table(hbase_meta_spec(), ignore_if_exists=True)
    store.insert(
        "hbase.meta", hbase_meta_df(spark), overwrite=True, generate_row_key=False
    )
