"""EngineSession surface (A8/A12 parity): SQL passthrough, database/table
listing, USE, refresh — over a keyed-table warehouse."""

import pytest
from pyspark.sql import functions as F

from spark_sql_hbase_spark.catalog import TableSpec
from spark_sql_hbase_spark.session import EngineSession
from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore


@pytest.fixture(scope="module")
def session(spark, tmp_path_factory):
    sess = EngineSession(spark=spark)
    store = KeyedTableStore(spark, str(tmp_path_factory.mktemp("sess_wh")))
    spec = TableSpec(
        namespace="pw2", name="demo", key_type="string",
        families={"A": {"A_00": "string"}},
    )
    store.create_table(spec)
    rows = spark.range(10).select(
        F.format_string("%04d", F.col("id")).alias("row_key"),
        F.format_string("v_%04d", F.col("id")).alias("A:A_00"),
    )
    store.insert("pw2.demo", rows, overwrite=True, generate_row_key=False)
    return sess, store


def test_sql_passthrough(session):
    sess, _ = session
    assert sess.sql("SELECT 1 + 1 AS two").collect()[0]["two"] == 2


def test_show_databases_and_tables(session):
    sess, store = session
    assert "pw2" in sess.databases()
    # keyed tables surface in SQL as <ns>__<name> temp views
    assert "pw2__demo" in sess.tables()
    assert "pw2.demo" in store.tables("pw2")


def test_sql_over_keyed_view_with_backticks(session):
    sess, _ = session
    got = sess.sql(
        "SELECT `A:A_00` FROM pw2__demo WHERE row_key = '0007'"
    ).collect()
    assert [r[0] for r in got] == ["v_0007"]


def test_use_database(session):
    sess, _ = session
    sess.use("pw2")
    assert sess.spark.catalog.currentDatabase() == "pw2"
    sess.use("default")


def test_refresh_after_external_write(session):
    sess, store = session
    spec = store.registry.get("pw2.demo")
    more = sess.spark.range(10, 15).select(
        F.format_string("%04d", F.col("id")).alias("row_key"),
        F.format_string("v_%04d", F.col("id")).alias("A:A_00"),
    )
    store.insert("pw2.demo", more, generate_row_key=False)
    sess.refresh_table("pw2__demo")
    assert sess.sql("SELECT count(*) AS n FROM pw2__demo").collect()[0]["n"] == 15
