"""``keyedtable`` Python DataSource (A1/A3/A4 rebuild): results match the
parquet path and the fixture law; filters push into the reader; row-key
predicates prune region partitions before any file is opened; unsupported
predicates are returned to Spark and still evaluated (no silent drops).
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan, StringContains

from spark_sql_hbase_spark.sources import fixtures
from spark_sql_hbase_spark.sources.keyed_datasource import KeyedTableReader
from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("ds_warehouse"))
    store = KeyedTableStore(spark, wh)
    store.create_table(fixtures.pw_test_spec())
    store.insert("pw.test", fixtures.pw_test_df(spark), overwrite=True, generate_row_key=False)
    return store


def test_full_scan_matches_parquet_path(store):
    via_ds = store.read_via_datasource("pw.test")
    via_pq = store.read("pw.test")
    assert via_ds.count() == fixtures.N_ROWS
    assert via_ds.exceptAll(via_pq).count() == 0
    assert via_pq.exceptAll(via_ds).count() == 0


def test_region_aligned_partitions(store):
    # 4 range partitions (split keys 0250/0500/0750) → 4 region files → 4
    # input partitions, like 1-partition-per-HBase-region
    df = store.read_via_datasource("pw.test")
    assert df.rdd.getNumPartitions() == 4


def test_pushed_filter_correct(store):
    df = store.read_via_datasource("pw.test").filter(F.col("A:A_05") == "A_05_0123")
    rows = df.select("row_key").collect()
    assert [r[0] for r in rows] == ["0123"]


def test_residual_filter_not_dropped(store):
    """LIKE/contains is NOT pushed (reader yields it back) — Spark must
    still evaluate it. The reference's scan silently dropped predicates
    it couldn't compile (HBaseSparkFilterUtils.scala:126)."""
    df = store.read_via_datasource("pw.test").filter(F.col("A:A_00").contains("024"))
    got = sorted(r[0] for r in df.select("row_key").collect())
    expect = sorted(f"{i:04d}" for i in range(fixtures.N_ROWS) if "024" in f"A_00_{i:04d}")
    assert got == expect


def test_rowkey_range_scan(store):
    df = store.read_via_datasource("pw.test").filter(
        (F.col("row_key") >= "0100") & (F.col("row_key") < "0110")
    )
    assert df.count() == 10


# -- reader unit tests: pushdown contract + region pruning ----------------
def _reader(store):
    spec = fixtures.pw_test_spec()
    return KeyedTableReader(spec.schema(), store.table_path(spec))


def test_reader_push_contract(store):
    r = _reader(store)
    supported = EqualTo(("A:A_05",), "A_05_0123")
    unsupported = StringContains(("A:A_05",), "024")
    residual = list(r.pushFilters([supported, unsupported]))
    assert residual == [unsupported]
    assert r.pushed == [supported]


def test_reader_prunes_regions_by_key(store):
    # table has 4 regions: [0000,0249],[0250,0499],[0500,0749],[0750,0999]
    r = _reader(store)
    list(r.pushFilters([EqualTo(("row_key",), "0300")]))
    assert len(r.partitions()) == 1

    r2 = _reader(store)
    list(r2.pushFilters([
        GreaterThanOrEqual(("row_key",), "0200"), LessThan(("row_key",), "0600"),
    ]))
    assert len(r2.partitions()) == 3  # spans regions 1,2,3

    r3 = _reader(store)
    assert len(r3.partitions()) == 4  # no key predicate → all regions


# -- write path: staged-file commit protocol ------------------------------
def test_datasource_write_append_and_overwrite(store, spark, tmp_path):
    from spark_sql_hbase_spark.sources.keyed_datasource import KeyedTableDataSource

    if not getattr(spark, "_keyedtable_registered", False):
        spark.dataSource.register(KeyedTableDataSource)
        spark._keyedtable_registered = True

    path = str(tmp_path / "ds_write")
    import os
    os.makedirs(path, exist_ok=True)

    df = spark.range(100).select(
        F.format_string("%04d", F.col("id")).alias("row_key"),
        F.col("id").alias("v"),
    )
    df.repartitionByRange(2, "row_key").write.format("keyedtable").mode(
        "append"
    ).option("path", path).save()
    back = spark.read.format("keyedtable").schema("row_key string, v long").option(
        "path", path
    ).load()
    assert back.count() == 100

    # staged files are gone; region files are key-sorted parquet
    assert not os.path.exists(os.path.join(path, "_staging"))
    import pyarrow.parquet as pq
    import glob
    for f in glob.glob(f"{path}/*.parquet"):
        keys = pq.read_table(f, columns=["row_key"])["row_key"].to_pylist()
        assert keys == sorted(keys)

    # append again → 200; overwrite → 50
    df.write.format("keyedtable").mode("append").option("path", path).save()
    assert (
        spark.read.format("keyedtable")
        .schema("row_key string, v long")
        .option("path", path).load().count()
        == 200
    )
    df.limit(50).write.format("keyedtable").mode("overwrite").option("path", path).save()
    assert (
        spark.read.format("keyedtable")
        .schema("row_key string, v long")
        .option("path", path).load().count()
        == 50
    )


def test_datasource_reads_pre_alter_files_with_nulls(spark, tmp_path):
    """After ALTER TABLE ADD COLUMNS, region files written before the
    ALTER lack the new qualifier — the DataSource scan must fill NULLs
    (declared-schema scan), not crash on the missing column."""
    from spark_sql_hbase_spark.session import EngineSession

    sess = EngineSession(spark=spark, warehouse_dir=str(tmp_path / "wh"))
    sess.sql(
        "CREATE TABLE pw.ds_ev (row_key string, `cf:v` string) "
        "USING keyed OPTIONS (generator='sequence')"
    )
    sess.sql("insert into pw.ds_ev values('0000','old')")
    sess.sql("ALTER TABLE pw.ds_ev ADD COLUMNS (`cf:w` bigint)")
    sess.sql("insert into pw.ds_ev values('0000','new', 7)")
    rows = sess.store.read_via_datasource("pw.ds_ev").collect()
    assert sorted((r["row_key"], r["cf:v"], r["cf:w"]) for r in rows) == [
        ("0001", "old", None),
        ("0002", "new", 7),
    ]
    sess.store.drop_table("pw.ds_ev")


def test_reader_pruning_served_from_span_manifest(store, monkeypatch):
    """With the generation's ``_spans.json`` present (every store commit
    writes one), planning-time region pruning opens ZERO parquet footers
    — the O(files)-metadata-per-query cost the manifest exists to kill.
    Deleting the manifest degrades to the live footer path with the same
    partition list."""
    import os
    import pyarrow.parquet as pq
    from spark_sql_hbase_spark.sources import keyed_datasource as kd

    spec = fixtures.pw_test_spec()
    path = store.table_path(spec)
    assert os.path.exists(os.path.join(path, "_spans.json"))

    def boom(*a, **kw):
        raise AssertionError("footer open during manifest-served planning")

    monkeypatch.setattr(pq, "ParquetFile", boom)
    r = _reader(store)
    list(r.pushFilters([EqualTo(("row_key",), "0300")]))
    assert len(r.partitions()) == 1
    monkeypatch.undo()

    # same answer from the live-footer fallback when the manifest is gone
    import shutil
    bak = os.path.join(path, "_spans.json.bak")
    shutil.move(os.path.join(path, "_spans.json"), bak)
    try:
        r2 = _reader(store)
        list(r2.pushFilters([EqualTo(("row_key",), "0300")]))
        assert len(r2.partitions()) == 1
    finally:
        shutil.move(bak, os.path.join(path, "_spans.json"))
