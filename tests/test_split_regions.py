"""Declared region split points: HBase pre-split parity for the keyed store.

The reference's CREATE TABLE carries a ``"split"`` property — explicit
region boundary keys handed straight to ``admin.createTable``
(``HBaseClientImpl.scala:331-364``) — and its schema sync reads the live
table's region end-keys back into the same property (``:262,273``).  The
keyed store has always STORED the declaration (``TableSpec.split_keys``,
the ``split_keys`` CTAS option) but only used its COUNT: boundaries came
from ``repartitionByRange`` sampling, so a skewed batch could move them
arbitrarily far from what the operator declared.

This suite pins that declared keys are now the ACTUAL boundaries of
every written layout:

- no data file straddles a declared boundary (each file's key range
  lies inside ONE declared region);
- routing compares in the KEY's type — a ``long`` key ``99`` sorts
  below split ``"100"`` (lexicographically it would not);
- appended runs and MERGE's new-key runs align to the same boundaries,
  so files stay region-confined across generations;
- malformed declarations (unsorted, unparseable for the key type) raise
  loudly at write time — a silently ignored split list is a trap;
- an explicit ``n_regions`` override (the size-targeted split-policy
  path) still wins, with sampled boundaries, and stays correct.

Why it matters at 100 TB: sampled boundaries are a function of each
batch's skew; declared boundaries are chosen once by the operator and
hold across every generation, so a bulk load cannot be skew-surprised
and incremental DML can rely on stable file↔key-range alignment.
"""

import os

import pytest
from pyspark.sql import functions as F

from spark_sql_hbase_spark.catalog import TableSpec
from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("split_wh"))
    return KeyedTableStore(spark, wh)


def _file_ranges(store, spec):
    """[(min_key, max_key, n_rows)] for every data file of the CURRENT
    generation, via the store's own exact footer/fallback reader."""
    path = store.table_path(spec)
    return [
        store._file_key_range(os.path.join(path, f))
        for f in store._data_files(path)
    ]


def _region_of(key, bounds):
    """HBase region law: region i holds [bounds[i-1], bounds[i])."""
    return sum(1 for b in bounds if key >= b)


def _assert_region_confined(store, spec, bounds):
    ranges = _file_ranges(store, spec)
    assert ranges, "table wrote no data files"
    for lo, hi, _n in ranges:
        assert _region_of(lo, bounds) == _region_of(hi, bounds), (
            f"file range [{lo!r}, {hi!r}] straddles a declared boundary "
            f"{bounds!r}"
        )
    return ranges


def _skewed_strings(spark, n=600, prefix_weights=(("a", 0.9), ("b", 0.05), ("c", 0.05))):
    """90% of keys below the first declared split — the layout a sampled
    partitioner would concentrate very differently from the declaration."""
    cut1 = int(n * prefix_weights[0][1])
    cut2 = cut1 + int(n * prefix_weights[1][1])
    return spark.range(n).select(
        F.concat(
            F.when(F.col("id") < cut1, F.lit("a"))
            .when(F.col("id") < cut2, F.lit("b"))
            .otherwise(F.lit("c")),
            F.format_string("%05d", F.col("id").cast("int")),
        ).alias("row_key"),
        (F.col("id") * 7).alias("cf:v"),
    )


def test_declared_splits_bound_skewed_string_layout(store, spark):
    spec = TableSpec(
        namespace="sp",
        name="skewed",
        key_type="string",
        families={"cf": {"v": "long"}},
        split_keys=["b", "c"],
    )
    df = _skewed_strings(spark)
    store.create_table(spec)
    store.insert("sp.skewed", df, overwrite=True)

    ranges = _assert_region_confined(store, spec, ["b", "c"])
    # the declared fan-out is respected: at most one file per region on
    # a single overwrite, and all three regions are populated
    regions_hit = {_region_of(lo, ["b", "c"]) for lo, _hi, _n in ranges}
    assert regions_hit == {0, 1, 2}
    got = store.read("sp.skewed")
    assert got.count() == 600
    assert got.agg(F.sum("`cf:v`")).collect()[0][0] == sum(i * 7 for i in range(600))


def test_append_runs_align_to_declared_boundaries(store, spark):
    spec = TableSpec(
        namespace="sp",
        name="appended",
        key_type="string",
        families={"cf": {"v": "long"}},
        split_keys=["b", "c"],
    )
    store.create_table(spec)
    store.insert("sp.appended", _skewed_strings(spark, n=300), overwrite=True)
    # second, differently-skewed batch appends its own run
    store.insert(
        "sp.appended",
        _skewed_strings(spark, n=300, prefix_weights=(("a", 0.1), ("b", 0.1), ("c", 0.8))),
    )
    _assert_region_confined(store, spec, ["b", "c"])
    assert store.read("sp.appended").count() == 600


def test_numeric_splits_compare_in_key_type(store, spark):
    """Splits ["100", "200"] on a long key: 99 belongs BELOW "100"
    (lexicographically "99" > "100" — the stringly-typed bug this test
    exists to keep dead, the same family as the round-8 typed footer
    stats fix)."""
    spec = TableSpec(
        namespace="sp",
        name="numeric",
        key_type="long",
        families={"cf": {"v": "long"}},
        split_keys=["100", "200"],
    )
    store.create_table(spec)
    keys = [1, 9, 50, 99, 100, 150, 199, 200, 201, 1000]
    df = spark.createDataFrame([(k, k * 3) for k in keys], "row_key long, `cf:v` long")
    store.insert("sp.numeric", df, overwrite=True)

    ranges = _assert_region_confined(store, spec, [100, 200])
    # 99 and 100 land on opposite sides of the boundary
    holds_99 = [r for r in ranges if r[0] <= 99 <= r[1]]
    assert holds_99 and all(hi < 100 for _lo, hi, _n in holds_99)
    holds_100 = [r for r in ranges if r[0] <= 100 <= r[1]]
    assert holds_100 and all(lo >= 100 for lo, _hi, _n in holds_100)
    assert store.read("sp.numeric").count() == len(keys)


def test_partition_token_law_matches_spark_hash(store, spark):
    """The region→partition router rests on Spark's hash-partitioning
    law: ``repartition(n, col)`` places a row at
    ``pmod(murmur3(int32 value, seed=42), n)``.  Pin the pure-Python
    twin against ``F.hash`` itself so an engine drift breaks loudly
    here instead of silently folding two regions into one file."""
    from spark_sql_hbase_spark.sources.keyed_parquet import _murmur3_int32

    vals = list(range(64)) + [2**31 - 1, 12345678]
    got = (
        spark.range(0)
        .sparkSession.createDataFrame([(v,) for v in vals], "v int")
        .select(F.hash(F.col("v")).alias("h"), F.col("v"))
        .collect()
    )
    spark_hash = {r["v"]: r["h"] for r in got}
    for v in vals:
        assert _murmur3_int32(v) == spark_hash[v], v
    # and the token search yields an injective region→partition map
    for n in (2, 3, 4, 7, 16):
        toks = KeyedTableStore._partition_tokens(n)
        assert len(toks) == n
        assert sorted(_murmur3_int32(t) % n for t in toks) == list(range(n))


def test_malformed_split_declarations_raise(store, spark):
    df = spark.createDataFrame([(5, 5)], "row_key long, `cf:v` long")
    unsorted = TableSpec(
        namespace="sp",
        name="badorder",
        key_type="string",
        families={"cf": {"v": "long"}},
        split_keys=["c", "b"],
    )
    store.create_table(unsorted)
    with pytest.raises(ValueError, match="split"):
        store.insert(
            "sp.badorder",
            spark.createDataFrame([("a", 1)], "row_key string, `cf:v` long"),
            overwrite=True,
        )
    unparseable = TableSpec(
        namespace="sp",
        name="badtype",
        key_type="long",
        families={"cf": {"v": "long"}},
        split_keys=["10", "abc"],
    )
    store.create_table(unparseable)
    with pytest.raises(ValueError, match="split"):
        store.insert("sp.badtype", df, overwrite=True)


def test_explicit_region_override_still_wins(store, spark):
    """compact(n_regions=...) — the split-policy analogue — overrides the
    declaration with sampled boundaries and keeps content exact."""
    spec = TableSpec(
        namespace="sp",
        name="override",
        key_type="string",
        families={"cf": {"v": "long"}},
        split_keys=["b", "c"],
    )
    store.create_table(spec)
    store.insert("sp.override", _skewed_strings(spark, n=400), overwrite=True)
    before = {
        (r["row_key"], r["cf:v"]) for r in store.read("sp.override").collect()
    }
    store.compact("sp.override", n_regions=2)
    path = store.table_path(spec)
    assert len(store._data_files(path)) <= 2
    after = {
        (r["row_key"], r["cf:v"]) for r in store.read("sp.override").collect()
    }
    assert after == before


def test_merge_respects_declared_boundaries(store, spark):
    """Both upsert write paths stay region-confined: the SELECTIVE
    rewrite of matched files (here files in non-adjacent regions 0 and
    2, which a sampled joint repartition could fold into one straddling
    file) and the fresh sorted run of all-new keys."""
    spec = TableSpec(
        namespace="sp",
        name="merged",
        key_type="string",
        families={"cf": {"v": "long"}},
        split_keys=["b", "c"],
    )
    store.create_table(spec)
    # n=200 skewed: keys a00000..a00179, b00180.., c00190..
    store.insert("sp.merged", _skewed_strings(spark, n=200), overwrite=True)
    batch = spark.createDataFrame(
        [("a00010", 111), ("c00195", 222), ("b99999", 2)],
        "row_key string, `cf:v` long",
    )
    store.upsert("sp.merged", batch)
    _assert_region_confined(store, spec, ["b", "c"])
    got = store.read("sp.merged")
    assert got.count() == 201
    vals = {
        r["row_key"]: r["cf:v"]
        for r in got.where(
            F.col("row_key").isin("a00010", "c00195", "b99999")
        ).collect()
    }
    assert vals == {"a00010": 111, "c00195": 222, "b99999": 2}
