"""CDC changefeed: row-level changes between retained states.

``read_changes`` is the HBase replication/WAL-shipping analogue served
from the storage layout itself: hardlink-carried files are
byte-identical across generations (and into snapshots) by the store's
immutability law, so the diff reads ONLY the symmetric difference of
the two file listings, then ``exceptAll`` drops rewritten-but-unchanged
rows.  This suite pins:

- classification: update (new row) / insert / delete across one
  MERGE and one DELETE generation;
- rewritten-but-unchanged neighbors of a touched key do NOT appear;
- the file-level pruning law: carried (shared-name) files are never
  read — the diff's ``inputFiles`` is a subset of the symmetric
  difference;
- snapshot-to-now diffs (``versus=<snapshot>``) including appended
  rows (appends never flip a generation, so only the snapshot base
  sees them as changes);
- NULL-keyed rows classify as update (not delete+insert) when their
  payload changes across an overwrite;
- loud errors: no previous generation / unknown snapshot.
"""

import pytest
from pyspark.sql import functions as F

from spark_sql_hbase_spark.catalog import TableSpec
from spark_sql_hbase_spark.sources.keyed_parquet import (
    KeyedTableStore,
    TableNotFoundError,
)


@pytest.fixture(scope="module", params=["posix", "manifest"])
def store(spark, tmp_path_factory, request):
    # both storage layouts: POSIX hardlink carry (default) and
    # manifests-as-listing (manifest_authority=True) — the whole suite
    # must hold in either mode
    wh = str(tmp_path_factory.mktemp("cdc_wh"))
    return KeyedTableStore(
        spark, wh, manifest_authority=(request.param == "manifest")
    )


def _mk(store, spark, name, rows, split_keys=None):
    spec = TableSpec(
        namespace="cdc",
        name=name,
        key_type="string",
        families={"cf": {"v": "long"}},
        split_keys=split_keys or [],
    )
    store.create_table(spec)
    store.insert(
        f"cdc.{name}",
        spark.createDataFrame(rows, "row_key string, `cf:v` long"),
        overwrite=True,
    )
    return spec


def _changes(df):
    return {(r["change"], r["row_key"], r["cf:v"]) for r in df.collect()}


def test_changes_classify_update_insert_delete(store, spark):
    _mk(store, spark, "basic", [(f"k{i:03d}", i) for i in range(10)])
    store.upsert(
        "cdc.basic",
        spark.createDataFrame(
            [("k003", 333), ("k999", 999)], "row_key string, `cf:v` long"
        ),
    )
    got = _changes(store.read_changes("cdc.basic", versus="previous"))
    # only the touched keys appear — the 9 rewritten-identical rows of
    # k003's file and every carried file stay silent
    assert got == {("update", "k003", 333), ("insert", "k999", 999)}

    store.delete_where("cdc.basic", "row_key = 'k005'")
    got = _changes(store.read_changes("cdc.basic", versus="previous"))
    assert got == {("delete", "k005", 5)}


def test_changes_read_only_the_symmetric_difference(store, spark):
    spec = _mk(
        store,
        spark,
        "pruned",
        [(f"{p}{i:03d}", i) for p in "abc" for i in range(50)],
        split_keys=["b", "c"],
    )
    import os

    path_before = store.table_path(spec)
    files_before = set(store._data_files(path_before))
    store.upsert(
        "cdc.pruned",
        spark.createDataFrame([("a001", 111)], "row_key string, `cf:v` long"),
    )
    df = store.read_changes("cdc.pruned", versus="previous")
    assert _changes(df) == {("update", "a001", 111)}
    path_after = store.table_path(spec)
    shared = files_before & set(store._data_files(path_after))
    assert shared, "expected hardlink-carried files"
    read_names = {os.path.basename(f) for f in df.inputFiles()}
    assert not (read_names & shared), (
        f"diff read carried files: {read_names & shared}"
    )


def test_changes_versus_snapshot_sees_appends(store, spark):
    _mk(store, spark, "snapdiff", [(f"k{i:03d}", i) for i in range(6)])
    store.snapshot("cdc.snapdiff", "cdc_s1")
    # one MERGE (update+insert), one plain APPEND (no generation flip)
    store.upsert(
        "cdc.snapdiff",
        spark.createDataFrame([("k001", 100)], "row_key string, `cf:v` long"),
    )
    store.insert(
        "cdc.snapdiff",
        spark.createDataFrame([("k100", 7)], "row_key string, `cf:v` long"),
    )
    got = _changes(store.read_changes("cdc.snapdiff", versus="cdc_s1"))
    assert got == {
        ("update", "k001", 100),
        ("insert", "k100", 7),
    }


def test_changes_null_key_update_classifies_as_update(store, spark):
    _mk(store, spark, "nullkey", [(None, 1), ("k1", 2)])
    store.insert(
        "cdc.nullkey",
        spark.createDataFrame([(None, 5), ("k1", 2)], "row_key string, `cf:v` long"),
        overwrite=True,
    )
    got = _changes(store.read_changes("cdc.nullkey", versus="previous"))
    assert got == {("update", None, 5)}


def test_changes_errors_are_loud(store, spark):
    _mk(store, spark, "fresh", [("k1", 1)])
    # overwrite-created table has a previous generation only after a
    # second table-replacing operation on top of the create
    with pytest.raises(TableNotFoundError, match="snapshot not found"):
        store.read_changes("cdc.fresh", versus="nope")
    spec = TableSpec(
        namespace="cdc",
        name="virgin",
        key_type="string",
        families={"cf": {"v": "long"}},
    )
    store.create_table(spec)
    store.insert(
        "cdc.virgin",
        spark.createDataFrame([("k1", 1)], "row_key string, `cf:v` long"),
    )
    with pytest.raises(TableNotFoundError, match="previous generation"):
        store.read_changes("cdc.virgin", versus="previous")


# -- delete_keys (HBase table.delete(List<Delete>)) + apply_changes
# (ReplicationSink replay) ----------------------------------------------


def test_delete_keys_selective_and_exact(store, spark):
    spec = _mk(
        store,
        spark,
        "delkeys",
        [(f"{p}{i:03d}", i) for p in "abc" for i in range(40)],
        split_keys=["b", "c"],
    )
    import os

    path = store.table_path(spec)
    files_before = set(store._data_files(path))
    # two present keys (one region) + one absent key
    batch = spark.createDataFrame(
        [("a001",), ("a002",), ("zzz",)], "row_key string"
    )
    assert store.delete_keys("cdc.delkeys", batch) == 2
    left = store.read("cdc.delkeys")
    assert left.count() == 118
    assert left.filter(F.col("row_key").isin("a001", "a002")).count() == 0
    # only the a-region file was rewritten; b/c files carried by name
    path_after = store.table_path(spec)
    carried = files_before & set(store._data_files(path_after))
    assert carried, "untouched regions must hardlink-carry"
    # a no-match batch is free: no generation swap
    assert store.delete_keys(
        "cdc.delkeys", spark.createDataFrame([("nope",)], "row_key string")
    ) == 0
    assert store.table_path(spec) == path_after


def test_delete_keys_null_and_column_shapes(store, spark):
    _mk(store, spark, "delnull", [(None, 1), ("k1", 2), ("k2", 3)])
    # single unnamed column is accepted as the key; NULL deletes the
    # NULL-keyed row (null-safe join)
    batch = spark.createDataFrame([(None,), ("k2",)], "anykey string")
    assert store.delete_keys("cdc.delnull", batch) == 2
    got = {(r["row_key"], r["cf:v"]) for r in store.read("cdc.delnull").collect()}
    assert got == {("k1", 2)}
    with pytest.raises(ValueError, match="row_key"):
        store.delete_keys(
            "cdc.delnull",
            spark.createDataFrame([("a", "b")], "x string, y string"),
        )


def test_apply_changes_replicates_source_state(store, spark):
    src_rows = [(f"k{i:03d}", i) for i in range(20)]
    _mk(store, spark, "repl_src", src_rows)
    _mk(store, spark, "repl_dst", src_rows)

    def assert_in_sync():
        a = {(r["row_key"], r["cf:v"]) for r in store.read("cdc.repl_src").collect()}
        b = {(r["row_key"], r["cf:v"]) for r in store.read("cdc.repl_dst").collect()}
        assert a == b

    # ship one MERGE generation (updates + inserts)
    store.upsert(
        "cdc.repl_src",
        spark.createDataFrame(
            [("k003", 333), ("k900", 900)], "row_key string, `cf:v` long"
        ),
    )
    n_del = store.apply_changes(
        "cdc.repl_dst", store.read_changes("cdc.repl_src", versus="previous")
    )
    assert n_del == 0
    assert_in_sync()

    # ship one DELETE generation
    store.delete_where("cdc.repl_src", "row_key IN ('k005', 'k006')")
    n_del = store.apply_changes(
        "cdc.repl_dst", store.read_changes("cdc.repl_src", versus="previous")
    )
    assert n_del == 2
    assert_in_sync()


# -- export_snapshot (HBase ExportSnapshot) + bootstrap-then-incremental
# replication ------------------------------------------------------------


def test_export_snapshot_bootstraps_a_remote_replica(store, spark, tmp_path_factory):
    """The full HBase cross-cluster replication story: snapshot →
    export → clone at the destination (bootstrap), then ship ONLY the
    changefeed against that snapshot (incremental)."""
    _mk(store, spark, "shipme", [(f"k{i:03d}", i) for i in range(15)])
    store.snapshot("cdc.shipme", "ship_s1")

    remote_wh = str(tmp_path_factory.mktemp("remote_wh"))
    dst = store.export_snapshot("ship_s1", remote_wh)
    import os

    assert os.path.isdir(dst)
    remote = KeyedTableStore(spark, remote_wh)
    remote.clone_snapshot("ship_s1", "cdc.shipme")

    def rows(st, name):
        return {(r["row_key"], r["cf:v"]) for r in st.read(name).collect()}

    assert rows(remote, "cdc.shipme") == rows(store, "cdc.shipme")

    # incremental: mutate the source, ship the snapshot-relative diff
    store.upsert(
        "cdc.shipme",
        spark.createDataFrame(
            [("k002", 222), ("k500", 500)], "row_key string, `cf:v` long"
        ),
    )
    store.delete_where("cdc.shipme", "row_key = 'k009'")
    remote.apply_changes(
        "cdc.shipme", store.read_changes("cdc.shipme", versus="ship_s1")
    )
    assert rows(remote, "cdc.shipme") == rows(store, "cdc.shipme")


def test_export_snapshot_errors_are_loud(store, spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("exp_wh"))
    with pytest.raises(TableNotFoundError, match="snapshot not found"):
        store.export_snapshot("no_such_snap", wh)
    _mk(store, spark, "expdup", [("k1", 1)])
    store.snapshot("cdc.expdup", "exp_s1")
    store.export_snapshot("exp_s1", wh)
    from spark_sql_hbase_spark.sources.keyed_parquet import (
        TableAlreadyExistsError,
    )

    with pytest.raises(TableAlreadyExistsError, match="destination"):
        store.export_snapshot("exp_s1", wh)


def test_delete_keys_refuses_uncastable_keys(store, spark):
    """A delete key the key-type cast NULLs must raise, not silently
    retarget the delete at NULL-keyed rows (the stringly-typed trap)."""
    spec = TableSpec(
        namespace="cdc",
        name="delcast",
        key_type="long",
        families={"cf": {"v": "long"}},
    )
    store.create_table(spec)
    store.insert(
        "cdc.delcast",
        spark.createDataFrame([(None, 1), (7, 2)], "row_key long, `cf:v` long"),
        overwrite=True,
    )
    with pytest.raises(ValueError, match="not castable"):
        store.delete_keys(
            "cdc.delcast",
            spark.createDataFrame([("abc",)], "row_key string"),
        )
    # the NULL-keyed row survived; castable string keys still work
    assert store.read("cdc.delcast").count() == 2
    assert store.delete_keys(
        "cdc.delcast", spark.createDataFrame([("7",)], "row_key string")
    ) == 1


def test_changes_on_versioned_table_are_cell_semantics(store, spark):
    """HBase Put/retention semantics in the changefeed: a NEW VERSION
    cell appended for an existing key is an ``insert`` (it removes
    nothing), and a version cell that version-GC compacts away is a
    ``delete`` — versions are cells, not in-place updates."""
    spec = TableSpec(
        namespace="cdc",
        name="vers",
        key_type="string",
        families={"cf": {"bal": "long", "v": "long"}},
    )
    store.create_table(spec)
    store.insert(
        "cdc.vers",
        spark.createDataFrame(
            [("k1", 10, 1), ("k2", 20, 1)],
            "row_key string, `cf:bal` long, `cf:v` long",
        ),
        overwrite=True,
    )
    store.snapshot("cdc.vers", "vers_s1")
    # new version cell for k1: an APPEND, nothing replaced
    store.insert(
        "cdc.vers",
        spark.createDataFrame(
            [("k1", 11, 2)], "row_key string, `cf:bal` long, `cf:v` long"
        ),
    )
    got = {
        (r["change"], r["row_key"], r["cf:bal"], r["cf:v"])
        for r in store.read_changes("cdc.vers", versus="vers_s1").collect()
    }
    assert got == {("insert", "k1", 11, 2)}

    # VERSIONS=>1 GC: k1's v=1 cell compacts away; k1 keeps v=2
    store.compact_versions("cdc.vers", "cf:v", keep_versions=1)
    got = {
        (r["change"], r["row_key"], r["cf:bal"], r["cf:v"])
        for r in store.read_changes("cdc.vers", versus="vers_s1").collect()
    }
    # vs the snapshot: k1's old cell is gone (its key still live ⇒ the
    # new cell classifies the pair as an update), k2 untouched
    assert got == {("update", "k1", 11, 2)}
    got_prev = {
        (r["change"], r["row_key"], r["cf:bal"], r["cf:v"])
        for r in store.read_changes("cdc.vers", versus="previous").collect()
    }
    # vs the pre-GC generation: the expired cell alone, as a delete
    assert got_prev == {("delete", "k1", 10, 1)}


def test_cell_feed_emits_no_update_rows(store, spark):
    """cells=True: every added row is an insert and every removed row a
    delete — the compact-away + new-cell combination that the key feed
    collapses into 'update' stays two cell events."""
    spec = TableSpec(
        namespace="cdc",
        name="cellsfeed",
        key_type="string",
        families={"cf": {"bal": "long", "v": "long"}},
    )
    store.create_table(spec)
    store.insert(
        "cdc.cellsfeed",
        spark.createDataFrame(
            [("k1", 10, 1), ("k2", 20, 1)],
            "row_key string, `cf:bal` long, `cf:v` long",
        ),
        overwrite=True,
    )
    store.snapshot("cdc.cellsfeed", "cells_s1")
    store.insert(
        "cdc.cellsfeed",
        spark.createDataFrame(
            [("k1", 11, 2)], "row_key string, `cf:bal` long, `cf:v` long"
        ),
    )
    store.compact_versions("cdc.cellsfeed", "cf:v", keep_versions=1)
    got = {
        (r["change"], r["row_key"], r["cf:bal"], r["cf:v"])
        for r in store.read_changes(
            "cdc.cellsfeed", versus="cells_s1", cells=True
        ).collect()
    }
    assert got == {("insert", "k1", 11, 2), ("delete", "k1", 10, 1)}


def test_delete_cells_removes_one_version_cell(store, spark):
    """delete_cells removes EXACTLY the named cell; the key's other
    version cells survive (the Delete.addColumn analogue delete_keys
    cannot express)."""
    spec = TableSpec(
        namespace="cdc",
        name="delcells",
        key_type="string",
        families={"cf": {"bal": "long", "v": "long"}},
    )
    store.create_table(spec)
    store.insert(
        "cdc.delcells",
        spark.createDataFrame(
            [("k1", 10, 1), ("k1", 11, 2), ("k2", 20, 1)],
            "row_key string, `cf:bal` long, `cf:v` long",
        ),
        overwrite=True,
    )
    batch = spark.createDataFrame(
        [("k1", 10, 1), ("k9", 99, 1)],
        "row_key string, `cf:bal` long, `cf:v` long",
    )
    assert store.delete_cells("cdc.delcells", batch) == 1
    got = {
        (r["row_key"], r["cf:bal"], r["cf:v"])
        for r in store.read("cdc.delcells").collect()
    }
    assert got == {("k1", 11, 2), ("k2", 20, 1)}
    # a no-match batch is free: no generation swap
    spec = store.registry.get("cdc.delcells")
    path = store.table_path(spec)
    assert store.delete_cells(
        "cdc.delcells",
        spark.createDataFrame(
            [("k1", 999, 9)], "row_key string, `cf:bal` long, `cf:v` long"
        ),
    ) == 0
    assert store.table_path(spec) == path
    # a loosely-typed batch refuses loudly (exact-identity law)
    with pytest.raises(ValueError, match="exact"):
        store.delete_cells(
            "cdc.delcells",
            spark.createDataFrame(
                [("k1", "10", 1)],
                "row_key string, `cf:bal` string, `cf:v` long",
            ),
        )


def test_versioned_replication_round_trip_is_cell_exact(
    store, spark, tmp_path_factory
):
    """The ADVICE r10 repro, fixed: bootstrapping a replica of a
    versioned table and replaying the CELL feed preserves every version
    cell — a new-version insert APPENDS on the replica (never wipes the
    older cells), version-GC deletes remove only the expired cells, and
    the replica converges to the exact source multiset."""
    spec = TableSpec(
        namespace="cdc",
        name="vrepl",
        key_type="string",
        families={"cf": {"bal": "long", "v": "long"}},
        properties={"versions": "2"},
    )
    store.create_table(spec)
    store.insert(
        "cdc.vrepl",
        spark.createDataFrame(
            [("k1", 10, 1), ("k2", 20, 1)],
            "row_key string, `cf:bal` long, `cf:v` long",
        ),
        overwrite=True,
    )
    store.snapshot("cdc.vrepl", "vrepl_s1")
    remote_wh = str(tmp_path_factory.mktemp("vrepl_wh"))
    store.export_snapshot("vrepl_s1", remote_wh)
    remote = KeyedTableStore(spark, remote_wh)
    remote.clone_snapshot("vrepl_s1", "cdc.vrepl")

    def rows(st):
        return sorted(
            (r["row_key"], r["cf:bal"], r["cf:v"])
            for r in st.read("cdc.vrepl").collect()
        )

    # the exact ADVICE scenario: one new version cell for a live key
    store.insert(
        "cdc.vrepl",
        spark.createDataFrame(
            [("k1", 11, 2), ("k1", 12, 3), ("k2", 21, 2)],
            "row_key string, `cf:bal` long, `cf:v` long",
        ),
    )
    remote.apply_changes(
        "cdc.vrepl",
        store.read_changes("cdc.vrepl", versus="vrepl_s1", cells=True),
        cells=True,
    )
    assert rows(remote) == rows(store)
    assert ("k1", 10, 1) in rows(remote), "older version cell must survive"

    # retention GC on the source ships as cell deletes
    store.snapshot("cdc.vrepl", "vrepl_s2")
    store.compact_versions("cdc.vrepl", "cf:v", keep_versions=2)
    remote.apply_changes(
        "cdc.vrepl",
        store.read_changes("cdc.vrepl", versus="vrepl_s2", cells=True),
        cells=True,
    )
    assert rows(remote) == rows(store)


def test_apply_changes_refuses_key_granularity_on_versioned(store, spark):
    """A key-granularity replay on a VERSIONS table corrupts cells —
    refused loudly with the cell-feed remediation named."""
    spec = TableSpec(
        namespace="cdc",
        name="vrefuse",
        key_type="string",
        families={"cf": {"v": "long"}},
        properties={"versions": "3"},
    )
    store.create_table(spec)
    store.insert(
        "cdc.vrefuse",
        spark.createDataFrame([("k1", 1)], "row_key string, `cf:v` long"),
        overwrite=True,
    )
    feed = spark.createDataFrame(
        [("insert", "k1", 2)], "change string, row_key string, `cf:v` long"
    )
    with pytest.raises(ValueError, match="cells=True"):
        store.apply_changes("cdc.vrefuse", feed)
    # the cell replay path works
    store.apply_changes("cdc.vrefuse", feed, cells=True)
    assert store.read("cdc.vrefuse").count() == 2


def test_apply_changes_cell_mode_refuses_update_rows(store, spark):
    _mk(store, spark, "mixfeed", [("k1", 1)])
    feed = spark.createDataFrame(
        [("update", "k1", 2)], "change string, row_key string, `cf:v` long"
    )
    with pytest.raises(ValueError, match="cannot contain 'update'"):
        store.apply_changes("cdc.mixfeed", feed, cells=True)


def test_snapshot_name_previous_is_reserved(store, spark):
    _mk(store, spark, "resv", [("k1", 1)])
    with pytest.raises(ValueError, match="reserved"):
        store.snapshot("cdc.resv", "previous")


def test_cross_table_snapshot_diff_is_refused(store, spark):
    """Diffing a table against ANOTHER table's schema-compatible
    snapshot would silently emit meaningless change rows — refused by
    the recorded snapshot spec."""
    _mk(store, spark, "xta", [("k1", 1)])
    _mk(store, spark, "xtb", [("k1", 2)])
    store.snapshot("cdc.xta", "xta_s1")
    with pytest.raises(ValueError, match="was taken from"):
        store.read_changes("cdc.xtb", versus="xta_s1")


def test_unconsumed_previous_feed_never_silently_drifts(store, spark):
    """The transient-base contract: a 'previous' feed left unconsumed
    across further rewrites must never SILENTLY return a different
    diff.  POSIX layout: the base generation is swept, so the read
    FAILS loudly at action time — the remediation is a snapshot base
    (read_changes(versus=<snapshot>)).  Manifest-authority layout:
    reference-aware GC keeps the pinned files' directories alive while
    live generations reference them, so the feed keeps returning the
    ORIGINAL pinned diff (immutability), which is the other acceptable
    outcome — stale-but-exact, never drifted."""
    _mk(store, spark, "trans", [(f"k{i:02d}", i) for i in range(8)])
    store.upsert(
        "cdc.trans",
        spark.createDataFrame([("k01", 100)], "row_key string, `cf:v` long"),
    )
    feed = store.read_changes("cdc.trans", versus="previous")
    pinned = {("update", "k01", 100)}
    # further rewrites retire the feed's base generation
    store.upsert(
        "cdc.trans",
        spark.createDataFrame([("k02", 200)], "row_key string, `cf:v` long"),
    )
    store.upsert(
        "cdc.trans",
        spark.createDataFrame([("k03", 300)], "row_key string, `cf:v` long"),
    )
    if store.manifest_authority:
        assert _changes(feed) == pinned
    else:
        with pytest.raises(Exception):
            feed.collect()


def test_apply_changes_refuses_unknown_change_tags(store, spark):
    """A mistyped/NULL change tag must refuse loudly — a replica that
    silently drops feed rows is the worst replication failure mode."""
    _mk(store, spark, "badtag", [("k1", 1)])
    feed = spark.createDataFrame(
        [("upsert", "k2", 2)], "change string, row_key string, `cf:v` long"
    )
    with pytest.raises(ValueError, match="unknown change"):
        store.apply_changes("cdc.badtag", feed)
    feed_null = spark.createDataFrame(
        [(None, "k2", 2)], "change string, row_key string, `cf:v` long"
    )
    with pytest.raises(ValueError, match="unknown change"):
        store.apply_changes("cdc.badtag", feed_null)


def test_apply_changes_key_replay_is_idempotent(store, spark):
    """The marker-crash-window contract ``stream_apply_changes``
    documents: re-applying the SAME key-granularity batch leaves the
    replica unchanged.  Insert rows route through upsert (identical
    outcome for brand-new keys on first apply), so a crash between
    ``apply_changes`` and the sink's batch marker cannot duplicate
    rows on restart — previously inserts were a pure append and the
    replay silently corrupted an unversioned one-row-per-key replica."""
    _mk(store, spark, "idem", [("k1", 1), ("k2", 2)])
    feed = spark.createDataFrame(
        [("insert", "k9", 9), ("update", "k1", 11), ("delete", "k2", 2)],
        "change string, row_key string, `cf:v` long",
    )
    store.apply_changes("cdc.idem", feed)
    want = {("k1", 11), ("k9", 9)}
    assert {
        (r["row_key"], r["cf:v"])
        for r in store.read("cdc.idem").collect()
    } == want
    # the crash-window replay: same batch, applied again
    store.apply_changes("cdc.idem", feed)
    got = [(r["row_key"], r["cf:v"]) for r in store.read("cdc.idem").collect()]
    assert sorted(got) == sorted(want)  # multiset-exact: no duplicates


def test_cell_mode_mixed_feed_applies_nothing(store, spark):
    """A refused wrong-granularity feed must leave the replica
    UNTOUCHED: the cells-vs-update validation runs BEFORE any write,
    like the unknown-tag check — previously the feed's insert rows were
    appended first and the refusal raised after, leaving the replica
    partially mutated by a feed the method claims to refuse loudly."""
    _mk(store, spark, "mixnone", [("k1", 1)])
    feed = spark.createDataFrame(
        [("insert", "k2", 2), ("update", "k1", 5)],
        "change string, row_key string, `cf:v` long",
    )
    with pytest.raises(ValueError, match="cannot contain 'update'"):
        store.apply_changes("cdc.mixnone", feed, cells=True)
    assert {
        (r["row_key"], r["cf:v"])
        for r in store.read("cdc.mixnone").collect()
    } == {("k1", 1)}


def test_apply_changes_overlapping_put_delete_keeps_index_exact(store, spark):
    """r12 review fix: apply_changes accepts ARBITRARY feeds (e.g. two
    concatenated diffs), so a key appearing as BOTH update and delete
    ends deleted — and its covered-index entry must NOT be resurrected
    by the feed-driven index maintenance (ghost index entries are the
    silent-replica-corruption failure mode)."""
    _mk(store, spark, "ghost_src", [(f"g{i:03d}", i) for i in range(40)])
    spec = TableSpec(
        namespace="cdc",
        name="ghost_rep",
        key_type="string",
        families={"cf": {"v": "long"}},
    )
    store.create_table(spec)
    store.insert(
        "cdc.ghost_rep",
        store.read("cdc.ghost_src"),
        overwrite=True,
        generate_row_key=False,
    )
    store.create_covered_index(
        "cdc.ghost_rep", "cdc.ghost_rep_by_v", "cf:v", key_width=6
    )
    # malformed-but-accepted feed: g005 updated AND deleted (two diffs
    # concatenated); g007 plain update; g999 plain insert
    feed = spark.createDataFrame(
        [
            ("update", "g005", 555),
            ("delete", "g005", 5),
            ("update", "g007", 777),
            ("insert", "g999", 999),
        ],
        "change string, row_key string, `cf:v` long",
    ).select("row_key", "`cf:v`", "change")
    store.apply_changes("cdc.ghost_rep", feed)
    base = {
        (r["row_key"], r["cf:v"]) for r in store.read("cdc.ghost_rep").collect()
    }
    assert ("g005", 5) not in base and ("g005", 555) not in base
    assert ("g007", 777) in base and ("g999", 999) in base
    idx = {
        (r["i:src_key"], r["cf:v"])
        for r in store.read("cdc.ghost_rep_by_v").collect()
    }
    assert not store.index_is_stale("cdc.ghost_rep_by_v")
    # index == projection of the post-replay base: no ghost g005 entry
    assert {k for k, _ in idx} == {k for k, _ in base}
    assert ("g005", 555) not in idx and ("g005", 5) not in idx


def test_apply_changes_empty_feed_is_true_noop_on_indexed_table(store, spark):
    """r12 review fix: an empty feed on an indexed replica must apply
    nothing, mark nothing stale, and leave the index byte-identical."""
    _mk(store, spark, "noop_src", [(f"n{i:03d}", i) for i in range(20)])
    store.create_covered_index(
        "cdc.noop_src", "cdc.noop_src_by_v", "cf:v", key_width=6
    )
    before = sorted(
        map(tuple, store.read("cdc.noop_src_by_v").collect())
    )
    empty = spark.createDataFrame(
        [], "row_key string, `cf:v` long, change string"
    )
    n = store.apply_changes("cdc.noop_src", empty)
    assert n == 0
    assert not store.index_is_stale("cdc.noop_src_by_v")
    assert sorted(map(tuple, store.read("cdc.noop_src_by_v").collect())) == before


def test_dml_job_counts_stay_fused(store, spark):
    """Job-count pins for the fused commit machinery (r15): the
    changefeed replay is ONE locate+rewrite+swap commit riding one
    bounded feed-stats collect, not an upsert cycle followed by a
    delete_keys cycle with five probe jobs.  Bounds are loose (current
    measured counts ~21 for a put+delete replay, ~6 for upsert, ~12
    for delete_keys at gate scale) so AQE variance cannot flake them,
    but tight enough that a regression to the pre-fusion sequential
    replay (41+ jobs) fails loudly."""
    sc = spark.sparkContext
    tag = "man" if store.manifest_authority else "pos"

    def jobs(label, fn):
        label = f"{label}_{tag}"  # group ids accumulate per session
        sc.setJobGroup(label, label)
        try:
            fn()
        finally:
            sc.setJobGroup("idle", "idle")
        return len(sc.statusTracker().getJobIdsForGroup(label))

    _mk(store, spark, "jobpin", [(f"k{i:03d}", i) for i in range(120)])
    store.snapshot("cdc.jobpin", "jp_s1")
    n = jobs("jp_upsert", lambda: store.upsert(
        "cdc.jobpin",
        spark.createDataFrame(
            [("k005", 500), ("x900", 900)], "row_key string, `cf:v` long"
        ),
    ))
    assert n <= 19, f"upsert commit grew to {n} jobs"
    n = jobs("jp_delete", lambda: store.delete_keys(
        "cdc.jobpin", spark.createDataFrame([("k010",)], "row_key string")
    ))
    assert n <= 14, f"delete_keys commit grew to {n} jobs"
    feed = store.read_changes("cdc.jobpin", versus="jp_s1")
    replica = KeyedTableStore(
        store.spark, store.warehouse_dir + "_jp_replica",
        manifest_authority=store.manifest_authority,
    )
    store.export_snapshot("jp_s1", replica.warehouse_dir)
    replica.clone_snapshot("jp_s1", "cdc.jobpin")
    n = jobs("jp_apply", lambda: replica.apply_changes("cdc.jobpin", feed))
    assert n <= 28, f"apply_changes replay grew to {n} jobs"
    # and the replay converged (the pin must never trade correctness)
    src = store.read("cdc.jobpin")
    dst = replica.read("cdc.jobpin")
    assert dst.exceptAll(src).unionAll(src.exceptAll(dst)).isEmpty()
