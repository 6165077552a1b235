"""Structured Streaming coverage: watermarked window agg, streaming dedup
(bounded state), and stateful sessionization — each run as a real streaming
query over a file source (availableNow) into a memory sink, and where a
batch twin exists, checked against it.
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from spark_sql_hbase_spark.streaming import (
    sessionize_stream,
    streaming_dedup,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """events re-written as four time-ordered files (sequential writes →
    increasing mtime) so the file source replays them in event-time order
    across micro-batches, advancing the watermark between batches.
    ``queries.table`` normalizes the ns-timestamp column to a real
    TIMESTAMP (required for watermarks)."""
    from spark_sql_hbase_spark.queries import table as load_table

    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, SF, "events").cache()
    ts_q = [r[0] for r in ev.selectExpr(
        "percentile(unix_micros(ts), array(0.25, 0.5, 0.75)) AS q"
    ).selectExpr("explode(q)").collect()]
    lo = [None] + ts_q
    hi = ts_q + [None]
    for i, (a, b) in enumerate(zip(lo, hi)):
        part = ev
        if a is not None:
            part = part.filter(F.unix_micros("ts") > a)
        if b is not None:
            part = part.filter(F.unix_micros("ts") <= b)
        part.coalesce(1).write.mode("append").parquet(out)
    ev.unpersist()
    return out


def _run_to_memory(stream_df, name, spark, output_mode):
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")  # fresh: memory sink can't recover
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name)


def _read_stream(spark, path, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(path)
    )


def test_windowed_counts_match_batch(spark, events_stream_dir):
    ev = spark.read.parquet(events_stream_dir)
    stream = _read_stream(spark, events_stream_dir, ev.schema)

    got = _run_to_memory(
        windowed_event_counts(stream, watermark="10 minutes"),
        "win_counts", spark, "append",
    )
    batch = (
        ev.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
        )
    )
    # append mode only emits windows sealed by the final watermark; every
    # emitted window must exactly match the batch result
    emitted = got.select("win_start", "win_end", "event_type", "n_events")
    assert emitted.count() > 0
    mismatched = emitted.exceptAll(batch)
    assert mismatched.count() == 0, mismatched.limit(5).collect()


@pytest.mark.slow
def test_streaming_dedup_bounded_state(spark, tmp_path):
    src = str(tmp_path / "docs")
    docs = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "alpha"),
            (2, "2024-01-01 00:01:00", "beta"),
            (3, "2024-01-01 00:02:00", "alpha"),  # dup of 1 inside horizon
            (4, "2024-01-01 00:03:00", "gamma"),
        ],
        "doc_id long, ts string, text string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    docs.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    got = _run_to_memory(
        streaming_dedup(stream, watermark="1 hour"), "dedup_docs", spark, "append"
    )
    kept_texts = sorted(r["text"] for r in got.select("text").collect())
    assert kept_texts == ["alpha", "beta", "gamma"]


@pytest.mark.slow
def test_sessionize_stream_emits_closed_sessions(spark, events_stream_dir):
    ev = spark.read.parquet(events_stream_dir)
    stream = _read_stream(spark, events_stream_dir, ev.schema)

    got = _run_to_memory(sessionize_stream(stream, 30), "sessions", spark, "append")
    # sessions whose gap-timeout predates the final watermark have been
    # emitted; each must be internally consistent and match the batch
    # sessionization law (session bounds align to some batch session)
    rows = got.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["session_start"] <= r["session_end"]
        assert r["n_events"] >= 1

    from spark_sql_hbase_spark.queries import load_all

    batch = load_all()["zd21_sessionization"].fn(spark, SF)
    batch_sessions = {
        (r["user_id"], r["n_events"], r["dur_ms"])
        for r in batch.select("user_id", "n_events", "dur_ms").collect()
    }
    # batch dur_ms = unix_millis(max) - unix_millis(min): each endpoint is
    # floored to ms BEFORE subtracting — mirror that exactly
    from datetime import datetime, timedelta

    epoch = datetime(1970, 1, 1)

    def ms(d):
        return ((d - epoch) // timedelta(microseconds=1)) // 1000

    emitted = {
        (r["user_id"], r["n_events"], ms(r["session_end"]) - ms(r["session_start"]))
        for r in rows
    }
    assert emitted <= batch_sessions, emitted - batch_sessions


def test_stream_into_keyed_table(spark, tmp_path):
    """Streaming ingest into the keyed store: micro-batches append through
    the insert path (row-key generation + key-sorted regions), then a
    compaction restores one sorted layout."""
    from spark_sql_hbase_spark.catalog import TableSpec
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore
    from spark_sql_hbase_spark.streaming.pipelines import write_stream_to_keyed_table

    src = str(tmp_path / "in")
    docs = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(20)], "doc_id long, text string"
    )
    docs.repartition(2).write.parquet(src)

    store = KeyedTableStore(spark, str(tmp_path / "wh"))
    store.create_table(TableSpec(
        namespace="stream", name="docs", key_type="string",
        families={"d": {"doc_id": "long", "text": "string"}},
    ))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(
            F.col("doc_id").alias("d:doc_id"),
            F.col("text").alias("d:text"),
        )
    )
    q = write_stream_to_keyed_table(
        stream, store, "stream.docs", str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    out = store.read("stream.docs")
    assert out.count() == 20
    # generated row keys are dense and unique across batches
    keys = [r["row_key"] for r in out.select("row_key").collect()]
    assert len(set(keys)) == 20
    store.compact("stream.docs", n_regions=2)
    assert store.read("stream.docs").count() == 20


def test_streaming_checkpoint_incremental_resume(spark, tmp_path):
    """Production restart semantics: two availableNow runs sharing one
    checkpoint process each input file exactly once — the second run
    picks up ONLY the file that arrived after the first, and the file
    sink (whose _spark_metadata commit log is the exactly-once
    mechanism) never duplicates the first batch."""
    import os

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    def run_once():
        stream = spark.readStream.schema("v long").parquet(src)
        q = (
            stream.select((F.col("v") * 10).alias("w"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.range(5).selectExpr("id AS v").coalesce(1).write.mode("append").parquet(src)
    run_once()
    got1 = sorted(r.w for r in spark.read.parquet(out).collect())
    assert got1 == [0, 10, 20, 30, 40], got1

    spark.range(100, 103).selectExpr("id AS v").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    got2 = sorted(r.w for r in spark.read.parquet(out).collect())
    assert got2 == [0, 10, 20, 30, 40, 1000, 1010, 1020], got2


def test_stream_neardup_index_multi_batch_matches_batch(spark, tmp_path):
    """The foreachBatch stream-static near-dup must accumulate, across
    MULTIPLE micro-batches, exactly the pair set the batch operator
    produces over the whole delta — per-delta dedup semantics compose
    batch-by-batch (each delta doc verifies against the static corpus
    only, so batch boundaries cannot change the result)."""
    from spark_sql_hbase_spark.operators.dedup import (
        minhash_lsh_join_against_index,
        persist_band_index,
    )
    from spark_sql_hbase_spark.streaming.pipelines import (
        stream_neardup_against_index,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    is_new = (F.col("doc_id") % 17) == 0
    new, corpus = docs.filter(is_new), docs.filter(~is_new)

    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    for t in ("z65t_idx", "z65t_sink"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(warehouse.replace("file:", "") + f"/{t}", ignore_errors=True)
    persist_band_index(corpus, "doc_id", "text", "z65t_idx")

    src = str(tmp_path / "delta_src")
    new.repartition(2).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .parquet(src)
    )
    q = stream_neardup_against_index(
        stream,
        spark.table("z65t_idx"),
        corpus,
        "doc_id",
        "text",
        str(tmp_path / "ckpt"),
        "z65t_sink",
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)

    got = sorted(map(tuple, spark.table("z65t_sink").collect()))
    want = sorted(
        map(
            tuple,
            minhash_lsh_join_against_index(
                new, spark.table("z65t_idx"), corpus, "doc_id", "text"
            ).collect(),
        )
    )
    assert got == want
    assert n_batches >= 2, n_batches  # the split actually exercised >1 batch
    spark.sql("DROP TABLE IF EXISTS z65t_idx")
    spark.sql("DROP TABLE IF EXISTS z65t_sink")


def test_stream_cms_multi_batch_matches_batch_sketch(spark, sf_dir):
    """CMS counters are pure mergeable sums, so a MULTI-batch drain
    (maxFilesPerTrigger=1) must land bit-identical to the batch
    operator's sketch over the same documents — the bounded-state
    streaming-aggregation contract."""
    import os
    import tempfile
    import uuid

    from spark_sql_hbase_spark.queries import table
    from spark_sql_hbase_spark.streaming.pipelines import streaming_cms_sketch

    docs = table(spark, sf_dir, "documents").select("text")
    src = os.path.join(tempfile.mkdtemp(prefix="cms_stream_src_"), "in")
    docs.repartition(4).write.mode("overwrite").parquet(src)  # 4 files
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = streaming_cms_sketch(stream, "text", depth=3, width=512)
    name = f"cms_{uuid.uuid4().hex}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="cms_stream_ckpt_")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["row"], r["bucket"]): r["c"] for r in spark.table(name).collect()
    }
    # batch twin: same grid from the batch documents frame
    batch = {
        (r["row"], r["bucket"]): r["c"]
        for r in streaming_cms_sketch(docs, "text", depth=3, width=512).collect()
    }
    assert got == batch and len(got) > 0


def test_quota_admission_state_spans_batches(spark, tmp_path):
    """The lifetime quota carries across micro-batches: with quota=10 and
    two 8-event batches per user, batch 1 admits 8 and batch 2 admits 2
    — the GroupState running total is the whole point."""
    from spark_sql_hbase_spark.streaming.pipelines import quota_admission_stream

    import os
    import uuid

    src = str(tmp_path / "in")
    b = spark.createDataFrame(
        [(u,) for u in (1, 2) for _ in range(8)], "user_id long"
    )
    b.coalesce(1).write.mode("overwrite").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(b.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"quota_{uuid.uuid4().hex}"
    q = (
        quota_admission_stream(stream, "user_id", quota=10)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["key"], []).append((r["admitted"], r["rejected"]))
    for u in (1, 2):
        batches = sorted(per_user[u], reverse=True)  # (8,0) then (2,6)
        assert batches == [(8, 0), (2, 6)], per_user[u]


def test_keyed_sink_batch_replay_is_skipped(spark, tmp_path):
    """ADVICE r5: foreachBatch replay after failure is at-least-once —
    the keyed sink records the last committed batch_id inside the
    query's checkpoint dir and skips already-applied batches, so a
    replayed batch cannot duplicate (row_key, version) cells.

    Simulated replay: pre-record batch 0 as applied (exactly what a
    crash AFTER commit-marker-write but BEFORE the engine's own commit
    produces — the engine then re-runs batch 0), start the stream, and
    assert the skipped batch wrote nothing while later batches landed."""
    from spark_sql_hbase_spark.catalog import TableSpec
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore
    from spark_sql_hbase_spark.streaming.pipelines import (
        _batch_already_applied,
        _record_batch_applied,
        write_stream_to_keyed_table,
    )

    # marker helpers: monotone threshold semantics
    ckpt_unit = str(tmp_path / "unit_ckpt")
    os.makedirs(ckpt_unit)
    assert not _batch_already_applied(ckpt_unit, 0)
    _record_batch_applied(ckpt_unit, 3)
    assert _batch_already_applied(ckpt_unit, 3)
    assert _batch_already_applied(ckpt_unit, 2)
    assert not _batch_already_applied(ckpt_unit, 4)

    src = str(tmp_path / "in")
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    docs.coalesce(1).write.mode("append").parquet(src)

    store = KeyedTableStore(spark, str(tmp_path / "wh"))
    store.create_table(TableSpec(
        namespace="rp", name="t", key_type="string",
        families={"d": {"doc_id": "long", "text": "string"}},
    ))
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt)
    _record_batch_applied(ckpt, 0)  # "crash after apply" of batch 0
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(F.col("doc_id").alias("d:doc_id"), F.col("text").alias("d:text"))
    )
    q = write_stream_to_keyed_table(stream, store, "rp.t", ckpt)
    q.awaitTermination(120)
    # batch 0 (first file) skipped as already-applied; batch 1 landed once
    assert store.read("rp.t").count() == 10


def test_stream_index_dualwrite_overwidth_batch_rejected(spark, tmp_path):
    """ADVICE r5: the streaming dual-write path must enforce the same
    width guard as the batch index build — an over-width streamed value
    would lpad-TRUNCATE into a colliding index key prefix.  The batch
    carrying a 6-char value against key_width=4 must fail the query, and
    neither side of the dual write may land."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from spark_sql_hbase_spark.catalog import TableSpec
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore
    from spark_sql_hbase_spark.streaming.pipelines import (
        write_stream_with_index_maintenance,
    )

    store = KeyedTableStore(spark, str(tmp_path / "wh"))
    store.create_table(TableSpec(
        namespace="ow", name="t", key_type="string",
        families={"c": {"g": "long"}},
    ))
    store.create_table(TableSpec(
        namespace="ow", name="ix", key_type="string",
        families={"i": {"src_key": "string"}, "c": {"g": "long"}},
    ))
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [("0001", 123456)], "row_key string, `c:g` long"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("row_key string, `c:g` long").parquet(src)
    q = write_stream_with_index_maintenance(
        stream, store, "ow.t", "ow.ix", "c:g", [], 4, str(tmp_path / "ckpt")
    )
    with pytest.raises(StreamingQueryException, match="key_width"):
        q.awaitTermination(120)
    assert store.read("ow.t").count() == 0
    assert store.read("ow.ix").count() == 0


def test_stream_sink_periodic_minor_compaction(spark, tmp_path):
    """minor_compact_every=N folds the ingest tail's small files back
    into one sorted run every N batches — file growth stays bounded
    under continuous ingest and content is untouched."""
    from spark_sql_hbase_spark.catalog import TableSpec
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore
    from spark_sql_hbase_spark.streaming.pipelines import write_stream_to_keyed_table

    src = str(tmp_path / "in")
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(24)], "doc_id long, text string"
    )
    for k in range(4):
        docs.filter((F.col("doc_id") % 4) == k).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    store = KeyedTableStore(spark, str(tmp_path / "wh"))
    store.create_table(TableSpec(
        namespace="smc", name="t", key_type="string",
        families={"d": {"doc_id": "long", "text": "string"}},
    ))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(F.col("doc_id").alias("d:doc_id"), F.col("text").alias("d:text"))
    )
    q = write_stream_to_keyed_table(
        stream, store, "smc.t", str(tmp_path / "ckpt"),
        minor_compact_every=2,
    )
    q.awaitTermination(120)
    out = store.read("smc.t")
    assert out.count() == 24
    assert out.select("d:doc_id").distinct().count() == 24
    path = store.table_path(store.registry.get("smc.t"))
    n_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    # 4 batches x 4-region inserts would leave ~16+ small files without
    # compaction; the every-2-batches minor pass folds them down
    assert n_files <= 6, n_files


def test_stream_apply_changes_replicates_continuously(spark, tmp_path):
    """Streaming ReplicationSink: changefeed batches shipped through a
    file stream replay onto the replica in cycle order; the checkpoint
    batch-id marker makes a re-run a no-op (restart safety)."""
    from spark_sql_hbase_spark.catalog import TableSpec
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore
    from spark_sql_hbase_spark.streaming.pipelines import (
        stream_apply_changes,
    )

    src = KeyedTableStore(spark, str(tmp_path / "src_wh"))
    dst = KeyedTableStore(spark, str(tmp_path / "dst_wh"))
    spec_kw = dict(
        key_type="string", families={"cf": {"v": "long"}}
    )
    src.create_table(TableSpec(namespace="st", name="repl", **spec_kw))
    dst.create_table(TableSpec(namespace="st", name="repl", **spec_kw))
    base = [(f"k{i:02d}", i) for i in range(12)]
    for st in (src, dst):
        st.insert(
            "st.repl",
            spark.createDataFrame(base, "row_key string, `cf:v` long"),
            overwrite=True,
        )

    feed_dir = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed_dir)

    def ship_cycle(n: int) -> None:
        feed = src.read_changes("st.repl", versus=f"st_s{n}")
        feed.coalesce(1).write.mode("append").parquet(feed_dir)
        q = stream_apply_changes(
            spark.readStream.schema(
                "change string, row_key string, `cf:v` long"
            ).parquet(feed_dir),
            dst,
            "st.repl",
            ckpt,
        )
        q.awaitTermination(120)

    def rows(st):
        return {
            (r["row_key"], r["cf:v"]) for r in st.read("st.repl").collect()
        }

    # cycle 1: one MERGE (update + insert)
    src.snapshot("st.repl", "st_s1")
    src.upsert(
        "st.repl",
        spark.createDataFrame(
            [("k03", 333), ("x1", 101)], "row_key string, `cf:v` long"
        ),
    )
    ship_cycle(1)
    assert rows(dst) == rows(src)

    # cycle 2: a DELETE ships as its own delta vs a fresh snapshot
    src.snapshot("st.repl", "st_s2")
    src.delete_where("st.repl", "row_key = 'k05'")
    ship_cycle(2)
    assert rows(dst) == rows(src)

    # restart safety: re-running over the SAME feed directory with the
    # same checkpoint replays nothing (batch-id marker)
    before = rows(dst)
    q = stream_apply_changes(
        spark.readStream.schema(
            "change string, row_key string, `cf:v` long"
        ).parquet(feed_dir),
        dst,
        "st.repl",
        ckpt,
    )
    q.awaitTermination(120)
    assert rows(dst) == before == rows(src)


def test_idempotent_batch_commit_replay_leaves_sink_unchanged(spark, tmp_path):
    """r13 VERDICT item 4: the shared staged-commit helper gives
    foreachBatch APPEND sinks exactly-once OBSERVABLE output — a
    replayed batch_id is skipped outright, a half-written staging
    attempt is deleted and rewritten, and readers only ever see
    committed batch directories."""
    import os

    from spark_sql_hbase_spark.streaming.pipelines import (
        committed_batches,
        idempotent_batch_commit,
    )

    sink = str(tmp_path / "sink")

    def listing():
        out = {}
        for root, _dirs, files in os.walk(sink):
            if "_staging" in root:
                continue
            for f in files:
                p = os.path.join(root, f)
                out[p] = os.stat(p).st_mtime_ns
        return out

    df0 = spark.range(5).selectExpr("id", "id * 2 AS v")
    assert idempotent_batch_commit(df0, sink, 0) is True
    snap = listing()
    assert committed_batches(spark, sink).count() == 5
    assert set(committed_batches(spark, sink).columns) == {"id", "v"}

    # replay of the SAME batch_id — even with different (at-least-once
    # redelivered) content — is skipped: the sink is byte-identical
    df_replay = spark.range(9).selectExpr("id", "id * 3 AS v")
    assert idempotent_batch_commit(df_replay, sink, 0) is False
    assert listing() == snap
    assert committed_batches(spark, sink).count() == 5

    # a half-written staging attempt from a crashed try is swept and
    # the batch commits cleanly
    staging = os.path.join(sink, "_staging", "1")
    os.makedirs(staging)
    with open(os.path.join(staging, "junk.bin"), "w") as f:
        f.write("partial write from a crashed attempt")
    df1 = spark.range(3).selectExpr("id + 100 AS id", "id AS v")
    assert idempotent_batch_commit(df1, sink, 1) is True
    assert not os.path.exists(staging)
    got = committed_batches(spark, sink)
    assert got.count() == 8
    assert got.filter("id >= 100").count() == 3


def test_stream_ann_serving_sink_is_replay_safe(spark, tmp_path):
    """The adopted sinks (stream_ann_serving / stream_media_metadata)
    commit through idempotent_batch_commit: after the stream finishes,
    re-delivering batch 0 into the same sink leaves the registered
    relation unchanged — exactly-once observable output."""
    import os

    from pyspark.sql import functions as F

    from spark_sql_hbase_spark.operators.similarity import (
        _to_double,
        assign_cells,
    )
    from spark_sql_hbase_spark.queries import table
    from spark_sql_hbase_spark.streaming.pipelines import (
        idempotent_batch_commit,
        stream_ann_serving,
    )

    sf = "/root/testdata/sf0.001"
    emb = table(spark, sf, "embeddings")
    cents = [
        (r["cluster_id"], list(r["cv"]))
        for r in emb.filter(F.col("vec_id") < 4)
        .select(
            F.col("vec_id").alias("cluster_id"),
            _to_double(F.col("embedding")).alias("cv"),
        )
        .collect()
    ]
    corpus = assign_cells(emb, cents, "vec_id", "embedding", "cell")
    queries = emb.filter((F.col("vec_id") % 9) == 0)
    src_dir = str(tmp_path / "src")
    queries.write.parquet(src_dir)
    stream = spark.readStream.schema(queries.schema).parquet(src_dir)
    ckpt = str(tmp_path / "ckpt")
    sink_dir = str(tmp_path / "sink")
    q = stream_ann_serving(
        stream, corpus, cents, "vec_id", "embedding", ckpt,
        "__replay_ann_sink", k=3, nprobe=2, sink_dir=sink_dir,
    )
    q.awaitTermination(120)
    got = spark.table("__replay_ann_sink")
    before = sorted(map(tuple, got.collect()))
    assert before, "stream produced no results"
    assert os.path.isdir(os.path.join(sink_dir, "batch_id=0"))
    # simulate an at-least-once redelivery of batch 0
    fake = spark.createDataFrame(
        [("999", "998", 0.0, 1)], "query_id string, neighbor_id string, cos double, rank int"
    )
    assert idempotent_batch_commit(fake, sink_dir, 0) is False
    assert sorted(map(tuple, spark.table("__replay_ann_sink").collect())) == before


def test_committed_batches_tolerates_all_empty_batches(spark, tmp_path):
    """Review fix: an empty micro-batch writes no parquet footer, so a
    sink whose every batch so far was empty must still read (the
    replaced saveAsTable sink kept its schema in the catalog) — the
    schema parameter covers the footerless case, and the empty commit
    still arms the replay guard."""
    import os

    from spark_sql_hbase_spark.streaming.pipelines import (
        committed_batches,
        idempotent_batch_commit,
    )

    sink = str(tmp_path / "sink")
    empty = spark.range(1).filter("id < 0").selectExpr("id", "id * 2 AS v")
    assert idempotent_batch_commit(empty, sink, 0) is True
    assert os.path.isdir(os.path.join(sink, "batch_id=0"))
    got = committed_batches(spark, sink, schema=empty.schema)
    assert got.count() == 0
    assert got.columns == ["id", "v"]
    # the empty commit still skips its replay
    assert idempotent_batch_commit(empty, sink, 0) is False


def test_fold_streamed_tail_compacts_preserving_serving_content(spark, tmp_path):
    """The compaction the stream_sq8_ingest contract promises: folding
    the committed tail into a new generation snapshot preserves the
    serving relation exactly, advances the fold watermark atomically
    (it lives in the snapshot directory's NAME), GCs the superseded
    generation and the folded batch directories, and is idempotent —
    a fold with nothing new past the watermark is a no-op."""
    import os

    from spark_sql_hbase_spark.streaming.pipelines import (
        bootstrap_base_snapshot,
        fold_streamed_tail,
        idempotent_batch_commit,
        serving_scan,
    )

    base = str(tmp_path / "base")
    tail = str(tmp_path / "tail")
    bootstrap_base_snapshot(
        spark.range(5).selectExpr("id", "id * 10 AS v"), base
    )
    assert idempotent_batch_commit(
        spark.range(100, 103).selectExpr("id", "id AS v"), tail, 0
    )
    assert idempotent_batch_commit(
        spark.range(200, 202).selectExpr("id", "id AS v"), tail, 1
    )

    def serve():
        return sorted(map(tuple, serving_scan(spark, base, tail).collect()))

    before = serve()
    assert len(before) == 10

    assert fold_streamed_tail(spark, base, tail) is True
    assert serve() == before  # fold is invisible to readers
    assert os.path.isdir(os.path.join(base, "gen-1-through-1"))
    assert not os.path.isdir(os.path.join(base, "gen-0-through--1"))  # GC'd
    assert not os.path.isdir(os.path.join(tail, "batch_id=0"))  # folded+GC'd
    assert not os.path.isdir(os.path.join(tail, "batch_id=1"))

    # nothing past the watermark: no-op, no new generation
    assert fold_streamed_tail(spark, base, tail) is False
    assert serve() == before

    # new arrivals past the watermark fold into generation 2
    assert idempotent_batch_commit(
        spark.range(300, 304).selectExpr("id", "id AS v"), tail, 2
    )
    assert serve() == sorted(before + [(i, i) for i in range(300, 304)])
    assert fold_streamed_tail(spark, base, tail) is True
    assert os.path.isdir(os.path.join(base, "gen-2-through-2"))
    assert serve() == sorted(before + [(i, i) for i in range(300, 304)])


def test_fold_streamed_tail_handles_footerless_edges(spark, tmp_path):
    """Empty micro-batches commit no parquet footer: a fold over an
    all-empty tail still advances the watermark (so GC reclaims the
    empty batch directories), and serving an empty-bootstrapped base
    falls back to the caller's schema instead of failing inference."""
    from spark_sql_hbase_spark.streaming.pipelines import (
        bootstrap_base_snapshot,
        fold_streamed_tail,
        idempotent_batch_commit,
        serving_scan,
    )

    base = str(tmp_path / "base")
    tail = str(tmp_path / "tail")
    empty = spark.range(1).filter("id < 0").selectExpr("id", "id * 2 AS v")
    bootstrap_base_snapshot(empty, base)
    assert idempotent_batch_commit(empty, tail, 0)
    got = serving_scan(spark, base, tail, schema=empty.schema)
    assert got.count() == 0 and got.columns == ["id", "v"]
    assert fold_streamed_tail(spark, base, tail, schema=empty.schema) is True
    got = serving_scan(spark, base, tail, schema=empty.schema)
    assert got.count() == 0 and got.columns == ["id", "v"]
    # rows landing after the empty epoch serve and fold normally
    assert idempotent_batch_commit(
        spark.range(3).selectExpr("id", "id * 2 AS v"), tail, 1
    )
    assert serving_scan(spark, base, tail).count() == 3
    assert fold_streamed_tail(spark, base, tail) is True
    assert serving_scan(spark, base, tail).count() == 3


def test_fold_refuses_unreadable_snapshot(spark, tmp_path):
    """Review fix (data-loss class): footerless is detected by the file
    LISTING, not by swallowing read errors — a snapshot whose data file
    exists but cannot be read must fail the fold loudly, never commit a
    generation missing the base rows and then GC the only copy."""
    import glob
    import os

    import pytest

    from spark_sql_hbase_spark.streaming.pipelines import (
        bootstrap_base_snapshot,
        fold_streamed_tail,
        idempotent_batch_commit,
    )

    base = str(tmp_path / "base")
    tail = str(tmp_path / "tail")
    bootstrap_base_snapshot(
        spark.range(5).selectExpr("id", "id * 10 AS v"), base
    )
    assert idempotent_batch_commit(
        spark.range(100, 103).selectExpr("id", "id AS v"), tail, 0
    )
    snap = os.path.join(base, "gen-0-through--1")
    parts = glob.glob(os.path.join(snap, "part-*.parquet"))
    assert parts
    for p in parts:  # corrupt every data file: footer gone, file visible
        with open(p, "wb") as f:
            f.write(b"not a parquet file")
    with pytest.raises(Exception):
        fold_streamed_tail(spark, base, tail)
    # nothing committed, nothing GC'd: the sole copies survive the failure
    assert not os.path.isdir(os.path.join(base, "gen-1-through-0"))
    assert os.path.isdir(snap)
    assert os.path.isdir(os.path.join(tail, "batch_id=0"))
