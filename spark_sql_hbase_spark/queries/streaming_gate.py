"""Streaming gate queries: run the Structured Streaming pipelines
(streaming/pipelines.py) to completion over the driver's parquet tables
with ``trigger(availableNow=True)`` and a memory sink, so the driver's
DuckDB-oracle gate can check STREAMING results — not just their batch
twins.

Why this is oracle-able at all: each gate rewrites its input as ONE
parquet file, so available-now processes it as ONE micro-batch followed by
one empty flush batch. With a single data batch no row is ever late (the
watermark is still unset while the data is processed), so the emitted set
is a pure function of the final watermark = max(event time) - delay:

- append-mode window aggregation emits exactly the windows finalized by
  the last watermark;
- ``applyInPandasWithState`` sessionization emits every gap-closed session
  plus the trailing open sessions whose event-time timeout fired;
- ``dropDuplicatesWithinWatermark`` keeps one row per digest.

Each of those is a deterministic, SQL-expressible condition, written into
the oracle below. (Which physical row survives dedup IS batch-dependent,
so st03 projects only the digest set.)

The reference inherits stock Structured Streaming (SURVEY §2.B
"Streaming" row); these gates cover the windowed-agg / dedup / custom
stateful session operators listed there and in COVERAGE.md.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_hbase_spark.functions.det import DEC
from spark_sql_hbase_spark.queries import (
    assert_multiset_equal,
    register,
    table,
)
from spark_sql_hbase_spark.streaming.pipelines import (
    sessionize_stream,
    streaming_dedup,
    windowed_event_counts,
)

_WM_MIN = 10  # st01 watermark delay (minutes)
_GAP_MIN = 30  # st02 session gap == watermark delay (minutes)


def _one_batch_stream(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Rewrite ``df`` as a single parquet file and open it as a file
    stream — one file → one micro-batch, the precondition for the
    deterministic-emission argument in the module docstring."""
    stream, _ = _one_batch_stream_sized(spark, df)
    return stream


def _one_batch_stream_sized(
    spark: SparkSession, df: DataFrame
) -> tuple[DataFrame, int]:
    """:func:`_one_batch_stream` plus the written input's byte size, so
    the caller can derive a scale-adaptive state-partition count from
    the actual input volume (guide §2: derive partitioning from input
    size, never from a constant)."""
    src = os.path.join(tempfile.mkdtemp(prefix="stream_gate_src_"), "in")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    nbytes = sum(
        e.stat().st_size
        for e in os.scandir(src)
        if e.name.endswith(".parquet")
    )
    return spark.readStream.schema(df.schema).parquet(src), nbytes


def _scaled_state_partitions(spark: SparkSession, input_bytes: int) -> int:
    """Shuffle/state-partition count for a bounded one-batch stream,
    derived from the batch's input size: ~32 MB of input per state
    partition, clamped to [4, the session's shuffle partitions].

    Why this exists: a stateful streaming operator creates one state
    store per shuffle partition, and EVERY micro-batch (including the
    availableNow no-data flush batch) pays a per-store load+commit
    cycle — measured ~0.4-0.6 s of summed commit time per 32 stores on
    a few MB of state, i.e. pure per-instance overhead.  AQE cannot
    coalesce stateful streaming exchanges (the count is pinned into the
    state checkpoint at the first batch), so deriving the count from
    input volume replaces the coalescing AQE would have done for an
    equivalent batch plan.  Growing inputs scale the count back up to
    the session's shuffle partitions; the session value itself scales
    with $SPARK_GRAFT_SHUFFLE_PARTITIONS / cluster config."""
    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(4, min(cur, input_bytes // (32 << 20) + 4))


def _run_available_now(
    stream_df: DataFrame,
    output_mode: str = "append",
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain the stream into a uniquely-named memory sink; return the
    sink's table. Memory sink is test/gate-only — production sinks are the
    keyed-table / parquet / kafka writers (streaming/pipelines.py).

    ``state_partitions`` (from :func:`_scaled_state_partitions`) pins
    the query's shuffle-partition count — and therefore its state-store
    instance count — for the query's lifetime: Structured Streaming
    snapshots ``spark.sql.shuffle.partitions`` into the offset log at
    the first batch, so the session conf only needs to hold the value
    until the drain completes, and later batches (none here — fresh
    checkpoint per gate) would reuse the pinned value regardless of the
    session conf."""
    spark = stream_df.sparkSession
    name = f"gate_{uuid.uuid4().hex}"
    ckpt = tempfile.mkdtemp(prefix=f"stream_gate_ckpt_{name}_")
    old_parts = None
    if state_partitions is not None:
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if old_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.table(name)


@register(
    "z43_stream_windowed_counts",
    oracle=f"""
    WITH wm AS (
        SELECT epoch_ms(max(ts)) - {_WM_MIN * 60000} AS wm_ms FROM events
    ), agg AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS wstart,
               event_type,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 4) AS DOUBLE)
                   AS sum_value
        FROM events
        GROUP BY 1, 2
    )
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, n_events, sum_value
    FROM agg, wm
    WHERE epoch_ms(wstart + INTERVAL 5 MINUTE) <= wm.wm_ms
    """,
    description="streaming watermarked tumbling-window agg, append-mode "
    "finalized windows (availableNow over the events table)",
)
def z43_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "ts", "event_type", F.col("value").cast(DEC).alias("value")
    )
    stream, nbytes = _one_batch_stream_sized(spark, ev)
    out = _run_available_now(
        windowed_event_counts(stream, watermark=f"{_WM_MIN} minutes"),
        state_partitions=_scaled_state_partitions(spark, nbytes),
    )
    # append mode == only watermark-finalized windows are in the sink
    return out.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n_events",
        F.round("sum_value", 4).cast("double").alias("sum_value"),
    )


@register(
    "zf16_stream_sessionize",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('millisecond', lag(ts) OVER w, ts)
                            > {_GAP_MIN * 60000}
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sess_id
        FROM marked
    ), s AS (
        SELECT user_id, sess_id,
               epoch_us(min(ts)) AS session_start_us,
               epoch_us(max(ts)) AS session_end_us,
               COUNT(*) AS n_events
        FROM sess GROUP BY user_id, sess_id
    ), wm AS (
        SELECT epoch_ms(max(ts)) - {_GAP_MIN * 60000} AS wm_ms FROM events
    ), last AS (
        SELECT user_id, max(sess_id) AS last_id FROM s GROUP BY user_id
    )
    SELECT s.user_id, s.session_start_us, s.session_end_us, s.n_events
    FROM s JOIN last USING (user_id), wm
    WHERE s.sess_id < last.last_id
       OR (s.session_end_us // 1000 + {_GAP_MIN * 60000}) < wm.wm_ms
    """,
    description="streaming stateful sessionization (applyInPandasWithState): "
    "gap-closed sessions + event-time-timeout flushes",
)
def zf16_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    # NOT sized down like the sibling gates: this pipeline's state work
    # is applyInPandasWithState over per-user event groups — Python-CPU
    # bound, so shrinking partitions shrinks worker parallelism and
    # measured SLOWER (interleaved 5-rep A/B at sf0.1: 3.77 -> 4.81 s at
    # 4 partitions).  st13's applyInPandasWithState keeps the sizing
    # because its per-group work is one long: commit-overhead bound.
    stream = _one_batch_stream(spark, ev)
    out = _run_available_now(sessionize_stream(stream, gap_minutes=_GAP_MIN))
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
    )


@register(
    "z34_stream_dedup_digests",
    oracle="SELECT DISTINCT sha256(text) AS text_sha FROM documents",
    description="streaming exact dedup (dropDuplicatesWithinWatermark): "
    "surviving digest set == batch DISTINCT",
)
def z34_stream_dedup_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        # synthetic deterministic event time: one doc per second keeps the
        # whole corpus inside the 1h horizon *per micro-batch* (the horizon
        # only evicts across batches; one-batch input → pure digest dedup).
        # Offset by a day: epoch-0 event time ties the initial watermark
        # (0 ms) and is filtered as late.
        F.timestamp_micros((F.col("doc_id") + 86_400) * 1_000_000).alias("ts"),
    )
    stream, nbytes = _one_batch_stream_sized(spark, docs)
    out = _run_available_now(
        streaming_dedup(stream, watermark="1 hour"),
        state_partitions=_scaled_state_partitions(spark, nbytes),
    )
    return out.select("text_sha").distinct()


# ---------------------------------------------------------------------------
# z19 — stream-stream inner join (click→purchase attribution). With one
# data micro-batch no click or purchase is ever late, so the emitted set
# is exactly every pair satisfying the time-bounded join condition — a
# plain self-join for the oracle.
# ---------------------------------------------------------------------------
@register(
    "zf17_stream_stream_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           epoch_ms(p.ts) AS purchase_ms,
           epoch_ms(p.ts) - epoch_ms(c.ts) AS delay_ms,
           ROUND(p.value, 4) AS purchase_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    """,
    description="stream-stream inner join with two watermarks + "
    "time-bounded condition (bounded state), run to completion",
)
def zf17_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.streaming.pipelines import (
        click_purchase_attribution,
    )

    ev = table(spark, sf_dir, "events")
    stream, nbytes = _one_batch_stream_sized(spark, ev)
    return _run_available_now(
        click_purchase_attribution(stream, 10),
        state_partitions=_scaled_state_partitions(spark, nbytes),
    )


# ---------------------------------------------------------------------------
# st05 — stream-stream LEFT OUTER join (promoted round 5; was z45)
# (round-4 addition): matched
# click→purchase attributions PLUS one NULL-extended row per click whose
# match window expired under the final watermark (evict-and-emit).  The
# emitted set is deterministic given the final global watermark =
# min(max click ts, max purchase ts) - delay (multipleWatermarkPolicy
# default "min"); clicks still inside their window at end-of-stream stay
# in state and are NOT emitted — the oracle applies the same rule.
# ---------------------------------------------------------------------------
_SS_W_MIN = 10


@register(
    "zf18_stream_stream_outer_join",
    oracle=f"""
    WITH wm AS (
        SELECT least(
            (SELECT max(epoch_ms(ts)) FROM events WHERE event_type = 'click'),
            (SELECT max(epoch_ms(ts)) FROM events WHERE event_type = 'purchase')
        ) - {_SS_W_MIN * 60000} AS wm_ms
    )
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           epoch_ms(p.ts) - epoch_ms(c.ts) AS delay_ms,
           ROUND(p.value, 4) AS purchase_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL {_SS_W_MIN} MINUTE
    UNION ALL
    SELECT c.user_id,
           c.event_id AS click_id,
           CAST(NULL AS BIGINT) AS purchase_id,
           CAST(NULL AS BIGINT) AS delay_ms,
           CAST(NULL AS DOUBLE) AS purchase_value
    FROM events c, wm
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
          SELECT 1 FROM events p
          WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
            AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL {_SS_W_MIN} MINUTE
      )
      AND epoch_ms(c.ts) + {_SS_W_MIN * 60000} < wm.wm_ms
    """,
    description="stream-stream left-outer join: matched attributions + "
    "watermark-expired unmatched clicks (bounded state, evict-and-emit)",
)
def zf18_stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.streaming.pipelines import (
        click_purchase_attribution_outer,
    )

    ev = table(spark, sf_dir, "events")
    stream, nbytes = _one_batch_stream_sized(spark, ev)
    return _run_available_now(
        click_purchase_attribution_outer(stream, _SS_W_MIN),
        state_partitions=_scaled_state_partitions(spark, nbytes),
    )


# ---------------------------------------------------------------------------
# z59 — stream-stream FULL OUTER join (round-5 addition): the complete
# attribution audit in one pass — matched pairs + watermark-expired
# unmatched clicks (left audit, st05) + never-attributable purchases
# (right audit: a purchase NULL-emits once the watermark passes its ts —
# any later click would need click_ts <= purchase_ts < watermark, and
# late rows are dropped).  Emitted set deterministic given the final
# global watermark (min-policy), same argument as st05; rows still inside
# their bound at end-of-stream stay stateful — the oracle applies both
# eviction rules.
# ---------------------------------------------------------------------------
@register(
    "st09_stream_stream_full_outer",
    oracle=f"""
    WITH wm AS (
        SELECT least(
            (SELECT max(epoch_ms(ts)) FROM events WHERE event_type = 'click'),
            (SELECT max(epoch_ms(ts)) FROM events WHERE event_type = 'purchase')
        ) - {_SS_W_MIN * 60000} AS wm_ms
    )
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           epoch_ms(p.ts) - epoch_ms(c.ts) AS delay_ms,
           ROUND(p.value, 4) AS purchase_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL {_SS_W_MIN} MINUTE
    UNION ALL
    SELECT c.user_id,
           c.event_id AS click_id,
           CAST(NULL AS BIGINT) AS purchase_id,
           CAST(NULL AS BIGINT) AS delay_ms,
           CAST(NULL AS DOUBLE) AS purchase_value
    FROM events c, wm
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
          SELECT 1 FROM events p
          WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
            AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL {_SS_W_MIN} MINUTE
      )
      AND epoch_ms(c.ts) + {_SS_W_MIN * 60000} < wm.wm_ms
    UNION ALL
    SELECT p.user_id,
           CAST(NULL AS BIGINT) AS click_id,
           p.event_id AS purchase_id,
           CAST(NULL AS BIGINT) AS delay_ms,
           ROUND(p.value, 4) AS purchase_value
    FROM events p, wm
    WHERE p.event_type = 'purchase'
      AND NOT EXISTS (
          SELECT 1 FROM events c
          WHERE c.user_id = p.user_id AND c.event_type = 'click'
            AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL {_SS_W_MIN} MINUTE
      )
      AND epoch_ms(p.ts) < wm.wm_ms
    """,
    description="stream-stream full-outer join: matched attributions + "
    "expired unmatched clicks + never-attributable purchases",
)
def st09_stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.streaming.pipelines import (
        click_purchase_attribution_full,
    )

    ev = table(spark, sf_dir, "events")
    stream, nbytes = _one_batch_stream_sized(spark, ev)
    return _run_available_now(
        click_purchase_attribution_full(stream, _SS_W_MIN),
        state_partitions=_scaled_state_partitions(spark, nbytes),
    )


# ---------------------------------------------------------------------------
# z65 — STREAM-STATIC near-dup against the persisted band index (round-5
# addition): the streaming lift of d09 — deltas arrive as micro-batches,
# each is banded and joined against the static bucketed index, candidates
# verified exactly, pairs appended to a sink table (foreachBatch; zero
# streaming state).  One data batch → the emitted pair set equals the
# batch d09 contract, so the oracle is d09's exact-Jaccard twin verbatim.
# ---------------------------------------------------------------------------
from spark_sql_hbase_spark.functions.texthash import shingles_sql, tokens_sql
from spark_sql_hbase_spark.queries.llm import JACCARD_T, SHINGLE_N


@register(
    "st10_stream_neardup_index",
    oracle=f"""
    WITH __tok AS (
        SELECT doc_id, {tokens_sql("text")} AS t FROM documents
    ), __sh AS (
        SELECT doc_id, {shingles_sql("t", SHINGLE_N)} AS s FROM __tok
    ), __sizes AS (
        SELECT doc_id, len(s) AS n FROM __sh WHERE len(s) > 0
    ), __inv AS (
        SELECT doc_id, unnest(s) AS g FROM __sh
    ), __pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM __inv a JOIN __inv b ON a.g = b.g
        WHERE a.doc_id % 17 = 0 AND b.doc_id % 17 <> 0
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(inter * 1.0 / (na.n + nb.n - inter), 4) AS jac
    FROM __pairs
    JOIN __sizes na ON id_a = na.doc_id
    JOIN __sizes nb ON id_b = nb.doc_id
    WHERE ROUND(inter * 1.0 / (na.n + nb.n - inter), 4) >= {JACCARD_T}
    """,
    description="streaming delta near-dup vs static bucketed band index "
    "(foreachBatch stream-static join, zero streaming state)",
)
def st10_stream_neardup_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.dedup import persist_band_index
    from spark_sql_hbase_spark.streaming.pipelines import (
        stream_neardup_against_index,
    )

    docs = table(spark, sf_dir, "documents")
    is_new = (F.col("doc_id") % 17) == 0
    new, corpus = docs.filter(is_new), docs.filter(~is_new)
    idx_name = "__z65_band_idx"
    # the sink is a temp view over the committed-batch directory inside
    # the fresh checkpoint (idempotent_batch_commit) — only the band
    # INDEX remains a catalog table needing pre-run cleanup
    sink = "__z65_sink"
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql(f"DROP TABLE IF EXISTS {idx_name}")
    # a managed-table location left by a PREVIOUS session (in-memory
    # catalog: DROP in this session cannot see it) blocks creation
    shutil.rmtree(
        warehouse.replace("file:", "") + f"/{idx_name}", ignore_errors=True
    )
    persist_band_index(corpus, "doc_id", "text", idx_name)
    stream = _one_batch_stream(spark, new)
    ckpt = tempfile.mkdtemp(prefix="stream_gate_ckpt_z65_")
    q = stream_neardup_against_index(
        stream,
        spark.table(idx_name),
        corpus,
        "doc_id",
        "text",
        ckpt,
        sink,
        JACCARD_T,
        SHINGLE_N,
    )
    q.awaitTermination()
    return spark.table(sink)


# ---------------------------------------------------------------------------
# z72 — streaming count-min sketch (round-5 addition;
# streaming/pipelines.py::streaming_cms_sketch): the ingest-monitoring
# twin of z70 — token stream folds into the depth×width counter grid as
# a streaming aggregation whose state is BOUNDED at depth·width rows
# forever (no watermark needed, nothing evicted; complete-mode output is
# the same constant).  Oracle: the batch counter grid over the same
# documents — streaming and batch sketches are bit-identical because CMS
# counters are pure mergeable sums.
# ---------------------------------------------------------------------------
@register(
    "zh09_stream_cms_sketch",
    oracle=None,  # set below — reuses llm._cms_rows_sql after import
    description="streaming count-min sketch: bounded depth*width counter "
    "state over the token stream, complete-mode counters == batch sketch",
)
def zh09_stream_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.streaming.pipelines import streaming_cms_sketch

    docs = table(spark, sf_dir, "documents").select("text")
    stream, nbytes = _one_batch_stream_sized(spark, docs)
    agg = streaming_cms_sketch(stream, "text", depth=3, width=512)
    return _run_available_now(
        agg,
        output_mode="complete",
        state_partitions=_scaled_state_partitions(spark, nbytes),
    )


def _z72_oracle() -> str:
    from spark_sql_hbase_spark.queries.llm import _TOK, _cms_rows_sql

    return f"""
    WITH __t AS (
        SELECT unnest({_TOK}) AS term FROM documents
    ), __p AS (
        {_cms_rows_sql()}
    )
    SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS c
    FROM __p GROUP BY 1, 2
    """


from spark_sql_hbase_spark.queries import REGISTRY as _REG  # noqa: E402

_REG["zh09_stream_cms_sketch"].oracle = _z72_oracle()


# ---------------------------------------------------------------------------
# z77 — streaming quality-gated ingest into the keyed store (round-5
# addition): the end-to-end curation INGEST pipeline — document stream →
# row-local quality score (t02's expression, pure JVM) → gate → keyed
# table (row-key generation + key-sorted regions via foreachBatch
# insert, the streaming twin of the reference's A5 insert path) → read
# back.  Oracle: the same quality expression + threshold as plain batch
# SQL — streaming adds no nondeterminism because the score is row-local
# and the sink appends exactly the gated rows.
# ---------------------------------------------------------------------------
_Z77_QT = 0.5  # keep docs with composite quality >= 0.5


@register(
    "zg91_stream_quality_sink",
    oracle=None,  # assembled below (reuses llm's tokenizer SQL)
    description="streaming quality-gated ingest: stream -> row-local "
    "quality gate -> keyed-table sink -> readback",
)
def zg91_stream_quality_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.catalog import TableSpec
    from spark_sql_hbase_spark.operators.text import quality_expr_tokens
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore
    from spark_sql_hbase_spark.streaming.pipelines import (
        write_stream_to_keyed_table,
    )
    from spark_sql_hbase_spark.functions.texthash import tokens

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    stream = _one_batch_stream(spark, docs)
    # filter shape → token-array twin (round 14, see quality_expr_tokens)
    gated = stream.select(
        F.col("doc_id").alias("d:doc_id"),
        quality_expr_tokens("text", tokens(F.col("text"))).alias("d:quality"),
    ).filter(F.col("`d:quality`") >= _Z77_QT)
    wh = tempfile.mkdtemp(prefix="z77_keyed_wh_")
    store = KeyedTableStore(spark, wh)
    store.create_table(
        TableSpec(
            namespace="z77",
            name="kept",
            key_type="string",
            families={"d": {"doc_id": "long", "quality": "double"}},
        )
    )
    q = write_stream_to_keyed_table(
        gated, store, "z77.kept", tempfile.mkdtemp(prefix="z77_ckpt_")
    )
    q.awaitTermination()
    return store.read("z77.kept").select(
        F.col("`d:doc_id`").alias("doc_id"),
        F.col("`d:quality`").alias("quality"),
    )


def _z77_oracle() -> str:
    from spark_sql_hbase_spark.queries.llm import _TOK
    from spark_sql_hbase_spark.functions.texthash import stopword_count_sql

    return f"""
    WITH __f AS (
        SELECT doc_id, len(t) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT)
                   AS n_punct,
               {stopword_count_sql('t', 'en')} AS sw,
               greatest(len(t), 1) AS d
        FROM (SELECT doc_id, text, {_TOK} AS t FROM documents)
    )
    SELECT doc_id,
           CAST(2 * d * least(n_tokens, 100) - 100 * least(n_punct, d)
                + 100 * sw AS DOUBLE) / (200 * d) AS quality
    FROM __f
    WHERE CAST(2 * d * least(n_tokens, 100) - 100 * least(n_punct, d)
               + 100 * sw AS DOUBLE) / (200 * d) >= {_Z77_QT}
    """


_REG["zg91_stream_quality_sink"].oracle = _z77_oracle()


# ---------------------------------------------------------------------------
# zg21 (was st06, was z85) — streaming CDC upsert materialization (round-5 addition):
# Spark Structured Streaming has no native UPSERT sink; the versioned
# keyed table provides one — each micro-batch APPENDS (row_key, value,
# version) cells through the keyed insert path, and `read_versions_asof`
# materializes the latest-state view.  Two batches update overlapping
# keys (versions ride the batch sequence); the view shows batch-2 values
# for updated keys, batch-1 for the rest — the classic CDC "apply
# changes" semantics, bounded state (none — state IS the table).
# ---------------------------------------------------------------------------
@register(
    "zg21_stream_upsert_view",
    oracle="""
    SELECT lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS row_key,
           CASE WHEN c_custkey % 5 = 0 THEN c_acctbal * 2.0
                ELSE c_acctbal END AS acctbal,
           CASE WHEN c_custkey % 5 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS v
    FROM customer
    """,
    description="streaming CDC upsert: micro-batches append versioned "
    "cells, as-of read materializes the latest-state view",
)
def zg21_stream_upsert_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.catalog import TableSpec
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore
    from spark_sql_hbase_spark.streaming.pipelines import (
        write_stream_to_keyed_table,
    )

    c = table(spark, sf_dir, "customer")
    base = c.select(
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("row_key"),
        F.col("c_acctbal").alias("c:acctbal"),
        F.lit(1).cast("long").alias("c:v"),
    )
    updates = c.filter(F.col("c_custkey") % 5 == 0).select(
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("row_key"),
        (F.col("c_acctbal") * 2.0).alias("c:acctbal"),
        F.lit(2).cast("long").alias("c:v"),
    )
    # change feed: one file per batch, maxFilesPerTrigger=1 -> the two
    # change sets arrive as separate micro-batches in order (file mtime)
    src = os.path.join(tempfile.mkdtemp(prefix="z85_feed_"), "in")
    base.coalesce(1).write.mode("overwrite").parquet(src)
    updates.coalesce(1).write.mode("append").parquet(src)
    # no ordering dance needed: the view is batch-order-INDEPENDENT (the
    # highest stamped version wins however the micro-batches interleave)
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    wh = tempfile.mkdtemp(prefix="z85_wh_")
    store = KeyedTableStore(spark, wh)
    store.create_table(
        TableSpec(
            namespace="z85",
            name="state",
            key_type="string",
            families={"c": {"acctbal": "double", "v": "long"}},
        )
    )
    q = write_stream_to_keyed_table(
        stream, store, "z85.state", tempfile.mkdtemp(prefix="z85_ckpt_")
    )
    q.awaitTermination()
    return store.read_versions_asof("z85.state", "c:v", 2).select(
        "row_key",
        F.col("`c:acctbal`").alias("acctbal"),
        F.col("`c:v`").alias("v"),
    )


# ---------------------------------------------------------------------------
# z88 — per-key quota admission (round-5 addition; streaming/pipelines.py
# ::quota_admission_stream): the ingest-guard primitive — a GroupState
# running total per key admits events until the lifetime quota is
# exhausted.  One batch → per-user admitted/rejected under a quota of
# 10; count-based admission makes the output row-order-independent, so
# the batch twin is plain SQL.  (transformWithStateInPandas is the
# designated successor API but needs google.protobuf, absent here —
# see the operator docstring.)
# ---------------------------------------------------------------------------
_Z88_QUOTA = 10


@register(
    "st13_stream_quota_admission",
    oracle=f"""
    SELECT user_id, LEAST(n, {_Z88_QUOTA}) AS admitted,
           GREATEST(n - {_Z88_QUOTA}, 0) AS rejected
    FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1)
    """,
    description="stateful quota admission: GroupState running total per "
    "key, admitted/rejected per batch",
)
def st13_stream_quota_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.streaming.pipelines import quota_admission_stream

    ev = table(spark, sf_dir, "events").select("user_id")
    stream, nbytes = _one_batch_stream_sized(spark, ev)
    out = _run_available_now(
        quota_admission_stream(stream, "user_id", _Z88_QUOTA),
        output_mode="update",
        state_partitions=_scaled_state_partitions(spark, nbytes),
    )
    return out.select(F.col("key").alias("user_id"), "admitted", "rejected")


# ---------------------------------------------------------------------------
# z93 — streaming per-source vocabulary cardinality (round-5 addition):
# HLL++ sketches as STREAMING state — approx_count_distinct's partial
# sketch is mergeable, so a streaming aggregation holds exactly one
# bounded sketch per source forever (the z72 counter-grid argument, now
# for distinct counting; no watermark, complete mode).  q16-convention
# self-validating gate: output carries the batch-exact distinct count +
# an estimate-within-5% boolean; the engine-specific estimate is never
# hashed.
# ---------------------------------------------------------------------------
@register(
    "st14_stream_vocab_cardinality",
    oracle=None,  # assembled below (reuses llm's tokenizer SQL)
    description="streaming HLL distinct per source: one bounded sketch "
    "of state per key, complete-mode estimate vs batch-exact bound",
)
def st14_stream_vocab_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.functions.texthash import tokens as _tokens

    docs = table(spark, sf_dir, "documents").select("source", "text")
    stream, nbytes = _one_batch_stream_sized(spark, docs)
    agg = (
        stream.select("source", F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("source")
        .agg(F.approx_count_distinct("term", rsd=0.02).alias("est"))
    )
    est = _run_available_now(
        agg,
        output_mode="complete",
        state_partitions=_scaled_state_partitions(spark, nbytes),
    )
    exact = (
        docs.select(
            "source", F.explode(F.array_distinct(_tokens(F.col("text")))).alias("term")
        )
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
    )
    return est.join(exact, "source").select(
        "source",
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= F.lit(0.05)
        ).alias("est_ok"),
    )


def _z93_oracle() -> str:
    from spark_sql_hbase_spark.queries.llm import _TOK

    return f"""
    WITH __t AS (
        SELECT DISTINCT source, unnest({_TOK}) AS term FROM documents
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_distinct,
           TRUE AS est_ok
    FROM __t GROUP BY source
    """


_REG["st14_stream_vocab_cardinality"].oracle = _z93_oracle()


# ---------------------------------------------------------------------------
# zg22 (was st07, was za01) — streaming covered-index dual-write (round-5 addition;
# streaming/pipelines.py::write_stream_with_index_maintenance): the
# Phoenix global-index maintenance strategy — each micro-batch appends
# to the main keyed table AND its covered index in one foreachBatch, so
# a value-predicate query served index-only stays fresh under streaming
# ingest.  Query: nation-5 customers straight from the index (z81's
# read shape); oracle: the plain value predicate.
# ---------------------------------------------------------------------------
@register(
    "zg22_stream_index_dualwrite",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS custkey,
           c_name AS name,
           c_acctbal AS acctbal
    FROM customer
    WHERE c_nationkey = 5
    """,
    description="streaming covered-index dual-write: value-predicate "
    "query served index-only stays fresh under ingest",
)
def zg22_stream_index_dualwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.catalog import TableSpec
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore
    from spark_sql_hbase_spark.streaming.pipelines import (
        write_stream_with_index_maintenance,
    )

    store = KeyedTableStore(spark, tempfile.mkdtemp(prefix="za01_wh_"))
    store.create_table(
        TableSpec(
            namespace="za01", name="cust", key_type="string",
            families={
                "c": {"name": "string", "nationkey": "long", "acctbal": "double"}
            },
        )
    )
    store.create_table(
        TableSpec(
            namespace="za01", name="cust_by_nation", key_type="string",
            families={
                "i": {"src_key": "string"},
                "c": {"nationkey": "long", "name": "string", "acctbal": "double"},
            },
        )
    )
    c = table(spark, sf_dir, "customer").select(
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("row_key"),
        F.col("c_name").alias("c:name"),
        F.col("c_nationkey").alias("c:nationkey"),
        F.col("c_acctbal").alias("c:acctbal"),
    )
    # two-file feed -> two micro-batches, both dual-written
    src = os.path.join(tempfile.mkdtemp(prefix="za01_feed_"), "in")
    half = F.col("row_key") < F.lpad(F.lit("750"), 10, "0")
    c.filter(half).coalesce(1).write.mode("overwrite").parquet(src)
    c.filter(~half).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(c.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = write_stream_with_index_maintenance(
        stream,
        store,
        "za01.cust",
        "za01.cust_by_nation",
        index_col="c:nationkey",
        include=["c:name", "c:acctbal"],
        key_width=5,
        checkpoint_dir=tempfile.mkdtemp(prefix="za01_ckpt_"),
    )
    q.awaitTermination()
    idx = store.read("za01.cust_by_nation")
    return idx.filter(
        (F.col("row_key") >= "00005|") & (F.col("row_key") < "00005}")
    ).select(
        F.col("`i:src_key`").cast("long").alias("custkey"),
        F.col("`c:name`").alias("name"),
        F.col("`c:acctbal`").alias("acctbal"),
    )


# ---------------------------------------------------------------------------
# zc19 — streaming UPSERT sink (round-6 addition; streaming/pipelines.py
# ::write_stream_upsert_to_keyed_table): each micro-batch REPLACES
# same-key rows via the store's MERGE primitive, so the table IS the
# latest-state view — no version column, no as-of join on read (the
# read-optimized alternative to the zg21 append+as-of CDC path).
# Batches apply in file-source order (base, then updates); upsert
# idempotence + the checkpoint batch-id marker make replays no-ops.
# Oracle: the same CASE construction as zg21, without the version.
# ---------------------------------------------------------------------------
@register(
    "zg17_stream_upsert_sink",
    oracle="""
    SELECT lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS row_key,
           CASE WHEN c_custkey % 5 = 0 THEN c_acctbal * 2.0
                ELSE c_acctbal END AS acctbal
    FROM customer
    """,
    description="streaming upsert sink: per-batch MERGE into the keyed "
    "store, table is the latest-state view",
)
def zg17_stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import time

    from spark_sql_hbase_spark.catalog import TableSpec
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore
    from spark_sql_hbase_spark.streaming.pipelines import (
        write_stream_upsert_to_keyed_table,
    )

    c = table(spark, sf_dir, "customer")
    base = c.select(
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("row_key"),
        F.col("c_acctbal").alias("c:acctbal"),
    )
    updates = c.filter(F.col("c_custkey") % 5 == 0).select(
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("row_key"),
        (F.col("c_acctbal") * 2.0).alias("c:acctbal"),
    )
    src = os.path.join(tempfile.mkdtemp(prefix="zc19_feed_"), "in")
    base.coalesce(1).write.mode("overwrite").parquet(src)
    first = {f for f in os.listdir(src) if f.endswith(".parquet")}
    updates.coalesce(1).write.mode("append").parquet(src)
    # the file source orders batches by (timestamp, path) and upsert is
    # order-DEPENDENT (last write wins): stamp the two batches' mtimes
    # EXPLICITLY rather than sleeping between writes (same-millisecond
    # mtimes fall back to random temp-name path order — a flake)
    now = time.time()
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            t = now - 60 if f in first else now
            os.utime(os.path.join(src, f), (t, t))
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    wh = tempfile.mkdtemp(prefix="zc19_wh_")
    store = KeyedTableStore(spark, wh)
    store.create_table(
        TableSpec(
            namespace="zc19",
            name="state",
            key_type="string",
            families={"c": {"acctbal": "double"}},
        )
    )
    q = write_stream_upsert_to_keyed_table(
        stream, store, "zc19.state", tempfile.mkdtemp(prefix="zc19_ckpt_")
    )
    q.awaitTermination()
    return store.read("zc19.state").select(
        "row_key", F.col("`c:acctbal`").alias("acctbal")
    )


# ---------------------------------------------------------------------------
# zg92 — streaming CDC replication (the HBase continuous-replication
# form of zg90): changefeed deltas ship through a FILE STREAM and replay
# onto the replica via stream_apply_changes (foreachBatch apply_changes
# with the keyed sink's batch-id replay marker).  Two sync cycles — one
# MERGE delta (updates + brand-new keys), one DELETE delta — each read
# against a fresh durable snapshot base and applied under the SAME
# checkpoint (ordering = production order, the WAL sequence-id
# analogue).  The replica's final content is a pure function of `part`
# (the oracle); exact multiset convergence is asserted in-gate.
# ---------------------------------------------------------------------------
@register(
    "zg92_stream_cdc_apply",
    oracle="""
    WITH final_state AS (
        SELECT lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS row_key,
               CASE WHEN p_partkey % 45 = 0 THEN p_retailprice + 1
                    ELSE p_retailprice END AS price,
               p_partkey AS pk
        FROM part
        UNION ALL
        SELECT lpad(CAST(p_partkey + 1000000 AS VARCHAR), 10, '0') AS row_key,
               p_retailprice AS price,
               p_partkey + 1000000 AS pk
        FROM part WHERE p_partkey % 89 = 0
    )
    SELECT row_key, price FROM final_state WHERE pk % 37 <> 0
    """,
    description="streaming CDC replication: changefeed deltas shipped "
    "through a file stream, replayed per-batch onto the replica, "
    "convergence asserted",
)
def zg92_stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.catalog import TableSpec
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore
    from spark_sql_hbase_spark.streaming.pipelines import (
        stream_apply_changes,
    )

    src = KeyedTableStore(spark, tempfile.mkdtemp(prefix="zg92_src_"))
    dst = KeyedTableStore(spark, tempfile.mkdtemp(prefix="zg92_dst_"))
    p = table(spark, sf_dir, "part")
    key = F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("row_key")
    base = p.select(key, F.col("p_retailprice").alias("p:price"))
    for st in (src, dst):
        st.ctas(
            TableSpec(
                namespace="gate", name="part_scdc", key_type="string",
                families={"p": {"price": "double"}},
            ),
            base,
            mode="overwrite",
        )
    feed_dir = tempfile.mkdtemp(prefix="zg92_feed_")
    ckpt = tempfile.mkdtemp(prefix="zg92_ckpt_")

    def ship(snapshot: str) -> None:
        src.read_changes("gate.part_scdc", versus=snapshot).coalesce(
            1
        ).write.mode("append").parquet(feed_dir)
        q = stream_apply_changes(
            spark.readStream.schema(
                "change string, row_key string, `p:price` double"
            ).parquet(feed_dir),
            dst,
            "gate.part_scdc",
            ckpt,
        )
        q.awaitTermination()

    # cycle 1: one MERGE delta (updates + brand-new keys)
    src.snapshot("gate.part_scdc", "zg92_s1")
    src.upsert(
        "gate.part_scdc",
        p.filter("p_partkey % 45 = 0").select(
            key, (F.col("p_retailprice") + 1).alias("p:price")
        ).unionByName(
            p.filter("p_partkey % 89 = 0").select(
                F.lpad((F.col("p_partkey") + 1000000).cast("string"), 10, "0")
                .alias("row_key"),
                F.col("p_retailprice").alias("p:price"),
            )
        ),
    )
    ship("zg92_s1")
    # cycle 2: a DELETE delta against a fresh durable base
    src.snapshot("gate.part_scdc", "zg92_s2")
    src.delete_where(
        "gate.part_scdc", "CAST(row_key AS BIGINT) % 37 = 0"
    )
    ship("zg92_s2")
    src_df = src.read("gate.part_scdc")
    dst_df = dst.read("gate.part_scdc")
    assert_multiset_equal(dst_df, src_df)
    return dst_df.select("row_key", F.col("`p:price`").alias("price"))


# ---------------------------------------------------------------------------
# zg29 — streaming VERSIONED cell replication (zg92 composed with zh07's
# cell semantics; z-tier this round for sf001-lane evidence ahead of a
# window promotion): cell-granularity changefeed deltas — new-version
# appends, then VERSIONS=2 retention GC shipped as exact-cell deletes —
# stream through stream_apply_changes(cells=True) onto a versioned
# replica.  Final cell state is a pure function of `part`; exact
# multiset convergence asserted in-gate.
# ---------------------------------------------------------------------------
@register(
    "st16_stream_cdc_cells",
    oracle="""
    SELECT lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS row_key,
           p_retailprice AS price, CAST(1 AS BIGINT) AS v
    FROM part WHERE p_partkey % 60 <> 0
    UNION ALL
    SELECT lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS row_key,
           p_retailprice * 2 AS price, CAST(2 AS BIGINT) AS v
    FROM part WHERE p_partkey % 30 = 0
    UNION ALL
    SELECT lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS row_key,
           p_retailprice * 3 AS price, CAST(3 AS BIGINT) AS v
    FROM part WHERE p_partkey % 60 = 0
    """,
    description="streaming versioned CELL replication: cell feed deltas "
    "(appends + retention-GC deletes) streamed onto a versioned replica, "
    "convergence asserted",
)
def st16_stream_cdc_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.catalog import TableSpec
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore
    from spark_sql_hbase_spark.streaming.pipelines import (
        stream_apply_changes,
    )

    src = KeyedTableStore(spark, tempfile.mkdtemp(prefix="zg29_src_"))
    dst = KeyedTableStore(spark, tempfile.mkdtemp(prefix="zg29_dst_"))
    p = table(spark, sf_dir, "part")
    key = F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("row_key")
    base = p.select(
        key,
        F.col("p_retailprice").alias("p:price"),
        F.lit(1).cast("long").alias("p:v"),
    )
    for st in (src, dst):
        st.ctas(
            TableSpec(
                namespace="gate", name="part_sc", key_type="string",
                families={"p": {"price": "double", "v": "long"}},
                properties={"VERSIONS": "2"},
            ),
            base,
            mode="overwrite",
        )
    feed_dir = tempfile.mkdtemp(prefix="zg29_feed_")
    ckpt = tempfile.mkdtemp(prefix="zg29_ckpt_")

    def ship(snapshot: str) -> None:
        src.read_changes(
            "gate.part_sc", versus=snapshot, cells=True
        ).coalesce(1).write.mode("append").parquet(feed_dir)
        q = stream_apply_changes(
            spark.readStream.schema(
                "change string, row_key string, `p:price` double, `p:v` long"
            ).parquet(feed_dir),
            dst,
            "gate.part_sc",
            ckpt,
            cells=True,
        )
        q.awaitTermination()

    # cycle 1: new version CELLS (appends — nothing replaced)
    src.snapshot("gate.part_sc", "zg29_s1")
    src.insert(
        "gate.part_sc",
        p.filter("p_partkey % 30 = 0").select(
            key, (F.col("p_retailprice") * 2).alias("p:price"),
            F.lit(2).cast("long").alias("p:v"),
        ),
    )
    src.insert(
        "gate.part_sc",
        p.filter("p_partkey % 60 = 0").select(
            key, (F.col("p_retailprice") * 3).alias("p:price"),
            F.lit(3).cast("long").alias("p:v"),
        ),
    )
    ship("zg29_s1")
    # cycle 2: retention GC ships as exact-cell deletes
    src.snapshot("gate.part_sc", "zg29_s2")
    src.compact_versions("gate.part_sc", "p:v", keep_versions=2)
    ship("zg29_s2")
    src_df = src.read("gate.part_sc")
    dst_df = dst.read("gate.part_sc")
    assert_multiset_equal(dst_df, src_df)
    return dst_df.select(
        "row_key",
        F.col("`p:price`").alias("price"),
        F.col("`p:v`").alias("v"),
    )


# ---------------------------------------------------------------------------
# st17 — streaming SQ8 index maintenance (round-11 second batch;
# streaming/pipelines.py::stream_sq8_ingest): the corpus codes table is
# built batch-side against corpus-trained bounds, then arriving
# embeddings (vec_id % 7 = 0) stream through foreachBatch encoding
# against the SAME frozen bounds and append.  Oracle: long-format SQ8
# codes of EVERY vector under corpus-only bounds (out-of-range arrivals
# clamp — the frozen-quantizer convention;
# operators/similarity.py::sq8_codes_long_sql).
# ---------------------------------------------------------------------------
@register(
    "st17_stream_sq8_ingest",
    oracle=None,  # bound below (generator import)
    description="streaming SQ8 quantization ingest: frozen corpus "
    "bounds, foreachBatch encode+append to the persisted codes index, "
    "zero streaming state",
)
def st17_stream_sq8_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from spark_sql_hbase_spark.operators.similarity import (
        sq8_bounds,
        sq8_codes_long,
    )
    from spark_sql_hbase_spark.streaming.pipelines import (
        bootstrap_base_snapshot,
        fold_streamed_tail,
        serving_scan,
        stream_sq8_ingest,
    )

    emb = table(spark, sf_dir, "embeddings")
    is_new = (F.col("vec_id") % 7) == 0
    new, corpus = emb.filter(is_new), emb.filter(~is_new)
    root = tempfile.mkdtemp(prefix="st17_sq8_index_")
    base_dir, tail_dir = os.path.join(root, "base"), os.path.join(root, "tail")
    bounds = sq8_bounds(corpus, "embedding", 64)
    # batch side: the bulk-built index over the corpus is generation 0
    bootstrap_base_snapshot(
        sq8_codes_long(corpus, bounds, "vec_id", "embedding"), base_dir
    )
    # streaming side: arrivals encode against the frozen bounds into
    # the staged-commit tail (r14: serving reads snapshot UNION tail)
    stream = _one_batch_stream(spark, new)
    ckpt = tempfile.mkdtemp(prefix="stream_gate_ckpt_st17_")
    q = stream_sq8_ingest(
        stream, bounds, "vec_id", "embedding", ckpt,
        "__st17_sq8_stream", sink_dir=tail_dir,
    )
    q.awaitTermination()
    # compaction (the memstore-flush analogy): fold the streamed tail
    # into generation 1 — invisible to readers, so the oracle holds.
    # The tail view the sink published is superseded by serving_scan
    # once compaction drains the tail; drop it rather than leave a
    # view that no longer resolves.
    assert fold_streamed_tail(spark, base_dir, tail_dir) is True
    spark.catalog.dropTempView("__st17_sq8_stream")
    return serving_scan(spark, base_dir, tail_dir)


def _bind_st17_oracle() -> None:
    from spark_sql_hbase_spark.operators.similarity import sq8_codes_long_sql
    from spark_sql_hbase_spark.queries import REGISTRY

    REGISTRY["st17_stream_sq8_ingest"].oracle = sq8_codes_long_sql(
        "embeddings", "vec_id", "embedding", "vec_id % 7 <> 0", dim=64
    )


_bind_st17_oracle()


# ---------------------------------------------------------------------------
# zg45 — streaming quality-drift monitor (streaming/pipelines.py::
# stream_psi_monitor): arriving docs (doc_id % 13 = 0) bucket against
# FROZEN corpus decile boundaries (corpus = the rest) and append their
# per-bucket PSI terms vs the frozen reference shares — the live twin
# of zg42 with the drift DECOMPOSITION per quality band.  Oracle: the
# same smoothed terms computed batch-side in SQL.
# ---------------------------------------------------------------------------
@register(
    "st18_stream_psi_monitor",
    oracle=None,  # bound below (needs llm._QUALITY_ORACLE import)
    description="streaming PSI drift monitor: frozen decile boundaries "
    "+ reference shares, per-batch n_buckets-row fold, zero streaming "
    "state",
)
def st18_stream_psi_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.text import quality_bucket_model
    from spark_sql_hbase_spark.streaming.pipelines import stream_psi_monitor

    docs = table(spark, sf_dir, "documents")
    is_delta = (F.col("doc_id") % 13) == 0
    delta, corpus = docs.filter(is_delta), docs.filter(~is_delta)
    # staged-commit sink: a temp view over the fresh checkpoint's
    # committed batches — createOrReplaceTempView supersedes prior runs
    sink = "__zg45_psi_terms"
    bounds, shares = quality_bucket_model(corpus, "doc_id", "text")
    # freeze the model (bounded: one row + n_buckets rows) so the
    # per-batch joins don't recompute the corpus aggregates
    bounds = bounds.cache()
    shares = shares.cache()
    stream = _one_batch_stream(spark, delta)
    ckpt = tempfile.mkdtemp(prefix="stream_gate_ckpt_zg45_")
    q = stream_psi_monitor(
        stream, bounds, shares, "doc_id", "text", ckpt, sink
    )
    q.awaitTermination()
    return spark.table(sink)


def _bind_zg45_oracle() -> None:
    from spark_sql_hbase_spark.queries import REGISTRY
    from spark_sql_hbase_spark.queries.llm import (
        _PSI_BOUNDS,
        _PSI_BUCKET,
        _QUALITY_ORACLE,
    )

    REGISTRY["st18_stream_psi_monitor"].oracle = f"""
    WITH __qq AS (
        SELECT q.doc_id, q.quality, q.doc_id % 13 = 0 AS is_delta
        FROM ({_QUALITY_ORACLE}) q
    ), __b AS (
        SELECT {_PSI_BOUNDS}
        FROM __qq WHERE NOT is_delta
    ), __bk AS (
        SELECT is_delta, CAST(1 + {_PSI_BUCKET} AS INTEGER) AS bucket
        FROM __qq q, __b b
    ), __grid AS (
        SELECT CAST(t.i AS INTEGER) AS bucket FROM range(1, 11) t(i)
    ), __d AS (
        SELECT g.bucket, COALESCE(cd.c, 0) AS c
        FROM __grid g LEFT JOIN (
            SELECT bucket, COUNT(*) AS c FROM __bk WHERE is_delta GROUP BY 1
        ) cd USING (bucket)
    ), __r AS (
        SELECT g.bucket, COALESCE(cr.c, 0) AS c
        FROM __grid g LEFT JOIN (
            SELECT bucket, COUNT(*) AS c FROM __bk WHERE NOT is_delta
            GROUP BY 1
        ) cr USING (bucket)
    ), __nd AS (SELECT SUM(c) AS n FROM __d),
    __nr AS (SELECT SUM(c) AS n FROM __r)
    SELECT d.bucket, CAST(d.c AS BIGINT) AS c,
           ROUND(((d.c + 0.5) / (nd.n + 5.0) - (r.c + 0.5) / (nr.n + 5.0))
                 * ln(((d.c + 0.5) / (nd.n + 5.0))
                      / ((r.c + 0.5) / (nr.n + 5.0))), 4) AS psi_term
    FROM __d d JOIN __r r USING (bucket), __nd nd, __nr nr
    """


_bind_zg45_oracle()


# ---------------------------------------------------------------------------
# st19 (natural promotion: st19) — streaming decontamination: arrivals screened against the FROZEN
# eval n-gram index BEFORE they reach the training corpus — the live
# twin of zb13 through the shared decontaminate_against_index body
# (streaming/pipelines.py::stream_decontaminate).  Zero streaming state:
# contamination is a per-document fact, so per-batch output equals the
# batch twin over all arrivals.
# ---------------------------------------------------------------------------
def _st19_oracle() -> str:
    from spark_sql_hbase_spark.queries.llm import (
        _DECON_EVAL,
        _DECON_MIN,
        _DECON_N,
    )

    arrivals = f"doc_id % 7 = 0 AND NOT ({_DECON_EVAL})"
    return f"""
    WITH __sh AS (
        SELECT doc_id, {shingles_sql(tokens_sql('text'), _DECON_N)} AS s
        FROM documents
    ), __inv AS (
        SELECT doc_id, unnest(s) AS g FROM __sh
    ), __pairs AS (
        SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
               COUNT(*) AS n_shared
        FROM (SELECT * FROM __inv WHERE {arrivals}) tr
        JOIN (SELECT * FROM __inv WHERE {_DECON_EVAL}) ev USING (g)
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_DECON_MIN}
    )
    SELECT train_id,
           COUNT(*) AS n_eval_docs,
           CAST(SUM(n_shared) AS BIGINT) AS total_shared,
           CAST(MAX(n_shared) AS BIGINT) AS max_shared
    FROM __pairs
    GROUP BY train_id
    """


@register(
    "st19_stream_decontam",
    oracle=None,  # bound below (needs llm constants)
    description="streaming decontamination: arrivals vs frozen eval "
    "n-gram index (shared batch/stream body, zero streaming state)",
)
def st19_stream_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.decontam import eval_shingle_index
    from spark_sql_hbase_spark.queries.llm import _DECON_MIN, _DECON_N
    from spark_sql_hbase_spark.streaming.pipelines import stream_decontaminate

    docs = table(spark, sf_dir, "documents")
    is_eval = (F.col("doc_id") % 29) == 0
    arrivals = docs.filter(((F.col("doc_id") % 7) == 0) & ~is_eval)
    # staged-commit sink: a temp view over the fresh checkpoint's
    # committed batches — createOrReplaceTempView supersedes prior runs
    sink = "__st19_contaminated"
    # freeze the eval index (bounded: benchmarks are small) — the
    # st17/zg45 frozen-model convention
    ev = eval_shingle_index(
        docs.filter(is_eval), "doc_id", "text", _DECON_N
    ).cache()
    stream = _one_batch_stream(spark, arrivals)
    ckpt = tempfile.mkdtemp(prefix="stream_gate_ckpt_st19_")
    q = stream_decontaminate(
        stream, ev, "doc_id", "text", ckpt, sink,
        n=_DECON_N, min_overlap=_DECON_MIN,
    )
    q.awaitTermination()
    return spark.table(sink)


def _bind_st19_oracle() -> None:
    from spark_sql_hbase_spark.queries import REGISTRY

    REGISTRY["st19_stream_decontam"].oracle = _st19_oracle()


_bind_st19_oracle()


# ---------------------------------------------------------------------------
# st20 (natural promotion: st20) — streaming vocabulary-KL monitor: the
# CONTENT-drift live twin next to the quality-PSI pair (t31/st18) —
# arrivals bucket against the FROZEN corpus vocabulary and append
# per-bucket KL terms vs the frozen reference shares
# (streaming/pipelines.py::stream_vocab_kl; model from
# operators/text.py::vocab_model — one bucketing rule with the batch
# operator).  Zero streaming state; ≤ V+1 rows per batch.
# ---------------------------------------------------------------------------
@register(
    "st20_stream_vocab_kl",
    oracle=None,  # bound below (generator import)
    description="streaming vocabulary-KL drift monitor: frozen top-V "
    "vocabulary + dense reference shares, per-batch KL-term fold, zero "
    "streaming state",
)
def st20_stream_vocab_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.text import vocab_model
    from spark_sql_hbase_spark.streaming.pipelines import stream_vocab_kl

    docs = table(spark, sf_dir, "documents")
    is_delta = (F.col("doc_id") % 11) == 0
    delta, corpus = docs.filter(is_delta), docs.filter(~is_delta)
    # staged-commit sink: a temp view over the fresh checkpoint's
    # committed batches — createOrReplaceTempView supersedes prior runs
    sink = "__st20_kl_terms"
    vocab, q = vocab_model(corpus, "text", top_v=100)
    # freeze the model (bounded: V + V+1 rows) — the zg45 convention
    vocab = vocab.cache()
    q = q.cache()
    stream = _one_batch_stream(spark, delta)
    ckpt = tempfile.mkdtemp(prefix="stream_gate_ckpt_st20_")
    query = stream_vocab_kl(stream, vocab, q, "text", ckpt, sink, top_v=100)
    query.awaitTermination()
    return spark.table(sink)


def _bind_st20_oracle() -> None:
    from spark_sql_hbase_spark.operators.text import vocab_kl_terms_sql
    from spark_sql_hbase_spark.queries import REGISTRY

    REGISTRY["st20_stream_vocab_kl"].oracle = vocab_kl_terms_sql(
        "documents",
        corpus_pred="doc_id % 11 <> 0",
        arrivals_pred="doc_id % 11 = 0",
        text_expr="text",
        top_v=100,
    )


_bind_st20_oracle()


# ---------------------------------------------------------------------------
# st21 (natural promotion: st21) — streaming multimodal metadata ingest:
# arriving binary payloads run the Arrow-batched extraction per
# micro-batch (streaming/pipelines.py::stream_media_metadata); zero
# streaming state, per-batch output equals the batch twin (zb06).
# ---------------------------------------------------------------------------
@register(
    "st21_stream_media_metadata",
    oracle=None,  # bound below (generator import)
    description="streaming multimodal ingest: per-batch Arrow metadata "
    "extraction over binary payloads, zero streaming state",
)
def st21_stream_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.streaming.pipelines import stream_media_metadata

    docs = table(spark, sf_dir, "documents")
    arrivals = docs.filter((F.col("doc_id") % 9) == 0).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    # the sink is a temp view over the committed-batch directory inside
    # the fresh checkpoint (idempotent_batch_commit, r13 VERDICT item 4)
    # — createOrReplaceTempView supersedes any earlier run's view
    sink = "__st21_media_meta"
    stream = _one_batch_stream(spark, arrivals)
    ckpt = tempfile.mkdtemp(prefix="stream_gate_ckpt_st21_")
    q = stream_media_metadata(stream, "doc_id", "payload", ckpt, sink)
    q.awaitTermination()
    return spark.table(sink)


def _bind_st21_oracle() -> None:
    from spark_sql_hbase_spark.operators.multimodal import (
        media_metadata_oracle_sql,
    )
    from spark_sql_hbase_spark.queries import REGISTRY

    REGISTRY["st21_stream_media_metadata"].oracle = media_metadata_oracle_sql(
        "(SELECT * FROM documents WHERE doc_id % 9 = 0)"
    )


_bind_st21_oracle()


# ---------------------------------------------------------------------------
# st22 — streaming ANN serving (streaming/pipelines.py::
# stream_ann_serving): arriving QUERY vectors (vec_id % 9 = 0, one
# micro-batch) are answered against the frozen deployed index — the
# cell-assigned corpus + the zb11 literal-centroid model — via the
# exact batch operator per batch (foreachBatch; the top-k window cannot
# run on an unbounded stream), zero streaming state.  Oracle: the batch
# multiprobe SQL restricted to the arrival set — serving must be
# batch-identical.
# ---------------------------------------------------------------------------
_ZH03_K = 4  # centroids: embeddings vec_id < 4 (the zb11 quantizer)


@register(
    "st22_stream_ann_serving",
    oracle=f"""
    WITH c AS (
        SELECT vec_id AS cell, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id < {_ZH03_K}
    ), v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), a AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, c.cell, row_number() OVER (
                PARTITION BY v.vec_id
                ORDER BY ROUND(list_sum(
                    [ (ev[i] - cv[i]) ^ 2 for i in range(1, 65) ]), 6), c.cell
            ) AS rn
            FROM v, c
        ) WHERE rn = 1
    ), q AS (
        SELECT vec_id AS query_id, ev AS qv FROM v WHERE vec_id % 9 = 0
    ), p AS (
        SELECT query_id, cell FROM (
            SELECT q.query_id, c.cell, row_number() OVER (
                PARTITION BY q.query_id
                ORDER BY ROUND(list_sum(
                    [ (qv[i] - cv[i]) ^ 2 for i in range(1, 65) ]), 6), c.cell
            ) AS rn
            FROM q, c
        ) WHERE rn <= 2
    ), scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               list_cosine_similarity(q.qv, v.ev) AS cos_raw
        FROM p
        JOIN a USING (cell)
        JOIN v ON v.vec_id = a.vec_id
        JOIN q ON q.query_id = p.query_id
        WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, ROUND(cos_raw, 4) AS cos,
           CAST(rn AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
        ) AS rn FROM scored
    ) WHERE rn <= 5
    """,
    description="streaming ANN serving: arriving query vectors answered "
    "per micro-batch against the frozen cell-assigned corpus + broadcast "
    "centroid model (foreachBatch, zero streaming state, batch-identical "
    "results)",
)
def st22_stream_ann_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.similarity import (
        _to_double,
        assign_cells,
    )
    from spark_sql_hbase_spark.streaming.pipelines import stream_ann_serving

    emb = table(spark, sf_dir, "embeddings")
    cents = [
        (r["cluster_id"], list(r["cv"]))
        for r in emb.filter(F.col("vec_id") < _ZH03_K)
        .select(
            F.col("vec_id").alias("cluster_id"),
            _to_double(F.col("embedding")).alias("cv"),
        )
        .collect()
    ]
    corpus = assign_cells(emb, cents, "vec_id", "embedding", "cell")
    queries = emb.filter((F.col("vec_id") % 9) == 0)
    # committed-batch temp-view sink (idempotent_batch_commit; the
    # checkpoint-colocated default keeps batch_id and sink lineage tied)
    sink = "__zh03_ann_results"
    stream = _one_batch_stream(spark, queries)
    ckpt = tempfile.mkdtemp(prefix="stream_gate_ckpt_zh03_")
    q = stream_ann_serving(
        stream, corpus, cents, "vec_id", "embedding", ckpt, sink,
        k=5, nprobe=2,
    )
    q.awaitTermination()
    return spark.table(sink)
