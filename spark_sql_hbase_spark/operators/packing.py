"""Sequence packing for LLM training pipelines: assign documents to
fixed-token-budget training sequences ("concat-then-chunk" packing).

Real pretraining dataloaders concatenate a corpus stream and slice it
into context-length windows; the *planning* half of that operation —
which documents land in which training sequence, at which offset — is a
pure relational computation and belongs in the engine:

    offset  = cumulative token count of all prior docs (per stream)
    seq_id  = offset div budget      (documents may straddle a boundary,
                                      exactly like the real concat+chunk)

One window (cumsum over the stream order) + one projection — a single
shuffle per stream, no stateful driver loop, no UDF. At 100 TB the
stream key (``source``) bounds each window partition; for a single
global stream, pre-bucket by hash(doc) into N parallel streams first
(standard practice — training order is shuffled downstream anyway).

The byte-level concat/slice itself is IO, not planning: downstream it is
a ``mapInPandas`` over ``(seq_id, doc_id, offset)`` sorted batches (same
Arrow pattern as :mod:`spark_sql_hbase_spark.operators.multimodal`).

Beyond-reference operator (SURVEY §7.1 item 5 family); no reference
analogue — cited against the public concat-and-chunk practice (GPT-style
pretraining data pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def pack_plan(
    docs: DataFrame,
    stream_col: str,
    order_col: str,
    tokens_col: Column | str,
    budget: int,
) -> DataFrame:
    """Per-stream packing plan: (stream, order, n_tokens, offset, seq_id,
    seq_offset).

    ``offset`` is the document's starting position in the concatenated
    stream, ``seq_id`` the training sequence it starts in, ``seq_offset``
    its position within that sequence.  Deterministic given a total
    order per stream (``order_col`` must be unique per stream).
    """
    tok = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    w = W.partitionBy(stream_col).orderBy(order_col)
    offset = (F.sum(tok).over(w) - tok).cast("long")
    base = docs.select(
        F.col(stream_col),
        F.col(order_col),
        tok.cast("long").alias("n_tokens"),
        offset.alias("offset"),
    )
    # integer `div`, not double `/`: float division loses exactness once a
    # stream's cumulative token count passes 2^53 — real at corpus scale
    return base.select(
        "*",
        F.expr(f"offset div {int(budget)}").alias("seq_id"),
        F.expr(f"offset % {int(budget)}").alias("seq_offset"),
    )


def pack_summary(
    docs: DataFrame,
    stream_col: str,
    order_col: str,
    tokens_col: Column | str,
    budget: int,
) -> DataFrame:
    """Per-sequence summary: (stream, seq_id, n_docs, first/last doc,
    seq_tokens) — the manifest a dataloader shards by."""
    plan = pack_plan(docs, stream_col, order_col, tokens_col, budget)
    return plan.groupBy(stream_col, "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(order_col).alias("first_doc"),
        F.max(order_col).alias("last_doc"),
        F.sum("n_tokens").cast("long").alias("docs_tokens"),
    )


def _rank_partitioned_meta(
    docs: DataFrame, id_col: str, text_col: str, n_parts: int
) -> DataFrame:
    """The UNCHECKPOINTED range-partitioned metadata relation behind
    :func:`shard_assignments` — exposed so the plan pin can verify the
    scale shape (2-column metadata-only range exchange, no document
    bytes) that :meth:`localCheckpoint` hides from the result's
    explain."""
    from spark_sql_hbase_spark.functions.texthash import tokens

    meta = docs.select(
        F.col(id_col).alias("id"), F.size(tokens(F.col(text_col))).alias("n_tokens")
    )
    # Range partitions preserve the global order across partition ids:
    # every row in pid i sorts before every row in pid j>i.
    return meta.repartitionByRange(
        n_parts, F.col("n_tokens").desc(), F.col("id")
    ).withColumn("pid", F.spark_partition_id())


def shard_assignments(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int,
    n_rank_partitions: int | None = None,
) -> DataFrame:
    """Per-document shard assignment ``(id, n_tokens, shard_id)`` via a
    DISTRIBUTED global rank — the doc→shard map a writer joins back on
    ``id`` to route the actual bytes.

    Assignment is longest-processing-time-style round robin: documents
    ranked by token count descending (ties by id), shard =
    ``(rank-1) mod n_shards``.  Deterministic and integer-only.

    Rank shape (scales to 100 TB): the corpus scan reduces to a
    METADATA relation (id, n_tokens) before anything global happens,
    and the rank is the standard two-pass zipWithIndex recipe —
    ``repartitionByRange`` on the sort key spreads the metadata over
    ``n_rank_partitions`` tasks, each task ranks locally, and the
    per-partition row counts (one bounded number per partition,
    collected driver-side like any other model parameter) become
    broadcast offsets.  No single-task global window anywhere: even a
    100 B-document corpus ranks ~1.6 TB of metadata across the cluster,
    ~1.6 GB per task at 1000 partitions.

    The range-partitioned relation is pinned with an EAGER
    ``localCheckpoint``: range-boundary sampling is seeded per
    execution, so the counts pass and the ranking pass MUST read the
    SAME shuffle output or the offsets are silently wrong.  Lineage
    truncation makes boundary re-sampling IMPOSSIBLE — any derived
    plan, held or re-derived in a fluent chain, reads the materialized
    blocks (2 columns + pid, ~20 B/row), and a lost block fails loudly
    instead of recomputing wrong (the repo's standard pinning
    discipline, e.g. ``apply_changes``).  The blocks are released by
    Spark's ContextCleaner when the checkpointed RDD is garbage-
    collected with its consumers — no re-entry unpersist, no GC-timing
    caveat for callers.
    """
    spark = docs.sparkSession
    n_parts = int(
        n_rank_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    part = _rank_partitioned_meta(docs, id_col, text_col, n_parts).localCheckpoint(
        eager=True
    )
    # Pass 1: per-partition row counts — at most n_rank_partitions rows,
    # a bounded model parameter; prefix-summed on the driver.
    counts = sorted(
        (r["pid"], r["cnt"])
        for r in part.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off_df = spark.createDataFrame(offsets or [(0, 0)], "pid int, off long")
    # Pass 2: local rank within each range partition + broadcast offset.
    lrn = F.row_number().over(
        W.partitionBy("pid").orderBy(F.col("n_tokens").desc(), F.col("id"))
    )
    ranked = part.select("id", "n_tokens", "pid", lrn.alias("lrn")).join(
        F.broadcast(off_df), "pid"
    )
    return ranked.select(
        "id",
        "n_tokens",
        ((F.col("off") + F.col("lrn") - 1) % n_shards).cast("int").alias("shard_id"),
    )


def shard_plan(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int,
    n_rank_partitions: int | None = None,
) -> DataFrame:
    """Balanced training-shard assignment: every document lands in one of
    ``n_shards`` output shards with near-equal TOKEN totals — the
    planning half of "write the curated corpus as N training files"
    (shard skew = stragglers in every downstream training epoch).

    Emits one row per shard: ``(shard_id, n_docs, tok_total)``.
    Per-shard token totals are bounded within ``max_doc_tokens`` of
    each other per round-robin cycle.  See :func:`shard_assignments`
    for the distributed-rank plan shape (the 100 TB story)."""
    assigned = shard_assignments(
        docs, id_col, text_col, n_shards, n_rank_partitions
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tok_total"),
    )


def shard_plan_sql(
    table: str, id_expr: str, tokens_expr: str, n_shards: int
) -> str:
    """DuckDB twin of :func:`shard_plan` (oracle generator)."""
    return f"""
    WITH __meta AS (
        SELECT {id_expr} AS id, len({tokens_expr}) AS n_tokens FROM {table}
    ), __a AS (
        SELECT id, n_tokens,
               CAST((row_number() OVER (ORDER BY n_tokens DESC, id) - 1)
                    % {n_shards} AS INTEGER) AS shard_id
        FROM __meta
    )
    SELECT shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tok_total
    FROM __a
    GROUP BY 1
    """


def epoch_shuffle_plan(
    docs: DataFrame,
    id_col: str,
    n_shards: int,
    epoch: int,
) -> DataFrame:
    """Deterministic per-epoch training order: every document gets a
    pseudo-random (but seed-reproducible) position in one of
    ``n_shards`` ordered shards — the "shuffled shards" dataloader
    layout (shard by hash, read shards round-robin, sort within shard
    by hash).  Changing ``epoch`` reshuffles everything; the same epoch
    always replays the same order — the reproducibility contract a
    training run needs for checkpoint resume.

    Emits ``(id, shard_id, pos)`` — the manifest a shard writer joins
    back on ``id`` to lay the bytes down in read order.

    Plan shape (scales to 100 TB): the order key is a row-local
    cross-engine hash (md5-derived, the repo's word_hash convention —
    never a engine-private hash, so the oracle can reproduce it);
    ``shard_id`` is a row-local mod; ``pos`` is a window partitioned BY
    SHARD — n_shards parallel sorts of ~N/n_shards metadata rows each,
    never a global single-task rank (the shard_plan r11 lesson applied
    from the start)."""
    from spark_sql_hbase_spark.functions.texthash import word_hash

    if n_shards <= 0:
        # % 0 is NULL under non-ANSI Spark (a "valid-looking" manifest
        # with one giant NULL shard) while the SQL twin errors — refuse
        # loudly instead of diverging
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    sid = F.col(id_col).cast("string")
    hkey = F.md5(F.concat(sid, F.lit(f":{int(epoch)}")))
    shard = (word_hash(F.concat(sid, F.lit(f":{int(epoch)}"))) % n_shards).cast(
        "int"
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        hkey.alias("__hkey"),
        shard.alias("shard_id"),
    )
    w = W.partitionBy("shard_id").orderBy(F.col("__hkey"), F.col("id"))
    return base.select(
        "id", "shard_id", F.row_number().over(w).alias("pos")
    )


def epoch_shuffle_sql(
    table: str, id_expr: str, n_shards: int, epoch: int
) -> str:
    """DuckDB twin of :func:`epoch_shuffle_plan` (oracle generator)."""
    from spark_sql_hbase_spark.functions.texthash import word_hash_sql

    key = f"CAST({id_expr} AS VARCHAR) || ':{int(epoch)}'"
    return f"""
    WITH __b AS (
        SELECT {id_expr} AS id,
               md5({key}) AS hkey,
               CAST({word_hash_sql(key)} % {n_shards} AS INTEGER) AS shard_id
        FROM {table}
    )
    SELECT id, shard_id,
           CAST(row_number() OVER (
               PARTITION BY shard_id ORDER BY hkey, id) AS INTEGER) AS pos
    FROM __b
    """
