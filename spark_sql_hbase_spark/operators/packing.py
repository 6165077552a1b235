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


def shard_plan(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int,
) -> DataFrame:
    """Balanced training-shard assignment: every document lands in one of
    ``n_shards`` output shards with near-equal TOKEN totals — the
    planning half of "write the curated corpus as N training files"
    (shard skew = stragglers in every downstream training epoch).

    Assignment is longest-processing-time-style round robin: documents
    ranked by token count descending (ties by id), shard =
    ``(rank-1) mod n_shards``.  Deterministic, integer-only, and
    single-pass — the classic greedy bin-balancer without its
    sequential state.  Per-shard token totals are then bounded within
    ``max_doc_tokens`` of each other per round-robin cycle.

    Emits one row per shard: ``(shard_id, n_docs, tok_total)``.

    Plan shape (scales to 100 TB): the corpus scan reduces to a
    METADATA relation (id, n_tokens) before anything global happens;
    the rank is one global sort of that metadata — bytes-per-row ~16,
    so even a 100 B-document corpus sorts ~1.6 TB of metadata, not the
    text.  The final aggregate is n_shards rows.  The doc→shard map
    (the intermediate before the summary aggregate) is what a writer
    would join back on ``id`` to route the actual bytes."""
    from spark_sql_hbase_spark.functions.texthash import tokens

    meta = docs.select(
        F.col(id_col).alias("id"), F.size(tokens(F.col(text_col))).alias("n_tokens")
    )
    rn = F.row_number().over(
        W.orderBy(F.col("n_tokens").desc(), F.col("id"))
    )
    assigned = meta.select(
        "id", "n_tokens", ((rn - 1) % n_shards).cast("int").alias("shard_id")
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
