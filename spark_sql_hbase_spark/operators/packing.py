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
