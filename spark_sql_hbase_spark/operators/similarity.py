"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- :func:`cosine_topk` — brute-force exact top-k against a small broadcast
  query set. JVM-side ``zip_with``/``aggregate`` dot products (no Python),
  one pass over the corpus per batch of queries, window top-k per query.
  This is the baseline/oracle tier; cost O(|corpus|·|queries|·dim) but
  embarrassingly parallel and shuffle-free until the final (tiny) top-k.
- :func:`partitioned_ann_topk` — the scale path: restrict search to a
  coarse partition (IVF-style cell id; here a precomputed ``label``
  column stands in for the learned quantizer's cell assignment). Only
  same-cell candidates are scored → corpus scan shrinks by the number of
  probed cells / total cells. With an nprobe>1 extension the candidate
  union is the merge of a few cells; the plan stays a broadcast join + agg.

Cosine is computed in double precision after casting the float vectors —
deterministic and engine-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query vector (broadcast queries).

    Returns (query_id, neighbor_id, cos, rank). Self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos_raw"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_raw", 4).alias("cos"), "rank")
    )


def partitioned_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """IVF-style approximate top-k: score only same-cell candidates.

    The equi-join on the cell id prunes the scan to 1/|cells| of the
    corpus per query (the 100 TB path: cells = k-means centroids
    materialized at ingest, partition-pruned parquet scan per probe).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(cell_col).alias("cell"),
        _to_double(F.col(vec_col)).alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col).alias("cell"),
        _to_double(F.col(vec_col)).alias("cv"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", "cell",
            cosine(F.col("qv"), F.col("cv")).alias("cos_raw"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cell", F.round("cos_raw", 4).alias("cos"), "rank"
        )
    )


def embedding_neardup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    threshold: float = 0.9,
) -> DataFrame:
    """Near-duplicate vector pairs (cos ≥ t) within coarse cells.

    Blocking on the cell id keeps the pair space |cell|² instead of n² —
    the standard embedding-dedup plan (true near-dups land in the same
    cell for any reasonable quantizer; cross-cell misses are the accepted
    approximation, same contract as the IVF search).
    """
    a = corpus.select(
        F.col(id_col).alias("id_a"),
        F.col(cell_col).alias("cell"),
        _to_double(F.col(vec_col)).alias("va"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(cell_col).alias("cell"),
        _to_double(F.col(vec_col)).alias("vb"),
    )
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", "cell", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos")
        )
        .filter(F.col("cos") >= threshold)
    )
