"""Train/test decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard LLM-corpus hygiene step (n-gram-overlap decontamination, as
published for GPT-3/PaLM-style pipelines): any training document sharing
``min_overlap`` or more distinct ``n``-grams with any eval document is
reported with the evidence counts, so the pipeline can drop or audit it.

Scale design (100 TB corpus, thousands-of-docs eval set):

- Both sides become inverted n-gram indexes (``explode`` of the
  per-document distinct-shingle arrays — same single-reference shingle
  fold as :mod:`spark_sql_hbase_spark.operators.dedup`).
- The eval index is *bounded and small* (benchmarks are), so it is
  **broadcast**: the contamination join is map-side against the training
  index — the 100 TB side is never shuffled to find matches.
- Only matched ``(train, eval)`` pairs reach the aggregation shuffle,
  and the pair counter is map-side combinable.
- The same ultra-high-df caveat as the Jaccard join applies: boilerplate
  shingles inflate the candidate count; production runs cap eval-side
  document frequency before the join (kept exact here because this
  operator doubles as the oracle target).

Beyond-reference operator (SURVEY §7.1 item 5 family); no reference
analogue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_sql_hbase_spark.operators.dedup import _shingle_sets


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_overlap: int = 3,
) -> DataFrame:
    """Per contaminated training doc: (train_id, n_eval_docs,
    total_shared, max_shared) over eval docs sharing ≥ ``min_overlap``
    distinct ``n``-grams."""
    tr = _shingle_sets(train, id_col, text_col, n).select(
        F.col("id").alias("train_id"), F.explode("sh").alias("s")
    )
    ev = _shingle_sets(eval_df, id_col, text_col, n).select(
        F.col("id").alias("eval_id"), F.explode("sh").alias("s")
    )
    pairs = (
        tr.join(F.broadcast(ev), "s")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )
    return pairs.groupBy("train_id").agg(
        F.count(F.lit(1)).alias("n_eval_docs"),
        F.sum("n_shared").cast("long").alias("total_shared"),
        F.max("n_shared").cast("long").alias("max_shared"),
    )
