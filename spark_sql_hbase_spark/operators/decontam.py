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

from spark_sql_hbase_spark.operators.dedup import shingle_sets_arrow


def eval_shingle_index(
    eval_df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """The eval side as an inverted n-gram index ``(eval_id, s)`` —
    bounded (benchmarks are), built ONCE and frozen/broadcast by every
    consumer: the batch decontamination join and the streaming monitor
    (the frozen-model convention — a changed eval set is a re-baseline
    event, not something a stream mutates)."""
    return shingle_sets_arrow(eval_df, id_col, text_col, n).select(
        F.col("id").alias("eval_id"), F.explode("sh").alias("s")
    )


def decontaminate_against_index(
    train: DataFrame,
    ev_index: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_overlap: int = 3,
) -> DataFrame:
    """:func:`decontaminate` against a prebuilt
    :func:`eval_shingle_index` — the shape batch and streaming callers
    share, so the two cannot diverge."""
    tr = shingle_sets_arrow(train, id_col, text_col, n).select(
        F.col("id").alias("train_id"), F.explode("sh").alias("s")
    )
    pairs = (
        tr.join(F.broadcast(ev_index), "s")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )
    return pairs.groupBy("train_id").agg(
        F.count(F.lit(1)).alias("n_eval_docs"),
        F.sum("n_shared").cast("long").alias("total_shared"),
        F.max("n_shared").cast("long").alias("max_shared"),
    )


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
    ev = eval_shingle_index(eval_df, id_col, text_col, n)
    return decontaminate_against_index(
        train, ev, id_col, text_col, n, min_overlap
    )


def bloom_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_overlap: int = 3,
    m_bits: int = 1 << 18,
    k_hashes: int = 2,
) -> DataFrame:
    """:func:`decontaminate` with a Bloom-filter pre-gate (Bloom 1970,
    public): the eval n-gram set is folded into an ``m_bits``-bit bitmap
    (``k_hashes`` probes per shingle), and the TRAINING side tests
    membership row-locally before any join — only surviving shingles
    (true matches + the bounded false-positive fraction) ever meet the
    exact eval index.

    Result is IDENTICAL to :func:`decontaminate` by construction: Bloom
    filters have no false negatives, and the exact verify join removes
    every false positive — which is also why the gate can share d08's
    exact oracle.

    Scale design (100 TB train side, large benchmark suite):
    - the broadcast is ``m_bits/8`` BYTES (32 KiB at the default) packed
      as a map of 64-bit words riding ONE broadcast row — not the eval
      shingle STRINGS (the plain operator's broadcast grows with the
      benchmark suite; this one is constant and tunable by false-positive
      budget, fp ≈ (1 − e^(−k·n_ev/m))^k);
    - the membership test is a row-local JVM bit test (word lookup +
      mask) per probe — no shuffle, no UDF; the training inverted index
      shrinks by the non-matching fraction BEFORE the first exchange;
    - the exact pair join then runs over the small survivor set, exactly
      the plain operator's shape.
    """
    # Probe hash: xxhash64 (native codegen'd expression), seeded per
    # probe by the literal probe index.  The probe hash never touches the
    # operator's OUTPUT — it only gates candidates, both bitmap build and
    # membership test use the same function, Bloom filters have no false
    # negatives, and the exact verify join removes every false positive —
    # so the md5-based word_hash (two md5s of a concat per shingle per
    # side) was pure overhead here, not a cross-engine determinism need.
    def probe_pos(i: int, s) -> "F.Column":
        return F.pmod(F.xxhash64(s, F.lit(i)), F.lit(m_bits))

    ev_sh = (
        shingle_sets_arrow(eval_df, id_col, text_col, n)
        .select(F.col("id").alias("eval_id"), F.explode("sh").alias("s"))
    )
    pos = ev_sh.select(
        F.explode(
            F.array(*[probe_pos(i, F.col("s")) for i in range(k_hashes)])
        ).alias("pos")
    )
    words = pos.select(
        F.expr("pos div 64").alias("w"),
        F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias("b"),
    )
    bitmap = (
        words.groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("w", "bits")))
            ).alias("__bm")
        )
    )
    tr = shingle_sets_arrow(train, id_col, text_col, n).select(
        F.col("id").alias("train_id"), F.explode("sh").alias("s")
    )
    gated = tr.join(F.broadcast(bitmap)).select(  # 1-row broadcast cross join
        "train_id",
        "s",
        "__bm",
        *[probe_pos(i, F.col("s")).alias(f"__p{i}") for i in range(k_hashes)],
    )
    member = F.lit(True)
    for i in range(k_hashes):
        word = F.coalesce(
            F.element_at(F.col("__bm"), F.expr(f"__p{i} div 64")),
            F.lit(0).cast("long"),
        )
        mask = F.expr(f"shiftleft(cast(1 as bigint), cast(__p{i} % 64 as int))")
        member = member & (word.bitwiseAND(mask) != 0)
    survivors = gated.filter(member).select("train_id", "s")
    ev = ev_sh  # exact verify index (broadcast, as in the plain operator)
    pairs = (
        survivors.join(F.broadcast(ev), "s")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )
    return pairs.groupBy("train_id").agg(
        F.count(F.lit(1)).alias("n_eval_docs"),
        F.sum("n_shared").cast("long").alias("total_shared"),
        F.max("n_shared").cast("long").alias("max_shared"),
    )
