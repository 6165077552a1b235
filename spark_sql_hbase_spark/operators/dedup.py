"""Deduplication operators for large-scale (training-data) pipelines.

Four families, all partition-parallel and shuffle-bounded:

- **exact**: hash-groupBy on a content digest — one shuffle of digests,
  never of full documents.
- **n-gram Jaccard (exact)**: inverted-index self-join on word-shingles —
  the standard similarity-join plan; shuffle volume = Σ_shingle df², kept
  bounded by shingle discrimination (n=3 word-grams).
- **MinHash + LSH (approximate)**: shingle → 128 minhash permutations →
  64 bands × 2 rows → candidates bucket-join → *exact* Jaccard
  verification of candidates only. Verification makes the output exact up
  to LSH recall (miss probability ≈ (1-t^2)^64 < 1e-8 at t=0.6), so the
  result is oracle-comparable against the exhaustive join.
- **SimHash**: 60-bit md5-vote fingerprint per document (single-pass,
  60 aggregate columns — no row multiplication), near-dup pairs via
  pigeonhole segment blocking + popcount verification.

At 100 TB the LSH/SimHash paths are the real ones (linear shuffles);
the exact-join path exists as the correctness oracle and for small/medium
corpora.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_sql_hbase_spark.functions.texthash import (
    MOD_P,
    SIMHASH_BITS,
    shingles,
    simhash_agg_columns,
    simhash_combine,
    tokens,
    word_hash,
)

# Fixed seed → fixed permutation constants: results are reproducible run
# to run and node to node.
_MINHASH_SEED = 20240813


def minhash_params(num_hashes: int = 128) -> list[tuple[int, int]]:
    rng = random.Random(_MINHASH_SEED)
    return [(rng.randrange(1, MOD_P), rng.randrange(0, MOD_P)) for _ in range(num_hashes)]


# ---------------------------------------------------------------------------
def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by content digest.

    Groups on ``sha2(text)`` (shuffles 32-byte digests, not documents) and
    keeps the minimum id as the canonical representative.
    Returns (text_sha, keep_id, n_copies).
    """
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col).cast("binary"), 256).alias("text_sha"))
        .groupBy("text_sha")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
def _shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle_set array) — distinct word n-grams per document."""
    return df.select(
        F.col(id_col).alias("id"), shingles(tokens(F.col(text_col)), n).alias("sh")
    )


def _verify_jaccard(pairs: DataFrame, sets: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard on candidate pairs via array intersection of the two
    (bounded-size) shingle arrays; emits (id_a, id_b, jac)."""
    sa = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter.cast("double") / union, 4).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


def ngram_jaccard_join(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.6, n: int = 3
) -> DataFrame:
    """Exact similarity self-join: all pairs with shingle-Jaccard ≥ t.

    Plan: explode shingle sets into an inverted index, self-join on the
    shingle, count co-occurrences per pair (map-side combinable), then
    compute Jaccard from the counted intersection — documents themselves
    are never re-shuffled. Production note for ultra-high-df shingles
    (boilerplate): drop shingles with df above a cap before the join; kept
    exact here because this operator doubles as the oracle target.
    """
    sets = _shingle_sets(df, id_col, text_col, n).cache()
    tok = sets.select("id", F.explode("sh").alias("s"))
    ta = tok.select(F.col("id").alias("id_a"), "s")
    tb = tok.select(F.col("id").alias("id_b"), "s")
    pair_inter = (
        ta.join(tb, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = sets.select("id", F.size("sh").alias("n_sh"))
    na = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        pair_inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                4,
            ).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


# ---------------------------------------------------------------------------
def minhash_signatures(
    sets: DataFrame, num_hashes: int = 128
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) minhash signature via k fixed affine
    permutations of the 56-bit shingle hash, computed in one aggregation
    pass over the exploded (id, shingle-hash) relation."""
    params = minhash_params(num_hashes)
    exploded = sets.select("id", F.explode("sh").alias("s")).select(
        "id", (word_hash(F.col("s")) % MOD_P).alias("h")
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MOD_P).alias(f"mh_{j}")
        for j, (a, b) in enumerate(params)
    ]
    return exploded.groupBy("id").agg(*aggs)


def minhash_lsh_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    n: int = 3,
    num_hashes: int = 128,
    rows_per_band: int = 2,
) -> DataFrame:
    """Approximate near-dup join: LSH candidates + exact verification.

    Candidates: documents sharing any band signature (band = hash of
    ``rows_per_band`` consecutive minhashes). Each doc emits
    ``num_hashes/rows_per_band`` (band, sig) keys — a linear-size shuffle.
    Verification computes exact Jaccard on candidates only, so output ⊆
    exact join; recall at t=0.6 with 64×2 bands ≈ 1 - (1-0.36)^64 ≈ 1-1e-13.
    """
    num_bands = num_hashes // rows_per_band
    sets = _shingle_sets(df, id_col, text_col, n).filter(F.size("sh") > 0).cache()
    sigs = minhash_signatures(sets, num_hashes)
    bands = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
                        ).alias("sig"),
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("bs"),
    ).select("id", "bs.band", "bs.sig")
    ba = bands.select(F.col("id").alias("id_a"), "band", "sig")
    bb = bands.select(F.col("id").alias("id_b"), "band", "sig")
    candidates = (
        ba.join(bb, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_jaccard(candidates, sets, threshold)


# ---------------------------------------------------------------------------
def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) 60-bit fingerprint per document (single-pass agg)."""
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("w")
    ).select("id", word_hash(F.col("w")).alias("th"))
    votes = tok.groupBy("id").agg(*simhash_agg_columns())
    return votes.select("id", simhash_combine().alias("simhash"))


def simhash_neardup(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, segments: int = 4
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ k via pigeonhole blocking.

    Any pair within k bit-flips agrees on ≥1 of (k+1) disjoint bit
    segments, so candidate generation is an equi-join on (segment_id,
    segment_bits) — linear shuffle — followed by popcount verification.
    """
    assert segments >= max_hamming + 1, "need ≥ k+1 segments for pigeonhole recall"
    fp = simhash_fingerprints(df, id_col, text_col)
    seg_width = SIMHASH_BITS // segments
    mask = (1 << seg_width) - 1
    segs = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seg"),
                        F.shiftright("simhash", s * seg_width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bits"),
                    )
                    for s in range(segments)
                ]
            )
        ).alias("sb"),
    ).select("id", "simhash", "sb.seg", "sb.bits")
    a = segs.select(F.col("id").alias("id_a"), F.col("simhash").alias("fp_a"), "seg", "bits")
    b = segs.select(F.col("id").alias("id_b"), F.col("simhash").alias("fp_b"), "seg", "bits")
    return (
        a.join(b, ["seg", "bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.col("fp_a").bitwiseXOR(F.col("fp_b")).alias("x"))
        .distinct()
        .select("id_a", "id_b", F.bit_count("x").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
