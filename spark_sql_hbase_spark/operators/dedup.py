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
- **SimHash**: 60-bit md5-vote fingerprint per document (one shuffle-free
  fold over the token array — no row multiplication), near-dup pairs via
  pigeonhole segment blocking + popcount verification.

At 100 TB the LSH/SimHash paths are the real ones (linear shuffles);
the exact-join path exists as the correctness oracle and for small/medium
corpora.
"""

from __future__ import annotations

import itertools
import random
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_sql_hbase_spark.functions.texthash import (
    MOD_P,
    SIMHASH_BITS,
    TOKEN_SPLIT_RE,
    shingles,
    tokens,
    word_hash,
)

# Python twin of the JVM tokenizer split (parity pinned by
# tests/test_properties.py::test_python_shingles_match_jvm)
_TOKEN_RE = re.compile(TOKEN_SPLIT_RE)

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
def _parallelized(df: DataFrame) -> DataFrame:
    """Spread a under-partitioned input across the cluster before heavy
    per-row compute. A single small parquet file scans as one partition,
    serializing the (CPU-bound) tokenize/hash folds; at scale inputs are
    already well-partitioned and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    # decide from the scan's file list — probing df.rdd would force the
    # whole plan through the RDD conversion path on every call
    files = df.inputFiles()
    if not files:
        return df  # non-file input: partitioning is the source's business
    if len(files) >= target:
        return df
    # few files can still mean many partitions: Spark splits by
    # maxPartitionBytes. Only repartition when the byte math says the scan
    # really is under-parallelized (the small-single-file case).
    import os as _os

    try:
        total = sum(
            _os.path.getsize(f.removeprefix("file:")) for f in files
        )
        max_pb = int(
            df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
            .removesuffix("b")
        )
    except (OSError, ValueError):
        return df.repartition(target)
    if max(len(files), -(-total // max_pb)) >= target:
        return df
    return df.repartition(target)


def _shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle_set array) — distinct word n-grams per document."""
    return _parallelized(df).select(
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


def _verify_jaccard_two_sided(
    pairs: DataFrame, sets_a: DataFrame, sets_b: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard where the pair sides come from DIFFERENT tables:
    ``id_a`` resolves only against ``sets_a`` and ``id_b`` only against
    ``sets_b``.  The single-frame variant would join BOTH docs onto each
    candidate side whenever the two tables share an id value (two distinct
    tables with overlapping integer ids is a plausible call — ADVICE r2)."""
    sa = sets_a.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sets_b.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
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
    sets = shingle_sets_arrow(df, id_col, text_col, n).cache()
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
def minhash_signature_col(sh: F.Column, num_hashes: int = 128) -> F.Column:
    """Minhash signature (array<bigint>, one slot per permutation) as ONE
    fold over the shingle array.

    Shuffle-free and single-reference: the shingle hashes are the fold's
    collection argument (each shingle md5-hashed exactly once), and each
    step ``zip_with``-mins the running signature against the element's
    128 affine permutations. Single-reference discipline matters because
    HOF lambdas are interpreted with no subexpression elimination — an
    expression referenced k times is evaluated k times per row."""
    params = minhash_params(num_hashes)
    perms = F.array(
        *[F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in params]
    )
    # xxhash64, not the md5-based word_hash: signatures are internal to
    # candidate generation (verification is exact Jaccard on the shingle
    # arrays), so cross-engine hash determinism isn't needed — only
    # self-consistency — and xxhash64 is a native codegen-able expression
    return F.aggregate(
        F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(MOD_P))),
        F.array_repeat(F.lit(MOD_P).cast("long"), num_hashes),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(perms, lambda p: (p["a"] * h + p["b"]) % MOD_P),
            lambda x, y: F.least(x, y),
        ),
    )


def minhash_signatures(sets: DataFrame, num_hashes: int = 128) -> DataFrame:
    """(id, sig: array<bigint>) minhash signatures per document."""
    return sets.select("id", minhash_signature_col(F.col("sh"), num_hashes).alias("sig"))


def band_keys_col(sig: F.Column, rows_per_band: int = 2) -> F.Column:
    """LSH band keys (array<bigint>) from a signature column, as ONE fold.

    Band key = xxhash64(band-index, the band's ``rows_per_band``
    minhashes) — the band index is baked into the hash so a single
    equi-join on the key suffices. Folding (rather than 64 ``element_at``
    probes) references ``sig`` exactly once, which keeps the chained
    tokens→shingles→signature→bands expression linear per row."""
    init = F.struct(
        F.array().cast("array<bigint>").alias("bands"),
        F.array().cast("array<bigint>").alias("buf"),
    )

    def step(acc: F.Column, mh: F.Column) -> F.Column:
        buf2 = F.concat(acc["buf"], F.array(mh))  # bounded: ≤ rows_per_band
        full = F.size(buf2) == rows_per_band
        key = F.xxhash64(
            F.size(acc["bands"]),
            *[F.element_at(buf2, i + 1) for i in range(rows_per_band)],
        )
        return F.struct(
            F.when(full, F.concat(acc["bands"], F.array(key)))
            .otherwise(acc["bands"])
            .alias("bands"),
            F.when(full, F.array().cast("array<bigint>")).otherwise(buf2).alias("buf"),
        )

    return F.aggregate(sig, init, step, lambda acc: acc["bands"])


def minhash_band_keys_arrow(
    sets: DataFrame, num_hashes: int = 128, rows_per_band: int = 2
) -> DataFrame:
    """(id, band_key) LSH band keys via Arrow-batched numpy one-permutation
    hashing (OPH) — the vectorized twin of ``minhash_signature_col`` +
    ``band_keys_col``.

    The JVM fold is interpreted (HOF lambdas don't codegen) and costs
    O(shingles × num_hashes) per document. OPH costs O(shingles): ONE
    64-bit hash per shingle (``pd.util.hash_array``, vectorized C, fixed
    key → deterministic across workers), bucketed into ``num_hashes`` bins
    by its low bits with a scatter-min (``np.minimum.at``), then empty bins
    are densified by circular borrow from the nearest filled bin to the
    left, XOR-mixed with the borrow distance so borrowed slots stay
    discriminative (Shrivastava's densified OPH). Band keys are a
    splitmix-style mix over ``rows_per_band`` consecutive slots.

    All buffers are O(batch) small (the (docs × num_hashes) signature is a
    few MB), which matters doubly here: 64-bit multiplies only run fast on
    warm memory, and this host (like many VMs) page-faults fresh large
    allocations at ~10 µs/page — the O(shingles × num_hashes) matrix of
    the textbook vectorization is 100× slower than OPH in practice.

    Candidate sets differ from the JVM path only through the internal hash
    family — irrelevant to the operator contract because candidates are
    verified with exact Jaccard; densified-OPH band collision probability
    tracks Jaccard like classic minhash, so recall stays ≈ 1 at t=0.6 with
    64×2 bands (asserted by the oracle-equality gate at sf0.01).
    """
    import numpy as np
    import pandas as pd

    n_bands = num_hashes // rows_per_band
    bin_mask = np.uint64(num_hashes - 1)
    assert num_hashes & (num_hashes - 1) == 0, "num_hashes must be a power of two"
    mix_mult = np.uint64(0x9E3779B97F4A7C15)
    empty_v = np.uint64(0xFFFFFFFFFFFFFFFF)

    id_type = sets.schema["id"].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            shingle_lists = list(pdf["sh"])
            out = _oph_band_keys_numpy(
                pdf["id"].to_numpy(), shingle_lists, num_hashes, rows_per_band
            )
            if out is not None:
                yield out

    return sets.mapInPandas(gen, f"id {id_type}, band_key bigint")


def _oph_band_matrix(shingle_lists, num_hashes, rows_per_band):
    """Numpy core of the densified-OPH band-key computation (see
    ``minhash_band_keys_arrow`` docstring). Returns ``(keep, acc)`` where
    ``keep`` is the bool mask of non-empty documents and ``acc`` the
    (kept_docs × n_bands) uint64 band-key matrix, or ``None`` for a batch
    with no non-empty documents."""
    import numpy as np
    import pandas as pd

    n_bands = num_hashes // rows_per_band
    bin_mask = np.uint64(num_hashes - 1)
    assert num_hashes & (num_hashes - 1) == 0, "num_hashes must be a power of two"
    mix_mult = np.uint64(0x9E3779B97F4A7C15)
    empty_v = np.uint64(0xFFFFFFFFFFFFFFFF)

    lens = np.fromiter(
        (len(s) for s in shingle_lists), dtype=np.int64, count=len(shingle_lists)
    )
    keep = lens > 0
    lens = lens[keep]
    ndocs = len(lens)
    if ndocs == 0:
        return None
    flat = list(
        itertools.chain.from_iterable(s for s in shingle_lists if len(s) > 0)
    )
    hv = pd.util.hash_array(np.asarray(flat, dtype=object), categorize=False)
    # ---- OPH scatter-min: one pass over shingle hashes ----
    bins = (hv & bin_mask).astype(np.int64)
    doc_idx = np.repeat(np.arange(ndocs), lens)
    sig = np.full((ndocs, num_hashes), empty_v, dtype=np.uint64)
    np.minimum.at(sig, (doc_idx, bins), hv)
    # ---- densify empty bins: circular borrow from the left ----
    filled = sig != empty_v
    pos = np.where(filled, np.arange(num_hashes, dtype=np.int64), -1)
    ff = np.maximum.accumulate(pos, axis=1)  # nearest filled ≤ j
    src = np.where(ff >= 0, ff, ff[:, -1:])  # wrap: borrow from end
    steps = (np.arange(num_hashes, dtype=np.int64) - src) % num_hashes
    dense = np.take_along_axis(sig, src, axis=1)
    # distance mix keeps borrowed slots distinct per distance
    dense = dense ^ (steps.astype(np.uint64) * mix_mult)
    # ---- band keys: mix rows_per_band consecutive slots ----
    v = dense.reshape(ndocs, n_bands, rows_per_band)
    acc = np.broadcast_to(
        np.arange(n_bands, dtype=np.uint64), (ndocs, n_bands)
    ).copy()
    for r in range(rows_per_band):
        acc = (acc ^ v[:, :, r]) * mix_mult
        acc ^= acc >> np.uint64(31)
    return keep, acc


def _oph_band_keys_numpy(ids_arr, shingle_lists, num_hashes, rows_per_band):
    """Exploded (id, band_key) form of :func:`_oph_band_matrix` as a pandas
    DataFrame, or None for an empty batch."""
    import numpy as np
    import pandas as pd

    res = _oph_band_matrix(shingle_lists, num_hashes, rows_per_band)
    if res is None:
        return None
    keep, acc = res
    ids = ids_arr[keep]
    n_bands = num_hashes // rows_per_band
    return pd.DataFrame(
        {
            "id": np.repeat(ids, n_bands),
            "band_key": acc.reshape(-1).view(np.int64),
        }
    )


def _py_shingles(text: str, n: int) -> list:
    """Python twin of ``texthash.tokens`` + ``texthash.shingles`` — MUST
    produce byte-identical shingles (pinned by
    ``test_python_shingles_match_jvm``): lowercase, split on
    ``[^a-z0-9]+``, drop empties, distinct space-joined word n-grams in
    first-occurrence order (order is irrelevant downstream: OPH hashes the
    set)."""
    if not isinstance(text, str) or not text:
        return []  # NULL / NaN text: no shingles, same as the JVM path
    toks = [t for t in _TOKEN_RE.split(text.lower()) if t]
    if len(toks) < n:
        return []
    return list({" ".join(toks[i : i + n]): None for i in range(len(toks) - n + 1)})


def minhash_band_keys_arrow_text(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 128,
    rows_per_band: int = 2,
) -> DataFrame:
    """(id, band_key) straight from raw text: tokenize + shingle INSIDE the
    Arrow pass, then the same densified-OPH core.

    Skips both costs of the sets-based path: the interpreted JVM
    shingle fold (HOF lambdas, no codegen) AND the Arrow transfer of the
    per-document shingle arrays — only (id, text) crosses into Python.
    Shingling here is plain Python over the batch; at ~100-token docs
    that is microseconds per document, far under the JVM fold it
    replaces. Candidate recall needs Python shingles == JVM shingles,
    which the parity test pins; exactness of the final operator output
    never depends on it (verification is exact JVM-side Jaccard)."""
    id_type = docs.schema[id_col].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            shingle_lists = [_py_shingles(t, n) for t in pdf[text_col]]
            out = _oph_band_keys_numpy(
                pdf[id_col].to_numpy(), shingle_lists, num_hashes, rows_per_band
            )
            if out is not None:
                yield out

    return docs.select(id_col, text_col).mapInPandas(
        gen, f"id {id_type}, band_key bigint"
    )


def shingle_sets_arrow(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Drop-in Arrow twin of :func:`_shingle_sets`: (id, sh) with the
    byte-identical shingle arrays (``_py_shingles`` parity, pinned by
    ``test_python_shingles_match_jvm``), including empty arrays for docs
    with fewer than ``n`` tokens — ONE Python crossing per row instead of
    the interpreted JVM HOF fold (O(len·n) lambda steps per row)."""
    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "sh": [_py_shingles(t, n) for t in pdf[text_col]],
                }
            )

    return (
        _parallelized(docs)
        .select(id_col, text_col)
        .mapInPandas(gen, f"id {id_type}, sh array<string>")
    )


def shingle_sets_and_bands_arrow(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 128,
    rows_per_band: int = 2,
) -> DataFrame:
    """(id, sh, band_keys) in ONE Arrow pass: tokenize + shingle + OPH.

    Fusion of ``_shingle_sets`` (the verify-side shingle arrays) and
    ``minhash_band_keys_arrow`` (the banding keys) for callers that need
    BOTH — one corpus scan, one Python crossing, instead of an
    interpreted JVM shingle fold (O(len·n) HOF work per row) followed by
    a second Arrow transfer of the shingle arrays into the OPH pass.
    ``_py_shingles`` is byte-identical to the JVM ``shingles(tokens(..))``
    fold (pinned by ``test_python_shingles_match_jvm``), so consumers see
    the exact same shingle sets and the exact same band keys as the
    unfused path. Documents with no shingles are dropped, matching the
    fused callers' ``filter(size(sh) > 0)``.

    ``band_keys`` is a dense ``num_hashes/rows_per_band``-element array —
    explode it JVM-side for the bucket join; keeping it dense in the
    cached relation costs ~0.5 KB/doc and avoids caching the exploded
    (id, band_key) relation separately.
    """
    import numpy as np
    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            shingle_lists = [_py_shingles(t, n) for t in pdf[text_col]]
            res = _oph_band_matrix(shingle_lists, num_hashes, rows_per_band)
            if res is None:
                continue
            keep, acc = res
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy()[keep],
                    "sh": [s for s in shingle_lists if len(s) > 0],
                    "band_keys": list(acc.view(np.int64)),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        gen, f"id {id_type}, sh array<string>, band_keys array<bigint>"
    )


def minhash_lsh_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    n: int = 3,
    num_hashes: int = 128,
    rows_per_band: int = 4,
    vectorized: bool = True,
    verify_scope: str = "corpus",
) -> DataFrame:
    """Approximate near-dup join: LSH candidates + exact verification.

    Candidates: documents sharing any band signature (band = hash of
    ``rows_per_band`` consecutive minhashes). Each doc emits
    ``num_hashes/rows_per_band`` (band, sig) keys — a linear-size shuffle.
    Verification computes exact Jaccard on candidates only, so output ⊆
    exact join.

    Banding is the precision/recall dial and drives TOTAL COST: candidate
    volume for a background pair at Jaccard j is ≈ bands·j^rows, so
    widening bands from 2 to 4 rows cuts false candidates ~j²× (1000× at
    j=0.05 — verification was >80% of the operator's runtime at 64×2)
    while near-dup recall at j=0.8 is still 1-(1-0.8⁴)³² ≈ 1-5e-8. The
    S-curve midpoint of 32×4 sits at (1/32)^(1/4) ≈ 0.42, well under the
    default threshold; pairs hovering exactly AT t=0.6 have ≈ 1% miss —
    callers needing the textbook 64×2 curve pass ``rows_per_band=2``.

    ``vectorized=True`` computes band keys straight from text with the
    Arrow/numpy OPH path (``minhash_band_keys_arrow_text`` — tokenize +
    shingle + OPH in one Python pass; the interpreted JVM shingle fold is
    OFF the banding path entirely); ``False`` keeps the pure-JVM
    expression fold (no Python workers in the plan).

    ``verify_scope`` picks the shingle strategy, and the banding input
    couples to it:

    - ``"corpus"`` (default): one cached JVM shingle fold over the whole
      input serves BOTH the band keys (Arrow OPH over the shingle
      arrays) and both sides of the verify join — fewest jobs, no
      redundant shingling.  Right when candidates touch a large fraction
      of documents (boilerplate-heavy corpora — this engine's test set
      has most docs in at least one candidate pair).
    - ``"candidates"``: band keys come straight from text
      (``minhash_band_keys_arrow_text`` — tokenize + shingle + OPH in
      one Python pass, NO corpus-wide JVM fold anywhere), then the input
      is semi-joined down to candidate doc ids and only those are
      shingle-folded for exact verification.  Right for the common
      web-scale case where candidates are a small percent of the corpus:
      the O(corpus) interpreted fold disappears from the plan at the
      cost of one broadcast of the candidate-id set.

    Either way verification is exact JVM-side Jaccard, so the output
    contract is identical (pinned by ``test_lsh_verify_scopes_agree``).
    """
    if verify_scope not in ("corpus", "candidates"):
        raise ValueError(f"verify_scope must be corpus|candidates, got {verify_scope!r}")
    if verify_scope == "candidates" and not vectorized:
        raise ValueError(
            "verify_scope='candidates' requires vectorized=True: the JVM "
            "band path computes the corpus-wide shingle fold anyway, so "
            "candidate-scoped verification would be a lie there"
        )
    if vectorized and verify_scope == "candidates":
        bands = minhash_band_keys_arrow_text(
            _parallelized(df), id_col, text_col, n, num_hashes, rows_per_band
        ).cache()
        sets_all = None
    elif vectorized:
        # corpus scope: ONE fused Arrow pass yields the shingle arrays
        # (verify sides) AND the band keys — replaces the interpreted JVM
        # shingle fold + second Arrow transfer of the arrays into OPH
        # (~2× on this operator; same shingles, same band keys, pinned)
        fused = shingle_sets_and_bands_arrow(
            _parallelized(df), id_col, text_col, n, num_hashes, rows_per_band
        ).cache()
        sets_all = fused.select("id", "sh")
        bands = fused.select("id", F.explode("band_keys").alias("band_key"))
    else:
        sets_all = _shingle_sets(df, id_col, text_col, n).filter(F.size("sh") > 0).cache()
        # one linear per-row expression: shingles → signature → band
        # keys; each stage referenced once, no shuffle until the join
        bands = sets_all.select(
            "id",
            F.explode(
                band_keys_col(
                    minhash_signature_col(F.col("sh"), num_hashes), rows_per_band
                )
            ).alias("band_key"),
        ).cache()  # both self-join sides read this; don't run the fold twice
    ba = bands.select(F.col("id").alias("id_a"), "band_key")
    bb = bands.select(F.col("id").alias("id_b"), "band_key")
    candidates = (
        ba.join(bb, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if sets_all is not None:
        sets = sets_all
    else:
        candidates = candidates.cache()  # verify join + candidate-id set
        cand_ids = (
            candidates.select(F.col("id_a").alias("cid"))
            .union(candidates.select(F.col("id_b").alias("cid")))
            .distinct()
        )
        cand_docs = df.join(
            F.broadcast(cand_ids), F.col(id_col) == F.col("cid"), "left_semi"
        )
        # cached: _verify_jaccard consumes this frame on BOTH join sides —
        # without it the interpreted shingle fold over candidate docs runs
        # twice (the incremental variants already did this).  JVM fold,
        # not shingle_sets_arrow: candidate sets are small (hundreds of
        # docs), where the Arrow crossing costs more than the
        # interpreted fold saves — r15 interleaved 6-rep A/B at sf0.1:
        # JVM 2.26 vs Arrow 2.48 median end-to-end, confirming the
        # driver's r14 regression flag on this path (the corpus-scope
        # fused Arrow pass above is where vectorization pays).
        sets = _shingle_sets(cand_docs, id_col, text_col, n).cache()
    return _verify_jaccard(candidates, sets, threshold)


# ---------------------------------------------------------------------------
def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) 60-bit fingerprint per document.

    Shuffle-free, one Arrow pass: tokenization stays JVM-side (codegen'd
    ``split`` + ``array_remove`` — byte-identical tokens by construction),
    then the per-token md5 word hash and the 60-bit majority vote run
    vectorized in numpy. The md5 is computed once per DISTINCT token per
    batch (vocabulary is Zipfian, so this is a small fraction of the
    token stream) and votes are per-bit segment sums — identical to the
    JVM ``aggregate``/``zip_with`` vote fold this replaces
    (``simhash_fingerprints_jvm``, parity-pinned by
    ``test_simhash_arrow_matches_jvm``), which interpreted O(tokens × 60)
    lambda steps per document and dominated the operator's runtime.
    Docs with zero tokens are dropped (parity with the JVM/grouped
    formulations)."""
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    toks = _parallelized(df).select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t")
    )

    def gen(batches):
        import hashlib

        bit_idx = np.arange(SIMHASH_BITS, dtype=np.uint64)
        for pdf in batches:
            tok_lists = list(pdf["t"])
            lens = np.fromiter(
                (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
            )
            keep = lens > 0
            ids = pdf["id"].to_numpy()[keep]
            lens = lens[keep]
            if len(ids) == 0:
                continue
            flat = np.asarray(
                list(itertools.chain.from_iterable(t for t in tok_lists if len(t))),
                dtype=object,
            )
            # md5 once per distinct token: word_hash = first 14 hex digits
            uniq, inv = np.unique(flat, return_inverse=True)
            uh = np.fromiter(
                (
                    int(hashlib.md5(w.encode("utf-8")).hexdigest()[:14], 16)
                    for w in uniq
                ),
                dtype=np.uint64,
                count=len(uniq),
            )
            hv = uh[inv]
            # per-bit set-counts per document: (tokens × 60) bit matrix,
            # segment-summed at document boundaries
            bits = ((hv[:, None] >> bit_idx) & np.uint64(1)).astype(np.int64)
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            counts = np.add.reduceat(bits, starts, axis=0)
            # majority rule: bit i set iff set-count·2 >= n
            simhash = (
                ((counts * 2 >= lens[:, None]).astype(np.uint64) << bit_idx)
                .sum(axis=1)
                .view(np.int64)
            )
            yield pd.DataFrame({"id": ids, "simhash": simhash})

    return toks.mapInPandas(gen, f"id {id_type}, simhash bigint")


def simhash_fingerprints_jvm(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Pure-JVM expression twin of :func:`simhash_fingerprints` (no Python
    workers in the plan): per-bit set-counts are accumulated in ONE
    ``aggregate`` pass over the token-hash array (``zip_with`` against the
    bit mask of each hash), then combined against the per-doc token count
    — bit i is set iff set-count·2 ≥ n, identical to the
    sum-of-±1-votes ≥ 0 rule. The explode + 60-column group-by
    formulation shuffles every token; this touches each row once where it
    already lives. Docs with zero tokens are dropped (parity with the
    grouped formulation). HOF lambdas are interpreted, so this costs
    O(tokens × 60) interpreter steps per document — kept as the
    no-Python fallback and the parity anchor for the Arrow path.

    The token array is bound behind a Generate barrier (round 4): ``n``
    is captured inside the vote lambda and the filter re-references the
    tokenize — with a plain alias each interpreted reference re-runs the
    split (the single-reference discipline; ~10% off this operator, and
    the filter/vote references become O(1) column reads)."""
    df = _parallelized(df).select(
        F.col(id_col),
        F.explode(F.array(tokens(F.col(text_col)))).alias("__tok"),
    )
    tok = F.col("__tok")
    hashes = F.transform(tok, lambda w: word_hash(w))
    zero = F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS)
    counts = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftright(h, i).bitwiseAND(F.lit(1)).cast("long")
                    for i in range(SIMHASH_BITS)
                ]
            ),
            lambda x, y: x + y,
        ),
    )
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(SIMHASH_BITS)])
    n = F.size(tok).cast("long")
    combine = F.aggregate(
        F.zip_with(counts, powers, lambda c, p: F.when(c * 2 >= n, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        df.filter(F.size(tok) > 0)
        .select(F.col(id_col).alias("id"), combine.alias("simhash"))
    )


def simhash_neardup(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, segments: int = 4
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ k via pigeonhole blocking.

    Any pair within k bit-flips agrees on ≥1 of (k+1) disjoint bit
    segments, so candidate generation is an equi-join on (segment_id,
    segment_bits) — linear shuffle — followed by popcount verification.
    """
    assert segments >= max_hamming + 1, "need ≥ k+1 segments for pigeonhole recall"
    # cache: both sides of the self-join read the fingerprints; without it
    # the md5+fold pipeline runs twice
    fp = simhash_fingerprints(df, id_col, text_col).cache()
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


def minhash_lsh_join_incremental(
    new: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    n: int = 3,
    num_hashes: int = 128,
    rows_per_band: int = 4,
) -> DataFrame:
    """Incremental near-dup join: match an incoming batch against an
    existing corpus (the shape a daily ingest runs — dedup the delta, not
    the world). Emits (id_new, id_corpus, jac) for pairs with exact
    shingle-Jaccard ≥ ``threshold``.

    Scale shape: BOTH sides band straight from text with the Python OPH
    pass (``minhash_band_keys_arrow_text``) — no corpus-wide JVM fold
    anywhere; the band equi-join shuffles (id, band_key) pairs only; the
    exact-verification fold runs over candidate documents only (semi-join
    on both sides). In production the corpus band index is written once
    and reused across batches — recomputing it here keeps the operator
    self-contained; the plan from a persisted index is the same join
    minus the corpus banding stage.  Identifier spaces of ``new`` and
    ``corpus`` may overlap: verification is side-separated (``id_a``
    resolves only against ``new``, ``id_b`` only against ``corpus``).
    """
    bn = minhash_band_keys_arrow_text(
        _parallelized(new), id_col, text_col, n, num_hashes, rows_per_band
    )
    bc = minhash_band_keys_arrow_text(
        _parallelized(corpus), id_col, text_col, n, num_hashes, rows_per_band
    )
    candidates = (
        bn.select(F.col("id").alias("id_a"), "band_key")
        .join(bc.select(F.col("id").alias("id_b"), "band_key"), "band_key")
        .select("id_a", "id_b")
        .distinct()
        .cache()  # verify join + both candidate-id semi-joins
    )
    cand_a = candidates.select(F.col("id_a").alias("cid")).distinct()
    cand_b = candidates.select(F.col("id_b").alias("cid")).distinct()
    docs_a = new.join(F.broadcast(cand_a), F.col(id_col) == F.col("cid"), "left_semi")
    docs_b = corpus.join(
        F.broadcast(cand_b), F.col(id_col) == F.col("cid"), "left_semi"
    )
    # side-separated: each sets frame feeds exactly one join side, so an id
    # value shared by new and corpus can never cross-match (ADVICE r2).
    # JVM shingle fold for the verify sides: candidate doc sets are
    # small, where the Arrow crossing loses to the interpreted fold
    # (r15 interleaved 6-rep A/B at sf0.1 on the index delta join:
    # JVM 2.64 vs Arrow 2.75 median end-to-end — the driver's r14
    # delta-join regression flag).
    sets_a = _shingle_sets(docs_a, id_col, text_col, n)
    sets_b = _shingle_sets(docs_b, id_col, text_col, n)
    return _verify_jaccard_two_sided(candidates, sets_a, sets_b, threshold)


def persist_band_index(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    table_name: str,
    n: int = 3,
    num_hashes: int = 128,
    rows_per_band: int = 4,
    buckets: int = 32,
) -> None:
    """Build and persist the corpus LSH band index as a BUCKETED table on
    ``band_key`` (``table_name`` in the session catalog).

    This is the production half of incremental dedup: the corpus index is
    built ONCE (text-direct OPH banding — one Arrow pass over the corpus)
    and every subsequent delta join reads it bucket-aligned, so the big
    side never reshuffles — only the incoming batch's (id, band_key)
    pairs exchange (see ``test_band_index_join_reuses_buckets``).

    Size ``buckets`` with the corpus, not the default: the bucket-key
    pre-partition below gives one writer task and one file per bucket,
    so ``buckets`` bounds BOTH the write parallelism and the per-bucket
    file size.  The default 32 suits test-scale corpora; at the 100 TB
    corpus scale pick buckets ≈ index_bytes / target_file_size (e.g.
    512 MB files) so writers stay parallel and no single bucket file
    grows unboundedly — delta joins stay shuffle-free on the index side
    at any bucket count.
    """
    bands = minhash_band_keys_arrow_text(
        _parallelized(corpus), id_col, text_col, n, num_hashes, rows_per_band
    )
    # Pre-partition by the bucket key before the bucketed write:
    # ``repartition(n, col)`` and ``bucketBy(n, col)`` use the SAME
    # placement function (pmod(murmur3, n)), so each write task holds
    # exactly one bucket and writes exactly one file.  Without it every
    # map task writes a file per bucket it touches — M·buckets files at
    # scale (3.2M files for a 100k-task corpus scan), which the
    # delta-join's bucketed scan then pays for in listing and per-file
    # opens.  The exchange this adds carries only (id, band_key) proxy
    # rows, never text.  Measured (r14, interleaved 6-rep A/B at sf0.1):
    # build 2.18 → 1.88 median (−14%, parallel single-bucket writers vs
    # one task writing all 32 bucket files), delta join flat, identical
    # join output.
    (
        bands.repartition(buckets, "band_key")
        .write.mode("overwrite")
        .bucketBy(buckets, "band_key")
        .sortBy("band_key")
        .saveAsTable(table_name)
    )


def minhash_lsh_join_against_index(
    new: DataFrame,
    index: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    n: int = 3,
    num_hashes: int = 128,
    rows_per_band: int = 4,
) -> DataFrame:
    """Incremental near-dup join against a PREBUILT band index (see
    :func:`persist_band_index`): bands the delta only, equi-joins against
    the index, verifies candidates exactly.  Output contract identical to
    :func:`minhash_lsh_join_incremental` (pinned by
    ``test_band_index_join_matches_direct``)."""
    bn = minhash_band_keys_arrow_text(
        _parallelized(new), id_col, text_col, n, num_hashes, rows_per_band
    )
    candidates = (
        bn.select(F.col("id").alias("id_a"), "band_key")
        .join(index.select(F.col("id").alias("id_b"), "band_key"), "band_key")
        .select("id_a", "id_b")
        .distinct()
        .cache()
    )
    cand_a = candidates.select(F.col("id_a").alias("cid")).distinct()
    cand_b = candidates.select(F.col("id_b").alias("cid")).distinct()
    docs_a = new.join(F.broadcast(cand_a), F.col(id_col) == F.col("cid"), "left_semi")
    docs_b = corpus.join(
        F.broadcast(cand_b), F.col(id_col) == F.col("cid"), "left_semi"
    )
    # side-separated: each sets frame feeds exactly one join side, so an id
    # value shared by new and corpus can never cross-match (ADVICE r2).
    # JVM shingle fold for the verify sides: candidate doc sets are
    # small, where the Arrow crossing loses to the interpreted fold
    # (r15 interleaved 6-rep A/B at sf0.1 on the index delta join:
    # JVM 2.64 vs Arrow 2.75 median end-to-end — the driver's r14
    # delta-join regression flag).
    sets_a = _shingle_sets(docs_a, id_col, text_col, n)
    sets_b = _shingle_sets(docs_b, id_col, text_col, n)
    return _verify_jaccard_two_sided(candidates, sets_a, sets_b, threshold)


# ---------------------------------------------------------------------------
def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 10,
    min_count: int = 2,
    stride: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Exact repeated-substring detection at token-window granularity —
    the scalable analogue of suffix-array substring dedup (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    public): any substring of >= ``window`` tokens that appears >=
    ``min_count`` times in the corpus (across documents OR repeated
    within one) is covered by at least one duplicated rolling window, so
    flagging window hashes with total corpus count >= ``min_count`` finds
    every such span at window resolution.

    Emits per-doc (id, n_windows, n_dup_windows, dup_frac) — the
    remove/keep signal a curation pass thresholds on (C4/MassiveText drop
    documents with high duplicate-span mass).

    Plan shape (scales to 100 TB):
    - one tokenize per doc (bound behind a Generate barrier — the rolling
      windows reference the bound array per ELEMENT, which would
      otherwise re-tokenize per position), then one rolling-window hash
      array per doc: ``transform(sequence(...), i -> word_hash(concat_ws
      (' ', slice(tok, i+1, w))))`` — row-local, O(len·w) character work,
      same cost class as shingling (an Arrow/hashlib twin was measured
      ~1.6× SLOWER here — the token-array transfer outweighs the
      interpreted transform, unlike the shingle folds — so the JVM
      expression stays);
    - explode to (id, window_hash) — one row per token position, the
      inherent cost of substring-level dedup (a suffix array pays the
      same); the shuffle carries 8-byte hashes + ids, never text;
    - corpus counts per hash: map-side-combined aggregate partitioned by
      hash; duplicated hashes semi-join back to the exploded side on the
      SAME partitioning, then one per-doc count.  At production scale,
      set ``max_df`` to drop runaway boilerplate hashes (corpus count >
      ``max_df``) from the duplicated set — they dominate the semi-join
      match volume while carrying no curation signal beyond "boilerplate"
      (same df-cap trade as :func:`ngram_jaccard_join`; dup_frac then
      measures NON-boilerplate duplication) — and set ``stride`` > 1 (windows start
      every ``stride`` positions — a duplicated substring of >=
      ``window + stride - 1`` tokens is still guaranteed to contain an
      aligned window on one side; detection of shorter spans becomes
      alignment-dependent, the standard stride trade).

    Cache contract (ADVICE r4): the (id, window-hash array) frame is
    ``.cache()``d so its three consumers share one tokenize pass, and it
    stays in executor storage for the session — callers invoking this
    repeatedly (benchmarks, test loops) should ``spark.catalog.
    clearCache()`` (or unpersist) between invocations, the same contract
    the LSH band caches carry.
    """
    # sequence(0, -k) would count DOWN (and slice(_, 0, _) errors), so
    # short docs take the empty-array branch explicitly
    wh = (
        f"CASE WHEN size(__tok) >= {window} THEN "
        f"transform(sequence(0, size(__tok) - {window}, {stride}), "
        f"i -> cast(conv(substring(md5(concat_ws(' ', slice(__tok, i + 1, "
        f"{window}))), 1, 14), 16, 10) AS BIGINT)) "
        f"ELSE cast(array() AS array<bigint>) END"
    )
    # one tokenize + one window-hash pass per doc; the cached (id, hashes)
    # frame feeds all three consumers (corpus counts, semi-join, per-doc
    # window totals) — the text column never survives past this projection
    arr = (
        _parallelized(df)
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.array(tokens(F.col(text_col)))).alias("__tok"),
        )
        .select("id", F.expr(wh).alias("whs"))
        .cache()
    )
    win = arr.select("id", F.explode("whs").alias("h"))
    counts = win.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    dup_cond = F.col("cnt") >= min_count
    if max_df is not None:
        dup_cond = dup_cond & (F.col("cnt") <= max_df)
    dup = counts.filter(dup_cond).select("h")
    per_doc = (
        win.join(dup, "h", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    base = arr.select("id", F.size("whs").cast("long").alias("n_windows"))
    return (
        base.join(per_doc, "id", "left_outer")
        .select(
            "id",
            "n_windows",
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long").alias(
                "n_dup_windows"
            ),
            (
                F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("double")
                / F.greatest(F.col("n_windows"), F.lit(1))
            ).alias("dup_frac"),
        )
    )


def containment_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Asymmetric containment near-dup join (Broder 1997's containment
    coefficient, public): pairs where the SMALLER document's distinct
    k-gram shingle set is ≥ ``threshold`` contained in the larger's —
    ``cont = |S_a ∩ S_b| / min(|S_a|, |S_b|)``.  Catches the case plain
    Jaccard misses by construction: a short document embedded verbatim in
    a much longer one (wire story inside a page, quoted post inside a
    thread) has LOW Jaccard (union is dominated by the long side) but
    containment ≈ 1.

    Emits ``(id_a, id_b, cont)`` with ``id_a < id_b``.

    Plan shape (scales to 100 TB):
    - candidates come from the winnowing fingerprint index
      (:func:`~spark_sql_hbase_spark.operators.text.
      winnowing_fingerprints`): the self-join key is an 8-byte selected
      hash at ~2/(w+1) of k-gram density, never the full shingle
      inverted index — strictly cheaper than the exact
      :func:`ngram_jaccard_join` index by the winnowing density factor;
    - recall contract: a candidate requires one shared token run of
      ≥ k+w−1 tokens (the winnowing guarantee).  An embedded copy shares
      its whole length as one run, so containment-style duplication is
      exactly the case the guarantee covers; adversarially SCATTERED
      overlap (shared vocabulary, no shared runs) can be missed — by
      design, that is not containment;
    - verify is exact and candidate-only: the two (bounded) shingle
      arrays meet per pair, same as the LSH candidates-verify path.
    """
    from spark_sql_hbase_spark.operators.text import winnowing_fingerprints

    fps = winnowing_fingerprints(df, id_col, text_col, k=k, w=w)
    fa = fps.select(F.col("id").alias("id_a"), "fp")
    fb = fps.select(F.col("id").alias("id_b"), "fp")
    candidates = (
        fa.join(fb, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sets = shingle_sets_arrow(df, id_col, text_col, k)
    sa = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    denom = F.least(F.size("sh_a"), F.size("sh_b"))
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter.cast("double") / denom, 4).alias("cont"),
        )
        .filter(F.col("cont") >= threshold)
    )


def _norm_units_sql(text_col: str, min_tokens: int, split_re: str) -> str:
    """SQL expression: normalized qualifying text units of ``text_col``
    — split on ``split_re``, trimmed, lowercased, >= N words.  ONE
    normalization law parameterized by the unit boundary (r13 VERDICT
    item 6): sentences split on terminal punctuation
    (:func:`_norm_lines_sql`), paragraphs on blank-line/newline runs
    (:func:`_norm_paras_sql`)."""
    return (
        "filter(transform(split(lower({t}), '{re}'), "
        "x -> trim(x)), x -> x <> '' AND "
        "size(array_remove(split(x, '[^a-z0-9]+'), '')) >= {mt})"
    ).format(t=text_col, re=split_re, mt=min_tokens)


def _norm_lines_sql(text_col: str, min_line_tokens: int) -> str:
    """SQL expression: normalized qualifying sentences of ``text_col``
    — the ``[.!?]+`` unit law.  Shared by the detection
    (:func:`line_dedup_stats`) and transformation
    (:func:`strip_boilerplate_lines`) twins and the within-document
    repetition rules (``text.doc_repetition``) so the line law can
    never drift apart."""
    return _norm_units_sql(text_col, min_line_tokens, "[.!?]+")


def _norm_paras_sql(text_col: str, min_para_tokens: int) -> str:
    """SQL expression: normalized qualifying PARAGRAPHS of ``text_col``
    — the newline-run unit law (the published Gopher rules split
    paragraphs on line breaks; Rae et al. 2021 appendix A).  Same
    normalization as the sentence law, only the boundary differs."""
    return _norm_units_sql(text_col, min_para_tokens, "[\\\\r\\\\n]+")


#: SQL template: 56-bit md5 hash of a line expression (same law as
#: functions/texthash.word_hash) — shared by the z79/z80 twins.
_LINE_HASH_SQL = "cast(conv(substring(md5({x}), 1, 14), 16, 10) AS BIGINT)"


def line_dedup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 2,
    min_line_tokens: int = 3,
) -> DataFrame:
    """C4-style line-level duplicate detection (Raffel et al. 2020 §2.2,
    public: C4 deduplicates repeated lines/sentences across the corpus):
    sentences are split on terminal punctuation, normalized (lowercase,
    trimmed), hashed, and any sentence whose corpus count reaches
    ``min_count`` is flagged; per-doc stats report the duplicated-line
    mass a curation pass thresholds on.  Sentences shorter than
    ``min_line_tokens`` words are ignored (punctuation fragments and
    headers dominate otherwise — the C4 convention keeps lines with ≥ 3
    words).

    Emits ``(id, n_lines, n_dup_lines, dup_frac)`` for docs with ≥ 1
    qualifying line.

    Plan shape (scales to 100 TB): sentence split + normalize + hash are
    row-local; the explode emits one 8-byte hash per line (not per
    token — strictly cheaper than
    :func:`duplicate_spans`); corpus counts are one map-side-combined
    aggregate keyed by hash; flagged hashes semi-join back on the SAME
    partitioning; one per-doc rollup.  Text never survives past the
    hash projection.
    """
    norm = _norm_lines_sql(text_col, min_line_tokens)
    lh = f"transform({norm}, x -> {_LINE_HASH_SQL.format(x='x')})"
    # cached: three consumers (corpus counts, semi-join side, per-doc
    # totals) share one split+hash pass — same contract as
    # duplicate_spans (callers clearCache between repeated runs)
    arr = (
        _parallelized(df)
        .select(F.col(id_col).alias("id"), F.expr(lh).alias("lhs"))
        .cache()
    )
    lines = arr.select("id", F.explode("lhs").alias("h"))
    dup = (
        lines.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("h")
    )
    per_doc = (
        lines.join(dup, "h", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup_lines"))
    )
    base = arr.select("id", F.size("lhs").cast("long").alias("n_lines")).filter(
        F.col("n_lines") > 0
    )
    return base.join(per_doc, "id", "left_outer").select(
        "id",
        "n_lines",
        F.coalesce(F.col("n_dup_lines"), F.lit(0)).cast("long").alias(
            "n_dup_lines"
        ),
        (
            F.coalesce(F.col("n_dup_lines"), F.lit(0)).cast("double")
            / F.col("n_lines")
        ).alias("dup_frac"),
    )


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int = 5,
    min_line_tokens: int = 3,
) -> DataFrame:
    """The TRANSFORMATION twin of :func:`line_dedup_stats`: produce the
    cleaned corpus with corpus-frequent lines removed (document frequency
    > ``max_df`` — navigation chrome, cookie banners, boilerplate
    footers; the removal step C4-style pipelines run after detection).
    Reconstruction is over the NORMALIZED qualifying lines re-joined with
    ``'. '`` — the curation convention, not byte-identical source text.

    Emits ``(id, n_lines, n_kept, clean_text)`` for docs with ≥ 1
    qualifying line (``clean_text`` may be empty when everything was
    boilerplate).

    Plan shape (scales to 100 TB): the ONLY shuffle is the flagged-set
    aggregate, and it carries 8-byte hashes; the flagged lines (df >
    max_df) are BOUNDED by nature — boilerplate is few distinct strings
    repeated often — so they ride one packed broadcast row as a
    map<hash, true>, and the reconstruction is a row-local array filter
    with an exact map-membership test per line.  Document text NEVER
    enters an exchange: scan → filter → output, embarrassingly parallel
    (contrast: an explode + anti-join + re-agg shape would shuffle the
    whole corpus text twice).
    """
    norm = _norm_lines_sql(text_col, min_line_tokens)
    line_hash = _LINE_HASH_SQL
    # flagged-set pass: hashes only in the exchange; per-doc
    # array_distinct FIRST so the count is true DOCUMENT frequency — a
    # single document repeating its own (unique) line many times must
    # not push that line over the corpus df cap
    hashes = _parallelized(df).select(
        F.explode(
            F.expr(
                f"array_distinct(transform({norm}, "
                f"x -> {line_hash.format(x='x')}))"
            )
        ).alias("h")
    )
    flagged = (
        hashes.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > max_df)
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("h", F.lit(True).alias("v"))))
            ).alias("__fl")
        )
    )
    # reconstruction pass: bind the line array once (Generate barrier),
    # then one row-local filter against the broadcast flagged map —
    # map_contains_key on a NULL map (zero flagged lines) is NULL, so
    # coalesce keeps every line in that case
    keep = (
        f"filter(__ls, x -> NOT coalesce("
        f"map_contains_key(__fl, {line_hash.format(x='x')}), false))"
    )
    return (
        _parallelized(df)
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.array(F.expr(norm))).alias("__ls"),
        )
        .filter(F.size("__ls") > 0)
        .join(F.broadcast(flagged))
        .select(
            "id",
            F.size("__ls").cast("long").alias("n_lines"),
            F.expr(keep).alias("__kept"),
        )
        .select(
            "id",
            "n_lines",
            F.size("__kept").cast("long").alias("n_kept"),
            F.concat_ws(". ", F.col("__kept")).alias("clean_text"),
        )
    )


def lsh_collision_prob(s: float, bands: int, rows: int) -> float:
    """S-curve collision probability: chance two documents with Jaccard
    similarity ``s`` share at least one LSH band bucket under a
    (bands × rows) MinHash signature — ``1 − (1 − s^r)^b`` (the
    standard banding analysis, MMDS ch. 3)."""
    return 1.0 - (1.0 - s ** rows) ** bands


def lsh_plan(n_perm: int, threshold: float) -> dict:
    """Pick the (bands, rows) split of an ``n_perm``-hash MinHash
    signature whose S-curve midpoint best matches the target Jaccard
    ``threshold`` — the knob every LSH deployment turns before anything
    runs: more rows per band → the curve's rise moves right (fewer
    false candidates, more misses), more bands → left.

    Driver-side pure math over the divisors of ``n_perm`` (the
    signature is fixed storage; only its factorization is free).
    Returns ``{bands, rows, threshold_at_plan, p_at_threshold}`` where
    ``threshold_at_plan`` is the midpoint approximation
    ``(1/b)^(1/r)`` and ``p_at_threshold`` the exact S-curve value at
    the target.  Candidate-verification downstream stays exact
    (``minhash_lsh_join`` verifies candidates), so the plan trades
    COST, never correctness."""
    if n_perm <= 0:
        raise ValueError(f"n_perm must be positive, got {n_perm}")
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    best = None
    for rows in range(1, n_perm + 1):
        if n_perm % rows:
            continue
        bands = n_perm // rows
        mid = (1.0 / bands) ** (1.0 / rows)
        # deterministic tiebreak: prefer the smaller rows (cheaper
        # signatures to compare) at equal midpoint distance
        key = (abs(mid - threshold), rows)
        if best is None or key < best[0]:
            best = (key, bands, rows, mid)
    _, bands, rows, mid = best
    return {
        "bands": bands,
        "rows": rows,
        "threshold_at_plan": round(mid, 6),
        "p_at_threshold": round(lsh_collision_prob(threshold, bands, rows), 6),
    }
