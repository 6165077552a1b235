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


def _seq_dot_np(mat, vec):
    """Sequential-order dot products of every row of ``mat`` with ``vec``,
    bit-identical to the JVM ``aggregate`` fold in :func:`dot`:
    ``((0.0 + p0) + p1) + ...``.  ``np.cumsum`` accumulates strictly left
    to right (and IEEE ``0.0 + p0 == p0``), so taking the last prefix sum
    reproduces the fold's rounding exactly — unlike ``np.dot``/``np.sum``,
    whose pairwise/SIMD summation associates differently."""
    import numpy as np

    return np.cumsum(mat * vec, axis=1)[:, -1]


def _seq_sq_norm_np(mat):
    """Row-wise sequential sum of squares (see :func:`_seq_dot_np`)."""
    import numpy as np

    return np.cumsum(mat * mat, axis=1)[:, -1]


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query vector (broadcast queries).

    Returns (query_id, neighbor_id, cos, rank). Self-matches excluded.

    Scoring runs vectorized in ONE Arrow pass over the corpus: the
    (bounded, by contract broadcastable) query set is collected and
    closed over, each corpus partition scores all queries with numpy, and
    only the (query_id, neighbor_id, cos_raw) triples come back — the
    corpus vectors cross into Python once, never into a join. Cosines are
    BIT-IDENTICAL to the JVM ``zip_with``/``aggregate`` fold
    (:func:`cosine_topk_jvm`, pinned by
    ``test_cosine_topk_arrow_matches_jvm``): sequential-order prefix-sum
    dots, double widening, same divide — the fold interpreted
    O(|corpus|·|queries|·dim) lambda steps and dominated this operator.
    """
    import pandas as pd

    # bounded by the operator contract (broadcast query set); the
    # not-null filters mirror the join condition's null semantics
    # (``neighbor_id != query_id`` is NULL — row excluded — when either
    # id is NULL)
    q_rows = (
        queries.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv"))
        .collect()
    )
    id_type = corpus.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[id_col].dataType.simpleString()

    def gen(batches):
        import numpy as np

        qids = [r["query_id"] for r in q_rows]
        qvs = [
            np.asarray(r["qv"], dtype=np.float64) if r["qv"] is not None else None
            for r in q_rows
        ]
        qns = [
            np.sqrt(np.cumsum(v * v)[-1]) if v is not None and len(v) else None
            for v in qvs
        ]
        for pdf in batches:
            nids = pdf["neighbor_id"].to_numpy()
            vec_list = list(pdf["cv"])
            ok = np.array([v is not None for v in vec_list], dtype=bool)
            if ok.any():
                C = np.asarray(
                    [v for v, o in zip(vec_list, ok) if o], dtype=np.float64
                )
                cn = np.sqrt(_seq_sq_norm_np(C))
            out_id, out_nid, out_cos = [], [], []
            for qid, qv, qn in zip(qids, qvs, qns):
                keep = nids != qid  # self-match excluded, as in the join
                if qv is None or qn is None:
                    cos = np.full(len(nids), None, dtype=object)
                else:
                    cos = np.full(len(nids), None, dtype=object)
                    if ok.any():
                        with np.errstate(divide="ignore", invalid="ignore"):
                            c_ok = _seq_dot_np(C, qv) / (qn * cn)
                        cos[ok] = c_ok
                out_id.extend([qid] * int(keep.sum()))
                out_nid.extend(nids[keep])
                out_cos.extend(cos[keep])
            yield pd.DataFrame(
                {"query_id": out_id, "neighbor_id": out_nid, "cos_raw": out_cos}
            )

    scored = (
        corpus.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv"))
        .mapInPandas(gen, f"query_id {qid_type}, neighbor_id {id_type}, cos_raw double")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_raw", 4).alias("cos"), "rank")
    )


def cosine_topk_jvm(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Pure-JVM expression twin of :func:`cosine_topk` (no Python workers
    in the plan; interpreted HOF dot products) — kept as the no-Python
    fallback and the parity anchor for the Arrow scoring path."""
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


def hyperplanes(dim: int, nbits: int, seed: int = 7) -> list[list[float]]:
    """Fixed pseudo-random hyperplanes for sign-LSH (deterministic across
    engines: plain Python RNG, 6-decimal literals)."""
    import random

    rng = random.Random(seed)
    return [
        [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)] for _ in range(nbits)
    ]


def signlsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = [dot(vec, h_i) >= 0]. 2^nbits coarse
    cells computed from the vector itself — the learned-quantizer-free
    IVF analogue (same plan shape: equi-join on the cell id)."""
    bucket = F.lit(0)
    for i, h in enumerate(planes):
        dot_i = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(x) for x in h]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot_i >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def signlsh_bucket_sql(vec_expr: str, planes: list[list[float]]) -> str:
    """DuckDB twin of :func:`signlsh_bucket`."""
    terms = []
    for i, h in enumerate(planes):
        lits = ", ".join(repr(x) for x in h)
        terms.append(
            f"(CASE WHEN list_inner_product({vec_expr}, [{lits}]) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nbits: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Sign-LSH bucketed ANN: score only candidates in the query's bucket.

    Unlike :func:`partitioned_ann_topk` (precomputed cell column), the
    coarse cell here is derived from the vector itself, so this works on
    any embedding table. At scale the bucket id is materialized at ingest
    and the table is partitioned by it → bucket probes become partition-
    pruned scans; nprobe>1 = probing the Hamming-adjacent buckets.
    """
    planes = hyperplanes(dim, nbits)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("qv"),
    ).withColumn("bucket", signlsh_bucket(F.col("qv"), planes))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("cv"),
    ).withColumn("bucket", signlsh_bucket(F.col("cv"), planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", "bucket",
            cosine(F.col("qv"), F.col("cv")).alias("cos_raw"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("bucket").cast("int").alias("bucket"),
            F.round("cos_raw", 4).alias("cos"), "rank",
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


def squared_l2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _spark_round_half_up(values, round_to: int):
    """Bit-exact replica of Spark's ``round(double, n)`` for a 1-D float64
    array: Spark evaluates ``BigDecimal.valueOf(x).setScale(n, HALF_UP)``,
    i.e. HALF_UP decimal rounding of the SHORTEST decimal string that
    round-trips to ``x`` (``Double.toString``) — which is exactly what
    ``Decimal(repr(x))`` parses in Python, so the two agree digit for
    digit (pinned by the assign/encode parity tests on real data)."""
    import decimal

    import numpy as np

    q = decimal.Decimal(1).scaleb(-round_to)
    return np.fromiter(
        (
            float(decimal.Decimal(repr(v)).quantize(q, rounding=decimal.ROUND_HALF_UP))
            for v in values.tolist()
        ),
        dtype=np.float64,
        count=len(values),
    )


def _argmin_rounded_np(E, model_vecs, round_to: int):
    """Per-row argmin over rounded sequential-order squared-L2 distances
    against the (key-sorted) model — the numpy twin of
    :func:`_nearest`'s ``array_min`` over ``struct(round(d2), key)``.

    ``E``: (N × dim) float64 rows; ``model_vecs``: list of C float64
    vectors in ASCENDING key order.  Distances accumulate strictly left
    to right (``np.cumsum`` — the same FP association as the JVM
    ``aggregate`` fold), are rounded with Spark's HALF_UP rule, and ties
    resolve to the FIRST (lowest-key) column, matching the struct
    comparison.  NaN distances (degenerate inputs) sort last, as NaN
    does in Spark's double ordering."""
    import numpy as np

    n = len(E)
    R = np.empty((n, len(model_vecs)), dtype=np.float64)
    for j, cv in enumerate(model_vecs):
        d = E - cv
        R[:, j] = _spark_round_half_up(np.cumsum(d * d, axis=1)[:, -1], round_to)
    R = np.where(np.isnan(R), np.inf, R)  # NaN orders last (Spark semantics)
    return np.argmin(R, axis=1)


def _packed_model(model: DataFrame, key: str, vec: str = "cv") -> DataFrame:
    """Fold a small model relation into ONE row carrying
    ``__model: array<struct<{key}, {vec}>>`` sorted by key — broadcast
    this row and the whole model becomes a single column VALUE on every
    task (plan data, not expression nodes), so a per-corpus-row argmin
    over it is one ``transform`` + ``array_min`` with O(1) plan size in
    the model dimensions and NO corpus explosion (the cross join is
    against one row)."""
    return model.agg(
        F.array_sort(F.collect_list(F.struct(key, vec))).alias("__model")
    )


def _nearest(ev: Column, key: str, round_to: int = 6) -> Column:
    """argmin_{entry ∈ __model} rounded-d2(ev, entry.cv), deterministic
    tiebreak on the entry key — the packed-model twin of the old literal
    candidate array (same rounding, same struct comparison order)."""
    cands = F.transform(
        F.col("__model"),
        lambda c: F.struct(
            F.round(squared_l2(ev, c["cv"]), round_to).alias("d2"),
            c[key].alias(key),
        ),
    )
    return F.array_min(cands)[key]


def kmeans_step(
    vectors: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """One Lloyd iteration: assign every vector to its nearest centroid
    (squared L2, deterministic tiebreak on cluster_id), recompute
    centroids. This is the index-construction primitive behind a real IVF
    quantizer — iterate to convergence by feeding the output back in.

    ``centroids``: (cluster_id, cv: array<double>) — small, broadcast —
    or the driver-side ``[(cluster_id, cv)]`` list (already-collected
    model state, what :func:`kmeans`/:func:`kmeans_centroids` hold
    between iterations).  Returns long-format (cluster_id, dim,
    centroid, n_members): one row per centroid dimension — scalar
    columns, so the result is hashable/oracle-comparable (no array
    cells).

    Scale shape: assignment is a broadcast nested-loop over K centroids —
    O(n·K·dim) compute, NO shuffle of vectors; the only exchange is the
    map-side-combined per-(cluster, dim) average, whose cardinality is
    K·dim regardless of corpus size. Distances are rounded before the
    argmin so the assignment decision is reproducible cross-engine.
    Round 5: the centroids ride as ONE packed broadcast row (see
    :func:`_packed_model`) instead of plan literals, so the plan stays
    compilable at production K·dim and the model is never collected to
    the driver here.  Round 14: a LIST model routes assignment through
    :func:`assign_cells`' vectorized Arrow argmin (same rounded-distance
    / lowest-key law, pinned by ``test_kmeans_step_list_matches_df``)
    instead of the O(K·dim) interpreted fold per row; the averaging
    aggregate is unchanged in both forms.
    """
    v = vectors.select(
        F.col(id_col).alias("vid"), _to_double(F.col(vec_col)).alias("ev")
    )
    if not isinstance(centroids, DataFrame):
        assigned = assign_cells(
            v, centroids, "vid", "ev", "cluster_id", round_to
        ).select("cluster_id", "ev")
    else:
        packed = _packed_model(
            centroids.select(F.col("cluster_id"), F.col("cv")), "cluster_id"
        )
        assigned = v.crossJoin(F.broadcast(packed)).select(
            _nearest(F.col("ev"), "cluster_id", round_to).alias("cluster_id"),
            "ev",
        )
    dims = assigned.select(
        "cluster_id", F.posexplode("ev").alias("pos", "val")
    )
    return dims.groupBy("cluster_id", (F.col("pos") + 1).cast("int").alias("dim")).agg(
        F.round(F.avg("val"), round_to).alias("centroid"),
        F.count(F.lit(1)).alias("n_members"),
    )


def kmeans(
    vectors: DataFrame,
    k: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Iterated Lloyd: k deterministic seeds (lowest ids), ``n_iter``
    steps of :func:`kmeans_step`. Returns the final long-format
    centroids.

    The driver loop carries MODEL STATE only (K·dim floats collected per
    round); the data passes never loop — each iteration is one scan +
    one K·dim aggregation, the same shape Spark MLlib's KMeans executes
    per step. Empty clusters keep their previous centroid (standard
    Lloyd convention).  Exactly ``n_iter`` Lloyd updates run in total:
    ``n_iter - 1`` driver-collected refinements plus the final
    distributed :func:`kmeans_step` whose output is returned (ADVICE r2:
    the loop previously ran the full ``n_iter`` before the final step,
    i.e. one extra iteration).

    Scale guidance (VERDICT r7): the collected state is bounded at
    K·dim, which is fine up to a few thousand centroids, but the
    literal-centroid plan this loop feeds ``assign_cells`` bloats when
    K reaches the tens of thousands (real IVF coarse quantizers at
    100 TB).  Large-K users should train through
    :func:`persist_ivfpq_model` instead — it keeps the model as
    broadcast-joined RELATIONS, never driver literals."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    # k lowest ids, whatever the id type — filter(id < k) would under-seed
    # 1-based ids and break entirely on string ids
    cent = (
        vectors.orderBy(F.col(id_col))
        .limit(k)
        .select(
            F.col(id_col).alias("cluster_id"), _to_double(F.col(vec_col)).alias("cv")
        )
    )
    # Driver-side model state rides back into every step as a LIST, so
    # assignment takes the Arrow argmin fast path (round 14) instead of
    # re-materializing a LocalRelation + interpreted packed-model fold
    # per iteration.
    prev = {r["cluster_id"]: list(r["cv"]) for r in cent.collect()}
    for _ in range(n_iter - 1):
        step = kmeans_step(vectors, sorted(prev.items()), id_col, vec_col)
        rows = step.collect()
        new = dict(prev)
        by_cluster: dict = {}
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], []).append((r["dim"], r["centroid"]))
        for cid, dims in by_cluster.items():
            new[cid] = [v for _, v in sorted(dims)]
        prev = new
    return kmeans_step(vectors, sorted(prev.items()), id_col, vec_col)


def kmeans_centroids(
    vectors: DataFrame,
    k: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple]:
    """The full trained centroid list ``[(cluster_id, cv)]`` after
    ``n_iter`` Lloyd updates — INCLUDING clusters that end up empty at
    the final step, which retain their previous centroid (the documented
    Lloyd convention).  This is the model-state twin of :func:`kmeans`:
    same seeds, same update sequence, but the driver-side state dict is
    overlaid with each step's output rather than rebuilt from it, so a
    cluster with no members on the last iteration does not silently
    disappear (ADVICE r4: ``ivfpq_train`` built its coarse quantizer
    from :func:`kmeans`'s final-step OUTPUT and could train fewer than
    ``n_cells`` cells)."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    seeds = (
        vectors.orderBy(F.col(id_col))
        .limit(k)
        .select(
            F.col(id_col).alias("cluster_id"), _to_double(F.col(vec_col)).alias("cv")
        )
    )
    prev = {r["cluster_id"]: list(r["cv"]) for r in seeds.collect()}
    for _ in range(n_iter):
        # list-form state → Arrow argmin assignment (round 14), same
        # step output as the relation form (parity-pinned)
        by_cluster: dict = {}
        for r in kmeans_step(
            vectors, sorted(prev.items()), id_col, vec_col
        ).collect():
            by_cluster.setdefault(r["cluster_id"], []).append((r["dim"], r["centroid"]))
        for cid, dims in by_cluster.items():
            prev[cid] = [v for _, v in sorted(dims)]
    return [(cid, cv) for cid, cv in sorted(prev.items())]


def assign_cells(
    vectors: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    round_to: int = 6,
) -> DataFrame:
    """Assign each vector to its nearest centroid cell (rounded squared-L2
    argmin, deterministic tiebreak on cell id) — the IVF index-BUILD step
    pairing with :func:`multiprobe_ann_topk`'s search step.

    ``centroids``: ``[(cell_id, vector)]`` or a (cell, cv) DataFrame.
    Same scale shape as :func:`kmeans_step` assignment — round 5: the
    quantizer rides as ONE packed broadcast row (:func:`_packed_model`)
    instead of plan literals, so index BUILD stays compilable at
    production C·dim (the search side got the same treatment; a literal
    model made both sides uncompilable at C=4096).  Still no shuffle and
    no corpus explosion: the cross join is against a single row.

    When the quantizer arrives as a DRIVER-SIDE LIST (already
    materialized model state), assignment instead runs vectorized in one
    Arrow pass — numpy distances in the JVM fold's exact FP order,
    Spark's exact HALF_UP rounding, first-column (= lowest-key) argmin —
    assignments identical to the expression path (pinned by
    ``test_assign_cells_arrow_matches_jvm``), without the O(C·dim)
    interpreted lambda steps per row.  DataFrame models keep the
    broadcast-relation path: the model is plan data and is never
    collected to the driver."""
    if not isinstance(centroids, DataFrame):
        import pandas as pd
        import numpy as np

        from pyspark.sql import types as T

        ordered = sorted(centroids, key=lambda t: t[0])
        keys = [cid for cid, _ in ordered]
        vecs = [np.asarray(cv, dtype=np.float64) for _, cv in ordered]
        cell_type = T.StringType() if isinstance(keys[0], str) else T.LongType()
        out_schema = T.StructType(
            list(vectors.schema.fields) + [T.StructField(cell_col, cell_type)]
        )

        def gen(batches):
            karr = np.asarray(keys, dtype=object)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                E = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                idx = _argmin_rounded_np(E, vecs, round_to)
                yield pdf.assign(**{cell_col: karr[idx]})

        return vectors.mapInPandas(gen, out_schema)
    cent = _centroid_relation(vectors.sparkSession, centroids)
    packed = _packed_model(cent, "cell")
    v = vectors.withColumn("__ev", _to_double(F.col(vec_col)))
    return (
        v.crossJoin(F.broadcast(packed))
        .withColumn(cell_col, _nearest(F.col("__ev"), "cell", round_to))
        .drop("__ev", "__model")
    )


def _centroid_relation(spark, centroids) -> DataFrame:
    """Normalize quantizer model state to a (cell, cv: array<double>)
    relation.  Accepts either the driver-side ``[(cell_id, vector)]``
    list (converted to a LocalRelation — DATA in the plan, not
    expression nodes, so plan size and codegen stay O(1) in C·dim) or an
    already-built DataFrame (the production path: the model read straight
    from parquet, never materialized on the driver)."""
    if isinstance(centroids, DataFrame):
        return centroids.select("cell", "cv")
    cid_type = "string" if isinstance(centroids[0][0], str) else "bigint"
    return spark.createDataFrame(
        [(cid, [float(x) for x in cv]) for cid, cv in centroids],
        f"cell {cid_type}, cv array<double>",
    )


def _codebook_relation(spark, codebooks) -> DataFrame:
    """Normalize PQ codebooks to a (s, code, cv: array<double>) relation
    — one row per (subspace, code).  Same contract as
    :func:`_centroid_relation`: list → LocalRelation, DataFrame →
    pass-through."""
    if isinstance(codebooks, DataFrame):
        return codebooks.select("s", "code", "cv")
    rows = [
        (s, int(code), [float(x) for x in cv])
        for s, book in enumerate(codebooks)
        for code, cv in book
    ]
    return spark.createDataFrame(rows, "s int, code int, cv array<double>")


def _subdim(codebooks, books: DataFrame) -> int:
    """Subspace width: free from the list form, one tiny lookup from the
    relation form."""
    if isinstance(codebooks, DataFrame):
        return int(books.select(F.size("cv").alias("n")).first()["n"])
    return len(codebooks[0][0][1])


def _n_subspaces(codebooks, books: DataFrame) -> int:
    """Subspace count m: free from the list form, one tiny aggregate
    from the relation form."""
    if isinstance(codebooks, DataFrame):
        return int(books.agg(F.countDistinct("s").alias("m")).first()["m"])
    return len(codebooks)


def _probe_cells(
    queries_qv: DataFrame,
    cent: DataFrame,
    nprobe: int,
    carry_cv: bool = False,
    round_to: int = 6,
) -> DataFrame:
    """nprobe nearest coarse cells per query: rounded-d2 ``array_sort``
    over the packed centroid model (struct comparison falls through
    (d2, cell); cells are unique so the optional cv field is never
    compared), sliced to nprobe (clamps when nprobe > C) and exploded —
    a pure ROW-LOCAL projection per query against the one-row broadcast
    model, no ranking window, no exchange.  Input must carry (query_id,
    __qv); output carries (query_id, __qv, cell[, cv])."""
    packed = _packed_model(cent, "cell")
    cand = F.transform(
        F.col("__model"),
        lambda c: F.struct(
            F.round(squared_l2(F.col("__qv"), c["cv"]), round_to).alias("d2"),
            c["cell"].alias("cell"),
            *([c["cv"].alias("cv")] if carry_cv else []),
        ),
    )
    probed = queries_qv.crossJoin(F.broadcast(packed)).select(
        "query_id",
        "__qv",
        F.explode(F.slice(F.array_sort(cand), 1, nprobe)).alias("__probe"),
    )
    cols = [
        F.col("query_id"),
        F.col("__qv"),
        F.col("__probe.cell").alias("cell"),
    ]
    if carry_cv:
        cols.append(F.col("__probe.cv").alias("cv"))
    return probed.select(*cols)


def multiprobe_ann_topk(
    corpus_with_cells: DataFrame,
    queries: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search with multi-probe: each query visits its ``nprobe``
    nearest cells instead of one, recovering most of the recall a
    single-probe search loses at cell boundaries.

    ``centroids``: the learned quantizer (e.g. from :func:`kmeans`) as
    either ``[(cell_id, vector)]`` or a (cell, cv) DataFrame — carried as
    a small BROADCAST RELATION, not plan literals (round 5: the literal
    form grew O(C·dim) expression nodes, stalling plan compilation at
    production C — the model is data, so it rides a LocalRelation /
    parquet scan instead).  Probe selection is a ROW-LOCAL array_sort
    over the packed model per query (no ranking window, no exchange);
    the probed (query, cell) pairs multiply only the query side
    ``nprobe``×, never the corpus: scan cost is nprobe/|cells| of the
    corpus per query batch.
    """
    cent = _centroid_relation(queries.sparkSession, centroids)
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("__qv")
    )
    probes = _probe_cells(q, cent, nprobe).select(
        "query_id", F.col("__qv").alias("qv"), "cell"
    )
    c = corpus_with_cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col).alias("cell"),
        _to_double(F.col(vec_col)).alias("cv"),
    )
    scored = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_raw"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_raw", 4).alias("cos"), "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (Jegou, Douze, Schmid, "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011 — public): split each vector into m
# subvectors, quantize each subspace against its own ksub-entry codebook,
# search with asymmetric distance (query stays exact, corpus is codes).
# The 100 TB story: a 64-float vector becomes m small ints — the candidate
# scan reads ~16x less data, and the per-query work is m table lookups per
# corpus row instead of a dim-length dot product.  Compose with
# assign_cells/multiprobe_ann_topk for IVF-PQ (cell-pruned candidate set).
# ---------------------------------------------------------------------------
def pq_encode(
    vectors: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    extra_cols: tuple = (),
) -> DataFrame:
    """Encode vectors as PQ codes: (id, codes array<int>), one code per
    subspace, nearest codebook entry by rounded squared-L2 with
    deterministic code-id tiebreak (same argmin rule as
    :func:`assign_cells`).

    ``codebooks``: ``[[(code, subvector)]]`` (codes in each book must be
    the dense range 0..ksub-1, what :func:`pq_train` produces, so ADC
    tables can be array-indexed) or a (s, code, cv) DataFrame.  Round 5:
    the books ride as ONE packed broadcast row — m·ksub·subdim doubles
    of plan DATA with O(m) expression nodes, where the literal form's
    O(m·ksub·subdim) nodes made encode uncompilable at production
    model sizes.  Encoding stays one row-local projection per corpus
    row: no shuffle, no corpus explosion.

    ``extra_cols`` pass through unchanged (e.g. the coarse ``cell``
    column for the IVFADC composition, :func:`ivfadc_ann_topk`).
    """
    books = _codebook_relation(vectors.sparkSession, codebooks)
    sub = _subdim(codebooks, books)
    m = _n_subspaces(codebooks, books)
    if not isinstance(codebooks, DataFrame):
        for book in codebooks:
            assert [c for c, _ in book] == list(range(len(book))), (
                "codebook codes must be dense 0..ksub-1"
            )
        # Driver-side books: encode vectorized in one Arrow pass (same
        # rounded-argmin law as the packed-expression path — sequential
        # FP order, HALF_UP rounding, lowest-code ties; pinned by
        # ``test_pq_encode_arrow_matches_jvm``).  DataFrame books keep
        # the broadcast-relation path (model never driver-collected).
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        book_vecs = [
            [np.asarray(cv, dtype=np.float64) for _, cv in book]
            for book in codebooks
        ]
        id_field = vectors.schema[id_col]
        extra_fields = [vectors.schema[c] for c in extra_cols]
        out_schema = T.StructType(
            [T.StructField("id", id_field.dataType)]
            + list(extra_fields)
            + [T.StructField("codes", T.ArrayType(T.IntegerType()))]
        )
        cols = [id_col, *extra_cols, vec_col]

        def gen(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                E = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                code_mat = np.empty((len(E), m), dtype=np.int32)
                for s in range(m):
                    code_mat[:, s] = _argmin_rounded_np(
                        E[:, s * sub : (s + 1) * sub], book_vecs[s], round_to
                    )
                out = {"id": pdf[id_col].to_numpy()}
                for c in extra_cols:
                    out[c] = pdf[c].to_numpy()
                out["codes"] = list(code_mat)
                yield pd.DataFrame(out)

        return vectors.select(*cols).mapInPandas(gen, out_schema)
    packed = books.agg(
        F.array_sort(F.collect_list(F.struct("s", "code", "cv"))).alias("__books")
    )
    v = vectors.withColumn("__ev", _to_double(F.col(vec_col)))
    code_cols = []
    for s in range(m):
        cand = F.transform(
            F.filter("__books", lambda b: b["s"] == F.lit(s)),
            lambda b: F.struct(
                F.round(
                    squared_l2(F.slice(F.col("__ev"), s * sub + 1, sub), b["cv"]),
                    round_to,
                ).alias("d2"),
                b["code"].alias("code"),
            ),
        )
        code_cols.append(F.array_min(cand)["code"])
    return v.crossJoin(F.broadcast(packed)).select(
        F.col(id_col).alias("id"),
        *extra_cols,
        F.array(*code_cols).alias("codes"),
    )


def _distance_tables(
    probed: DataFrame, books: DataFrame, sub: int, m: int
) -> DataFrame:
    """Per-(query row) ADC distance tables from the packed codebook
    model: one row-local projection computes ``__tabs:
    array<array<double>>`` — for each of the ``m`` subspaces, the ksub
    rounded d2 values in code order (the pack is sorted by (s, code) and
    ``filter`` preserves order) — from COLUMNS, not literals, against
    the one-row broadcast model.  No join fan-out, no aggregation, no
    exchange: the query side stays shuffle-free end to end.  ``probed``
    must carry ``__qr`` (the exact query vector, raw or residual); all
    other columns are preserved."""
    keys = [c for c in probed.columns if c != "__qr"]
    packed = books.agg(
        F.array_sort(F.collect_list(F.struct("s", "code", "cv"))).alias("__books")
    )

    def tab(s: int):
        return F.transform(
            F.filter("__books", lambda b: b["s"] == F.lit(s)),
            lambda b: F.round(
                squared_l2(F.slice(F.col("__qr"), s * sub + 1, sub), b["cv"]), 6
            ),
        )

    return probed.crossJoin(F.broadcast(packed)).select(
        *keys, F.array(*[tab(s) for s in range(m)]).alias("__tabs")
    )


def _adc(tabs: Column, codes: Column, m: int | None = None) -> Column:
    """ADC lookup-sum: Σ_s tabs[s][codes[s]] — a left fold in subspace
    order (the same fixed summation order as the literal-table form, so
    results are bit-identical).

    Round 14: when the caller knows the subspace count ``m`` (every ADC
    search entry point computes it from the model), the fold UNROLLS to
    a chain of codegen'd ``element_at`` lookups with the identical
    ``((0.0 + x_0) + x_1) + …`` association — same doubles, no
    interpreted higher-order-function evaluation per scored corpus row
    (guide §4.1: built-in codegen over interpreted HOF)."""
    if m is not None:
        acc: Column = F.lit(0.0)
        for s in range(m):
            acc = acc + F.element_at(
                F.element_at(tabs, s + 1), F.element_at(codes, s + 1) + 1
            )
        return acc
    return F.aggregate(
        F.zip_with(tabs, codes, lambda t, c: F.element_at(t, c + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_ann_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: per query, one distance
    table per subspace (ksub rounded d2 entries, computed ONCE on the
    broadcast query side), then every corpus row costs m array lookups +
    a fixed-order m-term sum.  Returns (query_id, neighbor_id, adc,
    rank), adc ascending, deterministic neighbor tiebreak.

    ``codes``: output of :func:`pq_encode`.  The corpus vectors
    themselves are never read — that is the point.  ``codebooks``:
    ``[[(code, subvector)]]`` or a (s, code, cv) DataFrame — a broadcast
    model RELATION, not plan literals (round 5; see
    :func:`_codebook_relation`), so plan compilation stays O(1) as
    m·ksub·sub grows.
    """
    books = _codebook_relation(queries.sparkSession, codebooks)
    sub = _subdim(codebooks, books)
    m = _n_subspaces(codebooks, books)
    qt = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("__qr")
    )
    tabs = _distance_tables(qt, books, sub, m)
    scored = (
        codes.crossJoin(F.broadcast(tabs))
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(_adc(F.col("__tabs"), F.col("codes"), m), round_to).alias("adc"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("adc"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )


def residualize(
    vectors: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Assign each vector to its nearest coarse cell and subtract that
    cell's centroid: (id_col, cell, vec_col := x - c(cell)) — the encode
    preprocessing for RESIDUAL product quantization (IVFADC proper,
    Jegou et al. 2011 §IV.B: residuals have far less energy than raw
    vectors, so the same m×ksub code budget quantizes them much finer).

    ``centroids``: ``[(cell_id, vector)]`` or a (cell, cv) DataFrame.
    Round 5: the centroid lookup is a broadcast equi-join on the cell id
    (the literal create_map form grew O(C·dim) plan nodes) — corpus side
    never shuffles, the join build side is the C-row model relation.
    Round 14: a driver-side LIST model fuses assignment and subtraction
    into ONE Arrow pass (guide §4.1) — the same `_argmin_rounded_np`
    assignment law as :func:`assign_cells` plus an IEEE-identical
    float64 subtraction, so output equals the join form bit-for-bit
    (pinned by ``test_residualize_list_matches_df``); the join, its
    broadcast build, and the interpreted per-row ``zip_with`` disappear.
    DataFrame models keep the broadcast-join path (model never
    driver-collected).
    """
    if not isinstance(centroids, DataFrame):
        import numpy as np
        import pandas as pd

        from pyspark.sql import types as T

        ordered = sorted(centroids, key=lambda t: t[0])
        keys = np.asarray([cid for cid, _ in ordered], dtype=object)
        vecs = [np.asarray(cv, dtype=np.float64) for _, cv in ordered]
        cmat = np.asarray(vecs)
        cell_type = T.StringType() if isinstance(keys[0], str) else T.LongType()
        # same output shape as the join form: cell first, then the input
        # columns with vec_col replaced by the (double) residual
        out_schema = T.StructType(
            [T.StructField(cell_col, cell_type)]
            + [
                T.StructField(f.name, T.ArrayType(T.DoubleType()))
                if f.name == vec_col
                else f
                for f in vectors.schema.fields
            ]
        )

        def gen(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                E = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                idx = _argmin_rounded_np(E, vecs, 6)
                R = E - cmat[idx]
                yield pdf.assign(**{vec_col: list(R), cell_col: keys[idx]})

        return vectors.mapInPandas(gen, out_schema)
    cent = _centroid_relation(vectors.sparkSession, centroids)
    assigned = assign_cells(vectors, centroids, id_col, vec_col, cell_col)
    resid = F.zip_with(
        _to_double(F.col(vec_col)), F.col("__ccv"), lambda x, c: x - c
    )
    return (
        assigned.join(
            F.broadcast(cent.select(F.col("cell").alias(cell_col),
                                    F.col("cv").alias("__ccv"))),
            cell_col,
        )
        .withColumn(vec_col, resid)
        .drop("__ccv")
    )


def ivfpq_index_codes(
    vectors: DataFrame,
    centroids,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    residual: bool = False,
    round_to: int = 6,
) -> DataFrame:
    """The IVF-PQ index build — coarse-cell assignment, optional
    residualization, PQ encode — emitting ``(id, cell, codes)``, the
    exact relation :func:`ivfadc_ann_topk` consumes.

    Semantically identical to the composition
    ``pq_encode((residualize | assign_cells)(vectors, centroids),
    codebooks, extra_cols=(cell_col,))`` — and that composition IS the
    execution path whenever either model arrives as a DataFrame (the
    production convention: model read from parquet, never collected).
    When BOTH models are driver-side lists, the three steps fuse into
    ONE Arrow pass over the corpus (guide §4.1): a single JVM→Python
    crossing and a single corpus scan instead of two chained
    ``mapInPandas`` stages (plus, for the residual form, a broadcast
    join and an interpreted per-row subtraction between them).  Each
    step replays the identical law of its unfused twin
    (`_argmin_rounded_np` assignment/encode, IEEE float64 residual), so
    output is bit-identical — pinned by
    ``test_ivfpq_index_codes_matches_composition``."""
    if isinstance(centroids, DataFrame) or isinstance(codebooks, DataFrame):
        enc_in = (
            residualize(vectors, centroids, id_col, vec_col, cell_col)
            if residual
            else assign_cells(vectors, centroids, id_col, vec_col, cell_col,
                              round_to)
        )
        return pq_encode(
            enc_in, codebooks, id_col, vec_col, round_to,
            extra_cols=(cell_col,),
        )
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    for book in codebooks:
        assert [c for c, _ in book] == list(range(len(book))), (
            "codebook codes must be dense 0..ksub-1"
        )
    ordered = sorted(centroids, key=lambda t: t[0])
    ckeys = np.asarray([cid for cid, _ in ordered], dtype=object)
    cvecs = [np.asarray(cv, dtype=np.float64) for _, cv in ordered]
    cmat = np.asarray(cvecs)
    book_vecs = [
        [np.asarray(cv, dtype=np.float64) for _, cv in book]
        for book in codebooks
    ]
    m = len(codebooks)
    sub = len(codebooks[0][0][1])
    cell_type = T.StringType() if isinstance(ckeys[0], str) else T.LongType()
    out_schema = T.StructType(
        [
            T.StructField("id", vectors.schema[id_col].dataType),
            T.StructField(cell_col, cell_type),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            idx = _argmin_rounded_np(E, cvecs, round_to)
            if residual:
                E = E - cmat[idx]
            code_mat = np.empty((len(E), m), dtype=np.int32)
            for s in range(m):
                code_mat[:, s] = _argmin_rounded_np(
                    E[:, s * sub : (s + 1) * sub], book_vecs[s], round_to
                )
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    cell_col: ckeys[idx],
                    "codes": list(code_mat),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(gen, out_schema)


def ivfpq_train(
    vectors: DataFrame,
    n_cells: int = 4,
    m: int = 4,
    ksub: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[tuple], list[list[tuple]]]:
    """Train the full IVFADC model: coarse k-means cells over the raw
    vectors, then per-subspace PQ codebooks over the cell RESIDUALS.
    Returns ``(centroids, codebooks)`` ready for
    :func:`residualize` → :func:`pq_encode` (index build) and
    :func:`ivfadc_ann_topk` with ``residual=True`` (search).

    Driver holds model state only (C·dim + m·ksub·subdim doubles); both
    training stages are the kmeans scan/agg loop — vectors never
    shuffle.  The coarse quantizer comes from :func:`kmeans_centroids`,
    so a cell that empties on the final Lloyd step keeps its previous
    centroid instead of vanishing from the model (ADVICE r4)."""
    cents = kmeans_centroids(vectors, n_cells, n_iter, id_col, vec_col)
    resid = residualize(vectors, cents, id_col, vec_col)
    books = pq_train(resid, m, ksub, n_iter, id_col, vec_col)
    return cents, books


def ivfadc_ann_topk(
    codes_with_cells: DataFrame,
    queries: DataFrame,
    centroids,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    k: int = 5,
    nprobe: int = 2,
    round_to: int = 4,
    residual: bool = False,
) -> DataFrame:
    """IVFADC: asymmetric-distance PQ search restricted to the query's
    ``nprobe`` nearest coarse cells (Jegou et al. 2011 §IV — the
    composition of the IVF candidate pruning of
    :func:`multiprobe_ann_topk` with the ADC scoring of
    :func:`pq_ann_topk`).

    ``codes_with_cells``: the index — :func:`assign_cells` then
    :func:`pq_encode` with ``extra_cols=(cell_col,)``: one row per
    corpus vector carrying only (id, cell, m codes).  ``centroids``
    (coarse quantizer: [(cell_id, vector)] or (cell, cv) DataFrame) and
    ``codebooks`` (per-subspace PQ books: [[(code, subvector)]] or
    (s, code, cv) DataFrame) are bounded model state carried as small
    BROADCAST RELATIONS — round 5 replaced the previous
    ``F.lit``-folded form, whose O(C·dim + m·ksub·sub) expression nodes
    made plans uncompilable at production model sizes (C=4096, ksub=256);
    as relations the model is plan DATA, so compile/codegen cost is O(1)
    in model size and the production path can read the model straight
    from parquet.

    The 100 TB shape: probe selection AND the per-query distance tables
    live on the broadcast query side (nprobe rows x m·ksub floats per
    query); the corpus side is an equi-join on the cell id over rows of
    m small ints — no vector is ever read at search time, no corpus row
    outside a probed cell is scored, and with the index table
    partitioned by cell the probe is a partition-pruned scan.  Neither
    side shuffles: broadcast-hash join + per-query top-k.

    ``residual=True`` is IVFADC proper: the index holds codes of the
    CELL RESIDUALS (:func:`residualize` → :func:`pq_encode`, books from
    :func:`ivfpq_train`), and each per-probe distance table is computed
    from the query's residual against the probed cell — still computed
    entirely on the broadcast side (the probe row carries its centroid
    column).
    """
    spark = queries.sparkSession
    cent = _centroid_relation(spark, centroids)
    books = _codebook_relation(spark, codebooks)
    sub = _subdim(codebooks, books)
    m = _n_subspaces(codebooks, books)
    qt = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("__qv")
    )
    probed = _probe_cells(qt, cent, nprobe, carry_cv=True).select(
        "query_id",
        "cell",
        (
            F.zip_with(F.col("__qv"), F.col("cv"), lambda x, c: x - c)
            if residual
            else F.col("__qv")
        ).alias("__qr"),
    )
    probes = _distance_tables(probed, books, sub, m).withColumnRenamed(
        "cell", cell_col
    )
    scored = (
        codes_with_cells.join(F.broadcast(probes), cell_col)
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(_adc(F.col("__tabs"), F.col("codes"), m), round_to).alias("adc"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("adc"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )


def pq_train(
    vectors: DataFrame,
    m: int = 4,
    ksub: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple]]:
    """Train PQ codebooks: one :func:`kmeans` per subspace over the
    sliced subvectors.  Returns codebooks with dense codes 0..ksub-1
    (cluster seeds sorted by id).  Driver holds model state only
    (m x ksub x subdim doubles); each subspace training is the kmeans
    scan/agg loop — vectors never shuffle."""
    first = vectors.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(first["d"])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m
    books: list[list[tuple]] = []
    for s in range(m):
        sv = vectors.select(
            F.col(id_col).alias("vec_id"),
            F.slice(_to_double(F.col(vec_col)), s * sub + 1, sub).alias("embedding"),
        )
        cent = kmeans(sv, ksub, n_iter).collect()
        by_cluster: dict = {}
        for r in cent:
            by_cluster.setdefault(r["cluster_id"], []).append(
                (r["dim"], r["centroid"])
            )
        book = [
            (code, [v for _, v in sorted(dims)])
            for code, (_, dims) in enumerate(sorted(by_cluster.items()))
        ]
        books.append(book)
    return books


def persist_ivfpq_model(
    spark,
    centroids,
    codebooks,
    cent_table: str,
    books_table: str,
) -> None:
    """Persist the IVF-PQ MODEL (coarse centroids + PQ codebooks) as two
    catalog tables — the other half of the round-5 model-as-relation
    design: every search/encode entry point accepts the model as
    DataFrames, so a production deployment trains once, saves here, and
    every subsequent job reads (cell, cv) / (s, code, cv) straight from
    parquet with ZERO driver-side materialization (contrast the
    ``[(id, vector)]`` list form, which exists for tests and small
    models)."""
    _centroid_relation(spark, centroids).write.mode("overwrite").saveAsTable(
        cent_table
    )
    _codebook_relation(spark, codebooks).write.mode("overwrite").saveAsTable(
        books_table
    )


def load_ivfpq_model(spark, cent_table: str, books_table: str):
    """Load a model persisted by :func:`persist_ivfpq_model` as the
    (centroids, codebooks) DataFrame pair every ANN entry point
    accepts."""
    return spark.table(cent_table), spark.table(books_table)


def persist_ivfpq_index(
    vectors: DataFrame,
    centroids: list[tuple],
    codebooks: list[list[tuple]],
    table_name: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
) -> None:
    """Write the IVFADC index as a cell-PARTITIONED catalog table: one
    parquet partition per coarse cell holding only (id, m codes) — the
    production half of :func:`ivfadc_ann_topk`, mirroring what
    ``persist_band_index`` is to the LSH delta join.

    Search against ``spark.table(table_name)`` reads ONLY probed cells:
    the broadcast probe join on the partition column triggers dynamic
    partition pruning (the scan gains a ``dynamicpruning`` subquery fed
    by the reused probe broadcast — pinned in ``test_plans.py``), so at
    C cells / nprobe probes the index scan touches nprobe/C of the
    files with zero manual pruning logic.  Build cost is one encode pass
    over the vectors; the index never reshuffles across queries.
    """
    codes = ivfpq_index_codes(
        vectors, centroids, codebooks, id_col, vec_col, residual=residual
    )
    codes.write.mode("overwrite").partitionBy("cell").saveAsTable(table_name)


def semantic_dedup(
    corpus: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_to: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): quantize the embedding
    space with a coarse centroid model, then drop semantic duplicates
    WITHIN each cell — of every in-cell pair whose cosine clears
    ``threshold``, only the lowest-id member survives (the canonical-min
    convention shared with :func:`~spark_sql_hbase_spark.operators.graph.
    dedup_clusters`; the paper keeps one arbitrary exemplar per
    duplicate group — min-id makes that choice deterministic and
    cross-engine reproducible).

    ``centroids``: ``[(cell_id, vector)]`` or a (cell, cv) DataFrame —
    typically :func:`kmeans_centroids` output, or an untrained seed list
    for a SQL-reproducible twin.

    Returns the per-vector audit relation ``(id, cell, kept)``; filter
    on ``kept`` for the deduplicated corpus, on ``NOT kept`` for the
    drop report — both come from the same relation.

    Scale shape: cell assignment is the packed-broadcast-model argmin of
    :func:`assign_cells` (no shuffle, O(1) plan size in C·dim); the
    candidate pair space is blocked to Σ|cell|² by an equi-join on cell
    — never all-pairs (a trained quantizer with C ∝ n/target_cell_size
    bounds every cell, the same contract as the IVF search); the drop
    set and the final audit join exchange bare ids only, never vectors.
    Cosines are rounded to 4 before the threshold comparison so keep
    decisions are reproducible cross-engine.  The corpus is scanned
    three times (two pair sides + audit spine) — at index scale, run
    this against the cell-partitioned output of
    :func:`persist_ivfpq_index` instead so assignment is computed once
    at build time.
    """
    cells = assign_cells(corpus, centroids, id_col, vec_col, "cell", round_to)
    a = cells.select(
        F.col(id_col).alias("id_a"),
        F.col("cell"),
        _to_double(F.col(vec_col)).alias("va"),
    )
    b = cells.select(
        F.col(id_col).alias("id_b"),
        F.col("cell"),
        _to_double(F.col(vec_col)).alias("vb"),
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("id_b") < F.col("id_a"))
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 4) >= threshold)
        .select(F.col("id_a").alias("__dup_id"))
        .distinct()
    )
    return (
        cells.select(F.col(id_col), F.col("cell"))
        .join(dropped, F.col(id_col) == F.col("__dup_id"), "left")
        .select(
            F.col(id_col),
            F.col("cell"),
            F.col("__dup_id").isNull().alias("kept"),
        )
    )


def ivfadc_rerank_topk(
    codes_with_cells: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    centroids,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    k: int = 5,
    rerank: int = 20,
    nprobe: int = 2,
    round_to: int = 4,
    residual: bool = False,
) -> DataFrame:
    """IVFADC with exact re-ranking (the short-list refinement of Jegou
    et al., "Searching in one billion vectors: re-rank with source
    coding", ICASSP 2011 — the classic refine step of production ANN
    stacks): :func:`ivfadc_ann_topk` produces a ``rerank``-sized ADC
    short-list per query, whose EXACT squared-L2 distances are then
    computed from the raw vectors and re-ranked to the final ``k``.
    Buys back most of the recall PQ quantization loses at the cost of
    reading ``rerank`` full vectors per query instead of zero.

    Emits (query_id, neighbor_id, d2, rank) — ``d2`` is the exact
    rounded squared L2, so re-ranked output is directly comparable to a
    flat exact search.

    The 100 TB shape: the ADC stage never reads vectors (see
    :func:`ivfadc_ann_topk`); the refinement joins the Q·rerank
    candidate list — BROADCAST, with each candidate carrying its query
    vector — INTO the vector table scan, so the corpus side never
    shuffles and only candidate rows survive the join (with the vector
    table laid out id-sorted, parquet min/max stats prune non-candidate
    row groups — the keyed-store contract).  The final window ranks
    Q·rerank rows, never the corpus.
    """
    cand = ivfadc_ann_topk(
        codes_with_cells,
        queries,
        centroids,
        codebooks,
        id_col,
        vec_col,
        cell_col,
        k=rerank,
        nprobe=nprobe,
        round_to=round_to,
        residual=residual,
    ).select("query_id", "neighbor_id")
    qt = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("__qv")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("__nv"),
    )
    exact = v.join(
        F.broadcast(cand.join(F.broadcast(qt), "query_id")), "neighbor_id"
    ).select(
        "query_id",
        "neighbor_id",
        F.round(squared_l2(F.col("__qv"), F.col("__nv")), round_to).alias("d2"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("d2"), F.col("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "d2", "rank")
    )


def projection_matrix(in_dim: int, out_dim: int, seed: int = 7) -> list[tuple]:
    """Deterministic ±1 random-projection matrix (Achlioptas 2003,
    "Database-friendly random projections"): entry sign from the parity
    of the 56-bit md5 word hash of ``"{seed}:{i}:{j}"`` — the same
    primitive (``functions/texthash.py::word_hash``) every dedup gate
    already reproduces in SQL, so the matrix is bit-identical in any
    engine with a standard md5.  Returns ``[(j, row_j)]`` with
    ``row_j[i] ∈ {+1.0, -1.0}`` — scaling by 1/√out_dim is applied at
    projection time."""
    import hashlib

    def sign(i: int, j: int) -> float:
        h = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:14], 16)
        return 1.0 if h % 2 == 0 else -1.0

    return [
        (j, [sign(i, j) for i in range(in_dim)]) for j in range(out_dim)
    ]


def random_projection(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_dim: int,
    seed: int = 7,
    round_to: int = 6,
    out_col: str = "proj",
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction: project each
    embedding onto ``out_dim`` deterministic ±1 directions
    (:func:`projection_matrix`), scaled by 1/√out_dim so pairwise
    squared distances are preserved in expectation — the standard cheap
    precursor to ANN over very high-dimensional embeddings (project
    once, index/search in the small space, optionally re-rank exact via
    :func:`ivfadc_rerank_topk`'s refinement pattern).

    Scale shape: the matrix rides as ONE packed broadcast row
    (:func:`_packed_model` — plan DATA, O(1) plan size in in_dim·out_dim);
    the projection is a row-local ``transform`` + dot fold per output
    dimension.  No shuffle, no UDF.  Components are rounded so the
    projected vectors are cross-engine reproducible.
    """
    in_dim = len(df.select(vec_col).first()[0])
    mat = projection_matrix(in_dim, out_dim, seed)
    rel = df.sparkSession.createDataFrame(mat, "j int, cv array<double>")
    packed = _packed_model(rel, "j")
    scale = 1.0 / (out_dim ** 0.5)
    return (
        df.withColumn("__ev", _to_double(F.col(vec_col)))
        .crossJoin(F.broadcast(packed))
        .withColumn(
            out_col,
            F.transform(
                F.col("__model"),
                lambda e: F.round(
                    dot(F.col("__ev"), e["cv"]) * F.lit(scale), round_to
                ),
            ),
        )
        .drop("__ev", "__model")
    )


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8) — the third quantizer tier next to PQ/IVFADC
# ---------------------------------------------------------------------------
def sq8_bounds(corpus: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-dimension (min, max) training bounds for scalar quantization,
    as ONE row ``(lo: array<double>, hi: array<double>)`` — 2·dim agg
    expressions over a single corpus scan, no explode, no collect; the
    row broadcasts to every encoder task (the packed-model discipline).

    At very high dim (≳4k) the 2·dim-expression aggregate bloats the
    plan; switch to the posexplode→groupBy(pos) long format there — at
    embedding dims this codegen shape is the fast path."""
    return corpus.agg(
        F.array(
            *[F.min(F.col(vec_col)[i].cast("double")) for i in range(dim)]
        ).alias("lo"),
        F.array(
            *[F.max(F.col(vec_col)[i].cast("double")) for i in range(dim)]
        ).alias("hi"),
    )


def _sq8_bounds_values(
    corpus: DataFrame, vec_col: str, dim: int | None = None
) -> tuple[list, list]:
    """Driver-side SQ8 bound VALUES (lo list, hi list) — one corpus scan;
    the value-level core of :func:`_sq8_bounds_literals`."""
    if dim is None:
        # NULL vectors must not decide the probe: len(None) would raise
        # an opaque TypeError where the empty-corpus path raises a
        # descriptive ValueError (ADVICE r12)
        probe = (
            corpus.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
        )
        if probe is None:
            raise ValueError(
                "SQ8 bounds: no non-NULL vectors and no dim given — pass "
                "dim explicitly to train against an (initially) empty "
                "corpus"
            )
        dim = len(probe[0])
    row = sq8_bounds(corpus, vec_col, dim).first()
    if row is None or row["lo"] is None or any(v is None for v in row["lo"]):
        # empty corpus (the min/max aggregate is all-NULL): degenerate
        # zero bounds — every dimension codes/decodes to 0, and the
        # downstream scoring join is empty anyway (no corpus rows).
        # Matches the pre-relit behavior, which propagated the NULL
        # bounds into an empty result instead of crashing.
        return [0.0] * dim, [0.0] * dim
    return [float(v) for v in row["lo"]], [float(v) for v in row["hi"]]


def _sq8_bounds_literals(
    corpus: DataFrame, vec_col: str, dim: int | None = None
) -> tuple[Column, Column]:
    """Train the SQ8 bounds with ONE corpus scan and re-light the single
    result row as literal array columns.

    The bounds are 2·dim doubles — a bounded model parameter, so the
    driver-side collect is the same discipline as centroid/codebook
    seeds.  Re-lighting (instead of cross-joining the lazy one-row
    aggregate into every consumer) means the aggregate is evaluated
    exactly once however many branches reference the bounds — the lazy
    form was evaluated once per recon branch.  Doubles round-trip the
    collect bit-exactly.  ``dim`` avoids an extra corpus scan for
    dimension inference when the caller knows it."""
    lo_v, hi_v = _sq8_bounds_values(corpus, vec_col, dim)
    lo = F.array(*[F.lit(v) for v in lo_v])
    hi = F.array(*[F.lit(v) for v in hi_v])
    return lo, hi


def sq8_encode(vec: Column, lo: Column, hi: Column, levels: int = 256) -> Column:
    """Quantize a float vector to per-dimension integer codes in
    ``[0, levels-1]``: ``code = floor((x - lo) / (hi - lo) * levels)``
    clamped (x == hi lands exactly on ``levels`` and clamps down);
    degenerate dimensions (hi == lo) code to 0.

    The arithmetic keeps the exact operation ORDER of the SQL twin
    (divide, then scale) so the codes are bit-identical cross-engine —
    everything downstream of encoding is integer math.  The clamp runs
    BEFORE the int cast: a far-out-of-range value (corrupted arrival —
    the scaled double can exceed 2^31) must saturate at the edge code,
    never wrap through the narrowing cast."""
    b = F.zip_with(lo, hi, lambda l, h: F.struct(l.alias("l"), h.alias("h")))
    return F.zip_with(
        _to_double(vec),
        b,
        lambda x, s: F.when(s["h"] == s["l"], F.lit(0)).otherwise(
            F.least(
                F.lit(levels - 1).cast("bigint"),
                F.greatest(
                    F.lit(0).cast("bigint"),
                    F.floor((x - s["l"]) / (s["h"] - s["l"]) * F.lit(levels)),
                ),
            ).cast("int")
        ),
    )


def sq8_decode(code: Column, lo: Column, hi: Column, levels: int = 256) -> Column:
    """Reconstruct the quantized vector from SQ8 codes:
    ``x̂ = lo + (code + 0.5) · (hi − lo) / levels`` (bucket midpoint —
    the FAISS ScalarQuantizer convention).  Operation order matches the
    SQL twin exactly so reconstructions are bit-identical cross-engine."""
    b = F.zip_with(lo, hi, lambda l, h: F.struct(l.alias("l"), h.alias("h")))
    return F.zip_with(
        code,
        b,
        lambda c, s: s["l"]
        + (c.cast("double") + 0.5) * (s["h"] - s["l"]) / F.lit(levels),
    )


def sq8_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    levels: int = 256,
    round_to: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k by inner product over SQ8 reconstructions — the
    memory-bandwidth tier of ANN: the PERSISTED form is 1 byte/dimension
    instead of 4 (a 100 TB float corpus scans as ~25 TB of codes);
    scoring decodes each code to its bucket midpoint on the fly
    (:func:`sq8_decode` — register-level multiply-add at scan time, the
    FAISS ScalarQuantizer design) and ranks by the reconstructed dot
    product.  Decode-then-score is REQUIRED for inner product: a raw
    integer dot of codes is rank-broken by the affine shift
    (Σ(ax+b)(ay+b) carries Σ(x+y) cross terms), measured at 0.06 recall
    vs 0.98 for reconstruction scoring on the test embeddings.
    PQ (pq_ann_topk) compresses harder; SQ8 keeps per-dimension
    resolution and needs no codebook training beyond min/max bounds.

    Plan shape: bounds train in ONE corpus scan and re-light as literal
    arrays (:func:`_sq8_bounds_literals` — 2·dim doubles, the bounded
    model-parameter discipline); encode/decode are row-local
    ``zip_with``; queries quantize against the SAME corpus bounds and
    broadcast; scoring is corpus-scan × |Q| with a window top-k —
    exactly :func:`cosine_topk`'s shuffle-free shape.  Scores round to
    ``round_to`` before ranking (tiebreak on neighbor_id) so the cut is
    cross-engine stable.

    Scoring runs vectorized in ONE Arrow pass over the corpus (the
    :func:`cosine_topk` treatment): bounds are already driver-side
    values, the (bounded, broadcast-contract) query set is collected,
    and encode → decode → dot → round replay the JVM expression
    semantics bit-for-bit — identical IEEE op order for the affine
    encode/decode, ``np.cumsum`` for the fold's sequential dot, and
    Spark's HALF_UP decimal rounding (:func:`_spark_round_half_up`).
    Pinned by ``test_sq8_ann_arrow_matches_jvm``; the expression twin
    stays as :func:`sq8_ann_topk_jvm`."""
    import numpy as np
    import pandas as pd

    lo_v, hi_v = _sq8_bounds_values(corpus, vec_col, dim)
    lo_a = np.asarray(lo_v, dtype=np.float64)
    hi_a = np.asarray(hi_v, dtype=np.float64)

    def _recon_np(V):
        """encode+decode a (N × dim) float64 matrix, bit-identical to
        sq8_encode→sq8_decode: floor((x-lo)/(hi-lo)*levels) clamped to
        [0, levels-1] (degenerate dims code 0), then
        lo + (code+0.5)*(hi-lo)/levels."""
        span = hi_a - lo_a
        degenerate = hi_a == lo_a
        with np.errstate(divide="ignore", invalid="ignore"):
            scaled = np.floor((V - lo_a) / span * float(levels))
        code = np.clip(scaled, 0.0, float(levels - 1))
        code = np.where(degenerate, 0.0, code)
        return lo_a + (code + 0.5) * span / float(levels)

    q_rows = (
        queries.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .collect()
    )
    id_type = corpus.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[id_col].dataType.simpleString()

    def gen(batches):
        qids = [r["query_id"] for r in q_rows]
        qrecs = [
            _recon_np(np.asarray(r["qv"], dtype=np.float64)[None, :])[0]
            if r["qv"] is not None
            else None
            for r in q_rows
        ]
        for pdf in batches:
            nids = pdf["neighbor_id"].to_numpy()
            vec_list = list(pdf["cv"])
            ok = np.array([v is not None for v in vec_list], dtype=bool)
            if ok.any():
                C = _recon_np(
                    np.asarray(
                        [v for v, o in zip(vec_list, ok) if o], dtype=np.float64
                    )
                )
            out_id, out_nid, out_score = [], [], []
            for qid, qrec in zip(qids, qrecs):
                keep = nids != qid
                score = np.full(len(nids), None, dtype=object)
                if qrec is not None and ok.any():
                    score[ok] = _spark_round_half_up(
                        _seq_dot_np(C, qrec), round_to
                    )
                out_id.extend([qid] * int(keep.sum()))
                out_nid.extend(nids[keep])
                out_score.extend(score[keep])
            yield pd.DataFrame(
                {"query_id": out_id, "neighbor_id": out_nid, "score": out_score}
            )

    scored = (
        corpus.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        .mapInPandas(gen, f"query_id {qid_type}, neighbor_id {id_type}, score double")
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def sq8_ann_topk_jvm(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    levels: int = 256,
    round_to: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Pure-JVM expression twin of :func:`sq8_ann_topk` (no Python in the
    plan) — the no-Python fallback and parity anchor for the Arrow
    scoring path."""
    lo, hi = _sq8_bounds_literals(corpus, vec_col, dim)

    def recon(df: DataFrame, name: str) -> DataFrame:
        code = sq8_encode(F.col(vec_col), lo, hi, levels)
        return df.select(
            F.col(id_col).alias(name),
            sq8_decode(code, lo, hi, levels).alias(f"__{name}_rec"),
        )

    c = recon(corpus, "neighbor_id")
    q = recon(queries, "query_id")
    score = F.round(
        dot(F.col("__query_id_rec"), F.col("__neighbor_id_rec")), round_to
    )
    scored = c.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select("query_id", "neighbor_id", score.alias("score"))
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def sq8_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    rerank: int = 20,
    levels: int = 256,
    round_to: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """SQ8 with exact re-ranking — the refine step
    (:func:`ivfadc_rerank_topk`'s pattern) applied to the scalar
    quantizer: :func:`sq8_ann_topk` produces a ``rerank``-sized
    decode-and-score short-list per query, whose EXACT inner products
    are then computed from the raw float vectors and re-ranked to the
    final ``k``.  Buys back the half-bucket quantization error at the
    cost of reading ``rerank`` full vectors per query instead of zero —
    completing the rerank symmetry across the quantizer matrix
    (IVFADC has it; SQ8 now does too).

    Emits ``(query_id, neighbor_id, dot, rank)`` — ``dot`` is the
    exact rounded inner product, directly comparable to a flat exact
    search over the same metric.

    The 100 TB shape: the SQ8 stage reads 1-byte codes only; the
    refinement joins the Q·rerank candidate list — BROADCAST, each
    candidate carrying its query vector — into the float-vector scan,
    so the corpus never shuffles and only candidate rows survive (an
    id-sorted vector layout prunes non-candidate row groups via
    parquet stats, the keyed-store contract).  The final window ranks
    Q·rerank rows, never the corpus."""
    cand = sq8_ann_topk(
        corpus, queries, id_col, vec_col, k=rerank, levels=levels,
        round_to=round_to, dim=dim,
    ).select("query_id", "neighbor_id")
    qt = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("__qv")
    )
    v = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("__nv"),
    )
    exact = v.join(
        F.broadcast(cand.join(F.broadcast(qt), "query_id")), "neighbor_id"
    ).select(
        "query_id",
        "neighbor_id",
        F.round(dot(F.col("__qv"), F.col("__nv")), round_to).alias("dot"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )


def _sq8_code_case_sql(levels: int) -> str:
    """The one SQL encoding expression shared by every SQ8 oracle
    (names ``ev``/``lo``/``hi`` indexed by ``i`` must be in scope) —
    single source of truth for the clamp/degenerate semantics of
    :func:`sq8_encode`.  Clamp-before-cast, like the Spark twin: the
    cast must see a value already inside [0, levels-1] or a corrupted
    arrival raises a conversion error / wraps."""
    return (
        f"CASE WHEN hi[i] = lo[i] THEN 0 "
        f"ELSE CAST(least({levels - 1}, greatest(0, "
        f"floor((ev[i] - lo[i]) / (hi[i] - lo[i]) * {levels}))) "
        f"AS INTEGER) END"
    )


def sq8_ann_sql(
    table: str,
    id_expr: str,
    vec_expr: str,
    query_pred: str,
    k: int,
    dim: int,
    levels: int = 256,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`sq8_ann_topk` (oracle generator);
    ``query_pred`` selects the query rows of ``table``."""
    rng = f"range(1, {dim + 1})"
    return f"""
    WITH __v AS (
        SELECT {id_expr} AS vid, {vec_expr}::DOUBLE[] AS ev FROM {table}
    ), __b AS (
        SELECT list(mn ORDER BY i) AS lo, list(mx ORDER BY i) AS hi
        FROM (SELECT i, MIN(ev[i]) AS mn, MAX(ev[i]) AS mx
              FROM __v, {rng} t(i) GROUP BY i)
    ), __enc AS (
        SELECT vid,
               [{_sq8_code_case_sql(levels)} for i in {rng}] AS code
        FROM __v, __b
    ), __rec AS (
        SELECT vid,
               [lo[i] + (code[i] + 0.5) * (hi[i] - lo[i]) / {levels}
                for i in {rng}] AS rec
        FROM __enc, __b
    ), __q AS (
        SELECT vid AS query_id, rec AS qr FROM __rec
        WHERE vid IN (SELECT {id_expr} AS vid FROM {table} WHERE {query_pred})
    ), __s AS (
        SELECT query_id, e.vid AS neighbor_id,
               ROUND(list_sum([qr[i] * rec[i] for i in {rng}]), {round_to})
                   AS score
        FROM __rec e JOIN __q ON e.vid <> query_id
    )
    SELECT query_id, neighbor_id, score, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
          FROM __s)
    WHERE rn <= {k}
    """


def sq8_rerank_sql(
    table: str,
    id_expr: str,
    vec_expr: str,
    query_pred: str,
    k: int,
    rerank: int,
    dim: int,
    levels: int = 256,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`sq8_rerank_topk` (oracle generator):
    the :func:`sq8_ann_sql` candidate list at ``rerank``, refined by
    exact inner products over the raw vectors."""
    inner = sq8_ann_sql(
        table, id_expr, vec_expr, query_pred, rerank, dim, levels, round_to
    )
    rng = f"range(1, {dim + 1})"
    return f"""
    WITH __cand AS ({inner}),
    __vv AS (
        SELECT {id_expr} AS vid, {vec_expr}::DOUBLE[] AS ev FROM {table}
    ), __ex AS (
        SELECT c.query_id, c.neighbor_id,
               ROUND(list_sum([q.ev[i] * n.ev[i] for i in {rng}]),
                     {round_to}) AS dot
        FROM __cand c
        JOIN __vv q ON q.vid = c.query_id
        JOIN __vv n ON n.vid = c.neighbor_id
    )
    SELECT query_id, neighbor_id, dot, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rn
          FROM __ex)
    WHERE rn <= {k}
    """


def sq8_codes_long_sql(
    table: str,
    id_expr: str,
    vec_expr: str,
    bounds_pred: str,
    dim: int,
    levels: int = 256,
) -> str:
    """Long-format ``(id, dim, code)`` SQ8 encoding of EVERY row of
    ``table``, with bounds trained on the ``bounds_pred`` subset only
    (the frozen-quantizer convention: a live index encodes arrivals
    against the bounds of the corpus it was trained on; out-of-range
    values clamp).  Oracle generator for the streaming ingest gate."""
    rng = f"range(1, {dim + 1})"
    return f"""
    WITH __all AS (
        SELECT {id_expr} AS id, {vec_expr}::DOUBLE[] AS ev FROM {table}
    ), __b AS (
        SELECT list(mn ORDER BY i) AS lo, list(mx ORDER BY i) AS hi
        FROM (SELECT i, MIN(ev[i]) AS mn, MAX(ev[i]) AS mx
              FROM (SELECT {vec_expr}::DOUBLE[] AS ev FROM {table}
                    WHERE {bounds_pred}), {rng} t(i)
              GROUP BY i)
    )
    SELECT id, CAST(i AS INTEGER) AS dim,
           {_sq8_code_case_sql(levels)} AS code
    FROM __all, __b, {rng} t(i)
    """


def embedding_outliers(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    z_threshold: float = 2.0,
    round_to: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Distribution-level embedding QA: distance of every vector from the
    corpus mean vector, z-scored against the distance distribution —
    the standard cheap screen for corrupted embeddings / out-of-domain
    rows before they poison an ANN index or a contrastive batch.

    Emits ``(id, dist, z, is_outlier)`` for every row; ``is_outlier``
    compares the ROUNDED z-score to ``z_threshold`` so the flag is
    cross-engine stable.

    Plan shape (scales to 100 TB): two scans — one dim-bounded mean
    aggregate (2·dim doubles in one row, broadcast back), one
    distance pass whose scalar (mean, stddev) aggregate broadcasts back
    for the row-local z-score.  No shuffle of vectors, no collect, no
    UDF.  Intermediates round to ``round_to`` at each aggregate edge so
    both engines z-score identical doubles.  The distance relation is a
    MANAGED cache (two consumers: the stats aggregate and the returned
    join — uncached, the corpus distance pass would run twice);
    re-invocation unpersists the previous entry
    (:mod:`spark_sql_hbase_spark.operators.caching`).  ``dim`` avoids
    an extra corpus scan for dimension inference when known."""
    from spark_sql_hbase_spark.operators.caching import managed_cache

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    mu = df.agg(
        F.array(
            *[
                F.round(F.avg(F.col(vec_col)[i].cast("double")), round_to)
                for i in range(dim)
            ]
        ).alias("__mu")
    )
    d = managed_cache(
        df.crossJoin(F.broadcast(mu)).select(
            F.col(id_col).alias("id"),
            F.round(
                F.sqrt(
                    F.round(
                        squared_l2(_to_double(F.col(vec_col)), F.col("__mu")),
                        round_to,
                    )
                ),
                round_to,
            ).alias("dist"),
        ),
        "embedding_outliers.dist",
    )
    stats = d.agg(
        F.round(F.avg("dist"), round_to).alias("__m"),
        F.round(F.stddev_pop("dist"), round_to).alias("__s"),
    )
    # degenerate corpus (all vectors identical → stddev 0): a defined
    # no-outlier result (z=0) instead of NULL/Inf division artifacts
    z = F.when(F.col("__s") == 0, F.lit(0.0)).otherwise(
        F.round((F.col("dist") - F.col("__m")) / F.col("__s"), 4)
    )
    return d.crossJoin(F.broadcast(stats)).select(
        "id", "dist", z.alias("z"), (z >= F.lit(z_threshold)).alias("is_outlier")
    )


def embedding_outliers_sql(
    table: str,
    id_expr: str,
    vec_expr: str,
    dim: int,
    z_threshold: float = 2.0,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`embedding_outliers` (oracle generator)."""
    rng = f"range(1, {dim + 1})"
    return f"""
    WITH __v AS (
        SELECT {id_expr} AS id, {vec_expr}::DOUBLE[] AS ev FROM {table}
    ), __mu AS (
        SELECT list(m ORDER BY i) AS mv
        FROM (SELECT i, ROUND(AVG(ev[i]), {round_to}) AS m
              FROM __v, {rng} t(i) GROUP BY i)
    ), __d AS (
        SELECT id,
               ROUND(sqrt(ROUND(list_sum(
                   [(ev[i] - mv[i]) ^ 2 for i in {rng}]), {round_to})),
                   {round_to}) AS dist
        FROM __v, __mu
    ), __st AS (
        SELECT ROUND(AVG(dist), {round_to}) AS m,
               ROUND(stddev_pop(dist), {round_to}) AS s
        FROM __d
    )
    SELECT id, dist,
           CASE WHEN s = 0 THEN 0.0
                ELSE ROUND((dist - m) / s, 4) END AS z,
           CASE WHEN s = 0 THEN 0.0
                ELSE ROUND((dist - m) / s, 4) END >= {z_threshold}
               AS is_outlier
    FROM __d, __st
    """


def kmeans_sql(
    table: str,
    id_expr: str,
    vec_expr: str,
    k: int,
    n_iter: int,
    dim: int,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`kmeans` (oracle generator): ``n_iter``
    chained Lloyd CTE blocks, each reproducing :func:`kmeans_step`'s
    exact determinism contract — d2 rounded to ``round_to`` BEFORE the
    argmin (tiebreak on cluster_id), centroids rounded to ``round_to``
    between iterations.  Assumes no cluster empties mid-run (Spark keeps
    the previous centroid there; with k ≪ n and real data the case never
    triggers — asserted by the gate's unit test)."""
    rng = f"range(1, {dim + 1})"
    sql = f"""
    WITH __v AS (
        SELECT {id_expr} AS vid, {vec_expr}::DOUBLE[] AS ev FROM {table}
    ), __c0 AS (
        SELECT vid AS cluster_id, ev AS cv FROM __v
        WHERE vid IN (SELECT vid FROM __v ORDER BY vid LIMIT {k})
    )"""
    for it in range(1, n_iter + 1):
        prev = f"__c{it - 1}"
        sql += f""", __d{it} AS (
        SELECT vid, cluster_id,
               ROUND(list_sum([(ev[i] - cv[i]) ^ 2 for i in {rng}]),
                     {round_to}) AS d2
        FROM __v, {prev}
    ), __a{it} AS (
        SELECT vid, cluster_id FROM (
            SELECT vid, cluster_id, row_number() OVER (
                PARTITION BY vid ORDER BY d2, cluster_id) AS rn
            FROM __d{it})
        WHERE rn = 1
    )"""
        if it < n_iter:
            sql += f""", __c{it} AS (
        SELECT cluster_id, list(m ORDER BY i) AS cv FROM (
            SELECT cluster_id, i, ROUND(AVG(ev[i]), {round_to}) AS m
            FROM __a{it} JOIN __v USING (vid), {rng} t(i)
            GROUP BY 1, 2)
        GROUP BY 1
    )"""
    sql += f"""
    SELECT a.cluster_id,
           CAST(t.i AS INTEGER) AS dim,
           ROUND(AVG(ev[t.i]), {round_to}) AS centroid,
           COUNT(*) AS n_members
    FROM __a{n_iter} a JOIN __v USING (vid), {rng} t(i)
    GROUP BY 1, 2
    """
    return sql


def sq8_codes_long(
    df: DataFrame,
    bounds: DataFrame,
    id_col: str,
    vec_col: str,
    levels: int = 256,
) -> DataFrame:
    """Long-format ``(id, dim, code)`` SQ8 encoding of ``df`` against a
    GIVEN one-row ``(lo, hi)`` bounds frame (frozen quantizer — train on
    the corpus with :func:`sq8_bounds`, encode arrivals against it;
    out-of-range values clamp).  Scalar columns, so the result is
    hashable/oracle-comparable and appendable to a persisted codes
    index.  Row-local encode, one posexplode — no shuffle."""
    code = sq8_encode(F.col(vec_col), F.col("lo"), F.col("hi"), levels)
    return (
        df.crossJoin(F.broadcast(bounds))
        .select(F.col(id_col).alias("id"), F.posexplode(code).alias("pos", "code"))
        .select("id", (F.col("pos") + 1).cast("int").alias("dim"), "code")
    )


def ivfsq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    levels: int = 256,
    round_to: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """IVF–SQ composite ANN (the FAISS ``IVF,SQ8`` index): coarse cells
    prune the candidate set (only each query's ``nprobe`` nearest cells
    are scanned), SQ8 codes shrink what the scan READS to 1 byte/dim,
    and scoring is ASYMMETRIC — the query stays exact, each candidate
    is reconstructed from its codes on the fly (:func:`sq8_decode`) —
    the ADC convention (query-side precision is free; only the corpus
    pays the quantization error).

    Completes the quantizer matrix next to IVF-flat
    (:func:`multiprobe_ann_topk`) and IVFADC (:func:`ivfadc_ann_topk`):
    SQ8 trades PQ's 16× compression for per-dimension resolution and
    bound-only training.

    Plan shape: the centroid model rides ONE broadcast row; the SQ8
    bounds train in one corpus scan and re-light as literal arrays
    (:func:`_sq8_bounds_literals`); cell assignment and encode/decode
    are row-local; the probed (query, cell) pairs multiply only the
    query side nprobe× — scan cost is nprobe/|cells| of the CODES,
    never the float corpus."""
    spark = queries.sparkSession
    cent = _centroid_relation(spark, centroids)
    lo, hi = _sq8_bounds_literals(corpus, vec_col, dim)
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("__qv")
    )
    probes = _probe_cells(q, cent, nprobe, round_to=round_to).select(
        "query_id", F.col("__qv").alias("qv"), "cell"
    )
    # pass the RAW model: a driver-side list takes assign_cells' Arrow
    # argmin fast path; a DataFrame keeps the broadcast-relation path
    with_cells = assign_cells(corpus, centroids, id_col, vec_col, "cell", round_to)
    code = sq8_encode(F.col(vec_col), lo, hi, levels)
    c = with_cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("cell"),
        sq8_decode(code, lo, hi, levels).alias("__rec"),
    )
    scored = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("__rec")), round_to).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivfsq_ann_sql(
    table: str,
    id_expr: str,
    vec_expr: str,
    centroid_pred: str,
    query_pred: str,
    k: int,
    nprobe: int,
    dim: int,
    levels: int = 256,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`ivfsq_ann_topk` (oracle generator);
    ``centroid_pred`` selects the untrained coarse-centroid rows, the
    zd46 SQL-reproducible model convention."""
    rng = f"range(1, {dim + 1})"
    return f"""
    WITH __v AS (
        SELECT {id_expr} AS vid, {vec_expr}::DOUBLE[] AS ev FROM {table}
    ), __cc AS (
        SELECT vid AS cell, ev AS ccv FROM __v WHERE {centroid_pred}
    ), __b AS (
        SELECT list(mn ORDER BY i) AS lo, list(mx ORDER BY i) AS hi
        FROM (SELECT i, MIN(ev[i]) AS mn, MAX(ev[i]) AS mx
              FROM __v, {rng} t(i) GROUP BY i)
    ), __cells AS (
        SELECT vid, cell FROM (
            SELECT vid, cell, row_number() OVER (
                PARTITION BY vid ORDER BY ROUND(list_sum(
                    [(ev[i] - ccv[i]) ^ 2 for i in {rng}]), {round_to}), cell
            ) AS rn
            FROM __v, __cc)
        WHERE rn = 1
    ), __rec AS (
        SELECT vid,
               [lo[i] + ({_sq8_code_case_sql(levels)} + 0.5)
                * (hi[i] - lo[i]) / {levels} for i in {rng}] AS rec
        FROM __v, __b
    ), __q AS (
        SELECT vid AS query_id, ev AS qv FROM __v WHERE {query_pred}
    ), __probes AS (
        SELECT query_id, cell FROM (
            SELECT q.query_id, cc.cell, row_number() OVER (
                PARTITION BY q.query_id ORDER BY ROUND(list_sum(
                    [(q.qv[i] - cc.ccv[i]) ^ 2 for i in {rng}]),
                    {round_to}), cc.cell
            ) AS rn
            FROM __q q, __cc cc)
        WHERE rn <= {nprobe}
    ), __s AS (
        SELECT p.query_id, cl.vid AS neighbor_id,
               ROUND(list_sum([q.qv[i] * r.rec[i] for i in {rng}]),
                     {round_to}) AS score
        FROM __probes p
        JOIN __cells cl USING (cell)
        JOIN __rec r ON r.vid = cl.vid
        JOIN __q q ON q.query_id = p.query_id
        WHERE cl.vid <> p.query_id
    )
    SELECT query_id, neighbor_id, score, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
          FROM __s)
    WHERE rn <= {k}
    """
