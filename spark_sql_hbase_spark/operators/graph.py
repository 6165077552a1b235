"""Distributed connected components over a pair/edge DataFrame.

The missing last stage of a dedup pipeline: pair generators
(``dedup.minhash_lsh_join`` / ``simhash_neardup`` / ``ngram_jaccard_join``)
emit near-duplicate PAIRS, but a training-data pipeline needs CLUSTERS —
"these k documents are all the same document; keep one". Pairs →
clusters is connected components on the similarity graph; the canonical
representative per cluster is then a deterministic pick (min id).

Algorithm: iterative min-label propagation. Every vertex starts labeled
with itself; each round every vertex takes the min label among itself and
its neighbors; stop when no label changes. Rounds needed = graph diameter.

Scale notes (100 TB view):

- Per round: one shuffle join (edges ⋈ labels on src) + one hash
  aggregation (min per vertex) — both partition-parallel, no driver state.
  The driver sees only the scalar "did anything change" count.
- ``localCheckpoint`` after each round truncates lineage, keeping the plan
  O(1) per round instead of O(rounds) (iterative DataFrame loops otherwise
  recompute from round 0 every action).
- Diameter bound: near-dup similarity clusters are dense (near-cliques of
  copies of one document), so diameter — and the round count — is small.
  For adversarial long-chain graphs the published fix is the
  large-star/small-star algorithm (Kiveris et al., "Connected Components
  in MapReduce and Beyond", SoCC'14), which converges in O(log² n) rounds
  of the same join+min primitive; label propagation is the right default
  for dedup workloads and keeps every round a single join.
- Edges are symmetrized once up front; labels shuffle on vertex id every
  round, so enabling AQE coalescing sizes the reducers per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Return ``(id, component)`` for every vertex appearing in ``pairs``,
    where ``component`` is the minimum vertex id in its connected
    component (a deterministic canonical label).

    ``pairs`` is treated as undirected; duplicate edges are fine.
    Raises ``RuntimeError`` if not converged within ``max_iter`` rounds
    (diameter > max_iter — see module docstring for the large-star
    alternative before raising the limit).
    """
    e = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    edges = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # candidate labels flowing along edges: neighbor's current comp
        flowed = (
            edges.join(labels, edges.s == labels.id)
            .select(F.col("d").alias("id"), "comp")
        )
        new_labels = (
            labels.select("id", "comp")
            .union(flowed)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: not converged in {max_iter} rounds")


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster summary for a near-dup pair set: one row per multi-document
    cluster — ``(cluster_id, n_docs, keep_id)`` where ``cluster_id`` =
    ``keep_id`` = min doc id (the canonical survivor) — plus the full
    member list is recoverable from :func:`connected_components`.
    """
    comp = connected_components(pairs, src, dst)
    return comp.groupBy(F.col("comp").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("id").alias("keep_id"),
    )


def canonical_selection(
    pairs: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Quality-aware canonical-document selection — the "keep the BEST
    copy" stage of a dedup pipeline (C4/RefinedWeb keep-best convention),
    replacing :func:`dedup_clusters`'s min-id pick with an argmax over a
    per-document score.

    ``pairs`` is a near-dup pair set; ``scores`` maps ``id_col`` → a
    scalar ``score_col``.  Emits one row per cluster:
    ``(cluster_id, n_docs, canonical_id, canonical_score)`` where
    ``cluster_id`` = component-min id, ``canonical_id`` = the member with
    the highest score (ties broken by MIN id — fully deterministic, so no
    ``max_by``, whose tie winner is partition-order-dependent).

    Plan shape (scales to 100 TB): components over the pair graph (see
    module docstring), then every join/aggregate is keyed by cluster id
    over CLUSTER-cardinality rows — the corpus-sized ``scores`` relation
    is touched once, semi-joined down to cluster members before any
    per-cluster work.  The argmax is max-then-filter-then-min: two
    map-side-combined aggregates, no window, no sort.
    """
    comp = connected_components(pairs, src, dst)
    members = comp.join(
        scores.select(F.col(id_col).alias("id"), F.col(score_col).alias("__s")),
        "id",
    )
    best = members.groupBy(F.col("comp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("__s").alias("canonical_score"),
    )
    bs = best.select(
        F.col("comp").alias("__bc"), F.col("canonical_score").alias("__bs")
    )
    winners = (
        members.join(
            bs, (members["comp"] == bs["__bc"]) & (members["__s"] == bs["__bs"])
        )
        .select("comp", "id")
        .groupBy("comp")
        .agg(F.min("id").alias("canonical_id"))
    )
    return (
        best.join(winners, "comp")
        .select(
            F.col("comp").alias("cluster_id"),
            "n_docs",
            "canonical_id",
            "canonical_score",
        )
    )
