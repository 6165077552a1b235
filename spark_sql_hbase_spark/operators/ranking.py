"""BM25 relevance scoring over a document corpus — the standard lexical
ranking/topical-filter primitive for corpus curation (score docs against
a term set, keep/weight by relevance).

Okapi BM25 (public formula; Robertson & Zaragoza 2009):

    score(d, Q) = Σ_{t∈Q} idf(t) · tf(t,d)·(k1+1) /
                              (tf(t,d) + k1·(1 - b + b·|d|/avgdl))
    idf(t) = ln( (N - df(t) + 0.5) / (df(t) + 0.5) + 1 )

Plan shape (scales to 100 TB):

- per-term tf and the doc length come from codegen'd boundary-anchored
  ``regexp_count`` passes over the text (round 14 — previously an
  interpreted HOF ``filter`` over the token array + an explode +
  per-(doc, term) count aggregate with its exchange); the (doc, term,
  tf) relation is emitted ROW-LOCALLY by a posexplode over the per-doc
  count array, so the only exchanges left are the tiny df/stats
  aggregates and the final per-doc score sum.
- df(t) and N/avgdl are two map-side-combined aggregates; df joins back
  over the query-term rows only (bounded by |Q| · docs-with-term).
- No UDF anywhere; every expression is JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_sql_hbase_spark.functions.texthash import (
    term_token_count,
    token_count,
    tokens,
)


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """(id, score) for every document matching ≥1 query term.

    Round 14: tf per query term is a codegen'd boundary-anchored
    ``regexp_count`` (``term_token_count``) and dl is the native token
    count — identical integers to the old interpreted
    ``filter``-the-token-array + explode + count form (duplicate query
    terms collapse, exactly as HOF filtering collapsed them), pinned by
    ``test_bm25_regex_matches_hof``.  The (id, term, tf) relation comes
    from a row-local posexplode over the per-doc count array, so the
    per-(doc, term) count aggregate and its exchange are gone.

    Round-14 batch 5: per-term document frequencies fold into the SAME
    one-row stats aggregate (``df(t_i) = Σ_docs (qcnt[i] > 0)`` — each
    doc contributes one qcnt row, so the sum IS the distinct-doc count),
    replacing ``tf.groupBy(term).agg(countDistinct(id))`` — which paid a
    corpus-cardinality (term, id) distinct exchange PAIR — plus its
    broadcast join.  The tf branch then reads df by position from the
    broadcast stats row.  Exact integer equality by construction;
    interleaved A/B at sf0.1 (6 reps): 0.971 s → 0.787 s median (−19%);
    outputs identical at sf0.001/0.01/0.1."""
    terms = [t for t in dict.fromkeys(query_terms)]
    # per-doc length + per-query-term counts for EVERY doc — cached so
    # the corpus stats aggregate and the tf branch share ONE scan
    # (round 4); the cached frame holds |Q|+1 ints per doc.
    per_doc_all = docs.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).alias("dl"),
        F.array(*[term_token_count(F.col(text_col), [t]) for t in terms])
        .alias("qcnt")
        if terms
        else F.array().cast("array<int>").alias("qcnt"),
    ).cache()
    stats = per_doc_all.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
        F.array(
            *[F.sum((F.col("qcnt")[i] > 0).cast("long")) for i in range(len(terms))]
        ).alias("dfs")
        if terms
        else F.array().cast("array<long>").alias("dfs"),
    )
    tf = (
        per_doc_all.select("id", "dl", F.posexplode("qcnt").alias("pos", "tf"))
        .filter(F.col("tf") > 0)
        .select("id", "dl", "pos", F.col("tf").cast("long").alias("tf"))
    )

    scored = (
        tf.crossJoin(F.broadcast(stats))
        .withColumn("df", F.element_at(F.col("dfs"), F.col("pos") + 1))
        .withColumn("avgdl", F.col("total_len") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return scored.groupBy("id").agg(
        F.round(F.sum("part"), round_to).alias("score")
    )


def unigram_surprisal(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Per-document mean unigram surprisal under the corpus's own unigram
    distribution: mean over token occurrences of ``-ln(c_t / N)`` where
    ``c_t`` is the corpus count of term t and N the corpus token count.

    The classic rare-token quality signal (a cheap LM-free stand-in for
    perplexity scoring): LOW = boilerplate/common-word text, HIGH =
    rare-token-heavy text.  Emits (id, n_tokens, surprisal) for documents
    with ≥1 token.

    Plan shape (scales to 100 TB — ONE corpus scan total):
    - tokenize + explode to (doc, term, tf) via one map-side-combined
      aggregate — the shuffle carries (doc, DISTINCT-term) pairs; this is
      the only subtree that reads ``docs``;
    - corpus term counts derive from ``tf`` itself (``Σ tf`` per term — a
      vocabulary-cardinality aggregate over already-aggregated rows), and
      the corpus token total derives from ``counts`` (tiny) — Catalyst's
      ReuseExchange collapses the three references to ``tf`` onto one
      scan+shuffle (pinned by ``test_plans.py``), so the corpus is read
      and tokenized exactly once;
    - no broadcast of an unbounded vocabulary anywhere; the per-doc
      combine is Σ tf·(-ln(c_t/N)) / dl over the doc's distinct terms.
      Same determinism contract as :func:`bm25_scores` (ln +
      ROUND(round_to) — driver-green precedent).
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        # Generate barrier: dl and the explode both reference the token
        # array — a plain alias would tokenize twice per row (round 4)
        F.explode(F.array(tokens(F.col(text_col)))).alias("tok"),
    )
    tf = (
        toks.select("id", F.size("tok").alias("dl"), F.explode("tok").alias("term"))
        .groupBy("id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    counts = tf.groupBy("term").agg(F.sum("tf").alias("ct"))
    total = counts.agg(F.sum("ct").alias("n_total"))
    return (
        tf.join(counts, "term")
        .crossJoin(F.broadcast(total))
        .withColumn("part", F.col("tf") * -F.log(F.col("ct") / F.col("n_total")))
        .groupBy("id", "dl")
        .agg(F.round(F.sum("part") / F.col("dl"), round_to).alias("surprisal"))
        .select("id", F.col("dl").cast("long").alias("n_tokens"), "surprisal")
    )


def unigram_surprisal_sql(
    table: str, id_expr: str, tokens_expr: str, round_to: int = 4
) -> str:
    """DuckDB twin of :func:`unigram_surprisal` (oracle generator)."""
    return f"""
    WITH __tok AS (
        SELECT {id_expr} AS id, {tokens_expr} AS tok FROM {table}
    ), __tf AS (
        SELECT id, len(tok) AS dl, unnest(tok) AS term FROM __tok
    ), __g AS (
        SELECT id, dl, term, COUNT(*) AS tf FROM __tf GROUP BY 1, 2, 3
    ), __ct AS (
        SELECT term, COUNT(*) AS ct FROM __tf GROUP BY 1
    ), __n AS (
        SELECT SUM(len(tok)) AS n_total FROM __tok
    )
    SELECT id,
           CAST(dl AS BIGINT) AS n_tokens,
           ROUND(SUM(tf * -ln(ct * 1.0 / n_total)) / dl, {round_to})
               AS surprisal
    FROM __g JOIN __ct USING (term), __n
    GROUP BY id, dl
    """


def bm25_sql(
    table: str,
    id_expr: str,
    tokens_expr: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`bm25_scores` (oracle generator)."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
    WITH __tok AS (
        SELECT {id_expr} AS id, {tokens_expr} AS tok FROM {table}
    ), __stats AS (
        SELECT COUNT(*) AS n_docs,
               SUM(len(tok)) * 1.0 / COUNT(*) AS avgdl
        FROM __tok
    ), __terms AS (
        SELECT id, len(tok) AS dl,
               unnest(list_filter(tok, x -> list_contains([{terms}], x))) AS term
        FROM __tok
    ), __tf AS (
        SELECT id, dl, term, COUNT(*) AS tf
        FROM __terms
        GROUP BY 1, 2, 3
    ), __df AS (
        SELECT term, COUNT(DISTINCT id) AS df FROM __tf GROUP BY 1
    )
    SELECT id,
           ROUND(SUM(
               ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * ({k1} + 1))
               / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))
           ), {round_to}) AS score
    FROM __tf JOIN __df USING (term), __stats
    GROUP BY id
    """


def doc_ngram_tf(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Per-document word-``n``-gram frequencies ``(id, nn, ng, tf)`` —
    THE n-gram construction law (tokenize bound once behind a Generate
    barrier, lambda-free ``arrays_zip`` over ``n`` shifted slices, one
    map-side-combined aggregate), generalizing the r13 bigram law so
    every gram order shares ONE construction (r13 VERDICT item 6):
    :func:`doc_bigram_tf` is the ``n=2`` specialization, and the
    Gopher top-n-gram rules consume ``n=3,4`` directly.  ``nn`` is the
    doc's total gram count (``max(len(tokens) - n + 1, 0)``).  Returned
    UNCACHED — multi-consumer callers cache it themselves.

    Scale: row-local construction, one shuffle keyed (id, gram) with
    map-side combine — identical cost law at every ``n``."""
    if n < 2:
        raise ValueError(f"n-gram order must be >= 2, got {n}")
    bound = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(tokens(F.col(text_col)))).alias("__tok"),
    )
    m = F.size("__tok") - (n - 1)
    fields = ",".join(f"`{i}`:string" for i in range(n))
    grams = F.when(
        F.size("__tok") >= n,
        F.arrays_zip(*[F.slice("__tok", i + 1, m) for i in range(n)]),
    ).otherwise(F.expr(f"CAST(array() AS array<struct<{fields}>>)"))
    return (
        bound.select(
            "id",
            F.size(grams).cast("long").alias("nn"),
            F.explode(grams).alias("pr"),
        )
        .select(
            "id",
            "nn",
            F.concat_ws(" ", *[f"pr.{i}" for i in range(n)]).alias("ng"),
        )
        .groupBy("id", "nn", "ng")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_ngram_tf_sql(
    table: str, id_expr: str, tokens_expr: str, n: int
) -> str:
    """DuckDB twin of :func:`doc_ngram_tf` (selects
    ``(id, nn, ng, tf)``) — one generalized fragment behind
    :func:`doc_bigram_tf_sql` and the Gopher n-gram oracles."""
    if n < 2:
        raise ValueError(f"n-gram order must be >= 2, got {n}")
    gram = " || ' ' || ".join(f"t[__i + {i + 1}]" for i in range(n))
    return f"""
        SELECT id, nn, ng, COUNT(*) AS tf FROM (
            SELECT id, len(g) AS nn, unnest(g) AS ng FROM (
                SELECT id,
                       CASE WHEN len(t) >= {n} THEN
                           [{gram}
                            for __i in range(0, len(t) - {n - 1})]
                       ELSE [] END AS g
                FROM (SELECT {id_expr} AS id, {tokens_expr} AS t
                      FROM {table})
            )
        ) GROUP BY 1, 2, 3
    """


def doc_bigram_tf(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document word-bigram frequencies ``(id, n2, bg, tf)`` — the
    ``n=2`` specialization of :func:`doc_ngram_tf` (ONE construction
    law — r13 review precedent, generalized in r14), kept under its
    historical column names for the existing consumers
    (:func:`bigram_surprisal`,
    :func:`~spark_sql_hbase_spark.operators.text.doc_repetition`)."""
    return (
        doc_ngram_tf(docs, id_col, text_col, 2)
        .withColumnRenamed("nn", "n2")
        .withColumnRenamed("ng", "bg")
    )


def doc_bigram_tf_sql(table: str, id_expr: str, tokens_expr: str) -> str:
    """DuckDB twin of :func:`doc_bigram_tf` — the ``n=2``
    specialization of :func:`doc_ngram_tf_sql` under the historical
    column names (selects ``(id, n2, bg, tf)``)."""
    inner = doc_ngram_tf_sql(table, id_expr, tokens_expr, 2)
    return f"""
        SELECT id, nn AS n2, ng AS bg, tf FROM ({inner})
    """


def bigram_surprisal(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: float = 1.0,
    round_to: int = 4,
) -> DataFrame:
    """Per-document mean BIGRAM surprisal under the corpus's own add-k
    smoothed bigram LM: mean over bigram occurrences of
    ``-ln((c(w1 w2) + k) / (ctx(w1) + k·V))`` where ``c`` is the corpus
    bigram count, ``ctx(w1) = Σ_w2 c(w1 w2)`` the context count, and
    ``V`` the number of distinct successor types.  One tier above
    :func:`unigram_surprisal` as a fluency signal (word-order-sensitive
    — shuffled text scores high even when its unigram mix looks fine);
    the LM-free stand-in for perplexity filtering.  Emits (id,
    n_bigrams, bigram_surprisal) for documents with ≥ 2 tokens.

    Plan shape (scales to 100 TB — ONE corpus scan): the only corpus
    read builds per-doc bigram frequencies ``tf2`` (tokenize bound once
    behind a Generate barrier, lambda-free ``arrays_zip`` bigrams, one
    map-side-combined aggregate), which is CACHED — the repo's standard
    treatment for a multi-consumer corpus-scale intermediate (PERF.md
    item 4; same as the LSH band-key cache).  An uncached formulation
    cannot share the scan: Catalyst rewrites each downstream
    sum-of-count aggregate into a direct count over the raw rows
    (cheaper per branch, but four different subtrees → ReuseExchange
    never matches; measured 4 corpus scans).  Everything derives from
    the cached ``tf2``: corpus bigram counts ``c2``
    (bigram-vocabulary cardinality, Heaps-sublinear), context counts
    ``ctx`` (Σ over c2), the scalar ``V`` — joins run on
    already-hash-partitioned keys; nothing unbounded is broadcast.
    Determinism contract as :func:`bm25_scores` (ln + ROUND).

    Cache contract (ADVICE r4): ``tf2`` stays in executor storage for
    the session — callers invoking this repeatedly should
    ``spark.catalog.clearCache()`` (or unpersist) between invocations,
    the same contract :func:`~spark_sql_hbase_spark.operators.dedup.
    duplicate_spans` and the LSH band caches carry.
    """
    from pyspark.sql import functions as F2

    tf2 = doc_bigram_tf(docs, id_col, text_col).cache()
    c2 = tf2.groupBy("bg").agg(F.sum("tf").alias("ct2"))
    c2s = c2.select(
        "bg",
        "ct2",
        F.substring_index("bg", " ", 1).alias("w1"),
        F.substring_index("bg", " ", -1).alias("w2"),
    )
    ctx = c2s.groupBy("w1").agg(F.sum("ct2").alias("c1"))
    v = c2s.agg(F2.countDistinct("w2").alias("v"))
    part = F.col("tf") * -F.log(
        (F.col("ct2") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v"))
    )
    return (
        tf2.withColumn("w1", F.substring_index("bg", " ", 1))
        .join(c2, "bg")
        .join(ctx, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("id", "n2")
        .agg(F.round(F.sum(part) / F.col("n2"), round_to).alias("bigram_surprisal"))
        .select("id", F.col("n2").alias("n_bigrams"), "bigram_surprisal")
    )


def bigram_surprisal_sql(
    table: str, id_expr: str, tokens_expr: str, k: float = 1.0, round_to: int = 4
) -> str:
    """DuckDB twin of :func:`bigram_surprisal` (oracle generator) —
    composes the shared bigram law :func:`doc_bigram_tf_sql`."""
    return f"""
    WITH __tf2 AS (
        {doc_bigram_tf_sql(table, id_expr, tokens_expr)}
    ), __c2 AS (
        SELECT bg, SUM(tf) AS ct2 FROM __tf2 GROUP BY 1
    ), __c2s AS (
        SELECT bg, ct2,
               split_part(bg, ' ', 1) AS w1,
               split_part(bg, ' ', 2) AS w2
        FROM __c2
    ), __ctx AS (
        SELECT w1, SUM(ct2) AS c1 FROM __c2s GROUP BY 1
    ), __v AS (
        SELECT COUNT(DISTINCT w2) AS v FROM __c2s
    )
    SELECT id,
           CAST(n2 AS BIGINT) AS n_bigrams,
           ROUND(SUM(tf * -ln((ct2 + {k}) / (c1 + {k} * v))) / n2, {round_to})
               AS bigram_surprisal
    FROM __tf2
    JOIN __c2 USING (bg)
    JOIN __ctx ON __ctx.w1 = split_part(__tf2.bg, ' ', 1)
    CROSS JOIN __v
    GROUP BY id, n2
    """


def doc_feat_tf_jvm(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, dl, feat, tf) hashed-unigram counts per document — the
    pre-round-14 explode formulation (md5 per TOKEN, then a
    corpus-cardinality groupBy exchange).  Kept as the no-Python
    fallback and the parity anchor for :func:`doc_feat_tf`."""
    from spark_sql_hbase_spark.functions.texthash import word_hash

    toks = docs.select(
        F.col(id_col).alias("id"),
        # Generate barrier: dl and the explode both reference the array
        F.explode(F.array(tokens(F.col(text_col)))).alias("tok"),
    )
    return (
        toks.select("id", F.size("tok").alias("dl"), F.explode("tok").alias("term"))
        .select("id", "dl", (word_hash(F.col("term")) % n_buckets).alias("feat"))
        .groupBy("id", "dl", "feat")
        .agg(F.count(F.lit(1)).alias("tf"))
        # always true (md5 of a non-null term) — but the inner combine
        # join infers it on its branch only, which de-canonicalizes the
        # two tf subtrees and defeats ReuseExchange; stating it on tf
        # itself keeps the corpus at ONE scan
        .filter(F.col("feat").isNotNull())
    )


def doc_feat_tf(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, dl, feat, tf) hashed-unigram counts per document in ONE
    Arrow pass (round 14).

    Tokenization stays JVM (codegen ``split``+``array_remove`` — token
    parity by construction, the simhash precedent); the 56-bit md5 word
    hash is computed once per DISTINCT token per batch (``np.unique`` —
    Zipf vocabulary makes this a small fraction of the stream) and the
    per-(doc, feat) counts come from a numpy group-by, so the explode,
    the per-token md5, and the (id, feat)-cardinality partial/final
    aggregate exchange all disappear — each document sits wholly inside
    one Arrow row, so its counts are complete without any shuffle.
    Identical integers to :func:`doc_feat_tf_jvm`
    (``test_doc_feat_tf_arrow_matches_jvm``); docs with zero tokens are
    dropped in both forms."""
    import hashlib
    import itertools

    import numpy as np
    import pandas as pd

    from spark_sql_hbase_spark.operators.dedup import _parallelized

    id_type = docs.schema[id_col].dataType.simpleString()
    toks = _parallelized(docs).select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t")
    )

    def gen(batches):
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
            uniq, inv = np.unique(flat, return_inverse=True)
            uh = np.fromiter(
                (
                    int(hashlib.md5(w.encode("utf-8")).hexdigest()[:14], 16)
                    for w in uniq
                ),
                dtype=np.int64,
                count=len(uniq),
            )
            feat = uh % n_buckets  # word_hash is 56-bit positive: % == pmod
            doc_idx = np.repeat(np.arange(len(ids)), lens)
            # group (doc, feat) pairs: count multiplicities
            pairs = doc_idx.astype(np.int64) * n_buckets + feat[inv]
            upairs, counts = np.unique(pairs, return_counts=True)
            out_doc = upairs // n_buckets
            yield pd.DataFrame(
                {
                    "id": ids[out_doc],
                    "dl": lens[out_doc].astype(np.int32),
                    "feat": (upairs % n_buckets),
                    "tf": counts,
                }
            )

    return toks.mapInPandas(
        gen, f"id {id_type}, dl int, feat bigint, tf bigint"
    )


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 1024,
    round_to: int = 4,
) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how target-domain-like its hashed-feature distribution
    is — per-doc mean over token occurrences of ``ln p(f) − ln q(f)``,
    where ``p`` is the add-1-smoothed hashed-unigram distribution of the
    TARGET set, ``q`` that of the raw corpus, and ``f = word_hash(token)
    mod n_buckets``.  High = looks like the target domain (select it);
    the paper resamples ∝ exp(weight) — downstream, feed the score to
    :func:`~spark_sql_hbase_spark.operators.text.quality_mix_plan` /
    ``budget_sample`` buckets for the deterministic analogue.  (The
    paper sums log-ratios; we report the length-normalized mean, the
    repo's surprisal convention, so the signal is length-insensitive.)

    Emits (id, n_tokens, importance) for raw documents with ≥ 1 token.

    Scale shape — BETTER than the surprisal family because hashing
    bounds the feature space: the log-ratio relation has exactly
    ``n_buckets`` rows regardless of corpus size, so the per-doc combine
    is a BROADCAST join onto the (doc, feature, tf) aggregate — no
    vocabulary-cardinality shuffle anywhere.  One scan of the raw corpus
    (its feature counts derive from the per-doc tf, the t11 discipline;
    ReuseExchange collapses the references) + one scan of the (much
    smaller) target set.  Determinism: ln + ROUND(round_to), the
    bm25/surprisal driver-green precedent.
    """
    # Round 14 negative result (measured, kept as-is): the Arrow twin
    # (:func:`doc_feat_tf` — md5 per distinct token, counts in numpy, no
    # (id, feat) exchange) measured FLAT against this explode form
    # (1.017 vs 1.041 median interleaved) while costing an explicit
    # .cache() of the tf relation — this shape gets the two-consumer
    # sharing for free via ReuseExchange and keeps Python out of the
    # plan.  The twin stays parity-pinned
    # (``test_doc_feat_tf_arrow_matches_jvm``) for scales where the
    # exchange dominates.
    tf = doc_feat_tf_jvm(docs, id_col, text_col, n_buckets)
    from pyspark.sql import Window

    # totals via unpartitioned windows over the BOUNDED count relations
    # (≤ n_buckets rows — the z62 pattern): no extra aggregate branches,
    # so ReuseExchange keeps the corpus at ONE scan for the raw side
    w_all = Window.partitionBy()
    raw_ct = (
        tf.groupBy("feat")
        .agg(F.sum("tf").alias("cq"))
        .withColumn("nq", F.sum("cq").over(w_all))
    )
    from spark_sql_hbase_spark.functions.texthash import word_hash

    tgt_ct = (
        target.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .select((word_hash(F.col("term")) % n_buckets).alias("feat"))
        .groupBy("feat")
        .agg(F.count(F.lit(1)).alias("cp"))
        .withColumn("np", F.sum("cp").over(w_all))
    )
    ratio = (
        raw_ct.join(tgt_ct, "feat", "left")
        .withColumn("np", F.coalesce(F.max("np").over(w_all), F.lit(0)))
        .select(
            "feat",
            (
                F.log(
                    (F.coalesce(F.col("cp"), F.lit(0)) + 1)
                    / (F.col("np") + F.lit(n_buckets))
                )
                - F.log((F.col("cq") + 1) / (F.col("nq") + F.lit(n_buckets)))
            ).alias("logratio"),
        )
    )
    return (
        tf.join(F.broadcast(ratio), "feat")
        .groupBy("id", "dl")
        .agg(F.round(F.sum(F.col("tf") * F.col("logratio")) / F.col("dl"), round_to).alias("importance"))
        .select("id", F.col("dl").cast("long").alias("n_tokens"), "importance")
    )


def dsir_importance_sql(
    table: str,
    id_expr: str,
    tokens_expr: str,
    target_pred: str,
    n_buckets: int = 1024,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`dsir_importance` — ``target_pred`` is the SQL
    predicate selecting the target rows of ``table``."""
    from spark_sql_hbase_spark.functions.texthash import word_hash_sql

    fh = word_hash_sql("term") + f" % {n_buckets}"
    return f"""
    WITH __tok AS (
        SELECT {id_expr} AS id, ({target_pred}) AS is_tgt,
               {tokens_expr} AS tok FROM {table}
    ), __tf AS (
        SELECT id, dl, feat, COUNT(*) AS tf FROM (
            SELECT id, len(tok) AS dl, {fh} AS feat
            FROM (SELECT id, tok, unnest(tok) AS term FROM __tok)
        ) GROUP BY 1, 2, 3
    ), __cq AS (
        SELECT feat, SUM(tf) AS cq FROM __tf GROUP BY 1
    ), __nq AS (
        SELECT SUM(cq) AS nq FROM __cq
    ), __cp AS (
        SELECT feat, COUNT(*) AS cp FROM (
            SELECT {fh} AS feat
            FROM (SELECT unnest(tok) AS term FROM __tok WHERE is_tgt)
        ) GROUP BY 1
    ), __np AS (
        SELECT SUM(cp) AS np FROM __cp
    ), __r AS (
        SELECT __cq.feat,
               ln((COALESCE(cp, 0) + 1) * 1.0 / (np + {n_buckets}))
               - ln((cq + 1) * 1.0 / (nq + {n_buckets})) AS logratio
        FROM __cq LEFT JOIN __cp USING (feat), __nq, __np
    )
    SELECT id, CAST(dl AS BIGINT) AS n_tokens,
           ROUND(SUM(tf * logratio) / dl, {round_to}) AS importance
    FROM __tf JOIN __r USING (feat)
    GROUP BY id, dl
    """


def cms_placed(docs: DataFrame, text_col: str, depth: int, width: int) -> DataFrame:
    """(term, row, bucket) placements of the token stream into the
    count-min grid — the ONE hash law shared by the batch operator and
    the streaming sketch (their bit-identical-counters contract depends
    on this staying a single definition)."""
    from spark_sql_hbase_spark.functions.texthash import word_hash

    terms = docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                (word_hash(F.concat(F.lit(f"cms{r}:"), F.col("term"))) % width)
                .cast("int")
                .alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return terms.select("term", F.explode(rows).alias("rb")).select(
        "term", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )


def cms_cand_partials(
    docs: DataFrame, text_col: str, depth: int, width: int
) -> DataFrame:
    """Per-batch partial (term, row, bucket, tc) counts of the token
    stream under the :func:`cms_placed` hash law, in ONE Arrow pass
    (round 14): term counts via ``np.unique`` over the batch's token
    stream, then ``depth`` md5 placements per DISTINCT term (the JVM
    explode form pays depth md5s per TOKEN).  A downstream
    ``groupBy(term, row, bucket).sum`` over these partials equals the
    explode form's exact counts — the hash law is replayed
    byte-identically (``f"cms{r}:" + term`` md5, first 14 hex digits,
    ``% width`` on the positive 56-bit value), pinned by
    ``test_cms_cand_arrow_matches_jvm``."""
    import hashlib
    import itertools

    import numpy as np
    import pandas as pd

    from spark_sql_hbase_spark.operators.dedup import _parallelized

    toks = _parallelized(docs).select(tokens(F.col(text_col)).alias("t"))

    def gen(batches):
        for pdf in batches:
            tok_lists = [t for t in pdf["t"] if len(t)]
            if not tok_lists:
                continue
            flat = np.asarray(
                list(itertools.chain.from_iterable(tok_lists)), dtype=object
            )
            uniq, counts = np.unique(flat, return_counts=True)
            n = len(uniq)
            buckets = np.empty((depth, n), dtype=np.int64)
            for r in range(depth):
                pre = f"cms{r}:".encode("utf-8")
                buckets[r] = np.fromiter(
                    (
                        int(
                            hashlib.md5(pre + w.encode("utf-8")).hexdigest()[:14],
                            16,
                        )
                        % width
                        for w in uniq
                    ),
                    dtype=np.int64,
                    count=n,
                )
            yield pd.DataFrame(
                {
                    "term": np.tile(uniq, depth),
                    "row": np.repeat(np.arange(depth, dtype=np.int32), n),
                    "bucket": buckets.reshape(-1).astype(np.int32),
                    "tc": np.tile(counts, depth),
                }
            )

    return toks.mapInPandas(gen, "term string, row int, bucket int, tc bigint")


def cms_heavy_hitters(
    docs: DataFrame,
    text_col: str,
    threshold: int | None = None,
    depth: int = 3,
    width: int = 512,
    threshold_ppm: int | None = None,
) -> DataFrame:
    """Count–min-sketch heavy hitters (Cormode & Muthukrishnan 2005, "An
    improved data stream summary: the count-min sketch and its
    applications", J. Algorithms — public): estimate per-term corpus
    frequencies through a ``depth × width`` counter grid (term t maps to
    one bucket per row via independent hashes; estimate = MIN over the
    rows' counters) and report every term whose ESTIMATE clears
    ``threshold``, alongside its exact count for the audit.

    Emits ``(term, est, true_ct)`` with the CMS guarantee
    ``est >= true_ct`` always (counters only over-count on collisions) —
    the over-report side is the deliberate trade: a heavy-hitter pass
    never misses a hot term.

    Plan shape (scales to 100 TB): the sketch itself is the point — its
    aggregate is BOUNDED at depth·width rows regardless of corpus size
    (map-side partial maps absorb the token stream; the exchange carries
    ≤ depth·width (row, bucket, partial) triples per map task, the
    production "count a 100 TB token stream in 3·512 longs" shape).  At
    scale the d×w grid is collected/broadcast and candidate terms probe
    it locally; this gate keeps the probe as a (row, bucket) equi-join so
    the whole flow stays one SQL-reproducible plan.  The exact-count side
    exists for the audit column only — a pure production run drops it and
    with it the vocabulary-cardinality aggregate (t09's accepted class).
    """
    # ONE corpus-scanning aggregate: per-(term,row,bucket) counts.
    # Round 14: the corpus pass is the Arrow partial counter
    # (cms_cand_partials — depth md5s per DISTINCT term per batch
    # instead of per token, no depth-way explode); the groupBy combines
    # the per-batch partials into the identical exact counts.  The
    # counter grid is a rollup of cand (Σ tc per (row,bucket) — vocab-
    # cardinality input, NOT a second corpus pass), and the always-true
    # filter keeps the two cand references canonicalization-identical so
    # ReuseExchange collapses them onto one scan+shuffle (z63 precedent:
    # the join-side isnotnull inference otherwise defeats the reuse).
    cand = (
        cms_cand_partials(docs, text_col, depth, width)
        .groupBy("term", "row", "bucket")
        .agg(F.sum("tc").alias("tc"))
        .filter(F.col("row").isNotNull() & F.col("bucket").isNotNull())
    )
    if (threshold is None) == (threshold_ppm is None):
        raise ValueError("pass exactly one of threshold / threshold_ppm")
    sketch = cand.groupBy("row", "bucket").agg(F.sum("tc").alias("c"))
    if threshold_ppm is not None:
        # relative threshold: est/n_total >= ppm/1e6, integer-exact.  The
        # stream total is recovered from the sketch itself (Σ of the
        # row-0 counters is the exact token count) via a window over the
        # BOUNDED depth·width grid — no third corpus-scanning reference,
        # no scalar cross join (either would de-canonicalize the shared
        # cand subtree and defeat ReuseExchange; z63 precedent).
        from pyspark.sql import Window as W

        sketch = sketch.withColumn(
            "n_total",
            F.sum(F.when(F.col("row") == 0, F.col("c"))).over(
                W.partitionBy()
            ),
        )
    probed = cand.join(sketch, ["row", "bucket"]).groupBy("term").agg(
        F.min("c").alias("est"),
        F.max("tc").alias("true_ct"),
        *([] if threshold_ppm is None else [F.min("n_total").alias("n_total")]),
    )
    if threshold is not None:
        kept = probed.filter(F.col("est") >= threshold)
    else:
        # decimal side-steps int64 overflow of est * 1e6 at very large
        # stream totals (a 100 TB token stream crosses ~9.2e12 counts)
        kept = probed.filter(
            F.col("est").cast("decimal(38,0)") * F.lit(1_000_000)
            >= F.col("n_total").cast("decimal(38,0)") * F.lit(int(threshold_ppm))
        )
    return kept.select(
        "term", "est", F.col("true_ct").cast("long").alias("true_ct")
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str,
    min_count: int = 5,
    top_k: int = 100,
    round_to: int = 4,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information (Church & Hanks
    1990, public): ``pmi(w1,w2) = ln( p(w1,w2) / (p(w1)·p(w2)) )`` over
    adjacent token pairs, with all probabilities taken from the bigram
    table's own marginals (``c1 = Σ_w2 c12``, ``c2 = Σ_w1 c12``,
    ``B = Σ c12``) — the self-consistent convention, so the whole
    statistic derives from ONE corpus aggregate.

    ``min_count`` suppresses the rare-pair noise PMI is notorious for;
    the top-k is deterministic (pmi desc, then w1, w2 — computed on the
    ROUNDED value so the cutoff is cross-engine stable).

    Plan shape (scales to 100 TB): the bigram count is the only
    corpus-scanning aggregate (shuffle carries (w1, w2, partial) — t13's
    accepted vocabulary-squared class, Heaps-sublinear in practice);
    marginals are WINDOWED integer sums over the cached bigram frame
    (partition by w1, then by w2 — two exchanges of the
    vocabulary-bounded frame), replacing the round-13 groupBy-marginal +
    double re-join formulation, which exchanged the frame four times
    (two marginal aggregates plus the two join re-partitions) and paid
    two sort-merge joins.  Marginals are exact long sums, so the window
    form is bit-identical by construction — no FP-order concern (unlike
    the float norms in :func:`tfidf_cosine_pairs`, pinned there).
    Interleaved A/B at sf0.1 (6 reps): 1.16 s → 0.86 s median (−26%);
    outputs identical at sf0.001/0.01/0.1.  The scalar total stays a
    broadcast one-row aggregate; the corpus is read and tokenized once;
    final ranking is TakeOrdered over the min_count survivors.  Cache
    contract as :func:`bigram_surprisal` (caller clears between
    repeated runs).
    """
    from pyspark.sql import Window as W2

    bound = docs.select(
        F.explode(F.array(tokens(F.col(text_col)))).alias("__tok")
    )
    m2 = F.size("__tok") - 1
    prs = F.when(
        F.size("__tok") >= 2,
        F.arrays_zip(F.slice("__tok", 1, m2), F.slice("__tok", 2, m2)),
    ).otherwise(F.expr("CAST(array() AS array<struct<`0`:string,`1`:string>>)"))
    big = (
        bound.select(F.explode(prs).alias("pr"))
        .select(F.col("pr.0").alias("w1"), F.col("pr.1").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .cache()
    )
    tot = big.agg(F.sum("c12").alias("b_total"))
    ratio = (F.col("c12").cast("double") * F.col("b_total")) / (
        F.col("c1").cast("double") * F.col("c2")
    )
    return (
        big.withColumn("c1", F.sum("c12").over(W2.partitionBy("w1")))
        .withColumn("c2", F.sum("c12").over(W2.partitionBy("w2")))
        .filter(F.col("c12") >= min_count)
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.round(F.log(ratio), round_to).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(top_k)
    )


def surprisal_buckets(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 4,
) -> DataFrame:
    """CCNet-style head/middle/tail partitioning (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data", public): documents split into LM-quality tertiles by their
    corpus-unigram surprisal — ``head`` = lowest-surprisal third (most
    fluent under the LM), ``tail`` = highest.  CCNet does this with a
    real LM's perplexity; the engine's LM-free twin rides
    :func:`unigram_surprisal`.

    Emits per-doc ``(id, n_tokens, surprisal, bucket)``.

    Plan shape (scales to 100 TB): surprisal once (cached — two
    consumers), tertile boundaries via ONE ``percentile_disc`` aggregate
    (exact data values, the t08 cross-engine-reproducible convention —
    never interpolated, so a doc AT a boundary cannot flip engines), the
    bucket label a row-local comparison against the broadcast scalar
    pair.  No window, no sort.  Cache contract as
    :func:`bigram_surprisal`.
    """
    s = unigram_surprisal(docs, id_col, text_col, round_to).cache()
    b = s.agg(
        F.expr(
            "percentile_disc(0.3333333333333333)"
            " WITHIN GROUP (ORDER BY surprisal)"
        ).alias("__b1"),
        F.expr(
            "percentile_disc(0.6666666666666666)"
            " WITHIN GROUP (ORDER BY surprisal)"
        ).alias("__b2"),
    )
    bucket = (
        F.when(F.col("surprisal") <= F.col("__b1"), F.lit("head"))
        .when(F.col("surprisal") <= F.col("__b2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return s.crossJoin(F.broadcast(b)).select(
        "id", "n_tokens", "surprisal", bucket.alias("bucket")
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.3,
    min_df: int = 2,
    max_df: int | None = None,
    round_to: int = 4,
) -> DataFrame:
    """All-pairs TF-IDF cosine similarity above ``threshold`` via an
    inverted-index self-join — the lexical-vector near-dup tier between
    shingle Jaccard (surface overlap) and embedding cosine (semantic):
    two docs score high when they share RARE vocabulary, not boilerplate.

    Weighting is the smoothed-idf convention
    ``w(t,d) = tf(t,d) · (ln((1+N)/(1+df(t))) + 1)`` with per-doc L2
    normalization over the kept terms, so the pair score is a true
    cosine in [0, 1].

    Emits ``(id_a, id_b, cos_sim, n_shared)`` with id_a < id_b.

    Plan shape (scales to 100 TB): ONE corpus scan builds the (doc,
    term, tf) aggregate (cached — three consumers: N, df, weights);
    everything else operates on vocabulary-bounded relations.  The L2
    norm is a windowed sum over the weighted relation partitioned by
    doc — ONE exchange of ``w`` by id instead of the groupBy-norms +
    re-join formulation, which exchanged ``w`` by id twice AND
    re-evaluated the whole tf→df→weight chain for the second consumer
    (round-14 measurement: the unfused chain put 12 InMemoryTableScans
    of the cached tf and 47 Exchanges in one plan).  The normalized
    weights ``wn`` are cached (managed) because the pair self-join
    reads them on BOTH sides — without it the chain runs once per
    side.  Interleaved A/B at sf0.1 (6 reps): 2.44 s → 1.13 s median
    (−54%); outputs bit-identical at sf0.001/0.01/0.1.
    The pair join is the posting-list self-join — per-term cost is
    df(t)², so the ``max_df`` cap is the scale lever: it drops
    stopword-grade terms whose posting lists would go quadratic (they
    carry ~zero idf weight anyway), exactly the band-size cap
    discipline of the LSH joins.  ``min_df=2`` is free pruning: a
    term in one doc cannot produce a pair.  Determinism: ln + final
    ROUND (the bm25 driver-green precedent)."""
    # single consumer of the token array → plain explode, no generate
    # barrier needed (unlike bm25, where dl and the explode both
    # reference it)
    from spark_sql_hbase_spark.operators.caching import managed_cache

    tf = managed_cache(
        docs.select(
            F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
        )
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf")),
        "tfidf_cosine_pairs.tf",
    )
    n_docs = tf.agg(F.countDistinct("id").alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("id").alias("df")).filter(
        F.col("df") >= min_df
    )
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    w = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "w",
            F.col("tf")
            * (F.log((1.0 + F.col("n_docs")) / (1 + F.col("df"))) + 1.0),
        )
    )
    from pyspark.sql import Window

    nrm = F.sqrt(F.sum(F.col("w") * F.col("w")).over(Window.partitionBy("id")))
    wn = managed_cache(
        w.select("id", "term", (F.col("w") / nrm).alias("wn")),
        "tfidf_cosine_pairs.wn",
    )
    a = wn.select(
        F.col("id").alias("id_a"), F.col("term").alias("term"), F.col("wn").alias("wa")
    )
    b = wn.select(
        F.col("id").alias("id_b"), F.col("term").alias("term"), F.col("wn").alias("wb")
    )
    return (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.round(F.sum(F.col("wa") * F.col("wb")), round_to).alias("cos_sim"),
            F.count(F.lit(1)).alias("n_shared"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def tfidf_cosine_sql(
    table: str,
    id_expr: str,
    tokens_expr: str,
    threshold: float = 0.3,
    min_df: int = 2,
    max_df: int | None = None,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`tfidf_cosine_pairs` (oracle generator)."""
    cap = f"AND COUNT(DISTINCT id) <= {max_df}" if max_df is not None else ""
    return f"""
    WITH __tok AS (
        SELECT {id_expr} AS id, {tokens_expr} AS tok FROM {table}
    ), __tf AS (
        SELECT id, term, COUNT(*) AS tf
        FROM (SELECT id, unnest(tok) AS term FROM __tok)
        GROUP BY 1, 2
    ), __n AS (
        SELECT COUNT(DISTINCT id) AS n_docs FROM __tf
    ), __df AS (
        SELECT term, COUNT(DISTINCT id) AS df FROM __tf
        GROUP BY 1
        HAVING COUNT(DISTINCT id) >= {min_df} {cap}
    ), __w AS (
        SELECT id, term,
               tf * (ln((1.0 + n_docs) / (1 + df)) + 1.0) AS w
        FROM __tf JOIN __df USING (term), __n
    ), __nrm AS (
        SELECT id, sqrt(SUM(w * w)) AS nrm FROM __w GROUP BY 1
    ), __wn AS (
        SELECT id, term, w / nrm AS wn FROM __w JOIN __nrm USING (id)
    )
    SELECT a.id AS id_a, b.id AS id_b,
           ROUND(SUM(a.wn * b.wn), {round_to}) AS cos_sim,
           COUNT(*) AS n_shared
    FROM __wn a JOIN __wn b ON a.term = b.term AND a.id < b.id
    GROUP BY 1, 2
    HAVING ROUND(SUM(a.wn * b.wn), {round_to}) >= {threshold}
    """


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal rank fusion of N ranked retrieval lists (Cormack,
    Clarke & Buettcher, SIGIR 2009 — public): the standard hybrid-search
    combiner for lexical (BM25) + semantic (ANN) candidate lists, which
    needs only RANKS (scores from different retrievers aren't
    comparable; RRF dodges score normalization entirely).

        rrf(q, d) = Σ_lists 1 / (k + rank_list(q, d))

    Each input carries ``(query_col, id_col, rank_col)``; a document
    missing from a list simply contributes nothing (no outer-join NULL
    handling — absence IS the zero term).  A document appearing MORE
    THAN ONCE within one list (e.g. a list concatenated from per-shard
    top-k results) collapses to its BEST rank in that list first —
    otherwise the duplicate would both inflate ``rrf`` and miscount
    ``n_lists`` as extra-list presence (r13 review fix).  Emits
    ``(query_id, doc_id, n_lists, rrf, rank)``; ``topk`` keeps the
    fused head per query.

    Determinism: the fused score is ROUNDED before ranking and ties
    break on ``id_col``, so Spark and the SQL twin rank identically.

    Plan shape (scales to 100 TB): UNION ALL of the (already small,
    per-query top-k) candidate lists + ONE map-side-combinable
    aggregate on (query, doc) + a per-query ranking window — one
    shuffle of candidate-list rows, no join, the corpus is never
    touched (fusion consumes retriever OUTPUT, which is k rows per
    query per list)."""
    from pyspark.sql import Window as W

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranked list")
    if k <= 0:
        # k=0 with a rank-1 hit would divide by zero mid-plan; the
        # published constant is 60 and any positive value is valid
        raise ValueError(f"rrf k must be positive, got {k}")
    parts = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            F.col(rank_col).cast("long").alias("__r"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.min("__r").alias("__r"))
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_lists"),
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("__r"))), round_to
        ).alias("rrf"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id")
    )
    out = fused.withColumn("rank", F.row_number().over(w))
    if topk is not None:
        out = out.filter(F.col("rank") <= topk)
    return out


def rrf_fuse_sql(
    list_sqls: list[str],
    k: int = 60,
    topk: int | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`rrf_fuse` (oracle generator): each entry of
    ``list_sqls`` must select ``(query_id, doc_id, rank)``."""
    union = "\n        UNION ALL\n".join(
        # within-list duplicates collapse to their best rank, mirroring
        # the operator (r13 review fix)
        f"SELECT query_id, doc_id, MIN(rank) AS rank FROM ({s}) "
        "GROUP BY 1, 2"
        for s in list_sqls
    )
    head = f"WHERE rank <= {int(topk)}" if topk is not None else ""
    return f"""
    WITH __u AS (
        {union}
    ), __f AS (
        SELECT query_id, doc_id,
               CAST(COUNT(*) AS INTEGER) AS n_lists,
               ROUND(SUM(1.0 / ({int(k)} + rank)), {int(round_to)}) AS rrf
        FROM __u GROUP BY 1, 2
    )
    SELECT query_id, doc_id, n_lists, rrf, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY rrf DESC, doc_id
        ) AS INTEGER) AS rank
        FROM __f
    ) {head}
    """
