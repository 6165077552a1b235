"""BM25 relevance scoring over a document corpus — the standard lexical
ranking/topical-filter primitive for corpus curation (score docs against
a term set, keep/weight by relevance).

Okapi BM25 (public formula; Robertson & Zaragoza 2009):

    score(d, Q) = Σ_{t∈Q} idf(t) · tf(t,d)·(k1+1) /
                              (tf(t,d) + k1·(1 - b + b·|d|/avgdl))
    idf(t) = ln( (N - df(t) + 0.5) / (df(t) + 0.5) + 1 )

Plan shape (scales to 100 TB):

- tokenize once per doc (single-reference JVM expression), explode to
  (doc, term) pairs *restricted to query terms first* — the explode is
  filtered by ``array_intersect`` with the (tiny, broadcast-literal)
  query term array, so the shuffle carries only matching terms, not the
  corpus vocabulary.
- df(t) and N/avgdl are two map-side-combined aggregates; df joins back
  over the query-term rows only (bounded by |Q| · docs-with-term).
- No UDF anywhere; every expression is JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_sql_hbase_spark.functions.texthash import tokens


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """(id, score) for every document matching ≥1 query term."""
    q = F.array(*[F.lit(t) for t in query_terms])
    toks = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("tok")
    )
    # per-doc length + the query-term multiset restricted to this doc
    per_doc = toks.select(
        "id",
        F.size("tok").alias("dl"),
        F.filter("tok", lambda t: F.array_contains(q, t)).alias("qtok"),
    ).filter(F.size("qtok") > 0)
    tf = per_doc.select(
        "id", "dl", F.explode("qtok").alias("term")
    ).groupBy("id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))

    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(F.size("tok")).alias("total_len")
    )
    df_t = tf.groupBy("term").agg(F.countDistinct("id").alias("df"))

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
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
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("tok")
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
