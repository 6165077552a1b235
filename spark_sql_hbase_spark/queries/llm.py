"""LLM-data-pipeline query pack: deduplication, similarity search, text
analysis, multimodal columns — over the ``documents`` / ``embeddings``
tables. These are the beyond-reference operators (SURVEY §7.1 item 5 /
BASELINE.json north star), each with a DuckDB oracle built from the same
cross-engine-deterministic primitives (functions/texthash.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_hbase_spark.functions.texthash import (
    SIMHASH_BITS,
    rolling_hash_sql,
    shingles_sql,
    simhash_sql,
    stopword_count_sql,
    tokens_sql,
)
from spark_sql_hbase_spark.operators import dedup, graph, multimodal, similarity, text
from spark_sql_hbase_spark.queries import register, table

JACCARD_T = 0.6
SHINGLE_N = 3

_TOK = tokens_sql("text")

_SHINGLE_CTES = f"""
    WITH __tok AS (
        SELECT doc_id, {_TOK} AS t FROM documents
    ), __sh AS (
        SELECT doc_id,
               CASE WHEN len(t) >= {SHINGLE_N} THEN list_distinct(
                   [t[__i+1] || ' ' || t[__i+2] || ' ' || t[__i+3]
                    for __i in range(0, len(t) - {SHINGLE_N} + 1)])
               ELSE [] END AS s
        FROM __tok
    ), __sizes AS (
        SELECT doc_id, len(s) AS n FROM __sh WHERE len(s) > 0
    ), __inv AS (
        SELECT doc_id, unnest(s) AS g FROM __sh
    ), __pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM __inv a JOIN __inv b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
"""

_JACCARD_ORACLE = f"""{_SHINGLE_CTES}
    SELECT id_a, id_b,
           ROUND(inter * 1.0 / (na.n + nb.n - inter), 4) AS jac
    FROM __pairs
    JOIN __sizes na ON id_a = na.doc_id
    JOIN __sizes nb ON id_b = nb.doc_id
    WHERE ROUND(inter * 1.0 / (na.n + nb.n - inter), 4) >= {JACCARD_T}
"""


# ---------------------------------------------------------------------------
# z50 — exact dedup by content digest (demoted round 5; was d01: d02/d08/
# d09/d10/d11 keep the dedup family in-window; r1-r4 driver-green).
# ---------------------------------------------------------------------------
@register(
    "z50_exact_dedup",
    oracle="""
    SELECT sha256(text) AS text_sha,
           min(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY sha256(text)
    """,
    description="exact dedup: hash-groupBy on sha256(text), min-id representative",
)
def z50_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# z39 — exact n-gram Jaccard (demoted round 4; was d02_ngram: minhash keeps the near-dup family in-window) similarity join (inverted index).
# ---------------------------------------------------------------------------
@register(
    "z39_ngram_jaccard_join",
    oracle=_JACCARD_ORACLE,
    description="exact 3-gram shingle Jaccard self-join via inverted index",
)
def z39_ngram_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_join(docs, "doc_id", "text", JACCARD_T, SHINGLE_N)


# ---------------------------------------------------------------------------
# d03 — MinHash-LSH near-dup join; verified candidates → same contract as
# the exact join (recall loss < 1e-8 at t=0.6 with 64 bands × 2 rows).
# ---------------------------------------------------------------------------
@register(
    "zf01_minhash_lsh_neardup",
    oracle=_JACCARD_ORACLE,
    description="MinHash(128) + LSH(64×2) candidates + exact Jaccard verification",
)
def zf01_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_join(docs, "doc_id", "text", JACCARD_T, SHINGLE_N)


# ---------------------------------------------------------------------------
# d04 — SimHash fingerprints (60-bit, md5-vote).
# ---------------------------------------------------------------------------
@register(
    "z01_simhash_fingerprint",
    oracle=simhash_sql("documents", "doc_id", _TOK),
    description="per-document 60-bit simhash fingerprint (single-pass agg)",
)
def z01_simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    fp = dedup.simhash_fingerprints(docs, "doc_id", "text")
    return fp.select(F.col("id").alias("doc_id"), "simhash")


# ---------------------------------------------------------------------------
# z51 — SimHash near-dup pairs (hamming ≤ 3) via pigeonhole blocking
# (demoted round 5; was d05: d02 keeps near-dup in-window; r1-r4 green).
# ---------------------------------------------------------------------------
@register(
    "z51_simhash_neardup",
    oracle=f"""
    WITH __fp AS ({simhash_sql('documents', 'doc_id', _TOK)})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM __fp a JOIN __fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    description="simhash hamming≤3 pairs via segment blocking + popcount",
)
def z51_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.simhash_neardup(docs, "doc_id", "text", max_hamming=3, segments=4)


# ---------------------------------------------------------------------------
# z52 — embedding near-dup pairs within coarse cells (demoted round 5;
# was d06: s01-s08 keep the embedding-similarity family in-window).
# ---------------------------------------------------------------------------
@register(
    "z52_embedding_neardup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS cell,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 4) AS cos
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 4) >= 0.35
    """,
    description="embedding-cosine near-dup pairs, cell-blocked (IVF-style)",
)
def z52_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.embedding_neardup(emb, "vec_id", "embedding", "label", 0.35)


# ---------------------------------------------------------------------------
# zb08 (was s01) — brute-force exact ANN top-10 for a small query set.
# ---------------------------------------------------------------------------
@register(
    "zb08_ann_topk",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 8
    ), scored AS (
        SELECT query_id, vec_id AS neighbor_id,
               list_cosine_similarity(qv, embedding::DOUBLE[]) AS cos_raw
        FROM q, embeddings
        WHERE vec_id <> query_id
    )
    SELECT query_id, neighbor_id, ROUND(cos_raw, 4) AS cos,
           CAST(rn AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
        ) AS rn FROM scored
    ) WHERE rn <= 10
    """,
    description="brute-force cosine top-10 per query (broadcast query set)",
)
def zb08_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 8), "vec_id", "embedding", 10)


# ---------------------------------------------------------------------------
# zb09 (was s02) — IVF-style partition-pruned ANN top-5 (cell = label).
# ---------------------------------------------------------------------------
@register(
    "zb09_ann_partitioned",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, label AS cell, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 8
    ), scored AS (
        SELECT query_id, e.vec_id AS neighbor_id, e.label AS cell,
               list_cosine_similarity(qv, e.embedding::DOUBLE[]) AS cos_raw
        FROM q JOIN embeddings e ON q.cell = e.label
        WHERE e.vec_id <> query_id
    )
    SELECT query_id, neighbor_id, cell, ROUND(cos_raw, 4) AS cos,
           CAST(rn AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
        ) AS rn FROM scored
    ) WHERE rn <= 5
    """,
    description="IVF-style ANN: search pruned to the query's coarse cell",
)
def zb09_ann_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.partitioned_ann_topk(
        emb, emb.filter(F.col("vec_id") < 8), "vec_id", "embedding", "label", 5
    )


# ---------------------------------------------------------------------------
# zb15 (was t01) — language ID by stopword vote.
# ---------------------------------------------------------------------------
def _langid_oracle() -> str:
    from spark_sql_hbase_spark.functions.texthash import STOPWORDS

    langs = sorted(STOPWORDS)
    scores = ",\n           ".join(
        f"CAST({stopword_count_sql('t', lang)} AS INTEGER) AS s_{lang}" for lang in langs
    )
    g = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = f"CASE WHEN {g} = 0 THEN 'und' " + " ".join(
        f"WHEN s_{lang} = {g} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
    WITH __tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
    __sc AS (
        SELECT doc_id,
           {scores}
        FROM __tok
    )
    SELECT doc_id, s_de, s_en, s_es, s_fr, {case} AS pred_lang FROM __sc
    """


@register(
    "zb15_lang_id",
    oracle=_langid_oracle(),
    description="stopword-vote language ID (deterministic tie-break)",
)
def zb15_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.lang_id(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# zb16 (was t02) — quality scoring.
# ---------------------------------------------------------------------------
_QUALITY_ORACLE = f"""
    WITH __tok AS (
        SELECT doc_id, text, {_TOK} AS t FROM documents
    ), __feat AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_actual,
               CAST(len(t) AS BIGINT) AS n_tokens,
               COALESCE(list_sum(list_transform(t, x -> length(x))), 0) AS tok_chars,
               CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_punct,
               {stopword_count_sql('t', 'en')} AS sw
        FROM __tok
    ), __r AS (
        SELECT doc_id, n_chars_actual, n_tokens, sw,
               CASE WHEN n_tokens > 0
                    THEN CAST(tok_chars AS DOUBLE) / n_tokens ELSE 0.0 END AS mean_tok_len,
               n_punct,
               CASE WHEN n_tokens > 0
                    THEN CAST(sw AS DOUBLE) / n_tokens ELSE 0.0 END AS stopword_ratio,
               greatest(n_tokens, CAST(1 AS BIGINT)) AS d
        FROM __feat
    )
    SELECT doc_id, n_chars_actual, n_tokens, mean_tok_len, n_punct, stopword_ratio,
           CAST(2 * d * least(n_tokens, 100) - 100 * least(n_punct, d) + 100 * sw
               AS DOUBLE) / (200 * d) AS quality
    FROM __r
    """


@register(
    "zb16_quality_score",
    oracle=_QUALITY_ORACLE,
    description="heuristic doc quality features + composite score",
)
def zb16_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.quality_score(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# zb17 (was t03) — token statistics (whitespace + BPE-ish + distinct words).
# ---------------------------------------------------------------------------
@register(
    "zb17_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
               AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))
               AS BIGINT) AS n_bpe_tokens,
           CAST(len(list_distinct({_TOK})) AS BIGINT) AS n_distinct_words
    FROM documents
    """,
    description="whitespace / BPE-ish / distinct-word token counts",
)
def zb17_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.token_stats(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# z56 — rolling-hash document fingerprint (demoted round 5; was t04:
# t01-t03/t05-t14 keep text analysis in-window; d10's rolling window
# hashes evidence the same primitive).
# ---------------------------------------------------------------------------
@register(
    "z56_fingerprint",
    oracle=f"""
    SELECT doc_id, {rolling_hash_sql(_TOK)} AS fp FROM documents
    """,
    description="order-sensitive polynomial rolling hash over the token stream",
)
def z56_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.fingerprint(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# zb06 (was m01) — multimodal metadata extraction (mapInPandas over binary column).
# ---------------------------------------------------------------------------
@register(
    "zb06_media_metadata",
    oracle=multimodal.media_metadata_oracle_sql("documents"),
    description="binary media column → metadata via Arrow-batched mapInPandas "
    "(decode stubbed deterministically; container has no codecs)",
)
def zb06_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return multimodal.extract_media_metadata(with_payload, "doc_id", "payload")


# ---------------------------------------------------------------------------
# zb07 (was u01) — Python UDTF (PythonEvals / tableFunctionRegistry surface, SURVEY
# §2.B): context-window chunking — split each document's token stream into
# fixed 32-token chunks, one output row per chunk (lateral join).
#
# NOTE (VERDICT r4 #3): the per-row Python UDTF exists to exercise the
# UDTF surface itself; production chunking at corpus scale should ride
# the JVM expression path (tokenize + slice over a posexplode'd chunk
# index, zero Python) or Arrow-batched mapInPandas (operators/
# multimodal.py pattern) — both shapes this repo already ships.
# ---------------------------------------------------------------------------
CHUNK = 32


@register(
    "zb07_udtf_chunking",
    oracle=f"""
    WITH __tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
    __n AS (
        SELECT doc_id, t, CAST(CEIL(len(t) / {CHUNK}.0) AS INTEGER) AS n_chunks
        FROM __tok WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST(unnest(range(0, n_chunks)) AS INTEGER) AS chunk_id,
           list_aggregate(t[unnest(range(0, n_chunks)) * {CHUNK} + 1 :
                            least((unnest(range(0, n_chunks)) + 1) * {CHUNK}, len(t))],
                          'string_agg', ' ') AS chunk,
           CAST(least((unnest(range(0, n_chunks)) + 1) * {CHUNK}, len(t))
                - unnest(range(0, n_chunks)) * {CHUNK} AS INTEGER) AS n_tokens
    FROM __n
    """,
    description="Python UDTF: 32-token context-window chunking via LATERAL join",
)
def zb07_udtf_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_id int, chunk string, n_tokens int")
    class Chunker:
        def eval(self, doc_id, text):
            toks = [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
            for i in range(0, len(toks), CHUNK):
                piece = toks[i : i + CHUNK]
                yield doc_id, i // CHUNK, " ".join(piece), len(piece)

    spark.udtf.register("chunker", Chunker)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql("SELECT c.* FROM documents, LATERAL chunker(doc_id, text) c")


# ---------------------------------------------------------------------------
# zc09 — ARROW-optimized Python UDTF (round-6 addition): the same
# 32-token chunker as zb07, but with ``useArrow=True`` — rows cross the
# Python boundary as Arrow batches instead of pickled one-at-a-time
# (the UDTF analogue of the pandas-UDF fast path; this is the form a
# production UDTF should take when the logic genuinely needs Python).
# Same oracle as zb07 by construction: the Arrow transport must be
# semantically invisible.
# ---------------------------------------------------------------------------
@register(
    "u03_arrow_udtf_chunking",
    oracle=f"""
    WITH __tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
    __n AS (
        SELECT doc_id, t, CAST(CEIL(len(t) / {CHUNK}.0) AS INTEGER) AS n_chunks
        FROM __tok WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST(unnest(range(0, n_chunks)) AS INTEGER) AS chunk_id,
           list_aggregate(t[unnest(range(0, n_chunks)) * {CHUNK} + 1 :
                            least((unnest(range(0, n_chunks)) + 1) * {CHUNK}, len(t))],
                          'string_agg', ' ') AS chunk,
           CAST(least((unnest(range(0, n_chunks)) + 1) * {CHUNK}, len(t))
                - unnest(range(0, n_chunks)) * {CHUNK} AS INTEGER) AS n_tokens
    FROM __n
    """,
    description="Arrow-optimized Python UDTF: same chunker as zb07 over "
    "Arrow batch transport",
)
def u03_arrow_udtf_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id bigint, chunk_id int, chunk string, n_tokens int",
        useArrow=True,
    )
    class ArrowChunker:
        def eval(self, doc_id, text):
            toks = [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
            for i in range(0, len(toks), CHUNK):
                piece = toks[i : i + CHUNK]
                yield doc_id, i // CHUNK, " ".join(piece), len(piece)

    spark.udtf.register("arrow_chunker", ArrowChunker)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT c.* FROM documents, LATERAL arrow_chunker(doc_id, text) c"
    )


# ---------------------------------------------------------------------------
# z40 — multimodal frame sampling (demoted round 4; was m02: m01/u01/st02 keep the Arrow-UDF family in-window): one row per sampled 64-byte "frame"
# (every 4th), mapInPandas one-to-many (the decode itself is the
# deterministic stub — no codecs in this container).
# ---------------------------------------------------------------------------
@register(
    "z40_frame_sample",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, text, CAST(CEIL(length(text) / {multimodal.FRAME_BYTES}.0) AS INTEGER) AS nf
        FROM documents
    )
    SELECT doc_id,
           CAST(unnest(range(0, nf, 4)) AS INTEGER) AS frame_idx,
           sha256(substr(text, unnest(range(0, nf, 4)) * {multimodal.FRAME_BYTES} + 1,
                         {multimodal.FRAME_BYTES})) AS frame_sha
    FROM b
    """,
    description="frame sampling (every 4th 64B block) via one-to-many mapInPandas",
)
def z40_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return multimodal.sample_frames(with_payload, "doc_id", "payload", every=4)


# ---------------------------------------------------------------------------
# z60 — multimodal feature extraction (round-5 addition; operators/
# multimodal.py::extract_media_features): binary payload → embedding via
# Arrow-batched mapInPandas — the encode step between decode (m01's
# metadata stub) and the ANN/near-dup operators.  The deterministic fake
# encoder (sha256 16-bit features, [0,1] doubles) keeps the whole
# binary → embedding pipeline oracle-checkable; the gate emits scalar
# signature columns (dim, first value, mean, l2 norm) whose fixed-order
# double arithmetic both engines reproduce bit-identically.
# ---------------------------------------------------------------------------
def _z60_oracle() -> str:
    dim = multimodal.FEATURE_DIM
    fs = ",\n               ".join(
        f"('0x' || substr(sha, {4 * i + 1}, 4))::BIGINT / 65535.0 AS f{i}"
        for i in range(dim)
    )
    mean = "(" + " + ".join(f"f{i}" for i in range(dim)) + f") / {dim}"
    norm = "sqrt(" + " + ".join(f"f{i} * f{i}" for i in range(dim)) + ")"
    return f"""
    WITH b AS (
        SELECT doc_id, sha256(text) AS sha FROM documents
    ), f AS (
        SELECT doc_id,
               {fs}
        FROM b
    )
    SELECT doc_id,
           CAST({dim} AS INTEGER) AS emb_dim,
           ROUND(f0, 6) AS emb0,
           ROUND({mean}, 6) AS emb_mean,
           ROUND({norm}, 6) AS emb_norm
    FROM f
    """


@register(
    "m02_media_features",
    oracle=_z60_oracle(),
    description="binary media column -> embedding via Arrow mapInPandas "
    "(deterministic fake encoder; scalar signature columns)",
)
def m02_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    emb = multimodal.extract_media_features(with_payload, "doc_id", "payload")
    dim = multimodal.FEATURE_DIM
    total = F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x)
    sq = F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x)
    return emb.select(
        "doc_id",
        F.size("embedding").alias("emb_dim"),
        F.round(F.element_at("embedding", 1), 6).alias("emb0"),
        F.round(total / dim, 6).alias("emb_mean"),
        F.round(F.sqrt(sq), 6).alias("emb_norm"),
    )


# ---------------------------------------------------------------------------
# zb10 (was s03) — sign-LSH bucketed ANN: coarse cell derived from the vector itself
# (random-hyperplane sign bits), probe = the query's bucket.
# ---------------------------------------------------------------------------
def _s03_oracle() -> str:
    planes = similarity.hyperplanes(dim=64, nbits=6)
    b = similarity.signlsh_bucket_sql("embedding::DOUBLE[]", planes)
    return f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v, {b} AS bucket FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < 8
    ), scored AS (
        SELECT query_id, e.vec_id AS neighbor_id, e.bucket,
               list_cosine_similarity(qv, e.v) AS cos_raw
        FROM q JOIN e USING (bucket)
        WHERE e.vec_id <> query_id
    )
    SELECT query_id, neighbor_id, CAST(bucket AS INTEGER) AS bucket,
           ROUND(cos_raw, 4) AS cos, CAST(rn AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
        ) AS rn FROM scored
    ) WHERE rn <= 5
    """


@register(
    "zb10_ann_signlsh",
    oracle=_s03_oracle(),
    description="sign-LSH (6-bit hyperplane) bucketed ANN top-5",
)
def zb10_ann_signlsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.lsh_ann_topk(
        emb, emb.filter(F.col("vec_id") < 8), "vec_id", "embedding", k=5, nbits=6, dim=64
    )


# ---------------------------------------------------------------------------
# zb11 (was s04) — multi-probe IVF search (operators/similarity.py::multiprobe_ann_topk
# + ::assign_cells): each query probes its nprobe=2 nearest quantizer cells
# instead of one, recovering the recall a single-probe search loses at cell
# boundaries.  Probe selection explodes the broadcast QUERY side only — the
# corpus never explodes or reshuffles.  Promoted into the driver window in
# round 3 (VERDICT r2 next-round #6); the quantizer is the _KM_K literal
# centroids, so the DuckDB twin recomputes assignment + probes exactly.
# ---------------------------------------------------------------------------
_S04_K = 4
_S04_NPROBE = 2

# shared by zb11 (the operator gate) and s19 (the SIMILARITY JOIN
# METHOD IVF MODEL router gate): the router rewrite must add no
# semantics of its own, so both hash against the SAME oracle
_S04_ORACLE = f"""
    WITH c AS (
        SELECT vec_id AS cell, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id < {_S04_K}
    ), v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), a AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, c.cell, row_number() OVER (
                PARTITION BY v.vec_id
                ORDER BY ROUND(list_sum(
                    [ (ev[i] - cv[i]) ^ 2 for i in range(1, 65) ]), 6), c.cell
            ) AS rn
            FROM v, c
        ) WHERE rn = 1
    ), q AS (
        SELECT vec_id AS query_id, ev AS qv FROM v WHERE vec_id < 8
    ), p AS (
        SELECT query_id, cell FROM (
            SELECT q.query_id, c.cell, row_number() OVER (
                PARTITION BY q.query_id
                ORDER BY ROUND(list_sum(
                    [ (qv[i] - cv[i]) ^ 2 for i in range(1, 65) ]), 6), c.cell
            ) AS rn
            FROM q, c
        ) WHERE rn <= {_S04_NPROBE}
    ), scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               list_cosine_similarity(q.qv, v.ev) AS cos_raw
        FROM p
        JOIN a USING (cell)
        JOIN v ON v.vec_id = a.vec_id
        JOIN q ON q.query_id = p.query_id
        WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, ROUND(cos_raw, 4) AS cos,
           CAST(rn AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
        ) AS rn FROM scored
    ) WHERE rn <= 5
    """


@register(
    "zb11_ann_multiprobe",
    oracle=_S04_ORACLE,
    description="multi-probe IVF ANN (nprobe=2): probe explode on the "
    "broadcast query side only; corpus assigned once via literal centroids",
)
def zb11_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.similarity import (
        _to_double,
        assign_cells,
        multiprobe_ann_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    cents = [
        (r["cluster_id"], list(r["cv"]))
        for r in emb.filter(F.col("vec_id") < _S04_K)
        .select(
            F.col("vec_id").alias("cluster_id"),
            _to_double(F.col("embedding")).alias("cv"),
        )
        .collect()
    ]
    corpus = assign_cells(emb, cents, "vec_id", "embedding", "cell")
    return multiprobe_ann_topk(
        corpus,
        emb.filter(F.col("vec_id") < 8),
        cents,
        "vec_id",
        "embedding",
        "cell",
        k=5,
        nprobe=_S04_NPROBE,
    )


# ---------------------------------------------------------------------------
# z53 — near-dup clustering (demoted round 5; was d07, r1-r4 green —
# same no-sibling precedent as the round-3 setops/pivot demotions):
# LSH pairs → connected components → canonical
# representative per cluster (the "keep one copy" stage of a dedup
# pipeline). Oracle: same exact-Jaccard pair set (d02), closed transitively
# with a recursive CTE, labeled by component-min.
# ---------------------------------------------------------------------------
_CLUSTER_ORACLE = f"""{_SHINGLE_CTES}
    , __jp AS (
        SELECT id_a, id_b
        FROM __pairs
        JOIN __sizes na ON id_a = na.doc_id
        JOIN __sizes nb ON id_b = nb.doc_id
        WHERE ROUND(inter * 1.0 / (na.n + nb.n - inter), 4) >= {JACCARD_T}
    ), __edges AS (
        SELECT id_a AS s, id_b AS d FROM __jp
        UNION
        SELECT id_b, id_a FROM __jp
    ), __reach(id, lbl) AS (
        SELECT s, s FROM __edges
        UNION
        SELECT e.d, r.lbl FROM __reach r JOIN __edges e ON e.s = r.id
    )
    SELECT id AS doc_id, min(lbl) AS cluster_id
    FROM __reach
    GROUP BY id
""".replace("WITH __tok", "WITH RECURSIVE __tok", 1)


@register(
    "z53_dedup_clusters",
    oracle=_CLUSTER_ORACLE,
    description="near-dup pairs -> connected components -> (doc, cluster) "
    "membership with deterministic min-id canonical labels",
)
def z53_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_join(
        docs, "doc_id", "text", threshold=JACCARD_T, n=SHINGLE_N
    )
    comp = graph.connected_components(pairs.select("id_a", "id_b"))
    return comp.select(
        F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id")
    )


# ---------------------------------------------------------------------------
# zb18 (was t05) — deterministic stratified sampling: hash-gated per-stratum rates
# (en 50%, others 12.5%). Seedable, reproducible across engines and runs,
# and embarrassingly parallel — the sampling decision is a pure row
# function of (id, stratum), so no shuffle, no RNG state, and the same
# documents are picked on any cluster size. The standard way to downsample
# a 100 TB corpus with per-language quotas.
# ---------------------------------------------------------------------------
@register(
    "zb18_stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE WHEN lang = 'en' THEN '80' ELSE '20' END
    """,
    description="hash-gated deterministic stratified sample (per-lang rates)",
)
def zb18_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    gate = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    thresh = F.when(F.col("lang") == "en", "80").otherwise("20")
    return docs.filter(gate < thresh).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# p01 — end-to-end training-data curation pipeline: language filter →
# quality filter → exact dedup (canonical min-id doc) → per-source token
# accounting. The composition a real corpus build runs, expressed as pure
# DataFrame ops over the same operators the t/d gates check individually —
# one shuffle per stage (join on doc_id, groupBy sha, groupBy source), no
# Python in the hot path, all counters integer-exact.
# ---------------------------------------------------------------------------
_WS_TOKENS = (
    "CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT)"
)
_BPE_TOKENS = (
    "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT)"
)

_PIPELINE_ORACLE = f"""
    WITH __lang AS ({_langid_oracle()}),
    __qual AS ({_QUALITY_ORACLE}),
    __keep AS (
        SELECT d.doc_id, d.source, d.text
        FROM documents d
        JOIN __lang l ON d.doc_id = l.doc_id AND l.pred_lang = 'en'
        JOIN __qual q ON d.doc_id = q.doc_id AND q.quality >= 0.55
    ),
    __canon AS (
        SELECT min(doc_id) AS doc_id FROM __keep GROUP BY sha256(text)
    ),
    __surv AS (SELECT k.* FROM __keep k JOIN __canon c USING (doc_id))
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM({_WS_TOKENS}) AS BIGINT) AS total_ws_tokens,
           CAST(SUM({_BPE_TOKENS}) AS BIGINT) AS total_bpe_tokens
    FROM __surv
    GROUP BY source
"""


@register(
    "zd41_curation_pipeline",
    oracle=_PIPELINE_ORACLE,
    description="composed corpus curation: lang-ID filter -> quality filter "
    "-> exact dedup -> per-source token accounting",
)
def zd41_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from spark_sql_hbase_spark.functions.texthash import tokens

    docs = table(spark, sf_dir, "documents")
    # FUSED plan: every feature (lang, quality, token counts, digest) is a
    # row-local expression, so the filters cost ZERO shuffles — unlike the
    # naive compose-by-join of the t01/t02 DataFrames, which would shuffle
    # the full text corpus once per stage. The only wide stages left are
    # the dedup window (one shuffle of surviving rows on the digest) and
    # the per-source rollup (map-side-combined, bytes of traffic).
    # round 14 (measured): the fused filter shape keeps the TOKEN-ARRAY
    # twins — one tokenize feeds all five counts here, and in this
    # filter context the HOF form beat the regex twins 0.99 vs 1.74
    # median (interleaved A/B; the regex twins win in project-shaped
    # gates like zb15/zb16)
    tok = tokens(F.col("text"))
    feats = docs.select(
        "doc_id",
        "source",
        "text",
        text.lang_pred(text.lang_scores_tokens(tok)).alias("pred_lang"),
        text.quality_expr_tokens("text", tok).alias("quality"),
    )
    keep = feats.filter((F.col("pred_lang") == "en") & (F.col("quality") >= 0.55))
    w = W.partitionBy(F.sha2(F.col("text").cast("binary"), 256)).orderBy("doc_id")
    surv = (
        keep.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)  # canonical = min doc_id per digest
    )
    return surv.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.ws_token_count("text")).alias("total_ws_tokens"),
        F.sum(text.bpe_token_count("text")).alias("total_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# z16 — sequence packing (concat-then-chunk planning): assign every doc a
# byte-exact (sequence, offset) slot in fixed-token-budget training
# sequences, then the per-sequence manifest. One window cumsum per stream
# + one agg — no stateful loop, no UDF (operators/packing.py).
# ---------------------------------------------------------------------------
_PACK_BUDGET = 2048

@register(
    "zd42_sequence_packing",
    oracle=f"""
    WITH __tok AS (
        SELECT source, doc_id, {_WS_TOKENS} AS n_tokens FROM documents
    ), __off AS (
        SELECT source, doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS BIGINT) AS "offset"
        FROM __tok
    )
    SELECT source,
           "offset" // {_PACK_BUDGET} AS seq_id,
           COUNT(*) AS n_docs,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc,
           CAST(SUM(n_tokens) AS BIGINT) AS docs_tokens
    FROM __off
    GROUP BY 1, 2
    """,
    description="sequence packing manifest: per-stream cumsum offsets -> "
    "fixed-budget training sequences (concat-then-chunk)",
)
def z16_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.packing import pack_summary

    docs = table(spark, sf_dir, "documents")
    docs = docs.withColumn("n_tok", text.ws_token_count("text"))
    return pack_summary(docs, "source", "doc_id", "n_tok", _PACK_BUDGET).select(
        "source",
        "seq_id",
        "n_docs",
        "first_doc",
        "last_doc",
        "docs_tokens",
    )


# ---------------------------------------------------------------------------
# z17 — train/test decontamination: training docs sharing >= 3 distinct
# 5-grams with the (deterministic) held-out eval slice. Eval index is
# broadcast — the corpus side is never shuffled to find matches
# (operators/decontam.py).
# ---------------------------------------------------------------------------
_DECON_N = 5
_DECON_MIN = 3
_DECON_EVAL = "doc_id % 29 = 0"

@register(
    "zb13_decontamination",
    oracle=f"""
    WITH __sh AS (
        SELECT doc_id, {shingles_sql(tokens_sql('text'), _DECON_N)} AS s
        FROM documents
    ), __inv AS (
        SELECT doc_id, unnest(s) AS g FROM __sh
    ), __pairs AS (
        SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
               COUNT(*) AS n_shared
        FROM (SELECT * FROM __inv WHERE NOT ({_DECON_EVAL})) tr
        JOIN (SELECT * FROM __inv WHERE {_DECON_EVAL}) ev USING (g)
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_DECON_MIN}
    )
    SELECT train_id,
           COUNT(*) AS n_eval_docs,
           CAST(SUM(n_shared) AS BIGINT) AS total_shared,
           CAST(MAX(n_shared) AS BIGINT) AS max_shared
    FROM __pairs
    GROUP BY train_id
    """,
    description="n-gram-overlap decontamination vs a held-out eval slice "
    "(broadcast eval inverted index)",
)
def z17_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.decontam import decontaminate

    docs = table(spark, sf_dir, "documents")
    is_eval = (F.col("doc_id") % 29) == 0
    return decontaminate(
        docs.filter(~is_eval), docs.filter(is_eval), "doc_id", "text",
        n=_DECON_N, min_overlap=_DECON_MIN,
    )


# ---------------------------------------------------------------------------
# z18 — BM25 relevance scoring against a query term set (topical filter /
# relevance weighting for curation). Query-term-filtered explode: the
# shuffle carries only matching terms, never the corpus vocabulary
# (operators/ranking.py).
# ---------------------------------------------------------------------------
_BM25_TERMS = ["stream", "window", "checkpoint"]

@register(
    "zb19_bm25_scoring",
    oracle="SELECT id AS doc_id, score FROM ({})".format(
        __import__(
            "spark_sql_hbase_spark.operators.ranking", fromlist=["bm25_sql"]
        ).bm25_sql("documents", "doc_id", _TOK, _BM25_TERMS)
    ),
    description="Okapi BM25 scoring vs a fixed query term set (no UDF, "
    "term-filtered explode)",
)
def zb19_bm25_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.ranking import bm25_scores

    docs = table(spark, sf_dir, "documents")
    return bm25_scores(docs, "doc_id", "text", _BM25_TERMS).select(
        F.col("id").alias("doc_id"), "score"
    )


# ---------------------------------------------------------------------------
# z20 — incremental near-dup dedup: an incoming batch (doc_id % 17 = 0)
# matched against the existing corpus (the rest) — the daily-ingest shape:
# dedup the delta, not the world. Text-direct OPH banding on BOTH sides,
# exact verification on candidates only (operators/dedup.py::
# minhash_lsh_join_incremental).
# ---------------------------------------------------------------------------
_INC_NEW = "doc_id % 17 = 0"

@register(
    "zb14_incremental_neardup",
    oracle=f"""
    WITH __tok AS (
        SELECT doc_id, {_TOK} AS t FROM documents
    ), __sh AS (
        SELECT doc_id, {{sh}} AS s FROM __tok
    ), __sizes AS (
        SELECT doc_id, len(s) AS n FROM __sh WHERE len(s) > 0
    ), __inv AS (
        SELECT doc_id, unnest(s) AS g FROM __sh
    ), __pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM __inv a JOIN __inv b ON a.g = b.g
        WHERE a.doc_id % 17 = 0 AND b.doc_id % 17 <> 0
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(inter * 1.0 / (na.n + nb.n - inter), 4) AS jac
    FROM __pairs
    JOIN __sizes na ON id_a = na.doc_id
    JOIN __sizes nb ON id_b = nb.doc_id
    WHERE ROUND(inter * 1.0 / (na.n + nb.n - inter), 4) >= {JACCARD_T}
    """.format(sh=shingles_sql("t", SHINGLE_N)),
    description="incremental LSH near-dup: incoming batch vs corpus, "
    "text-direct banding both sides, candidate-only verification",
)
def z20_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.dedup import minhash_lsh_join_incremental

    docs = table(spark, sf_dir, "documents")
    is_new = (F.col("doc_id") % 17) == 0
    return minhash_lsh_join_incremental(
        docs.filter(is_new), docs.filter(~is_new), "doc_id", "text", JACCARD_T, SHINGLE_N
    )


# ---------------------------------------------------------------------------
# t09 — corpus vocabulary (promoted round 4; was z21) with counts (tokenizer-training prep): explode →
# map-side-combined term counts → top-k, deterministic tiebreak
# (operators/text.py::vocabulary).
# ---------------------------------------------------------------------------
@register(
    "zd49_vocabulary_topk",
    oracle=f"""
    WITH __t AS (
        SELECT unnest({_TOK}) AS term FROM documents
    ), __c AS (
        SELECT term, COUNT(*) AS n FROM __t GROUP BY 1
    )
    SELECT term, n, CAST(row_number() OVER (ORDER BY n DESC, term) AS INTEGER) AS rank
    FROM __c
    ORDER BY n DESC, term
    LIMIT 50
    """,
    description="corpus vocabulary top-50 with counts (tokenizer prep, "
    "map-side-combined, TakeOrdered)",
)
def zd49_vocabulary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.vocabulary(docs, "text", top_k=50)


# ---------------------------------------------------------------------------
# z22 — one k-means Lloyd step over the embeddings (IVF quantizer
# construction primitive; feed the output back in to iterate). Assignment
# is a pure projection against literal centroids — no join, no vector
# shuffle; the only exchange carries K x dim partial averages
# (operators/similarity.py::kmeans_step).
# ---------------------------------------------------------------------------
_KM_K = 4

@register(
    "zb12_kmeans_step",
    oracle=f"""
    WITH c AS (
        SELECT vec_id AS cluster_id, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id < {_KM_K}
    ), v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), d AS (
        SELECT vec_id, cluster_id,
               ROUND(list_sum([ (ev[i] - cv[i]) ^ 2 for i in range(1, 65) ]), 6) AS d2
        FROM v, c
    ), a AS (
        SELECT vec_id, cluster_id
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cluster_id) AS rn FROM d)
        WHERE rn = 1
    )
    SELECT a.cluster_id,
           CAST(t.i AS INTEGER) AS dim,
           ROUND(AVG(ev[t.i]), 6) AS centroid,
           COUNT(*) AS n_members
    FROM a JOIN v USING (vec_id), range(1, 65) t(i)
    GROUP BY 1, 2
    """,
    description="k-means Lloyd step: literal-centroid assignment (no "
    "shuffle of vectors) + K x dim centroid recompute",
)
def zb12_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.similarity import _to_double, kmeans_step

    emb = table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cluster_id"), _to_double(F.col("embedding")).alias("cv")
    )
    return kmeans_step(emb, cent, "vec_id", "embedding")


# ---------------------------------------------------------------------------
# z26 — PII detection + redaction audit (operators/text.py::pii_scan).
# The synthetic corpus has no PII, so the gate injects deterministic
# markers (same expression in both engines) before scanning — the
# detection/redaction plumbing is what's under test.
# ---------------------------------------------------------------------------
_PII_AUG = (
    "text || CASE WHEN doc_id % 7 = 0 THEN ' contact user42@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' host 192.168.1.100 up' ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN ' call 555-123-4567 today' ELSE '' END"
)

@register(
    "zb20_pii_scan",
    oracle=r"""
    WITH __aug AS (
        SELECT doc_id, {aug} AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS INTEGER)
               AS n_email,
           CAST(len(regexp_extract_all(t,
               '[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}')) AS INTEGER)
               AS n_ip,
           CAST(len(regexp_extract_all(t,
               '[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}')) AS INTEGER) AS n_phone,
           CAST(length(
               regexp_replace(regexp_replace(regexp_replace(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<email>', 'g'),
                   '[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}', '<ip>', 'g'),
                   '[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}', '<phone>', 'g')
           ) AS INTEGER) AS redacted_len
    FROM __aug
    WHERE doc_id % 7 = 0 OR doc_id % 11 = 0 OR doc_id % 13 = 0
    """.format(aug=_PII_AUG),
    description="PII detect + redact audit (regexp_count/replace, no UDF) "
    "over deterministically injected markers",
)
def zb20_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    aug = docs.select("doc_id", F.expr(_PII_AUG).alias("t"))
    scanned = text.pii_scan(aug, "doc_id", "t")
    return scanned.filter(
        (F.col("doc_id") % 7 == 0) | (F.col("doc_id") % 11 == 0)
        | (F.col("doc_id") % 13 == 0)
    ).select(
        "doc_id",
        "n_email",
        "n_ip",
        "n_phone",
        F.col("redacted_len").cast("int").alias("redacted_len"),
    )


# ---------------------------------------------------------------------------
# z27 — data-mix planning: per-stream quality deciles with doc counts and
# token budgets — the manifest a mixture sampler draws from
# (operators/text.py::quality_mix_plan).
#
# Scale-safe shape (round 3): decile BOUNDARIES via a percentile aggregate,
# broadcast back, bucket by range comparison — no per-stream global sort /
# ntile window anywhere (tests/test_plans.py pins the window-free plan).
# The gate runs boundaries="exact" (ANSI percentile_disc == DuckDB
# quantile_disc — boundaries are actual data values, bit-identical across
# engines; interpolated percentile_cont differs by 1 ulp and flips docs that
# sit exactly on a boundary); production default is the percentile_approx
# sketch with the identical plan shape.
# ---------------------------------------------------------------------------
_Z27_BOUNDS = ",\n               ".join(
    f"quantile_disc(quality, {i / 10}) AS b{i}" for i in range(1, 10)
)
_Z27_BUCKET = " + ".join(f"CAST(m.quality > b.b{i} AS INTEGER)" for i in range(1, 10))


@register(
    "zb21_quality_mix_plan",
    oracle=f"""
    WITH __m AS (
        SELECT d.source, q.doc_id, q.quality,
               {_WS_TOKENS.replace("text", "d.text")} AS n_tokens
        FROM ({_QUALITY_ORACLE}) q JOIN documents d USING (doc_id)
    ), __b AS (
        SELECT source,
               {_Z27_BOUNDS}
        FROM __m
        GROUP BY source
    )
    SELECT m.source,
           CAST(1 + {_Z27_BUCKET} AS INTEGER) AS bucket,
           COUNT(*) AS n_docs,
           ROUND(MIN(m.quality), 6) AS min_quality,
           ROUND(MAX(m.quality), 6) AS max_quality,
           CAST(SUM(m.n_tokens) AS BIGINT) AS bucket_tokens
    FROM __m m JOIN __b b USING (source)
    GROUP BY 1, 2
    """,
    description="per-stream quality-decile manifest via broadcast boundary "
    "bucketing (no window) for mixture sampling",
)
def zb21_quality_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.quality_mix_plan(docs, "source", "doc_id", "text", 10, boundaries="exact")


# ---------------------------------------------------------------------------
# t10 — Gopher-style (promoted round 4; was z36) intra-document repetition stats (round-3 addition;
# operators/text.py::repetition_stats): duplicate-token fraction, top-token
# share (longest sorted run, one row-local fold), duplicate-2-gram
# fraction.  Pure row-local projection — zero shuffle at any scale.
# ---------------------------------------------------------------------------
@register(
    "zd50_repetition_stats",
    oracle=f"""
    WITH __tok AS (
        SELECT doc_id, {_TOK} AS t FROM documents
    ), __top AS (
        SELECT doc_id, MAX(c) AS top_cnt FROM (
            SELECT doc_id, w, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(t) AS w FROM __tok)
            GROUP BY doc_id, w
        ) GROUP BY doc_id
    ), __g AS (
        SELECT doc_id, len(t) AS n,
               len(list_distinct(t)) AS nd,
               CASE WHEN len(t) >= 2 THEN
                   [t[__i + 1] || ' ' || t[__i + 2]
                    for __i in range(0, len(t) - 1)]
               ELSE [] END AS g2
        FROM __tok
    )
    SELECT g.doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(n - nd AS DOUBLE) / greatest(n, 1) AS dup_token_frac,
           CAST(COALESCE(top_cnt, 0) AS DOUBLE) / greatest(n, 1)
               AS top_token_frac,
           CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)
               / greatest(len(g2), 1) AS dup_2gram_frac
    FROM __g g LEFT JOIN __top USING (doc_id)
    """,
    description="Gopher-style repetition filter signals (dup-token/"
    "top-token/dup-2gram fractions) — row-local, shuffle-free",
)
def zd50_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.repetition_stats(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# t11 — unigram-LM surprisal (promoted round 4; was z37) scoring (round-3 addition;
# operators/ranking.py::unigram_surprisal): per-doc mean -ln(c_t/N) under
# the corpus's own unigram distribution — the rare-token quality signal.
# Same determinism contract as the BM25 gate (ln + ROUND(4)).
# ---------------------------------------------------------------------------
from spark_sql_hbase_spark.operators.ranking import unigram_surprisal_sql as _usql


@register(
    "zd51_unigram_surprisal",
    oracle="SELECT q.id AS doc_id, q.n_tokens, q.surprisal FROM ("
    + _usql("documents", "doc_id", _TOK)
    + ") q",
    description="per-doc mean unigram surprisal (corpus-trained, ln+round4)",
)
def zd51_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.ranking import unigram_surprisal

    docs = table(spark, sf_dir, "documents")
    out = unigram_surprisal(docs, "doc_id", "text")
    return out.select(F.col("id").alias("doc_id"), "n_tokens", "surprisal")


# ---------------------------------------------------------------------------
# s07 — product-quantization ANN (promoted round 4; was z38) (round-3 addition; operators/similarity.py
# ::pq_encode / ::pq_ann_topk): 64-dim vectors → m=4 codes against ksub=8
# per-subspace codebooks, asymmetric-distance top-5.  The gate codebook is
# the subvectors of vec_id < 8 (untrained but fully SQL-reproducible — the
# same convention as s02/s04's quantizer-free cells); the TRAINED path
# (pq_train = per-subspace kmeans) is pytest-covered by the reconstruction
# and recall tests.
# ---------------------------------------------------------------------------
_PQ_M = 4
_PQ_SUB = 16
_PQ_KSUB = 8


_PQ_GATE_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), cb AS (
        SELECT s.s, v.vec_id AS code, v.ev AS cvf
        FROM v, (SELECT unnest(range(0, {_PQ_M})) AS s) s
        WHERE v.vec_id < {_PQ_KSUB}
    ), enc AS (
        SELECT vec_id, s, code FROM (
            SELECT v.vec_id, cb.s, cb.code, row_number() OVER (
                PARTITION BY v.vec_id, cb.s
                ORDER BY ROUND(list_sum(
                    [ (v.ev[cb.s * {_PQ_SUB} + i] - cb.cvf[cb.s * {_PQ_SUB} + i]) ^ 2
                      for i in range(1, {_PQ_SUB} + 1) ]), 6), cb.code
            ) AS rn
            FROM v, cb
        ) WHERE rn = 1
    ), q AS (
        SELECT vec_id AS query_id, ev AS qv FROM v WHERE vec_id < 8
    ), tab AS (
        SELECT q.query_id, cb.s, cb.code,
               ROUND(list_sum(
                   [ (q.qv[cb.s * {_PQ_SUB} + i] - cb.cvf[cb.s * {_PQ_SUB} + i]) ^ 2
                     for i in range(1, {_PQ_SUB} + 1) ]), 6) AS d2
        FROM q, cb
    ), dist AS (
        SELECT t.query_id, e.vec_id AS neighbor_id, ROUND(SUM(t.d2), 4) AS adc
        FROM enc e JOIN tab t ON t.s = e.s AND t.code = e.code
        WHERE e.vec_id <> t.query_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc, CAST(rn AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adc, neighbor_id
        ) AS rn FROM dist
    ) WHERE rn <= 5
    """


@register(
    "zd47_pq_ann",
    oracle=_PQ_GATE_ORACLE,
    description="product-quantization ANN: m=4 subspace codes + "
    "asymmetric-distance top-5 (corpus read as codes, never as vectors)",
)
def zd47_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.similarity import (
        _to_double,
        pq_ann_topk,
        pq_encode,
    )

    emb = table(spark, sf_dir, "embeddings")
    seeds = (
        emb.filter(F.col("vec_id") < _PQ_KSUB)
        .select("vec_id", _to_double(F.col("embedding")).alias("ev"))
        .collect()
    )
    books = [
        [
            (int(r["vec_id"]), list(r["ev"])[s * _PQ_SUB : (s + 1) * _PQ_SUB])
            for r in sorted(seeds, key=lambda r: r["vec_id"])
        ]
        for s in range(_PQ_M)
    ]
    codes = pq_encode(emb, books, "vec_id", "embedding")
    return pq_ann_topk(
        codes, emb.filter(F.col("vec_id") < 8), books, "vec_id", "embedding", k=5
    )


# ---------------------------------------------------------------------------
# s06 — IVFADC (round-4 addition; operators/similarity.py::ivfadc_ann_topk):
# the composition of the IVF coarse cells (s02/s04) with the PQ codes (s07)
# — ADC scoring restricted to each query's nprobe=2 nearest of 4 coarse
# cells, so neither the full code table nor any corpus vector is scanned
# per query.  Gate model state follows the SQL-reproducible untrained
# convention: coarse centroids = embeddings of vec_id < 4, PQ codebooks =
# subvectors of vec_id < 8 (same as s07); the TRAINED composition
# (kmeans coarse + pq_train books) is pytest-covered by the recall test.
# ---------------------------------------------------------------------------
_IVF_C = 4
_IVF_NPROBE = 2


_IVFADC_GATE_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), cc AS (
        SELECT vec_id AS cell, ev AS ccv FROM v WHERE vec_id < {_IVF_C}
    ), assign AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, cc.cell, row_number() OVER (
                PARTITION BY v.vec_id
                ORDER BY ROUND(list_sum(
                    [ (v.ev[i] - cc.ccv[i]) ^ 2 for i in range(1, 65) ]), 6), cc.cell
            ) AS rn
            FROM v, cc
        ) WHERE rn = 1
    ), cb AS (
        SELECT s.s, v.vec_id AS code, v.ev AS cvf
        FROM v, (SELECT unnest(range(0, {_PQ_M})) AS s) s
        WHERE v.vec_id < {_PQ_KSUB}
    ), enc AS (
        SELECT vec_id, s, code FROM (
            SELECT v.vec_id, cb.s, cb.code, row_number() OVER (
                PARTITION BY v.vec_id, cb.s
                ORDER BY ROUND(list_sum(
                    [ (v.ev[cb.s * {_PQ_SUB} + i] - cb.cvf[cb.s * {_PQ_SUB} + i]) ^ 2
                      for i in range(1, {_PQ_SUB} + 1) ]), 6), cb.code
            ) AS rn
            FROM v, cb
        ) WHERE rn = 1
    ), q AS (
        SELECT vec_id AS query_id, ev AS qv FROM v WHERE vec_id < 8
    ), probes AS (
        SELECT query_id, cell FROM (
            SELECT q.query_id, cc.cell, row_number() OVER (
                PARTITION BY q.query_id
                ORDER BY ROUND(list_sum(
                    [ (q.qv[i] - cc.ccv[i]) ^ 2 for i in range(1, 65) ]), 6), cc.cell
            ) AS rn
            FROM q, cc
        ) WHERE rn <= {_IVF_NPROBE}
    ), tab AS (
        SELECT q.query_id, cb.s, cb.code,
               ROUND(list_sum(
                   [ (q.qv[cb.s * {_PQ_SUB} + i] - cb.cvf[cb.s * {_PQ_SUB} + i]) ^ 2
                     for i in range(1, {_PQ_SUB} + 1) ]), 6) AS d2
        FROM q, cb
    ), dist AS (
        SELECT t.query_id, e.vec_id AS neighbor_id, ROUND(SUM(t.d2), 4) AS adc
        FROM enc e
        JOIN assign a ON a.vec_id = e.vec_id
        JOIN tab t ON t.s = e.s AND t.code = e.code
        JOIN probes p ON p.cell = a.cell AND p.query_id = t.query_id
        WHERE e.vec_id <> t.query_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc, CAST(rn AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adc, neighbor_id
        ) AS rn FROM dist
    ) WHERE rn <= 5
    """


@register(
    "zd46_ivfadc",
    oracle=_IVFADC_GATE_ORACLE,
    description="IVFADC: PQ asymmetric-distance top-5 within each query's "
    "nprobe=2 nearest coarse cells — corpus read as (cell, codes) only",
)
def zd46_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.similarity import (
        _to_double,
        ivfadc_ann_topk,
        ivfpq_index_codes,
    )

    emb = table(spark, sf_dir, "embeddings")
    seeds = (
        emb.filter(F.col("vec_id") < _PQ_KSUB)
        .select("vec_id", _to_double(F.col("embedding")).alias("ev"))
        .collect()
    )
    seeds = sorted(seeds, key=lambda r: r["vec_id"])
    cents = [(int(r["vec_id"]), list(r["ev"])) for r in seeds[:_IVF_C]]
    books = [
        [
            (int(r["vec_id"]), list(r["ev"])[s * _PQ_SUB : (s + 1) * _PQ_SUB])
            for r in seeds
        ]
        for s in range(_PQ_M)
    ]
    # round 14: assignment + encode fused into one Arrow corpus pass
    # (bit-identical to the assign_cells → pq_encode composition)
    codes = ivfpq_index_codes(emb, cents, books, "vec_id", "embedding")
    return ivfadc_ann_topk(
        codes,
        emb.filter(F.col("vec_id") < 8),
        cents,
        books,
        "vec_id",
        "embedding",
        k=5,
        nprobe=_IVF_NPROBE,
    )


# ---------------------------------------------------------------------------
# s08 — residual IVFADC (round-5 addition; VERDICT r4 stretch #7): the
# configuration a production 100 TB index actually runs — the PQ codebooks
# quantize the CELL RESIDUALS (x − c(cell)), which carry far less energy
# than raw vectors (Jegou et al. 2011 §IV.B), and each per-probe ADC table
# is computed from the query's residual against that probed cell.  Gate
# model state follows the SQL-reproducible untrained convention: coarse
# centroids = embeddings of vec_id < 4 (s06), PQ codebooks = subvectors of
# the RESIDUALS of vec_id < 8 — every step (assignment, residual, encode,
# probe, residual ADC) recomputed exactly by the DuckDB twin.  The TRAINED
# residual path (ivfpq_train) stays pytest-covered (reconstruction +
# persisted-index round-trip).
# ---------------------------------------------------------------------------
_IVFADC_RESID_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), cc AS (
        SELECT vec_id AS cell, ev AS ccv FROM v WHERE vec_id < {_IVF_C}
    ), assign AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, cc.cell, row_number() OVER (
                PARTITION BY v.vec_id
                ORDER BY ROUND(list_sum(
                    [ (v.ev[i] - cc.ccv[i]) ^ 2 for i in range(1, 65) ]), 6), cc.cell
            ) AS rn
            FROM v, cc
        ) WHERE rn = 1
    ), resid AS (
        SELECT v.vec_id, a.cell,
               [ v.ev[i] - cc.ccv[i] for i in range(1, 65) ] AS rv
        FROM v JOIN assign a USING (vec_id) JOIN cc ON cc.cell = a.cell
    ), cb AS (
        SELECT s.s, r.vec_id AS code, r.rv AS cvf
        FROM resid r, (SELECT unnest(range(0, {_PQ_M})) AS s) s
        WHERE r.vec_id < {_PQ_KSUB}
    ), enc AS (
        SELECT vec_id, cell, s, code FROM (
            SELECT r.vec_id, r.cell, cb.s, cb.code, row_number() OVER (
                PARTITION BY r.vec_id, cb.s
                ORDER BY ROUND(list_sum(
                    [ (r.rv[cb.s * {_PQ_SUB} + i] - cb.cvf[cb.s * {_PQ_SUB} + i]) ^ 2
                      for i in range(1, {_PQ_SUB} + 1) ]), 6), cb.code
            ) AS rn
            FROM resid r, cb
        ) WHERE rn = 1
    ), q AS (
        SELECT vec_id AS query_id, ev AS qv FROM v WHERE vec_id < 8
    ), probes AS (
        SELECT query_id, cell, ccv FROM (
            SELECT q.query_id, cc.cell, cc.ccv, row_number() OVER (
                PARTITION BY q.query_id
                ORDER BY ROUND(list_sum(
                    [ (q.qv[i] - cc.ccv[i]) ^ 2 for i in range(1, 65) ]), 6), cc.cell
            ) AS rn
            FROM q, cc
        ) WHERE rn <= {_IVF_NPROBE}
    ), qr AS (
        SELECT p.query_id, p.cell,
               [ q.qv[i] - p.ccv[i] for i in range(1, 65) ] AS qrv
        FROM probes p JOIN q USING (query_id)
    ), tab AS (
        SELECT qr.query_id, qr.cell, cb.s, cb.code,
               ROUND(list_sum(
                   [ (qr.qrv[cb.s * {_PQ_SUB} + i] - cb.cvf[cb.s * {_PQ_SUB} + i]) ^ 2
                     for i in range(1, {_PQ_SUB} + 1) ]), 6) AS d2
        FROM qr, cb
    ), dist AS (
        SELECT t.query_id, e.vec_id AS neighbor_id, ROUND(SUM(t.d2), 4) AS adc
        FROM enc e
        JOIN tab t ON t.s = e.s AND t.code = e.code AND t.cell = e.cell
        WHERE e.vec_id <> t.query_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc, CAST(rn AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adc, neighbor_id
        ) AS rn FROM dist
    ) WHERE rn <= 5
    """


@register(
    "zf15_ivfadc_residual",
    oracle=_IVFADC_RESID_ORACLE,
    description="residual IVFADC: PQ codes over cell residuals, per-probe "
    "residual ADC tables — the production 100 TB index configuration",
)
def zf15_ivfadc_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.similarity import (
        _to_double,
        ivfadc_ann_topk,
        pq_encode,
        residualize,
    )

    emb = table(spark, sf_dir, "embeddings")
    seeds = sorted(
        emb.filter(F.col("vec_id") < _IVF_C)
        .select("vec_id", _to_double(F.col("embedding")).alias("ev"))
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cents = [(int(r["vec_id"]), list(r["ev"])) for r in seeds]
    resid = residualize(emb, cents, "vec_id", "embedding")
    rseeds = sorted(
        resid.filter(F.col("vec_id") < _PQ_KSUB)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    books = [
        [
            (int(r["vec_id"]), list(r["embedding"])[s * _PQ_SUB : (s + 1) * _PQ_SUB])
            for r in rseeds
        ]
        for s in range(_PQ_M)
    ]
    codes = pq_encode(resid, books, "vec_id", "embedding", extra_cols=("cell",))
    return ivfadc_ann_topk(
        codes,
        emb.filter(F.col("vec_id") < 8),
        cents,
        books,
        "vec_id",
        "embedding",
        k=5,
        nprobe=_IVF_NPROBE,
        residual=True,
    )


# ---------------------------------------------------------------------------
# d10 — exact duplicate-span detection at token-window granularity
# (promoted round 5; was z44) (round-4
# addition; operators/dedup.py::duplicate_spans): the scalable analogue of
# Lee et al. 2022 suffix-array substring dedup — rolling 10-token window
# hashes, corpus-count >= 2 marks a window duplicated, per-doc duplicated-
# window mass is the drop/keep curation signal.
# ---------------------------------------------------------------------------
_SPAN_W = 10

@register(
    "zg18_duplicate_spans",
    oracle=f"""
    WITH __tok AS (
        SELECT doc_id, {_TOK} AS t FROM documents
    ), __w AS (
        SELECT doc_id,
               CASE WHEN len(t) >= {_SPAN_W} THEN
                   [('0x' || substr(md5(array_to_string(
                        t[__i + 1 : __i + {_SPAN_W}], ' ')), 1, 14))::BIGINT
                    for __i in range(0, len(t) - {_SPAN_W} + 1)]
               ELSE [] END AS whs
        FROM __tok
    ), __x AS (
        SELECT doc_id, unnest(whs) AS h FROM __w
    ), __c AS (
        SELECT h FROM (SELECT h, COUNT(*) AS c FROM __x GROUP BY 1)
        WHERE c >= 2
    ), __d AS (
        SELECT doc_id, COUNT(*) AS nd FROM __x JOIN __c USING (h) GROUP BY 1
    )
    SELECT w.doc_id AS id,
           CAST(len(whs) AS BIGINT) AS n_windows,
           CAST(COALESCE(nd, 0) AS BIGINT) AS n_dup_windows,
           CAST(COALESCE(nd, 0) AS DOUBLE) / greatest(len(whs), 1) AS dup_frac
    FROM __w w LEFT JOIN __d USING (doc_id)
    """,
    description="duplicate-span mass per doc: rolling 10-token window "
    "hashes with corpus count >= 2 (substring-dedup signal)",
)
def zg18_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.duplicate_spans(docs, "doc_id", "text", window=_SPAN_W)


# ---------------------------------------------------------------------------
# t12 — token-budget mix sampling (promoted round 5; was z46)
# (round-4 addition; operators/text.py::
# budget_sample): downsample each source stream to ~500 whitespace tokens
# via a deterministic id-hash gate at frac = min(1, budget/total) — the
# step that consumes the t08 mix manifest.  No sort/window; budget met in
# expectation under hash uniformity (audited by the report itself).
# ---------------------------------------------------------------------------
_BUDGET_TOK = 500


@register(
    "zd52_budget_sample",
    oracle=f"""
    WITH m AS (
        SELECT source AS stratum, doc_id,
               {_WS_TOKENS} AS n_tokens,
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
                % 1000000) AS gate
        FROM documents
    ), t AS (
        SELECT stratum, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM m GROUP BY 1
    ), c AS (
        SELECT stratum, total_tokens,
               CAST(floor(least(1.0, 1.0 * {_BUDGET_TOK} / greatest(total_tokens, 1))
                          * 1000000) AS BIGINT) AS cut
        FROM t
    )
    SELECT m.stratum, c.total_tokens, c.cut,
           COUNT(CASE WHEN m.gate < c.cut THEN 1 END) AS kept_docs,
           CAST(COALESCE(SUM(CASE WHEN m.gate < c.cut THEN m.n_tokens END), 0)
               AS BIGINT) AS kept_tokens
    FROM m JOIN c USING (stratum)
    GROUP BY 1, 2, 3
    """,
    description="per-source token-budget subsample report: deterministic "
    "hash gate at min(1, budget/total) — no sort, no window",
)
def zd52_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.budget_sample(docs, "source", "doc_id", "text", _BUDGET_TOK)


# ---------------------------------------------------------------------------
# t13 — bigram-LM surprisal (promoted round 5; was z47)
# (round-4 addition; operators/ranking.py::
# bigram_surprisal): per-doc mean -ln p_addk(w2|w1) under the corpus's own
# bigram model — the word-order-sensitive fluency signal one tier above
# t11's unigram surprisal.  Single corpus scan (all counts derive from the
# bigram tf, the t11 discipline).
# ---------------------------------------------------------------------------
from spark_sql_hbase_spark.operators.ranking import bigram_surprisal_sql as _bsql


@register(
    "zf19_bigram_surprisal",
    oracle="SELECT q.id AS doc_id, q.n_bigrams, q.bigram_surprisal FROM ("
    + _bsql("documents", "doc_id", _TOK)
    + ") q",
    description="per-doc mean add-1 bigram surprisal (corpus-trained, "
    "ln+round4, one corpus scan)",
)
def zf19_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.ranking import bigram_surprisal

    docs = table(spark, sf_dir, "documents")
    out = bigram_surprisal(docs, "doc_id", "text")
    return out.select(F.col("id").alias("doc_id"), "n_bigrams", "bigram_surprisal")


# ---------------------------------------------------------------------------
# d11 — cross-source duplication matrix (promoted round 5; was z48)
# (round-4 addition): near-dup pairs
# (the d02 minhash operator) joined to each side's source stream, rolled up
# to the unordered (source_a, source_b) overlap matrix — the curation
# analytic that decides which streams to dedup against each other / drop.
# Pure composition of existing oracled operators; pairs are vastly smaller
# than the corpus, so the two metadata joins are broadcast-sized at any
# scale where the matrix is meaningful.
# ---------------------------------------------------------------------------
@register(
    "zg19_source_overlap_matrix",
    oracle=f"""
    WITH __jac AS ({_JACCARD_ORACLE}),
    __src AS (
        SELECT j.id_a, j.id_b, j.jac,
               least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b
        FROM __jac j
        JOIN documents da ON j.id_a = da.doc_id
        JOIN documents db ON j.id_b = db.doc_id
    )
    SELECT source_a, source_b,
           COUNT(*) AS n_pairs,
           CAST(ROUND(SUM(CAST(jac AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_jac,
           ROUND(MAX(jac), 4) AS max_jac
    FROM __src
    GROUP BY 1, 2
    """,
    description="unordered source-pair near-dup overlap matrix "
    "(minhash pairs x metadata joins, rollup)",
)
def zg19_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_join(docs, "doc_id", "text", JACCARD_T, SHINGLE_N)
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "jac",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            # decimal-exact sum (functions/det.py convention): a double
            # AVG is partial-agg summation-order-sensitive across engines
            F.round(F.sum(F.col("jac").cast("decimal(38,6)")), 4)
            .cast("double")
            .alias("sum_jac"),
            F.round(F.max("jac"), 4).alias("max_jac"),
        )
    )


# ---------------------------------------------------------------------------
# t15 (was z57) — BPE merge-candidate pair counts (round-5 addition; operators/
# text.py::bpe_pair_counts): adjacent 2-char pairs within words, weighted
# by word corpus frequency — the counting step of one BPE merge iteration
# (Sennrich et al. 2016).  The pair explode runs over DISTINCT words only
# (vocabulary cardinality, never the corpus) — the classic BPE-training
# scale trick.
# ---------------------------------------------------------------------------
@register(
    "zg20_bpe_pair_counts",
    oracle=f"""
    WITH __w AS (
        SELECT unnest({_TOK}) AS word FROM documents
    ), __wc AS (
        SELECT word, COUNT(*) AS wf FROM __w GROUP BY 1
    ), __p AS (
        SELECT wf,
               unnest([substr(word, __i, 2) for __i in range(1, len(word))])
                   AS pair
        FROM __wc WHERE len(word) >= 2
    ), __c AS (
        SELECT pair, CAST(SUM(wf) AS BIGINT) AS n FROM __p GROUP BY 1
    )
    SELECT pair, n, CAST(row_number() OVER (ORDER BY n DESC, pair) AS INTEGER)
               AS rank
    FROM __c
    ORDER BY n DESC, pair
    LIMIT 50
    """,
    description="BPE merge-candidate pair counts: within-word adjacent "
    "char pairs weighted by word frequency, top-50 (tokenizer training)",
)
def zg20_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.bpe_pair_counts(docs, "text", top_k=50)


# ---------------------------------------------------------------------------
# z58 — per-source boilerplate shingles (round-5 addition; operators/
# text.py::boilerplate_ngrams): top 5-gram shingles by DOCUMENT FREQUENCY
# within each source stream — the "most common spans" analysis that finds
# navigation chrome / template text worth stripping (C4/RefinedWeb
# boilerplate heuristic at shingle granularity).  Shuffle carries the
# per-stream shingle vocabulary (Heaps-sublinear); per-stream top-k runs
# over aggregated counts with WindowGroupLimit.
# ---------------------------------------------------------------------------
_BP_N = 5
_BP_K = 5


@register(
    "zg63_boilerplate_ngrams",
    oracle=f"""
    WITH __sh AS (
        SELECT source AS stream, doc_id,
               {shingles_sql(tokens_sql('text'), _BP_N)} AS s
        FROM documents
    ), __g AS (
        SELECT stream, doc_id, unnest(s) AS gram FROM __sh
    ), __c AS (
        SELECT stream, gram, COUNT(*) AS df
        FROM __g GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    )
    SELECT stream, gram, df, CAST(rn AS INTEGER) AS rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY stream ORDER BY df DESC, gram
        ) AS rn FROM __c
    ) WHERE rn <= {_BP_K}
    """,
    description="per-source top-5 boilerplate 5-gram shingles by document "
    "frequency (most-common-spans curation analytic)",
)
def zg63_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.boilerplate_ngrams(
        docs, "source", "doc_id", "text", n=_BP_N, k=_BP_K
    )


# ---------------------------------------------------------------------------
# t14 — exact-quota stratified sampling (promoted round 5; was z49)
# (round-4 addition; operators/
# text.py::quota_sample): k=5 docs per source as the k smallest id-hash
# gates, two-phase (broadcast oversample threshold → window over the
# ~3k survivors only — never a per-stratum corpus sort).
# ---------------------------------------------------------------------------
_QUOTA_K = 5


@register(
    "zf20_quota_sample",
    oracle=f"""
    WITH m AS (
        SELECT source AS stratum, doc_id AS id,
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
                % 1000000) AS gate
        FROM documents
    ), c AS (
        SELECT stratum,
               CAST(floor(least(1.0, {3.0 * _QUOTA_K} / COUNT(*)) * 1000000)
                    AS BIGINT) AS cut
        FROM m GROUP BY 1
    ), cand AS (
        SELECT m.stratum, m.id, m.gate
        FROM m JOIN c USING (stratum)
        WHERE m.gate < c.cut
    )
    SELECT stratum, id, gate, CAST(rn AS INTEGER) AS rn FROM (
        SELECT *, row_number() OVER (
            PARTITION BY stratum ORDER BY gate, id
        ) AS rn FROM cand
    ) WHERE rn <= {_QUOTA_K}
    """,
    description="exact-quota sample: k smallest id-hash gates per source, "
    "two-phase (no per-stratum corpus sort)",
)
def zf20_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.quota_sample(docs, "source", "doc_id", _QUOTA_K)


# ---------------------------------------------------------------------------
# d12 (was z61) — SemDeDup semantic deduplication (round-5 addition; operators/
# similarity.py::semantic_dedup — Abbas et al. 2023): coarse-quantize the
# embedding space, drop within-cell pairs at cosine >= t keeping the
# lowest id.  Gate model follows the SQL-reproducible untrained
# convention (centroids = embeddings of vec_id < 4, the s06/s08 seeds) so
# DuckDB recomputes assignment, pair pruning, and the audit spine exactly.
# ---------------------------------------------------------------------------
_SEMDEDUP_T = 0.35


@register(
    "zg24_semantic_dedup",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), cc AS (
        SELECT vec_id AS cell, ev AS ccv FROM v WHERE vec_id < {_IVF_C}
    ), assign AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, cc.cell, row_number() OVER (
                PARTITION BY v.vec_id
                ORDER BY ROUND(list_sum(
                    [ (v.ev[i] - cc.ccv[i]) ^ 2 for i in range(1, 65) ]), 6), cc.cell
            ) AS rn
            FROM v, cc
        ) WHERE rn = 1
    ), dropped AS (
        SELECT DISTINCT a.vec_id
        FROM assign a
        JOIN assign b ON b.cell = a.cell AND b.vec_id < a.vec_id
        JOIN v va ON va.vec_id = a.vec_id
        JOIN v vb ON vb.vec_id = b.vec_id
        WHERE ROUND(list_cosine_similarity(va.ev, vb.ev), 4) >= {_SEMDEDUP_T}
    )
    SELECT a.vec_id, a.cell, d.vec_id IS NULL AS kept
    FROM assign a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    """,
    description="SemDeDup: coarse-cell semantic dedup, min-id exemplar "
    "per near-dup pair (cell-blocked, never all-pairs)",
)
def zg24_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.similarity import (
        _to_double,
        semantic_dedup,
    )

    emb = table(spark, sf_dir, "embeddings")
    seeds = sorted(
        emb.filter(F.col("vec_id") < _IVF_C)
        .select("vec_id", _to_double(F.col("embedding")).alias("ev"))
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cents = [(int(r["vec_id"]), list(r["ev"])) for r in seeds]
    return semantic_dedup(emb, cents, "vec_id", "embedding", _SEMDEDUP_T)


# ---------------------------------------------------------------------------
# z62 — temperature-scaled source mixture planning (round-5 addition;
# operators/text.py::temperature_mix — the p^alpha sampling rule of
# Raffel et al. 2020 / Conneau et al. 2020): flatten natural per-source
# token shares with alpha = 0.5 and split a global token budget into
# per-source targets + sample rates.  One corpus scan; alpha = 0.5 rides
# IEEE-correctly-rounded sqrt so the twin is bit-reproducible.
# ---------------------------------------------------------------------------
_MIX_BUDGET = 100_000


@register(
    "zg94_temperature_mix",
    oracle=f"""
    WITH per AS (
        SELECT source AS stream, COUNT(*) AS n_docs,
               CAST(SUM({_WS_TOKENS}) AS BIGINT) AS stream_tokens
        FROM documents GROUP BY 1
    ), p AS (
        SELECT stream, n_docs, stream_tokens,
               ROUND(CAST(stream_tokens AS DOUBLE) /
                     greatest(SUM(stream_tokens) OVER (), 1), 6) AS p
        FROM per
    ), w AS (
        SELECT *, sqrt(p) AS __w FROM p
    )
    SELECT stream, n_docs, stream_tokens, p,
           ROUND(__w / greatest(SUM(__w) OVER (), 1e-12), 6) AS q,
           CAST(floor(ROUND(__w / greatest(SUM(__w) OVER (), 1e-12), 6)
                      * {_MIX_BUDGET}) AS BIGINT) AS target_tokens,
           ROUND(least(CAST(1.0 AS DOUBLE),
               CAST(floor(ROUND(__w / greatest(SUM(__w) OVER (), 1e-12), 6)
                          * {_MIX_BUDGET}) AS BIGINT)
               / greatest(stream_tokens, 1)), 6) AS sample_rate
    FROM w
    """,
    description="temperature-scaled (alpha=0.5) source mixture plan: "
    "p^alpha sampling weights, per-source token targets + rates",
)
def zg94_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.temperature_mix(docs, "source", "text", _MIX_BUDGET, alpha=0.5)


# ---------------------------------------------------------------------------
# t16 (was z63) — DSIR-style importance weighting (round-5 addition; operators/
# ranking.py::dsir_importance — Xie et al. 2023): hashed-unigram log-ratio
# of a target-domain LM (source = src0) vs the raw-corpus LM, per-doc
# length-normalized.  The hashed feature space is BOUNDED (n_buckets), so
# the per-doc combine is a broadcast join — no vocabulary-cardinality
# shuffle anywhere.
# ---------------------------------------------------------------------------
from spark_sql_hbase_spark.operators.ranking import dsir_importance_sql as _dsql

_DSIR_B = 1024


@register(
    "zg60_dsir_importance",
    oracle="SELECT q.id AS doc_id, q.n_tokens, q.importance FROM ("
    + _dsql("documents", "doc_id", _TOK, "source = 'src0'", _DSIR_B)
    + ") q",
    description="DSIR importance: per-doc mean hashed-unigram "
    "ln p_target/p_raw (add-1, 1024 buckets, target = src0)",
)
def zg60_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.ranking import dsir_importance

    docs = table(spark, sf_dir, "documents")
    out = dsir_importance(
        docs, docs.filter(F.col("source") == "src0"), "doc_id", "text", _DSIR_B
    )
    return out.select(F.col("id").alias("doc_id"), "n_tokens", "importance")


# ---------------------------------------------------------------------------
# s09 (was z64) — IVFADC + exact re-ranking (round-5 addition; operators/
# similarity.py::ivfadc_rerank_topk — Jegou et al. ICASSP 2011 / the FAISS
# refine step): ADC short-list of 15 per query, exact squared-L2 re-rank
# to top-5 reading ONLY the 15 candidate vectors per query.  Same
# untrained SQL-reproducible model as s06.
# ---------------------------------------------------------------------------
_RERANK_R = 15


@register(
    "zg16_ivfadc_rerank",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ), cc AS (
        SELECT vec_id AS cell, ev AS ccv FROM v WHERE vec_id < {_IVF_C}
    ), assign AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, cc.cell, row_number() OVER (
                PARTITION BY v.vec_id
                ORDER BY ROUND(list_sum(
                    [ (v.ev[i] - cc.ccv[i]) ^ 2 for i in range(1, 65) ]), 6), cc.cell
            ) AS rn
            FROM v, cc
        ) WHERE rn = 1
    ), cb AS (
        SELECT s.s, v.vec_id AS code, v.ev AS cvf
        FROM v, (SELECT unnest(range(0, {_PQ_M})) AS s) s
        WHERE v.vec_id < {_PQ_KSUB}
    ), enc AS (
        SELECT vec_id, s, code FROM (
            SELECT v.vec_id, cb.s, cb.code, row_number() OVER (
                PARTITION BY v.vec_id, cb.s
                ORDER BY ROUND(list_sum(
                    [ (v.ev[cb.s * {_PQ_SUB} + i] - cb.cvf[cb.s * {_PQ_SUB} + i]) ^ 2
                      for i in range(1, {_PQ_SUB} + 1) ]), 6), cb.code
            ) AS rn
            FROM v, cb
        ) WHERE rn = 1
    ), q AS (
        SELECT vec_id AS query_id, ev AS qv FROM v WHERE vec_id < 8
    ), probes AS (
        SELECT query_id, cell FROM (
            SELECT q.query_id, cc.cell, row_number() OVER (
                PARTITION BY q.query_id
                ORDER BY ROUND(list_sum(
                    [ (q.qv[i] - cc.ccv[i]) ^ 2 for i in range(1, 65) ]), 6), cc.cell
            ) AS rn
            FROM q, cc
        ) WHERE rn <= {_IVF_NPROBE}
    ), tab AS (
        SELECT q.query_id, cb.s, cb.code,
               ROUND(list_sum(
                   [ (q.qv[cb.s * {_PQ_SUB} + i] - cb.cvf[cb.s * {_PQ_SUB} + i]) ^ 2
                     for i in range(1, {_PQ_SUB} + 1) ]), 6) AS d2
        FROM q, cb
    ), dist AS (
        SELECT t.query_id, e.vec_id AS neighbor_id, ROUND(SUM(t.d2), 4) AS adc
        FROM enc e
        JOIN assign a ON a.vec_id = e.vec_id
        JOIN tab t ON t.s = e.s AND t.code = e.code
        JOIN probes p ON p.cell = a.cell AND p.query_id = t.query_id
        WHERE e.vec_id <> t.query_id
        GROUP BY 1, 2
    ), cand AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY adc, neighbor_id
            ) AS rn FROM dist
        ) WHERE rn <= {_RERANK_R}
    ), exact AS (
        SELECT c.query_id, c.neighbor_id,
               ROUND(list_sum(
                   [ (q.qv[i] - nv.ev[i]) ^ 2 for i in range(1, 65) ]), 4) AS d2
        FROM cand c
        JOIN q ON q.query_id = c.query_id
        JOIN v nv ON nv.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, d2, CAST(rn AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY d2, neighbor_id
        ) AS rn FROM exact
    ) WHERE rn <= 5
    """,
    description="IVFADC + exact re-rank: ADC short-list of 15, exact "
    "squared-L2 top-5 reading only candidate vectors",
)
def zg16_ivfadc_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.similarity import (
        _to_double,
        assign_cells,
        ivfadc_rerank_topk,
        pq_encode,
    )

    emb = table(spark, sf_dir, "embeddings")
    seeds = (
        emb.filter(F.col("vec_id") < _PQ_KSUB)
        .select("vec_id", _to_double(F.col("embedding")).alias("ev"))
        .collect()
    )
    seeds = sorted(seeds, key=lambda r: r["vec_id"])
    cents = [(int(r["vec_id"]), list(r["ev"])) for r in seeds[:_IVF_C]]
    books = [
        [
            (int(r["vec_id"]), list(r["ev"])[s * _PQ_SUB : (s + 1) * _PQ_SUB])
            for r in seeds
        ]
        for s in range(_PQ_M)
    ]
    cells = assign_cells(emb, cents, "vec_id", "embedding")
    codes = pq_encode(cells, books, "vec_id", "embedding", extra_cols=("cell",))
    return ivfadc_rerank_topk(
        codes,
        emb,
        emb.filter(F.col("vec_id") < 8),
        cents,
        books,
        "vec_id",
        "embedding",
        k=5,
        rerank=_RERANK_R,
        nprobe=_IVF_NPROBE,
    )


# ---------------------------------------------------------------------------
# z66 — Johnson–Lindenstrauss random projection audit (round-5 addition;
# operators/similarity.py::random_projection — Achlioptas 2003 ±1
# projections): project 64-dim embeddings to 16 dims with a
# md5-parity-deterministic sign matrix and emit per-pair (exact d2,
# projected d2) for the first 20 vectors — the distance-preservation
# audit a JL deployment runs before switching its ANN index to the small
# space.  Matrix, projection, and both distance sides recomputed exactly
# by the DuckDB twin.
# ---------------------------------------------------------------------------
_JL_OUT = 16
_JL_SEED = 7


@register(
    "zg66_jl_projection",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
        WHERE vec_id < 20
    ), m AS (
        SELECT j.j, i.i,
               CASE WHEN (('0x' || substr(md5('{_JL_SEED}:' || i.i || ':' || j.j),
                                          1, 14))::BIGINT % 2) = 0
                    THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE)
               END AS r
        FROM (SELECT unnest(range(0, {_JL_OUT})) AS j) j,
             (SELECT unnest(range(0, 64)) AS i) i
    ), p AS (
        SELECT v.vec_id, m.j,
               ROUND(SUM(v.ev[m.i + 1] * m.r) / sqrt(CAST({_JL_OUT} AS DOUBLE)),
                     6) AS c
        FROM v, m GROUP BY 1, 2
    ), dproj AS (
        SELECT pa.vec_id AS id_a, pb.vec_id AS id_b,
               ROUND(SUM((pa.c - pb.c) ^ 2), 4) AS d2_proj
        FROM p pa JOIN p pb ON pa.j = pb.j AND pa.vec_id < pb.vec_id
        GROUP BY 1, 2
    ), dorig AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_sum(
                   [ (a.ev[i] - b.ev[i]) ^ 2 for i in range(1, 65) ]), 4)
                   AS d2_orig
        FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, d2_orig, d2_proj
    FROM dorig JOIN dproj USING (id_a, id_b)
    """,
    description="JL projection audit: exact vs 16-dim-projected pairwise "
    "squared distances (md5-parity sign matrix, deterministic)",
)
def zg66_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.similarity import (
        _to_double,
        random_projection,
        squared_l2,
    )

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    proj = random_projection(emb, "vec_id", "embedding", _JL_OUT, _JL_SEED)
    a = proj.select(
        F.col("vec_id").alias("id_a"),
        _to_double(F.col("embedding")).alias("__ea"),
        F.col("proj").alias("__pa"),
    )
    b = proj.select(
        F.col("vec_id").alias("id_b"),
        _to_double(F.col("embedding")).alias("__eb"),
        F.col("proj").alias("__pb"),
    )
    return a.join(b, F.col("id_a") < F.col("id_b")).select(
        "id_a",
        "id_b",
        F.round(squared_l2(F.col("__ea"), F.col("__eb")), 4).alias("d2_orig"),
        F.round(squared_l2(F.col("__pa"), F.col("__pb")), 4).alias("d2_proj"),
    )


# ---------------------------------------------------------------------------
# z67 — winnowing fingerprints (round-5 addition; operators/text.py::
# winnowing_fingerprints — Schleimer et al. 2003, the MOSS algorithm):
# per-window minimum of k-gram hashes, the guaranteed-coverage
# low-density document fingerprint.  Shuffle-free end to end (pinned);
# the DuckDB twin recomputes every k-gram hash and window minimum.
# ---------------------------------------------------------------------------
_WINNOW_K = 4
_WINNOW_W = 5
_WINNOW_GRAM = " || ' ' || ".join(f"t[__i + {j + 1}]" for j in range(_WINNOW_K))


@register(
    "zg54_winnowing_fingerprints",
    oracle=f"""
    WITH __tok AS (
        SELECT doc_id, {_TOK} AS t FROM documents
    ), __wh AS (
        SELECT doc_id,
               CASE WHEN len(t) >= {_WINNOW_K} THEN
                   [ (('0x' || substr(md5({_WINNOW_GRAM}), 1, 14))::BIGINT)
                     for __i in range(0, len(t) - {_WINNOW_K} + 1) ]
               ELSE [] END AS whs
        FROM __tok
    ), __fp AS (
        SELECT doc_id,
               CASE WHEN len(whs) >= {_WINNOW_W} THEN
                   list_distinct(
                       [ list_min(whs[__j + 1:__j + {_WINNOW_W}])
                         for __j in range(0, len(whs) - {_WINNOW_W} + 1) ])
               WHEN len(whs) > 0 THEN [list_min(whs)]
               ELSE [] END AS fps
        FROM __wh
    )
    SELECT doc_id AS id, unnest(fps) AS fp FROM __fp
    """,
    description="winnowing (MOSS) fingerprints: per-window min of k-gram "
    "hashes, shuffle-free, guaranteed substring coverage",
)
def zg54_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.winnowing_fingerprints(
        docs, "doc_id", "text", k=_WINNOW_K, w=_WINNOW_W
    )


# ---------------------------------------------------------------------------
# z68 — within-doc token entropy (round-5 addition; operators/text.py::
# token_entropy): Shannon entropy of each document's own token
# distribution — the no-corpus-pass repetitiveness/diversity quality
# feature (low = template text).  Same ln+ROUND determinism contract as
# bm25/surprisal (driver-green precedent).
# ---------------------------------------------------------------------------
@register(
    "zg64_token_entropy",
    oracle=f"""
    WITH __tok AS (
        SELECT doc_id AS id, {_TOK} AS tok FROM documents
    ), __tf AS (
        SELECT id, len(tok) AS dl, unnest(tok) AS term FROM __tok
    ), __g AS (
        SELECT id, dl, term, COUNT(*) AS tf FROM __tf GROUP BY 1, 2, 3
    )
    SELECT id, CAST(dl AS BIGINT) AS n_tokens,
           ROUND(SUM(-(tf * 1.0 / dl) * ln(tf * 1.0 / dl)), 4) AS entropy
    FROM __g
    GROUP BY id, dl
    """,
    description="per-doc Shannon token entropy (nats): within-doc "
    "repetitiveness quality feature, no corpus pass",
)
def zg64_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.token_entropy(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# z69 — quality-aware canonical selection (round-5 addition;
# operators/graph.py::canonical_selection): near-dup clusters keep the
# HIGHEST-quality member (ties -> min id) instead of the min-id pick —
# the C4/RefinedWeb keep-best convention.  Oracle: z53's recursive
# component closure + the t02 quality expression, argmax via
# max-then-filter-then-min (the same deterministic rule).
# ---------------------------------------------------------------------------
_CANON_ORACLE = f"""{_SHINGLE_CTES}
    , __jp AS (
        SELECT id_a, id_b
        FROM __pairs
        JOIN __sizes na ON id_a = na.doc_id
        JOIN __sizes nb ON id_b = nb.doc_id
        WHERE ROUND(inter * 1.0 / (na.n + nb.n - inter), 4) >= {JACCARD_T}
    ), __edges AS (
        SELECT id_a AS s, id_b AS d FROM __jp
        UNION
        SELECT id_b, id_a FROM __jp
    ), __reach(id, lbl) AS (
        SELECT s, s FROM __edges
        UNION
        SELECT e.d, r.lbl FROM __reach r JOIN __edges e ON e.s = r.id
    ), __memb AS (
        SELECT id AS doc_id, min(lbl) AS cluster_id
        FROM __reach
        GROUP BY id
    ), __qf AS (
        SELECT doc_id, len(t) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT)
                   AS n_punct,
               {stopword_count_sql('t', 'en')} AS sw,
               greatest(len(t), 1) AS d
        FROM (SELECT doc_id, text, {_TOK} AS t FROM documents)
    ), __q AS (
        SELECT doc_id,
               CAST(2 * d * least(n_tokens, 100) - 100 * least(n_punct, d)
                    + 100 * sw AS DOUBLE) / (200 * d) AS quality
        FROM __qf
    ), __m AS (
        SELECT m.doc_id, m.cluster_id, q.quality
        FROM __memb m JOIN __q q USING (doc_id)
    ), __best AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
               MAX(quality) AS canonical_score
        FROM __m GROUP BY 1
    ), __win AS (
        SELECT m.cluster_id, MIN(m.doc_id) AS canonical_id
        FROM __m m
        JOIN __best b
          ON m.cluster_id = b.cluster_id AND m.quality = b.canonical_score
        GROUP BY 1
    )
    SELECT b.cluster_id, b.n_docs, w.canonical_id, b.canonical_score
    FROM __best b JOIN __win w USING (cluster_id)
""".replace("WITH __tok", "WITH RECURSIVE __tok", 1)


@register(
    "zg55_canonical_selection",
    oracle=_CANON_ORACLE,
    description="keep-best dedup: near-dup clusters keep the highest-"
    "quality member (deterministic min-id tie-break)",
)
def zg55_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_join(
        docs, "doc_id", "text", threshold=JACCARD_T, n=SHINGLE_N
    )
    scores = text.quality_score(docs, "doc_id", "text").select(
        "doc_id", "quality"
    )
    return graph.canonical_selection(
        pairs.select("id_a", "id_b"), scores, "doc_id", "quality"
    )


# ---------------------------------------------------------------------------
# t17 (was z70) — count-min-sketch heavy hitters (round-5 addition;
# operators/ranking.py::cms_heavy_hitters — Cormode & Muthukrishnan
# 2005): corpus term frequencies through a bounded 3x512 counter grid,
# report terms whose MIN-row estimate clears 0.1% of the token stream
# (est*1000 >= n_total, integer-exact), with the exact count as audit.
# n_total derives from the sketch itself (sum of one counter row).
# ---------------------------------------------------------------------------
_CMS_D = 3
_CMS_W = 512
_CMS_PPM = 1000  # est * 1e6 >= n_total * ppm  <=>  est/n_total >= 0.1%


def _cms_rows_sql() -> str:
    from spark_sql_hbase_spark.functions.texthash import word_hash_sql

    parts = []
    for r in range(_CMS_D):
        wh = word_hash_sql(f"('cms{r}:' || term)")
        parts.append(
            f"SELECT term, {r} AS row, {wh} % {_CMS_W} AS bucket FROM __t"
        )
    return " UNION ALL ".join(parts)


@register(
    "zg61_cms_heavy_hitters",
    oracle=f"""
    WITH __t AS (
        SELECT unnest({_TOK}) AS term FROM documents
    ), __p AS (
        {{rows}}
    ), __sk AS (
        SELECT row, bucket, COUNT(*) AS c FROM __p GROUP BY 1, 2
    ), __cand AS (
        SELECT term, row, bucket, COUNT(*) AS tc FROM __p GROUP BY 1, 2, 3
    ), __n AS (
        SELECT SUM(c) AS n_total FROM __sk WHERE row = 0
    ), __est AS (
        SELECT term, MIN(c) AS est, MAX(tc) AS true_ct
        FROM __cand JOIN __sk USING (row, bucket)
        GROUP BY term
    )
    SELECT term, CAST(est AS BIGINT) AS est, CAST(true_ct AS BIGINT) AS true_ct
    FROM __est, __n
    WHERE est * 1000000 >= n_total * {_CMS_PPM}
    """.format(rows=_cms_rows_sql()),
    description="count-min-sketch heavy hitters: bounded 3x512 counter "
    "grid, min-row estimate vs exact audit (est >= true always)",
)
def zg61_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.ranking import cms_heavy_hitters

    docs = table(spark, sf_dir, "documents")
    return cms_heavy_hitters(
        docs, "text", threshold_ppm=_CMS_PPM, depth=_CMS_D, width=_CMS_W
    )


# ---------------------------------------------------------------------------
# d13 (was z71) — containment near-dup join (round-5 addition; operators/dedup.py::
# containment_join — Broder 1997 containment coefficient): the
# embedded-copy case plain Jaccard misses.  Candidates ride the
# winnowing fingerprint index (z67) — selected 8-byte hashes at ~1/3 of
# k-gram density — then exact |S_a ∩ S_b| / min(|S_a|,|S_b|) on
# candidates only.  Oracle: same fingerprint candidate generation + the
# exact containment, recomputed end to end.
# ---------------------------------------------------------------------------
_CONT_T = 0.9


@register(
    "zg25_containment_neardup",
    oracle=f"""
    WITH __tok AS (
        SELECT doc_id, {_TOK} AS t FROM documents
    ), __wh AS (
        SELECT doc_id,
               CASE WHEN len(t) >= {_WINNOW_K} THEN
                   [ (('0x' || substr(md5({_WINNOW_GRAM}), 1, 14))::BIGINT)
                     for __i in range(0, len(t) - {_WINNOW_K} + 1) ]
               ELSE [] END AS whs
        FROM __tok
    ), __fp AS (
        SELECT doc_id,
               CASE WHEN len(whs) >= {_WINNOW_W} THEN
                   list_distinct(
                       [ list_min(whs[__j + 1:__j + {_WINNOW_W}])
                         for __j in range(0, len(whs) - {_WINNOW_W} + 1) ])
               WHEN len(whs) > 0 THEN [list_min(whs)]
               ELSE [] END AS fps
        FROM __wh
    ), __inv AS (
        SELECT doc_id, unnest(fps) AS fp FROM __fp
    ), __cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM __inv a JOIN __inv b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), __sh AS (
        SELECT doc_id,
               CASE WHEN len(t) >= {_WINNOW_K} THEN
                   list_distinct([ {_WINNOW_GRAM}
                                   for __i in range(0, len(t) - {_WINNOW_K} + 1) ])
               ELSE [] END AS s
        FROM __tok
    )
    SELECT id_a, id_b,
           ROUND(len(list_intersect(sa.s, sb.s)) * 1.0
                 / least(len(sa.s), len(sb.s)), 4) AS cont
    FROM __cand
    JOIN __sh sa ON id_a = sa.doc_id
    JOIN __sh sb ON id_b = sb.doc_id
    WHERE ROUND(len(list_intersect(sa.s, sb.s)) * 1.0
                / least(len(sa.s), len(sb.s)), 4) >= {_CONT_T}
    """,
    description="containment near-dup: winnowing-index candidates + exact "
    "|A∩B|/min coefficient — catches short-doc-embedded-in-long",
)
def zg25_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.containment_join(
        docs, "doc_id", "text", threshold=_CONT_T, k=_WINNOW_K, w=_WINNOW_W
    )


# ---------------------------------------------------------------------------
# d14 (was z73) — Bloom-prefiltered decontamination (round-5 addition;
# operators/decontam.py::bloom_decontaminate — Bloom 1970): the d08
# operator with a 32 KiB packed-bitmap pre-gate on the training side.
# No false negatives + exact verify ⇒ the result is IDENTICAL to d08's,
# so the gate shares d08's exact oracle verbatim — the oracle checks the
# sketch-accelerated path against ground truth.
# ---------------------------------------------------------------------------
@register(
    "zg26_bloom_decontam",
    oracle=f"""
    WITH __sh AS (
        SELECT doc_id, {shingles_sql(tokens_sql('text'), _DECON_N)} AS s
        FROM documents
    ), __inv AS (
        SELECT doc_id, unnest(s) AS g FROM __sh
    ), __pairs AS (
        SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
               COUNT(*) AS n_shared
        FROM (SELECT * FROM __inv WHERE NOT ({_DECON_EVAL})) tr
        JOIN (SELECT * FROM __inv WHERE {_DECON_EVAL}) ev USING (g)
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_DECON_MIN}
    )
    SELECT train_id,
           COUNT(*) AS n_eval_docs,
           CAST(SUM(n_shared) AS BIGINT) AS total_shared,
           CAST(MAX(n_shared) AS BIGINT) AS max_shared
    FROM __pairs
    GROUP BY train_id
    """,
    description="Bloom-prefiltered decontamination: 32 KiB bitmap gate on "
    "the train side + exact verify — result identical to d08",
)
def zg26_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.decontam import bloom_decontaminate

    docs = table(spark, sf_dir, "documents")
    is_eval = (F.col("doc_id") % 29) == 0
    return bloom_decontaminate(
        docs.filter(~is_eval), docs.filter(is_eval), "doc_id", "text",
        n=_DECON_N, min_overlap=_DECON_MIN,
    )


# ---------------------------------------------------------------------------
# z74 — out-of-vocabulary rate vs the corpus top-V (round-5 addition;
# operators/text.py::oov_rate): tokenizer-coverage analysis — what
# fraction of each doc's token stream falls outside the top-500
# vocabulary (t09's TakeOrdered list, broadcast).  Integer-exact ratio
# (t02 convention).
# ---------------------------------------------------------------------------
_OOV_TOPV = 500


@register(
    "zg65_oov_rate",
    oracle=f"""
    WITH __tok AS (
        SELECT doc_id AS id, {_TOK} AS tok FROM documents
    ), __tf AS (
        SELECT id, len(tok) AS dl, unnest(tok) AS term FROM __tok
    ), __v AS (
        SELECT term FROM (
            SELECT term, COUNT(*) AS n FROM __tf GROUP BY 1
        ) ORDER BY n DESC, term LIMIT {_OOV_TOPV}
    )
    SELECT id, CAST(dl AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / dl AS oov_rate
    FROM __tf LEFT JOIN __v v USING (term)
    GROUP BY id, dl
    """,
    description="per-doc OOV rate vs the corpus top-500 vocabulary "
    "(broadcast lexicon, map-side marking)",
)
def zg65_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    vocab = text.vocabulary(docs, "text", top_k=_OOV_TOPV).select("term")
    return text.oov_rate(docs, vocab, "doc_id", "text")


# ---------------------------------------------------------------------------
# z75 — PMI collocations (round-5 addition; operators/ranking.py::
# pmi_collocations — Church & Hanks 1990): top-k adjacent-pair
# collocations by pointwise mutual information, probabilities from the
# bigram table's own marginals so the statistic is ONE corpus aggregate
# + vocab-cardinality rollups.  Deterministic cutoff: rank on the
# ROUNDED pmi, ties by (w1, w2).
# ---------------------------------------------------------------------------
_PMI_MIN = 5
_PMI_K = 100


@register(
    "zg95_pmi_collocations",
    oracle=f"""
    WITH __tok AS (
        SELECT {_TOK} AS t FROM documents
    ), __bg AS (
        SELECT t[__i + 1] AS w1, t[__i + 2] AS w2
        FROM __tok, LATERAL (
            SELECT unnest(range(0, greatest(len(t) - 1, 0))) AS __i
        )
    ), __c AS (
        SELECT w1, w2, COUNT(*) AS c12 FROM __bg GROUP BY 1, 2
    ), __l AS (
        SELECT w1, SUM(c12) AS c1 FROM __c GROUP BY 1
    ), __r AS (
        SELECT w2, SUM(c12) AS c2 FROM __c GROUP BY 1
    ), __t AS (
        SELECT SUM(c12) AS b_total FROM __c
    )
    SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
           ROUND(ln((c12 * 1.0 * b_total) / (c1 * 1.0 * c2)), 4) AS pmi
    FROM __c JOIN __l USING (w1) JOIN __r USING (w2), __t
    WHERE c12 >= {_PMI_MIN}
    ORDER BY pmi DESC, w1, w2
    LIMIT {_PMI_K}
    """,
    description="top-k PMI collocations from the bigram table's own "
    "marginals — one corpus aggregate, deterministic rounded-pmi cutoff",
)
def zg95_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.ranking import pmi_collocations

    docs = table(spark, sf_dir, "documents")
    return pmi_collocations(
        docs, "text", min_count=_PMI_MIN, top_k=_PMI_K
    )


# ---------------------------------------------------------------------------
# p03 (was z76) — train/test split leakage audit (round-5 addition): assign every
# document to a deterministic hash split (10% test), then report every
# NEAR-DUP pair (d02's banded LSH + exact verify) that CROSSES the
# boundary — the contamination a random split silently ships when the
# corpus still contains near-duplicates.  Composition gate: split
# assignment is row-local; the pair machinery is exactly d02's.
# ---------------------------------------------------------------------------
_SPLIT_MOD = 10  # test = hash(doc_id) % 10 == 0 (10% held out)


def _split_sql(idexpr: str) -> str:
    from spark_sql_hbase_spark.functions.texthash import word_hash_sql

    wh = word_hash_sql(f"('split:' || {idexpr})")
    return f"CASE WHEN {wh} % {_SPLIT_MOD} = 0 THEN 'test' ELSE 'train' END"


def _z76_oracle() -> str:
    jp = f"""{_SHINGLE_CTES}
    , __jp AS (
        SELECT id_a, id_b,
               ROUND(inter * 1.0 / (na.n + nb.n - inter), 4) AS jac
        FROM __pairs
        JOIN __sizes na ON id_a = na.doc_id
        JOIN __sizes nb ON id_b = nb.doc_id
        WHERE ROUND(inter * 1.0 / (na.n + nb.n - inter), 4) >= {JACCARD_T}
    )
    SELECT * FROM (
        SELECT id_a, id_b, jac,
               {_split_sql('id_a')} AS side_a,
               {_split_sql('id_b')} AS side_b
        FROM __jp
    ) WHERE side_a <> side_b
    """
    return jp


@register(
    "zf12_split_leakage",
    oracle=None,  # assembled below (needs _split_sql defined first)
    description="split-leakage audit: near-dup pairs crossing a "
    "deterministic 90/10 hash split",
)
def zf12_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.functions.texthash import word_hash

    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_join(
        docs, "doc_id", "text", threshold=JACCARD_T, n=SHINGLE_N
    )

    def side(idcol: str):
        h = word_hash(
            F.concat(F.lit("split:"), F.col(idcol).cast("string"))
        )
        return F.when(h % _SPLIT_MOD == 0, F.lit("test")).otherwise(
            F.lit("train")
        )

    return (
        pairs.select(
            "id_a",
            "id_b",
            "jac",
            side("id_a").alias("side_a"),
            side("id_b").alias("side_b"),
        )
        .filter(F.col("side_a") != F.col("side_b"))
    )


from spark_sql_hbase_spark.queries import REGISTRY as _REG76  # noqa: E402

_REG76["zf12_split_leakage"].oracle = _z76_oracle()


# ---------------------------------------------------------------------------
# z78 — CCNet head/middle/tail surprisal buckets (round-5 addition;
# operators/ranking.py::surprisal_buckets — Wenzek et al. 2020): LM-
# quality tertiles over the corpus-unigram surprisal; boundaries are
# percentile_disc DATA VALUES (t08's cross-engine convention — DuckDB
# quantile_disc computes the identical element).
# ---------------------------------------------------------------------------
@register(
    "zh08_surprisal_buckets",
    oracle=f"""
    WITH __tok AS (
        SELECT doc_id AS id, {_TOK} AS tok FROM documents
    ), __tf AS (
        SELECT id, len(tok) AS dl, unnest(tok) AS term FROM __tok
    ), __g AS (
        SELECT id, dl, term, COUNT(*) AS tf FROM __tf GROUP BY 1, 2, 3
    ), __ct AS (
        SELECT term, COUNT(*) AS ct FROM __tf GROUP BY 1
    ), __n AS (
        SELECT SUM(len(tok)) AS n_total FROM __tok
    ), __s AS (
        SELECT id,
               CAST(dl AS BIGINT) AS n_tokens,
               ROUND(SUM(tf * -ln(ct * 1.0 / n_total)) / dl, 4) AS surprisal
        FROM __g JOIN __ct USING (term), __n
        GROUP BY id, dl
    ), __b AS (
        SELECT quantile_disc(surprisal, 0.3333333333333333) AS b1,
               quantile_disc(surprisal, 0.6666666666666666) AS b2
        FROM __s
    )
    SELECT id, n_tokens, surprisal,
           CASE WHEN surprisal <= b1 THEN 'head'
                WHEN surprisal <= b2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM __s, __b
    """,
    description="CCNet-style head/middle/tail tertiles over corpus-"
    "unigram surprisal (percentile_disc boundaries, no window)",
)
def zh08_surprisal_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.ranking import surprisal_buckets

    docs = table(spark, sf_dir, "documents")
    return surprisal_buckets(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# d15 (was z79) — C4-style line-level dedup stats (round-5 addition;
# operators/dedup.py::line_dedup_stats — Raffel et al. 2020 §2.2):
# normalized sentences hashed, corpus count >= 2 flags duplicated lines,
# per-doc duplicated-line mass.  One 8-byte hash per LINE in the shuffle
# (cheaper than the per-token duplicate_spans).
# ---------------------------------------------------------------------------
_LINE_MT = 3  # C4 convention: lines with >= 3 words


@register(
    "zg27_line_dedup_stats",
    oracle=f"""
    WITH __ln AS (
        SELECT doc_id,
               list_filter(
                   list_transform(string_split_regex(lower(text), '[.!?]+'),
                                  x -> trim(x)),
                   x -> x <> '' AND
                        len(list_filter(
                            string_split_regex(x, '[^a-z0-9]+'),
                            y -> y <> '')) >= {_LINE_MT}) AS ls
        FROM documents
    ), __h AS (
        SELECT doc_id,
               list_transform(ls,
                   x -> (('0x' || substr(md5(x), 1, 14))::BIGINT)) AS lhs
        FROM __ln
    ), __e AS (
        SELECT doc_id, unnest(lhs) AS h FROM __h
    ), __dup AS (
        SELECT h FROM __e GROUP BY h HAVING COUNT(*) >= 2
    ), __pd AS (
        SELECT doc_id, COUNT(*) AS n_dup
        FROM __e WHERE h IN (SELECT h FROM __dup)
        GROUP BY doc_id
    )
    SELECT b.doc_id AS id,
           CAST(len(b.lhs) AS BIGINT) AS n_lines,
           CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_lines,
           COALESCE(p.n_dup, 0) * 1.0 / len(b.lhs) AS dup_frac
    FROM __h b LEFT JOIN __pd p USING (doc_id)
    WHERE len(b.lhs) > 0
    """,
    description="C4-style line-level dedup stats: normalized-sentence "
    "hashes, corpus count >= 2, per-doc duplicated-line mass",
)
def zg27_line_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.line_dedup_stats(
        docs, "doc_id", "text", min_line_tokens=_LINE_MT
    )


# ---------------------------------------------------------------------------
# z80 — boilerplate-line stripping (round-5 addition; operators/dedup.py
# ::strip_boilerplate_lines): the transformation twin of z79/z58 —
# corpus-frequent lines (df > max_df) removed, cleaned corpus emitted.
# Document text never enters an exchange: the flagged set (bounded —
# boilerplate is few distinct strings) rides one packed broadcast row as
# an exact hash map and the reconstruction is a row-local array filter.
# ---------------------------------------------------------------------------
_STRIP_DF = 5


@register(
    "zh10_boilerplate_strip",
    oracle=f"""
    WITH __ln AS (
        SELECT doc_id,
               list_filter(
                   list_transform(string_split_regex(lower(text), '[.!?]+'),
                                  x -> trim(x)),
                   x -> x <> '' AND
                        len(list_filter(
                            string_split_regex(x, '[^a-z0-9]+'),
                            y -> y <> '')) >= {_LINE_MT}) AS ls
        FROM documents
    ), __e AS (
        SELECT doc_id, ls[i + 1] AS x, i AS pos
        FROM __ln, LATERAL (SELECT unnest(range(0, len(ls))) AS i)
    ), __cnt AS (
        SELECT h, COUNT(*) AS c FROM (
            SELECT DISTINCT doc_id,
                   (('0x' || substr(md5(x), 1, 14))::BIGINT) AS h
            FROM __e
        ) GROUP BY h
    ), __fl AS (
        SELECT h FROM __cnt WHERE c > {_STRIP_DF}
    ), __kept AS (
        SELECT doc_id, x, pos
        FROM __e
        WHERE (('0x' || substr(md5(x), 1, 14))::BIGINT) NOT IN
              (SELECT h FROM __fl)
    ), __agg AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               string_agg(x, '. ' ORDER BY pos) AS clean_text
        FROM __kept GROUP BY doc_id
    )
    SELECT b.doc_id AS id,
           CAST(len(b.ls) AS BIGINT) AS n_lines,
           CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(a.clean_text, '') AS clean_text
    FROM __ln b LEFT JOIN __agg a USING (doc_id)
    WHERE len(b.ls) > 0
    """,
    description="boilerplate-line stripping: corpus-frequent lines "
    "removed via a broadcast hash map, cleaned corpus emitted shuffle-free",
)
def zh10_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.strip_boilerplate_lines(
        docs, "doc_id", "text", max_df=_STRIP_DF, min_line_tokens=_LINE_MT
    )


# ---------------------------------------------------------------------------
# z86 — kNN label propagation over embeddings (round-5 addition): the
# classic semi-supervised curation classifier (label the unlabeled pool
# by majority vote of its k nearest labeled neighbors — the embedding-
# space analogue of fastText-style quality classifiers).  Composition:
# s01's broadcast-query cosine top-k + a deterministic majority
# (max-votes, ties -> smallest label; no max_by).
# ---------------------------------------------------------------------------
_KNN_K = 5


@register(
    "zg67_knn_label_propagation",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id % 23 = 0
    ), pool AS (
        SELECT vec_id, label, embedding FROM embeddings
        WHERE vec_id % 23 <> 0
    ), scored AS (
        SELECT query_id, vec_id AS neighbor_id, label,
               list_cosine_similarity(qv, embedding::DOUBLE[]) AS cos_raw
        FROM q, pool
    ), nn AS (
        SELECT query_id, label FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
            ) AS rn FROM scored
        ) WHERE rn <= {_KNN_K}
    ), votes AS (
        SELECT query_id, label, COUNT(*) AS n FROM nn GROUP BY 1, 2
    ), best AS (
        SELECT query_id, MAX(n) AS best_n FROM votes GROUP BY 1
    )
    SELECT v.query_id,
           CAST(MIN(v.label) AS INTEGER) AS pred_label,
           CAST(b.best_n AS BIGINT) AS n_votes
    FROM votes v JOIN best b
      ON v.query_id = b.query_id AND v.n = b.best_n
    GROUP BY v.query_id, b.best_n
    """,
    description="kNN label propagation: majority label of the k nearest "
    "labeled neighbors (deterministic min-label ties)",
)
def zg67_knn_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    is_q = F.col("vec_id") % 23 == 0
    queries, pool = emb.filter(is_q), emb.filter(~is_q)
    # determinism note: the k-th-rank cutoff shares s01's accepted
    # cross-engine contract (raw-cosine ordering + neighbor_id ties,
    # driver-green since r1); the broadcast hint goes on the TINY nn
    # relation (|queries|*k rows), never the corpus-sized label pool
    nn = similarity.cosine_topk(pool, queries, "vec_id", "embedding", _KNN_K)
    votes = (
        F.broadcast(nn)
        .join(
            pool.select(F.col("vec_id").alias("neighbor_id"), "label"),
            "neighbor_id",
        )
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    best = votes.groupBy("query_id").agg(F.max("n").alias("best_n")).select(
        F.col("query_id").alias("__bq"), "best_n"
    )
    return (
        votes.join(
            best,
            (votes["query_id"] == best["__bq"]) & (votes["n"] == best["best_n"]),
        )
        .select("query_id", "label", "best_n")
        .groupBy("query_id", "best_n")
        .agg(F.min("label").cast("int").alias("pred_label"))
        .select(
            "query_id", "pred_label", F.col("best_n").cast("long").alias("n_votes")
        )
    )


# ---------------------------------------------------------------------------
# p04 (was z87) — corpus snapshot diff (round-5 addition): the dataset-versioning
# audit run between two corpus releases — full outer join on doc id,
# content compared by sha256, per-source rollup of added / removed /
# changed / unchanged.  Snapshot v2 is constructed deterministically
# from the driver table (every 13th doc dropped, every 11th doc's text
# amended), so the oracle replays the same construction.
# ---------------------------------------------------------------------------
@register(
    "zf13_corpus_snapshot_diff",
    oracle="""
    WITH v1 AS (
        SELECT doc_id, source, sha256(text) AS sha FROM documents
    ), v2 AS (
        SELECT doc_id, source,
               sha256(CASE WHEN doc_id % 11 = 0
                           THEN text || ' [amended v2]' ELSE text END) AS sha
        FROM documents WHERE doc_id % 13 <> 0
    ), d AS (
        SELECT COALESCE(v1.source, v2.source) AS source,
               CASE WHEN v1.doc_id IS NULL THEN 'added'
                    WHEN v2.doc_id IS NULL THEN 'removed'
                    WHEN v1.sha <> v2.sha THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM v1 FULL OUTER JOIN v2 USING (doc_id)
    )
    SELECT source, status, COUNT(*) AS n_docs
    FROM d GROUP BY 1, 2
    """,
    description="corpus snapshot diff: full-outer sha compare between "
    "releases, per-source added/removed/changed/unchanged rollup",
)
def zf13_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # presence is tracked by explicit flags, NOT by sha nullability — a
    # NULL text would null the sha on a row that IS present and
    # misclassify it (review finding); `changed` keeps plain != NULL
    # semantics to mirror the oracle's CASE exactly
    v1 = docs.select(
        "doc_id",
        "source",
        F.sha2(F.col("text").cast("binary"), 256).alias("sha"),
        F.lit(1).alias("__p1"),
    )
    v2 = docs.filter(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.col("source").alias("source2"),
        F.sha2(
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(F.col("text"), F.lit(" [amended v2]")),
            )
            .otherwise(F.col("text"))
            .cast("binary"),
            256,
        ).alias("sha2v"),
        F.lit(1).alias("__p2"),
    )
    d = v1.join(v2, "doc_id", "full_outer").select(
        F.coalesce(F.col("source"), F.col("source2")).alias("source"),
        F.when(F.col("__p1").isNull(), F.lit("added"))
        .when(F.col("__p2").isNull(), F.lit("removed"))
        .when(F.col("sha") != F.col("sha2v"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
    return d.groupBy("source", "status").agg(F.count(F.lit(1)).alias("n_docs"))


# ---------------------------------------------------------------------------
# z90 — HLL sketch-union vocabulary overlap (round-5 addition): the
# MERGEABLE-sketch algebra a 100 TB deployment runs — one DataSketches
# HLL per source (built distributed, map-side combined), pairwise
# |A ∩ B| estimated by inclusion–exclusion over sketch UNIONS (sketches
# merge; exact distinct sets don't).  Self-validating gate in the q16
# convention: the output carries the EXACT pairwise vocabulary overlap
# plus an estimate-within-8%-of-exact-union boolean; the oracle computes
# the exact values and literal TRUEs (the sketch estimate itself is
# engine-specific and never hashed).
# ---------------------------------------------------------------------------
@register(
    "zg56_hll_vocab_overlap",
    oracle=f"""
    WITH __t AS (
        SELECT DISTINCT source, unnest({_TOK}) AS term FROM documents
    ), __pairs AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS exact_inter
        FROM __t a JOIN __t b ON a.term = b.term AND a.source < b.source
        GROUP BY 1, 2
    ), __sz AS (
        SELECT source, COUNT(*) AS n FROM __t GROUP BY 1
    )
    SELECT src_a, src_b,
           CAST(exact_inter AS BIGINT) AS exact_inter,
           CAST(sa.n + sb.n - exact_inter AS BIGINT) AS exact_union,
           TRUE AS union_est_ok
    FROM __pairs
    JOIN __sz sa ON src_a = sa.source
    JOIN __sz sb ON src_b = sb.source
    """,
    description="HLL sketch-union vocabulary overlap per source pair: "
    "exact values + estimate-error-bound boolean (q16 convention)",
)
def zg56_hll_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.functions.texthash import tokens as _tokens

    docs = table(spark, sf_dir, "documents")
    # cached: three consumers (sketch aggregate + both sides of the
    # exact-intersection join) share one scan+tokenize+distinct — the
    # z89 cache discipline (callers clearCache between repeated runs)
    t = (
        docs.select(
            "source",
            F.explode(F.array_distinct(_tokens(F.col("text")))).alias("term"),
        )
        .distinct()
        .cache()
    )
    sk = t.groupBy("source").agg(
        F.hll_sketch_agg("term").alias("sk"), F.count(F.lit(1)).alias("n")
    )
    a = sk.select(
        F.col("source").alias("src_a"), F.col("sk").alias("sk_a"), F.col("n").alias("n_a")
    )
    b = sk.select(
        F.col("source").alias("src_b"), F.col("sk").alias("sk_b"), F.col("n").alias("n_b")
    )
    pairs = a.join(b, F.col("src_a") < F.col("src_b"))
    est_union = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    exact = t.select(F.col("source").alias("src_a"), "term").join(
        t.select(F.col("source").alias("src_b"), "term"), "term"
    ).filter(F.col("src_a") < F.col("src_b")).groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).alias("exact_inter")
    )
    out = pairs.join(exact, ["src_a", "src_b"]).select(
        "src_a",
        "src_b",
        F.col("exact_inter").cast("long").alias("exact_inter"),
        (F.col("n_a") + F.col("n_b") - F.col("exact_inter"))
        .cast("long")
        .alias("exact_union"),
        (
            F.abs(
                est_union
                - (F.col("n_a") + F.col("n_b") - F.col("exact_inter"))
            )
            / (F.col("n_a") + F.col("n_b") - F.col("exact_inter"))
            <= F.lit(0.08)
        ).alias("union_est_ok"),
    )
    return out


# ---------------------------------------------------------------------------
# z92 — per-source standardized quality (round-5 addition;
# operators/text.py::source_standardized_quality): domain-normalized
# z-scores — μ/σ per source from ORDER-INDEPENDENT decimal-exact sums
# (the det.py law: Σq at DECIMAL(38,6), Σq² at DECIMAL(38,12)), so the
# broadcast moments are bit-identical cross-engine; remaining arithmetic
# is one fixed IEEE sequence + ROUND.
# ---------------------------------------------------------------------------
_Z92_Q = (
    "CAST(2 * __d * least(__nt, 100) - 100 * least(__np, __d) + 100 * __sw"
    " AS DOUBLE) / (200 * __d)"
)


def _z92_oracle() -> str:
    from spark_sql_hbase_spark.functions.texthash import stopword_count_sql

    return f"""
    WITH __f AS (
        SELECT doc_id, source, len(t) AS __nt,
               CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT)
                   AS __np,
               {stopword_count_sql('t', 'en')} AS __sw,
               greatest(len(t), 1) AS __d
        FROM (SELECT doc_id, source, text, {_TOK} AS t FROM documents)
    ), __q AS (
        SELECT doc_id, source, {_Z92_Q} AS q FROM __f
    ), __m AS (
        SELECT source,
               CAST(SUM(CAST(q AS DECIMAL(38,6))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(q * q AS DECIMAL(38,12))) AS DOUBLE) AS s2,
               COUNT(*) AS n
        FROM __q GROUP BY 1
    )
    SELECT doc_id AS id, source, q AS quality,
           CASE WHEN greatest(s2 / n - (s1 / n) * (s1 / n), 0.0) > 0
                THEN ROUND((q - s1 / n)
                           / sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)),
                           4)
                ELSE 0.0 END AS z
    FROM __q JOIN __m USING (source)
    """


@register(
    "t28_source_standardized_quality",
    oracle=None,  # assembled below
    description="per-source quality z-scores: decimal-exact moments, "
    "broadcast standardization (domain-normalized curation cuts)",
)
def t28_source_standardized_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.source_standardized_quality(docs, "source", "doc_id", "text")


from spark_sql_hbase_spark.queries import REGISTRY as _REG92  # noqa: E402

_REG92["t28_source_standardized_quality"].oracle = _z92_oracle()


# ---------------------------------------------------------------------------
# z94 — Zipf-slope corpus audit (round-5 addition; operators/text.py::
# zipf_slope): least-squares ln(freq)-on-ln(rank) fit over the top-500
# vocabulary — natural text sits near slope ≈ −1; boilerplate-heavy or
# synthetic corpora deviate.  The corpus contributes exactly the t09
# vocabulary aggregate; the regression runs over ≤ 500 rows.
# ---------------------------------------------------------------------------
@register(
    "zg96_zipf_slope",
    oracle=f"""
    WITH __tf AS (
        SELECT unnest({_TOK}) AS term FROM documents
    ), __v AS (
        SELECT term, COUNT(*) AS n FROM __tf GROUP BY 1
        ORDER BY n DESC, term LIMIT 500
    ), __r AS (
        SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, term) AS DOUBLE))
                   AS x,
               ln(CAST(n AS DOUBLE)) AS y
        FROM __v
    ), __m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS k,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
        FROM __r
    )
    SELECT CAST(k AS BIGINT) AS n_terms,
           ROUND((sxy - sx * sy / k) / (sxx - sx * sx / k), 4) AS slope,
           ROUND(((sxy - sx * sy / k) * (sxy - sx * sy / k))
                 / ((sxx - sx * sx / k) * (syy - sy * sy / k)), 4) AS r2
    FROM __m
    """,
    description="Zipf-law fit over the top-500 vocabulary: ln-ln "
    "least-squares slope + R2 — the corpus-health audit",
)
def zg96_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.zipf_slope(docs, "text", top_k=500)


# ---------------------------------------------------------------------------
# z98 — leakage-free split repair (round-5 addition): the FIX for what
# z76 audits — after hash-splitting, any near-dup component that
# straddles the train/test boundary is moved WHOLLY to train (the
# conservative repair: test stays clean, train keeps the data), so no
# near-dup pair can cross the boundary by construction.  Composition:
# d02 pairs → connected components → component-level repair; docs in no
# pair keep their hash split.
# ---------------------------------------------------------------------------
@register(
    "zg97_leakage_free_split",
    oracle=f"""{_SHINGLE_CTES}
    , __jp AS (
        SELECT id_a, id_b
        FROM __pairs
        JOIN __sizes na ON id_a = na.doc_id
        JOIN __sizes nb ON id_b = nb.doc_id
        WHERE ROUND(inter * 1.0 / (na.n + nb.n - inter), 4) >= {JACCARD_T}
    ), __edges AS (
        SELECT id_a AS s, id_b AS d FROM __jp
        UNION
        SELECT id_b, id_a FROM __jp
    ), __reach(id, lbl) AS (
        SELECT s, s FROM __edges
        UNION
        SELECT e.d, r.lbl FROM __reach r JOIN __edges e ON e.s = r.id
    ), __memb AS (
        SELECT id AS doc_id, min(lbl) AS comp FROM __reach GROUP BY id
    ), __hs AS (
        SELECT doc_id, {_split_sql('doc_id')} AS hash_split FROM documents
    ), __cf AS (
        SELECT m.comp,
               MAX(CASE WHEN h.hash_split = 'train' THEN 1 ELSE 0 END)
                   AS any_train
        FROM __memb m JOIN __hs h USING (doc_id)
        GROUP BY m.comp
    )
    SELECT h.doc_id,
           CASE WHEN m.comp IS NULL THEN h.hash_split
                WHEN cf.any_train = 1 THEN 'train'
                ELSE h.hash_split END AS split
    FROM __hs h
    LEFT JOIN __memb m USING (doc_id)
    LEFT JOIN __cf cf ON m.comp = cf.comp
""".replace("WITH __tok", "WITH RECURSIVE __tok", 1),
    description="leakage-free split repair: near-dup components that "
    "straddle train/test move wholly to train",
)
def zg97_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.functions.texthash import word_hash

    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_join(
        docs, "doc_id", "text", threshold=JACCARD_T, n=SHINGLE_N
    )
    comp = graph.connected_components(pairs.select("id_a", "id_b")).select(
        F.col("id").alias("doc_id"), "comp"
    )
    h = word_hash(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
    hs = docs.select(
        "doc_id",
        F.when(h % _SPLIT_MOD == 0, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("hash_split"),
    )
    cf = (
        comp.join(hs, "doc_id")
        .groupBy("comp")
        .agg(
            F.max((F.col("hash_split") == "train").cast("int")).alias(
                "any_train"
            )
        )
    )
    return (
        hs.join(comp, "doc_id", "left_outer")
        .join(cf, "comp", "left_outer")
        .select(
            "doc_id",
            F.when(F.col("comp").isNull(), F.col("hash_split"))
            .when(F.col("any_train") == 1, F.lit("train"))
            .otherwise(F.col("hash_split"))
            .alias("split"),
        )
    )


# ---------------------------------------------------------------------------
# z99 — corpus release report (round-5 capstone composition): the
# operators work TOGETHER — boilerplate stripping (z80) → quality gate
# on the CLEANED text (t02 law) → exact dedup of cleaned docs (min-id
# keeper) → per-source release manifest (docs kept, tokens shipped).
# Every stage reuses a gate-proven operator; the oracle replays the
# identical pipeline in SQL.
# ---------------------------------------------------------------------------
_Z99_QT = 0.35


@register(
    "p08_release_report",
    oracle=f"""
    WITH __ln AS (
        SELECT doc_id,
               list_filter(
                   list_transform(string_split_regex(lower(text), '[.!?]+'),
                                  x -> trim(x)),
                   x -> x <> '' AND
                        len(list_filter(
                            string_split_regex(x, '[^a-z0-9]+'),
                            y -> y <> '')) >= {_LINE_MT}) AS ls
        FROM documents
    ), __e AS (
        SELECT doc_id, ls[i + 1] AS x, i AS pos
        FROM __ln, LATERAL (SELECT unnest(range(0, len(ls))) AS i)
    ), __cnt AS (
        SELECT h, COUNT(*) AS c FROM (
            SELECT DISTINCT doc_id,
                   (('0x' || substr(md5(x), 1, 14))::BIGINT) AS h
            FROM __e
        ) GROUP BY h
    ), __fl AS (
        SELECT h FROM __cnt WHERE c > {_STRIP_DF}
    ), __kept AS (
        SELECT doc_id, x, pos
        FROM __e
        WHERE (('0x' || substr(md5(x), 1, 14))::BIGINT) NOT IN
              (SELECT h FROM __fl)
    ), __clean AS (
        SELECT b.doc_id,
               COALESCE(a.clean_text, '') AS clean_text
        FROM __ln b LEFT JOIN (
            SELECT doc_id, string_agg(x, '. ' ORDER BY pos) AS clean_text
            FROM __kept GROUP BY doc_id
        ) a USING (doc_id)
        WHERE len(b.ls) > 0
    ), __qf AS (
        SELECT c.doc_id, d.source, c.clean_text,
               len(t) AS nt,
               CAST(len(regexp_extract_all(c.clean_text, '[^A-Za-z0-9\\s]'))
                    AS BIGINT) AS np,
               {stopword_count_sql('t', 'en')} AS sw,
               greatest(len(t), 1) AS dn
        FROM (SELECT doc_id, clean_text,
                     {tokens_sql('clean_text')} AS t FROM __clean) c
        JOIN documents d USING (doc_id)
    ), __q AS (
        SELECT doc_id, source, clean_text, nt,
               CAST(2 * dn * least(nt, 100) - 100 * least(np, dn) + 100 * sw
                    AS DOUBLE) / (200 * dn) AS q
        FROM __qf
    ), __g AS (
        SELECT * FROM __q WHERE q >= {_Z99_QT}
    ), __dedup AS (
        SELECT source, nt FROM (
            SELECT *, row_number() OVER (
                PARTITION BY sha256(clean_text) ORDER BY doc_id
            ) AS rn FROM __g
        ) WHERE rn = 1
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS total_tokens
    FROM __dedup GROUP BY source
    """,
    description="corpus release report: strip boilerplate -> quality "
    "gate on cleaned text -> exact dedup -> per-source manifest",
)
def p08_release_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.functions.texthash import tokens as _tokens
    from spark_sql_hbase_spark.operators.text import quality_expr_tokens

    docs = table(spark, sf_dir, "documents")
    cleaned = dedup.strip_boilerplate_lines(
        docs, "doc_id", "text", max_df=_STRIP_DF, min_line_tokens=_LINE_MT
    ).select(F.col("id").alias("doc_id"), "clean_text")
    with_src = cleaned.join(docs.select("doc_id", "source"), "doc_id")
    # token-array twin behind the Generate barrier: the quality gate is
    # a FILTER shape, where the bound-once token form measures faster
    # than the regex twin (round 14, see quality_expr_tokens)
    scored = with_src.select(
        "doc_id",
        "source",
        "clean_text",
        F.explode(F.array(_tokens(F.col("clean_text")))).alias("__tok"),
    ).select(
        "doc_id",
        "source",
        "clean_text",
        F.size("__tok").alias("nt"),
        quality_expr_tokens("clean_text", F.col("__tok")).alias("q"),
    )
    # cached: consumed by BOTH sides of the dedup semi-join — uncached,
    # the whole strip->join->tokenize->quality lineage would execute
    # twice (z89/z90 cache discipline; callers clearCache between runs)
    gated = scored.filter(F.col("q") >= _Z99_QT).cache()
    keep = dedup.exact_dedup(gated, "doc_id", "clean_text").select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = gated.join(keep, "doc_id", "left_semi")
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").cast("long").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# za02 — contrastive pair mining (round-5 addition): the embedding-model
# training-data primitive — per anchor, the nearest SAME-label neighbor
# (positive) and the nearest DIFFERENT-label neighbor (hard negative),
# s01's deterministic selection law (raw-cosine order, id ties) applied
# per label class.
# ---------------------------------------------------------------------------
@register(
    "zg68_contrastive_pairs",
    oracle="""
    WITH q AS (
        SELECT vec_id AS anchor, label AS alabel, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 16
    ), scored AS (
        SELECT anchor, alabel, e.vec_id AS nid, e.label AS nlabel,
               list_cosine_similarity(qv, e.embedding::DOUBLE[]) AS c
        FROM q JOIN embeddings e ON e.vec_id <> anchor
    ), pos AS (
        SELECT anchor, nid AS pos_id, ROUND(c, 4) AS pos_cos FROM (
            SELECT *, row_number() OVER (
                PARTITION BY anchor ORDER BY c DESC, nid
            ) AS rn FROM scored WHERE nlabel = alabel
        ) WHERE rn = 1
    ), neg AS (
        SELECT anchor, nid AS neg_id, ROUND(c, 4) AS neg_cos FROM (
            SELECT *, row_number() OVER (
                PARTITION BY anchor ORDER BY c DESC, nid
            ) AS rn FROM scored WHERE nlabel <> alabel
        ) WHERE rn = 1
    )
    SELECT anchor, pos_id, pos_cos, neg_id, neg_cos
    FROM pos JOIN neg USING (anchor)
    """,
    description="contrastive pair mining: nearest same-label positive + "
    "nearest different-label hard negative per anchor",
)
def zg68_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-cardinality contract (VERDICT r9 note 3): the scored
    relation below is O(anchors × corpus) and is ``.cache()``d for its
    two consumers (positive and negative branches) — both the broadcast
    of the anchor set and the cache are sized by the ANCHOR count (16
    here), not the corpus.  Callers scaling this pattern keep the
    anchor set broadcast-small (thousands, not millions); a
    corpus-sized anchor set needs the bucketed-ANN join
    (``operators/similarity.py``) instead, the same knob
    ``resample_ffill`` documents for its grid density."""
    from pyspark.sql import Window as W

    from spark_sql_hbase_spark.operators.similarity import _to_double, cosine

    emb = table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("anchor"),
        F.col("label").alias("alabel"),
        _to_double(F.col("embedding")).alias("qv"),
    )
    pool = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nlabel"),
        _to_double(F.col("embedding")).alias("nv"),
    )
    # cached: both the pos and neg branches consume the O(A×N×dim)
    # scoring — uncached it would execute twice (z89/z99 discipline)
    scored = (
        F.broadcast(anchors)
        .join(pool, F.col("nid") != F.col("anchor"))
        .select(
            "anchor",
            "alabel",
            "nid",
            "nlabel",
            cosine(F.col("qv"), F.col("nv")).alias("c"),
        )
        .cache()
    )
    w = W.partitionBy("anchor").orderBy(F.col("c").desc(), F.col("nid"))
    pos = (
        scored.filter(F.col("nlabel") == F.col("alabel"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor",
            F.col("nid").alias("pos_id"),
            F.round("c", 4).alias("pos_cos"),
        )
    )
    neg = (
        scored.filter(F.col("nlabel") != F.col("alabel"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor",
            F.col("nid").alias("neg_id"),
            F.round("c", 4).alias("neg_cos"),
        )
    )
    return pos.join(neg, "anchor")


# ---------------------------------------------------------------------------
# zc04 — quality keep-threshold sweep (round-6 addition; operators/
# text.py::quality_threshold_sweep): the curve a curation run reads to
# choose its keep threshold — per candidate threshold, surviving doc
# count/fraction and mean quality, from ONE corpus scan + a B-row
# histogram + suffix-cumulative windows over the bounded histogram
# (never a per-threshold filter pass).  Oracle: the identical
# construction over the shared per-doc quality CTE.
# ---------------------------------------------------------------------------
@register(
    "zg70_quality_threshold_sweep",
    oracle=f"""
    WITH __q AS ({_QUALITY_ORACLE}),
    __h AS (
        SELECT LEAST(GREATEST(CAST(floor((quality + 0.5) * 10.0) AS BIGINT),
                              0), 19) AS bucket,
               quality
        FROM __q
    ),
    __hist AS (
        SELECT bucket, COUNT(*) AS n,
               SUM(CAST(quality AS DECIMAL(38,6))) AS qs
        FROM __h GROUP BY bucket
    ),
    __f AS (
        SELECT g.bucket, COALESCE(n, 0) AS n,
               COALESCE(qs, CAST(0 AS DECIMAL(38,6))) AS qs
        FROM generate_series(0, 19) g(bucket)
        LEFT JOIN __hist h ON g.bucket = h.bucket
    )
    SELECT -0.5 + bucket / 10.0 AS threshold,
           CAST(SUM(n) OVER w AS BIGINT) AS kept_docs,
           CAST(SUM(n) OVER w AS DOUBLE) / SUM(n) OVER () AS kept_frac,
           CASE WHEN SUM(n) OVER w > 0
                THEN CAST(ROUND(SUM(qs) OVER w, 2) AS DOUBLE)
                     / SUM(n) OVER w
           END AS mean_quality
    FROM __f
    WINDOW w AS (ORDER BY bucket DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY threshold
    """,
    description="keep-threshold sweep: survivors + mean quality per "
    "candidate threshold from one scan + bounded histogram",
)
def zg70_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.quality_threshold_sweep(docs, "text", n_buckets=20)


# ---------------------------------------------------------------------------
# zc10 — fastText-style hashed linear quality scorer (round-6 addition;
# operators/text.py::hashed_linear_score): the model-based quality
# filter reduced to its scale shape — per-token weights looked up by
# feature hash (no vocabulary join), one row-local fold, integer-exact
# score, sign decision.  Stand-in weights derive from the cross-engine
# word hash so the oracle reproduces them exactly.
# ---------------------------------------------------------------------------
@register(
    "zg62_hashed_linear_score",
    oracle=f"""
    SELECT doc_id,
           CAST(COALESCE(list_sum(list_transform({_TOK},
                x -> (('0x' || substr(md5(x), 1, 14))::BIGINT % 2001) - 1000)),
                0) AS BIGINT) AS score_milli,
           CAST(CAST(COALESCE(list_sum(list_transform({_TOK},
                x -> (('0x' || substr(md5(x), 1, 14))::BIGINT % 2001) - 1000)),
                0) AS DOUBLE) / 1000.0 AS DOUBLE) AS score,
           COALESCE(list_sum(list_transform({_TOK},
                x -> (('0x' || substr(md5(x), 1, 14))::BIGINT % 2001) - 1000)),
                0) > 0 AS keep
    FROM documents
    """,
    description="hashed linear quality scorer: per-token hash-indexed "
    "weights, row-local fold, integer-exact score",
)
def zg62_hashed_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.hashed_linear_score(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# zc11 — PII redaction transform (round-6 addition; operators/text.py::
# pii_redact): the cleaned-corpus twin of the zb20 audit — matches
# replaced by <type> tags in fixed pattern order, replacement count
# alongside; one JVM regexp projection, text never shuffled.  Same
# deterministic PII augmentation as zb20 so hits exist at every SF.
# ---------------------------------------------------------------------------
@register(
    "t19_pii_redact",
    oracle=r"""
    WITH __aug AS (SELECT doc_id, """ + _PII_AUG + r""" AS t FROM documents),
    __s1 AS (
        SELECT doc_id, t,
               len(regexp_extract_all(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c1,
               regexp_replace(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<email>', 'g') AS t1
        FROM __aug
    ),
    __s2 AS (
        SELECT doc_id, c1,
               len(regexp_extract_all(t1,
                   '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS c2,
               regexp_replace(t1,
                   '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}',
                   '<ip>', 'g') AS t2
        FROM __s1
    )
    SELECT doc_id,
           regexp_replace(t2, '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<phone>', 'g')
               AS text_redacted,
           CAST(c1 + c2 + len(regexp_extract_all(t2,
               '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_redactions
    FROM __s2
    WHERE doc_id % 7 = 0 OR doc_id % 11 = 0 OR doc_id % 13 = 0
    """,
    description="PII redaction transform: <type>-tag substitution chain, "
    "zero-shuffle scrub pass",
)
def t19_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    aug = docs.select("doc_id", F.expr(_PII_AUG).alias("t"))
    red = text.pii_redact(aug, "doc_id", "t")
    return red.filter(
        (F.col("doc_id") % 7 == 0)
        | (F.col("doc_id") % 11 == 0)
        | (F.col("doc_id") % 13 == 0)
    )


# ---------------------------------------------------------------------------
# zc14 — dedup leverage report (round-6 addition): the "what does dedup
# BUY us" audit a curation run reads before paying for the rewrite —
# per source, how many documents/tokens are non-canonical near-dup
# copies (cluster members that are not the min-id representative) and
# the token-savings fraction.  Composition of gate-proven stages: LSH
# pairs → connected components → min-id canonical, joined to one
# tokenize pass; all counters integer-exact, savings one IEEE division.
# Oracle: the recursive component closure (z53's construction) as a
# derived table.
# ---------------------------------------------------------------------------
@register(
    "zg32_dedup_leverage",
    oracle=f"""
    WITH __tk AS (
        SELECT doc_id, source, CAST(len({_TOK}) AS BIGINT) AS n
        FROM documents
    ),
    __dups AS (
        SELECT doc_id FROM ({_CLUSTER_ORACLE}) c WHERE doc_id <> cluster_id
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS total_docs,
           CAST(SUM(t.n) AS BIGINT) AS total_tokens,
           CAST(COUNT(d.doc_id) AS BIGINT) AS dup_docs,
           CAST(COALESCE(SUM(CASE WHEN d.doc_id IS NOT NULL THEN t.n END), 0)
                AS BIGINT) AS dup_tokens,
           CAST(COALESCE(SUM(CASE WHEN d.doc_id IS NOT NULL THEN t.n END), 0)
                AS DOUBLE) / SUM(t.n) AS savings_frac
    FROM __tk t LEFT JOIN __dups d ON t.doc_id = d.doc_id
    GROUP BY t.source
    """,
    description="dedup leverage: per-source non-canonical docs/tokens "
    "and the token-savings fraction dedup would buy",
)
def zg32_dedup_leverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_join(
        docs, "doc_id", "text", threshold=JACCARD_T, n=SHINGLE_N
    )
    comp = graph.connected_components(pairs.select("id_a", "id_b"))
    dups = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("__dup")
    )
    from spark_sql_hbase_spark.functions.texthash import tokens as _tokens

    tk = docs.select(
        "doc_id", "source", F.size(_tokens(F.col("text"))).cast("long").alias("n")
    )
    j = tk.join(F.broadcast(dups), "doc_id", "left")
    dup_tokens = F.coalesce(
        F.sum(F.when(F.col("__dup").isNotNull(), F.col("n"))), F.lit(0)
    )
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum("n").alias("total_tokens"),
        F.count("__dup").alias("dup_docs"),
        dup_tokens.alias("dup_tokens"),
        (dup_tokens.cast("double") / F.sum("n")).alias("savings_frac"),
    )


# ---------------------------------------------------------------------------
# zc18 — language-ID confusion matrix (round-6 addition): the
# classifier-evaluation primitive — the zb15 stopword-vote predictor
# against the corpus's labeled ``lang`` column, as the (truth,
# predicted) count matrix plus per-truth-class recall.  One scoring
# scan + one bounded (|langs|² ≤ 16-row) aggregate; recall is one IEEE
# division of exact counts.  Oracle: the shared lang-ID CTE joined
# back to the labels.
# ---------------------------------------------------------------------------
@register(
    "zg93_langid_confusion",
    oracle=f"""
    WITH __pred AS ({_langid_oracle()}),
    __j AS (
        SELECT d.lang AS true_lang, p.pred_lang
        FROM documents d JOIN __pred p ON d.doc_id = p.doc_id
    ),
    __cls AS (
        SELECT true_lang, CAST(COUNT(*) AS BIGINT) AS class_total
        FROM __j GROUP BY true_lang
    )
    SELECT j.true_lang, j.pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS DOUBLE) / c.class_total AS frac_of_true
    FROM __j j JOIN __cls c ON j.true_lang = c.true_lang
    GROUP BY j.true_lang, j.pred_lang, c.class_total
    """,
    description="lang-ID confusion matrix: stopword-vote predictions vs "
    "labels, bounded matrix + per-class recall fractions",
)
def zg93_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    pred = text.lang_id(docs, "doc_id", "text").select("doc_id", "pred_lang")
    j = docs.select("doc_id", F.col("lang").alias("true_lang")).join(
        pred, "doc_id"
    )
    counts = j.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    cls = F.sum("n").over(W.partitionBy("true_lang"))
    return counts.select(
        "true_lang",
        "pred_lang",
        "n",
        (F.col("n").cast("double") / cls).alias("frac_of_true"),
    )


# ---------------------------------------------------------------------------
# zc20 — sliding context windows (round-6 addition): overlapping
# fixed-size token chunks (size 32, stride 16) — the RAG/pretraining
# context-window prep the non-overlapping UDTF chunker (zb07/zc09)
# does not cover, expressed ENTIRELY in JVM expressions: one tokenize
# behind a Generate barrier, a posexplode over the per-doc window
# count, and a slice per window — zero Python in the hot path (the
# production form; the UDTF twins exist to exercise the UDTF surface).
# Windows start every `stride` tokens; the last window may be short
# but never empty; a doc shorter than one stride still yields its
# single window.
# ---------------------------------------------------------------------------
_ZC20_SIZE, _ZC20_STRIDE = 32, 16


@register(
    "zg15_sliding_chunks",
    oracle=f"""
    WITH __tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
    __n AS (
        SELECT doc_id, t,
               CAST(CASE WHEN len(t) <= {_ZC20_SIZE} THEN 1
                    ELSE CEIL((len(t) - {_ZC20_SIZE}) / {_ZC20_STRIDE}.0) + 1
                    END AS INTEGER) AS n_win
        FROM __tok WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST(unnest(range(0, n_win)) AS INTEGER) AS win_id,
           list_aggregate(
               t[unnest(range(0, n_win)) * {_ZC20_STRIDE} + 1 :
                 least(unnest(range(0, n_win)) * {_ZC20_STRIDE}
                       + {_ZC20_SIZE}, len(t))],
               'string_agg', ' ') AS chunk,
           CAST(least(unnest(range(0, n_win)) * {_ZC20_STRIDE}
                      + {_ZC20_SIZE}, len(t))
                - unnest(range(0, n_win)) * {_ZC20_STRIDE} AS INTEGER)
               AS n_tokens
    FROM __n
    """,
    description="overlapping sliding context windows (size 32 stride "
    "16), all-JVM posexplode+slice — zero Python",
)
def zg15_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.functions.texthash import tokens as _tokens

    docs = table(spark, sf_dir, "documents")
    bound = docs.select(
        "doc_id", F.explode(F.array(_tokens(F.col("text")))).alias("t")
    ).filter(F.size("t") > 0)
    n_win = F.when(F.size("t") <= _ZC20_SIZE, F.lit(1)).otherwise(
        F.ceil((F.size("t") - _ZC20_SIZE) / float(_ZC20_STRIDE)).cast("int") + 1
    )
    wins = bound.select(
        "doc_id",
        "t",
        F.posexplode(F.sequence(F.lit(0), n_win - 1)).alias("win_id", "_w"),
    )
    start = F.col("win_id") * _ZC20_STRIDE
    length = F.least(
        start + _ZC20_SIZE, F.size("t")
    ) - start
    return wins.select(
        "doc_id",
        F.col("win_id").cast("int"),
        F.array_join(F.slice("t", start + 1, length), " ").alias("chunk"),
        length.cast("int").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# zg35 — scalar-quantized (SQ8) ANN: the memory-bandwidth quantizer tier
# next to PQ (zd47) / IVFADC (zd46) — 1 byte/dim persisted codes from
# per-dimension min/max bounds, decode-and-score top-k (bucket-midpoint
# reconstruction; see sq8_ann_topk's recall note on why a raw code dot
# is rank-broken).  operators/similarity.py::sq8_ann_topk.
# ---------------------------------------------------------------------------
_SQ8_K = 10
_SQ8_DIM = 64

@register(
    "zh05_sq8_ann",
    oracle=None,  # bound below (generator needs the similarity import)
    description="SQ8 scalar-quantized ANN: per-dim min/max bounds (one "
    "broadcast row), 1-byte persisted codes, decode-and-score top-k "
    "(FAISS ScalarQuantizer design), 4x scan-bandwidth reduction",
)
def zh05_sq8_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.sq8_ann_topk(
        emb, emb.filter(F.col("vec_id") < 5), "vec_id", "embedding",
        k=_SQ8_K, dim=_SQ8_DIM,
    )


# ---------------------------------------------------------------------------
# s14 — embedding distribution QA: centroid-distance z-score outlier
# flags — the standard screen for corrupted / out-of-domain vectors
# before they poison an index or a contrastive batch.
# operators/similarity.py::embedding_outliers.
# ---------------------------------------------------------------------------
@register(
    "s14_embedding_outliers",
    oracle=None,  # bound below
    description="embedding outlier QA: distance-from-mean z-score, "
    "rounded-flag determinism; two dim-bounded aggregates, no vector "
    "shuffle",
)
def s14_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.embedding_outliers(emb, "vec_id", "embedding", dim=64)


# ---------------------------------------------------------------------------
# zg37 — TF-IDF cosine near-dup pairs: the lexical-vector tier between
# shingle Jaccard (zf01 surface overlap) and embedding cosine (z52
# semantic) — pairs sharing RARE vocabulary score high, boilerplate
# doesn't.  The max_df cap is the posting-list scale lever (stopword
# terms would make the self-join quadratic).
# operators/ranking.py::tfidf_cosine_pairs.
# ---------------------------------------------------------------------------
_TFIDF_T = 0.3
_TFIDF_MAXDF = 100

@register(
    "d20_tfidf_cosine",
    oracle=None,  # bound below
    description="TF-IDF cosine pairs via inverted-index self-join, "
    "smoothed idf + L2 norm, df-capped posting lists",
)
def d20_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.ranking import tfidf_cosine_pairs

    docs = table(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(
        docs, "doc_id", "text", threshold=_TFIDF_T, max_df=_TFIDF_MAXDF
    )


# ---------------------------------------------------------------------------
# zg38 — iterated Lloyd k-means (3 full updates): the gate for the
# multi-iteration trainer behind every IVF coarse quantizer (zd46/zg16
# consume its centroids; zb12 gates ONE step — this gates the loop,
# collected-state reseeding included).  operators/similarity.py::kmeans,
# oracle from ::kmeans_sql (chained Lloyd CTE blocks, identical
# round-before-argmin contract).
# ---------------------------------------------------------------------------
_KML_K = 8
_KML_ITER = 3

@register(
    "s15_kmeans_lloyd",
    oracle=None,  # bound below
    description="3-iteration Lloyd k-means: broadcast-assign + K·dim "
    "aggregate per step, driver carries model state only",
)
def s15_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.kmeans(emb, k=_KML_K, n_iter=_KML_ITER)


def _bind_round11_oracles() -> None:
    """The four round-11 oracle strings come from the operators' own SQL
    generators (single source of truth for the determinism contract);
    bind them after registration to keep the decorator blocks literal."""
    from spark_sql_hbase_spark.operators.ranking import tfidf_cosine_sql
    from spark_sql_hbase_spark.queries import REGISTRY

    REGISTRY["zh05_sq8_ann"].oracle = similarity.sq8_ann_sql(
        "embeddings", "vec_id", "embedding", "vec_id < 5", k=_SQ8_K, dim=_SQ8_DIM
    )
    REGISTRY["s14_embedding_outliers"].oracle = similarity.embedding_outliers_sql(
        "embeddings", "vec_id", "embedding", dim=_SQ8_DIM
    )
    REGISTRY["d20_tfidf_cosine"].oracle = tfidf_cosine_sql(
        "documents", "doc_id", _TOK, threshold=_TFIDF_T, max_df=_TFIDF_MAXDF
    )
    REGISTRY["s15_kmeans_lloyd"].oracle = similarity.kmeans_sql(
        "embeddings", "vec_id", "embedding", k=_KML_K, n_iter=_KML_ITER, dim=_SQ8_DIM
    )


_bind_round11_oracles()


# ---------------------------------------------------------------------------
# zg40 — balanced training-shard planning (operators/packing.py::
# shard_plan): LPT-style round robin over token-ranked docs — the
# "write the curated corpus as N near-equal training files" planner
# (shard skew = training stragglers).  Integer-only → exact oracle.
# ---------------------------------------------------------------------------
_SHARDS_N = 8

@register(
    "p09_shard_plan",
    oracle=None,  # bound below
    description="balanced shard assignment: token-ranked round robin "
    "over the metadata relation only; one metadata sort, n_shards rows "
    "out",
)
def p09_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.packing import shard_plan

    docs = table(spark, sf_dir, "documents")
    return shard_plan(docs, "doc_id", "text", _SHARDS_N)


def _bind_zg40_oracle() -> None:
    from spark_sql_hbase_spark.operators.packing import shard_plan_sql
    from spark_sql_hbase_spark.queries import REGISTRY

    REGISTRY["p09_shard_plan"].oracle = shard_plan_sql(
        "documents", "doc_id", _TOK, _SHARDS_N
    )


_bind_zg40_oracle()


# ---------------------------------------------------------------------------
# zg41 — recursive CTE surface (Spark 4 WITH RECURSIVE, §2.B inherited
# SQL): duplicate-lineage chains over the verified near-dup pairs.
# Each doc's parent = its smallest-id larger near-dup (out-degree <= 1,
# id-ascending => ACYCLIC with a unique path per doc) — the recursion is
# UNION ALL-safe by construction, which matters because Spark rejects
# UNION-distinct recursion (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so
# the general cyclic-closure form (z53's oracle shape) cannot run
# Spark-side; connected components stay on the iterative operator
# (operators/graph.py), and this gate covers the recursive SQL surface
# on the functional-parent chain instead.
# ---------------------------------------------------------------------------
_CHAIN_RECURSION = """
WITH RECURSIVE __parent AS (
    SELECT id_a AS id, MIN(id_b) AS p FROM {pairs} GROUP BY id_a
), __ids AS (
    SELECT DISTINCT id
    FROM (SELECT id_a AS id FROM {pairs} UNION ALL SELECT id_b FROM {pairs})
), __chain(id, anc, depth) AS (
    SELECT id, id, CAST(0 AS INT) FROM __ids
    UNION ALL
    SELECT c.id, pr.p, c.depth + 1
    FROM __chain c JOIN __parent pr ON pr.id = c.anc
)
SELECT id AS doc_id,
       MAX_BY(anc, depth) AS root_id,
       CAST(MAX(depth) AS INT) AS chain_depth
FROM __chain GROUP BY id
"""

_CHAIN_ORACLE = (
    f"""{_SHINGLE_CTES}, __jp AS (
        SELECT id_a, id_b
        FROM __pairs
        JOIN __sizes na ON id_a = na.doc_id
        JOIN __sizes nb ON id_b = nb.doc_id
        WHERE ROUND(inter * 1.0 / (na.n + nb.n - inter), 4) >= {JACCARD_T}
    ), __parent AS (
        SELECT id_a AS id, MIN(id_b) AS p FROM __jp GROUP BY id_a
    ), __ids AS (
        SELECT DISTINCT id
        FROM (SELECT id_a AS id FROM __jp UNION ALL SELECT id_b FROM __jp)
    ), __chain(id, anc, depth) AS (
        SELECT id, id, CAST(0 AS INTEGER) FROM __ids
        UNION ALL
        SELECT c.id, pr.p, c.depth + 1
        FROM __chain c JOIN __parent pr ON pr.id = c.anc
    )
    SELECT id AS doc_id,
           max_by(anc, depth) AS root_id,
           CAST(MAX(depth) AS INTEGER) AS chain_depth
    FROM __chain GROUP BY id
""".replace("WITH __tok", "WITH RECURSIVE __tok", 1)
)


@register(
    "q32_dup_chain_recursion",
    oracle=_CHAIN_ORACLE,
    description="WITH RECURSIVE duplicate-lineage chains: functional "
    "parent (smallest larger near-dup), unique-path recursion, "
    "root + depth per doc",
)
def q32_dup_chain_recursion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_join(
        docs, "doc_id", "text", threshold=JACCARD_T, n=SHINGLE_N
    )
    pairs.select("id_a", "id_b").createOrReplaceTempView("__zg41_pairs")
    return spark.sql(_CHAIN_RECURSION.format(pairs="__zg41_pairs"))


# ---------------------------------------------------------------------------
# zg42 — quality-distribution drift monitor (operators/text.py::
# quality_psi): Population Stability Index of every source against the
# corpus over corpus-decile quality buckets — the per-ingest-round
# "which source changed character" number that gates a mixture-plan
# refresh (zb21) or a quantizer retrain (st17's frozen-bounds note).
# ---------------------------------------------------------------------------
_PSI_BOUNDS = ",\n               ".join(
    f"quantile_disc(quality, {i / 10}) AS b{i}" for i in range(1, 10)
)
_PSI_BUCKET = " + ".join(f"CAST(q.quality > b.b{i} AS INTEGER)" for i in range(1, 10))


@register(
    "t31_quality_psi",
    oracle=f"""
    WITH __q AS (
        SELECT d.source AS stream, q.doc_id, q.quality
        FROM ({_QUALITY_ORACLE}) q JOIN documents d USING (doc_id)
    ), __b AS (
        SELECT {_PSI_BOUNDS}
        FROM __q
    ), __c AS (
        SELECT stream, CAST(1 + {_PSI_BUCKET} AS INTEGER) AS bucket,
               COUNT(*) AS c
        FROM __q q, __b b
        GROUP BY 1, 2
    ), __grid AS (
        SELECT stream, CAST(t.i AS INTEGER) AS bucket
        FROM (SELECT DISTINCT stream FROM __c), range(1, 11) t(i)
    ), __d AS (
        SELECT g.stream, g.bucket, COALESCE(c, 0) AS c
        FROM __grid g LEFT JOIN __c USING (stream, bucket)
    ), __tot AS (
        SELECT stream, SUM(c) AS n_s FROM __d GROUP BY 1
    ), __mar AS (
        SELECT bucket, SUM(c) AS c_all FROM __d GROUP BY 1
    ), __n AS (
        SELECT SUM(c) AS n_all FROM __d
    )
    SELECT stream,
           ROUND(SUM(
               ((c + 0.5) / (n_s + 5.0) - (c_all + 0.5) / (n_all + 5.0))
               * ln(((c + 0.5) / (n_s + 5.0))
                    / ((c_all + 0.5) / (n_all + 5.0)))
           ), 4) AS psi
    FROM __d JOIN __tot USING (stream) JOIN __mar USING (bucket), __n
    GROUP BY stream
    """,
    description="per-source PSI drift vs the corpus over quality "
    "deciles: Laplace-smoothed dense grid, bounded aggregates only",
)
def t31_quality_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.quality_psi(docs, "source", "doc_id", "text")


# ---------------------------------------------------------------------------
# zg43 — Unicode-script profile (operators/text.py::script_profile):
# per-doc Latin/Han/Cyrillic/digit counts, dominant script, mixed-script
# flag — the confusable/spam screen and the char-level cross-check for
# the n-gram language IDer.  The synthetic corpus is all-Latin, so the
# gate injects deterministic Han/Cyrillic markers (the zb20 pii_scan
# convention: same expression in both engines — the profiling plumbing
# is what's under test).
# ---------------------------------------------------------------------------
_SCRIPT_AUG = (
    "text || CASE WHEN doc_id % 5 = 0 THEN ' 中文数据流' ELSE '' END"
    " || CASE WHEN doc_id % 9 = 0 THEN ' Привет мир' ELSE '' END"
)


@register(
    "t32_script_profile",
    oracle=None,  # bound below
    description="Unicode-script char profile: script counts, dominant "
    "script, mixed-script flag — row-local regexp scans, zero shuffle",
)
def t32_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    aug = docs.select("doc_id", F.expr(_SCRIPT_AUG).alias("t"))
    return text.script_profile(aug, "doc_id", "t")


def _bind_zg43_oracle() -> None:
    from spark_sql_hbase_spark.queries import REGISTRY

    REGISTRY["t32_script_profile"].oracle = text.script_profile_sql(
        "documents", "doc_id", _SCRIPT_AUG
    )


_bind_zg43_oracle()


# ---------------------------------------------------------------------------
# zg44 — IVF–SQ composite ANN (operators/similarity.py::ivfsq_ann_topk):
# coarse-cell pruning (zd46's untrained SQL-reproducible model
# convention: centroids = embeddings of vec_id < 4) over SQ8 codes with
# asymmetric decode-and-score — completes the quantizer matrix
# (IVF × {flat zb11, PQ zd46, SQ8 here}).  The trained composition is
# covered by the recall pytest like the other ANN tiers.
# ---------------------------------------------------------------------------
@register(
    "s16_ivfsq_ann",
    oracle=None,  # bound below
    description="IVF-SQ8 ANN: nprobe cell pruning + 1-byte codes + "
    "asymmetric reconstruction scoring (exact query vs decoded corpus)",
)
def s16_ivfsq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.similarity import _to_double, ivfsq_ann_topk

    emb = table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < _IVF_C).select(
        F.col("vec_id").alias("cell"), _to_double(F.col("embedding")).alias("cv")
    )
    return ivfsq_ann_topk(
        emb, emb.filter(F.col("vec_id") < 8), cent, "vec_id", "embedding",
        k=5, nprobe=_IVF_NPROBE, dim=64,
    )


def _bind_zg44_oracle() -> None:
    from spark_sql_hbase_spark.operators.similarity import ivfsq_ann_sql
    from spark_sql_hbase_spark.queries import REGISTRY

    REGISTRY["s16_ivfsq_ann"].oracle = ivfsq_ann_sql(
        "embeddings", "vec_id", "embedding",
        centroid_pred=f"vid < {_IVF_C}", query_pred="vid < 8",
        k=5, nprobe=_IVF_NPROBE, dim=64,
    )


_bind_zg44_oracle()


# ---------------------------------------------------------------------------
# s18 — SIMILARITY JOIN SQL syntax (SURVEY §7.2 P6's optional extension,
# r11 VERDICT stretch item): the statement-level rewrite at the router
# seam (sqlfront.KeyedSqlRouter._similarity_join) dispatching to the ANN
# operator family — here the exact-cosine tier, so the oracle is pure
# SQL.  The syntax also reaches the SQ8 tier (METHOD SQ8 DIM n), pinned
# equivalent to the direct operator call in tests/test_session.py.
# ---------------------------------------------------------------------------
@register(
    "s18_similarity_join_sql",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 6
    ), scored AS (
        SELECT query_id, vec_id AS neighbor_id,
               list_cosine_similarity(qv, embedding::DOUBLE[]) AS cos_raw
        FROM q, embeddings
        WHERE vec_id <> query_id
    )
    SELECT query_id, neighbor_id, ROUND(cos_raw, 4) AS cos,
           CAST(rn AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
        ) AS rn FROM scored
    ) WHERE rn <= 5
    """,
    description="SIMILARITY JOIN SQL syntax: router-level rewrite to the "
    "ANN operators (exact-cosine tier; broadcast queries, shuffle-free "
    "top-k window)",
)
def s18_similarity_join_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from spark_sql_hbase_spark.session import EngineSession

    emb = table(spark, sf_dir, "embeddings")
    emb.createOrReplaceTempView("__s18_emb")
    sess = EngineSession(
        spark=spark, warehouse_dir=tempfile.mkdtemp(prefix="simjoin_wh_")
    )
    return sess.sql(
        "SIMILARITY JOIN __s18_emb "
        "WITH (SELECT * FROM __s18_emb WHERE vec_id < 6) "
        "ON embedding BY vec_id TOP 5"
    )


# ---------------------------------------------------------------------------
# t33 — per-stream vocabulary KL divergence from the corpus unigram
# distribution: the CONTENT-drift monitor next to the quality-score PSI
# (t31/st18) — operators/text.py::vocab_kl.  Top-V + OOV bucketing keeps
# the per-stream shuffle bounded by S·(V+1); ln + ROUND(4) determinism.
# ---------------------------------------------------------------------------
@register(
    "t33_vocab_kl_drift",
    oracle=None,  # bound below (generator needs the operator import)
    description="per-source unigram-KL content drift vs the corpus "
    "(top-V + OOV buckets, Laplace-smoothed): bounded bucket shuffle, "
    "broadcast vocabulary",
)
def t33_vocab_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.text import vocab_kl

    docs = table(spark, sf_dir, "documents")
    return vocab_kl(docs, "source", "text", top_v=100)


def _bind_t33_oracle() -> None:
    from spark_sql_hbase_spark.operators.text import vocab_kl_sql
    from spark_sql_hbase_spark.queries import REGISTRY

    REGISTRY["t33_vocab_kl_drift"].oracle = vocab_kl_sql(
        "documents", "source", "text", top_v=100
    )


_bind_t33_oracle()


# ---------------------------------------------------------------------------
# p10 — deterministic per-epoch training order ("shuffled shards"):
# operators/packing.py::epoch_shuffle_plan.  Row-local md5 order key and
# shard mod (cross-engine word_hash convention), pos windowed PER SHARD
# — n_shards parallel sorts, no global rank.
# ---------------------------------------------------------------------------
@register(
    "p10_epoch_shuffle_plan",
    oracle=None,  # bound below
    description="seed-reproducible epoch shuffle: hash-bucketed shards, "
    "within-shard hash order — per-shard windows, never a global rank",
)
def p10_epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.packing import epoch_shuffle_plan

    docs = table(spark, sf_dir, "documents")
    return epoch_shuffle_plan(docs, "doc_id", n_shards=8, epoch=2)


def _bind_p10_oracle() -> None:
    from spark_sql_hbase_spark.operators.packing import epoch_shuffle_sql
    from spark_sql_hbase_spark.queries import REGISTRY

    REGISTRY["p10_epoch_shuffle_plan"].oracle = epoch_shuffle_sql(
        "documents", "doc_id", n_shards=8, epoch=2
    )


_bind_p10_oracle()


# ---------------------------------------------------------------------------
# s17 — SQ8 with exact re-ranking (operators/similarity.py::
# sq8_rerank_topk): the refine step completing the rerank symmetry
# across the quantizer matrix (IVFADC has zg16; SQ8 now too) — 1-byte
# scan for candidates, Q·rerank exact vector reads for the final cut.
# ---------------------------------------------------------------------------
@register(
    "s17_sq8_rerank",
    oracle=None,  # bound below
    description="SQ8 decode-and-score shortlist refined by exact inner "
    "products (Q*rerank vector reads, corpus never shuffles)",
)
def s17_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.similarity import sq8_rerank_topk

    emb = table(spark, sf_dir, "embeddings")
    return sq8_rerank_topk(
        emb, emb.filter(F.col("vec_id") < 5), "vec_id", "embedding",
        k=_SQ8_K, rerank=15, dim=_SQ8_DIM,
    )


def _bind_s17_oracle() -> None:
    from spark_sql_hbase_spark.operators.similarity import sq8_rerank_sql
    from spark_sql_hbase_spark.queries import REGISTRY

    REGISTRY["s17_sq8_rerank"].oracle = sq8_rerank_sql(
        "embeddings", "vec_id", "embedding", "vec_id < 5",
        k=_SQ8_K, rerank=15, dim=_SQ8_DIM,
    )


_bind_s17_oracle()


# ---------------------------------------------------------------------------
# s19 — SIMILARITY JOIN METHOD IVF MODEL (r12 VERDICT item 4): the
# router resolves a REGISTERED centroid relation (cell, cv) through the
# same _resolve seam as the corpus and rewrites to assign_cells +
# multiprobe_ann_topk — no model DDL invented.  The model here is the
# SAME literal-centroid quantizer zb11 uses (embeddings vec_id < 4), so
# the gate hashes against zb11's exact oracle: the SQL surface must add
# no semantics of its own.  Malformed forms (IVF without MODEL, MODEL
# on BRUTE/SQ8, a model lacking (cell, cv)) refuse with the grammar —
# pinned in tests/test_session.py.
# ---------------------------------------------------------------------------
@register(
    "s19_similarity_join_ivf",
    oracle=_S04_ORACLE,
    description="SIMILARITY JOIN METHOD IVF MODEL <table> PROBES 2: "
    "model-backed cell-pruned ANN through the SQL router (same oracle "
    "as the zb11 operator gate)",
)
def s19_similarity_join_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from spark_sql_hbase_spark.operators.similarity import _to_double
    from spark_sql_hbase_spark.session import EngineSession

    emb = table(spark, sf_dir, "embeddings")
    emb.createOrReplaceTempView("__zg99_emb")
    emb.filter(F.col("vec_id") < _S04_K).select(
        F.col("vec_id").alias("cell"),
        _to_double(F.col("embedding")).alias("cv"),
    ).createOrReplaceTempView("__zg99_model")
    sess = EngineSession(
        spark=spark, warehouse_dir=tempfile.mkdtemp(prefix="simjoin_ivf_wh_")
    )
    return sess.sql(
        "SIMILARITY JOIN __zg99_emb "
        "WITH (SELECT * FROM __zg99_emb WHERE vec_id < 8) "
        "ON embedding BY vec_id TOP 5 "
        f"METHOD IVF MODEL __zg99_model PROBES {_S04_NPROBE}"
    )


# ---------------------------------------------------------------------------
# t34 — hybrid retrieval via reciprocal rank fusion (operators/
# ranking.py::rrf_fuse, Cormack–Clarke–Buettcher RRF): the BM25 lexical
# top-20 for the fixed query-term set fused with the exact-cosine
# semantic top-20 for a query embedding (documents.doc_id ≡
# embeddings.vec_id in the testdata) — the standard hybrid-search
# combiner, rank-only so lexical and vector scores never need
# normalizing.  Fusion consumes retriever OUTPUT only (k rows per list):
# one bounded UNION + aggregate + per-query window — no corpus re-scan,
# no join.
# ---------------------------------------------------------------------------
_RRF_K = 60
_RRF_TOPK = 10
_RRF_CANDS = 20


@register(
    "t34_hybrid_rrf",
    oracle=None,  # bound below (generator needs the operator imports)
    description="hybrid BM25+cosine retrieval fused by reciprocal rank "
    "fusion (rank-only combiner, bounded union+aggregate, no corpus "
    "re-scan)",
)
def t34_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from spark_sql_hbase_spark.operators.ranking import bm25_scores, rrf_fuse

    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    lex_top = (
        bm25_scores(docs, "doc_id", "text", _BM25_TERMS)
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(_RRF_CANDS)
        .select(
            F.lit(0).alias("query_id"), F.col("id").alias("doc_id"), "score"
        )
    )
    wl = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    lex = lex_top.select(
        "query_id", "doc_id", F.row_number().over(wl).alias("rank")
    )
    sem = similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") == 0), "vec_id", "embedding",
        k=_RRF_CANDS,
    ).select(
        F.col("query_id").cast("int").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    return rrf_fuse([lex, sem], k=_RRF_K, topk=_RRF_TOPK)


def _bind_zh02_oracle() -> None:
    from spark_sql_hbase_spark.operators.ranking import bm25_sql, rrf_fuse_sql
    from spark_sql_hbase_spark.queries import REGISTRY

    lex = f"""
    SELECT 0 AS query_id, id AS doc_id,
           CAST(row_number() OVER (ORDER BY score DESC, id) AS INTEGER)
               AS rank
    FROM (SELECT id, score FROM ({bm25_sql("documents", "doc_id", _TOK, _BM25_TERMS)})
          ORDER BY score DESC, id LIMIT {_RRF_CANDS})
    """
    sem = f"""
    SELECT 0 AS query_id, neighbor_id AS doc_id, rank FROM (
        SELECT e.vec_id AS neighbor_id,
               CAST(row_number() OVER (
                   ORDER BY list_cosine_similarity(q.qv, e.ev) DESC,
                            e.vec_id
               ) AS INTEGER) AS rank
        FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings) e,
             (SELECT embedding::DOUBLE[] AS qv FROM embeddings
              WHERE vec_id = 0) q
        WHERE e.vec_id <> 0
    ) WHERE rank <= {_RRF_CANDS}
    """
    REGISTRY["t34_hybrid_rrf"].oracle = rrf_fuse_sql(
        [lex, sem], k=_RRF_K, topk=_RRF_TOPK
    )


_bind_zh02_oracle()


# ---------------------------------------------------------------------------
# t35 — within-document repetition signals (operators/text.py::
# doc_repetition; the Gopher/MassiveText repetition quality rules):
# duplicate-line fraction, duplicate-line CHARACTER fraction, and the
# top-bigram character-mass fraction, all inside one document — the
# complement of the cross-corpus twins (zg27 line dedup counts lines
# ACROSS docs).  Pure integer-ratio IEEE divisions, per-document keyed
# aggregates only, nothing corpus-global.
# ---------------------------------------------------------------------------
@register(
    "t35_doc_repetition",
    oracle=None,  # bound below (generator import)
    description="Gopher-style within-doc repetition: duplicate-line "
    "fraction + char mass, top-bigram char mass (per-doc keyed "
    "aggregates, no corpus-global state)",
)
def t35_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.doc_repetition(docs, "doc_id", "text", min_line_tokens=_LINE_MT)


def _bind_zh04_oracle() -> None:
    from spark_sql_hbase_spark.operators.text import doc_repetition_sql
    from spark_sql_hbase_spark.queries import REGISTRY

    REGISTRY["t35_doc_repetition"].oracle = doc_repetition_sql(
        "documents", "doc_id", "text", _TOK, min_line_tokens=_LINE_MT
    )


_bind_zh04_oracle()


# ---------------------------------------------------------------------------
# zh11 — SIMILARITY JOIN METHOD PQ MODEL (r13 VERDICT item 3): the router
# resolves a REGISTERED codebook relation (s, code, cv) — the shape
# persist_ivfpq_model writes — through the same _resolve seam as the
# corpus and rewrites to pq_encode + pq_ann_topk, completing the SQL
# surface over the quantizer matrix (BRUTE/SQ8/IVF shipped in r11-r13).
# The model here is the SAME SQL-reproducible untrained codebook zd47
# uses (subvectors of vec_id < 8), so the gate hashes against zd47's
# exact oracle: the SQL surface must add no semantics of its own.
# Malformed forms (PQ without MODEL, PROBES on PQ, a model lacking
# (s, code, cv)) refuse with the grammar — pinned in tests/
# test_session.py.
# ---------------------------------------------------------------------------
@register(
    "zh11_similarity_join_pq",
    oracle=_PQ_GATE_ORACLE,
    description="SIMILARITY JOIN METHOD PQ MODEL <books>: codebook-"
    "backed asymmetric-distance ANN through the SQL router (same "
    "oracle as the zd47 operator gate)",
)
def zh11_similarity_join_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from spark_sql_hbase_spark.operators.similarity import (
        _codebook_relation,
        _to_double,
    )
    from spark_sql_hbase_spark.session import EngineSession

    emb = table(spark, sf_dir, "embeddings")
    emb.createOrReplaceTempView("__zh11_emb")
    seeds = (
        emb.filter(F.col("vec_id") < _PQ_KSUB)
        .select("vec_id", _to_double(F.col("embedding")).alias("ev"))
        .collect()
    )
    books = [
        [
            (int(r["vec_id"]), list(r["ev"])[s * _PQ_SUB : (s + 1) * _PQ_SUB])
            for r in sorted(seeds, key=lambda r: r["vec_id"])
        ]
        for s in range(_PQ_M)
    ]
    _codebook_relation(spark, books).createOrReplaceTempView("__zh11_books")
    sess = EngineSession(
        spark=spark, warehouse_dir=tempfile.mkdtemp(prefix="simjoin_pq_wh_")
    )
    return sess.sql(
        "SIMILARITY JOIN __zh11_emb "
        "WITH (SELECT * FROM __zh11_emb WHERE vec_id < 8) "
        "ON embedding BY vec_id TOP 5 METHOD PQ MODEL __zh11_books"
    )


# ---------------------------------------------------------------------------
# zh12 — the REST of the Gopher/MassiveText repetition rule set (r13
# VERDICT item 6; operators/text.py::doc_repetition_gopher): duplicate-
# PARAGRAPH fraction + character mass (newline-run unit law — the same
# normalization as t35's line law, only the boundary differs) and the
# top 3-gram / 4-gram character-mass fractions (ONE generalized n-gram
# law, ranking.doc_ngram_tf — the bigram column of t35 is its n=2
# specialization).  The corpus carries no newlines, so the gate
# synthesizes paragraph structure deterministically — a newline after
# every second word, the same regexp_replace law in both engines —
# which leaves the token sequence (and so the gram branches) untouched
# (tokens split on [^a-z0-9]+ either way).  Per-document keyed
# aggregates only, nothing corpus-global (plan-pinned).
# ---------------------------------------------------------------------------
@register(
    "zh12_doc_repetition_gopher",
    oracle=None,  # bound below (generator import)
    description="Gopher repetition completion: duplicate-paragraph "
    "fraction + char mass, top 3/4-gram char mass (per-doc keyed "
    "aggregates, shared unit/gram laws)",
)
def zh12_doc_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    d2 = docs.select(
        "doc_id",
        F.regexp_replace("text", r"(\S+ \S+) ", "$1\n").alias("text2"),
    )
    return text.doc_repetition_gopher(
        d2, "doc_id", "text2", min_para_tokens=1, ns=(3, 4)
    )


def _bind_zh12_oracle() -> None:
    from spark_sql_hbase_spark.functions.texthash import tokens_sql
    from spark_sql_hbase_spark.operators.text import doc_repetition_gopher_sql
    from spark_sql_hbase_spark.queries import REGISTRY

    inner = doc_repetition_gopher_sql(
        "__g_src", "doc_id", "text2", tokens_sql("text2"), 1, (3, 4)
    )
    src = (
        "WITH __g_src AS (SELECT doc_id, "
        "regexp_replace(text, '(\\S+ \\S+) ', '\\1' || chr(10), 'g') "
        "AS text2 FROM documents), __pn"
    )
    REGISTRY["zh12_doc_repetition_gopher"].oracle = inner.replace(
        "WITH __pn", src, 1
    )


_bind_zh12_oracle()


# ---------------------------------------------------------------------------
# zh14/zh15 — SIMILARITY JOIN METHOD IVFADC MODEL <cent> BOOKS <books>
# [PROBES n] [RESIDUAL] (r14: completes the quantizer matrix through the
# SQL router — BRUTE/SQ8/IVF/PQ shipped r11-r14, IVFADC was the last
# DataFrame-only tier).  Both relations resolve through the same
# _resolve seam; the router rewrites to assign_cells|residualize +
# pq_encode + ivfadc_ann_topk and adds no semantics of its own: zh14
# hashes against zd46's exact oracle (raw-vector codes), zh15 — the
# RESIDUAL flag, IVFADC proper — against zf15's.  Model conventions are
# the SQL-reproducible untrained ones those gates pin (coarse = vec_id
# < 4, books = subvectors of vec_id < 8, residual books from the cell
# residuals).  Malformed forms refuse with the grammar (IVFADC without
# MODEL/BOOKS, BOOKS/RESIDUAL on other methods, non-dense books) —
# pinned in tests/test_session.py.
# ---------------------------------------------------------------------------
def _ivfadc_sql_gate(spark: SparkSession, sf_dir: str, residual: bool):
    import tempfile

    from spark_sql_hbase_spark.operators.similarity import (
        _centroid_relation,
        _codebook_relation,
        _to_double,
        residualize,
    )
    from spark_sql_hbase_spark.session import EngineSession

    emb = table(spark, sf_dir, "embeddings")
    emb.createOrReplaceTempView("__zh14_emb")
    cseeds = sorted(
        emb.filter(F.col("vec_id") < _IVF_C)
        .select("vec_id", _to_double(F.col("embedding")).alias("ev"))
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cents = [(int(r["vec_id"]), list(r["ev"])) for r in cseeds]
    _centroid_relation(spark, cents).createOrReplaceTempView("__zh14_cents")
    seed_src = (
        residualize(emb, cents, "vec_id", "embedding") if residual else emb
    )
    seeds = sorted(
        seed_src.filter(F.col("vec_id") < _PQ_KSUB)
        .select("vec_id", _to_double(F.col("embedding")).alias("ev"))
        .collect(),
        key=lambda r: r["vec_id"],
    )
    books = [
        [
            (int(r["vec_id"]), list(r["ev"])[s * _PQ_SUB : (s + 1) * _PQ_SUB])
            for r in seeds
        ]
        for s in range(_PQ_M)
    ]
    _codebook_relation(spark, books).createOrReplaceTempView("__zh14_books")
    sess = EngineSession(
        spark=spark, warehouse_dir=tempfile.mkdtemp(prefix="simjoin_adc_wh_")
    )
    return sess.sql(
        "SIMILARITY JOIN __zh14_emb "
        "WITH (SELECT * FROM __zh14_emb WHERE vec_id < 8) "
        "ON embedding BY vec_id TOP 5 METHOD IVFADC "
        f"MODEL __zh14_cents BOOKS __zh14_books PROBES {_IVF_NPROBE}"
        + (" RESIDUAL" if residual else "")
    )


@register(
    "zh14_similarity_join_ivfadc",
    oracle=_IVFADC_GATE_ORACLE,
    description="SIMILARITY JOIN METHOD IVFADC MODEL <cents> BOOKS "
    "<books> PROBES 2: cell-pruned ADC through the SQL router (same "
    "oracle as the zd46 operator gate)",
)
def zh14_similarity_join_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivfadc_sql_gate(spark, sf_dir, residual=False)


@register(
    "zh15_similarity_join_ivfadc_residual",
    oracle=_IVFADC_RESID_ORACLE,
    description="SIMILARITY JOIN METHOD IVFADC ... RESIDUAL: residual-"
    "quantized ADC through the SQL router (same oracle as the zf15 "
    "operator gate)",
)
def zh15_similarity_join_ivfadc_residual(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _ivfadc_sql_gate(spark, sf_dir, residual=True)


# ---------------------------------------------------------------------------
# zh16 — C4 heuristic line cleaning (operators/text.py::c4_line_clean;
# Raffel et al. 2020 §2.2): keep lines ending in terminal punctuation
# with >= 3 words and no javascript / lorem ipsum / curly brace; keep
# documents retaining >= 3 lines.  The per-document line-rule
# complement of the corpus-level t23 boilerplate shingle heuristic —
# entirely row-local codegen expressions, no shuffle (plan-pinned).
# ---------------------------------------------------------------------------
# The synthetic corpus is single-line and punctuation-free, so the gate
# first shapes it deterministically — ' agg ' becomes '.\n' (a
# terminal-punctuated line break) and ' line ' a bare line break — with
# the SAME literal replace() in both engines (left-to-right
# non-overlapping in each).  At sf0.001 this yields 1-13 lines/doc,
# 0-7 kept, 111/500 docs kept: every line rule exercises both ways.
_C4_SHAPED = (
    "(SELECT doc_id, replace(replace(text, ' agg ', '.' || chr(10)), "
    "' line ', chr(10)) AS text FROM documents) __src"
)


@register(
    "zh16_c4_line_clean",
    oracle=text.c4_line_clean_sql(_C4_SHAPED, "doc_id", "text"),
    description="C4 line-rule cleaning: terminal-punct + min-words + "
    "blocklist line filter, min-kept-lines doc filter (row-local "
    "expressions only, no shuffle)",
)
def zh16_c4_line_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "replace(replace(text, ' agg ', '.\n'), ' line ', '\n')"
        ).alias("text"),
    )
    return text.c4_line_clean(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# zh17 — NEAR DUPLICATES through the SQL router (sqlfront.py::
# _near_duplicates): the dedup family's SQL surface at the SIMILARITY
# JOIN seam — the statement rewrites to dedup.minhash_lsh_join and the
# gate hashes against the SAME oracle as the zf01 operator gate, so
# the router provably adds no semantics.
# ---------------------------------------------------------------------------
@register(
    "zh17_near_duplicates_sql",
    oracle=_JACCARD_ORACLE,
    description="NEAR DUPLICATES IN <t> ON text BY doc_id THRESHOLD t "
    "SHINGLE n through the SQL router (same oracle as the zf01 "
    "operator gate)",
)
def zh17_near_duplicates_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from spark_sql_hbase_spark.session import EngineSession

    table(spark, sf_dir, "documents").createOrReplaceTempView("__zh17_docs")
    sess = EngineSession(
        spark=spark, warehouse_dir=tempfile.mkdtemp(prefix="neardup_wh_")
    )
    return sess.sql(
        f"NEAR DUPLICATES IN __zh17_docs ON text BY doc_id "
        f"THRESHOLD {JACCARD_T} SHINGLE {SHINGLE_N}"
    )
