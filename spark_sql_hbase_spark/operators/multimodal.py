"""Multimodal column processing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the actual decode is STUBBED
(`decode_image` raises ``NotImplementedError`` unless given the
deterministic fake format below) — but everything Spark-side is real and
tested: binary column handling, ``mapInPandas`` batch iteration, schema
contracts, and partition-parallel feature extraction.

Deterministic fake "decode": metadata derived from the content digest
(sha256) and byte length — reproducible cross-engine, so the pipeline is
still oracle-checkable end to end.

Scale notes: binary payloads ride in parquet pages; ``mapInPandas``
streams Arrow batches (bounded memory per batch via
``spark.sql.execution.arrow.maxRecordsPerBatch``); no per-row Python
calls — each UDF invocation handles a whole batch vectorized.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("first_frame_sha", T.StringType()),
    ]
)

FRAME_BYTES = 64  # fake "frame" = 64-byte block


def decode_image(payload: bytes) -> tuple[int, int]:
    """STUB — real deployments plug in PIL/ffmpeg here; the container
    ships no codecs. Deterministic fake: dimensions from the content
    digest (stable across engines and runs)."""
    digest = hashlib.sha256(payload).hexdigest()
    width = int(digest[:2], 16) + 1  # 1..256
    height = int(digest[2:4], 16) + 1
    return width, height


def extract_media_metadata(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """mapInPandas feature extraction over a binary column.

    Emits one metadata row per media object: byte length, content digest,
    fake-decoded dimensions, frame count (64-byte blocks) and digest of
    the first frame — the exact shape a real decode/resize/frame-sample
    stage would produce.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            shas = payloads.map(lambda b: hashlib.sha256(b).hexdigest())
            dims = payloads.map(decode_image)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_sha": shas,
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "n_frames": payloads.map(
                        lambda b: (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
                    ).astype("int32"),
                    "first_frame_sha": payloads.map(
                        lambda b: hashlib.sha256(b[:FRAME_BYTES]).hexdigest()
                    ),
                }
            )

    binary_df = df.select(F.col(id_col).alias(id_col), F.col(binary_col))
    return binary_df.mapInPandas(extract, META_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame, id_col: str, binary_col: str, every: int = 4
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (every ``every``-th
    64-byte block) — the one-to-many ``mapInPandas`` shape of a real video
    frame-sampler (decode stubbed: frame identity = content digest; the
    container ships no codecs).

    Scale: output fan-out happens executor-side per Arrow batch — no
    explode of pre-materialized frame arrays, no shuffle; a downstream
    repartition can spread frames if the per-doc fan-out is skewed.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, every):
                    ids.append(doc_id)
                    idxs.append(i)
                    shas.append(
                        hashlib.sha256(
                            payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_sha": pd.Series(shas, dtype="object"),
                }
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        sample, FRAME_SAMPLE_SCHEMA
    )


FEATURE_DIM = 8

EMBED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def extract_media_features(
    df: DataFrame, id_col: str, binary_col: str, dim: int = FEATURE_DIM
) -> DataFrame:
    """Feature extraction over a binary media column: (doc_id,
    embedding array<double>) — the encode step between decode and the
    ANN/near-dup operators (compose with ``similarity.py``: the output
    plugs straight into ``assign_cells``/``pq_encode``/
    ``embedding_neardup``).

    STUB — real deployments plug a vision/audio encoder into the batch
    loop (the container ships no model runtimes).  Deterministic fake:
    ``dim`` 16-bit integers from the content sha256 scaled to [0, 1]
    doubles — reproducible cross-engine, so the full binary → embedding
    pipeline stays oracle-checkable.  Doubles (not float32) by the
    repo's determinism contract: the oracle recomputes the same IEEE
    ops; a production float32 column would need approximate compare.

    Scale shape: Arrow-batched ``mapInPandas`` — vectorized per batch,
    no shuffle, embarrassingly parallel; the payload column never
    survives past this stage.
    """
    assert dim * 4 <= 64, "sha256 hex provides 16 four-hex-digit features"

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, embs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                digest = hashlib.sha256(payload).hexdigest()
                embs.append(
                    [int(digest[4 * i : 4 * i + 4], 16) / 65535.0 for i in range(dim)]
                )
                ids.append(doc_id)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "embedding": embs}
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        feats, EMBED_SCHEMA
    )


def media_metadata_oracle_sql(doc_table: str = "documents") -> str:
    """DuckDB twin of :func:`extract_media_metadata` over the synthetic
    binary payload (utf-8 bytes of ``text``) — verifies the whole
    pipeline including the fake decode, since both sides derive metadata
    from the same sha256. DuckDB's ``sha256`` takes VARCHAR only, and the
    synthetic corpus is pure ASCII (asserted by the pipeline), so
    char-wise ops on ``text`` equal byte-wise ops on the payload."""
    return f"""
    WITH b AS (SELECT doc_id, text, sha256(text) AS sha FROM {doc_table})
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           sha AS content_sha,
           CAST((('0x' || substr(sha, 1, 2))::BIGINT + 1) AS INTEGER) AS width,
           CAST((('0x' || substr(sha, 3, 2))::BIGINT + 1) AS INTEGER) AS height,
           CAST(CEIL(length(text) / {FRAME_BYTES}.0) AS INTEGER) AS n_frames,
           sha256(substr(text, 1, {FRAME_BYTES})) AS first_frame_sha
    FROM b
    """
