"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Design (BASELINE.json north star — no counterpart in the reference): media
rows are ``(media_id, content: binary, meta: struct)``; cheap metadata ops
(length, hash, magic-byte sniffing) stay JVM-side as built-ins; decode /
feature-extraction / frame-sampling run as Arrow-batched ``mapInPandas``
operators whose *plumbing* (schema, batch iteration, partition preservation)
is real and tested, while the codec itself is stubbed: the container ships
no image/audio libraries, so ``decode_features`` raises
``NotImplementedError`` unless ``deterministic_fake=True``, which substitutes
a seeded byte-histogram "embedding" so the pipeline shape is exercisable
end-to-end.

At 100 TB: binary payloads ride the same parquet scans as everything else;
``spark.sql.files.maxPartitionBytes`` keeps per-task batches bounded, and
mapInPandas streams Arrow batches so a partition never fully materializes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.loader import table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: treat document text bytes as an opaque binary payload so the
    multimodal path has real data to flow through in this container."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# metadata ops — JVM-side built-ins, oracle-checkable


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(spark, sf_dir)
    return media.select(
        "media_id",
        F.octet_length(F.col("content")).alias("byte_len"),
        F.md5(F.col("content")).alias("content_md5"),
        F.col("meta.format").alias("media_format"),
    )


ORACLE_MULTIMODAL_METADATA = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS INT) AS byte_len,
       md5(text) AS content_md5,
       'text/plain' AS media_format
FROM documents
"""


# ---------------------------------------------------------------------------
# decode / feature-extract — Arrow-batched mapInPandas; codec stubbed


def decode_features(
    media: DataFrame, deterministic_fake: bool = False
) -> DataFrame:
    """Per-payload feature extraction.

    Real decode requires codec libraries not present in this container —
    that path raises ``NotImplementedError`` (STUB, by design). With
    ``deterministic_fake=True`` a seeded byte-histogram stands in, keeping
    schema/batching/partitioning identical to the real operator.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not deterministic_fake:
                # STUB: swap in PIL/torchaudio/ffmpeg decode here when the
                # runtime ships codecs.
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this container; pass deterministic_fake=True for the "
                    "pipeline-shape fake"
                )
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content) if content is not None else b""
                hist = [0.0] * FEATURE_DIM
                for b in buf:
                    hist[b % FEATURE_DIM] += 1.0
                total = sum(hist) or 1.0
                out.append(
                    {
                        "media_id": mid,
                        "byte_len": len(buf),
                        "features": [round(h / total, 6) for h in hist],
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "byte_len", "features"])

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic frame/chunk sampling: split each payload into
    ``n_frames`` equal byte ranges and emit one row per chunk — the shape a
    video frame-sampler produces, exercised on opaque bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content) if content is not None else b""
                if not buf:
                    continue
                step = max(len(buf) // n_frames, 1)
                for i in range(min(n_frames, len(buf))):
                    chunk = buf[i * step : (i + 1) * step]
                    rows.append(
                        {"media_id": mid, "frame_no": i, "chunk": chunk}
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "chunk"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("chunk", T.BinaryType(), True),
        ]
    )
    return media.mapInPandas(batches, schema=schema)


QUERIES = {
    "multimodal_metadata": q_multimodal_metadata,
}

ORACLES = {
    "multimodal_metadata": ORACLE_MULTIMODAL_METADATA,
}
