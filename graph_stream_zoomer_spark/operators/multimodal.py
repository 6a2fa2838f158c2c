"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode/feature-extraction kernels are STUBBED (image/audio libs are not
in this container): ``decode_image``/``decode_audio`` raise
NotImplementedError unless ``fake=True``, in which case a deterministic fake
(derived from the payload bytes) stands in. The Spark-side plumbing —
schema, batch iteration, partition-preserving projection — is real and
tested; swapping in PIL/librosa later only replaces the kernel body.

Scale notes: mapInPandas streams Arrow batches, so a 100 TB binary column
never materializes per-row Python objects; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` sized so one batch of
payloads fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("digest", StringType(), False),
        StructField("feat_mean", DoubleType(), True),
        StructField("feat_dim", IntegerType(), False),
    ]
)


def _decode_kernel(payload: bytes, kind: str, fake: bool):
    """The stubbed decode step. Real implementation would dispatch to
    PIL / soundfile / pyav by ``kind``."""
    if not fake:
        raise NotImplementedError(
            f"decode for kind={kind!r} requires media libs not present in this container"
        )
    # deterministic fake feature: byte histogram mean over a fixed dim
    import hashlib

    dim = 16
    if payload is None:
        return 0.0, dim, hashlib.sha256(b"").hexdigest()
    digest = hashlib.sha256(payload).hexdigest()
    mean = sum(payload[:1024]) / max(1, len(payload[:1024])) / 255.0
    return mean, dim, digest


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """binary payload → feature row via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_kernel(p, k, fake)
                for p, k in zip(pdf["payload"], pdf["kind"], strict=True)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "digest": [f[2] for f in feats],
                    "feat_mean": [f[0] for f in feats],
                    "feat_dim": [f[1] for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used in tests/benchmarks: treat document text bytes as an
    opaque binary payload with 'image' metadata (the libs-free stand-in for
    a real media table)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def media_digests(docs: DataFrame) -> DataFrame:
    """Oracle-checkable slice of the multimodal path: byte length + sha256
    digest per payload, computed through the real mapInPandas plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "digest": pdf["payload"].map(lambda b: hashlib.sha256(b).hexdigest()),
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("n_bytes", LongType(), False),
            StructField("digest", StringType(), False),
        ]
    )
    return documents_as_media(docs).mapInPandas(run, schema)
