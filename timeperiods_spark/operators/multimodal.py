"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas``. The image/audio codec
libraries are NOT installed in this container, so the byte-level codecs
are STUBBED — ``decode_media(..., codec="real")`` raises
NotImplementedError by design — while everything Spark-side (schema,
partitioning, UDF signatures, Arrow batch shapes, deterministic fake
decode for tests) is real and tested.

Scale design: payload bytes never leave the executor; mapInPandas
streams Arrow record batches, so peak memory is one batch of payloads,
and ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds it. Feature
extraction is a map-side projection — zero shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def synthetic_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media rows: payload = repeatable bytes derived
    from media_id (sha256 of its decimal string — a form ANSI SQL can
    reproduce, so the driver oracle checks the features numerically),
    metadata sized by id. Stands in for a parquet/Iceberg table of
    crawled bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = {
                "media_id": ids,
                "kind": [kind] * len(ids),
                "payload": [
                    hashlib.sha256(str(int(i)).encode()).digest()
                    * (8 + int(i) % 8)
                    for i in ids
                ],
                "meta": [
                    {
                        "width": 16 + int(i) % 16,
                        "height": 16 + int(i) % 8,
                        "n_frames": 1 if kind == "image" else 4 + int(i) % 4,
                        "sample_rate": 16000 if kind == "audio" else 0,
                    }
                    for i in ids
                ],
            }
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(
    media: DataFrame, *, dim: int = 16, codec: str = "stub"
) -> DataFrame:
    """Per-media feature vector via mapInPandas.

    ``codec="stub"`` produces a deterministic fake embedding (byte
    histogram of the payload, L2-normalized) — numerically real, so
    downstream similarity/dedup operators can be tested end to end.
    ``codec="real"`` is where PIL/ffmpeg decoding would slot in; it
    raises NotImplementedError in this container (libs not installed).
    """
    if codec not in ("stub", "real"):
        raise ValueError("codec must be 'stub' or 'real'")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "real":
            raise NotImplementedError(
                "real media decoding requires PIL/ffmpeg, not present in "
                "this container; use codec='stub'"
            )
        for pdf in batches:
            feats = []
            nbytes = []
            for payload in pdf["payload"]:
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                nbytes.append(len(buf))
                hist = np.bincount(buf % dim, minlength=dim).astype(np.float64)
                # sequential sum-of-squares (np.sum is sequential below
                # its 128-element pairwise block) so the norm is
                # bit-reproducible by the oracle's left-fold list_sum;
                # np.linalg.norm routes through BLAS dot, which may
                # associate differently
                norm = float(np.sqrt((hist * hist).sum()))
                feats.append((hist / norm if norm else hist).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every: int = 2) -> DataFrame:
    """Deterministic frame sampling for video rows: payload is split
    into meta.n_frames equal chunks; every ``every``-th chunk is
    emitted as its own row (media_id, frame_idx, frame_bytes). Pure
    column ops — no Python — since chunking is byte arithmetic."""
    n_frames = F.col("meta.n_frames")
    frame_len = F.floor(F.length("payload") / n_frames)
    idx = F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every)))
    return media.select(
        "media_id",
        idx.alias("frame_idx"),
        "payload",
        frame_len.alias("__fl"),
    ).select(
        "media_id",
        "frame_idx",
        F.expr("substring(payload, frame_idx * __fl + 1, __fl)").alias("frame_bytes"),
    )
