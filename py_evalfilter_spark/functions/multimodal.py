"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct —
the Spark-side schema, partitioning, Arrow batch shape, and UDF signatures
are real and tested; the actual codec work is STUBBED because the sandbox
image ships no image/audio libraries.  Each stub either raises
NotImplementedError (real-decode mode) or produces a deterministic fake
(test mode) so downstream plumbing is exercisable end-to-end.

Design rules for 100 TB media tables:
  * media bytes stay in one ``content`` binary column; metadata is a
    sibling struct so metadata-only queries never read the blobs
    (parquet column pruning drops the binary column from the scan);
  * decode/feature-extract run in ``mapInPandas`` so one Arrow batch
    amortizes codec setup; batch size is bounded by bytes not rows
    (``maxRecordsPerBatch`` stays small for fat rows);
  * outputs are fixed-length float arrays (embeddings) or small structs —
    never decoded frames — so shuffle volume stays bounded.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEAT_DIM = 16


def _fake_image_features(content: bytes, dim: int = IMAGE_FEAT_DIM) -> list[float]:
    """Deterministic stand-in for a decode→CNN-features step: bytes → seeded
    pseudo-embedding.  Replace with a real decoder on a cluster image that
    ships PIL/torchvision."""
    digest = hashlib.sha256(content or b"").digest()
    arr = np.frombuffer(digest[: dim * 2], dtype=np.uint16).astype(np.float64)
    return (arr / 65535.0).round(6).tolist()


def image_features(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """content → fixed-dim feature vector (mapInPandas; Arrow binary batches)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real image decode requires PIL/torchvision — not in this image"
                )
            feats = [_fake_image_features(c) for c in pdf["content"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.select("media_id", "content").mapInPandas(compute, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per planned frame with the
    byte-range/timestamp to decode — pure column math (no codec), so the
    expensive decode can be scheduled/partitioned before any codec runs."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn("sample_at_ms", F.col("frame_idx") * every_ms)
    )


def audio_chunks(df: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Audio chunking plan (decode stubbed the same way)."""
    n_chunks = F.greatest((F.col("meta.duration_ms") / chunk_ms).cast("int"), F.lit(1))
    return (
        df.filter(F.col("kind") == "audio")
        .select("media_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"))
        .withColumn("start_ms", F.col("chunk_idx") * chunk_ms)
    )


def media_digest_dedup(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Exact media dedup on raw bytes: (digest, keep_id, n_copies), one
    group per distinct content digest, survivor = min id (the batch text
    operator's dedup_exact semantics, operators/dedup.py:45, over a binary
    column).

    100 TB shape: the groupBy key is md5(content) computed JVM-side in the
    scan stage, so the ONE shuffle moves 32-char digests — never the blobs
    (grouping by the binary column itself would shuffle the full media
    bytes).  Content-addressable-storage semantics: md5 collisions merge,
    which is the standard CAS trade.  The plan reads only (id, content);
    metadata-only columns are pruned from the parquet scan."""
    return df.groupBy(F.md5(F.col(content_col)).alias("digest")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def media_embedding_neardup(
    feats: DataFrame,
    id_col: str = "media_id",
    features_col: str = "features",
    threshold: float = 0.95,
    **kwargs,
) -> DataFrame:
    """Near-duplicate media via extracted feature vectors (the perceptual
    analogue of digest dedup: re-encodes/resizes survive): cosine >=
    threshold pairs through the multi-table hyperplane blocking of
    operators/dedup.embedding_neardup_pairs — same recall guarantees,
    never all-pairs.  `feats` is the (id, features) table a real pipeline
    persists next to the media blobs (image_features() output here);
    output columns are (doc_id, dup_id, cosine) with doc_id < dup_id."""
    from ..operators import dedup

    return dedup.embedding_neardup_pairs(
        feats, id_col, features_col, threshold=threshold, **kwargs
    )


def curate_media(
    df: DataFrame,
    feature_threshold: float | None = None,
    features: DataFrame | None = None,
    real_decode: bool = False,
    id_col: str = "media_id",
    **neardup_kwargs,
) -> DataFrame:
    """Optional media curation stage (the media twin of plans/curation.py's
    text stages): drop exact byte-duplicates (digest survivors only), then
    — when `feature_threshold` is set — drop perceptual near-dups: for
    every feature-cosine pair above threshold the LOWER id survives.

    `features` overrides the built-in extractor with a precomputed
    (id, features) table — the at-scale mode, where feature extraction is
    its own (GPU) job and this stage only joins its output; None extracts
    via image_features() (fake decoder unless real_decode).  Non-image
    rows pass the near-dup stage untouched (no features → nothing to
    compare).  Both drops are left_semi/left_anti joins on ids, so media
    blobs are never shuffled — ids move, content stays columnar."""
    keep = media_digest_dedup(df, id_col=id_col).select(
        F.col("keep_id").alias(id_col)
    )
    survivors = df.join(keep, id_col, "left_semi")
    if feature_threshold is None:
        return survivors
    if features is None:
        features = image_features(
            survivors.filter(F.col("kind") == "image"), real_decode=real_decode
        ).withColumnRenamed("media_id", id_col)
    pairs = media_embedding_neardup(
        features, id_col=id_col, features_col="features",
        threshold=feature_threshold, **neardup_kwargs,
    )
    drops = pairs.select(F.col("dup_id").alias(id_col)).distinct()
    return survivors.join(drops, id_col, "left_anti")


def make_fake_media(spark, n: int = 20, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        content = bytes(rng.randint(0, 256, size=int(rng.randint(64, 256)), dtype=np.int64).astype(np.uint8))
        rows.append(
            (
                i,
                kind,
                bytearray(content),
                (
                    f"{kind}/fake",
                    int(rng.randint(16, 512)) if kind == "image" else None,
                    int(rng.randint(16, 512)) if kind == "image" else None,
                    int(rng.randint(1000, 20000)) if kind != "image" else None,
                    len(content),
                ),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
