"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature plumbing.

The container has no image/audio libraries, so the decode kernels are
STUBS — a deterministic fake (seeded by content hash) behind
``fake=True`` and ``NotImplementedError`` otherwise. Everything
Spark-side is real and tested: schema, partitioning, ``mapInPandas``
batch shape, and the Arrow round trip. Swapping the kernel body for
PIL/ffmpeg turns this into the production path without touching the
plan.

Scale notes: media bytes dominate row size, so the decode stage
(a) projects ONLY (id, content, metadata) before the UDF — column
pruning keeps the Arrow transfer minimal; (b) runs ``mapInPandas`` so
one Python worker handles a whole Arrow batch (the no-per-row-Python
rule); (c) repartitions by id hash first so media of any one document
doesn't skew a worker.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
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
        StructField("content", BinaryType(), False),
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def synth_media(spark: SparkSession, n: int = 256) -> DataFrame:
    """Deterministic fake media table: binary payload = md5-chained bytes
    (JVM-side: unhex over concatenated md5 hex) with typed metadata."""
    base = spark.range(0, n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    payload = F.unhex(
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda i: F.md5(F.concat(F.col("id").cast("string"), F.lit(":"), i.cast("string"))),
            ),
        )
    )
    return base.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("content"),
        F.when(kind == "image", F.lit("image/png"))
        .when(kind == "audio", F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("mime"),
        F.when(kind == "image", ((F.col("id") % 8 + 1) * 64).cast("int")).alias("width"),
        F.when(kind == "image", ((F.col("id") % 4 + 1) * 64).cast("int")).alias("height"),
        F.when(kind != "image", ((F.col("id") % 30 + 1) * 1000).cast("int")).alias("duration_ms"),
    )


def _fake_decode(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: hash-seeded features.
    REPLACE with PIL/torchaudio/ffmpeg in production."""
    h = hashlib.md5(content).digest()
    return [h[i % 16] / 255.0 for i in range(dim)]


def extract_features(
    df: DataFrame, dim: int = 8, fake: bool = True, repartition: int | None = None
) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    With ``fake=False`` this raises NotImplementedError from the worker
    — the container has no media libraries (charter: stub the decode,
    keep the plumbing real).
    """
    cols = df.select("media_id", "kind", "content")
    if repartition:
        cols = cols.repartition(repartition, "media_id")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this container"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "feature": pdf["content"].map(lambda b: _fake_decode(b, dim)),
                }
            )

    return cols.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_stub(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Image resize plumbing: metadata transform is real (JVM), pixel
    work is the stubbed kernel above. Returns rows with updated
    dimensions + untouched content (identity stub)."""
    return df.withColumns(
        {
            "width": F.when(F.col("kind") == "image", F.lit(target_w)).otherwise(F.col("width")),
            "height": F.when(F.col("kind") == "image", F.lit(target_h)).otherwise(F.col("height")),
        }
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: computes target frame timestamps as an
    array column (JVM-side); the per-frame decode would run in the same
    mapInPandas kernel shape as extract_features."""
    return df.filter(F.col("kind") == "video").withColumn(
        "frame_ts_ms",
        F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)),
    )
