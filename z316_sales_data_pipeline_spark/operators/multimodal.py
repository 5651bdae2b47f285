"""Multimodal column plumbing (north-star ops).

Images/audio/video are opaque ``binary`` columns with typed metadata;
decode / feature-extraction runs as Arrow-batched Pandas functions via
``mapInPandas`` (the sanctioned slow path — real codec libraries are
not in this environment, so the decode kernel is a clearly-marked
deterministic stub, while the Spark-side plumbing — schema, batch
iteration, partitioning — is real and tested).

Scale notes: mapInPandas streams Arrow batches, so peak memory is one
batch per core, not one partition; keep ``spark.sql.execution.arrow.
maxRecordsPerBatch`` sized to the blob size. Feature extraction is a
narrow map — no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("source_uri", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, fake_width int, fake_height int, byte_checksum long"
)


def real_decode(payload: bytes) -> dict:
    """The real decode kernel would live here (PIL / ffmpeg / soundfile).

    Not available in this environment — any caller that needs true
    pixel/sample access must go through :func:`stub_decode` in tests.
    """
    raise NotImplementedError("media codecs not available in this build; use stub_decode")


def stub_decode(payload: bytes) -> dict:
    """Deterministic fake decode: derives pseudo-dimensions and a
    checksum from the byte length so the full Arrow plumbing is
    testable without codec libraries AND oracle-checkable in plain SQL
    (every output is a pure function of octet length)."""
    n = len(payload)
    return {
        "n_bytes": n,
        "fake_width": n % 640,
        "fake_height": (n * 7) % 480,
        "byte_checksum": (n * 131) % 2147483647,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Decode/feature-extract each blob via mapInPandas (Arrow batches).

    The stub features are pure functions of byte length, so the kernel
    is fully vectorized: one ``.str.len()`` over the Arrow batch, then
    column arithmetic (no per-row Python in the loop). A real codec
    would force a per-row call — that shape lives in
    :func:`stub_decode` and is exercised row-wise in tests to pin the
    contract; the batch kernel below must stay value-identical to it
    (asserted in tests/test_multimodal_sinks.py).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # nullable Int64 keeps None payloads as NA through the
            # arithmetic and converts to NULL longs on the Arrow side
            n = pdf["payload"].str.len().astype("Int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n,
                    "fake_width": n % 640,
                    "fake_height": (n * 7) % 480,
                    "byte_checksum": (n * 131) % 2147483647,
                }
            )

    # project to the two columns the kernel reads BEFORE the opaque
    # boundary (guide §4.1): Spark cannot see which columns the Python
    # function touches, so without this every caller column — here the
    # synthesized media_type/source_uri — crosses JVM→Arrow→JVM per row
    return media.select("media_id", "payload").mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a per-blob frame index.

    The real decoder would yield frames; the stub yields the frame
    INDEX plan (deterministic), which is what the distribution layer
    cares about: one output row per sampled frame, partitioned by
    media_id so one video's frames stay together.
    """
    n_frames = (F.length("payload") / F.lit(100)).cast("int")
    return (
        media.withColumn("__n_frames", F.greatest(n_frames, F.lit(1)))
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("__n_frames") - 1, F.lit(every_nth))),
        )
        .select("media_id", "media_type", "frame_idx")
    )


def resize_plan(media: DataFrame, target: int = 64) -> DataFrame:
    """Resize planning (aspect-preserving, never upscaling) over the
    stub-decoded dimensions: the metadata half of an image-resize
    stage. The real pixel resample would be a mapInPandas kernel like
    :func:`extract_features` (Arrow batch in, resized bytes out); the
    PLAN — output geometry and the size estimate the shard packer
    needs — is a pure function of the stub dims, so it stays in column
    algebra (codegen, no Python) and is oracle-checkable.

    Geometry: scale the larger dimension down to ``target`` and the
    other proportionally (floor, min 1); blobs already inside the box
    pass through. ``est_bytes`` = out_w · out_h · 3 (RGB estimate).
    """
    n = F.length("payload")
    w0 = F.greatest(n % 640, F.lit(1))
    h0 = F.greatest((n * 7) % 480, F.lit(1))
    long_side = F.greatest(w0, h0)

    def scaled(dim):
        return F.when(long_side <= target, dim).otherwise(
            F.greatest(F.floor(dim * F.lit(target) / long_side), F.lit(1))
        )

    return media.select(
        "media_id",
        "media_type",
        w0.cast("int").alias("in_width"),
        h0.cast("int").alias("in_height"),
        scaled(w0).cast("int").alias("out_width"),
        scaled(h0).cast("int").alias("out_height"),
        (scaled(w0) * scaled(h0) * 3).cast("long").alias("est_bytes"),
    )
