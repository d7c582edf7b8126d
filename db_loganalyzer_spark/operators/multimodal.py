"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched pandas stages.

The Spark-side contract is real and tested — schema, partition-preserving
mapInPandas, batch shapes; the actual codec calls are stubbed behind
``decode_backend`` because no image/audio libraries ship in this
container (swap in PIL/torchaudio/av by passing a real backend).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "meta map<string,string>"
)

_DECODED_SCHEMA = (
    "media_id long, media_type string, byte_len long, "
    "width int, height int, n_frames int, format string"
)


def media_table_from_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic media stand-in: utf-8 payload bytes from text (real
    pipelines read payloads via spark.read.format('binaryFile'))."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )


def fake_decode_backend(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in decoder: metadata derived from the bytes.
    A real backend would call PIL.Image.open / av.open here."""
    n = len(payload)
    return {
        "width": 16 + n % 640,
        "height": 16 + (n * 7) % 480,
        "n_frames": 1 if media_type == "image" else 1 + n % 300,
        "format": {"image": "png", "audio": "wav", "video": "mp4"}.get(
            media_type, "bin"
        ),
    }


def unavailable_decode_backend(payload: bytes, media_type: str) -> dict:
    """The honest stub: raises until a codec library is provided."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this container; pass decode_backend=fake_decode_backend for "
        "plumbing tests or a PIL/av-backed callable in production"
    )


def decode_media(
    media: DataFrame,
    decode_backend: Callable[[bytes, str], dict] = unavailable_decode_backend,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract via mapInPandas: Arrow ships each partition
    as pandas batches, the backend runs per row inside the batch, output
    is columnar. Narrow (partition-preserving) — at 100 TB this is the
    pattern for any per-asset CPU work; repartition upstream to balance
    asset sizes, never collect."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                decode_backend(p, t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "format": [m["format"] for m in metas],
                }
            )

    return media.mapInPandas(_decode, schema=_DECODED_SCHEMA)


def resize_plan(
    decoded: DataFrame, max_side: int = 256
) -> DataFrame:
    """Resize planning is plain column math (JVM-side); only the pixel
    work itself needs the pandas stage."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height"),
    ).otherwise(F.lit(1.0))
    return decoded.select(
        "media_id",
        "width",
        "height",
        F.round(scale, 4).alias("scale"),
        F.ceil(F.col("width") * scale).cast("int").alias("out_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("out_height"),
    )


def frame_sample_plan(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video rows: one row per sampled frame
    index (explode of a sequence — the UDTF shape, no Python)."""
    return decoded.filter(F.col("n_frames") > 1).select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_index"),
    )
