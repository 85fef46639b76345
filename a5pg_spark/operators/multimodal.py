"""Multimodal column operators: resize and frame-sample over opaque binary
payloads (image/video as ``bytes`` + typed metadata columns).

The Spark-side plumbing — schema, batch shape, iterator ``mapInPandas``,
re-encode to the same container format — is real and tested; the pixel
codecs are the container's deterministic stubs (``sources/images.py``: real
PNG, fake-JPEG), mirroring the reference situation (no libjpeg in this
sandbox).  At 100 TB these operators are pure map stages: no shuffle, no
driver data, output partitioning inherits the input's.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.images import decode_image, fake_jpeg_encode, png_encode

RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)


def _nn_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize (deterministic, integer index math)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return img[yi[:, None], xi[None, :]]


def resize_images(images: DataFrame, out_w: int, out_h: int,
                  batch_rows: int = 256) -> DataFrame:
    """Decode → nearest-neighbour resize → re-encode in the row's own format.

    Keeps the exact images-table schema (image_id, bytes, w, h, fmt, caption,
    phash) so downstream operators (tiling, capture-point join) run unchanged
    on the resized table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for big in batches:
            for lo in range(0, len(big), batch_rows):
                pdf = big.iloc[lo : lo + batch_rows]
                out_bytes = []
                for r in pdf.itertuples():
                    img = decode_image(bytes(r.bytes), r.fmt)
                    rs = _nn_resize(img, out_h, out_w)
                    # 'jpeg' rows re-encode through the FJPG stub on purpose:
                    # its closed-form loss (v//4)*4+2 is replicated in the
                    # images_resize_stats DuckDB oracle SQL; the REAL baseline
                    # JPEG codec (sources/jpeg.py) is exercised by
                    # images_jfif_recode instead.
                    enc = png_encode(rs) if r.fmt == "png" else fake_jpeg_encode(rs)
                    out_bytes.append(enc)
                yield pd.DataFrame(
                    {
                        "image_id": pdf.image_id.to_numpy(),
                        "bytes": out_bytes,
                        "w": np.full(len(pdf), out_w, dtype=np.int32),
                        "h": np.full(len(pdf), out_h, dtype=np.int32),
                        "fmt": pdf.fmt.to_numpy(),
                        "caption": pdf.caption.to_numpy(),
                        "phash": pdf.phash.to_numpy(),
                    }
                )

    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    return images.select(*cols).mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def sample_frames(videos: DataFrame, every_n: int = 4,
                  id_col: str = "video_id") -> DataFrame:
    """Frame-sample a video table (video_id, frames array<binary>, w, h, fmt):
    keep every ``every_n``-th frame, exploded to one row per kept frame.

    Videos are opaque per-frame binary arrays (the container has no video
    codec — same stub discipline as images); the sampling itself is pure
    column algebra: posexplode + modulo filter, fully JVM-side."""
    from pyspark.sql import functions as F

    return (
        videos.select(
            F.col(id_col).alias("video_id"),
            F.posexplode("frames").alias("frame_idx", "bytes"),
            "w", "h", "fmt",
        )
        .filter(F.col("frame_idx") % every_n == 0)
        .select("video_id", F.col("frame_idx").cast("int"), "bytes", "w", "h", "fmt")
    )
