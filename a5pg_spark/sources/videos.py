"""Deterministic video table: per-frame REAL PNG payloads + frame stats.

Completes the multimodal matrix's video column with a real codec end to
end: frames are spec-conformant PNG bytes (``images.png_encode``), the
sampling is JVM-side column algebra (``operators.multimodal.sample_frames``)
and the decode/fold stage is an Arrow ``mapInPandas`` pass.  Frame pixels
are the closed form ``(i*2654435761 + f*9176 + y*977 + x*131) % 256`` —
BIGINT-safe, so the DuckDB oracle regenerates every kept frame's pixel
field exactly (same trick as the images table, round 3).

Scale design: generation, sampling and the per-frame fold are map stages;
the only shuffle is the final per-video aggregate on video_id.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .images import png_decode, png_encode

VIDEO_SCHEMA = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("frames", ArrayType(BinaryType()), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("n_frames", IntegerType(), False),
    ]
)


def video_params(i: int) -> tuple[int, int, int]:
    """(w, h, n_frames) for video i — shared with the DuckDB oracle."""
    return (24 + 8 * (i % 3), 16 + 8 * (i % 2), 8 + i % 5)


def frame_pixels(i: int, f: int, w: int, h: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return ((i * 2654435761 + f * 9176 + yy * 977 + xx * 131) % 256
            ).astype(np.uint8)


def make_video_rows(lo: int, hi: int) -> pd.DataFrame:
    rows = []
    for i in range(lo, hi):
        w, h, n = video_params(i)
        rows.append({
            "video_id": f"vid{i:012d}",
            "frames": [png_encode(frame_pixels(i, f, w, h))
                       for f in range(n)],
            "w": w, "h": h, "fmt": "png", "n_frames": n,
        })
    return pd.DataFrame(rows)


def build_videos_df(spark: SparkSession, n: int, slices: int = 16) -> DataFrame:
    bounds = np.linspace(0, n, slices + 1).astype(int)
    rng = spark.sparkContext.parallelize(
        [(int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:])], slices)

    def gen(it):
        for lo, hi in it:
            yield from make_video_rows(lo, hi).itertuples(index=False)

    return spark.createDataFrame(rng.mapPartitions(gen), VIDEO_SCHEMA)


FRAME_STATS_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("sum_px", LongType()),
        StructField("max_px", IntegerType()),
    ]
)


def frame_pixel_stats(frames: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Decode sampled PNG frames → exact integer pixel folds per frame.
    Input schema: (video_id, frame_idx, bytes, w, h, fmt) — the output of
    ``operators.multimodal.sample_frames``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for big in batches:
            for lo in range(0, len(big), batch_rows):
                pdf = big.iloc[lo:lo + batch_rows]
                out = []
                for r in pdf.itertuples(index=False):
                    img = png_decode(bytes(r.bytes))
                    out.append({
                        "video_id": r.video_id,
                        "frame_idx": int(r.frame_idx),
                        "sum_px": int(img.astype(np.int64).sum()),
                        "max_px": int(img.max()) if img.size else 0,
                    })
                yield pd.DataFrame(out, columns=FRAME_STATS_SCHEMA.names)

    return frames.mapInPandas(run, FRAME_STATS_SCHEMA)
