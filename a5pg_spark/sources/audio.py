"""Deterministic audio table: real RIFF/WAVE PCM-16 codec + synth tones.

Completes the multimodal column matrix (image = PNG/BMP/DCT in images.py,
video = frame stacks in multimodal.py, audio = here).  The WAV container is
the actual spec layout (RIFF chunk framing, fmt/data chunks, LE int16 PCM),
hand-rolled with ``struct`` and cross-checked against the stdlib ``wave``
module in pytest — a second independent implementation, like PNG vs BMP.

Samples are integer sawtooths ``((j*k + phase) % 2048) - 1024`` — closed-form
and BIGINT-safe, so the DuckDB oracle regenerates them exactly (the same
trick as the images table's pixel field, round 3).

Scale design: generation and feature extraction are pure map stages over
``mapInPandas`` (no shuffle, no driver data); the only aggregate is the
per-clip fold inside each Arrow batch.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .images import _splitmix64

AUDIO_SCHEMA = StructType(
    [
        StructField("audio_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_samples", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("transcript", StringType(), False),
        StructField("ahash", LongType(), False),
    ]
)

SR_CYCLE = (8000, 16000, 22050)


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono PCM-16 RIFF/WAVE (the real byte layout, not a stub)."""
    pcm = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Parse RIFF chunk framing; returns (int16 samples, sample_rate)."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE", "not a WAV payload"
    pos, sr, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        chunk = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            afmt, ch, sr, _, _, bits = struct.unpack("<HHIIHH", chunk[:16])
            assert afmt == 1 and ch == 1 and bits == 16, "PCM-16 mono only"
        elif tag == b"data":
            pcm = chunk
        pos += 8 + size + (size & 1)       # RIFF chunks are word-aligned
    assert sr is not None and pcm is not None, "missing fmt/data chunk"
    return np.frombuffer(pcm, dtype="<i2"), sr


def clip_params(i: int) -> tuple[int, int, int, int]:
    """(sample_rate, n_samples, k, phase) for clip i — shared with the
    DuckDB oracle (all integer, BIGINT-safe)."""
    return (SR_CYCLE[i % 3], 1600 + (i % 5) * 800, 3 + i % 7, (i * 17) % 2048)


def make_audio_rows(lo: int, hi: int) -> pd.DataFrame:
    rows = []
    for i in range(lo, hi):
        sr, n, k, phase = clip_params(i)
        s = ((np.arange(n, dtype=np.int64) * k + phase) % 2048 - 1024)
        rows.append({
            "audio_id": f"aud{i:012d}",
            "bytes": wav_encode(s.astype(np.int16), sr),
            "sample_rate": sr,
            "n_samples": n,
            "fmt": "wav",
            "transcript": f"synthetic sawtooth clip {i} k={k}",
            "ahash": int(_splitmix64(np.array([i], dtype=np.uint64))[0]
                         .astype(np.int64)),
        })
    return pd.DataFrame(rows)


def build_audio_df(spark: SparkSession, n: int, slices: int = 32) -> DataFrame:
    bounds = np.linspace(0, n, slices + 1).astype(int)
    rng = spark.sparkContext.parallelize(
        [(int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:])], slices)

    def gen(it):
        for lo, hi in it:
            yield from make_audio_rows(lo, hi).itertuples(index=False)

    return spark.createDataFrame(rng.mapPartitions(gen), AUDIO_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("audio_id", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("sum_sq", LongType()),
        StructField("n_zero_cross", LongType()),
        StructField("peak", IntegerType()),
    ]
)


def audio_features(audio: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Decode WAV → integer signal features, one Arrow batch at a time.

    Emits EXACT integer accumulators (sum of squares, strict zero
    crossings, peak amplitude); derived floats (rms, duration) are computed
    in Spark SQL afterwards so the float op ORDER is pinned and the DuckDB
    oracle reproduces them bit-for-bit (single IEEE div + sqrt)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for big in batches:
            for lo in range(0, len(big), batch_rows):
                pdf = big.iloc[lo:lo + batch_rows]
                out = []
                for r in pdf.itertuples(index=False):
                    s, sr = wav_decode(bytes(r.bytes))
                    s64 = s.astype(np.int64)
                    out.append({
                        "audio_id": r.audio_id,
                        "sample_rate": sr,
                        "n_samples": len(s),
                        "sum_sq": int(np.dot(s64, s64)),
                        "n_zero_cross": int(np.count_nonzero(
                            s64[:-1] * s64[1:] < 0)),
                        "peak": int(np.abs(s64).max()) if len(s64) else 0,
                    })
                yield pd.DataFrame(out, columns=FEATURE_SCHEMA.names)

    return audio.mapInPandas(run, FEATURE_SCHEMA)
