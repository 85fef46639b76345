"""Deterministic synthetic image+caption table (FIXTURES.md §1 schema) and
pure-Python codecs.

Schema (exact ``input_hint`` shape from BASELINE.json):
    images(image_id string, bytes binary, w int, h int, fmt string,
           caption string, phash long)

* **png**: a real, spec-conformant grayscale 8-bit PNG (zlib is stdlib) —
  lossless, decoded pixels must match exactly.
* **jpeg**: REAL baseline JFIF codec in :mod:`.jpeg` (ITU-T T.81 baseline
  sequential, Annex K tables, pure NumPy/stdlib — round 5, closing the
  last codec stub).  ``decode_image(fmt="jpeg")`` sniffs the payload
  magic: ``FFD8`` → the real decoder; ``FJPG`` → the legacy deterministic
  stub (pixels quantized to multiples of 4, PSNR ≈ 42 dB).  The synthetic
  table keeps FJPG payloads under fmt='jpeg' ONLY because its closed-form
  loss ``(v//4)*4+2`` is replicated in DuckDB oracle SQL
  (__spark_entry__.py); real JPEG loss has no SQL closed form.

Capture point derivation (the table carries no lon/lat — BASELINE.json):
    lon = pmod(phash, 360000000)/1e6 − 180
    lat = pmod(phash DIV 360000000, 180000000)/1e6 − 90
expressible identically in Spark SQL and DuckDB.  The first rows are pinned
to the reference's golden coordinates (FIXTURES.md §3) so cell-id goldens are
exercised end-to-end.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("caption", StringType(), False),
        StructField("phash", LongType(), False),
    ]
)

W_CYCLE = (16, 32, 64)
H_CYCLE = (16, 24, 48)
FMT_CYCLE = ("png", "jpeg")

# golden pins (FIXTURES.md §3): first rows carry reference coordinates
GOLDEN_POINTS = [
    (-73.9857, 40.7580),   # NYC
    (-74.0060, 40.7128),   # NYC duckdb example
    (-0.1278, 51.5074),    # London
    (-0.1276, 51.5074),    # London res 10
    (139.6503, 35.6762),   # Tokyo
    (-3.7037, 40.41677),   # Madrid
    (0.0, 0.0),            # origin
]


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """Grayscale 8-bit PNG, filter 0, single IDAT."""
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bit8, gray
    raw = b"".join(b"\x00" + img[r].astype(np.uint8).tobytes() for r in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert depth == 8 and ctype == 0, "only gray8 supported"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    # vectorized un-filter: scanlines are [filter_byte, w pixels] — we encode
    # filter 0 only, so decode is a single reshape + slice
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w + 1)
    if (arr[:, 0] != 0).any():
        raise NotImplementedError("only filter 0 supported (we encode filter 0)")
    return np.ascontiguousarray(arr[:, 1:])


def bmp_encode(img: np.ndarray) -> bytes:
    """Grayscale 8-bit BMP (BITMAPINFOHEADER, BI_RGB, 256-entry gray
    palette, bottom-up rows, 4-byte row padding) — a second REAL lossless
    codec (spec-conformant; any image viewer opens it), so lossless-format
    handling is exercised by two independent byte layouts, not just PNG."""
    h, w = img.shape
    pad = (-w) % 4
    stride = w + pad
    palette = b"".join(bytes((v, v, v, 0)) for v in range(256))
    off = 14 + 40 + len(palette)
    size = off + stride * h
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, stride * h,
                       2835, 2835, 256, 0)
    rows = img.astype(np.uint8)
    if pad:
        rows = np.pad(rows, ((0, 0), (0, pad)))
    return hdr + info + palette + rows[::-1].tobytes()


def bmp_decode(data: bytes) -> np.ndarray:
    assert data[:2] == b"BM", "not a BMP"
    (off,) = struct.unpack("<I", data[10:14])
    hsz, w, h, planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    assert hsz >= 40 and bpp == 8 and comp == 0, "only gray8 BI_RGB supported"
    flip = h > 0
    h = abs(h)
    stride = (w + 3) & ~3
    arr = np.frombuffer(data[off:off + stride * h], dtype=np.uint8)
    arr = arr.reshape(h, stride)[:, :w]
    return np.ascontiguousarray(arr[::-1] if flip else arr)


_FJPG_MAGIC = b"FJPG"
_FJPG_Q = 4  # quantization step → PSNR ≈ 20·log10(255·√12/4) ≈ 42 dB


def fake_jpeg_encode(img: np.ndarray) -> bytes:
    """STUB lossy codec (no libjpeg in this container): quantize to Q=4."""
    h, w = img.shape
    q = (img.astype(np.int32) // _FJPG_Q).astype(np.uint8)
    return _FJPG_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def fake_jpeg_decode(data: bytes) -> np.ndarray:
    assert data[:4] == _FJPG_MAGIC, "not a FJPG stub payload"
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w)
    return (q.astype(np.int32) * _FJPG_Q + _FJPG_Q // 2).clip(0, 255).astype(np.uint8)


_ADCT_MAGIC = b"ADCT"
_ADCT_Q = 4.0   # uniform coefficient quant step → MSE ≈ q²/12 → PSNR ≈ 45 dB


def _dct_mat(n: int = 8) -> np.ndarray:
    """Orthonormal DCT-II matrix (C @ C.T == I), NumPy only."""
    k = np.arange(n)
    C = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1)
                                  * k[:, None] / (2 * n))
    C[0] /= np.sqrt(2.0)
    return C


def dct_encode(img: np.ndarray, q: float = _ADCT_Q) -> bytes:
    """REAL lossy transform codec (JPEG-style, not JPEG-compatible): 8×8
    block DCT-II, uniform frequency-domain quantization, zlib entropy
    stage.  Deterministic, NumPy-only — gives the PSNR invariant an actual
    transform-coding loss profile instead of a flat pixel quantizer.
    Orthonormality bounds the error analytically: MSE ≈ q²/12 per
    coefficient → PSNR ≈ 20·log10(255·√12/q) (≈ 45 dB at q=4)."""
    h, w = img.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    pad = np.pad(img.astype(np.float64), ((0, H - h), (0, W - w)),
                 mode="edge")
    C = _dct_mat()
    b = pad.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    X = np.einsum("ij,abjk,lk->abil", C, b - 128.0, C)
    coefs = np.round(X / q).astype(np.int16)
    return (_ADCT_MAGIC + struct.pack(">IIf", w, h, q)
            + zlib.compress(coefs.tobytes(), 6))


def dct_decode(data: bytes) -> np.ndarray:
    assert data[:4] == _ADCT_MAGIC, "not an ADCT payload"
    w, h, q = struct.unpack(">IIf", data[4:16])
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    coefs = np.frombuffer(zlib.decompress(data[16:]), dtype=np.int16)
    X = coefs.reshape(H // 8, W // 8, 8, 8).astype(np.float64) * q
    C = _dct_mat()
    b = np.einsum("ji,abjk,kl->abil", C, X, C)
    pad = b.transpose(0, 2, 1, 3).reshape(H, W) + 128.0
    return np.round(pad[:h, :w]).clip(0, 255).astype(np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "bmp":
        return bmp_decode(data)
    if fmt == "dct":
        return dct_decode(data)
    if fmt in ("jpeg", "jpg", "jfif"):
        if data[:2] == b"\xff\xd8":  # real JPEG (SOI marker)
            from .jpeg import jpeg_decode

            return jpeg_decode(data)
        return fake_jpeg_decode(data)
    raise NotImplementedError(
        f"format {fmt!r}: wire png_decode/jpeg_decode-style codecs here"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0 / np.sqrt(mse))


# ---------------------------------------------------------------------------
# deterministic generation
# ---------------------------------------------------------------------------


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return (x ^ (x >> np.uint64(31))).astype(np.uint64)


def phash_of(i: np.ndarray) -> np.ndarray:
    """Seeded 64-bit hash of the row index (stable across runs), as signed."""
    return _splitmix64(np.asarray(i, dtype=np.uint64)).view(np.int64)


CAPTURE_MOD = 360000000 * 180000000  # lon micro-deg × lat micro-deg


def capture_point(phash) -> tuple:
    """The shared Spark/DuckDB derivation rule:
        p = pmod(phash, 360000000·180000000)   (non-negative ⇒ // == DIV)
        lon = (p % 360000000)/1e6 − 180,  lat = (p // 360000000)/1e6 − 90
    """
    ph = np.asarray(phash, dtype=np.int64)
    p = ph % CAPTURE_MOD  # numpy % is pythonic → non-negative
    lon = (p % 360000000) / 1e6 - 180.0
    lat = (p // 360000000) / 1e6 - 90.0
    return lon, lat


def phash_for_point(lon: float, lat: float) -> int:
    """Inverse of capture_point for coordinates with ≤ 6 decimals — lets the
    golden rows pin reference coordinates through the same derivation."""
    lon_i = round((lon + 180.0) * 1e6)
    lat_i = round((lat + 90.0) * 1e6)
    return lat_i * 360000000 + lon_i


def make_rows(lo: int, hi: int) -> pd.DataFrame:
    """Rows i ∈ [lo, hi) of the deterministic images table."""
    rows = []
    for i in range(lo, hi):
        w = W_CYCLE[i % 3]
        h = H_CYCLE[i % 3]
        fmt = FMT_CYCLE[i % 2]
        if i < len(GOLDEN_POINTS):
            # golden pin: choose phash so the derived point IS the golden point
            ph = phash_for_point(*GOLDEN_POINTS[i])
        else:
            ph = int(phash_of(np.array([i]))[0])
        # SQL-expressible pixel field (round 3): the DuckDB tiling oracle
        # regenerates these exact values as (i*2654435761 + y*977 + x*131)%256
        # — all intermediates < 2^63, so BIGINT-safe in every dialect
        yy, xx = np.mgrid[0:h, 0:w]
        img = ((i * 2654435761 + yy * 977 + xx * 131) % 256).astype(np.uint8)
        data = png_encode(img) if fmt == "png" else fake_jpeg_encode(img)
        lon, lat = capture_point(np.array([ph]))
        lon, lat = float(lon[0]), float(lat[0])
        rows.append(
            {
                "image_id": f"img{i:012d}",
                "bytes": data,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": f"caption for img{i:012d} at ({lon:.6f},{lat:.6f})",
                "phash": ph,
            }
        )
    return pd.DataFrame(rows)


def build_images_df(spark: SparkSession, n: int, slices: int = 32) -> DataFrame:
    """Distributed deterministic generation — each partition builds its own
    index range (no driver-side materialization; scales to any n)."""

    def gen(iterator):
        for pdf in iterator:
            for _, r in pdf.iterrows():
                yield make_rows(int(r.lo), int(r.hi))

    bounds = [
        (i * n // slices, (i + 1) * n // slices) for i in range(slices)
    ]
    bdf = spark.createDataFrame(pd.DataFrame(bounds, columns=["lo", "hi"]))
    return bdf.repartition(slices, "lo").mapInPandas(gen, IMAGES_SCHEMA)


CAPTURE_SQL = (
    "pmod(phash, CAST(64800000000000000 AS BIGINT))"  # 360e6 · 180e6
)


def with_capture_point(images: DataFrame) -> DataFrame:
    """Add lon/lat via the portable SQL derivation — identical semantics in
    Spark SQL and DuckDB (p is non-negative so DIV == floor-div)."""
    return images.withColumn("__p", F.expr(CAPTURE_SQL)).select(
        "*",
        F.expr("(__p % 360000000) / 1e6 - 180.0").alias("lon"),
        F.expr("(__p DIV 360000000) / 1e6 - 90.0").alias("lat"),
    ).drop("__p")
