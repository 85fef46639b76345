"""Multimodal operators: resize round-trip quality, schema stability,
frame sampling algebra."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from a5pg_spark.operators.multimodal import resize_images, sample_frames
from a5pg_spark.sources.images import build_images_df, decode_image, psnr


@pytest.fixture(scope="module")
def images(spark):
    return build_images_df(spark, 64, slices=4).cache()


def test_resize_schema_and_dims(spark, images):
    out = resize_images(images, out_w=16, out_h=12).toPandas()
    assert list(out.columns) == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert (out.w == 16).all() and (out.h == 12).all()
    assert len(out) == 64
    # payloads decode to the declared shape in the row's own format
    r = out.iloc[0]
    img = decode_image(bytes(r.bytes), r.fmt)
    assert img.shape[:2] == (12, 16)


def test_resize_downup_psnr(spark, images):
    """Down-2x then up-2x nearest-neighbour keeps PSNR finite and the exact
    top-left sample grid identical (NN law)."""
    orig = images.toPandas()
    down = resize_images(images, out_w=16, out_h=16)
    up = resize_images(spark.createDataFrame(down.toPandas()), out_w=32, out_h=32).toPandas()
    o = orig.set_index("image_id")
    u = up.set_index("image_id")
    for iid in list(o.index[:8]):
        a = decode_image(bytes(o.loc[iid, "bytes"]), o.loc[iid, "fmt"])
        b = decode_image(bytes(u.loc[iid, "bytes"]), u.loc[iid, "fmt"])
        if a.shape != (32, 32):
            continue
        # NN 2x down + 2x up reproduces the even-index samples exactly
        assert (b[::2, ::2] == a[::2, ::2]).all()
        assert psnr(a.astype(float), b.astype(float)) > 10


def test_resize_preserves_caption_and_phash(spark, images):
    out = resize_images(images, 8, 8)
    j = images.select("image_id", F.col("caption").alias("c0"), F.col("phash").alias("p0")) \
        .join(out, "image_id")
    bad = j.filter((F.col("caption") != F.col("c0")) | (F.col("phash") != F.col("p0"))).count()
    assert bad == 0


def test_sample_frames(spark):
    import pandas as pd

    rows = []
    for vid in range(3):
        frames = [bytes([vid, i]) for i in range(10)]
        rows.append(("v%d" % vid, frames, 4, 4, "raw"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["video_id", "frames", "w", "h", "fmt"])
    )
    out = sample_frames(df, every_n=4).toPandas()
    # frames 0, 4, 8 kept per video
    assert sorted(out.frame_idx.unique()) == [0, 4, 8]
    assert len(out) == 9
    v0 = out[out.video_id == "v0"].sort_values("frame_idx")
    assert [bytes(b)[1] for b in v0.bytes] == [0, 4, 8]
