"""Images source + raster tiling: codec invariants (lossless allclose,
lossy PSNR ≥ 40 dB), deterministic generation, pixel→cell tiling laws,
caption preservation through joins (BASELINE.json per-row invariants)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from a5pg_spark.core import bits
from a5pg_spark.operators import tiling
from a5pg_spark.sources import images as I


class TestCodecs:
    def test_png_lossless_roundtrip(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
        out = I.png_decode(I.png_encode(img))
        assert np.array_equal(img, out)  # decoded-pixel allclose (exact)

    def test_fake_jpeg_psnr(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
        out = I.fake_jpeg_decode(I.fake_jpeg_encode(img))
        assert I.psnr(img, out) >= 40.0  # lossy invariant

    def test_bmp_lossless_roundtrip_and_padding(self):
        rng = np.random.default_rng(2)
        # widths exercising all four 4-byte row-padding cases
        for w in (32, 33, 34, 35):
            img = rng.integers(0, 256, size=(24, w), dtype=np.uint8)
            data = I.bmp_encode(img)
            assert data[:2] == b"BM" and len(data) % 4 == 2  # 14-byte header
            out = I.bmp_decode(data)
            assert np.array_equal(img, out)

    def test_lossless_codecs_agree(self):
        """PNG and BMP are independent byte layouts of the same pixels."""
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(48, 33), dtype=np.uint8)
        assert np.array_equal(
            I.png_decode(I.png_encode(img)),
            I.bmp_decode(I.bmp_encode(img)),
        )

    def test_bmp_tiling_end_to_end(self, spark):
        """A BMP-encoded image flows through decode→georef→encode tiling
        with exact pixel conservation, same as PNG."""
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, size=(24, 33), dtype=np.uint8)
        ph = I.phash_for_point(-3.7037, 40.41677)
        row = [("bmp0", I.bmp_encode(img), 33, 24, "bmp", "cap bmp0", ph)]
        df = spark.createDataFrame(
            row, "image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long")
        tiles = tiling.pixels_to_cells(df, res=14)
        agg = tiles.agg(F.sum("n_pixels").alias("n"),
                        F.sum("sum_value").alias("s")).collect()[0]
        assert int(agg.n) == 24 * 33
        assert int(agg.s) == int(img.sum())

    def test_dct_real_lossy_codec(self):
        """The ADCT codec is REAL transform coding: PSNR ≥ 40 dB (the
        north-rule lossy invariant) with genuine frequency-domain loss,
        analytic error bound from orthonormality, and actual compression
        on smooth content."""
        rng = np.random.default_rng(5)
        for h, w in ((48, 64), (37, 53)):       # non-multiple-of-8 too
            img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            data = I.dct_encode(img)
            out = I.dct_decode(data)
            assert out.shape == img.shape
            p = I.psnr(img, out)
            assert 40.0 <= p < float("inf")     # lossy but within invariant
            # orthonormal DCT: MSE ≈ q²/12 → PSNR within a few dB of 45
            assert p <= 55.0
        # smooth content compresses hard (transform coding, not a pixel map)
        yy, xx = np.mgrid[0:64, 0:64]
        smooth = ((yy + xx) // 2).astype(np.uint8)
        assert len(I.dct_encode(smooth)) < 64 * 64 // 8

    def test_dct_tiling_end_to_end(self, spark):
        """A DCT-encoded image flows through decode→georef→encode tiling;
        pixel COUNT is conserved exactly and values are allclose within the
        codec's analytic error bound."""
        rng = np.random.default_rng(6)
        img = rng.integers(0, 256, size=(24, 33), dtype=np.uint8)
        ph = I.phash_for_point(-3.7037, 40.41677)
        row = [("dct0", I.dct_encode(img), 33, 24, "dct", "cap dct0", ph)]
        df = spark.createDataFrame(
            row, "image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long")
        tiles = tiling.pixels_to_cells(df, res=14)
        agg = tiles.agg(F.sum("n_pixels").alias("n"),
                        F.sum("sum_value").alias("s")).collect()[0]
        assert int(agg.n) == 24 * 33
        rec = I.dct_decode(I.dct_encode(img))
        assert int(agg.s) == int(rec.sum())
        assert abs(int(agg.s) - int(img.sum())) <= 2 * 24 * 33  # q/2 ≈ 2/px

    def test_unknown_format_raises(self):
        with pytest.raises(NotImplementedError):
            I.decode_image(b"xxxx", "webp")


class TestGeneration:
    def test_deterministic(self):
        a = I.make_rows(0, 20)
        b = I.make_rows(0, 20)
        assert (a.phash == b.phash).all()
        assert all(x == y for x, y in zip(a.bytes, b.bytes))

    def test_schema_and_golden_pins(self, spark):
        df = I.build_images_df(spark, 64, slices=4)
        pdf = df.toPandas().sort_values("image_id").reset_index(drop=True)
        assert len(pdf) == 64
        assert list(pdf.columns) == ["image_id", "bytes", "w", "h", "fmt",
                                     "caption", "phash"]
        # golden rows: derived capture point == reference golden coordinates
        lon, lat = I.capture_point(pdf.phash.to_numpy()[: len(I.GOLDEN_POINTS)])
        for i, (glon, glat) in enumerate(I.GOLDEN_POINTS):
            assert abs(lon[i] - glon) < 1e-9 and abs(lat[i] - glat) < 1e-9

    def test_capture_point_sql_matches_numpy(self, spark):
        df = I.build_images_df(spark, 32, slices=2)
        out = I.with_capture_point(df).select("phash", "lon", "lat").toPandas()
        lon, lat = I.capture_point(out.phash.to_numpy())
        assert np.allclose(out.lon.to_numpy(), lon, atol=1e-12)
        assert np.allclose(out.lat.to_numpy(), lat, atol=1e-12)


class TestTiling:
    @pytest.fixture(scope="class")
    def imgs(self, spark):
        return I.build_images_df(spark, 24, slices=2).cache()

    def test_pixel_conservation(self, spark, imgs):
        tiles = tiling.pixels_to_cells(imgs, res=15).cache()
        got = (
            tiles.groupBy("image_id").agg(F.sum("n_pixels").alias("n"))
            .toPandas().set_index("image_id").n
        )
        want = imgs.select("image_id", (F.col("w") * F.col("h")).alias("n")) \
            .toPandas().set_index("image_id").n
        for k in want.index:
            assert got[k] == want[k]  # every pixel lands in exactly one cell

    def test_value_conservation_lossless(self, spark, imgs):
        # for png rows, sum of pixel values through tiling == sum in the image
        png = imgs.filter(F.col("fmt") == "png")
        tiles = tiling.pixels_to_cells(png, res=15)
        got = tiles.groupBy("image_id").agg(F.sum("sum_value").alias("s")) \
            .toPandas().set_index("image_id").s
        for row in png.select("image_id", "bytes").collect():
            img = I.png_decode(bytes(row.bytes))
            assert abs(got[row.image_id] - float(img.sum())) < 1e-6

    def test_tiles_near_capture_point(self, spark, imgs):
        tiles = tiling.pixels_to_cells(imgs.limit(4), res=15)
        rows = tiles.collect()
        metas = {r.image_id: r.phash for r in imgs.limit(4).collect()}
        from a5pg_spark.core import cells as C
        for r in rows[:50]:
            lon0, lat0 = I.capture_point(np.array([metas[r.image_id]]))
            clon, clat = C.cell_to_lonlat(np.array([r.cell]))
            assert abs(clon[0] - lon0[0]) < 0.1 and abs(clat[0] - lat0[0]) < 0.1

    def test_mosaic_rollup(self, spark, imgs):
        tiles = tiling.pixels_to_cells(imgs, res=15)
        mosaic = tiling.cell_mosaic(tiles, target_res=8).toPandas()
        assert (mosaic.n_pixels > 0).all()
        assert all(bits.res_of(int(c)) == 8 for c in mosaic.mosaic_cell)
        assert (mosaic.mean_value >= 0).all() and (mosaic.mean_value <= 255).all()

    def test_caption_preserved_through_join(self, spark, imgs):
        # the per-row caption-equality invariant through a cell join
        pts = I.with_capture_point(imgs)
        enc = pts.withColumn(
            "cell", F.expr("a5_lonlat_to_cell(lon, lat, 12)"))
        back = enc.alias("a").join(
            enc.select("cell", F.col("caption").alias("caption2")).alias("b"),
            "cell")
        same = back.filter(F.col("caption") == F.col("caption2")).count()
        assert same >= imgs.count()  # every row at least rejoins itself
