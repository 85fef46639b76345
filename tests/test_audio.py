"""Audio modality: real RIFF/WAV PCM codec + exact integer signal features."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest
from pyspark.sql import functions as F

from a5pg_spark.sources import audio as A


class TestWavCodec:
    def test_roundtrip_lossless(self):
        rng = np.random.default_rng(0)
        s = rng.integers(-32768, 32768, size=5000).astype(np.int16)
        out, sr = A.wav_decode(A.wav_encode(s, 16000))
        assert sr == 16000
        assert np.array_equal(out, s)

    def test_stdlib_wave_reads_our_bytes(self):
        """Cross-check vs an independent implementation: the stdlib `wave`
        module must parse our RIFF layout and recover identical samples."""
        s = (np.arange(1000) % 2048 - 1024).astype(np.int16)
        data = A.wav_encode(s, 8000)
        with wave.open(io.BytesIO(data)) as w:
            assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) \
                == (1, 2, 8000)
            frames = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        assert np.array_equal(frames, s)

    def test_we_read_stdlib_wave_bytes(self):
        s = (np.arange(777) * 5 % 2048 - 1024).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(22050)
            w.writeframes(s.tobytes())
        out, sr = A.wav_decode(buf.getvalue())
        assert sr == 22050
        assert np.array_equal(out, s)


class TestAudioFeatures:
    @pytest.fixture(scope="class")
    def clips(self, spark):
        return A.build_audio_df(spark, 60, slices=8).cache()

    def test_schema_and_determinism(self, spark, clips):
        assert clips.count() == 60
        a = A.make_audio_rows(5, 6).iloc[0]
        b = A.make_audio_rows(5, 6).iloc[0]
        assert bytes(a["bytes"]) == bytes(b["bytes"])

    def test_features_match_numpy(self, spark, clips):
        feats = A.audio_features(clips).orderBy("audio_id").toPandas()
        assert len(feats) == 60
        for row in feats.itertuples(index=False):
            i = int(row.audio_id[3:])
            sr, n, k, phase = A.clip_params(i)
            s = (np.arange(n, dtype=np.int64) * k + phase) % 2048 - 1024
            assert row.sample_rate == sr and row.n_samples == n
            assert row.sum_sq == int(np.dot(s, s))
            assert row.n_zero_cross == int(np.count_nonzero(
                s[:-1] * s[1:] < 0))
            assert row.peak == int(np.abs(s).max())

    def test_rms_sql_derivation(self, spark, clips):
        """rms = sqrt(sum_sq / n): one IEEE division + one sqrt, computed in
        Spark SQL over exact integer accumulators — the op order the DuckDB
        oracle mirrors."""
        f = A.audio_features(clips).withColumn(
            "rms", F.sqrt(F.col("sum_sq") / F.col("n_samples")))
        row = f.where("audio_id = 'aud000000000007'").collect()[0]
        sr, n, k, phase = A.clip_params(7)
        s = (np.arange(n, dtype=np.int64) * k + phase) % 2048 - 1024
        assert row.rms == float(np.sqrt(np.dot(s, s) / n))


class TestVideoFrames:
    def test_video_pipeline_matches_numpy(self, spark):
        """PNG frame stacks → sample every 4th → decode → pixel folds."""
        from a5pg_spark.operators.multimodal import sample_frames
        from a5pg_spark.sources import videos as V

        vids = V.build_videos_df(spark, 12, slices=4)
        stats = V.frame_pixel_stats(sample_frames(vids, every_n=4)) \
            .orderBy("video_id", "frame_idx").toPandas()
        for r in stats.itertuples(index=False):
            i = int(r.video_id[3:])
            w, h, n = V.video_params(i)
            assert r.frame_idx % 4 == 0 and r.frame_idx < n
            img = V.frame_pixels(i, r.frame_idx, w, h).astype(np.int64)
            assert r.sum_px == int(img.sum())
            assert r.max_px == int(img.max())
        kept = sum(len(range(0, V.video_params(i)[2], 4))
                   for i in range(12))
        assert len(stats) == kept
