"""Real baseline JPEG codec (a5pg_spark/sources/jpeg.py) — spec-level tests.

No external JPEG library exists in this container, so conformance is
established structurally: marker grammar per ITU-T T.81 Annex B, canonical
Huffman construction cross-checked by an independent in-test
implementation, the FDCT checked against the T.81 formula written out
directly, and byte-stuffing verified on the raw scan bytes.  The
PSNR ≥ 40 dB invariant is BASELINE.json's per-row lossy bound.
"""

import struct

import numpy as np
import pytest

import a5pg_spark.sources.images as I
from a5pg_spark.sources import jpeg as J


def _images():
    rng = np.random.default_rng(7)
    return {
        "gradient": (np.add.outer(np.arange(48), np.arange(64)) * 255 // 111)
        .astype(np.uint8),
        "smooth": (
            128
            + 100 * np.sin(np.add.outer(np.linspace(0, 3, 24), np.linspace(0, 5, 32)))
        ).astype(np.uint8),
        "odd_dims": (
            rng.integers(0, 64, (17, 23)) + np.add.outer(np.arange(17) * 8, np.zeros(23))
        ).astype(np.uint8),
    }


def _table_pixels(n: int = 4):
    df = I.make_rows(0, n)
    return [I.decode_image(df.bytes[i], df.fmt[i]) for i in range(n)]


class TestRoundtrip:
    def test_psnr_above_40(self):
        for name, img in _images().items():
            out = J.jpeg_decode(J.jpeg_encode(img))  # default quality
            assert out.shape == img.shape, name
            assert I.psnr(img, out) >= 40.0, name

    def test_psnr_above_40_on_noise(self):
        # uniform noise is transform coding's worst case — the invariant
        # must hold on arbitrary payloads, not just smooth ones
        img = np.random.default_rng(5).integers(0, 256, (32, 32), dtype=np.uint8)
        assert I.psnr(img, J.jpeg_decode(J.jpeg_encode(img))) >= 40.0

    def test_psnr_above_40_on_table_rows(self):
        # the synthetic table's own pixel content through the real codec
        for img in _table_pixels(4):
            assert I.psnr(img, J.jpeg_decode(J.jpeg_encode(img))) >= 40.0

    def test_constant_image_exact(self):
        img = np.full((16, 16), 137, np.uint8)
        assert np.array_equal(J.jpeg_decode(J.jpeg_encode(img)), img)

    def test_block_aligned_binary_exact(self):
        rng = np.random.default_rng(3)
        img = (np.kron(rng.integers(0, 2, (6, 8)), np.ones((8, 8))) * 255).astype(
            np.uint8
        )
        assert np.array_equal(J.jpeg_decode(J.jpeg_encode(img, 90)), img)

    def test_quality_monotone(self):
        img = _images()["smooth"]
        psnrs = [I.psnr(img, J.jpeg_decode(J.jpeg_encode(img, q))) for q in (50, 75, 95)]
        assert psnrs == sorted(psnrs)


class TestPropertyBased:
    def test_arbitrary_images_hold_invariants(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from hypothesis.extra.numpy import arrays

        @settings(max_examples=25, deadline=None)
        @given(
            arrays(
                np.uint8,
                st.tuples(st.integers(1, 40), st.integers(1, 40)),
                elements=st.integers(0, 255),
            ),
            st.integers(0, 6),
        )
        def check(img, ri):
            data = J.jpeg_encode(img, restart_interval=ri)
            out = J.jpeg_decode(data)
            assert out.shape == img.shape
            assert I.psnr(img, out) >= 40.0

        check()


class TestSpecConformance:
    def test_marker_grammar(self):
        img = _images()["gradient"]
        data = J.jpeg_encode(img, 90)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        # walk segments up to SOS
        pos, seen = 2, []
        while True:
            assert data[pos] == 0xFF
            marker = data[pos + 1]
            seen.append(marker)
            (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            body = data[pos + 4 : pos + 2 + ln]
            if marker == 0xE0:
                assert body[:5] == b"JFIF\x00"
            if marker == 0xC0:
                depth, h, w, nc = struct.unpack(">BHHB", body[:6])
                assert (depth, h, w, nc) == (8, 48, 64, 1)
            pos += 2 + ln
            if marker == 0xDA:
                break
        assert seen == [0xE0, 0xDB, 0xC0, 0xC4, 0xC4, 0xDA]
        # entropy data: every 0xFF is stuffed (FF00) until the final EOI
        scan = data[pos:-2]
        i = 0
        while i < len(scan):
            if scan[i] == 0xFF:
                assert scan[i + 1] == 0x00, "unstuffed FF inside scan"
                i += 2
            else:
                i += 1

    def test_dqt_is_quality_scaled_annex_k(self):
        data = J.jpeg_encode(np.zeros((8, 8), np.uint8), quality=90)
        pos = 2
        while data[pos + 1] != 0xDB:
            (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            pos += 2 + ln
        body = data[pos + 4 : pos + 4 + 65]
        zzq = np.frombuffer(body[1:], dtype=np.uint8)
        nat = np.zeros(64, dtype=np.int32)
        nat[J.ZIGZAG] = zzq
        assert np.array_equal(nat.reshape(8, 8), J.quality_scale(90))

    def test_huffman_canonical_independent(self):
        # independent Annex-C reconstruction: sizes list then sequential codes
        for bits, vals in ((J.DC_BITS, J.DC_VALS), (J.AC_BITS, J.AC_VALS)):
            sizes = [ln for ln in range(1, 17) for _ in range(bits[ln - 1])]
            codes, code, si = [], 0, sizes[0]
            for s in sizes:
                while si < s:
                    code <<= 1
                    si += 1
                codes.append(code)
                code += 1
            expect = {v: (c, s) for v, c, s in zip(vals, codes, sizes)}
            assert expect == J.build_codes(bits, vals)
            # prefix-free
            as_bits = sorted(f"{c:0{s}b}" for c, s in expect.values())
            for a, b in zip(as_bits, as_bits[1:]):
                assert not b.startswith(a)

    def test_fdct_matches_t81_formula(self):
        # T.81 A.3.3: S(v,u) = 1/4 C(v)C(u) ΣΣ s(y,x) cos((2x+1)uπ/16) cos((2y+1)vπ/16)
        rng = np.random.default_rng(11)
        s = rng.uniform(-128, 127, (8, 8))
        y, x, v, u = np.ogrid[0:8, 0:8, 0:8, 0:8]
        cosmat = np.cos((2 * x + 1) * u * np.pi / 16) * np.cos(
            (2 * y + 1) * v * np.pi / 16
        )
        C = np.where(np.arange(8) == 0, 1 / np.sqrt(2), 1.0)
        direct = 0.25 * C[:, None] * C[None, :] * np.einsum(
            "yx,yxvu->vu", s, cosmat
        )
        ours = J._C8 @ s @ J._C8.T
        np.testing.assert_allclose(ours, direct, atol=1e-10)

    def test_zigzag_is_its_own_spec(self):
        # zigzag visits anti-diagonals alternately — derive independently
        order = sorted(
            range(64),
            key=lambda i: (
                (i // 8 + i % 8),
                (i // 8 if (i // 8 + i % 8) % 2 else i % 8),
            ),
        )
        assert list(J.ZIGZAG) == order


class TestIntegration:
    def test_decode_image_sniffs_magic(self):
        img = _images()["smooth"]
        real = J.jpeg_encode(img, 95)
        fake = I.fake_jpeg_encode(img)
        out_real = I.decode_image(real, "jpeg")
        out_fake = I.decode_image(fake, "jpeg")
        assert I.psnr(img, out_real) >= 40.0
        assert np.array_equal(out_fake, I.fake_jpeg_decode(fake))

    def test_restart_markers_roundtrip(self):
        # DRI/RSTn (T.81 B.2.4.4 / E.2.4): same pixels out, DC predictor
        # reset at every interval, markers byte-aligned and unstuffed
        img = _images()["gradient"]
        base = J.jpeg_decode(J.jpeg_encode(img, 90))
        for ri in (1, 2, 5):
            data = J.jpeg_encode(img, 90, restart_interval=ri)
            assert b"\xff\xdd" in data  # DRI segment present
            nblocks = (48 // 8) * (64 // 8)
            n_rst = sum(
                data.count(bytes((0xFF, 0xD0 + m))) for m in range(8)
            )
            assert n_rst == (nblocks - 1) // ri
            assert np.array_equal(J.jpeg_decode(data), base), ri

    def test_decoder_rejects_progressive(self):
        img = np.zeros((8, 8), np.uint8)
        data = bytearray(J.jpeg_encode(img))
        idx = data.find(b"\xff\xc0")
        data[idx + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
        with pytest.raises(NotImplementedError):
            J.jpeg_decode(bytes(data))
