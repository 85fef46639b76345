"""Real baseline JPEG (JFIF) codec — pure NumPy/stdlib, spec-conformant.

Closes the last declared image-codec stub (``fake_jpeg`` in images.py):
this module implements ITU-T T.81 baseline sequential DCT, single-component
(grayscale), with the standard Annex K luminance quantization and Huffman
tables and IJG-style quality scaling.  Files produced here start with the
SOI/APP0 "JFIF" preamble and are readable by any standard JPEG decoder;
the decoder here reads any baseline single-component JPEG stream.

Reference parity note: the reference engine (a5pg, reference/src/lib.rs)
delegates image handling to PostgreSQL clients entirely — image codecs are
this repo's own scope (BASELINE.json input_hint: lossy decode must hold
PSNR ≥ 40 dB vs the source pixels).

Why the FJPG stub still exists: the synthetic images table keeps FJPG
payloads under fmt='jpeg' because its closed-form loss `(v//4)*4+2` is
replicated in DuckDB oracle SQL (__spark_entry__.py); real JPEG loss has
no SQL closed form.  ``images.decode_image`` sniffs the magic, so both
payload kinds decode under fmt='jpeg'.

Scale note: encode/decode are per-image map work behind mapInPandas —
embarrassingly parallel, shards with the table, no shuffle implications.
The 2-D DCT is one vectorized einsum over all 8×8 blocks of an image;
only the entropy stage loops per block (bounded by image size).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Annex K tables
# ---------------------------------------------------------------------------

# K.1 — luminance quantization table, in natural (row-major) order.
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# K.3.1 — DC luminance: BITS (code counts for lengths 1..16) + HUFFVAL.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# K.3.2 — AC luminance.
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Zigzag scan: ZIGZAG[k] = natural (row-major) index of the k-th coefficient.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)  # natural index -> zigzag position


def _dct_mat(n: int = 8) -> np.ndarray:
    """Orthonormal DCT-II matrix.  For n=8 this IS the T.81 FDCT:
    S(v,u) = 1/4 C(v)C(u) ΣΣ s(y,x) cos(...)cos(...), C(0)=1/√2."""
    k = np.arange(n)
    C = np.sqrt(2.0 / n) * np.cos(
        np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n)
    )
    C[0] /= np.sqrt(2.0)
    return C


_C8 = _dct_mat(8)


def quality_scale(quality: int) -> np.ndarray:
    """IJG quality → quant table (T.81 allows any; this is the de-facto
    public scaling used by libjpeg's jpeg_set_quality)."""
    quality = int(min(100, max(1, quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (QUANT_LUMA * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# canonical Huffman (T.81 Annex C)
# ---------------------------------------------------------------------------


def build_codes(bits: list, vals: list) -> dict:
    """BITS/HUFFVAL → {symbol: (code, length)} via the Annex C flow
    (generate_size_table / generate_code_table)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_ENC = build_codes(DC_BITS, DC_VALS)
_AC_ENC = build_codes(AC_BITS, AC_VALS)


class _BitWriter:
    """MSB-first bit accumulator with T.81 F.1.2.3 byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per F.1.2.3

    def put_marker(self, marker: int) -> None:
        """Byte-align and emit a bare marker (e.g. RSTn) — markers are not
        byte-stuffed (B.1.1.2)."""
        self.pad_to_byte()
        self.out += bytes((0xFF, marker))

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


def _category(v: int) -> int:
    """SSSS: number of magnitude bits of v (0 for 0)."""
    return int(abs(v)).bit_length()


def _amplitude(v: int, ssss: int) -> int:
    """Magnitude bits: v if positive, v-1 low bits if negative (ones'
    complement form per F.1.2.1)."""
    return v if v >= 0 else v + (1 << ssss) - 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def jpeg_encode(
    img: np.ndarray, quality: int = 95, restart_interval: int = 0
) -> bytes:
    """Baseline sequential JFIF, one grayscale component, Annex K tables.

    Default quality 95: measured ≥ 42 dB PSNR even on uniform-noise input
    (the worst case for transform coding), so the BASELINE.json per-row
    invariant (PSNR ≥ 40 dB for lossy) holds for ANY uint8 payload, not
    just smooth ones.

    ``restart_interval`` > 0 emits a DRI segment and RST0–7 markers every
    that many MCUs (B.2.4.4 / E.2.4) — what a parallel or error-resilient
    encoder produces; mainly here so the decoder's restart path is
    exercised by our own output."""
    assert img.ndim == 2 and img.dtype == np.uint8
    h, w = img.shape
    assert 0 < h <= 0xFFFF and 0 < w <= 0xFFFF
    q = quality_scale(quality)

    # blocks: pad to 8 with edge replication (decoder crops back)
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    pad = np.pad(
        img.astype(np.float64),
        ((0, H - h), (0, W - w)),
        mode="edge",
    )
    b = pad.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    X = np.einsum("ij,rcjk,lk->rcil", _C8, b - 128.0, _C8)
    coef = np.round(X / q).astype(np.int32)  # (rows, cols, 8, 8)
    zz = coef.reshape(-1, 64)[:, ZIGZAG]  # zigzag-ordered per block

    # entropy stage
    bw = _BitWriter()
    prev_dc = 0
    for bi, blk in enumerate(zz):
        if restart_interval and bi and bi % restart_interval == 0:
            bw.put_marker(0xD0 + (bi // restart_interval - 1) % 8)
            prev_dc = 0  # DC predictor resets at every restart (E.2.4)
        diff = int(blk[0]) - prev_dc
        prev_dc = int(blk[0])
        ssss = _category(diff)
        code, ln = _DC_ENC[ssss]
        bw.put(code, ln)
        if ssss:
            bw.put(_amplitude(diff, ssss), ssss)
        run = 0
        (nz,) = np.nonzero(blk[1:])
        last = int(nz[-1]) + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = _AC_ENC[0xF0]  # ZRL
                bw.put(code, ln)
                run -= 16
            ssss = _category(v)
            code, ln = _AC_ENC[(run << 4) | ssss]
            bw.put(code, ln)
            bw.put(_amplitude(v, ssss), ssss)
            run = 0
        if last < 63:
            code, ln = _AC_ENC[0x00]  # EOB
            bw.put(code, ln)
    scan = bw.flush()

    # markers
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(q.reshape(-1)[ZIGZAG].astype(np.uint8)))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data; un-stuffs FF00, stops at
    any other marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos < len(d):
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:  # marker: feed 1-bit padding (only trailing pad reads this)
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    return
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        else:
            self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def sync_restart(self) -> None:
        """Consume an expected RSTn: drop pad bits (≤7 real + any marker
        padding _fill speculatively fed), byte-align on the marker, skip it."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and (
            0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected RST marker at restart interval")


def _decode_tree(bits: list, vals: list) -> dict:
    """(length, code) → symbol, for decode-by-extension."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, tree: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = tree.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, ssss: int) -> int:
    """F.2.2.1 EXTEND."""
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline sequential single-component JPEG."""
    assert data[:2] == b"\xff\xd8", "not a JPEG (no SOI)"
    pos = 2
    qtables = {}
    htrees = {}
    h = w = None
    comp_q = comp_dc = comp_ac = 0
    restart_interval = 0
    while pos < len(data):
        assert data[pos] == 0xFF, "marker expected"
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9):
            continue
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                assert prec == 0, "only 8-bit quant tables supported"
                zzq = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = zzq
                qtables[tid] = nat.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htrees[(tc, th)] = _decode_tree(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xC0:  # SOF0 baseline
            depth, h, w, nc = struct.unpack(">BHHB", body[:6])
            assert depth == 8 and nc == 1, "only 8-bit grayscale supported"
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline (SOF0) supported")
        elif marker == 0xDA:  # SOS — entropy data follows
            assert body[0] == 1, "single-component scan expected"
            comp_dc, comp_ac = body[2] >> 4, body[2] & 0xF
            pos += ln
            break
        pos += ln
    assert h is not None, "no SOF0 before SOS"

    q = qtables[comp_q]
    dc_tree = htrees[(0, comp_dc)]
    ac_tree = htrees[(1, comp_ac)]
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    nblocks = (H // 8) * (W // 8)
    zz = np.zeros((nblocks, 64), dtype=np.int32)
    br = _BitReader(data, pos)
    prev_dc = 0
    for bi in range(nblocks):
        if restart_interval and bi and bi % restart_interval == 0:
            br.sync_restart()
            prev_dc = 0
        ssss = _read_symbol(br, dc_tree)
        diff = _extend(br.read(ssss), ssss) if ssss else 0
        prev_dc += diff
        zz[bi, 0] = prev_dc
        k = 1
        while k < 64:
            rs = _read_symbol(br, ac_tree)
            run, ssss = rs >> 4, rs & 0xF
            if ssss == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += run
            zz[bi, k] = _extend(br.read(ssss), ssss)
            k += 1

    coef = np.zeros((nblocks, 64), dtype=np.float64)
    coef[:, ZIGZAG] = zz  # inverse zigzag
    X = coef.reshape(H // 8, W // 8, 8, 8) * q
    blocks = np.einsum("ji,rcjk,kl->rcil", _C8, X, _C8)
    out = blocks.transpose(0, 2, 1, 3).reshape(H, W) + 128.0
    return np.round(out[:h, :w]).clip(0, 255).astype(np.uint8)
