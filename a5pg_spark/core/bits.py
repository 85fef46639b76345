"""A5 cell-ID bit layer — pure 64-bit integer arithmetic, no geometry.

Layout (empirically verified against the reference's golden outputs,
``/root/reference/tests/pg_regress/expected/duckdb_examples.out:1-11``,
``expected/basic.out:1``, ``expected/hex_functions.out:10,30,35,40``):

::

    bit 63 ─────────────────────────────────────────────── bit 0
    [ origin: 6 bits ][ 2 bits per level (Hilbert S) ][1][ 0…0 ]
                                                       ^ marker at bit p = 59 − 2·res   (res ≥ 1)

* ``origin`` (top 6 bits) is the quintant id 0‥59 = 5·face + quintant for
  res ≥ 1, and the dodecahedron face id 0‥11 for res 0 (marker at bit 57,
  same slot as res 1 — the known A5 res-0/1 encoding boundary; see DESIGN.md).
* ``resolution = (59 − trailing_zeros(id)) // 2`` — floor division handles
  non-canonical ids such as 207618739568 → 27
  (``expected/duckdb_examples.out:6``).
* parent/children/contains are pure mask arithmetic, verified bit-for-bit
  against ``expected/duckdb_examples.out:3-4`` (parent 2742821365684895744,
  children 2742820953368035328‥2742821778001756160).

Cell ids are carried as *signed* int64 (Spark ``LongType``); u64 values above
``i64::MAX`` (origins ≥ 32, e.g. Tokyo 0x872f8a8000000000) are represented by
their two's-complement reinterpretation.  All mask arithmetic below is
sign-safe (AND/OR/XOR only on the high side; shifts only of small positive
values).  ``strict_i64=True`` reproduces the reference's overflow error
(``/root/reference/src/lib.rs:32-37``).

Everything is vectorized over NumPy uint64 arrays; scalar Python-int wrappers
are provided for tests and driver-side constant folding.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 29  # deepest res with a marker bit: p = 59 - 2*29 = 1
FIRST_HILBERT_RES = 1  # res 1 = 60 quintants; each deeper level is x4
WORLD_CELL = 0  # the reference treats cell id 0 as the whole world

_U1 = np.uint64(1)
_U2 = np.uint64(2)
_U59 = np.uint64(59)
_U58 = np.uint64(58)
_U63MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _as_u64(cells) -> np.ndarray:
    a = np.asarray(cells)
    if a.dtype == np.uint64:
        return a
    return a.astype(np.int64, copy=False).view(np.uint64)


def _as_i64(cells_u64: np.ndarray) -> np.ndarray:
    return cells_u64.view(np.int64)


def marker_pos(res) -> np.ndarray:
    """Bit position of the resolution marker: 59 − 2·res (res 0 → 57)."""
    r = np.asarray(res, dtype=np.uint64)
    p = _U59 - _U2 * r
    return np.where(np.asarray(res) == 0, np.uint64(57), p).astype(np.uint64)


def trailing_zeros_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (0 → 64)."""
    x = np.asarray(x, dtype=np.uint64)
    low = x & (~x + _U1)  # isolate lowest set bit
    # float64 represents 2^k exactly for k ≤ 63; log2 of an exact power of two
    # is exact, so the cast is safe.
    with np.errstate(divide="ignore"):
        tz = np.where(low == 0, 64.0, np.log2(low.astype(np.float64)))
    return tz.astype(np.int64)


def get_resolution(cells) -> np.ndarray:
    """res = (59 − tz) // 2 (floor; handles non-canonical ids like
    207618739568 → 27).  id 0 → 0 (world).

    res-0/1 disambiguation: both use marker bit 57 (the A5 "first Hilbert
    resolution" boundary).  Ids with marker 57 and origin < 12 decode as res-0
    *face* cells (matches the world-cell golden 0x0e00000000000000 = face 3);
    origin ≥ 12 ⇒ res-1 quintant.  Consequence (documented in DESIGN.md §3):
    quintants 0-11 at res 1 alias their face cells and are not distinct.
    """
    u = _as_u64(cells)
    tz = trailing_zeros_u64(u)
    res = (59 - tz) // 2
    res = np.where((tz == 57) & ((u >> _U58) < np.uint64(12)), 0, res)
    return np.where(u == 0, 0, res).astype(np.int32)


def cell_to_parent(cells, target_res) -> np.ndarray:
    """Ancestor at ``target_res`` — clear everything below the new marker.

    Golden: parent(0x261075f060000000, 10) = 0x2610758000000000 and
    parent(207618739568, 10) = 2^39 (``expected/duckdb_examples.out:3,7``).
    res-1 → res-0 maps quintant (0-59) → face (0-11).
    """
    u = _as_u64(cells)
    tr = np.broadcast_to(np.asarray(target_res, dtype=np.int64), u.shape)
    p = (_U59 - _U2 * tr.astype(np.uint64)).astype(np.uint64)
    keep = (_U63MASK << (p + _U1)) & _U63MASK
    parent = (u & keep) | (_U1 << p)
    # res 0: origin field becomes the face id = quintant // 5; a cell that is
    # *already* res 0 stores the face id directly — parent at its own
    # resolution is the identity (matches a5::cell_to_parent semantics)
    face0 = ((u >> _U58) // np.uint64(5)) << _U58 | (_U1 << np.uint64(57))
    already0 = get_resolution(cells) == 0
    out = np.where(tr == 0, np.where(already0, u, face0), parent)
    return _as_i64(out.astype(np.uint64))


def cell_to_children(cell: int, target_res: int) -> np.ndarray:
    """All 4^Δ descendants of one cell (vectorized over the suffix codes).

    Golden: children(0x2610758000000000, 11) =
    [0x2610752…, 0x2610756…, 0x261075a…, 0x261075e…]
    (``expected/duckdb_examples.out:4``): suffix code c lands at bits
    [p_parent, p_parent−1], new marker two below.
    res-0 → res-1 expands a face into its 5 quintants (×5, then ×4 deeper).
    """
    cu = np.array([cell], dtype=np.int64).view(np.uint64)[0]
    res = int(get_resolution(np.array([cell], dtype=np.int64))[0])
    if target_res < res:
        raise ValueError(f"target_res {target_res} < cell resolution {res}")
    if target_res > MAX_RES:
        raise ValueError(f"target_res {target_res} > MAX_RES {MAX_RES}")
    if res == 0:
        face = int(cu >> _U58)
        if target_res == 1 and face <= 2:
            # quintants 0-11 alias res-0 face cells (marker bit 57 is shared —
            # DESIGN.md §3); refusing loudly beats returning self-inconsistent
            # ids that decode back as res-0 faces
            raise ValueError(
                f"res-1 children of face {face} are unrepresentable: quintants "
                "0-11 alias res-0 face ids (see DESIGN.md §3); use target_res >= 2"
            )
        quintants = np.arange(5 * face, 5 * face + 5, dtype=np.uint64)
        bases = (quintants << _U58) | (_U1 << np.uint64(57))
        if target_res == 1:
            return _as_i64(bases)
        # build descendants directly from the quintant origins — recursing
        # through res-1 ids would hit the res-0/1 alias for faces 0-2
        # (quintants 0-11 decode as res-0 faces) and never terminate
        pt = np.uint64(59 - 2 * target_res)
        s = np.arange(1 << (2 * (target_res - 1)), dtype=np.uint64)
        kids = (
            (quintants[:, None] << _U58) | (s[None, :] << (pt + _U1)) | (_U1 << pt)
        ).ravel()
        return _as_i64(kids)
    if target_res == res:
        return np.array([cell], dtype=np.int64)
    delta = target_res - res
    p = int(59 - 2 * res)
    pt = np.uint64(59 - 2 * target_res)
    s = np.arange(1 << (2 * delta), dtype=np.uint64)
    base = (cu ^ (_U1 << np.uint64(p)))  # clear old marker
    kids = base | (s << (pt + _U1)) | (_U1 << pt)
    return _as_i64(kids)


def cell_contains(ancestors, descendants) -> np.ndarray:
    """Prefix containment: contains(a, d) ⇔ parent(d, res(a)) == a."""
    a = _as_u64(ancestors)
    d = _as_u64(descendants)
    ra = get_resolution(ancestors)
    rd = get_resolution(descendants)
    pd_ = _as_u64(cell_to_parent(descendants, np.maximum(ra, 0)))
    return (ra <= rd) & (pd_ == a)


def uncompact(cells, target_res: int) -> np.ndarray:
    """Expand each cell to all its descendants at ``target_res``."""
    out = [cell_to_children(int(c), target_res) for c in np.asarray(cells, dtype=np.int64)]
    if not out:
        return np.array([], dtype=np.int64)
    return np.concatenate(out)


def compact(cells) -> np.ndarray:
    """Replace complete sibling groups (4, or 5 at res-1→0) with their parent,
    to a fixpoint.  Output is deduplicated and sorted ascending (the reference
    pins no order; ascending is our documented convention, see DESIGN.md).
    """
    cur = set(int(c) for c in np.asarray(cells, dtype=np.int64))
    changed = True
    while changed:
        changed = False
        by_parent: dict = {}
        for c in cur:
            r = int(get_resolution(np.array([c], dtype=np.int64))[0])
            if r < 1:
                continue
            p = int(cell_to_parent(np.array([c], dtype=np.int64), r - 1)[0])
            by_parent.setdefault((p, r), set()).add(c)
        for (p, r), group in by_parent.items():
            pres = int(get_resolution(np.array([p], dtype=np.int64))[0])
            if pres != r - 1:
                # id-space alias: res-2 quintant-0 cells on faces 0-2 collapse
                # onto the face's res-0 id (DESIGN.md §3); their res-1 parent
                # is unrepresentable, so the group can never compact.
                continue
            expected = set(int(k) for k in cell_to_children(p, pres + 1))
            if expected <= group:
                cur -= expected
                cur.add(p)
                changed = True
                break  # sets mutated; restart grouping
    return np.array(sorted(cur, key=lambda x: x & 0xFFFFFFFFFFFFFFFF), dtype=np.int64)


# ---------------------------------------------------------------------------
# scalar conveniences (tests / driver-side folding)
# ---------------------------------------------------------------------------

def res_of(cell: int) -> int:
    return int(get_resolution(np.array([cell], dtype=np.int64))[0])


def parent_of(cell: int, target_res: int) -> int:
    return int(cell_to_parent(np.array([cell], dtype=np.int64), target_res)[0])


def origin_of(cell: int) -> int:
    """Top 6 bits: quintant id (res ≥ 1) / face id (res 0)."""
    return int(np.array([cell], dtype=np.int64).view(np.uint64)[0] >> _U58)


def encode_components(origin: int, s: int, res: int) -> int:
    """Serialize (origin quintant 0-59, Hilbert index S, res) → signed i64."""
    if res == 0:
        u = (np.uint64(origin) << _U58) | (_U1 << np.uint64(57))
    else:
        p = np.uint64(59 - 2 * res)
        u = (np.uint64(origin) << _U58) | (np.uint64(s) << (p + _U1)) | (_U1 << p)
    return int(np.array([u], dtype=np.uint64).view(np.int64)[0])


def decode_components(cell: int) -> tuple:
    """(origin, S, res) from a cell id."""
    u = np.array([cell], dtype=np.int64).view(np.uint64)[0]
    res = res_of(cell)
    origin = int(u >> _U58)
    if res == 0:
        return origin, 0, 0
    p = 59 - 2 * res
    s = int((u >> np.uint64(p + 1)) & np.uint64((1 << (2 * (res - 1))) - 1))
    return origin, s, res


def is_valid_i64(cells) -> np.ndarray:
    """True where the u64 id fits in signed i64 (reference's BIGINT guard).

    NOT a structural check: ids with origin >= 32 legitimately wrap negative
    as int64 and are fully decodable — use :func:`is_valid_structural` to
    test whether a bit pattern is a well-formed A5 id at all."""
    return _as_u64(cells) <= np.uint64(0x7FFFFFFFFFFFFFFF)


def is_valid_structural(cells) -> np.ndarray:
    """True where the 64-bit pattern is a well-formed cell id: the WORLD_CELL
    id 0 (the reference's whole-world special case, CHANGELOG.md 0.2.0), or a
    marker bit at an odd position p = 59 - 2*res (res 0..29 -> p in 1..57,
    with res 0/1 sharing p = 57), zeros below it, and origin <= 59.

    This is the guard decode UDFs use to NULL out garbage input instead of
    decoding a different cell (corrupted low bits move the marker to an even
    position about half the time, so float64-translation damage on res >= 25
    ids is caught here too)."""
    u = _as_u64(cells)
    low = u & (~u + np.uint64(1))  # lowest set bit (0 when u == 0)
    # powers of two are exact in float64, so log2 gives the exact position
    with np.errstate(divide="ignore"):
        p = np.where(low == 0, 64, np.log2(low.astype(np.float64))).astype(np.int64)
    origin = (u >> np.uint64(58)).astype(np.int64)
    return (u == 0) | ((p % 2 == 1) & (p <= 57) & (origin <= 59))
