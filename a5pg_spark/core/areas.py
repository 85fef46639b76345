"""Cell counts and areas — mirrors ``a5_cell_area`` / ``a5_get_num_cells`` /
``a5_get_res0_cells`` (``/root/reference/src/lib.rs:152-186``).

num_cells: 12 dodecahedron faces at res 0, 60 quintants at res 1, ×4 per
level after (the 4^Δ children law, ``src/lib.rs:385-393``).  Cells are exactly
equal-area by construction (projection.py), so area(res) is a constant.
"""

from __future__ import annotations

import numpy as np

# authalic (equal-area) Earth radius, WGS84 — public constant
EARTH_RADIUS_M = 6371007.1809184747
EARTH_AREA_M2 = 4.0 * np.pi * EARTH_RADIUS_M ** 2

MAX_RES = 29


def num_cells(res: int) -> int:
    if res == 0:
        return 12
    return 60 << (2 * (res - 1))


def cell_area(res: int) -> float:
    """Area in m² of any cell at ``res`` (equal-area ⇒ constant per res)."""
    return EARTH_AREA_M2 / num_cells(res)


NUM_CELLS_TABLE = [num_cells(r) for r in range(MAX_RES + 1)]
CELL_AREA_TABLE = [cell_area(r) for r in range(MAX_RES + 1)]


def res0_cells() -> np.ndarray:
    """The 12 base cells: face << 58 | 1 << 57 (world cell golden
    0x0e00000000000000 = face 3, ``expected/hex_functions.out:40``)."""
    faces = np.arange(12, dtype=np.uint64)
    return ((faces << np.uint64(58)) | np.uint64(1 << 57)).view(np.int64)
