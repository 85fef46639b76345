"""Bit-layer golden + law tests (reference: tests/pg_regress/sql/hierarchy.sql,
duckdb_examples.sql; expected/*.out)."""

import numpy as np
import pytest

from a5pg_spark.core import areas, bits

NYC10 = 2742822465196523520
NYC15 = 2742821848331845632
NYC15_PARENT10 = 2742821365684895744
CHILDREN11 = [
    2742820953368035328,
    2742821228245942272,
    2742821503123849216,
    2742821778001756160,
]
WORLD0 = 0x0E00000000000000


class TestGoldens:
    def test_resolution(self):
        # expected/duckdb_examples.out:6 and basic.out
        assert bits.res_of(NYC10) == 10
        assert bits.res_of(NYC15) == 15
        assert bits.res_of(207618739568) == 27

    def test_parent(self):
        # expected/duckdb_examples.out:3,7
        assert bits.parent_of(NYC15, 10) == NYC15_PARENT10
        assert bits.parent_of(207618739568, 10) == 549755813888

    def test_children(self):
        # expected/duckdb_examples.out:4
        kids = bits.cell_to_children(NYC15_PARENT10, 11)
        assert list(kids) == CHILDREN11

    def test_children_count_law(self):
        # 4^Δ law, src/lib.rs:385-393 / hierarchy.sql:17-28
        assert len(bits.cell_to_children(NYC10, 12)) == 16

    def test_world_cell_encoding(self):
        # expected/hex_functions.out:40 — face 3 at res 0
        assert bits.encode_components(3, 0, 0) == WORLD0

    def test_origin_field(self):
        assert bits.origin_of(NYC10) == 9
        assert bits.origin_of(7161033366718906368) == 24  # London
        tokyo = np.array([0x872F8A8000000000], dtype=np.uint64).view(np.int64)[0]
        assert bits.origin_of(int(tokyo)) == 33
        assert not bits.is_valid_i64(np.array([tokyo]))[0]

    def test_structural_validity(self):
        # every well-formed id is structurally valid, INCLUDING the i64-
        # overflowing Tokyo id (origin 33 wraps negative — still decodable)
        tokyo = np.array([0x872F8A8000000000], dtype=np.uint64).view(np.int64)[0]
        # id 0 is the reference's WORLD_CELL special case (CHANGELOG 0.2.0):
        # structurally valid, decodes to (0, 0) — NOT garbage
        ok = bits.is_valid_structural(
            np.array([NYC10, WORLD0, tokyo, bits.WORLD_CELL], dtype=np.int64))
        assert ok.all()
        # garbage: even marker position, origin > 59, no marker
        bad = np.array([NYC10 & ~(1 << 39) | (1 << 38),
                        -1 << 62 | (1 << 57) | (1 << 58) | (3 << 60), 1 << 58],
                       dtype=np.int64)
        assert not bits.is_valid_structural(bad).any()
        # res 0..29: encode_components output is always structurally valid
        rng = np.random.default_rng(3)
        for res in (0, 1, 5, 25, 29):
            origin = int(rng.integers(12 if res else 0, 60 if res else 12))
            s = int(rng.integers(0, 1 << (2 * max(res - 1, 0))))
            cid = bits.encode_components(origin, s, res)
            assert bits.is_valid_structural(np.array([cid], dtype=np.int64))[0]


class TestLaws:
    @pytest.mark.parametrize("res", [1, 2, 5, 8, 10, 15, 27, 29])
    def test_roundtrip_components(self, res):
        rng = np.random.default_rng(res)
        for _ in range(20):
            # at res 1, origins 0-11 alias res-0 face cells (DESIGN.md §3)
            origin = int(rng.integers(12 if res == 1 else 0, 60))
            s = int(rng.integers(0, 1 << (2 * (res - 1)))) if res > 1 else 0
            c = bits.encode_components(origin, s, res)
            assert bits.decode_components(c) == (origin, s, res)
            assert bits.res_of(c) == res

    @pytest.mark.parametrize("res,target", [(10, 8), (15, 10), (12, 5), (29, 1)])
    def test_parent_resolution(self, res, target):
        # origin ≥ 12 so the res-1 target stays unambiguous (DESIGN.md §3)
        c = bits.encode_components(17, (1 << (2 * (res - 1))) - 1, res)
        p = bits.parent_of(c, target)
        assert bits.res_of(p) == target
        assert bits.cell_contains(np.array([p]), np.array([c]))[0]

    def test_parent_of_child_is_cell(self):
        for child in bits.cell_to_children(NYC10, 12):
            assert bits.parent_of(int(child), 10) == NYC10

    def test_children_disjoint_cover(self):
        kids = bits.cell_to_children(NYC10, 13)
        assert len(set(kids.tolist())) == 64
        assert all(bits.res_of(int(k)) == 13 for k in kids)

    def test_compact_uncompact_identity(self):
        u = bits.uncompact([NYC15_PARENT10], 12)
        assert len(u) == 16
        c = bits.compact(u)
        assert list(c) == [NYC15_PARENT10]

    def test_compact_partial_group(self):
        u = list(bits.uncompact([NYC10], 12))
        u.pop(7)  # incomplete sibling group survives
        c = bits.compact(np.array(u, dtype=np.int64))
        assert NYC10 not in set(c.tolist())
        assert len(c) > 1

    def test_compact_res2_alias_group_survives(self):
        # A complete res-2 sibling group on face 0 quintant 0 whose res-1
        # parent id aliases the res-0 face id (DESIGN.md §3): compact() must
        # leave the group as-is instead of crashing on the unrepresentable
        # parent (round-3 ADVICE regression).
        kids = np.array(
            [bits.encode_components(0, s, 2) for s in range(4)], dtype=np.int64
        )
        p = bits.parent_of(int(kids[0]), 1)
        assert bits.res_of(p) == 0  # confirms the alias precondition
        out = bits.compact(kids)
        assert sorted(out.tolist()) == sorted(kids.tolist())

    def test_res0_to_1_is_five_children(self):
        w = bits.encode_components(3, 0, 0)
        kids = bits.cell_to_children(w, 1)
        assert len(kids) == 5
        assert [bits.origin_of(int(k)) for k in kids] == [15, 16, 17, 18, 19]

    def test_parent_to_res0_maps_quintant_to_face(self):
        c = bits.encode_components(19, 123, 7)  # face 3, quintant 4
        assert bits.parent_of(c, 0) == bits.encode_components(3, 0, 0)

    def test_contains_reflexive_antisymmetric(self):
        a = np.array([NYC10]); d = np.array([NYC15])
        # NYC15 is NOT under NYC10 (different res-10 parent) but is under NYC15_PARENT10
        assert bits.cell_contains(np.array([NYC15_PARENT10]), d)[0]
        assert not bits.cell_contains(d, np.array([NYC15_PARENT10]))[0]
        assert bits.cell_contains(a, a)[0]


class TestAreas:
    def test_num_cells(self):
        assert areas.num_cells(0) == 12
        assert areas.num_cells(1) == 60
        assert areas.num_cells(2) == 240
        assert areas.num_cells(29) == 60 * 4 ** 28

    def test_area_times_count_is_earth(self):
        for r in [0, 1, 5, 29]:
            assert areas.cell_area(r) * areas.num_cells(r) == pytest.approx(
                areas.EARTH_AREA_M2, rel=1e-12
            )

    def test_res0_cells(self):
        cs = areas.res0_cells()
        assert len(cs) == 12
        assert WORLD0 in set(int(c) for c in cs)


class TestRound2Fixes:
    """Regression tests for the round-1 ADVICE items."""

    def test_parent_at_own_res0_is_identity(self):
        # a res-0 cell's origin field is the FACE id; parent(cell, 0) must not
        # divide it by 5 (face 3 -> face 0 was the round-1 bug)
        for face in range(12):
            c = bits.encode_components(face, 0, 0)
            assert bits.parent_of(c, 0) == c

    def test_res0_contains_self(self):
        for face in range(12):
            c = np.array([bits.encode_components(face, 0, 0)])
            assert bits.cell_contains(c, c)[0]

    def test_res1_children_of_low_faces_refused(self):
        import pytest
        for face in (0, 1, 2):
            c = bits.encode_components(face, 0, 0)
            with pytest.raises(ValueError, match="unrepresentable"):
                bits.cell_to_children(c, 1)
        # faces >= 3 are fine (quintants 15+)
        kids = bits.cell_to_children(bits.encode_components(3, 0, 0), 1)
        assert len(kids) == 5

    def test_deep_res_ids_survive_int64_exactly(self):
        # ids with > 53 significant bits must not pass through float64
        from a5pg_spark.core import cells as C
        c28 = C.lonlat_to_cell(
            np.array([-73.9857]), np.array([40.758]), np.array([28])
        )[0]
        assert bits.res_of(int(c28)) == 28
        lon, lat = C.cell_to_lonlat(np.array([c28]))
        rt = C.lonlat_to_cell(lon, lat, np.array([28]))[0]
        assert int(rt) == int(c28)
