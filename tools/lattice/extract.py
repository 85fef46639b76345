"""Extract the lattice ground truth table from the elephant corpus.

Reuses the reconstruct.py pipeline (same math) but dumps a JSON file:
  tools/lattice/groundtruth.json
    parts: {part: {"S": [int...], "cells": [[i,j,c]...]}}   (sets, unordered)
    anchors: exact S<->cell pairs (the two single-cell eye parts)
    shapes: per-class pentagon vertices in lattice coords (5x2 lists)

Run:  python3 tools/lattice/extract.py
"""
from __future__ import annotations

import csv
import json
import sys

import numpy as np

sys.path.insert(0, ".")
from a5pg_spark.core import bits  # noqa: E402
from a5pg_spark.core.dodecahedron import FACE_ROT  # noqa: E402
from a5pg_spark.core.projection import lonlat_to_xyz, nearest_face  # noqa: E402

from reconstruct_lib import build_lattice  # noqa: E402

GEOJSON = "/root/reference/tests/elephant_cells_union_per_part.geojson"
CSV = "/root/reference/tests/elephant_cells.csv"


def main():
    lat = build_lattice()
    pents, V = lat["pents"], lat["shapes"]
    ids = {}
    for row in csv.DictReader(open(CSV)):
        ids.setdefault(row["part"], []).append(int(row["cell_id"]))
    out = {"parts": {}, "anchors": [], "shapes": {c: V[c].tolist() for c in V}}
    for p, cells in pents.items():
        svals = sorted(bits.decode_components(c)[1] for c in ids[p])
        out["parts"][p] = {"S": svals, "cells": sorted(cells)}
        if len(cells) == 1:
            out["anchors"].append({"part": p, "S": svals[0], "cell": list(cells[0])})
    json.dump(out, open("tools/lattice/groundtruth.json", "w"), indent=1)
    n = sum(len(v["cells"]) for v in out["parts"].values())
    print(f"wrote groundtruth.json: {n} cells, anchors={out['anchors']}")


if __name__ == "__main__":
    main()
