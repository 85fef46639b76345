"""Trace the A5 space-filling-curve polyline from reference/docs/a5-visuals.png.

The bottom-left panel renders the curve through one quintant triangle,
color-graded along the curve parameter. Tracing the stroke in order
recovers the full S -> anchor mapping for a quintant at the rendered depth.
"""
import sys
import numpy as np

sys.path.insert(0, "/root/repo/tools/curve")
from imgio import write_png, zoom  # noqa: E402

RGBA = np.load("/root/repo/tools/curve/visuals.npy")
BL = RGBA[471:942, 0:472, :3].astype(np.int32)
BG = np.array([17, 17, 17])


def curve_mask(thresh=90):
    return np.abs(BL - BG).sum(axis=2) > thresh


def neighbors8(y, x, h, w):
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            yy, xx = y + dy, x + dx
            if 0 <= yy < h and 0 <= xx < w:
                yield yy, xx


def skeletonize(mask):
    """Zhang-Suen thinning, vectorized."""
    img = mask.copy()

    def nb(img):
        p = [np.roll(np.roll(img, dy, 0), dx, 1) for dy, dx in
             [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]]
        return p  # P2..P9 clockwise from north

    while True:
        changed = False
        for step in (0, 1):
            p = nb(img)
            B = sum(x.astype(np.int8) for x in p)
            A = sum(((~p[i]) & p[(i + 1) % 8]).astype(np.int8) for i in range(8))
            if step == 0:
                cond = (p[0] & p[2] & p[4]) == 0
                cond2 = (p[2] & p[4] & p[6]) == 0
            else:
                cond = (p[0] & p[2] & p[6]) == 0
                cond2 = (p[0] & p[4] & p[6]) == 0
            kill = img & (B >= 2) & (B <= 6) & (A == 1) & cond & cond2
            if kill.any():
                img = img & ~kill
                changed = True
        if not changed:
            return img


def main():
    mask = curve_mask()
    print("mask px:", mask.sum())
    sk = skeletonize(mask)
    print("skeleton px:", sk.sum())
    h, w = sk.shape
    ys, xs = np.nonzero(sk)
    deg = np.zeros_like(sk, dtype=np.int8)
    for y, x in zip(ys, xs):
        deg[y, x] = sum(sk[yy, xx] for yy, xx in neighbors8(y, x, h, w))
    ends = [(y, x) for y, x in zip(ys, xs) if deg[y, x] == 1]
    junc = [(y, x) for y, x in zip(ys, xs) if deg[y, x] >= 3]
    print("endpoints:", len(ends), ends[:10])
    print("junction px:", len(junc))
    # connected components
    comp = np.full(sk.shape, -1, dtype=np.int32)
    nc = 0
    for y, x in zip(ys, xs):
        if comp[y, x] >= 0:
            continue
        stack = [(y, x)]
        comp[y, x] = nc
        size = 0
        while stack:
            cy, cx = stack.pop()
            size += 1
            for yy, xx in neighbors8(cy, cx, h, w):
                if sk[yy, xx] and comp[yy, xx] < 0:
                    comp[yy, xx] = nc
                    stack.append((yy, xx))
        print(f"component {nc}: {size} px")
        nc += 1
    np.save("/root/repo/tools/curve/skel.npy", sk)
    np.save("/root/repo/tools/curve/comp.npy", comp)
    # endpoint colors
    for y, x in ends[:20]:
        print("end", (y, x), "color", BL[y, x])


if __name__ == "__main__":
    main()
