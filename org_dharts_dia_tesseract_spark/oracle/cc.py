"""Connected-component labeling: two-pass union-find over row run-lengths.

Rebuilds the native CC stage (inside the DLL in the reference; the wrapper
only sees its results through box queries). Pure numpy + a small union-find;
runs are extracted vectorized per row, merges happen between adjacent rows'
overlapping runs (4-connectivity extended to 8 by 1px dilation of overlap
test).
"""

from __future__ import annotations

import numpy as np


class _UF:
    __slots__ = ("parent",)

    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, x: int) -> int:
        p = self.parent
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def _row_runs(row: np.ndarray) -> list[tuple[int, int]]:
    """[(start, end)] half-open ink runs of one row."""
    d = np.diff(np.concatenate([[0], row.astype(np.int8), [0]]))
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return list(zip(starts.tolist(), ends.tolist()))


def connected_components(ink: np.ndarray) -> list[dict]:
    """{0,1} ink map -> list of components.

    Each: {'left','top','right','bottom' (half-open box), 'area',
           'bottom_xs','bottom_ys' (per-column lowest ink pixel)}.
    8-connectivity. Deterministic order: sorted by (top, left).
    """
    h, w = ink.shape
    runs: list[tuple[int, int, int]] = []   # (row, start, end)
    row_index: list[list[int]] = []
    for y in range(h):
        rr = _row_runs(ink[y])
        idxs = []
        for s, e in rr:
            idxs.append(len(runs))
            runs.append((y, s, e))
        row_index.append(idxs)
    uf = _UF(len(runs))
    for y in range(1, h):
        for i in row_index[y]:
            _, s, e = runs[i]
            for j in row_index[y - 1]:
                _, ps, pe = runs[j]
                # 8-connectivity: allow diagonal touch (overlap of widened run)
                if s < pe + 1 and ps < e + 1:
                    uf.union(i, j)
    groups: dict[int, list[int]] = {}
    for i in range(len(runs)):
        groups.setdefault(uf.find(i), []).append(i)
    comps = []
    for members in groups.values():
        ys = [runs[i][0] for i in members]
        ls = [runs[i][1] for i in members]
        rs = [runs[i][2] for i in members]
        left, right = min(ls), max(rs)
        top, bottom = min(ys), max(ys) + 1
        area = sum(runs[i][2] - runs[i][1] for i in members)
        # lowest ink pixel per column, for baseline least-squares fit
        bottom_y: dict[int, int] = {}
        for i in members:
            y, s, e = runs[i]
            for x in range(s, e):
                if x not in bottom_y or y > bottom_y[x]:
                    bottom_y[x] = y
        xs = sorted(bottom_y)
        comps.append({
            "left": int(left), "top": int(top),
            "right": int(right), "bottom": int(bottom),
            "area": int(area),
            "bottom_xs": np.array(xs, dtype=np.int32),
            "bottom_ys": np.array([bottom_y[x] for x in xs], dtype=np.int32),
        })
    comps.sort(key=lambda c: (c["top"], c["left"]))
    return comps


def fit_baseline(ink: np.ndarray, box: tuple[int, int, int, int]) -> tuple[int, int, int, int]:
    """Least-squares baseline through per-column lowest ink pixels of a
    region. Returns (x1, y1, x2, y2) in the same coordinate frame as
    ``box`` (LayoutIterator.java:371-391: segment endpoints; y grows down).

    Falls back to the bottom edge when the region has no ink.
    """
    l, t, r, b = box
    sub = ink[t:b, l:r]
    if sub.sum() == 0:
        return (l, b, r, b)
    hs, ws = sub.shape
    cols = sub.any(axis=0).nonzero()[0]
    # lowest ink row per inked column: flip rows, argmax of first ink
    lowest = hs - 1 - np.argmax(sub[::-1, cols], axis=0)
    xs = cols.astype(np.float64)
    ys = lowest.astype(np.float64)
    if len(xs) < 2 or xs[-1] == xs[0]:
        # cols ascend, so ptp == last-first; sums of integer-valued f8
        # are exact, so sum/len is the bit-exact mean
        y = int(round(ys.sum() / len(ys))) + t + 1
        return (l, y, r, y)
    # closed-form least squares (polyfit/lstsq are ~10x slower per call)
    mx, my = xs.sum() / len(xs), ys.sum() / len(ys)
    dxs = xs - mx
    slope = float((dxs * (ys - my)).sum() / (dxs * dxs).sum())
    intercept = my - slope * mx
    y1 = int(round(intercept)) + t + 1
    y2 = int(round(slope * (ws - 1) + intercept)) + t + 1
    return (l, y1, r, y2)
