"""Vectorized quadtree cell algebra.

A cell key is an int64: up to 28 base-4 digits (bit pairs, MSB-first starting
at bit 61) plus the depth in the low 5 bits; -1 is the Null cell.  Semantics
follow the reference engine (see /root/reference/quadtree/quadtree.go:17-40
for the layout, :44-113 for buffered cell calculation, :115-293 for codecs,
:206-241 for Round/Common, and /root/reference/quadtree/bbox.go:12-21 for the
fixed-point coordinate rules).  All functions here are NumPy-vectorized over
arrays of cells/coordinates — they are the kernels used inside Arrow-batched
pandas UDFs; there is intentionally no per-row Python anywhere.

Coordinates are fixed-point int64 units of 1e-7 degrees.
"""

from __future__ import annotations

import numpy as np

NULL_QT = np.int64(-1)
MAX_LON = 1_800_000_000
MAX_LAT = MAX_LON // 2
MIN_LON = -MAX_LON
MIN_LAT = -MAX_LAT

_DEPTH_MASK = np.int64(31)


def to_float(i):
    """Fixed-point int64 (1e-7 deg) -> float64 degrees (bbox.go:12-14)."""
    return np.asarray(i, dtype=np.int64) * 0.0000001


def to_int(f):
    """float64 degrees -> fixed-point int64, round half away from zero
    (bbox.go:16-21)."""
    f = np.asarray(f, dtype=np.float64)
    scaled = f * 10000000.0
    return np.where(f < 0, (scaled - 0.5), (scaled + 0.5)).astype(np.int64)


def merc(y):
    """Normalized spherical-mercator y in 'degree' units (quadtree.go:295-297)."""
    y = np.asarray(y, dtype=np.float64)
    return np.log(np.tan(np.pi * (1.0 + y / 90.0) / 4.0)) * 90.0 / np.pi


def un_merc(d):
    """Inverse of merc (quadtree.go:299-301)."""
    d = np.asarray(d, dtype=np.float64)
    return (np.arctan(np.exp(d * np.pi / 90.0)) * 4.0 / np.pi - 1.0) * 90.0


def _find_quad(mx, my, Mx, My, bf):
    """Vectorized quadrant choice with overhang buffer.

    Preserves the ordered elif-chain semantics of the reference's findQuad
    (quadtree.go:62-86): hard sign tests first, then buffered "mostly in this
    quadrant" tests; -1 when the box exceeds the buffered world or no branch
    matches.
    """
    oob = (mx < (-1 - bf)) | (my < (-1 - bf)) | (Mx > (1 + bf)) | (My > (1 + bf))
    aMx, amx = np.abs(Mx), np.abs(mx)
    aMy, amy = np.abs(My), np.abs(my)
    west = (Mx < bf) & (aMx < amx)
    east = (mx > -bf) & (aMx >= amx)
    north = (my > -bf) & (aMy >= amy)
    south = (My < bf) & (aMy < amy)
    conds = [
        oob,
        (Mx <= 0) & (my >= 0),
        (mx >= 0) & (my >= 0),
        (Mx <= 0) & (My <= 0),
        (mx >= 0) & (My <= 0),
        west & north,
        east & north,
        west & south,
        east & south,
    ]
    choices = [-1, 0, 1, 2, 3, 0, 1, 2, 3]
    return np.select(conds, choices, default=-1).astype(np.int64)


def calculate_cells(minx, miny, maxx, maxy, buffer=0.05, max_level=18):
    """Smallest cell (depth <= max_level) containing each bbox, allowing a
    relative overhang `buffer` — the engine's golden function.

    Vectorized equivalent of the reference's Calculate/makeQuadTreeFloat/
    makeQuadTree_ recursion (quadtree.go:44-113, :246-251): the recursion over
    levels becomes a loop of `max_level` iterations over whole arrays; each
    iteration picks a quadrant per row, accumulates the digit and depth, and
    rescales coordinates by x2 around the chosen quadrant midpoint.

    Inputs are fixed-point int64 arrays; invalid boxes (min > max) yield -1.
    """
    minx = np.asarray(minx, dtype=np.int64)
    miny = np.asarray(miny, dtype=np.int64)
    maxx = np.asarray(maxx, dtype=np.int64)
    maxy = np.asarray(maxy, dtype=np.int64)

    mx = to_float(minx)
    my = to_float(miny)
    Mx = to_float(maxx)
    My = to_float(maxy)

    invalid = (mx > Mx) | (my > My)
    # degenerate boxes get a 1e-7-degree nudge (quadtree.go:48-53)
    Mx = np.where(Mx == mx, Mx + 0.0000001, Mx)
    My = np.where(My == my, My + 0.0000001, My)

    my_n = merc(my) / 90.0
    My_n = merc(My) / 90.0
    mx_n = mx / 180.0
    Mx_n = Mx / 180.0

    result = np.zeros(mx_n.shape, dtype=np.int64)
    active = ~invalid
    for cl in range(int(max_level)):
        if not active.any():
            break
        q = _find_quad(mx_n, my_n, Mx_n, My_n, buffer)
        step = active & (q >= 0)
        result = np.where(
            step, result + (q << np.int64(61 - 2 * cl)) + 1, result
        )
        active = step
        xs = np.where((q == 0) | (q == 2), 0.5, -0.5)
        ys = np.where((q == 2) | (q == 3), 0.5, -0.5)
        mx_n = (mx_n + xs) * 2.0
        Mx_n = (Mx_n + xs) * 2.0
        my_n = (my_n + ys) * 2.0
        My_n = (My_n + ys) * 2.0

    return np.where(invalid, NULL_QT, result)


def point_cells_closed_form(lon, lat, max_level=18):
    """Depth-`max_level` cell for point coordinates in closed form — the
    native fast path (no recursion): x/y tile indices by flooring the
    normalized coordinates, then bit-interleave.

    Equals calculate_cells(lon, lat, lon, lat) (which nudges the box by one
    fixed-point unit) for every point whose 1e-7-degree box does not straddle
    a depth-`max_level` cell edge; the equivalence is property-tested against
    the recursive form.  Mirrors the layout rules of quadtree.go:17-38 and the
    tie direction of findQuad (ties go east / north).
    """
    lon = np.asarray(lon, dtype=np.int64)
    lat = np.asarray(lat, dtype=np.int64)
    n = np.int64(1) << np.int64(max_level)
    x_norm = (to_float(lon) / 180.0 + 1.0) / 2.0
    y_norm = (merc(to_float(lat)) / 90.0 + 1.0) / 2.0
    xt = np.clip(np.floor(x_norm * n).astype(np.int64), 0, n - 1)
    yb = np.clip(np.floor(y_norm * n).astype(np.int64), 0, n - 1)
    ys = (n - 1) - yb  # slippy y (top-down), cf. Tuple() quadtree.go:181-203
    return _interleave(xt, ys, max_level)


def _spread_bits(v):
    """Spread the low 29 bits of v so bit i lands at bit 2i (Morton spread)."""
    v = np.asarray(v).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _interleave(xt, ys, level):
    """(x, slippy-y, z) -> cell key, vectorized FromTuple
    (quadtree.go:253-268): digit_i = xbit_i | ybit_i<<1 reading bits MSB-first,
    path left-aligned at bit 61, depth in the low 5 bits."""
    xt = np.asarray(xt, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    interleaved = _spread_bits(xt) | (_spread_bits(ys) << np.uint64(1))
    path = (interleaved.astype(np.int64)) << np.int64(63 - 2 * int(level))
    return path | np.int64(level)


def cells_to_tuples(cells):
    """cell -> (x, y, z) slippy tile coords (quadtree.go:181-203);
    Null -> (-1,-1,-1)."""
    cells = np.asarray(cells, dtype=np.int64)
    z = cells & _DEPTH_MASK
    # Path bits MSB-first: extract 28 interleaved pairs then shift down.
    path = (cells >> np.int64(5)).astype(np.uint64) & np.uint64(
        0x03FFFFFFFFFFFFFF
    )
    # bring digit 0 (bits 61-62 of the key; 56-57 after >>5) to the top pairs
    full_x = _compact_bits(path)
    full_y = _compact_bits(path >> np.uint64(1))
    # full_* hold 29 bits of x/y built from bit pairs of the 58-bit path;
    # the first z digits occupy the top, so shift down by (29 - z).
    zc = np.minimum(z, np.int64(29)).astype(np.uint64)
    x = (full_x >> (np.uint64(29) - zc)).astype(np.int64)
    y = (full_y >> (np.uint64(29) - zc)).astype(np.int64)
    null = cells == NULL_QT
    return (
        np.where(null, -1, x),
        np.where(null, -1, y),
        np.where(null, -1, z),
    )


def _compact_bits(v):
    """Inverse of _spread_bits: gather even bits of v (uint64) into low bits."""
    v = v & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def tuples_to_cells(x, y, z):
    """(x, y, z) -> cell key; (-1,-1,-1) -> Null (quadtree.go:253-268)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    z = np.asarray(z, dtype=np.int64)
    null = (x == -1) & (y == -1) & (z == -1)
    # left-align the z-bit coords into 29-bit fields, then interleave
    xs = (x << (np.int64(29) - z)).astype(np.int64)
    ys = (y << (np.int64(29) - z)).astype(np.int64)
    inter = (_spread_bits(xs) | (_spread_bits(ys) << np.uint64(1))).astype(
        np.int64
    )
    key = (inter << np.int64(5)) | z
    return np.where(null, NULL_QT, key)


def cells_to_strings(cells):
    """cell -> 'ABCD…' string per digit, 'NULL' for <=Null
    (quadtree.go:115-137). Returns an object-dtype array."""
    cells = np.asarray(cells, dtype=np.int64)
    depth = (cells & _DEPTH_MASK).astype(np.int64)
    out = np.empty(cells.shape, dtype=object)
    letters = np.array(["A", "B", "C", "D"])
    digits = np.stack(
        [((cells >> np.int64(61 - 2 * i)) & 3) for i in range(28)], axis=-1
    )
    for idx in np.ndindex(cells.shape):
        if cells[idx] <= NULL_QT:
            out[idx] = "NULL"
        else:
            d = int(depth[idx])
            out[idx] = "".join(letters[digits[idx][:d]])
    return out


def strings_to_cells(strings):
    """'ABCD…' -> cell key (quadtree.go:270-293)."""
    vals = []
    lut = {"A": 0, "B": 1, "C": 2, "D": 3}
    for s in np.asarray(strings, dtype=object).ravel():
        ans = 0
        for i, ch in enumerate(s):
            ans |= lut[ch] << (61 - 2 * i)
        vals.append(ans | len(s))
    return np.array(vals, dtype=np.int64).reshape(np.shape(strings))


def round_cells(cells, level):
    """Parent cell at `level`; cells already shallower pass through
    (quadtree.go:206-213)."""
    cells = np.asarray(cells, dtype=np.int64)
    level = np.asarray(level, dtype=np.int64)
    depth = cells & _DEPTH_MASK
    shift = (np.int64(63) - 2 * level).astype(np.int64)
    rounded = ((cells >> shift) << shift) + level
    return np.where(depth < level, cells, rounded)


def common_cells(a, b):
    """Largest cell that is an ancestor of both a and b, Null as identity
    (quadtree.go:216-241).  Closed form instead of the reference's loop:
    shared-prefix length = first differing digit of the two paths (via XOR
    bit-length), clamped by the shallower depth."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    pa = a & ~_DEPTH_MASK
    pb = b & ~_DEPTH_MASK
    da = a & _DEPTH_MASK
    db = b & _DEPTH_MASK
    x = (pa ^ pb).astype(np.uint64)
    bitlen = np.zeros(x.shape, dtype=np.int64)
    xx = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = xx >= (np.uint64(1) << np.uint64(s))
        bitlen = np.where(big, bitlen + s, bitlen)
        xx = np.where(big, xx >> np.uint64(s), xx)
    bitlen = np.where(x > 0, bitlen + 1, 0)
    first_diff = np.where(x > 0, (63 - bitlen) >> 1, 31)
    s_len = np.minimum(first_diff, np.minimum(da, db))
    res = round_cells(pa | da, s_len)
    res = np.where(a == NULL_QT, b, res)
    res = np.where(b == NULL_QT, np.where(a == NULL_QT, NULL_QT, a), res)
    return res


def common_reduce(min_key, max_key, min_depth):
    """Distributed Common over a set of cells from three native aggregates:
    min(key), max(key), min(depth).  Valid because numeric key order equals
    lexicographic digit order (paths are left-aligned), so the (min, max)
    pair realizes the shortest shared prefix; depth is clamped by the global
    minimum (SURVEY.md §7.4).  This is the finishing expression — the same
    bit math ships as a native Spark Column in functions/cells.py.

    Null-identity guard: negative keys (Null cells that a call site failed
    to pre-filter) propagate NULL_QT instead of producing an out-of-range
    shift — mirrors Common's Null semantics (quadtree.go:216-221)."""
    min_key = np.asarray(min_key, dtype=np.int64)
    max_key = np.asarray(max_key, dtype=np.int64)
    min_depth = np.asarray(min_depth, dtype=np.int64)
    invalid = (min_key < 0) | (max_key < 0) | (min_depth < 0)
    pa = np.where(invalid, np.int64(0), min_key) & ~_DEPTH_MASK
    pb = np.where(invalid, np.int64(0), max_key) & ~_DEPTH_MASK
    x = (pa ^ pb).astype(np.uint64)
    bitlen = np.zeros(x.shape, dtype=np.int64)
    xx = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = xx >= (np.uint64(1) << np.uint64(s))
        bitlen = np.where(big, bitlen + s, bitlen)
        xx = np.where(big, xx >> np.uint64(s), xx)
    bitlen = np.where(x > 0, bitlen + 1, 0)
    first_diff = np.where(x > 0, (63 - bitlen) >> 1, 31)
    s_len = np.minimum(first_diff, np.where(invalid, np.int64(0), min_depth))
    shift = (np.int64(63) - 2 * s_len).astype(np.int64)
    return np.where(invalid, NULL_QT, ((pa >> shift) << shift) + s_len)


def cover_cells(qminx, qminy, qmaxx, qmaxy, level, buffer=0.05):
    """Cells (ALL depths <= `level`) whose buffered bounds intersect the
    query box — the cover-expansion that turns a bbox query into an
    equi-joinable prefix set (the tile-prune of packeddatastore.go:382-425
    re-expressed for a cell-keyed table).

    Exactness: a geometry's bbox is contained in the buffered bounds of its
    calculated cell, buffered bounds are monotone under rounding to an
    ancestor, and the BFS prune is monotone too — so every geometry whose
    bbox intersects the query has its cell_round(cell, level) key in this
    set, and the residual bbox test restores exact semantics.  The root is
    always emitted (any valid box intersects the buffered world), which
    also catches null/zero cells rounded up to 0.

    Driver-side, O(cells intersecting the box perimeter) per level — a few
    hundred keys for typical serving boxes at level 8.
    """
    out = []
    frontier = np.array([0], dtype=np.int64)  # root
    for d in range(int(level) + 1):
        if frontier.size == 0:
            break
        bx = cell_bounds(frontier, buffer)
        hit = ~(
            (bx[0] > qmaxx) | (bx[1] > qmaxy)
            | (bx[2] < qminx) | (bx[3] < qminy)
        )
        live = frontier[hit]
        out.append(live)
        if d == level:
            break
        paths = live & ~_DEPTH_MASK
        children = (
            paths[:, None]
            + (np.arange(4, dtype=np.int64)[None, :] << np.int64(61 - 2 * d))
            + np.int64(d + 1)
        ).reshape(-1)
        frontier = children
    return np.concatenate(out) if out else np.array([], dtype=np.int64)


def cell_bounds(cells, buffer=0.0):
    """cell -> fixed-point bbox, optionally expanded by a relative buffer
    (quadtree.go:139-177).  Returns (minx, miny, maxx, maxy) int64 arrays."""
    cells = np.asarray(cells, dtype=np.int64)
    depth = (cells & _DEPTH_MASK).astype(np.int64)
    mx = np.full(cells.shape, -180.0)
    my = np.full(cells.shape, -90.0)
    Mx = np.full(cells.shape, 180.0)
    My = np.full(cells.shape, 90.0)
    for i in range(28):
        live = depth > i
        v = (cells >> np.int64(61 - 2 * i)) & 3
        half_x = (Mx - mx) / 2.0
        half_y = (My - my) / 2.0
        Mx = np.where(live & ((v == 0) | (v == 2)), Mx - half_x, Mx)
        mx = np.where(live & ((v == 1) | (v == 3)), mx + half_x, mx)
        My = np.where(live & ((v == 2) | (v == 3)), My - half_y, My)
        my = np.where(live & ((v == 0) | (v == 1)), my + half_y, my)
    my = un_merc(my)
    My = un_merc(My)
    if buffer > 0.0:
        xx = (Mx - mx) * buffer
        yy = (My - my) * buffer
        mx = mx - xx
        my = my - yy
        Mx = Mx + xx
        My = My + yy
    return to_int(mx), to_int(my), to_int(Mx), to_int(My)
