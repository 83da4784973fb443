"""Ring algebra for geometry construction — pure Python/NumPy, no Spark.

These functions run PER RELATION GROUP inside applyInPandas (grouped-map):
each group holds the handful of member-way rings of one relation, so the
per-group Python cost is bounded and the distribution axis is the relation
id.  Semantics ported from the reference:

  * join/merge open ways into closed rings by endpoint refs, 4 orientation
    cases, recursive on the remainder   (makegeometries.go:335-429)
  * ring validity: >=3 points and first ref == last ref (:354-362)
  * assign inner rings to containing outers via segment-intersection test
    then pnpoly on the first vertex     (:431-470, zorder.go:201-238)
  * polygon area: drop repeated points, rings <4 points rejected, outer
    minus inners, orientation fixed     (zorder.go:133-199)

A ring is a list of (ref, lon, lat) tuples (fixed-point int coords).
"""

from __future__ import annotations

import math

from .quadtree import merc as _merc_arr

EARTH_HALF_CIRCUM = 20037508.3428


def _merc_xy(lon: int, lat: int):
    x = lon * 0.0000001 * EARTH_HALF_CIRCUM / 180.0
    y = (
        math.log(math.tan(math.pi * (1.0 + lat * 0.0000001 / 90.0) / 4.0))
        * 90.0
        / math.pi
        * EARTH_HALF_CIRCUM
        / 90.0
    )
    return x, y


def check_ring(ring) -> bool:
    if len(ring) < 3:
        return False
    return ring[0][0] == ring[-1][0]


def join_rings(a, rev_a: bool, b, rev_b: bool):
    """Concatenate two open ways sharing an endpoint (joinrings,
    makegeometries.go:335-352)."""
    return _join_exact(a, rev_a, b, rev_b)


def _join_exact(a, rev_a, b, rev_b):
    # literal port: ans has len(a)+len(b)-1 slots; A fills [0, len(a)),
    # B fills [len(a)-1, ...) — B's first written slot overwrites A's last.
    n = len(a) + len(b) - 1
    ans = [None] * n
    for i, p in enumerate(a):
        j = (len(a) - 1 - i) if rev_a else i
        ans[j] = p
    for i, p in enumerate(b):
        j = (len(b) + len(a) - 2 - i) if rev_b else (len(a) - 1 + i)
        ans[j] = p
    return ans


def merge_rings(rings):
    """Join open ways into closed rings (merge_rings,
    makegeometries.go:364-429): already-closed rings pass through; one open
    chain grows by endpoint-matching; unmatched ways recurse."""
    if not rings:
        return []
    if len(rings) == 1:
        return list(rings)
    r0 = None
    a = b = None
    rem, fin = [], []
    added = False
    for r in rings:
        if r[0][0] == r[-1][0]:
            fin.append(r)
        elif r0 is None:
            r0 = list(r)
            a, b = r0[0][0], r0[-1][0]
        elif r[0][0] == a:
            r0 = _join_exact(r0, True, r, False)
            a, b = r0[0][0], r0[-1][0]
            added = True
        elif r[0][0] == b:
            r0 = _join_exact(r0, False, r, False)
            a, b = r0[0][0], r0[-1][0]
            added = True
        elif r[-1][0] == a:
            r0 = _join_exact(r0, True, r, True)
            a, b = r0[0][0], r0[-1][0]
            added = True
        elif r[-1][0] == b:
            r0 = _join_exact(r0, False, r, True)
            a, b = r0[0][0], r0[-1][0]
            added = True
        else:
            rem.append(r)
    if r0 is not None:
        if a == b or not added:
            fin.append(r0)
        else:
            rem.append(r0)
    if rem:
        fin.extend(merge_rings(rem))
    return fin


def _lines_intersect(p0, p1, p2, p3) -> bool:
    # zorder.go:225-238 (float segment intersection; division by zero for
    # parallel segments yields inf/nan -> False, as in the reference)
    s1x = float(p1[1] - p0[1])
    s1y = float(p1[2] - p0[2])
    s2x = float(p3[1] - p2[1])
    s2y = float(p3[2] - p2[2])
    qx = float(p0[1] - p2[1])
    qy = float(p0[2] - p2[2])
    den = -s2x * s1y + s1x * s2y
    if den == 0:
        return False
    s = (-s1y * qx + s1x * qy) / den
    t = (s2x * qy - s2y * qx) / den
    return 0 <= s <= 1 and 0 <= t <= 1


def _rings_intersect(lhs, rhs) -> bool:
    for i in range(len(lhs) - 1):
        for j in range(len(rhs) - 1):
            if _lines_intersect(lhs[i], lhs[i + 1], rhs[j], rhs[j + 1]):
                return True
    return False


def _pnpoly(ring, lon: int, lat: int) -> bool:
    j = len(ring) - 1
    c = False
    for i in range(len(ring)):
        if (ring[i][2] > lat) != (ring[j][2] > lat):
            tp = float(ring[j][1] - ring[i][1]) * float(lat - ring[i][2]) / float(
                ring[j][2] - ring[i][2]
            ) + float(ring[i][1])
            if float(lon) < tp:
                c = not c
        j = i
    return c


def ring_contains(outer, inner) -> bool:
    # zorder.go:201-223: containment iff no segment intersection and the
    # inner's first vertex is inside
    if _rings_intersect(outer, inner):
        return False
    return _pnpoly(outer, inner[0][1], inner[0][2])


def group_rings(outers, inners, allow_loose: bool = True):
    """Assign inner rings to containing outers (makegeometries.go:431-470).
    allow_loose drops orphan inners instead of failing."""
    if len(outers) == 1:
        return [[outers[0]] + list(inners)]
    if not inners:
        return [[o] for o in outers]
    ans = [[o] for o in outers]
    for inner in inners:
        added = False
        for grp in ans:
            if ring_contains(grp[0], inner):
                grp.append(inner)
                added = True
                # reference `continue`s the inner loop: an inner can attach
                # to MULTIPLE outers (continue, not break)
        if not added and not allow_loose:
            raise ValueError("inner ring not contained by any outer")
    return ans


def drop_repeats(ring):
    if not ring:
        return ring
    out = [ring[0]]
    for p in ring[1:]:
        if p[1] != out[-1][1] or p[2] != out[-1][2]:
            out.append(p)
    return out


def ring_area_merc(ring):
    """Signed-magnitude ring area over full-scale mercator XY with the
    reference's triangle form (zorder.go:178-199): returns (area, is_ccw)."""
    n = len(ring)
    if n < 3:
        return 0.0, False
    xs, ys = zip(*[_merc_xy(p[1], p[2]) for p in ring])
    ss = 0.0
    for i in range(1, n):
        if i == n - 1:
            ss += xs[0] * (ys[1] - ys[i - 1])
        else:
            ss += xs[i] * (ys[i + 1] - ys[i - 1])
    return abs(ss) / 2.0, ss > 0


def polygon_area(poly):
    """Outer-minus-inners area with orientation fixing and repeat-dropping
    (zorder.go:148-166).  Mutates ring order like the reference (outer CCW,
    inners CW).  Raises on rings that collapse below 4 points."""
    total = 0.0
    for i in range(len(poly)):
        sign = 1.0 if i == 0 else -1.0
        poly[i] = drop_repeats(poly[i])
        if len(poly[i]) < 4:
            raise ValueError("Not enough points in ring")
        area, is_ccw = ring_area_merc(poly[i])
        if is_ccw != (i != 0):
            poly[i] = list(reversed(poly[i]))
        total += area * sign
    return total


# highway ranking for z-order (zorder.go:20-46)
HIGHWAY_ORDER = {
    "service": 1, "footway": 1, "path": 1, "footpath": 1, "cycleway": 1,
    "bridlepath": 1, "living_street": 2, "pedestrian": 2, "residential": 3,
    "unclassified": 3, "road": 3, "tertiary_link": 4, "tertiary": 4,
    "secondary_link": 6, "secondary": 6, "primary_link": 7, "primary": 7,
    "trunk_link": 8, "trunk": 8, "motorway_link": 9, "motorway": 9,
}


def find_zorder(tags: dict) -> int:
    """Tag-driven z-order (find_zorder, zorder.go:66-121): highway rank,
    railway=5, layer x10, bridge/tunnel +/-1, explicit z_order override."""
    zo = 0
    layer = 0
    has_zo = None
    for k, v in tags.items():
        if k == "z_order":
            has_zo = v
        if k == "highway":
            zo = HIGHWAY_ORDER.get(v, 0)
        elif k == "railway":
            zo = 5
        elif k == "layer":
            try:
                layer = int(v)
            except ValueError:
                layer = 0
        elif k == "bridge" and v.lower() in ("1", "yes", "true"):
            zo += 1
        elif k == "tunnel" and v.lower() in ("1", "yes", "true"):
            zo -= 1
    zo += layer * 10
    if has_zo is not None:
        try:
            return int(has_zo)
        except ValueError:
            pass
    return zo
