"""Dual-dialect SQL expression generator.

Every cell-algebra formula the engine evaluates natively (JVM-side, no
Python) is generated here ONCE and rendered for two dialects:

  * SPARK  — the engine's own Column expressions (functions/cells.py wraps
             these in F.expr), keeping the hot path in whole-stage codegen;
  * DUCK   — the independent DuckDB oracle used by the driver's correctness
             gate and by tests.

The formulas mirror the NumPy kernels in qtcore.quadtree (which are
themselves property-tested against a literal scalar port of the reference
algorithms, /root/reference/quadtree/quadtree.go).  Floating-point operation
order is kept identical across all three implementations so results agree
bit-for-bit (both engines and NumPy use IEEE-754 doubles and platform libm).
"""

from __future__ import annotations


class Dialect:
    def __init__(self, name: str):
        self.name = name

    def shl(self, x: str, n) -> str:
        if self.name == "spark":
            return f"shiftleft({x}, {n})"
        return f"(({x}) << ({n}))"

    def shr(self, x: str, n) -> str:
        if self.name == "spark":
            return f"shiftright({x}, {n})"
        return f"(({x}) >> ({n}))"

    def band(self, a: str, b) -> str:
        return f"(({a}) & ({b}))"

    def bor(self, a: str, b) -> str:
        return f"(({a}) | ({b}))"

    def bxor(self, a: str, b) -> str:
        if self.name == "spark":
            return f"(({a}) ^ ({b}))"
        return f"xor(({a}), ({b}))"

    def bit_count(self, x: str) -> str:
        return f"bit_count({x})"

    def big(self, x: str) -> str:
        return f"cast(({x}) as bigint)"

    def int_(self, x: str) -> str:
        if self.name == "spark":
            return f"cast(({x}) as int)"
        return f"cast(({x}) as integer)"


SPARK = Dialect("spark")
DUCK = Dialect("duck")

# Morton-spread mask constants (standard 32->64 bit spreading), in decimal so
# both dialects parse them identically.
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def spread_bits_sql(d: Dialect, v: str) -> str:
    """Spread bit i of v to bit 2i — SQL mirror of qtcore._spread_bits."""
    expr = d.big(v)
    for shift, mask in _SPREAD:
        expr = d.band(d.bor(expr, d.shl(expr, shift)), mask)
    return expr


def merc_norm_sql(d: Dialect, lat_fixed: str) -> str:
    """merc(lat_degrees)/90 with the exact op order of qtcore.merc
    (ln(tan(pi*(1+lat/90)/4)) * 90/pi, then /90)."""
    lat_deg = f"(({lat_fixed}) * 1e-7)"
    return (
        f"(ln(tan(pi() * (1e0 + {lat_deg} / 90e0) / 4e0)) * 90e0 / pi() / 90e0)"
    )


def point_cell_sql(d: Dialect, lon: str, lat: str, level: int = 18) -> str:
    """Closed-form depth-`level` cell key for fixed-point int64 point coords.

    SQL mirror of qtcore.point_cells_closed_form: floor the normalized x and
    mercator-y into 2^level tile indices (ties east/north, matching findQuad,
    /root/reference/quadtree/quadtree.go:62-86), flip y to slippy orientation,
    Morton-interleave, left-align at bit 61 and add the depth.
    """
    n = 1 << level
    x_norm = f"((({lon}) * 1e-7 / 180e0 + 1e0) / 2e0)"
    y_norm = f"(({merc_norm_sql(d, lat)} + 1e0) / 2e0)"
    xt = f"least(greatest({d.big(f'floor({x_norm} * {n}e0)')}, 0), {n - 1})"
    yb = f"least(greatest({d.big(f'floor({y_norm} * {n}e0)')}, 0), {n - 1})"
    ys = f"({n - 1} - {yb})"
    inter = d.bor(spread_bits_sql(d, xt), d.shl(spread_bits_sql(d, ys), 1))
    return d.bor(d.shl(inter, 63 - 2 * level), level)


def smear_sql(d: Dialect, x: str) -> str:
    """Propagate the highest set bit downward (for bit-length computation)."""
    expr = f"({x})"
    for s in (1, 2, 4, 8, 16, 32):
        expr = d.bor(expr, d.shr(expr, s))
    return expr


def common_finish_sql(d: Dialect, min_key: str, max_key: str, min_depth: str) -> str:
    """Finishing expression of the distributed Common-ancestor aggregate.

    common(S) over cell keys = prefix(min path, max path) clamped by the
    minimum depth (SURVEY.md §7.4; semantics of quadtree.go:216-241).  The
    three inputs are plain native aggregates: min(key & ~31), max(key & ~31),
    min(key & 31) over non-null cells.
    """
    pa = f"({min_key})"
    pb = f"({max_key})"
    x = d.bxor(pa, pb)
    bitlen = d.bit_count(smear_sql(d, x))
    first_diff = (
        f"(case when {x} > 0 then {d.shr(f'(63 - {bitlen})', 1)} else 31 end)"
    )
    s = f"least({first_diff}, ({min_depth}))"
    shift = d.int_(f"63 - 2 * {s}")
    return f"({d.shl(d.shr(pa, shift), shift)} + {s})"


def cell_round_sql(d: Dialect, cell: str, level: int) -> str:
    """Parent cell at a fixed `level` (quadtree.go:206-213)."""
    shift = 63 - 2 * level
    rounded = f"({d.shl(d.shr(f'({cell})', shift), shift)} + {level})"
    return f"(case when {d.band(cell, 31)} < {level} then ({cell}) else {rounded} end)"


def compact_bits_sql(d: Dialect, v: str) -> str:
    """Gather even bits of v into the low bits — inverse of spread_bits_sql."""
    expr = d.band(v, 0x5555555555555555)
    for shift, mask in [
        (1, 0x3333333333333333),
        (2, 0x0F0F0F0F0F0F0F0F),
        (4, 0x00FF00FF00FF00FF),
        (8, 0x0000FFFF0000FFFF),
        (16, 0x00000000FFFFFFFF),
    ]:
        expr = d.band(d.bor(expr, d.shr(expr, shift)), mask)
    return expr


def cell_tuple_sql(d: Dialect, cell: str) -> dict:
    """cell -> slippy {x, y, z} expressions (quadtree.go:181-203)."""
    z = d.band(cell, 31)
    path = d.band(d.shr(f"({cell})", 5), 0x03FFFFFFFFFFFFFF)
    full_x = compact_bits_sql(d, path)
    full_y = compact_bits_sql(d, d.shr(path, 1))
    shift = d.int_(f"29 - least({z}, 29)")
    x = d.shr(full_x, shift)
    y = d.shr(full_y, shift)
    null = f"({cell}) = -1"
    return {
        "x": f"(case when {null} then -1 else {x} end)",
        "y": f"(case when {null} then -1 else {y} end)",
        "z": f"(case when {null} then -1 else {z} end)",
    }


def cell_string_sql(d: Dialect, cell: str, max_depth: int = 18) -> str:
    """cell -> 'ABCD…' string (quadtree.go:115-137), unrolled concat."""
    parts = []
    for i in range(max_depth):
        digit = d.band(d.shr(f"({cell})", 61 - 2 * i), 3)
        letter = (
            f"(case {digit} when 0 then 'A' when 1 then 'B' "
            f"when 2 then 'C' else 'D' end)"
        )
        parts.append(
            f"(case when {d.band(cell, 31)} > {i} then {letter} else '' end)"
        )
    joined = " || ".join(parts) if d.name == "duck" else f"concat({', '.join(parts)})"
    return f"(case when ({cell}) <= -1 then 'NULL' else {joined} end)"


def bbox_intersects_sql(a: dict, b: dict) -> str:
    """Axis-aligned bbox overlap (bbox.go:59-73); a/b map minx/miny/maxx/maxy
    to SQL expressions.  Dialect-neutral (pure comparisons)."""
    return (
        f"(NOT (({a['minx']}) > ({b['maxx']}) OR ({a['miny']}) > ({b['maxy']}) "
        f"OR ({a['maxx']}) < ({b['minx']}) OR ({a['maxy']}) < ({b['miny']})))"
    )


def pnpoly_sql(lons, lats, test_lon: str, test_lat: str) -> str:
    """Crossing-number point-in-polygon for one FIXED polygon, fully unrolled
    (bbox.go:158-194).  Vertex coords are int literals; the interpolation is
    done in double precision with the reference's expression shape.
    Dialect-neutral."""
    n = len(lons)
    terms = []
    for i in range(n):
        j = (i - 1) % n
        xi, yi, xj, yj = lons[i], lats[i], lons[j], lats[j]
        straddle = f"((({yi}) > ({test_lat})) <> (({yj}) > ({test_lat})))"
        tp = (
            f"(cast(({xj}) - ({xi}) as double) * "
            f"cast(({test_lat}) - ({yi}) as double) / "
            f"cast(({yj}) - ({yi}) as double) + cast({xi} as double))"
        )
        terms.append(
            f"(case when {straddle} and cast({test_lon} as double) < {tp} "
            f"then 1 else 0 end)"
        )
    return f"((({' + '.join(terms)}) % 2) = 1)"
