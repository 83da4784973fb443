"""Property tests: vectorized qtcore kernels vs the literal scalar oracle."""

import numpy as np
import pytest

from osmquadtree_depreceated_spark.qtcore import (
    calculate_cells,
    cell_bounds,
    cells_to_strings,
    cells_to_tuples,
    common_cells,
    common_reduce,
    point_cells_closed_form,
    point_in_poly,
    round_cells,
    strings_to_cells,
    tuples_to_cells,
)
from osmquadtree_depreceated_spark.qtcore import scalar_ref as ref

RNG = np.random.default_rng(42)


def _random_boxes(n, lon_range=(-1800000000, 1800000000),
                  lat_range=(-850000000, 850000000), max_span=10_000_000):
    minx = RNG.integers(lon_range[0], lon_range[1] - max_span, n)
    miny = RNG.integers(lat_range[0], lat_range[1] - max_span, n)
    w = RNG.integers(0, max_span, n)
    h = RNG.integers(0, max_span, n)
    return minx, miny, minx + w, miny + h


def _random_cells(n, max_depth=18):
    lon = RNG.integers(-1800000000, 1800000000, n)
    lat = RNG.integers(-850000000, 850000000, n)
    depth = RNG.integers(0, max_depth + 1, n)
    cells = point_cells_closed_form(lon, lat, 18)
    return round_cells(cells, depth)


class TestCalculate:
    def test_matches_scalar_on_random_boxes(self):
        minx, miny, maxx, maxy = _random_boxes(5000)
        vec = calculate_cells(minx, miny, maxx, maxy, 0.05, 18)
        for i in range(len(minx)):
            assert vec[i] == ref.calculate(
                int(minx[i]), int(miny[i]), int(maxx[i]), int(maxy[i]), 0.05, 18
            ), (minx[i], miny[i], maxx[i], maxy[i])

    def test_matches_scalar_on_seams_and_degenerates(self):
        pts = []
        # quadrant seams: lon=0, mercator half-split lat, equator, domain edges
        seam_lons = [0, 1, -1, 900000000, -900000000, 1799999999]
        seam_lats = [0, 1, -1, 450000000, 660516649, -660516650, 849999999]
        for lon in seam_lons:
            for lat in seam_lats:
                pts.append((lon, lat, lon, lat))          # degenerate box
                pts.append((lon, lat, lon + 1, lat + 1))  # +1 point box
                pts.append((lon - 5, lat - 5, lon + 5, lat + 5))
        arr = np.array(pts, dtype=np.int64)
        vec = calculate_cells(arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], 0.05, 18)
        for i, (a, b, c, d) in enumerate(pts):
            assert vec[i] == ref.calculate(a, b, c, d, 0.05, 18), pts[i]

    def test_invalid_box_is_null(self):
        out = calculate_cells([10], [10], [5], [20], 0.05, 18)
        assert out[0] == -1

    def test_buffer_and_level_variants(self):
        minx, miny, maxx, maxy = _random_boxes(500)
        for bf, lvl in [(0.0, 18), (0.025, 18), (0.05, 13), (0.5, 5)]:
            vec = calculate_cells(minx, miny, maxx, maxy, bf, lvl)
            for i in range(0, len(minx), 7):
                assert vec[i] == ref.calculate(
                    int(minx[i]), int(miny[i]), int(maxx[i]), int(maxy[i]), bf, lvl
                )


class TestClosedFormPoints:
    def test_matches_recursive_on_random_points(self):
        lon = RNG.integers(-1799999999, 1799999999, 20000)
        lat = RNG.integers(-849999999, 849999999, 20000)
        closed = point_cells_closed_form(lon, lat, 18)
        recursive = calculate_cells(lon, lat, lon, lat, 0.05, 18)
        mismatch = closed != recursive
        # the 1e-7-degree nudged box may straddle a depth-18 cell edge for a
        # measure-~1e-4 fraction of points; everywhere else they must agree
        assert mismatch.mean() < 0.001, np.argwhere(mismatch)[:5]

    def test_matches_recursive_on_structured_grid(self):
        lon = np.repeat(np.arange(-1_000_000_0, 1_000_000_0, 97_003), 3)
        lat = np.tile(np.array([500000007, 510000013, 519999991]), lon.size // 3)
        closed = point_cells_closed_form(lon, lat, 18)
        recursive = calculate_cells(lon, lat, lon, lat, 0.05, 18)
        agree = (closed == recursive).mean()
        assert agree > 0.999


class TestCodecs:
    def test_string_roundtrip(self):
        cells = _random_cells(2000)
        s = cells_to_strings(cells)
        back = strings_to_cells(s)
        np.testing.assert_array_equal(back, cells)
        for i in range(0, 2000, 13):
            assert s[i] == ref.cell_string(int(cells[i]))

    def test_tuple_roundtrip(self):
        cells = _random_cells(2000)
        x, y, z = cells_to_tuples(cells)
        back = tuples_to_cells(x, y, z)
        np.testing.assert_array_equal(back, cells)
        for i in range(0, 2000, 17):
            assert (x[i], y[i], z[i]) == ref.cell_tuple(int(cells[i]))

    def test_null_tuple(self):
        x, y, z = cells_to_tuples(np.array([-1]))
        assert (x[0], y[0], z[0]) == (-1, -1, -1)
        assert tuples_to_cells([-1], [-1], [-1])[0] == -1


class TestRoundCommon:
    def test_round_matches_scalar(self):
        cells = _random_cells(1000)
        for lvl in (0, 1, 5, 13, 17, 18):
            out = round_cells(cells, lvl)
            for i in range(0, 1000, 11):
                assert out[i] == ref.round_cell(int(cells[i]), lvl)

    def test_common_matches_scalar(self):
        a = _random_cells(3000)
        b = _random_cells(3000)
        # mix in related cells: parents, equal, null
        b[:500] = round_cells(a[:500], 7)
        b[500:700] = a[500:700]
        b[700:800] = -1
        a[750:800] = -1
        out = common_cells(a, b)
        for i in range(3000):
            assert out[i] == ref.common(int(a[i]), int(b[i])), (a[i], b[i])

    def test_common_reduce_matches_fold(self):
        for trial in range(300):
            n = int(RNG.integers(1, 12))
            cells = _random_cells(n)
            if trial % 3 == 0:  # force shared ancestry
                cells = round_cells(
                    np.repeat(cells[:1], n), RNG.integers(3, 19, n)
                )
            folded = -1
            for c in cells:
                folded = ref.common(folded, int(c))
            got = common_reduce(
                np.array([cells.min()]),
                np.array([cells.max()]),
                np.array([(cells & 31).min()]),
            )[0]
            assert got == folded, cells

    def test_common_reduce_null_guard(self):
        # a NULL cell (-1) sneaking past a call-site pre-filter must
        # propagate NULL_QT, not produce an out-of-range shift
        got = common_reduce(
            np.array([-32, 5 & -32, -32], dtype=np.int64),
            np.array([100, -1, 100], dtype=np.int64),
            np.array([3, 3, -1], dtype=np.int64),
        )
        assert list(got) == [-1, -1, -1]
        # and valid inputs alongside invalid ones are unaffected
        cells = _random_cells(5)
        got2 = common_reduce(
            np.array([cells.min(), -1]),
            np.array([cells.max(), -1]),
            np.array([(cells & 31).min(), 31]),
        )
        folded = -1
        for c in cells:
            folded = ref.common(folded, int(c))
        assert got2[0] == folded and got2[1] == -1

    def test_common_associative_shuffle(self):
        cells = _random_cells(50)
        order = RNG.permutation(50)
        f1, f2 = -1, -1
        for i in range(50):
            f1 = ref.common(f1, int(cells[i]))
            f2 = ref.common(f2, int(cells[order[i]]))
        assert f1 == f2


class TestBounds:
    def test_bounds_matches_scalar(self):
        cells = _random_cells(500)
        for bf in (0.0, 0.05):
            bx = cell_bounds(cells, bf)
            for i in range(0, 500, 7):
                assert (
                    int(bx[0][i]), int(bx[1][i]), int(bx[2][i]), int(bx[3][i])
                ) == ref.cell_bounds(int(cells[i]), bf)

    def test_bounds_contains_generating_box(self):
        # Calculate(box).Bounds(buffer) must contain the box (buffered semantics)
        minx, miny, maxx, maxy = _random_boxes(800, max_span=1_000_000)
        cells = calculate_cells(minx, miny, maxx, maxy, 0.05, 18)
        bx = cell_bounds(cells, 0.05)
        ok = cells == -1
        ok |= (bx[0] <= minx) & (bx[1] <= miny) & (bx[2] >= maxx) & (bx[3] >= maxy)
        assert ok.mean() > 0.995  # fixed-point rounding of Bounds may shave 1 unit


class TestPnpoly:
    def test_matches_scalar(self):
        poly_lon = np.array([0, 10_000_000, 10_000_000, 5_000_000, 0], dtype=np.int64)
        poly_lat = np.array([500000000, 500000000, 510000000, 515000000, 510000000],
                            dtype=np.int64)
        tx = RNG.integers(-2_000_000, 12_000_000, 3000)
        ty = RNG.integers(498000000, 517000000, 3000)
        got = point_in_poly(poly_lon, poly_lat, tx, ty)
        for i in range(3000):
            assert got[i] == ref.point_in_poly(
                poly_lon.tolist(), poly_lat.tolist(), int(tx[i]), int(ty[i])
            )

    def test_vertex_and_edge_cases(self):
        poly_lon = np.array([0, 10, 10, 0], dtype=np.int64)
        poly_lat = np.array([0, 0, 10, 10], dtype=np.int64)
        tx = np.array([0, 10, 5, 5, 11, -1, 0, 10], dtype=np.int64)
        ty = np.array([0, 10, 5, 10, 5, 5, 5, 0], dtype=np.int64)
        got = point_in_poly(poly_lon, poly_lat, tx, ty)
        for i in range(len(tx)):
            assert got[i] == ref.point_in_poly(
                poly_lon.tolist(), poly_lat.tolist(), int(tx[i]), int(ty[i])
            )


class TestMercator:
    def test_merc_roundtrip(self):
        from osmquadtree_depreceated_spark.qtcore import merc, un_merc
        lat = RNG.uniform(-85, 85, 10000)
        np.testing.assert_allclose(un_merc(merc(lat)), lat, rtol=0, atol=1e-9)
