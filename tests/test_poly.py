"""Osmosis .poly reader (sources/poly.py vs filter/poly.go:179-242)."""

import pytest

from osmquadtree_depreceated_spark.gate import POLY_FILE_TEXT
from osmquadtree_depreceated_spark.sources.poly import (
    PolyRegion,
    parse_poly,
    poly_region_filter,
)


def test_parse_multi_section():
    r = parse_poly(POLY_FILE_TEXT)
    assert r.name == "test_region"
    assert len(r.polys) == 2 and len(r.holes) == 1
    lons_a, lats_a = r.polys[0]
    assert lons_a[0] == -6000000 and lats_a[0] == 502000000
    # float-degree section scales via Intm (writevals.go:230-235)
    lons_b, lats_b = r.polys[1]
    assert lons_b == [5000000, 9000000, 7000000]
    assert lats_b == [500000000, 500000000, 504000000]
    hl, _ = r.holes[0]
    assert hl == [-3000000, -1000000, -2000000]


def test_parse_negative_float_and_blank_lines():
    r = parse_poly("nm\nsec\n-1.25 -0.5\n\n3 4\nEND\nEND\n")
    assert r.polys == [([-12500000, 3], [-5000000, 4])]
    assert r.holes == []


def test_parse_bad_vertex_line():
    with pytest.raises(ValueError, match="two numbers"):
        parse_poly("nm\nsec\n1 2 3\nEND\nEND\n")


def test_envelope_ignores_holes():
    r = parse_poly(POLY_FILE_TEXT)
    assert r.envelope() == (-6000000, 500000000, 9000000, 516000000)


def test_filter_outer_minus_hole(spark):
    # (0, 506e6) inside outer_a; (-2e6, 506e6) inside the hole;
    # (0.7deg, 50.1deg) inside outer_b; (9e7, 0) outside everything
    pts = spark.createDataFrame(
        [(1, 0, 506000000), (2, -2000000, 506000000),
         (3, 7000000, 501000000), (4, 90000000, 0)],
        ["node_id", "lon", "lat"],
    )
    r = parse_poly(POLY_FILE_TEXT)
    got = {
        row.node_id
        for row in poly_region_filter(pts, r).select("node_id").collect()
    }
    assert got == {1, 3}


def test_single_section_matches_point_in_polygon_join(spark):
    # single-section region ≡ the existing one-polygon operator
    from osmquadtree_depreceated_spark.gate import POLY_LATS, POLY_LONS
    from osmquadtree_depreceated_spark.operators.spatial_join import (
        point_in_polygon_join,
    )

    pts = spark.createDataFrame(
        [(i, (i * 977771) % 16000000 - 8000000,
          500000000 + (i * 131071) % 18000000) for i in range(400)],
        ["node_id", "lon", "lat"],
    )
    region = PolyRegion(polys=[(list(POLY_LONS), list(POLY_LATS))])
    a = {r.node_id for r in poly_region_filter(pts, region).collect()}
    b = {r.node_id for r in point_in_polygon_join(
        pts, POLY_LONS, POLY_LATS).collect()}
    assert a == b and a


def test_tile_tests_match_scalar_port(spark):
    # engine kernel vs the independent scalar port on a cell sample,
    # single outer section (reference-correct path)
    from osmquadtree_depreceated_spark.gate import POLY_LATS, POLY_LONS
    from osmquadtree_depreceated_spark.qtcore import scalar_ref as SR
    from osmquadtree_depreceated_spark.sources.poly import (
        with_region_tile_tests,
    )

    region = PolyRegion(polys=[(list(POLY_LONS), list(POLY_LATS))])
    ex0, ey0, ex1, ey1 = region.envelope()
    cells = [(((k * 2654435761) % (1 << 36)) << 27) | 18
             for k in range(40)]
    df = spark.createDataFrame([(c,) for c in cells], ["cell"])
    got = {
        r.cell: (r.tile_intersects, r.tile_contains)
        for r in with_region_tile_tests(df, region).collect()
    }

    def member(x, y):
        return SR.point_in_poly(POLY_LONS, POLY_LATS, x, y)

    for c in cells:
        mnx, mny, mxx, mxy = SR.cell_bounds(c, 0.05)
        inter = ex0 <= mxx and ey0 <= mxy and ex1 >= mnx and ey1 >= mny
        cont = (ex0 <= mnx and ey0 <= mny and ex1 >= mxx and ey1 >= mxy
                and member(mnx, mny) and member(mnx, mxy)
                and member(mxx, mny) and member(mxx, mxy))
        assert got[c] == (inter, cont), hex(c)


def test_poly_tile_filter_modes(spark):
    from osmquadtree_depreceated_spark.gate import POLY_LATS, POLY_LONS
    from osmquadtree_depreceated_spark.sources.poly import poly_tile_filter

    region = PolyRegion(polys=[(list(POLY_LONS), list(POLY_LATS))])
    cells = [(((k * 2654435761) % (1 << 36)) << 27) | 18
             for k in range(40)]
    df = spark.createDataFrame([(c,) for c in cells], ["cell"])
    inter = {r.cell for r in poly_tile_filter(df, region).collect()}
    cont = {r.cell for r in poly_tile_filter(
        df, region, mode="contains").collect()}
    assert cont <= inter  # contains implies intersects


def test_region_filter_envelope_pushdown(spark, tmp_path):
    # the native envelope prefilter must reach the parquet scan as pushed
    # filters — at production scale that's the row-group/file skip that
    # runs before any Python executes
    p = str(tmp_path / "pts")
    spark.range(2000).selectExpr(
        "id as node_id",
        "cast((id * 48271) % 20000001 - 10000000 as long) as lon",
        "cast(500000000 + (id * 69621) % 20000001 as long) as lat",
    ).write.parquet(p)
    region = parse_poly(POLY_FILE_TEXT)
    out = poly_region_filter(spark.read.parquet(p), region)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert scan, plan
    ex0, ey0, ex1, ey1 = region.envelope()
    # (the plan string elides trailing filters at
    # spark.sql.maxMetadataStringLength — assert only the FIRST envelope
    # bound, which proves the prefilter reached the scan without
    # depending on where the truncation lands)
    assert f"GreaterThanOrEqual(lon,{ex0})" in scan[0]
