"""Ring algebra units + Spark geometry construction operators."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmquadtree_depreceated_spark.operators.geometry import (
    GEOM_LINESTRING,
    GEOM_MULTIPOLYGON,
    GEOM_POLYGON,
    add_way_coords,
    assemble_multipolygons,
    make_way_geometries,
)
from osmquadtree_depreceated_spark.qtcore import rings as R


def _ring(pts):
    return [(i + 1, lon, lat) for i, (lon, lat) in enumerate(pts)]


class TestRingAlgebra:
    def test_merge_three_open_ways_all_orientations(self):
        # square 1-2-3-4-1 split into three open ways with mixed directions
        p = {1: (0, 0), 2: (10_000_000, 0), 3: (10_000_000, 10_000_000),
             4: (0, 10_000_000)}
        w1 = [(1, *p[1]), (2, *p[2])]
        w2 = [(3, *p[3]), (2, *p[2])]          # reversed segment
        w3 = [(3, *p[3]), (4, *p[4]), (1, *p[1])]
        merged = R.merge_rings([w1, w2, w3])
        assert len(merged) == 1
        ring = merged[0]
        assert R.check_ring(ring)
        assert {r[0] for r in ring} == {1, 2, 3, 4}
        assert len(ring) == 5  # closed: first == last

    def test_merge_keeps_closed_and_recurses_remainder(self):
        closed = _ring([(0, 0), (5, 0), (5, 5), (0, 0)])
        closed[-1] = closed[0]  # same ref closes it
        w1 = [(10, 0, 0), (11, 1, 1)]
        w2 = [(11, 1, 1), (12, 2, 0)]
        w3 = [(12, 2, 0), (10, 0, 0)]
        merged = R.merge_rings([closed, w1, w2, w3])
        assert len(merged) == 2
        assert all(R.check_ring(r) for r in merged)

    def test_orphan_open_way_fails_check(self):
        w = [(1, 0, 0), (2, 5, 5)]
        merged = R.merge_rings([w])
        assert not R.check_ring(merged[0])

    def test_group_rings_containment_and_orphan_drop(self):
        big = _ring([(0, 0), (100, 0), (100, 100), (0, 100), (0, 0)])
        big[-1] = big[0]
        far = _ring([(1000, 1000), (1100, 1000), (1100, 1100), (1000, 1000)])
        far[-1] = far[0]
        inner = _ring([(10, 10), (20, 10), (20, 20), (10, 10)])
        inner[-1] = inner[0]
        orphan = _ring([(500, 500), (510, 500), (510, 510), (500, 500)])
        orphan[-1] = orphan[0]
        groups = R.group_rings([big, far], [inner, orphan], allow_loose=True)
        assert len(groups) == 2
        assert len(groups[0]) == 2 and groups[0][1][0][1] == 10
        assert len(groups[1]) == 1
        with pytest.raises(ValueError):
            R.group_rings([big, far], [orphan], allow_loose=False)

    def test_polygon_area_outer_minus_inner(self):
        outer = _ring([(0, 0), (10_000_000, 0), (10_000_000, 10_000_000),
                       (0, 10_000_000), (0, 0)])
        outer[-1] = outer[0]
        inner = _ring([(2_000_000, 2_000_000), (4_000_000, 2_000_000),
                       (4_000_000, 4_000_000), (2_000_000, 4_000_000),
                       (2_000_000, 2_000_000)])
        inner[-1] = inner[0]
        a_out = R.polygon_area([list(outer)])
        a_both = R.polygon_area([list(outer), list(inner)])
        assert a_out > 0
        assert a_both < a_out
        # near the equator 1 degree ~ 111 km; outer is 1x1 degree
        assert a_out == pytest.approx((111_319.49) ** 2, rel=0.02)

    def test_zorder_rules(self):
        assert R.find_zorder({"highway": "motorway"}) == 9
        assert R.find_zorder({"highway": "service", "bridge": "yes"}) == 2
        assert R.find_zorder({"railway": "rail", "tunnel": "true"}) == 4
        assert R.find_zorder({"highway": "primary", "layer": "2"}) == 27
        assert R.find_zorder({"z_order": "42", "highway": "path"}) == 42


@pytest.fixture(scope="module")
def geo_data(spark):
    # nodes 1-4 square, 5-6 line, 7 missing from ways that use node 99
    nodes = spark.createDataFrame(
        [
            (1, 0, 500000000), (2, 10_000_000, 500000000),
            (3, 10_000_000, 510000000), (4, 0, 510000000),
            (5, -5_000_000, 505000000), (6, -4_000_000, 506000000),
            (7, 2_000_000, 502000000), (8, 4_000_000, 502000000),
            (9, 4_000_000, 504000000),
        ],
        "node_id long, lon long, lat long",
    )
    way_refs = spark.createDataFrame(
        [
            # way 1: closed square
            (1, 1, 1), (1, 2, 2), (1, 3, 3), (1, 4, 4), (1, 5, 1),
            # way 2: open line
            (2, 1, 5), (2, 2, 6),
            # way 3: references missing node 99 -> dropped
            (3, 1, 1), (3, 2, 99),
            # ways 4-5: two open halves of a triangle ring (for relation)
            (4, 1, 7), (4, 2, 8),
            (5, 1, 8), (5, 2, 9), (5, 3, 7),
        ],
        "way_id long, pos long, ref long",
    )
    return nodes, way_refs


class TestSparkGeometry:
    def test_add_way_coords_order_and_missing(self, spark, geo_data):
        nodes, way_refs = geo_data
        wc = add_way_coords(way_refs, nodes).orderBy("way_id").collect()
        ids = [r["way_id"] for r in wc]
        assert ids == [1, 2, 4, 5]  # way 3 dropped (missing node)
        w1 = wc[0]
        assert w1["refs"] == [1, 2, 3, 4, 1]
        assert w1["lons"][0] == 0 and w1["lons"][1] == 10_000_000
        kept = add_way_coords(way_refs, nodes, drop_missing=False)
        assert kept.count() == 5

    def test_make_way_geometries_types_and_area(self, spark, geo_data):
        nodes, way_refs = geo_data
        wc = add_way_coords(way_refs, nodes)
        tags = spark.createDataFrame(
            [(1, {"building": "yes"}), (2, {"highway": "primary"})],
            "way_id long, tags map<string,string>",
        )
        geoms = {r["way_id"]: r for r in
                 make_way_geometries(wc, tags).collect()}
        assert geoms[1]["geom_type"] == GEOM_POLYGON
        assert geoms[1]["way_area"] > 0
        assert geoms[2]["geom_type"] == GEOM_LINESTRING
        assert geoms[2]["way_area"] == 0.0
        assert geoms[2]["z_order"] == 7
        assert geoms[1]["minx"] == 0 and geoms[1]["maxx"] == 10_000_000
        assert geoms[1]["cell"] >= 0

    def test_assemble_multipolygon_from_open_ways(self, spark, geo_data):
        nodes, way_refs = geo_data
        wc = add_way_coords(way_refs, nodes)
        members = spark.createDataFrame(
            [(100, 4, "outer"), (100, 5, "outer")],
            "rel_id long, ref long, role string",
        )
        out = assemble_multipolygons(members, wc).collect()
        assert len(out) == 1
        r = out[0]
        assert r["geom_type"] == GEOM_POLYGON
        assert r["n_groups"] == 1 and r["n_rings"] == 1
        assert r["way_area"] > 0
        assert r["outer_refs"] == [4, 5]

    def test_assemble_multi_outer(self, spark, geo_data):
        nodes, way_refs = geo_data
        wc = add_way_coords(way_refs, nodes)
        members = spark.createDataFrame(
            [(200, 1, "outer"), (200, 4, "outer"), (200, 5, "")],
            "rel_id long, ref long, role string",
        )
        out = assemble_multipolygons(members, wc).collect()
        assert len(out) == 1
        assert out[0]["geom_type"] == GEOM_MULTIPOLYGON
        assert out[0]["n_groups"] == 2

    def test_rel_with_no_valid_outer_dropped(self, spark, geo_data):
        nodes, way_refs = geo_data
        wc = add_way_coords(way_refs, nodes)
        members = spark.createDataFrame(
            [(300, 2, "outer")],  # way 2 is an open line, never closes
            "rel_id long, ref long, role string",
        )
        assert assemble_multipolygons(members, wc).count() == 0
