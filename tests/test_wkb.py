"""WKB writer: golden bytes, EWKB/postgis variant, round-trip identity."""

import struct

import numpy as np

from osmquadtree_depreceated_spark.functions.wkb import (
    WKB_LINESTRING,
    WKB_POINT,
    WKB_POLYGON,
    parse_wkb,
    wkb_rows,
)


def test_point_golden_bytes():
    [b] = wkb_rows([WKB_POINT], [[10_000_000]], [[505_000_000]])
    # big-endian: \x00 + int32 1 + two float64 degrees
    assert b[:5] == b"\x00\x00\x00\x00\x01"
    x, y = struct.unpack(">dd", b[5:])
    assert x == 10_000_000 * 0.0000001 and y == 505_000_000 * 0.0000001
    assert len(b) == 21


def test_linestring_and_polygon_layout():
    lons = [0, 10_000_000, 10_000_000, 0, 0]
    lats = [0, 0, 10_000_000, 10_000_000, 0]
    [ls] = wkb_rows([WKB_LINESTRING], [lons], [lats])
    assert ls[:5] == b"\x00\x00\x00\x00\x02"
    (n,) = struct.unpack(">i", ls[5:9])
    assert n == 5 and len(ls) == 9 + 16 * 5
    [pg] = wkb_rows([WKB_POLYGON], [lons], [lats])
    assert pg[:5] == b"\x00\x00\x00\x00\x03"
    nrings, n = struct.unpack(">ii", pg[5:13])
    assert nrings == 1 and n == 5 and len(pg) == 13 + 16 * 5


def test_postgis_ewkb_srid():
    [b] = wkb_rows([WKB_POINT], [[0]], [[0]], postgis=True)
    tcode, srid = struct.unpack(">ii", b[1:9])
    assert tcode == WKB_POINT | (1 << 29) and srid == 4326
    [bp] = wkb_rows([WKB_POINT], [[0]], [[0]], prj=True, postgis=True)
    _, srid_p = struct.unpack(">ii", bp[1:9])
    assert srid_p == 900913


def test_roundtrip_decode_encode_identity():
    rng = np.random.default_rng(3)
    types, lons_seq, lats_seq = [], [], []
    for t in range(50):
        m = int(rng.integers(2, 9))
        types.append([WKB_LINESTRING, WKB_POLYGON, WKB_POINT][t % 3])
        lons_seq.append(rng.integers(-1_800_000_000, 1_800_000_000, m))
        lats_seq.append(rng.integers(-850_000_000, 850_000_000, m))
    for postgis in (False, True):
        encoded = wkb_rows(types, lons_seq, lats_seq, postgis=postgis)
        for t, lons, lats, b in zip(types, lons_seq, lats_seq, encoded):
            gt, srid, pts = parse_wkb(b)
            assert gt == t
            assert (srid == 4326) if postgis else (srid is None)
            want_n = 1 if t == WKB_POINT else len(lons)
            assert len(pts) == want_n
            for (x, y), lon, lat in zip(pts, lons, lats):
                assert x == lon * 0.0000001 and y == lat * 0.0000001


def test_wkt_native_matches_scalar(spark):
    from osmquadtree_depreceated_spark.functions.wkt import with_wkt

    rng = np.random.default_rng(9)
    rows = []
    for i in range(40):
        m = int(rng.integers(2, 7))
        rows.append((
            i,
            [WKB_POINT, WKB_LINESTRING, WKB_POLYGON][i % 3],
            [int(x) for x in
             rng.integers(-1_800_000_000, 1_800_000_000, m)],
            [int(x) for x in rng.integers(-850_000_000, 850_000_000, m)],
        ))
    df = spark.createDataFrame(
        rows, "id long, geom_type int, lons array<long>, lats array<long>"
    )
    got = {r["id"]: r["wkt"] for r in with_wkt(df).collect()}
    for i, gt, lons, lats in rows:
        pts = ", ".join(
            f"{lon * 1e-7:.6f} {lat * 1e-7:.6f}"
            for lon, lat in zip(lons, lats)
        )
        if gt == WKB_POINT:
            want = (f"POINT({lons[0] * 1e-7:.6f} "
                    f"{lats[0] * 1e-7:.6f})")
        elif gt == WKB_POLYGON:
            want = f"POLYGON(({pts}))"
        else:
            want = f"LINESTRING({pts})"
        assert got[i] == want, (i, got[i], want)


def test_prj_mercator_matches_ring_kernel():
    from osmquadtree_depreceated_spark.qtcore.rings import _merc_xy_arrays

    lons = np.array([0, 10_000_000, -5_000_000])
    lats = np.array([0, 505_000_000, 515_000_000])
    [b] = wkb_rows([WKB_LINESTRING], [lons], [lats], prj=True)
    _, _, pts = parse_wkb(b)
    wx, wy = _merc_xy_arrays(lons, lats)
    for (x, y), ex, ey in zip(pts, wx, wy):
        assert x == ex and y == ey


def test_geometry_collection_roundtrip():
    from osmquadtree_depreceated_spark.functions.wkb import (
        parse_wkb_collection,
        wkb_collection_rows,
    )

    rings = [
        {"grp": 0, "lons": [0, 10, 10, 0, 0], "lats": [0, 0, 10, 10, 0]},
        {"grp": 0, "lons": [2, 4, 4, 2], "lats": [2, 2, 4, 2]},
        {"grp": 1, "lons": [100, 120, 110, 100], "lats": [100, 100, 120, 100]},
    ]
    [b] = wkb_collection_rows([rings])
    polys = parse_wkb_collection(b)
    assert len(polys) == 2
    assert len(polys[0]) == 2 and len(polys[1]) == 1
    assert polys[0][0][0] == (0.0, 0.0)
    assert polys[0][1][1] == (4 * 1e-7, 2 * 1e-7)
    # null/empty rings -> null wkb
    assert wkb_collection_rows([None, []]) == [None, None]
