"""WKB writers/readers for geometry output.

Wire format per the reference (geometry/geometryimpl.go:279-380 +
utils/writevals.go:72-92): BIG-endian ('\\x00' XDR byte order), int32 type
code (1=Point, 2=LineString, 3=Polygon), ring = int32 point count + 16
bytes per point, coordinates as float64 degrees (fixed-point * 1e-7) or
full-scale spherical mercator when `prj`.  The `postgis` variant is EWKB:
type |= 0x20000000 and an int32 SRID (4326, or 900913 when projected)
follows the type word (AsWkbPostgis, geometryimpl.go:309-355).

The writer is an Arrow-batched pandas UDF: the numeric work (fixed-point ->
degrees/mercator, float64 -> big-endian byte view) is vectorized over the
whole flattened batch; per-row work is only memory slicing.  MultiPolygon
relations are emitted by the reference as GEOMETRYCOLLECTION of polygons
(multiGeometryImpl.AsWkb) — out of scope here, where the sinks cover
point/linestring/single-ring-polygon feature tables.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..qtcore.rings import _merc_xy_arrays

WKB_POINT, WKB_LINESTRING, WKB_POLYGON = 1, 2, 3
_SRID_FLAG = 1 << 29


def _coords_to_floats(lons: np.ndarray, lats: np.ndarray, prj: bool):
    if prj:
        # the ONE mercator implementation (bit-parity anchor for cells,
        # areas and projected sinks alike)
        return _merc_xy_arrays(lons, lats)
    return lons * 0.0000001, lats * 0.0000001


def wkb_rows(geom_types, lons_seq, lats_seq, prj: bool = False,
             postgis: bool = False):
    """Batch WKB encoder: per-row (geom_type, lon array, lat array) ->
    bytes.  Points use the first coordinate; polygons write one outer
    ring."""
    n = len(geom_types)
    out = [None] * n
    if n == 0:
        return out
    lens = np.fromiter((len(x) for x in lons_seq), dtype=np.int64, count=n)
    flat_lon = (
        np.concatenate([np.asarray(x, dtype=np.int64) for x in lons_seq])
        if lens.sum() else np.array([], dtype=np.int64)
    )
    flat_lat = (
        np.concatenate([np.asarray(x, dtype=np.int64) for x in lats_seq])
        if lens.sum() else np.array([], dtype=np.int64)
    )
    x, y = _coords_to_floats(flat_lon, flat_lat, prj)
    # interleave and view as big-endian bytes, one 16-byte slot per point
    xy = np.empty((len(x), 2), dtype=">f8")
    xy[:, 0] = x
    xy[:, 1] = y
    raw = xy.tobytes()
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    srid = 900913 if prj else 4326

    def _hdr(code: int) -> bytes:
        if postgis:
            return b"\x00" + struct.pack(">ii", code | _SRID_FLAG, srid)
        return b"\x00" + struct.pack(">i", code)

    for i in range(n):
        gt = int(geom_types[i])
        s = int(starts[i]) * 16
        m = int(lens[i])
        if gt == WKB_POINT:
            out[i] = _hdr(WKB_POINT) + raw[s:s + 16]
        elif gt == WKB_POLYGON:
            out[i] = (
                _hdr(WKB_POLYGON) + struct.pack(">i", 1)
                + struct.pack(">i", m) + raw[s:s + 16 * m]
            )
        elif gt == WKB_LINESTRING:
            out[i] = (
                _hdr(WKB_LINESTRING) + struct.pack(">i", m)
                + raw[s:s + 16 * m]
            )
        else:
            # multipolygon relations (7) route through
            # wkb_collection_rows; anything else is a caller bug — fail
            # loudly rather than emit a structurally-valid wrong geometry
            raise ValueError(f"wkb_rows: unsupported geom_type {gt}")
    return out


WKB_GEOMETRYCOLLECTION = 7


def wkb_collection_rows(rings_seq, prj: bool = False):
    """Multipolygon relations -> GEOMETRYCOLLECTION-of-POLYGON WKB (the
    reference's multi shape, geometryimpl.go:384-391).  Documented
    divergence (FIXTURES.md policy): the reference writer emits 4-byte
    headers and omits the geometry count — malformed WKB no parser
    accepts; we emit the CORRECT encoding (endian byte + int32 type +
    int32 count, nested geometries with full headers).

    rings_seq: per row, a sequence of ring structs/dicts with fields
    (grp, lons, lats) — the assemble_multipolygons `rings` column."""
    out = []
    for rings in rings_seq:
        if rings is None or len(rings) == 0:
            out.append(None)
            continue
        groups: dict = {}
        for r in rings:
            d = r if isinstance(r, dict) else r.asDict()
            groups.setdefault(int(d["grp"]), []).append(
                (d["lons"], d["lats"])
            )
        parts = []
        for gi in sorted(groups):
            grp = groups[gi]
            body = b"\x00" + struct.pack(">ii", WKB_POLYGON, len(grp))
            for lons, lats in grp:
                x, y = _coords_to_floats(
                    np.asarray(lons, dtype=np.int64),
                    np.asarray(lats, dtype=np.int64), prj,
                )
                xy = np.empty((len(x), 2), dtype=">f8")
                xy[:, 0] = x
                xy[:, 1] = y
                body += struct.pack(">i", len(x)) + xy.tobytes()
            parts.append(body)
        out.append(
            b"\x00" + struct.pack(">ii", WKB_GEOMETRYCOLLECTION, len(parts))
            + b"".join(parts)
        )
    return out


def wkb_collection_udf(prj: bool = False):
    """pandas UDF rings-column -> GEOMETRYCOLLECTION WKB binary."""

    @F.pandas_udf("binary")
    def _wkbc(rings: pd.Series) -> pd.Series:
        return pd.Series(wkb_collection_rows(list(rings), prj),
                         dtype=object)

    return _wkbc


def wkb_udf(prj: bool = False, postgis: bool = False):
    """pandas UDF (geom_type int, lons array<long>, lats array<long>) ->
    binary WKB."""

    @F.pandas_udf("binary")
    def _wkb(geom_type: pd.Series, lons: pd.Series,
             lats: pd.Series) -> pd.Series:
        return pd.Series(
            wkb_rows(geom_type.to_numpy(np.int64), list(lons), list(lats),
                     prj, postgis),
            dtype=object,
        )

    return _wkb


def parse_wkb(b: bytes):
    """Scalar WKB reader (tests / round-trip verification): returns
    (geom_type, srid_or_None, [(x, y), ...])."""
    assert b[0] == 0, "expected big-endian"
    (tcode,) = struct.unpack(">i", b[1:5])
    p = 5
    srid = None
    if tcode & _SRID_FLAG:
        (srid,) = struct.unpack(">i", b[5:9])
        tcode &= ~_SRID_FLAG
        p = 9
    if tcode == WKB_POINT:
        return tcode, srid, [struct.unpack(">dd", b[p:p + 16])]
    if tcode == WKB_POLYGON:
        (nrings,) = struct.unpack(">i", b[p:p + 4])
        p += 4
        pts = []
        for _ in range(nrings):
            (m,) = struct.unpack(">i", b[p:p + 4])
            p += 4
            for _ in range(m):
                pts.append(struct.unpack(">dd", b[p:p + 16]))
                p += 16
        return tcode, srid, pts
    (m,) = struct.unpack(">i", b[p:p + 4])
    p += 4
    pts = [struct.unpack(">dd", b[p + 16 * i:p + 16 * i + 16])
           for i in range(m)]
    return tcode, srid, pts


def parse_wkb_collection(b: bytes):
    """Scalar reader for GEOMETRYCOLLECTION-of-POLYGON WKB (tests):
    returns [[ [ (x,y), ... ] per ring ] per polygon]."""
    assert b[0] == 0
    (tcode, n) = struct.unpack(">ii", b[1:9])
    assert tcode == WKB_GEOMETRYCOLLECTION, tcode
    p = 9
    polys = []
    for _ in range(n):
        assert b[p] == 0
        (pt, nrings) = struct.unpack(">ii", b[p + 1:p + 9])
        assert pt == WKB_POLYGON
        p += 9
        rings = []
        for _ in range(nrings):
            (m,) = struct.unpack(">i", b[p:p + 4])
            p += 4
            ring = [struct.unpack(">dd", b[p + 16 * i:p + 16 * i + 16])
                    for i in range(m)]
            p += 16 * m
            rings.append(ring)
        polys.append(rings)
    return polys


def parse_wkb_udf():
    """Arrow-batched decoder used by the round-trip gate entry: returns a
    struct (geom_type, n_pts, first_x, first_y, last_x, last_y)."""

    @F.pandas_udf(
        "struct<geom_type: int, n_pts: int, first_x: double,"
        " first_y: double, last_x: double, last_y: double>"
    )
    def _parse(wkb: pd.Series) -> pd.DataFrame:
        rows = []
        for b in wkb:
            t, _, pts = parse_wkb(bytes(b))
            rows.append(
                {
                    "geom_type": t,
                    "n_pts": len(pts),
                    "first_x": pts[0][0],
                    "first_y": pts[0][1],
                    "last_x": pts[-1][0],
                    "last_y": pts[-1][1],
                }
            )
        return pd.DataFrame(rows)

    return _parse
