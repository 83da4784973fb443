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

from ..qtcore.rings import EARTH_HALF_CIRCUM

WKB_POINT, WKB_LINESTRING, WKB_POLYGON = 1, 2, 3
_SRID_FLAG = 1 << 29


def _coords_to_floats(lons: np.ndarray, lats: np.ndarray, prj: bool):
    if prj:
        x = lons * 0.0000001 * EARTH_HALF_CIRCUM / 180.0
        y = (
            np.log(np.tan(np.pi * (1.0 + lats * 0.0000001 / 90.0) / 4.0))
            * 90.0
            / np.pi
            * EARTH_HALF_CIRCUM
            / 90.0
        )
    else:
        x = lons * 0.0000001
        y = lats * 0.0000001
    return x, y


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
        else:
            out[i] = (
                _hdr(WKB_LINESTRING) + struct.pack(">i", m)
                + raw[s:s + 16 * m]
            )
    return out


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
