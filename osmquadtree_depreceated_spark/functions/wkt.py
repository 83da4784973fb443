"""WKT writers (sink-side, Arrow-batched).

Format per the reference (geometry/geometryimpl.go:243-277): '%f %f' points
(6 fixed decimals) joined ', ' inside parens; POINT(x y),
LINESTRING(...), POLYGON((...)).

Why a pandas UDF and not format_string('%.6f'): Go's FormatFloat (and
Python's format) round the BINARY double correctly to 6 decimals, while
the JVM Formatter double-rounds through the shortest decimal repr — on
fixed-point data every coordinate whose 7th decimal digit is 5 (10% of
rows) can format one ulp differently.  WKT is a sink, not a hot path —
same placement as the WKB writer.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .wkb import WKB_POINT, WKB_POLYGON


def wkt_rows(geom_types, lons_seq, lats_seq):
    """Batch WKT encoder (correctly-rounded 6-decimal coords)."""
    out = []
    for gt, lons, lats in zip(geom_types, lons_seq, lats_seq):
        gt = int(gt)
        if gt == WKB_POINT:
            out.append(
                f"POINT({lons[0] * 1e-7:.6f} {lats[0] * 1e-7:.6f})"
            )
            continue
        pts = ", ".join(
            f"{lon * 1e-7:.6f} {lat * 1e-7:.6f}"
            for lon, lat in zip(lons, lats)
        )
        if gt == WKB_POLYGON:
            out.append(f"POLYGON(({pts}))")
        else:
            out.append(f"LINESTRING({pts})")
    return out


def wkt_udf():
    @F.pandas_udf("string")
    def _wkt(geom_type: pd.Series, lons: pd.Series,
             lats: pd.Series) -> pd.Series:
        return pd.Series(wkt_rows(list(geom_type), list(lons), list(lats)),
                         dtype=object)

    return _wkt


def wkt_column(geom_type: str = "geom_type", lons: str = "lons",
               lats: str = "lats") -> Column:
    return wkt_udf()(F.col(geom_type), F.col(lons), F.col(lats))


def with_wkt(df: DataFrame, out: str = "wkt", geom_type: str = "geom_type",
             lons: str = "lons", lats: str = "lats") -> DataFrame:
    return df.withColumn(out, wkt_column(geom_type, lons, lats))
