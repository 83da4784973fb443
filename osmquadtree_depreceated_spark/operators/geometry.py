"""Geometry construction: way coords, point/line/polygon creation,
multipolygon relation assembly.

Pipeline (reference GenerateGeometries, /root/reference/geometry/
geometry.go:225-327, re-expressed as joins + grouped-map):

  1. add_way_coords — way node-refs ⋈ node locations, re-assembled in ref
     order (coordstore.go:170-274's streaming tile-cache join becomes one
     shuffle join + collect_list/array_sort); ways with missing nodes are
     dropped and counted (coordstore.go:49-51).
  2. make_way_geometries — closed+poly-tagged rings become polygons, the
     rest linestrings (makegeometries.go:139-189); bbox native; area via
     the mercator shoelace (zorder.go:133-199); z-order from tags; cell
     recalculated with buffer 0.025 (geometry.go:311-317).
  3. assemble_multipolygons — groupBy(rel_id).applyInPandas over member-way
     rings: merge_rings / group_rings / finishRel semantics
     (makegeometries.go:335-643).  Per-group Python over a handful of rings
     — the distribution axis is the relation id; mega-relations are the
     known skew case and ride on AQE skew splitting.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.udfs import cell_of_bbox_udf
from ..qtcore import rings as R

GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON, GEOM_MULTIPOLYGON = 1, 2, 3, 7


def add_way_coords(way_refs: DataFrame, nodes: DataFrame,
                   drop_missing: bool = True) -> DataFrame:
    """way_refs(way_id, pos, ref) ⋈ nodes(node_id, lon, lat) ->
    (way_id, refs, lons, lats, n_refs, n_found).  Ref order preserved via
    sort_array over (pos, ...) structs.  drop_missing drops ways whose node
    set is incomplete (the reference logs and skips them,
    coordstore.go:49-51); pass False to keep them for accounting."""
    j = way_refs.join(
        nodes, way_refs["ref"] == nodes["node_id"], "left"
    ).select("way_id", "pos", "ref", "lon", "lat")
    agg = (
        j.groupBy("way_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "ref", "lon", "lat"))
            ).alias("pts"),
            F.count(F.lit(1)).alias("n_refs"),
            F.count("lon").alias("n_found"),
        )
        .select(
            "way_id",
            F.expr("transform(pts, p -> p.ref)").alias("refs"),
            F.expr("transform(pts, p -> p.lon)").alias("lons"),
            F.expr("transform(pts, p -> p.lat)").alias("lats"),
            "n_refs",
            "n_found",
        )
    )
    if drop_missing:
        return agg.filter(F.col("n_refs") == F.col("n_found"))
    return agg


def make_way_geometries(way_coords: DataFrame, way_tags: DataFrame | None,
                        recalc_buffer: float = 0.025,
                        max_level: int = 18) -> DataFrame:
    """Way rows -> geometry rows: geom_type, bbox, z_order, way_area, cell.

    is_poly: closed ring AND (area=yes / boundary / poly-ish tag) — the
    wayTags rule (makegeometries.go:99-118) with the fixture tag model
    (area/building/natural => polygon candidates).  way_tags is
    (way_id, tags map<string,string>) or None (all-closed-become-polygons).
    """
    df = way_coords
    if way_tags is not None:
        df = df.join(way_tags, "way_id", "left")
        poly_tag = F.expr(
            "tags is not null and ("
            "  (element_at(tags, 'area') in ('yes', '1', 'true'))"
            "  or element_at(tags, 'boundary') is not null"
            "  or element_at(tags, 'building') is not null"
            "  or element_at(tags, 'natural') is not null)"
        )
    else:
        df = df.withColumn("tags", F.expr("cast(null as map<string,string>)"))
        poly_tag = F.lit(True)

    closed = F.expr(
        "size(refs) >= 3 and element_at(refs, 1) = element_at(refs, -1)"
    )
    df = (
        df.withColumn("is_ring", closed)
        .withColumn("is_poly", closed & poly_tag)
        .withColumn(
            "geom_type",
            F.when(F.col("is_poly"), F.lit(GEOM_POLYGON)).otherwise(
                F.lit(GEOM_LINESTRING)
            ),
        )
        .withColumn("minx", F.array_min("lons"))
        .withColumn("miny", F.array_min("lats"))
        .withColumn("maxx", F.array_max("lons"))
        .withColumn("maxy", F.array_max("lats"))
    )
    area = _ring_area_udf()
    zorder = _zorder_udf()
    calc = cell_of_bbox_udf(recalc_buffer, max_level)
    return (
        df.withColumn(
            "way_area",
            F.when(F.col("is_poly"), area("lons", "lats")).otherwise(F.lit(0.0)),
        )
        .withColumn("z_order", zorder("tags"))
        .withColumn("cell", calc("minx", "miny", "maxx", "maxy"))
    )


def _ring_area_udf():
    """Grouped-by-row ragged ring area: numpy per ring (rings are short;
    the batch axis is Arrow)."""
    import numpy as np

    @F.pandas_udf("double")
    def _area(lons: pd.Series, lats: pd.Series) -> pd.Series:
        out = np.zeros(len(lons))
        for i in range(len(lons)):
            ring = [(0, int(a), int(b)) for a, b in zip(lons[i], lats[i])]
            try:
                out[i] = R.polygon_area([ring])
            except ValueError:
                out[i] = 0.0
        return pd.Series(out)

    return _area


def _zorder_udf():
    @F.pandas_udf("long")
    def _zo(tags: pd.Series) -> pd.Series:
        return pd.Series(
            [R.find_zorder(t) if t else 0 for t in tags], dtype="int64"
        )

    return _zo


_MP_SCHEMA = (
    "rel_id long, geom_type int, n_rings int, n_groups int, "
    "way_area double, minx long, miny long, maxx long, maxy long, "
    "outer_refs array<long>"
)


def assemble_multipolygons(rel_way_members: DataFrame,
                           way_coords: DataFrame) -> DataFrame:
    """Multipolygon assembly (finishRel core, makegeometries.go:472-643).

    rel_way_members: (rel_id, ref, role in 'outer'/'inner'/'')
    way_coords: add_way_coords output.

    Member ways join their coords, group by relation, and each group runs
    merge_rings -> check_ring -> group_rings -> area.  Polygon if one ring
    group, MultiPolygon if several; relations with no valid outer ring are
    dropped, orphan inners dropped (allowLoose).  Tag merging between
    relation and outer ways (:603-627) is handled by the caller as a second
    join-back pass — the reference's mutable shared-map side effect has no
    place in a distributed plan.
    """
    joined = (
        rel_way_members.join(
            way_coords.select("way_id", "refs", "lons", "lats"),
            rel_way_members["ref"] == way_coords["way_id"],
            "inner",
        )
        .select("rel_id", "role", "way_id", "refs", "lons", "lats")
    )

    def _assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rel_id = int(key[0])
        outers, inners, outer_refs = [], [], []
        for _, row in pdf.iterrows():
            ring = [
                (int(r), int(a), int(b))
                for r, a, b in zip(row["refs"], row["lons"], row["lats"])
            ]
            if row["role"] == "inner":
                inners.append(ring)
            else:
                outers.append(ring)
                outer_refs.append(int(row["way_id"]))
        if not outers:
            return pd.DataFrame(columns=_MP_COLS).astype(_MP_DTYPES)
        outer_rings = [r for r in R.merge_rings(outers) if R.check_ring(r)]
        inner_rings = [r for r in R.merge_rings(inners) if R.check_ring(r)]
        if not outer_rings:
            return pd.DataFrame(columns=_MP_COLS).astype(_MP_DTYPES)
        groups = R.group_rings(outer_rings, inner_rings, allow_loose=True)
        area = 0.0
        for g in groups:
            try:
                area += R.polygon_area(g)
            except ValueError:
                pass
        pts = [p for g in groups for ring in g for p in ring]
        return pd.DataFrame(
            [
                {
                    "rel_id": rel_id,
                    "geom_type": GEOM_POLYGON if len(groups) == 1
                    else GEOM_MULTIPOLYGON,
                    "n_rings": sum(len(g) for g in groups),
                    "n_groups": len(groups),
                    "way_area": area,
                    "minx": min(p[1] for p in pts),
                    "miny": min(p[2] for p in pts),
                    "maxx": max(p[1] for p in pts),
                    "maxy": max(p[2] for p in pts),
                    "outer_refs": sorted(outer_refs),
                }
            ]
        )

    return joined.groupBy("rel_id").applyInPandas(_assemble, _MP_SCHEMA)


_MP_COLS = ["rel_id", "geom_type", "n_rings", "n_groups", "way_area",
            "minx", "miny", "maxx", "maxy", "outer_refs"]
_MP_DTYPES = {
    "rel_id": "int64", "geom_type": "int32", "n_rings": "int32",
    "n_groups": "int32", "way_area": "float64", "minx": "int64",
    "miny": "int64", "maxx": "int64", "maxy": "int64",
    "outer_refs": "object",
}
