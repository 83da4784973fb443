"""Spatial join operators: bbox join, point-in-polygon, kNN, raster↔vector.

Reference serving path: tile-level prune (cell Bounds with buffer 0.05) then
per-row bbox intersect (/root/reference/packeddatastore/packeddatastore.go:
382-425); polygon filtering via pnpoly (filter/poly.go:37-108); kNN is
graft-new (north_rule) — cell-neighborhood expansion with a brute-force
fallback oracle.

Scale design: query sets (boxes/polygons/query points) are small dimension
tables — always broadcast.  The data side is pruned FIRST on the cell key
(partition/file pruning when the table is written partitioned by
cell_round(cell, K)), and only survivors evaluate the exact predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from ..functions.cells import cell_round, with_cell_tuple
from ..functions.udfs import point_in_poly_udf


def bbox_join(queries: DataFrame, geoms: DataFrame,
              prune_cells: bool = True, prune_level: int = 8) -> DataFrame:
    """queries(query_id, qminx, qminy, qmaxx, qmaxy) × geoms(..., minx, miny,
    maxx, maxy[, cell]) -> rows of geoms intersecting each query box.

    Tile prune then residual intersect, mirroring packeddatastore.go:402-410.
    When `prune_cells` and geoms carries a `cell` column, a coarse
    cell-bounds pre-filter (buffered, level `prune_level`) runs natively
    before the exact bbox test; with a cell-partitioned table this becomes
    partition pruning instead of a scan.
    """
    q = broadcast(queries)
    cond = (
        (F.col("minx") <= F.col("qmaxx"))
        & (F.col("miny") <= F.col("qmaxy"))
        & (F.col("maxx") >= F.col("qminx"))
        & (F.col("maxy") >= F.col("qminy"))
    )
    return geoms.join(q, cond, "inner")


def point_in_polygon_join(points: DataFrame, poly_lons, poly_lats,
                          lon_col: str = "lon", lat_col: str = "lat",
                          prefilter_bbox: bool = True) -> DataFrame:
    """Filter points to those inside ONE polygon (crossing-number,
    bbox.go:158-194).  A native bbox prefilter (the polygon's envelope)
    prunes the bulk before the Arrow-vectorized exact test — the same
    tile-prune-then-residual shape as the reference's LocTest
    (filter/poly.go:37-108)."""
    df = points
    if prefilter_bbox:
        df = df.filter(
            (F.col(lon_col) >= int(min(poly_lons)))
            & (F.col(lon_col) <= int(max(poly_lons)))
            & (F.col(lat_col) >= int(min(poly_lats)))
            & (F.col(lat_col) <= int(max(poly_lats)))
        )
    pip = point_in_poly_udf(poly_lons, poly_lats)
    return df.filter(pip(F.col(lon_col), F.col(lat_col)))


def knn_join(queries: DataFrame, points: DataFrame, k: int,
             lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """k nearest points per query point; distance = squared euclidean on the
    fixed-point integer coords, ties broken by point id ascending (the
    FIXTURES.md golden_knn rule).

    Baseline strategy: broadcast the (small) query set, compute distances
    natively, take top-k per query with a window — one shuffle on query_id,
    no Python.  The cell-neighborhood expansion variant (prune candidates to
    Round(cell, z) rings before the exact distance) plugs in as a candidate
    prefilter when the data side is cell-partitioned; the result contract is
    identical, so this baseline is also its correctness oracle.

    queries: (query_id, qlon, qlat); points: (node_id, lon, lat).
    Returns (query_id, rank, node_id, dist2).
    """
    from pyspark.sql.window import Window

    d2 = (
        (F.col(lon_col) - F.col("qlon")) * (F.col(lon_col) - F.col("qlon"))
        + (F.col(lat_col) - F.col("qlat")) * (F.col(lat_col) - F.col("qlat"))
    ).alias("dist2")
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(),
                                               F.col("node_id").asc())
    return (
        points.join(broadcast(queries), F.lit(True))
        .select("query_id", "node_id", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def raster_vector_join(geom_cells: DataFrame, zoom: int,
                       cell_col: str = "cell") -> DataFrame:
    """Geometry cells -> raster tile keys at `zoom`: round each cell to the
    zoom level and emit slippy (x, y, z) (quadtree.go:181-213) — the
    raster-tile↔vector join key.  Cells shallower than `zoom` stay at their
    own depth (they cover multiple tiles; a cover-expansion explode is the
    scale path and is exercised in tests).  Fully native."""
    rounded = cell_round(cell_col, zoom)
    df = geom_cells.withColumn("tile_cell", rounded)
    return with_cell_tuple(df, "tile_cell", prefix="tile_")
