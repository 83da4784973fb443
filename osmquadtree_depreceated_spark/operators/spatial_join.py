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


def knn_cell_join(queries, points: DataFrame, k: int,
                  lon_col: str = "lon", lat_col: str = "lat",
                  id_col: str = "node_id", spark=None) -> DataFrame:
    """kNN via cell-neighborhood expansion (graft-new per north_rule) —
    EXACT: returns the same rows as knn_join (ties by id ascending).

    Strategy: the (cheap, reusable) depth-18 per-cell histogram is collected
    once; for each query the driver walks UP the quadtree from the query's
    cell until the enclosing prefix holds >= k candidates, then one
    batched equi-join on the rounded cell fetches candidates per query and
    exact distances pick top-k.  Correctness guard: if the k-th neighbor's
    distance ball pokes outside the candidate prefix's UNBUFFERED bounds,
    the query escalates one level and reruns — so the output provably
    equals brute force.  At production scale the histogram is the existing
    tile-group statistic (a few 100k rows) and each round is one broadcast
    join — no full scan per query, unlike the brute baseline.

    queries: list of (query_id, qlon, qlat) or a small DataFrame.
    """
    import numpy as np

    from ..qtcore import cell_bounds, point_cells_closed_form, round_cells
    from pyspark.sql.window import Window

    if isinstance(queries, DataFrame):
        qrows = [(r[0], r[1], r[2]) for r in queries.collect()]
        spark = spark or queries.sparkSession
    else:
        qrows = list(queries)
    assert spark is not None

    if "cell" in points.columns:
        pts = points
    else:
        from ..functions.cells import with_point_cell

        pts = with_point_cell(points, lon_col, lat_col, "cell", 18)
    pts = pts.cache()

    hist = pts.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    hcells = np.array([r["cell"] for r in hist], dtype=np.int64)
    hcounts = np.array([r["n"] for r in hist], dtype=np.int64)
    order = np.argsort(hcells)
    hcells, hcounts = hcells[order], hcounts[order]
    csum = np.concatenate([[0], np.cumsum(hcounts)])

    def _prefix_count(qcell: int, level: int) -> int:
        # contiguous range of depth-18 cells under the level-L prefix
        lo = int(round_cells(np.array([qcell]), level)[0]) & ~31
        width = 1 << (63 - 2 * level)
        lo_i = np.searchsorted(hcells, lo, side="left")
        hi_i = np.searchsorted(hcells, lo + width, side="left")
        return int(csum[hi_i] - csum[lo_i])

    qids = np.array([q[0] for q in qrows], dtype=np.int64)
    qlon = np.array([q[1] for q in qrows], dtype=np.int64)
    qlat = np.array([q[2] for q in qrows], dtype=np.int64)
    qcells = point_cells_closed_form(qlon, qlat, 18)

    levels = {}
    for i, qid in enumerate(qids):
        lvl = 18
        while lvl > 0 and _prefix_count(int(qcells[i]), lvl) < k:
            lvl -= 1
        levels[int(qid)] = lvl

    results = []
    pending = {int(q): True for q in qids}
    while pending:
        batch = []
        for i, qid in enumerate(qids):
            if int(qid) not in pending:
                continue
            lvl = levels[int(qid)]
            prefix = int(round_cells(np.array([int(qcells[i])]), lvl)[0])
            batch.append((int(qid), int(qlon[i]), int(qlat[i]), lvl, prefix))
        bdf = broadcast(spark.createDataFrame(
            batch, "query_id long, qlon long, qlat long, lvl int, prefix long"
        ))
        # candidates: points whose cell rounds to the query's prefix
        cand = pts.join(
            bdf,
            F.expr(
                "(case when (cell & 31) < lvl then cell else "
                "shiftleft(shiftright(cell, cast(63 - 2 * lvl as int)),"
                " cast(63 - 2 * lvl as int)) + lvl end) = prefix"
            ),
        )
        d2 = (
            (F.col(lon_col) - F.col("qlon")) * (F.col(lon_col) - F.col("qlon"))
            + (F.col(lat_col) - F.col("qlat")) * (F.col(lat_col) - F.col("qlat"))
        ).alias("dist2")
        w = Window.partitionBy("query_id").orderBy(
            F.col("dist2").asc(), F.col(id_col).asc()
        )
        topk = (
            cand.select("query_id", id_col, d2, "lvl", "prefix",
                        "qlon", "qlat")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        ).collect()

        by_q: dict = {}
        for r in topk:
            by_q.setdefault(r["query_id"], []).append(r)
        for qid_, rows in by_q.items():
            lvl = rows[0]["lvl"]
            prefix = rows[0]["prefix"]
            dk = max(r["dist2"] for r in rows)
            radius = int(np.ceil(np.sqrt(float(dk))))
            bx = cell_bounds(np.array([prefix]), 0.0)
            # +/-1 unit margin: cell_bounds rounds to fixed-point, so shrink
            # the containment test conservatively (escalation is always safe)
            ball_inside = (
                rows[0]["qlon"] - radius >= bx[0][0] + 1
                and rows[0]["qlat"] - radius >= bx[1][0] + 1
                and rows[0]["qlon"] + radius <= bx[2][0] - 1
                and rows[0]["qlat"] + radius <= bx[3][0] - 1
            )
            if lvl == 0 or (ball_inside and len(rows) == k):
                results.extend(
                    (qid_, r["rank"], r[id_col], r["dist2"]) for r in rows
                )
                del pending[qid_]
            else:
                levels[qid_] = lvl - 1
        # queries with zero candidates at this level also escalate
        for qid_ in list(pending):
            if qid_ not in by_q:
                levels[qid_] = max(levels[qid_] - 1, 0)

    pts.unpersist()
    return spark.createDataFrame(
        results, f"query_id long, rank int, {id_col} long, dist2 long"
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
