"""Spatial-join operators: cell-pruned bbox join exactness + cover cells."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmquadtree_depreceated_spark.operators.calcqts import way_cells
from osmquadtree_depreceated_spark.operators.spatial_join import bbox_join
from osmquadtree_depreceated_spark.qtcore import (
    calculate_cells,
    cell_bounds,
    cover_cells,
    round_cells,
)

RNG = np.random.default_rng(23)


def _random_boxes(n, span=20_000_000):
    cx = RNG.integers(-10_000_000, 10_000_000, n)
    cy = RNG.integers(500_000_000, 520_000_000, n)
    w = RNG.integers(1, span, n)
    h = RNG.integers(1, span, n)
    return np.stack([cx - w // 2, cy - h // 2, cx + w // 2, cy + h // 2],
                    axis=1)


class TestCoverCells:
    def test_cover_contains_every_intersecting_cell(self):
        # property: for random geometry boxes, if box intersects query then
        # round(cell(box), L) is in cover(query, L)
        geoms = _random_boxes(800, span=2_000_000)
        cells = calculate_cells(
            geoms[:, 0], geoms[:, 1], geoms[:, 2], geoms[:, 3], 0.05, 18
        )
        for qminx, qminy, qmaxx, qmaxy in _random_boxes(15, span=8_000_000):
            cover = set(
                int(c)
                for c in cover_cells(qminx, qminy, qmaxx, qmaxy, 8, 0.05)
            )
            assert 0 in cover  # root always present
            inter = (
                (geoms[:, 0] <= qmaxx) & (geoms[:, 1] <= qmaxy)
                & (geoms[:, 2] >= qminx) & (geoms[:, 3] >= qminy)
            )
            rounded = round_cells(np.maximum(cells, 0), 8)
            for i in np.nonzero(inter)[0]:
                assert int(rounded[i]) in cover, (geoms[i], cells[i])

    def test_cover_cells_bounds_actually_intersect(self):
        q = (-6_000_000, 503_000_000, -4_000_000, 507_000_000)
        cover = cover_cells(*q, 8, 0.05)
        bx = cell_bounds(cover, 0.05)
        ok = ~(
            (bx[0] > q[2]) | (bx[1] > q[3]) | (bx[2] < q[0]) | (bx[3] < q[1])
        )
        assert ok.all()
        # and it is a real prune: far smaller than the full level-8 grid
        assert 0 < len(cover) < 4 ** 8


class TestPrunedBboxJoin:
    @pytest.fixture(scope="class")
    def geoms_df(self, spark):
        g = _random_boxes(3000, span=2_000_000)
        cells = calculate_cells(g[:, 0], g[:, 1], g[:, 2], g[:, 3], 0.05, 18)
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "gid": np.arange(3000),
                "minx": g[:, 0], "miny": g[:, 1],
                "maxx": g[:, 2], "maxy": g[:, 3],
                "cell": cells,
            }
        )
        return spark.createDataFrame(pdf)

    def test_pruned_equals_unpruned(self, spark, geoms_df):
        boxes = _random_boxes(8, span=8_000_000)
        qdf = spark.createDataFrame(
            [(i, int(b[0]), int(b[1]), int(b[2]), int(b[3]))
             for i, b in enumerate(boxes)],
            "query_id long, qminx long, qminy long, qmaxx long, qmaxy long",
        )
        pruned = set(
            (r["query_id"], r["gid"])
            for r in bbox_join(qdf, geoms_df).select("query_id", "gid")
            .collect()
        )
        nlj = set(
            (r["query_id"], r["gid"])
            for r in bbox_join(qdf, geoms_df.drop("cell"))
            .select("query_id", "gid").collect()
        )
        assert pruned == nlj
        assert len(nlj) > 0

    def test_pruned_plan_is_hash_join_and_scans_less(self, spark, geoms_df):
        qdf = spark.createDataFrame(
            [(1, -6_000_000, 503_000_000, -4_000_000, 507_000_000)],
            "query_id long, qminx long, qminy long, qmaxx long, qmaxy long",
        )
        pruned = bbox_join(qdf, geoms_df)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan[:2000]
        assert "BroadcastNestedLoopJoin" not in plan
        # the equi-join keeps only cover-matching rows before the residual
        n_pruned_input = (
            geoms_df.withColumn("__rc", F.expr(
                "case when (greatest(cell, 0L) & 31) < 8 then "
                "greatest(cell, 0L) else (shiftleft(shiftright("
                "greatest(cell, 0L), 47), 47) + 8) end"))
            .join(
                spark.createDataFrame(
                    [(int(c),) for c in cover_cells(
                        -6_000_000, 503_000_000, -4_000_000, 507_000_000,
                        8, 0.05)],
                    "p long"),
                F.col("__rc") == F.col("p"))
            .count()
        )
        assert n_pruned_input < geoms_df.count()


class TestKnnCellJoinPlan:
    """Round-3: the escalation join must be an equi (hash) join, never a
    BroadcastNestedLoopJoin — per-level literal keys make it separable."""

    @pytest.fixture(scope="class")
    def points_df(self, spark):
        import pandas as pd

        n = 4000
        lon = RNG.integers(-20_000_000, 20_000_000, n)
        lat = RNG.integers(495_000_000, 525_000_000, n)
        pdf = pd.DataFrame(
            {"node_id": np.arange(n, dtype=np.int64), "lon": lon, "lat": lat}
        )
        return spark.createDataFrame(pdf)

    def test_cell_knn_equals_brute_and_plans_hash_join(self, spark,
                                                       points_df):
        from osmquadtree_depreceated_spark.operators.spatial_join import (
            knn_cell_join,
            knn_join,
        )

        queries = [
            (1, -5_000_000, 505_000_000),
            (2, 15_000_000, 520_000_000),
            (3, 0, 500_000_000),
        ]
        qdf = spark.createDataFrame(
            queries, "query_id long, qlon long, qlat long"
        )
        plans = []
        cell = knn_cell_join(queries, points_df, 5, spark=spark,
                             plan_capture=plans)
        brute = knn_join(qdf, points_df, 5)
        crows = sorted(
            (r["query_id"], r["rank"], r["node_id"], r["dist2"])
            for r in cell.collect()
        )
        brows = sorted(
            (r["query_id"], r["rank"], r["node_id"], r["dist2"])
            for r in brute.collect()
        )
        assert crows == brows
        assert len(plans) >= 2  # >=1 escalation round + the final pass
        for p in plans:
            assert "BroadcastNestedLoopJoin" not in p, p[:3000]
            assert "BroadcastHashJoin" in p or "BroadcastExchange" in p, \
                p[:3000]
