"""Plan-shape regression tests: the physical plans the 100-TB story relies
on must stay the plans Catalyst actually picks — column pruning and filter
pushdown reach the parquet scans, serving joins stay hash joins, and the
native cell math stays inside whole-stage codegen."""

import pytest
from pyspark.sql import functions as F

from osmquadtree_depreceated_spark.functions.cells import with_point_cell
from osmquadtree_depreceated_spark.sources import tpch


@pytest.fixture(scope="module")
def prepped(spark, sf_dir):
    tpch.load_base_tables(spark, sf_dir)
    tpch.register_synth_views(spark)
    return spark


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_column_pruning_reaches_scan(prepped):
    # nodes is synthesized from part using ONLY p_partkey: a projection of
    # node_id must scan exactly that one column
    plan = _plan(prepped.table("nodes").select("node_id"))
    assert "ReadSchema: struct<p_partkey:bigint>" in plan, plan[:1500]


def test_filter_pushdown_reaches_scan(prepped):
    df = (
        prepped.table("events")
        .filter(F.col("event_type") == "click")
        .select("event_id")
    )
    plan = _plan(df)
    assert "PushedFilters:" in plan and "event_type" in plan.split(
        "PushedFilters:"
    )[1][:200], plan[:2000]


def test_point_cell_pipeline_is_whole_stage_codegen(prepped):
    df = (
        with_point_cell(prepped.table("nodes"), "lon", "lat", "cell", 18)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    import contextlib
    import io

    df.collect()  # AQE finalizes the physical plan only on execution
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    s = buf.getvalue()
    assert "WholeStageCodegen subtrees" in s and "Found 0" not in s, s[:400]
    plan = _plan(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_serving_join_has_no_nested_loop(prepped):
    from osmquadtree_depreceated_spark.operators.calcqts import (
        way_bboxes,
        way_cells,
    )
    from osmquadtree_depreceated_spark.operators.spatial_join import (
        bbox_join,
    )
    from osmquadtree_depreceated_spark import gate

    wb = way_bboxes(prepped.table("way_refs"), prepped.table("nodes"))
    geoms = wb.join(way_cells(wb, 0.05, 18), "way_id")
    boxes = prepped.createDataFrame(gate.QUERY_BOXES, gate.BOX_COLS)
    plan = _plan(bbox_join(boxes, geoms))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_common_fold_aggregate_is_partial(prepped):
    # the Common fold must run as hash aggregates with a map-side partial
    # (two HashAggregate nodes around the exchange), keeping hot nodes from
    # concentrating on one reducer
    from osmquadtree_depreceated_spark.functions.cells import (
        common_agg,
        with_common_finish,
    )

    wcells = prepped.table("way_refs").select(
        "way_id", (F.col("way_id") % 1000 + 18).alias("cell")
    )
    agg = with_common_finish(
        prepped.table("way_refs")
        .join(wcells, "way_id")
        .groupBy("ref")
        .agg(*common_agg("cell")),
        out="cell",
    )
    plan = _plan(agg)
    assert plan.count("HashAggregate") >= 2, plan[:2000]
