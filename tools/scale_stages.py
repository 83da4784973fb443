#!/usr/bin/env python
"""Per-stage scaling probe: times each flagship-pipeline stage separately
(own forced action) at one parallelism level, plus the fused single-action
pipeline and a fixed-overhead calibration job, and prints ONE JSON line.

Run by tools/scale_diag.py at local[N] and local[4N] adjacently so the
sub-linear stage can be identified BY NAME instead of guessing from the
whole-pipeline ratio (round-3 verdict ask #1).

usage: python tools/scale_stages.py <cpus> <amplify> [sf_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(os.environ.get("BENCH_PROBE_RUNS", "2"))


def _min_of(fn, runs=RUNS):
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def main():
    cpus = int(sys.argv[1])
    amplify = int(sys.argv[2])
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import bench
    import tools.scale_probe as sp
    from pyspark.sql import functions as F

    from osmquadtree_depreceated_spark import gate
    from osmquadtree_depreceated_spark.operators.calcqts import (
        node_cells, way_bboxes, way_cells,
    )
    from osmquadtree_depreceated_spark.operators.spatial_join import (
        bbox_join, raster_vector_join,
    )

    spark = bench._session(cpus)
    nodes, way_refs = bench._inputs(spark, sf_dir, amplify)
    nodes.cache(); way_refs.cache()
    nodes.count(); way_refs.count()

    # warmup: full fused pipeline (JIT, codegen cache, python workers)
    sp.fused_pipeline(spark, nodes, way_refs, gate.QUERY_BOXES)

    stages = {}
    # fixed-overhead calibration: a trivial job whose work is ~zero — its
    # wall time is pure scheduling/commit overhead and should NOT scale
    stages["calib_trivial_job"] = _min_of(
        lambda: bench._force(spark.range(cpus).select(F.col("id")))
    )

    wb = way_bboxes(way_refs, nodes, salt_buckets=0)
    stages["way_bboxes"] = _min_of(lambda: bench._force(wb))
    wbc = wb.cache(); wbc.count()
    wc = way_cells(wbc, 0.05, 18)
    stages["way_cells_kernel"] = _min_of(lambda: bench._force(wc))
    wcc = wc.cache(); wcc.count()
    stages["node_common_fold"] = _min_of(
        lambda: bench._force(node_cells(nodes, way_refs, wcc, 0.05, 18))
    )
    boxes = spark.createDataFrame(gate.QUERY_BOXES, gate.BOX_COLS)
    stages["bbox_join_rollup"] = _min_of(
        lambda: bench._force(
            raster_vector_join(bbox_join(boxes, wcc.join(wbc, "way_id")), 12)
            .groupBy("query_id", "tile_x", "tile_y", "tile_z")
            .agg(F.count(F.lit(1)).alias("n_ways"))
        )
    )
    stages["node_hist"] = _min_of(
        lambda: bench._force(
            node_cells(nodes, way_refs, wcc, 0.05, 18)
            .groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
        )
    )
    wcc.unpersist(); wbc.unpersist()
    stages["fused_total"] = _min_of(
        lambda: sp.fused_pipeline(spark, nodes, way_refs, gate.QUERY_BOXES)
    )
    print(json.dumps({"cpus": cpus, "amplify": amplify, "stages": stages}))
    spark.stop()


if __name__ == "__main__":
    main()
