#!/usr/bin/env python
"""Standalone one-process scaling probe: runs the fused flagship pipeline
once (after warmup) at a given parallelism and prints JSON.  Invoked as a
subprocess by bench.py so JVM/JIT/GC state never leaks between runs.

usage: python tools/scale_probe.py <cpus> <amplify> [sf_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fused_pipeline(spark, nodes, way_refs, boxes_rows):
    """The flagship DAG as few actions as possible: calcqts (way bboxes ->
    way cells -> node common fold) and the query-bbox join + z12 rollup."""
    from pyspark.sql import functions as F

    from osmquadtree_depreceated_spark import gate
    from osmquadtree_depreceated_spark.operators.calcqts import (
        node_cells, way_bboxes, way_cells,
    )
    from osmquadtree_depreceated_spark.operators.spatial_join import (
        bbox_join, raster_vector_join,
    )

    wb = way_bboxes(way_refs, nodes, salt_buckets=0)
    wc = way_cells(wb, 0.05, 18)
    nc = node_cells(nodes, way_refs, wc, 0.05, 18)
    boxes = spark.createDataFrame(boxes_rows, gate.BOX_COLS)
    rollup = (
        raster_vector_join(bbox_join(boxes, wc.join(wb, "way_id")), 12)
        .groupBy("query_id", "tile_x", "tile_y", "tile_z")
        .agg(F.count(F.lit(1)).alias("n_ways"))
    )
    hist = nc.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    # ONE action: union both outputs into a common (k, n) sink shape so the
    # whole flagship is a single job (halves driver-side serial overhead).
    sink = hist.select(F.col("cell").alias("k"), F.col("n")).unionByName(
        rollup.select(
            F.expr(
                "query_id * 1000000000000 + tile_x * 1000000 + tile_y"
            ).alias("k"),
            F.col("n_ways").alias("n"),
        )
    )
    sink.write.format("noop").mode("overwrite").save()


def main():
    cpus = int(sys.argv[1])
    amplify = int(sys.argv[2])
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import bench
    from osmquadtree_depreceated_spark import gate

    spark = bench._session(cpus)
    nodes, way_refs = bench._inputs(spark, sf_dir, amplify)
    nodes.cache(); way_refs.cache()
    n_nodes = nodes.count(); n_refs = way_refs.count()
    fused_pipeline(spark, nodes, way_refs, gate.QUERY_BOXES)  # warmup
    best = None
    for _ in range(int(os.environ.get("BENCH_PROBE_RUNS", "2"))):
        t0 = time.time()
        fused_pipeline(spark, nodes, way_refs, gate.QUERY_BOXES)
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    elements = n_nodes + n_refs
    print(json.dumps({
        "cpus": cpus, "amplify": amplify, "secs": round(best, 3),
        "elements": elements,
        "docs_per_sec": round(elements / best, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
