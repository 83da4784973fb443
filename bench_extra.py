#!/usr/bin/env python
"""Per-stage isolation benchmarks (optimization round r06).

NOT the driver's bench — bench.py stays frozen.  This harness times each
bench stage in isolation with the noop sink (guide §1.4), optionally
captures .explain("formatted") per stage into plans/r06/, and breaks the
composite stages (partitioned_write, geomblob) into their parts so the
optimization work targets the real cost, not the stage label.

Usage:
  python bench_extra.py [stage ...]        # default: all stages
  BENCH_EXTRA_PLANS=before python bench_extra.py   # also dump plans
Env mirrors bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS = os.environ.get("BENCH_EXTRA_PLANS")  # e.g. "before" / "after"
REPEAT = int(os.environ.get("BENCH_EXTRA_REPEAT", "2"))


def _session():
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"osmquadtree-bench-extra-{CPUS}")
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
    )
    s = b.getOrCreate()
    from osmquadtree_depreceated_spark.conf import apply_engine_conf

    apply_engine_conf(s)
    return s


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _dump_plan(df, name: str):
    if not PLANS:
        return
    os.makedirs("plans/r06", exist_ok=True)
    with open(f"plans/r06/{name}_{PLANS}.txt", "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))


def main():
    from pyspark.sql import functions as F

    from osmquadtree_depreceated_spark import gate
    from osmquadtree_depreceated_spark.functions.cells import with_point_cell
    from osmquadtree_depreceated_spark.operators.calcqts import (
        node_cells, way_bboxes, way_cells,
    )
    from osmquadtree_depreceated_spark.operators.spatial_join import (
        bbox_join, raster_vector_join,
    )

    want = set(sys.argv[1:])
    spark = _session()
    sc = spark.sparkContext
    timings: dict[str, list[float]] = {}

    import bench as bench_mod
    nodes, way_refs = bench_mod._inputs(spark, SF_DIR, 1)
    nodes.cache()
    way_refs.cache()
    n_nodes, n_refs = nodes.count(), way_refs.count()
    print(f"# nodes={n_nodes} refs={n_refs}", file=sys.stderr)

    def stage(name, mk, warm: bool = True):
        if want and name not in want:
            return
        sc.setJobDescription(name)
        df = mk()
        _dump_plan(df, name)
        reps = REPEAT + (1 if warm else 0)
        for i in range(reps):
            t0 = time.time()
            _force(df)
            dt = round(time.time() - t0, 3)
            if warm and i == 0:
                continue  # discard warmup rep
            timings.setdefault(name, []).append(dt)
        sc.setJobDescription(None)

    # --- headline stages, isolated ---
    stage("point_cells_native", lambda: (
        with_point_cell(nodes, "lon", "lat", "cell", 18)
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n"))))

    stage("way_bboxes_only", lambda: way_bboxes(way_refs, nodes))

    stage("way_cells_full", lambda: way_cells(
        way_bboxes(way_refs, nodes), 0.05, 18))

    # node_common_fold exactly as the bench composes it (wc uncached here
    # to see the full recompute cost; the bench caches wc first)
    wb = way_bboxes(way_refs, nodes).cache()
    wc = way_cells(wb, 0.05, 18).cache()
    wc.count()
    stage("node_common_fold", lambda: node_cells(
        nodes, way_refs, wc, 0.05, 18))

    boxes = spark.createDataFrame(gate.QUERY_BOXES, gate.BOX_COLS)
    geoms = wc.join(wb, "way_id")
    stage("geoms_materialize", lambda: geoms)
    stage("bbox_join_raster_rollup", lambda: (
        raster_vector_join(bbox_join(boxes, geoms), 12)
        .groupBy("query_id", "tile_x", "tile_y", "tile_z")
        .agg(F.count(F.lit(1)).alias("n_ways"))))
    wc.unpersist()
    wb.unpersist()

    # --- partitioned serving, decomposed ---
    if not want or {"pw_compute", "pw_write", "pw_serving"} & want:
        import shutil
        import tempfile

        from osmquadtree_depreceated_spark.plans.partitioned import (
            pruned_tile_scan, write_cell_partitioned,
        )

        work = tempfile.mkdtemp(prefix="bench_extra_parts_")
        path = os.path.join(work, "way_geoms")
        try:
            wb2 = way_bboxes(way_refs, nodes, salt_buckets=0)
            geoms2 = way_cells(wb2, 0.05, 18).join(wb2, "way_id")
            stage("pw_compute", lambda: geoms2)
            _dump_plan(geoms2, "partitioned_write_input")
            for i in range(REPEAT):
                sc.setJobDescription("pw_write")
                t0 = time.time()
                write_cell_partitioned(geoms2, path, level=6)
                timings.setdefault("pw_write", []).append(
                    round(time.time() - t0, 3))
            sc.setJobDescription("pw_serving")
            # warmup one scan then time the 8-box loop like the bench
            _force(pruned_tile_scan(spark, path,
                                    *gate.QUERY_BOXES[0][1:5], level=6))
            _dump_plan(pruned_tile_scan(spark, path,
                                        *gate.QUERY_BOXES[0][1:5], level=6),
                       "pruned_tile_scan")
            for i in range(REPEAT):
                t0 = time.time()
                for b in gate.QUERY_BOXES:
                    _force(pruned_tile_scan(spark, path, b[1], b[2], b[3],
                                            b[4], level=6))
                timings.setdefault("pw_serving_8q", []).append(
                    round(time.time() - t0, 3))
            sc.setJobDescription(None)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    # --- ANN ---
    if not want or "ann" in want:
        from osmquadtree_depreceated_spark.operators.ann import ivf_topk

        emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        queries = emb.limit(32).select("vec_id", "embedding")
        for i in range(REPEAT + 1):
            sc.setJobDescription("ann_ivf_topk_32q")
            t0 = time.time()
            _force(ivf_topk(queries, emb, 10))
            if i:
                timings.setdefault("ann_ivf_topk_32q", []).append(
                    round(time.time() - t0, 3))
        sc.setJobDescription(None)

    # --- geomblob, decomposed ---
    if not want or {"gb_points", "gb_ways", "gb_coords"} & want:
        from osmquadtree_depreceated_spark.functions.geomblob import (
            pack_linestring_udf, pack_point_udf, parse_geomblob_udf,
        )
        from osmquadtree_depreceated_spark.operators.geometry import (
            add_way_coords,
        )

        parse = parse_geomblob_udf()
        wcoords = add_way_coords(way_refs, nodes)
        stage("gb_way_coords_only", lambda: wcoords)
        pts_packed = nodes.withColumn(
            "blob", pack_point_udf()(F.col("node_id"), F.col("lon"),
                                     F.col("lat"), F.lit(0))).select("blob")
        stage("gb_points_pack_only", lambda: pts_packed)
        stage("gb_points_pack_decode", lambda: nodes.withColumn(
            "blob", pack_point_udf()(F.col("node_id"), F.col("lon"),
                                     F.col("lat"), F.lit(0)),
        ).select(parse(F.col("blob")).alias("d")).select("d.np"))
        ways_packed = add_way_coords(way_refs, nodes).withColumn(
            "blob",
            pack_linestring_udf()("refs", "lons", "lats",
                                  (F.col("way_id") % 1001 - 500), F.lit(1)),
        ).select("blob")
        stage("gb_ways_pack_only", lambda: ways_packed)
        stage("gb_ways_pack_decode", lambda: add_way_coords(
            way_refs, nodes).withColumn(
            "blob",
            pack_linestring_udf()("refs", "lons", "lats",
                                  (F.col("way_id") % 1001 - 500), F.lit(1)),
        ).select(parse(F.col("blob")).alias("d")).select("d.np"))

    out = {k: {"min": min(v), "all": v} for k, v in timings.items()}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
