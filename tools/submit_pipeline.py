#!/usr/bin/env python
"""spark-submit entry point for the flagship calcqts pipeline.

The north rule requires the pipeline to run "via spark-submit --py-files
on a multi-executor cluster".  This script is that deployment surface:

    spark-submit --master <cluster> \\
        --py-files osmquadtree_depreceated_spark.zip \\
        tools/submit_pipeline.py <sf_dir> <out_dir> [buffer] [max_level]

It deliberately does NOT sys.path-hack the repo root: the engine package
must arrive through --py-files (or an installed wheel), exactly as on a
real cluster — tests/test_submit.py zips the package and drives this
script through an actual spark-submit subprocess.

The job runs the resumable snapshot pipeline (plans/lineage.py): every
stage commits parquet + per-partition lineage rows (cell range, row
count, checksum, snapshot id) under <out_dir>, so a killed job rerun
with the same <out_dir> resumes at the first uncommitted stage.  It
finishes with the cell-partitioned serving write and prints ONE JSON
summary line.
"""

import json
import os
import sys


def main():
    sf_dir = sys.argv[1]
    out_dir = sys.argv[2]
    buffer = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
    max_level = int(sys.argv[4]) if len(sys.argv) > 4 else 18

    from pyspark.sql import SparkSession

    from osmquadtree_depreceated_spark.plans.lineage import (
        SnapshotStore,
        calcqts_pipeline,
    )
    from osmquadtree_depreceated_spark.plans.partitioned import (
        write_cell_partitioned,
    )
    from osmquadtree_depreceated_spark.sources import tpch

    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("osmquadtree-submit").getOrCreate()
    from osmquadtree_depreceated_spark.conf import apply_engine_conf

    apply_engine_conf(spark)
    tpch.load_base_tables(spark, sf_dir)
    tpch.register_synth_views(spark)
    nodes = spark.table("nodes")
    way_refs = spark.table("way_refs")
    rels = spark.table("rels").select(
        "rel_id", F.lit("w").alias("mtype"),
        F.col("member_way").alias("ref"),
    )

    store = SnapshotStore(os.path.join(out_dir, "snapshots"))
    resumed = [s for s in ("way_bbox", "way_cells", "node_cells")
               if store.has(s)]
    out = calcqts_pipeline(
        spark, store, nodes, way_refs, rel_members=rels,
        buffer=buffer, max_level=max_level,
    )

    serving = os.path.join(out_dir, "way_geoms")
    write_cell_partitioned(
        out["way_cells"].join(out["way_bbox"], "way_id"), serving, level=6
    )

    counts = {k: v.count() for k, v in out.items()}
    lineage_files = sorted(
        os.listdir(os.path.join(store.root, "_lineage"))
    )
    print(json.dumps({
        "counts": counts,
        "resumed_stages": resumed,
        "lineage_files": len(lineage_files),
        "serving_path": serving,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
