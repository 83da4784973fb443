"""Snapshot + lineage bookkeeping: every pipeline stage lands in a
snapshot-committed table with per-partition lineage rows, and a killed job
resumes from the last committed stage without recomputation.

Local backend: Parquet directories + atomically-renamed JSON manifests (the
rename is the commit point — a kill before it leaves the stage uncommitted
and it simply rebuilds).  The API is Iceberg-shaped on purpose: on a real
cluster `write` maps to `df.writeTo(table).createOrReplace()` (snapshot id =
Iceberg snapshot), `has/read` to catalog lookups, and the lineage table to a
plain appended Iceberg table.  Mirrors the role of the reference's
LocationsCache + tile files (/root/reference/locationscache/
locationscache.go:32-54, update/update.go:343-472): the store IS the
id->tile index that incremental update reads.

Lineage row: (stage, partition_id, cell_min, cell_max, row_count, checksum,
snapshot_id, wall_ms) — checksum is an order-insensitive sum of per-row
xxhash64 over all columns, so two runs of a deterministic stage can be
compared cheaply at table or partition level.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def partition_lineage(df: DataFrame, cell_col: str | None = "cell") -> list:
    """Per-partition lineage aggregation — the ONE definition of the
    recorded metadata: (partition_id, cell_min, cell_max, row_count,
    checksum).  checksum folds per-row xxhash64 to 32 bits before an
    order-insensitive sum so the aggregate cannot overflow int64 under
    ANSI mode.  Used by SnapshotStore.write at record time and by the
    q58 gate's independent recompute over the stored parquet."""
    cell_min = (
        F.min(cell_col) if cell_col and cell_col in df.columns
        else F.lit(None).cast("long")
    )
    cell_max = (
        F.max(cell_col) if cell_col and cell_col in df.columns
        else F.lit(None).cast("long")
    )
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            cell_min.alias("cell_min"),
            cell_max.alias("cell_max"),
            F.count(F.lit(1)).alias("row_count"),
            F.sum(F.pmod(F.xxhash64(*df.columns),
                         F.lit(4294967296))).alias("checksum"),
        )
    ).collect()


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "_lineage"), exist_ok=True)

    # ------------------------------------------------------------- paths
    def _data_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, "_manifests", f"{stage}.json")

    # ---------------------------------------------------------- contract
    def has(self, stage: str) -> bool:
        return os.path.exists(self._manifest_path(stage))

    def manifest(self, stage: str) -> dict:
        with open(self._manifest_path(stage)) as f:
            return json.load(f)

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(self._data_dir(stage))

    def write(self, spark: SparkSession, stage: str, df: DataFrame,
              cell_col: str | None = "cell") -> DataFrame:
        """Materialize `df` as the stage's snapshot: write parquet, derive
        per-partition lineage rows, then atomically commit the manifest."""
        t0 = time.time()
        data_dir = self._data_dir(stage)
        if os.path.isdir(data_dir) and os.listdir(data_dir):
            # overwrite of an EXISTING stage = the replay/self-heal
            # window, where df's lazy plan may read the very files this
            # overwrite is about to delete (a replayed batch derives its
            # outputs from the stage it previously committed).  Eagerly
            # materialize the plan while the old files still exist, so
            # the write neither dies FILE_NOT_EXIST nor silently re-reads
            # half-overwritten data.  Paid only on overwrites; on a real
            # cluster prefer a reliable checkpoint dir to localCheckpoint
            # if executor loss during recovery is a concern.
            df = df.localCheckpoint(eager=True)
        df.write.mode("overwrite").parquet(data_dir)
        # drop the shared file-index cache entry for the path — a reader
        # that listed the pre-overwrite files would otherwise die
        # FILE_NOT_EXIST on the deleted parts
        spark.catalog.refreshByPath(data_dir)
        written = spark.read.parquet(data_dir)

        lineage = partition_lineage(written, cell_col)

        snapshot_id = int(time.time() * 1000)
        wall_ms = int((time.time() - t0) * 1000)
        lineage_rows = [
            {
                "stage": stage,
                "partition_id": int(r["_pid"]),
                "cell_min": None if r["cell_min"] is None else int(r["cell_min"]),
                "cell_max": None if r["cell_max"] is None else int(r["cell_max"]),
                "row_count": int(r["row_count"]),
                "checksum": None if r["checksum"] is None else int(r["checksum"]),
                "snapshot_id": snapshot_id,
                "wall_ms": wall_ms,
            }
            for r in lineage
        ]
        with open(
            os.path.join(self.root, "_lineage", f"{stage}.{snapshot_id}.json"),
            "w",
        ) as f:
            json.dump(lineage_rows, f)

        manifest = {
            "stage": stage,
            "snapshot_id": snapshot_id,
            "row_count": sum(r["row_count"] for r in lineage_rows),
            "checksum": sum(
                r["checksum"] or 0 for r in lineage_rows
            ) % (1 << 63),
            "wall_ms": wall_ms,
            "n_partitions": len(lineage_rows),
        }
        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, self._manifest_path(stage))  # the commit point
        return written

    def run_stage(self, spark: SparkSession, stage: str, builder,
                  cell_col: str | None = "cell") -> DataFrame:
        """Resume-aware stage execution: committed stages are read back
        (skipping recompute); uncommitted ones build + snapshot."""
        if self.has(stage):
            return self.read(spark, stage)
        return self.write(spark, stage, builder(), cell_col)

    def invalidate(self, stage: str) -> None:
        """Drop a stage's commit (its data dir may remain; it will be
        overwritten on rebuild)."""
        p = self._manifest_path(stage)
        if os.path.exists(p):
            os.remove(p)

    def lineage_rows(self, stage: str) -> list:
        out = []
        d = os.path.join(self.root, "_lineage")
        for fn in sorted(os.listdir(d)):
            if fn.startswith(stage + "."):
                with open(os.path.join(d, fn)) as f:
                    out.extend(json.load(f))
        return out


def calcqts_pipeline(spark: SparkSession, store: SnapshotStore,
                     nodes: DataFrame, way_refs: DataFrame,
                     rel_members: DataFrame | None = None,
                     buffer: float = 0.05, max_level: int = 18) -> dict:
    """The full calcqts pipeline as resumable snapshot stages (SURVEY.md
    §3.2 as four committed tables).  Each stage reads the previous stage's
    SNAPSHOT, not its logical plan — so a kill between stages resumes
    exactly at the first uncommitted stage."""
    from ..operators.calcqts import (
        node_cells, relation_cells, way_bboxes, way_cells,
    )

    wb = store.run_stage(
        spark, "way_bbox", lambda: way_bboxes(way_refs, nodes, salt_buckets=0),
        cell_col=None,
    )
    wc = store.run_stage(
        spark, "way_cells", lambda: way_cells(wb, buffer, max_level)
    )
    nc = store.run_stage(
        spark, "node_cells",
        lambda: node_cells(nodes, way_refs, wc, buffer, max_level),
    )
    out = {"way_bbox": wb, "way_cells": wc, "node_cells": nc}
    if rel_members is not None:
        out["rel_cells"] = store.run_stage(
            spark, "rel_cells",
            lambda: relation_cells(rel_members, wc, nc),
        )
    return out
