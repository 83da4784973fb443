"""Incremental change feeds: batch-incremental (the reference's daily-diff
model) and Structured Streaming micro-batches.

Reference semantics chain: filterLastObj (newest version per element in a
batch, update.go:69-110) -> MergeOrigAndChange (delete/modify/create apply,
mergechange.go:18-65) -> recompute affected tiles only (update.go:343-472).
Here each applied batch commits a new snapshot in the SnapshotStore, so the
stream is resumable: a killed consumer re-reads the last committed snapshot
and (with checkpointed offsets) replays only unapplied batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.update import merge_changes
from ..plans.lineage import SnapshotStore


def apply_change_batches(spark: SparkSession, store: SnapshotStore,
                         base_stage: str, batches, key: str = "key",
                         ct_col: str = "change_type", seq_col: str = "seq",
                         val_cols=("val",), cell_col=None) -> DataFrame:
    """Apply change batches in order, committing a snapshot per batch
    (stages `{base_stage}@1..N`).  Resume: already-committed batch stages
    are skipped, mirroring snapshot-checkpointed MERGE INTO."""
    cur = store.read(spark, base_stage)
    for i, batch in enumerate(batches, start=1):
        stage = f"{base_stage}@{i}"
        if store.has(stage):
            cur = store.read(spark, stage)
            continue
        cur = store.write(
            spark, stage,
            merge_changes(cur, batch, key, ct_col, seq_col, val_cols),
            cell_col,
        )
    return cur


def stream_apply_changes(spark: SparkSession, store: SnapshotStore,
                         base_stage: str, stream_df: DataFrame,
                         checkpoint_dir: str, key: str = "key",
                         ct_col: str = "change_type", seq_col: str = "seq",
                         val_cols=("val",)):
    """Structured Streaming consumer: each micro-batch of change rows merges
    into the current snapshot via foreachBatch (the canonical
    stream-into-table upsert shape; with Iceberg this body is a single
    MERGE INTO).  Offsets checkpoint to `checkpoint_dir`, snapshots commit
    per batch — both sides of the resume story."""

    def _apply(batch_df: DataFrame, batch_id: int):
        stage = f"{base_stage}@s{batch_id}"
        if store.has(stage) or batch_df.isEmpty():
            return
        # find latest committed state
        cur = store.read(spark, _latest_stage(store, base_stage))
        store.write(spark, stage,
                    merge_changes(cur, batch_df, key, ct_col, seq_col,
                                  val_cols), None)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _latest_stage(store: SnapshotStore, base_stage: str) -> str:
    import os

    best, best_sid = base_stage, store.manifest(base_stage)["snapshot_id"]
    mdir = os.path.join(store.root, "_manifests")
    for fn in os.listdir(mdir):
        if fn.startswith(base_stage + "@") and fn.endswith(".json"):
            stage = fn[: -len(".json")]
            sid = store.manifest(stage)["snapshot_id"]
            if sid > best_sid:
                best, best_sid = stage, sid
    return best
