"""Incremental change-merge operators.

Reference semantics:
  * filterLastObj — keep only the newest version of each element in a change
    batch (/root/reference/update/update.go:69-110);
  * MergeOrigAndChange — apply a merged change stream to the base stream
    with Delete/Modify/Create semantics (/root/reference/change/
    mergechange.go:18-65): Delete drops the base row, Modify/Create replace
    it, Create of an unseen key inserts.

Both are pure relational ops: a window dedup and a full-outer join — at
production scale the same semantics run as `MERGE INTO` against the
snapshot-versioned table (plans/lineage.py), reading only affected cell
partitions (update.go:343-472)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

CT_DELETE = "delete"
CT_MODIFY = "modify"
CT_CREATE = "create"


def latest_version(df: DataFrame, key_cols, order_cols) -> DataFrame:
    """Newest row per key (filterLastObj, update.go:69-110).  order_cols are
    (column, 'asc'|'desc') pairs; add a unique tiebreaker for determinism."""
    order = [
        F.col(c).desc() if d == "desc" else F.col(c).asc()
        for c, d in order_cols
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_changes(base: DataFrame, changes: DataFrame, key: str,
                  ct_col: str = "change_type", seq_col: str = "seq",
                  val_cols=("val",)) -> DataFrame:
    """Apply a change batch to a base table (mergechange.go:18-65).

    base: (key, *val_cols); changes: (key, seq, change_type, *val_cols).
    The newest change per key wins (filterLastObj), then:
      delete -> row removed; modify/create -> change values replace base;
      keys without changes pass through.
    """
    last = latest_version(changes, [key], [(seq_col, "desc")])
    merged = base.alias("b").join(
        last.alias("c"), F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer"
    )
    keep = F.col(f"c.{ct_col}").isNull() | (F.col(f"c.{ct_col}") != CT_DELETE)
    out_cols = [
        F.coalesce(F.col(f"b.{key}"), F.col(f"c.{key}")).alias(key)
    ] + [
        F.when(
            F.col(f"c.{ct_col}").isin(CT_MODIFY, CT_CREATE), F.col(f"c.{v}")
        )
        .otherwise(F.col(f"b.{v}"))
        .alias(v)
        for v in val_cols
    ]
    return merged.filter(keep).select(*out_cols)
