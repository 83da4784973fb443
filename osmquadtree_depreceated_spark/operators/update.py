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


def calc_update_tiles(nodes: DataFrame, way_refs: DataFrame,
                      way_cells_df: DataFrame, node_cells_df: DataFrame,
                      node_changes: DataFrame, buffer: float = 0.05,
                      max_level: int = 18, group_level: int = 12,
                      store=None, batch_id: str | None = None,
                      missing_node_cap: int | None = None) -> dict:
    """CalcUpdateTiles end-to-end (update/update.go:343-540 +
    locationscache FindTiles): apply a node-change batch and recompute
    cells for ONLY the affected elements, producing tables identical to a
    full recompute over the merged input (the q33 oracle checks exactly
    that).

    Dataflow (every step a semi/anti-join or aggregation — the change
    batch is tiny relative to the base, so each stage touches only the
    affected partitions; with cell-partitioned snapshot tables the
    anti/union merge is an Iceberg MERGE INTO):

      1. merged nodes      = Delete/Modify/Create semantics (mergechange.go)
      2. affected ways     = ways referencing any changed node (FindTiles'
                             id -> tile lookup, here id -> way semi-join)
      3. their cells       = bbox over merged locations -> buffered descent
                             (update.go:412-457); ways left with no nodes
                             drop (matching the full-recompute pipeline)
      4. affected nodes    = changed nodes + every node of an affected way
                             (update.go:459-472 nqts)
      5. their cells       = Common over parent-way cells from the MERGED
                             way-cell table, point-box fallback
      6. merged cell tables = old (anti-join affected) UNION new
      7. affected tiles    = distinct cell_round(old + new cells of touched
                             elements, group_level) — the tile set a tiled
                             store must rewrite

    node_changes: (node_id, seq, change_type in delete/modify/create, lon,
    lat).  Returns dict(nodes, way_cells, node_cells, affected_ways,
    affected_nodes, affected_tiles, missing_refs) — missing_refs is the
    LAZY anti-join DataFrame of affected-way members with no location
    after the merge (count it to get the reference's guard number; it is
    only counted internally when missing_node_cap is set).  With
    `store`, the merged cell tables
    commit as snapshot stages way_cells@{batch_id} / node_cells@{batch_id}
    (resumable; plans/lineage.py).
    """
    from ..functions.cells import cell_round
    from .calcqts import node_cells as _node_cells
    from .calcqts import way_bboxes, way_cells as _way_cells

    merged_nodes = merge_changes(
        nodes, node_changes, "node_id", val_cols=("lon", "lat")
    )
    changed = latest_version(
        node_changes,
        ["node_id"],
        # full-tuple descending order: equal-seq duplicate changes resolve
        # to the same winner as the streaming stateful op's (seq,
        # change_type, value...) tuple max — batch == incremental on ties
        [("seq", "desc"), ("change_type", "desc"),
         ("lon", "desc"), ("lat", "desc")],
    )
    changed_ids = changed.select("node_id").distinct()
    deleted_ids = (
        changed.filter(F.col("change_type") == CT_DELETE)
        .select("node_id").distinct()
    )

    affected_ways = (
        way_refs.join(
            changed_ids, way_refs["ref"] == changed_ids["node_id"],
            "left_semi",
        )
        .select("way_id")
        .distinct()
    )
    aff_refs = way_refs.join(affected_ways, "way_id", "left_semi")
    # Missing-node accounting (update.go:425-437): the reference logs
    # every way member whose location is absent after the merge and
    # PANICS at 100 — a corruption guard on the location cache.  The
    # distributed analogue is an anti-join over the affected subset only
    # (O(changed), not O(base)), returned LAZILY as the `missing_refs`
    # DataFrame — no extra Spark action unless a cap is enforced or the
    # caller counts it.  Cap defaults to None because legitimately
    # deleting a still-referenced node also counts as missing (in the
    # reference too) and synthetic fixtures do that freely; production
    # runs against a trusted cache pass cap=100.
    missing_refs = aff_refs.join(
        merged_nodes, aff_refs["ref"] == merged_nodes["node_id"],
        "left_anti",
    )
    if missing_node_cap is not None:
        n_missing = missing_refs.count()
        if n_missing >= missing_node_cap:
            raise RuntimeError(
                f"too many missing nodes: {n_missing} affected-way "
                f"members have no location after the merge (cap "
                f"{missing_node_cap}; reference panics at 100, "
                "update.go:432-437) — location cache and change feed "
                "disagree"
            )
    new_wc = _way_cells(
        way_bboxes(aff_refs, merged_nodes, salt_buckets=0),
        buffer, max_level,
    )
    merged_wc = (
        way_cells_df.join(affected_ways, "way_id", "left_anti")
        .unionByName(new_wc)
    )

    affected_nodes = (
        aff_refs.select(F.col("ref").alias("node_id"))
        .unionByName(changed_ids)
        .distinct()
        .join(deleted_ids, "node_id", "left_anti")
    )
    # parents of affected nodes only; Common over MERGED way cells
    parent_refs = way_refs.join(
        affected_nodes, way_refs["ref"] == affected_nodes["node_id"],
        "left_semi",
    )
    new_nc = _node_cells(
        merged_nodes.join(affected_nodes, "node_id", "left_semi"),
        parent_refs, merged_wc, buffer, max_level,
    )
    merged_nc = (
        node_cells_df.join(
            affected_nodes.unionByName(deleted_ids).distinct(),
            "node_id", "left_anti",
        )
        .unionByName(new_nc)
    )

    old_cells = (
        way_cells_df.join(affected_ways, "way_id", "left_semi")
        .select("cell")
        .unionByName(
            node_cells_df.join(
                changed_ids.unionByName(
                    affected_nodes.select("node_id")
                ).distinct(),
                "node_id", "left_semi",
            ).select("cell")
        )
    )
    new_cells = new_wc.select("cell").unionByName(new_nc.select("cell"))
    affected_tiles = (
        old_cells.unionByName(new_cells)
        .filter(F.col("cell") >= 0)
        .select(cell_round("cell", group_level).alias("tile_cell"))
        .distinct()
    )

    out = {
        "nodes": merged_nodes,
        "way_cells": merged_wc,
        "node_cells": merged_nc,
        "affected_ways": affected_ways,
        "affected_nodes": affected_nodes,
        "affected_tiles": affected_tiles,
        "missing_refs": missing_refs,
    }
    if store is not None:
        bid = batch_id or "b1"
        spark = nodes.sparkSession
        out["way_cells"] = store.run_stage(
            spark, f"way_cells@{bid}", lambda: merged_wc
        )
        out["node_cells"] = store.run_stage(
            spark, f"node_cells@{bid}", lambda: merged_nc
        )
    return out


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


def asof_join(left: DataFrame, right: DataFrame, key_cols,
              left_ts: str, right_ts: str, right_cols,
              tiebreak_cols=(), how: str = "left") -> DataFrame:
    """As-of join: for every left row, the newest right row with
    right_ts <= left_ts on the same key (the point-in-time lookup the
    reference answers by replaying a change stream up to a timestamp —
    filterLastObj over the prefix, update.go:69-110 — generalized to
    per-probe timestamps).

    Spark-first plan: UNION both sides tagged (right=0 sorts before
    left=1 at equal ts, so equality is inclusive), one window per key
    ordered (ts, side, *tiebreaks), and `last(_r, ignorenulls=True)`
    carries the newest right payload forward; among equal-ts right rows
    the greatest tiebreak tuple wins (ascending sort -> last seen).  The
    payload travels as ONE struct, so genuinely-NULL right values never
    fall through to an older row.  Cost: a single shuffle on key_cols —
    no pair blow-up, no range-join BNLJ; skew behaves like any keyed
    window (AQE skew split / salting apply unchanged).  At 100 TB this
    beats the naive `left join .. on ts <= pts` + row_number plan (the
    oracle's formulation), whose join is quadratic per hot key.

    how='left' keeps probe rows with no prior right row (NULL payload);
    how='inner' drops them.
    """
    key_cols = list(key_cols)
    right_cols = list(right_cols)
    tiebreak_cols = list(tiebreak_cols)
    reserved = {"_ts", "_side", "_r", "_match"} | {
        f"_tb{i}" for i in range(len(tiebreak_cols))
    }
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"asof_join reserved column names in input: "
                         f"{sorted(clash)}")
    overlap = set(right_cols) & set(key_cols)
    if overlap:
        raise ValueError(f"right_cols duplicate key columns: "
                         f"{sorted(overlap)}")
    payload = F.struct(*[F.col(c) for c in right_cols])
    left_keep = [c for c in left.columns
                 if c not in key_cols and c != left_ts]
    r_side = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_tb{i}") for i, c in enumerate(tiebreak_cols)],
        payload.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_keep],
    )
    l_side = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_tb{i}")
          for i, c in enumerate(tiebreak_cols)],
        F.lit(None).cast(r_side.schema["_r"].dataType).alias("_r"),
        *left_keep,
    )
    order = [F.col("_ts").asc(), F.col("_side").asc()] + [
        F.col(f"_tb{i}").asc() for i in range(len(tiebreak_cols))
    ]
    w = (
        Window.partitionBy(*key_cols).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        r_side.unionByName(l_side)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if how == "inner":
        filled = filled.filter(F.col("_match").isNotNull())
    elif how != "left":
        raise ValueError(f"unsupported how={how!r}")
    return filled.select(
        *key_cols,
        F.col("_ts").alias(left_ts),
        *left_keep,
        *[F.col(f"_match.{c}").alias(c) for c in right_cols],
    )


def asof_lookup(left: DataFrame, right_small: DataFrame, key_cols,
                left_ts: str, right_ts: str, right_cols,
                tiebreak_cols=(), how: str = "left") -> DataFrame:
    """As-of join for a SMALL right side (a slowly-changing dimension):
    value-identical to `asof_join`, but the big left side never
    shuffles.  The dimension is collapsed to one row per key holding its
    history as a SORTED array of (ts, *tiebreaks, payload) structs, that
    tiny table is broadcast, and a higher-order `filter` + `element_at
    (…, -1)` picks the newest entry at or before each probe — all
    native expressions, zero exchanges on the fact table.  At 100 TB
    this is the plan for enriching a fact stream against versioned
    reference data: `asof_join`'s one shuffle moves the facts;
    this moves only the dimension history.

    Ties at equal right_ts resolve exactly as in `asof_join` (greatest
    tiebreak tuple wins — the array sorts ascending and the pick takes
    the last qualifying entry).  Per-key history must fit in one array
    (the same bound a broadcast requires anyway)."""
    key_cols = list(key_cols)
    right_cols = list(right_cols)
    tiebreak_cols = list(tiebreak_cols)
    reserved = {"_entries", "_t", "_p", "_pick"} | {
        f"_b{i}" for i in range(len(tiebreak_cols))
    }
    clash = reserved & (set(left.columns) | set(right_small.columns))
    if clash:
        raise ValueError(f"asof_lookup reserved column names in input: "
                         f"{sorted(clash)}")
    if set(right_cols) & set(key_cols):
        raise ValueError("right_cols duplicate key columns")
    entry = F.struct(
        F.col(right_ts).alias("_t"),
        *[F.col(c).alias(f"_b{i}") for i, c in enumerate(tiebreak_cols)],
        F.struct(*[F.col(c) for c in right_cols]).alias("_p"),
    )
    dim = (
        right_small.groupBy(*key_cols)
        .agg(F.sort_array(F.collect_list(entry)).alias("_entries"))
    )
    joined = left.join(F.broadcast(dim), key_cols, "left")
    # try_element_at: an all-future history (or an unmatched key's NULL
    # array) filters to empty and must yield NULL, not error
    pick = F.try_element_at(
        F.filter("_entries", lambda e: e["_t"] <= F.col(left_ts)),
        F.lit(-1),
    )
    out = joined.withColumn("_pick", pick)
    if how == "inner":
        out = out.filter(F.col("_pick").isNotNull())
    elif how != "left":
        raise ValueError(f"unsupported how={how!r}")
    return out.select(
        *[c for c in left.columns],
        *[F.col("_pick._p").getField(c).alias(c) for c in right_cols],
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
    # equal-seq ties break by the full (seq, change_type, values...) tuple
    # descending — the identical total order the streaming filterLastObj
    # (streaming/changes.py stream_latest_version) applies, so batch and
    # incremental paths always pick the same winner
    last = latest_version(
        changes, [key],
        [(seq_col, "desc"), (ct_col, "desc")]
        + [(v, "desc") for v in val_cols],
    )
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
