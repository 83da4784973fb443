"""Attribute-inheritance joins: node←parent-way and way←parent-relation.

Reference semantics:
  * AddNodeParent (/root/reference/geometry/nodeparent.go:13-26 +
    zorder.go:242-279 FindParentHighway): a tagged node inherits a tag
    value from the parent ways that share the tag key; among candidate
    parents the HIGHEST z-order way wins (ties keep the max value string).
  * AddRelationRange (/root/reference/geometry/relationrange.go:24-77):
    a way inherits aggregated tags from its parent relations — min/max of
    an integer tag (admin_level) and the sorted distinct list of a string
    tag (route refs).

Both are explode→join→groupBy aggregations — one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def add_node_parent(nodes_tagged: DataFrame, way_refs: DataFrame,
                    way_attrs: DataFrame, key: str = "highway",
                    out_col: str = "parent_highway") -> DataFrame:
    """nodes_tagged(node_id, ...) × parent ways carrying `key`:
    pick the value from the max-z-order parent (max_by), ties broken by the
    larger value string (mirroring the reference's scan-max update rule).

    way_attrs: (way_id, z_order, value) — pre-filtered to ways having `key`.
    """
    parents = (
        way_refs.join(way_attrs, "way_id")
        .groupBy("ref")
        .agg(
            F.max(F.struct("z_order", "value")).alias("_best")
        )
        .select(
            F.col("ref").alias("node_id"),
            F.col("_best.value").alias(out_col),
        )
    )
    return nodes_tagged.join(parents, "node_id", "left")


def add_relation_range(ways: DataFrame, rel_way_members: DataFrame,
                       rel_tags: DataFrame,
                       int_key_col: str = "admin_level",
                       list_key_col: str = "route_ref") -> DataFrame:
    """Ways inherit aggregated parent-relation tags
    (relationrange.go:24-77): min/max of the integer tag and the sorted
    distinct list of the string tag.

    rel_way_members: (rel_id, ref) way members;
    rel_tags: (rel_id, admin_level int/null, route_ref string/null).
    Appends min_admin, max_admin, route_refs (sorted array) to ways.
    """
    joined = rel_way_members.join(rel_tags, "rel_id").select(
        F.col("ref").alias("way_id"),
        F.col(int_key_col).alias("_int"),
        F.col(list_key_col).alias("_lst"),
    )
    agg = joined.groupBy("way_id").agg(
        F.min("_int").alias("min_admin"),
        F.max("_int").alias("max_admin"),
        F.sort_array(
            F.array_distinct(
                F.collect_list(F.col("_lst"))
            )
        ).alias("route_refs"),
    )
    return ways.join(agg, "way_id", "left")
