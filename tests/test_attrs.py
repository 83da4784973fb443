"""Attribute-inheritance joins: node<-parent-way, way<-parent-relations."""

from osmquadtree_depreceated_spark.operators.attrs import (
    add_node_parent,
    add_relation_range,
)


def test_node_parent_max_zorder_wins(spark):
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "node_id long")
    way_refs = spark.createDataFrame(
        [(10, 1, 1), (11, 1, 1), (12, 1, 2)],
        "way_id long, pos long, ref long",
    )
    way_attrs = spark.createDataFrame(
        [(10, 3, "residential"), (11, 9, "motorway"), (12, 5, "primary")],
        "way_id long, z_order long, value string",
    )
    got = {r["node_id"]: r["parent_highway"]
           for r in add_node_parent(nodes, way_refs, way_attrs).collect()}
    assert got[1] == "motorway"  # z 9 beats z 3
    assert got[2] == "primary"
    assert got[3] is None  # no parent way


def test_node_parent_tie_takes_max_value(spark):
    nodes = spark.createDataFrame([(1,)], "node_id long")
    way_refs = spark.createDataFrame(
        [(10, 1, 1), (11, 1, 1)], "way_id long, pos long, ref long"
    )
    way_attrs = spark.createDataFrame(
        [(10, 5, "alpha"), (11, 5, "beta")],
        "way_id long, z_order long, value string",
    )
    got = add_node_parent(nodes, way_refs, way_attrs).collect()[0]
    assert got["parent_highway"] == "beta"


def test_relation_range_aggregates(spark):
    ways = spark.createDataFrame([(1,), (2,), (3,)], "way_id long")
    members = spark.createDataFrame(
        [(100, 1), (101, 1), (102, 2)], "rel_id long, ref long"
    )
    rel_tags = spark.createDataFrame(
        [(100, 4, "R7"), (101, 8, "R2"), (102, None, "R2")],
        "rel_id long, admin_level int, route_ref string",
    )
    got = {r["way_id"]: r
           for r in add_relation_range(ways, members, rel_tags).collect()}
    assert got[1]["min_admin"] == 4 and got[1]["max_admin"] == 8
    assert list(got[1]["route_refs"]) == ["R2", "R7"]
    assert got[2]["min_admin"] is None
    assert list(got[2]["route_refs"]) == ["R2"]
    assert got[3]["route_refs"] is None  # no parent relations
