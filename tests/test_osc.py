"""OSC XML source: parse semantics, gzip, distributed read, update feed."""

import gzip

from osmquadtree_depreceated_spark.sources.osc import (
    osc_node_changes,
    parse_osc_bytes,
    read_osc_files,
)

OSC = b"""<?xml version='1.0' encoding='UTF-8'?>
<osmChange version="0.6" generator="test">
 <create>
  <node id="101" version="1" timestamp="2024-01-01T00:00:00Z"
        changeset="7" lat="51.2796351" lon="0.3027582">
   <tag k="amenity" v="cafe"/>
  </node>
  <way id="201" version="1" changeset="7">
   <nd ref="101"/><nd ref="102"/>
   <tag k="highway" v="primary"/>
  </way>
 </create>
 <modify>
  <node id="102" version="3" changeset="8" lat="-0.5" lon="-1.25"/>
  <relation id="301" version="2" changeset="8">
   <member type="way" ref="201" role="outer"/>
   <member type="node" ref="101" role=""/>
   <tag k="type" v="multipolygon"/>
  </relation>
 </modify>
 <delete>
  <node id="103" version="9" changeset="9" lat="1.0" lon="1.0"/>
 </delete>
</osmChange>
"""


def test_parse_semantics():
    rows = {(r["etype"], r["id"]): r for r in parse_osc_bytes(OSC)}
    assert len(rows) == 5
    n = rows[("n", 101)]
    assert n["change_type"] == "create"
    # ftoi: round half away from zero (xmlread.go:45-50)
    assert n["lon"] == 3027582 and n["lat"] == 512796351
    assert n["tags"] == {"amenity": "cafe"}
    m = rows[("n", 102)]
    assert m["change_type"] == "modify"
    assert m["lon"] == -12500000 and m["lat"] == -5000000
    w = rows[("w", 201)]
    assert w["refs"] == [101, 102]
    r = rows[("r", 301)]
    assert r["members"] == [
        {"mtype": "w", "ref": 201, "role": "outer"},
        {"mtype": "n", "ref": 101, "role": ""},
    ]
    assert rows[("n", 103)]["change_type"] == "delete"


def test_gzip_transparent():
    rows = parse_osc_bytes(gzip.compress(OSC))
    assert len(rows) == 5


def test_distributed_read_and_node_feed(spark, tmp_path):
    p1 = tmp_path / "a.osc"
    p1.write_bytes(OSC)
    p2 = tmp_path / "b.osc.gz"
    p2.write_bytes(gzip.compress(OSC.replace(b'id="101"', b'id="111"')))
    df = read_osc_files(spark, [str(p1), str(p2)])
    assert df.count() == 10
    nodes = osc_node_changes(df)
    got = {(r["node_id"], r["change_type"]) for r in nodes.collect()}
    assert (101, "create") in got and (111, "create") in got
    assert (103, "delete") in got
    assert {r["seq"] for r in nodes.filter("node_id = 102").collect()} == {3}


def test_element_free_diff_yields_empty_frame(spark, tmp_path):
    """Empty replication diffs (no elements at all) must parse to zero rows,
    not crash the partition (regression: the empty-batch fallback derived
    bogus column names from the schema string)."""
    p = tmp_path / "empty.osc"
    p.write_bytes(b"<?xml version='1.0'?><osmChange version=\"0.6\"></osmChange>")
    df = read_osc_files(spark, [str(p)])
    assert df.count() == 0
    assert "tags" in df.columns
