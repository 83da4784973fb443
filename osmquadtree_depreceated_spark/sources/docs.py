"""The interleaved text+media document source (BASELINE.json input_hint).

Table shape: docs(doc_id: string, spans: array<struct<kind, text, media_ref,
offset>>).  OSM-style elements are encoded inside spans per FIXTURES.md §1;
media spans are payload-opaque ballast that must survive every shuffle
untouched — the per-row invariant is span-sequence equality on
(kind, text, media_ref) in offset order.

`parse_spans` extracts typed element rows NATIVELY (explode + split + cast;
no Python at all), and the original `spans` column is never rewritten —
downstream stages carry `doc_id` and join back, so the invariant holds by
construction.  `spans_checksum` produces the per-row checksum used by tests
and lineage rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType(), False),
                        StructField("text", StringType(), False),
                        StructField("media_ref", StringType(), False),
                        StructField("offset", IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

_TAG_KEYS = ["highway", "name", "amenity", "building", "natural", "area", "type"]
_TAG_VALS = ["primary", "secondary", "alpha", "beta", "yes", "no", "water",
             "multipolygon", "boundary"]
_USERS = ["alice", "bob", "carol", "dave"]


def generate_docs(n_nodes=1500, n_ways=400, n_rels=100, seed=42,
                  lon_range=(-10_000_000, 10_000_000),
                  lat_range=(500_000_000, 520_000_000),
                  hotspot_frac=0.3, edge_cases=False):
    """Deterministic docs generator (FIXTURES.md §1).  Returns
    (docs_rows, truth) where docs_rows is a list of (doc_id, spans) rows and
    truth is a dict of ground-truth element tables for test oracles.

    Node ids are 1..n_nodes; ways reference 2-8 random node ids; relations
    reference ways/nodes/relations.  30% of nodes fall in 3 city hotspots.
    Test scaffolding — bench-scale inputs come from the TPC-H synthesis in
    sources/tpch.py instead.
    """
    rng = np.random.default_rng(seed)
    docs = []
    truth_nodes, truth_ways, truth_rels, truth_tags = [], [], [], {}

    cities = [(-5_000_000, 505_000_000), (3_000_000, 515_000_000),
              (8_000_000, 511_000_000)]

    hot = rng.random(n_nodes) < hotspot_frac
    city_idx = rng.integers(0, 3, n_nodes)
    lon_u = rng.integers(lon_range[0], lon_range[1], n_nodes)
    lat_u = rng.integers(lat_range[0], lat_range[1], n_nodes)
    lon_h = rng.integers(-200_000, 200_000, n_nodes)
    lat_h = rng.integers(-200_000, 200_000, n_nodes)
    lons = np.where(hot, np.array([c[0] for c in cities])[city_idx] + lon_h, lon_u)
    lats = np.where(hot, np.array([c[1] for c in cities])[city_idx] + lat_h, lat_u)

    seq = 0

    def _mk_doc(element_span, extra_rng):
        nonlocal seq
        spans = [element_span]
        n_tags = int(extra_rng.integers(0, 5))
        key_pool = extra_rng.permutation(len(_TAG_KEYS) - 2)[:n_tags]
        for ki in key_pool:
            k = _TAG_KEYS[int(ki)]
            v = _TAG_VALS[int(extra_rng.integers(0, len(_TAG_VALS)))]
            spans.append(("tag", f"{k}={v}", ""))
        if extra_rng.random() < 0.7:
            u = _USERS[int(extra_rng.integers(0, 4))]
            spans.append(
                ("info",
                 f"{int(extra_rng.integers(1, 9))} "
                 f"{1_400_000_000 + int(extra_rng.integers(0, 10_000_000))} "
                 f"{int(extra_rng.integers(1, 100_000))} "
                 f"{int(extra_rng.integers(1, 1000))} {u}", "")
            )
        for m in range(int(extra_rng.integers(0, 3))):
            h = format(int(extra_rng.integers(0, 2**63)), "016x")
            spans.append(("media", f"caption {h[:6]}", f"m://{h}"))
        order = [0] + (1 + extra_rng.permutation(len(spans) - 1)).tolist()
        shuffled = [spans[i] for i in order]
        doc_id = f"d{seq:010d}"
        seq += 1
        rows = [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(shuffled)
        ]
        tags = {}
        for k, t, m in spans:
            if k == "tag":
                kk, vv = t.split("=", 1)
                tags[kk] = vv
        return doc_id, rows, tags

    for i in range(n_nodes):
        nid = i + 1
        doc_id, rows, tags = _mk_doc(
            ("node", f"{nid} {int(lons[i])} {int(lats[i])}", ""), rng
        )
        docs.append((doc_id, rows))
        truth_nodes.append((doc_id, nid, int(lons[i]), int(lats[i])))
        truth_tags[("node", nid)] = tags

    for i in range(n_ways):
        wid = i + 1
        nref = int(rng.integers(2, 9))
        refs = (rng.integers(1, n_nodes + 1, nref)).tolist()
        if edge_cases and i % 37 == 0:
            refs[-1] = n_nodes + 999_999  # missing node ref -> dropped way
        if i % 11 == 0 and nref >= 4:
            refs[-1] = refs[0]  # closed ring
        doc_id, rows, tags = _mk_doc(
            ("way", f"{wid} {','.join(str(r) for r in refs)}", ""), rng
        )
        docs.append((doc_id, rows))
        truth_ways.append((doc_id, wid, refs))
        truth_tags[("way", wid)] = tags

    for i in range(n_rels):
        rid = i + 1
        nm = int(rng.integers(0, 6)) if edge_cases else int(rng.integers(1, 6))
        members = []
        for _ in range(nm):
            mt = ["n", "w", "r"][int(rng.integers(0, 3))]
            ref = int(
                rng.integers(1, {"n": n_nodes, "w": n_ways, "r": n_rels}[mt] + 1)
            )
            role = ["outer", "inner", ""][int(rng.integers(0, 3))]
            members.append((mt, ref, role))
        if edge_cases and i == 7 and n_rels > 9:  # circular pair
            members = [("r", 9, "")]
        if edge_cases and i == 8 and n_rels > 9:
            members = [("r", 8, "")]
        txt = f"{rid} " + ";".join(f"{m}:{r}:{ro}" for m, r, ro in members)
        doc_id, rows, tags = _mk_doc(("relation", txt, ""), rng)
        docs.append((doc_id, rows))
        truth_rels.append((doc_id, rid, members))
        truth_tags[("relation", rid)] = tags

    truth = {
        "nodes": truth_nodes,
        "ways": truth_ways,
        "rels": truth_rels,
        "tags": truth_tags,
    }
    return docs, truth


def docs_to_spark(spark, docs_rows) -> DataFrame:
    return spark.createDataFrame(docs_rows, DOCS_SCHEMA)


def parse_spans(docs: DataFrame) -> dict:
    """Extract typed element tables from the spans encoding — fully native
    (explode + split + cast; zero Python), mirroring the reference's element
    model (/root/reference/elements/elements.go:150-173).

    Returns dict with 'nodes', 'ways' (refs kept ordered), 'rels', 'tags'
    DataFrames, each carrying doc_id for join-back (the spans column itself
    is never modified — span-sequence preservation by construction).
    """
    sp = docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", "s.kind", "s.text")

    # try_cast / try_element_at throughout: Catalyst may collapse the kind
    # filter with the projection, evaluating a branch's casts on other
    # kinds' rows — under ANSI mode a plain cast/index would throw there;
    # try_* is also the right robust-parser semantics (malformed span ->
    # NULL, counted not crashed).

    nodes = (
        sp.filter(F.col("kind") == "node")
        .select(
            "doc_id",
            F.expr("try_cast(try_element_at(split(text, ' '), 1) as bigint)")
            .alias("node_id"),
            F.expr("try_cast(try_element_at(split(text, ' '), 2) as bigint)")
            .alias("lon"),
            F.expr("try_cast(try_element_at(split(text, ' '), 3) as bigint)")
            .alias("lat"),
        )
    )

    ways = (
        sp.filter(F.col("kind") == "way")
        .select(
            "doc_id",
            F.expr(
                "try_cast(try_element_at(split(text, ' ', 2), 1) as bigint)"
            ).alias("way_id"),
            F.expr(
                "transform(split(try_element_at(split(text, ' ', 2), 2), ','),"
                " x -> try_cast(x as bigint))"
            ).alias("refs"),
        )
    )

    rels = (
        sp.filter(F.col("kind") == "relation")
        .select(
            "doc_id",
            F.expr(
                "try_cast(try_element_at(split(text, ' ', 2), 1) as bigint)"
            ).alias("rel_id"),
            F.expr(
                "case when length(try_element_at(split(text, ' ', 2), 2)) > 0"
                " then split(try_element_at(split(text, ' ', 2), 2), ';')"
                " else cast(array() as array<string>) end"
            ).alias("raw_members"),
        )
        .select(
            "doc_id",
            "rel_id",
            F.expr(
                "transform(raw_members, m -> struct("
                " try_element_at(split(m, ':'), 1) as mtype,"
                " try_cast(try_element_at(split(m, ':'), 2) as bigint) as ref,"
                " try_element_at(split(m, ':'), 3) as role))"
            ).alias("members"),
        )
    )

    tag_kv = F.split(F.col("text"), "=", 2)
    tags = (
        sp.filter(F.col("kind") == "tag")
        .select(
            "doc_id",
            tag_kv.getItem(0).alias("key"),
            tag_kv.getItem(1).alias("value"),
        )
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("key", "value"))
            ).alias("tags")
        )
    )

    return {"nodes": nodes, "ways": ways, "rels": rels, "tags": tags}


def spans_checksum(docs: DataFrame, col: str = "spans") -> DataFrame:
    """Per-row canonical checksum of the span sequence on
    (kind, text, media_ref) in offset order — used by tests and lineage rows
    to assert span-sequence equality through shuffles.  Native expression."""
    ordered = F.array_sort(
        F.transform(
            F.col(col),
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    payload = F.array_join(
        F.transform(
            ordered,
            lambda s: F.concat_ws(
                "\u0001", s["kind"], s["text"], s["media_ref"]
            ),
        ),
        "\u0002",
    )
    return docs.withColumn("spans_checksum", F.sha2(payload, 256))
