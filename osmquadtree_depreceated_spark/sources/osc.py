"""OSC (osmChange) XML source — the reference's change wire format
(xmlread/xmlread.go:52-230): <osmChange> with <create>/<modify>/<delete>
sections of <node>/<way>/<relation> elements; lat/lon float degrees become
fixed-point int64 via round-half-away-from-zero (ftoi, xmlread.go:45-50 ==
qtcore.to_int), tags from <tag k v/>, way refs from <nd ref/>, relation
members from <member type ref role/>.

Distribution axis: the FILE.  Replication diffs arrive as many small
(gzipped) files; read_osc_files ships paths to executors and each parses
its files with a streaming iterparse inside mapInPandas — one unified
element schema out, ready for merge_changes / calc_update_tiles.
parse_osc_bytes is the scalar core (also used driver-side for a single
diff).
"""

from __future__ import annotations

import gzip
import io
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

OSC_SCHEMA = (
    "change_type string, etype string, id long, version long, "
    "ts string, changeset long, lon long, lat long, "
    "refs array<long>, "
    "members array<struct<mtype: string, ref: long, role: string>>, "
    "tags map<string,string>"
)
_OSC_COLS = ["change_type", "etype", "id", "version", "ts", "changeset",
             "lon", "lat", "refs", "members", "tags"]

_MTYPE = {"node": "n", "way": "w", "relation": "r"}


def _ftoi(f: float) -> int:
    # xmlread.go:45-50 — round half away from zero
    if f > 0:
        return int(f * 10000000.0 + 0.5)
    return int(f * 10000000.0 - 0.5)


def parse_osc_bytes(data: bytes) -> list[dict]:
    """Parse one osmChange document into unified element rows (streaming
    iterparse — constant memory in the diff size)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    rows: list[dict] = []
    ct = None
    # iterparse with end events; track the enclosing section
    for event, el in ET.iterparse(io.BytesIO(data), events=("start", "end")):
        if event == "start":
            if el.tag in ("create", "modify", "delete"):
                ct = el.tag
            continue
        if el.tag not in ("node", "way", "relation") or ct is None:
            if el.tag in ("create", "modify", "delete"):
                el.clear()
            continue
        row = {
            "change_type": ct,
            "etype": _MTYPE[el.tag],
            "id": int(el.get("id")),
            "version": int(el.get("version", "0")),
            "ts": el.get("timestamp", ""),
            "changeset": int(el.get("changeset", "0")),
            "lon": None,
            "lat": None,
            "refs": None,
            "members": None,
            "tags": {t.get("k"): t.get("v", "")
                     for t in el if t.tag == "tag"},
        }
        if el.tag == "node":
            if el.get("lon") is not None:
                row["lon"] = _ftoi(float(el.get("lon")))
            if el.get("lat") is not None:
                row["lat"] = _ftoi(float(el.get("lat")))
        elif el.tag == "way":
            row["refs"] = [int(nd.get("ref")) for nd in el
                           if nd.tag == "nd"]
        else:
            row["members"] = [
                {"mtype": _MTYPE.get(m.get("type"), m.get("type")),
                 "ref": int(m.get("ref")),
                 "role": m.get("role", "")}
                for m in el if m.tag == "member"
            ]
        rows.append(row)
        el.clear()
    return rows


def read_osc_files(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Distributed OSC reader: one task per file batch, parsed on the
    executors (mapInPandas), unified element schema out."""
    pdf = spark.createDataFrame([(p,) for p in paths], "path string")

    def _parse(it):
        for batch in it:
            out = []
            for p in batch["path"]:
                with open(p, "rb") as f:
                    out.extend(parse_osc_bytes(f.read()))
            yield pd.DataFrame(out) if out else pd.DataFrame(
                columns=_OSC_COLS
            )

    return pdf.repartition(max(len(paths), 1), "path").mapInPandas(
        _parse, OSC_SCHEMA
    )


def osc_node_changes(changes: DataFrame) -> DataFrame:
    """Project the unified change stream to the calc_update_tiles node-batch
    shape (node_id, seq, change_type, lon, lat) — seq is the element
    version (filterLastObj orders by it, update.go:69-110)."""
    return changes.filter(F.col("etype") == "n").select(
        F.col("id").alias("node_id"),
        F.col("version").alias("seq"),
        "change_type", "lon", "lat",
    )


def parse_osc_content(files: DataFrame,
                      content_col: str = "content") -> DataFrame:
    """Parse OSC payloads carried IN a DataFrame column (the binaryFile
    source's `content`) — the streaming counterpart of read_osc_files:
    each Arrow batch of file blobs parses executor-side, unified element
    schema out.  Composes with `spark.readStream.format('binaryFile')`
    for a live replication-diff feed."""

    def _parse(it):
        for batch in it:
            out = []
            for data in batch[content_col]:
                out.extend(parse_osc_bytes(bytes(data)))
            yield pd.DataFrame(out) if out else pd.DataFrame(
                columns=_OSC_COLS
            )

    return files.select(content_col).mapInPandas(_parse, OSC_SCHEMA)
