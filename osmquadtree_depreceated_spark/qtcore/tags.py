"""Tag algebra for geometry construction — pure Python, no Spark.

Ports the reference's tag-filter/rewrite semantics
(/root/reference/geometry/tags.go:110-157, makegeometries.go:24-120):

  * tags_add    — merge semantics of TagsEditable.Add: empty values skipped,
                  equal values idempotent, CONFLICTING values blank the key
                  (so Clip later deletes it)
  * tags_clip   — delete all keys whose value is ''
  * add_other_tags — fold non-style keys into a compact sorted-key JSON
                  object under 'other_tags' (Go json.Marshal sorts map keys;
                  json.dumps(sort_keys=True, separators=(',',':')) matches)
  * way_tags_filter / node_tags_filter — the wayTags / nodeTags passes:
                  keep style keys, fold+delete the rest, detect polygon-ness
                  / feature-ness, compute z-order on the filtered tags

A TagTest is (is_node, is_way, is_feature, is_poly); the tag filter maps
key -> TagTest and optionally contains an 'other_tags' entry whose presence
enables the JSON fold (reference: style-file entry with Type=json).

These run per relation group inside applyInPandas (grouped-map) and as the
scalar reference for the native column-expression implementations in
operators/geometry.py.
"""

from __future__ import annotations

import json
from typing import NamedTuple

from .rings import find_zorder


class TagTest(NamedTuple):
    is_node: bool
    is_way: bool
    is_feature: bool
    is_poly: bool


# Fixture tag model (the reference reads a style file; this mirrors the
# docs-fixture key set, sources/docs.py _TAG_KEYS, with osm2pgsql-like
# semantics for each key).
DEFAULT_TAG_FILTER = {
    "highway": TagTest(True, True, True, False),
    "name": TagTest(True, True, False, False),
    "amenity": TagTest(True, True, True, False),
    "building": TagTest(True, True, True, True),
    "natural": TagTest(True, True, True, True),
    "area": TagTest(False, True, False, False),
    "type": TagTest(False, True, False, False),
    "boundary": TagTest(True, True, True, True),
    "other_tags": TagTest(True, True, False, False),  # enables JSON fold
}


def is_true(v: str) -> bool:
    """zorder.go:45-50."""
    return v.lower() in ("1", "yes", "true")


def tags_add(base: dict, extra: dict) -> None:
    """TagsEditable.Add (tags.go:110-132): mutate `base`."""
    for k, v in extra.items():
        if v == "":
            continue
        if k in base:
            if base[k] == "" or base[k] == v:
                continue
            base[k] = ""
        else:
            base[k] = v


def tags_clip(tags: dict) -> None:
    """TagsEditable.Clip (tags.go:146-156): delete empty-valued keys."""
    for k in [k for k, v in tags.items() if v == ""]:
        del tags[k]


def add_other_tags(tags: dict, rms: list) -> None:
    """addOtherTags (makegeometries.go:24-41), type=json: fold the `rms`
    keys' CURRENT values into a sorted-key compact JSON string under
    'other_tags'.  Quirk preserved: a pre-existing 'other_tags' value nests
    into the new JSON (the Go local-slice append does not propagate to the
    caller, so the old key is folded but never deleted — it is overwritten
    by Put instead)."""
    if "other_tags" in tags:
        rms = rms + ["other_tags"]
    mm = {t: tags.get(t, "") for t in rms}
    tags["other_tags"] = json.dumps(mm, sort_keys=True,
                                    separators=(",", ":"))


def node_tags_filter(tags: dict, tag_filter=None):
    """nodeTags (makegeometries.go:43-69): returns (is_feature, new_tags)."""
    tf = DEFAULT_TAG_FILTER if tag_filter is None else tag_filter
    out = dict(tags)
    rms, isfeat = [], False
    for k in tags:
        tt = tf.get(k)
        if tt is None or not tt.is_node:
            rms.append(k)
            continue
        if tt.is_feature:
            isfeat = True
    if (rms or "other_tags" in out) and "other_tags" in tf:
        add_other_tags(out, rms)
    for t in rms:
        out.pop(t, None)
    return isfeat, out


def way_tags_filter(tags: dict, tag_filter=None):
    """wayTags (makegeometries.go:86-120): returns
    (z_order, is_poly, new_tags)."""
    tf = DEFAULT_TAG_FILTER if tag_filter is None else tag_filter
    out = dict(tags)
    rms, isp = [], False
    for k, v in tags.items():
        tt = tf.get(k)
        if tt is None or not tt.is_way:
            rms.append(k)
            continue
        if tt.is_poly or (k == "area" and is_true(v)):
            isp = True
    if "boundary" in out:
        isp = True
    if (rms or "other_tags" in out) and "other_tags" in tf:
        add_other_tags(out, rms)
    for t in rms:
        out.pop(t, None)
    zo = find_zorder(out)
    return zo, isp, out


def is_feature(tags: dict, tag_filter=None) -> bool:
    """IsFeature (makegeometries.go:71-84): any way-feature key present."""
    tf = DEFAULT_TAG_FILTER if tag_filter is None else tag_filter
    for k in tags:
        tt = tf.get(k)
        if tt is not None and tt.is_way and tt.is_feature:
            return True
    return False
