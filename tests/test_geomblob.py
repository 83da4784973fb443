"""Packed geometry-blob codec (functions/geomblob.py vs
geometry/pbf.go:75-312 + utils/writevals.go wire format)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmquadtree_depreceated_spark.functions.geomblob import (
    _pack_uvarints, _unpack_uvarints, _unzigzag, _zigzag,
    pack_linestring_rows, pack_linestring_udf, pack_point_rows,
    pack_point_udf, pack_polygon_rows, parse_geomblob_udf, unpack_blob,
)


# independent scalar helpers (second implementation for golden bytes)
def _uv(v: int) -> bytes:
    out = b""
    while True:
        x = v & 0x7F
        v >>= 7
        if v:
            out += bytes([x | 0x80])
        else:
            return out + bytes([x])


def _zz(x: int) -> int:
    return ((x << 1) ^ (x >> 63)) if x < 0 else (x << 1)


def test_uvarint_boundaries():
    vals = np.array(
        [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**32,
         2**63 - 1, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    packed, sizes = _pack_uvarints(vals)
    assert list(sizes) == [1, 1, 1, 2, 2, 3, 3, 4, 5, 9, 10, 10]
    assert (_unpack_uvarints(packed) == vals).all()
    # byte-level golden check against the independent packer
    assert packed.tobytes() == b"".join(_uv(int(v)) for v in vals)


def test_zigzag_matches_reference_rule():
    x = np.array([0, -1, 1, -2, 2, -2**62, 2**62, -2**63], dtype=np.int64)
    zz = _zigzag(x)
    assert [int(v) for v in zz[:5]] == [0, 1, 2, 3, 4]
    assert (_unzigzag(zz) == x).all()


def test_linestring_golden_bytes():
    refs, lons, lats = [10, 11, 12], [-500000, -499900, -499800], \
        [100, 200, 150]
    [blob] = pack_linestring_rows([refs], [lons], [lats], [-37], [1])

    def ring_part(tag_key, vals):
        deltas, prev = [], 0
        for v in vals:
            deltas.append(v - prev)
            prev = v
        seg = b"".join(_uv(_zz(d)) for d in deltas)
        return bytes([tag_key]) + _uv(len(seg)) + seg

    ring = (ring_part(0x0A, refs) + ring_part(0x12, lons)
            + ring_part(0x1A, lats))
    bbox = (bytes([0x08]) + _uv(_zz(min(lons))) + bytes([0x10])
            + _uv(_zz(min(lats))) + bytes([0x28])
            + _uv(_zz(max(lons) - min(lons))) + bytes([0x30])
            + _uv(_zz(max(lats) - min(lats))))
    expected = (
        bytes([0x50]) + _uv(2) + bytes([0x58]) + _uv(_zz(-37))
        + bytes([0x72]) + _uv(len(ring)) + ring
        + bytes([0x82, 0x01]) + _uv(len(bbox)) + bbox
        + bytes([0x88, 0x01]) + _uv(1)
    )
    assert blob == expected


def test_point_roundtrip_and_header():
    [blob] = pack_point_rows([42], [-1234567], [7654321], [0])
    assert blob[:3].hex() == "50016a"
    d = unpack_blob(blob)
    assert d["gt"] == 1 and d["ot"] == 0
    refs, lons, lats = d["rings"][0]
    assert (int(refs[0]), int(lons[0]), int(lats[0])) == \
        (42, -1234567, 7654321)


def test_polygon_and_multi_roundtrip():
    rr = [[1, 2, 3, 1], [9, 8, 7, 9]]
    rl = [[0, 100, 100, 0], [10, 20, 20, 10]]
    rt = [[0, 0, 100, 0], [10, 10, 20, 10]]
    [blob] = pack_polygon_rows([rr], [rl], [rt], [5], [123.456], [2])
    d = unpack_blob(blob)
    assert d["gt"] == 3 and d["ot"] == 2 and d["zo"] == 5
    assert d["ar"] == 123.456  # exact: IEEE bits round-trip the varint
    assert d["polys"] == [2]
    assert [list(r[1]) for r in d["rings"]] == rl

    [mb] = pack_polygon_rows(
        [[rr, [rr[0]]]], [[rl, [rl[0]]]], [[rt, [rt[0]]]],
        [0], [1.5], [2], multi=True,
    )
    d = unpack_blob(mb)
    assert d["gt"] == 7 and d["polys"] == [2, 1] and len(d["rings"]) == 3


def test_empty_and_single_point_ways():
    [b1] = pack_linestring_rows([[7]], [[100]], [[200]], [0], [1])
    d = unpack_blob(b1)
    assert list(d["rings"][0][1]) == [100]
    [b0] = pack_linestring_rows([None], [None], [None], [0], [1])
    assert b0 is None


@pytest.mark.parametrize("zo", [0, -1, 1, -(2**31), 2**31])
def test_extreme_zorders(zo):
    [b] = pack_linestring_rows([[1]], [[2]], [[3]], [zo], [1])
    assert unpack_blob(b)["zo"] == zo


def test_udf_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, [10, 11], [-5, 5], [7, 9], -3),
         (2, [20], [1000000], [-1000000], 12)],
        "id long, refs array<long>, lons array<long>, lats array<long>, "
        "zo long",
    )
    out = df.withColumn(
        "blob", pack_linestring_udf()("refs", "lons", "lats", "zo",
                                      F.lit(1)),
    ).withColumn("d", parse_geomblob_udf()(F.col("blob"))).select(
        "id", "d.zo", "d.np", "d.sum_lon", "d.gt",
    ).collect()
    got = {r.id: (r.zo, r.np, r.sum_lon, r.gt) for r in out}
    assert got == {1: (-3, 2, 0, 2), 2: (12, 1, 1000000, 2)}

    pts = spark.createDataFrame([(5, 44, -33)], "id long, lon long, "
                                "lat long")
    row = pts.withColumn(
        "blob", pack_point_udf()(F.col("id"), F.col("lon"), F.col("lat"),
                                 F.lit(0)),
    ).withColumn("d", parse_geomblob_udf()(F.col("blob"))).select(
        "d.gt", "d.sum_lon", "d.sum_lat", F.length("blob").alias("ln"),
    ).collect()[0]
    assert (row.gt, row.sum_lon, row.sum_lat) == (1, 44, -33)
    assert row.ln == len(pack_point_rows([5], [44], [-33], [0])[0])


# ------------------- hypothesis property sweep (pure Python, no Spark)

from hypothesis import given, settings, strategies as st  # noqa: E402

_COORD = st.integers(-1800000000, 1800000000)
_REF = st.integers(0, 2**48)
_WAY = st.lists(
    st.tuples(_REF, _COORD, _COORD), min_size=1, max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(way=_WAY, zo=st.integers(-2**31, 2**31), ot=st.integers(0, 2))
def test_linestring_blob_property(way, zo, ot):
    refs = [w[0] for w in way]
    lons = [w[1] for w in way]
    lats = [w[2] for w in way]
    [blob] = pack_linestring_rows([refs], [lons], [lats], [zo], [ot])

    # 1) independent scalar packer produces the SAME bytes
    def ring_part(tag_key, vals):
        prev, seg = 0, b""
        for v in vals:
            seg += _uv(_zz(v - prev))
            prev = v
        return bytes([tag_key]) + _uv(len(seg)) + seg

    ring = (ring_part(0x0A, refs) + ring_part(0x12, lons)
            + ring_part(0x1A, lats))
    bbox = (bytes([0x08]) + _uv(_zz(min(lons))) + bytes([0x10])
            + _uv(_zz(min(lats))) + bytes([0x28])
            + _uv(_zz(max(lons) - min(lons))) + bytes([0x30])
            + _uv(_zz(max(lats) - min(lats))))
    expected = (
        bytes([0x50]) + _uv(2) + bytes([0x58]) + _uv(_zz(zo))
        + bytes([0x72]) + _uv(len(ring)) + ring
        + bytes([0x82, 0x01]) + _uv(len(bbox)) + bbox
        + bytes([0x88, 0x01]) + _uv(ot)
    )
    assert blob == expected

    # 2) the vectorized decoder round-trips it
    d = unpack_blob(blob)
    assert d["gt"] == 2 and d["ot"] == ot and d["zo"] == zo
    r, x, y = d["rings"][0]
    assert list(r) == refs and list(x) == lons and list(y) == lats


def test_summarize_blobs_mixed_shapes_match_perrow():
    """The r06 vectorized summary decoder (_summarize_blobs) must agree
    with the exact per-row unpack_blob on every shape it can meet in one
    batch: None, Point, Linestring (with/without bbox), Polygon and Multi
    (which take the per-row fallback inside the vectorized path)."""
    from osmquadtree_depreceated_spark.functions.geomblob import (
        _summarize_blobs,
    )

    [pt] = pack_point_rows([42], [-1234567], [7654321], [0])
    [ls] = pack_linestring_rows([[10, 11, 12]], [[-500000, -499900, -499800]],
                                [[100, 200, 150]], [-37], [1])
    [ls_nb] = pack_linestring_rows([[7]], [[100]], [[200]], [5], [1],
                                   with_bbox=False)
    rr = [[1, 2, 3, 1], [9, 8, 7, 9]]
    rl = [[0, 100, 100, 0], [10, 20, 20, 10]]
    rt = [[0, 0, 100, 0], [10, 10, 20, 10]]
    [pg] = pack_polygon_rows([rr], [rl], [rt], [5], [123.456], [2])
    [mu] = pack_polygon_rows([[rr, [rr[0]]]], [[rl, [rl[0]]]],
                             [[rt, [rt[0]]]], [0], [1.5], [2], multi=True)
    blobs = [pt, None, ls, pg, ls_nb, mu]
    s = _summarize_blobs(blobs)
    assert list(s["null"]) == [False, True, False, False, False, False]
    vi = 0
    for b in blobs:
        if b is None:
            continue
        d = unpack_blob(b)
        lons = (np.concatenate([r[1] for r in d["rings"]])
                if d["rings"] else np.array([], dtype=np.int64))
        refs = (np.concatenate([r[0] for r in d["rings"]])
                if d["rings"] else np.array([], dtype=np.int64))
        lats = (np.concatenate([r[2] for r in d["rings"]])
                if d["rings"] else np.array([], dtype=np.int64))
        assert s["gt"][vi] == d["gt"] and s["ot"][vi] == d["ot"]
        assert s["zo"][vi] == d["zo"] and s["ar"][vi] == d["ar"]
        assert s["n_rings"][vi] == len(d["rings"])
        assert s["np"][vi] == len(lons)
        assert s["sum_ref"][vi] == refs.sum() if len(refs) else True
        assert s["sum_lon"][vi] == lons.sum() if len(lons) else True
        assert s["sum_lat"][vi] == lats.sum() if len(lats) else True
        assert bool(s["has_pts"][vi]) == (len(lons) > 0)
        if len(lons):
            assert s["first_lon"][vi] == lons[0]
            assert s["last_lat"][vi] == lats[-1]
        vi += 1


@settings(max_examples=100, deadline=None)
@given(ways=st.lists(st.one_of(st.none(), _WAY), min_size=1, max_size=8),
       zo=st.integers(-2**31, 2**31))
def test_vectorized_batch_pack_decode_property(ways, zo):
    """Whole-batch property: the vectorized packer over a mixed batch
    (including None rows) emits per-row bytes identical to packing each
    row alone, and the vectorized summary decoder recovers the per-row
    stats of the exact decoder."""
    from osmquadtree_depreceated_spark.functions.geomblob import (
        _summarize_blobs,
    )

    refs = [None if w is None else [t[0] for t in w] for w in ways]
    lons = [None if w is None else [t[1] for t in w] for w in ways]
    lats = [None if w is None else [t[2] for t in w] for w in ways]
    zos = [zo + i for i in range(len(ways))]
    ots = [i % 3 for i in range(len(ways))]
    batch = pack_linestring_rows(refs, lons, lats, zos, ots)
    for i, w in enumerate(ways):
        [single] = pack_linestring_rows([refs[i]], [lons[i]], [lats[i]],
                                        [zos[i]], [ots[i]])
        assert batch[i] == single
    s = _summarize_blobs(batch)
    vi = 0
    for i, w in enumerate(ways):
        if w is None:
            continue
        assert s["zo"][vi] == zos[i] and s["ot"][vi] == ots[i]
        assert s["np"][vi] == len(w)
        assert s["sum_lon"][vi] == sum(t[1] for t in w)
        assert s["first_lon"][vi] == w[0][1]
        assert s["last_lat"][vi] == w[-1][2]
        vi += 1
