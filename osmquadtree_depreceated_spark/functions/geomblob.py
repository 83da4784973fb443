"""Packed geometry-blob codec — the reference's native geometry wire
format (SURVEY.md §2.6 last row).

This is the PBF-tagged blob the reference stores per geometry and serves
as the raw ``way`` column value (geometry/pbf.go:75-290,
packeddatastore.go:361-362; wire helpers utils/writevals.go:16-60,
119-157, 183-220):

  outer message (tag, wiretype 0 = varint value / 2 = length-delimited):
    10  varint   geometry type (1 Point, 2 Linestring, 3 Polygon, 7 Multi)
    11  varint   zigzag(z_order)                 (absent for Point)
    12  varint   float64 BITS of way_area        (Polygon/Multi only —
                 the reference varint-encodes the raw IEEE bits)
    13  msg      point coord {1: zz(ref), 2: zz(lon), 3: zz(lat)}
    14  msg      linestring ring (below)
    15  msg      polygon = repeated {1: ring}; Multi repeats tag 15
    16  msg      bbox {1: zz(minx), 2: zz(miny), 5: zz(w), 6: zz(h)}
    17  varint   element type (0 node, 1 way, 2 relation)
  ring message: {1: delta-packed refs, 2: delta-packed lons,
                 3: delta-packed lats} — each a packed run of
                 zigzag-varint DELTAS (first delta from 0,
                 utils.PackDeltaPackedList).

Spark-first shape: encoders/decoders are Arrow-batched pandas UDFs whose
numeric core is fully vectorized numpy — zigzag, varint byte-count, and
varint byte EMISSION run as flat array passes over the whole batch
(10 masked passes, one per possible varint byte); per-row work is only
memory slicing, exactly like functions/wkb.py.  The decoder walks the
~6 outer tags per blob in Python (O(tags), not O(bytes)) and decodes the
coordinate payload — which is nearly all of the bytes — in flat
vectorized passes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON, GEOM_MULTI = 1, 2, 3, 7

_U7 = np.uint64(7)
_U1 = np.uint64(1)
_MASK7 = np.uint64(0x7F)


# ----------------------------------------------------- varint core

def _zigzag(x: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag (writevals.go:16-22)."""
    x = np.asarray(x, dtype=np.int64)
    return (x.astype(np.uint64) << _U1) ^ (x >> np.int64(63)).astype(
        np.uint64
    )


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = np.asarray(u, dtype=np.uint64)
    return ((u >> _U1).astype(np.int64)) ^ -(u & _U1).astype(np.int64)


def _uvarint_sizes(u: np.ndarray) -> np.ndarray:
    """Bytes each uvarint takes (1..10)."""
    sizes = np.ones(len(u), dtype=np.int64)
    for k in range(1, 10):
        sizes += (u >= (_U1 << np.uint64(7 * k))).astype(np.int64)
    return sizes


def _pack_uvarints(u: np.ndarray):
    """Flat varint emission: (bytes, per-value sizes).  Ten masked
    vectorized passes — pass j writes byte j of every varint that has
    one."""
    u = np.asarray(u, dtype=np.uint64)
    sizes = _uvarint_sizes(u)
    offs = np.zeros(len(u), dtype=np.int64)
    if len(u):
        offs[1:] = np.cumsum(sizes)[:-1]
    out = np.zeros(int(sizes.sum()), dtype=np.uint8)
    for j in range(10):
        mask = sizes > j
        if not mask.any():
            break
        vals = ((u[mask] >> np.uint64(7 * j)) & _MASK7).astype(np.uint8)
        cont = (sizes[mask] - 1 > j).astype(np.uint8) << 7
        out[offs[mask] + j] = vals | cont
    return out, sizes


def _unpack_uvarints(buf: np.ndarray):
    """Flat varint decode of a buffer that is NOTHING BUT varints:
    (values, count).  Vectorized: terminator bytes (high bit clear) mark
    varint ends; each byte contributes (b & 0x7f) << 7*pos shifted into
    its varint's slot, summed per varint."""
    buf = np.asarray(buf, dtype=np.uint8)
    if len(buf) == 0:
        return np.array([], dtype=np.uint64)
    ends = np.flatnonzero(buf < 0x80)
    starts = np.zeros(len(ends), dtype=np.int64)
    starts[1:] = ends[:-1] + 1
    intra = np.arange(len(buf), dtype=np.int64) - np.repeat(
        starts, ends - starts + 1
    )
    contrib = (buf.astype(np.uint64) & _MASK7) << (
        intra.astype(np.uint64) * _U7
    )
    return np.add.reduceat(contrib, starts)


def _delta_pack_rows(flat: np.ndarray, lens: np.ndarray):
    """Per-row delta-packed lists from one flat value array: returns
    (flat bytes, per-row byte lengths).  Deltas restart at each row
    (first delta is from 0, PackDeltaPackedList)."""
    flat = np.asarray(flat, dtype=np.int64)
    deltas = np.empty_like(flat)
    if len(flat):
        deltas[0] = flat[0]
        deltas[1:] = flat[1:] - flat[:-1]
        row_starts = np.zeros(len(lens), dtype=np.int64)
        row_starts[1:] = np.cumsum(lens)[:-1]
        nz = lens > 0
        deltas[row_starts[nz]] = flat[row_starts[nz]]
    packed, sizes = _pack_uvarints(_zigzag(deltas))
    byte_lens = np.zeros(len(lens), dtype=np.int64)
    if len(flat):
        pos = np.zeros(len(lens) + 1, dtype=np.int64)
        pos[1:] = np.cumsum(lens)
        csz = np.zeros(len(sizes) + 1, dtype=np.int64)
        csz[1:] = np.cumsum(sizes)
        byte_lens = csz[pos[1:]] - csz[pos[:-1]]
    return packed, byte_lens


def _uvarint1(v: int) -> bytes:
    out = bytearray()
    v = int(v)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(tag: int, wt: int) -> bytes:
    return _uvarint1((tag << 3) | wt)


def _zz1(x: int) -> int:
    return (int(x) << 1) ^ (int(x) >> 63) if x < 0 else int(x) << 1


# ------------------------------------------------------- encoders

def _ring_bytes_rows(refs_seq, lons_seq, lats_seq):
    """Per-row packed ring message bytes (tags 1/2/3 delta lists)."""
    n = len(lons_seq)
    lens = np.fromiter((0 if x is None else len(x) for x in lons_seq),
                       dtype=np.int64, count=n)

    def flat(seq):
        parts = [np.asarray(x, dtype=np.int64) for x in seq
                 if x is not None and len(x)]
        return (np.concatenate(parts) if parts
                else np.array([], dtype=np.int64))

    packs = []
    for tag, seq in ((1, refs_seq), (2, lons_seq), (3, lats_seq)):
        pbytes, blens = _delta_pack_rows(flat(seq), lens)
        starts = np.zeros(n, dtype=np.int64)
        starts[1:] = np.cumsum(blens)[:-1]
        packs.append((tag, pbytes, blens, starts))
    out = []
    for i in range(n):
        if lons_seq[i] is None:
            out.append(None)
            continue
        b = bytearray()
        for tag, pbytes, blens, starts in packs:
            seg = pbytes[starts[i]:starts[i] + blens[i]].tobytes()
            b += _key(tag, 2) + _uvarint1(len(seg)) + seg
        out.append(bytes(b))
    return out


def _bbox_bytes(lons, lats) -> bytes:
    lons = np.asarray(lons, dtype=np.int64)
    lats = np.asarray(lats, dtype=np.int64)
    minx, maxx = int(lons.min()), int(lons.max())
    miny, maxy = int(lats.min()), int(lats.max())
    return (
        _key(1, 0) + _uvarint1(_zz1(minx))
        + _key(2, 0) + _uvarint1(_zz1(miny))
        + _key(5, 0) + _uvarint1(_zz1(maxx - minx))
        + _key(6, 0) + _uvarint1(_zz1(maxy - miny))
    )


def pack_point_rows(refs, lons, lats, ots):
    """packPointData (pbf.go:208-217): {10:1}{13:coord}{17:ot}.

    Fully vectorized — this is the MASS path (one blob per node): the
    three coord varints and the element-type varint pack as flat numpy
    passes, the fixed framing bytes scatter by row offset, and the only
    per-row Python is the final memory slice."""
    n = len(refs)
    if n == 0:
        return []
    refs = np.asarray(refs, dtype=np.int64)
    lons = np.asarray(lons, dtype=np.int64)
    lats = np.asarray(lats, dtype=np.int64)
    ots = np.asarray(ots, dtype=np.int64)
    # interleave (ref, lon, lat) so one flat varint pass packs all coords
    tri = np.empty(3 * n, dtype=np.int64)
    tri[0::3], tri[1::3], tri[2::3] = refs, lons, lats
    tri_b, tri_sz = _pack_uvarints(_zigzag(tri))
    ot_b, ot_sz = _pack_uvarints(ots.astype(np.uint64))
    coord_len = (tri_sz[0::3] + tri_sz[1::3] + tri_sz[2::3]
                 + 3)  # + three 1-byte coord keys (0x08/0x10/0x18)
    clen_b, clen_sz = _pack_uvarints(coord_len.astype(np.uint64))
    # blob = [0x50 0x01] + [0x6a] + clen + coord + [0x88 0x01] + ot
    total = 3 + clen_sz + coord_len + 2 + ot_sz
    out_starts = np.zeros(n, dtype=np.int64)
    out_starts[1:] = np.cumsum(total)[:-1]
    buf = np.zeros(int(total.sum()), dtype=np.uint8)
    buf[out_starts] = 0x50
    buf[out_starts + 1] = GEOM_POINT
    buf[out_starts + 2] = 0x6A                     # key(13, msg)
    _ragged_copy(buf, out_starts + 3, clen_b, clen_sz)
    coord_starts = out_starts + 3 + clen_sz
    buf[coord_starts] = 0x08                       # key(1) zz(ref)
    _ragged_copy(buf, coord_starts + 1, tri_b[  # refs varints
        _expand_spans(tri_sz, 0)], tri_sz[0::3])
    lon_starts = coord_starts + 1 + tri_sz[0::3]
    buf[lon_starts] = 0x10                         # key(2) zz(lon)
    _ragged_copy(buf, lon_starts + 1,
                 tri_b[_expand_spans(tri_sz, 1)], tri_sz[1::3])
    lat_starts = lon_starts + 1 + tri_sz[1::3]
    buf[lat_starts] = 0x18                         # key(3) zz(lat)
    _ragged_copy(buf, lat_starts + 1,
                 tri_b[_expand_spans(tri_sz, 2)], tri_sz[2::3])
    tail = lat_starts + 1 + tri_sz[2::3]
    buf[tail] = 0x88                               # key(17) varint
    buf[tail + 1] = 0x01
    _ragged_copy(buf, tail + 2, ot_b, ot_sz)
    ends = out_starts + total
    return [buf[out_starts[i]:ends[i]].tobytes() for i in range(n)]


def _expand_spans(sizes: np.ndarray, phase: int,
                  stride: int = 3) -> np.ndarray:
    """Indices selecting, from a flat varint buffer packed from an
    interleaved `stride`-tuple array, the bytes of every stride-th value
    starting at `phase` — preserving order."""
    starts = np.zeros(len(sizes), dtype=np.int64)
    starts[1:] = np.cumsum(sizes)[:-1]
    sel_starts = starts[phase::stride]
    sel_sizes = sizes[phase::stride]
    return np.repeat(sel_starts, sel_sizes) + _intra(sel_sizes)


def _intra(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated."""
    total = int(lens.sum())
    if total == 0:
        return np.array([], dtype=np.int64)
    starts = np.zeros(len(lens), dtype=np.int64)
    starts[1:] = np.cumsum(lens)[:-1]
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


def _ragged_copy(dst: np.ndarray, dst_starts: np.ndarray,
                 src: np.ndarray, lens: np.ndarray) -> None:
    """dst[dst_starts[i] : +lens[i]] = next lens[i] bytes of src."""
    if int(lens.sum()) == 0:
        return
    dst[np.repeat(dst_starts, lens) + _intra(lens)] = src


def _flat_concat(seq):
    """Flatten a sequence of per-row int lists/arrays (skipping None and
    empty rows) into one int64 array."""
    parts = [np.asarray(x, dtype=np.int64) for x in seq
             if x is not None and len(x)]
    return (np.concatenate(parts) if parts
            else np.array([], dtype=np.int64))


def _seg_starts(lens: np.ndarray) -> np.ndarray:
    starts = np.zeros(len(lens), dtype=np.int64)
    if len(lens):
        starts[1:] = np.cumsum(lens)[:-1]
    return starts


def pack_linestring_rows(refs_seq, lons_seq, lats_seq, zorders, ots,
                         with_bbox: bool = True):
    """packLinestringData (pbf.go:248-258):
    {10:2}{11:zz(zo)}{14:ring}[{16:bbox}]{17:ot}.

    Fully vectorized (r06): every varint group — the three delta-packed
    ring payloads, their length varints, the ring/bbox length varints,
    zigzag(z_order), element type, and the four bbox values — packs as
    flat numpy passes over the whole batch; the framing bytes scatter by
    per-row offsets (same _ragged_copy machinery as pack_point_rows).
    The only per-row Python is the final memory slice.  Byte-identical
    to the scalar reference packer (golden + hypothesis-pinned in
    tests/test_geomblob.py)."""
    n = len(lons_seq)
    if n == 0:
        return []
    none_mask = np.fromiter((x is None for x in lons_seq), dtype=bool,
                            count=n)
    valid = ~none_mask
    nv = int(valid.sum())
    if nv == 0:
        return [None] * n
    vseq = {
        "refs": [x for x, m in zip(refs_seq, valid) if m],
        "lons": [x for x, m in zip(lons_seq, valid) if m],
        "lats": [x for x, m in zip(lats_seq, valid) if m],
    }
    lens = np.fromiter((len(x) for x in vseq["lons"]), dtype=np.int64,
                       count=nv)
    if with_bbox and (lens == 0).any():
        # parity with the scalar path: _bbox_bytes reduces over an empty
        # coordinate list and raises
        raise ValueError("empty coordinate list with with_bbox=True")

    # three delta-packed ring payloads + their length varints
    segs = []
    ring_len = np.full(nv, 3, dtype=np.int64)  # three 1-byte ring keys
    for name in ("refs", "lons", "lats"):
        flat = _flat_concat(vseq[name])
        pbytes, blens = _delta_pack_rows(flat, lens)
        lb, lsz = _pack_uvarints(blens.astype(np.uint64))
        segs.append((pbytes, blens, _seg_starts(blens), lb, lsz,
                     _seg_starts(lsz)))
        ring_len += lsz + blens

    zorders = np.asarray(zorders, dtype=np.int64)[valid]
    ots = np.asarray(ots, dtype=np.int64)[valid]
    zo_b, zo_sz = _pack_uvarints(_zigzag(zorders))
    ot_b, ot_sz = _pack_uvarints(ots.astype(np.uint64))
    rl_b, rl_sz = _pack_uvarints(ring_len.astype(np.uint64))

    if with_bbox:
        flat_lons = _flat_concat(vseq["lons"])
        flat_lats = _flat_concat(vseq["lats"])
        starts = _seg_starts(lens)
        minx = np.minimum.reduceat(flat_lons, starts)
        maxx = np.maximum.reduceat(flat_lons, starts)
        miny = np.minimum.reduceat(flat_lats, starts)
        maxy = np.maximum.reduceat(flat_lats, starts)
        quad = np.empty(4 * nv, dtype=np.int64)
        quad[0::4], quad[1::4] = minx, miny
        quad[2::4], quad[3::4] = maxx - minx, maxy - miny
        bb_b, bb_sz = _pack_uvarints(_zigzag(quad))
        bb_len = 4 + bb_sz[0::4] + bb_sz[1::4] + bb_sz[2::4] + bb_sz[3::4]
        bbl_b, bbl_sz = _pack_uvarints(bb_len.astype(np.uint64))
        bbox_total = 2 + bbl_sz + bb_len  # key(16,2) is 2 bytes
    else:
        bbox_total = np.zeros(nv, dtype=np.int64)

    # {10:gt}=2B {11:zo}=1B+zo {14:ring}=1B+rl+ring [bbox] {17:ot}=2B+ot
    total = 2 + 1 + zo_sz + 1 + rl_sz + ring_len + bbox_total + 2 + ot_sz
    out_starts = _seg_starts(total)
    buf = np.zeros(int(total.sum()), dtype=np.uint8)
    buf[out_starts] = 0x50                      # key(10, varint)
    buf[out_starts + 1] = GEOM_LINESTRING
    buf[out_starts + 2] = 0x58                  # key(11, varint)
    _ragged_copy(buf, out_starts + 3, zo_b, zo_sz)
    p = out_starts + 3 + zo_sz
    buf[p] = 0x72                               # key(14, msg)
    _ragged_copy(buf, p + 1, rl_b, rl_sz)
    p = p + 1 + rl_sz
    for tag_key, (pbytes, blens, _bst, lb, lsz, _lst) in zip(
            (0x0A, 0x12, 0x1A), segs):
        buf[p] = tag_key
        _ragged_copy(buf, p + 1, lb, lsz)
        p = p + 1 + lsz
        _ragged_copy(buf, p, pbytes, blens)
        p = p + blens
    if with_bbox:
        buf[p] = 0x82                           # key(16, msg) = 0x82 0x01
        buf[p + 1] = 0x01
        _ragged_copy(buf, p + 2, bbl_b, bbl_sz)
        p = p + 2 + bbl_sz
        for i, bkey in enumerate((0x08, 0x10, 0x28, 0x30)):
            buf[p] = bkey
            _ragged_copy(buf, p + 1, bb_b[_expand_spans(bb_sz, i, 4)],
                         bb_sz[i::4])
            p = p + 1 + bb_sz[i::4]
    buf[p] = 0x88                               # key(17, varint) = 0x88 0x01
    buf[p + 1] = 0x01
    _ragged_copy(buf, p + 2, ot_b, ot_sz)

    ends = out_starts + total
    out, vi = [], 0
    for i in range(n):
        if none_mask[i]:
            out.append(None)
        else:
            out.append(buf[out_starts[vi]:ends[vi]].tobytes())
            vi += 1
    return out


def _polygon_msg(rings: list[bytes]) -> bytes:
    b = bytearray()
    for ring in rings:
        b += _key(1, 2) + _uvarint1(len(ring)) + ring
    return bytes(b)


def pack_polygon_rows(rings_refs_seq, rings_lons_seq, rings_lats_seq,
                      zorders, areas, ots, with_bbox: bool = True,
                      multi: bool = False):
    """packPolygonData / packMultiGeometryData (pbf.go:267-290,292-312).

    Single polygon: rings_*_seq[i] is a list of rings (outer first).
    Multi: rings_*_seq[i] is a list of POLYGONS, each a list of rings —
    one tag-15 message per polygon."""
    n = len(rings_lons_seq)
    out = []
    for i in range(n):
        if rings_lons_seq[i] is None:
            out.append(None)
            continue
        gt = GEOM_MULTI if multi else GEOM_POLYGON
        ar_bits = int(np.float64(areas[i]).view(np.uint64))
        b = bytearray(
            _key(10, 0) + _uvarint1(gt)
            + _key(11, 0) + _uvarint1(_zz1(int(zorders[i])))
            + _key(12, 0) + _uvarint1(ar_bits)
        )
        polys = (rings_lons_seq[i] if multi else [rings_lons_seq[i]])
        all_lons, all_lats = [], []
        for p, poly_lons in enumerate(polys):
            poly_refs = (rings_refs_seq[i][p] if multi
                         else rings_refs_seq[i])
            poly_lats = (rings_lats_seq[i][p] if multi
                         else rings_lats_seq[i])
            rings = _ring_bytes_rows(
                list(poly_refs), list(poly_lons), list(poly_lats)
            )
            b += _key(15, 2)
            pm = _polygon_msg(rings)
            b += _uvarint1(len(pm)) + pm
            for r in poly_lons:
                all_lons.extend(r)
            for r in poly_lats:
                all_lats.extend(r)
        if with_bbox:
            bb = _bbox_bytes(all_lons, all_lats)
            b += _key(16, 2) + _uvarint1(len(bb)) + bb
        b += _key(17, 0) + _uvarint1(int(ots[i]))
        out.append(bytes(b))
    return out


# -------------------------------------------------------- decoder

def _read_uvarint(mv, pos: int):
    shift, val = 0, 0
    while True:
        b = int(mv[pos])  # int-cast: numpy uint8 would wrap at shift>=8
        pos += 1
        val |= (b & 0x7F) << shift
        if b < 0x80:
            return val, pos
        shift += 7


def _walk_tags(mv, lo: int, hi: int):
    """Yield (tag, value, data_span) over a message; O(#tags) per call —
    the byte-heavy payloads inside the spans decode vectorized."""
    pos = lo
    while pos < hi:
        key, pos = _read_uvarint(mv, pos)
        tag, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _read_uvarint(mv, pos)
            yield tag, val, None
        elif wt == 2:
            ln, pos = _read_uvarint(mv, pos)
            yield tag, None, (pos, pos + ln)
            pos += ln
        else:
            raise ValueError(f"unsupported wiretype {wt}")


def _decode_ring(buf: np.ndarray, lo: int, hi: int):
    """Ring message -> (refs, lons, lats) int64 arrays."""
    mv = buf
    parts = {1: None, 2: None, 3: None}
    for tag, _val, span in _walk_tags(mv, lo, hi):
        if tag in parts and span is not None:
            vals = _unpack_uvarints(np.frombuffer(
                mv, dtype=np.uint8, count=span[1] - span[0],
                offset=span[0]))
            parts[tag] = np.cumsum(_unzigzag(vals))
    empty = np.array([], dtype=np.int64)
    return (parts[1] if parts[1] is not None else empty,
            parts[2] if parts[2] is not None else empty,
            parts[3] if parts[3] is not None else empty)


def unpack_blob(b: bytes):
    """Blob -> dict(gt, ot, zo, ar, rings=[(refs, lons, lats), ...],
    polys=[ring-count per tag-15 message]) (extractGeometryData,
    pbf.go:75-117)."""
    buf = memoryview(bytes(b))
    arr = np.frombuffer(buf, dtype=np.uint8)
    gt, ot, zo, ar = 0, 0, 0, 0.0
    rings, polys = [], []
    for tag, val, span in _walk_tags(buf, 0, len(buf)):
        if tag == 10:
            gt = val
        elif tag == 11:
            zo = int(_unzigzag(np.array([val], dtype=np.uint64))[0])
        elif tag == 12:
            ar = float(np.uint64(val).view(np.float64))
        elif tag == 13:
            c = {1: 0, 2: 0, 3: 0}
            for t2, v2, _s2 in _walk_tags(buf, *span):
                if t2 in c:
                    c[t2] = int(_unzigzag(
                        np.array([v2], dtype=np.uint64))[0])
            rings.append((np.array([c[1]]), np.array([c[2]]),
                          np.array([c[3]])))
            polys.append(1)
        elif tag == 14:
            rings.append(_decode_ring(arr, *span))
            polys.append(1)
        elif tag == 15:
            cnt = 0
            for t2, _v2, s2 in _walk_tags(buf, *span):
                if t2 == 1 and s2 is not None:
                    rings.append(_decode_ring(arr, *s2))
                    cnt += 1
            polys.append(cnt)
        elif tag == 17:
            ot = val
    return {"gt": gt, "ot": ot, "zo": zo, "ar": ar, "rings": rings,
            "polys": polys}


# ----------------------------------------- vectorized summary decode

def _gather_uvarints(buf: np.ndarray, pos: np.ndarray, active: np.ndarray):
    """Vectorized varint read at per-row cursor positions.  Returns
    (values uint64, new positions); rows with ``~active`` are untouched
    (value 0, cursor unchanged).  One masked pass per varint byte — the
    cursor-parallel analogue of _unpack_uvarints for when positions are
    scattered rather than contiguous."""
    n = len(pos)
    val = np.zeros(n, dtype=np.uint64)
    cur = pos.copy()
    reading = active.copy()
    for j in range(10):
        idx = np.flatnonzero(reading)
        if idx.size == 0:
            break
        b = buf[cur[idx]]
        val[idx] |= (b.astype(np.uint64) & _MASK7) << np.uint64(7 * j)
        cur[idx] += 1
        reading[idx[b < 0x80]] = False
    return val, cur


def _segmented_delta_stats(buf: np.ndarray, lo: np.ndarray,
                           hi: np.ndarray):
    """Decode per-row spans of packed zigzag-varint DELTAS (restarting at
    each span) and return per-row (count, sum, first, last) of the
    prefix-summed absolute values — everything the summary decoder needs,
    without materializing per-row arrays.

    lo/hi are span bounds into `buf`; rows with lo < 0 yield zeros."""
    nv = len(lo)
    counts = np.zeros(nv, dtype=np.int64)
    sums = np.zeros(nv, dtype=np.int64)
    firsts = np.zeros(nv, dtype=np.int64)
    lasts = np.zeros(nv, dtype=np.int64)
    have = lo >= 0
    span_len = np.where(have, hi - lo, 0)
    total = int(span_len.sum())
    if total == 0:
        return counts, sums, firsts, lasts
    # gather all spans into one flat buffer (row order preserved)
    idx = np.repeat(lo.clip(min=0), span_len) + _intra(span_len)
    flat = buf[idx]
    # values per row = terminator bytes per span
    term = (flat < 0x80).astype(np.int64)
    tcum = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(term, out=tcum[1:])
    bstarts = _seg_starts(span_len)
    bends = bstarts + span_len
    counts = tcum[bends] - tcum[bstarts]
    deltas = _unzigzag(_unpack_uvarints(flat))
    # segmented prefix sum: absolute value v[k] = cumsum(deltas) - base
    vstarts = _seg_starts(counts)
    acc = np.cumsum(deltas)
    nz = counts > 0
    base = np.zeros(nv, dtype=np.int64)
    base[nz] = acc[vstarts[nz]] - deltas[vstarts[nz]]
    # sum over a span of (acc[k] - base) for k in [s, e)
    acc2 = np.zeros(len(deltas) + 1, dtype=np.int64)
    np.cumsum(acc, out=acc2[1:])
    vends = vstarts + counts
    sums = acc2[vends] - acc2[vstarts] - counts * base
    firsts[nz] = deltas[vstarts[nz]]
    lasts[nz] = acc[vends[nz] - 1] - base[nz]
    return counts, sums, firsts, lasts


_SUMMARY_KEYS = ("gt", "ot", "zo", "ar", "n_rings", "np", "sum_ref",
                 "sum_lon", "sum_lat", "first_lon", "last_lat")


def _summarize_blobs(blobs):
    """Vectorized bulk decode of the summary struct over a sequence of
    blobs (None-safe).  The mass shapes — Point (one tag-13 coord
    message) and single-ring Linestring (one tag-14 ring message) —
    decode in flat numpy passes; anything else (polygons/multis,
    repeated rings) falls back to the exact per-row unpack_blob.
    Returns a dict of numpy/object arrays keyed by _SUMMARY_KEYS plus a
    'null' bool mask."""
    n = len(blobs)
    null = np.fromiter((b is None for b in blobs), dtype=bool, count=n)
    joined = b"".join(b for b in blobs if b is not None)
    buf = np.frombuffer(joined, dtype=np.uint8)
    lens = np.fromiter((len(b) for b in blobs if b is not None),
                       dtype=np.int64, count=int((~null).sum()))
    nv = len(lens)
    starts = _seg_starts(lens)
    ends = starts + lens

    gt = np.zeros(nv, np.int64)
    ot = np.zeros(nv, np.int64)
    zo = np.zeros(nv, np.int64)
    ar_bits = np.zeros(nv, np.uint64)
    c_lo = np.full(nv, -1, np.int64)
    c_hi = np.full(nv, -1, np.int64)
    r_lo = np.full(nv, -1, np.int64)
    r_hi = np.full(nv, -1, np.int64)
    fallback = np.zeros(nv, bool)

    pos = starts.copy()
    active = pos < ends
    while active.any():
        key, pos = _gather_uvarints(buf, pos, active)
        tag = (key >> np.uint64(3)).astype(np.int64)
        wt = (key & np.uint64(7)).astype(np.int64)
        bad = active & (wt != 0) & (wt != 2)
        if bad.any():
            raise ValueError(
                f"unsupported wiretype {int(wt[bad][0])}"
            )
        m0 = active & (wt == 0)
        val, pos = _gather_uvarints(buf, pos, m0)
        m = m0 & (tag == 10)
        gt[m] = val[m].astype(np.int64)
        m = m0 & (tag == 11)
        zo[m] = _unzigzag(val[m])
        m = m0 & (tag == 12)
        ar_bits[m] = val[m]
        m = m0 & (tag == 17)
        ot[m] = val[m].astype(np.int64)
        m2 = active & (wt == 2)
        ln, pos = _gather_uvarints(buf, pos, m2)
        ln = ln.astype(np.int64)
        m = m2 & (tag == 13)
        fallback |= m & (c_lo >= 0)        # repeated coord message
        c_lo[m], c_hi[m] = pos[m], pos[m] + ln[m]
        m = m2 & (tag == 14)
        fallback |= m & (r_lo >= 0)        # repeated ring
        r_lo[m], r_hi[m] = pos[m], pos[m] + ln[m]
        fallback |= m2 & (tag == 15)       # polygon/multi: exact per-row
        pos[m2] += ln[m2]
        active = active & (pos < ends)

    fallback |= (c_lo >= 0) & (r_lo >= 0)  # mixed shapes: per-row

    # ---- point coord messages: 3 varint fields {1:ref, 2:lon, 3:lat}
    pref = np.zeros(nv, np.int64)
    plon = np.zeros(nv, np.int64)
    plat = np.zeros(nv, np.int64)
    pm = (c_lo >= 0) & ~fallback
    if pm.any():
        cpos = np.where(pm, c_lo, 0)
        cact = pm.copy()
        while cact.any():
            ckey, cpos = _gather_uvarints(buf, cpos, cact)
            ctag = (ckey >> np.uint64(3)).astype(np.int64)
            cwt = (ckey & np.uint64(7)).astype(np.int64)
            if (cact & (cwt != 0)).any():
                fallback |= cact & (cwt != 0)
                cact &= cwt == 0
            cval, cpos = _gather_uvarints(buf, cpos, cact)
            dec = _unzigzag(cval)
            for t, arr in ((1, pref), (2, plon), (3, plat)):
                m = cact & (ctag == t)
                arr[m] = dec[m]
            cact = cact & (cpos < np.where(pm, c_hi, 0))

    # ---- ring messages: 3 length-delimited delta lists {1,2,3}
    f_lo = {1: np.full(nv, -1, np.int64), 2: np.full(nv, -1, np.int64),
            3: np.full(nv, -1, np.int64)}
    f_hi = {1: np.full(nv, -1, np.int64), 2: np.full(nv, -1, np.int64),
            3: np.full(nv, -1, np.int64)}
    rm = (r_lo >= 0) & ~fallback
    if rm.any():
        rpos = np.where(rm, r_lo, 0)
        ract = rm.copy()
        while ract.any():
            rkey, rpos = _gather_uvarints(buf, rpos, ract)
            rtag = (rkey >> np.uint64(3)).astype(np.int64)
            rwt = (rkey & np.uint64(7)).astype(np.int64)
            if (ract & (rwt != 2)).any():
                fallback |= ract & (rwt != 2)
                ract &= rwt == 2
            rln, rpos = _gather_uvarints(buf, rpos, ract)
            rln = rln.astype(np.int64)
            for t in (1, 2, 3):
                m = ract & (rtag == t)
                f_lo[t][m], f_hi[t][m] = rpos[m], rpos[m] + rln[m]
            rpos[ract] += rln[ract]
            ract = ract & (rpos < np.where(rm, r_hi, 0))
        rm = rm & ~fallback

    mask_span = lambda a, m: np.where(m, a, -1)
    rcnt, rsum, _rf, _rl = _segmented_delta_stats(
        buf, mask_span(f_lo[1], rm), mask_span(f_hi[1], rm))
    xcnt, xsum, xfirst, _xl = _segmented_delta_stats(
        buf, mask_span(f_lo[2], rm), mask_span(f_hi[2], rm))
    ycnt, ysum, _yf, ylast = _segmented_delta_stats(
        buf, mask_span(f_lo[3], rm), mask_span(f_hi[3], rm))

    pm = (c_lo >= 0) & ~fallback
    n_rings = (pm | rm).astype(np.int64)
    npts = np.where(pm, 1, xcnt)
    sum_ref = np.where(pm, pref, rsum)
    sum_lon = np.where(pm, plon, xsum)
    sum_lat = np.where(pm, plat, ysum)
    has_pts = npts > 0
    first_lon = np.where(pm, plon, xfirst)
    last_lat = np.where(pm, plat, ylast)

    out = {
        "gt": gt, "ot": ot, "zo": zo,
        "ar": np.asarray(ar_bits).view(np.float64).copy(),
        "n_rings": n_rings, "np": npts, "sum_ref": sum_ref,
        "sum_lon": sum_lon, "sum_lat": sum_lat,
        "first_lon": first_lon, "last_lat": last_lat,
        "has_pts": has_pts, "null": null,
    }

    # exact per-row fallback for non-mass shapes (polygons, repeats)
    if fallback.any():
        vidx = np.flatnonzero(~null)
        for vi in np.flatnonzero(fallback):
            d = unpack_blob(bytes(buf[starts[vi]:ends[vi]]))
            refs = (np.concatenate([r[0] for r in d["rings"]])
                    if d["rings"] else np.array([], dtype=np.int64))
            lons = (np.concatenate([r[1] for r in d["rings"]])
                    if d["rings"] else np.array([], dtype=np.int64))
            lats = (np.concatenate([r[2] for r in d["rings"]])
                    if d["rings"] else np.array([], dtype=np.int64))
            out["gt"][vi] = d["gt"]
            out["ot"][vi] = d["ot"]
            out["zo"][vi] = d["zo"]
            out["ar"][vi] = d["ar"]
            out["n_rings"][vi] = len(d["rings"])
            out["np"][vi] = len(lons)
            out["sum_ref"][vi] = int(refs.sum()) if len(refs) else 0
            out["sum_lon"][vi] = int(lons.sum()) if len(lons) else 0
            out["sum_lat"][vi] = int(lats.sum()) if len(lats) else 0
            out["has_pts"][vi] = len(lons) > 0
            out["first_lon"][vi] = int(lons[0]) if len(lons) else 0
            out["last_lat"][vi] = int(lats[-1]) if len(lats) else 0
    return out


# ----------------------------------------------------- udf surface

def pack_linestring_udf(with_bbox: bool = True):
    """pandas UDF (refs, lons, lats array<long>, zo long, ot int) ->
    binary packed-geometry blob."""

    @F.pandas_udf("binary")
    def _pack(refs: pd.Series, lons: pd.Series, lats: pd.Series,
              zo: pd.Series, ot: pd.Series) -> pd.Series:
        return pd.Series(
            pack_linestring_rows(list(refs), list(lons), list(lats),
                                 zo.to_numpy(np.int64),
                                 ot.to_numpy(np.int64), with_bbox),
            dtype=object,
        )

    return _pack


def pack_point_udf():
    @F.pandas_udf("binary")
    def _pack(ref: pd.Series, lon: pd.Series, lat: pd.Series,
              ot: pd.Series) -> pd.Series:
        return pd.Series(
            pack_point_rows(ref.to_numpy(np.int64),
                            lon.to_numpy(np.int64),
                            lat.to_numpy(np.int64),
                            ot.to_numpy(np.int64)),
            dtype=object,
        )

    return _pack


_DECODE_SCHEMA = (
    "struct<gt:int, ot:int, zo:bigint, ar:double, n_rings:int, "
    "np:int, sum_ref:bigint, sum_lon:bigint, sum_lat:bigint, "
    "first_lon:bigint, last_lat:bigint>"
)


def parse_geomblob_udf():
    """pandas UDF blob -> decoded summary struct (round-trip checks).
    Bulk path is the vectorized _summarize_blobs (flat numpy passes over
    the whole batch — r06; the old per-row tag walk was the geomblob
    stage's dominant cost); full ring recovery stays available via
    unpack_blob for tests."""

    @F.pandas_udf(_DECODE_SCHEMA)
    def _parse(blob: pd.Series) -> pd.DataFrame:
        s = _summarize_blobs(list(blob))
        null, has_pts = s["null"], s["has_pts"]

        def _scatter(vals, extra_null=None):
            """Int64 (nullable) column from per-valid-row values, nulls
            at null-blob rows (+ optional extra per-valid null mask)."""
            data = np.zeros(len(null), dtype=np.int64)
            data[~null] = vals
            mask = null.copy()
            if extra_null is not None:
                mask[~null] |= extra_null
            return pd.arrays.IntegerArray(data, mask)

        ar = np.full(len(null), np.nan)
        ar[~null] = s["ar"]
        return pd.DataFrame({
            "gt": _scatter(s["gt"]), "ot": _scatter(s["ot"]),
            "zo": _scatter(s["zo"]),
            "ar": pd.arrays.FloatingArray(ar, null.copy()),
            "n_rings": _scatter(s["n_rings"]), "np": _scatter(s["np"]),
            "sum_ref": _scatter(s["sum_ref"]),
            "sum_lon": _scatter(s["sum_lon"]),
            "sum_lat": _scatter(s["sum_lat"]),
            "first_lon": _scatter(s["first_lon"], ~has_pts),
            "last_lat": _scatter(s["last_lat"], ~has_pts),
        })

    return _parse
