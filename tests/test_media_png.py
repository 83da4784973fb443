"""Stdlib PNG codec + decoded-pixel media pipeline (operators/media.py)."""

import struct
import zlib

import numpy as np
import pytest

from osmquadtree_depreceated_spark.operators.media import (
    PNG_MAGIC,
    _png_chunk,
    decode_png,
    png_pixel_features,
    synth_png_bytes,
)


def _expected_pixels(doc_id: int) -> np.ndarray:
    w, h = 4 + doc_id % 13, 4 + doc_id % 11
    x, y = np.arange(w), np.arange(h)[:, None]
    return ((7 * x + 13 * y + 31 * doc_id) % 256).astype(np.uint8)


def test_synth_roundtrip_exact_pixels():
    for did in (0, 1, 42, 671, 9999):
        w, h, px = decode_png(synth_png_bytes(did))
        exp = _expected_pixels(did)
        assert (w, h) == (exp.shape[1], exp.shape[0])
        assert (px == exp).all()


def _encode_with_filter(px: np.ndarray, filt: int) -> bytes:
    h, w = px.shape
    raws, prev = [], np.zeros(w, dtype=np.int64)
    for yy in range(h):
        cur = px[yy].astype(np.int64)
        left = np.concatenate(([0], cur[:-1]))
        if filt == 0:
            line = cur
        elif filt == 1:
            line = (cur - left) % 256
        elif filt == 2:
            line = (cur - prev) % 256
        elif filt == 3:
            line = (cur - (left + prev) // 2) % 256
        else:
            line = np.zeros(w, dtype=np.int64)
            for xx in range(w):
                a = cur[xx - 1] if xx else 0
                b, c = prev[xx], (prev[xx - 1] if xx else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[xx] = (cur[xx] - pred) % 256
        raws.append(bytes([filt]) + bytes(line.astype(np.uint8)))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(raws)))
            + _png_chunk(b"IEND", b""))


def test_decode_all_five_filters():
    px = _expected_pixels(77)
    for filt in range(5):
        _, _, got = decode_png(_encode_with_filter(px, filt))
        assert (got == px).all(), f"filter {filt}"


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a....")
    with pytest.raises(ValueError, match="grayscale"):
        bad_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # RGB
        decode_png(PNG_MAGIC + _png_chunk(b"IHDR", bad_ihdr))


def test_features_closed_form():
    did = 123
    _, _, px = decode_png(synth_png_bytes(did))
    f = png_pixel_features(px)
    p = px.astype(np.int64)
    assert f == [p.sum(), p[0, :].sum(), p[:, 0].sum(), p[0, 0],
                 p[-1, -1], p.max(), p.min(), (p > 127).sum()]


def test_spark_pipeline_decodes_real_bytes(spark):
    from osmquadtree_depreceated_spark.operators.media import (
        extract_media_features,
        png_blobs,
    )

    docs = spark.range(12).withColumnRenamed("id", "doc_id")
    out = extract_media_features(png_blobs(docs)).collect()
    assert len(out) == 12
    for r in out:
        exp = _expected_pixels(r.doc_id)
        ef = png_pixel_features(exp)
        assert (r.width, r.height) == (exp.shape[1], exp.shape[0])
        assert [r.f0, r.f1, r.f2, r.f3, r.f4, r.f5, r.f6, r.f7] == ef
        assert r.media_ref == f"png://{r.doc_id}"
        assert r.n_bytes > 8  # the actual compressed payload length
