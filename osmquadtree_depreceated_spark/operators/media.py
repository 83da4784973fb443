"""Multimodal media columns: opaque binary payloads + typed metadata with
real Spark-side plumbing (schema, partitioning, Arrow batch shape).

PNG payloads get a REAL decode — signature/IHDR parse, IDAT inflate and
full scanline de-filtering (all five filter types) with nothing but
stdlib zlib + struct + numpy, so the pipeline exercises actual pixel
bytes end to end (gate q30 hashes features of the decoded pixels against
an arithmetic oracle).  Non-PNG payloads fall back to the clearly-marked
deterministic stub (no ffmpeg/PIL in this container) — the mapInPandas
batch plumbing (binary column in, struct-of-features out) is identical
either way; a real deployment swaps `_decode_stub` for the codec.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType

N_FEATURES = 8
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def media_blobs(docs_with_text: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Attach an opaque binary payload per document: media_ref pointer +
    blob (content-hash bytes as a stand-in asset; at production scale this
    column IS the fetched bytes).  Fully native."""
    return docs_with_text.select(
        id_col,
        F.expr(f"concat('m://', md5({text_col}))").alias("media_ref"),
        F.expr(f"sha2({text_col}, 256)").alias("sha_hex"),
        F.expr(f"unhex(sha2({text_col}, 256))").alias("blob"),
    )


# ------------------------------------------------ real PNG codec (stdlib)

def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def synth_png_bytes(doc_id: int) -> bytes:
    """Deterministic tiny grayscale PNG per doc: w = 4 + id%13,
    h = 4 + id%11, pixel(x, y) = (7x + 13y + 31*id) mod 256 — closed-form
    pixels, so an oracle can predict every decoded feature arithmetically
    without being able to touch the compressed bytes."""
    w, h = 4 + doc_id % 13, 4 + doc_id % 11
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)[:, None]
    px = ((7 * x + 13 * y + 31 * doc_id) % 256).astype(np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in px)  # filter 0 rows
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Parse + inflate + de-filter an 8-bit grayscale PNG with stdlib
    only.  Supports all five scanline filters (None/Sub/Up/Average/Paeth)
    — the synthesizer emits filter 0, but any conforming encoder's
    grayscale output decodes.  Returns (width, height, h x w uint8)."""
    if blob[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos + 8 <= len(blob):
        (length,), tag = struct.unpack(">I", blob[pos:pos + 4]), \
            blob[pos + 4:pos + 8]
        payload = blob[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    if len(raw) != h * (w + 1):
        raise ValueError("bad scanline byte count")
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        line = raw[y * (w + 1):(y + 1) * (w + 1)]
        f, cur = line[0], np.frombuffer(
            line[1:], dtype=np.uint8).astype(np.int32)
        if f == 0:
            pass
        elif f == 2:  # Up
            cur = (cur + prev) % 256
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            rec = np.zeros(w, dtype=np.int32)
            for x in range(w):
                a = rec[x - 1] if x else 0   # left
                b = prev[x]                  # above
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    c = prev[x - 1] if x else 0  # upper-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c)
                rec[x] = (cur[x] + pred) % 256
            cur = rec
        else:
            raise ValueError(f"unknown filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return w, h, out


def png_pixel_features(px: np.ndarray) -> list[int]:
    """The q30 feature vector over decoded pixels: total sum, first-row
    sum, first-col sum, corner values, max, min, bright-pixel count —
    each arithmetically predictable from the synthesizer's closed form."""
    p = px.astype(np.int64)
    return [
        int(p.sum()), int(p[0, :].sum()), int(p[:, 0].sum()),
        int(p[0, 0]), int(p[-1, -1]), int(p.max()), int(p.min()),
        int((p > 127).sum()),
    ]


def png_blobs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesized PNG payload per document (deterministic from the id).
    The encoder is inherently per-image Python (zlib stream per row) —
    fixture synthesis, not a hot-path operator; batches still move
    through Arrow."""

    @F.pandas_udf(BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return pd.Series(
            [synth_png_bytes(int(i)) for i in ids], dtype=object
        )

    return docs.select(
        id_col,
        F.concat(F.lit("png://"), F.col(id_col).cast("string"))
        .alias("media_ref"),
        _mk(F.col(id_col)).alias("blob"),
    )


def _decode_stub(sha_hex: str, blob: bytes):
    """Deterministic decode STUB (no media libs in this container): metadata
    from the payload hash.  A real deployment replaces this body with
    PIL/ffmpeg decode of `blob`."""
    width = ((ord(sha_hex[0]) % 16) + 1) * 64
    height = ((ord(sha_hex[1]) % 16) + 1) * 64
    feats = [float(ord(sha_hex[2 + i])) for i in range(N_FEATURES)]
    return width, height, feats


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.

    Input: (doc_id, media_ref, sha_hex, blob binary).  Output adds
    n_bytes, width, height, f0..f{N-1}.  Batches stream through
    mapInPandas — the binary payloads never materialize on the driver and
    each batch emits exactly one row per input row (shape-preserving)."""
    feat_cols = ", ".join(f"f{i} long" for i in range(N_FEATURES))
    schema = (
        "doc_id long, media_ref string, n_bytes int, width int, height int, "
        + feat_cols
    )

    has_sha = "sha_hex" in media.columns

    def _batches(it):
        for pdf in it:
            n = len(pdf)
            out = {
                "doc_id": pdf["doc_id"].astype("int64"),
                "media_ref": pdf["media_ref"],
                "n_bytes": [len(b) for b in pdf["blob"]],
            }
            widths, heights = np.zeros(n, np.int32), np.zeros(n, np.int32)
            feats = np.zeros((n, N_FEATURES), np.int64)
            shas = pdf["sha_hex"] if has_sha else None
            for i, blob in enumerate(pdf["blob"]):
                if bytes(blob[:8]) == PNG_MAGIC:
                    w, h, px = decode_png(bytes(blob))
                    f = png_pixel_features(px)
                else:
                    # stub metadata comes from a content hash; without a
                    # precomputed sha_hex column, hash the blob itself
                    sha = (shas.iloc[i] if shas is not None
                           else hashlib.sha256(bytes(blob)).hexdigest())
                    w, h, f = _decode_stub(sha, blob)
                widths[i], heights[i] = w, h
                feats[i] = f
            out["width"] = widths
            out["height"] = heights
            for j in range(N_FEATURES):
                out[f"f{j}"] = feats[:, j]
            yield pd.DataFrame(out)

    return media.mapInPandas(_batches, schema)


# ------------------------------------------------ real WAV codec (stdlib)

WAV_SAMPLE_RATE = 8000
N_AUDIO_FEATURES = 7


def synth_wav_bytes(doc_id: int) -> bytes:
    """Deterministic tiny mono 8-bit PCM WAV per doc: n = 16 + id%50
    samples, sample(i) = (5i + 17*id) mod 256 — closed-form samples, so an
    oracle predicts every decoded feature arithmetically.  Encoded with
    the stdlib `wave` module (a REAL RIFF writer, structurally independent
    of the hand-rolled chunk-walker in `decode_wav`)."""
    import io
    import wave

    n = 16 + doc_id % 50
    i = np.arange(n, dtype=np.int64)
    samples = ((5 * i + 17 * doc_id) % 256).astype(np.uint8)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)  # 8-bit unsigned PCM
        wf.setframerate(WAV_SAMPLE_RATE)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Hand-rolled RIFF/WAVE parser (stdlib struct only, deliberately NOT
    the `wave` module that encodes the fixtures): walk chunks honoring
    each chunk's declared size + RIFF even-byte padding, read `fmt ` for
    (channels, rate, bits), `data` for the 8-bit unsigned PCM payload.
    Returns (n_channels, sample_rate, samples uint8).  Unknown chunks
    (LIST/INFO/...) are skipped by size, so metadata-bearing files
    decode too."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    channels = rate = bits = None
    data = None
    while pos + 8 <= len(blob):
        tag = blob[pos:pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        payload = blob[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt_code, channels, rate = struct.unpack("<HHI", payload[:8])
            (bits,) = struct.unpack("<H", payload[14:16])
            if fmt_code != 1 or bits != 8:
                raise ValueError("only 8-bit PCM supported")
        elif tag == b"data":
            data = payload
        pos += 8 + size + (size & 1)  # RIFF pads odd chunks to even
    if channels is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return channels, rate, np.frombuffer(data, dtype=np.uint8)


def wav_sample_features(samples: np.ndarray) -> list[int]:
    """The q62 feature vector over decoded samples: sum, min, max,
    loud-sample count, first, last, total variation (sum |s[i+1]-s[i]|)
    — each arithmetically predictable from the synthesizer's closed
    form."""
    s = samples.astype(np.int64)
    return [
        int(s.sum()), int(s.min()), int(s.max()), int((s > 127).sum()),
        int(s[0]), int(s[-1]), int(np.abs(np.diff(s)).sum()),
    ]


def wav_blobs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesized WAV payload per document (deterministic from the id).
    Encoder is per-row stdlib `wave` — fixture synthesis, not a hot-path
    operator; batches still move through Arrow."""

    @F.pandas_udf(BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return pd.Series(
            [synth_wav_bytes(int(i)) for i in ids], dtype=object
        )

    return docs.select(
        id_col,
        F.concat(F.lit("wav://"), F.col(id_col).cast("string"))
        .alias("media_ref"),
        _mk(F.col(id_col)).alias("blob"),
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched audio decode/feature-extract over the binary column
    (same mapInPandas posture as `extract_media_features`): RIFF payloads
    get the REAL stdlib decode; anything else falls through to the
    labeled content-hash stub so the batch shape is uniform.  One output
    row per input row; payload bytes never touch the driver."""
    feat_cols = ", ".join(f"a{i} long" for i in range(N_AUDIO_FEATURES))
    schema = (
        "doc_id long, media_ref string, n_bytes int, n_channels int, "
        "sample_rate int, n_samples int, " + feat_cols
    )

    def _batches(it):
        for pdf in it:
            n = len(pdf)
            out = {
                "doc_id": pdf["doc_id"].astype("int64"),
                "media_ref": pdf["media_ref"],
                "n_bytes": [len(b) for b in pdf["blob"]],
            }
            chans = np.zeros(n, np.int32)
            rates = np.zeros(n, np.int32)
            counts = np.zeros(n, np.int32)
            feats = np.zeros((n, N_AUDIO_FEATURES), np.int64)
            for i, blob in enumerate(pdf["blob"]):
                b = bytes(blob)
                if b[:4] == b"RIFF":
                    ch, rate, samples = decode_wav(b)
                    chans[i], rates[i] = ch, rate
                    counts[i] = len(samples)
                    feats[i] = wav_sample_features(samples)
                else:
                    sha = hashlib.sha256(b).hexdigest()
                    chans[i], rates[i] = 1, 0
                    counts[i] = 0
                    feats[i] = [ord(sha[j]) for j in
                                range(N_AUDIO_FEATURES)]
            out["n_channels"] = chans
            out["sample_rate"] = rates
            out["n_samples"] = counts
            for j in range(N_AUDIO_FEATURES):
                out[f"a{j}"] = feats[:, j]
            yield pd.DataFrame(out)

    return media.mapInPandas(_batches, schema)


def encode_png(px: np.ndarray) -> bytes:
    """8-bit grayscale PNG from an (h x w) uint8 array (filter-0 rows +
    stdlib zlib — the synthesizer's encoding, generalized to any pixel
    array so decoded-and-transformed images can be re-emitted)."""
    h, w = px.shape
    raw = b"".join(b"\x00" + row.tobytes() for row in px)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def resize_media(media: DataFrame, factor: int = 2) -> DataFrame:
    """Image resize over the binary column — REAL for PNG payloads:
    decode -> nearest-neighbor stride (px[::factor, ::factor], the
    top-left-anchored subsample) -> re-encode, all stdlib + numpy inside
    the Arrow batch.  Non-PNG payloads pass through unchanged (the
    labeled stub posture: a real deployment adds its codec to this same
    mapInPandas body).  Shape-preserving (one row per input row);
    payload bytes never touch the driver."""
    schema = "doc_id long, media_ref string, blob binary"

    def _batches(it):
        for pdf in it:
            out_blobs = []
            for blob in pdf["blob"]:
                b = bytes(blob)
                if b[:8] == PNG_MAGIC:
                    _w, _h, px = decode_png(b)
                    out_blobs.append(encode_png(px[::factor, ::factor]))
                else:
                    out_blobs.append(b)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "media_ref": pdf["media_ref"],
                "blob": pd.Series(out_blobs, dtype=object),
            })

    return media.mapInPandas(_batches, schema)


def sample_frames(media: DataFrame, n_frames: int = 4,
                  duration_col: str = "duration_ms") -> DataFrame:
    """Frame sampling over a video-typed binary column: one input row
    fans out to `n_frames` output rows with evenly spaced timestamps —
    the 1:N mapInPandas batch shape a real frame sampler needs (ffmpeg
    seek+decode goes in this same body; this container has no codec, so
    the frame payload is the labeled deterministic stub
    sha256(media_ref:idx), and the gate oracle recomputes it).  Output
    partitioning follows the input (no shuffle introduced by the
    fan-out)."""
    schema = ("doc_id long, media_ref string, frame_idx int, "
              "ts_ms long, frame_sha string")

    def _batches(it):
        for pdf in it:
            n = len(pdf)
            idx = np.tile(np.arange(n_frames, dtype=np.int64), n)
            doc = np.repeat(pdf["doc_id"].to_numpy(np.int64), n_frames)
            dur = np.repeat(pdf[duration_col].to_numpy(np.int64),
                            n_frames)
            refs = pdf["media_ref"].to_numpy()
            ref_rep = np.repeat(refs, n_frames)
            yield pd.DataFrame({
                "doc_id": doc,
                "media_ref": ref_rep,
                "frame_idx": idx.astype(np.int32),
                "ts_ms": idx * dur // n_frames,
                "frame_sha": [
                    hashlib.sha256(f"{r}:{i}".encode()).hexdigest()
                    for r, i in zip(ref_rep, idx)
                ],
            })

    return media.mapInPandas(_batches, schema)
