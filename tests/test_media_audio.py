"""Stdlib WAV codec + decoded-sample audio pipeline (operators/media.py).

The encoder is the stdlib `wave` module; the decoder is the engine's own
RIFF chunk walker — structurally independent implementations, so a
round-trip cannot hide a symmetric parsing bug.
"""

import io
import struct
import wave

import numpy as np
import pytest

from osmquadtree_depreceated_spark.operators.media import (
    WAV_SAMPLE_RATE,
    decode_wav,
    synth_wav_bytes,
    wav_sample_features,
)


def _expected_samples(doc_id: int) -> np.ndarray:
    n = 16 + doc_id % 50
    i = np.arange(n, dtype=np.int64)
    return ((5 * i + 17 * doc_id) % 256).astype(np.uint8)


def test_synth_roundtrip_exact_samples():
    # ids chosen to cover odd AND even sample counts (pad-byte parity)
    for did in (0, 1, 7, 42, 49, 50, 671, 9999):
        ch, rate, s = decode_wav(synth_wav_bytes(did))
        exp = _expected_samples(did)
        assert (ch, rate) == (1, WAV_SAMPLE_RATE)
        assert (s == exp).all()


def test_wave_module_agrees():
    # the stdlib reader must see the same stream our parser decodes
    for did in (3, 48, 49):
        b = synth_wav_bytes(did)
        with wave.open(io.BytesIO(b)) as wf:
            assert wf.getnchannels() == 1
            assert wf.getsampwidth() == 1
            assert wf.getframerate() == WAV_SAMPLE_RATE
            frames = np.frombuffer(
                wf.readframes(wf.getnframes()), dtype=np.uint8
            )
        _, _, s = decode_wav(b)
        assert (s == frames).all()


def test_chunk_walker_skips_metadata_and_pads():
    # a LIST/INFO chunk with an ODD payload size before `data`: the
    # walker must honor the declared size + RIFF pad byte, not assume
    # the wave-module's fixed 44-byte layout
    raw = synth_wav_bytes(13)
    fmt_chunk, data_chunk = raw[12:36], raw[36:]
    meta = b"INFOart"  # 7 bytes -> pad byte required
    lst = b"LIST" + struct.pack("<I", len(meta)) + meta + b"\x00"
    body = b"WAVE" + fmt_chunk + lst + data_chunk
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    ch, rate, s = decode_wav(blob)
    assert (ch, rate) == (1, WAV_SAMPLE_RATE)
    assert (s == _expected_samples(13)).all()


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"\x00" * 64)
    # 16-bit PCM is out of scope for the 8-bit feature path
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x01" * 8)
    with pytest.raises(ValueError):
        decode_wav(buf.getvalue())


def test_features_closed_form():
    did = 42
    s = _expected_samples(did).astype(np.int64)
    f = wav_sample_features(s)
    assert f[0] == int(s.sum())
    assert f[1] == int(s.min()) and f[2] == int(s.max())
    assert f[3] == int((s > 127).sum())
    assert f[4] == int(s[0]) and f[5] == int(s[-1])
    assert f[6] == int(np.abs(np.diff(s)).sum())


def test_spark_pipeline_decodes_real_bytes(spark):
    from osmquadtree_depreceated_spark.operators.media import (
        extract_audio_features,
        wav_blobs,
    )

    docs = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    out = extract_audio_features(wav_blobs(docs)).orderBy("doc_id")
    rows = out.collect()
    assert len(rows) == 60
    for r in rows:
        exp = _expected_samples(r.doc_id).astype(np.int64)
        assert r.n_channels == 1
        assert r.sample_rate == WAV_SAMPLE_RATE
        assert r.n_samples == len(exp)
        assert r.n_bytes == 44 + len(exp)
        assert [r.a0, r.a1, r.a2, r.a3, r.a4, r.a5, r.a6] == \
            wav_sample_features(exp)
