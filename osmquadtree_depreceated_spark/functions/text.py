"""Text-analysis Column builders for the documents pipeline.

All native expressions (split / transform / aggregate / md5) — no Python in
the hot path.  Token model: whitespace split (empties preserved, matching
the oracle's string_split semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = ["the", "and", "of", "a", "to", "in", "is"]


def tokens(text: str = "text") -> Column:
    return F.split(F.col(text), " ")


def n_tokens(text: str = "text") -> Column:
    return F.size(tokens(text))


def stopword_count(text: str = "text") -> Column:
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return F.expr(
        f"size(filter(split({text}, ' '), t -> t in ({sw})))"
    )


def avg_token_len_x100(text: str = "text") -> Column:
    """Mean token length ×100 as an integer (deterministic cross-engine)."""
    return F.expr(
        f"cast(floor(aggregate(split({text}, ' '), 0L, (a, t) -> a + length(t))"
        f" * 100.0 / greatest(size(split({text}, ' ')), 1)) as bigint)"
    )


def quality_bucket(text: str = "text") -> Column:
    """Coarse quality score: long-enough docs with a sane stopword ratio
    rank higher.  Integer arithmetic only."""
    nt = f"size(split({text}, ' '))"
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    sc = f"size(filter(split({text}, ' '), t -> t in ({sw})))"
    return F.expr(
        f"case when {nt} < 10 then 0 "
        f"when {sc} * 20 < {nt} then 1 "
        f"when {sc} * 2 > {nt} then 2 "
        f"else 3 end"
    )


# Character-trigram language/domain classifier: a literal trigram->weight
# map per class, evaluated fully natively (sequence + transform + aggregate
# — one codegen'd pass per class, no Python).  Classes are scored by
# summing the weights of every trigram occurrence; the winner needs at
# least LANG_MIN_SCORE or the doc falls back to 'unk'.  Ties break by
# LANG_CLASSES order (strict > while scanning in order).  Deterministic
# and arithmetically replicable in DuckDB (gate q15).
LANG_CLASSES = ["tech", "sqlish", "perf"]
TRIGRAM_WEIGHTS = {
    "tech": {"dat": 2, "has": 2, "spa": 2, "vec": 1, "tab": 1},
    "sqlish": {"que": 2, "joi": 2, "mer": 2, "agg": 2, "fil": 1},
    "perf": {"fas": 2, "slo": 2, "win": 2, "bat": 1, "sor": 1},
}
LANG_MIN_SCORE = 4


def trigram_score(cls: str, text: str = "text") -> Column:
    """Summed trigram weights for one class, natively."""
    cases = " ".join(
        f"when t = '{g}' then {w}"
        for g, w in sorted(TRIGRAM_WEIGHTS[cls].items())
    )
    return F.expr(
        f"case when length({text}) < 3 then 0L else "
        f"aggregate(transform(sequence(1, length({text}) - 2), "
        f"i -> substring({text}, i, 3)), 0L, "
        f"(a, t) -> a + (case {cases} else 0 end)) end"
    )


def lang_trigram(text: str = "text") -> Column:
    """Multi-class trigram language guess: argmax class score (ties by
    LANG_CLASSES order), 'unk' below LANG_MIN_SCORE."""
    scores = {c: trigram_score(c, text) for c in LANG_CLASSES}
    best = F.greatest(*scores.values()) if len(scores) > 1 else next(
        iter(scores.values())
    )
    out = F.lit("unk")
    # build the when-chain in REVERSE class order so earlier classes win
    # ties (each later when() wraps the earlier result)
    for c in reversed(LANG_CLASSES):
        out = F.when(
            (scores[c] >= F.lit(LANG_MIN_SCORE)) & (scores[c] == best),
            F.lit(c),
        ).otherwise(out)
    return out


def bpe_token_estimate(n_chars: str = "n_chars") -> Column:
    """BPE-ish token-count estimate: ceil(chars / 4)."""
    return F.expr(f"cast(ceil({n_chars} / 4.0) as bigint)")


def fingerprint_md5_16(text: str = "text") -> Column:
    """16-hex-char document fingerprint (md5 prefix)."""
    return F.expr(f"substr(md5({text}), 1, 16)")


def rolling_fingerprint_udf(window: int = 16, base: int = 1_000_003,
                            mod: int = (1 << 61) - 1):
    """Arrow-vectorized rolling polynomial hash fingerprint: minimum of the
    rolling-window hashes over the byte sequence (winnowing-style document
    fingerprint).  Python-side (NumPy) — used where true content-defined
    fingerprints are needed; the md5-prefix variant is the native fast path.
    """
    import numpy as np
    import pandas as pd

    @F.pandas_udf("long")
    def _fp(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.int64)
        for i, s in enumerate(text):
            b = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8)
            if len(b) == 0:
                out[i] = 0
                continue
            n = min(window, len(b))
            # rolling hash over all windows of length n, vectorized
            weights = np.power(
                np.uint64(base), np.arange(n - 1, -1, -1, dtype=np.uint64),
                dtype=np.uint64,
            )
            m = np.lib.stride_tricks.sliding_window_view(b, n).astype(np.uint64)
            h = (m * weights).sum(axis=1) % np.uint64(mod)
            out[i] = np.int64(h.min())
        return pd.Series(out)

    return _fp


def word_shingles(text: str = "text", k: int = 3) -> str:
    """SQL fragment: array of word k-gram shingles (1-based element_at so
    Spark and DuckDB index identically).  Docs with fewer than k tokens
    yield an empty array — guarded explicitly because Spark's
    sequence(1, 0) produces a DESCENDING sequence, not an empty one."""
    w = f"split({text}, ' ')"
    gram = ", ".join(f"element_at({w}, i + {j})" for j in range(k))
    return (
        f"(case when size({w}) < {k} then cast(array() as array<string>) "
        f"else transform(sequence(1, size({w}) - {k - 1}),"
        f" i -> concat_ws(' ', {gram})) end)"
    )


def minhash_signature(text: str = "text", k_hashes: int = 4,
                      shingle_k: int = 3) -> list:
    """k minhash values over word shingles: min over md5('{j}|' || shingle).
    Deterministic and reproducible in any engine with md5."""
    sh = word_shingles(text, shingle_k)
    return [
        F.expr(
            f"array_min(transform({sh}, s -> md5(concat('{j}|', s))))"
        ).alias(f"mh{j}")
        for j in range(k_hashes)
    ]
