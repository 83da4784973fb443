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


def _trigram_score_sql(cls: str, text: str = "text") -> str:
    """SQL fragment: summed trigram weights for one class."""
    cases = " ".join(
        f"when t = '{g}' then {w}"
        for g, w in sorted(TRIGRAM_WEIGHTS[cls].items())
    )
    return (
        f"case when length({text}) < 3 then 0L else "
        f"aggregate(transform(sequence(1, length({text}) - 2), "
        f"i -> substring({text}, i, 3)), 0L, "
        f"(a, t) -> a + (case {cases} else 0 end)) end"
    )


def trigram_score(cls: str, text: str = "text") -> Column:
    """Summed trigram weights for one class, natively."""
    return F.expr(_trigram_score_sql(cls, text))


def _scores_struct_sql(text: str = "text") -> str:
    """SQL fragment: every class score as one struct (one O(len)
    interpreted trigram scan per class)."""
    fields = ", ".join(
        f"{_trigram_score_sql(c, text)} as s{i}"
        for i, c in enumerate(LANG_CLASSES)
    )
    return f"struct({fields})"


def _label_sql(sc: str) -> str:
    """SQL fragment: argmax label over a cheap scores-struct reference
    `sc` (ties by LANG_CLASSES order — ordered case, same as a
    reverse-built when-chain), 'unk' below LANG_MIN_SCORE."""
    best = "greatest(" + ", ".join(
        f"{sc}.s{i}" for i in range(len(LANG_CLASSES))
    ) + ")" if len(LANG_CLASSES) > 1 else f"{sc}.s0"
    whens = " ".join(
        f"when {sc}.s{i} >= {LANG_MIN_SCORE} and {sc}.s{i} = {best} "
        f"then '{c}'"
        for i, c in enumerate(LANG_CLASSES)
    )
    return f"case {whens} else 'unk' end"


def trigram_scores_struct(text: str = "text") -> Column:
    """All class scores as ONE struct column.  Materialize this (its own
    withColumn / projection layer), then derive the label with
    `lang_from_scores` and the per-class columns as cheap field
    extractions — each class's aggregate runs once per row."""
    return F.expr(_scores_struct_sql(text))


def lang_from_scores(scores_col: str) -> Column:
    """Label from a materialized scores-struct column (see
    trigram_scores_struct)."""
    return F.expr(_label_sql(scores_col))


def lang_trigram(text: str = "text") -> Column:
    """Multi-class trigram language guess: argmax class score (ties by
    LANG_CLASSES order), 'unk' below LANG_MIN_SCORE.

    Standalone form: the per-class aggregates are let-bound into one
    struct (`_let`) so each class's O(len) interpreted trigram scan runs
    ONCE per row — the naive greatest + when-chain composition
    re-evaluates every score ~3x (these aggregates never codegen;
    measured 13.3 s -> 4.8 s on the sf0.1 documents).  Queries that ALSO
    select the individual scores should use trigram_scores_struct +
    lang_from_scores instead, sharing one scan set across all outputs."""
    return F.expr(_let(
        _scores_struct_sql(text), "__sc", _label_sql("__sc")
    ))


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


def _let(bound_expr: str, var: str, body: str) -> str:
    """SQL let-binding: evaluate `bound_expr` ONCE per row and reference it
    as `var` inside `body`, via a single-element transform whose lambda
    variable is the binding.  Higher-order functions are CodegenFallback
    (interpreted), so a subexpression textually repeated inside a lambda
    re-evaluates per reference — for an expression referenced once per
    array element that turns O(n) work into O(n^2) per row (measured 30 s
    on the sf0.1 minhash gate).  The binding restores the intended cost
    with byte-identical results."""
    return (
        f"element_at(transform(array({bound_expr}), {var} -> {body}), 1)"
    )


def word_shingles(text: str = "text", k: int = 3) -> str:
    """SQL fragment: array of word k-gram shingles (1-based element_at so
    Spark and DuckDB index identically).  Docs with fewer than k tokens
    yield an empty array — guarded explicitly because Spark's
    sequence(1, 0) produces a DESCENDING sequence, not an empty one.

    The token array is let-bound (`_let`) so split() runs once per row —
    inlining it textually would re-split per shingle element (O(tokens^2)
    interpreted work; this fragment sits under transform/aggregate, which
    never codegen)."""
    gram = ", ".join(f"element_at(__w, i + {j})" for j in range(k))
    return _let(
        f"split({text}, ' ')",
        "__w",
        f"(case when size(__w) < {k} then cast(array() as array<string>) "
        f"else transform(sequence(1, size(__w) - {k - 1}),"
        f" i -> concat_ws(' ', {gram})) end)",
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
