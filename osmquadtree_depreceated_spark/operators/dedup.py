"""Deduplication operators for the documents pipeline.

  * exact_duplicates      — hash-groupBy (one shuffle on the content hash)
  * minhash_candidates    — MinHash + LSH banding: shingle -> k minhashes ->
                            band keys -> equi-self-join per band (the scale
                            path: candidates meet only inside a band bucket,
                            never all-pairs)
  * jaccard_verify        — exact shingle-Jaccard on candidate pairs only
  * simhash64             — 60-bit SimHash from token hashes (native aggs)
  * embedding_neardup     — cosine >= tau pairs; brute (broadcast matrix)
                            baseline + LSH sign-bucket scale path
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.text import minhash_signature, word_shingles


def exact_duplicates(docs: DataFrame, text: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents (md5 content hash)."""
    return (
        docs.select(F.expr(f"md5({text})").alias("text_md5"), id_col)
        .groupBy("text_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("min_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


def minhash_candidates(docs: DataFrame, text: str = "text",
                       id_col: str = "doc_id", k_hashes: int = 4,
                       band_size: int = 2, shingle_k: int = 3) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash+LSH banding.

    Each doc computes k minhashes natively; consecutive `band_size` hashes
    concatenate into band keys; docs sharing any band key become a candidate
    pair (doc_a < doc_b).  One shuffle per band on the band key — no
    all-pairs comparison, which is what makes this survive 10^12 docs.
    """
    sigs = docs.select(F.col(id_col).alias("doc"),
                       *minhash_signature(text, k_hashes, shingle_k))
    n_bands = k_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [f"mh{b * band_size + j}" for j in range(band_size)]
        bands.append(
            sigs.filter(
                F.expr(" and ".join(f"{c} is not null" for c in cols))
            ).select(
                "doc",
                F.concat_ws("|", F.lit(str(b)), *cols).alias("band_key"),
            )
        )
    all_bands = bands[0]
    for b in bands[1:]:
        all_bands = all_bands.unionByName(b)
    a = all_bands.alias("a")
    b_ = all_bands.alias("b")
    return (
        a.join(b_, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(docs: DataFrame, pairs: DataFrame, text: str = "text",
                   id_col: str = "doc_id", shingle_k: int = 3,
                   min_jaccard_x1000: int = 500) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (two semi-joins + one
    aggregation; only candidates pay the exact cost)."""
    sh = (
        docs.select(F.col(id_col).alias("doc"),
                    F.explode(F.expr(word_shingles(text, shingle_k)))
                    .alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    sha = sh.select(F.col("doc").alias("doc_a"), "shingle")
    shb = sh.select(F.col("doc").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sha, "doc_a").join(shb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "doc_a").join(nb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.expr(
                "cast(floor(1000.0 * n_inter / (n_a + n_b - n_inter)) as bigint)"
            ).alias("jaccard_x1000"),
        )
        .filter(F.col("jaccard_x1000") >= min_jaccard_x1000)
    )


def simhash64(docs: DataFrame, text: str = "text",
              id_col: str = "doc_id", bits: int = 60) -> DataFrame:
    """SimHash over whitespace tokens: per-bit majority vote of 60-bit token
    hashes (15 hex chars of md5), all native aggregates."""
    tok = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.expr(f"split({text}, ' ')")).alias("t"),
    ).withColumn("h", F.expr("cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint)"))
    votes = [
        F.sum(
            F.expr(f"case when (shiftright(h, {i}) & 1) = 1 then 1 else -1 end")
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("doc").agg(*votes)
    expr = " + ".join(
        f"(case when v{i} > 0 then {1 << i}L else 0L end)" for i in range(bits)
    )
    return agg.select("doc", F.expr(expr).alias("simhash"))


def embedding_neardup_brute(embeddings: DataFrame, tau: float,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """All-pairs cosine >= tau, brute force with a broadcast matrix —
    correctness baseline / oracle shape.  Requires the candidate set to fit
    in a broadcast (fine for dim tables; the LSH variant is the scale
    path)."""
    import pandas as pd

    rows = embeddings.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matn = mat / norms

    def _pairs(it):
        for pdf in it:
            bids = pdf[id_col].to_numpy(np.int64)
            bmat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            bn = np.linalg.norm(bmat, axis=1, keepdims=True)
            bn[bn == 0] = 1.0
            sims = (bmat / bn) @ matn.T
            ii, jj = np.nonzero(sims >= tau)
            keep = bids[ii] < ids[jj]
            yield pd.DataFrame(
                {"doc_a": bids[ii][keep], "doc_b": ids[jj][keep]}
            )

    return embeddings.mapInPandas(_pairs, "doc_a long, doc_b long").distinct()


def axis_plane_indices(n_planes: int = 8, n_tables: int = 4,
                       dim: int = 64, seed: int = 42):
    """Deterministic coordinate indices for the axis-aligned sign-LSH
    variant: per table, `n_planes` distinct dimensions sampled without
    replacement.  Shared by the Spark operator and the DuckDB oracle (both
    embed the same literal indices), so bucketing is reproducible across
    engines with zero floating-point summation."""
    rng = np.random.default_rng(seed)
    return [rng.permutation(dim)[:n_planes].tolist() for _ in range(n_tables)]


def embedding_neardup_lsh_axis(embeddings: DataFrame, tau: float,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               n_planes: int = 8, n_tables: int = 4,
                               dim: int = 64, seed: int = 42) -> DataFrame:
    """Sign-bucket LSH with AXIS-ALIGNED hyperplanes (h_p(x) = sign(x[j_p]),
    j_p deterministic per table/plane): the oracle-verifiable variant of
    embedding_neardup_lsh.  Bucket keys involve only per-coordinate sign
    tests — no dot products — so they are bit-reproducible in any engine;
    scaled duplicates keep identical signs, guaranteeing recall 1.0 on them.

    Bucketing is FULLY NATIVE (a case-when sum per table, unioned); only the
    within-bucket exact cosine runs as an Arrow-vectorized pair UDF over the
    bucket equi-join's survivors.  One shuffle per table on the bucket key —
    never all-pairs.  The Gaussian-plane variant (embedding_neardup_lsh)
    remains the default scale path for adversarial inputs where axis signs
    correlate; its recall is asserted against brute force in pytest.
    """
    idx = axis_plane_indices(n_planes, n_tables, dim, seed)
    branches = []
    for t in range(n_tables):
        key = " + ".join(
            f"(case when element_at({vec_col}, {int(idx[t][p]) + 1}) > 0 "
            f"then {1 << p} else 0 end)"
            for p in range(n_planes)
        )
        # stride by 2^n_planes so per-table key spaces NEVER overlap
        # (a fixed +1000 stride would collide for n_planes >= 10)
        branches.append(
            embeddings.select(
                F.col(id_col).alias("doc"),
                F.col(vec_col).alias("vec"),
                F.expr(
                    f"cast({t * (1 << n_planes)} + {key} as bigint)"
                ).alias("bucket"),
            )
        )
    bucketed = branches[0]
    for b in branches[1:]:
        bucketed = bucketed.unionByName(b)

    a = bucketed.alias("a")
    b_ = bucketed.alias("b")
    pairs = a.join(
        b_,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc") < F.col("b.doc")),
    ).select(
        F.col("a.doc").alias("doc_a"),
        F.col("b.doc").alias("doc_b"),
        F.col("a.vec").alias("va"),
        F.col("b.vec").alias("vb"),
    )

    @F.pandas_udf("double")
    def _pair_cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = np.array(va.tolist(), dtype=np.float64)
        B = np.array(vb.tolist(), dtype=np.float64)
        num = np.einsum("ij,ij->i", A, B)
        na = np.linalg.norm(A, axis=1)
        nb = np.linalg.norm(B, axis=1)
        den = na * nb
        den[den == 0] = 1.0
        return pd.Series(num / den)

    return (
        pairs.filter(_pair_cos("va", "vb") >= tau)
        .select("doc_a", "doc_b")
        .distinct()
    )


def embedding_neardup_lsh(embeddings: DataFrame, tau: float,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          n_planes: int = 8, n_tables: int = 4,
                          dim: int = 64, seed: int = 42) -> DataFrame:
    """Scale path: random-hyperplane sign buckets (n_tables independent
    tables of n_planes bits); exact cosine only within a bucket.  Recall is
    probabilistic — tested against the brute baseline.  One shuffle per
    table on the bucket key."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))

    def _bucket(it):
        for pdf in it:
            ids = pdf[id_col].to_numpy(np.int64)
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            out = {"doc": np.repeat(ids, n_tables)}
            keys = []
            for t in range(n_tables):
                signs = (mat @ planes[t].T) > 0
                key = (signs * (1 << np.arange(n_planes))).sum(axis=1)
                keys.append(t * (1 << n_planes) + key)  # disjoint per table
            out["bucket"] = np.stack(keys, axis=1).reshape(-1)
            vecs = np.repeat(np.arange(len(ids)), n_tables)
            df = pd.DataFrame(out)
            df["vec"] = [mat[i].tolist() for i in vecs]
            yield df

    bucketed = embeddings.mapInPandas(
        _bucket, f"doc long, bucket long, vec array<double>"
    )

    def _within(it):
        for pdf in it:
            res_a, res_b = [], []
            for _, grp in pdf.groupby("bucket"):
                if len(grp) < 2:
                    continue
                ids = grp["doc"].to_numpy(np.int64)
                mat = np.array(grp["vec"].tolist(), dtype=np.float64)
                n = np.linalg.norm(mat, axis=1, keepdims=True)
                n[n == 0] = 1.0
                sims = (mat / n) @ (mat / n).T
                ii, jj = np.nonzero(sims >= tau)
                keep = ids[ii] < ids[jj]
                res_a.append(ids[ii][keep])
                res_b.append(ids[jj][keep])
            if res_a:
                yield pd.DataFrame(
                    {"doc_a": np.concatenate(res_a),
                     "doc_b": np.concatenate(res_b)}
                )

    return (
        bucketed.repartition("bucket")
        .mapInPandas(_within, "doc_a long, doc_b long")
        .distinct()
    )


def duplicate_clusters(pairs: DataFrame, a_col: str = "doc_a",
                       b_col: str = "doc_b",
                       max_iters: int = 20) -> DataFrame:
    """Connected components over the duplicate-pair graph: every doc in a
    component is labeled with the component's SMALLEST doc id — the
    canonical keep-one representative dedup needs after pair generation
    (minhash/simhash/embedding pairs all feed this).

    Shape: iterative min-label propagation — per round each vertex takes
    the min label over itself and its neighbors (one shuffle on the
    vertex id), so rounds = component diameter (tiny for dedup graphs:
    stars/chains from banding).  Each round localCheckpoints to cut
    lineage, and convergence is detected with an O(1) driver-side
    changed-row count.  At 10^12 docs the distribution axis stays the
    vertex id; no component ever materializes on a single node.

    Returns (doc_id, cluster_id) for every doc appearing in `pairs`.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"),
                         F.col(a_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    def _round(labels):
        msgs = edges.join(
            labels, edges["src"] == labels["id"]
        ).select(F.col("dst").alias("id"), "label")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        return new_labels, changed

    # max_iters + 1 rounds: `changed` counts relabels DURING a round, so
    # when the final useful round lands exactly on iteration max_iters the
    # labels are fully converged but convergence is only OBSERVABLE one
    # round later — the extra round is that observation (and costs nothing
    # when convergence happened earlier: the loop breaks first)
    changed = -1  # "never converged" sentinel for the max_iters<=0 case
    for _ in range(max_iters + 1 if max_iters > 0 else 0):
        labels, changed = _round(labels)
        if changed == 0:
            break
    else:
        # a component wider than max_iters rounds would silently keep >1
        # doc per near-dup chain downstream (q44/q45 keep verdicts) —
        # refuse to return partially-propagated labels
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iters} rounds "
            f"({changed} labels still changing); raise max_iters — "
            "component diameter exceeds the round budget"
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )
