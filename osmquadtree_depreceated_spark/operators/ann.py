"""Similarity search over embedding columns.

Brute-force cosine top-k is the correctness baseline (and the oracle shape);
the scale path partitions candidates by an LSH bucket (random-hyperplane
sign bits) so each query only scans matching buckets.  Both produce
(query_id, rank, neighbor_id).

Design for 100 TB: queries are a small broadcast matrix; candidates stream
through mapInPandas as Arrow batches and each batch emits only its local
top-k (a combiner), so the final shuffle carries k rows per (query, batch)
— never the full candidate set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def cosine_topk(queries: DataFrame, candidates: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                qid_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest candidate
    vectors by cosine similarity (descending), ties broken by candidate id
    ascending; self-matches (equal ids) excluded.

    queries is collected to a broadcast matrix (small by contract); each
    Arrow batch of candidates computes a vectorized float64 matmul and emits
    its local top-k, then one narrow window selects the global top-k.
    """
    qrows = queries.select(qid_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    out_schema = "query_id long, neighbor_id long, cos double"

    def _topk_batches(it):
        for pdf in it:
            ids = pdf[id_col].to_numpy(np.int64)
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ qnorm.T  # (n_cand, n_q)
            n = len(ids)
            kk = min(k + 1, n)  # +1 headroom for self-match removal
            for j, qid in enumerate(qids):
                col = sims[:, j]
                # tie-break INSIDE the combiner too: argpartition keeps an
                # arbitrary subset when >kk candidates tie exactly at the
                # boundary cosine (realistic with scaled-duplicate vectors),
                # which could drop a lower-id neighbor before the global
                # window applies its (cos desc, id asc) rule.  Widen the cut
                # to every row tied with the kk-th value, then lexsort just
                # that (normally tiny) head — O(n) stays the common case.
                part = np.argpartition(-col, kk - 1)
                boundary = col[part[kk - 1]]
                head = np.nonzero(col >= boundary)[0]
                hsel = head[np.lexsort((ids[head], -col[head]))[:kk]]
                idx = hsel
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": ids[idx],
                        "cos": col[idx],
                    }
                )

    local = candidates.mapInPandas(_topk_batches, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
