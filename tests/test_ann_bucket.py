"""LSH-bucketed ANN serving ops (operators/ann.py::axis_sign_bucket /
bucket_topk): bucket-key parity with a scalar computation, exact
within-bucket ranking, self-exclusion, and the broadcast plan shape.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmquadtree_depreceated_spark.operators.ann import (
    axis_sign_bucket,
    bucket_topk,
)
from osmquadtree_depreceated_spark.operators.dedup import axis_plane_indices


def _vecs(n, dim, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, dim)).round(3)


def test_axis_sign_bucket_matches_scalar(spark):
    dim, planes = 16, 5
    idx = axis_plane_indices(planes, 1, dim, seed=9)[0]
    v = _vecs(50, dim, 3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v[i]]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: r.b for r in
           df.select("vec_id",
                     axis_sign_bucket("embedding", idx).alias("b")).collect()}
    want = {i: sum((1 << p) for p, j in enumerate(idx) if v[i][j] > 0)
            for i in range(50)}
    assert got == want


def test_bucket_topk_exact_within_bucket(spark):
    # one shared bucket: ranking must equal the numpy exact cosine order
    v = _vecs(12, 8, 7)
    rows = [(i, [float(x) for x in v[i]], 1) for i in range(12)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, bucket long")
    queries = df.filter(F.col("vec_id") < 2)
    out = bucket_topk(queries, df, k=4)
    got = {(r.query_id, r.rank): r.neighbor_id for r in out.collect()}

    norms = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = norms @ norms.T
    for qid in (0, 1):
        order = sorted(
            (i for i in range(12) if i != qid),
            key=lambda i: (-sims[qid][i], i),
        )[:4]
        for rank, nid in enumerate(order, start=1):
            assert got[(qid, rank)] == nid
    # self never appears
    assert all(nid != q for (q, _), nid in got.items())


def test_bucket_topk_respects_buckets_and_broadcasts(spark):
    # two buckets: a query in bucket 0 must never see bucket-1 vectors,
    # and the candidates side must join via BroadcastHashJoin (no
    # candidate shuffle)
    v = _vecs(20, 8, 11)
    rows = [(i, [float(x) for x in v[i]], i % 2) for i in range(20)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, bucket long")
    queries = df.filter(F.col("vec_id") == 0)
    out = bucket_topk(queries, df, k=50)
    ids = {r.neighbor_id for r in out.collect()}
    assert ids == {i for i in range(20) if i % 2 == 0 and i != 0}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
