"""As-of join semantics (operators/update.py::asof_join).

The tricky cases the q63 gate can't isolate one-by-one: inclusive
equality, the tiebreak among equal-timestamp right rows, genuinely-NULL
right values (must NOT fall through to an older row — the struct-payload
guarantee), probes before any event, and inner-vs-left."""

import pytest

from osmquadtree_depreceated_spark.operators.update import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    right = spark.createDataFrame(
        [
            # key, ts, event_id, val
            (1, 10, 100, "a"),
            (1, 20, 200, "b"),
            (1, 20, 201, "c"),   # equal-ts tie: larger event_id wins
            (1, 30, 300, None),  # newest value legitimately NULL
            (2, 15, 400, "x"),
        ],
        "k long, ts long, event_id long, val string",
    )
    left = spark.createDataFrame(
        [
            (1, 5),    # before any event -> no match
            (1, 10),   # inclusive equality -> event 100
            (1, 20),   # tie at ts=20 -> event 201
            (1, 25),   # between -> still event 201
            (1, 99),   # after the NULL-valued event -> 300, val NULL
            (2, 15),   # other key, equality
            (3, 50),   # key with no right rows at all
        ],
        "k long, pts long",
    )
    return left, right


def _run(left, right, how="left"):
    out = asof_join(
        left, right, key_cols=["k"], left_ts="pts", right_ts="ts",
        right_cols=["event_id", "val", "ts"],
        tiebreak_cols=["event_id"], how=how,
    )
    return {(r.k, r.pts): (r.event_id, r.val, r.ts)
            for r in out.collect()}, out


def test_asof_left_semantics(frames):
    got, out = _run(*frames)
    assert set(out.columns) == {"k", "pts", "event_id", "val", "ts"}
    assert got[(1, 5)] == (None, None, None)
    assert got[(1, 10)] == (100, "a", 10)      # inclusive equality
    assert got[(1, 20)] == (201, "c", 20)      # event_id tiebreak
    assert got[(1, 25)] == (201, "c", 20)
    # the newest event's NULL value must surface as NULL, not fall
    # through to the older 'c'
    assert got[(1, 99)] == (300, None, 30)
    assert got[(2, 15)] == (400, "x", 15)
    assert got[(3, 50)] == (None, None, None)
    assert len(got) == 7


def test_asof_inner_drops_unmatched(frames):
    got, _ = _run(*frames, how="inner")
    assert (1, 5) not in got and (3, 50) not in got
    assert len(got) == 5
    # matched rows identical to the left-join answer
    assert got[(1, 99)] == (300, None, 30)


def test_asof_rejects_bad_how(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "pts", "ts", ["val"], how="outer")


def test_asof_rejects_reserved_and_overlapping_names(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="reserved column"):
        asof_join(left.withColumnRenamed("pts", "_ts"), right,
                  ["k"], "_ts", "ts", ["val"])
    with pytest.raises(ValueError, match="duplicate key"):
        asof_join(left, right, ["k"], "pts", "ts", ["k", "val"])


def test_asof_lookup_matches_asof_join(frames):
    """The broadcast small-dimension plan must give the identical answer
    to the shuffle plan on every tricky case, both join modes."""
    from osmquadtree_depreceated_spark.operators.update import asof_lookup

    left, right = frames
    for how in ("left", "inner"):
        want, _ = _run(left, right, how=how)
        out = asof_lookup(
            left, right, key_cols=["k"], left_ts="pts", right_ts="ts",
            right_cols=["event_id", "val", "ts"],
            tiebreak_cols=["event_id"], how=how,
        )
        got = {(r.k, r.pts): (r.event_id, r.val, r.ts)
               for r in out.collect()}
        assert got == want, how


def test_asof_lookup_broadcasts_and_never_shuffles_facts(frames):
    from osmquadtree_depreceated_spark.operators.update import asof_lookup

    left, right = frames
    out = asof_lookup(left, right, ["k"], "pts", "ts", ["val"])
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only hash-partitioned exchange is the DIMENSION history agg;
    # the fact side goes straight from scan to broadcast-join
    assert plan.count("Exchange hashpartitioning") <= 1


def test_asof_lookup_rejects_reserved_names(frames):
    from osmquadtree_depreceated_spark.operators.update import asof_lookup

    left, right = frames
    with pytest.raises(ValueError, match="reserved column"):
        asof_lookup(left.withColumnRenamed("pts", "_pick"), right,
                    ["k"], "_pick", "ts", ["val"])


def test_asof_single_shuffle_plan(frames):
    """The scale property: one Exchange on the key, no join operator at
    all (the union+window plan) — a range-join rewrite would show a
    BroadcastNestedLoop/Cartesian here."""
    left, right = frames
    out = asof_join(left, right, ["k"], "pts", "ts", ["val"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
