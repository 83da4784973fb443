"""tile_pyramid: multi-level rollup semantics (operators/tile_groups.py).

Hand-built cells with known ancestor structure, the reference rounding
semantics (cell key = path<<(63-2d) | d), exclusion of null/negative
cells, and the parent-consistency invariant: at every level L, the count
under a parent equals the number of input cells whose depth is >= L and
whose rounded key equals the parent.
"""

import pytest
from pyspark.sql import functions as F

from osmquadtree_depreceated_spark.operators.tile_groups import tile_pyramid
from osmquadtree_depreceated_spark.qtcore.quadtree import round_cells


def _mk_cell(path_quads, depth):
    """Build a cell key from a list of quad digits (0..3) of length depth."""
    v = 0
    for i, q in enumerate(path_quads):
        v |= q << (61 - 2 * i)
    return v | depth


def test_pyramid_handcrafted(spark):
    # Three deep cells sharing a level-1 ancestor (quad 2), one shallow
    # cell at depth 1 in quad 1, one no-cell sentinel and one NULL.
    a = _mk_cell([2, 0, 1], 3)
    b = _mk_cell([2, 0, 3], 3)
    c = _mk_cell([2, 2], 2)
    d = _mk_cell([1], 1)
    rows = [(1, a), (2, b), (3, c), (4, d), (5, -1), (6, None)]
    df = spark.createDataFrame(rows, "id long, cell long")

    out = tile_pyramid(df, "cell", 18, sum_cols=("id",))
    got = {(r.level, r.pcell): (r.n, r.sum_id) for r in out.collect()}

    # level 0: all four valid cells under the root.
    assert got[(0, 0)] == (4, 1 + 2 + 3 + 4)
    # level 1: a,b,c under quad-2 ancestor; d is its own level-1 cell.
    anc2 = _mk_cell([2], 1)
    anc1 = _mk_cell([1], 1)
    assert got[(1, anc2)] == (3, 6)
    assert got[(1, anc1)] == (1, 4)
    # level 2: d (depth 1) is clamped out; a,b share [2,0]; c alone.
    assert got[(2, _mk_cell([2, 0], 2))] == (2, 3)
    assert got[(2, _mk_cell([2, 2], 2))] == (1, 3)
    # level 3: only the two depth-3 cells survive the clamp, as leaves.
    assert got[(3, a)] == (1, 1)
    assert got[(3, b)] == (1, 2)
    assert (3, c) not in got
    # nothing deeper than the deepest input.
    assert max(lvl for lvl, _ in got) == 3
    # total row check: 1 + 2 + (2) + 2 levels
    assert len(got) == 1 + 2 + 2 + 2


def test_pyramid_matches_scalar_round(spark):
    """Each (level, pcell) group equals a scalar qtcore.round_cells pass."""
    import numpy as np

    rng = np.random.default_rng(11)
    cells = []
    for _ in range(300):
        depth = int(rng.integers(0, 19))
        quads = [int(q) for q in rng.integers(0, 4, depth)]
        cells.append(_mk_cell(quads, depth))
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cells)], "id long, cell long"
    )
    got = {(r.level, r.pcell): r.n
           for r in tile_pyramid(df, "cell", 18).collect()}

    want = {}
    arr = np.array(cells, dtype=np.int64)
    for lvl in range(19):
        mask = (arr & 31) >= lvl
        for p in round_cells(arr[mask], lvl):
            want[(lvl, int(p))] = want.get((lvl, int(p)), 0) + 1
    assert got == want


def test_pyramid_plan_is_two_aggregates(spark):
    """The physical plan must be histogram-first: two HashAggregate pairs
    (partial+final per stage), no join, no Python eval."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 37 % 1000 * 32 + 18).alias("cell")
    )
    plan = tile_pyramid(df, "cell", 18)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pyramid_incremental_merge_equals_recompute(spark):
    """Signed delta folded into a base pyramid == recompute over the
    modified set, including zero-count group removal at every level."""
    import numpy as np

    from osmquadtree_depreceated_spark.operators.tile_groups import (
        pyramid_merge,
    )

    rng = np.random.default_rng(23)
    cells = []
    for _ in range(200):
        depth = int(rng.integers(1, 19))
        quads = [int(q) for q in rng.integers(0, 4, depth)]
        cells.append(_mk_cell(quads, depth))
    rows = [(i, c) for i, c in enumerate(cells)]
    df = spark.createDataFrame(rows, "id long, cell long")
    base = tile_pyramid(df, "cell", 18, sum_cols=("id",))

    # move 30 rows to new cells, delete 10, add 5 fresh rows
    moved = rows[:30]
    deleted = rows[30:40]
    new_cells = [_mk_cell([int(q) for q in rng.integers(0, 4, 7)], 7)
                 for _ in moved]
    added = [(1000 + k, _mk_cell([int(q) for q in rng.integers(0, 4, 5)], 5))
             for k in range(5)]

    delta_rows = (
        [(i, c, -1) for i, c in moved + deleted]
        + [(i, nc, 1) for (i, _), nc in zip(moved, new_cells)]
        + [(i, c, 1) for i, c in added]
    )
    delta_df = spark.createDataFrame(delta_rows, "id long, cell long, w int")
    delta = tile_pyramid(delta_df, "cell", 18, sum_cols=("id",),
                         weight_col="w")
    merged = pyramid_merge(base, delta)

    final_rows = ([(i, nc) for (i, _), nc in zip(moved, new_cells)]
                  + rows[40:] + added)
    want_df = tile_pyramid(
        spark.createDataFrame(final_rows, "id long, cell long"),
        "cell", 18, sum_cols=("id",),
    )
    got = {(r.level, r.pcell): (r.n, r.sum_id) for r in merged.collect()}
    want = {(r.level, r.pcell): (r.n, r.sum_id) for r in want_df.collect()}
    assert got == want


def test_pyramid_merge_drops_zero_groups(spark):
    """A group retracted to n=0 disappears entirely."""
    from osmquadtree_depreceated_spark.operators.tile_groups import (
        pyramid_merge,
    )

    c = _mk_cell([3, 1], 2)
    base = tile_pyramid(
        spark.createDataFrame([(7, c)], "id long, cell long"),
        "cell", 18, sum_cols=("id",),
    )
    delta = tile_pyramid(
        spark.createDataFrame([(7, c, -1)], "id long, cell long, w int"),
        "cell", 18, sum_cols=("id",), weight_col="w",
    )
    assert pyramid_merge(base, delta).count() == 0
