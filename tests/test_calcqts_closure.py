"""Relation-closure semantics (resortwaynodes.go:767-824) on nested,
circular, and empty-member relations — vs a scalar fold oracle."""

import numpy as np
import pandas as pd

from osmquadtree_depreceated_spark.operators.calcqts import relation_cells
from osmquadtree_depreceated_spark.qtcore import point_cells_closed_form
from osmquadtree_depreceated_spark.qtcore import scalar_ref as ref


def test_nested_circular_relations(spark):
    # way cells: 6 ways with fixed cells
    lon = np.array([-5000000, -4900000, 3000000, 3100000, 8000000, 8100000])
    lat = np.array([505000000, 505100000, 515000000, 515100000, 511000000,
                    511100000])
    wcells_np = point_cells_closed_form(lon, lat, 18)
    wcells = spark.createDataFrame(
        pd.DataFrame({"way_id": np.arange(1, 7), "cell": wcells_np})
    )
    ncells = spark.createDataFrame([], "node_id long, cell long")

    # rel 1: ways 1,2 ; rel 2: ways 3,4 ; rel 3: rels 1,2 (nested)
    # rel 4: rel 3 (3 deep) ; rel 5: self-circular ; rel 6 <-> rel 7 pair
    # rel 8: way 5 + rel 4 ; rel 9: empty members (encoded as mtype='none')
    members = [
        (1, "w", 1), (1, "w", 2),
        (2, "w", 3), (2, "w", 4),
        (3, "r", 1), (3, "r", 2),
        (4, "r", 3),
        (5, "r", 5),
        (6, "r", 7), (7, "r", 6),
        (8, "w", 5), (8, "r", 4),
        (9, "none", 0),
    ]
    mdf = spark.createDataFrame(members, ["rel_id", "mtype", "ref"])
    got = {
        r["rel_id"]: r["cell"]
        for r in relation_cells(mdf, wcells, ncells, rounds=5).collect()
    }

    wc = {i + 1: int(c) for i, c in enumerate(wcells_np)}
    r1 = ref.common(wc[1], wc[2])
    r2 = ref.common(wc[3], wc[4])
    r3 = ref.common(r1, r2)
    r4 = r3
    r8 = ref.common(wc[5], r4)
    assert got[1] == r1
    assert got[2] == r2
    assert got[3] == r3
    assert got[4] == r4
    # self-circular with no other members -> 0 (resortwaynodes.go:795-800)
    assert got[5] == 0
    # mutually-circular pair never resolves -> Null (-1), mirroring the
    # reference's "missing rel qts" accounting
    assert got[6] == -1 and got[7] == -1
    assert got[8] == r8
    # empty-member relation -> 0 (resortwaynodes.go writeRelQts:
    # mm.Len()==0 -> Set(ei, 0))
    assert got[9] == 0
