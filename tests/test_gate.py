"""Driver-gate rehearsal: every queries() entry vs its DuckDB oracle,
compared the way the driver does (row count + schema-name + sorted values).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from osmquadtree_depreceated_spark import gate
from osmquadtree_depreceated_spark.sources.tpch import BASE_TABLES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in BASE_TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(gate.GATE_QUERIES))
def test_gate_query_matches_oracle(name, spark, sf_dir, duck):
    if name not in gate.GATE_ORACLES:
        # rows-only queries: must at least execute and return a stable schema
        df = gate.GATE_QUERIES[name](spark, sf_dir)
        assert df.count() >= 0
        return
    got = _canon(gate.GATE_QUERIES[name](spark, sf_dir).toPandas())
    want = _canon(duck.execute(gate.GATE_ORACLES[name]).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {got.columns} vs {want.columns}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert np.allclose(
                g.astype(float), w.astype(float), rtol=0, atol=0, equal_nan=True
            ), f"{name}.{c}"
        else:
            assert (g == w).all(), f"{name}.{c}: first diff at " \
                f"{np.argwhere(g != w)[:3]}"


def test_entry_smoke(spark):
    df = gate.entry_query(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) >= 0
    assert {"query_id", "tile_x", "tile_y", "tile_z", "n_ways"} <= set(
        df.columns
    )
