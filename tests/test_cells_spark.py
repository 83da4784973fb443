"""Spark-native cell expressions vs the NumPy kernels (which are themselves
property-tested against the scalar oracle in test_qtcore.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmquadtree_depreceated_spark.functions import (
    cell_of_bbox_udf,
    cell_round,
    cell_string,
    cell_tuple,
    common_agg,
    point_cell,
    point_in_poly_udf,
)
from osmquadtree_depreceated_spark.functions.cells import common_finish
from osmquadtree_depreceated_spark.qtcore import (
    calculate_cells,
    cells_to_strings,
    cells_to_tuples,
    point_cells_closed_form,
    point_in_poly,
    round_cells,
)
from osmquadtree_depreceated_spark.qtcore import scalar_ref as ref

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def coords_df(spark):
    n = 30000
    lon = RNG.integers(-1799999999, 1799999999, n)
    lat = RNG.integers(-849999999, 849999999, n)
    pdf = pd.DataFrame({"id": np.arange(n), "lon": lon, "lat": lat})
    return spark.createDataFrame(pdf), pdf


def test_point_cell_native_matches_numpy(coords_df):
    df, pdf = coords_df
    got = (
        df.select("id", point_cell("lon", "lat", 18).alias("cell"))
        .orderBy("id")
        .toPandas()
    )
    want = point_cells_closed_form(pdf["lon"].values, pdf["lat"].values, 18)
    np.testing.assert_array_equal(got["cell"].values, want)


def test_point_cell_exact_merc_matches_numpy(coords_df):
    # the exact_merc variant routes merc(lat) through NumPy libm — always
    # bit-identical to the kernel, including tile-edge-straddling latitudes
    from osmquadtree_depreceated_spark.functions.cells import with_point_cell

    df, pdf = coords_df
    got = (
        with_point_cell(df, "lon", "lat", "cell", 18, exact_merc=True)
        .select("id", "cell")
        .orderBy("id")
        .toPandas()
    )
    want = point_cells_closed_form(pdf["lon"].values, pdf["lat"].values, 18)
    np.testing.assert_array_equal(got["cell"].values, want)


def test_point_cell_is_codegen_native(coords_df):
    df, _ = coords_df
    plan = df.select(point_cell("lon", "lat"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cell_round_and_codecs(coords_df, spark):
    df, pdf = coords_df
    cells = round_cells(
        point_cells_closed_form(pdf["lon"].values, pdf["lat"].values, 18),
        RNG.integers(0, 19, len(pdf)),
    )
    cdf = spark.createDataFrame(pd.DataFrame({"i": np.arange(len(cells)), "cell": cells}))
    tup = cell_tuple("cell")
    got = (
        cdf.select(
            "i",
            cell_round("cell", 11).alias("r11"),
            cell_string("cell").alias("s"),
            tup["x"].alias("x"),
            tup["y"].alias("y"),
            tup["z"].alias("z"),
        )
        .orderBy("i")
        .toPandas()
    )
    np.testing.assert_array_equal(got["r11"].values, round_cells(cells, 11))
    x, y, z = cells_to_tuples(cells)
    np.testing.assert_array_equal(got["x"].values, x)
    np.testing.assert_array_equal(got["y"].values, y)
    np.testing.assert_array_equal(got["z"].values, z)
    assert (got["s"].values == cells_to_strings(cells)).all()


def test_common_agg_native(spark):
    n = 8000
    lon = RNG.integers(-1000000000, 1000000000, n)
    lat = RNG.integers(-800000000, 800000000, n)
    cells = round_cells(point_cells_closed_form(lon, lat, 18), RNG.integers(0, 19, n))
    grp = RNG.integers(0, 500, n)
    df = spark.createDataFrame(pd.DataFrame({"g": grp, "cell": cells}))
    got = (
        df.groupBy("g")
        .agg(*common_agg("cell"))
        .select("g", common_finish().alias("common"))
        .orderBy("g")
        .toPandas()
    )
    want = {}
    for g, c in zip(grp, cells):
        want[g] = ref.common(want.get(g, -1), int(c))
    for g, c in zip(got["g"], got["common"]):
        assert want[int(g)] == int(c)


def test_cell_of_bbox_udf_matches_numpy(spark):
    n = 20000
    minx = RNG.integers(-1800000000, 1790000000, n)
    miny = RNG.integers(-850000000, 840000000, n)
    maxx = minx + RNG.integers(0, 10000000, n)
    maxy = miny + RNG.integers(0, 10000000, n)
    pdf = pd.DataFrame(
        {"id": np.arange(n), "minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy}
    )
    df = spark.createDataFrame(pdf)
    calc = cell_of_bbox_udf(0.05, 18)
    got = (
        df.select("id", calc("minx", "miny", "maxx", "maxy").alias("cell"))
        .orderBy("id")
        .toPandas()
    )
    want = calculate_cells(minx, miny, maxx, maxy, 0.05, 18)
    np.testing.assert_array_equal(got["cell"].values, want)


def test_point_in_poly_udf(spark):
    poly_lon = [0, 10_000_000, 10_000_000, 5_000_000, 0]
    poly_lat = [500000000, 500000000, 510000000, 515000000, 510000000]
    n = 5000
    tx = RNG.integers(-2_000_000, 12_000_000, n)
    ty = RNG.integers(498000000, 517000000, n)
    df = spark.createDataFrame(pd.DataFrame({"i": np.arange(n), "x": tx, "y": ty}))
    pip = point_in_poly_udf(poly_lon, poly_lat)
    got = df.select("i", pip("x", "y").alias("inside")).orderBy("i").toPandas()
    want = point_in_poly(np.array(poly_lon), np.array(poly_lat), tx, ty)
    np.testing.assert_array_equal(got["inside"].values, want)


def test_native_descent_exact_merc_bit_identical_everywhere(spark):
    # exact_merc=True: bit parity with the NumPy kernel on every box,
    # degenerate/point boxes included, for multiple buffer/level configs
    from osmquadtree_depreceated_spark.functions.cells import with_cell_of_bbox

    n = 20000
    minx = RNG.integers(-1800000000, 1790000000, n)
    miny = RNG.integers(-850000000, 840000000, n)
    w = RNG.integers(0, 10000000, n)
    w[: n // 4] = RNG.integers(0, 3, n // 4)  # degenerate slice
    h = RNG.integers(0, 10000000, n)
    h[: n // 4] = RNG.integers(0, 3, n // 4)
    maxx = minx + w
    maxy = miny + h
    pdf = pd.DataFrame(
        {"id": np.arange(n), "minx": minx, "miny": miny, "maxx": maxx,
         "maxy": maxy}
    )
    df = spark.createDataFrame(pdf)
    for bf, lvl in [(0.05, 18), (0.025, 18), (0.0, 13)]:
        got = (
            with_cell_of_bbox(df, "minx", "miny", "maxx", "maxy", "cell",
                              bf, lvl, exact_merc=True)
            .select("id", "cell").orderBy("id").toPandas()
        )
        want = calculate_cells(minx, miny, maxx, maxy, bf, lvl)
        np.testing.assert_array_equal(got["cell"].values, want)


def test_native_descent_pure_jvm_near_exact(spark):
    # exact_merc=False (zero Python): allowed to diverge only in deep
    # digits on a <=1e-3 fraction of rows (JVM Math vs libm 1-ulp ln/tan)
    from osmquadtree_depreceated_spark.functions.cells import with_cell_of_bbox

    n = 20000
    minx = RNG.integers(-1800000000, 1790000000, n)
    miny = RNG.integers(-850000000, 840000000, n)
    maxx = minx + RNG.integers(0, 10000000, n)
    maxy = miny + RNG.integers(0, 10000000, n)
    pdf = pd.DataFrame(
        {"id": np.arange(n), "minx": minx, "miny": miny, "maxx": maxx,
         "maxy": maxy}
    )
    df = spark.createDataFrame(pdf)
    got = (
        with_cell_of_bbox(df, "minx", "miny", "maxx", "maxy", "cell",
                          0.05, 18, exact_merc=False)
        .select("id", "cell").orderBy("id").toPandas()
    )
    want = calculate_cells(minx, miny, maxx, maxy, 0.05, 18)
    assert (got["cell"].values != want).mean() <= 1e-3


def test_native_bbox_descent_stays_jvm(spark):
    from osmquadtree_depreceated_spark.functions.cells import with_cell_of_bbox

    df = spark.createDataFrame(
        pd.DataFrame({"minx": [1], "miny": [2], "maxx": [3], "maxy": [4]})
    )
    plan = (
        with_cell_of_bbox(df, "minx", "miny", "maxx", "maxy",
                          exact_merc=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    # exact_merc=True: the ONLY Python in the plan is the 2-value merc UDF
    plan2 = (
        with_cell_of_bbox(df, "minx", "miny", "maxx", "maxy",
                          exact_merc=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan2.count("ArrowEvalPython") <= 1
