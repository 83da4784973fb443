"""Globally-ordered write layout (plans/sorted.py).

The q64 gate pins content equality + disjoint file intervals at gate
scale; these tests pin the parts the gate can't isolate: full WITHIN-file
row order (read back file-by-file, sequentially, outside Spark), the
checker actually failing on an unsorted layout, and edge shapes."""

import glob
import os

import duckdb
import pytest

from osmquadtree_depreceated_spark.plans.sorted import (
    assert_global_order,
    file_ranges,
    read_global_sorted,
    write_global_sorted,
)


@pytest.fixture()
def df(spark):
    # keys deliberately written in a scrambled order with a skewed hot
    # key region, so the range sort has real work to do
    return spark.range(0, 5000).selectExpr(
        "cast((id * 2654435761) % 997 as long) as cell",
        "id as way_id",
    )


def test_sorted_write_roundtrip_and_layout(spark, df, tmp_path):
    path = str(tmp_path / "sorted")
    write_global_sorted(df, path, ["cell", "way_id"], num_partitions=6)
    n_files = assert_global_order(spark, path, ["cell", "way_id"])
    assert n_files > 1  # a single file would make the check vacuous
    got = sorted(
        (r.cell, r.way_id)
        for r in read_global_sorted(spark, path).collect()
    )
    exp = sorted((r.cell, r.way_id) for r in df.collect())
    assert got == exp


def test_within_file_rows_are_sorted(spark, df, tmp_path):
    # concatenating the files is only THE sorted stream if each file is
    # internally ordered too; read each file sequentially (duckdb
    # preserves single-file parquet row order) and check every step
    path = str(tmp_path / "sorted")
    write_global_sorted(df, path, ["cell", "way_id"], num_partitions=6)
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    assert len(files) > 1
    con = duckdb.connect()
    total = 0
    for f in files:
        rows = con.execute(
            f"select cell, way_id from read_parquet('{f}')"
        ).fetchall()
        assert rows == sorted(rows), f
        total += len(rows)
    assert total == df.count()


def test_checker_rejects_unsorted_layout(spark, df, tmp_path):
    # a hash-partitioned write has overlapping key ranges across files —
    # the layout check must fail loudly, not pass vacuously
    path = str(tmp_path / "hashed")
    df.repartition(6, "cell").write.mode("overwrite").parquet(path)
    with pytest.raises(RuntimeError, match="overlapping file ranges"):
        assert_global_order(spark, path, ["cell", "way_id"])


def test_file_ranges_orders_by_partition_index(spark, df, tmp_path):
    path = str(tmp_path / "sorted")
    write_global_sorted(df, path, ["cell", "way_id"], num_partitions=4)
    ranges = file_ranges(spark, path, ["cell", "way_id"])
    names = [os.path.basename(r.f) for r in ranges]
    assert names == sorted(names)  # part-00000 < part-00001 < ...
    assert sum(r.n for r in ranges) == df.count()


def test_single_partition_edge(spark, tmp_path):
    one = spark.range(0, 10).selectExpr("id as cell", "id as way_id")
    path = str(tmp_path / "single")
    write_global_sorted(one, path, ["cell", "way_id"], num_partitions=1)
    assert assert_global_order(spark, path, ["cell", "way_id"]) == 1
