"""Globally-ordered tile output: the reference's block sort.

The reference materializes its final planet file as a SINGLE stream of
tile blocks in global quadtree order (sortblocks' external spill-merge,
blocksort.go: collect per-tile temp blocks, then a k-way merge emits
tiles smallest-cell-first into the output PBF).  The Spark-first
re-expression is a range-partitioned distributed sort:

  ``repartitionByRange(cell, ...)``  — one RangePartitioning exchange
  whose boundaries come from a driver-side reservoir sample (Spark's
  built-in equivalent of the reference's spill-file planning; no data
  ever funnels through one node), then
  ``sortWithinPartitions(cell, ...)`` — each partition externally sorts
  its own slice (spillable, Tungsten sort),

so partition *i* holds exactly the rows between boundary *i-1* and
boundary *i*, every file is internally sorted, and reading the files in
partition order replays the identical globally-sorted stream the
reference's merge loop writes.  At 100 TB this is the same plan: the
range exchange is the only shuffle, parallelism is `num_partitions`
tasks, and no executor ever holds more than its slice (the external
sort spills).  Skewed cells fatten one range; `num_partitions` (or AQE)
splits around them because boundaries are drawn from the sampled key
distribution, not a fixed grid.

`file_ranges` + `assert_global_order` turn the layout claim into a
checkable invariant: per-file (min, max, count) derived from the files
themselves must be strictly increasing disjoint intervals in file-name
order (part-NNNNN names encode the partition index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_global_sorted(df: DataFrame, path: str, sort_cols,
                        num_partitions: int | None = None) -> None:
    """Range-partition + internally sort + write: the distributed
    external sort.  `sort_cols` should end with a unique tiebreaker so
    the global order is total (blocksort emits ties in element order)."""
    cols = [F.col(c) for c in sort_cols]
    ranged = (df.repartitionByRange(num_partitions, *cols)
              if num_partitions else df.repartitionByRange(*cols))
    ranged.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)


def read_global_sorted(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def file_ranges(spark: SparkSession, path: str, sort_cols) -> list:
    """Per-file (file, min(sort_cols), max(sort_cols), count) computed
    FROM THE WRITTEN FILES (input_file_name at runtime — df.inputFiles()
    ignores runtime pruning and says nothing about content).  O(files)
    rows on the driver; the scan itself is distributed and reads only
    the sort columns."""
    struct = F.struct(*[F.col(c) for c in sort_cols])
    rows = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("f"), struct.alias("k"))
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return sorted(rows, key=lambda r: r.f)


def assert_global_order(spark: SparkSession, path: str, sort_cols) -> int:
    """Raise unless the files form strictly increasing disjoint key
    intervals in file-name (= partition) order — the property that makes
    concatenating the files THE globally sorted stream.  Returns the
    file count so callers can also pin parallelism expectations."""
    ranges = file_ranges(spark, path, sort_cols)
    if not ranges:
        raise RuntimeError(f"global-sort layout check: no files in {path}")
    for prev, cur in zip(ranges, ranges[1:]):
        if not tuple(prev.hi) < tuple(cur.lo):
            raise RuntimeError(
                "global-sort layout check: overlapping file ranges "
                f"{prev.f}(hi={tuple(prev.hi)}) vs "
                f"{cur.f}(lo={tuple(cur.lo)})"
            )
    return len(ranges)
