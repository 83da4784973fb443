"""Cell-partitioned tables: the serving-layout half of the prune story.

SURVEY.md §4 row 1 maps the reference's header-block index + tile files
(readfile.GetHeaderBlock + packeddatastore tile prune) to a table
PARTITIONED on the rounded cell key: a tile/bbox query then turns into a
partition-pruning filter — Spark never opens non-matching files, which is
the distributed analogue of seeking straight to the indexed tile blocks.

Local backend is `partitionBy` parquet; on a real cluster the same calls
target an Iceberg table with `PARTITIONED BY (part_cell)` (identity
transform) and the filter prunes manifests instead of directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.cells import cell_round
from ..qtcore import cover_cells

PART_COL = "part_cell"


def write_cell_partitioned(df: DataFrame, path: str, level: int = 6,
                           cell_col: str = "cell") -> None:
    """Write `df` partitioned by cell_round(cell, level).  Null/invalid
    cells land in partition 0 (the root), mirroring the reference's
    null-qt -> tile 0 rule (update.go:451-456).

    The shuffle on PART_COL before the write is load-bearing: without it
    every task writes a shard into every partition directory (tasks x
    partitions small files — measured 8x slower and 55x more files at
    sf0.1 local[32]); with it each partition value is one task's
    contiguous write.  For a production hot-cell skew case, cap file
    sizes with spark.sql.files.maxRecordsPerFile rather than dropping
    the repartition."""
    out = df.withColumn(
        PART_COL, cell_round(f"greatest({cell_col}, 0L)", level)
    )
    out.repartition(PART_COL).write.partitionBy(PART_COL).mode(
        "overwrite"
    ).parquet(path)


def read_cell_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def pruned_tile_scan(spark: SparkSession, path: str, qminx: int, qminy: int,
                     qmaxx: int, qmaxy: int, level: int,
                     cell_buffer: float = 0.05) -> DataFrame:
    """Scan only the partitions whose buffered cover intersects the query
    box, then apply the exact bbox residual.  `level` must equal the level
    the table was written with; `cell_buffer` must match the cell
    calculation buffer.  The isin() literal list reaches the scan as a
    partition filter — check .explain() for PartitionFilters + a pruned
    partition count."""
    cover = [int(c) for c in
             cover_cells(qminx, qminy, qmaxx, qmaxy, level, cell_buffer)]
    df = spark.read.parquet(path).filter(F.col(PART_COL).isin(cover))
    return df.filter(
        (F.col("minx") <= F.lit(qmaxx)) & (F.col("miny") <= F.lit(qmaxy))
        & (F.col("maxx") >= F.lit(qminx)) & (F.col("maxy") >= F.lit(qminy))
    )
