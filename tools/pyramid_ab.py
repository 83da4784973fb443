"""Zoom-pyramid rollup A/B (operators/tile_groups.py::tile_pyramid
evidence).

Two plans for the same answer, measured on a shape that mirrors
production (many rows, comparatively few distinct cells — the q67
regime at any scale):

  naive       explode the 19-wide ancestor array over EVERY input row,
              then aggregate: the first shuffle moves ~19x the input.
  histogram   tile_pyramid's plan: collapse to distinct cells first
              (one keyed shuffle with map-side partials), explode over
              the histogram, re-aggregate — the fan-out multiplies
              distinct cells, never rows.

Reported per variant: wall seconds (median of ROUNDS) and a value
checksum (row count + sum of n + sum of pcell) asserted EQUAL across
variants (value semantics are oracle-verified by gate q67).  Writes
BENCH/PYRAMID_AB.md and prints one JSON line.

Run:  python tools/pyramid_ab.py             (local[8])
Env:  PYR_ROWS (default 5_000_000), PYR_CELLS (20_000),
      PYR_CPUS (8), PYR_ROUNDS (5)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("PYR_ROWS", "5000000"))
CELLS = int(os.environ.get("PYR_CELLS", "20000"))
CPUS = int(os.environ.get("PYR_CPUS", "8"))
ROUNDS = int(os.environ.get("PYR_ROUNDS", "5"))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from osmquadtree_depreceated_spark.conf import apply_engine_conf
    from osmquadtree_depreceated_spark.functions.cells import cell_round
    from osmquadtree_depreceated_spark.operators.tile_groups import (
        tile_pyramid,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    apply_engine_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic cells: CELLS distinct depth-18 keys, each
    # hit ~ROWS/CELLS times (city-block-sized tiles under heavy reuse).
    # Key layout per the engine codec: path << (63 - 2*18) | 18.
    df = spark.range(ROWS).select(
        (F.shiftleft((F.col("id") * 2654435761) % CELLS, 63 - 2 * 18)
         + 18).alias("cell")
    ).localCheckpoint()

    def histogram_df():
        return tile_pyramid(df, "cell", 18)

    def naive_df():
        ancestors = F.array(*[
            F.struct(F.lit(lvl).alias("level"),
                     cell_round("cell", lvl).alias("pcell"))
            for lvl in range(19)
        ])
        ex = (df.withColumn("_lp", F.explode(ancestors))
              .where(F.col("_lp.level")
                     <= F.col("cell").bitwiseAND(F.lit(31))))
        return (ex.groupBy(F.col("_lp.level").alias("level"),
                           F.col("_lp.pcell").alias("pcell"))
                .agg(F.count(F.lit(1)).alias("n")))

    variants = {"naive": naive_df, "histogram": histogram_df}
    res, sums = {}, {}
    for name, mk in variants.items():
        chk = mk().agg(
            F.count(F.lit(1)).alias("g"),
            F.sum("n").alias("s"),
            F.sum("pcell").alias("p"),
        ).collect()[0]
        sums[name] = (chk.g, chk.s, chk.p)
        times = []
        for _ in range(ROUNDS):
            t0 = time.time()
            mk().count()
            times.append(time.time() - t0)
        res[name] = {
            "median_s": round(statistics.median(times), 3),
            "all_s": [round(t, 3) for t in times],
        }
    assert sums["naive"] == sums["histogram"], sums

    line = {"ab": "tile_pyramid", "rows": ROWS, "cells": CELLS,
            "cpus": CPUS, "rounds": ROUNDS,
            "checksum": list(sums["histogram"]), **res}
    print(json.dumps(line))

    md = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "PYRAMID_AB.md")
    with open(md, "w") as f:
        f.write(f"""# Zoom-pyramid rollup A/B — naive explode vs histogram-first

Shape: {ROWS:,} rows over {CELLS:,} distinct depth-18 cells,
local[{CPUS}], median of {ROUNDS} rounds.  Both variants produce the
identical result (group count + count/pcell checksums asserted equal
in-run; value semantics oracle-verified by gate q67).

| variant | plan | median s |
|---|---|---|
| naive | explode 19 ancestors per ROW, then aggregate | {res['naive']['median_s']} |
| `tile_pyramid` (histogram-first) | distinct-cell collapse, explode over the histogram, re-agg | {res['histogram']['median_s']} |

All rounds: naive {res['naive']['all_s']}, histogram
{res['histogram']['all_s']}.

Reading: the naive plan's partial aggregation sees 19x the input rows
before any collapse; histogram-first pays one plain-histogram shuffle
and fans out only the ~{CELLS:,}-row distinct-cell table.  The gap is
the rows-per-distinct-cell ratio and widens with reuse — at 10^12 rows
over ~10^7 occupied cells the naive plan's first stage processes ~19e12
exploded rows while histogram-first explodes ~2e8.
""")
    spark.stop()


if __name__ == "__main__":
    main()
