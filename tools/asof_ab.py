"""As-of join A/B (operators/update.py evidence).

Measures the two as-of plans in the regime `asof_lookup` exists for —
a FACT-heavy, DIMENSION-light point-in-time enrichment (many probes per
key, short versioned history per key):

  shuffle    `asof_join`: union both sides, one hash Exchange on the
             key, per-key window.  Cost scales with |facts| shuffled.
  broadcast  `asof_lookup`: dimension history collapsed to sorted
             struct arrays, broadcast; higher-order filter pick.  The
             fact side never shuffles — cost is a map-side scan.

Reported per variant: wall seconds (median of ROUNDS), Exchange count
in the executed plan, and a value checksum (count + sum of the picked
payload) asserted EQUAL across variants — a fast divergence tripwire on
top of the q63/q66 oracle equality.  Writes BENCH/ASOF_AB.md and prints
one JSON line.

Run:  python tools/asof_ab.py              (local[8])
Env:  ASOF_FACTS (default 2_000_000), ASOF_KEYS (200),
      ASOF_VERSIONS (20), ASOF_CPUS (8), ASOF_ROUNDS (5)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTS = int(os.environ.get("ASOF_FACTS", "2000000"))
KEYS = int(os.environ.get("ASOF_KEYS", "200"))
VERSIONS = int(os.environ.get("ASOF_VERSIONS", "20"))
CPUS = int(os.environ.get("ASOF_CPUS", "8"))
ROUNDS = int(os.environ.get("ASOF_ROUNDS", "5"))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from osmquadtree_depreceated_spark.conf import apply_engine_conf
    from osmquadtree_depreceated_spark.operators.update import (
        asof_join, asof_lookup,
    )
    from osmquadtree_depreceated_spark.plans.bucketed import exchange_count

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    apply_engine_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic shape (long-typed timestamps: the as-of
    # ops are ordering-generic).  Facts land between versions so every
    # probe has real filter work; ~1/VERSIONS of them precede v0 and
    # exercise the NULL path.
    facts = spark.range(FACTS).select(
        (F.col("id") % KEYS).alias("k"),
        ((F.col("id") * 2654435761) % (VERSIONS * 1000)).alias("pts"),
    ).localCheckpoint()
    dim = spark.range(KEYS * VERSIONS).select(
        (F.col("id") % KEYS).alias("k"),
        ((F.col("id") / KEYS).cast("long") * 1000 + 500).alias("vts"),
        (F.col("id") * 7).alias("payload"),
    ).localCheckpoint()

    def shuffle_df():
        return asof_join(facts, dim, ["k"], "pts", "vts",
                         ["payload", "vts"], tiebreak_cols=["payload"])

    def broadcast_df():
        return asof_lookup(facts, dim, ["k"], "pts", "vts",
                           ["payload", "vts"], tiebreak_cols=["payload"])

    variants = {"shuffle": shuffle_df, "broadcast": broadcast_df}
    res, sums = {}, {}
    for name, mk in variants.items():
        chk = mk().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("payload").alias("s"),
            F.sum("vts").alias("v"),
        ).collect()[0]
        sums[name] = (chk.n, chk.s, chk.v)
        times = []
        for _ in range(ROUNDS):
            t0 = time.time()
            mk().count()
            times.append(time.time() - t0)
        res[name] = {
            "median_s": round(statistics.median(times), 3),
            "all_s": [round(t, 3) for t in times],
            "exchanges": exchange_count(mk()),
        }
    assert sums["shuffle"] == sums["broadcast"], sums

    line = {"ab": "asof_join", "facts": FACTS, "keys": KEYS,
            "versions": VERSIONS, "cpus": CPUS, "rounds": ROUNDS,
            "checksum": list(sums["shuffle"]), **res}
    print(json.dumps(line))

    md = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "ASOF_AB.md")
    with open(md, "w") as f:
        f.write(f"""# As-of join A/B — shuffle vs broadcast plan

Shape: {FACTS:,} fact probes over {KEYS} keys x {VERSIONS} dimension
versions, local[{CPUS}], median of {ROUNDS} rounds.  Both variants
produce the identical result (count + payload/version checksums
asserted equal in-run; value semantics oracle-verified by gates
q63/q66, which share one oracle).

| variant | plan | median s | exchanges |
|---|---|---|---|
| `asof_join` (shuffle) | union + hash Exchange on key + window | {res['shuffle']['median_s']} | {res['shuffle']['exchanges']} |
| `asof_lookup` (broadcast) | dim history array + BroadcastHashJoin + higher-order pick | {res['broadcast']['median_s']} | {res['broadcast']['exchanges']} |

All rounds: shuffle {res['shuffle']['all_s']}, broadcast
{res['broadcast']['all_s']}.

Reading: the shuffle plan moves every fact row through the exchange and
sorts it inside the per-key window; the broadcast plan's only exchanges
are the tiny dimension aggregation + broadcast, so fact rows stream
map-side.  At 100 TB of facts the gap widens by the shuffle's IO term;
the shuffle plan remains the right choice when BOTH sides are large
(per-key history too big for one array / broadcast).
""")
    spark.stop()


if __name__ == "__main__":
    main()
