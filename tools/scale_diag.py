#!/usr/bin/env python
"""Adjacent low/high per-stage scaling diagnosis (round-3 verdict ask #1).

Runs tools/scale_stages.py at local[LOW] then local[HIGH] back-to-back
(fresh JVM each), brackets with the pure-CPU ceiling calibration from
bench.py, and prints a per-stage efficiency table: which stage is the
scaling limiter, by name.

usage: python tools/scale_diag.py [low] [amplify]
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _probe(cpus, amplify, sf_dir, pair_low):
    out = subprocess.run(
        [sys.executable, os.path.join("tools", "scale_stages.py"),
         str(cpus), str(amplify), sf_dir],
        capture_output=True, text=True, check=True,
        # BENCH_SCALE_LOW anchors bench.SCALE_HIGH (the partition-parity
        # config) to THIS diag's pair, for both the low and high probe
        env={**os.environ, "BENCH_SCALING_PROBE": "1",
             "BENCH_SCALE_LOW": str(pair_low)},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    low = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("BENCH_SCALE_LOW", "2"))
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("BENCH_AMPLIFY", "16"))
    high = 4 * low
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench

    c_before = bench._hw_ceiling(low, high)
    lo = _probe(low, amplify, sf_dir, low)
    c_mid = bench._hw_ceiling(low, high)
    hi = _probe(high, amplify, sf_dir, low)
    c_after = bench._hw_ceiling(low, high)

    rows = []
    for name, t_lo in lo["stages"].items():
        t_hi = hi["stages"].get(name)
        eff = round((t_lo / t_hi) / (high / low), 3) if t_hi else None
        rows.append((name, t_lo, t_hi, eff))
    print(json.dumps({
        "low": low, "high": high, "amplify": amplify,
        "ceilings": [c_before, c_mid, c_after],
        "stages": [
            {"stage": n, f"local[{low}]_secs": a, f"local[{high}]_secs": b,
             "efficiency": e}
            for n, a, b, e in rows
        ],
    }, indent=1))


if __name__ == "__main__":
    main()
