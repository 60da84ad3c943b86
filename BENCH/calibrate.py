"""Machine scaling-ceiling calibration for the N vs 4N evidence protocol.

The north_rule scaling criterion is evidenced in-sandbox by running the
same job at local[N] and local[4N] on one machine (BASELINE.json). That
protocol has a *hardware* ceiling below 1.0: the local[N] run owns the
whole machine's memory bandwidth, LLC, and turbo headroom while local[4N]
shares it. This script measures that ceiling with two microbenchmarks so
pipeline efficiency numbers can be read against what the box permits:

- compute: a pure-CPU Arrow-batched pandas UDF (no shuffle, no IO) —
  the best case any UDF stage can achieve.
- shuffle: groupBy-sum over random keys (one full shuffle) — the best
  case any exchange-bound stage can achieve.
- bandwidth: wide per-row array arithmetic in whole-stage codegen
  (array_except over transformed 2k-element arrays, no shuffle, no
  Python) — the best case any DRAM-bandwidth-bound array op can
  achieve. This is the ceiling for dd_substr's covered-index /
  array_except span arithmetic: N cores on one socket do not bring
  N× memory bandwidth, so such ops plateau below the compute ceiling
  on a single box (a real multi-node cluster scales bandwidth with
  cores).

Usage: python BENCH/calibrate.py [--n 8] [--rows-compute 3200] [--rows-shuffle 40000000] [--rows-bandwidth 300000]
Each level runs in its own subprocess (fresh JVM). Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from kgforge.conf import get_spark
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

cpus = {cpus}
spark = get_spark("calib", cpus=cpus, shuffle_partitions=cpus)

@pandas_udf(T.LongType())
def burn(x: pd.Series) -> pd.Series:
    # fixed CPU work per row, GIL released inside hashlib C code
    import hashlib
    out = []
    for v in x:
        h = hashlib.sha256(str(v).encode())
        for _ in range(20000):
            h = hashlib.sha256(h.digest())
        out.append(int.from_bytes(h.digest()[:4], "little"))
    return pd.Series(out)

# -- compute probe: rows spread over 4*cpus partitions
df = spark.range(0, {rows_compute}, 1, numPartitions=4 * cpus)
df.select(burn("id")).agg(F.sum("burn(id)")).collect()  # warm workers
t0 = time.time()
df.select(burn("id")).agg(F.sum("burn(id)")).collect()
compute_s = time.time() - t0

# -- shuffle probe: random keys, groupBy-sum
sh = spark.range(0, {rows_shuffle}, 1, numPartitions=4 * cpus).select(
    (F.xxhash64("id") % 1000000).alias("k"), F.col("id").alias("v")
)
sh.groupBy("k").agg(F.sum("v")).agg(F.count(F.lit(1))).collect()  # warm
t0 = time.time()
sh.groupBy("k").agg(F.sum("v")).agg(F.count(F.lit(1))).collect()
shuffle_s = time.time() - t0

# -- bandwidth probe: wide-array codegen arithmetic, zero shuffle, zero
# Python. Per row: materialize a ~2k-int array whose bounds depend on id
# (not constant-foldable), double it element-wise, array_except the two
# (hash-set build + probe over 4k elements), reduce to a size — the same
# allocation/stream pattern as dd_substr's span arithmetic.
bw = spark.range(0, {rows_bandwidth}, 1, numPartitions=4 * cpus).select(
    F.sequence(F.col("id") % 16, F.col("id") % 16 + 2047).alias("a")
)
bw_expr = F.sum(
    F.size(F.array_except("a", F.transform("a", lambda x: x * 2)))
).alias("s")
bw.agg(bw_expr).collect()  # warm
t0 = time.time()
bw.agg(bw_expr).collect()
bandwidth_s = time.time() - t0

print(json.dumps({{"cpus": cpus, "compute_s": round(compute_s, 2),
                   "shuffle_s": round(shuffle_s, 2),
                   "bandwidth_s": round(bandwidth_s, 2)}}))
"""


def run_level(cpus: int, rows_compute: int, rows_shuffle: int, rows_bandwidth: int) -> dict:
    code = _WORKER.format(
        repo=str(REPO), cpus=cpus,
        rows_compute=rows_compute, rows_shuffle=rows_shuffle,
        rows_bandwidth=rows_bandwidth,
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    if proc.returncode != 0:
        raise RuntimeError(f"calibrate cpus={cpus} failed:\n{proc.stderr[-2000:]}")
    return json.loads([ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--rows-compute", type=int, default=3200)
    ap.add_argument("--rows-shuffle", type=int, default=40_000_000)
    ap.add_argument("--rows-bandwidth", type=int, default=300_000)
    args = ap.parse_args()

    small = run_level(args.n, args.rows_compute, args.rows_shuffle, args.rows_bandwidth)
    print(json.dumps(small), file=sys.stderr)
    large = run_level(args.n * 4, args.rows_compute, args.rows_shuffle, args.rows_bandwidth)
    print(json.dumps(large), file=sys.stderr)

    out = {
        "metric": "machine_scaling_ceiling",
        "n_small": args.n,
        "n_large": args.n * 4,
        "compute_eff": round(small["compute_s"] / (4 * large["compute_s"]) * 4 / 4, 3)
        if large["compute_s"]
        else None,
        "shuffle_eff": None,
        "small": small,
        "large": large,
    }
    # efficiency = tput(4N) / (4*tput(N)) = wall(N) / (4*wall(4N))
    out["compute_eff"] = round(small["compute_s"] / (4 * large["compute_s"]), 3)
    out["shuffle_eff"] = round(small["shuffle_s"] / (4 * large["shuffle_s"]), 3)
    if small.get("bandwidth_s") and large.get("bandwidth_s"):
        out["bandwidth_eff"] = round(
            small["bandwidth_s"] / (4 * large["bandwidth_s"]), 3
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
