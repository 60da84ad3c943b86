"""Single scaling-run worker: full pipeline at a given parallelism.

Invoked in its own process (fresh JVM) by BENCH/scaling.py:
    python BENCH/run_one.py --cpus 8 --fixture /tmp/kgf_bench --out /tmp/out8

Prints one JSON line: {"cpus", "wall_s", "n_triples", "triples_per_sec",
"stages": {...}}. The measured region excludes session startup and
fixture generation — it times exactly the pipeline (SURVEY.md §7.4.5:
keep fixed overheads out of the measured region).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--fixture", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from kgforge.conf import get_spark
    from kgforge.pipeline import run_pipeline

    spark = get_spark(f"kgf-scale-{args.cpus}", cpus=args.cpus, shuffle_partitions=args.cpus)
    # warm: touch the input once so OS page cache parity across runs
    spark.read.parquet(f"{args.fixture}/pages.parquet").count()

    t0 = time.time()
    info = run_pipeline(
        spark,
        pages_path=f"{args.fixture}/pages.parquet",
        dict_path=f"{args.fixture}/concept_dict.parquet",
        out_dir=args.out,
        langs=("en",),
        run_id=f"scale{args.cpus}",
    )
    wall = time.time() - t0
    out = {
        "cpus": args.cpus,
        "wall_s": round(wall, 2),
        "n_triples": info["n_triples"],
        "triples_per_sec": round(info["n_triples"] / wall, 1),
        "stages": {s["stage"]: round(s["wall_s"], 2) for s in info["stages"]},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
