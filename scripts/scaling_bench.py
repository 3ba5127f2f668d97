"""Scaling-efficiency evidence (BASELINE.md row 6): run the identical
frontier schedule+dedup job on identical input at two parallelism levels
(local[8] vs local[32] — the sandbox stand-in for N vs 4N executors) and
report throughput at both plus efficiency = (T8_wall / T32_wall) / 4.

Each level runs in a fresh subprocess (one JVM can't switch masters).
Output: one JSON line; also meant to be pasted into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from nrsr_crawler_spark.session import get_spark
import bench

cpus = os.environ["SPARK_GRAFT_CPUS"]
spark = get_spark("scaling", master=f"local[{{cpus}}]", shuffle_partitions=int(cpus))
spark.sparkContext.setLogLevel("ERROR")
ups, n = bench.frontier_throughput(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), repeat=3)
print(json.dumps({{"cpus": cpus, "urls_per_sec": ups, "frontier_urls": n}}))
spark.stop()
"""


def run_level(cpus: int, repo: str) -> dict:
    # larger frontier than bench default: the parallelism comparison needs
    # per-pass compute to dwarf fixed job overhead at the 4N level too
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_MULT=os.environ.get("SPARK_GRAFT_BENCH_MULT", "48"),
    )
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=repo)],
        env=env,
        capture_output=True,
        text=True,
        timeout=2400,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r8 = run_level(8, repo)
    r32 = run_level(32, repo)
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / 4.0
    print(
        json.dumps(
            {
                "urls_per_sec_local8": round(r8["urls_per_sec"]),
                "urls_per_sec_local32": round(r32["urls_per_sec"]),
                "frontier_urls": r8["frontier_urls"],
                "scaling_efficiency_8_to_32": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
