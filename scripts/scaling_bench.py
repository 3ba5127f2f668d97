"""Scaling-efficiency evidence (BASELINE.md rows 5-6): run the identical
frontier schedule+dedup job on identical input at two parallelism levels
(N and 4N cores — the sandbox stand-in for N vs 4N executors) and report
throughput at both plus efficiency = (throughput_4N / throughput_N) / 4.

Two level pairs are measured:
 - 4 → 16 cores: both levels fit inside the VM's 32 vCPUs with headroom, so
   the pair isolates the ENGINE's scaling from host-level ceilings — this is
   the primary N→4N evidence;
 - 8 → 32 cores: uses the whole box at the top level; the pure-CPU control
   (no Spark, multiprocessing burn on the same worker counts) shows how much
   of any shortfall is the shared-memory VM itself rather than the job.

Each Spark level runs in a fresh subprocess (one JVM can't switch masters).
Output: one JSON line; numbers are pasted into BASELINE.md.
"""

from __future__ import annotations

import json

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.hw_controls import cpu_control, mem_control  # noqa: E402

CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
from nrsr_crawler_spark.session import get_spark
import bench

cpus = os.environ["SPARK_GRAFT_CPUS"]
spark = get_spark("scaling", master=f"local[{{cpus}}]", shuffle_partitions=int(cpus))
spark.sparkContext.setLogLevel("ERROR")
ups, n = bench.frontier_throughput(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), repeat=3)
print(json.dumps({{"cpus": cpus, "urls_per_sec": ups, "frontier_urls": n}}))
spark.stop()
"""


def run_level(cpus: int, repo: str, mult: int) -> dict:
    # per-pass compute must dwarf fixed job overhead at the 4N level too
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_MULT=str(mult),
    )
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=repo)],
        env=env,
        capture_output=True,
        text=True,
        timeout=3000,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    """The sandbox VM's effective CPU capacity wanders (host contention):
    the pure-CPU control at fixed worker counts varies >2× between windows
    minutes apart.  A single (N, 4N) measurement therefore conflates engine
    scaling with host noise.  Protocol: run the (N, 4N) pair back-to-back
    REPEATEDLY, compute per-pair efficiency, and report every pair plus the
    median and max — contention only ever subtracts capacity, so the max
    paired efficiency is the best available estimate of the machine-limited
    value, and the adjacent CPU control shows the host ceiling per pair."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mult = int(os.environ.get("SPARK_GRAFT_BENCH_MULT", "24"))
    rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "3"))
    lo, hi = (
        int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "4,16").split(",")
    )
    out: dict = {"frontier_mult": mult, "levels": [lo, hi], "pairs": []}
    for _ in range(rounds):
        # ABBA ordering (lo, hi, hi, lo): a lo-then-hi pair under monotone
        # host-capacity drift biases the ratio (drift helps one level only);
        # summing the two A and two B measurements cancels linear drift.
        l1 = run_level(lo, repo, mult)
        h1 = run_level(hi, repo, mult)
        h2 = run_level(hi, repo, mult)
        l2 = run_level(lo, repo, mult)
        ctl_eff = (cpu_control(hi) / cpu_control(lo)) / 4.0
        mem_eff = (mem_control(hi) / mem_control(lo)) / 4.0
        lo_ups = (l1["urls_per_sec"] + l2["urls_per_sec"]) / 2
        hi_ups = (h1["urls_per_sec"] + h2["urls_per_sec"]) / 2
        eff = (hi_ups / lo_ups) / 4.0
        pair = {
            f"urls_per_sec_local{lo}": [round(l1["urls_per_sec"]), round(l2["urls_per_sec"])],
            f"urls_per_sec_local{hi}": [round(h1["urls_per_sec"]), round(h2["urls_per_sec"])],
            "eff_abba": round(eff, 3),
            "cpu_control_eff": round(ctl_eff, 3),
            "mem_control_eff": round(mem_eff, 3),
            "eff_normalized": round(min(eff / ctl_eff, 1.0), 3),
            "eff_vs_mem_ceiling": round(min(eff / mem_eff, 1.0), 3),
        }
        out["pairs"].append(pair)
        # flush each completed pair to stderr so a timeout/kill still
        # leaves every finished ABBA round on record
        print(json.dumps(pair), file=sys.stderr, flush=True)
        out["frontier_urls"] = l1["frontier_urls"]
    effs = sorted(p["eff_abba"] for p in out["pairs"])
    out["eff_median"] = effs[len(effs) // 2]
    out["eff_max"] = effs[-1]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
