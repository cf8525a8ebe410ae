"""Paired A/B: r2-canonical flagship suite vs the current tree
(r3 judge #4 — settle whether the 2.56M -> 1.61M turns/s move was
engine or weather).

Protocol: the r2 tree is checked out read-only (git worktree), both
sides read the SAME materialized transcript parquet, and rounds
interleave r2/current at 32 cores in fresh pinned JVMs — so both
sides sample the same host weather.  Each leg runs its OWN published
flagship_suite (that is what each driver round measured).  N>=5
paired rounds; the estimator is the MEDIAN of per-round ratios
(current/r2), the same median-paired rule bench.py's scaling
estimator uses.  A round where BOTH legs are slower than the best
round by >40% is a storm round: reported raw, excluded from the
median (same void philosophy as bench._measure_pair).

Usage: python tools/ab_flagship.py [rounds]    -> BENCH/ab_flagship_r4.json
       python tools/ab_flagship.py --worker <repo> <path> <cpus>
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

R2_COMMIT = "610ce1c"
R2_DIR = "/tmp/r2repo"
CPUS = 32
N_CONVS = int(os.environ.get("SPARK_GRAFT_NCONVS", "600000"))


def _worker(repo: str, path: str, cpus: int) -> None:
    sys.path.insert(0, repo)
    os.chdir(repo)
    import bench

    spark = bench.make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out = bench.flagship_suite(spark, path)
    print(json.dumps(out), flush=True)
    spark.stop()


def _run(repo: str, path: str) -> dict:
    cmd = [
        "taskset", "-c", f"0-{CPUS - 1}",
        sys.executable, os.path.abspath(__file__), "--worker",
        repo, path, str(CPUS),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    if not os.path.exists(R2_DIR):
        subprocess.run(
            ["git", "worktree", "add", "--detach", R2_DIR, R2_COMMIT],
            cwd="/root/repo", check=True,
        )
    sys.path.insert(0, "/root/repo")
    import bench

    spark = bench.make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    path = bench.transcripts_path(spark, N_CONVS)
    spark.stop()
    pairs = []
    for rnd in range(rounds):
        r2 = _run(R2_DIR, path)
        cur = _run("/root/repo", path)
        pairs.append({
            "round": rnd,
            "r2_turns_per_sec": r2["turns_per_sec"],
            "cur_turns_per_sec": cur["turns_per_sec"],
            "ratio_cur_over_r2": round(cur["turns_per_sec"] / r2["turns_per_sec"], 4),
        })
        print(json.dumps(pairs[-1]), flush=True)
    best_r2 = max(p["r2_turns_per_sec"] for p in pairs)
    best_cur = max(p["cur_turns_per_sec"] for p in pairs)
    # storm rounds: both legs far below their best -> external weather
    def stormy(p):
        return (
            p["r2_turns_per_sec"] < 0.6 * best_r2
            and p["cur_turns_per_sec"] < 0.6 * best_cur
        )
    calm = [p for p in pairs if not stormy(p)]
    result = {
        "rounds": pairs,
        "storm_rounds": [p["round"] for p in pairs if stormy(p)],
        "median_paired_ratio_cur_over_r2": round(
            statistics.median(p["ratio_cur_over_r2"] for p in calm), 4
        ),
        "best_r2_turns_per_sec": best_r2,
        "best_cur_turns_per_sec": best_cur,
        "n_convs": N_CONVS,
        "cpus": CPUS,
        "r2_commit": R2_COMMIT,
    }
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/ab_flagship_r4.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "rounds"}))
    print("written BENCH/ab_flagship_r4.json")


if __name__ == "__main__":
    main()
