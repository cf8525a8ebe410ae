"""Micro-bench a subset of __spark_entry__ queries with the SAME
session config bench.py uses (hugeMethodLimit, G1, 16MB splits).

r5: samples are INTERLEAVED — pass p runs every query once, so all
queries sample the same host weather and a storm window shows up as
per-query dispersion instead of biasing whichever query ran last.
Reported estimator = median of passes (the bench.py headline rule),
plus min/max spread.

Usage: python tools/qbench.py <query> [<query> ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS (default 32), QBENCH_REPS (default 3).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (reuses make_spark/run_noop/SF_DIR)


def main() -> None:
    names = sys.argv[1:]
    reps = int(os.environ.get("QBENCH_REPS", "3"))
    spark = bench.make_spark(bench.CPUS)
    import __spark_entry__ as E

    qs = E.queries()
    bench.run_noop(qs["dedup_exact"](spark, bench.SF_DIR))  # warm
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            t0 = time.monotonic()
            bench.run_noop(qs[name](spark, bench.SF_DIR))
            samples[name].append(round(time.monotonic() - t0, 3))
    for name in names:
        s = samples[name]
        med = statistics.median(s)
        spread = round((max(s) - min(s)) / med, 3) if med else None
        print(
            f"{name}: median={round(med, 3)} spread={spread} samples={s}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
