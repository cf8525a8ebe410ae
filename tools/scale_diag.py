"""Scaling-loss attribution: run the flagship validation agg at a given
core count and print aggregate Spark task metrics.

Usage: taskset -c 0-(N-1) python tools/scale_diag.py N [path]

Prints one JSON line: wall, executorRunTime, executorCpuTime, jvmGcTime,
deserialize, shuffle, resultSerialization — totals across tasks (ms).
The interpretation key:
  * cpu/run  ~1.0 at 8 cores but falls at 32  -> threads are stalled
    (GC pauses show in gcTime; memory stalls do NOT — they count as CPU)
  * cpu/run stays ~1.0 while wall*cores/run grows -> scheduler gaps
  * run scales with cores but WALL doesn't improve -> per-task CPU time
    inflates at high N = shared-resource (bandwidth/LLC) contention,
    which is exactly what a real cluster's per-node resources fix.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import make_spark, _validation_agg  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    path = sys.argv[2] if len(sys.argv) > 2 else \
        "/tmp/spark_graft_bench/transcripts_2400000.parquet"
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    _validation_agg(spark, path).collect()  # warm JIT

    acc = {"runTime": 0, "cpuTime": 0, "gcTime": 0, "deser": 0,
           "resultSer": 0, "tasks": 0}

    app_store = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    empty = jvm.java.util.Collections.emptyList()
    no_q = sc._gateway.new_array(jvm.double, 0)

    def stage_list():
        return app_store.stageList(empty, False, False, no_q, empty)

    def stage_ids():
        it = stage_list()
        return {it.apply(i).stageId() for i in range(it.size())}

    warm_ids = stage_ids()

    t0 = time.monotonic()
    _validation_agg(spark, path).collect()
    wall = time.monotonic() - t0

    it = stage_list()
    n = it.size()
    for i in range(n):
        s = it.apply(i)
        if s.stageId() in warm_ids:
            continue
        acc["tasks"] += s.numCompleteTasks()
        acc["runTime"] += s.executorRunTime()
        acc["cpuTime"] += s.executorCpuTime() // 1_000_000  # ns -> ms
        acc["gcTime"] += s.jvmGcTime()
        acc["deser"] += s.executorDeserializeTime()
        acc["resultSer"] += s.resultSerializationTime()

    out = {
        "cpus": cpus,
        "wall_sec": round(wall, 3),
        "tasks": acc["tasks"],
        "runTime_ms": acc["runTime"],
        "cpuTime_ms": acc["cpuTime"],
        "gcTime_ms": acc["gcTime"],
        "deser_ms": acc["deser"],
        "cpu_over_run": round(acc["cpuTime"] / max(acc["runTime"], 1), 3),
        "gc_over_run": round(acc["gcTime"] / max(acc["runTime"], 1), 3),
        "occupancy": round(acc["runTime"] / (wall * 1000 * cpus), 3),
        "cpu_sec_total": round(acc["cpuTime"] / 1000, 1),
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
