"""Standalone scaling-evidence run: the bench's 2->8 median-paired
protocol + 8->32 ceiling diagnostic, without re-running the headline /
flagship / gateway phases.  Usage:

    SPARK_GRAFT_SCALE_ROUNDS=5 python tools/scaling_only.py > out.json

Writes the same `scaling` JSON object bench.py embeds, so records are
directly comparable.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_SCALE_NCONVS", "2400000"))
    spark = bench.make_spark(8)
    spark.sparkContext.setLogLevel("ERROR")
    path = bench.transcripts_path(spark, n)
    spark.stop()
    print(json.dumps(bench.scaling_evidence(path)), flush=True)


if __name__ == "__main__":
    main()
