"""Per-query scaling curves: the same query at 2 / 8 / 32 pinned cores
on the SAME input, reported as wall per level + paired efficiencies per
leg (2->8, 8->32).

This is the per-query decomposition of the headline scaling evidence
(bench.py scaling_evidence): the flagship suite's 8->32 leg loses
throughput beyond the measured pure-CPU box ceiling, and the question
the curves answer is WHICH plan shapes stop scaling — a codegen'd
single-projection scan should track the ceiling; a shuffle-bearing
join/agg shows the extra loss of one box's shared memory/LLC (which a
real cluster's per-node resources restore).

Input sizing: the raw sf0.1 tables give 0.3-0.7s jobs at 32 cores —
pure fixed-overhead territory where adding cores measures job-setup
cost, not plan scaling.  `--prepare` materializes a curve corpus with
the fact tables replicated under key remapping (orderkeys offset per
replica so lineitem-orders still joins 1:1; event/user ids offset so
sessions replicate instead of densifying).  documents is NOT
replicated: near-identical replicas would collide in every minhash
band and inflate the candidate-pair join quadratically, changing the
workload instead of scaling it.

Protocol (same as bench.py): taskset-pinned subprocess per level, one
warm run (C2/codegen steady state) + best-of-`reps` timed noop writes,
levels interleaved per round so host-noise weather hits all levels.
The 2-core level runs reps=1 (its walls are 10-20x the 32-core walls;
contention noise is one-sided, so a single clean rep only ever
UNDERSTATES the low-core denominator, i.e. understates efficiency).

Usage:  python tools/scaling_curves.py [out.json]
Env:    SPARK_GRAFT_CURVE_LEVELS (default "2,8,32")
        SPARK_GRAFT_CURVE_ROUNDS (default 2)
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# corpus multiplier: x1 = the 2->8 corpus; the 8->32 leg needs ~4x more
# work so the 32-core walls clear the ~0.7s fixed job floor
XFACT = int(os.environ.get("SPARK_GRAFT_CURVE_XFACT", "1"))
CURVE_DIR = os.environ.get(
    "SPARK_GRAFT_CURVE_DIR",
    "/tmp/spark_graft_bench/curve_sf"
    + (f"_x{XFACT}" if XFACT != 1 else ""),
)
LEVELS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_CURVE_LEVELS", "2,8,32").split(",")
]
ROUNDS = int(os.environ.get("SPARK_GRAFT_CURVE_ROUNDS", "2"))
REPS = int(os.environ.get("SPARK_GRAFT_CURVE_REPS", "2"))
LOW_CORE_REPS_CUTOFF = 4  # levels <= this run reps=1

# replication factors per fact table (dims stay x1; documents scale
# only on the big corpus, via token permutation — see prepare())
SCALE = {"lineitem": 8 * XFACT, "orders": 8 * XFACT, "events": 16 * XFACT}
if XFACT > 1:
    SCALE["documents"] = XFACT
# key columns offset per replica (joins keep matching 1:1)
REMAP = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}
OFFSET = 10**10

# one representative query per plan shape; keys from __spark_entry__
CURVE_QUERIES = [
    "validate_orders",        # codegen projection over scan (no shuffle)
    "q1_pricing_summary",     # partial+final hash agg
    "q5_nation_revenue",      # multi-join, broadcast dims
    "stats_lineitem",         # fused multi-metric agg
    "sessionize_events",      # window over shuffle
    "dedup_minhash_lsh",      # signature agg + band bucket join
    "validate_json_events",   # from_json static parse path
    "validate_json_typed",    # variant parse + hoisted runtime dispatch
]
CURVE_QUERIES += [
    "funnel_events",          # user-key shuffle + columnar chain fold
    "outliers_events",        # exact-decimal agg + broadcast recount
    "drift_timeline_events",  # (bucket,bin) agg + metadata-sized PSI
    "render_chat",            # salted two-phase ordered concat
    "sft_mask_spans",         # ROWS-frame running sums over conv window
    "migration_impact_json_events",  # variant parse, 2 rule sets, 1 scan
    "transcript_report",      # GROUPING SETS + two-phase distinct
]
if XFACT == 1:
    # string-heavy projections over the UNSCALED 5k-doc table: only
    # meaningful at low core counts (same plan shape as
    # validate_orders otherwise)
    CURVE_QUERIES.insert(6, "text_langid")
    CURVE_QUERIES += ["span_dup_docs", "bm25_topk_docs"]
if os.environ.get("SPARK_GRAFT_CURVE_QUERIES"):
    CURVE_QUERIES = os.environ["SPARK_GRAFT_CURVE_QUERIES"].split(",")


def prepare() -> None:
    """Materialize the curve corpus once (idempotent)."""
    marker = os.path.join(CURVE_DIR, "_READY")
    if os.path.exists(marker):
        return
    from pyspark.sql import functions as F

    from bench import make_spark

    shutil.rmtree(CURVE_DIR, ignore_errors=True)
    os.makedirs(CURVE_DIR, exist_ok=True)
    spark = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = os.path.join(SRC_SF_DIR, f"{name}.parquet")
        dst = os.path.join(CURVE_DIR, f"{name}.parquet")
        k = SCALE.get(name, 1)
        if k == 1:
            # unscaled tables: plain copy (symlinks confuse some
            # FileSystem impls when listing)
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
            continue
        df = spark.read.parquet(src)
        parts = []
        for r in range(k):
            p = df
            for key in REMAP[name]:
                p = p.withColumn(key, F.col(key) + F.lit(r * OFFSET))
            if name == "documents" and r > 0:
                # DOC-KEYED token permutation: sorting each doc's tokens
                # by xxhash64(token, doc_id) gives every doc its own
                # order, so no two docs share shingle sequences — the
                # replicas scale the signature-computation stage (the
                # compute that matters) linearly while the candidate
                # join stays small.  A GLOBAL sort key was measured to
                # do the opposite: it canonicalizes word order across
                # all docs, so unrelated docs' shingles collide and the
                # LSH bucket join explodes (78s at 8 cores).
                p = p.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.transform(
                                    F.split(F.col("text"), r" +"),
                                    lambda t: F.struct(
                                        F.xxhash64(t, F.col("doc_id")).alias("k"),
                                        t.alias("x"),
                                    ),
                                )
                            ),
                            lambda s: s["x"],
                        ),
                        " ",
                    ),
                )
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        out.repartition(32).write.parquet(dst)
    spark.stop()
    open(marker, "w").write("ok")


def _worker(cpus: int, reps: int) -> None:
    from bench import make_spark, run_noop
    import __spark_entry__ as entry

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out = {}
    for name in CURVE_QUERIES:
        df = qs[name](spark, CURVE_DIR)
        run_noop(df)  # warm: codegen compile + JIT
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            run_noop(qs[name](spark, CURVE_DIR))
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    print(json.dumps({"cpus": cpus, "secs": out}), flush=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        _worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH", "scaling_curves.json"
    )
    prepare()
    samples: dict[str, dict[int, list[float]]] = {
        q: {c: [] for c in LEVELS} for q in CURVE_QUERIES
    }
    for rnd in range(ROUNDS):
        for cpus in LEVELS:
            reps = 1 if cpus <= LOW_CORE_REPS_CUTOFF else REPS
            cmd = [
                "taskset", "-c", f"0-{cpus - 1}",
                sys.executable, os.path.abspath(__file__),
                "--worker", str(cpus), str(reps),
            ]
            r = subprocess.run(cmd, capture_output=True, text=True, check=True)
            secs = json.loads(r.stdout.strip().splitlines()[-1])["secs"]
            for q, s in secs.items():
                samples[q][cpus].append(s)
            print(f"round {rnd} cores={cpus}: {secs}", file=sys.stderr, flush=True)

    def eff(q: str, lo: int, hi: int) -> float:
        # best-of-rounds per level: host contention is strictly
        # one-sided, the best is the tightest bound on capability
        blo = min(samples[q][lo])
        bhi = min(samples[q][hi])
        return round((blo / bhi) / (hi / lo), 3)

    curves = {}
    for q in CURVE_QUERIES:
        row = {f"best_sec@{c}": min(samples[q][c]) for c in LEVELS}
        row["samples"] = {str(c): samples[q][c] for c in LEVELS}
        for lo, hi in zip(LEVELS, LEVELS[1:]):
            row[f"efficiency_{lo}to{hi}"] = eff(q, lo, hi)
        curves[q] = row
    legs = {
        f"{lo}to{hi}": {
            "median": round(
                statistics.median(eff(q, lo, hi) for q in CURVE_QUERIES), 3
            ),
            "min": min((eff(q, lo, hi), q) for q in CURVE_QUERIES),
            "max": max((eff(q, lo, hi), q) for q in CURVE_QUERIES),
        }
        for lo, hi in zip(LEVELS, LEVELS[1:])
    }
    result = {
        "curve_dir": CURVE_DIR,
        "scale": SCALE,
        "levels": LEVELS,
        "rounds": ROUNDS,
        "protocol": (
            "taskset-pinned worker per level, levels interleaved per "
            "round; per query: 1 warm run then best-of-N timed noop "
            f"writes (N={REPS}, N=1 at <= {LOW_CORE_REPS_CUTOFF} "
            "cores); efficiency = (best_lo/best_hi)/(hi/lo) from "
            "per-level bests across rounds"
        ),
        "queries": curves,
        "legs": legs,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"legs": legs, "out": out_path}))


if __name__ == "__main__":
    main()
