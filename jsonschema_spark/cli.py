"""spark-submit entrypoint: run a validation suite from a JSON config.

North-rule operational contract: the driver submits via
``spark-submit --py-files jsonschema_spark.zip jsonschema_spark/cli.py
run config.json`` to a multi-executor cluster; the same invocation
works on ``--master local[N]`` for development.

Config shape (all paths accept the ``iceberg:``/``table:`` prefixes of
sources.tables.read_table)::

    {
      "source": "/data/transcripts.parquet",
      "where": "ts >= '2025-01-01'",            // optional pushdown
      "schema": { ...schema document... },       // row-level rules
      "keys": ["conv_id", "turn_idx"],           // violation row keys
      "partition_by": ["day"],                   // verdict granularity
      "checks": {
        "uniqueness": {"keys": ["conv_id", "turn_idx"], "salt_buckets": 0},
        "referential": [
          {"name": "ri_role", "fact_key": "role",
           "dim": "/data/dim_roles.parquet", "dim_key": "role"}
        ],
        "stats": {"columns": ["role", "text"], "approx": true,
                   "expectations": {"role": {"max_null_rate": 0.01}}},
        "functional": [
          {"name": "fd_locale", "determinant": ["conv_id"],
           "dependent": "locale", "max_examples": 3}
        ],
        "drift": {"column": "text_len", "baseline_path": "/state/drift_q",
                   "save_baseline_to": "/state/drift_q_next"}
      },
      "output": {
        "verdicts": "/out/verdicts",
        "violations": "/out/violations",
        "manifest": "/out/manifest"              // enables resume
      }
    }

A second run with the same config + manifest skips every
(partition, check) already recorded (checkpoint.ResumableRun).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def build_suite(spark: SparkSession, cfg: dict):
    from jsonschema_spark import compile_schema
    from jsonschema_spark.operators import checks
    from jsonschema_spark.sources.tables import read_table

    suite = []
    if cfg.get("schema"):
        plan = compile_schema(cfg["schema"])
        suite.append(
            checks.SchemaCheck(
                plan=plan,
                partition_by=cfg.get("partition_by"),
                name="schema",
                # validate a JSON-string column (the reference's actual
                # input domain) instead of fixed columns
                json_col=cfg.get("json_col"),
                json_types=cfg.get("json_types"),
            )
        )
    c = cfg.get("checks", {})
    if "uniqueness" in c:
        u = c["uniqueness"]
        suite.append(
            checks.Uniqueness(
                keys=u["keys"],
                partition_by=cfg.get("partition_by"),
                salt_buckets=int(u.get("salt_buckets", 0)),
            )
        )
    for ri in c.get("referential", []):
        suite.append(
            checks.ReferentialIntegrity(
                dim=read_table(spark, ri["dim"]),
                fact_key=ri["fact_key"],
                dim_key=ri["dim_key"],
                partition_by=cfg.get("partition_by"),
                name=ri.get("name", f"ri_{ri['fact_key']}"),
            )
        )
    if "stats" in c:
        s = c["stats"]
        suite.append(
            checks.ColumnStats(
                columns=s["columns"],
                partition_by=cfg.get("partition_by"),
                approx=bool(s.get("approx", True)),
                expectations=s.get("expectations", {}),
            )
        )
    if "sequence" in c:
        sq = c["sequence"]
        from jsonschema_spark.operators.transcripts import (
            DEFAULT_FIRST_ROLES,
            DEFAULT_TRANSITIONS,
            SequenceIntegrity,
        )

        suite.append(
            SequenceIntegrity(
                conv_col=sq.get("conv_col", "conv_id"),
                turn_col=sq.get("turn_col", "turn_idx"),
                ts_col=sq.get("ts_col", "ts"),
                role_col=sq.get("role_col", "role"),
                order_by=sq.get("order_by"),
                allowed_transitions=(
                    frozenset(tuple(p) for p in sq["transitions"])
                    if sq.get("transitions") is not None
                    else DEFAULT_TRANSITIONS
                ),
                first_roles=(
                    frozenset(sq["first_roles"])
                    if sq.get("first_roles") is not None
                    else DEFAULT_FIRST_ROLES
                ),
                first_index=int(sq.get("first_index", 0)),
                partition_by=cfg.get("partition_by"),
            )
        )
    for fd in c.get("functional", []):
        suite.append(
            checks.FunctionalDependency(
                determinant=list(fd["determinant"]),
                dependent=fd["dependent"],
                partition_by=cfg.get("partition_by"),
                max_examples=int(fd.get("max_examples", 3)),
                name=fd.get("name", f"fd_{fd['dependent']}"),
            )
        )
    if "drift" in c:
        d = c["drift"]
        suite.append(
            checks.Drift(
                column=d["column"],
                baseline=(
                    read_table(spark, d["baseline"]) if d.get("baseline") else None
                ),
                baseline_path=d.get("baseline_path"),
                partition_by=cfg.get("partition_by"),
                psi_threshold=float(d.get("psi_threshold", 0.2)),
                ks_threshold=float(d.get("ks_threshold", 0.2)),
            )
        )
    return suite


def cmd_run(args) -> int:
    from jsonschema_spark.checkpoint import CheckpointManifest, ResumableRun
    from jsonschema_spark.operators.checks import CheckSuite
    from jsonschema_spark.sources.tables import read_table, write_output

    cfg = json.load(open(args.config))
    spark = (
        SparkSession.builder.appName("jsonschema_spark-run")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    df = read_table(spark, cfg["source"], where=cfg.get("where"))
    suite = CheckSuite(build_suite(spark, cfg))
    out = cfg.get("output", {})

    run = None
    if out.get("manifest"):
        run = ResumableRun(
            suite=suite,
            manifest=CheckpointManifest(out["manifest"]),
            partition_by=cfg.get("partition_by"),
            source_id=cfg["source"],
        )
        verdicts = run.run(df)
    else:
        verdicts = suite.run(df)

    n_fail = verdicts.filter("NOT pass").count()
    if out.get("verdicts"):
        write_output(verdicts, out["verdicts"])
    else:
        verdicts.show(100, truncate=False)

    if out.get("violations") and cfg.get("schema"):
        from jsonschema_spark import compile_schema

        # On a resumed run, scope the violations pass to the partitions
        # whose sink write is CONFIRMED in the manifest — a completion
        # row written strictly after the sink write, independent of the
        # schema check's own verdict rows.  This closes the crash
        # window where the verdict rows landed but the violations write
        # did not (the two are non-atomic): the old last_ran scoping
        # would see the schema check fully checkpointed and skip those
        # partitions' violations forever.
        side = None
        viol_df, todo_t, pid_of = df, [], {}
        if run is not None:
            from jsonschema_spark.checkpoint import SideOutput, side_lineage
            from jsonschema_spark.sources.tables import sink_exists

            side = SideOutput(
                manifest=run.manifest,
                name="schema:violations",
                lineage=side_lineage(
                    cfg["source"],
                    cfg["schema"] if not cfg.get("json_col") else {
                        "schema": cfg["schema"],
                        "json_col": cfg["json_col"],
                        "json_types": cfg.get("json_types"),
                    },
                    out["violations"],
                ),
                partition_by=cfg.get("partition_by"),
            )
            # sink-state transitions: a deleted/absent sink voids all
            # completion rows (rebuild everything).  A present sink
            # with ZERO completion rows is ambiguous — either a
            # pre-SideOutput manifest whose old release already wrote
            # these partitions' violations (re-append = duplicates),
            # or a crash between the verdict append and the violations
            # write (skip = SILENT LOSS).  Loss is the worse failure,
            # so the default re-appends (at-least-once); a deployment
            # upgrading a known-complete legacy manifest opts into the
            # backfill once via output.violations_backfill=true.
            ran = {t for ts in run.last_ran.values() for t in ts}
            viol_df, todo_t, pid_of = side.todo(
                df,
                sink_present=sink_exists(spark, out["violations"]),
                just_ran=ran if out.get("violations_backfill") else None,
            )
        if viol_df is not None:
            plan = compile_schema(cfg["schema"])
            viols = plan.validate(
                viol_df,
                keys=cfg.get("keys", []),
                json_col=cfg.get("json_col"),
                json_types=cfg.get("json_types"),
            ).violations
            write_output(viols, out["violations"])
        if side is not None and (todo_t or side.backfill):
            # completion rows for what was written now AND the
            # legacy-complete backfill (written by the old release)
            side.commit(spark, list(todo_t) + list(side.backfill), pid_of)

    # store this run's quantile summary as the next run's drift baseline
    d = cfg.get("checks", {}).get("drift")
    if d and d.get("save_baseline_to"):
        from jsonschema_spark.operators.checks import Drift

        Drift(column=d["column"], baseline_path=d.get("baseline_path")).save_baseline(
            df, d["save_baseline_to"]
        )

    print(f"checks_failed={n_fail}", file=sys.stderr)
    return 1 if n_fail and args.fail_on_violation else 0


def cmd_validate(args) -> int:
    """Ad-hoc: show violations of one schema over one table."""
    from jsonschema_spark import compile_schema
    from jsonschema_spark.sources.tables import read_table

    spark = SparkSession.builder.appName("jsonschema_spark-validate").getOrCreate()
    doc = json.load(open(args.schema))
    df = read_table(spark, args.source)
    plan = compile_schema(doc)
    res = plan.validate(df, keys=args.keys.split(",") if args.keys else [])
    res.violations.show(args.limit, truncate=False)
    return 0


def cmd_exp(args) -> int:
    """expr evaluator / REPL (reference cmd/exp): -s one-shot, -f/-e
    per-line over a JSON-lines file, else interactive REPL over an
    optional document (--doc)."""
    from jsonschema_spark.repl import ExprSession, eval_per_line

    spark = (
        SparkSession.builder.appName("jsonschema_spark-exp")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.file:
        if not args.expr:
            print("exp -f needs -e <expr>", file=sys.stderr)
            return 2
        for r in eval_per_line(spark, args.file, args.expr).collect():
            print(r["out"])
        return 0
    sess = ExprSession(spark)
    if args.doc:
        sess.load_doc(args.doc)
    if args.single:
        res = sess.eval(args.single)
        if res is not None:
            print(res)
        return 1 if res is not None and res.startswith("error:") else 0
    sess.run_repl()
    return 0


def cmd_curate(args) -> int:
    """Run the composed curation pipeline from a JSON config::

        {
          "source": "/data/documents.parquet",
          "text_col": "text", "id_col": "doc_id",
          "benchmark": "/data/eval_set.parquet",   // optional
          "quality_min": 0.5,                       // optional
          "ngram": 3, "min_overlap": 2,
          "drop_ids": "/data/blocklist.parquet",    // optional
          "split": {"train": 0.9, "val": 0.05, "test": 0.05},
          "redact": true,
          "output": {"curated": "/out/curated",     // split-partitioned
                      "report": "/out/report"}
        }
    """
    from jsonschema_spark.operators import curate as cur
    from jsonschema_spark.sources.tables import read_table, write_output

    cfg = json.load(open(args.config))
    spark = (
        SparkSession.builder.appName("jsonschema_spark-curate")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    docs = read_table(spark, cfg["source"], where=cfg.get("where"))
    bench = (
        read_table(spark, cfg["benchmark"], where=cfg.get("benchmark_where"))
        if cfg.get("benchmark")
        else None
    )
    drop = read_table(spark, cfg["drop_ids"]) if cfg.get("drop_ids") else None
    kw = dict(
        quality_min=cfg.get("quality_min", 0.5),
        ngram=int(cfg.get("ngram", 3)),
        min_overlap=int(cfg.get("min_overlap", 2)),
        drop_ids=drop,
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
    )
    flagged = cur.curate_flags(docs, bench, **kw).persist()
    report = cur.curation_report(flagged).first().asDict()
    curated = cur.curate(
        docs, bench, split_weights=cfg.get("split"),
        redact=bool(cfg.get("redact", True)), flagged=flagged, **kw,
    )
    out = cfg.get("output", {})
    if out.get("curated"):
        # split-partitioned layout: training readers prune to their
        # split at the scan, no full-table filter
        curated.write.mode("overwrite").partitionBy("split").parquet(
            out["curated"]
        )
    if out.get("report"):
        write_output(
            spark.createDataFrame([report]).select(*sorted(report)),
            out["report"],
        )
    print(json.dumps(report))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="jsonschema_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run a validation suite from a JSON config")
    r.add_argument("config")
    r.add_argument("--fail-on-violation", action="store_true")
    r.set_defaults(fn=cmd_run)

    c = sub.add_parser(
        "curate", help="run the corpus-curation pipeline from a JSON config"
    )
    c.add_argument("config")
    c.set_defaults(fn=cmd_curate)

    v = sub.add_parser("validate", help="ad-hoc schema validation of a table")
    v.add_argument("schema")
    v.add_argument("source")
    v.add_argument("--keys", default="")
    v.add_argument("--limit", type=int, default=100)
    v.set_defaults(fn=cmd_validate)

    e = sub.add_parser("exp", help="expr evaluator / REPL (cmd/exp analog)")
    e.add_argument("-s", "--single", default="", help="single expression, print result")
    e.add_argument("-f", "--file", default="", help="JSON-lines file to evaluate over")
    e.add_argument("-e", "--expr", default="", help="expression for -f mode")
    e.add_argument("--doc", default="", help="JSON document file bound to $")
    e.set_defaults(fn=cmd_exp)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
