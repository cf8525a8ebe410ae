"""`exp` — the expr evaluator / REPL (reference cmd/exp/main.go).

The reference ships a jq-like tool: evaluate an expr-language
expression against a JSON document from stdin (`exp 'expr'`), a single
expression with no input (`exp -s`), or per-line over a JSON-lines
file (`exp -f file -e expr`), with `read('f')` / `import('f')` to load
documents and statement libraries (main.go:31-54, 105-199).

Spark-native mapping:

  * One-shot / REPL: the document is ONE DataFrame row; every entered
    line replays the session's statement history through the SAME
    `script`-keyword compiler the engine uses (no second evaluator to
    drift), and a bare expression prints its value.
  * Per-line file mode: the JSON-lines file is read as a DataFrame and
    the expression becomes a columnar projection — one output per
    line, which is what the reference's per-line loop computes
    (main.go:141-160).  Cross-line accumulation (-st/-ed) is a
    driver-side serial fold in the reference; the engine's answer to
    that shape is a groupBy/agg plan, so the CLI documents the mapping
    instead of emulating a serial fold.
  * `read('f')` loads a JSON document as the session's `$`;
    `import('f')` splices a file of statements into the history
    (reference importVal, main.go:69-81).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ExprSession:
    """A persistent expr session over one JSON document row.

    Each ``eval`` replays the accumulated statement history plus the
    new line through ``compile_schema({"script": ...})`` — identical
    semantics to the engine's script keyword, including ``for``
    statements, time methods and error-as-value functions."""

    def __init__(self, spark: SparkSession, doc: dict | None = None):
        self.spark = spark
        self.doc: dict = doc if isinstance(doc, dict) else {}
        self.history: list = []

    # -- document management ------------------------------------------
    def load_doc(self, path: str) -> None:
        with open(path) as f:
            d = json.load(f)
        if not isinstance(d, dict):
            d = {"value": d}
        self.doc = d

    def import_file(self, path: str) -> None:
        """Splice a statement library into the history (one statement
        per non-empty, non-comment line; reference importVal)."""
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#"):
                    self.history.append(line)

    # -- evaluation ----------------------------------------------------
    def _doc_df(self) -> DataFrame:
        payload = json.dumps(self.doc if self.doc else {"__empty__": True})
        return self.spark.read.json(
            self.spark.sparkContext.parallelize([payload], 1)
        )

    def _run(self, stmts: list) -> DataFrame:
        import jsonschema_spark as js

        return js.compile_schema({"script": stmts}).transform(self._doc_df())

    def eval(self, line) -> str | None:
        """Execute one REPL line; returns the printable result for a
        bare expression, None for statements, 'error: ...' on failure
        (state is kept — reference panics, we report)."""
        from .functions.expr_lang import Assign, parse_statements

        try:
            if isinstance(line, str):
                line = line.strip()
                if not line or line.startswith("#"):
                    return None
                # REPL builtins (reference initFunc read/import)
                if line.startswith(("read(", "read ")):
                    self.load_doc(_arg_of(line, "read"))
                    return None
                if line.startswith(("import(", "import ")):
                    self.import_file(_arg_of(line, "import"))
                    return None
                if line.startswith("{"):  # object statement typed as JSON
                    line = json.loads(line)
            if isinstance(line, dict):
                is_stmt = True
            else:
                parsed = parse_statements(line)
                is_stmt = all(isinstance(p, Assign) for p in parsed)
            if is_stmt:
                stmts = self.history + [line]
                self._run(stmts)  # compile-check before accepting
                self.history = stmts
                return None
            stmts = self.history + [f"$.__repl_out__ = string({line})"]
            row = self._run(stmts).select("__repl_out__").collect()[0]
            return row[0] if row[0] is not None else "nil"
        except Exception as e:
            return f"error: {e}"

    def run_repl(self, inp=None, out=None) -> None:
        import sys

        inp = inp or sys.stdin
        out = out or sys.stdout
        print("exp> ", end="", file=out, flush=True)
        for line in inp:
            res = self.eval(line)
            if res is not None:
                print(res, file=out)
            print("exp> ", end="", file=out, flush=True)
        print("", file=out)


def _arg_of(line: str, fn: str) -> str:
    rest = line[len(fn):].strip()
    if rest.startswith("("):
        rest = rest[1:].rstrip(")")
    return rest.strip().strip("'\"")


def eval_per_line(spark: SparkSession, path: str, expr: str) -> DataFrame:
    """`exp -f file -e expr`: per-line evaluation as ONE columnar
    projection — the file is a DataFrame, the expression one Column
    (scales to any line count; the reference loops serially)."""
    import jsonschema_spark as js

    df = spark.read.json(path)
    plan = js.compile_schema({"script": [f"$.__out__ = string({expr})"]})
    return plan.transform(df).select(F.col("__out__").alias("out"))
