"""`script` keyword: embed an expr-language program in a schema
(reference schema_expr.go:8-52; program semantics §2.6/§3.3).

Each statement compiles to Column expressions once, on the driver:

  * ``$.path = expr``          -> a document transform (withColumn) AND
                                  an in-script shadow binding so later
                                  statements read the assigned value —
                                  the reference mutates sequentially
  * ``name = expr``            -> script-local let binding
  * ``return(args...)``        -> unconditional validation error
                                  ``err :[args]`` at the script's path
  * ``if(cond, return(...))``  -> conditional validation error
  * bare expression            -> no-op unless it has effects above

Unsupported constructs (loops, goroutines, lambdas, http/exec) raise
ExprError at compile time — route those to a pandas UDF batch instead.
"""

from __future__ import annotations

import dataclasses

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core.coerce import string_of
from ..core.errors import concat_violations, empty_violations, viol_when
from ..core.refs import ValueRef
from ..functions.expr_lang import (
    Assign,
    Call,
    CVal,
    Env,
    ExprError,
    Ref,
    Return,
    Var,
    compile_expr,
    parse_statements,
)
from .compiler import FnRule, Rule, SchemaError, TransformOp, register_keyword


def _shadowed_root(root: ValueRef, overrides: dict[str, CVal]) -> ValueRef:
    """Root ref whose first-level children can be overridden by earlier
    in-script assignments (sequential mutation semantics)."""
    if not overrides:
        return root
    bindings = dict(root.bindings or {})
    for path, cv in overrides.items():
        if "." not in path and "[" not in path:
            bindings[path] = ValueRef(cv.col, cv.dtype, f"$.{path}")
    return dataclasses.replace(root, bindings=bindings)


def _return_message(env: Env, args: list) -> Column:
    """Go fmt.Sprintf("err :%v", []any{...}) (schema_expr.go:36)."""
    parts: list[Column] = []
    for i, a in enumerate(args):
        v = compile_expr(a, env)
        s = string_of(v.col, v.dtype)
        if i:
            parts.append(F.lit(" "))
        parts.append(F.coalesce(s, F.lit("<nil>")))
    return F.concat(F.lit("err :["), *parts, F.lit("]"))


_SIDE_EFFECT_FNS = {"go", "exec", "http_request", "sleep", "print", "printf"}


def _reject_side_effects(node, path) -> None:
    """Compile-time scan: IO/side-effect functions are excluded from
    the columnar engine (SURVEY §2.6 — go/sleep/exec/http_request)."""
    if isinstance(node, list):
        for n in node:
            _reject_side_effects(n, path)
        return
    if isinstance(node, Call):
        if node.fn in _SIDE_EFFECT_FNS:
            raise SchemaError(
                f"script function '{node.fn}' is side-effectful and "
                f"excluded from the columnar engine (SURVEY §2.6), path:{path}"
            )
        _reject_side_effects(node.args, path)
    for attr in ("left", "right", "operand", "cond", "then", "other", "value", "args", "parts"):
        sub = getattr(node, attr, None)
        if sub is not None and not isinstance(node, Call):
            _reject_side_effects(sub, path)


@register_keyword("script")
def kw_script(operand, path, siblings, ctx) -> Rule:
    try:
        stmts = parse_statements(operand)
    except ExprError as e:
        raise SchemaError(f"script parse error at {path}: {e}") from e

    _reject_side_effects(stmts, path)
    guards = list(ctx.guards)

    def compile_script(root: ValueRef):
        """Walk statements once, building (violations, transforms)."""
        env = Env(root)
        overrides: dict[str, CVal] = {}
        viols: list[Column] = []
        assigns: list[tuple[str, CVal]] = []
        for st in stmts:
            env = Env(_shadowed_root(root, overrides), env.vars)
            if isinstance(st, Assign):
                val = compile_expr(st.value, env)
                if isinstance(st.target, Var):
                    env.vars[st.target.name] = val
                else:
                    overrides[st.target.path] = val
                    assigns.append((st.target.path, val))
            elif isinstance(st, Return):
                viols.append(
                    F.array(
                        F.struct(
                            F.lit(path).alias("path"),
                            _return_message(env, st.args).alias("info"),
                        )
                    )
                )
            elif isinstance(st, Call) and st.fn == "if":
                if len(st.args) != 2:
                    raise SchemaError(f"script if() needs (cond, effect) at {path}")
                cond = compile_expr(st.args[0], env).cond_()
                eff = st.args[1]
                if isinstance(eff, Return):
                    viols.append(
                        viol_when(cond, path, _return_message(env, eff.args))
                    )
                elif isinstance(eff, Assign) and isinstance(eff.target, Ref):
                    val = compile_expr(eff.value, env)
                    cur = compile_expr(Ref(eff.target.path), env)
                    guarded = CVal(
                        F.when(cond, val.col).otherwise(cur.col), val.dtype
                    )
                    overrides[eff.target.path] = guarded
                    assigns.append((eff.target.path, guarded))
                else:
                    raise SchemaError(
                        f"script if() effect must be return(...) or $.path = ... at {path}"
                    )
            else:
                # bare expression: pure, no effect — reference evaluates
                # for side effects we do not support; reject loudly
                # only for known-effectful calls
                if isinstance(st, Call) and st.fn in ("go", "exec", "http_request", "sleep"):
                    raise SchemaError(
                        f"script function '{st.fn}' is side-effectful and "
                        f"excluded from the columnar engine (SURVEY §2.6)"
                    )
        return viols, assigns

    # transforms: registered once at compile time; they re-walk the
    # statements against the *current* DataFrame when applied
    def apply_transforms(df, root: ValueRef):
        _, assigns = compile_script(root)
        cond = None
        if guards:
            from functools import reduce

            cond = reduce(lambda a, b: a & b, [g(root) for g in guards])
        for p, cv in assigns:
            col = cv.col
            if "." in p or "[" in p:
                raise SchemaError(f"script assignment to nested path '{p}' "
                                  f"needs the column to be a struct field")
            if cond is not None:
                old = F.col(p) if p in df.columns else F.lit(None)
                col = F.when(cond, col).otherwise(old)
            if p in df.columns:
                col = col.cast(df.schema[p].dataType) if cv.dtype is None else col
            df = df.withColumn(p, col)
        return df

    ctx.transforms.append(TransformOp(apply_transforms, "script"))

    def fn(ref: ValueRef) -> Column:
        viols, _ = compile_script(ref)
        if not viols:
            return empty_violations()
        return concat_violations(*viols)

    return FnRule(fn)
