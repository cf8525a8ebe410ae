"""Transformation keywords (reference validator_magics.go,
prop_values.go, validator_core.go:439-481, 707-730).

The reference mutates the document in place during validation; the
Spark-native equivalent is a sequenced, PURE `withColumn` pipeline
applied by ``CompiledSchema.transform``.  Keywords compiled inside an
if/then, else or switch/case branch receive the branch predicate as a
`F.when` guard, reproducing conditional mutation (the reference's
TestMagic pattern, all_test.go:100-139) declaratively.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.refs import ValueRef, split_path
from ..functions.values import parse_value
from .compiler import SchemaError, TransformOp, register_keyword


def _target_segs(path: str, operand_key: str | None = None) -> list:
    """Resolve a transform's target column path: property-level
    keywords (constVal/defaultVal/...) target their own property
    (their compile path); object-level keywords (set/...) target the
    jsonpath in the operand key."""
    segs = split_path(operand_key if operand_key is not None else path)
    if not segs:
        raise SchemaError(f"transform at {path} has no target column")
    return segs


def _read(df: DataFrame, segs: list) -> Column | None:
    if str(segs[0]) not in df.columns:
        return None
    c = F.col(str(segs[0]))
    for s in segs[1:]:
        c = c.getItem(s)
    return c


def _write(df: DataFrame, segs: list, value: Column) -> DataFrame:
    """withColumn / withField write-back (jsonpath Set analog,
    jsonpath/jsonpath.go:285-309; no auto-vivification of structs —
    nested targets must exist in the schema)."""
    top = str(segs[0])
    if len(segs) == 1:
        return df.withColumn(top, value)
    if top not in df.columns:
        raise SchemaError(f"nested transform target '{top}' not in schema")
    c = F.col(top)
    # single-level nesting via withField; deeper nesting composes
    field_path = ".".join(str(s) for s in segs[1:])
    return df.withColumn(top, c.withField(field_path, value))


def _guard_cond(guards, root: ValueRef) -> Column | None:
    if not guards:
        return None
    return reduce(lambda a, b: a & b, [g(root) for g in guards])


def _add_op(ctx, keyword: str, build):
    """build(df, root) -> (segs, new_value_column).  Wraps with the
    active branch guards and appends to the transform pipeline."""
    guards = list(ctx.guards)

    def apply(df: DataFrame, root: ValueRef) -> DataFrame:
        segs, new_col = build(df, root)
        cond = _guard_cond(guards, root)
        old = _read(df, segs)
        if cond is not None:
            fallback = old if old is not None else F.lit(None)
            new_col = F.when(cond, new_col).otherwise(fallback)
        return _write(df, segs, new_col)

    ctx.transforms.append(TransformOp(apply, keyword))


# ------------------------------------------------- property-level ops

@register_keyword("constVal")
def kw_const_val(operand, path, siblings, ctx) -> None:
    """Force property to literal (validator_magics.go:8-14)."""

    def build(df, root):
        return split_path(path), F.lit(operand)

    _add_op(ctx, "constVal", build)
    return None


def _default_val(operand, path, ctx) -> None:
    def build(df, root):
        segs = split_path(path)
        old = _read(df, segs)
        # the operand is a VALUE (parseValue semantics): ${} templates,
        # container literals (create_map/array), typed scalars
        b = parse_value(operand).bind(root)
        lit = b.col
        if old is not None:
            dt = dict(zip(df.columns, [f.dataType for f in df.schema.fields])).get(
                str(segs[0])
            )
            if len(segs) == 1 and dt is not None:
                if isinstance(operand, (dict, list)) and not isinstance(
                    dt, (T.MapType, T.ArrayType)
                ):
                    # container default onto a struct-typed column: no
                    # columnar value for the reference's fresh empty
                    # container, and every child lookup on nil vs {} is
                    # identical — keep the column (documented no-op,
                    # e.g. reference schema_test.go:137 "default": {})
                    return segs, old
                lit = lit.cast(dt)
            return segs, F.coalesce(old, lit)
        return segs, lit

    _add_op(ctx, "defaultVal", build)


@register_keyword("defaultVal")
def kw_default_val(operand, path, siblings, ctx) -> None:
    _default_val(operand, path, ctx)
    return None


@register_keyword("default")
def kw_default(operand, path, siblings, ctx) -> None:
    _default_val(operand, path, ctx)
    return None


@register_keyword("defaultVals")
def kw_default_vals(operand, path, siblings, ctx) -> None:
    """Bulk defaults at object level (prop_values.go:5-28)."""
    if not isinstance(operand, dict):
        raise SchemaError(f"defaultVals must be object, path:{path}")
    for k, v in operand.items():
        _default_val(v, f"{path}.{k}", ctx)
    return None


@register_keyword("replaceKey")
def kw_replace_key(operand, path, siblings, ctx) -> None:
    """Copy value under new key unless target exists
    (validator_magics.go:24-28, 40-47)."""
    if not isinstance(operand, str):
        raise SchemaError(f"replaceKey must be string, path:{path}")
    src_segs = split_path(path)

    def build(df, root):
        src = _read(df, src_segs)
        dst_segs = src_segs[:-1] + [operand]
        dst = _read(df, dst_segs)
        if dst is not None:
            return dst_segs, F.coalesce(dst, src)
        return dst_segs, src

    _add_op(ctx, "replaceKey", build)
    return None


@register_keyword("formatVal")
def kw_format_val(operand, path, siblings, ctx) -> None:
    """Coerce property to string/bool/number/lower/upper
    (validator_magics.go:49-77)."""
    if operand not in ("string", "number", "bool", "boolean", "integer", "lower", "upper"):
        raise SchemaError(f"unsupported formatVal '{operand}', path:{path}")
    segs = split_path(path)

    def build(df, root):
        from ..core.coerce import bool_of, number_of, string_of

        c = _read(df, segs)
        if c is None:
            return segs, F.lit(None)
        ref = root
        for s in segs:
            ref = ref.index(s) if isinstance(s, int) else ref.child(str(s))
        if operand == "string":
            return segs, string_of(c, ref.dtype)
        if operand == "number":
            return segs, number_of(c, ref.dtype)
        if operand == "integer":
            return segs, number_of(c, ref.dtype).cast("long")
        if operand in ("bool", "boolean"):
            return segs, bool_of(c, ref.dtype)
        if operand == "lower":
            return segs, F.lower(c.cast("string"))
        return segs, F.upper(c.cast("string"))

    _add_op(ctx, "formatVal", build)
    return None


# --------------------------------------------------- object-level ops

def _set_ops(operand, path, ctx, skip_null: bool, keyword: str) -> None:
    if not isinstance(operand, dict):
        raise SchemaError(f"'{keyword}' operand must be object, path:{path}")
    for jp, raw in operand.items():
        val = parse_value(raw)

        def build(df, root, _jp=jp, _val=val):
            segs = _target_segs(path, _jp)
            b = _val.bind(root)
            new_col = b.col
            old = _read(df, segs)
            if skip_null:
                fallback = old if old is not None else F.lit(None)
                new_col = F.when(b.col.isNotNull(), b.col).otherwise(fallback)
            if old is not None and len(segs) == 1:
                dt = df.schema[str(segs[0])].dataType
                if b.dtype is not None and not isinstance(b.dtype, type(dt)):
                    new_col = new_col.cast(dt) if isinstance(dt, (T.NumericType, T.StringType, T.BooleanType)) else new_col
            return segs, new_col

        _add_op(ctx, keyword, build)


@register_keyword("set")
def kw_set(operand, path, siblings, ctx) -> None:
    _set_ops(operand, path, ctx, skip_null=False, keyword="set")
    return None


@register_keyword("setVal")
def kw_set_val(operand, path, siblings, ctx) -> None:
    _set_ops(operand, path, ctx, skip_null=False, keyword="setVal")
    return None


@register_keyword("setNN")
def kw_set_nn(operand, path, siblings, ctx) -> None:
    # like set but skip nil results (validator_magics.go:159-181)
    _set_ops(operand, path, ctx, skip_null=True, keyword="setNN")
    return None


@register_keyword("delete")
def kw_delete(operand, path, siblings, ctx) -> None:
    """Remove listed keys (validator_core.go:707-730).  Unconditional
    deletes drop the column; guarded deletes null it out (a DataFrame
    column set is static)."""
    if not isinstance(operand, list):
        raise SchemaError(f"'delete' operand must be array, path:{path}")
    keys = [str(k) for k in operand]
    guards = list(ctx.guards)

    def apply(df: DataFrame, root: ValueRef) -> DataFrame:
        cond = _guard_cond(guards, root)
        for k in keys:
            if k not in df.columns:
                continue
            if cond is None:
                df = df.drop(k)
            else:
                df = df.withColumn(k, F.when(cond, F.lit(None)).otherwise(F.col(k)))
        return df

    ctx.transforms.append(TransformOp(apply, "delete"))
    return None


@register_keyword("call")
def kw_call(operand, path, siblings, ctx) -> None:
    # side-effect-only evaluation (validator_magics.go:270-287);
    # columnar engine is pure -> no-op by design (SURVEY §2.2)
    return None


# --------------------------------------------- dynamic-key map ops

def _map_column(ctx) -> str:
    """Dynamic root keys cannot exist on a fixed StructType (SURVEY.md
    §7.4 item 6): setMap/delMap/del/setExpr target a designated
    MapType column instead (option 'map_column', default 'attrs')."""
    return str(ctx.options.get("map_column", "attrs"))


def _apply_map_write(df: DataFrame, mc: str, key_col: Column,
                     val_col: Column | None, cond: Column | None) -> DataFrame:
    if mc not in df.columns:
        raise SchemaError(
            f"map keyword needs MapType column '{mc}' (set options['map_column'])"
        )
    dt = df.schema[mc].dataType
    if not isinstance(dt, T.MapType):
        raise SchemaError(f"column '{mc}' must be MapType, got {dt.simpleString()}")
    old = F.col(mc)
    base = F.coalesce(old, F.create_map().cast(dt))
    # remove the key first: map_concat raises on duplicates under ANSI
    removed = F.map_filter(base, lambda k, v: k != key_col)
    if val_col is None:
        new = removed
    else:
        new = F.map_concat(
            removed, F.create_map(key_col, val_col.cast(dt.valueType))
        )
    if cond is not None:
        new = F.when(cond, new).otherwise(old)
    return df.withColumn(mc, new)


def _map_op(operand, path, ctx, keyword: str, delete: bool) -> None:
    """setMap/delMap/del: operand {"key": ValueExpr, "val": ValueExpr};
    root[StringOf(key)] = val / delete root[key]
    (reference foreach.go:65-101, validator_core.go:103-112)."""
    if not isinstance(operand, dict):
        raise SchemaError(f"'{keyword}' operand must be object, path:{path}")
    key_v = parse_value(operand.get("key"))
    val_v = None if delete else parse_value(operand.get("val"))
    guards = list(ctx.guards)
    mc = _map_column(ctx)

    def apply(df: DataFrame, root: ValueRef) -> DataFrame:
        from ..core.coerce import string_of

        kb = key_v.bind(root)
        key_col = string_of(kb.col, kb.dtype)
        val_col = None if delete else val_v.bind(root).col
        cond = _guard_cond(guards, root)
        return _apply_map_write(df, mc, key_col, val_col, cond)

    ctx.transforms.append(TransformOp(apply, keyword))


@register_keyword("setMap")
def kw_set_map(operand, path, siblings, ctx) -> None:
    _map_op(operand, path, ctx, "setMap", delete=False)
    return None


@register_keyword("delMap")
def kw_del_map(operand, path, siblings, ctx) -> None:
    _map_op(operand, path, ctx, "delMap", delete=True)
    return None


@register_keyword("del")
def kw_del(operand, path, siblings, ctx) -> None:
    _map_op(operand, path, ctx, "del", delete=True)
    return None


@register_keyword("setExpr")
def kw_set_expr(operand, path, siblings, ctx) -> None:
    """Both key AND value computed per row
    (reference validator_magics.go:203-244): '${user}:${ip}' -> 'true'.
    Dynamic keys land in the designated map column."""
    if not isinstance(operand, dict):
        raise SchemaError(f"'setExpr' operand must be object, path:{path}")
    pairs = [(parse_value(k), parse_value(v)) for k, v in operand.items()]
    guards = list(ctx.guards)
    mc = _map_column(ctx)

    def apply(df: DataFrame, root: ValueRef) -> DataFrame:
        from ..core.coerce import string_of

        cond = _guard_cond(guards, root)
        for key_v, val_v in pairs:
            kb = key_v.bind(root)
            df = _apply_map_write(
                df, mc, string_of(kb.col, kb.dtype), val_v.bind(root).col, cond
            )
        return df

    ctx.transforms.append(TransformOp(apply, "setExpr"))
    return None
