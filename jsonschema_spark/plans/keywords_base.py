"""Assertion keywords (reference validator_base.go / validator_core.go
/ validator_strings.go / validator_properties.go), compiled to pure
Column expressions — no per-row Python anywhere.

Null semantics replicate the reference's null-skip fast paths
(validator_base.go:180-183, 461-463): a null/missing value passes every
check except `required` (and the Compare-map forms, which see Go zero
values — compare.go:23-27).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.coerce import (
    bool_of,
    coerce_literal_for,
    number_of,
    string_of,
)
from ..core.errors import (
    empty_violations,
    go_num,
    go_v,
    viol_when,
    violation,
)
from ..core.refs import ValueRef, resolve
from ..functions.values import parse_value
from .compiler import FnRule, Rule, SchemaError, register_keyword
from .formats import compile_format


def _skip_null(ref: ValueRef, v: Column) -> Column:
    if not ref.exists:
        return empty_violations()
    return F.when(ref.null(), empty_violations()).otherwise(v)


def _is_numeric(dt) -> bool:
    return isinstance(dt, T.NumericType)


def _is_integral(dt) -> bool:
    return isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))


def _type_names(dt) -> set[str]:
    """Static classification of a Spark dtype into the reference's
    runtime type universe (typeOf, type.go:3-20)."""
    if isinstance(dt, T.StringType):
        return {"string"}
    if isinstance(dt, T.BooleanType):
        return {"boolean", "bool"}
    if _is_integral(dt):
        return {"number", "integer"}
    if _is_numeric(dt):
        return {"number"}  # integer needs runtime frac check
    if isinstance(dt, T.ArrayType):
        return {"array"}
    if isinstance(dt, (T.StructType, T.MapType)):
        return {"object"}
    if isinstance(dt, (T.TimestampType, T.DateType)):
        # reference carries time as RFC3339 strings (funcs.go:245-247)
        return {"string"}
    return set()


# --------------------------------------------------------------- type

@register_keyword("type")
def kw_type(operand, path, siblings, ctx) -> Rule:
    if not isinstance(operand, str):
        raise SchemaError(f"value of 'type' must be string! path:{path}")
    wanted = [t.strip() for t in operand.split("|")]
    union = len(wanted) > 1

    def fn(ref: ValueRef) -> Column:
        if "any" in wanted:
            return empty_violations()
        dt = ref.dtype
        if isinstance(dt, T.VariantType):
            return _type_variant(ref, wanted, union, operand)
        have = _type_names(dt) if dt is not None else set()
        checks: list[Column] = []
        for w in wanted:
            if w in have:
                checks.append(F.lit(True))
            elif w == "integer" and _is_numeric(dt) and not _is_integral(dt):
                checks.append(ref.col == F.floor(ref.col))
            else:
                checks.append(F.lit(False))
        ok = checks[0]
        for c in checks[1:]:
            ok = ok | c
        if union:
            info = F.lit(f"type should be one of {operand}")
        elif wanted[0] == "integer" and _is_numeric(dt) and not _is_integral(dt):
            info = F.concat(
                F.lit("type should be integer, but float:"), string_of(ref.col, dt)
            )
        else:
            given = dt.simpleString() if dt is not None else "null"
            info = F.lit(f"Invalid type, expected: {wanted[0]} , given: {given}")
        return _skip_null(ref, viol_when(~ok, ref.path, info))

    return FnRule(fn)


def _type_variant(ref: ValueRef, wanted, union, operand) -> Column:
    """Runtime type dispatch on a Variant value — the exact typeOf
    switch (type.go:3-20) with reflect.TypeOf 'given:' labels
    (validator_base.go:44-160)."""
    from ..core.variant import (
        KIND_ARRAY,
        KIND_BOOL,
        KIND_NUMBER,
        KIND_OBJECT,
        KIND_STRING,
    )

    kind = ref.v_kind()
    d = ref.v_double()

    def ok_of(w: str) -> Column:
        if w == "string":
            return kind == KIND_STRING
        if w in ("bool", "boolean"):
            return kind == KIND_BOOL
        if w == "number":
            return kind == KIND_NUMBER
        if w == "integer":
            # float64 with zero fraction passes (validator_base.go:95-101)
            return (kind == KIND_NUMBER) & (d == F.floor(d))
        if w == "object":
            return kind == KIND_OBJECT
        if w == "array":
            return kind == KIND_ARRAY
        return F.lit(False)  # lower/upper/unknown: parity with static path

    ok = ok_of(wanted[0])
    for w in wanted[1:]:
        ok = ok | ok_of(w)
    if union:
        info = F.lit(f"type should be one of {operand}")
    elif wanted[0] == "integer":
        info = F.when(
            kind == KIND_NUMBER,
            F.concat(
                F.lit("type should be integer, but float:"),
                ref.str_of(),
            ),
        ).otherwise(
            F.concat(
                F.lit("Invalid type, expected: integer , given: "),
                ref.go_label(),
            )
        )
    else:
        info = F.concat(
            F.lit(f"Invalid type, expected: {wanted[0]} , given: "),
            ref.go_label(),
        )
    return _skip_null(ref, viol_when(~ok, ref.path, info))


# ------------------------------------------------------- length bounds

def _length_of(ref: ValueRef) -> Column | None:
    dt = ref.dtype
    if isinstance(dt, T.VariantType):
        # runtime dispatch (MaxLength.Validate switches on string/array,
        # validator_base.go:257-275); NULL on other kinds -> no check
        from ..core.variant import nn_size

        return F.coalesce(
            F.octet_length(ref.v_string()),
            nn_size(ref.v_array()),
        )
    if isinstance(dt, T.ArrayType):
        return F.size(ref.col)
    if isinstance(dt, T.StringType) or dt is None:
        # Go len(string) is bytes (validator_base.go:258-264)
        return F.octet_length(ref.col.cast("string"))
    return None


@register_keyword("maxLength")
def kw_max_length(operand, path, siblings, ctx) -> Rule:
    n = _int_operand(operand, "maxLength", path)

    def fn(ref: ValueRef) -> Column:
        ln = _length_of(ref)
        if ln is None:
            return empty_violations()
        return _skip_null(
            ref, viol_when(ln > n, ref.path, f"length must be less or equal than {n}")
        )

    return FnRule(fn)


@register_keyword("minLength")
def kw_min_length(operand, path, siblings, ctx) -> Rule:
    n = _int_operand(operand, "minLength", path)

    def fn(ref: ValueRef) -> Column:
        ln = _length_of(ref)
        if ln is None:
            return empty_violations()
        return _skip_null(
            ref, viol_when(ln < n, ref.path, f"length must be larger or equal than {n}")
        )

    return FnRule(fn)


def _int_operand(operand, kw, path) -> int:
    if isinstance(operand, bool) or not isinstance(operand, (int, float)):
        raise SchemaError(f"value of '{kw}' must be int: path:{path}")
    if operand < 0:
        raise SchemaError(f"value of '{kw}' must be >=0, path:{path}")
    return int(operand)


# ------------------------------------------------------ numeric bounds

def _num_operand(operand, kw, path) -> float:
    if isinstance(operand, bool) or not isinstance(operand, (int, float)):
        raise SchemaError(f"value of '{kw}' must be number, path:{path}")
    return float(operand)


def _numeric_value(ref: ValueRef) -> Column | None:
    """Numeric view of the current value; None when statically
    non-numeric (bounds skip, as the reference skips non-float64)."""
    dt = ref.dtype
    if isinstance(dt, T.VariantType):
        # strict: JSON numbers only, exactly valueOfFloat
        # (validator_base.go:405-425) — no string/bool coercion
        return ref.v_double()
    if _is_numeric(dt):
        return ref.col.cast("double")
    if isinstance(dt, (T.TimestampType, T.DateType)):
        return ref.col.cast("timestamp").cast("double")
    if isinstance(dt, T.StringType) or dt is None:
        return ref.col.cast("string").try_cast("double")
    return None


@register_keyword("maximum")
def kw_maximum(operand, path, siblings, ctx) -> Rule:
    v = _num_operand(operand, "maximum", path)
    # sibling bool exclusiveMaximum folds into a strict bound
    # (validator_base.go:365-375)
    exclusive = siblings.get("exclusiveMaximum") is True

    def fn(ref: ValueRef) -> Column:
        c = _numeric_value(ref)
        if c is None:
            return empty_violations()
        if exclusive:
            fail = ~(c < v)
            info = f"value must be  < {go_num(v)}"
        else:
            fail = ~(c <= v)
            info = f"value must be <= than {go_num(v)}"
        return _skip_null(ref, F.when(c.isNull(), empty_violations()).otherwise(viol_when(fail, ref.path, info)))

    return FnRule(fn)


@register_keyword("minimum")
def kw_minimum(operand, path, siblings, ctx) -> Rule:
    v = _num_operand(operand, "minimum", path)
    exclusive = siblings.get("exclusiveMinimum") is True

    def fn(ref: ValueRef) -> Column:
        c = _numeric_value(ref)
        if c is None:
            return empty_violations()
        if exclusive:
            fail = ~(c > v)
            info = f"value must be larger than {go_num(v)}"
        else:
            fail = ~(c >= v)
            info = f"value must be larger or equal than {go_num(v)}"
        return _skip_null(ref, F.when(c.isNull(), empty_violations()).otherwise(viol_when(fail, ref.path, info)))

    return FnRule(fn)


@register_keyword("exclusiveMaximum")
def kw_exclusive_maximum(operand, path, siblings, ctx) -> Rule | None:
    # bool form: modifier consumed by sibling maximum
    # (validator_core.go:887-951 3-state status)
    if isinstance(operand, bool):
        return None
    v = _num_operand(operand, "exclusiveMaximum", path)

    def fn(ref: ValueRef) -> Column:
        c = _numeric_value(ref)
        if c is None:
            return empty_violations()
        return _skip_null(
            ref,
            F.when(c.isNull(), empty_violations()).otherwise(
                viol_when(~(c < v), ref.path, f"value should be < {go_v(operand)}")
            ),
        )

    return FnRule(fn)


@register_keyword("exclusiveMinimum")
def kw_exclusive_minimum(operand, path, siblings, ctx) -> Rule | None:
    if isinstance(operand, bool):
        return None
    v = _num_operand(operand, "exclusiveMinimum", path)

    def fn(ref: ValueRef) -> Column:
        c = _numeric_value(ref)
        if c is None:
            return empty_violations()
        return _skip_null(
            ref,
            F.when(c.isNull(), empty_violations()).otherwise(
                viol_when(~(c > v), ref.path, f"value should be > {go_v(operand)}")
            ),
        )

    return FnRule(fn)


@register_keyword("multipleOf")
def kw_multiple_of(operand, path, siblings, ctx) -> Rule:
    m = _num_operand(operand, "multipleOf", path)
    if m == 0:
        raise SchemaError(f"multipleOf must not be 0, path:{path}")

    def fn(ref: ValueRef) -> Column:
        c = _numeric_value(ref)
        if c is None:
            return empty_violations()
        q = c / m
        fail = q != F.floor(q)
        info = F.concat(
            F.lit(f"value must be multipleOf {go_num(m)},but:"),
            string_of(c, T.DoubleType()),
            F.lit(", divide:"),
            string_of(q, T.DoubleType()),
        )
        return _skip_null(
            ref,
            F.when(c.isNull(), empty_violations()).otherwise(viol_when(fail, ref.path, info)),
        )

    return FnRule(fn)


# -------------------------------------------------------- enum / const

def _enum_rule(operand, path, keyword) -> Rule:
    if not isinstance(operand, list) or not operand:
        raise SchemaError(f"value of '{keyword}' must be non-empty array, path:{path}")
    msg = f"value is invalid , shoule be one of {go_v(operand)}"  # sic (validator_base.go:477)

    def fn(ref: ValueRef) -> Column:
        dt = ref.dtype
        # coercing Equal keyed on LHS type (common.go:142-154)
        if isinstance(dt, T.VariantType):
            # runtime LHS kind picks the comparison family per row
            from ..core.variant import KIND_BOOL, KIND_NUMBER

            k = ref.v_kind()
            nums = [float(coerce_literal_for(T.DoubleType(), v)) for v in operand]
            bools = [bool(coerce_literal_for(T.BooleanType(), v)) for v in operand]
            strs = [str(coerce_literal_for(T.StringType(), v)) for v in operand]
            ok = (
                F.when(k == KIND_NUMBER, ref.num_of().isin(nums))
                .when(k == KIND_BOOL, ref.bool_of().isin(bools))
                .otherwise(ref.str_of().isin(strs))
            )
            return _skip_null(ref, viol_when(~ok, ref.path, msg))
        lits = [coerce_literal_for(dt, v) for v in operand]
        if dt is not None and _is_numeric(dt):
            ok = number_of(ref.col, dt).isin([float(x) for x in lits])
        elif isinstance(dt, T.BooleanType):
            ok = bool_of(ref.col, dt).isin([bool(x) for x in lits])
        else:
            ok = string_of(ref.col, dt).isin([str(x) for x in lits])
        return _skip_null(ref, viol_when(~ok, ref.path, msg))

    return FnRule(fn)


@register_keyword("enum")
def kw_enum(operand, path, siblings, ctx) -> Rule:
    return _enum_rule(operand, path, "enum")


@register_keyword("enums")
def kw_enums(operand, path, siblings, ctx) -> Rule:
    return _enum_rule(operand, path, "enums")


@register_keyword("const")
def kw_const(operand, path, siblings, ctx) -> Rule:
    # const compares stringified (validator_base.go:762-782)
    sv = coerce_literal_for(T.StringType(), operand)

    def fn(ref: ValueRef) -> Column:
        ok = ref.str_of() == F.lit(sv)
        return _skip_null(ref, viol_when(~ok, ref.path, f"value is invalid , expected: {sv}"))

    return FnRule(fn)


# ------------------------------------------------------------ required

@register_keyword("required")
def kw_required(operand, path, siblings, ctx) -> Rule:
    if not isinstance(operand, list):
        raise SchemaError(f"value of 'required' must be array, path:{path}")
    keys = []
    for k in operand:
        if not isinstance(k, str):
            raise SchemaError(f"value of 'required item' must be string: {k}")
        keys.append(k)
    # build-time cross-check against sibling properties when
    # additionalProperties is disabled (validator_base.go:565-584)
    props = siblings.get("properties") or siblings.get("props")
    if props is not None and siblings.get("additionalProperties") is False:
        for k in keys:
            if k not in props:
                raise SchemaError(
                    f"required '{k}' is not defined in properties when "
                    f"additionalProperties is not enabled! path:{path}"
                )

    def fn(ref: ValueRef) -> Column:
        parts = []
        for k in keys:
            child = ref.child(k)
            if not child.exists:
                parts.append(violation(child.path, "field is required"))
            elif isinstance(child.dtype, T.VariantType):
                # exact m[key] presence (validator_base.go:500-512):
                # a present key holding JSON null is NOT missing
                parts.append(viol_when(child.missing(), child.path, "field is required"))
            else:
                parts.append(viol_when(child.null(), child.path, "field is required"))
        from ..core.errors import concat_violations

        out = concat_violations(*parts)
        if isinstance(ref.dtype, T.VariantType):
            # non-object value: reference skips entirely
            # (value.(map[string]interface{}) guard)
            out = F.when(
                ref.v_object().isNull(), empty_violations()
            ).otherwise(out)
        return out

    return FnRule(fn)


# ------------------------------------------------------------- pattern

@register_keyword("pattern")
def kw_pattern(operand, path, siblings, ctx) -> Rule:
    if not isinstance(operand, str):
        raise SchemaError(f"value of 'pattern' must be string, path:{path}")
    import re as _re

    try:
        _re.compile(operand)  # compile-once check (validator_strings.go:27-37)
    except _re.error as e:
        raise SchemaError(f"invalid pattern at {path}: {e}") from e

    def fn(ref: ValueRef) -> Column:
        dt = ref.dtype
        if isinstance(dt, T.VariantType):
            # strict view: non-strings are NULL -> check skips, exactly
            # the value.(string) guard (validator_strings.go:14-18)
            s = ref.v_string()
        elif dt is not None and not isinstance(dt, T.StringType):
            return empty_violations()
        else:
            s = ref.col.cast("string")
        info = F.concat(s, F.lit(" ,value does not match pattern: "), F.lit(operand))
        return _skip_null(ref, viol_when(~s.rlike(operand), ref.path, info))

    return FnRule(fn)


# --------------------------------------------------------------- items

@register_keyword("items")
def kw_items(operand, path, siblings, ctx) -> Rule:
    sub = ctx.compile_node(operand, path + "[*]")

    def fn(ref: ValueRef) -> Column:
        if isinstance(ref.dtype, T.VariantType):
            aref = _variant_array_ref(ref)
            per_elem = F.transform(aref.col, lambda x: sub.violations(aref.element(x)))
            # non-array at runtime: view is NULL -> transform NULL -> skip
            return _skip_null(ref, F.coalesce(F.flatten(per_elem), empty_violations()))
        if not isinstance(ref.dtype, T.ArrayType):
            return empty_violations()
        per_elem = F.transform(ref.col, lambda x: sub.violations(ref.element(x)))
        return _skip_null(ref, F.flatten(per_elem))

    return FnRule(fn)


def _variant_array_ref(ref: ValueRef) -> ValueRef:
    """array<variant> view of a variant ref (NULL when not an array).
    The copy keeps the parent's hoist registry under a view-scoped key
    so element descents stay correctly namespaced."""
    from dataclasses import replace as _replace

    return _replace(
        ref,
        col=ref.v_array(),
        dtype=T.ArrayType(T.VariantType()),
        hkey=(ref.hkey + ("arrv",)) if ref.hkey is not None else None,
        hlevel=ref.hlevel + 1,
    )


@register_keyword("uniqueItems")
def kw_unique_items(operand, path, siblings, ctx) -> Rule | None:
    if not isinstance(operand, bool):
        raise SchemaError(f"{path} uniqueItems value should be boolean")
    if not operand:
        return None

    def fn(ref: ValueRef) -> Column:
        dt = ref.dtype
        if isinstance(dt, T.VariantType):
            # per-element runtime comparability (Go map-key interface
            # identity: same dynamic type AND value,
            # validator_core.go:787-799).  Dup detection tags each
            # element kind|canonical-string so 1 != "1" != true.
            from ..core.variant import KIND_ARRAY, KIND_OBJECT, variant_kind
            from ..core.variant import variant_string_of as _vso

            arr = _variant_array_ref(ref).col
            kinds = F.transform(arr, lambda x: variant_kind(x))
            has_container = F.exists(
                kinds, lambda k: k.isin(KIND_OBJECT, KIND_ARRAY)
            )
            tags = F.transform(
                arr, lambda x: F.concat_ws("|", variant_kind(x), _vso(x))
            )
            dup = F.size(F.array_distinct(tags)) != F.size(tags)
            out = (
                F.when(arr.isNull(), empty_violations())  # non-array: skip
                .when(
                    has_container,
                    violation(
                        ref.path,
                        " items should be comparable type,like [ string boolean number ]",
                    ),
                )
                .otherwise(viol_when(dup, ref.path, " items should be unique"))
            )
            return _skip_null(ref, out)
        if not isinstance(dt, T.ArrayType):
            return empty_violations()
        if not isinstance(
            dt.elementType, (T.StringType, T.BooleanType, T.NumericType)
        ):
            return _skip_null(
                ref,
                violation(
                    ref.path,
                    " items should be comparable type,like [ string boolean number ]",
                ),
            )
        fail = F.size(F.array_distinct(ref.col)) != F.size(ref.col)
        return _skip_null(ref, viol_when(fail, ref.path, " items should be unique"))

    return FnRule(fn)


@register_keyword("maxItems")
def kw_max_items(operand, path, siblings, ctx) -> Rule:
    n = _int_operand(operand, "maxItems", path)

    def fn(ref: ValueRef) -> Column:
        if isinstance(ref.dtype, T.VariantType):
            from ..core.variant import nn_size

            sz = nn_size(_variant_array_ref(ref).col)  # NULL unless array
            return _skip_null(
                ref, viol_when(sz > n, ref.path, f" max length is {n}")
            )
        if not isinstance(ref.dtype, T.ArrayType):
            return empty_violations()
        return _skip_null(
            ref, viol_when(F.size(ref.col) > n, ref.path, f" max length is {n}")
        )

    return FnRule(fn)


@register_keyword("minItems")
def kw_min_items(operand, path, siblings, ctx) -> Rule:
    n = _int_operand(operand, "minItems", path)

    def fn(ref: ValueRef) -> Column:
        if isinstance(ref.dtype, T.VariantType):
            from ..core.variant import nn_size

            sz = nn_size(_variant_array_ref(ref).col)
            return _skip_null(
                ref, viol_when(sz < n, ref.path, f" min length is {n}")
            )
        if not isinstance(ref.dtype, T.ArrayType):
            return empty_violations()
        return _skip_null(
            ref, viol_when(F.size(ref.col) < n, ref.path, f" min length is {n}")
        )

    return FnRule(fn)


# --------------------------------------------- object key-count bounds

@register_keyword("minProperties")
def kw_min_properties(operand, path, siblings, ctx) -> Rule:
    n = _int_operand(operand, "minProperties", path)

    def fn(ref: ValueRef) -> Column:
        cnt = _prop_count(ref)
        if cnt is None:
            return empty_violations()
        return _skip_null(
            ref, viol_when(cnt < n, ref.path, f"min properties is : {n}")
        )

    return FnRule(fn)


@register_keyword("maxProperties")
def kw_max_properties(operand, path, siblings, ctx) -> Rule:
    """Reference bug (validator_properties.go:86-89): NewMaxProperties
    returns a MinProperties, so `maxProperties` acts as a minimum.
    We implement the CORRECT maximum semantics — documented divergence
    (SURVEY §7.4); set options['replicate_max_properties_bug']=True for
    bug-compatible behavior."""
    n = _int_operand(operand, "maxProperties", path)
    if ctx.options.get("replicate_max_properties_bug"):
        return kw_min_properties(operand, path, siblings, ctx)

    def fn(ref: ValueRef) -> Column:
        cnt = _prop_count(ref)
        if cnt is None:
            return empty_violations()
        return _skip_null(
            ref, viol_when(cnt > n, ref.path, f"max properties is :{n}")
        )

    return FnRule(fn)


def _prop_count(ref: ValueRef) -> Column | None:
    dt = ref.dtype
    if isinstance(dt, T.VariantType):
        # objects AND arrays count (validator_properties.go:29-35);
        # NULL on scalars -> check skips
        from ..core.variant import nn_size

        return F.coalesce(
            nn_size(ref.v_object()), nn_size(ref.v_array())
        )
    if isinstance(dt, T.MapType):
        return F.size(ref.col)
    if isinstance(dt, T.StructType):
        nn = [F.when(ref.col.getField(f.name).isNotNull(), 1).otherwise(0) for f in dt.fields]
        out = nn[0]
        for c in nn[1:]:
            out = out + c
        return out
    if isinstance(dt, T.ArrayType):
        # the reference also counts arrays (validator_properties.go:29-35)
        return F.size(ref.col)
    if ref.is_root and isinstance(dt, T.StructType):
        return F.lit(len(dt.fields))
    return None


# -------------------------------------------------------- base64 bounds

@register_keyword("maxB64DLen")
def kw_max_b64(operand, path, siblings, ctx) -> Rule:
    n = _int_operand(operand, "maxB64DLen", path)

    def fn(ref: ValueRef) -> Column:
        s = _string_view(ref)
        if s is None:
            return empty_violations()
        # Go base64.StdEncoding.DecodedLen = len/4*3 (validator_base.go:692-760)
        dlen = F.floor(F.octet_length(s) / 4) * 3
        return _skip_null(
            ref, viol_when(dlen > n, ref.path, f"length is invalid, max length is  {n}")
        )

    return FnRule(fn)


@register_keyword("minB64DLen")
def kw_min_b64(operand, path, siblings, ctx) -> Rule:
    n = _int_operand(operand, "minB64DLen", path)

    def fn(ref: ValueRef) -> Column:
        s = _string_view(ref)
        if s is None:
            return empty_violations()
        dlen = F.floor(F.octet_length(s) / 4) * 3
        return _skip_null(
            ref, viol_when(dlen < n, ref.path, f"length is invalid ,min length is  {n}")
        )

    return FnRule(fn)


def _string_view(ref: ValueRef) -> Column | None:
    """String-kind view for string-only keywords: the column itself
    for static strings, the strict runtime view for variants (NULL on
    non-strings -> check skips), None for statically non-string."""
    if isinstance(ref.dtype, T.VariantType):
        return ref.v_string()
    if ref.dtype is not None and not isinstance(ref.dtype, T.StringType):
        return None
    return ref.col.cast("string")


# --------------------------------------------------------------- format

@register_keyword("format")
def kw_format(operand, path, siblings, ctx) -> Rule:
    if not isinstance(operand, str):
        raise SchemaError(f"value of 'format' must be string, path:{path}")
    check = compile_format(operand)

    def fn(ref: ValueRef) -> Column:
        if isinstance(ref.dtype, T.VariantType):
            s = ref.v_string()  # non-strings skip at runtime
        elif ref.dtype is not None and not isinstance(
            ref.dtype, (T.StringType, T.TimestampType, T.DateType)
        ):
            return empty_violations()
        else:
            s = ref.col.cast("string")
        return _skip_null(
            ref,
            viol_when(~check(s), ref.path, f"value does not match format '{operand}'"),
        )

    return FnRule(fn)


# --------------------------------------------------------- dependencies

@register_keyword("dependencies")
def kw_dependencies(operand, path, siblings, ctx) -> Rule:
    if not isinstance(operand, dict):
        raise SchemaError(f"value of 'dependencies' must be object, path:{path}")
    deps = {}
    for k, v in operand.items():
        if not isinstance(v, list):
            raise SchemaError(f"dependencies values must be arrays, path:{path}")
        deps[k] = [str(x) for x in v]

    def fn(ref: ValueRef) -> Column:
        from ..core.errors import concat_violations

        parts = []
        for k, vs in deps.items():
            kc = ref.child(k)
            for dep in vs:
                dc = ref.child(dep)
                # m[key] PRESENCE on both sides (validator_logic.go:
                # 198-218): a key holding JSON null counts as present
                parts.append(
                    viol_when(~kc.missing() & dc.missing(), dc.path, "is required")
                )
        out = concat_violations(*parts)
        if isinstance(ref.dtype, T.VariantType):
            out = F.when(
                ref.v_object().isNull(), empty_violations()
            ).otherwise(out)
        return out

    return FnRule(fn)


# ------------------------------------------------- children (sub-node)

@register_keyword("children")
def kw_children(operand, path, siblings, ctx) -> Rule:
    """Apply sub-validator to named children only when present
    (validator_core.go:732-762)."""
    if not isinstance(operand, dict):
        raise SchemaError(f"value of 'children' must be object, path:{path}")
    subs = {k: ctx.compile_node(v, f"{path}.{k}") for k, v in operand.items()}

    def fn(ref: ValueRef) -> Column:
        from ..core.errors import concat_violations

        parts = []
        for k, sub in subs.items():
            child = ref.child(k)
            if not child.exists:
                continue
            parts.append(
                F.when(child.null(), empty_violations()).otherwise(
                    sub.violations(child)
                )
            )
        return concat_violations(*parts)

    return FnRule(fn)


# ------------------------------------- single-value string comparisons

def _compare_single(keyword: str, info: str, build_ok):
    @register_keyword(keyword)
    def kw(operand, path, siblings, ctx, _info=info, _build=build_ok) -> Rule:
        if not isinstance(operand, str):
            raise SchemaError(f"{path} is not string")

        def fn(ref: ValueRef) -> Column:
            s = _string_view(ref)
            if s is None:
                return empty_violations()
            return _skip_null(
                ref, viol_when(~_build(s, operand), ref.path, _info + operand)
            )

        return FnRule(fn)

    return kw


_compare_single("startWith", " should start with ", lambda c, v: c.startswith(v))
_compare_single("endWith", " should end with ", lambda c, v: c.endswith(v))
_compare_single("contains", " should contains ", lambda c, v: c.contains(v))


# --------------------------------- map-form comparisons (jsonpath keys)

def _compare_map(keyword: str, info: str, build_ok, numeric_rhs=False):
    """NewCompare forms (compare.go:69-111): operand is a map of
    jsonpath -> operand; missing values compare as Go zero values."""

    @register_keyword(keyword)
    def kw(operand, path, siblings, ctx, _info=info, _build=build_ok) -> Rule:
        if not isinstance(operand, dict):
            raise SchemaError(f"{path} is not a map")
        compiled = [(jp, parse_value(v), v) for jp, v in operand.items()]
        silent = ctx.in_if

        def fn(ref: ValueRef) -> Column:
            from ..core.errors import concat_violations

            parts = []
            for jp, val, raw in compiled:
                target = resolve(ref, jp)
                bound = val.bind(ref)
                ok = _build(target, bound)
                if silent:
                    parts.append(viol_when(~ok, "", ""))
                else:
                    parts.append(
                        viol_when(
                            ~ok,
                            f"{ref.path}.{jp}" if not ref.is_root else f"$.{jp}",
                            _info + _static_str(raw),
                        )
                    )
            return concat_violations(*parts)

        return FnRule(fn)

    return kw


def _static_str(raw) -> str:
    from ..core.coerce import coerce_literal_for as _c

    return str(_c(T.StringType(), raw))


def _zs(target: ValueRef) -> Column:
    # Go zero-value string for missing (compare.go:23-27)
    return F.coalesce(target.str_of(), F.lit(""))


def _zn(target: ValueRef) -> Column:
    return F.coalesce(target.num_of(), F.lit(0.0))


_compare_map("startWiths", "should start with ", lambda t, b: _zs(t).startswith(b.str_of()))
# sic: reference reuses the startWith message for endWiths
# (validator_core.go:78-80)
_compare_map("endWiths", "should start with ", lambda t, b: _zs(t).endswith(b.str_of()))
_compare_map("containss", "should contains ", lambda t, b: _zs(t).contains(b.str_of()))
_compare_map("maxLengths", "length should less then", lambda t, b: F.octet_length(_zs(t)) <= b.num_of())
_compare_map("minLengths", "length should larger then", lambda t, b: F.octet_length(_zs(t)) >= b.num_of())
_compare_map("gt", "should greater than ", lambda t, b: _zn(t) > b.num_of())
_compare_map("lt", "should less than", lambda t, b: _zn(t) < b.num_of())
_compare_map("gte", "should greater or equal than ", lambda t, b: _zn(t) >= b.num_of())
_compare_map("lte", "should less or equal  than ", lambda t, b: _zn(t) <= b.num_of())


@register_keyword("patterns")
def kw_patterns(operand, path, siblings, ctx) -> Rule:
    """Map form jsonpath -> regex (validator_core.go:94-101); regexes
    compiled once at build time like the reference."""
    if not isinstance(operand, dict):
        raise SchemaError(f"{path} is not a map")
    import re as _re

    compiled = []
    for jp, pat in operand.items():
        if not isinstance(pat, str):
            raise SchemaError("regexp expect string")
        _re.compile(pat)
        compiled.append((jp, pat))

    def fn(ref: ValueRef) -> Column:
        from ..core.errors import concat_violations

        parts = []
        for jp, pat in compiled:
            target = resolve(ref, jp)
            ok = _zs(target).rlike(pat)
            parts.append(
                viol_when(~ok, f"$.{jp}", "should match regular expression" + pat)
            )
        return concat_violations(*parts)

    return FnRule(fn)


@register_keyword("neq")
def kw_neq(operand, path, siblings, ctx) -> Rule:
    if not isinstance(operand, dict):
        raise SchemaError(f"{path} is not a map")
    compiled = [(jp, parse_value(v), v) for jp, v in operand.items()]

    def fn(ref: ValueRef) -> Column:
        from ..core.errors import concat_violations
        from ..core.refs import equal_refs

        parts = []
        for jp, val, raw in compiled:
            target = resolve(ref, jp)
            bound = val.bind(ref)
            eq = equal_refs(target, bound)
            parts.append(
                viol_when(
                    F.coalesce(eq, F.lit(False)),
                    f"$.{jp}",
                    "should not equal with " + _static_str(raw),
                )
            )
        return concat_violations(*parts)

    return FnRule(fn)


# ------------------------------------------------------------ in/notin

def _in_rule(operand, path, ctx, negate: bool) -> Rule:
    if not isinstance(operand, dict):
        raise SchemaError(f"'in'/'notin' operand must be a map, path:{path}")
    compiled = []
    for jp, lst in operand.items():
        if not isinstance(lst, list):
            raise SchemaError("'in' or 'notin' opt right value expect slice")
        compiled.append((jp, [parse_value(v) for v in lst], lst))

    def fn(ref: ValueRef) -> Column:
        from ..core.errors import concat_violations
        from ..core.refs import equal_refs

        parts = []
        for jp, vals, raw in compiled:
            target = resolve(ref, jp)
            ok = F.lit(False)
            for v in vals:
                b = v.bind(ref)
                ok = ok | F.coalesce(equal_refs(target, b), F.lit(False))
            if negate:
                # notin wraps in a Not -> "is not valid" (validator_logic.go:151)
                parts.append(viol_when(ok, f"$.{jp}", "is not valid"))
            else:
                parts.append(viol_when(~ok, f"$.{jp}", "should be one of  " + go_v(raw)))
        return concat_violations(*parts)

    return FnRule(fn)


@register_keyword("in")
def kw_in(operand, path, siblings, ctx) -> Rule:
    return _in_rule(operand, path, ctx, negate=False)


@register_keyword("notin")
def kw_notin(operand, path, siblings, ctx) -> Rule:
    return _in_rule(operand, path, ctx, negate=True)


# ---------------------------------------------------------------- ipIn

@register_keyword("ipIn")
def kw_ip_in(operand, path, siblings, ctx) -> Rule:
    """IPv4-in-CIDR-set (validator_core.go:168-196): CIDRs are parsed
    once on the driver into numeric [lo, hi] ranges; the runtime check
    is pure integer arithmetic on the dotted-quad."""
    if not isinstance(operand, dict):
        raise SchemaError("ipIn operand should be map of jsonpath -> cidr list")
    import ipaddress

    compiled = []
    for jp, cidrs in operand.items():
        if not isinstance(cidrs, list):
            raise SchemaError("ipIn should be slice type")
        ranges = []
        for c in cidrs:
            s = str(c)
            if "/" not in s:
                s += "/32"
            net = ipaddress.ip_network(s, strict=False)
            ranges.append((int(net.network_address), int(net.broadcast_address)))
        compiled.append((jp, ranges, cidrs))

    def ip_to_long(s: Column) -> Column:
        parts = F.split(s, r"\.")
        valid = (F.size(parts) == 4) & s.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
        octets = [F.try_element_at(parts, F.lit(i + 1)).try_cast("long") for i in range(4)]
        in_range = F.lit(True)
        for o in octets:
            in_range = in_range & o.isNotNull() & (o >= 0) & (o <= 255)
        num = octets[0] * 16777216 + octets[1] * 65536 + octets[2] * 256 + octets[3]
        return F.when(valid & in_range, num)

    def fn(ref: ValueRef) -> Column:
        from ..core.errors import concat_violations

        parts = []
        for jp, ranges, raw in compiled:
            target = resolve(ref, jp)
            num = ip_to_long(target.str_of())
            ok = F.lit(False)
            for lo, hi in ranges:
                ok = ok | ((num >= lo) & (num <= hi))
            ok = F.coalesce(ok, F.lit(False))  # unparseable ip fails
            parts.append(viol_when(~ok, f"$.{jp}", " ip should be within " + go_v(raw)))
        return concat_violations(*parts)

    return FnRule(fn)
