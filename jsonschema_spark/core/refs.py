"""Value references: where a compiled rule reads its input from.

The reference walks a dynamic ``map[string]interface{}`` tree one
document at a time; here a "document" is one DataFrame row with a fixed
StructType.  A ``ValueRef`` carries (column-expression, static dtype,
$-rooted error path) and knows how to descend into struct fields, map
entries and array elements — the Spark-native analog of the reference's
jsonpath addressing layer (/root/reference/jsonpath/jsonpath.go,
easy_jsonpath.go:86-212).

Because Spark schemas are static, field *absence* splits into two
cases the dynamic reference merged:
  - field not in the StructType  -> statically missing (exists=False)
  - field null in this row       -> runtime missing (isNull)
`required` fails on either; most other validators skip both (the
reference's null-skip fast paths, validator_base.go:180-183, 461-463).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .variant import variant_child as _variant_child


@dataclass
class ValueRef:
    col: Column | None  # None => the root row (whole document)
    dtype: T.DataType | None  # None => unknown (dynamic map value / missing)
    path: str = "$"  # $-rooted dotted path for error messages
    exists: bool = True  # statically present in the schema?
    is_root: bool = False
    # lambda-scope bindings (foreach's __key/__val, foreach.go:22-32):
    # consulted by child() before the static schema lookup
    bindings: dict | None = None

    def null(self) -> Column:
        """Runtime 'value missing' predicate (never true for the root)."""
        if self.is_root and self.col is None:
            return F.lit(False)
        if not self.exists:
            return F.lit(True)
        if isinstance(self.dtype, T.VariantType):
            # a Variant encoding JSON null is runtime-missing for every
            # validator except `required`/`dependencies` (which read
            # map-key presence — the reference's m[key] lookup finds a
            # nil entry; use missing() there)
            return self.col.isNull() | F.is_variant_null(self.col)
        return self.col.isNull()

    def missing(self) -> Column:
        """Key-ABSENCE predicate (`m[key]` lookup, required/
        dependencies, validator_base.go:500-512): unlike null(), a
        present key holding JSON null is NOT missing.  Distinguishable
        only on Variant columns (try_variant_get: absent key -> SQL
        NULL, present null -> variant-null); fixed struct columns merge
        the two (documented static divergence, refs.py module doc)."""
        if self.is_root and self.col is None:
            return F.lit(False)
        if not self.exists:
            return F.lit(True)
        return self.col.isNull()

    def present(self) -> Column:
        if self.is_root:
            return F.lit(True)
        if not self.exists:
            return F.lit(False)
        return self.col.isNotNull()

    def child(self, name: str) -> "ValueRef":
        """Descend one object key (reference Properties walk,
        validator_core.go:407-487)."""
        child_path = f"{self.path}.{name}"
        if self.bindings and name in self.bindings:
            return replace(self.bindings[name], path=child_path)
        if isinstance(self.dtype, T.VariantType):
            # variant parent (incl. a variant ROOT document): binary
            # path walk; absent key -> SQL NULL, present JSON null ->
            # variant-null (required semantics preserved)
            return ValueRef(
                _variant_child(self.col, name), T.VariantType(), child_path
            )
        if self.is_root:
            dt = None
            found = False
            if isinstance(self.dtype, T.StructType):
                for f_ in self.dtype.fields:
                    if f_.name == name:
                        dt, found = f_.dataType, True
                        break
            if not found:
                return ValueRef(F.lit(None), None, child_path, exists=False)
            return ValueRef(F.col(name), dt, child_path)
        if isinstance(self.dtype, T.StructType):
            for f_ in self.dtype.fields:
                if f_.name == name:
                    return ValueRef(self.col.getField(name), f_.dataType, child_path)
            return ValueRef(F.lit(None), None, child_path, exists=False)
        if isinstance(self.dtype, T.MapType):
            return ValueRef(
                F.try_element_at(self.col, F.lit(name)), self.dtype.valueType, child_path
            )
        # scalar parent: child can't exist
        return ValueRef(F.lit(None), None, child_path, exists=False)

    def index(self, i: int) -> "ValueRef":
        child_path = f"{self.path}[{i}]"
        if isinstance(self.dtype, T.ArrayType):
            return ValueRef(
                F.try_element_at(self.col, F.lit(i + 1)), self.dtype.elementType, child_path
            )
        if isinstance(self.dtype, T.VariantType):
            return ValueRef(
                F.try_variant_get(self.col, f"$[{i}]", "variant"),
                T.VariantType(),
                child_path,
            )
        return ValueRef(F.lit(None), None, child_path, exists=False)

    def element(self, lam_var: Column) -> "ValueRef":
        """The per-element ref inside a higher-order-function lambda
        (reference Items path suffix '[*]', validator_base.go:646-650)."""
        elem_dt = (
            self.dtype.elementType if isinstance(self.dtype, T.ArrayType) else None
        )
        return ValueRef(lam_var, elem_dt, f"{self.path}[*]")

    def with_path(self, path: str) -> "ValueRef":
        return replace(self, path=path)


_SEG = re.compile(r"\.|\[(\d+)\]")


def split_path(path: str) -> list[str | int]:
    """Split a jsonpath-lite string ('a.b[0].c', optionally '$.'-rooted)
    into segments; ints are array indices.  Escaped dots ('\\.')
    supported as in easy_jsonpath.go:86-130."""
    if path.startswith("$"):
        path = path[1:]
    if path.startswith("."):
        path = path[1:]
    segs: list[str | int] = []
    buf = ""
    i = 0
    while i < len(path):
        ch = path[i]
        if ch == "\\" and i + 1 < len(path):
            buf += path[i + 1]
            i += 2
            continue
        if ch == ".":
            if buf:
                segs.append(buf)
                buf = ""
            i += 1
            continue
        if ch == "[":
            j = path.index("]", i)
            if buf:
                segs.append(buf)
                buf = ""
            segs.append(int(path[i + 1 : j]))
            i = j + 1
            continue
        buf += ch
        i += 1
    if buf:
        segs.append(buf)
    return segs


_DYN = re.compile(r"^\$\{(.+)\}$")


def resolve(root: ValueRef, path: str) -> ValueRef:
    """Resolve a jsonpath-lite string from the root document ref.

    ``${var}`` segments are INDIRECT keys (jsonpath.go:452-481): the key
    is the runtime value of another document path.  Static structs
    cannot be indexed dynamically, so indirect segments require the
    parent to be a MapType column."""
    ref = root
    for seg in split_path(path):
        if isinstance(seg, int):
            ref = ref.index(seg)
            continue
        m = _DYN.match(seg)
        if m:
            key_ref = resolve(root, m.group(1))
            if isinstance(ref.dtype, T.VariantType):
                from .variant import variant_object, variant_string_of

                ref = ValueRef(
                    F.try_element_at(
                        variant_object(ref.col), variant_string_of(key_ref.col)
                        if isinstance(key_ref.dtype, T.VariantType)
                        else key_ref.col.cast("string")
                    ),
                    T.VariantType(),
                    f"{ref.path}.${{{m.group(1)}}}",
                )
            elif isinstance(ref.dtype, T.MapType):
                ref = ValueRef(
                    F.try_element_at(
                        ref.col, key_ref.col.cast(ref.dtype.keyType)
                    ),
                    ref.dtype.valueType,
                    f"{ref.path}.${{{m.group(1)}}}",
                )
            else:
                # dynamic key on a fixed struct: statically unresolvable
                ref = ValueRef(
                    F.lit(None), None, f"{ref.path}.${{{m.group(1)}}}", exists=False
                )
            continue
        ref = ref.child(seg)
    return ref
