"""Dynamic JSON-string-column validation — the STATIC (inferred-
struct) parse mode.

The reference's entire input domain is an arbitrary JSON document —
``Schema.Validate`` accepts ``[]byte``/``string`` and walks the decoded
``interface{}`` tree (/root/reference/schema.go:121-138, type dispatch
type.go:3-20).  Two Spark-native mappings exist; the DEFAULT is the
VariantType path (core/variant.py + the per-keyword variant branches):
one ``try_parse_json`` into Spark 4's binary semi-structured encoding,
with every keyword dispatching on the per-row runtime JSON type — the
faithful replica of the reference's ``switch value.(type)``.  This
module implements the opt-in ``json_types="static"`` fast path:

  1. **Infer a Spark type from the schema document itself** — the
     document's ``type``/``properties``/``items``/``enum`` keywords
     pin down the shape the rules can see, exactly the fields a
     projection would prune to.  Unknown shapes degrade to
     ``map<string,string>`` (the dynamic-key path ValueRef already
     supports).
  2. **Parse ONCE** with ``F.from_json`` (JVM Jackson — no Python in
     the row path; at 100 TB the parse fuses into the same
     whole-stage-codegen projection as the rules).
  3. **Reuse the existing keyword compiler unchanged** against the
     parsed struct: a ``ValueRef`` rooted at the parsed column walks
     struct fields/array elements/map entries exactly like a fixed
     table column.

Malformed documents (``from_json`` → NULL on a non-null input) yield a
single ``$`` violation, mirroring the reference's decode error
(schema.go:127-131 returns the json.Unmarshal error before any rule
runs).

Static-mode divergence (why it is not the default): inside a JSON
column a value of the *wrong* type parses to NULL in PERMISSIVE mode,
so bare ``type`` assertions are enforced structurally by the parse — a
wrong-typed required field surfaces as "field is required" rather than
the reference's type error, and type unions collapse to their first
branch.  The default variant mode has neither divergence; choose
static only when the documents are known well-typed and the last few
percent of parse throughput matter.
"""

from __future__ import annotations

from pyspark.sql import types as T

_NUMERIC_KEYWORDS = (
    "minimum",
    "maximum",
    "exclusiveMinimum",
    "exclusiveMaximum",
    "multipleOf",
)
_STRING_KEYWORDS = ("pattern", "format", "maxLength", "minLength",
                    "maxB64DLen", "minB64DLen", "startWith", "endWith",
                    "contains")


def _type_name(doc: dict) -> str | None:
    t = doc.get("type")
    if isinstance(t, list):
        t = t[0] if t else None
    if isinstance(t, str):
        # union "string|integer": the first named type wins — a static
        # column can hold one type; coercing keywords handle the rest
        return t.split("|")[0].strip().lower()
    return None


def _literal_type(v) -> T.DataType:
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, dict):
        return T.MapType(T.StringType(), T.StringType())
    if isinstance(v, list):
        et = _literal_type(v[0]) if v else T.StringType()
        return T.ArrayType(et)
    return T.StringType()


def infer_datatype(doc) -> T.DataType:
    """Spark type for one schema node (GenerateSchema's inverse — the
    reference generates schema FROM Go types, generate.go; here we
    generate the Spark type FROM the schema document)."""
    if not isinstance(doc, dict):
        return T.StringType()
    props = doc.get("properties") or doc.get("props")
    t = _type_name(doc)
    if (t in (None, "object")) and (
        isinstance(props, dict) or isinstance(doc.get("required"), list)
    ):
        # required-only nodes (common in case/if branches) still shape a
        # struct: each required key needs a slot for `required` to fire
        st = _struct_of(doc)
        bs = _branch_struct(doc)
        return _merge_structs(st, bs) if bs is not None else st
    if t in (None, "array") and "items" in doc:
        items = doc["items"]
        if isinstance(items, list):  # tuple form: element = first schema
            items = items[0] if items else {}
        return T.ArrayType(infer_datatype(items))
    if t == "string":
        return T.StringType()
    if t in ("integer",):
        return T.LongType()
    if t in ("number",):
        return T.DoubleType()
    if t in ("boolean", "bool"):
        return T.BooleanType()
    if t == "object":
        return T.MapType(T.StringType(), T.StringType())
    if t == "array":
        return T.ArrayType(T.StringType())
    # combinator branches contribute their fields (allOf/anyOf/if-then
    # documents with no top-level properties are common reference usage)
    bs = _branch_struct(doc)
    if bs is not None:
        return bs
    # no explicit type: infer from constraining keywords
    enum = doc.get("enum") or doc.get("enums")
    if isinstance(enum, list) and enum:
        return _literal_type(enum[0])
    if "const" in doc:
        return _literal_type(doc["const"])
    if any(k in doc for k in _NUMERIC_KEYWORDS):
        return T.DoubleType()
    if any(k in doc for k in _STRING_KEYWORDS):
        return T.StringType()
    return T.StringType()


def _struct_of(doc: dict) -> T.StructType:
    props = doc.get("properties") or doc.get("props") or {}
    fields = [
        T.StructField(name, infer_datatype(sub), True)
        for name, sub in props.items()
    ]
    seen = {f.name for f in fields}
    # required-only keys (no properties entry) still need a slot so
    # `required` can observe runtime absence
    req = doc.get("required")
    if isinstance(req, list):
        for k in req:
            if isinstance(k, str) and k not in seen:
                fields.append(T.StructField(k, T.StringType(), True))
                seen.add(k)
    return T.StructType(fields)


def _branch_struct(doc: dict) -> T.StructType | None:
    """Merged struct contributed by combinator branches, or None."""
    branches: list = []
    for kw in ("allOf", "and", "anyOf", "or", "oneOf"):
        sub = doc.get(kw)
        if isinstance(sub, list):
            branches.extend(sub)
    for kw in ("if", "then", "else"):
        if isinstance(doc.get(kw), dict):
            branches.append(doc[kw])
    if isinstance(doc.get("case"), dict):
        branches.extend(v for v in doc["case"].values() if isinstance(v, dict))
    merged: T.StructType | None = None
    for b in branches:
        bt = infer_datatype(b)
        if isinstance(bt, T.StructType):
            merged = bt if merged is None else _merge_structs(merged, bt)
    return merged


def _merge_structs(a: T.StructType, b: T.StructType) -> T.StructType:
    """Field-wise union; on a name collision the first branch's type
    wins (coercing keyword semantics absorb the difference)."""
    fields = list(a.fields)
    seen = {f.name for f in fields}
    for f in b.fields:
        if f.name not in seen:
            fields.append(f)
            seen.add(f.name)
    return T.StructType(fields)


def infer_root_type(doc) -> T.DataType:
    """The parse target for a whole JSON document column.  Object-shaped
    documents get the inferred struct; everything else degrades to the
    dynamic map<string,string> the ValueRef map path supports."""
    if isinstance(doc, list):
        doc = {"allOf": doc}
    dt = infer_datatype(doc) if isinstance(doc, dict) else None
    if isinstance(dt, (T.StructType, T.MapType, T.ArrayType)):
        return dt
    return T.MapType(T.StringType(), T.StringType())
