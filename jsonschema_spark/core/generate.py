"""Schema-document generation from a table schema — the Spark-native
analog of the reference's Go-struct reflection entry point
(``GenerateSchema``, /root/reference/reflect.go:30-53: struct tags →
schema map → NewSchema; registry schema.go:174-202).

A Go struct with tags becomes here a ``StructType`` whose field
metadata carries the same constraint tags the reference parses
(reflect.go:63-420: enum, maximum, minimum, maxLength, minLength,
default, pattern, format, multipleOf, maxItems, minItems, uniqueItems,
required)::

    StructField("role", StringType(), True,
                metadata={"enum": ["user", "assistant"], "required": True})

plus a named registry so call sites validate by name the way the
reference validates by reflect.Type.
"""

from __future__ import annotations

from pyspark.sql import types as T

from ..plans.compiler import CompiledSchema, compile_schema

_TAGS = (
    "enum", "maximum", "minimum", "maxLength", "minLength", "default",
    "defaultVal", "pattern", "format", "multipleOf", "maxItems",
    "minItems", "uniqueItems", "exclusiveMaximum", "exclusiveMinimum",
)


def _type_name(dt: T.DataType) -> str | None:
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return "integer"
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return "number"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, (T.StructType, T.MapType)):
        return "object"
    return None  # timestamps etc: type left unconstrained (string-ish)


def generate_schema_doc(schema: T.StructType) -> dict:
    """StructType (+ field metadata tags) → schema document.  Non-null
    fields become ``required``; metadata tags pass through verbatim."""
    props: dict = {}
    required: list[str] = []
    for f in schema.fields:
        sub: dict = {}
        tn = _type_name(f.dataType)
        if tn:
            sub["type"] = tn
        md = f.metadata or {}
        for tag in _TAGS:
            if tag in md:
                sub[tag] = md[tag]
        if md.get("required") or not f.nullable:
            required.append(f.name)
        if isinstance(f.dataType, T.StructType):
            inner = generate_schema_doc(f.dataType)
            sub.update(inner)
        props[f.name] = sub
    doc: dict = {"properties": props}
    if required:
        doc["required"] = required
    return doc


def generate_schema(schema: T.StructType) -> CompiledSchema:
    """GenerateSchema analog: table schema → compiled plan."""
    return compile_schema(generate_schema_doc(schema))


# named registry (reference: keyed by reflect.Type, schema.go:174-202;
# names replace Go types in a dynamic language)
_REGISTRY: dict[str, CompiledSchema] = {}


def register_schema(name: str, doc_or_schema) -> CompiledSchema:
    if isinstance(doc_or_schema, T.StructType):
        plan = generate_schema(doc_or_schema)
    elif isinstance(doc_or_schema, CompiledSchema):
        plan = doc_or_schema
    else:
        plan = compile_schema(doc_or_schema)
    _REGISTRY[name] = plan
    return plan


def get_schema(name: str) -> CompiledSchema:
    plan = _REGISTRY.get(name)
    if plan is None:
        raise KeyError(f"no schema registered for: {name}")
    return plan


def validate(name: str, df):
    """Global Validate() analog (schema.go:192-198)."""
    return get_schema(name).validate(df)
