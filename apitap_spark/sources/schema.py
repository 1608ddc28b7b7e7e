"""Driver-side JSON schema inference without a SparkSession.

Mirrors the reference's streaming inferencer semantics
(``src/utils/schema.rs:10-129``): JSON → {Boolean, Int64, Float64, Utf8},
arrays/objects serialize to strings, widening lattice
Int64 ⊔ Float64 = Float64 and anything ⊔ Utf8 = Utf8, ≤sample-size cutoff,
all fields nullable. Used by the Python DataSource API, whose ``schema()``
hook runs before any Spark context is available to the source.

(The richer nested inference — structs/arrays preserved — lives in
``HttpSource.infer_schema`` via Spark's JSON reader, matching the
reference's serde_arrow path, SURVEY §1.2a.)
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

_BOTTOM = "string"
_ORDER = {"boolean": 0, "bigint": 1, "double": 2, "string": 3}


def _type_of(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "bigint"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "string"
    return _BOTTOM  # arrays/objects stringify (reference schema.rs:58-66)


def _merge(a: str | None, b: str | None) -> str | None:
    """Widening lattice (reference schema.rs:106-129)."""
    if a is None:
        return b
    if b is None or a == b:
        return a
    if {a, b} == {"bigint", "double"}:
        return "double"
    return _BOTTOM


def infer_schema_simple(rows: list[dict], sample_size: int = 100) -> T.StructType:
    """Infer a flat StructType from ≤sample_size JSON objects.

    Raises ValueError on an empty sample or non-object rows (the reference
    errors identically, schema.rs tests)."""
    sample = rows[:sample_size]
    if not sample:
        raise ValueError("cannot infer schema from an empty sample")
    merged: dict[str, str | None] = {}
    order: list[str] = []
    for row in sample:
        if not isinstance(row, dict):
            raise ValueError(f"expected JSON objects, got {type(row).__name__}")
        for k, v in row.items():
            if k not in merged:
                merged[k] = None
                order.append(k)
            merged[k] = _merge(merged[k], _type_of(v))
    fields = [
        T.StructField(k, _spark_type(merged[k] or _BOTTOM), nullable=True)
        for k in order
    ]
    return T.StructType(fields)


def _spark_type(name: str) -> T.DataType:
    return {
        "boolean": T.BooleanType(),
        "bigint": T.LongType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
    }[name]


def coerce_row(row: dict, schema: T.StructType) -> tuple:
    """Render one JSON object as a tuple in schema order, stringifying
    nested values and mismatches leniently (reference bind coercions,
    src/writer/postgres.rs:775-851)."""
    out = []
    for f in schema.fields:
        v = row.get(f.name)
        if v is None:
            out.append(None)
        elif isinstance(f.dataType, T.BooleanType):
            out.append(bool(v) if not isinstance(v, str) else v.lower() in ("true", "1"))
        elif isinstance(f.dataType, T.LongType):
            out.append(int(v) if not isinstance(v, (dict, list)) else None)
        elif isinstance(f.dataType, T.DoubleType):
            out.append(float(v) if not isinstance(v, (dict, list)) else None)
        else:
            out.append(v if isinstance(v, str) else json.dumps(v))
    return tuple(out)
