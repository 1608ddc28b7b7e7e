"""Property-based tests (hypothesis) for the pure logic: inference lattice,
identifier quoting, data_path drill, chunk sizing. The reference admits
"no property-based tests" (SURVEY §5) — this closes that gap."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from apitap_spark.sinks.jdbc_merge import quote_ident, rows_per_statement
from apitap_spark.sources.http import drill_data_path
from apitap_spark.sources.schema import _merge, infer_schema_simple

TYPES = st.sampled_from([None, "boolean", "bigint", "double", "string"])

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
)


@given(a=TYPES, b=TYPES)
def test_merge_commutative(a, b):
    assert _merge(a, b) == _merge(b, a)


@given(a=TYPES, b=TYPES, c=TYPES)
def test_merge_associative(a, b, c):
    assert _merge(_merge(a, b), c) == _merge(a, _merge(b, c))


@given(a=TYPES)
def test_merge_idempotent(a):
    assert _merge(a, a) == a


@given(
    rows=st.lists(
        st.dictionaries(
            st.text(min_size=1, max_size=8).filter(lambda s: s.isidentifier()),
            json_scalars,
            max_size=5,
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=50)
def test_inference_total_and_order_stable(rows):
    """Inference never crashes on object rows; field order follows first
    appearance; all fields nullable."""
    schema = infer_schema_simple(rows)
    seen = []
    for r in rows:
        for k in r:
            if k not in seen:
                seen.append(k)
    assert [f.name for f in schema.fields] == seen
    assert all(f.nullable for f in schema.fields)


@given(name=st.text(min_size=1, max_size=30))
def test_quote_ident_always_balanced(name):
    q = quote_ident(name)
    assert q.startswith('"') and q.endswith('"')
    # unquoting inverts quoting
    assert q[1:-1].replace('""', '"') == name


@given(n_cols=st.integers(min_value=1, max_value=10_000), batch=st.integers(min_value=1, max_value=100_000))
def test_rows_per_statement_respects_param_limit(n_cols, batch):
    r = rows_per_statement(n_cols, batch)
    assert 1 <= r <= batch
    assert r * n_cols <= 65535 or r == 1


@given(
    doc=st.recursive(
        json_scalars,
        lambda children: st.one_of(
            st.lists(children, max_size=4),
            st.dictionaries(st.text(max_size=5), children, max_size=4),
        ),
        max_leaves=20,
    ),
    path=st.lists(st.text(min_size=1, max_size=5), max_size=3),
)
@settings(max_examples=100)
def test_drill_never_crashes_and_rows_are_listy(doc, path):
    rows = drill_data_path(doc, "/" + "/".join(path) if path else None)
    assert isinstance(rows, list)
    # row-flattening invariant: a list drills to its elements, null to []
    if not path:
        if doc is None:
            assert rows == []
        elif isinstance(doc, list):
            assert rows == doc
        else:
            assert rows == [doc]


@given(
    rows=st.lists(
        st.dictionaries(st.sampled_from(["a", "b", "c"]), json_scalars, max_size=3),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=50)
def test_inference_json_roundtrip_parseable(rows):
    """Whatever we infer, the rows serialize to JSON that matches the
    declared flat types after coercion."""
    from apitap_spark.sources.schema import coerce_row

    schema = infer_schema_simple(rows)
    for r in rows:
        tup = coerce_row(r, schema)
        assert len(tup) == len(schema.fields)
        json.dumps(tup)  # all values JSON-serializable
