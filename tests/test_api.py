"""Library one-shot API tests (reference entry point C, SURVEY §3.3)."""

from __future__ import annotations

import pytest

from apitap_spark.api import json_sql, json_to_df

USERS = [
    {"id": 1, "name": "Alice", "active": True, "score": 95.5, "email": None},
    {"id": 2, "name": "Bob", "active": False, "score": 87, "email": "bob@example.com"},
]


def test_json_to_df_inference(spark):
    df = json_to_df(spark, USERS)
    types = dict(df.dtypes)
    assert types == {
        "id": "bigint",
        "name": "string",
        "active": "boolean",
        "score": "double",  # 95.5 ⊔ 87 widens
        "email": "string",
    }
    assert df.count() == 2


def test_json_sql_roundtrip(spark):
    with json_sql(
        spark, USERS, "users", "SELECT id, name FROM {users} WHERE active"
    ) as res:
        assert res.to_vec() == [{"id": 1, "name": "Alice"}]
        assert res.to_json() == ['{"id":1,"name":"Alice"}']
        assert list(res.to_stream()) == [{"id": 1, "name": "Alice"}]
        view = res.view
        assert spark.catalog.tableExists(view)
    assert not spark.catalog.tableExists(view)  # RAII-style deregister


def test_json_sql_requires_placeholder(spark):
    with pytest.raises(ValueError, match="placeholder|\\{users\\}"):
        json_sql(spark, USERS, "users", "SELECT * FROM users")


def test_json_sql_substring_safe(spark):
    """A column sharing the table's name as a prefix must survive —
    the reference's replace() would corrupt it (SURVEY §7.4)."""
    rows = [{"users_count": 5}]
    with json_sql(spark, rows, "users", "SELECT users_count FROM {users}") as res:
        assert res.to_vec() == [{"users_count": 5}]


def test_json_single_object(spark):
    df = json_to_df(spark, {"a": 1})
    assert df.collect()[0]["a"] == 1
