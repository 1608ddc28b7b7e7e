"""End-to-end: every queries() entry matches its DuckDB oracle (driver replica)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_connection

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    if name not in oracles:
        assert sdf.count() >= 0  # rows-only path
        return
    cur = duck.execute(oracles[name])
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    res = compare(name, sdf, (o_rows, o_cols))
    assert res.ok, f"{name}: {res.issues} (max_float_delta={res.max_float_delta})"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
