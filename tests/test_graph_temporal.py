"""Unit tests for graph connected-components and the as-of join operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from apitap_spark.operators.graph import connected_components
from apitap_spark.operators.temporal import asof_join


def test_connected_components_basic(spark):
    nodes = spark.range(0).sql_ctx.sparkSession.createDataFrame(
        [(1,), (2,), (3,), (5,), (6,), (9,)], "v long"
    )
    edges = spark.createDataFrame([(2, 1), (2, 3), (5, 6)], "src long, dst long")
    got = {
        r["v"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9}


def test_connected_components_chain_converges(spark):
    # worst-case diameter: a 40-node chain must still converge via doubling
    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n)], "v long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = connected_components(nodes, edges, max_iter=10).collect()
    assert all(r["component"] == 0 for r in got)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_inclusive_and_left(spark):
    probe = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T10:00:00")),  # before any build -> NULLs
            (2, 100, _ts("2024-01-01T12:00:00")),  # equal ts -> inclusive match
            (3, 100, _ts("2024-01-01T13:00:00")),  # after -> latest prior
            (4, 200, _ts("2024-01-01T13:00:00")),  # other key, no build rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    build = spark.createDataFrame(
        [
            (100, _ts("2024-01-01T12:00:00"), 5.0),
            (100, _ts("2024-01-01T12:30:00"), 7.0),
        ],
        "user_id long, ts timestamp, val double",
    )
    got = {
        r["event_id"]: (r["match_ts"], r["val"])
        for r in asof_join(probe, build, on="user_id").collect()
    }
    assert got[1] == (None, None)
    assert got[2] == (_ts("2024-01-01T12:00:00"), 5.0)
    assert got[3] == (_ts("2024-01-01T12:30:00"), 7.0)
    assert got[4] == (None, None)
