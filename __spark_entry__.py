"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query inventory lives in ``apitap_spark.plans`` (relational
SURVEY §2.2 coverage) and ``apitap_spark.operators`` (dedup /
similarity / text-analysis / multimodal operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q3-style shipping priority: 3-way join → decimal-exact revenue
    aggregation → top-k. Exercises scan, broadcast join, partial agg and
    TakeOrderedAndProject in one plan.
    """
    from apitap_spark.plans.relational import q3_shipping_priority

    return q3_shipping_priority(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from apitap_spark.plans.relational import QUERIES as REL

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(REL)
    try:
        from apitap_spark.operators import QUERIES as OPS

        out.update(OPS)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() key."""
    from apitap_spark.plans.relational import ORACLES as REL

    out: dict[str, str] = {}
    out.update(REL)
    try:
        from apitap_spark.operators import ORACLES as OPS

        out.update(OPS)
    except ImportError:
        pass
    return out
