"""Dataset writer: layout properties that matter at 100 TB, asserted on
the physical plan — partition pruning reaches the scan, bucketed joins
run with zero Exchange, file sizing bounds split sizes."""

from __future__ import annotations

import shutil
import tempfile
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from apitap_spark.session import read_table
from apitap_spark.sinks.dataset import DatasetSpec, read_dataset, write_dataset


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="apitap_ds_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@contextmanager
def _no_broadcast(spark):
    """Test-SF tables fit under the broadcast threshold, which would hide
    the property under test (a broadcast join has no Exchange either way).
    Forcing the non-broadcast strategy shows what a 100 TB-sized join
    would do: consume both bucketed scans with zero Exchange."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_partitioned_write_prunes(spark, sf_dir, tmpdir):
    ev = read_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    spec = DatasetSpec(path=tmpdir, partition_by=("day",), sort_by=("user_id",))
    man = write_dataset(ev, spec)
    assert man.n_files > 0 and man.total_bytes > 0
    assert man.partitions, "expected hive-style day=... partition dirs"

    back = read_dataset(spark, spec)
    assert back.count() == ev.count()

    one_day = sorted(p.split("=")[1] for p in man.partitions)[0]
    q = back.filter(F.col("day") == one_day)
    plan = q.queryExecution if False else q._jdf.queryExecution().toString()
    # the day filter must prune at the partition level, not post-scan
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:200]


def test_bucketed_join_no_shuffle(spark, sf_dir, tmpdir):
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    so = DatasetSpec(
        path=f"{tmpdir}/orders_b",
        bucket_by=(8, "o_orderkey"),
        sort_by=("o_orderkey",),
        table_name="orders_bucketed",
    )
    sl = DatasetSpec(
        path=f"{tmpdir}/lineitem_b",
        bucket_by=(8, "l_orderkey"),
        sort_by=("l_orderkey",),
        table_name="lineitem_bucketed",
    )
    write_dataset(orders, so)
    write_dataset(li, sl)
    try:
        with _no_broadcast(spark):
            a = read_dataset(spark, so)
            b = read_dataset(spark, sl)
            joined = a.join(b, a.o_orderkey == b.l_orderkey)
            plan = _plan(joined)
            # co-located layout: the sort-merge join consumes both bucketed
            # scans directly — no Exchange anywhere in the plan
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            assert "Exchange" not in plan, plan
            # same answer as the shuffled join over the raw tables
            expected = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
            assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_bucketed_groupby_no_shuffle(spark, sf_dir, tmpdir):
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    spec = DatasetSpec(
        path=f"{tmpdir}/li_b",
        bucket_by=(8, "l_orderkey"),
        table_name="li_bucketed_agg",
    )
    write_dataset(li, spec)
    try:
        agg = (
            read_dataset(spark, spec)
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = _plan(agg)
        assert "Exchange" not in plan, plan
        assert agg.count() == li.select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed_agg")


def test_max_records_per_file(spark, sf_dir, tmpdir):
    docs = read_table(spark, sf_dir, "documents").coalesce(1)
    n = docs.count()
    spec = DatasetSpec(path=tmpdir, max_records_per_file=max(1, n // 4))
    man = write_dataset(docs, spec)
    # one input task, but file sizing still splits the output
    assert man.n_files >= 4
    back = read_dataset(spark, spec)
    assert back.count() == n


def test_spec_validation():
    with pytest.raises(ValueError):
        DatasetSpec(path="/x", bucket_by=(8, "k"))  # no table_name
    with pytest.raises(ValueError):
        DatasetSpec(
            path="/x", bucket_by=(8, "k"), partition_by=("p",), table_name="t"
        )
