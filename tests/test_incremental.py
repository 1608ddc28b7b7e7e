"""Incremental dedup: classification semantics on a crafted corpus, and
the bucketed signature-store layout joining with no store-side shuffle."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from apitap_spark.operators.incremental import (
    build_signature_store,
    incremental_exact,
)
from apitap_spark.sinks.dataset import DatasetSpec, read_dataset, write_dataset


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_exact_classification(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox"),
            (2, "lorem ipsum dolor"),
            (3, "  The   quick brown fox  ".lower()),  # dup of 1 after norm
        ],
    )
    batch = _docs(
        spark,
        [
            (10, "the quick brown fox"),  # corpus_dup -> canonical 1
            (11, "completely new text"),  # unique
            (12, "completely new text"),  # batch_dup -> canonical 11
            (13, "another new one"),  # unique
        ],
    )
    store = build_signature_store(corpus)
    got = {
        r["doc_id"]: (r["status"], r["canonical_doc_id"])
        for r in incremental_exact(batch, store).collect()
    }
    assert got == {
        10: ("corpus_dup", 1),
        11: ("unique", 11),
        12: ("batch_dup", 11),
        13: ("unique", 13),
    }


def test_signature_store_one_row_per_text(spark):
    corpus = _docs(
        spark, [(5, "aaa bbb"), (9, "aaa   bbb"), (7, "ccc")]
    )
    store = build_signature_store(corpus)
    rows = store.collect()
    assert len(rows) == 2
    assert {r["canonical_doc_id"] for r in rows} == {5, 7}


def test_bucketed_store_joins_without_store_shuffle(spark, sf_dir):
    """The production layout: the signature store persisted bucketed on
    text_hash. The batch side must shuffle to meet it; the store side
    (the corpus-scale one) must come straight off its bucketed scan —
    exactly one Exchange in the whole join plan."""
    from apitap_spark.session import read_table

    d = tempfile.mkdtemp(prefix="apitap_store_")
    docs = read_table(spark, sf_dir, "documents")
    store = build_signature_store(docs.filter(F.col("doc_id") % 10 < 8))
    # One-sided bucketed joins only skip the bucketed side's shuffle when
    # the bucket count matches the join's partition count — the planner
    # re-shuffles a mismatched bucketed scan. Production guidance: bucket
    # the store at the shuffle parallelism the batch jobs run with.
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    spec = DatasetSpec(
        path=f"{d}/store",
        bucket_by=(n_buckets, "text_hash"),
        table_name="sig_store_test",
    )
    write_dataset(store, spec)
    try:
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        ):
            spark.conf.set(k, "-1")
        stored = read_dataset(spark, spec)
        batch = docs.filter(F.col("doc_id") % 10 >= 8)
        out = incremental_exact(batch, stored)
        plan = out._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange hashpartitioning")
        # batch groupBy + batch join side shuffle; the store side never does
        assert n_exchanges <= 2, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        got = {r["doc_id"]: r["status"] for r in out.collect()}
        # oracle parity with the self-contained gate
        from apitap_spark.operators.incremental import op_dedup_incremental

        want = {
            r["doc_id"]: r["status"]
            for r in op_dedup_incremental(spark, sf_dir).collect()
        }
        assert got == want
    finally:
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        ):
            spark.conf.unset(k)
        spark.sql("DROP TABLE IF EXISTS sig_store_test")
        shutil.rmtree(d, ignore_errors=True)
