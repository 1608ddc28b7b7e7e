"""End-to-end training-data curation example.

The composed pass a pretraining-data build runs over a raw document
corpus, using only this repo's operators:

  raw documents
    → quality/lang/dedup keep-decision   (operators.curation)
    → PII redaction on the survivors     (operators.textclean)
    → per-source mixing weights          (operators.corpus)
    → curated parquet, partitioned by predicted language and bucketed
      on doc_id for downstream shuffle-free joins (sinks.dataset)

Run:  python examples/curation_pipeline.py [sf_dir] [out_dir]

Defaults: sf_dir=/root/testdata/sf0.001, out_dir=/tmp/curated_corpus.
Everything is a lazy DataFrame plan until the single write — at 100 TB
the same script is one scan + one digest shuffle + one write.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from apitap_spark.operators.curation import op_corpus_curation  # noqa: E402
from apitap_spark.operators.corpus import op_mixing_weights  # noqa: E402
from apitap_spark.operators.textclean import scrub_pii  # noqa: E402
from apitap_spark.session import get_session, read_table  # noqa: E402
from apitap_spark.sinks.dataset import DatasetSpec, write_dataset  # noqa: E402


def curate(spark, sf_dir: str, out_dir: str):
    docs = read_table(spark, sf_dir, "documents")
    decisions = op_corpus_curation(spark, sf_dir)
    weights = op_mixing_weights(spark, sf_dir).select("source", "sample_weight")

    kept = (
        docs.join(decisions.filter("keep").select("doc_id", "predicted_lang"), "doc_id")
        .join(F.broadcast(weights), "source")
        .select(
            "doc_id",
            "source",
            F.col("predicted_lang").alias("lang"),
            "sample_weight",
            scrub_pii("text").alias("text"),
        )
    )
    spec = DatasetSpec(path=out_dir, partition_by=("lang",))
    write_dataset(kept, spec)
    return kept


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_session(app_name="curation-example")
    kept = curate(spark, sf_dir, out_dir)
    back = spark.read.parquet(out_dir)
    print(
        f"curated {back.count()} docs "
        f"({kept.select('lang').distinct().count()} languages) -> {out_dir}"
    )


if __name__ == "__main__":
    main()
