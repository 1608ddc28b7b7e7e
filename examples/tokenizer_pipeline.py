"""End-to-end tokenizer-build + shard-planning example.

The batching side of a pretraining-data build, using only this repo's
operators:

  curated documents
    → BPE merge table learned from the corpus   (operators.bpe)
    → post-BPE per-doc token budgets            (operators.bpe, apply)
    → per-document token budget                 (functions.text.token_count)
    → token-balanced shard assignment           (operators.corpus.op_shard_plan)
    → packed fixed-length sequences per shard   (operators.corpus, packing)
    → shard manifest written as parquet

Run:  python examples/tokenizer_pipeline.py [sf_dir] [out_dir]

Defaults: sf_dir=/root/testdata/sf0.001, out_dir=/tmp/tokenizer_build.
The merge table is vocabulary-sized state (never corpus-sized); the
shard plan's prefix sum is the two-phase distributed formulation, so
the same script holds at 100 TB.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from apitap_spark.operators.bpe import (  # noqa: E402
    bpe_token_budgets,
    char_vocab,
    encode_with_vocab,
    learn_bpe_with_vocab,
    merges_frame,
    pack_rows_frame,
)
from apitap_spark.operators.corpus import op_shard_plan  # noqa: E402
from apitap_spark.session import get_session, read_table  # noqa: E402


def build(spark, sf_dir: str, out_dir: str):
    # ONE merge-learning pass feeds both the merge table and the budgets
    docs_nb = read_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    learned, final_vocab = learn_bpe_with_vocab(char_vocab(docs_nb), carry=("w",))
    merges = merges_frame(spark, learned)
    budgets = bpe_token_budgets(docs_nb, final_vocab)
    seqs, sym_ids = encode_with_vocab(docs_nb, final_vocab)
    packed = pack_rows_frame(seqs, sym_ids.count())
    plan = op_shard_plan(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    manifest = plan.join(docs, "doc_id").select(
        "shard", "doc_id", "n_tokens", "cum_tokens", F.length("text").alias("n_chars")
    )

    merges.write.mode("overwrite").parquet(os.path.join(out_dir, "bpe_merges"))
    budgets.write.mode("overwrite").parquet(os.path.join(out_dir, "token_budgets"))
    packed.write.mode("overwrite").parquet(os.path.join(out_dir, "training_rows"))
    (
        manifest.repartition("shard")
        .sortWithinPartitions("shard", "cum_tokens")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(out_dir, "shard_manifest"))
    )
    return merges, manifest


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/tokenizer_build"
    spark = get_session(app_name="tokenizer-build-example")
    spark.sparkContext.setLogLevel("ERROR")
    merges, manifest = build(spark, sf_dir, out_dir)
    n_shards = manifest.select("shard").distinct().count()
    print(f"learned {merges.count()} merges; planned {n_shards} shards -> {out_dir}")
    merges.show(12, truncate=False)


if __name__ == "__main__":
    main()
