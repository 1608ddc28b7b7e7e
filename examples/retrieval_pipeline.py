"""End-to-end retrieval-index example.

Builds the search-side artifacts for a document corpus and runs a
hybrid query, using only this repo's operators:

  documents + embeddings
    → inverted index (term → sorted postings)      (operators.textstats)
    → hashed TF vectors (feature hashing)           (operators.textstats)
    → PQ codebooks + codes (16x-compressed ANN)     (operators.similarity)
    → PQ asymmetric-distance top-k per query        (operators.similarity)
    → hybrid dense⊕sparse candidates via RRF        (operators.similarity)
    → top-k per query, written as one parquet dataset

Run:  python examples/retrieval_pipeline.py [sf_dir] [out_dir]
Defaults: sf_dir=/root/testdata/sf0.001, out_dir=/tmp/retrieval_index.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apitap_spark.operators.similarity import (  # noqa: E402
    op_hybrid_retrieval_rrf,
    pq_adc_topk,
    pq_build,
    pq_codes_frame,
)
from apitap_spark.session import read_table  # noqa: E402
from apitap_spark.operators.textstats import (  # noqa: E402
    inverted_index_frame,
    op_text_hashed_tf,
)
from apitap_spark.session import get_session  # noqa: E402


def build(spark, sf_dir: str, out_dir: str):
    index = inverted_index_frame(spark, sf_dir)  # raw array<bigint> postings
    vectors = op_text_hashed_tf(spark, sf_dir)
    results = op_hybrid_retrieval_rrf(spark, sf_dir)
    # ONE PQ codebook build feeds both the stored codes and the search —
    # the gate entries rebuild independently, a pipeline must not
    emb = read_table(spark, sf_dir, "embeddings")
    assigned, codebook = pq_build(emb)
    pq_codes = pq_codes_frame(assigned)
    pq_topk = pq_adc_topk(emb, assigned, codebook)
    index.write.mode("overwrite").parquet(f"{out_dir}/inverted_index")
    vectors.write.mode("overwrite").parquet(f"{out_dir}/hashed_tf")
    results.write.mode("overwrite").parquet(f"{out_dir}/hybrid_topk")
    pq_codes.write.mode("overwrite").parquet(f"{out_dir}/pq_codes")
    pq_topk.write.mode("overwrite").parquet(f"{out_dir}/pq_topk")
    return index, vectors, results


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/retrieval_index"
    spark = get_session(app_name="retrieval-example")
    index, vectors, results = build(spark, sf_dir, out_dir)
    print(
        f"indexed {index.count()} terms, {vectors.count()} tf entries; "
        f"hybrid top-k rows: {results.count()} -> {out_dir}"
    )


if __name__ == "__main__":
    main()
