"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The real engine treats images/audio/video as ``binary`` columns with typed
metadata and runs decode / feature-extract as Arrow-batched Pandas UDFs via
``mapInPandas`` — that Spark-side plumbing (schema, batching, partitioning,
UDF signature) is implemented and tested here. The codec itself is STUBBED:
this container has no image/audio libraries, so ``decode_image`` raises
``NotImplementedError`` and the feature extractor computes deterministic
byte-level features instead, keeping the pipeline runnable and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apitap_spark.session import read_table

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def decode_image(payload: bytes) -> object:
    """STUB — real deployment plugs Pillow/torchvision/ffmpeg here.

    Raises so nothing silently pretends to decode pixels; the pipeline
    exercises the binary plumbing with byte-level features instead.
    """
    raise NotImplementedError(
        "image/audio decode requires codec libraries not present in this "
        "environment; byte-level features are computed instead"
    )


FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, head_byte bigint, tail_byte bigint, "
    "mean_byte double, modality string"
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over (doc_id, payload) frames.

    Shape of a real extractor: per Arrow batch, vectorize over rows,
    emit fixed-schema frames. Deterministic byte statistics stand in for
    decoded features (see decode_image stub).
    """
    for pdf in batches:
        payloads = pdf["payload"]
        n = payloads.str.len().astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n,
                "head_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int64"),
                "tail_byte": payloads.map(lambda b: b[-1] if len(b) else -1).astype("int64"),
                "mean_byte": payloads.map(
                    lambda b: round(sum(b) / len(b), 6) if len(b) else 0.0
                ).astype("float64"),
                "modality": "binary/text-stub",
            }
        )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column + typed metadata struct.

    In production this is the parquet/lance binary column as stored; here
    the documents' text bytes stand in so the plumbing runs end-to-end.
    """
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length("text").alias("size_bytes"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


@_register("op_multimodal_features")  # Pandas-UDF path → rows-only driver check
def op_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via mapInPandas (Arrow batches).

    Plan shape at scale: narrow transformation — no shuffle at all; each
    executor streams Arrow batches through the Python worker. Partition
    sizing governs Python memory: repartition upstream if payloads are
    large (images), never collect.
    """
    docs = read_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs).select("doc_id", "payload")
    return payloads.mapInPandas(_extract_features, schema=FEATURE_SCHEMA)


@_register(
    "op_multimodal_metadata",
    """
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
           source AS origin
    FROM documents
    """,
)
def op_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata projection of the binary column (oracle-checkable
    half of the multimodal path — byte sizes must agree exactly)."""
    docs = read_table(spark, sf_dir, "documents")
    m = with_binary_payload(docs)
    return m.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.size_bytes").cast("bigint").alias("size_bytes"),
        F.col("media_meta.origin").alias("origin"),
    )
