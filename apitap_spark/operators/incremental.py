"""Incremental dedup: a NEW batch of documents against an EXISTING corpus.

The ingestion-time shape of dedup. A training-data pipeline never
re-deduplicates 100 TB from scratch when a crawl delivers a new slice;
it keeps a *signature store* (one row per distinct canonical document)
and answers, per new document: already in the corpus? a duplicate
inside the batch itself? or genuinely new?

Scale shape — the whole point of the incremental formulation:

* Work is proportional to the BATCH, not the corpus. The corpus enters
  only through its signature store (text_hash -> canonical doc_id; one
  row per *distinct* text, typically orders of magnitude smaller than
  the raw corpus, and never re-derived per batch).
* The store should live as a bucketed dataset on its hash column
  (apitap_spark.sinks.dataset.DatasetSpec(bucket_by=(N, "text_hash"))):
  then the store side of the join reads pre-partitioned with ZERO
  exchange and only the (small) batch shuffles. The gate below derives
  the store from the documents table because driver gates are
  read-only single-table; build_signature_store + incremental_exact
  are the production pieces.
* The near-dup rung reuses the SAME MinHash banding as the full-batch
  operator (dedup.minhash_band_buckets), so a stored bucket table is
  join-compatible across runs: new-batch buckets hash-join the store's
  buckets, candidates verify with exact Jaccard (false positives
  impossible, miss probability < 1e-7 at j=0.8 — identical guarantees
  to op_dedup_minhash_lsh).

No reference counterpart (the reference syncs API pages, it has no
corpus semantics); this extends SURVEY §2's dedup ladder to the
incremental axis. The gate's old/new split is doc_id % 10 (80/20),
mirrored exactly in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apitap_spark.functions.text import normalize_ws
from apitap_spark.operators.dedup import (
    _SQL_SHINGLES,
    _candidate_doc_shingles,
    _jaccard_pairs,
    gram_hash_rows,
    minhash_band_buckets,
)
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


# ---- production API ------------------------------------------------------


def build_signature_store(docs: DataFrame) -> DataFrame:
    """(text_hash, canonical_doc_id): one row per distinct normalized
    text — the persistent state of incremental exact dedup. Write it
    bucketed on text_hash (sinks.dataset) so every future batch joins
    it shuffle-free on the store side."""
    return docs.groupBy(F.md5(normalize_ws("text")).alias("text_hash")).agg(
        F.min("doc_id").alias("canonical_doc_id")
    )


def incremental_exact(batch: DataFrame, store: DataFrame) -> DataFrame:
    """Classify each batch document against the corpus signature store.

    Returns (doc_id, status, canonical_doc_id) where status is
    'corpus_dup' (hash exists in the store), 'batch_dup' (first seen
    inside this batch, but not by this row), or 'unique'. The canonical
    id is the store's doc for corpus dups, else the smallest batch doc
    sharing the hash. One groupBy over the batch + one join per side;
    the corpus never rescans."""
    hashed = batch.select(
        "doc_id", F.md5(normalize_ws("text")).alias("text_hash")
    )
    batch_canon = hashed.groupBy("text_hash").agg(
        F.min("doc_id").alias("batch_canonical")
    )
    joined = (
        hashed.join(batch_canon, "text_hash")
        .join(
            store.withColumnRenamed("canonical_doc_id", "store_canonical"),
            "text_hash",
            "left",
        )
    )
    status = (
        F.when(F.col("store_canonical").isNotNull(), "corpus_dup")
        .when(F.col("doc_id") != F.col("batch_canonical"), "batch_dup")
        .otherwise("unique")
    )
    return joined.select(
        "doc_id",
        status.alias("status"),
        F.coalesce("store_canonical", "batch_canonical").alias(
            "canonical_doc_id"
        ),
    )


# ---- driver gates --------------------------------------------------------

_OLD_PRED = "doc_id % 10 < 8"  # 80% corpus
_NEW_PRED = "doc_id % 10 >= 8"  # 20% incoming batch


@_register(
    "op_dedup_incremental",
    rf"""
    WITH hashed AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
      FROM documents
    ),
    store AS (
      SELECT h, MIN(doc_id) AS store_canonical
      FROM hashed WHERE {_OLD_PRED} GROUP BY h
    ),
    batch AS (SELECT * FROM hashed WHERE {_NEW_PRED}),
    batch_canon AS (
      SELECT h, MIN(doc_id) AS batch_canonical FROM batch GROUP BY h
    )
    SELECT b.doc_id AS doc_id,
           CASE WHEN s.store_canonical IS NOT NULL THEN 'corpus_dup'
                WHEN b.doc_id <> c.batch_canonical THEN 'batch_dup'
                ELSE 'unique' END AS status,
           COALESCE(s.store_canonical, c.batch_canonical) AS canonical_doc_id
    FROM batch b
    JOIN batch_canon c ON b.h = c.h
    LEFT JOIN store s ON b.h = s.h
    """,
)
def op_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact incremental dedup gate: documents split 80/20 into corpus
    and incoming batch by ``doc_id % 10``; every batch doc classified
    via incremental_exact against build_signature_store(corpus)."""
    docs = read_table(spark, sf_dir, "documents")
    store = build_signature_store(docs.filter(F.expr(_OLD_PRED)))
    batch = docs.filter(F.expr(_NEW_PRED))
    return incremental_exact(batch, store)


@_register(
    "op_dedup_incremental_minhash",
    rf"""
    WITH sh AS ({_SQL_SHINGLES}),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS corpus_doc_id, b.doc_id AS batch_doc_id,
             COUNT(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle
      WHERE a.doc_id % 10 < 8 AND b.doc_id % 10 >= 8
      GROUP BY 1, 2
    )
    SELECT corpus_doc_id, batch_doc_id,
           ROUND(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 6) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = corpus_doc_id
    JOIN sizes s2 ON s2.doc_id = batch_doc_id
    WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.8
    """,
)
def op_dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup incremental dedup: which incoming docs are >= 0.8-Jaccard
    near-duplicates of some corpus doc. Corpus band buckets are the
    persistent store (same banding as op_dedup_minhash_lsh, so one
    stored bucket table serves both); batch buckets hash-join them,
    candidates verify with exact Jaccard — identical false-positive /
    miss guarantees to the full-batch rung, which is why this gate
    shares the exact cross-set Jaccard oracle.

    Note the oracle's WHERE is the *exact* cross-set Jaccard (old x new
    all-pairs); the Spark side only ever computes it on LSH candidates —
    the gate hash-matching proves the candidate set loses nothing at
    the 0.8 threshold (miss probability < 1e-7).
    """
    docs = read_table(spark, sf_dir, "documents")
    # checkpoint: store and batch sides would otherwise each re-run the
    # signature aggregate (see op_dedup_minhash_lsh)
    buckets = minhash_band_buckets(gram_hash_rows(docs)).localCheckpoint()
    is_old = F.col("doc_id") % 10 < 8
    store = buckets.filter(is_old)  # production: read bucketed dataset
    batch = buckets.filter(~is_old)
    o, b = store.alias("o"), batch.alias("b")
    candidates = (
        o.join(
            b,
            (F.col("o.band") == F.col("b.band"))
            & (F.col("o.sig") == F.col("b.sig")),
        )
        .select(
            F.col("o.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .distinct()
        # run the (bucket-join side of the) signature aggregate once —
        # see op_dedup_minhash_lsh
        .localCheckpoint()
    )
    sh_cand = _candidate_doc_shingles(spark, sf_dir, candidates)
    return _jaccard_pairs(sh_cand, candidates, 0.8).select(
        F.col("d1").alias("corpus_doc_id"),
        F.col("d2").alias("batch_doc_id"),
        "jaccard",
    )
