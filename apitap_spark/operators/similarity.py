"""Similarity search over embedding columns (``array<float>``).

Three rungs for 100 TB ANN:

* brute-force top-k — exact, O(Q x N); the oracle-able baseline. Query
  side broadcasts, candidates never shuffle: scan → local cosine →
  per-query top-k.
* LSH-bucketed     — sign-random-projection buckets; only same-bucket
  candidates are scored. Approximate → rows-only check; recall asserted
  against brute force in tests.
* IVF-style        — coarse quantizer (label centroids stand in for
  k-means cells); queries probe their nearest cell only.

All vector math is ``F.zip_with`` / ``F.aggregate`` (JVM codegen,
index-ordered → deterministic), from apitap_spark.functions.vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apitap_spark.functions.vectors import cosine_similarity, l2_norm
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


# Double-precision cosine in DuckDB (list_cosine_similarity is float32 —
# too coarse to hash-match a double pipeline).
_SQL_DOT = (
    "list_aggregate(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
)
_SQL_NORM2 = (
    "list_aggregate(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)), 'sum')"
)


@_register(
    "op_ann_cosine_topk",
    f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS c_id, embedding AS ce FROM embeddings),
    sims AS (
      SELECT q_id, c_id,
             {_SQL_DOT.format(a="qe", b="ce")}
               / (sqrt({_SQL_NORM2.format(a="qe")}) * sqrt({_SQL_NORM2.format(a="ce")})) AS cos
      FROM q, c
      WHERE q_id <> c_id
    ),
    ranked AS (
      SELECT q_id, c_id, cos,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk
      FROM sims
    )
    SELECT q_id, c_id, ROUND(cos, 6) AS cosine, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    """,
)
def op_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for a query set (vec_id < 10).

    The query side is tiny → broadcast; every executor scores its local
    slice of the corpus and the window keeps 5 per query. At 100 TB the
    only shuffle is the per-query top-k (rows = Q x 5 after
    WindowGroupLimit pushdown).
    """
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("ce"))
    cos = cosine_similarity("qe", "ce").alias("cos")
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", cos)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .select("q_id", "c_id", F.round("cos", 6).alias("cosine"), "rk")
    )


@_register(
    "op_embedding_norms",
    f"""
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           ROUND(sqrt({_SQL_NORM2.format(a="embedding")}), 6) AS norm
    FROM embeddings
    """,
)
def op_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms of every embedding (vector-math smoke coverage; also the
    normalization step a real ANN index build runs first)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        F.round(l2_norm("embedding"), 6).alias("norm"),
    )


N_TABLES = 4
N_PLANES = 6  # per table → 64 buckets/table; tune both for corpus density


def _lsh_buckets(vec_col: str):
    """Array of (table, bucket) sign-random-projection assignments.

    Plane weights derive from xxhash64(table, plane, dim) — deterministic
    across runs/executors, pure JVM. Multiple independent tables trade
    compute for recall the standard LSH way: a neighbor lost to one
    table's boundary is usually kept by another."""
    def plane_dot(t: int, p: int):
        idx = F.sequence(F.lit(1), F.size(F.col(vec_col)))
        prods = F.zip_with(
            F.col(vec_col),
            idx,
            lambda x, i: x.cast("double")
            * ((F.pmod(F.xxhash64(F.lit(t), F.lit(p), i), F.lit(2001)) - 1000) / 1000.0),
        )
        return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)

    entries = []
    for t in range(N_TABLES):
        bucket = F.lit(0).cast("long")
        for p in range(N_PLANES):
            bucket = bucket + F.when(plane_dot(t, p) > 0, F.lit(1 << p)).otherwise(0)
        entries.append(
            F.struct(F.lit(t).alias("table"), bucket.alias("bucket"))
        )
    return F.array(*entries)


@_register("op_ann_lsh_bucketed")  # approximate → rows-only driver check
def op_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: score only candidates sharing a (table, bucket)
    cell with the query in any of the N_TABLES hash tables. The scale path
    when Q x N is infeasible — the bucket equi-join replaces the cross
    join and the shuffle key (table, bucket) spreads uniformly by
    construction. Approximate → no SQL oracle; tests measure recall
    against op_ann_cosine_topk."""
    emb = read_table(spark, sf_dir, "embeddings")
    bucketed = emb.select(
        "vec_id",
        "embedding",
        F.explode(_lsh_buckets("embedding")).alias("tb"),
    ).select("vec_id", "embedding", F.col("tb.table").alias("t"), F.col("tb.bucket").alias("b"))
    q = bucketed.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"), "t", "b"
    )
    c = bucketed.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("ce"), "t", "b"
    )
    cos = cosine_similarity("qe", "ce").alias("cos")
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        c.join(F.broadcast(q), ["t", "b"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .distinct()  # a pair may collide in several tables — score once
        .join(emb.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")), "q_id")
        .join(emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("ce")), "c_id")
        .select("q_id", "c_id", cos)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .select("q_id", "c_id", F.round("cos", 6).alias("cosine"), "rk")
    )


@_register("op_ann_ivf_label")  # centroid assignment is iterative-ish → rows-only
def op_ann_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: label centroids act as the coarse quantizer (a k-means
    fit would produce them at build time); each query probes only its
    nearest centroid's cell. Returns top-3 in-cell neighbors per query."""
    emb = read_table(spark, sf_dir, "embeddings")
    # Centroids: per-label mean of each dimension, via posexplode → agg →
    # re-assemble (sort by position). Dim count is bounded → array rebuild
    # is cheap; the groupBy is the only shuffle.
    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    # Assign each query to its nearest centroid (broadcast both tiny sides).
    qc = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "q_id", "qe", "label", cosine_similarity("qe", "centroid").alias("csim")
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("csim"), F.asc("label"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select("q_id", "qe", F.col("label").alias("cell"))
    )
    c = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("ce"),
        F.col("label").alias("cell"),
    )
    cos = cosine_similarity("qe", "ce").alias("cos")
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        c.join(F.broadcast(qc), "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", F.col("cell").cast("bigint").alias("cell"), cos)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("q_id", "c_id", "cell", F.round("cos", 6).alias("cosine"), "rk")
    )


COSINE_DUP_THRESHOLD = 0.4


@_register(
    "op_dedup_embedding_cosine",
    f"""
    WITH pool AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000)
    SELECT a.vec_id AS v1, b.vec_id AS v2,
           ROUND({_SQL_DOT.format(a="a.embedding", b="b.embedding")}
             / (sqrt({_SQL_NORM2.format(a="a.embedding")})
                * sqrt({_SQL_NORM2.format(a="b.embedding")})), 6) AS cosine
    FROM pool a JOIN pool b ON a.vec_id < b.vec_id
    WHERE {_SQL_DOT.format(a="a.embedding", b="b.embedding")}
            / (sqrt({_SQL_NORM2.format(a="a.embedding")})
               * sqrt({_SQL_NORM2.format(a="b.embedding")})) >= {COSINE_DUP_THRESHOLD}
    """,
)
def op_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.4) — the semantic rung
    of the dedup ladder (paraphrases that share no n-grams).

    Exact all-pairs over a bounded pool (vec_id < 1000) as the oracle-able
    baseline; the corpus-scale path replaces the cross join with the LSH
    bucket join (op_ann_lsh_bucketed) exactly as MinHash replaces exact
    Jaccard. Self-join dedupe by vec_id ordering; double-precision math
    matches the DuckDB oracle bit-for-bit before the 6-dp round.
    """
    emb = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    a = emb.select(F.col("vec_id").alias("v1"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("v2"), F.col("embedding").alias("eb"))
    cos = cosine_similarity("ea", "eb")
    return (
        a.join(b, F.col("v1") < F.col("v2"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= COSINE_DUP_THRESHOLD)
        .select("v1", "v2", F.round("cos", 6).alias("cosine"))
    )
