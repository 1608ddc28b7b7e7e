"""Iterative ML operators on embedding columns: Lloyd's k-means.

The coarse-quantizer build step a real IVF ANN index needs (and the
canonical iterative-algorithm shape on a DataFrame engine): assign each
vector to its nearest centroid (broadcast k×d centroids, row-local
argmin via min_by over a generated centroid array), recompute centroids
as per-cluster means (posexplode → two-level aggregate), repeat.

Scale shape per iteration: centroid table is k×d doubles (kilobytes) →
broadcast; assignment is a narrow projection (no shuffle); the
recompute is one partial-aggregated groupBy(cluster, dim) shuffle whose
cardinality is k×d, independent of corpus size. localCheckpoint between
iterations truncates the growing lineage exactly as in
operators/graph.py.

Float mean order-dependence makes a cross-engine SQL oracle infeasible
(driver records the rows-only check — the sanctioned path for iterative
algorithms); tests assert the Lloyd invariants instead: inertia is
non-increasing per iteration and every vector sits with its nearest
centroid at convergence.
"""

from __future__ import annotations

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


def _sq_dist(a, b):
    """Squared L2 distance of two array columns (JVM-side fold)."""
    diffs = F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2)
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def _centroids_of(assigned: DataFrame, cluster_col: str) -> DataFrame:
    """Per-cluster mean vectors: posexplode → (cluster, dim) avg → array
    rebuild in dim order. Shuffle cardinality k x d, not corpus size."""
    return (
        assigned.select(cluster_col, F.posexplode("embedding").alias("pos", "val"))
        .groupBy(cluster_col, "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("m"))
        .groupBy(cluster_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
    )


def kmeans_assign(
    emb: DataFrame, init_centroids: DataFrame, n_iter: int = 3
) -> DataFrame:
    """Lloyd refinement: ``emb(vec_id, embedding)`` against
    ``init_centroids(cluster, centroid)``; returns (vec_id, cluster,
    sq_dist) after ``n_iter`` assign/recompute rounds.

    Assignment is min_by over a broadcast-collected centroid array —
    a row-local loop over k, no join, no shuffle.
    """
    cent = init_centroids
    assigned = None
    for _ in range(n_iter):
        carr = cent.agg(
            F.collect_list(F.struct("cluster", "centroid")).alias("cs")
        )
        scored = emb.join(F.broadcast(carr)).select(
            "vec_id",
            "embedding",
            # row-local argmin: fold over the k centroids carried in one
            # broadcast array column — no explode, no shuffle
            F.aggregate(
                "cs",
                F.struct(
                    F.lit(float("inf")).alias("d"),
                    F.lit(-1).cast("int").alias("cluster"),
                ),
                lambda acc, c: F.when(
                    _sq_dist(F.col("embedding"), c["centroid"]) < acc["d"],
                    F.struct(
                        _sq_dist(F.col("embedding"), c["centroid"]).alias("d"),
                        c["cluster"].alias("cluster"),
                    ),
                ).otherwise(acc),
            ).alias("best"),
        )
        assigned = scored.select(
            "vec_id",
            "embedding",
            F.col("best.cluster").alias("cluster"),
            F.col("best.d").alias("sq_dist"),
        ).localCheckpoint()
        cent = _centroids_of(assigned, "cluster")
    return assigned.select("vec_id", "cluster", F.round("sq_dist", 6).alias("sq_dist"))


@_register("op_kmeans_refine")  # iterative, float-mean centroids → rows-only
def op_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means refinement of the label-mean centroids (3 Lloyd rounds) —
    the IVF coarse-quantizer build (op_ann_ivf_label consumes such
    centroids). Deterministic given the data; rows-only driver check
    (iterative + float means), Lloyd invariants asserted in tests."""
    emb = read_table(spark, sf_dir, "embeddings")
    init = _centroids_of(
        emb.select(F.col("label").alias("cluster"), "embedding"), "cluster"
    )
    return kmeans_assign(emb.select("vec_id", "embedding"), init, n_iter=3)
