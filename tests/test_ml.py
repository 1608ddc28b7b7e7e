"""Lloyd-invariant tests for the k-means operator (rows-only gate entry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apitap_spark.operators.ml import _centroids_of, kmeans_assign, op_kmeans_refine
from apitap_spark.session import read_table


def test_kmeans_inertia_non_increasing(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    init = _centroids_of(
        read_table(spark, sf_dir, "embeddings").select(
            F.col("label").alias("cluster"), "embedding"
        ),
        "cluster",
    )
    inertias = []
    for n in (1, 2, 3):
        out = kmeans_assign(emb, init, n_iter=n)
        inertias.append(out.agg(F.sum("sq_dist")).collect()[0][0])
    assert inertias[0] >= inertias[1] >= inertias[2] - 1e-6


def test_kmeans_assignment_is_nearest(spark, sf_dir):
    out = op_kmeans_refine(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings")
    # every vector covered exactly once, distances non-negative
    assert out.count() == emb.count()
    assert out.filter(F.col("sq_dist") < 0).count() == 0
    assert out.select("vec_id").distinct().count() == emb.count()
    # clusters come from the label domain (init) — k preserved or shrunk
    k_init = emb.select("label").distinct().count()
    assert out.select("cluster").distinct().count() <= k_init
