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
    """Squared L2 distance of two array columns (JVM-side fold).

    The square is an explicit multiply, not ``** 2``: Math.pow/libm pow
    are only 1-ulp-accurate while IEEE multiplication is exact, so d*d
    is the form both engines reproduce bit-identically (oracle parity).
    """
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def _centroids_of(assigned: DataFrame, *key_cols: str) -> DataFrame:
    """Per-key mean vectors: posexplode → (keys, dim) fixed-point mean →
    array rebuild in dim order. Shuffle cardinality k x d, not corpus
    size. Accepts one key (kmeans cluster) or several (PQ block+code) —
    this is the SINGLE Spark-side definition of the fixed-point mean;
    every oracle that replays it mirrors exactly this arithmetic.

    Means are fixed-point (per-value micro rounding → exact bigint sums
    → one IEEE division chain), making centroids order-independent and
    hence engine-replayable — the kmeans/IVF/PQ gates hash-check against
    DuckDB replays. Centroid error vs the true float mean is ≤ 5e-7 per
    dimension (half a micro-unit), noise relative to Lloyd convergence.
    """
    keys = list(key_cols)
    return (
        assigned.select(*keys, F.posexplode("embedding").alias("pos", "val"))
        .groupBy(*keys, "pos")
        .agg(
            (
                F.sum(
                    F.round(F.col("val").cast("double") * F.lit(1000000.0), 0)
                    .cast("bigint")
                ).cast("double")
                / F.lit(1000000.0)
                / F.count("*").cast("double")
            ).alias("m")
        )
        .groupBy(*keys)
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
        # array_sort orders the broadcast centroids by cluster id, so the
        # strict-< fold breaks distance ties toward the LOWEST cluster —
        # deterministic, and the same tiebreak the SQL oracle's
        # (distance, cluster) ROW_NUMBER uses. collect_list alone has no
        # order guarantee.
        carr = cent.agg(
            F.array_sort(
                F.collect_list(F.struct("cluster", "centroid"))
            ).alias("cs")
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


def _sql_sqdist(vec: str, cent: str) -> str:
    """DuckDB mirror of _sq_dist: explicit (a-b)*(a-b) multiply, index-
    ordered list sum — bit-identical to the Spark fold."""
    return (
        f"list_aggregate(list_transform(range(1, len({vec}) + 1), "
        f"i -> (CAST({vec}[i] AS DOUBLE) - {cent}[i])"
        f" * (CAST({vec}[i] AS DOUBLE) - {cent}[i])), 'sum')"
    )


KMEANS_ITERS = 3

_KMEANS_ORACLE = f"""
    WITH RECURSIVE
    expl AS (
      SELECT vec_id, label, i AS pos,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0, 0) AS BIGINT)
               AS v_u
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    ),
    init AS (
      SELECT cluster, list(m ORDER BY pos) AS centroid FROM (
        SELECT label AS cluster, pos,
               CAST(SUM(v_u) AS DOUBLE) / 1000000.0 / CAST(COUNT(*) AS DOUBLE)
                 AS m
        FROM expl GROUP BY label, pos
      ) GROUP BY cluster
    ),
    km(iter, cluster, centroid) AS (
      SELECT 0, cluster, centroid FROM init
      UNION ALL
      SELECT iter + 1, cluster, list(m ORDER BY pos) FROM (
        SELECT asg.iter, asg.cluster, e.pos,
               CAST(SUM(e.v_u) AS DOUBLE) / 1000000.0 / CAST(COUNT(*) AS DOUBLE)
                 AS m
        FROM (
          SELECT iter, vec_id, cluster FROM (
            SELECT km.iter, em.vec_id, km.cluster,
                   ROW_NUMBER() OVER (PARTITION BY em.vec_id ORDER BY
                     {_sql_sqdist("em.embedding", "km.centroid")} ASC,
                     km.cluster ASC) AS rk
            FROM km, embeddings em
            WHERE km.iter < {KMEANS_ITERS - 1}
          ) WHERE rk = 1
        ) asg
        JOIN expl e ON e.vec_id = asg.vec_id
        GROUP BY asg.iter, asg.cluster, e.pos
      ) GROUP BY iter, cluster
    )
    SELECT vec_id, cluster, ROUND(d, 6) AS sq_dist FROM (
      SELECT em.vec_id, km.cluster,
             {_sql_sqdist("em.embedding", "km.centroid")} AS d,
             ROW_NUMBER() OVER (PARTITION BY em.vec_id ORDER BY
               {_sql_sqdist("em.embedding", "km.centroid")} ASC,
               km.cluster ASC) AS rk
      FROM km, embeddings em WHERE km.iter = {KMEANS_ITERS - 1}
    ) WHERE rk = 1
    """


@_register("op_kmeans_refine", _KMEANS_ORACLE)
def op_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means refinement of the label-mean centroids (3 Lloyd rounds) —
    the IVF coarse-quantizer build (op_ann_ivf_label consumes such
    centroids).

    Hash-checked against a DuckDB recursive-CTE replay (round-2 verdict
    #5; was rows-only): fixed-point centroid means are order-independent,
    the assignment fold iterates centroids in cluster order with a
    strict-< tiebreak (= the oracle's distance-then-cluster ROW_NUMBER),
    and squared distances use exact multiplies, never pow. Lloyd
    invariants additionally asserted in tests."""
    emb = read_table(spark, sf_dir, "embeddings")
    init = _centroids_of(
        emb.select(F.col("label").alias("cluster"), "embedding"), "cluster"
    )
    return kmeans_assign(emb.select("vec_id", "embedding"), init, n_iter=KMEANS_ITERS)


# ---- logistic-regression quality classifier ------------------------------

LOGREG_ITERS = 40  # accuracy plateaus ~0.98 by 30 iters on the testdata
LOGREG_LR = 2.0

# Long-form label threshold (chars). The synthetic corpus has no real
# quality labels; "is long-form" is the deterministic stand-in for the
# human/LLM quality label a production filter trains against. Features
# deliberately EXCLUDE n_chars itself: the model must recover the label
# from token-level surface statistics (count, mean length, distinct
# ratio), which is a genuinely fittable — not hardcoded — relationship.
LONGFORM_CHARS = 300


def _feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apitap_spark.functions.text import token_count, tokens

    docs = read_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    t = tokens("text")
    n = token_count("text").cast("double")
    avg_len = (
        F.aggregate(
            F.transform(t, lambda w: F.length(w)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("double")
        / n
    )
    return docs.select(
        "doc_id",
        (F.length("text") > LONGFORM_CHARS).cast("double").alias("y"),
        F.lit(1.0).alias("f_bias"),
        (n / F.lit(100.0)).alias("f_tokens"),
        (avg_len / F.lit(10.0)).alias("f_avg_token_len"),
        (F.size(F.array_distinct(t)).cast("double") / n).alias("f_distinct_ratio"),
    )


def train_logreg(
    X: DataFrame, feature_cols: list[str], label_col: str = "y",
    iters: int = LOGREG_ITERS, lr: float = LOGREG_LR,
) -> list[float]:
    """Batch gradient descent for logistic regression, distributed.

    Per iteration ONE aggregation computes every gradient component
    (partial-aggregated sums — one row of d doubles crosses the
    shuffle) and the weight update happens on the driver, exactly the
    scalar-probe pattern of kmeans_refine / connected_components. The
    training data never moves; at 100 TB each pass is one scan (and the
    feature frame should be cached). Gradient sums are floating-point
    and partition-order dependent -> the operator is rows-only (weights
    reproduce to ~1e-9, not bitwise; tests assert separation quality
    and sign structure instead).

    First-order GD is the fallback for huge d; for the small feature
    sets a quality filter uses, train_logreg_newton below converges in
    ~6 rounds instead of ~40.
    """
    n = X.count()
    w = [0.0] * len(feature_cols)
    for _ in range(iters):
        z = sum(F.col(c) * F.lit(wi) for c, wi in zip(feature_cols, w))
        resid = F.col(label_col) - F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        grads = X.agg(
            *[F.sum(resid * F.col(c)).alias(c) for c in feature_cols]
        ).collect()[0]
        w = [wi + lr * grads[c] / n for wi, c in zip(w, feature_cols)]
    return w


NEWTON_ITERS = 8
NEWTON_RIDGE = 1e-6  # Hessian regularizer: keeps the solve well-posed


def train_logreg_newton(
    X: DataFrame, feature_cols: list[str], label_col: str = "y",
    iters: int = NEWTON_ITERS,
) -> list[float]:
    """Newton/IRLS logistic regression — the GLM algorithm MLlib's
    GeneralizedLinearRegression uses, converging quadratically (~6
    rounds where GD needs ~40).

    Per round ONE aggregation computes the gradient (d sums) AND the
    upper-triangular Hessian X'WX (d(d+1)/2 sums, w_i = p_i(1-p_i)) —
    still a single partial-aggregated scan with one tiny row crossing
    the shuffle; the d x d solve happens on the driver (numpy). Only
    sensible for small d (a quality filter's handful of features);
    wide models should use train_logreg.
    """
    import numpy as np

    d = len(feature_cols)
    w = [0.0] * d
    for _ in range(iters):
        z = sum(F.col(c) * F.lit(wi) for c, wi in zip(feature_cols, w))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        resid = F.col(label_col) - p
        wt = p * (F.lit(1.0) - p)
        aggs = [F.sum(resid * F.col(c)).alias(f"g{j}")
                for j, c in enumerate(feature_cols)]
        for j in range(d):
            for k in range(j, d):
                aggs.append(
                    F.sum(wt * F.col(feature_cols[j]) * F.col(feature_cols[k]))
                    .alias(f"h{j}_{k}")
                )
        row = X.agg(*aggs).collect()[0]
        g = np.array([row[f"g{j}"] for j in range(d)])
        H = np.zeros((d, d))
        for j in range(d):
            for k in range(j, d):
                H[j, k] = H[k, j] = row[f"h{j}_{k}"]
        delta = np.linalg.solve(H + NEWTON_RIDGE * np.eye(d), g)
        w = [wi + dv for wi, dv in zip(w, delta)]
    return w


@_register("op_ml_logreg_quality")  # float gradient sums -> rows-only
def op_ml_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a logistic-regression long-form/quality classifier on
    token-level surface features — the model-based corpus filter rung
    (CCNet / fastText-style quality filters), learned IN the engine
    with one aggregation pass per Newton/IRLS step and applied as a
    projection.

    Output: one row per feature with its learned weight, plus the
    training accuracy at the learned weights (repeated per row for a
    flat schema). The token-count weight must dominate positively —
    asserted in tests along with >= 0.9 train accuracy.
    """
    feature_cols = ["f_bias", "f_tokens", "f_avg_token_len", "f_distinct_ratio"]
    X = _feature_frame(spark, sf_dir).persist()
    try:
        w = train_logreg_newton(X, feature_cols)
        z = sum(F.col(c) * F.lit(wi) for c, wi in zip(feature_cols, w))
        pred = (z > 0).cast("double")
        acc = X.agg(
            F.avg((pred == F.col("y")).cast("double")).alias("a")
        ).collect()[0]["a"]
    finally:
        X.unpersist()
    # createDataFrame, not repr()-interpolated SQL: a non-finite weight
    # (nan/inf from divergence on separable data) would break SQL parsing,
    # while float columns carry nan/inf natively.
    return spark.createDataFrame(
        [(c, float(wi), float(acc)) for c, wi in zip(feature_cols, w)],
        "feature string, weight double, train_accuracy double",
    )
