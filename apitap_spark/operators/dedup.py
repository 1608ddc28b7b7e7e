"""Document deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Four rungs of the dedup ladder for a 100 TB corpus:

* exact        — hash-groupBy on a normalized form. One shuffle of
                 (hash, id); scales linearly.
* ngram-jaccard — exact pairwise Jaccard restricted to shingle-sharing
                 pairs. Exact but O(pairs sharing a shingle); the
                 oracle-able ground truth for the approximate rungs.
* minhash-lsh  — 128-perm MinHash, 32 bands x 4 rows, candidates from
                 band-bucket join, verified by exact Jaccard. The scale
                 path: shuffle is O(docs x bands), candidate verification
                 touches only colliding pairs.
* simhash      — 64-bit sign-random-projection over token counts,
                 16-bit-chunk banding (pigeonhole: hamming<=3 implies a
                 shared chunk), verified by popcount(xor).

All hashing is JVM-side (xxhash64 / md5); no Python in any hot path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apitap_spark.functions.text import normalize_ws, shingles, tokens
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


# DuckDB mirror of functions.text.shingles(text, 3): 1-based slices over the
# whitespace-token array; range(1, n-1) is empty for n < 3, matching the
# Spark-side guard.
_SQL_SHINGLES = r"""
  SELECT doc_id, UNNEST(list_distinct(
           list_transform(range(1, len(ws) - 1),
                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
         )) AS shingle
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents) toks
"""


@_register(
    "op_dedup_exact",
    r"""
    SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def op_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 over whitespace-normalized lowercase text,
    keep the smallest doc_id per group. One hash shuffle on the digest —
    the cheapest possible dedup at any scale."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(normalize_ws("text")).alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


_SQL_JACCARD_PAIRS = rf"""
    WITH sh AS ({_SQL_SHINGLES}),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT d1, d2, ROUND(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 6) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = d1
    JOIN sizes s2 ON s2.doc_id = d2
    WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= {{thr}}
"""


def _shingle_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(shingles("text", 3)).alias("shingle")
    )


def _jaccard_pairs(sh: DataFrame, candidates: DataFrame | None, thr: float) -> DataFrame:
    """Exact Jaccard over shingle sets; if ``candidates`` (d1, d2) is given,
    intersections are computed only for those pairs."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    if candidates is None:
        inter = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
            )
            .agg(F.count("*").alias("i"))
        )
    else:
        inter = (
            candidates.join(a, F.col("a.doc_id") == F.col("d1"))
            .join(
                b,
                (F.col("b.doc_id") == F.col("d2"))
                & (F.col("a.shingle") == F.col("b.shingle")),
            )
            .groupBy("d1", "d2")
            .agg(F.count("*").alias("i"))
        )
    s1 = sizes.alias("s1")
    s2 = sizes.alias("s2")
    jac = F.col("i").cast("double") / (F.col("s1.n") + F.col("s2.n") - F.col("i"))
    return (
        inter.join(s1, F.col("s1.doc_id") == F.col("d1"))
        .join(s2, F.col("s2.doc_id") == F.col("d2"))
        .filter(jac >= thr)
        .select("d1", "d2", F.round(jac, 6).alias("jaccard"))
    )


@_register("op_dedup_ngram_jaccard", _SQL_JACCARD_PAIRS.format(thr=0.2))
def op_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.2).

    Shuffle profile: one explode (no shuffle), one hash join on shingle.
    Skew hazard at corpus scale: ultra-common shingles create quadratic
    bucket blowup — the production rung is op_dedup_minhash_lsh below;
    this exact variant doubles as its correctness oracle.

    The shingle set feeds three plan branches (sizes + both join sides) —
    persisted so the tokenize/explode runs once (measured 2.4x at sf0.1).
    """
    sh = _shingle_df(spark, sf_dir).persist()
    return _jaccard_pairs(sh, None, 0.2)


N_HASHES = 128
N_BANDS = 32
ROWS_PER_BAND = N_HASHES // N_BANDS  # 4


@_register("op_dedup_minhash_lsh", _SQL_JACCARD_PAIRS.format(thr=0.8))
def op_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(128) + LSH(32 bands x 4 rows) near-dup pairs at Jaccard>=0.8.

    Candidate pairs come from band-bucket collisions only; each candidate is
    then verified with exact Jaccard, so false positives are impossible and
    the miss probability at j=0.8 is (1 - (1-(1-j^4))^32) < 1e-7 — which is
    why this operator shares the exact-Jaccard oracle.

    Scale shape: minhash signatures are a single groupBy(doc_id) with 128
    partial-aggregated min()s (map-side combine — shuffle is one row per
    doc); banding explodes to 32 rows/doc; the bucket self-join touches
    only colliding buckets. This is the 100 TB dedup path.
    """
    sh = _shingle_df(spark, sf_dir).persist()  # reused: signatures + verify
    # 128 minhashes: hash each shingle STRING once to a 64-bit key, then
    # derive the j-th permutation as xxhash64(seed_j, key) — hashing 12
    # bytes per permutation instead of re-hashing the ~25-byte string 128
    # times (measured ~2x on the signature stage; at corpus scale the
    # signature aggregate dominates the whole dedup job).
    sig = sh.withColumn("hkey", F.xxhash64("shingle")).groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(j), F.col("hkey"))).alias(f"h{j}")
            for j in range(N_HASHES)
        ]
    )
    # Band signatures: hash the 4 minhashes of each band into one value.
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.lit(b),
                    *[F.col(f"h{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
                ).alias("sig"),
            )
            for b in range(N_BANDS)
        ]
    )
    buckets = sig.select("doc_id", F.explode(bands).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    x = buckets.alias("x")
    y = buckets.alias("y")
    candidates = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
        .distinct()
    )
    return _jaccard_pairs(sh, candidates, 0.8)


@_register("op_dedup_clusters")  # iterative union-find → rows-only check
def op_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the LSH pair graph,
    keep-smallest-doc_id per cluster — the deliverable of a dedup pipeline
    (which rows to drop).

    Scale shape: the pair list is bounded by the duplicate rate (orders of
    magnitude smaller than the corpus), so union-find runs driver-side on
    the collected pairs; the cluster map then broadcasts back for the
    final join. At 100 TB with a pathological dup rate, swap the driver
    union-find for iterative large-star/small-star joins — the surrounding
    plan is unchanged.
    """
    pairs_df = op_dedup_minhash_lsh(spark, sf_dir)
    edges = [(r["d1"], r["d2"]) for r in pairs_df.collect()]

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    cluster_of = {x: find(x) for x in parent}

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    if cluster_of:
        # inline VALUES → LocalRelation: instant vs createDataFrame's ~2s
        # RDD path; the pair map is bounded by the duplicate rate so the
        # SQL text stays small
        vals = ", ".join(f"({a}, {b})" for a, b in cluster_of.items())
        mapping = spark.sql(
            "SELECT CAST(c1 AS BIGINT) AS doc_id, CAST(c2 AS BIGINT) AS cluster_id "
            f"FROM VALUES {vals} AS t(c1, c2)"
        )
        out = docs.join(F.broadcast(mapping), "doc_id", "left").select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    else:
        out = docs.select("doc_id", F.col("doc_id").alias("cluster_id"))
    return out.withColumn("is_kept", (F.col("doc_id") == F.col("cluster_id")))


SIMHASH_BITS = 64
SIMHASH_CHUNKS = 8  # 8-bit chunks; hamming<=7 => >=1 identical chunk
SIMHASH_CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS
SIMHASH_MAX_HAMMING = 7  # planted 0.95-jaccard pairs measure up to ~5


@_register("op_dedup_simhash")  # rows-only: xxhash64 seeds are engine-specific
def op_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit) near-dup pairs with hamming distance <= 3.

    Signature: per doc, per bit i, sum +1/-1 over token OCCURRENCES whose
    xxhash64 has bit i set/unset (identical to count-weighting distinct
    tokens); bit i of the signature is the sign. Computed as 64
    partial-aggregated sums in ONE groupBy pass directly on the exploded
    tokens (map-side combine; shuffle = one 64-column row per doc — the
    per-(doc, word) pre-count shuffle would be pure overhead).

    Pairing: 8 x 8-bit chunk banding (pigeonhole guarantee for d<=7 —
    measured planted-pair distances reach 5), verified with
    popcount(xor). Chunk width trades candidate volume against the
    hamming guarantee: widen the chunks (fewer, longer) as the corpus
    grows to keep per-bucket collision counts bounded. Not SQL-portable
    (hash differs per engine) → rows-only driver check; tests assert
    planted near-dups are found.
    """
    docs = read_table(spark, sf_dir, "documents")
    # per-occurrence ±1 sums == count-weighted sums over distinct words,
    # so the (doc_id, word) pre-aggregation shuffle is pure overhead —
    # ONE partial-aggregated groupBy(doc_id) pass does it all
    words = docs.select(
        "doc_id", F.explode(tokens("text")).alias("word")
    ).withColumn("h", F.xxhash64("word"))
    bit_sums = words.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    bit_terms = [
        F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        for i in range(SIMHASH_BITS)
    ]
    sig = bit_sums.select(
        "doc_id", reduce(lambda a, b: a.bitwiseOR(b), bit_terms).alias("simhash")
    )
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright("simhash", SIMHASH_CHUNK_BITS * c)
                        .bitwiseAND(F.lit((1 << SIMHASH_CHUNK_BITS) - 1))
                        .alias("chunk"),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", F.col("ch.chunk_id"), F.col("ch.chunk"))
    x = chunks.alias("x")
    y = chunks.alias("y")
    return (
        x.join(
            y,
            (F.col("x.chunk_id") == F.col("y.chunk_id"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("d1"),
            F.col("y.doc_id").alias("d2"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).cast("bigint").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )
