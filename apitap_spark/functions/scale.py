"""Scale utilities: skew mitigation and partition diagnostics.

At 100 TB the failure mode isn't wrong answers — it's the one straggler
task holding a hot key. These helpers make the mitigation explicit where
AQE's runtime skew-join split isn't available (e.g. non-sort-merge plans,
or pre-AQE shuffle sizing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Join a skew-keyed large side to a small side with key salting.

    The large side derives a deterministic salt in [0, salt) by hashing the
    whole row (hot keys spread across ``salt`` shuffle partitions); the
    small side replicates each row ``salt`` times. Equivalent results to a
    plain equi-join, with the hot key's work split ``salt`` ways.

    Prefer ``F.broadcast(small)`` when the small side fits in memory —
    salting is for when it doesn't, or when the engine insists on a
    shuffle join. Supported ``how``: inner / left (semantics preserved
    because every large row keeps exactly its original matches).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves semantics for inner/left only")
    keys = [on] if isinstance(on, str) else list(on)
    entropy = [F.col(c) for c in large.columns]
    lg = large.withColumn("_salt", F.pmod(F.xxhash64(*entropy), F.lit(salt)).cast("int"))
    sm = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = lg.join(sm, keys + ["_salt"], how)
    return out.drop("_salt")


def salted_two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: partial-aggregate on (keys, salt), then
    final-aggregate on keys. ``aggs`` maps output name → partial
    aggregate expression; the final phase SUMs the partials, so pass
    decomposable aggregates (sum/count — avg as sum+count).

    A hot grouping key's rows split across ``salt`` reducers in phase 1;
    phase 2 touches ``salt`` rows per key. With exact (decimal) sums the
    result is bit-identical to the one-phase aggregate regardless of the
    split. (Spark's own partial aggregation does this per-partition;
    explicit salting adds protection when one KEY dominates entire
    partitions post-shuffle.)
    """
    entropy = [F.col(c) for c in df.columns]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*entropy), F.lit(salt)).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in aggs]
    )


def partition_row_histogram(df: DataFrame) -> DataFrame:
    """Rows per partition (skew diagnostic): returns
    (partition_id, n_rows) — a straggler shows up as one huge row count."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("_pid")
    )


def skew_factor(df: DataFrame, key: str | Column) -> float:
    """max(key count) / avg(key count) — a quick driver-side skew probe
    before choosing broadcast/salt/AQE strategies."""
    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    row = counts.agg(
        F.max("n").alias("mx"), F.avg("n").alias("av")
    ).collect()[0]
    return float(row["mx"]) / float(row["av"]) if row["av"] else 1.0
