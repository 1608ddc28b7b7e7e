"""Temporal join operators: as-of (point-in-time) join.

Neither the reference's embedded DataFusion 47 nor stock Spark SQL
exposes an AS OF join (SURVEY.md §2.2 Q5 note), yet it is the bread and
butter of event attribution and feature backfill. This implements it as
a composition of built-in operators — union + ordered window with
last-ignorenulls — which is the scale-correct formulation:

* ONE shuffle, on the join key (user_id): both streams co-partition.
* Within each key, a running ``last(non-null)`` over (ts, side) order
  carries the most recent build-side row to every probe row — O(1)
  window state, no range-join blowup, no per-row probe.

DuckDB has a native ASOF JOIN, which makes a true SQL oracle for the
semantics (inclusive match: probe.ts >= build.ts, latest build wins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str = "ts",
    build_ts: str = "ts",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: attach to each probe row the build row with the
    greatest ``build_ts <= probe_ts`` for the same ``on`` key.

    The build side must be unique per (on, build_ts) — pre-aggregate it
    if not (ASOF is otherwise ambiguous). Payload columns come back
    NULL-filled when no prior build row exists (left semantics).

    Mechanics: tag sides, union, and take ``last(struct(payload),
    ignorenulls)`` over (ts, side) within the key — side=0 (build)
    sorts before side=1 (probe) at equal timestamps, giving the
    inclusive >= match of a native ASOF join.
    """
    payload_cols = payload_cols or [
        c for c in build.columns if c not in (on, build_ts)
    ]
    b = build.select(
        F.col(on).alias("_k"),
        F.col(build_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(build_ts).alias("_match_ts"),
            *[F.col(c) for c in payload_cols],
        ).alias("_payload"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe.columns],
    )
    p = probe.select(
        F.col(on).alias("_k"),
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None)
        .cast(b.schema["_payload"].dataType)
        .alias("_payload"),
        *[F.col(c) for c in probe.columns],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = b.unionByName(p).withColumn(
        "_m", F.last("_payload", ignorenulls=True).over(w)
    )
    return matched.filter(F.col("_side") == 1).select(
        *probe.columns,
        F.col("_m._match_ts").alias("match_ts"),
        *[F.col(f"_m.{c}").alias(c) for c in payload_cols],
    )


@_register(
    "op_asof_join_attribution",
    """
    WITH purchases AS (
      SELECT user_id, ts, MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    ),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS match_ts, p.purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def op_asof_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click attributed to the user's most recent prior
    (or simultaneous) purchase; clicks with no prior purchase keep NULLs.
    Oracle is DuckDB's native ASOF LEFT JOIN — the Spark side is the
    union + last-ignorenulls composition (see module docstring)."""
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(clicks, purchases, on="user_id")
