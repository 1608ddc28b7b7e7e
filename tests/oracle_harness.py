"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the driver contract: for each ``queries()`` entry with an
``oracle_sql()`` entry, run the Spark query and the DuckDB SQL over the
same parquet tables, then compare row count, sorted column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted).

Floats are compared with a tight relative tolerance so we catch real
mismatches while reporting near-misses (which would fail the driver's
exact hash) loudly — the plans are designed to be bit-exact via decimal
aggregation, so any reported float delta > 0 deserves investigation.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    """Normalize a cell for order-insensitive comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()[:26]
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _sort_key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def _strform(v) -> str:
    """String form of a (normalized) cell, recursing into containers —
    the textual shape a value hash is sensitive to."""
    if isinstance(v, tuple):
        return "(" + ",".join(_strform(x) for x in v) + ")"
    if isinstance(v, float):
        return repr(v)
    return str(v)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    issues: list[str] = field(default_factory=list)
    max_float_delta: float = 0.0


def compare(name: str, spark_df, oracle_rows_cols) -> CompareResult:
    """Compare a Spark DataFrame against (rows, columns) from DuckDB."""
    o_rows, o_cols = oracle_rows_cols
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    res = CompareResult(name=name, ok=True, spark_rows=len(s_rows), oracle_rows=len(o_rows))

    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in o_cols):
        res.ok = False
        res.issues.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return res
    if len(s_rows) != len(o_rows):
        res.ok = False
        res.issues.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")
        return res

    # Reorder both to columns sorted by (lowercased) name, like the driver.
    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i].lower())
    o_order = sorted(range(len(o_cols)), key=lambda i: o_cols[i].lower())
    s_norm = sorted(
        (tuple(_norm_cell(r[i]) for i in s_order) for r in s_rows), key=_sort_key
    )
    o_norm = sorted(
        (tuple(_norm_cell(r[i]) for i in o_order) for r in o_rows), key=_sort_key
    )

    n_bad = 0
    for sr, orow in zip(s_norm, o_norm):
        for sv, ov in zip(sr, orow):
            # Driver-faithful STRICT compare: exact equality AND equal
            # string form (catches decimal-scale drift — Decimal('1.10')
            # == Decimal('1.100') semantically, but the driver's value
            # hash distinguishes them; round 1's q_projection_alias red
            # row was exactly this).  Floats get no tolerance either —
            # the plans are designed bit-exact via decimal aggregation,
            # and the driver hashes the raw value.
            if sv == ov and _strform(sv) == _strform(ov):
                continue
            if isinstance(sv, float) and isinstance(ov, float):
                delta = abs(sv - ov) / max(1.0, abs(ov))
                res.max_float_delta = max(res.max_float_delta, delta)
            n_bad += 1
            if n_bad <= 3:
                res.issues.append(f"cell mismatch: spark={sv!r} oracle={ov!r}")
    if n_bad:
        res.ok = False
        res.issues.append(f"{n_bad} mismatched cells total")
    return res


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> list[CompareResult]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duck_connection(sf_dir)
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            # rows-only check, like the driver's weak path
            try:
                n = fn(spark, sf_dir).count()
                results.append(CompareResult(name=name, ok=True, spark_rows=n, oracle_rows=-1))
            except Exception as e:  # noqa: BLE001
                results.append(
                    CompareResult(name=name, ok=False, spark_rows=-1, oracle_rows=-1,
                                  issues=[f"spark error: {e}"])
                )
            continue
        try:
            sdf = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            results.append(
                CompareResult(name=name, ok=False, spark_rows=-1, oracle_rows=-1,
                              issues=[f"spark error: {e}"])
            )
            continue
        try:
            cur = con.execute(oracles[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            results.append(
                CompareResult(name=name, ok=False, spark_rows=-1, oracle_rows=-1,
                              issues=[f"oracle error: {e}"])
            )
            continue
        results.append(compare(name, sdf, (o_rows, o_cols)))
    return results
