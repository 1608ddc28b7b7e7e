#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "rows_per_sec": ...}

Comparable baseline (BASELINE.md): the reference sustains ~25-50K rows/sec
through transform+load and runs its "complex SQL" scenario in ~5-6 s on a
single node. Our gate: within 2x at the same scale factor (sf0.1,
~600K lineitem rows).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from apitap_spark.session import get_session

    spark = get_session(app_name="apitap-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # Headline suite: every registered query (the driver's correctness
    # inventory IS the workload). Warm the JVM + parquet footer cache with
    # one cheap query first so timings reflect steady state.
    t0 = time.perf_counter()
    next(iter(qs.values()))(spark, sf_dir).count()
    warmup = time.perf_counter() - t0

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in sorted(qs.items()):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()  # force full execution; driver-side result stays tiny
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt

    # Throughput figure comparable to BASELINE.md's rows/sec: lineitem rows
    # pushed through the flagship aggregation.
    li_rows = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    q1_time = timings.get("q1_pricing_summary", None)
    rows_per_sec = round(li_rows / q1_time) if q1_time else None

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
                "n_queries": len(timings),
                "warmup_sec": round(warmup, 3),
                "lineitem_rows": li_rows,
                "q1_rows_per_sec": rows_per_sec,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
