"""Time individual gates at a given SF: warm the JVM with one throwaway
run, then report the 2nd and 3rd timed runs (freeze protocol: nothing
else running on the box; run from the repo root so sys.path has '.').

Usage: python tools/time_gates.py <sf_dir> gate1 gate2 ...
"""
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1]
    gates = sys.argv[2:]
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("time_gates")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from apitap_spark.session import release_persisted

    qs = e.queries()
    # JVM warmup on a cheap gate
    qs["q1_pricing_summary"](spark, sf_dir).collect()
    out = {}
    for g in gates:
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            release_persisted(spark)
            t0 = time.monotonic()
            n = qs[g](spark, sf_dir).count()
            runs.append(round(time.monotonic() - t0, 4))
        out[g] = {"runs": runs, "rows": n}
        print(g, out[g], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
