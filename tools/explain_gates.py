"""Capture .explain("formatted") for gates into plans/<tag>/<gate>_<suffix>.txt.

Usage: python tools/explain_gates.py <sf_dir> <out_dir> <suffix> gate1 gate2 ...

Writes one file per gate; used for the optimization-round before/after
plan evidence (plans/r10/<gate>_before.txt / _after.txt).
"""
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    gates = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("explain_gates")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    for g in gates:
        df = qs[g](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{g}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
