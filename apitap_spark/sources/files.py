"""File-format sources/sinks (SURVEY §2.1 S23 — the reference has none;
Spark provides them natively, exposed here with the engine's inference
policy and scale-aware write defaults)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    sample_ratio: float | None = None,
    **options,
) -> DataFrame:
    """Read parquet/csv/json/ndjson with the engine's defaults.

    * csv: header + schema inference unless an explicit schema pins types
      (inference reads the data twice — always pass a schema at scale).
    * json: Spark's native sample→widen→string-fallback inference, the
      same lattice the HTTP source uses (SURVEY §1.2).
    """
    fmt = {"ndjson": "json"}.get(fmt, fmt)
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if not schema:
            options.setdefault("inferSchema", "true")
    if fmt == "json" and sample_ratio:
        options.setdefault("samplingRatio", str(sample_ratio))
    return reader.options(**options).format(fmt).load(path)


def write_dataset(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = 1_000_000,
) -> None:
    """Write a dataset with scale-sane defaults: parquet, bounded file
    sizes (prevents the giant-file straggler on read), optional hive-style
    partitioning for downstream partition pruning."""
    writer = df.write.mode(mode).format(fmt)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+sorted) managed table.

    Bucketing pre-shuffles the data once at write time: two tables
    bucketed on the same key with the same bucket count join WITHOUT a
    shuffle (and without even a sort if ``sort=True``) — the pattern for
    repeatedly-joined 100 TB fact tables where the per-query shuffle is
    the dominant cost.
    """
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).bucketBy(n_buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)
