"""Curated-dataset parquet writer: partition, bucket, sort, size.

The storage-layout half of the 100 TB story. The compute operators
(dedup ladder, ANN, curation) decide WHAT rows survive; this module
decides HOW they land on disk so the *next* job over the corpus starts
from a layout that kills its dominant costs:

* ``partition_by`` — hive-style partition directories. Date/source
  partitions turn full-corpus scans into partition-pruned scans (the
  scan's ``PartitionFilters``); at 100 TB this is the difference
  between reading a day and reading a decade.
* ``bucket_by`` — pre-shuffle the table ONCE at write time into N
  buckets on the join/agg key. Two tables bucketed the same way join
  with ZERO exchange on either side (asserted in
  tests/test_dataset_sink.py by plan shape); repeated joins and
  groupBys on the bucket key skip their shuffle forever after. This is
  Spark's rendition of co-located placement — the ``repartition()`` /
  bucketing advice every large-join playbook gives. Pick N to match
  the ``spark.sql.shuffle.partitions`` the consuming jobs run with:
  a ONE-sided bucketed join only skips the bucketed side's shuffle
  when bucket count equals the join's partition count (see
  tests/test_incremental.py for the signature-store case).
* ``sort_by`` / ``sort_within_partitions`` — clustered rows give
  parquet min/max row-group statistics real selectivity (predicate
  skipping within files) and better dictionary/RLE compression.
* ``max_records_per_file`` — bounds file size so a 1000-executor scan
  gets balanced splits; prevents both the many-tiny-files metadata
  storm and the one-giant-file straggler.

No reference counterpart (the reference sinks rows into Postgres,
``src/writer/postgres.rs``); this is the beyond-reference training-data
pipeline surface the parquet testdata exists for.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class DatasetSpec:
    """Layout contract for one curated dataset.

    ``bucket_by`` requires ``table_name`` (bucketed layout is recorded in
    the catalog — Spark's bucket metadata lives on the table, not the
    files); the write is still an EXTERNAL table pinned to ``path`` so
    the parquet stays where the pipeline put it.
    """

    path: str
    partition_by: tuple = ()
    bucket_by: tuple = ()  # (n_buckets, col, [col...])
    sort_by: tuple = ()  # within-file ordering
    max_records_per_file: int | None = None
    table_name: str | None = None
    mode: str = "overwrite"

    def __post_init__(self):
        if self.bucket_by and not self.table_name:
            raise ValueError("bucket_by requires table_name (catalog metadata)")
        if self.bucket_by and self.partition_by:
            # legal in Spark, but partition dirs * buckets multiplies file
            # count; force the caller to choose deliberately via two specs
            raise ValueError("choose either partition_by or bucket_by per spec")


@dataclass
class DatasetManifest:
    """What the write produced — the observability a pipeline logs."""

    path: str
    n_files: int
    total_bytes: int
    partitions: list = field(default_factory=list)

    def as_dict(self) -> dict:
        return {
            "path": self.path,
            "n_files": self.n_files,
            "total_bytes": self.total_bytes,
            "partitions": self.partitions,
        }


def write_dataset(df: DataFrame, spec: DatasetSpec) -> DatasetManifest:
    """Write ``df`` with the spec's layout; returns a file manifest.

    Bucketed path: ``bucketBy(n, cols).sortBy(...)`` + ``saveAsTable``
    with an explicit ``path`` (external datasource table — in-memory
    catalog, no Hive metastore needed). Non-bucketed path: plain
    parquet with ``partitionBy`` and per-partition sort.
    """
    writer = df
    if spec.sort_by and not spec.bucket_by:
        # one sort per output task; with partition_by Spark additionally
        # clusters by partition cols so each task writes few files
        cols = list(spec.partition_by) + list(spec.sort_by)
        writer = writer.sortWithinPartitions(*cols)
    w = writer.write.mode(spec.mode).format("parquet")
    if spec.max_records_per_file:
        w = w.option("maxRecordsPerFile", str(spec.max_records_per_file))
    if spec.bucket_by:
        n, *cols = spec.bucket_by
        w = w.bucketBy(int(n), *cols)
        if spec.sort_by:
            w = w.sortBy(*spec.sort_by)
        w.option("path", spec.path).saveAsTable(spec.table_name)
    else:
        if spec.partition_by:
            w = w.partitionBy(*spec.partition_by)
        w.parquet(spec.path)
    return _manifest(spec.path)


def read_dataset(spark: SparkSession, spec: DatasetSpec) -> DataFrame:
    """Read a dataset written by :func:`write_dataset`.

    Bucketed tables MUST come back via the catalog name — reading the
    bare parquet path loses the bucket metadata and with it the
    no-shuffle join property.
    """
    if spec.bucket_by:
        return spark.table(spec.table_name)
    return spark.read.parquet(spec.path)


def _manifest(path: str) -> DatasetManifest:
    n_files = 0
    total = 0
    parts = set()
    for root, _dirs, files in os.walk(path):
        rel = os.path.relpath(root, path)
        if "=" in os.path.basename(root):
            parts.add(rel)
        for f in files:
            if f.endswith(".parquet"):
                n_files += 1
                total += os.path.getsize(os.path.join(root, f))
    return DatasetManifest(path, n_files, total, sorted(parts))
