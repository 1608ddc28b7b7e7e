"""Data sources: paginated HTTP JSON (the reference's core), the file
formats Spark gives natively (parquet/csv/json — reference S23 has none),
and a parallel Postgres reader (pgsource) that completes the warehouse
round-trip next to the merge sink."""

from apitap_spark.sources.http import (
    CursorPagination,
    HttpSource,
    LimitOffsetPagination,
    PageNumberPagination,
    PageOnlyPagination,
    RetryPolicy,
    TotalHint,
    drill_data_path,
)

__all__ = [
    "HttpSource",
    "RetryPolicy",
    "TotalHint",
    "LimitOffsetPagination",
    "PageNumberPagination",
    "PageOnlyPagination",
    "CursorPagination",
    "drill_data_path",
]
