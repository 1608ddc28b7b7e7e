"""Spark 4 Python Data Source API wrapper for the paginated HTTP source.

The idiomatic Spark 4 surface for S9 (SURVEY §2.1): the HTTP stream
registers as a real ``spark.read.format(...)`` source, so scans plan
through Catalyst like any other relation:

    spark.dataSource.register(HttpJsonDataSource)
    df = (spark.read.format("apitap_http")
            .option("url", "https://api.example.com/items")
            .option("pagination_type", "page_number")
            .option("per_page", 50)
            .option("data_path", "/data")
            .load())

Partition planning is one InputPartition per page (the reference's
``buffer_unordered(5)`` concurrency becomes executor-task parallelism);
cursor pagination degrades to a single sequential partition. ``schema()``
must run before any executor exists, so it uses the driver-side flat
inferencer (sources/schema.py) over the first page — the same sampled
"fixed for the run" policy as the reference (SURVEY §1.3).
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from apitap_spark.sources.http import (
    CursorPagination,
    HttpSource,
    LimitOffsetPagination,
    PageNumberPagination,
    PageOnlyPagination,
    RetryPolicy,
    TotalHint,
)
from apitap_spark.sources.schema import coerce_row, infer_schema_simple


def _source_from_options(options: dict) -> HttpSource:
    kind = options.get("pagination_type", "limit_offset")
    if kind == "limit_offset":
        pagination = LimitOffsetPagination(
            limit=int(options.get("limit", 100)),
            limit_param=options.get("limit_param", "limit"),
            offset_param=options.get("offset_param", "offset"),
        )
    elif kind == "page_number":
        hint = None
        if options.get("total_items_pointer"):
            hint = TotalHint("items", options["total_items_pointer"])
        elif options.get("total_pages_pointer"):
            hint = TotalHint("pages", options["total_pages_pointer"])
        pagination = PageNumberPagination(
            per_page=int(options.get("per_page", 100)),
            page_param=options.get("page_param", "page"),
            per_page_param=options.get("per_page_param", "per_page"),
            total_hint=hint,
        )
    elif kind == "page_only":
        pagination = PageOnlyPagination(page_param=options.get("page_param", "page"))
    elif kind == "cursor":
        pagination = CursorPagination(
            cursor_param=options.get("cursor_param", "cursor"),
            page_size_param=options.get("page_size_param"),
            page_size=int(options["page_size"]) if options.get("page_size") else None,
            next_cursor_pointer=options.get("next_cursor_pointer", "/next_cursor"),
        )
    else:
        raise ValueError(f"unknown pagination_type {kind!r}")
    headers = json.loads(options["headers"]) if options.get("headers") else {}
    params = json.loads(options["params"]) if options.get("params") else {}
    return HttpSource(
        name=options.get("name", "http_source"),
        url=options["url"],
        pagination=pagination,
        data_path=options.get("data_path"),
        headers=headers,
        extra_params=params,
        retry=RetryPolicy(
            max_attempts=int(options.get("retry_max_attempts", 3)),
            min_delay_sec=float(options.get("retry_min_delay_sec", 1.0)),
            max_delay_sec=float(options.get("retry_max_delay_sec", 5.0)),
        ),
        sample_size=int(options.get("sample_size", 100)),
    )


class PagePartition(InputPartition):
    def __init__(self, page_idx: int):
        super().__init__(page_idx)
        self.page_idx = page_idx


class CursorPartition(InputPartition):
    def __init__(self):
        super().__init__(0)


class HttpJsonReader(DataSourceReader):
    def __init__(self, options: dict, schema):
        self._options = dict(options)
        self._schema = schema

    def partitions(self) -> Sequence[InputPartition]:
        src = _source_from_options(self._options)
        if isinstance(src.pagination, CursorPagination):
            return [CursorPartition()]
        # One page-0 request serves both the emptiness/page-size check and
        # the total hint (same fetch-once discipline as HttpSource.load).
        from apitap_spark.sources.http import _fetch_raw, parse_response

        resp = _fetch_raw(src.url, src._page_params(0), src.headers, src.retry)
        first, envelope = parse_response(resp, src.data_path)
        if not first:
            return [PagePartition(0)]
        n_pages = src._total_from_hint(envelope) if envelope is not None else None
        if n_pages is None:
            if len(first) < src._page_size_guess():
                n_pages = 1
            else:
                n_pages = src._probe_page_count()
        return [PagePartition(i) for i in range(n_pages)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        src = _source_from_options(self._options)
        if isinstance(partition, CursorPartition):
            rows = src._cursor_rows()
        else:
            rows = src._fetch_page(partition.page_idx)
        for row in rows:
            yield coerce_row(row, self._schema)


class HttpJsonDataSource(DataSource):
    """``format("apitap_http")`` — paginated HTTP JSON as a first-class
    Spark data source."""

    @classmethod
    def name(cls) -> str:
        return "apitap_http"

    def schema(self):
        src = _source_from_options(self.options)
        if isinstance(src.pagination, CursorPagination):
            rows = src._cursor_rows()
        else:
            rows = src._fetch_page(0)
        return infer_schema_simple(rows, src.sample_size)

    def reader(self, schema) -> DataSourceReader:
        return HttpJsonReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(HttpJsonDataSource)
