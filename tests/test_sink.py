"""Merge sink tests: SQL shapes (unit), version dispatch, and real
upsert/append/overwrite semantics against a DuckDB stand-in database."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import types as T

from apitap_spark.sinks.jdbc_merge import (
    DuckDbDialect,
    JdbcMergeWriter,
    PostgresDialect,
    WriteMode,
    ddl_for_schema,
    insert_sql,
    merge_sql,
    pg_type_for,
    quote_ident,
    quote_ident_path,
    rows_per_statement,
    upsert_sql,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
)


# ---- S20 quoting -----------------------------------------------------------
def test_quote_ident_escapes():
    assert quote_ident('we"ird') == '"we""ird"'
    assert quote_ident("plain") == '"plain"'


def test_quote_ident_path():
    assert quote_ident_path("public.events") == '"public"."events"'


# ---- type lattice ----------------------------------------------------------
def test_pg_types():
    assert pg_type_for(T.LongType()) == "BIGINT"
    assert pg_type_for(T.IntegerType()) == "BIGINT"
    assert pg_type_for(T.DoubleType()) == "DOUBLE PRECISION"
    assert pg_type_for(T.BooleanType()) == "BOOLEAN"
    assert pg_type_for(T.StringType()) == "TEXT"
    assert pg_type_for(T.ArrayType(T.LongType())) == "JSONB"
    assert pg_type_for(T.StructType([])) == "JSONB"
    assert pg_type_for(T.TimestampType()) == "TIMESTAMP"
    assert pg_type_for(T.DecimalType(18, 2)) == "NUMERIC(18,2)"


def test_ddl_with_pk():
    ddl = ddl_for_schema("t", SCHEMA, "id")
    assert ddl.startswith('CREATE TABLE IF NOT EXISTS "t" (')
    assert '"id" BIGINT' in ddl and '"tags" JSONB' in ddl
    assert 'PRIMARY KEY ("id")' in ddl


# ---- statement shapes ------------------------------------------------------
def test_insert_sql_shape():
    sql = insert_sql(PostgresDialect(), "t", ["a", "b"], 2)
    assert sql == 'INSERT INTO "t" ("a", "b") VALUES (%s, %s), (%s, %s)'


def test_upsert_sql_shape():
    sql = upsert_sql(PostgresDialect(), "t", ["id", "v"], ["id"], 1)
    assert 'ON CONFLICT ("id") DO UPDATE SET "v" = EXCLUDED."v"' in sql


def test_upsert_all_pk_do_nothing():
    sql = upsert_sql(PostgresDialect(), "t", ["id"], ["id"], 1)
    assert sql.endswith('ON CONFLICT ("id") DO NOTHING')


def test_merge_sql_shape():
    sql = merge_sql(PostgresDialect(), "s.t", ["id", "v"], ["id"], 2)
    assert sql.startswith('MERGE INTO "s"."t" AS t USING (VALUES (%s, %s), (%s, %s))')
    assert 'ON t."id" = s."id"' in sql
    assert 'WHEN MATCHED THEN UPDATE SET "v" = s."v"' in sql
    assert 'WHEN NOT MATCHED THEN INSERT ("id", "v") VALUES (s."id", s."v")' in sql


def test_stage_sql_shapes():
    """COPY-staged upsert builders: typed temp stage (ON COMMIT DROP),
    MERGE-from-stage for PG 15+, INSERT..ON CONFLICT-from-stage for
    9.5-14 — no per-placeholder CASTs needed because the stage columns
    carry the types."""
    from apitap_spark.sinks.jdbc_merge import (
        merge_from_stage_sql,
        stage_ddl,
        stage_table_name,
        upsert_from_stage_sql,
    )

    assert stage_table_name("s.t") == "_apitap_stage_t"
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.ArrayType(T.LongType())),
        ]
    )
    ddl = stage_ddl(PostgresDialect(), "_apitap_stage_t", schema)
    assert ddl.startswith('CREATE TEMP TABLE IF NOT EXISTS "_apitap_stage_t"')
    assert '"id" BIGINT' in ddl and '"payload" JSONB' in ddl
    assert ddl.endswith("ON COMMIT DROP")
    m = merge_from_stage_sql("s.t", "_apitap_stage_t", ["id", "v"], ["id"])
    assert m.startswith('MERGE INTO "s"."t" AS t USING "_apitap_stage_t" AS s')
    assert 'ON t."id" = s."id"' in m
    assert 'WHEN MATCHED THEN UPDATE SET "v" = s."v"' in m
    assert "%s" not in m and "VALUES (s." in m
    u = upsert_from_stage_sql("t", "_apitap_stage_t", ["id", "v"], ["id"])
    assert u.startswith('INSERT INTO "t" ("id", "v") SELECT "id", "v" FROM')
    assert 'ON CONFLICT ("id") DO UPDATE SET "v" = EXCLUDED."v"' in u
    u2 = upsert_from_stage_sql("t", "_apitap_stage_t", ["id"], ["id"])
    assert u2.endswith('ON CONFLICT ("id") DO NOTHING')


def test_param_limit_chunking():
    assert rows_per_statement(13, 5000) == 5000  # 65000 binds OK
    assert rows_per_statement(14, 5000) == 65535 // 14  # capped
    assert rows_per_statement(100000, 5000) == 1


# ---- S17 version dispatch --------------------------------------------------
class FakeConn:
    def __init__(self, version_text):
        self.version_text = version_text

    def cursor(self):
        conn = self

        class Cur:
            def execute(self, sql, params=None):
                assert "version" in sql

            def fetchone(self):
                return (conn.version_text,)

        return Cur()


@pytest.mark.parametrize(
    "text,expected",
    [
        ("PostgreSQL 15.2 on x86_64-pc-linux-gnu", (15, 2)),
        ("PostgreSQL 9.6.24", (9, 6)),
        ("PostgreSQL 16beta1", (16, 0)),
        ("SomethingElse 1.0", (0, 0)),
    ],
)
def test_pg_version_parse(text, expected):
    assert PostgresDialect().server_version(FakeConn(text)) == expected


def test_version_gates():
    d = PostgresDialect()
    assert d.supports_merge((15, 0)) and not d.supports_merge((14, 9))
    assert d.supports_on_conflict((9, 5)) and not d.supports_on_conflict((9, 4))


def test_statement_routing_unsupported():
    w = JdbcMergeWriter(lambda: None, "t", mode=WriteMode.MERGE, primary_key="id")
    with pytest.raises(RuntimeError, match="neither MERGE nor ON CONFLICT"):
        w._statement(2, ["id", "v"], (9, 4), 1)


def test_merge_requires_pk():
    with pytest.raises(ValueError, match="primary key"):
        JdbcMergeWriter(lambda: None, "t", mode=WriteMode.MERGE)


# ---- semantics against DuckDB ---------------------------------------------
@pytest.fixture
def duck_path(tmp_path):
    return os.path.join(tmp_path, "sink.duckdb")


def _factory(path):
    def connect():
        return duckdb.connect(path)

    return connect


def _writer(path, mode, **kw):
    return JdbcMergeWriter(
        _factory(path),
        "target",
        dialect=DuckDbDialect(),
        mode=mode,
        **kw,
    )


def test_merge_upsert_semantics(spark, duck_path):
    """Second write with same PKs updates instead of duplicating (S15/S16)."""
    w = _writer(duck_path, WriteMode.MERGE, primary_key="id")
    df1 = spark.createDataFrame(
        [(1, "a", 1.0, ["x"]), (2, "b", 2.0, ["y"])], SCHEMA
    ).coalesce(1)
    w.write(df1)
    df2 = spark.createDataFrame(
        [(2, "B!", 20.0, ["y2"]), (3, "c", 3.0, None)], SCHEMA
    ).coalesce(1)
    w.write(df2)
    rows = duckdb.connect(duck_path).execute(
        "SELECT id, name, score, tags FROM target ORDER BY id"
    ).fetchall()
    assert rows == [
        (1, "a", 1.0, '["x"]'),
        (2, "B!", 20.0, '["y2"]'),
        (3, "c", 3.0, None),
    ]


def test_append_duplicates(spark, duck_path):
    w = _writer(duck_path, WriteMode.APPEND)
    df = spark.createDataFrame([(1, "a", 1.0, None)], SCHEMA).coalesce(1)
    w.write(df)
    w.write(df)
    n = duckdb.connect(duck_path).execute("SELECT count(*) FROM target").fetchone()[0]
    assert n == 2


def test_overwrite_truncates(spark, duck_path):
    w = _writer(duck_path, WriteMode.APPEND)
    w.write(spark.createDataFrame([(1, "a", 1.0, None)], SCHEMA).coalesce(1))
    w2 = _writer(duck_path, WriteMode.OVERWRITE)
    w2.write(spark.createDataFrame([(9, "z", 9.0, None)], SCHEMA).coalesce(1))
    rows = duckdb.connect(duck_path).execute("SELECT id FROM target").fetchall()
    assert rows == [(9,)]


def test_write_rows_driver_side(duck_path):
    """write_rows works without Spark (library surface, reference entry 3.3)."""
    w = _writer(duck_path, WriteMode.MERGE, primary_key="id", batch_size=1)
    w.prepare(SCHEMA)
    n = w.write_rows([(1, "a", 1.0, None), (1, "a2", 2.0, None)], SCHEMA)
    w.prepare(SCHEMA)  # idempotent ensure_table
    assert n == 2
    rows = duckdb.connect(duck_path).execute("SELECT id, name FROM target").fetchall()
    assert rows == [(1, "a2")]  # second statement upserted over the first


def test_postgres_copy_bulk_append_shape():
    """COPY path: SQL + CSV payload shape via a fake copy_expert cursor."""
    captured = {}

    class FakeCur:
        def copy_expert(self, sql, buf):
            captured["sql"] = sql
            captured["csv"] = buf.read()

        def execute(self, *a):
            pass

        def fetchone(self):
            return ("PostgreSQL 15.1",)

    class FakeConn:
        def cursor(self):
            return FakeCur()

    d = PostgresDialect()
    ok = d.bulk_append(
        FakeConn(), "public.t", ["id", "name"], [(1, "a"), (2, None), (3, 'q"x')]
    )
    assert ok
    assert captured["sql"].startswith('COPY "public"."t" ("id", "name") FROM STDIN')
    assert "NULL ''" in captured["sql"]
    lines = captured["csv"].strip().splitlines()
    # strings are ALWAYS quoted: with NULL '' an unquoted empty field is
    # NULL, so only quoting keeps '' distinct from NULL (found live on
    # PG 15 — csv.writer's minimal quoting silently nulled empty strings)
    assert lines[0] == '1,"a"'
    assert lines[1] == "2,"  # None → unquoted empty = NULL
    assert lines[2] == '3,"q""x"'  # escaped quote
    # the live-semantics cases: empty string stays quoted, bytes → bytea
    captured.clear()
    d.bulk_append(FakeConn(), "t", ["id", "v"], [(1, ""), (2, b"\x00\xff")])
    lines = captured["csv"].strip().splitlines()
    assert lines[0] == '1,""'
    assert lines[1] == "2,\\x00ff"


def test_duckdb_bulk_append_used_for_append(spark, duck_path):
    """Append mode routes through the registered-DataFrame bulk path and
    results match."""
    w = _writer(duck_path, WriteMode.APPEND, batch_size=2)
    w.prepare(SCHEMA)
    n = w.write_rows([(i, f"n{i}", float(i), None) for i in range(7)], SCHEMA)
    assert n == 7
    got = duckdb.connect(duck_path).execute(
        "SELECT count(*), sum(id) FROM target"
    ).fetchone()
    assert got == (7, 21)


def test_schema_evolution_adds_columns(spark, duck_path):
    """New DataFrame columns evolve the live table additively; old rows
    null-fill (reference has no schema evolution, README.md:125)."""
    w1 = _writer(duck_path, WriteMode.MERGE, primary_key="id")
    s1 = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    w1.prepare(s1)
    w1.write_rows([(1, "a"), (2, "b")], s1)

    s2 = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    w2 = _writer(duck_path, WriteMode.MERGE, primary_key="id")
    w2.prepare(s2)  # evolves: ADD COLUMN score
    w2.write_rows([(2, "B", 2.5), (3, "c", 3.5)], s2)

    rows = duckdb.connect(duck_path).execute(
        "SELECT id, name, score FROM target ORDER BY id"
    ).fetchall()
    assert rows == [(1, "a", None), (2, "B", 2.5), (3, "c", 3.5)]


def test_clickhouse_dialect_shapes():
    """ClickHouse: ReplacingMergeTree DDL, merge routed to plain INSERT."""
    from apitap_spark.sinks.jdbc_merge import ClickHouseDialect

    d = ClickHouseDialect()
    ddl = ddl_for_schema("t", SCHEMA, "id", dialect=d)
    assert '"id" Int64' in ddl and '"score" Float64' in ddl and '"name" String' in ddl
    assert "PRIMARY KEY" not in ddl
    assert ddl.endswith('ENGINE = ReplacingMergeTree ORDER BY ("id")')
    w = JdbcMergeWriter(lambda: None, "t", dialect=d, mode=WriteMode.MERGE, primary_key="id")
    sql = w._statement(2, ["id", "v"], (0, 0), 2)
    assert sql.startswith('INSERT INTO "t"')  # engine dedups, not the writer


def test_bigquery_dialect_shapes():
    """BigQuery: standard-SQL MERGE, CLUSTER BY instead of PK."""
    from apitap_spark.sinks.jdbc_merge import BigQueryDialect

    d = BigQueryDialect()
    ddl = ddl_for_schema("ds.t", SCHEMA, "id", dialect=d)
    assert '"id" INT64' in ddl and '"tags" JSON' in ddl
    assert "PRIMARY KEY" not in ddl
    assert ddl.endswith('CLUSTER BY "id"')
    w = JdbcMergeWriter(lambda: None, "ds.t", dialect=d, mode=WriteMode.MERGE, primary_key="id")
    sql = w._statement(2, ["id", "v"], d.server_version(None), 1)
    assert sql.startswith('MERGE INTO "ds"."t"')


def test_merge_dedups_pks_within_statement(spark, duck_path):
    """Repeated PKs inside one merge statement must not crash the engine
    ("command cannot affect row a second time"); last row wins — the same
    outcome the rows would produce applied one by one (CDC increments)."""
    w = _writer(duck_path, WriteMode.MERGE, primary_key="id")
    df = spark.createDataFrame(
        [(1, "a", 1.0, None), (2, "b", 2.0, None), (1, "a2", 10.0, None)],
        SCHEMA,
    ).coalesce(1)
    w.write(df)
    rows = duckdb.connect(duck_path).execute(
        "SELECT id, name, score FROM target ORDER BY id"
    ).fetchall()
    assert rows == [(1, "a2", 10.0), (2, "b", 2.0)]


def test_existing_columns_schema_qualified(duck_path):
    """Schema evolution must look only at the target's own schema — a
    same-named table elsewhere must not mask missing columns."""
    con = duckdb.connect(duck_path)
    con.execute("CREATE SCHEMA other")
    # decoy with the full column set in ANOTHER schema
    con.execute("CREATE TABLE other.target (id BIGINT, name TEXT, score DOUBLE, tags JSON, extra TEXT)")
    con.close()
    w = _writer(duck_path, WriteMode.MERGE, primary_key="id")
    w.prepare(SCHEMA)  # creates main.target without "extra"
    import pyspark.sql.types as T

    wider = T.StructType(SCHEMA.fields + [T.StructField("extra", T.StringType())])
    w.prepare(wider)  # must ALTER main.target despite the decoy
    cols = {
        r[0]
        for r in duckdb.connect(duck_path).execute(
            "SELECT column_name FROM information_schema.columns "
            "WHERE table_name='target' AND table_schema='main'"
        ).fetchall()
    }
    assert "extra" in cols
