"""Continuous-sync (CDC-lite) example: Postgres → SQL transform → MERGE.

The round-trip a warehouse sync runs forever, using only this repo's
pieces — the streaming incremental Postgres source with the snapshot-
exact ``xmin_fence`` (so a transaction that commits AFTER a watermark
poll is never lost), a templated SQL transform per micro-batch, and
the idempotent MERGE-by-PK sink:

  orders (live Postgres, concurrent writers)
    → readStream.format("apitap_postgres")   high-watermark + xmin fence
    → module SQL (projection + filter)       per micro-batch
    → MERGE by primary key                   exactly-once end to end

Run:  sh tools/pg_local.sh start
      APITAP_PG_DSN="host=127.0.0.1 port=54329 user=postgres \
          dbname=postgres" python examples/cdc_pipeline.py

The demo seeds a table, drains it, then commits new rows while a
straggler transaction is still open mid-poll — the exact race a plain
watermark sync silently loses — and shows every committed row arriving
exactly once in the DuckDB replica at /tmp/cdc_demo.duckdb.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apitap_spark.config.models import load_config  # noqa: E402
from apitap_spark.pipeline.runner import run_module_stream  # noqa: E402
from apitap_spark.session import get_session  # noqa: E402
from apitap_spark.sinks import pgwire  # noqa: E402

TABLE = "cdc_demo_orders"
MODULE_SQL = """{{ sink('orders_replica') }}
SELECT id, status, amount, amount * 0.1 AS fee
FROM {{ use_source('orders') }}
WHERE status != 'void'
"""


def main() -> None:
    dsn = os.environ.get("APITAP_PG_DSN")
    if not dsn:
        sys.exit("set APITAP_PG_DSN (see module docstring)")
    duck_path = "/tmp/cdc_demo.duckdb"
    for stale in (duck_path, duck_path + ".wal"):
        if os.path.exists(stale):
            os.remove(stale)

    conn = pgwire.connect(dsn)
    cur = conn.cursor()
    cur.execute(f"DROP TABLE IF EXISTS {TABLE}")
    cur.execute(
        f"CREATE TABLE {TABLE} (id BIGINT NOT NULL, status TEXT,"
        " amount DOUBLE PRECISION)"
    )
    for i in range(1, 501):
        cur.execute(
            f"INSERT INTO {TABLE} VALUES (%s, %s, %s)",
            (i, "void" if i % 50 == 0 else "ok", float(i)),
        )
    conn.commit()

    mod_dir = "/tmp/cdc_demo_sql"
    os.makedirs(mod_dir, exist_ok=True)
    with open(os.path.join(mod_dir, "orders.sql"), "w") as f:
        f.write(MODULE_SQL)
    cfg = load_config(
        {
            "sources": [
                {
                    "name": "orders",
                    "kind": "postgres",
                    "dsn": dsn,
                    "table": TABLE,
                    "primary_key": "id",
                    "incremental": {"cursor_field": "id",
                                    "xmin_fence": True},
                }
            ],
            "targets": [
                {"name": "replica", "kind": "duckdb", "path": duck_path}
            ],
        }
    )

    spark = get_session("cdc-demo")
    ckpt = "/tmp/cdc_demo_ckpt"
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    q = run_module_stream(
        spark, cfg, mod_dir, "orders.sql", "replica", ckpt,
        max_rows_per_batch=100, poll_interval="0 seconds",
    )
    q.processAllAvailable()

    import duckdb

    def replica_count() -> int:
        c = duckdb.connect(duck_path, read_only=True)
        try:
            return c.execute(
                "SELECT COUNT(*) FROM orders_replica"
            ).fetchone()[0]
        finally:
            c.close()

    print(f"backfill drained: {replica_count()} rows (490 expected —"
          " 10 'void' filtered)")

    # The late-commit race, live: a straggler transaction INSERTs
    # id=501 but holds its commit while later ids 502..504 commit and
    # a poll runs. The xmin fence refuses to pass id=501 until the
    # straggler resolves — a plain watermark poll would mark 504 done
    # and lose 501 forever.
    straggler = pgwire.connect(dsn)
    straggler.cursor().execute(
        f"INSERT INTO {TABLE} VALUES (501, 'ok', 501.0)"
    )
    for i in (502, 503, 504):
        cur.execute(
            f"INSERT INTO {TABLE} VALUES (%s, %s, %s)", (i, "ok", float(i))
        )
    conn.commit()
    q.processAllAvailable()  # fence HOLDS: nothing past 500 ships yet
    held = replica_count()
    print(f"poll during open straggler txn: still {held} rows "
          "(501..504 fenced)")
    straggler.commit()
    straggler.close()
    q.processAllAvailable()  # fence promotes: 501..504 arrive in order
    print(f"after straggler commit: {replica_count()} rows "
          "(494 expected — nothing lost, nothing duplicated)")
    q.stop()

    cur.execute(f"DROP TABLE IF EXISTS {TABLE}")
    conn.commit()
    conn.close()
    spark.stop()
    print(f"replica at {duck_path}; restart with the same checkpoint "
          f"({ckpt}) to resume the sync where it left off")


if __name__ == "__main__":
    main()
