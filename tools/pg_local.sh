#!/bin/sh
# Bootstrap a throwaway local PostgreSQL for the live sink tests.
#
#   sh tools/pg_local.sh start   # initdb + start on 127.0.0.1:54329
#   sh tools/pg_local.sh stop
#
# Then:
#   APITAP_PG_DSN="host=127.0.0.1 port=54329 user=postgres dbname=postgres" \
#     python -m pytest tests/test_sink_postgres.py -q
#
# Works as root (Postgres refuses root, so a pguser is created) or as a
# regular user. Data lives in /tmp/pgdata (throwaway by design). No
# Python driver is needed: tests fall back to apitap_spark.sinks.pgwire,
# the dependency-free protocol-v3 client.
set -e
PGDATA=/tmp/pgdata
PORT=54329
RUN=""
if [ "$(id -u)" = "0" ]; then
    id pguser >/dev/null 2>&1 || useradd -m pguser
    chown -R pguser /tmp/pgsock 2>/dev/null || true
    RUN="su pguser -c"
fi

run() {
    if [ -n "$RUN" ]; then $RUN "$*"; else sh -c "$*"; fi
}

case "${1:-start}" in
start)
    # Idempotent: if a postmaster already serves this data dir, just
    # print the DSN and exit 0 (a second 'start' used to die on the
    # postmaster lock file even though the running server is fine).
    if run "pg_ctl -D $PGDATA status" >/dev/null 2>&1; then
        echo "already running"
        echo "DSN: host=127.0.0.1 port=$PORT user=postgres dbname=postgres"
        exit 0
    fi
    mkdir -p /tmp/pgsock
    [ "$(id -u)" = "0" ] && chown pguser /tmp/pgsock
    if [ ! -d "$PGDATA" ]; then
        mkdir -p "$PGDATA"
        [ "$(id -u)" = "0" ] && chown pguser "$PGDATA"
        run "initdb -D $PGDATA -A trust -U postgres" >/dev/null
    fi
    # Self-signed cert so the server also accepts TLS connections
    # (sslmode=require / SCRAM-SHA-256-PLUS tests); non-SSL clients are
    # unaffected — the SSLRequest dance negotiates per connection.
    SSLOPTS=""
    if command -v openssl >/dev/null 2>&1; then
        if [ ! -f "$PGDATA/server.crt" ]; then
            openssl req -new -x509 -days 3650 -nodes -text \
                -subj "/CN=localhost" \
                -keyout "$PGDATA/server.key" -out "$PGDATA/server.crt" \
                >/dev/null 2>&1
            chmod 600 "$PGDATA/server.key"
            [ "$(id -u)" = "0" ] && chown pguser "$PGDATA/server.key" "$PGDATA/server.crt"
        fi
        [ -f "$PGDATA/server.crt" ] && SSLOPTS=" -c ssl=on"
    fi
    run "pg_ctl -D $PGDATA -o '-k /tmp/pgsock -p $PORT -c listen_addresses=127.0.0.1$SSLOPTS' -l /tmp/pg.log start"
    echo "DSN: host=127.0.0.1 port=$PORT user=postgres dbname=postgres"
    ;;
stop)
    run "pg_ctl -D $PGDATA stop" || true
    ;;
*)
    echo "usage: $0 start|stop" >&2
    exit 2
    ;;
esac
