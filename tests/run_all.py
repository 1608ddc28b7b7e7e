"""One-command verification: pytest + strict audit + pandas mimic.

    python -m tests.run_all [--fast]

Chains, in order, the three checks a round freeze claims (round-3
verdict #7 — previously run ad hoc):

1. ``pytest tests/ -x -q``               (CI-style unit/property suite)
2. ``tests/strict_audit.py`` at sf0.001 AND sf0.01 (row-tuple exact
   value/string/type-category comparator over every oracled gate)
3. ``tests/pandas_mimic.py`` at sf0.01   (driver-faithful pandas
   canonicalization + dtype-sensitive hash — catches what row-tuple
   equality cannot, e.g. DuckDB HUGEINT->float64 drift)

``--fast`` skips pytest (the audits re-run every gate anyway and the
pytest suite takes ~5-9 min at sf0.001).

Exits 0 only when every stage passes.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(desc: str, cmd: list[str], env: dict | None = None) -> bool:
    print(f"\n=== {desc} ===", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    res = subprocess.run(cmd, cwd=REPO, env=e)
    ok = res.returncode == 0
    print(f"=== {desc}: {'PASS' if ok else 'FAIL'} ===", flush=True)
    return ok


def _maybe_pg_dsn() -> None:
    """Opt the pytest stage into the live-Postgres tests when the local
    throwaway server (tools/pg_local.sh start) is reachable — the sink's
    live evidence should ride every freeze run, not just manual ones."""
    if os.environ.get("APITAP_PG_DSN"):
        return
    import socket

    try:
        socket.create_connection(("127.0.0.1", 54329), timeout=0.5).close()
    except OSError:
        return
    os.environ["APITAP_PG_DSN"] = (
        "host=127.0.0.1 port=54329 user=postgres dbname=postgres"
    )
    print("live Postgres detected on :54329 — sink tests un-skipped")


def main() -> int:
    fast = "--fast" in sys.argv
    _maybe_pg_dsn()
    stages: list[tuple[str, list[str]]] = []
    if not fast:
        stages.append(
            ("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"])
        )
    stages += [
        (
            "strict audit sf0.001",
            [sys.executable, "tests/strict_audit.py", "9999",
             "/root/testdata/sf0.001"],
        ),
        (
            "strict audit sf0.01",
            [sys.executable, "tests/strict_audit.py", "9999",
             "/root/testdata/sf0.01"],
        ),
        (
            "pandas driver-mimic sf0.01",
            [sys.executable, "tests/pandas_mimic.py", "9999",
             "/root/testdata/sf0.01"],
        ),
    ]
    ok = True
    for desc, cmd in stages:
        ok = run(desc, cmd) and ok
        if not ok:
            break
    print("\nALL CHECKS PASS" if ok else "\nVERIFICATION FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
