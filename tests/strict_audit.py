"""Strict driver-hash-faithful audit of gate outputs.

The driver's CORRECTNESS value-hash is sensitive to the *textual/physical*
form of each cell (round 1: `q_projection_alias` had value-identical
Decimals but hash_match:false because Spark emitted decimal(22,3) vs
DuckDB's decimal(21,3)).  This audit is stricter than
``tests/oracle_harness.py``: a cell only passes when

* ``sv == ov`` exactly (no float tolerance), AND
* ``str(sv) == str(ov)`` (catches Decimal scale drift, 1 vs 1.0, etc), AND
* the Python type *category* matches (int vs Decimal vs float vs str).

Run:  python tests/strict_audit.py [N_GATES=all] [SF_DIR=/root/testdata/sf0.01]
"""

from __future__ import annotations

import datetime
import decimal
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_harness import duck_connection  # noqa: E402


def _cat(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, datetime.datetime):
        return "timestamp"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, (list, tuple)):
        return "array"
    if isinstance(v, dict):
        return "map"
    return type(v).__name__


def _strform(v) -> str:
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_strform(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_strform(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _sort_key(row):
    return tuple(_strform(x) if x is not None else "\x00" for x in row)


def audit(spark, names: list[str], sf_dir: str):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duck_connection(sf_dir)
    report = []
    for name in names:
        if name not in oracles:
            report.append((name, "ROWS-ONLY", []))
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            cur = con.execute(oracles[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            report.append((name, "ERROR", [str(e)[:300]]))
            continue
        issues = []
        if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in o_cols):
            issues.append(f"cols: {sorted(s_cols)} vs {sorted(o_cols)}")
        elif len(s_rows) != len(o_rows):
            issues.append(f"rows: {len(s_rows)} vs {len(o_rows)}")
        else:
            s_ord = sorted(range(len(s_cols)), key=lambda i: s_cols[i].lower())
            o_ord = sorted(range(len(o_cols)), key=lambda i: o_cols[i].lower())
            sn = sorted((tuple(r[i] for i in s_ord) for r in s_rows), key=_sort_key)
            on = sorted((tuple(r[i] for i in o_ord) for r in o_rows), key=_sort_key)
            cols_sorted = [s_cols[i] for i in s_ord]
            seen_cols = set()
            for sr, orr in zip(sn, on):
                for ci, (sv, ov) in enumerate(zip(sr, orr)):
                    col = cols_sorted[ci]
                    if col in seen_cols:
                        continue
                    if _cat(sv) != _cat(ov):
                        issues.append(
                            f"type[{col}]: {_cat(sv)}({_strform(sv) if sv is not None else ''})"
                            f" vs {_cat(ov)}({_strform(ov) if ov is not None else ''})"
                        )
                        seen_cols.add(col)
                    elif sv != ov or _strform(sv) != _strform(ov):
                        issues.append(
                            f"value[{col}]: {_strform(sv)!r} vs {_strform(ov)!r}"
                        )
                        seen_cols.add(col)
                if len(seen_cols) == len(cols_sorted):
                    break
        report.append((name, "FAIL" if issues else "OK", issues[:6]))
    return report


if __name__ == "__main__":
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    from apitap_spark.session import get_session

    spark = get_session(app_name="strict-audit")
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    if len(sys.argv) > 1:  # optional cap: audit only the first N gates
        names = names[: int(sys.argv[1])]
    bad = 0
    for name, status, issues in audit(spark, names, sf_dir):
        if status != "OK":
            bad += status == "FAIL" or status == "ERROR"
            print(f"{status:9s} {name}")
            for i in issues:
                print(f"          {i}")
        else:
            print(f"OK        {name}")
    print(f"\n{bad} gate(s) need attention")
    sys.exit(1 if bad else 0)
