"""Pure-Python triangulation for the feature-engineering operators
(target encoding, Poisson bootstrap): Spark, DuckDB, and an independent
Python replay must agree bit-for-bit."""

from __future__ import annotations

import decimal
import hashlib
import math

from pyspark.sql import functions as F


def _cents(v: float) -> int:
    return int(
        decimal.Decimal(repr(v * 100.0)).quantize(
            0, rounding=decimal.ROUND_HALF_UP
        )
    )


def test_target_encoding_python_recount(spark, sf_dir):
    from apitap_spark.operators.features import TE_SMOOTH_M, op_target_encoding
    from apitap_spark.session import read_table

    rows = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    y = {r.o_orderkey: (r.o_orderpriority, _cents(r.o_totalprice)) for r in rows}
    s, n = {}, {}
    g_all = 0
    for cat, cents in y.values():
        s[cat] = s.get(cat, 0) + cents
        n[cat] = n.get(cat, 0) + 1
        g_all += cents
    n_all = len(y)
    got = {r.o_orderkey: r for r in op_target_encoding(spark, sf_dir).collect()}
    assert set(got) == set(y)
    for k, (cat, cents) in y.items():
        r = got[k]
        assert (r.cat, r.y_cents, r.n_cat) == (cat, cents, n[cat])
        if n[cat] > 1:
            assert r.loo_micro == math.floor(
                1000000.0 * float(s[cat] - cents) / float(n[cat] - 1)
            )
        else:
            assert r.loo_micro is None
        assert r.smoothed_micro == math.floor(
            1000000.0
            * (float(s[cat] - cents) + float(TE_SMOOTH_M) * (float(g_all) / float(n_all)))
            / float(n[cat] - 1 + TE_SMOOTH_M)
        )
    # encoding sanity: LOO codes of a category straddle its plain mean
    for cat in n:
        if n[cat] <= 1:
            continue
        mean = 1000000.0 * s[cat] / n[cat]
        lo = min(got[k].loo_micro for k, (c, _) in y.items() if c == cat)
        hi = max(got[k].loo_micro for k, (c, _) in y.items() if c == cat)
        assert lo <= mean <= hi + 1


def test_bootstrap_ci_python_recount(spark, sf_dir):
    from apitap_spark.operators.features import (
        BOOT_B,
        _POIS_CDF,
        _TWO60,
        op_bootstrap_ci_mean,
    )
    from apitap_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()

    def weight(doc_id: int, b: int) -> int:
        h = hashlib.md5(f"{doc_id}#{b}".encode()).hexdigest()[:15]
        u = float(int(h, 16)) / _TWO60
        for k, c in enumerate(_POIS_CDF):
            if u < c:
                return k
        return len(_POIS_CDF)

    by_src = {}
    for r in docs:
        by_src.setdefault(r.source, []).append((r.doc_id, r.n_chars))
    expect = {}
    for src, members in by_src.items():
        means = []
        for b in range(BOOT_B):
            n_eff = sw = 0
            for doc_id, n_chars in members:
                w = weight(doc_id, b)
                n_eff += w
                sw += w * n_chars
            m = (
                math.floor(1000000.0 * float(sw) / float(n_eff))
                if n_eff > 0
                else None
            )
            means.append((m if m is not None else -1, b, m))
        means.sort()
        point = math.floor(
            1000000.0
            * float(sum(c for _, c in members))
            / float(len(members))
        )
        expect[src] = (
            len(members),
            point,
            means[1][2],
            means[BOOT_B - 2][2],
        )
    got = {r.source: r for r in op_bootstrap_ci_mean(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for src, (n_docs, point, lo, hi) in expect.items():
        r = got[src]
        assert (r.n_docs, r.point_micro, r.lo_micro, r.hi_micro) == (
            n_docs,
            point,
            lo,
            hi,
        ), src
        assert r.spread_micro == hi - lo
        assert r.lo_micro <= r.hi_micro
