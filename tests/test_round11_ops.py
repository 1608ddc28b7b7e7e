"""Round-11 operators: independent pure-Python recounts (the third
implementation next to Spark and the DuckDB oracle) plus the invariant
each operator exists to provide (chi² non-negativity and its collapse
on uniform data, skew ratio ≥ 1, novelty telescoping to the distinct
gram count)."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from apitap_spark.session import read_table

MICRO = 1_000_000


def _events_rows(spark, sf_dir):
    return read_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts"
    ).collect()


# --- op_event_seasonality -------------------------------------------------


def test_event_seasonality_matches_python(spark, sf_dir):
    from apitap_spark.operators.temporal import op_event_seasonality

    import calendar

    bins: dict = defaultdict(Counter)
    for r in _events_rows(spark, sf_dir):
        # collected datetimes are session-tz (UTC) wall clocks; timegm
        # treats the naive value as UTC regardless of the host tz
        epoch = calendar.timegm(r["ts"].timetuple())
        bins[r["event_type"]][(epoch // 3600) % 24] += 1
    got = {r["event_type"]: r for r in op_event_seasonality(spark, sf_dir).collect()}
    assert set(got) == set(bins)
    for et, cnt in bins.items():
        n = sum(cnt.values())
        so2 = sum(o * o for o in cnt.values())
        peak_hour = min(cnt, key=lambda h: (-cnt[h], h))
        g = got[et]
        assert g["n_events"] == n
        assert g["n_hours"] == len(cnt)
        assert g["peak_hour"] == peak_hour
        assert g["peak_share_micro"] == cnt[peak_hour] * MICRO // n
        d = 24 * so2 - n * n
        assert d >= 0  # Cauchy-Schwarz: chi2 is non-negative
        assert g["chi2_uniform_micro"] == d // n * MICRO + d % n * MICRO // n


def test_epoch_buckets_floor_for_pre_1970(spark):
    """Round-8 ADVICE #5 regression: pre-1970 (negative-epoch)
    timestamps — including fractional seconds — must land in the TRUE
    containing hour on BOTH engines. 1969-12-31 23:59:59.5 lives in
    hour 23 of Dec 31, not hour 0 of Jan 1; truncating division put it
    in 0 on one engine and 23 on the other."""
    import duckdb

    rows = [
        ("1969-12-31 23:59:59.5", 23),  # fractional negative second
        ("1969-12-31 23:00:00", 23),
        ("1969-12-31 22:59:59", 22),
        ("1970-01-01 00:00:00.5", 0),
        ("1932-04-01 07:30:00", 7),
    ]
    # Spark side: the exact expression op_event_seasonality uses
    df = spark.createDataFrame(
        [(s,) for s, _ in rows], ["s"]
    ).selectExpr(
        "s",
        "pmod(CAST(CAST(s AS TIMESTAMP) AS LONG) div 3600"
        " - (CASE WHEN CAST(CAST(s AS TIMESTAMP) AS LONG) % 3600 < 0"
        "    THEN 1 ELSE 0 END), 24) AS h",
    )
    got_spark = {r["s"]: r["h"] for r in df.collect()}
    # DuckDB side: the exact expression the oracle uses
    con = duckdb.connect()
    got_duck = {}
    for s, _ in rows:
        (es,) = con.execute(
            "SELECT epoch_us(CAST(? AS TIMESTAMP)) // 1000000"
            " - CASE WHEN epoch_us(CAST(? AS TIMESTAMP)) % 1000000 < 0"
            "   THEN 1 ELSE 0 END",
            [s, s],
        ).fetchone()
        (h,) = con.execute(
            "SELECT ((? // 3600 - CASE WHEN ? % 3600 < 0 THEN 1 ELSE 0 END)"
            " % 24 + 24) % 24",
            [es, es],
        ).fetchone()
        got_duck[s] = h
    for s, want in rows:
        assert got_spark[s] == want, (s, got_spark[s])
        assert got_duck[s] == want, (s, got_duck[s])


def test_event_seasonality_chi2_zero_iff_uniform():
    # invariant check on the closed form itself: a perfectly uniform
    # 24-bin histogram collapses (24*so2 - n^2) to exactly zero
    o = [7] * 24
    n, so2 = sum(o), sum(x * x for x in o)
    assert 24 * so2 - n * n == 0


# --- op_data_skew_audit ---------------------------------------------------


def test_data_skew_audit_matches_python(spark, sf_dir):
    from apitap_spark.operators.planning import op_data_skew_audit

    per_key: dict = defaultdict(Counter)
    for r in _events_rows(spark, sf_dir):
        per_key[r["event_type"]][r["user_id"]] += 1
    got = {r["event_type"]: r for r in op_data_skew_audit(spark, sf_dir).collect()}
    assert set(got) == set(per_key)
    for et, cnt in per_key.items():
        n_rows = sum(cnt.values())
        n_keys = len(cnt)
        mx = max(cnt.values())
        g = got[et]
        assert g["n_rows"] == n_rows
        assert g["n_keys"] == n_keys
        assert g["max_key_rows"] == mx
        assert g["max_share_micro"] == mx * MICRO // n_rows
        assert g["hot_keys"] == sum(
            1 for c in cnt.values() if c * n_keys >= 2 * n_rows
        )
        p = mx * n_keys
        assert g["skew_micro"] == (
            p // n_rows * MICRO + p % n_rows * MICRO // n_rows
        )
        # max/mean ratio is >= 1 by construction
        assert g["skew_micro"] >= MICRO


# --- op_text_ngram_novelty ------------------------------------------------


def _doc_grams(spark, sf_dir, n=3):
    out = {}
    for r in (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    ):
        text = r["text"] or ""
        if not text.strip():
            continue
        t = re.split(r"\s+", text.strip())
        out[r["doc_id"]] = {
            " ".join(t[i : i + n]) for i in range(len(t) - n + 1)
        }
    return out


def test_text_ngram_novelty_matches_python(spark, sf_dir):
    from apitap_spark.operators.dedup import op_text_ngram_novelty

    grams = _doc_grams(spark, sf_dir)
    first: dict = {}
    for doc_id in sorted(grams):
        for g in grams[doc_id]:
            first.setdefault(g, doc_id)
    got = {
        r["doc_id"]: r for r in op_text_ngram_novelty(spark, sf_dir).collect()
    }
    assert set(got) == {d for d, gs in grams.items() if gs}
    total_novel = 0
    for doc_id, gs in grams.items():
        if not gs:
            continue
        novel = sum(1 for g in gs if first[g] == doc_id)
        total_novel += novel
        row = got[doc_id]
        assert row["n_grams"] == len(gs)
        assert row["n_novel"] == novel
        assert row["novelty_micro"] == novel * MICRO // len(gs)
    # telescoping invariant: every distinct gram is novel exactly once
    assert total_novel == len(first)
    # non-vacuous: the first doc is fully novel, later dups are not
    assert any(r["novelty_micro"] < MICRO for r in got.values())


# --- op_dedup_cluster_size_histogram --------------------------------------


def test_cluster_size_histogram_matches_clusters(spark, sf_dir):
    from collections import Counter

    from apitap_spark.operators.dedup import (
        op_dedup_cluster_size_histogram,
        op_dedup_clusters,
    )

    cl = [r["cluster_id"] for r in op_dedup_clusters(spark, sf_dir).collect()]
    sizes = Counter(Counter(cl).values())  # size -> n_clusters
    total = len(cl)
    got = {
        r["cluster_size"]: r
        for r in op_dedup_cluster_size_histogram(spark, sf_dir).collect()
    }
    assert set(got) == set(sizes)
    for sz, n_cl in sizes.items():
        row = got[sz]
        assert row["n_clusters"] == n_cl
        assert row["n_docs"] == sz * n_cl
        assert row["docs_share_micro"] == sz * n_cl * MICRO // total
    # partition of the corpus: shares' doc counts sum to every doc
    assert sum(r["n_docs"] for r in got.values()) == total
    # non-vacuous: the corpus has planted near-dups -> some size >= 2
    assert max(sizes) >= 2


# --- op_event_gap_quantiles -----------------------------------------------


def test_event_gap_quantiles_matches_python(spark, sf_dir):
    import calendar

    from apitap_spark.operators.temporal import op_event_gap_quantiles

    rows = (
        read_table(spark, sf_dir, "events")
        .select("event_type", "user_id", "ts", "event_id")
        .collect()
    )
    series: dict = defaultdict(list)
    for r in rows:
        series[(r["event_type"], r["user_id"])].append(
            (calendar.timegm(r["ts"].timetuple()), r["event_id"])
        )
    gaps: dict = defaultdict(list)
    for (et, _uid), evs in series.items():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            gaps[et].append(b[0] - a[0])
    got = {
        r["event_type"]: r
        for r in op_event_gap_quantiles(spark, sf_dir).collect()
    }
    assert set(got) == {et for et, g in gaps.items() if g}
    for et, g in gaps.items():
        if not g:
            continue
        g.sort()
        n = len(g)
        row = got[et]
        assert row["n_gaps"] == n
        assert row["p50_sec"] == g[(n + 1) // 2 - 1]
        assert row["p90_sec"] == g[(9 * n + 9) // 10 - 1]
        assert row["max_sec"] == g[-1]
        # quantile ordering invariant
        assert row["p50_sec"] <= row["p90_sec"] <= row["max_sec"]
