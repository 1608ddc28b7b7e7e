"""Round-10 new operators: independent pure-Python recounts (the third
implementation next to Spark and the DuckDB oracle) plus each
operator's defining invariant (blocking precision<=1 and the
perfect-block edge case, W1 triangle/zero properties, Markov drift
bounded by the two distributions' total mass)."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from apitap_spark.session import read_table

MICRO = 1_000_000


# --- op_dedup_blocking_audit -------------------------------------------------


def _truth_pairs(rows, df_cap_fraction):
    """Exact df-capped 3-gram Jaccard >= 0.2 pairs (mirrors dedup.py)."""
    shingles = {}
    for r in rows:
        ws = re.split(r"\s+", r["text"].strip())
        shingles[r["doc_id"]] = {
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        }
    df = Counter(s for ss in shingles.values() for s in ss)
    cap = max(2, int(df_cap_fraction * len(rows)))
    shingles = {
        d: {s for s in ss if df[s] <= cap} for d, ss in shingles.items()
    }
    inv = defaultdict(set)
    for d, ss in shingles.items():
        for s in ss:
            inv[s].add(d)
    cand = {
        (a, b)
        for ds in inv.values()
        for a in ds
        for b in ds
        if a < b
    }
    out = set()
    for a, b in cand:
        i = len(shingles[a] & shingles[b])
        u = len(shingles[a] | shingles[b])
        if u and i / u >= 0.2:
            out.add((a, b))
    return out


def test_blocking_audit_matches_python(spark, sf_dir):
    from apitap_spark.operators.dedup import (
        BLOCK_LEN_BUCKET,
        DF_CAP_FRACTION,
        EDIT_HEAD_TOKENS,
        op_dedup_blocking_audit,
    )

    rows = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    ).collect()
    truth = _truth_pairs(rows, DF_CAP_FRACTION)
    keys = {
        f"head{EDIT_HEAD_TOKENS}": lambda r: " ".join(
            re.split(r"\s+", r["text"].strip())[:EDIT_HEAD_TOKENS]
        ),
        f"len{BLOCK_LEN_BUCKET}": lambda r: str(
            r["n_chars"] // BLOCK_LEN_BUCKET
        ),
        # None (NULL-propagating concat) = "cannot block this doc":
        # excluded from candidate AND caught counts, like both engines
        "lang_source": lambda r: (
            None
            if r["lang"] is None or r["source"] is None
            else f"{r['lang']}|{r['source']}"
        ),
    }
    n = len(rows)
    got = {
        r["strategy"]: r for r in op_dedup_blocking_audit(spark, sf_dir).collect()
    }
    assert set(got) == set(keys)
    for strat, keyfn in keys.items():
        k = {
            r["doc_id"]: keyfn(r)
            for r in rows
            if keyfn(r) is not None
        }
        sizes = Counter(k.values())
        candidates = sum(c * (c - 1) // 2 for c in sizes.values())
        caught = sum(
            1 for a, b in truth
            if a in k and b in k and k[a] == k[b]
        )
        g = got[strat]
        assert g["candidate_pairs"] == candidates
        assert g["truth_pairs"] == len(truth)
        assert g["caught_pairs"] == caught
        assert g["precision_micro"] == (
            0 if candidates == 0 else caught * MICRO // candidates
        )
        assert g["recall_micro"] == (
            0 if not truth else caught * MICRO // len(truth)
        )
        assert g["candidate_share_micro"] == candidates * MICRO // (
            n * (n - 1) // 2
        )
        # invariants: precision/recall/share are proper fractions
        assert 0 <= g["precision_micro"] <= MICRO
        assert 0 <= g["recall_micro"] <= MICRO
        assert 0 <= g["candidate_share_micro"] <= MICRO


def test_blocking_audit_truth_is_nonvacuous(spark, sf_dir):
    """The gate is meaningless if the truth set is empty (0/0 hashes
    green) — assert planted near-dups exist at the driver SFs."""
    from apitap_spark.operators.dedup import op_dedup_blocking_audit

    g = op_dedup_blocking_audit(spark, sf_dir).collect()
    assert g[0]["truth_pairs"] > 0
    # and at least one strategy actually catches something
    assert any(r["caught_pairs"] > 0 for r in g)


# --- op_drift_wasserstein ----------------------------------------------------


def _w1_scaled(xs, ys):
    """Exact W1 * len(xs) * len(ys) over integer samples."""
    vals = sorted(set(xs) | set(ys))
    cx = cy = 0
    xs_c, ys_c = Counter(xs), Counter(ys)
    total = 0
    for v, v_next in zip(vals, vals[1:]):
        cx += xs_c[v]
        cy += ys_c[v]
        total += abs(cx * len(ys) - cy * len(xs)) * (v_next - v)
    return total


def test_wasserstein_matches_python(spark, sf_dir):
    from apitap_spark.operators.quality import op_drift_wasserstein

    rows = read_table(spark, sf_dir, "documents").select(
        "source", "n_chars"
    ).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r["n_chars"])
    got = {r["source"]: r for r in op_drift_wasserstein(spark, sf_dir).collect()}
    assert set(got) == set(by_src)
    for src, xs in by_src.items():
        rest = [v for s, vs in by_src.items() if s != src for v in vs]
        w1 = _w1_scaled(xs, rest)
        g = got[src]
        assert g["n_source"] == len(xs) and g["n_rest"] == len(rest)
        assert g["w1_scaled"] == w1
        assert g["w1_milli"] == w1 * 1000 // (len(xs) * len(rest))


def test_wasserstein_closed_forms():
    # identical samples -> 0; disjoint point masses -> |a-b| * n^2
    assert _w1_scaled([5, 7, 9], [5, 7, 9]) == 0
    assert _w1_scaled([0, 0], [10, 10]) == 10 * 2 * 2
    # shift invariant magnitude: shifting one sample by d adds n^2*d
    assert _w1_scaled([1, 2, 3], [2, 3, 4]) == 1 * 3 * 3


# --- op_markov_stationarity_drift ------------------------------------------


def test_markov_stationarity_drift_matches_python(spark, sf_dir):
    """Independent Python recount: per-user consecutive pairs split at
    the fixed epoch-micros boundary; per-half row-normalized micros;
    L1 per from-state. Must agree with the Spark frame exactly."""
    from apitap_spark.operators.temporal import (
        _DRIFT_SPLIT_US,
        op_markov_stationarity_drift,
    )

    rows = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        "event_type",
    ).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["us"], r["event_id"], r["event_type"]))
    n = {1: Counter(), 2: Counter()}  # period -> (from, to) -> count
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (us_b, _, b) in zip(seq, seq[1:]):
            n[1 if us_b < _DRIFT_SPLIT_US else 2][(a, b)] += 1
    tot = {p: Counter() for p in (1, 2)}
    for p in (1, 2):
        for (a, _), c in n[p].items():
            tot[p][a] += c
    probs = {
        p: {(a, b): c * MICRO // tot[p][a] for (a, b), c in n[p].items()}
        for p in (1, 2)
    }
    want = {}
    for a in set(tot[1]) & set(tot[2]):  # both-halves contract
        cells = {b for (x, b) in probs[1] if x == a} | {
            b for (x, b) in probs[2] if x == a
        }
        l1 = sum(
            abs(probs[1].get((a, b), 0) - probs[2].get((a, b), 0))
            for b in cells
        )
        want[a] = (tot[1][a], tot[2][a], l1)
    got = {
        r["from_type"]: (r["pairs_h1"], r["pairs_h2"], r["l1_micro"])
        for r in op_markov_stationarity_drift(spark, sf_dir).collect()
    }
    assert got == want
    # non-vacuity: the fixed epoch split must actually bisect the
    # corpus — an empty half would make this (and the oracle compare)
    # a meaningless 0-rows == 0-rows green after a testdata regen
    assert want and tot[1] and tot[2]
    # drift is bounded by 2e6 micros (two distributions' total mass)
    for _, _, l1 in got.values():
        assert 0 <= l1 <= 2 * MICRO
