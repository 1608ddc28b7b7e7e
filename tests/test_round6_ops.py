"""Round-6 operators: independent pure-Python recounts (the third
implementation next to Spark and the DuckDB oracle), plus the
invariants each operator exists to provide."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from apitap_spark.session import read_table

MICRO = 1_000_000


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").collect()


def test_histogram_drift_l1_matches_python(spark, sf_dir):
    from apitap_spark.operators.quality import (
        HIST_BUCKET_W,
        op_histogram_drift_l1,
    )

    rows = _docs(spark, sf_dir)
    per = defaultdict(Counter)
    for r in rows:
        per[r["source"]][r["n_chars"] // HIST_BUCKET_W] += 1
    corpus = Counter()
    for c in per.values():
        corpus.update(c)
    nn = sum(corpus.values())
    got = {r["source"]: r for r in op_histogram_drift_l1(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for src, cnts in per.items():
        n = sum(cnts.values())
        gaps = [
            abs(cnts.get(b, 0) * MICRO // n - cb * MICRO // nn)
            for b, cb in corpus.items()
        ]
        g = got[src]
        assert g["n_docs"] == n
        assert g["l1_micro"] == sum(gaps)
        assert g["max_gap_micro"] == max(gaps)


def test_cramers_v_matches_python_and_bounds(spark, sf_dir):
    from apitap_spark.operators.quality import op_cramers_v_association

    rows = _docs(spark, sf_dir)
    obs = Counter((r["lang"], r["source"]) for r in rows)
    rt = Counter(r["lang"] for r in rows)
    ct = Counter(r["source"] for r in rows)
    n = len(rows)
    chi2_micro = 0
    for lang in rt:
        for src in ct:
            o = obs.get((lang, src), 0)
            num = (o * n - rt[lang] * ct[src]) ** 2
            den = n * rt[lang] * ct[src]
            chi2_micro += round(num / den * MICRO)
    g = op_cramers_v_association(spark, sf_dir).collect()[0]
    assert g["chi2_micro"] == chi2_micro
    minrc = min(len(rt) - 1, len(ct) - 1)
    assert g["v2_micro"] == chi2_micro // (n * minrc)
    # V^2 in [0, 1] (plus rounding slack)
    assert 0 <= g["v2_micro"] <= MICRO + 1


def test_bfs_hops_matches_python_bfs(spark, sf_dir):
    from apitap_spark.operators.graph import (
        BFS_MAX_HOPS,
        BFS_SEED_MOD,
        op_graph_bfs_hops,
    )

    ev = read_table(spark, sf_dir, "events").collect()
    buckets = defaultdict(set)
    for r in ev:
        b = r["ts"].replace(minute=0, second=0, microsecond=0)
        buckets[(b, r["event_type"])].add(r["user_id"])
    adj = defaultdict(set)
    for users in buckets.values():
        s = sorted(users)
        for a, b in zip(s, s[1:]):
            adj[a].add(b)
            adj[b].add(a)
    dist = {v: 0 for v in adj if v % BFS_SEED_MOD == 0}
    frontier = set(dist)
    for d in range(1, BFS_MAX_HOPS + 1):
        nxt = set()
        for v in frontier:
            for w in adj[v]:
                if w not in dist:
                    dist[w] = d
                    nxt.add(w)
        frontier = nxt
    got = {r["user_id"]: r["hops"] for r in op_graph_bfs_hops(spark, sf_dir).collect()}
    assert got == dist


def test_knn_label_accuracy_matches_numpy(spark, sf_dir):
    import numpy as np

    from apitap_spark.operators.similarity import (
        KNN_K,
        KNN_QUERY_CAP,
        op_knn_label_accuracy,
    )

    emb = read_table(spark, sf_dir, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in emb])
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    labels = np.array([r["label"] for r in emb])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    # round-7 sample rule: the KNN_QUERY_CAP ids with smallest md5 —
    # fixed-size hash-rank, replayed here independently
    sample = set(
        sorted(
            ids.tolist(),
            key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v),
        )[:KNN_QUERY_CAP]
    )
    n_q = Counter()
    n_ok = Counter()
    for qi in range(len(ids)):
        if ids[qi] not in sample:
            continue
        cos = Xn @ Xn[qi]
        order = sorted(
            (i for i in range(len(ids)) if i != qi),
            key=lambda i: (-cos[i], ids[i]),
        )[:KNN_K]
        votes = Counter(labels[i] for i in order)
        pred = min(votes, key=lambda lb: (-votes[lb], lb))
        n_q[labels[qi]] += 1
        n_ok[labels[qi]] += int(pred == labels[qi])
    got = {r["label"]: r for r in op_knn_label_accuracy(spark, sf_dir).collect()}
    assert set(got) == set(n_q)
    for lb in n_q:
        assert got[lb]["n_queries"] == n_q[lb]
        assert got[lb]["n_correct"] == n_ok[lb]
        assert got[lb]["acc_micro"] == n_ok[lb] * MICRO // n_q[lb]


def test_rp_sketch_exact_and_jl_preservation(spark, sf_dir):
    from apitap_spark.operators.similarity import (
        RP_DIM,
        RP_QSCALE,
        _rp_signs,
        op_embedding_rp_sketch,
    )

    signs = _rp_signs()
    assert len(signs) == RP_DIM and all(len(r) == 64 for r in signs)
    emb = read_table(spark, sf_dir, "embeddings").collect()
    got = {r["vec_id"]: r for r in op_embedding_rp_sketch(spark, sf_dir).collect()}
    ratios = []
    for r in emb:
        q = [round(float(x) * RP_QSCALE) for x in r["embedding"]]
        ys = [sum(a * s for a, s in zip(q, row)) for row in signs]
        g = got[r["vec_id"]]
        assert g["sketch"] == ",".join(str(y) for y in ys)
        l2 = sum(y * y for y in ys)
        assert g["sketch_l2sq"] == l2
        orig = sum(a * a for a in q)
        assert g["preservation_micro"] == l2 * MICRO // (RP_DIM * orig)
        ratios.append(g["preservation_micro"] / MICRO)
    # JL concentration: the mean preservation ratio is near 1 even though
    # individual rows vary (that variance is what the audit surfaces)
    mean = sum(ratios) / len(ratios)
    assert 0.7 < mean < 1.3


def test_gini_best_split_matches_python(spark, sf_dir):
    from apitap_spark.operators.ml import (
        GINI_DIMS,
        GINI_QSCALE,
        GINI_THRESHOLDS,
        op_gini_best_split,
    )

    emb = read_table(spark, sf_dir, "embeddings").collect()
    best = {}
    for d in range(1, GINI_DIMS + 1):
        xs = [
            (round(float(r["embedding"][d - 1]) * GINI_QSCALE), r["label"] % 2)
            for r in emb
        ]
        n = len(xs)
        p = sum(y for _, y in xs)
        for thr in GINI_THRESHOLDS:
            nl = sum(1 for x, _ in xs if x <= thr)
            pl = sum(y for x, y in xs if x <= thr)
            nr, pr = n - nl, p - pl
            lt = 0.0 if nl == 0 else pl * (nl - pl) / nl
            rt = 0.0 if nr == 0 else pr * (nr - pr) / nr
            gain = round(2.0 * (p * (n - p) / n - lt - rt) / n * MICRO)
            key = (gain, -thr)
            if d not in best or key > best[d][0]:
                best[d] = (key, thr, gain, nl, nr)
    got = {r["dim"]: r for r in op_gini_best_split(spark, sf_dir).collect()}
    assert set(got) == set(range(1, GINI_DIMS + 1))
    for d, (_, thr, gain, nl, nr) in best.items():
        g = got[d]
        assert (g["best_thr_milli"], g["gain_micro"]) == (thr, gain)
        assert (g["n_left"], g["n_right"]) == (nl, nr)


def test_substring_spans_matches_python(spark, sf_dir):
    from apitap_spark.operators.dedup import SPAN_L, op_dedup_substring_spans

    rows = _docs(spark, sf_dir)
    gram_docs = defaultdict(set)
    positions = defaultdict(list)
    for r in rows:
        t = r["text"]
        for pos in range(len(t) - SPAN_L + 1):
            gk = hashlib.md5(t[pos : pos + SPAN_L].encode()).hexdigest()
            gram_docs[gk].add(r["doc_id"])
            positions[r["doc_id"]].append((pos + 1, gk))
    per_doc = {}
    for r in rows:
        cand = sorted(
            p for p, gk in positions.get(r["doc_id"], [])
            if len(gram_docs[gk]) > 1
        )
        if not cand:
            continue
        spans = []
        start = prev = cand[0]
        for p in cand[1:]:
            if p - prev > SPAN_L:
                spans.append(prev - start + SPAN_L)
                start = p
            prev = p
        spans.append(prev - start + SPAN_L)
        per_doc[r["doc_id"]] = (sum(spans), len(spans))
    expect = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in rows:
        e = expect[r["source"]]
        e[0] += 1
        e[4] += len(r["text"])
        if r["doc_id"] in per_doc:
            chars, nsp = per_doc[r["doc_id"]]
            e[1] += 1
            e[2] += nsp
            e[3] += chars
    got = {r["source"]: r for r in op_dedup_substring_spans(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for src, (nd, ndup, nsp, chars, tot) in expect.items():
        g = got[src]
        assert (g["n_docs"], g["n_dup_docs"], g["n_spans"]) == (nd, ndup, nsp)
        assert g["dup_chars"] == chars
        assert g["total_chars"] == tot
        assert g["dup_ratio_micro"] == chars * MICRO // tot
        # spans can never cover more than the text
        assert chars <= tot


def test_quantile_binning_matches_python_and_balances(spark, sf_dir):
    from apitap_spark.operators.features import (
        QB_BINS,
        QB_UNIT,
        op_quantile_binning,
    )

    orders = read_table(spark, sf_dir, "orders").collect()
    xs = sorted(
        (int(r["o_totalprice"] * 100) // QB_UNIT, r["o_orderstatus"] == "F")
        for r in orders
    )
    n = len(xs)
    # edges: smallest unit value whose cumulative count reaches k*n/B
    cum = Counter()
    run = 0
    dv = []
    for v, _ in xs:
        cum[v] += 1
    edges = []
    seen = 0
    it = sorted(cum)
    for k in range(1, QB_BINS):
        seen = 0
        for v in it:
            seen += cum[v]
            if seen * QB_BINS >= k * n:
                edges.append(v)
                break
    expect = defaultdict(lambda: [0, 0, None, None])
    for v, y in xs:
        b = sum(1 for e in edges if e < v)
        e = expect[b]
        e[0] += 1
        e[1] += int(y)
        e[2] = v if e[2] is None else min(e[2], v)
        e[3] = v if e[3] is None else max(e[3], v)
    got = {r["bin"]: r for r in op_quantile_binning(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for b, (c, p, lo, hi) in expect.items():
        g = got[b]
        assert (g["n_rows"], g["n_flagged"]) == (c, p)
        assert g["flag_rate_micro"] == p * MICRO // c
        assert (g["lo_unit"], g["hi_unit"]) == (lo, hi)
    # equal-frequency property: every bin within 3x of the ideal share
    # (discretized values make perfect balance impossible)
    ideal = n / QB_BINS
    assert all(0 < v[0] <= 3 * ideal for v in expect.values())
