"""Round-8 operators: independent pure-Python recounts (the third
implementation next to Spark and the DuckDB oracle), plus the
invariants each operator exists to provide."""

from __future__ import annotations

import math
from collections import Counter

from apitap_spark.session import read_table

MICRO = 1_000_000


def _round_half_away(x: float) -> int:
    return int(x + 0.5) if x >= 0 else -int(-x + 0.5)


def test_psi_drift_matches_python(spark, sf_dir):
    """Per-source PSI recomputed with exact Python ints + one float ln
    per cell; also the PSI invariant: every per-source PSI >= 0 (each
    term (p-q)ln(p/q) is non-negative)."""
    from apitap_spark.operators.quality import HIST_BUCKET_W, PSI_SCALE, op_psi_drift

    rows = read_table(spark, sf_dir, "documents").collect()
    per_src: dict[str, Counter] = {}
    for r in rows:
        per_src.setdefault(r["source"], Counter())[r["n_chars"] // HIST_BUCKET_W] += 1
    corpus = Counter()
    for c in per_src.values():
        corpus.update(c)
    nn = sum(corpus.values())
    nb = len(corpus)
    want = {}
    for src, cnt in per_src.items():
        n = sum(cnt.values())
        terms = []
        for b in corpus:
            s_nano = (cnt.get(b, 0) + 1) * PSI_SCALE // (n + nb)
            c_nano = (corpus[b] + 1) * PSI_SCALE // (nn + nb)
            terms.append(
                _round_half_away(
                    float(s_nano - c_nano) * math.log(float(s_nano) / float(c_nano)) / 1000.0
                )
            )
        want[src] = (n, nb, sum(terms), max(terms))
    got = {r["source"]: r for r in op_psi_drift(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for src, (n, b, psi, mx) in want.items():
        g = got[src]
        assert (g["n_docs"], g["n_buckets"], g["psi_micro"], g["max_term_micro"]) == (
            n, b, psi, mx,
        )
        # PSI is a sum of non-negative terms; integer rounding can only
        # shave each term by < 1 micro, so the sum stays >= -n_buckets
        assert g["psi_micro"] >= -b


def test_mutual_information_matches_python(spark, sf_dir):
    """MI / marginal entropies recomputed in Python; invariants:
    0 <= MI <= min(H(lang), H(source)) up to micro rounding, and
    0 <= NMI <= 1000 milli."""
    from apitap_spark.operators.quality import op_mutual_information

    rows = read_table(spark, sf_dir, "documents").collect()
    obs = Counter((r["lang"], r["source"]) for r in rows)
    rt = Counter()
    ct = Counter()
    for (a, b), c in obs.items():
        rt[a] += c
        ct[b] += c
    n = sum(obs.values())
    mi = sum(
        _round_half_away(
            float(c) * math.log(float(c * n) / float(rt[a] * ct[b])) * 1e6 / float(n)
        )
        for (a, b), c in obs.items()
    )
    ha = sum(
        _round_half_away(-float(r) * math.log(float(r) / float(n)) * 1e6 / float(n))
        for r in rt.values()
    )
    hb = sum(
        _round_half_away(-float(c) * math.log(float(c) / float(n)) * 1e6 / float(n))
        for c in ct.values()
    )
    nmi = mi * 1000 // int(math.floor(math.sqrt(float(ha * hb))))
    row = op_mutual_information(spark, sf_dir).collect()
    assert len(row) == 1
    g = row[0]
    assert (g["n"], g["mi_micro"], g["h_a_micro"], g["h_b_micro"], g["nmi_milli"]) == (
        n, mi, ha, hb, nmi,
    )
    cells = len(obs)
    assert -cells <= g["mi_micro"] <= min(ha, hb) + cells  # rounding slack
    assert 0 <= g["nmi_milli"] <= 1000


def test_kcore_peel_matches_python(spark, sf_dir):
    """Bounded peel trajectory recomputed from the raw events with a
    dict-of-sets graph; also the monotonicity invariant (survivors and
    edges never increase round over round)."""
    from apitap_spark.operators.graph import (
        KCORE_ROUNDS,
        TRI_NEXT_K,
        op_graph_kcore_peel,
    )

    ev = read_table(spark, sf_dir, "events").collect()
    buckets: dict[tuple, set] = {}
    for r in ev:
        b = r["ts"].replace(minute=0, second=0, microsecond=0)
        buckets.setdefault((b, r["event_type"]), set()).add(r["user_id"])
    edges = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, u in enumerate(ms):
            for j in range(i + 1, min(i + 1 + TRI_NEXT_K, len(ms))):
                edges.add((u, ms[j]))
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    k = 2 * len(edges) // len(adj) + 1
    want = [(0, k, len(adj), len(edges))]
    nodes = {n: set(ns) for n, ns in adj.items()}
    cur = set(edges)
    for r in range(1, KCORE_ROUNDS + 1):
        deg: dict[int, int] = {}
        for u, v in cur:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        surv = {n for n, d in deg.items() if d >= k}
        cur = {(u, v) for u, v in cur if u in surv and v in surv}
        want.append((r, k, len(surv), len(cur)))
    got = sorted(
        (r["peel_round"], r["k"], r["survivors"], r["edges_remaining"])
        for r in op_graph_kcore_peel(spark, sf_dir).collect()
    )
    assert got == want
    for (_, _, s0, e0), (_, _, s1, e1) in zip(got, got[1:]):
        assert s1 <= s0 and e1 <= e0


def test_mmr_rerank_matches_python(spark, sf_dir):
    """Greedy MMR replayed in numpy float64 with the same dim-sequential
    accumulation; selected ids + ranks must match exactly, and the
    diversity invariant holds: no id selected twice per query."""
    import numpy as np

    from apitap_spark.operators.similarity import (
        MMR_C,
        MMR_K,
        MMR_Q,
        op_mmr_diversity_rerank,
    )

    rows = read_table(spark, sf_dir, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    n = np.sqrt(np.cumsum(M * M, axis=1)[:, -1])
    want = {}
    for qi in range(MMR_Q):
        q = M[ids == qi][0]
        nq = float(np.sqrt(np.cumsum(q * q)[-1]))
        dots = np.zeros(len(ids))
        for k in range(M.shape[1]):
            dots += M[:, k] * q[k]
        rel = dots / (n * nq)
        order = sorted(
            [(float(rel[i]), int(ids[i])) for i in range(len(ids)) if ids[i] != qi],
            key=lambda t: (-t[0], t[1]),
        )[:MMR_C]
        cand_ids = [c for _, c in order]
        crel = {c: r for r, c in order}
        idx = {int(i): j for j, i in enumerate(ids)}
        sel: list[int] = []
        for step in range(1, MMR_K + 1):
            best = None
            for c in cand_ids:
                if c in sel:
                    continue
                if sel:
                    sims = []
                    for s in sel:
                        a, b = M[idx[c]], M[idx[s]]
                        d = 0.0
                        acc = np.zeros(1)
                        for k in range(len(a)):
                            acc += a[k] * b[k]
                        d = float(acc[0])
                        sims.append(d / (float(n[idx[c]]) * float(n[idx[s]])))
                    score = 0.7 * crel[c] - 0.3 * max(sims)
                else:
                    score = 0.7 * crel[c]
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c)
            sel.append(best[1])
            want[(qi, step)] = best[1]
    got = {
        (r["q_id"], r["sel_rank"]): r["c_id"]
        for r in op_mmr_diversity_rerank(spark, sf_dir).collect()
    }
    assert got == want
    for qi in range(MMR_Q):
        chosen = [got[(qi, s)] for s in range(1, MMR_K + 1)]
        assert len(set(chosen)) == MMR_K


def test_naive_bayes_matches_python(spark, sf_dir):
    """Full NB replay: train counts, micro-nat weights, per-doc argmin —
    the confusion matrix must match cell for cell, and its total must
    equal the number of non-empty odd-id docs."""
    import re

    from apitap_spark.operators.ml import op_ml_naive_bayes_lang

    docs = [
        r
        for r in read_table(spark, sf_dir, "documents").collect()
        if r["text"].strip()
    ]
    train = [r for r in docs if r["doc_id"] % 2 == 0]
    test = [r for r in docs if r["doc_id"] % 2 == 1]
    cw: Counter = Counter()
    nl: Counter = Counter()
    dl: Counter = Counter()
    vocab = set()
    for r in train:
        ws = re.split(r"\s+", r["text"].strip())
        dl[r["lang"]] += 1
        for w in ws:
            cw[(r["lang"], w)] += 1
            nl[r["lang"]] += 1
            vocab.add(w)
    V, D = len(vocab), sum(dl.values())
    langs = sorted(dl)
    nll = {
        (l, w): _round_half_away(-math.log((c + 1) / (nl[l] + V)) * 1e6)
        for (l, w), c in cw.items()
    }
    nll0 = {l: _round_half_away(math.log(nl[l] + V) * 1e6) for l in langs}
    prior = {l: _round_half_away(-math.log(dl[l] / D) * 1e6) for l in langs}
    conf: Counter = Counter()
    for r in test:
        ws = [w for w in re.split(r"\s+", r["text"].strip()) if w in vocab]
        scores = {}
        for l in langs:
            s = prior[l]
            for w in ws:
                s += nll.get((l, w), nll0[l])
            scores[l] = s
        pred = min(langs, key=lambda l: (scores[l], l))
        conf[(r["lang"], pred)] += 1
    got = {
        (r["lang_true"], r["lang_pred"]): r["n_docs"]
        for r in op_ml_naive_bayes_lang(spark, sf_dir).collect()
    }
    assert got == dict(conf)
    assert sum(got.values()) == len(test)


def test_zipf_fit_matches_python(spark, sf_dir):
    """Regression sums replayed exactly in Python ints; slope/intercept/
    r2 compared as exact doubles (same op order)."""
    import re

    from apitap_spark.operators.textstats import ZIPF_TOP, op_text_zipf_fit

    docs = read_table(spark, sf_dir, "documents").collect()
    cnt: Counter = Counter()
    for r in docs:
        t = r["text"].strip()
        if t:
            cnt.update(re.split(r"\s+", t))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP]
    pts = [
        (
            _round_half_away(math.log(i + 1) * 1e6),
            _round_half_away(math.log(c) * 1e6),
        )
        for i, (_, c) in enumerate(ranked)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    syy = sum(y * y for _, y in pts)
    num = float(n * sxy - sx * sy)
    dx = float(n * sxx - sx * sx)
    dy = float(n * syy - sy * sy)
    slope = num / dx
    row = op_text_zipf_fit(spark, sf_dir).collect()[0]
    assert row["n_terms"] == n
    assert row["top_count"] == ranked[0][1]
    assert row["slope"] == slope
    assert row["intercept"] == (float(sy) - slope * float(sx)) / (float(n) * 1e6)
    assert row["r2"] == num * num / (dx * dy)
    assert 0.0 <= row["r2"] <= 1.0


def test_adaboost_round_matches_python(spark, sf_dir):
    """Both boosting rounds replayed with exact integer weights; also the
    AdaBoost invariant: h1's own reweighted error is exactly 1/2 (the
    chosen weights make the previous stump uninformative), so h2's
    reweighted error is <= 500000 micro."""
    from apitap_spark.operators.ml import (
        GINI_DIMS,
        GINI_THRESHOLDS,
        op_ml_adaboost_stump_round,
    )

    rows = read_table(spark, sf_dir, "embeddings").collect()
    ex = []
    for r in rows:
        xs = [
            _round_half_away(float(v) * 1000)
            for v in r["embedding"][:GINI_DIMS]
        ]
        ex.append((r["label"] % 2, xs))
    N = len(ex)
    cands = [
        (d, t, pol)
        for d in range(1, GINI_DIMS + 1)
        for t in GINI_THRESHOLDS
        for pol in (0, 1)
    ]

    def mis(c):
        d, t, pol = c
        out = set()
        for i, (y, xs) in enumerate(ex):
            left = xs[d - 1] <= t
            pred = (1 if left else 0) if pol == 1 else (0 if left else 1)
            if pred != y:
                out.add(i)
        return out

    h1 = min(cands, key=lambda c: (len(mis(c)), c[0], c[1], c[2]))
    m1 = mis(h1)
    E = len(m1)

    def err2(c):
        m = mis(c)
        a = len(m & m1)
        b = len(m - m1)
        return (a * (N - E) + b * E) * 1000000 // (2 * E * (N - E))

    h2 = min(cands, key=lambda c: (err2(c), c[0], c[1], c[2]))
    got = {r["boost_round"]: r for r in op_ml_adaboost_stump_round(spark, sf_dir).collect()}
    g1, g2 = got[1], got[2]
    assert (g1["dim"], g1["thr_milli"], g1["pol"]) == h1
    assert g1["err_micro"] == E * 1000000 // N
    assert (g2["dim"], g2["thr_milli"], g2["pol"]) == h2
    assert g2["err_micro"] == err2(h2)
    assert err2(h1) == 500000  # uninformative after reweighting
    assert g2["err_micro"] <= 500000


def test_assortativity_matches_python(spark, sf_dir):
    """Endpoint-degree Pearson r recomputed with exact Python ints; the
    coefficient must be in [-1, 1]."""
    from apitap_spark.operators.graph import (
        TRI_NEXT_K,
        op_graph_assortativity,
    )

    ev = read_table(spark, sf_dir, "events").collect()
    buckets: dict[tuple, set] = {}
    for r in ev:
        b = r["ts"].replace(minute=0, second=0, microsecond=0)
        buckets.setdefault((b, r["event_type"]), set()).add(r["user_id"])
    edges = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, u in enumerate(ms):
            for j in range(i + 1, min(i + 1 + TRI_NEXT_K, len(ms))):
                edges.add((u, ms[j]))
    deg: Counter = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    pairs = [(deg[u], deg[v]) for u, v in edges] + [
        (deg[v], deg[u]) for u, v in edges
    ]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    sxy = sum(x * y for x, y in pairs)
    syy = sum(y * y for _, y in pairs)
    want = float(n * sxy - sx * sy) / math.sqrt(
        float(n * sxx - sx * sx) * float(n * syy - sy * sy)
    )
    row = op_graph_assortativity(spark, sf_dir).collect()[0]
    assert row["n_endpoint_pairs"] == n
    assert row["assortativity"] == want
    assert -1.0 <= row["assortativity"] <= 1.0


def test_boilerplate_prefix_matches_python(spark, sf_dir):
    """Top leading-prefix per source recomputed in Python; shares are
    exact micro integers and every share is <= 1e6."""
    import re

    from apitap_spark.operators.textstats import (
        BOILER_PREFIX_TOKENS,
        op_text_boilerplate_prefix,
    )

    docs = read_table(spark, sf_dir, "documents").collect()
    counts: dict[str, Counter] = {}
    for r in docs:
        t = r["text"].strip()
        if not t:
            continue
        ws = re.split(r"\s+", t)
        if len(ws) < BOILER_PREFIX_TOKENS:
            continue
        counts.setdefault(r["source"], Counter())[
            " ".join(ws[:BOILER_PREFIX_TOKENS])
        ] += 1
    want = {}
    for src, c in counts.items():
        n_src = sum(c.values())
        prefix, n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        want[src] = (prefix, n, n_src, n * 1000000 // n_src)
    got = {
        r["source"]: (r["prefix"], r["n_docs"], r["n_src"], r["share_micro"])
        for r in op_text_boilerplate_prefix(spark, sf_dir).collect()
    }
    assert got == want
    for _, _, _, share in got.values():
        assert 0 <= share <= 1000000


def test_matryoshka_audit_matches_numpy(spark, sf_dir):
    """Prefix-dim overlap@K replayed in numpy float64 (dim-sequential
    sums); invariants: overlap is monotone-ish in P only statistically,
    but every value sits in [0, Q*K] and the full-dim self-overlap
    would be exactly Q*K."""
    import numpy as np

    from apitap_spark.operators.similarity import (
        MAT_K,
        MAT_PREFIXES,
        MAT_Q,
        op_embedding_matryoshka_audit,
    )

    rows = read_table(spark, sf_dir, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])

    def topk(P):
        Mp = M[:, :P]
        n = np.sqrt(np.cumsum(Mp * Mp, axis=1)[:, -1])
        out = {}
        for qi in range(MAT_Q):
            qrow = Mp[ids == qi][0]
            nq = float(np.sqrt(np.cumsum(qrow * qrow)[-1]))
            dots = np.zeros(len(ids))
            for k in range(P):
                dots += Mp[:, k] * qrow[k]
            cos = dots / (n * nq)
            order = sorted(
                [
                    (float(cos[i]), int(ids[i]))
                    for i in range(len(ids))
                    if ids[i] != qi
                ],
                key=lambda t: (-t[0], t[1]),
            )[:MAT_K]
            out[qi] = {c for _, c in order}
        return out

    full = topk(M.shape[1])
    want = {}
    for p in MAT_PREFIXES:
        tp = topk(p)
        total = sum(len(tp[qi] & full[qi]) for qi in range(MAT_Q))
        want[p] = (total, total * 1000000 // (MAT_Q * MAT_K))
    got = {
        r["prefix_dims"]: (r["total_overlap"], r["mean_overlap_micro"])
        for r in op_embedding_matryoshka_audit(spark, sf_dir).collect()
    }
    assert got == want
    for total, _ in got.values():
        assert 0 <= total <= MAT_Q * MAT_K


def test_pass_at_k_matches_python(spark, sf_dir):
    """pass@k replayed with exact Python fractions -> float product;
    invariants: pass@k >= naive c>0 share... actually pass@k >= c/n-based
    lower bounds are not simple, so assert the exact-certainty cases:
    n - c < k  <=>  pass_micro == 1e6, and means sit in [0, 1e6]."""
    from apitap_spark.operators.ml import PASS_CUTOFF, PASS_K, op_eval_pass_at_k

    ev = read_table(spark, sf_dir, "events").collect()
    tasks: dict = {}
    for r in ev:
        key = (r["event_type"], r["user_id"])
        n, c = tasks.get(key, (0, 0))
        tasks[key] = (n + 1, c + (1 if r["value"] >= PASS_CUTOFF else 0))
    agg: dict = {}
    for (et, _), (n, c) in tasks.items():
        if n < PASS_K:
            continue
        prod = None
        for i in range(PASS_K):
            f = float(n - c - i) / float(n - i)
            prod = f if prod is None else prod * f
        pm = _round_half_away((1.0 - prod) * 1e6)
        tot, cnt, cert = agg.get(et, (0, 0, 0))
        agg[et] = (tot + pm, cnt + 1, cert + (1 if pm == 1000000 else 0))
    want = {
        et: (PASS_K, cnt, tot // cnt, cert)
        for et, (tot, cnt, cert) in agg.items()
    }
    got = {
        r["event_type"]: (r["k"], r["n_tasks"], r["mean_pass_micro"], r["n_certain"])
        for r in op_eval_pass_at_k(spark, sf_dir).collect()
    }
    assert got == want
    for _, _, mean, _ in got.values():
        assert 0 <= mean <= 1000000
    # exact-certainty equivalence on the replay side
    for (et, _), (n, c) in tasks.items():
        if n >= PASS_K and n - c < PASS_K:
            prod = 1.0
            for i in range(PASS_K):
                prod *= float(n - c - i) / float(n - i)
            assert prod == 0.0


def test_theta_overlap_matches_python(spark, sf_dir):
    """Theta-sketch intersection replayed with exact Python ints; also
    the exact-mode invariant: when BOTH sides are below k the estimate
    equals the true intersection."""
    import hashlib

    from apitap_spark.operators.quality import (
        KMV_K,
        _TWO60_INT,
        op_sketch_theta_overlap,
    )

    ev = read_table(spark, sf_dir, "events").collect()
    by_type: dict[str, set] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], set()).add(r["user_id"])

    def h60(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    sketches = {}
    thetas = {}
    for t, users in by_type.items():
        hs = sorted(h60(u) for u in users)
        sketches[t] = set(hs[:KMV_K])
        thetas[t] = _TWO60_INT if len(hs) < KMV_K else hs[KMV_K - 1]
    want = {}
    for a in by_type:
        for b in by_type:
            if a >= b:
                continue
            theta = min(thetas[a], thetas[b])
            n_sample = len(
                {x for x in sketches[a] & sketches[b] if x < theta}
            )
            est = int(
                math.floor(float(n_sample) * float(_TWO60_INT) / float(theta))
            )
            want[(a, b)] = (len(by_type[a] & by_type[b]), n_sample, est)
    got = {
        (r["type_a"], r["type_b"]): (
            r["n_exact"], r["n_sample"], r["theta_estimate"],
        )
        for r in op_sketch_theta_overlap(spark, sf_dir).collect()
    }
    assert got == want
    for (a, b), (n_exact, _, est) in got.items():
        if thetas[a] == _TWO60_INT and thetas[b] == _TWO60_INT:
            assert est == n_exact  # exact mode is exact by construction
