"""Round-10 operators: independent pure-Python recounts (the third
implementation next to Spark and the DuckDB oracle) plus the invariant
each operator exists to provide (nDCG bounds, U-statistic symmetry,
conformal coverage floor, trust-mass conservation)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from apitap_spark.session import read_table

MICRO = 1_000_000


# --- op_ann_ndcg_audit ----------------------------------------------------


def test_ndcg_audit_matches_python(spark, sf_dir):
    from apitap_spark.operators.similarity import (
        NDCG_DISC_MICRO,
        NDCG_IDCG_MICRO,
        NDCG_K,
        op_ann_cosine_topk,
        op_ann_lsh_bucketed,
        op_ann_ndcg_audit,
    )

    exact = {
        (r["q_id"], r["c_id"]): r["rk"]
        for r in op_ann_cosine_topk(spark, sf_dir).collect()
    }
    lsh = [
        (r["q_id"], r["c_id"], r["rk"])
        for r in op_ann_lsh_bucketed(spark, sf_dir).collect()
    ]
    dcg = defaultdict(int)
    hits = defaultdict(int)
    k_lsh = defaultdict(int)
    for q, c, rk in lsh:
        k_lsh[q] += 1
        rel = NDCG_K + 1 - exact[(q, c)] if (q, c) in exact else 0
        if rel > 0:
            hits[q] += 1
        dcg[q] += rel * NDCG_DISC_MICRO[rk - 1]
    got = {r["q_id"]: r for r in op_ann_ndcg_audit(spark, sf_dir).collect()}
    assert set(got) == set(k_lsh)
    for q, g in got.items():
        assert g["k_lsh"] == k_lsh[q]
        assert g["n_hits"] == hits[q]
        assert g["dcg_micro"] == dcg[q]
        assert g["ndcg_micro"] == dcg[q] * MICRO // NDCG_IDCG_MICRO
        # nDCG is a [0, 1] score; perfect only when every exact top-k
        # item is retrieved at its exact rank
        assert 0 <= g["ndcg_micro"] <= MICRO
        if g["ndcg_micro"] == MICRO:
            assert g["n_hits"] == NDCG_K
    # the audit must not be vacuous: at least one query retrieves at
    # least one exact-top-k item through the LSH index
    assert any(g["n_hits"] > 0 for g in got.values())


# --- op_ab_test_mann_whitney ----------------------------------------------


def test_mann_whitney_matches_python(spark, sf_dir):
    import math

    from apitap_spark.operators.ml import op_ab_test_mann_whitney

    rows = read_table(spark, sf_dir, "events").collect()
    by_type = defaultdict(list)
    for r in rows:
        x = int(round(r["value"] * 100))
        by_type[r["event_type"]].append((x, r["user_id"] % 2))
    got = {
        r["event_type"]: r
        for r in op_ab_test_mann_whitney(spark, sf_dir).collect()
    }
    assert set(got) == set(by_type)
    for et, vals in by_type.items():
        vals.sort()
        na = sum(1 for _, g in vals if g == 0)
        nb = len(vals) - na
        # doubled average ranks per tie group
        r1_double = 0
        tie3 = 0
        i = 0
        while i < len(vals):
            j = i
            while j < len(vals) and vals[j][0] == vals[i][0]:
                j += 1
            c = j - i
            dr = 2 * i + c + 1  # 2 * average rank (1-based)
            r1_double += dr * sum(1 for k in range(i, j) if vals[k][1] == 0)
            if c > 1:
                tie3 += c * c * c - c
            i = j
        u2 = r1_double - na * (na + 1)
        e2 = na * nb
        n = na + nb
        var = (
            float(na * nb)
            * float((n + 1) * n * (n - 1) - tie3)
            / 12.0
            / float(n)
            / float(n - 1)
        )
        z_micro = math.floor(1e6 * float(u2 - e2) / 2.0 / math.sqrt(var))
        g = got[et]
        assert g["na"] == na and g["nb"] == nb
        assert g["u2"] == u2 and g["e2"] == e2 and g["tie3"] == tie3
        assert g["z_micro"] == z_micro
        assert g["significant"] == (abs(z_micro) >= 1959964)
        # U symmetry: U1 + U2 = na*nb  (doubled: u2 + u2' = 2*na*nb)
        r2_double = n * (n + 1) - r1_double
        assert u2 + (r2_double - nb * (nb + 1)) == 2 * na * nb


# --- op_conformal_interval_audit ------------------------------------------


def _conf_fold(doc_id: int, salt: str) -> int:
    h = hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()
    return int(h[:15], 16) % 4


def test_conformal_interval_matches_python(spark, sf_dir):
    from apitap_spark.operators.ml import (
        CONF_SALT,
        op_conformal_interval_audit,
    )

    rows = read_table(spark, sf_dir, "documents").collect()
    train = defaultdict(list)
    cal = defaultdict(list)
    test = defaultdict(list)
    for r in rows:
        f = _conf_fold(r["doc_id"], CONF_SALT)
        if f <= 1:
            train[r["source"]].append(r["n_chars"])
        elif f == 2:
            cal[r["source"]].append((r["n_chars"], r["doc_id"]))
        else:
            test[r["source"]].append(r["n_chars"])
    got = {
        r["source"]: r
        for r in op_conformal_interval_audit(spark, sf_dir).collect()
    }
    # only sources present in all three folds appear (inner joins)
    expect = {s for s in train if cal.get(s) and test.get(s)}
    assert set(got) == expect
    for s in expect:
        pred = sum(train[s]) * MICRO // len(train[s])
        res = sorted(
            (abs(nc * MICRO - pred), did) for nc, did in cal[s]
        )
        n_cal = len(res)
        idx = min((9 * (n_cal + 1) + 9) // 10, n_cal)
        qhat = res[idx - 1][0]
        covered = sum(1 for nc in test[s] if abs(nc * MICRO - pred) <= qhat)
        g = got[s]
        assert g["n_train"] == len(train[s])
        assert g["n_cal"] == n_cal
        assert g["n_test"] == len(test[s])
        assert g["pred_micro"] == pred
        assert g["qhat_micro"] == qhat
        assert g["covered"] == covered
        assert g["coverage_micro"] == covered * MICRO // len(test[s])
    # split-conformal is distribution-free but only in expectation;
    # assert the pooled empirical coverage is not degenerate
    tot_cov = sum(g["covered"] for g in got.values())
    tot_test = sum(g["n_test"] for g in got.values())
    assert tot_cov / tot_test >= 0.6


# --- op_graph_trustrank_seeded --------------------------------------------


def test_trustrank_matches_python(spark, sf_dir):
    from apitap_spark.operators.graph import (
        PAGERANK_SCALE,
        TRI_NEXT_K,
        TRUST_ITERS,
        TRUST_SEED_MOD,
        _TR_BASE_U,
        _TR_DDEN,
        _TR_DNUM,
        op_graph_trustrank_seeded,
    )

    rows = read_table(spark, sf_dir, "events").collect()
    buckets = defaultdict(set)
    for r in rows:
        b = r["ts"].replace(minute=0, second=0, microsecond=0)
        buckets[(b, r["event_type"])].add(r["user_id"])
    edges = set()
    for users in buckets.values():
        ordered = sorted(users)
        for i, u in enumerate(ordered):
            for k in range(1, TRI_NEXT_K + 1):
                if i + k < len(ordered):
                    edges.add((u, ordered[i + k]))
    und = defaultdict(list)
    for u, v in edges:
        und[u].append(v)
        und[v].append(u)
    deg = {u: len(vs) for u, vs in und.items()}
    rank = {
        u: PAGERANK_SCALE if u % TRUST_SEED_MOD == 0 else 0 for u in und
    }
    for _ in range(TRUST_ITERS):
        inflow = defaultdict(int)
        for u, vs in und.items():
            c = rank[u] // deg[u]
            for v in vs:
                inflow[v] += c
        rank = {
            u: (_TR_BASE_U if u % TRUST_SEED_MOD == 0 else 0)
            + (_TR_DNUM * inflow.get(u, 0)) // _TR_DDEN
            for u in und
        }
    got = {
        r["user_id"]: r
        for r in op_graph_trustrank_seeded(spark, sf_dir).collect()
    }
    assert set(got) == set(und)
    for u, g in got.items():
        assert g["trust_micro"] == rank[u]
        assert g["is_seed"] == (u % TRUST_SEED_MOD == 0)
    # seeds exist and trust propagates beyond them (non-vacuous gate)
    assert any(u % TRUST_SEED_MOD == 0 for u in und)
    assert any(
        rank[u] > 0 for u in und if u % TRUST_SEED_MOD != 0
    ), "trust never left the seed set"
    # mass conservation band: total trust never exceeds the injected
    # teleport mass amplified by the damping geometric series
    n_seeds = sum(1 for u in und if u % TRUST_SEED_MOD == 0)
    total = sum(rank.values())
    assert total <= n_seeds * PAGERANK_SCALE * _TR_DDEN // (_TR_DDEN - _TR_DNUM)


# --- op_graph_resource_allocation -----------------------------------------


def test_resource_allocation_matches_python(spark, sf_dir):
    from apitap_spark.operators.graph import (
        RA_TOP_K,
        TRI_NEXT_K,
        op_graph_resource_allocation,
    )

    rows = read_table(spark, sf_dir, "events").collect()
    buckets = defaultdict(set)
    for r in rows:
        b = r["ts"].replace(minute=0, second=0, microsecond=0)
        buckets[(b, r["event_type"])].add(r["user_id"])
    edges = set()
    for users in buckets.values():
        ordered = sorted(users)
        for i, u in enumerate(ordered):
            for k in range(1, TRI_NEXT_K + 1):
                if i + k < len(ordered):
                    edges.add((u, ordered[i + k]))
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    scores = {}
    for w, ns in adj.items():
        contrib = MICRO // len(ns)
        ordered = sorted(ns)
        for i, u in enumerate(ordered):
            for v in ordered[i + 1:]:
                if (u, v) not in edges:
                    cn, ra = scores.get((u, v), (0, 0))
                    scores[(u, v)] = (cn + 1, ra + contrib)
    ranked = sorted(
        ((u, v), cn, ra) for (u, v), (cn, ra) in scores.items()
    )
    ranked.sort(key=lambda t: (-t[2], t[0]))
    got = op_graph_resource_allocation(spark, sf_dir).collect()
    assert len(got) == min(RA_TOP_K, len(ranked))
    for g, ((u, v), cn, ra) in zip(sorted(got, key=lambda r: r["rk"]), ranked):
        assert (g["u"], g["v"]) == (u, v)
        assert g["common_neighbors"] == cn
        assert g["ra_micro"] == ra
    # RA down-weights hubs: every reported score is at most cn * 1e6 /
    # min-degree and the ordering is strictly by ra_micro
    ras = [g["ra_micro"] for g in sorted(got, key=lambda r: r["rk"])]
    assert ras == sorted(ras, reverse=True)


# --- op_quality_brier_decomposition ---------------------------------------


def test_brier_decomposition_matches_python(spark, sf_dir):
    from apitap_spark.operators.quality import op_quality_brier_decomposition
    from apitap_spark.operators.textstats import op_text_quality_score

    scored = op_text_quality_score(spark, sf_dir).select(
        "quality_score", "n_chars"
    ).collect()
    bins = defaultdict(lambda: [0, 0])
    for r in scored:
        b = min(int(r["quality_score"] * 10.0), 9)
        bins[b][0] += 1
        bins[b][1] += int(r["n_chars"] > 300)
    n = sum(v[0] for v in bins.values())
    c = sum(v[1] for v in bins.values())
    o_milli = 1000 * c // n
    rel_num = res_num = 0
    for b, (n_k, c_k) in bins.items():
        f_milli = (2 * b + 1) * 50
        ok_milli = 1000 * c_k // n_k
        rel_num += n_k * (f_milli - ok_milli) ** 2
        res_num += n_k * (ok_milli - o_milli) ** 2
    rel = rel_num // n
    res = res_num // n
    unc = o_milli * (1000 - o_milli)
    g = op_quality_brier_decomposition(spark, sf_dir).collect()
    assert len(g) == 1
    g = g[0]
    assert g["n_docs"] == n and g["n_longform"] == c
    assert g["n_buckets"] == len(bins)
    assert g["reliability_micro"] == rel
    assert g["resolution_micro"] == res
    assert g["uncertainty_micro"] == unc
    assert g["brier_micro"] == rel - res + unc
    # decomposition sanity: every component non-negative, Brier in [0, 1]
    assert rel >= 0 and res >= 0 and 0 <= unc <= 250000
    assert 0 <= g["brier_micro"] <= MICRO


# --- op_dsir_importance_weights -------------------------------------------


def _round_half_away(x: float) -> int:
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def test_dsir_weights_match_python(spark, sf_dir):
    import math
    import re

    from apitap_spark.operators.corpus import (
        DSIR_BUCKETS,
        DSIR_SALT,
        DSIR_TARGET_LANG,
        op_dsir_importance_weights,
    )

    docs = read_table(spark, sf_dir, "documents").collect()
    feats = {}
    for r in docs:
        toks = re.split(r"\s+", r["text"].strip())
        if len(toks) < 2:
            continue
        fs = []
        for i in range(len(toks) - 1):
            g = f"{toks[i]} {toks[i + 1]}"
            h = hashlib.md5(f"{DSIR_SALT}|{g}".encode()).hexdigest()
            fs.append(int(h[:15], 16) % DSIR_BUCKETS)
        feats[r["doc_id"]] = (r["lang"], fs)
    raw = defaultdict(int)
    tgt = defaultdict(int)
    for lang, fs in feats.values():
        for f in fs:
            raw[f] += 1
            if lang == DSIR_TARGET_LANG:
                tgt[f] += 1
    n_r = sum(raw.values())
    n_t = sum(tgt.values())
    du = {
        f: _round_half_away(
            math.log(
                ((tgt.get(f, 0) + 1) * (n_r + DSIR_BUCKETS))
                / ((c_r + 1) * (n_t + DSIR_BUCKETS))
            )
            * 1e6
        )
        for f, c_r in raw.items()
    }
    got = {r["doc_id"]: r for r in op_dsir_importance_weights(spark, sf_dir).collect()}
    assert set(got) == set(feats)
    en_w, other_w = [], []
    for did, (lang, fs) in feats.items():
        g = got[did]
        assert g["lang"] == lang
        assert g["n_grams"] == len(fs)
        assert g["weight_micro"] == sum(du[f] for f in fs)
        (en_w if lang == DSIR_TARGET_LANG else other_w).append(
            g["weight_micro"] / max(g["n_grams"], 1)
        )
    # the estimator must actually separate the target domain: mean
    # per-gram weight of target-lang docs exceeds the rest
    assert sum(en_w) / len(en_w) > sum(other_w) / len(other_w)


# --- op_shard_makespan_lpt ------------------------------------------------


def test_lpt_makespan_matches_python(spark, sf_dir):
    from apitap_spark.operators.planning import (
        LPT_WORKERS,
        op_shard_makespan_lpt,
    )

    rows = read_table(spark, sf_dir, "documents").collect()
    per = defaultdict(int)
    for r in rows:
        t = r["text"].strip()
        per[r["source"]] += len(t.split()) if t else 0
    order = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))
    loads = [0] * LPT_WORKERS
    assign = {}
    for rnk, (s, tok) in enumerate(order, start=1):
        w = loads.index(min(loads))  # first minimum = lowest worker id
        assign[s] = (rnk, tok, w + 1)
        loads[w] += tok
    makespan = max(loads)
    total = sum(per.values())
    lb = max((total + LPT_WORKERS - 1) // LPT_WORKERS, max(per.values()))
    got = {r["source"]: r for r in op_shard_makespan_lpt(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for s, (rnk, tok, w) in assign.items():
        g = got[s]
        assert g["rnk"] == rnk
        assert g["n_tokens"] == tok
        assert g["worker"] == w
        assert g["makespan"] == makespan
        assert g["lower_bound"] == lb
        assert g["ratio_micro"] == makespan * MICRO // lb
    # Graham's guarantee: LPT makespan <= (4/3 - 1/(3W)) * OPT and OPT
    # >= lb, so the reported ratio must respect the bound
    assert makespan * 3 * LPT_WORKERS <= lb * (4 * LPT_WORKERS - 1)
    # every worker with load > 0 implies the assignment covers the pool
    assert sum(tok for _, tok, _ in assign.values()) == total


# --- op_krippendorff_alpha ------------------------------------------------


def test_krippendorff_alpha_matches_python(spark, sf_dir):
    import re

    from apitap_spark.operators.quality import (
        KRIPP_CHARS_T,
        KRIPP_DIV_T,
        KRIPP_LEN_T,
        op_krippendorff_alpha,
    )

    rows = read_table(spark, sf_dir, "documents").collect()
    n_units = len(rows)
    n_true = a_num = 0
    for r in rows:
        toks = re.split(r"\s+", r["text"].strip()) if r["text"].strip() else [""]
        nt, nd = len(toks), len(set(toks))
        n1 = (
            int(nt >= KRIPP_LEN_T)
            + int(nd * 1000 // nt >= KRIPP_DIV_T)
            + int(r["n_chars"] > KRIPP_CHARS_T)
        )
        n_true += n1
        a_num += n1 * (3 - n1)
    n = 3 * n_units
    n_false = n - n_true
    alpha = 1.0 - float((n - 1) * a_num) / float(2 * n_true * n_false)
    g = op_krippendorff_alpha(spark, sf_dir).collect()
    assert len(g) == 1
    g = g[0]
    assert g["n_units"] == n_units
    assert g["m_raters"] == 3
    assert g["n_true"] == n_true and g["n_false"] == n_false
    assert g["a_num"] == a_num
    assert g["alpha"] == alpha
    # alpha is chance-corrected: bounded above by 1, and the raters
    # must actually disagree somewhere on this corpus (non-vacuous)
    assert g["alpha"] <= 1.0
    assert a_num > 0


# --- op_graph_transitivity ------------------------------------------------


def test_transitivity_matches_python(spark, sf_dir):
    from apitap_spark.operators.graph import (
        TRI_NEXT_K,
        op_graph_transitivity,
    )

    rows = read_table(spark, sf_dir, "events").collect()
    buckets = defaultdict(set)
    for r in rows:
        b = r["ts"].replace(minute=0, second=0, microsecond=0)
        buckets[(b, r["event_type"])].add(r["user_id"])
    edges = set()
    for users in buckets.values():
        ordered = sorted(users)
        for i, u in enumerate(ordered):
            for k in range(1, TRI_NEXT_K + 1):
                if i + k < len(ordered):
                    edges.add((u, ordered[i + k]))
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    n_tri = sum(
        1
        for (a, b) in edges
        for c in adj[b]
        if b < c and (a, c) in edges
    )
    wedges2 = sum(d * (d - 1) for d in map(len, adj.values()))
    g = op_graph_transitivity(spark, sf_dir).collect()
    assert len(g) == 1
    g = g[0]
    assert g["n_nodes"] == len(adj)
    assert g["n_edges"] == len(edges)
    assert g["n_tri"] == n_tri
    assert g["n_wedges"] == wedges2 // 2
    assert g["transitivity_micro"] == 6 * n_tri * MICRO // wedges2
    # transitivity is a fraction of closed wedges
    assert 0 <= g["transitivity_micro"] <= MICRO
    assert n_tri > 0, "triangle-free fixture makes the gate vacuous"


# --- op_tokenizer_unigram_viterbi -----------------------------------------


def test_unigram_viterbi_matches_python(spark, sf_dir):
    import math
    import re

    from apitap_spark.operators.bpe import (
        UNI_PIECE_MAX,
        UNI_TOPK,
        UNI_VOCAB,
        UNI_WORD_MAX,
        op_tokenizer_unigram_viterbi,
    )

    docs = read_table(spark, sf_dir, "documents").collect()
    words = defaultdict(int)
    for r in docs:
        for w in re.split(r"\s+", r["text"].strip()):
            if w and len(w) <= UNI_WORD_MAX:
                words[w] += 1
    subs = defaultdict(int)
    for w, n in words.items():
        for s in range(len(w)):
            for l in range(1, min(UNI_PIECE_MAX, len(w) - s) + 1):
                subs[w[s:s + l]] += n
    ranked = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = {p for p, _ in ranked[:UNI_VOCAB]}
    vocab |= {p for p in subs if len(p) == 1}
    ct = sum(subs[p] for p in vocab)
    u = {
        p: _round_half_away(math.log(ct / subs[p]) * 1e6) for p in vocab
    }
    vit = defaultdict(int)
    for w, n in words.items():
        L = len(w)
        dp = [(0, -1)] + [(None, None)] * L
        for i in range(1, L + 1):
            best = None
            for l in range(1, min(UNI_PIECE_MAX, i) + 1):
                p = w[i - l:i]
                if p in vocab:
                    cand = (dp[i - l][0] + u[p], i - l)
                    if best is None or cand < best:
                        best = cand
            dp[i] = best
        i = L
        while i > 0:
            s = dp[i][1]
            vit[w[s:i]] += n
            i = s
    top = sorted(vit.items(), key=lambda kv: (-kv[1], kv[0]))[:UNI_TOPK]
    got = op_tokenizer_unigram_viterbi(spark, sf_dir).collect()
    assert len(got) == len(top)
    for g, (p, c) in zip(sorted(got, key=lambda r: r["rk"]), top):
        assert g["piece"] == p
        assert g["viterbi_count"] == c
        assert g["seed_count"] == subs[p]
        assert g["score_micro"] == u[p]
    # the E-step must actually merge characters: at least one chosen
    # piece is multi-char, and Viterbi counts never exceed seed counts
    assert any(len(g["piece"]) > 1 for g in got)
    assert all(g["viterbi_count"] <= g["seed_count"] for g in got)


# --- op_embedding_isotropy_audit ------------------------------------------


def test_isotropy_matches_python(spark, sf_dir):
    import math

    from apitap_spark.operators.similarity import op_embedding_isotropy_audit

    rows = read_table(spark, sf_dir, "embeddings").collect()
    sums = None
    n = 0
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        norm2 = 0.0
        for x in v:
            norm2 += x * x
        if norm2 <= 0:
            continue
        nrm = math.sqrt(norm2)
        vq = [_round_half_away(x / nrm * 1e6) for x in v]
        if sums is None:
            sums = [0] * len(vq)
        for i, x in enumerate(vq):
            sums[i] += x
        n += 1
    num = 0.0
    for s in sums:
        num += float(s) * float(s)
    mean_cos = math.floor(1e6 * (num / 1e12 - n) / n / (n - 1))
    rbar = math.floor(1e6 * math.sqrt(num) / 1e6 / n)
    g = op_embedding_isotropy_audit(spark, sf_dir).collect()
    assert len(g) == 1
    g = g[0]
    assert g["n_vecs"] == n
    assert g["n_dims"] == len(sums)
    assert g["mean_cos_micro"] == mean_cos
    assert g["rbar_micro"] == rbar
    # sufficient-statistic identity holds: mean cosine is bounded by
    # [-1/(n-1), 1] for unit vectors
    assert -MICRO // (n - 1) - 1 <= g["mean_cos_micro"] <= MICRO


# --- op_ann_lsh_recall_curve ----------------------------------------------


def test_lsh_recall_curve_matches_python(spark, sf_dir):
    from apitap_spark.operators.similarity import (
        N_TABLES,
        op_ann_cosine_topk,
        op_ann_lsh_bucketed,
        op_ann_lsh_recall_curve,
    )

    got = {
        r["tables_used"]: r
        for r in op_ann_lsh_recall_curve(spark, sf_dir).collect()
    }
    assert set(got) == set(range(1, N_TABLES + 1))
    # monotone: more tables never lose candidates
    founds = [got[t]["n_found"] for t in range(1, N_TABLES + 1)]
    assert founds == sorted(founds)
    truth = {g["n_truth"] for g in got.values()}
    assert len(truth) == 1
    n_truth = truth.pop()
    for t, g in got.items():
        assert g["recall_micro"] == g["n_found"] * MICRO // n_truth
    # the FULL bank's recall must agree with the shipped LSH index's
    # candidate overlap (triangulation against op_ann_lsh_bucketed's
    # candidate generation, which uses all tables)
    exact = {
        (r["q_id"], r["c_id"])
        for r in op_ann_cosine_topk(spark, sf_dir).collect()
    }
    lsh_cand = {
        (r["q_id"], r["c_id"])
        for r in op_ann_lsh_bucketed(spark, sf_dir).collect()
    }
    # op_ann_lsh_bucketed re-ranks to top-5, so its HITS are a subset
    # of the full-bank candidate overlap measured by the curve
    assert len(exact & lsh_cand) <= got[N_TABLES]["n_found"]
    assert n_truth == len(exact)


# --- op_dedup_threshold_curve ---------------------------------------------


def test_dedup_threshold_curve_matches_pairs_gate(spark, sf_dir):
    from apitap_spark.operators.dedup import (
        DEDUP_SWEEP_THRS,
        op_dedup_ngram_jaccard,
        op_dedup_threshold_curve,
    )

    pairs = [
        (r["d1"], r["d2"], r["jaccard"])
        for r in op_dedup_ngram_jaccard(spark, sf_dir).collect()
    ]
    got = {
        r["thr_micro"]: r
        for r in op_dedup_threshold_curve(spark, sf_dir).collect()
    }
    assert set(got) == {t * 100000 for t in DEDUP_SWEEP_THRS}
    prev = None
    for t in DEDUP_SWEEP_THRS:
        sel = [(d1, d2) for d1, d2, j in pairs if j >= t / 10.0]
        g = got[t * 100000]
        assert g["n_pairs"] == len(sel)
        assert g["n_left_docs"] == len({d1 for d1, _ in sel})
        # monotone: a higher bar never adds pairs
        if prev is not None:
            assert g["n_pairs"] <= prev
        prev = g["n_pairs"]
    # non-vacuous: the lowest bar must see the corpus's planted near-dups
    assert got[DEDUP_SWEEP_THRS[0] * 100000]["n_pairs"] > 0


# --- op_ml_auprc_grid -----------------------------------------------------


def test_auprc_grid_matches_python(spark, sf_dir):
    from apitap_spark.operators.ml import (
        AUPRC_STEPS,
        PR_WIDE_LINES,
        op_ml_auprc_grid,
    )

    li = read_table(spark, sf_dir, "lineitem").collect()
    orders = read_table(spark, sf_dir, "orders").collect()
    nlines = defaultdict(int)
    for r in li:
        nlines[r["l_orderkey"]] += 1
    ys = [
        (int(round(r["o_totalprice"] * 100)),
         int(nlines.get(r["o_orderkey"], 0) >= PR_WIDE_LINES))
        for r in orders
    ]
    mn = min(y for y, _ in ys)
    mx = max(y for y, _ in ys)
    pos = sum(l for _, l in ys)
    n = len(ys)
    pts = []
    for i in range(AUPRC_STEPS + 1):
        thr = mn + (mx - mn) * i // AUPRC_STEPS
        n_pred = sum(1 for y, _ in ys if y >= thr)
        tp = sum(l for y, l in ys if y >= thr)
        pts.append((tp, n_pred))
    acc = 0
    for i in range(AUPRC_STEPS + 1):
        tp, _ = pts[i]
        tp_next, np_next = pts[i + 1] if i + 1 < len(pts) else (0, 0)
        p_micro = 1_000_000 if np_next == 0 else tp_next * MICRO // np_next
        acc += (tp - tp_next) * p_micro
    auprc = acc // pos
    g = op_ml_auprc_grid(spark, sf_dir).collect()
    assert len(g) == 1
    g = g[0]
    assert g["n_orders"] == n and g["pos_total"] == pos
    assert g["steps"] == AUPRC_STEPS
    assert g["prevalence_micro"] == pos * MICRO // n
    assert g["auprc_micro"] == auprc
    # PR-AUC of any ranker is bounded below by ~prevalence for a random
    # score and above by 1; the fixture's ranker must beat random
    assert g["prevalence_micro"] <= g["auprc_micro"] <= MICRO


# --- op_ab_test_poisson_rates ---------------------------------------------


def test_poisson_rates_match_python(spark, sf_dir):
    import math

    from apitap_spark.operators.ml import op_ab_test_poisson_rates

    rows = read_table(spark, sf_dir, "events").collect()
    cnt = defaultdict(lambda: [0, 0])
    expo_sets = defaultdict(set)
    for r in rows:
        g = r["user_id"] % 2
        et = r["event_type"]
        cnt[et][g] += 1
        h = r["ts"].replace(minute=0, second=0, microsecond=0)
        expo_sets[et].add((g, h, r["user_id"]))
    got = {
        r["event_type"]: r
        for r in op_ab_test_poisson_rates(spark, sf_dir).collect()
    }
    assert set(got) == set(cnt)
    for et in cnt:
        n1, n2 = cnt[et]
        t1 = sum(1 for g, _, _ in expo_sets[et] if g == 0)
        t2 = len(expo_sets[et]) - t1
        p0 = float(t1) / float(t1 + t2)
        z = math.floor(
            1e6 * (float(n1) - float(n1 + n2) * p0)
            / math.sqrt(float(n1 + n2) * p0 * (1.0 - p0))
        )
        g = got[et]
        assert (g["n1"], g["n2"], g["t1"], g["t2"]) == (n1, n2, t1, t2)
        assert g["rate_ratio_micro"] == n1 * t2 * MICRO // (n2 * t1)
        assert g["z_micro"] == z
        assert g["significant"] == (abs(z) >= 1959964)
        # exposures bound the counts: at most a handful of same-type
        # events per user-hour, and every event implies exposure
        assert g["n1"] >= 0 and g["t1"] > 0 and g["t2"] > 0
