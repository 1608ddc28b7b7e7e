"""Round-9 planning operators: independent pure-Python recounts (the
third implementation next to Spark and the DuckDB oracle), plus the
invariants each operator exists to provide (budget conservation,
non-negative waste, monotone retention, debias-identity)."""

from __future__ import annotations

import hashlib
from collections import Counter

from apitap_spark.session import read_table

MICRO = 1_000_000


def _doc_rows(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").collect()


def _ntok(text: str) -> int:
    t = text.strip()
    return len(t.split()) if t else 0


def test_token_budget_epochs_matches_python_waterfill(spark, sf_dir):
    from apitap_spark.operators.planning import (
        BUDGET_DEN,
        BUDGET_NUM,
        EPOCH_CAP,
        op_token_budget_epochs,
    )

    rows = _doc_rows(spark, sf_dir)
    per = Counter()
    for r in rows:
        per[r["source"]] += _ntok(r["text"])
    total = sum(per.values())
    budget = total * BUDGET_NUM // BUDGET_DEN
    n = len(per)
    # reference water-filling: iterate fill levels until stable
    caps = {s: EPOCH_CAP * t for s, t in per.items()}
    capped: set[str] = set()
    while True:
        free = n - len(capped)
        level = (budget - sum(caps[s] for s in capped)) // max(free, 1)
        newly = {
            s for s in caps if s not in capped and caps[s] <= level
        }
        # the closed form caps a source whose capacity sits at/below the
        # fill level computed over the remaining pool
        if not newly or free == 0:
            break
        capped |= newly
    got = {r["source"]: r for r in op_token_budget_epochs(spark, sf_dir).collect()}
    assert set(got) == set(per)
    free = n - len(capped)
    level = (budget - sum(caps[s] for s in capped)) // max(free, 1)
    alloc_total = 0
    for s, g in got.items():
        assert g["n_tokens"] == per[s]
        assert g["cap_tokens"] == caps[s]
        assert g["budget"] == budget
        assert g["capped"] == (s in capped)
        expect = caps[s] if s in capped else level
        assert g["alloc_tokens"] == expect
        assert g["epochs_micro"] == expect * MICRO // per[s]
        # never exceed the epoch cap
        assert g["alloc_tokens"] <= caps[s]
        alloc_total += g["alloc_tokens"]
    # conservation: allocation never exceeds the budget
    assert alloc_total <= budget


def test_pad_waste_audit_matches_python(spark, sf_dir):
    from apitap_spark.operators.planning import PAD_CAPS, op_pad_waste_audit

    rows = _doc_rows(spark, sf_dir)

    def cap_of(nt: int) -> int:
        for c in PAD_CAPS:
            if nt <= c:
                return c
        last = PAD_CAPS[-1]
        return (nt + last - 1) // last * last

    ndocs = Counter()
    stok = Counter()
    lens = []
    for r in rows:
        nt = _ntok(r["text"])
        lens.append(nt)
        ndocs[cap_of(nt)] += 1
        stok[cap_of(nt)] += nt
    gmax = max(lens)
    got = {r["bucket_cap"]: r for r in op_pad_waste_audit(spark, sf_dir).collect()}
    assert set(got) == set(ndocs)
    for cap, g in got.items():
        padded = ndocs[cap] * cap
        assert g["n_docs"] == ndocs[cap]
        assert g["sum_tokens"] == stok[cap]
        assert g["padded_tokens"] == padded
        assert g["waste_tokens"] == padded - stok[cap]
        assert g["waste_tokens"] >= 0  # caps round UP: no negative waste
        assert g["waste_micro"] == (padded - stok[cap]) * MICRO // padded
        assert g["unbucketed_waste_tokens"] == ndocs[cap] * gmax - stok[cap]
        # bucketing never pads more than the global-max layout — except
        # possibly the TOP bucket, whose power-of-two cap may overshoot
        # the corpus max (docs up to gmax pad to the next power of two)
        if cap <= gmax:
            assert g["waste_tokens"] <= g["unbucketed_waste_tokens"]


def test_quality_retention_sweep_matches_python_and_monotone(spark, sf_dir):
    from apitap_spark.operators.planning import (
        SWEEP_THRESHOLDS,
        op_quality_retention_sweep,
    )

    rows = _doc_rows(spark, sf_dir)
    metrics = []
    for r in rows:
        t = r["text"].strip()
        if not t:
            continue
        toks = t.split()
        metrics.append((len(set(toks)) * MICRO // len(toks), len(toks)))
    total_docs = len(metrics)
    total_tokens = sum(nt for _, nt in metrics)
    got = {
        r["threshold_micro"]: r
        for r in op_quality_retention_sweep(spark, sf_dir).collect()
    }
    assert sorted(got) == sorted(SWEEP_THRESHOLDS)
    prev_docs = None
    for th in sorted(SWEEP_THRESHOLDS):
        dk = sum(1 for m, _ in metrics if m >= th)
        tk = sum(nt for m, nt in metrics if m >= th)
        g = got[th]
        assert g["docs_kept"] == dk
        assert g["tokens_kept"] == tk
        assert g["docs_share_micro"] == dk * MICRO // total_docs
        assert g["tokens_share_micro"] == tk * MICRO // total_tokens
        # retention is monotone non-increasing in the threshold
        if prev_docs is not None:
            assert dk <= prev_docs
        prev_docs = dk


def test_randomized_response_matches_python_mechanism(spark, sf_dir):
    from apitap_spark.operators.planning import (
        RR_FLIP_NUM,
        RR_SALT,
        op_privacy_randomized_response,
    )

    rows = _doc_rows(spark, sf_dir)
    langs = sorted({r["lang"] for r in rows})
    k = len(langs)
    n = len(rows)
    true_c = Counter(r["lang"] for r in rows)
    obs_c = Counter()
    for r in rows:
        h = hashlib.md5(f"{RR_SALT}{r['doc_id']}".encode()).hexdigest()
        flip_bucket = int(h[:2], 16)
        draw_bucket = int(h[2:4], 16)
        if flip_bucket >= RR_FLIP_NUM:
            obs_c[r["lang"]] += 1
        else:
            obs_c[langs[draw_bucket % k]] += 1
    keep = 256 - RR_FLIP_NUM
    got = {r["lang"]: r for r in op_privacy_randomized_response(spark, sf_dir).collect()}
    assert set(got) == set(true_c)
    assert sum(g["observed_count"] for g in got.values()) == n
    for lang, g in got.items():
        assert g["true_count"] == true_c[lang]
        assert g["observed_count"] == obs_c[lang]
        est_num = 256 * k * obs_c[lang] - RR_FLIP_NUM * n
        est_den = keep * k
        assert g["est_num"] == est_num
        assert g["est_den"] == est_den
        err = abs(est_num - true_c[lang] * est_den)
        assert g["abs_err_micro"] == err * MICRO // (n * est_den)
    # debias identity: summed estimates recover n exactly
    # (sum est_num = 256k·n − p·n·K·k... = keep·k·n = n·est_den)
    assert sum(g["est_num"] for g in got.values()) == n * keep * k


def test_fairness_equalized_odds_matches_python(spark, sf_dir):
    from apitap_spark.operators.ml import (
        FAIR_LABEL_CHARS,
        FAIR_PRED_BAR,
        op_fairness_equalized_odds,
    )

    rows = _doc_rows(spark, sf_dir)
    grp = {}
    for r in rows:
        t = r["text"].strip()
        if not t:
            continue
        toks = t.split()
        y = 1 if r["n_chars"] >= FAIR_LABEL_CHARS else 0
        yhat = 1 if len(set(toks)) * MICRO // len(toks) < FAIR_PRED_BAR else 0
        g = grp.setdefault(r["lang"], [0, 0, 0, 0, 0])  # n,pos,neg,tp,fp
        g[0] += 1
        g[1] += y
        g[2] += 1 - y
        g[3] += y * yhat
        g[4] += (1 - y) * yhat
    tpr_all = sum(g[3] for g in grp.values()) * MICRO // sum(
        g[1] for g in grp.values()
    )
    fpr_all = sum(g[4] for g in grp.values()) * MICRO // sum(
        g[2] for g in grp.values()
    )
    got = {
        r["lang"]: r for r in op_fairness_equalized_odds(spark, sf_dir).collect()
    }
    assert set(got) == set(grp)
    for lang, (n, pos, neg, tp, fp) in grp.items():
        # the gate is only meaningful when every group has both classes
        assert pos > 0 and neg > 0
        g = got[lang]
        assert (g["n"], g["pos"], g["neg"], g["tp"], g["fp"]) == (
            n,
            pos,
            neg,
            tp,
            fp,
        )
        assert g["tpr_micro"] == tp * MICRO // pos
        assert g["fpr_micro"] == fp * MICRO // neg
        assert g["tpr_gap_micro"] == abs(tp * MICRO // pos - tpr_all)
        assert g["fpr_gap_micro"] == abs(fp * MICRO // neg - fpr_all)


def test_winsorized_moments_matches_python(spark, sf_dir):
    from collections import defaultdict

    from apitap_spark.operators.quality import (
        WINSOR_Q_HI,
        WINSOR_Q_LO,
        op_winsorized_moments,
    )

    rows = _doc_rows(spark, sf_dir)
    per = defaultdict(list)
    for r in rows:
        per[r["source"]].append(r["n_chars"])
    got = {r["source"]: r for r in op_winsorized_moments(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for src, xs in per.items():
        xs_sorted = sorted(xs)
        n = len(xs)

        def discrete_q(q):
            # smallest distinct value whose cumulative count reaches q%
            cum = 0
            from collections import Counter

            for v, c in sorted(Counter(xs).items()):
                cum += c
                if cum * 100 >= q * n:
                    return v
            return xs_sorted[-1]

        lo, hi = discrete_q(WINSOR_Q_LO), discrete_q(WINSOR_Q_HI)
        w = [min(max(x, lo), hi) for x in xs]
        g = got[src]
        assert g["n_docs"] == n
        assert (g["p5_chars"], g["p95_chars"]) == (lo, hi)
        assert g["n_clipped_lo"] == sum(1 for x in xs if x < lo)
        assert g["n_clipped_hi"] == sum(1 for x in xs if x > hi)
        assert g["winsor_sum"] == sum(w)
        assert g["winsor_mean_micro"] == sum(w) * MICRO // n
        assert g["winsor_varnum"] == n * sum(v * v for v in w) - sum(w) ** 2
        # winsorized variance never exceeds the raw variance numerator
        assert g["winsor_varnum"] <= n * sum(x * x for x in xs) - sum(xs) ** 2


def test_onion_share_matches_python(spark, sf_dir):
    from apitap_spark.operators.dedup import ONION_N, op_dedup_onion_share

    rows = _doc_rows(spark, sf_dir)
    doc_grams = {}
    for r in rows:
        t = r["text"].strip()
        if not t:
            continue
        toks = t.split()
        doc_grams[r["doc_id"]] = {
            " ".join(toks[i : i + ONION_N])
            for i in range(max(len(toks) - ONION_N + 1, 0))
        }
    df = Counter()
    for gs in doc_grams.values():
        df.update(gs)
    got = {r["doc_id"]: r for r in op_dedup_onion_share(spark, sf_dir).collect()}
    assert set(got) == {d for d, gs in doc_grams.items() if gs}
    for doc, gs in doc_grams.items():
        if not gs:
            continue
        dup = sum(1 for g in gs if df[g] >= 2)
        g = got[doc]
        assert g["n_grams"] == len(gs)
        assert g["n_dup_grams"] == dup
        assert g["dup_micro"] == dup * MICRO // len(gs)


def test_mcnemar_matches_python(spark, sf_dir):
    from apitap_spark.operators.ml import (
        FAIR_LABEL_CHARS,
        FAIR_PRED_BAR,
        MCNEMAR_B_TOKENS,
        op_ml_mcnemar_paired,
    )

    rows = _doc_rows(spark, sf_dir)
    n = ac = bc = b_disc = c_disc = 0
    for r in rows:
        t = r["text"].strip()
        if not t:
            continue
        toks = t.split()
        y = 1 if r["n_chars"] >= FAIR_LABEL_CHARS else 0
        a = 1 if len(set(toks)) * MICRO // len(toks) < FAIR_PRED_BAR else 0
        b = 1 if len(toks) >= MCNEMAR_B_TOKENS else 0
        n += 1
        ac += a == y
        bc += b == y
        b_disc += a == y and b != y
        c_disc += a != y and b == y
    assert b_disc + c_disc > 0  # non-degenerate fixture
    g = op_ml_mcnemar_paired(spark, sf_dir).collect()[0]
    assert (g["n"], g["a_correct"], g["b_correct"]) == (n, ac, bc)
    assert (g["disc_b"], g["disc_c"]) == (b_disc, c_disc)
    d = abs(b_disc - c_disc) - 1
    assert g["chi2_micro"] == d * d * MICRO // (b_disc + c_disc)


def test_curriculum_phases_matches_python(spark, sf_dir):
    from collections import defaultdict

    from apitap_spark.operators.planning import (
        CURRICULUM_PHASES,
        op_curriculum_phases,
    )

    rows = _doc_rows(spark, sf_dir)
    per_score = defaultdict(lambda: [0, 0])  # score -> [n_docs, tokens]
    for r in rows:
        t = r["text"].strip()
        if not t:
            continue
        toks = t.split()
        score = len(set(toks)) * MICRO // len(toks)
        per_score[score][0] += 1
        per_score[score][1] += len(toks)
    total = sum(v[1] for v in per_score.values())
    phases = defaultdict(lambda: [0, 0, None, None])  # n, tok, mn, mx
    start = 0
    for score in sorted(per_score, reverse=True):
        nd, tk = per_score[score]
        ph = min(CURRICULUM_PHASES - 1, start * CURRICULUM_PHASES // total)
        p = phases[ph]
        p[0] += nd
        p[1] += tk
        p[2] = score if p[2] is None else min(p[2], score)
        p[3] = score if p[3] is None else max(p[3], score)
        start += tk
    got = {r["phase"]: r for r in op_curriculum_phases(spark, sf_dir).collect()}
    assert set(got) == set(phases)
    for ph, (nd, tk, mn, mx) in phases.items():
        g = got[ph]
        assert (g["n_docs"], g["tokens"]) == (nd, tk)
        assert (g["min_score"], g["max_score"]) == (mn, mx)
    # phases are contiguous in score: phase k's min >= phase k+1's max
    for k in range(CURRICULUM_PHASES - 1):
        if k in got and k + 1 in got:
            assert got[k]["min_score"] >= got[k + 1]["max_score"]


def test_survival_km_matches_python(spark, sf_dir):
    from collections import defaultdict

    from apitap_spark.operators.temporal import (
        KM_CENSOR_GAP_DAYS,
        op_survival_km,
    )

    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts"
    ).collect()
    per = defaultdict(lambda: [None, None])  # (type,user) -> [min,max]
    tmax = 0
    for r in ev:
        e = int(r["ts"].timestamp())
        tmax = max(tmax, e)
        k = (r["event_type"], r["user_id"])
        p = per[k]
        p[0] = e if p[0] is None else min(p[0], e)
        p[1] = e if p[1] is None else max(p[1], e)
    steps = defaultdict(lambda: defaultdict(lambda: [0, 0]))  # type->life->[d,c]
    for (etype, _), (emin, emax) in per.items():
        life = (emax - emin) // 86400
        cens = tmax - emax < KM_CENSOR_GAP_DAYS * 86400
        steps[etype][life][1 if cens else 0] += 1
    got = defaultdict(dict)
    for r in op_survival_km(spark, sf_dir).collect():
        got[r["event_type"]][r["lifetime_days"]] = r
    assert set(got) == set(steps)
    for etype, lifemap in steps.items():
        assert set(got[etype]) == set(lifemap)
        n_risk = sum(d + c for d, c in lifemap.values())
        s = 1_000_000
        for life in sorted(lifemap):
            d, c = lifemap[life]
            s = s * (n_risk - d) // n_risk
            g = got[etype][life]
            assert g["n_risk"] == n_risk
            assert (g["n_deaths"], g["n_censored"]) == (d, c)
            assert g["survival_micro"] == s
            n_risk -= d + c
        # survival is monotone non-increasing and ends >= 0
        vals = [got[etype][t]["survival_micro"] for t in sorted(lifemap)]
        assert all(a >= b for a, b in zip(vals, vals[1:]))
        assert vals[-1] >= 0


def test_permutation_test_matches_python(spark, sf_dir):
    from apitap_spark.operators.features import (
        PERM_B,
        PERM_SALT,
        op_permutation_test,
    )

    rows = _doc_rows(spark, sf_dir)
    xs = [(r["doc_id"], r["n_chars"], 1 if r["lang"] == "en" else 0) for r in rows]
    sa = sum(x for _, x, g in xs if g)
    na = sum(1 for *_, g in xs if g)
    sb = sum(x for _, x, g in xs if not g)
    nb = len(xs) - na
    obs = abs(sa * MICRO // na - sb * MICRO // nb)
    n_ext = 0
    for b in range(PERM_B):
        pa = pna = pb_ = 0
        for doc_id, x, _ in xs:
            h = hashlib.md5(f"{PERM_SALT}{b}:{doc_id}".encode()).hexdigest()
            if int(h[0], 16) < 8:
                pa += x
                pna += 1
            else:
                pb_ += x
        pnb = len(xs) - pna
        assert pna > 0 and pnb > 0  # Bernoulli split never empties a side
        d = abs(pa * MICRO // pna - pb_ * MICRO // pnb)
        n_ext += d >= obs
    g = op_permutation_test(spark, sf_dir).collect()[0]
    assert (g["obs_diff_micro"], g["n_a"], g["n_b"]) == (obs, na, nb)
    assert g["n_perms"] == PERM_B
    assert g["n_extreme"] == n_ext
    assert (g["p_num"], g["p_den"]) == (1 + n_ext, PERM_B + 1)


def test_benchmark_vocab_coverage_matches_python(spark, sf_dir):
    from apitap_spark.operators.corpus import (
        COVERAGE_BENCH_MOD,
        COVERAGE_N,
        op_benchmark_vocab_coverage,
    )

    rows = _doc_rows(spark, sf_dir)
    doc_grams = {}
    for r in rows:
        t = r["text"].strip()
        if not t:
            continue
        toks = t.split()
        doc_grams[r["doc_id"]] = {
            " ".join(toks[i : i + COVERAGE_N])
            for i in range(max(len(toks) - COVERAGE_N + 1, 0))
        }
    corpus_set = set()
    for d, gs in doc_grams.items():
        if d % COVERAGE_BENCH_MOD != 0:
            corpus_set |= gs
    got = {
        r["doc_id"]: r
        for r in op_benchmark_vocab_coverage(spark, sf_dir).collect()
    }
    bench_docs = {
        d for d, gs in doc_grams.items() if d % COVERAGE_BENCH_MOD == 0 and gs
    }
    assert set(got) == bench_docs
    partial = full = 0
    for d in bench_docs:
        gs = doc_grams[d]
        cov = sum(1 for g in gs if g in corpus_set)
        g = got[d]
        assert g["n_grams"] == len(gs)
        assert g["n_covered"] == cov
        assert g["coverage_micro"] == cov * MICRO // len(gs)
        partial += 0 < cov < len(gs)
        full += cov == len(gs)
    # non-degenerate fixture: some docs partially covered
    assert partial > 0
