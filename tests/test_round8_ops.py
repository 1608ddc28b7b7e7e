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
