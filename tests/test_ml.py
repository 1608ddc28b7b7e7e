"""Lloyd-invariant tests for the k-means operator (rows-only gate entry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apitap_spark.operators.ml import _centroids_of, kmeans_assign, op_kmeans_refine
from apitap_spark.session import read_table


def test_kmeans_inertia_non_increasing(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    init = _centroids_of(
        read_table(spark, sf_dir, "embeddings").select(
            F.col("label").alias("cluster"), "embedding"
        ),
        "cluster",
    )
    inertias = []
    for n in (1, 2, 3):
        out = kmeans_assign(emb, init, n_iter=n)
        inertias.append(out.agg(F.sum("sq_dist")).collect()[0][0])
    assert inertias[0] >= inertias[1] >= inertias[2] - 1e-6


def test_kmeans_matches_python_fixed_point_reference(spark):
    """Exact equality of assignments and 6dp distances against a pure-
    Python replay of the fixed-point Lloyd iteration on a planted frame
    — triangulates the Spark fold and the DuckDB recursive CTE."""
    import decimal

    vecs = {
        1: [0.0, 0.1], 2: [0.2, 0.0], 3: [0.1, 0.15],   # blob A
        4: [5.0, 5.2], 5: [5.1, 4.9], 6: [4.9, 5.0],    # blob B
        7: [2.6, 2.4],                                   # between
    }
    init = {0: [0.0, 0.0], 1: [5.0, 5.0]}
    n_iter = 3

    def fp_mean(vals):
        s = sum(int(decimal.Decimal(v * 1000000.0).quantize(
            0, rounding=decimal.ROUND_HALF_UP)) for v in vals)
        return s / 1000000.0 / len(vals)

    cent = {k: list(v) for k, v in init.items()}
    assigned = {}
    for _ in range(n_iter):
        assigned = {}
        for vid, v in vecs.items():
            best = None
            for ck in sorted(cent):
                d = 0.0
                for a, b in zip(v, cent[ck]):
                    d += (a - b) * (a - b)
                if best is None or d < best[0]:
                    best = (d, ck)
            assigned[vid] = best
        cent = {
            ck: [
                fp_mean([vecs[vid][dim] for vid, (_, c) in assigned.items() if c == ck])
                for dim in range(2)
            ]
            for ck in {c for _, c in assigned.values()}
        }

    emb = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    init_df = spark.createDataFrame(
        [(k, v) for k, v in init.items()], "cluster int, centroid array<double>"
    )
    got = {
        r["vec_id"]: (r["cluster"], r["sq_dist"])
        for r in kmeans_assign(emb, init_df, n_iter=n_iter).collect()
    }
    for vid, (d, ck) in assigned.items():
        assert got[vid][0] == ck
        assert got[vid][1] == float(
            decimal.Decimal(repr(d)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )


def test_kmeans_assignment_is_nearest(spark, sf_dir):
    out = op_kmeans_refine(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings")
    # every vector covered exactly once, distances non-negative
    assert out.count() == emb.count()
    assert out.filter(F.col("sq_dist") < 0).count() == 0
    assert out.select("vec_id").distinct().count() == emb.count()
    # clusters come from the label domain (init) — k preserved or shrunk
    k_init = emb.select("label").distinct().count()
    assert out.select("cluster").distinct().count() <= k_init


def test_logreg_learns_longform_from_token_features(spark, sf_dir):
    """The long-form classifier must weight token count positively and
    dominantly, and reach high training accuracy."""
    from apitap_spark.operators.ml import op_ml_logreg_quality

    rows = {r["feature"]: r for r in op_ml_logreg_quality(spark, sf_dir).collect()}
    assert set(rows) == {"f_bias", "f_tokens", "f_avg_token_len", "f_distinct_ratio"}
    acc = rows["f_tokens"]["train_accuracy"]
    assert acc >= 0.9, f"train accuracy {acc}"
    w_tok = rows["f_tokens"]["weight"]
    assert w_tok > 0
    assert w_tok > abs(rows["f_distinct_ratio"]["weight"]) or acc >= 0.95


def test_logreg_separates_planted_blobs(spark):
    """On a linearly separable planted set GD must reach 100% accuracy."""
    from pyspark.sql import functions as F

    from apitap_spark.operators.ml import train_logreg

    data = [(1.0, 1.0, float(x > 0)) for x in range(-50, 50) if x != 0]
    X = spark.createDataFrame(
        [(b, float(x), y) for (b, _x, y), x in zip(data, [x for x in range(-50, 50) if x != 0])],
        "f_bias double, f_x double, y double",
    )
    w = train_logreg(X, ["f_bias", "f_x"], iters=60, lr=0.5)
    z = F.lit(w[0]) + F.col("f_x") * F.lit(w[1])
    acc = X.agg(F.avg(((z > 0).cast("double") == F.col("y")).cast("double"))).collect()[0][0]
    assert acc == 1.0
    assert w[1] > 0


def test_logreg_fixed_matches_python_reference(spark):
    """Bit-exact micro-weight equality against a pure-Python replay of
    the fixed-point softsign Newton on a planted frame — triangulates
    the Spark aggregation and the DuckDB recursive-CTE oracle (the
    Cramer determinant strings are shared by construction; this guards
    the per-row link/rounding/summation chain with an independent
    third implementation)."""
    from apitap_spark.operators.ml import (
        _cramer_exprs,
        _round_away,
        NEWTON_ITERS,
        NEWTON_RIDGE,
        train_logreg_newton_fixed,
    )

    # planted micro features: y correlated with f1, mild noise dims
    rows = []
    for i in range(40):
        y = 1.0 if i % 3 != 0 else 0.0
        f1 = 0.8 + 0.4 * (i % 7) / 7.0 if y else 0.2 + 0.3 * (i % 5) / 5.0
        f2 = 0.5 + 0.01 * (i % 11)
        f3 = 0.9 - 0.02 * (i % 6)
        rows.append((i, y, 1000000,
                     _round_away(f1 * 1e6), _round_away(f2 * 1e6),
                     _round_away(f3 * 1e6)))

    # pure-Python replay (same association orders as the Spark chain)
    det_a_expr, det_j_exprs = _cramer_exprs()
    w_u = [0, 0, 0, 0]
    for _ in range(NEWTON_ITERS):
        ws = [u / 1e6 for u in w_u]
        g_u = [0] * 4
        h_u = {}
        for _i, y, *fu in rows:
            f = [u / 1e6 for u in fu]
            z = ((f[0] * ws[0] + f[1] * ws[1]) + f[2] * ws[2]) + f[3] * ws[3]
            p = 0.5 + (0.5 * z) / (1.0 + abs(z))
            resid = y - p
            wt = p * (1.0 - p)
            for j in range(4):
                g_u[j] += _round_away((resid * f[j]) * 1e6)
                for k in range(j, 4):
                    h_u[(j, k)] = h_u.get((j, k), 0) + _round_away(
                        ((wt * f[j]) * f[k]) * 1e6
                    )
        env = {f"g{j}": g_u[j] / 1e6 for j in range(4)}
        for j in range(4):
            for k in range(4):
                h = h_u[(min(j, k), max(j, k))] / 1e6
                env[f"a{j}{k}"] = (h + NEWTON_RIDGE) if j == k else h
        det_a = eval(det_a_expr, {"__builtins__": {}}, env)
        for j in range(4):
            delta = eval(det_j_exprs[j], {"__builtins__": {}}, env) / det_a
            w_u[j] += _round_away(delta * 1e6)

    X = spark.createDataFrame(
        rows,
        "doc_id long, y double, f0_u long, f1_u long, f2_u long, f3_u long",
    )
    got = train_logreg_newton_fixed(X)
    assert got == w_u, f"{got} != {w_u}"
    # and the learned separator must point the right way
    assert got[1] > 0


def test_top_pc_finds_planted_direction(spark, tmp_path):
    """On data stretched along a planted axis, the learned component
    aligns with it (|cos| > 0.99) and is unit-norm."""
    import math
    import random

    from apitap_spark.operators.ml import op_embedding_top_pc

    rng = random.Random(11)
    d = 16
    axis = [1.0 if i == 3 else 0.0 for i in range(d)]
    rows = []
    for vid in range(200):
        t = rng.gauss(0, 5.0)          # dominant variance along axis 3
        noise = [rng.gauss(0, 0.3) for _ in range(d)]
        rows.append((vid, 0, [t * a + nz for a, nz in zip(axis, noise)]))
    spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    pc = {r["pos"]: r["loading"]
          for r in op_embedding_top_pc(spark, str(tmp_path)).collect()}
    norm = math.sqrt(sum(v * v for v in pc.values()))
    assert abs(norm - 1.0) < 1e-3          # unit up to micro rounding
    cos = abs(pc[4])                       # pos is 1-based: axis 3 -> pos 4
    assert cos / norm > 0.99


def test_logreg_auc_matches_python_mann_whitney(spark, sf_dir):
    """Exact midrank Mann-Whitney AUC recomputed in Python from the same
    integer scores; the score must rank the long-form label well."""
    from apitap_spark.operators.ml import (
        _feature_micro_frame,
        op_ml_logreg_eval_auc,
        train_logreg_newton_fixed,
    )

    X = _feature_micro_frame(spark, sf_dir)
    w_u = train_logreg_newton_fixed(X)
    data = [
        (r["y"], sum(r[f"f{j}_u"] * w_u[j] for j in range(len(w_u))))
        for r in X.collect()
    ]
    scores = sorted(z for _, z in data)
    import bisect

    def r2(z):  # 2*midrank = min_rank + max_rank
        lo = bisect.bisect_left(scores, z) + 1
        hi = bisect.bisect_right(scores, z)
        return lo + hi

    sum_r2 = sum(r2(z) for y, z in data if y == 1.0)
    n_pos = sum(1 for y, _ in data if y == 1.0)
    n_neg = len(data) - n_pos
    num = sum_r2 - n_pos * (n_pos + 1)
    row = op_ml_logreg_eval_auc(spark, sf_dir).collect()[0]
    assert (row["n_pos"], row["n_neg"], row["sum_r2_pos"]) == (
        n_pos,
        n_neg,
        sum_r2,
    )
    assert row["auc_num"] == num
    assert row["auc"] == float(num) / float(2 * n_pos * n_neg)
    assert row["auc"] > 0.95  # the learned score ranks the label well


def test_mahalanobis_outliers_python_replay(spark, sf_dir):
    """Triangulate op_embedding_outliers_mahalanobis: independent Python
    fold replay (same milli rounding, same index-order sum)."""
    import math

    from apitap_spark.operators.quality import (
        MAHA_TOP_K,
        op_embedding_outliers_mahalanobis,
    )
    from apitap_spark.session import read_table

    rows = read_table(spark, sf_dir, "embeddings").collect()
    import decimal

    def milli(x):
        # engine ROUND(x*1000, 0): HALF_UP on the double product
        return int(
            decimal.Decimal(repr(float(x) * 1000.0)).quantize(
                0, rounding=decimal.ROUND_HALF_UP
            )
        )

    M = {r.vec_id: [milli(x) for x in r.embedding] for r in rows}
    n = len(M)
    d = len(next(iter(M.values())))
    S = [sum(m[i] for m in M.values()) for i in range(d)]
    Q = [sum(m[i] * m[i] for m in M.values()) for i in range(d)]
    VN = [n * Q[i] - S[i] * S[i] for i in range(d)]
    dist = {}
    for v, m in M.items():
        acc = 0.0
        for i in range(d):
            if VN[i] != 0:
                diff = n * m[i] - S[i]
                acc = acc + float(diff * diff) / float(VN[i])
        dist[v] = acc
    expect = sorted(dist, key=lambda v: (-dist[v], v))[:MAHA_TOP_K]
    got = sorted(
        op_embedding_outliers_mahalanobis(spark, sf_dir).collect(),
        key=lambda r: r.rk,
    )
    assert [r.vec_id for r in got] == expect
    for r in got:
        assert r.dist_micro == math.floor(1000000.0 * dist[r.vec_id])


def test_basket_rules_python_recount(spark, sf_dir):
    """Triangulate op_basket_association_rules with a Python recount."""
    import math

    from apitap_spark.operators.ml import (
        BASKET_MIN_SUPPORT,
        op_basket_association_rules,
    )
    from apitap_spark.session import read_table

    li = read_table(spark, sf_dir, "lineitem").collect()
    baskets = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    n = len(baskets)
    item, pair = {}, {}
    for parts in baskets.values():
        for p in parts:
            item[p] = item.get(p, 0) + 1
        sp = sorted(parts)
        for i, p1 in enumerate(sp):
            for p2 in sp[i + 1 :]:
                pair[(p1, p2)] = pair.get((p1, p2), 0) + 1
    expect = {}
    for (p1, p2), c in pair.items():
        if c >= BASKET_MIN_SUPPORT:
            for a, b in ((p1, p2), (p2, p1)):
                expect[(a, b)] = (
                    c,
                    math.floor(1000000.0 * float(c) / float(item[a])),
                    math.floor(1000000.0 * float(c * n) / float(item[a] * item[b])),
                )
    got = {
        (r.antecedent, r.consequent): (
            r.support_n,
            r.confidence_micro,
            r.lift_micro,
        )
        for r in op_basket_association_rules(spark, sf_dir).collect()
    }
    assert got == expect and got


def test_rfm_segmentation_python_replay(spark, sf_dir):
    """Triangulate q_rfm_segmentation: Python ntile + segment replay."""
    from apitap_spark.plans.relational6 import q_rfm_segmentation
    from apitap_spark.session import read_table

    import decimal

    o = read_table(spark, sf_dir, "orders").collect()
    cust = {}
    for r in o:
        day = int(r.o_orderdate.timestamp()) // 86400
        cents = int(
            decimal.Decimal(repr(r.o_totalprice * 100.0)).quantize(
                0, rounding=decimal.ROUND_HALF_UP
            )
        )
        k = r.o_custkey
        last, freq, money = cust.get(k, (-1, 0, 0))
        cust[k] = (max(last, day), freq + 1, money + cents)
    ref = max(v[0] for v in cust.values())
    base = {
        k: (ref - last, freq, money) for k, (last, freq, money) in cust.items()
    }

    def ntile(keys_sorted):
        n = len(keys_sorted)
        out, start = {}, 0
        for t in range(1, 6):
            size = n // 5 + (1 if t <= n % 5 else 0)
            for k in keys_sorted[start : start + size]:
                out[k] = t
            start += size
        return out

    r_s = ntile(sorted(base, key=lambda k: (-base[k][0], k)))
    f_s = ntile(sorted(base, key=lambda k: (base[k][1], k)))
    m_s = ntile(sorted(base, key=lambda k: (base[k][2], k)))
    got = {r.o_custkey: r for r in q_rfm_segmentation(spark, sf_dir).collect()}
    assert set(got) == set(base)
    segs = set()
    for k, (rec, freq, money) in base.items():
        g = got[k]
        assert (g.recency_days, g.frequency, g.monetary_cents) == (rec, freq, money), k
        assert (g.r_score, g.f_score, g.m_score) == (r_s[k], f_s[k], m_s[k]), k
        r5, f5 = r_s[k], f_s[k]
        if r5 >= 4 and f5 >= 4 and m_s[k] >= 4:
            exp = "champion"
        elif r5 >= 4 and f5 >= 4:
            exp = "loyal_recent"
        elif r5 <= 2 and f5 >= 4:
            exp = "at_risk_loyal"
        elif r5 >= 4:
            exp = "recent"
        elif f5 >= 4:
            exp = "frequent"
        elif r5 <= 2 and f5 <= 2:
            exp = "hibernating"
        else:
            exp = "regular"
        assert g.segment == exp, k
        segs.add(exp)
    assert len(segs) >= 3  # the segmentation actually discriminates


def test_zorder_audit_python_replay(spark, sf_dir):
    """Triangulate op_zorder_layout_audit: Python Morton/ntile/zone-map
    replay, and Z-order must beat the linear layout on the box query."""
    from apitap_spark.operators.quality import (
        ZORDER_BOX_DEN,
        ZORDER_BOX_NUM,
        ZORDER_FILES,
        op_zorder_layout_audit,
    )
    from apitap_spark.session import read_table

    rows = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("long").alias("sec")
    ).collect()
    recs = [
        (r.o_custkey & 65535, (r.sec // 86400) & 65535, r.o_orderkey)
        for r in rows
    ]

    def morton(ck, d):
        z = 0
        for i in range(16):
            z += ((ck >> i) & 1) << (2 * i)
            z += ((d >> i) & 1) << (2 * i + 1)
        return z

    cks = [c for c, _, _ in recs]
    ds = [d for _, d, _ in recs]
    cklo = min(cks) + (max(cks) - min(cks)) * ZORDER_BOX_NUM // ZORDER_BOX_DEN
    ckhi = min(cks) + (max(cks) - min(cks)) * (ZORDER_BOX_NUM + 1) // ZORDER_BOX_DEN
    dlo = min(ds) + (max(ds) - min(ds)) * ZORDER_BOX_NUM // ZORDER_BOX_DEN
    dhi = min(ds) + (max(ds) - min(ds)) * (ZORDER_BOX_NUM + 1) // ZORDER_BOX_DEN

    def ntile_files(order_key):
        srt = sorted(recs, key=order_key)
        n = len(srt)
        files, start = [], 0
        for t in range(ZORDER_FILES):
            size = n // ZORDER_FILES + (1 if t < n % ZORDER_FILES else 0)
            files.append(srt[start : start + size])
            start += size
        return files

    expect = {}
    for name, key in (
        ("zorder", lambda r: (morton(r[0], r[1]), r[2])),
        ("linear", lambda r: (r[0], r[2])),
    ):
        scanned = rows_sc = 0
        files = ntile_files(key)
        for fr in files:
            if not fr:
                continue
            a, b = min(c for c, _, _ in fr), max(c for c, _, _ in fr)
            c2, d2 = min(d for _, d, _ in fr), max(d for _, d, _ in fr)
            if a <= ckhi and b >= cklo and c2 <= dhi and d2 >= dlo:
                scanned += 1
                rows_sc += len(fr)
        expect[name] = (ZORDER_FILES, scanned, rows_sc, len(recs))
    got = {
        r.layout: (r.n_files, r.files_scanned, r.rows_scanned, r.total_rows)
        for r in op_zorder_layout_audit(spark, sf_dir).collect()
    }
    assert got == expect
    assert got["zorder"][2] < got["linear"][2]  # z-order prunes more rows


def test_linear_trend_python_replay(spark, sf_dir):
    """Triangulate op_ml_linear_trend: numpy lstsq must agree with the
    closed form to float precision, and the exact integer moments must
    match a Python recount bit-for-bit."""
    import math

    import numpy as np

    from apitap_spark.operators.ml import op_ml_linear_trend
    from apitap_spark.session import read_table

    import decimal

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("ts").cast("long") / 3600).cast("bigint").alias("h"),
        "value",
    ).collect()
    hourly = {}
    for r in ev:
        cents = int(
            decimal.Decimal(repr(r.value * 100.0)).quantize(
                0, rounding=decimal.ROUND_HALF_UP
            )
        )
        hourly[(r.event_type, r.h)] = hourly.get((r.event_type, r.h), 0) + cents
    series = {}
    for (et, h), y in hourly.items():
        series.setdefault(et, []).append((h, y))
    got = {r.event_type: r for r in op_ml_linear_trend(spark, sf_dir).collect()}
    assert set(got) == set(series)
    for et, pts in series.items():
        h0 = min(h for h, _ in pts)
        xs = [h - h0 for h, _ in pts]
        ys = [y for _, y in pts]
        n = len(pts)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        sxy = sum(a * b for a, b in zip(xs, ys))
        syy = sum(v * v for v in ys)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        r = got[et]
        assert r.n == n
        assert r.slope_micro == math.floor(1000000.0 * float(num) / float(den))
        assert r.intercept_micro == math.floor(
            1000000.0 * float(sy * sxx - sx * sxy) / float(den)
        )
        assert r.r2_micro == math.floor(
            1000000.0 * float(num) / float(den) * float(num)
            / float(n * syy - sy * sy)
        )
        slope_np, icept_np = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
        assert abs(r.slope_micro / 1e6 - slope_np) < 1e-3 * max(1.0, abs(slope_np))
        assert abs(r.intercept_micro / 1e6 - icept_np) < 1e-2 * max(1.0, abs(icept_np))
        assert 0 <= r.r2_micro <= 1_000_000


def test_ks_test_python_replay(spark, sf_dir):
    """Triangulate op_ab_test_ks against scipy-free Python ECDF replay."""
    import math

    from apitap_spark.operators.ml import op_ab_test_ks
    from apitap_spark.session import read_table

    import decimal

    ev = read_table(spark, sf_dir, "events").collect()
    samples = {}
    for r in ev:
        cents = int(
            decimal.Decimal(repr(r.value * 100.0)).quantize(
                0, rounding=decimal.ROUND_HALF_UP
            )
        )
        samples.setdefault(r.event_type, ([], []))[r.user_id % 2].append(cents)
    got = {r.event_type: r for r in op_ab_test_ks(spark, sf_dir).collect()}
    assert set(got) == set(samples)
    for et, (a, b) in samples.items():
        a.sort()
        b.sort()
        na, nb = len(a), len(b)
        import bisect

        d_num = 0
        for x in sorted(set(a) | set(b)):
            ia = bisect.bisect_right(a, x)
            ib = bisect.bisect_right(b, x)
            d_num = max(d_num, abs(ia * nb - ib * na))
        r = got[et]
        assert (r.na, r.nb, r.d_num) == (na, nb, d_num), et
        assert r.d_micro == math.floor(
            1000000.0 * float(d_num) / float(na) / float(nb)
        )
        dd = float(d_num) / float(na) / float(nb)
        crit = 1.36 * math.sqrt(float(na + nb) / float(na) / float(nb))
        assert r.significant == (dd > crit)


def test_benford_audit_python_recount(spark, sf_dir):
    """Triangulate op_benford_audit: Python first-digit recount against
    the fixed micro literals; shares must sum to ~1."""
    import math

    from apitap_spark.operators.quality import BENFORD_MICRO, op_benford_audit
    from apitap_spark.session import read_table

    import decimal

    ev = read_table(spark, sf_dir, "events").collect()
    counts = {}
    for r in ev:
        if r.value <= 0:
            continue
        cents = int(
            decimal.Decimal(repr(r.value * 100.0)).quantize(
                0, rounding=decimal.ROUND_HALF_UP
            )
        )
        d = int(str(cents)[0])
        counts[d] = counts.get(d, 0) + 1
    n = sum(counts.values())
    got = {r.first_digit: r for r in op_benford_audit(spark, sf_dir).collect()}
    assert set(got) == set(counts)
    for d, c in counts.items():
        r = got[d]
        share = math.floor(1000000.0 * float(c) / float(n))
        assert (r.n_obs, r.share_micro) == (c, share), d
        assert r.benford_micro == BENFORD_MICRO[d - 1]
        assert r.diff_micro == share - BENFORD_MICRO[d - 1]
        exact = math.floor(1000000 * math.log10(1 + 1 / d))
        assert abs(r.benford_micro - exact) <= 1  # literals match the law
    assert 1_000_000 - 9 <= sum(r.share_micro for r in got.values()) <= 1_000_000


def test_pr_curve_python_recount(spark, sf_dir):
    """Recount op_ml_pr_curve cell-by-cell in Python and assert the
    monotone sweep structure (n_pred/tp/recall non-increasing)."""
    import decimal
    import math

    from apitap_spark.operators.ml import (
        PR_STEPS,
        PR_WIDE_LINES,
        op_ml_pr_curve,
    )
    from apitap_spark.session import read_table

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey").collect()
    lines = {}
    for r in li:
        lines[r.l_orderkey] = lines.get(r.l_orderkey, 0) + 1
    ys = []
    for r in o:
        cents = int(
            decimal.Decimal(repr(r.o_totalprice * 100.0)).quantize(
                0, rounding=decimal.ROUND_HALF_UP
            )
        )
        ys.append((cents, 1 if lines.get(r.o_orderkey, 0) >= PR_WIDE_LINES else 0))
    mn = min(y for y, _ in ys)
    mx = max(y for y, _ in ys)
    pos = sum(lab for _, lab in ys)
    got = {r.i: r for r in op_ml_pr_curve(spark, sf_dir).collect()}
    assert set(got) == set(range(1, PR_STEPS + 1))
    prev = None
    for i in range(1, PR_STEPS + 1):
        thr = mn + ((mx - mn) * i) // PR_STEPS
        n_pred = sum(1 for y, _ in ys if y >= thr)
        tp = sum(lab for y, lab in ys if y >= thr)
        r = got[i]
        assert (r.threshold_cents, r.n_pred, r.tp, r.fp, r.pos_total) == (
            thr, n_pred, tp, n_pred - tp, pos,
        ), i
        if n_pred > 0:
            assert r.precision_micro == math.floor(
                1000000.0 * float(tp) / float(n_pred)
            )
        else:
            assert r.precision_micro is None
        assert r.recall_micro == math.floor(1000000.0 * float(tp) / float(pos))
        if prev is not None:
            assert r.n_pred <= prev.n_pred
            assert r.tp <= prev.tp
            assert r.recall_micro <= prev.recall_micro
        prev = r
