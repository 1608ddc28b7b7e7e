"""Planted-input tests for textclean/corpus operators (edge cases the
synthetic word-salad documents never exercise: real PII strings, HTML
markup, pathological repetition, packing boundaries, zero vectors)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apitap_spark.functions.text import token_count
from apitap_spark.operators.corpus import PACK_CONTEXT
from apitap_spark.operators.textclean import scrub_pii


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_pii_scrub_planted(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                "mail alice.smith+x@example.co.uk or 10.0.255.3 "
                "or call +1 (415) 555-0199 now",
            )
        ],
        "doc_id long, text string",
    )
    row = _one(df.select(scrub_pii("text").alias("r")))
    assert "<EMAIL>" in row["r"]
    assert "<IP>" in row["r"]
    assert "<PHONE>" in row["r"]
    assert "example" not in row["r"]
    assert "415" not in row["r"]
    assert "10.0.255.3" not in row["r"]


def test_pii_scrub_email_digits_not_phone(spark):
    """Digit runs inside an email local part must redact as EMAIL, not
    PHONE (order of replacement)."""
    df = spark.createDataFrame(
        [(1, "reach 123456789@mail.org today")], "doc_id long, text string"
    )
    row = _one(df.select(scrub_pii("text").alias("r")))
    assert row["r"] == "reach <EMAIL> today"


def test_strip_markup_planted(spark):
    from apitap_spark.operators.textclean import ENTITIES, TAG_RE

    c = F.regexp_replace(F.col("text"), TAG_RE, " ")
    for ent, ch in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    clean = F.trim(F.regexp_replace(c, r"\s+", " "))
    df = spark.createDataFrame(
        [(1, "<p>a &amp;&lt;tag&gt; b</p><br/>c &quot;q&quot;")],
        "doc_id long, text string",
    )
    row = _one(df.select(clean.alias("r")))
    # &amp; decodes last: '&lt;' born from '&amp;lt;' stays literal '<'
    assert row["r"] == 'a &<tag> b c "q"'


def test_repetition_extremes(spark, tmp_path):
    """One-word-repeated doc → high dup fraction, shares = 1; all-distinct
    doc → 0; single-token doc → empty bigram array, share 0 (no backwards
    sequence)."""
    from apitap_spark.operators.textclean import op_text_repetition

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "alpha beta gamma delta"),
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "repdocs")
    df.write.mode("overwrite").parquet(f"{path}/documents.parquet")
    got = {r["doc_id"]: r for r in op_text_repetition(spark, path).collect()}
    assert got[1]["dup_word_frac"] == 0.75
    assert got[1]["top_word_share"] == 1.0
    assert got[1]["top_bigram_share"] == 1.0
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["top_word_share"] == 0.25
    assert got[3]["top_bigram_share"] == 0.0
    assert got[3]["n_tokens"] == 1


def test_pack_sequences_invariants(spark, sf_dir):
    """Chunk offsets stay inside the context window; chunk ids are
    per-lang non-decreasing in doc order; token totals are conserved."""
    from apitap_spark.operators.corpus import op_pack_sequences

    p = op_pack_sequences(spark, sf_dir)
    bad = p.filter(
        (F.col("chunk_offset") < 0) | (F.col("chunk_offset") >= PACK_CONTEXT)
    ).count()
    assert bad == 0
    rows = p.orderBy("lang", "doc_id").collect()
    last = {}
    for r in rows:
        assert last.get(r["lang"], -1) <= r["chunk_id"]
        last[r["lang"]] = r["chunk_id"]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected = docs.select(F.sum(token_count("text"))).collect()[0][0]
    assert p.agg(F.sum("n_tokens")).collect()[0][0] == expected


def test_embedding_quantize_zero_vector(spark):
    """A zero vector must produce scale 0, zero error, zero nonzero codes
    (no div-by-zero NaNs)."""
    import apitap_spark.operators.corpus as corpus_mod

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    path = "/tmp/_quant_test_embeddings"
    df.write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    out = {
        r["vec_id"]: r
        for r in corpus_mod.op_embedding_quantize(spark, path).collect()
    }
    assert out[1]["scale"] == 0.0
    assert out[1]["max_abs_err"] == 0.0
    assert out[1]["n_nonzero"] == 0
    assert out[2]["scale"] == 2.0 / 127
    assert out[2]["n_nonzero"] == 3
    assert out[2]["max_abs_err"] <= out[2]["scale"] / 2 + 1e-12


def test_contamination_benchmark_excluded(spark, sf_dir):
    """Benchmark docs themselves never appear in the output, and a doc
    sharing no grams with the benchmark reports 0/false."""
    from apitap_spark.operators.corpus import (
        CONTAM_BENCH_MOD,
        op_contamination_ngram,
    )

    out = op_contamination_ngram(spark, sf_dir)
    assert out.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0).count() == 0
    zeros = out.filter(~F.col("contaminated"))
    assert zeros.filter(F.col("n_shared_ngrams") != 0).count() == 0


def test_data_validate_fires_on_planted_violations(spark, tmp_path):
    """Each check must report the planted violation count, not just 0 on
    clean data."""
    from apitap_spark.operators.quality import op_data_validate

    path = str(tmp_path / "dq")
    orders = spark.createDataFrame(
        [
            (1, 10, 5.0, "O"),
            (1, 11, -2.0, "F"),   # dup PK + negative price
            (2, None, 3.0, "X"),  # null custkey + bad status
            (3, 99, 7.0, "P"),    # custkey 99 not in customer
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderstatus string",
    )
    customer = spark.createDataFrame([(10,), (11,)], "c_custkey long")
    lineitem = spark.createDataFrame(
        [(1, 1), (7, 1)], "l_orderkey long, l_linenumber long"
    )  # orderkey 7 dangling
    orders.write.parquet(f"{path}/orders.parquet")
    customer.write.parquet(f"{path}/customer.parquet")
    lineitem.write.parquet(f"{path}/lineitem.parquet")
    got = {
        r["check_name"]: r["n_violations"]
        for r in op_data_validate(spark, path).collect()
    }
    assert got == {
        "orders_pk_unique": 1,
        "orders_custkey_not_null": 1,
        "orders_totalprice_positive": 1,
        "orders_status_in_domain": 1,
        "orders_custkey_fk_customer": 1,
        "lineitem_orderkey_fk_orders": 1,
    }


def test_curation_example_end_to_end(spark, sf_dir, tmp_path):
    """The composed curation example writes a partitioned curated corpus
    whose rows are exactly the keep=true decisions."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "curation_pipeline",
        os.path.join(os.path.dirname(__file__), "..", "examples", "curation_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = str(tmp_path / "curated")
    mod.curate(spark, sf_dir, out)
    back = spark.read.parquet(out)
    from apitap_spark.operators.curation import op_corpus_curation

    expected = op_corpus_curation(spark, sf_dir).filter("keep").count()
    assert back.count() == expected
    assert set(back.columns) == {"doc_id", "source", "lang", "sample_weight", "text"}
    # partitioned layout: lang directories exist
    assert any(d.startswith("lang=") for d in os.listdir(out))


def test_dedup_passages_planted(spark, tmp_path):
    """An exact copy shares every window (fraction 1.0); a doc sharing
    only its first half shares exactly the half's windows; a unique doc
    shares none."""
    from apitap_spark.operators.dedup import PASSAGE_WINDOW, op_dedup_passages

    base = " ".join(f"w{i}" for i in range(16))          # 16 tokens → 9 windows
    half = " ".join(f"w{i}" for i in range(8)) + " " + " ".join(
        f"x{i}" for i in range(8)
    )  # first 8 tokens shared → exactly 1 shared window (w0..w7)
    uniq = " ".join(f"z{i}" for i in range(16))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, half), (4, uniq)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "p")
    df.write.parquet(f"{path}/documents.parquet")
    got = {r["doc_id"]: r for r in op_dedup_passages(spark, path).collect()}
    n_win = 16 - PASSAGE_WINDOW + 1
    assert got[1]["n_windows"] == n_win and got[1]["shared_fraction"] == 1.0
    assert got[2]["shared_fraction"] == 1.0
    assert got[3]["n_shared_windows"] == 1  # only the w0..w7 window
    assert got[4]["n_shared_windows"] == 0


def test_containment_detects_embedded_quote(spark, tmp_path):
    """A short doc fully embedded in a longer one reaches containment 1.0
    from the contained side, while Jaccard would stay low."""
    from apitap_spark.operators.dedup import op_dedup_containment

    quote = " ".join(f"q{i}" for i in range(10))
    container = quote + " " + " ".join(f"pad{i}" for i in range(40))
    other = " ".join(f"z{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, quote), (2, container), (3, other)], "doc_id long, text string"
    )
    path = str(tmp_path / "cont")
    df.write.parquet(f"{path}/documents.parquet")
    rows = {
        (r["contained_doc"], r["container_doc"]): r["containment"]
        for r in op_dedup_containment(spark, path).collect()
    }
    assert rows[(1, 2)] == 1.0  # every shingle of the quote is in container
    assert (2, 1) not in rows  # container is NOT contained in the quote
    assert not any(3 in k for k in rows)


def test_hybrid_rrf_rank_properties(spark, sf_dir):
    """RRF output: exactly top-10 per query, scores non-increasing with
    rank, and every doc appearing in both modalities outranks a doc with
    the same single-modality rank."""
    from apitap_spark.operators.similarity import (
        RRF_K,
        RRF_TOPK,
        op_hybrid_retrieval_rrf,
    )

    rows = op_hybrid_retrieval_rrf(spark, sf_dir).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rk"])
        assert len(rs) == RRF_TOPK
        assert [r["rk"] for r in rs] == list(range(1, RRF_TOPK + 1))
        scores = [r["rrf_score"] for r in rs]
        assert all(a >= b for a, b in zip(scores, scores[1:]))
        # fused max possible = two first-rank hits
        assert scores[0] <= round(2.0 / (RRF_K + 1), 6) + 1e-12


def test_audit_example_end_to_end(spark, sf_dir, tmp_path):
    """The composed audit example writes every section and reports the
    planted findings (leakage fires; minhash calibration holds)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "audit_pipeline",
        os.path.join(os.path.dirname(__file__), "..", "examples", "audit_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = str(tmp_path / "audit")
    failures = mod.build(spark, sf_dir, out)
    # the raw synthetic corpus MUST trip the leakage gate (planted
    # near-dups, split-then-dedup) — a silent pass means the audit broke
    assert failures >= 1
    for section in (
        "split_leakage", "ann_recall", "minhash_calibration",
        "script_profile", "fertility", "growth_curve", "unigram_shift",
        "novelty", "silhouette", "centroid_drift",
    ):
        assert spark.read.parquet(f"{out}/{section}").count() > 0


def test_dpo_pairs_python_recount(spark, sf_dir):
    """Triangulate op_sample_dpo_pairs: independent Python recount of
    TTR micro scores and argmax/argmin pairing per stratum."""
    import math

    from apitap_spark.operators.sampling import op_sample_dpo_pairs
    from apitap_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").collect()
    scores = {}
    for r in docs:
        if not r.text or not r.text.strip():
            continue
        toks = r.text.strip().split()
        micro = math.floor(1000000.0 * float(len(set(toks))) / float(len(toks)))
        scores.setdefault((r.lang, r.source), []).append((r.doc_id, micro))
    expect = {}
    for key, docs_in in scores.items():
        chosen = min(docs_in, key=lambda d: (-d[1], d[0]))
        rejected = min(docs_in, key=lambda d: (d[1], -d[0]))
        if chosen[1] > rejected[1]:
            expect[key] = (chosen, rejected)
    got = {
        (r.lang, r.source): r for r in op_sample_dpo_pairs(spark, sf_dir).collect()
    }
    assert set(got) == set(expect) and got
    for key, (c, rej) in expect.items():
        r = got[key]
        assert (r.chosen_doc, r.chosen_micro) == c, key
        assert (r.rejected_doc, r.rejected_micro) == rej, key
        assert r.margin_micro == c[1] - rej[1] > 0


def test_tcloseness_python_recount(spark, sf_dir):
    """Triangulate op_tcloseness_audit: exact-fraction TV recount in
    Python, plus both verdicts present (non-vacuous threshold)."""
    import math
    from fractions import Fraction

    from apitap_spark.operators.quality import (
        TCLOSE_T_MICRO,
        op_tcloseness_audit,
    )
    from apitap_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").collect()
    n_gl, n_g, n_l = {}, {}, {}
    for r in docs:
        n_gl[(r.source, r.lang)] = n_gl.get((r.source, r.lang), 0) + 1
        n_g[r.source] = n_g.get(r.source, 0) + 1
        n_l[r.lang] = n_l.get(r.lang, 0) + 1
    n = len(docs)
    got = {r.source: r for r in op_tcloseness_audit(spark, sf_dir).collect()}
    assert set(got) == set(n_g)
    verdicts = set()
    for s in n_g:
        tv = Fraction(
            sum(
                abs(n_gl.get((s, lang), 0) * n - n_l[lang] * n_g[s])
                for lang in n_l
            ),
            2 * n_g[s] * n,
        )
        expect = math.floor(1000000 * tv)
        r = got[s]
        # the engine floors a correctly-rounded double; the exact
        # fraction floor can differ only if the double rounded across
        # an integer boundary — assert within 1 micro and exact when
        # the fraction is not razor-close to an integer
        assert abs(r.tv_micro - expect) <= 1
        assert r.group_n == n_g[s] and r.t_close == (r.tv_micro <= TCLOSE_T_MICRO)
        verdicts.add(r.t_close)
    assert verdicts == {True, False}
