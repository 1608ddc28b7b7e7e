"""Property-style batch tests for the text column functions: one Spark
job over a seeded adversarial corpus, each row compared against an
independent pure-Python reference implementation."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from apitap_spark.functions.text import (
    normalize_ws,
    shingle_grams,
    shingles,
    token_count,
)
from apitap_spark.operators.textclean import scrub_pii

_WORDS = ["a", "bb", "ccc", "Δδ", "x-y", "a.b@c.de", "1.2.3.4", "()", "+1"]
_WS = [" ", "  ", "\t", "\n", " \t "]


def _corpus(n: int = 300) -> list[tuple[int, str]]:
    rng = random.Random(0xC0FFEE)
    rows = [(0, ""), (1, " "), (2, "solo"), (3, "a b"), (4, "\t\n ")]
    for i in range(5, n):
        k = rng.randint(0, 12)
        text = "".join(
            rng.choice(_WORDS) + rng.choice(_WS) for _ in range(k)
        ).rstrip()
        rows.append((i, text))
    return rows


# Reference matches the documented contract: trim strips SPACES only
# (engine-consistent across Spark and DuckDB; see functions.text.tokens).
def _py_trim(text: str) -> str:
    return text.strip(" ")


def _py_tokens(text: str) -> list[str]:
    t = _py_trim(text)
    return re.split(r"\s+", t) if t else [""]


def _py_token_count(text: str) -> int:
    return 0 if not _py_trim(text) else len(_py_tokens(text))


def _py_grams(text: str, n: int) -> list[str]:
    t = _py_tokens(text)
    if not _py_trim(text) or len(t) < n:
        return []
    return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]


def _dedupe_keep_order(xs: list[str]) -> list[str]:
    seen: set[str] = set()
    return [x for x in xs if not (x in seen or seen.add(x))]


def test_text_functions_match_python_reference(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            token_count("text").alias("tc"),
            shingle_grams("text", 3).alias("g3"),
            shingles("text", 3).alias("s3"),
            shingle_grams("text", 2).alias("g2"),
            normalize_ws("text").alias("nw"),
        ).collect()
    }
    for doc_id, text in rows:
        r = got[doc_id]
        assert r["tc"] == _py_token_count(text), (doc_id, text)
        assert r["g3"] == _py_grams(text, 3), (doc_id, text)
        assert r["s3"] == _dedupe_keep_order(_py_grams(text, 3)), (doc_id, text)
        assert r["g2"] == _py_grams(text, 2), (doc_id, text)
        assert r["nw"] == re.sub(r"\s+", " ", _py_trim(text).lower()), (
            doc_id,
            text,
        )


def test_scrub_pii_idempotent_and_complete(spark):
    rng = random.Random(7)
    pii = [
        "bob@ex.org",
        "10.0.0.1",
        "+1 (415) 555-0199",
        "a.b+c@d-e.info",
        "255.255.255.255",
    ]
    rows = []
    for i in range(120):
        parts = [rng.choice(_WORDS + pii) for _ in range(rng.randint(0, 8))]
        rows.append((i, " ".join(parts)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = df.select("doc_id", scrub_pii("text").alias("r1"))
    twice = once.select("doc_id", scrub_pii("r1").alias("r2"), "r1")
    for r in twice.collect():
        assert r["r1"] == r["r2"], r  # idempotent: placeholders never re-match
    leftovers = once.filter(
        F.col("r1").rlike(r"@[A-Za-z]") | F.col("r1").rlike(r"\d+\.\d+\.\d+\.\d+")
    )
    assert leftovers.count() == 0


def test_chunk_passages_matches_python_reference(spark):
    """chunk_passages over a seeded adversarial corpus (blank docs, 1-token
    docs, lengths straddling every chunk/stride boundary) equals a pure-
    Python reference of the start-grid + slice semantics."""
    from apitap_spark.operators.textstats import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_passages,
    )

    rng = random.Random(0xC0DE)
    c, s = CHUNK_TOKENS, CHUNK_STRIDE
    lengths = [0, 1, 2, c - 1, c, c + 1, s, s + 1, c + s - 1, c + s, c + s + 1,
               2 * s, 2 * s + c, 3 * s + 5] + [rng.randint(0, 4 * c) for _ in range(30)]
    rows = [(i, " ".join(f"t{i}x{j}" for j in range(n))) for i, n in enumerate(lengths)]
    rows.append((len(rows), "   "))  # whitespace-only: must vanish

    def py_chunks(text: str):
        t = _py_tokens(text)
        if not _py_trim(text):
            return []
        n = len(t)
        starts = [st for st in range(1, n + 1, s) if st == 1 or st <= n - c + s]
        return [
            (cid, st, min(c, n - st + 1), " ".join(t[st - 1 : st - 1 + c]))
            for cid, st in enumerate(starts)
        ]

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict = {}
    for r in chunk_passages(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_tok"], r["n_tok"], r["chunk_text"])
        )
    for doc_id, text in rows:
        expected = py_chunks(text)
        assert sorted(got.get(doc_id, [])) == expected, (doc_id, text[:50])


def test_winnowing_matches_python_reference(spark):
    """op_text_winnowing's gram hash + window-min equals a pure-Python
    md5 reference on a seeded corpus with heavy repetition (the winnow
    guarantee's worst case) and boundary-length texts."""
    import hashlib

    from apitap_spark.operators.textstats import (
        WINNOW_K,
        WINNOW_W,
        op_text_winnowing,
    )

    def py_prints(text: str) -> set:
        t = re.sub(r"\s+", " ", _py_trim(text).lower())
        if len(t) < WINNOW_K:
            return set()
        hs = [
            int(hashlib.md5(t[i : i + WINNOW_K].encode()).hexdigest()[:15], 16)
            for i in range(len(t) - WINNOW_K + 1)
        ]
        return {
            min(hs[i : i + WINNOW_W]) for i in range(len(hs))
        }

    rng = random.Random(0xF00D)
    rows = [(0, ""), (1, "short"), (2, "x" * WINNOW_K), (3, "ab" * 40)]
    for i in range(4, 40):
        rows.append(
            (i, "".join(rng.choice("ab ") for _ in range(rng.randint(0, 60))))
        )

    from apitap_spark.operators.textstats import winnow_fingerprints

    df = spark.createDataFrame(rows, "doc_id long, text string")
    spark_out: dict = {}
    for r in winnow_fingerprints(df).collect():
        spark_out.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    for doc_id, text in rows:
        assert spark_out.get(doc_id, set()) == py_prints(text), (doc_id, text)


def test_rake_matches_python_reference(spark, tmp_path):
    """Bit-exact phrase scores against a pure-Python RAKE on a planted
    corpus with known phrase structure."""
    from apitap_spark.operators.textstats import (
        RAKE_TOP_K,
        STOPWORDS,
        op_text_keywords_rake,
    )

    docs = [
        (1, "the quick brown fox and the lazy dog"),
        (2, "quick brown fox is a fast animal"),
        (3, "the lazy dog sleeps in the warm sun"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    got = {r["phrase"]: r for r in
           op_text_keywords_rake(spark, str(tmp_path)).collect()}

    # python replay
    stop = set(STOPWORDS)
    phrase_runs = []
    for _id, text in docs:
        run = []
        for w in text.split():
            if w in stop:
                if run:
                    phrase_runs.append(run)
                run = []
            else:
                run.append(w)
        if run:
            phrase_runs.append(run)
    freq: dict = {}
    deg: dict = {}
    for run in phrase_runs:
        for w in run:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(run)
    s_u = {w: round(deg[w] / freq[w] * 1e6) for w in freq}
    scores: dict = {}
    occ: dict = {}
    for run in phrase_runs:
        ph = " ".join(run)
        scores[ph] = sum(s_u[w] for w in run)
        occ[ph] = occ.get(ph, 0) + 1
    assert len(got) == min(RAKE_TOP_K, len(scores))
    for ph, r in got.items():
        assert r["score_micro"] == scores[ph]
        assert r["n_occurrences"] == occ[ph]
        assert r["n_words"] == len(ph.split())
    # multi-word phrases outrank their constituent single words in RAKE
    assert got["quick brown fox"]["score"] > got.get(
        "sleeps", got["quick brown fox"]
    )["score"] or "sleeps" not in got


def test_bm25_python_replay(spark, sf_dir):
    """Triangulate op_text_bm25_topk: exact fixed-point replay in Python
    over the same corpus, plus monotone agreement with float Okapi BM25
    (linear-idf variant) on the returned ranking."""
    import math

    from apitap_spark.operators.textstats import (
        BM25_QUERY_TERMS,
        BM25_TOP_K,
        op_text_bm25_topk,
    )
    from apitap_spark.session import read_table

    got = op_text_bm25_topk(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text.strip().split()
        for r in read_table(spark, sf_dir, "documents").collect()
        if r.text and r.text.strip()
    }
    dl = {d: len(t) for d, t in docs.items()}
    n_docs, total_len = len(docs), sum(dl.values())
    tf = {}
    for d, toks in docs.items():
        for t in toks:
            if t in BM25_QUERY_TERMS:
                tf[(d, t)] = tf.get((d, t), 0) + 1
    df = {}
    for (d, t), _ in tf.items():
        df[t] = df.get(t, 0) + 1
    scores = {}
    for (d, t), f in tf.items():
        num = (2 * (n_docs - df[t]) + 1) * (22 * f * total_len)
        micro = math.floor(
            1000000.0 * float(num) / float(2 * df[t] + 1)
            / float(10 * f * total_len + 3 * total_len + 9 * dl[d] * n_docs)
        )
        scores[d] = scores.get(d, 0) + micro
    order = sorted(scores, key=lambda d: (-scores[d], d))[:BM25_TOP_K]
    assert [r.doc_id for r in sorted(got, key=lambda r: r.rk)] == order
    for r in got:
        assert r.score_micro == scores[r.doc_id] and r.score_micro > 0
