"""Operator-quality tests beyond the oracle gate: recall of approximate
dedup/ANN rungs against their exact counterparts, multimodal plumbing."""

from __future__ import annotations

import pytest


def _pairs(df):
    return {(r["d1"], r["d2"]) for r in df.collect()}


def test_minhash_matches_exact_jaccard(spark, sf_dir):
    """LSH candidates + exact verification must equal exact Jaccard >= 0.8."""
    from apitap_spark.operators.dedup import (
        _jaccard_pairs,
        _shingle_df,
        op_dedup_minhash_lsh,
    )

    sh = _shingle_df(spark, sf_dir)
    exact = _pairs(_jaccard_pairs(sh, None, 0.8))
    lsh = _pairs(op_dedup_minhash_lsh(spark, sf_dir))
    assert lsh == exact
    assert exact, "testdata should contain planted near-duplicates"


def test_simhash_finds_planted_neardups(spark, sf_dir):
    """Very-high-Jaccard pairs have near-identical token multisets → their
    simhash hamming distance must be tiny."""
    from apitap_spark.operators.dedup import (
        _jaccard_pairs,
        _shingle_df,
        op_dedup_simhash,
    )

    sh = _shingle_df(spark, sf_dir)
    planted = _pairs(_jaccard_pairs(sh, None, 0.95))
    found = _pairs(op_dedup_simhash(spark, sf_dir))
    assert planted, "expected planted >=0.95 jaccard pairs in testdata"
    missed = planted - found
    # 8x8-bit banding guarantees hamming<=7 detection; measured planted
    # distances top out around 5 — a couple of outliers tolerated.
    assert len(missed) <= max(1, len(planted) // 10), f"simhash missed {missed}"


def test_lsh_ann_recall(spark, sf_dir):
    """LSH top-5 should recover a reasonable fraction of brute-force top-5.

    Random gaussian-ish embeddings are LSH's worst case (neighbors are
    weak), so the bar is deliberately modest — this guards against the
    bucketing being broken (0 candidates), not against physics."""
    from apitap_spark.operators.similarity import (
        op_ann_cosine_topk,
        op_ann_lsh_bucketed,
    )

    exact = {
        (r["q_id"], r["c_id"]) for r in op_ann_cosine_topk(spark, sf_dir).collect()
    }
    approx_df = op_ann_lsh_bucketed(spark, sf_dir)
    approx = {(r["q_id"], r["c_id"]) for r in approx_df.collect()}
    assert approx, "LSH ANN returned no candidates at all — bucketing broken"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.1, f"recall {recall:.2f} suspiciously low"


def test_simhash_signature_matches_python_reference(spark):
    """SimHash signatures equal a pure-Python md5 replay (hash bits, ±1
    votes, sign assembly) on a small planted frame — triangulating the
    Spark plan and the DuckDB oracle against a third implementation."""
    import hashlib

    from apitap_spark.operators.dedup import (
        SIMHASH_HASH_BITS,
        op_dedup_simhash,
    )

    base = " ".join(f"word{i}" for i in range(40))
    texts = {
        1: base + " alpha",
        2: base + " delta",  # 40 shared tokens, one swapped -> near-dup
        3: " ".join(f"other{i}" for i in range(30)),
    }

    def py_sig(text: str) -> int:
        votes = [0] * SIMHASH_HASH_BITS
        for w in text.strip().split():
            h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
            for i in range(SIMHASH_HASH_BITS):
                votes[i] += 1 if (h >> i) & 1 else -1
        return sum(1 << i for i, v in enumerate(votes) if v > 0)

    def hamming(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    sigs = {d: py_sig(t) for d, t in texts.items()}
    expected_pairs = {
        (a, b, hamming(sigs[a], sigs[b]))
        for a in texts
        for b in texts
        if a < b and hamming(sigs[a], sigs[b]) <= 7
    }

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(d, t, "en", "src0", len(t)) for d, t in texts.items()],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            (r["d1"], r["d2"], r["hamming"])
            for r in op_dedup_simhash(spark, td).collect()
        }
    assert got == expected_pairs
    assert expected_pairs  # planted near-dup pair (1,2) must collide


def test_ivfpq_results_stay_in_probed_cell(spark, sf_dir):
    """Every IVF-PQ hit belongs to its query's probed cell (= the
    candidate's own label), ranks are contiguous from 1, and every query
    with a non-empty cell gets results."""
    from apitap_spark.operators.similarity import IVFPQ_TOPK, op_ann_ivfpq_search
    from apitap_spark.session import read_table

    labels = {
        r["vec_id"]: r["label"]
        for r in read_table(spark, sf_dir, "embeddings").collect()
    }
    by_q: dict = {}
    for r in op_ann_ivfpq_search(spark, sf_dir).collect():
        by_q.setdefault(r["q_id"], []).append(r)
    assert by_q
    for q_id, rows in by_q.items():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= IVFPQ_TOPK
        cells = {r["cell"] for r in rows}
        assert len(cells) == 1  # one probed cell per query
        for r in rows:
            assert labels[r["c_id"]] == r["cell"]
            assert r["c_id"] != q_id
            assert r["adc_micro"] >= 0


def test_semantic_dedup_invariants(spark, sf_dir):
    """Every vector appears once; the lowest vec_id in each cell is always
    kept; a dropped vector really has a lower-id cell-mate above tau."""
    from apitap_spark.operators.similarity import SEMDEDUP_TAU, op_semantic_dedup

    rows = op_semantic_dedup(spark, sf_dir).collect()
    from apitap_spark.session import read_table

    n = read_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n
    by_cell: dict = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for members in by_cell.values():
        head = min(members, key=lambda r: r["vec_id"])
        assert head["is_kept"]  # no lower-id cell-mate exists to drop it
        assert head["max_cos_lower"] is None
    dropped = [r for r in rows if not r["is_kept"]]
    # the synthetic corpus plants >tau near-dup embeddings — the operator
    # must actually fire, not just vacuously keep everything
    assert dropped
    for r in dropped:
        assert r["max_cos_lower"] is not None
        assert r["max_cos_lower"] > SEMDEDUP_TAU - 1e-6


def test_pq_codes_invariants(spark, sf_dir):
    """Every vector gets an M-length code vector with per-block codes in
    [0, K); reconstruction error is non-negative and strictly better
    than assigning everything to code 0."""
    from apitap_spark.operators.similarity import PQ_K, PQ_M, op_ann_pq_codes
    from apitap_spark.session import read_table

    rows = op_ann_pq_codes(spark, sf_dir).collect()
    n = read_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n
    # gate serializes codes as a comma string (driver canonicalizer
    # can't hash list cells) — parse back for the invariants
    codes = {r["vec_id"]: [int(c) for c in r["codes"].split(",")] for r in rows}
    for r in rows:
        cs = codes[r["vec_id"]]
        assert len(cs) == PQ_M
        assert all(0 <= c < PQ_K for c in cs)
        assert r["recon_err"] >= 0
        assert r["err_micro"] == round(r["recon_err"] * 1_000_000)
    # codebooks are actually used: more than one distinct code per block
    for b in range(PQ_M):
        assert len({cs[b] for cs in codes.values()}) > 1


def test_pq_adc_approximates_exact_search(spark, sf_dir):
    """ADC top-k must overlap the exact L2 top-k meaningfully: for each
    query, at least one of the exact top-5 appears in the ADC top-5
    (PQ is lossy; total miss would mean broken codebooks or LUTs)."""
    from apitap_spark.operators.similarity import PQ_ADC_TOPK, op_ann_pq_adc
    from apitap_spark.session import read_table

    adc = {}
    for r in op_ann_pq_adc(spark, sf_dir).collect():
        adc.setdefault(r["q_id"], set()).add(r["c_id"])
    assert adc and all(len(v) == PQ_ADC_TOPK for v in adc.values())

    import numpy as np

    rows = read_table(spark, sf_dir, "embeddings").collect()
    mat = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    hits = 0
    for q_id, approx in adc.items():
        qv = mat[q_id]
        exact = sorted(
            (float(np.sum((v - qv) ** 2)), cid)
            for cid, v in mat.items()
            if cid != q_id
        )[:PQ_ADC_TOPK]
        if {cid for _, cid in exact} & approx:
            hits += 1
    assert hits >= max(1, len(adc) // 2), f"ADC overlapped exact in {hits}/{len(adc)}"


def test_multimodal_features_deterministic(spark, sf_dir):
    from apitap_spark.operators.multimodal import op_multimodal_features

    a = sorted(map(tuple, op_multimodal_features(spark, sf_dir).collect()))
    b = sorted(map(tuple, op_multimodal_features(spark, sf_dir).collect()))
    assert a == b
    assert all(r[1] > 0 for r in a)  # n_bytes positive


def _make_png(width, height, channels, pixels, filter_type=0):
    """Minimal test-local PNG encoder (any scanline filter type)."""
    import struct
    import zlib

    from apitap_spark.operators.multimodal import PNG_MAGIC, _paeth

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        for i in range(stride):
            left = line[i - channels] if i >= channels else 0
            ul = prev[i - channels] if i >= channels else 0
            pred = {
                0: 0,
                1: left,
                2: prev[i],
                3: (left + prev[i]) >> 1,
                4: _paeth(left, prev[i], ul),
            }[filter_type]
            raw.append((line[i] - pred) & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_decode_png_roundtrip(filter_type, channels):
    """Real PNG bytes decode to the exact encoded pixels for every
    scanline filter type and color type (grey/GA/RGB/RGBA)."""
    import random

    from apitap_spark.operators.multimodal import decode_image

    rng = random.Random(filter_type * 10 + channels)
    w, h = 7, 5
    pixels = bytes(rng.randrange(256) for _ in range(w * h * channels))
    png = _make_png(w, h, channels, pixels, filter_type)
    dw, dh, dc, out = decode_image(png)
    assert (dw, dh, dc) == (w, h, channels)
    assert out == pixels


def test_decode_image_rejects_non_png_and_corrupt():
    from apitap_spark.operators.multimodal import decode_image

    # unknown container -> documented codec boundary
    with pytest.raises(NotImplementedError):
        decode_image(b"GIF89a not supported here")
    # JPEG now dispatches to the baseline decoder; truncated/corrupt
    # JPEG raises (per-row fallback), never mis-decodes
    with pytest.raises(Exception):  # noqa: B017
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(Exception):  # noqa: B017 — truncated PNG must not decode
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


def test_multimodal_features_decodes_real_png(spark):
    """The SAME mapInPandas extractor the gate runs decodes genuine PNG
    payloads to pixel features, falls back per-row on corrupt bytes,
    and byte-stubs non-image payloads — one plan, three modalities."""
    from apitap_spark.operators.multimodal import (
        FEATURE_SCHEMA,
        _extract_features,
    )

    grey = bytes(range(16))  # 4x4 grey, mean 7.5
    png = _make_png(4, 4, 1, grey, filter_type=2)
    corrupt = png[:40] + b"\x00\x00\x00\x00" + png[44:]
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(corrupt)), (3, bytearray(b"plain"))],
        "doc_id long, payload binary",
    )
    rows = {
        r["doc_id"]: r
        for r in df.mapInPandas(_extract_features, schema=FEATURE_SCHEMA).collect()
    }
    assert rows[1]["modality"] == "image/png"
    assert (rows[1]["img_width"], rows[1]["img_height"]) == (4, 4)
    assert rows[1]["img_channels"] == 1
    assert rows[1]["mean_pixel"] == 7.5
    assert rows[2]["modality"] == "binary/decode-error"
    assert rows[2]["img_width"] == -1
    assert rows[3]["modality"] == "binary/text-stub"
    assert rows[3]["n_bytes"] == 5


def test_lang_id_covers_unknown(spark, sf_dir):
    from apitap_spark.operators.textstats import op_text_lang_id

    langs = {r["predicted_lang"] for r in op_text_lang_id(spark, sf_dir).collect()}
    assert langs <= {"unknown", "de", "en", "es", "fr"}


def test_dedup_clusters_invariants(spark, sf_dir):
    """Every doc appears once; cluster head is its own min; pairs end up
    co-clustered."""
    from apitap_spark.operators.dedup import (
        _jaccard_pairs,
        _shingle_df,
        op_dedup_clusters,
    )

    rows = op_dedup_clusters(spark, sf_dir).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    assert len(by_doc) == len(rows)  # one row per doc
    clusters = {}
    for r in rows:
        clusters.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in clusters.items():
        assert cid == min(members)  # head is the smallest id
        kept = [d for d in members if by_doc[d]["is_kept"]]
        assert kept == [cid]  # exactly one kept per cluster
    pairs = _jaccard_pairs(_shingle_df(spark, sf_dir), None, 0.8).collect()
    for p in pairs:
        assert by_doc[p["d1"]]["cluster_id"] == by_doc[p["d2"]]["cluster_id"]


def test_approx_aggregates_accuracy(spark, sf_dir):
    """Sketch estimates stay within documented error of exact values."""
    from apitap_spark.operators.udtf_ops import op_approx_aggregates
    from apitap_spark.plans.relational import _t

    approx = {r["l_returnflag"]: r for r in op_approx_aggregates(spark, sf_dir).collect()}
    from pyspark.sql import functions as F

    exact = {
        r["l_returnflag"]: r
        for r in _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("nd"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a["approx_parts"] - e["nd"]) / e["nd"] < 0.1
        assert abs(a["approx_p50"] - e["p50"]) / e["p50"] < 0.05


def test_winnowing_neardups_share_fingerprints(spark, sf_dir):
    """Planted near-dup pairs must share most winnowing fingerprints;
    random pairs must not."""
    from apitap_spark.operators.dedup import _jaccard_pairs, _shingle_df
    from apitap_spark.operators.textstats import op_text_winnowing

    fps = {}
    for r in op_text_winnowing(spark, sf_dir).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert len(fps) > 400  # nearly all docs fingerprinted

    planted = [
        (r["d1"], r["d2"])
        for r in _jaccard_pairs(_shingle_df(spark, sf_dir), None, 0.95).collect()
    ]
    assert planted
    for d1, d2 in planted:
        inter = len(fps[d1] & fps[d2])
        union = len(fps[d1] | fps[d2])
        assert inter / union > 0.5, (d1, d2, inter, union)

    import itertools

    random_pairs = list(itertools.islice(
        ((a, b) for a, b in itertools.combinations(sorted(fps), 2)
         if (a, b) not in set(planted)), 50))
    sims = [len(fps[a] & fps[b]) / len(fps[a] | fps[b]) for a, b in random_pairs]
    assert max(sims) < 0.5


def test_shingle_df_cap_drops_planted_boilerplate(spark):
    """A shingle planted in EVERY doc (boilerplate) must be dropped by the
    df cap, and the Jaccard of a genuine near-dup pair must survive the
    drop (threshold preservation: |J - J'| <= k/union)."""
    from pyspark.sql import functions as F

    from apitap_spark.operators.dedup import (
        _jaccard_pairs,
        cap_shingles_by_df,
        shingle_rows,
    )

    boiler = "terms of service apply"
    texts = [
        f"alpha beta gamma delta epsilon zeta {boiler}",
        f"alpha beta gamma delta epsilon eta {boiler}",  # near-dup of doc 0
        f"one two three four five six {boiler}",
        f"seven eight nine ten eleven twelve {boiler}",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sh = shingle_rows(docs)
    capped = cap_shingles_by_df(sh, max_df=2)
    kept = {r["shingle"] for r in capped.select("shingle").distinct().collect()}
    # the shingles fully inside the boilerplate occur in all 4 docs (df=4>2)
    assert "terms of service" not in kept and "of service apply" not in kept
    # boundary shingles (df=1) survive — the cap is df-based, not substring
    pairs = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in _jaccard_pairs(capped, None, 0.2).collect()
    }
    # docs 0/1 share 3 of their 6 surviving shingles → J = 3/9 >= 0.2
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.2
    # unrelated docs share nothing once boilerplate is gone
    assert not any(k for k in pairs if k != (0, 1))


def test_simhash_wide_chunk_banding_complete_for_d3(spark, sf_dir):
    """Corpus-scale banding (4 x 16-bit chunks, d<=3 pigeonhole): every
    pair the default config reports at hamming <= 3 must also be found —
    candidate generation is complete for d <= n_chunks-1 — and nothing
    above the tighter threshold may be emitted."""
    from apitap_spark.operators.dedup import op_dedup_simhash

    default_pairs = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in op_dedup_simhash(spark, sf_dir).collect()
    }
    wide = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in op_dedup_simhash(spark, sf_dir, n_chunks=4).collect()
    }
    assert all(h <= 3 for h in wide.values())
    expected = {k for k, h in default_pairs.items() if h <= 3}
    assert expected <= set(wide), "pigeonhole completeness for d<=3 violated"


def test_tfidf_topterms_ranking_invariants(spark):
    """Per-doc top-k is dense-ranked with non-increasing scores."""
    from apitap_spark.operators.textstats import op_text_tfidf_topterms

    out = op_text_tfidf_topterms(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        assert len(doc_rows) <= 5
        rks = sorted(r["rk"] for r in doc_rows)
        assert rks == list(range(1, len(doc_rows) + 1))
        # scores non-increasing in rank
        srt = sorted(doc_rows, key=lambda r: r["rk"])
        for a, b in zip(srt, srt[1:]):
            assert a["score"] >= b["score"]


def test_lexical_diversity_bounds_and_degenerate_doc(spark):
    """Same formula as op_text_lexical_diversity on planted docs."""
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "all tokens here are distinct")],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    from apitap_spark.functions.text import tokens

    tok = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    counts = tok.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    n, types, sumsq = F.sum("c"), F.count("*"), F.sum(F.col("c") * F.col("c"))
    out = {
        r["doc_id"]: r
        for r in counts.groupBy("doc_id")
        .agg(
            F.round(types.cast("double") / n, 6).alias("ttr"),
            F.round(F.lit(1.0) - sumsq.cast("double") / (n * n), 6).alias("simpson"),
        )
        .collect()
    }
    assert out[1]["simpson"] == 0.0  # one type repeated → zero diversity
    assert out[1]["ttr"] == 0.25
    assert out[2]["simpson"] == pytest.approx(1 - 5 * (1 / 25), abs=1e-9)
    assert out[2]["ttr"] == 1.0


def test_source_quota_enforced_and_stable(spark, sf_dir):
    from apitap_spark.operators.sampling import (
        QUOTA_PER_SOURCE,
        op_source_quota_sample,
    )

    out = op_source_quota_sample(spark, sf_dir)
    per_src = {r["source"]: r["cnt"] for r in out.groupBy("source").count()
               .withColumnRenamed("count", "cnt").collect()}
    assert per_src and all(v <= QUOTA_PER_SOURCE for v in per_src.values())
    # determinism: same kept set on a repartitioned rerun
    kept1 = {r["doc_id"] for r in out.collect()}
    kept2 = {r["doc_id"] for r in op_source_quota_sample(spark, sf_dir)
             .repartition(7).collect()}
    assert kept1 == kept2


def test_fk_integrity_full_clean_degraded_dirty(spark, sf_dir):
    from apitap_spark.operators.quality import op_fk_integrity

    rows = op_fk_integrity(spark, sf_dir).collect()
    assert len(rows) == 7
    for r in rows:
        if r["parent_variant"] == "full":
            assert r["n_orphans"] == 0, r
        else:
            assert r["n_orphans"] > 0, r
            assert 0 < r["orphan_ratio"] <= 1


def _python_bpe(word_counts, n_merges):
    """Plain-Python reference BPE (naive overlapping pair counts, greedy
    left-to-right merge, lexicographic tie-break) — the ground truth for
    learn_bpe_merges."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        new_vocab = {}
        for syms, cnt in vocab.items():
            out = []
            for cur in syms:
                if out and out[-1] == l and cur == r:
                    out[-1] = l + r
                else:
                    out.append(cur)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def test_bpe_oracle_closed_form_matches_python_on_adversarial_runs():
    """The DuckDB oracle's CLOSED-FORM merge replay (l==r run parity,
    gaps-and-islands) must equal plain-Python greedy BPE on inputs built
    to stress it: long same-char runs, overlapping alternations, and
    words that become identical after a merge. Pure DuckDB — no Spark."""
    import duckdb

    from apitap_spark.operators.bpe import _BPE_ORACLE, N_MERGES

    texts = [
        "aaaa aaa aa a",          # pure runs: parity logic
        "aaaaaaa aaaa",           # longer runs, odd lengths
        "abab abab ab ba",        # alternations (l != r chains)
        "aabb abba baab",         # mixed adjacency
        "xyx yxy xyxy xxyy",      # three-symbol interplay
        "aa aa aa bb",            # words collapsing to one symbol
    ]
    counts: dict = {}
    for t in texts:
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    expected = _python_bpe(counts, N_MERGES)

    con = duckdb.connect()
    values = ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {values}) t(doc_id, text)"
    )
    got = sorted(con.execute(_BPE_ORACLE).fetchall())
    assert got == sorted(
        (rank, l, r, c) for rank, l, r, c in expected
    ), f"closed-form diverged:\n got={got}\n exp={expected}"


def test_bpe_merges_match_python_reference(spark):
    from pyspark.sql import functions as F

    from apitap_spark.operators.bpe import learn_bpe_merges

    word_counts = {
        "low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 2, "aaa": 4,
    }
    expected = _python_bpe(word_counts, 8)
    vocab = spark.createDataFrame(
        [(w, c) for w, c in word_counts.items()], "w string, cnt long"
    ).select(F.split("w", "").alias("symbols"), "cnt")
    got = learn_bpe_merges(vocab, 8)
    assert got == expected


def test_bpe_gate_shape(spark, sf_dir):
    from apitap_spark.operators.bpe import N_MERGES, op_bpe_learn_merges

    rows = op_bpe_learn_merges(spark, sf_dir).collect()
    assert 0 < len(rows) <= N_MERGES
    ranks = [r["rank"] for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    # counts non-increasing is NOT guaranteed by BPE (a merge can create
    # a more frequent pair) — assert positivity and symbol sanity instead
    for r in rows:
        assert r["pair_count"] > 0 and r["left"] and r["right"]


def test_chunk_passages_reconstruct_and_overlap(spark, sf_dir):
    """Chunks tile every document: chunk 0 starts at token 1, consecutive
    starts differ by the stride, the last chunk reaches the doc end, and
    the overlap region of consecutive chunks carries identical text."""
    from apitap_spark.operators.textstats import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        op_text_chunk_passages,
    )

    from apitap_spark.functions.text import WS_PATTERN
    from apitap_spark.session import read_table

    import re

    n_toks = {
        r["doc_id"]: len(re.split(WS_PATTERN, r["text"].strip()))
        for r in read_table(spark, sf_dir, "documents").collect()
        if r["text"].strip()
    }
    rows = op_text_chunk_passages(spark, sf_dir).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_toks)  # every non-blank doc chunked, no extras
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        assert chunks[0]["start_tok"] == 1
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_tok"] - a["start_tok"] == CHUNK_STRIDE
            ov = a["start_tok"] + CHUNK_TOKENS - b["start_tok"]  # overlap tokens
            if ov > 0 and a["n_tok"] == CHUNK_TOKENS:
                tail = " ".join(a["chunk_text"].split(" ")[-ov:])
                head = " ".join(b["chunk_text"].split(" ")[:ov])
                assert tail == head
        last = chunks[-1]
        n_words = len(last["chunk_text"].split(" "))
        assert n_words == last["n_tok"]
        # last chunk reaches the doc's final token — no trailing tokens
        # are ever uncovered
        assert last["start_tok"] + last["n_tok"] - 1 == n_toks[doc_id]


def test_bpe_apply_tokens_bounds(spark, sf_dir):
    """Post-BPE token counts sit between word count (>=1 symbol/word) and
    char count (initial symbols), and cover every non-blank document."""
    from pyspark.sql import functions as F

    from apitap_spark.operators.bpe import op_bpe_apply_tokens
    from apitap_spark.session import read_table

    rows = op_bpe_apply_tokens(spark, sf_dir).collect()
    n_docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .count()
    )
    assert len(rows) == n_docs
    assert all(r["words"] <= r["bpe_tokens"] <= r["chars"] for r in rows)
    # merges actually fired: the corpus as a whole must compress
    assert sum(r["bpe_tokens"] for r in rows) < sum(r["chars"] for r in rows)


def test_bpe_encode_consistent_with_apply_counts(spark, sf_dir):
    """Two independent derivations agree: the encoded sequences' lengths
    equal op_bpe_apply_tokens' per-doc bpe_tokens, ids are dense in
    [0, vocab), and every non-blank doc is encoded."""
    from apitap_spark.operators.bpe import op_bpe_apply_tokens, op_bpe_encode_docs

    enc = {r["doc_id"]: r for r in op_bpe_encode_docs(spark, sf_dir).collect()}
    cnt = {r["doc_id"]: r for r in op_bpe_apply_tokens(spark, sf_dir).collect()}
    assert set(enc) == set(cnt)
    all_ids = set()
    for doc_id, r in enc.items():
        ids = [int(t) for t in r["token_ids"].split(",")]
        assert r["n_tokens"] == len(ids) == cnt[doc_id]["bpe_tokens"]
        all_ids.update(ids)
    assert min(all_ids) == 0
    assert max(all_ids) == len(all_ids) - 1  # dense id space


def test_bpe_corpus_pins_released_after_last_consumer(spark, sf_dir):
    """r10 verdict #4: the corpus-sized BPE memo entries (bpe_seqs,
    bpe_packed) must NOT stay pinned for the session — after the
    family's last consumer gate runs (suite order), the entries are
    released and the next release_persisted sweep frees their RDD
    blocks. Vocab-sized entries (final_vocab, sym_ids) stay pinned."""
    from apitap_spark.operators import bpe
    from apitap_spark.session import (
        _persistent_rdd_ids,
        context_key,
        release_persisted,
    )

    bpe.clear_bpe_memo()
    release_persisted(spark)
    ctx = context_key(spark)
    corpus_ids: set[int] = set()
    order = [  # the bench suite's sorted() gate order for this family
        "op_bpe_apply_tokens",
        "op_bpe_decode_roundtrip",
        "op_bpe_encode_docs",
        "op_bpe_fertility_by_lang",
        "op_bpe_learn_merges",
        "op_bpe_pack_training_rows",
        "op_training_shuffle_plan",
        "op_wordpiece_encode",
    ]
    for name in order:
        bpe.QUERIES[name](spark, sf_dir).count()
        for entry in ("bpe_seqs", "bpe_packed"):
            corpus_ids |= bpe._BPE_MEMO._ids_by_key.get(
                (ctx, entry, sf_dir), set()
            )
        spark.catalog.clearCache()
        release_persisted(spark)
    assert corpus_ids, "corpus-sized entries were never pinned at all?"
    # both corpus-sized entries released by their last consumers ...
    assert (ctx, "bpe_seqs", sf_dir) not in bpe._BPE_MEMO._cache
    assert (ctx, "bpe_packed", sf_dir) not in bpe._BPE_MEMO._cache
    # ... and their blocks actually freed by the post-gate sweep
    assert not (corpus_ids & _persistent_rdd_ids(spark))
    # vocab-sized artifacts survive for the session (the tokenizer itself)
    assert (ctx, "bpe_final_vocab", sf_dir) in bpe._BPE_MEMO._cache
    assert (ctx, "bpe_sym_ids", sf_dir) in bpe._BPE_MEMO._cache
    bpe.clear_bpe_memo()


def test_pack_training_rows_tile_the_token_stream(spark, sf_dir):
    """Packed rows reconstruct the EOS-terminated concatenation of the
    encoded docs in doc_id order: all rows full at SEQ_LEN except the
    last, row_ids contiguous from 0, total tokens = sum(doc)+#docs, and
    the re-assembled stream equals the per-doc sequences joined by EOS."""
    from apitap_spark.operators.bpe import (
        SEQ_LEN,
        op_bpe_encode_docs,
        op_bpe_pack_training_rows,
    )

    enc = sorted(
        op_bpe_encode_docs(spark, sf_dir).collect(), key=lambda r: r["doc_id"]
    )
    rows = sorted(
        op_bpe_pack_training_rows(spark, sf_dir).collect(),
        key=lambda r: r["row_id"],
    )
    assert [r["row_id"] for r in rows] == list(range(len(rows)))
    ids = {r["row_id"]: [int(t) for t in r["token_ids"].split(",")] for r in rows}
    for r in rows[:-1]:
        assert r["n_tokens"] == SEQ_LEN == len(ids[r["row_id"]])
    assert 0 < rows[-1]["n_tokens"] <= SEQ_LEN
    eos = max(max(v) for v in ids.values())
    stream = [t for r in rows for t in ids[r["row_id"]]]
    expected = [
        t
        for r in enc
        for t in [int(x) for x in r["token_ids"].split(",")] + [eos]
    ]
    assert stream == expected


def test_corpus_card_consistent_with_exact_dedup(spark, sf_dir):
    from apitap_spark.operators.corpus import op_corpus_summary_card
    from apitap_spark.operators.dedup import op_dedup_exact

    card = op_corpus_summary_card(spark, sf_dir).collect()[0]
    groups = op_dedup_exact(spark, sf_dir).collect()
    assert card["n_docs"] == sum(r["n_copies"] for r in groups)
    assert card["n_exact_dup_docs"] == sum(r["n_copies"] - 1 for r in groups)
    assert card["min_tokens"] <= card["avg_tokens"] <= card["max_tokens"]


def test_incremental_embedding_no_within_set_pairs(spark, sf_dir):
    from apitap_spark.operators.incremental import (
        op_dedup_incremental_embedding,
    )

    rows = op_dedup_incremental_embedding(spark, sf_dir).collect()
    for r in rows:
        assert r["corpus_vec_id"] % 10 < 8
        assert r["batch_vec_id"] % 10 >= 8
        assert r["cosine"] >= 0.4


def test_shard_plan_balanced_and_complete(spark, sf_dir):
    from apitap_spark.operators.corpus import (
        SHARD_TARGET_TOKENS,
        op_shard_plan,
    )

    rows = op_shard_plan(spark, sf_dir).collect()
    docs = {r["doc_id"] for r in rows}
    assert len(docs) == len(rows)  # every doc exactly once
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    shards = sorted(by_shard)
    assert shards == list(range(len(shards)))  # contiguous ids from 0
    max_doc = max(r["n_tokens"] for r in rows)
    for sid in shards[:-1]:  # every full shard lands within one doc of target
        tot = sum(r["n_tokens"] for r in by_shard[sid])
        # start-offset binning: a shard can undershoot by the previous
        # shard's overhanging doc and overshoot by its own last doc
        assert tot > SHARD_TARGET_TOKENS - max_doc
        assert tot - max(r["n_tokens"] for r in by_shard[sid]) < SHARD_TARGET_TOKENS


def test_lm_perplexity_matches_python_math(spark, sf_dir):
    """Spark's per-doc fixed-point NLL equals a plain-Python recomputation
    on the same token counts: sum_nll_micro is EXACT (integer micro-nat
    arithmetic after one per-word rounding), avg_nll matches to float
    tolerance, and with_perplexity's exp matches Python math."""
    import decimal
    import math

    from apitap_spark.functions.text import WS_PATTERN
    from apitap_spark.operators.corpus import op_lm_perplexity, with_perplexity
    from apitap_spark.session import read_table

    got = {
        r["doc_id"]: r
        for r in with_perplexity(op_lm_perplexity(spark, sf_dir)).collect()
    }
    import re

    docs = {
        r["doc_id"]: re.split(WS_PATTERN, r["text"].strip())
        for r in read_table(spark, sf_dir, "documents").collect()
        if r["text"].strip()
    }
    counts = {}
    for ws in docs.values():
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    denom = float(sum(counts.values()) + len(counts))
    nll_u = {
        w: int(
            decimal.Decimal(-math.log((c + 1) / denom) * 1000000.0).quantize(
                0, rounding=decimal.ROUND_HALF_UP
            )
        )
        for w, c in counts.items()
    }
    for doc_id, ws in docs.items():
        sum_u = sum(nll_u[w] for w in ws)
        nll = -sum(math.log((counts[w] + 1) / denom) for w in ws) / len(ws)
        assert got[doc_id]["n_tokens"] == len(ws)
        assert got[doc_id]["sum_nll_micro"] == sum_u
        assert got[doc_id]["avg_nll"] == sum_u / 1000000.0 / len(ws)
        assert got[doc_id]["avg_nll"] == pytest.approx(nll, abs=2e-6)
        assert got[doc_id]["perplexity"] == pytest.approx(math.exp(nll), rel=1e-5)


def test_compression_ratio_matches_python_zlib(spark, sf_dir):
    """Arrow-batched UDF output equals direct Python zlib, bit-exact."""
    import zlib

    from apitap_spark.operators.udtf_ops import (
        ZLIB_LEVEL,
        op_text_compression_ratio,
    )
    from apitap_spark.session import read_table

    got = {r["doc_id"]: r for r in op_text_compression_ratio(spark, sf_dir).collect()}
    for r in read_table(spark, sf_dir, "documents").collect():
        raw = r["text"].encode("utf-8")
        exp = round(len(zlib.compress(raw, ZLIB_LEVEL)) / len(raw), 6) if raw else None
        assert got[r["doc_id"]]["compression_ratio"] == exp
    # repetitive text compresses far better than varied text
    ratios = [r["compression_ratio"] for r in got.values() if r["compression_ratio"]]
    assert min(ratios) < 0.5


def test_feature_snapshot_no_future_leakage(spark, sf_dir):
    from apitap_spark.operators.temporal import op_feature_snapshot

    rows = op_feature_snapshot(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_events_24h"] <= r["n_events_7d"] <= r["n_events_total"]
        assert r["recency_hours"] >= 0
        assert r["last_event_type"]
        if r["n_events_24h"] == 0:
            assert r["value_sum_24h"] is None


def test_length_bounds_quantile_semantics(spark, sf_dir):
    """p5/p95 match a plain-Python type-1 discrete quantile per source,
    and the outlier count matches a direct recount."""
    import math

    from apitap_spark.operators.quality import op_length_filter_bounds
    from apitap_spark.session import read_table

    got = {r["source"]: r for r in op_length_filter_bounds(spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").collect()
    by_src = {}
    for r in docs:
        n = len(r["text"].strip().split()) if r["text"].strip() else 0
        by_src.setdefault(r["source"], []).append(n)
    for src, lens in by_src.items():
        lens.sort()
        n = len(lens)
        p5 = lens[math.ceil(0.05 * n) - 1]
        p95 = lens[math.ceil(0.95 * n) - 1]
        g = got[src]
        assert (g["p5_tokens"], g["p95_tokens"]) == (p5, p95), src
        assert g["n_docs"] == n
        assert g["n_outliers"] == sum(1 for x in lens if x < p5 or x > p95)


def test_semantic_dedup_greedy_keeps_chain_ends(spark, tmp_path):
    """Transitive chain cos(1,2)>tau, cos(2,3)>tau, cos(1,3)<=tau must
    keep {1, 3}: vector 3's only >tau neighbor (2) was itself dropped
    against kept 1, so the paper's keep-against-kept greedy re-admits 3
    (the round-3 ADVICE fidelity fix — the old pairwise rule dropped it)."""
    import math

    from apitap_spark.operators.similarity import op_semantic_dedup

    # unit vectors in 2D at angles 0, 60, 120 degrees, padded to 64 dims;
    # tau=0.4: cos(60deg)=0.5>tau adjacent, cos(120deg)=-0.5<=tau ends
    def vec(deg):
        v = [math.cos(math.radians(deg)), math.sin(math.radians(deg))]
        return v + [0.0] * 62

    emb = spark.createDataFrame(
        [(1, 0, vec(0.0)), (2, 0, vec(60.0)), (3, 0, vec(120.0))],
        "vec_id long, label int, embedding array<double>",
    )
    sf = str(tmp_path)
    emb.write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    rows = {r["vec_id"]: r for r in op_semantic_dedup(spark, sf).collect()}
    assert rows[1]["is_kept"] is True
    assert rows[2]["is_kept"] is False      # >tau vs kept 1
    assert rows[3]["is_kept"] is True       # only >tau neighbor (2) was dropped
    assert rows[3]["max_cos_lower"] > 0.4   # yet its max_cos_lower exceeds tau


def _png_chunk(ctype, body):
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _make_png_raw(width, height, bit_depth, color_type, scanlines, plte=None):
    """PNG from pre-packed scanline byte rows (filter 0), any depth/type."""
    import struct
    import zlib

    from apitap_spark.operators.multimodal import PNG_MAGIC

    raw = bytearray()
    for row in scanlines:
        raw.append(0)
        raw.extend(row)
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    out = PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", bytes(plte))
    return out + _png_chunk(b"IDAT", zlib.compress(bytes(raw))) + _png_chunk(b"IEND", b"")


def test_decode_png_palette_8bit():
    """Palette PNGs expand indices to RGB via PLTE (round-3 verdict #5)."""
    from apitap_spark.operators.multimodal import decode_image

    plte = [255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30]  # 4 entries
    rows = [bytes([0, 1, 2]), bytes([3, 2, 1])]  # 3x2 indices
    png = _make_png_raw(3, 2, 8, 3, rows, plte=plte)
    w, h, c, px = decode_image(png)
    assert (w, h, c) == (3, 2, 3)
    assert px == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255,
                        10, 20, 30, 0, 0, 255, 0, 255, 0])


def test_decode_png_palette_4bit():
    """Sub-byte palette indices unpack MSB-first per scanline."""
    from apitap_spark.operators.multimodal import decode_image

    plte = [0, 0, 0, 100, 100, 100, 200, 200, 200]
    # width 3 at 4 bits -> 2 bytes/row: indices (0,1,2) = 0x01 0x20
    rows = [bytes([0x01, 0x20]), bytes([0x21, 0x00])]
    png = _make_png_raw(3, 2, 4, 3, rows, plte=plte)
    w, h, c, px = decode_image(png)
    assert (w, h, c) == (3, 2, 3)
    assert px[:9] == bytes([0, 0, 0, 100, 100, 100, 200, 200, 200])
    assert px[9:] == bytes([200, 200, 200, 100, 100, 100, 0, 0, 0])


def test_decode_png_16bit_grey_and_rgb():
    """16-bit samples decode to their high byte at full resolution."""
    from apitap_spark.operators.multimodal import decode_image

    # 2x1 grey16: samples 0x1234, 0xFF00 -> high bytes 0x12, 0xFF
    png = _make_png_raw(2, 1, 16, 0, [bytes([0x12, 0x34, 0xFF, 0x00])])
    assert decode_image(png) == (2, 1, 1, bytes([0x12, 0xFF]))
    # 1x1 rgb16
    png = _make_png_raw(1, 1, 16, 2, [bytes([0xAA, 0x01, 0xBB, 0x02, 0xCC, 0x03])])
    assert decode_image(png) == (1, 1, 3, bytes([0xAA, 0xBB, 0xCC]))


def test_decode_png_subbyte_grey_rescales():
    """1-bit greyscale expands to 0/255 (full-range rescale)."""
    from apitap_spark.operators.multimodal import decode_image

    # width 10 at 1 bit -> 2 bytes/row: 1010101010 -> 0xAA 0x80
    png = _make_png_raw(10, 1, 1, 0, [bytes([0xAA, 0x80])])
    w, h, c, px = decode_image(png)
    assert (w, h, c) == (10, 1, 1)
    assert px == bytes([255, 0] * 5)


def test_decode_png_16bit_with_filters():
    """16-bit scanline filtering uses the 2-byte-per-sample bpp offset."""
    import random
    import struct
    import zlib

    from apitap_spark.operators.multimodal import PNG_MAGIC, _paeth, decode_image

    rng = random.Random(7)
    w, h = 5, 4
    samples = [rng.randrange(65536) for _ in range(w * h)]
    raw_rows = [
        b"".join(struct.pack(">H", s) for s in samples[y * w : (y + 1) * w])
        for y in range(h)
    ]
    bpp = 2
    enc = bytearray()
    prev = bytes(w * bpp)
    for row in raw_rows:
        enc.append(4)  # Paeth
        line = bytearray(row)
        for i in range(len(line)):
            left = row[i - bpp] if i >= bpp else 0
            ul = prev[i - bpp] if i >= bpp else 0
            line[i] = (row[i] - _paeth(left, prev[i], ul)) & 0xFF
        enc.extend(line)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    png = (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(enc)))
        + _png_chunk(b"IEND", b"")
    )
    dw, dh, dc, px = decode_image(png)
    assert (dw, dh, dc) == (w, h, 1)
    assert px == bytes(s >> 8 for s in samples)


def test_doc_novelty_bounds_and_sharing_symmetry(spark, sf_dir):
    """novelty_ratio in [0,1]; n_shared <= n_grams; a gram counted as
    shared really occurs in >=2 docs (cross-checked via a direct df)."""
    from pyspark.sql import functions as F

    from apitap_spark.operators.textstats import NOVELTY_N, op_doc_novelty
    from apitap_spark.functions.text import shingles
    from apitap_spark.session import read_table

    rows = op_doc_novelty(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_shared"] <= r["n_grams"]
        assert 0.0 <= r["novelty_ratio"] <= 1.0
    # independent recount for one doc with shared grams
    target = next((r for r in rows if r["n_shared"] > 0), None)
    assert target is not None  # synthetic corpus plants near-dups
    docs = read_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    grams = docs.select(
        "doc_id",
        F.explode(shingles("text", NOVELTY_N)).alias("g"),
    )
    df_counts = grams.groupBy("g").count().filter(F.col("count") >= 2)
    shared = (
        grams.filter(F.col("doc_id") == target["doc_id"])
        .join(df_counts, "g")
        .count()
    )
    assert shared == target["n_shared"]


def test_script_profile_ratios_sum_to_one(spark, sf_dir):
    from apitap_spark.operators.textstats import op_text_script_profile

    rows = op_text_script_profile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        total = (
            r["latin_ratio"] + r["digit_ratio"] + r["space_ratio"]
            + r["punct_ratio"] + r["other_ratio"]
        )
        assert abs(total - 1.0) < 1e-9
        assert r["latin_ratio"] > 0.5  # synthetic corpus is ASCII English-ish


def test_silhouette_bounds_and_separated_blobs(spark, tmp_path):
    """Planted well-separated blobs must score near +1; silhouette is
    always within [-1, 1]."""
    from apitap_spark.operators.ml import op_kmeans_silhouette

    rows_in = []
    for i in range(10):  # cluster 0 around origin
        rows_in.append((i, 0, [0.1 * (i % 3), 0.1 * (i % 2)] + [0.0] * 62))
    for i in range(10, 20):  # cluster 1 far away
        rows_in.append((i, 1, [50.0 + 0.1 * (i % 3), 50.0] + [0.0] * 62))
    spark.createDataFrame(
        rows_in, "vec_id long, label int, embedding array<double>"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    rows = op_kmeans_silhouette(spark, str(tmp_path)).collect()
    assert len(rows) == 20
    for r in rows:
        assert -1.0 <= r["silhouette"] <= 1.0
        assert r["silhouette"] > 0.9  # separation >> intra-cluster spread


def test_fertility_consistent_with_apply_tokens(spark, sf_dir):
    """Per-lang sums must equal the doc-level budgets regrouped."""
    from pyspark.sql import functions as F

    from apitap_spark.operators.bpe import (
        op_bpe_apply_tokens,
        op_bpe_fertility_by_lang,
    )
    from apitap_spark.session import read_table

    fert = {r["lang"]: r for r in op_bpe_fertility_by_lang(spark, sf_dir).collect()}
    budgets = op_bpe_apply_tokens(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    agg = {
        r["lang"]: r
        for r in budgets.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("bpe_tokens").alias("bt"),
            F.sum("words").alias("w"),
            F.sum("chars").alias("c"),
        )
        .collect()
    }
    assert set(fert) == set(agg)
    for lang, r in fert.items():
        assert r["bpe_tokens"] == agg[lang]["bt"]
        assert r["words"] == agg[lang]["w"]
        assert r["chars"] == agg[lang]["c"]
        assert r["fertility"] >= 1.0  # a word is at least one BPE token
        assert r["chars_per_token"] > 0


def test_unigram_shift_metric_properties(spark, sf_dir):
    """TV distance is within [0,1], symmetric by construction (each
    unordered pair appears once), covers all lang pairs, and equals an
    independent plain-Python recount for one pair."""
    from collections import Counter

    from apitap_spark.operators.corpus import op_unigram_shift
    from apitap_spark.session import read_table

    rows = op_unigram_shift(spark, sf_dir).collect()
    langs = {
        r["lang"]
        for r in read_table(spark, sf_dir, "documents")
        .select("lang")
        .distinct()
        .collect()
    }
    assert len(rows) == len(langs) * (len(langs) - 1) // 2
    for r in rows:
        assert r["lang_a"] < r["lang_b"]
        assert 0.0 <= r["tv_distance"] <= 1.0
    # python recount for the first pair
    t = rows[0]
    docs = read_table(spark, sf_dir, "documents").collect()
    ca, cb = Counter(), Counter()
    for d in docs:
        if not d["text"] or not d["text"].strip():
            continue
        words = d["text"].strip().split()
        if d["lang"] == t["lang_a"]:
            ca.update(words)
        elif d["lang"] == t["lang_b"]:
            cb.update(words)
    na, nb = sum(ca.values()), sum(cb.values())
    tv = sum(
        abs(ca.get(w, 0) * nb - cb.get(w, 0) * na)
        for w in set(ca) | set(cb)
    ) / (2 * na * nb)
    assert abs(t["tv_distance"] - tv) < 1e-12
    assert (t["tokens_a"], t["tokens_b"]) == (na, nb)


def test_ann_recall_audit_bounds_and_exact_on_own_cell(spark, sf_dir):
    """recall in [0,1]; n_hits <= k <= 3; and the audit agrees with a
    direct intersection of the two underlying gates' outputs."""
    from apitap_spark.operators.similarity import (
        op_ann_cosine_topk,
        op_ann_ivf_label,
        op_ann_recall_audit,
    )

    audit = {r["q_id"]: r for r in op_ann_recall_audit(spark, sf_dir).collect()}
    ivf: dict = {}
    for r in op_ann_ivf_label(spark, sf_dir).collect():
        ivf.setdefault(r["q_id"], set()).add(r["c_id"])
    exact: dict = {}
    for r in op_ann_cosine_topk(spark, sf_dir).collect():
        if r["rk"] <= 3:
            exact.setdefault(r["q_id"], set()).add(r["c_id"])
    assert set(audit) == set(ivf)
    for q, r in audit.items():
        assert 0 <= r["n_hits"] <= r["k"] <= 3
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert r["n_hits"] == len(ivf[q] & exact.get(q, set()))
        assert r["k"] == len(ivf[q])


def test_phash_invariant_to_png_filter_and_local_under_edits():
    """The SAME pixels encoded with different PNG scanline filters hash
    identically; a small pixel edit moves the hash by a small Hamming
    distance; a very different image is far away."""
    import random

    from apitap_spark.operators.multimodal import phash_of_payload

    rng = random.Random(42)
    w, h = 16, 12
    pixels = bytes(rng.randrange(256) for _ in range(w * h))
    hashes = {
        phash_of_payload(_make_png(w, h, 1, pixels, ft)) for ft in range(5)
    }
    assert len(hashes) == 1  # filter-type invariant
    hi, lo, modality = next(iter(hashes))
    assert modality == "image/png"

    def hamming(a, b):
        return bin((a[0] ^ b[0]) | (a[1] ^ b[1]) << 32).count("1")

    # flip one pixel strongly
    edited = bytearray(pixels)
    edited[5] = (edited[5] + 128) % 256
    ehi, elo, _ = phash_of_payload(_make_png(w, h, 1, bytes(edited), 0))
    d_edit = hamming((hi, lo), (ehi, elo))
    other = bytes(rng.randrange(256) for _ in range(w * h))
    ohi, olo, _ = phash_of_payload(_make_png(w, h, 1, other, 0))
    d_other = hamming((hi, lo), (ohi, olo))
    assert d_edit <= 8          # local edit: few grid cells move
    assert d_other >= 12        # unrelated image: far in Hamming space
    assert d_edit < d_other


def test_phash_fallback_matches_byte_grid(spark):
    """Non-decodable payloads hash the raw byte grid (the path the gate
    oracle replays)."""
    from apitap_spark.operators.multimodal import (
        PHASH_GH,
        PHASH_GW,
        _dhash_grid,
        phash_of_payload,
    )

    payload = bytes(range(60))  # shorter than 72 -> zero-padded
    grid = [payload[i] if i < len(payload) else 0
            for i in range(PHASH_GW * PHASH_GH)]
    assert phash_of_payload(payload) == (*_dhash_grid(grid), "binary/text-stub")


def test_event_funnel_monotone_and_ordered(spark, sf_dir):
    """Stage populations shrink monotonically; every stage-3 user really
    has view < click < purchase timestamps in order (spot-checked via a
    direct per-user replay)."""
    from apitap_spark.plans.timeseries import q_event_funnel
    from apitap_spark.session import read_table

    rows = {r["stage"]: r for r in q_event_funnel(spark, sf_dir).collect()}
    assert rows["view"]["users"] >= rows["click"]["users"] >= rows["purchase"]["users"]
    assert rows["purchase"]["users"] > 0  # synthetic stream is dense
    assert 0.0 < rows["click"]["conv_from_prev"] <= 1.0
    # replay one user's ordering in plain python
    ev = read_table(spark, sf_dir, "events").collect()
    by_user: dict = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append((e["ts"], e["event_type"]))
    n3 = 0
    for evs in by_user.values():
        t1 = min((t for t, ty in evs if ty == "view"), default=None)
        if t1 is None:
            continue
        t2 = min((t for t, ty in evs if ty == "click" and t > t1), default=None)
        if t2 is None:
            continue
        t3 = min((t for t, ty in evs if ty == "purchase" and t > t2), default=None)
        if t3 is not None:
            n3 += 1
    assert n3 == rows["purchase"]["users"]


def test_centroid_drift_zero_on_identical_halves(spark, tmp_path):
    """Mirrored halves (same vectors under both parities) must drift 0;
    shifted halves must drift by the planted offset."""
    from apitap_spark.operators.ml import op_embedding_centroid_drift

    base = [[1.0, 2.0] + [0.0] * 62, [3.0, 4.0] + [0.0] * 62]
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, 0, v))          # even: half A
        rows.append((2 * i + 1, 0, v))      # odd:  half B (identical)
        rows.append((100 + 2 * i, 1, v))    # label 1, half A
        rows.append((101 + 2 * i, 1, [x + 10.0 for x in v]))  # shifted B
    spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = {r["label"]: r for r in
           op_embedding_centroid_drift(spark, str(tmp_path)).collect()}
    assert out[0]["centroid_drift"] == 0.0
    assert abs(out[1]["centroid_drift"] - 80.0) < 1e-6  # 10 in 64 dims = sqrt(64*100)


def test_split_leakage_audit_consistent_with_components(spark, sf_dir):
    """Every reported group really straddles >1 split (replayed via the
    split gate + a Python head-fingerprint recount); groups confined to
    one split never appear."""
    import hashlib

    from apitap_spark.operators.sampling import (
        LEAK_HEAD_TOKENS,
        op_split_leakage_audit,
        op_split_train_valid_test,
    )
    from apitap_spark.session import read_table
    from pyspark.sql import functions as F

    leaks = {r["head_hash"]: r for r in
             op_split_leakage_audit(spark, sf_dir).collect()}
    assert leaks  # synthetic corpus plants near-dups across doc_ids
    splits = {r["doc_id"]: r["split"] for r in
              op_split_train_valid_test(spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    ).select("doc_id", "text").collect()
    by_hash: dict = {}
    for d in docs:
        head = " ".join(d["text"].strip().split()[:LEAK_HEAD_TOKENS])
        h = hashlib.md5(head.encode()).hexdigest()
        by_hash.setdefault(h, []).append(d["doc_id"])
    expected_leaks = {
        h: ids for h, ids in by_hash.items()
        if len({splits[i] for i in ids}) > 1
    }
    assert set(leaks) == set(expected_leaks)
    for h, r in leaks.items():
        ids = expected_leaks[h]
        split_set = {splits[i] for i in ids}
        assert r["n_docs"] == len(ids)
        assert len(split_set) == r["n_splits"] > 1
        assert ",".join(sorted(split_set)) == r["splits"]


def test_minhash_estimate_audit_concentration(spark, sf_dir):
    """The 128-hash estimate concentrates around exact Jaccard: mean
    absolute error well under 3 standard errors (~0.13), and every
    estimate stays within [0, 1]."""
    from apitap_spark.operators.dedup import op_minhash_estimate_audit

    rows = op_minhash_estimate_audit(spark, sf_dir).collect()
    assert rows  # near-dup pairs exist in the synthetic corpus
    errs = []
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert r["est_matches"] == round(r["est_jaccard"] * 128)
        assert abs(r["abs_err"] - abs(r["est_jaccard"] - r["jaccard"])) < 1e-6
        errs.append(r["abs_err"])
    assert sum(errs) / len(errs) < 0.13  # 3 * sqrt(0.25/128) ~ 0.13


def test_growth_curve_monotone_and_endpoint(spark, sf_dir):
    """Growth is monotone in every column; the final checkpoint matches
    corpus-wide distinct types and total tokens."""
    from apitap_spark.operators.textstats import op_corpus_growth_curve
    from apitap_spark.functions.text import tokens
    from apitap_spark.session import read_table
    from pyspark.sql import functions as F

    rows = sorted(
        op_corpus_growth_curve(spark, sf_dir).collect(),
        key=lambda r: r["checkpoint"],
    )
    assert len(rows) >= 3
    for a, b in zip(rows, rows[1:]):
        assert a["n_docs"] <= b["n_docs"]
        assert a["n_tokens"] <= b["n_tokens"]
        assert a["n_types"] <= b["n_types"]
    docs = read_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    tok = docs.select(F.explode(tokens("text")).alias("w"))
    assert rows[-1]["n_types"] == tok.select("w").distinct().count()
    assert rows[-1]["n_tokens"] == tok.count()
    assert rows[-1]["n_docs"] == docs.count()


def test_edit_distance_rung_agrees_with_python(spark, sf_dir):
    """Pairs are non-vacuous; distances match a pure-Python DP replay
    for a handful of pairs; similarity bounds hold."""
    from apitap_spark.operators.dedup import op_dedup_edit_distance
    from apitap_spark.session import read_table

    rows = op_dedup_edit_distance(spark, sf_dir).collect()
    assert rows
    texts = {r["doc_id"]: r["text"] for r in
             read_table(spark, sf_dir, "documents").collect()}

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    for r in rows[:5]:
        assert r["edit_distance"] == lev(texts[r["d1"]], texts[r["d2"]])
    for r in rows:
        assert 0.0 <= r["edit_similarity"] <= 1.0
        # same head fingerprint -> near-dups: similarity is high
        assert r["edit_similarity"] > 0.3


def test_phash_pairs_hamming_and_pigeonhole(spark, sf_dir):
    """Pairs are non-vacuous, hamming <= threshold, and a direct
    recount over the full signature table finds no d<=3 pair the
    banding missed (the hard pigeonhole guarantee)."""
    from apitap_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        _extract_phash,
        op_dedup_phash_pairs,
        with_binary_payload,
    )
    from apitap_spark.session import read_table

    pairs = {(r["d1"], r["d2"]): r["hamming"]
             for r in op_dedup_phash_pairs(spark, sf_dir).collect()}
    assert pairs  # prefix-sharing docs produce identical byte grids
    assert all(0 <= h <= PHASH_HAMMING_MAX for h in pairs.values())
    docs = read_table(spark, sf_dir, "documents")
    sigs = {
        r["doc_id"]: (r["phash_hi"], r["phash_lo"])
        for r in with_binary_payload(docs)
        .select("doc_id", "payload")
        .mapInPandas(_extract_phash, schema="doc_id bigint, phash_hi bigint,"
                     " phash_lo bigint, modality string")
        .collect()
    }
    ids = sorted(sigs)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1:]:
            h = bin(sigs[d1][0] ^ sigs[d2][0]).count("1") + bin(
                sigs[d1][1] ^ sigs[d2][1]
            ).count("1")
            if h <= 3:
                assert (d1, d2) in pairs, f"banding missed d<=3 pair {d1},{d2}"
            if (d1, d2) in pairs:
                assert pairs[(d1, d2)] == h


def test_quality_calibration_lift_and_totals(spark, sf_dir):
    """Buckets partition the corpus; the top half of the score range
    shows a higher long-form rate than the bottom half (the score must
    actually order documents by its proxy target)."""
    from apitap_spark.operators.quality import op_quality_calibration
    from apitap_spark.session import read_table

    rows = sorted(
        op_quality_calibration(spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    n = read_table(spark, sf_dir, "documents").filter(
        "length(trim(text)) > 0"
    ).count()
    assert sum(r["n_docs"] for r in rows) == n
    lo = [r for r in rows if r["bucket"] <= 4]
    hi = [r for r in rows if r["bucket"] >= 5]
    assert lo and hi
    rate = lambda rs: sum(r["n_longform"] for r in rs) / sum(
        r["n_docs"] for r in rs
    )
    assert rate(hi) > rate(lo)


def test_ivf_cell_balance_partitions_and_mean_one(spark, sf_dir):
    """Cells partition the corpus; shares sum to 1; the size-weighted
    mean imbalance is >= 1 with equality iff perfectly balanced."""
    from apitap_spark.operators.ml import op_ivf_cell_balance
    from apitap_spark.session import read_table

    rows = op_ivf_cell_balance(spark, sf_dir).collect()
    total = read_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n"] for r in rows) == total
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    k = len(rows)
    # unweighted mean imbalance is exactly 1 by construction
    assert abs(sum(r["imbalance"] for r in rows) / k - 1.0) < 1e-9
    for r in rows:
        assert r["imbalance"] > 0


def test_source_overlap_matrix_recount(spark, sf_dir):
    """Matrix rows replay exactly from a Python recount of the head
    fingerprints; overlap_ratio stays in (0, 1]."""
    import hashlib

    from apitap_spark.operators.corpus import (
        OVERLAP_HEAD_TOKENS,
        op_source_overlap_matrix,
    )
    from apitap_spark.session import read_table

    rows = {(r["source_a"], r["source_b"]): r for r in
            op_source_overlap_matrix(spark, sf_dir).collect()}
    assert rows  # planted near-dups span sources
    docs = read_table(spark, sf_dir, "documents").collect()
    counts: dict = {}
    tot: dict = {}
    for d in docs:
        if not d["text"] or not d["text"].strip():
            continue
        head = " ".join(d["text"].strip().split()[:OVERLAP_HEAD_TOKENS])
        h = hashlib.md5(head.encode()).hexdigest()
        counts.setdefault((d["source"], h), 0)
        counts[(d["source"], h)] += 1
        tot[d["source"]] = tot.get(d["source"], 0) + 1
    by_hash: dict = {}
    for (src, h), c in counts.items():
        by_hash.setdefault(h, {})[src] = c
    expect: dict = {}
    for h, srcs in by_hash.items():
        names = sorted(srcs)
        for i, sa in enumerate(names):
            for sb in names[i + 1:]:
                e = expect.setdefault((sa, sb), [0, 0])
                e[0] += 1
                e[1] += min(srcs[sa], srcs[sb])
    assert set(rows) == set(expect)
    for key, r in rows.items():
        assert (r["shared_heads"], r["shared_docs"]) == tuple(expect[key])
        assert r["docs_a"] == tot[key[0]] and r["docs_b"] == tot[key[1]]
        assert 0.0 < r["overlap_ratio"] <= 1.0


def test_lang_confusion_matrix_totals_and_diagonal(spark, sf_dir):
    """Matrix cells total to the doc count; per-label rows regroup the
    per-doc gate exactly; the diagonal dominates for en (the markers
    are English-biased by design)."""
    from apitap_spark.operators.textstats import (
        op_lang_confusion_matrix,
        op_text_lang_id,
    )

    cells = {(r["labeled_lang"], r["predicted_lang"]): r["n_docs"]
             for r in op_lang_confusion_matrix(spark, sf_dir).collect()}
    per_doc = op_text_lang_id(spark, sf_dir).collect()
    assert sum(cells.values()) == len(per_doc)
    recount: dict = {}
    for r in per_doc:
        key = (r["labeled_lang"], r["predicted_lang"])
        recount[key] = recount.get(key, 0) + 1
    assert recount == cells
    en_total = sum(n for (lab, _p), n in cells.items() if lab == "en")
    assert cells.get(("en", "en"), 0) / en_total > 0.5


def test_keep_best_picks_highest_quality_per_cluster(spark, sf_dir):
    """Exactly one keeper per cluster; the keeper maximizes
    (quality_score, -doc_id); cluster membership matches op_dedup_clusters."""
    from apitap_spark.operators.dedup import op_dedup_clusters, op_dedup_keep_best

    rows = op_dedup_keep_best(spark, sf_dir).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert by_cluster
    multi = [c for c in by_cluster.values() if len(c) > 1]
    assert multi  # near-dup clusters exist
    for members in by_cluster.values():
        keepers = [r for r in members if r["is_kept"]]
        assert len(keepers) == 1
        best = max(members, key=lambda r: (r["quality_score"], -r["doc_id"]))
        assert keepers[0]["doc_id"] == best["doc_id"]
    clusters = {r["doc_id"]: r["cluster_id"]
                for r in op_dedup_clusters(spark, sf_dir).collect()}
    for r in rows:
        assert clusters[r["doc_id"]] == r["cluster_id"]


def test_vocab_coverage_monotone_and_saturates(spark, sf_dir):
    """Coverage is monotone in vocab size, ends at exactly 1.0, and the
    first checkpoint already covers a Zipfian corpus substantially."""
    from apitap_spark.operators.textstats import op_vocab_coverage_curve

    rows = sorted(
        op_vocab_coverage_curve(spark, sf_dir).collect(),
        key=lambda r: r["vocab_size"],
    )
    assert len(rows) >= 2
    for a, b in zip(rows, rows[1:]):
        assert a["coverage"] <= b["coverage"] + 1e-12
        assert a["total_tokens"] == b["total_tokens"]
    assert rows[-1]["covered_tokens"] == rows[-1]["total_tokens"]
    assert rows[-1]["coverage"] == 1.0


def _make_png_adam7(width, height, bit_depth, color_type, pixels, plte=None):
    """Test-local Adam7 encoder: split native-depth samples into the 7
    passes (filter 0), pack sub-byte rows MSB-first."""
    import struct
    import zlib

    from apitap_spark.operators.multimodal import _ADAM7_PASSES, PNG_MAGIC

    n_samples = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]

    def pack_row(vals):
        if bit_depth == 8:
            return bytes(vals)
        if bit_depth == 16:
            return b"".join(struct.pack(">H", v) for v in vals)
        per_byte = 8 // bit_depth
        out = bytearray((len(vals) + per_byte - 1) // per_byte)
        for i, v in enumerate(vals):
            shift = 8 - bit_depth * ((i % per_byte) + 1)
            out[i // per_byte] |= (v & ((1 << bit_depth) - 1)) << shift
        return bytes(out)

    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7_PASSES:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        for j in range(ph):
            y = y0 + j * dy
            vals = []
            for i in range(pw):
                x = x0 + i * dx
                base = (y * width + x) * n_samples
                vals.extend(pixels[base : base + n_samples])
            raw.append(0)
            raw.extend(pack_row(vals))
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 1)
    out = PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", bytes(plte))
    return out + _png_chunk(b"IDAT", zlib.compress(bytes(raw))) + _png_chunk(b"IEND", b"")


@pytest.mark.parametrize("channels,color_type", [(1, 0), (3, 2), (4, 6)])
def test_decode_png_adam7_roundtrip(channels, color_type):
    """Adam7-interlaced pixels decode identically to their progressive
    layout's source image for grey/RGB/RGBA."""
    import random

    from apitap_spark.operators.multimodal import decode_image

    rng = random.Random(channels)
    w, h = 9, 7  # odd sizes exercise ragged pass geometry
    pixels = [rng.randrange(256) for _ in range(w * h * channels)]
    png = _make_png_adam7(w, h, 8, color_type, pixels)
    dw, dh, dc, out = decode_image(png)
    assert (dw, dh, dc) == (w, h, channels)
    assert list(out) == pixels


def test_decode_png_adam7_palette_and_16bit():
    """Interlaced palette (4-bit) and 16-bit grey follow the same
    finalization as their progressive forms."""
    import random

    from apitap_spark.operators.multimodal import decode_image

    rng = random.Random(77)
    w, h = 6, 5
    plte = [c for i in range(4) for c in (i * 60, i * 50, i * 40)]
    idx = [rng.randrange(4) for _ in range(w * h)]
    png = _make_png_adam7(w, h, 4, 3, idx, plte=plte)
    dw, dh, dc, out = decode_image(png)
    assert (dw, dh, dc) == (w, h, 3)
    assert list(out) == [c for v in idx for c in plte[v * 3 : v * 3 + 3]]

    g16 = [rng.randrange(65536) for _ in range(w * h)]
    png = _make_png_adam7(w, h, 16, 0, g16)
    dw, dh, dc, out = decode_image(png)
    assert (dw, dh, dc) == (w, h, 1)
    assert list(out) == [v >> 8 for v in g16]


def test_decode_png_adam7_tiny_image_skips_empty_passes():
    """A 1x1 interlaced image lives entirely in pass 1; the six empty
    passes contribute zero bytes."""
    from apitap_spark.operators.multimodal import decode_image

    png = _make_png_adam7(1, 1, 8, 0, [200])
    assert decode_image(png) == (1, 1, 1, bytes([200]))


def test_scd2_intervals_tile_and_collapse(spark, sf_dir):
    """Per user: intervals are contiguous (valid_to == next valid_from),
    exactly one open interval, consecutive statuses always differ, and
    the first interval starts at the user's first event."""
    from apitap_spark.plans.timeseries import q_scd2_user_status
    from apitap_spark.session import read_table
    from pyspark.sql import functions as F

    rows = q_scd2_user_status(spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    firsts = {
        r["user_id"]: r["f"]
        for r in read_table(spark, sf_dir, "events")
        .groupBy("user_id").agg(F.min("ts").alias("f")).collect()
    }
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from"])
        assert ivs[0]["valid_from"] == firsts[uid]
        assert sum(r["is_current"] for r in ivs) == 1
        assert ivs[-1]["is_current"] and ivs[-1]["valid_to"] is None
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["status"] != b["status"]


def test_hard_negatives_exclude_own_label_and_are_hardest(spark, sf_dir):
    """Every mined negative is cross-label; per anchor the set equals
    the top-k of a direct cross-label cosine recount."""
    from apitap_spark.operators.similarity import (
        HARDNEG_TOPK,
        op_sample_hard_negatives,
    )
    from apitap_spark.session import read_table

    rows = op_sample_hard_negatives(spark, sf_dir).collect()
    assert rows
    emb = {r["vec_id"]: (r["label"], r["embedding"])
           for r in read_table(spark, sf_dir, "embeddings").collect()}
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    by_q: dict = {}
    for r in rows:
        assert r["neg_label"] != r["q_label"]
        assert emb[r["c_id"]][0] == r["neg_label"]
        by_q.setdefault(r["q_id"], []).append(r)
    for q_id, got in by_q.items():
        q_label, qe = emb[q_id]
        scored = sorted(
            (
                (-cos(qe, ce), c_id)
                for c_id, (lab, ce) in emb.items()
                if c_id != q_id and lab != q_label
            ),
        )[:HARDNEG_TOPK]
        assert {c for _s, c in scored} == {r["c_id"] for r in got}


def test_bloom_filter_matches_python_recompute(spark, sf_dir):
    """Full Python re-execution of the Bloom filter: identical hit /
    false-positive accounting per source, and the no-false-negative
    invariant (every exact member is a Bloom hit)."""
    import hashlib
    import re as _re

    from apitap_spark.operators.dedup import (
        BLOOM_K,
        BLOOM_M,
        op_dedup_bloom_filter,
    )
    from apitap_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").collect()

    def norm(t):
        return _re.sub(r"\s+", " ", t.strip().lower())

    def positions(key):
        return {
            int(hashlib.md5(f"{j}|{key}".encode()).hexdigest()[:15], 16) % BLOOM_M
            for j in range(BLOOM_K)
        }

    ref_keys = {norm(r["text"]) for r in docs if r["doc_id"] % 2 == 0}
    filt = set()
    for k in ref_keys:
        filt |= positions(k)
    expect: dict = {}
    for r in docs:
        if r["doc_id"] % 2 == 0:
            continue
        key = norm(r["text"])
        bloom = positions(key) <= filt
        exact = key in ref_keys
        assert bloom or not exact  # no false negatives
        e = expect.setdefault(r["source"], [0, 0, 0, 0])
        e[0] += 1
        e[1] += bloom
        e[2] += exact
        e[3] += bloom and not exact
    got = {r["source"]: r for r in op_dedup_bloom_filter(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for src, (n, bh, eh, fp) in expect.items():
        g = got[src]
        assert (g["n_probed"], g["bloom_hits"], g["exact_hits"],
                g["false_positives"]) == (n, bh, eh, fp)
        assert abs(g["fp_rate"] - round(fp / n, 6)) < 1e-9


def test_gopher_rules_match_python_recompute(spark, sf_dir):
    """Per-document Python recount of every Gopher rule flag."""
    import re as _re

    from apitap_spark.operators.textclean import (
        _GOPHER_STOP,
        GOPHER_MAX_MEAN_LEN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_WORDS,
        op_text_gopher_rules,
    )
    from apitap_spark.session import read_table

    docs = {
        r["doc_id"]: r["text"]
        for r in read_table(spark, sf_dir, "documents").collect()
        if r["text"].strip()
    }
    rows = op_text_gopher_rules(spark, sf_dir).collect()
    assert len(rows) == len(docs)
    passed = 0
    for r in rows:
        t = _re.split(r"\s+", docs[r["doc_id"]].strip())
        n = len(t)
        mean_len = sum(len(w) for w in t) / n
        n_stop = sum(w in _GOPHER_STOP for w in t)
        alpha = sum(bool(_re.fullmatch("[a-z]+", w)) for w in t) / n
        assert r["n_words"] == n
        assert abs(r["mean_word_len"] - round(mean_len, 6)) < 1e-9
        assert r["n_stopwords"] == n_stop
        assert abs(r["alpha_word_frac"] - round(alpha, 6)) < 1e-9
        assert r["r_word_count"] == (GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS)
        assert r["r_mean_word_len"] == (
            GOPHER_MIN_MEAN_LEN <= mean_len <= GOPHER_MAX_MEAN_LEN
        )
        assert r["r_stopwords"] == (n_stop >= GOPHER_MIN_STOPWORDS)
        assert r["r_alpha_words"] == (alpha >= GOPHER_MIN_ALPHA_FRAC)
        assert r["pass_gopher"] == (
            r["r_word_count"] and r["r_mean_word_len"]
            and r["r_stopwords"] and r["r_alpha_words"]
        )
        passed += r["pass_gopher"]
    assert 0 < passed < len(rows)  # rules discriminate on this corpus


def test_skew_audit_matches_python_recount(spark, sf_dir):
    """Top-K heavy hitters, shares and salt fan-out recomputed in Python."""
    import math
    from collections import Counter

    from apitap_spark.operators.quality import SKEW_TOPK, op_skew_key_audit
    from apitap_spark.session import read_table

    cnt = Counter(
        r["user_id"] for r in read_table(spark, sf_dir, "events").collect()
    )
    total = sum(cnt.values())
    n_keys = len(cnt)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:SKEW_TOPK]
    rows = sorted(op_skew_key_audit(spark, sf_dir).collect(), key=lambda r: r["rnk"])
    assert len(rows) == SKEW_TOPK
    for rnk, (r, (uid, c)) in enumerate(zip(rows, top), start=1):
        assert (r["rnk"], r["user_id"], r["cnt"]) == (rnk, uid, c)
        assert (r["n_keys"], r["total_rows"]) == (n_keys, total)
        assert abs(r["share"] - round(c / total, 6)) < 1e-9
        assert abs(r["skew_vs_mean"] - round(c * n_keys / total, 6)) < 1e-9
        assert r["salt_parts"] == math.ceil((c * n_keys) / total)


def test_join_cardinality_audit_matches_python_recount(spark, sf_dir):
    """Containment estimate and actual join counts recomputed in Python."""
    from collections import Counter

    from apitap_spark.operators.quality import (
        _CARD_PAIRS,
        op_join_cardinality_audit,
    )
    from apitap_spark.session import read_table

    got = {r["join_pair"]: r for r in op_join_cardinality_audit(spark, sf_dir).collect()}
    assert set(got) == {p[0] for p in _CARD_PAIRS}
    for name, lt, lk, rt, rk in _CARD_PAIRS:
        lvals = [r[lk] for r in read_table(spark, sf_dir, lt).collect()]
        rvals = [r[rk] for r in read_table(spark, sf_dir, rt).collect()]
        rc = Counter(rvals)
        actual = sum(rc[v] for v in lvals)
        est = (len(lvals) * len(rvals)) // max(len(set(lvals)), len(set(rvals)))
        g = got[name]
        assert (g["n_left"], g["n_right"]) == (len(lvals), len(rvals))
        assert (g["ndv_left"], g["ndv_right"]) == (len(set(lvals)), len(set(rvals)))
        assert g["est_rows"] == est
        assert g["actual_rows"] == actual
        assert abs(g["actual_over_est"] - round(actual / est, 6)) < 1e-9


def test_collocations_match_python_recount(spark, sf_dir):
    """Top-K lift ranking recomputed in Python from raw token streams."""
    import re as _re

    from apitap_spark.operators.textstats import (
        COLLOC_MIN_SUPPORT,
        COLLOC_TOPK,
        op_text_collocations_lift,
    )
    from apitap_spark.session import read_table

    from collections import Counter

    uni, bi = Counter(), Counter()
    for r in read_table(spark, sf_dir, "documents").collect():
        t = _re.split(r"\s+", r["text"].strip())
        if not r["text"].strip():
            continue
        uni.update(t)
        bi.update(zip(t, t[1:]))
    n_uni, n_bi = sum(uni.values()), sum(bi.values())
    scored = [
        (
            (n_ab * n_uni * n_uni) / (n_bi * uni[a] * uni[b]),
            a,
            b,
            n_ab,
        )
        for (a, b), n_ab in bi.items()
        if n_ab >= COLLOC_MIN_SUPPORT
    ]
    scored.sort(key=lambda x: (-x[0], x[1], x[2]))
    rows = sorted(
        op_text_collocations_lift(spark, sf_dir).collect(), key=lambda r: r["rnk"]
    )
    assert len(rows) == min(COLLOC_TOPK, len(scored))
    for r, (lift, a, b, n_ab) in zip(rows, scored):
        assert (r["w1"], r["w2"], r["n_ab"]) == (a, b, n_ab)
        assert (r["n_a"], r["n_b"]) == (uni[a], uni[b])
        assert abs(r["lift"] - round(lift, 6)) < 1e-9


def test_cms_never_underestimates_and_matches_python(spark, sf_dir):
    """CMS estimates recomputed in Python; overestimate >= 0 everywhere."""
    import hashlib
    import re as _re
    from collections import Counter, defaultdict

    from apitap_spark.operators.textstats import (
        CMS_DEPTH,
        CMS_TOPK,
        CMS_WIDTH,
        op_text_heavy_hitters_cms,
    )
    from apitap_spark.session import read_table

    uni = Counter()
    for r in read_table(spark, sf_dir, "documents").collect():
        if r["text"].strip():
            uni.update(_re.split(r"\s+", r["text"].strip()))

    def cell(d, w):
        return int(hashlib.md5(f"{d}|{w}".encode()).hexdigest()[:15], 16) % CMS_WIDTH

    sketch = defaultdict(int)
    for w, c in uni.items():
        for d in range(CMS_DEPTH):
            sketch[(d, cell(d, w))] += c
    top = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOPK]
    rows = sorted(
        op_text_heavy_hitters_cms(spark, sf_dir).collect(), key=lambda r: r["rnk"]
    )
    assert len(rows) == len(top)
    for r, (w, c) in zip(rows, top):
        est = min(sketch[(d, cell(d, w))] for d in range(CMS_DEPTH))
        assert (r["token"], r["exact_cnt"], r["cms_est"]) == (w, c, est)
        assert r["overestimate"] == est - c >= 0


def test_audio_vad_matches_python_recount(spark, sf_dir):
    """Per-doc frame energies, VAD flags and longest-run recomputed
    independently from the raw text bytes."""
    from apitap_spark.operators.multimodal import (
        AUDIO_CENTER,
        AUDIO_FRAME,
        AUDIO_VAD_THRESH,
        op_multimodal_audio_vad,
    )
    from apitap_spark.session import read_table

    texts = {
        r["doc_id"]: r["text"].encode()
        for r in read_table(spark, sf_dir, "documents").collect()
    }
    rows = {r["doc_id"]: r for r in op_multimodal_audio_vad(spark, sf_dir).collect()}
    assert set(rows) == {d for d, t in texts.items() if len(t) >= AUDIO_FRAME}
    saw_active = saw_silent = False
    for doc_id, r in rows.items():
        data = texts[doc_id]
        nf = len(data) // AUDIO_FRAME
        energies = [
            sum((b - AUDIO_CENTER) ** 2 for b in data[i * AUDIO_FRAME:(i + 1) * AUDIO_FRAME])
            for i in range(nf)
        ]
        flags = [e >= AUDIO_VAD_THRESH for e in energies]
        longest = run = 0
        for a in flags:
            run = run + 1 if a else 0
            longest = max(longest, run)
        assert r["n_samples"] == len(data)
        assert r["n_frames"] == nf
        assert r["n_active"] == sum(flags)
        assert r["longest_run"] == longest
        assert r["total_energy"] == sum(energies)
        total = sum(energies)
        assert r["mean_frame_energy"] == float(
            (total * 2_000_000 + nf) // (2 * nf)
        ) / 1_000_000.0
        assert r["longest_run"] <= r["n_active"] <= r["n_frames"]
        saw_active |= sum(flags) > 0
        saw_silent |= sum(flags) < nf
    assert saw_active and saw_silent  # threshold discriminates


def test_triangles_match_python_recount(spark, sf_dir):
    """Edge construction and triangle enumeration recomputed in Python
    (adjacency-set intersection), including per-node participation."""
    from collections import Counter, defaultdict

    from apitap_spark.operators.graph import (
        TRI_NEXT_K,
        TRI_TOPK,
        op_graph_triangles,
    )
    from apitap_spark.session import read_table

    buckets = defaultdict(set)
    for r in read_table(spark, sf_dir, "events").collect():
        b = r["ts"].replace(minute=0, second=0, microsecond=0)
        buckets[(b, r["event_type"])].add(r["user_id"])
    edges = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, u in enumerate(ms):
            for v in ms[i + 1 : i + 1 + TRI_NEXT_K]:
                edges.add((u, v))
    nbr = defaultdict(set)
    for u, v in edges:
        nbr[u].add(v)
    tris = [
        (a, b, c)
        for (a, b) in edges
        for c in nbr[b]
        if c in nbr[a]
    ]
    part = Counter()
    for t in tris:
        part.update(t)
    top = sorted(part.items(), key=lambda kv: (-kv[1], kv[0]))[:TRI_TOPK]
    rows = sorted(op_graph_triangles(spark, sf_dir).collect(), key=lambda r: r["rnk"])
    assert len(rows) == min(TRI_TOPK, len(top))
    assert tris  # graph actually has triangles at this SF
    for rnk, (r, (uid, n)) in enumerate(zip(rows, top), start=1):
        assert (r["rnk"], r["user_id"], r["n_tri"]) == (rnk, uid, n)
        assert r["total_triangles"] == len(tris)


def test_bpe_decode_roundtrip_is_lossless(spark, sf_dir):
    """Every doc decodes back to its whitespace-stripped text, and the
    per-source totals match an independent recount."""
    import re as _re
    from collections import Counter

    from apitap_spark.operators.bpe import op_bpe_decode_roundtrip
    from apitap_spark.session import read_table

    docs = [
        r
        for r in read_table(spark, sf_dir, "documents").collect()
        if r["text"].strip()
    ]
    n_by_src = Counter(r["source"] for r in docs)
    chars_by_src = Counter()
    for r in docs:
        chars_by_src[r["source"]] += len(_re.sub(r"\s+", "", r["text"].strip()))
    rows = {r["source"]: r for r in op_bpe_decode_roundtrip(spark, sf_dir).collect()}
    assert set(rows) == set(n_by_src)
    for src, r in rows.items():
        assert r["n_docs"] == n_by_src[src]
        assert r["n_roundtrip_ok"] == r["n_docs"]  # lossless everywhere
        assert r["total_decoded_chars"] == chars_by_src[src]


def test_trace_assembly_matches_python_replay(spark, sf_dir):
    """Sessions, ordered traces, durations and labels replayed per user."""
    from collections import defaultdict

    from apitap_spark.operators.temporal import TRACE_GAP_MIN, op_trace_assembly
    from apitap_spark.session import read_table

    by_user = defaultdict(list)
    for r in read_table(spark, sf_dir, "events").collect():
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    expect = {}
    for uid, evs in by_user.items():
        evs.sort()
        sess_no, prev = 0, None
        sessions = defaultdict(list)
        for ts, eid, et in evs:
            if prev is None or (
                int(ts.timestamp() // 1) - int(prev.timestamp() // 1)
                > TRACE_GAP_MIN * 60
            ):
                sess_no += 1
            sessions[sess_no].append((ts, eid, et))
            prev = ts
        for sn, items in sessions.items():
            trace = ">".join(et for _, _, et in items)
            # engines floor each endpoint to epoch seconds, then subtract
            dur = int(items[-1][0].timestamp() // 1) - int(
                items[0][0].timestamp() // 1
            )
            expect[(uid, sn)] = (
                len(items),
                trace,
                dur,
                any(et == "purchase" for _, _, et in items),
            )
    rows = op_trace_assembly(spark, sf_dir).collect()
    assert len(rows) == len(expect)
    for r in rows:
        assert (
            r["n_turns"],
            r["trace"],
            r["duration_sec"],
            r["has_purchase"],
        ) == expect[(r["user_id"], r["session_no"])]


def test_kanonymity_flags_small_groups(spark, sf_dir):
    """Group sizes and suppression counts recomputed; audit discriminates."""
    from collections import Counter

    from apitap_spark.operators.quality import KANON_K, op_kanonymity_audit
    from apitap_spark.session import read_table

    cnt = Counter(
        (r["source"], r["lang"])
        for r in read_table(spark, sf_dir, "documents").collect()
    )
    rows = {(r["source"], r["lang"]): r for r in op_kanonymity_audit(spark, sf_dir).collect()}
    assert set(rows) == set(cnt)
    flags = set()
    for key, r in rows.items():
        n = cnt[key]
        assert r["group_n"] == n
        assert r["k_anonymous"] == (n >= KANON_K)
        assert r["n_suppressed"] == (0 if n >= KANON_K else n)
        flags.add(r["k_anonymous"])
    assert flags == {True, False}  # audit discriminates on this corpus


def test_embedding_dim_profile_matches_python(spark, sf_dir):
    """Fixed-point per-dimension stats recomputed with exact int sums."""
    from collections import defaultdict

    from apitap_spark.operators.quality import DIM_SCALE, op_embedding_dim_profile
    from apitap_spark.session import read_table

    import decimal

    acc = defaultdict(lambda: [0, 0, 0, None, None])  # n, s1, s2, mn, mx
    for r in read_table(spark, sf_dir, "embeddings").collect():
        for i, x in enumerate(r["embedding"], start=1):
            v = int(
                decimal.Decimal(float(x) * DIM_SCALE).quantize(
                    0, rounding=decimal.ROUND_HALF_UP
                )
            )
            a = acc[i]
            a[0] += 1
            a[1] += v
            a[2] += v * v
            a[3] = v if a[3] is None else min(a[3], v)
            a[4] = v if a[4] is None else max(a[4], v)
    rows = {r["dim"]: r for r in op_embedding_dim_profile(spark, sf_dir).collect()}
    assert set(rows) == set(acc)
    for dim, (n, s1, s2, mn, mx) in acc.items():
        r = rows[dim]
        assert (r["n_vecs"], r["min_milli"], r["max_milli"]) == (n, mn, mx)
        assert r["mean_value"] == float(s1) / DIM_SCALE / float(n)
        assert r["variance"] == float(n * s2 - s1 * s1) / (DIM_SCALE * DIM_SCALE) / float(n * n)
        assert r["variance"] >= 0


def test_mrr_audit_consistent_with_component_gates(spark, sf_dir):
    """Precision/RR recomputed from the two component gates' collected
    results; invariants: precision in [0,1], rr_micro=1e6 iff best_rank=1."""
    from apitap_spark.operators.similarity import (
        op_ann_cosine_topk,
        op_ann_lsh_bucketed,
        op_ann_mrr_audit,
    )

    lsh = {}
    for r in op_ann_lsh_bucketed(spark, sf_dir).collect():
        lsh.setdefault(r["q_id"], {})[r["c_id"]] = r["rk"]
    exact = {}
    best = {}
    for r in op_ann_cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r["q_id"], set()).add(r["c_id"])
        if r["rk"] == 1:
            best[r["q_id"]] = r["c_id"]
    rows = {r["q_id"]: r for r in op_ann_mrr_audit(spark, sf_dir).collect()}
    assert set(rows) == set(lsh)
    hit_seen = miss_info = False
    for q_id, r in rows.items():
        k = len(lsh[q_id])
        inter = len(set(lsh[q_id]) & exact.get(q_id, set()))
        br = lsh[q_id].get(best.get(q_id), 0)
        assert (r["k_lsh"], r["n_inter"], r["best_rank"]) == (k, inter, br)
        assert abs(r["precision_at_k"] - round(inter / k, 6)) < 1e-9
        assert r["rr_micro"] == (0 if br == 0 else 1000000 // br)
        assert 0 <= r["precision_at_k"] <= 1
        hit_seen |= br == 1
        miss_info |= r["n_inter"] < r["k_lsh"]
    assert hit_seen  # the index does find some true nearest neighbors


def test_lsh_tuning_curve_matches_python_and_is_monotone(spark, sf_dir):
    """Expected catch rates recomputed in Python with identical repeated
    squaring; more rows per band must catch fewer (or equal) pairs."""
    import decimal

    from apitap_spark.operators.dedup import (
        LSH_TUNE_CONFIGS,
        op_dedup_ngram_jaccard,
        op_lsh_tuning_curve,
    )

    sims = [r["jaccard"] for r in op_dedup_ngram_jaccard(spark, sf_dir).collect()]
    assert sims

    def sq_pow(x, e):  # repeated squaring, exponents are powers of two
        while e > 1:
            x = x * x
            e //= 2
        return x

    expect = {}
    for b, r in LSH_TUNE_CONFIGS:
        total = 0
        for s in sims:
            p = 1.0 - sq_pow(1.0 - sq_pow(s, r), b)
            total += int(
                decimal.Decimal(p * 1e6).quantize(0, rounding=decimal.ROUND_HALF_UP)
            )
        expect[(b, r)] = (len(sims), total)
    rows = {
        (r["bands"], r["rows_per_band"]): r
        for r in op_lsh_tuning_curve(spark, sf_dir).collect()
    }
    assert set(rows) == set(expect)
    for key, (n, total) in expect.items():
        g = rows[key]
        assert (g["n_pairs"], g["sum_catch_micro"]) == (n, total)
        assert g["mean_catch_prob"] == float(total) / 1e6 / float(n)
    # S-curve sanity: fewer rows per band -> easier collisions -> higher catch
    ordered = [rows[(b, r)]["mean_catch_prob"] for b, r in LSH_TUNE_CONFIGS]
    assert ordered == sorted(ordered, reverse=True)


def test_wordpiece_matches_python_greedy(spark, sf_dir):
    """Pure-Python greedy longest-match over the same learned inventory
    reproduces the per-source token/unk counts exactly."""
    import re as _re
    from collections import Counter

    from apitap_spark.operators.bpe import (
        char_vocab,
        learn_bpe_with_vocab,
        op_wordpiece_encode,
    )
    from apitap_spark.session import read_table

    docs = [
        r
        for r in read_table(spark, sf_dir, "documents").collect()
        if r["text"].strip()
    ]
    docs_df = read_table(spark, sf_dir, "documents").filter(
        "length(trim(text)) > 0"
    )
    _m, final_vocab = learn_bpe_with_vocab(char_vocab(docs_df), carry=("w",))
    syms = {
        r["sym"]
        for r in final_vocab.selectExpr("explode(symbols) AS sym").distinct().collect()
    }
    max_sym = max(len(s) for s in syms)

    def greedy(w):
        pos, toks, unks = 0, 0, 0
        while pos < len(w):
            for L in range(min(max_sym, len(w) - pos), 0, -1):
                if w[pos : pos + L] in syms:
                    pos += L
                    toks += 1
                    break
            else:
                pos += 1
                unks += 1
        return toks, unks

    per_word = {}
    expect: dict = {}
    for r in docs:
        for w in _re.split(r"\s+", r["text"].strip()):
            if w not in per_word:
                per_word[w] = greedy(w)
            t, u = per_word[w]
            e = expect.setdefault(r["source"], [0, 0, 0])
            e[0] += 1
            e[1] += t
            e[2] += u
    rows = {r["source"]: r for r in op_wordpiece_encode(spark, sf_dir).collect()}
    assert set(rows) == set(expect)
    for src, (n, t, u) in expect.items():
        g = rows[src]
        assert (g["n_words"], g["wp_tokens"], g["wp_unks"]) == (n, t, u)
        assert g["tokens_per_word"] == float(t) / float(n)
        assert g["wp_tokens"] >= g["n_words"]  # at least one piece per word


def test_ldiversity_matches_python_recount(spark, sf_dir):
    """Group sizes, distinct sensitive values and top-share recomputed."""
    from collections import Counter, defaultdict

    from apitap_spark.operators.quality import LDIV_L, op_ldiversity_audit
    from apitap_spark.session import read_table

    langs = defaultdict(Counter)
    for r in read_table(spark, sf_dir, "documents").collect():
        langs[r["source"]][r["lang"]] += 1
    rows = {r["source"]: r for r in op_ldiversity_audit(spark, sf_dir).collect()}
    assert set(rows) == set(langs)
    for src, cnt in langs.items():
        r = rows[src]
        n = sum(cnt.values())
        assert r["group_n"] == n
        assert r["n_sensitive_values"] == len(cnt)
        assert r["l_diverse"] == (len(cnt) >= LDIV_L)
        assert abs(r["top_sensitive_share"] - round(max(cnt.values()) / n, 6)) < 1e-9


def test_degree_profile_matches_triangle_edge_set(spark, sf_dir):
    """Degree histogram recomputed from the same Python edge
    construction the triangle test uses; shares sum to 1."""
    from collections import Counter, defaultdict

    from apitap_spark.operators.graph import TRI_NEXT_K, op_graph_degree_profile
    from apitap_spark.session import read_table

    buckets = defaultdict(set)
    for r in read_table(spark, sf_dir, "events").collect():
        b = r["ts"].replace(minute=0, second=0, microsecond=0)
        buckets[(b, r["event_type"])].add(r["user_id"])
    edges = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, u in enumerate(ms):
            for v in ms[i + 1 : i + 1 + TRI_NEXT_K]:
                edges.add((u, v))
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    hist = Counter(deg.values())
    total = sum(hist.values())
    rows = {r["degree"]: r for r in op_graph_degree_profile(spark, sf_dir).collect()}
    assert set(rows) == set(hist)
    share_sum = 0.0
    for d, n in hist.items():
        r = rows[d]
        assert (r["n_nodes"], r["total_nodes"]) == (n, total)
        assert abs(r["node_share"] - round(n / total, 6)) < 1e-9
        share_sum += r["node_share"]
    assert abs(share_sum - 1.0) < 1e-3


def test_cdc_chunking_matches_python_and_boundary_stability(spark, sf_dir):
    """Python recount of boundaries/chunks/dup stats, plus the CDC
    selling point: inserting a prefix into a doc re-aligns chunking at
    the next boundary (suffix chunks identical), where fixed windows
    shift everything."""
    import hashlib
    from collections import Counter, defaultdict

    from apitap_spark.operators.dedup import CDC_DIV, CDC_K, op_cdc_chunking
    from apitap_spark.session import read_table

    docs = [
        r
        for r in read_table(spark, sf_dir, "documents").collect()
        if r["text"].strip()
    ]

    def h(window: str) -> int:
        return int(hashlib.md5(window.encode()).hexdigest()[:15], 16) % CDC_DIV

    def chunk(text: str) -> list[str]:
        npos = [
            p
            for p in range(CDC_K, len(text))  # p < n: no empty tail chunk
            if h(text[p - CDC_K : p]) == 0
        ]
        starts = [0] + npos
        ends = npos + [len(text)]
        return [text[s:e] for s, e in zip(starts, ends)]

    freq = Counter()
    per_source = defaultdict(lambda: [set(), 0, 0])
    all_chunks = []
    for r in docs:
        cs = chunk(r["text"])
        all_chunks.append((r["source"], r["doc_id"], cs))
        freq.update(hashlib.md5(c.encode()).hexdigest() for c in cs)
    expect = {}
    for src, doc_id, cs in all_chunks:
        e = expect.setdefault(src, [set(), 0, 0, 0])
        e[0].add(doc_id)
        e[1] += len(cs)
        e[2] += sum(len(c) for c in cs)
        e[3] += sum(
            freq[hashlib.md5(c.encode()).hexdigest()] > 1 for c in cs
        )
    rows = {r["source"]: r for r in op_cdc_chunking(spark, sf_dir).collect()}
    assert set(rows) == set(expect)
    for src, (ids, n_chunks, chars, dups) in expect.items():
        g = rows[src]
        assert (g["n_docs"], g["n_chunks"], g["total_chars"]) == (
            len(ids),
            n_chunks,
            chars,
        )
        assert g["dup_chunk_instances"] == dups
        assert abs(g["dup_ratio"] - round(dups / n_chunks, 6)) < 1e-9
        assert g["mean_chunk_len"] == chars / n_chunks

    # boundary stability under prefix insertion
    text = docs[0]["text"]
    shifted = "zq" + text
    orig, edited = chunk(text), chunk(shifted)
    assert orig[-1] == edited[-1]  # suffix chunks re-align after the edit


def test_cdc_fast_rung_tiles_and_realigns(spark, sf_dir):
    """The xxhash64 production rung must satisfy the CDC invariants the
    md5 oracle rung proves: chunks tile every document exactly, and a
    prefix edit re-aligns at the next content-defined boundary (suffix
    chunk hashes shared between original and edited corpus)."""
    from pyspark.sql import functions as F

    from apitap_spark.operators.dedup import cdc_chunks_frame
    from apitap_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    chunks = cdc_chunks_frame(docs, fast=True)
    # tiling: per-doc chunk lengths sum to the doc length, no empties
    tiled = (
        chunks.groupBy("doc_id")
        .agg(F.sum("clen").alias("s"), F.min("clen").alias("m"))
        .join(
            docs.filter(F.length(F.trim("text")) > 0).select(
                "doc_id", F.length("text").cast("long").alias("n")
            ),
            "doc_id",
        )
    )
    bad = tiled.filter((F.col("s") != F.col("n")) | (F.col("m") <= 0)).count()
    assert bad == 0
    # realignment: edit every doc with a 2-char prefix; the LAST chunk
    # hash of each doc must be unchanged (content-defined boundaries
    # absorb the shift at the first post-edit boundary)
    # Every original window at position q maps to edited position q+2
    # over identical chars, so every original boundary survives (+2) and
    # only the HEAD chunk can change (split by new boundaries inside the
    # first K+2 chars, or extended by the prefix). Assert on the chunk
    # multiset: per doc at most one original chunk instance missing.
    edited = docs.withColumn("text", F.concat(F.lit("zq"), F.col("text")))
    o = chunks.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    e = (
        cdc_chunks_frame(edited, fast=True)
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("ce"))
    )
    j = o.join(e, ["doc_id", "ch"], "left").withColumn(
        "missing", F.col("c") - F.coalesce("ce", F.lit(0))
    )
    viol = (
        j.groupBy("doc_id")
        .agg(F.sum(F.greatest("missing", F.lit(0))).alias("lost"))
        .filter(F.col("lost") > 1)
        .count()
    )
    assert viol == 0


def test_training_shuffle_plan_deterministic_and_complete(spark, sf_dir):
    """Shard assignment recomputed in Python from the packed rows; two
    runs agree (seeded determinism) and every row is assigned."""
    import hashlib
    from collections import defaultdict

    from apitap_spark.operators.bpe import (
        SHUFFLE_SEED,
        SHUFFLE_SHARDS,
        op_bpe_pack_training_rows,
        op_training_shuffle_plan,
    )

    packed = [
        (r["row_id"], r["n_tokens"])
        for r in op_bpe_pack_training_rows(spark, sf_dir).collect()
    ]
    expect = defaultdict(lambda: [0, 0])
    for row_id, n_tok in packed:
        sh = (
            int(
                hashlib.md5(f"{SHUFFLE_SEED}|{row_id}".encode()).hexdigest()[:15],
                16,
            )
            % SHUFFLE_SHARDS
        )
        expect[sh][0] += 1
        expect[sh][1] += n_tok
    total = sum(t for _, t in packed)
    rows = {r["shard"]: r for r in op_training_shuffle_plan(spark, sf_dir).collect()}
    rows2 = {r["shard"]: r for r in op_training_shuffle_plan(spark, sf_dir).collect()}
    assert {k: (v["n_rows"], v["shard_tokens"]) for k, v in rows.items()} == {
        k: (v["n_rows"], v["shard_tokens"]) for k, v in rows2.items()
    }  # deterministic across runs
    assert set(rows) == set(expect)
    assert sum(r["n_rows"] for r in rows.values()) == len(packed)
    for sh, (n, t) in expect.items():
        g = rows[sh]
        assert (g["n_rows"], g["shard_tokens"]) == (n, t)
        assert abs(g["token_share"] - round(t / total, 6)) < 1e-9


def test_knn_graph_numpy_replay(spark, sf_dir):
    """Triangulate op_embedding_knn_graph against a numpy replay:
    same top-k sets, ranks, and mutual flags."""
    import numpy as np

    from apitap_spark.operators.similarity import (
        KNN_GRAPH_K,
        KNN_GRAPH_POOL,
        op_embedding_knn_graph,
    )
    from apitap_spark.session import read_table

    rows = (
        read_table(spark, sf_dir, "embeddings")
        .filter(f"vec_id < {KNN_GRAPH_POOL}")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    M = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    C = Mn @ Mn.T
    order = np.argsort(ids)
    ids, C = ids[order], C[np.ix_(order, order)]
    expect = {}
    for i, v in enumerate(ids):
        sims = [(-C[i, j], ids[j]) for j in range(len(ids)) if j != i]
        sims.sort()
        expect[v] = [d for _, d in sims[:KNN_GRAPH_K]]
    got = op_embedding_knn_graph(spark, sf_dir).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.src, {})[r.rk] = r
    assert set(by_src) == set(expect)
    for v, nbrs in expect.items():
        assert [by_src[v][k].dst for k in sorted(by_src[v])] == nbrs
    for r in got:
        assert r.mutual == (r.src in expect[r.dst])


def test_dbscan_numpy_replay(spark, sf_dir):
    """Triangulate op_dbscan_clusters against a numpy/union-find replay,
    and assert the planted structure is non-vacuous (cores AND borders
    AND noise all present at both driver SFs)."""
    import numpy as np

    from apitap_spark.operators.similarity import (
        DBSCAN_MIN_NBRS,
        DBSCAN_POOL,
        DBSCAN_TAU,
        op_dbscan_clusters,
    )
    from apitap_spark.session import read_table

    rows = (
        read_table(spark, sf_dir, "embeddings")
        .filter(f"vec_id < {DBSCAN_POOL}")
        .collect()
    )
    ids = [r.vec_id for r in rows]
    M = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    C = Mn @ Mn.T
    np.fill_diagonal(C, -2.0)
    A = C >= DBSCAN_TAU
    deg = {v: int(A[i].sum()) for i, v in enumerate(ids)}
    core = {v for v in ids if deg[v] >= DBSCAN_MIN_NBRS}
    parent = {v: v for v in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    idx = {v: i for i, v in enumerate(ids)}
    for u in core:
        for v in core:
            if u < v and A[idx[u], idx[v]]:
                ru, rv = find(u), find(v)
                if ru != rv:
                    parent[max(ru, rv)] = min(ru, rv)
    comp = {v: min(u for u in core if find(u) == find(v)) for v in core}
    got = {r.vec_id: r for r in op_dbscan_clusters(spark, sf_dir).collect()}
    assert set(got) == set(ids)
    roles = {"core": 0, "border": 0, "noise": 0}
    for v in ids:
        r = got[v]
        assert r.n_nbrs == deg[v], v
        if v in core:
            assert r.role == "core" and r.cluster == comp[v], v
        else:
            nbr_cores = [u for u in core if A[idx[v], idx[u]]]
            if nbr_cores:
                assert r.role == "border", v
                assert r.cluster == min(comp[u] for u in nbr_cores), v
            else:
                assert r.role == "noise" and r.cluster == -1, v
        roles[r.role] += 1
    assert all(roles.values()), roles


def test_greedy_graph_search_python_replay(spark, sf_dir):
    """Triangulate op_ann_greedy_graph_search with an independent Python
    walk over the numpy-built kNN graph."""
    import math

    import numpy as np

    from apitap_spark.operators.similarity import (
        GREEDY_ENTRY,
        GREEDY_K,
        GREEDY_POOL,
        GREEDY_QHI,
        GREEDY_QLO,
        op_ann_greedy_graph_search,
    )
    from apitap_spark.session import read_table

    rows = read_table(spark, sf_dir, "embeddings").filter(
        f"vec_id < {GREEDY_QHI}"
    ).collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}

    def _cos(a, b):
        # index-order fold for dot AND norms — the engines' convention;
        # a BLAS dot would differ in the last ulp and flip strict '>'
        return float(
            np.cumsum(a * b)[-1]
            / (np.sqrt(np.cumsum(a * a)[-1]) * np.sqrt(np.cumsum(b * b)[-1]))
        )

    ids = sorted(v for v in vecs if v < GREEDY_POOL)
    idx = {v: i for i, v in enumerate(ids)}
    C = np.empty((len(ids), len(ids)))
    for i, u in enumerate(ids):
        for j, v in enumerate(ids):
            if i != j:
                C[i, j] = _cos(vecs[u], vecs[v])
    knn = {
        v: [
            ids[j]
            for j in sorted(
                (j for j in range(len(ids)) if j != idx[v]),
                key=lambda j: (-C[idx[v], j], ids[j]),
            )[:GREEDY_K]
        ]
        for v in ids
    }
    got = {r.q_id: r for r in op_ann_greedy_graph_search(spark, sf_dir).collect()}
    assert set(got) == set(range(GREEDY_QLO, GREEDY_QHI))
    for q in range(GREEDY_QLO, GREEDY_QHI):
        qcos = {v: _cos(vecs[q], vecs[v]) for v in ids}
        cur, steps = GREEDY_ENTRY, 0
        while True:
            better = [(-qcos[n], n) for n in knn[cur] if qcos[n] > qcos[cur]]
            if not better:
                break
            cur, steps = min(better)[1], steps + 1
        exact = min(ids, key=lambda v: (-qcos[v], v))
        r = got[q]
        assert (r.found_id, r.steps, r.exact_id) == (cur, steps, exact), q
        assert r.is_exact == (cur == exact)
        assert r.found_cos_micro == math.floor(1000000.0 * qcos[cur])
        assert r.gap_micro >= 0


def test_readability_python_recount(spark, sf_dir):
    """Recount op_text_readability in Python (re-based syllable runs,
    math.floor chains) and pin the formula constants."""
    import math
    import re

    from apitap_spark.operators.textstats import op_text_readability
    from apitap_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    got = {r.doc_id: r for r in op_text_readability(spark, sf_dir).collect()}
    assert set(got) == {r.doc_id for r in docs}
    for r in docs:
        w = len(re.split(r"\s+", r.text.strip()))
        syl = len(re.findall(r"[aeiouy]+", r.text.lower()))
        s = max(len(re.findall(r"[.!?]", r.text)), 1)
        g = got[r.doc_id]
        assert (g.n_words, g.n_syllables, g.n_sentences) == (w, syl, s)
        if w > 0:
            assert g.flesch_milli == math.floor(
                1000.0
                * ((206.835 - (1.015 * (float(w) / float(s))))
                   - (84.6 * (float(syl) / float(w))))
            )
            assert g.fk_grade_milli == math.floor(
                1000.0
                * (((0.39 * (float(w) / float(s)))
                    + (11.8 * (float(syl) / float(w)))) - 15.59)
            )
    # corpus is punctuation-free: every doc is "one long sentence" and
    # readability is poor (negative Flesch) — the audit's finding
    assert all(g.n_sentences == 1 for g in got.values())
    # long docs go negative, short ones stay positive — real spread
    assert any(g.flesch_milli < 0 for g in got.values())
    assert any(g.flesch_milli > 0 for g in got.values())


def test_keyset_pagination_equals_offset(spark, sf_dir):
    """The seek-method page must equal the naive sort-offset page, and
    the physical plan must use a distributed top-k (TakeOrderedAndProject),
    not a global Sort+Exchange."""
    from apitap_spark.plans.relational6 import (
        PAGE_OFFSET,
        PAGE_SIZE,
        q_keyset_pagination,
    )
    from apitap_spark.session import read_table

    got = q_keyset_pagination(spark, sf_dir).collect()
    naive = (
        read_table(spark, sf_dir, "orders")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(PAGE_OFFSET + PAGE_SIZE)
        .collect()[PAGE_OFFSET:]
    )
    assert [(r.o_orderkey, r.o_orderdate) for r in got] == [
        (r.o_orderkey, r.o_orderdate) for r in naive
    ]
    assert len(got) == PAGE_SIZE
    plan = q_keyset_pagination(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_fd_audit_python_recount(spark, sf_dir):
    """Recount every FD candidate in Python dicts; key-backed FDs must
    hold, behavioral ones must be violated."""
    from apitap_spark.operators.quality import FD_CANDIDATES, op_fd_audit
    from apitap_spark.session import read_table

    got = {r.fd: r for r in op_fd_audit(spark, sf_dir).collect()}
    assert set(got) == {name for name, *_ in FD_CANDIDATES}
    for name, table, lhs, rhs in FD_CANDIDATES:
        rows = read_table(spark, sf_dir, table).selectExpr(
            f"{lhs} AS x", f"{rhs} AS y"
        ).collect()
        groups = {}
        for r in rows:
            groups.setdefault(r.x, set()).add(r.y)
        counts = {}
        for r in rows:
            counts[r.x] = counts.get(r.x, 0) + 1
        r = got[name]
        viol = sum(1 for ys in groups.values() if len(ys) > 1)
        assert (r.n_rows, r.n_lhs, r.n_violating_lhs, r.max_rhs_per_lhs) == (
            len(rows),
            len(groups),
            viol,
            max(len(ys) for ys in groups.values()),
        ), name
        assert r.holds == (viol == 0)
    # structural expectations: true keys hold, behavioral FDs do not
    assert got["orders_key_status"].holds
    assert got["nation_key_region"].holds
    assert not got["orders_cust_priority"].holds
    assert not got["events_user_type"].holds
    # genuine audit finding: unlike real TPC-H, the synthetic lineitem
    # REUSES (l_orderkey, l_linenumber) across parts — the composite
    # "key" is violated, exactly what an FD audit exists to catch
    assert not got["lineitem_line_part"].holds
    assert got["lineitem_line_part"].n_violating_lhs > 0


def test_label_noise_subset_of_cosine_pairs(spark, sf_dir):
    """op_label_noise_pairs must be exactly the label-mismatched subset
    of op_dedup_embedding_cosine's pair set, cosine values identical."""
    from apitap_spark.operators.similarity import (
        op_dedup_embedding_cosine,
        op_label_noise_pairs,
    )
    from apitap_spark.session import read_table

    lab = {
        r.vec_id: r.label
        for r in read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    base = {
        (r.v1, r.v2): r.cosine
        for r in op_dedup_embedding_cosine(spark, sf_dir).collect()
    }
    noise = {
        (r.v1, r.v2): (r.label1, r.label2, r.cosine)
        for r in op_label_noise_pairs(spark, sf_dir).collect()
    }
    expect = {
        k: (lab[k[0]], lab[k[1]], c)
        for k, c in base.items()
        if lab[k[0]] != lab[k[1]]
    }
    assert noise == expect
    assert len(noise) > 0  # the audit has real findings on this corpus


def test_relational_division_python_recount(spark, sf_dir):
    """Recount Codd division: customers covering every priority class."""
    from apitap_spark.plans.relational6 import q_relational_division
    from apitap_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    ).collect()
    allp = {r.o_orderpriority for r in orders}
    cov = {}
    for r in orders:
        cov.setdefault(r.o_custkey, set()).add(r.o_orderpriority)
    expect = {k for k, v in cov.items() if v == allp}
    got = {r.c_custkey for r in q_relational_division(spark, sf_dir).collect()}
    assert got == expect
    assert 0 < len(got) < len(cov)  # non-vacuous, non-total
