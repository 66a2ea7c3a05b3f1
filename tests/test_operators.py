"""Operator-level unit tests (the suite's DuckDB-oracle comparison is the
integration layer; these pin the operators' semantics on tiny hand-checked
inputs, mirroring the reference's fixture-based unit tests — SURVEY §5.4)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_exact_dedup_groups(spark):
    from lance_trino_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other doc")],
        ["doc_id", "text"],
    )
    out = {r["keeper"]: r["n_copies"] for r in exact_dedup(df).collect()}
    # normalization folds case+whitespace → docs 1,2 collapse
    assert out == {1: 2, 3: 1}


def test_minhash_finds_near_dup_and_skips_distinct(spark):
    from lance_trino_spark.operators.dedup import minhash_lsh_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "completely different words here now ok yes")],
        ["doc_id", "text"],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_dedup(df, threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_simhash_exact_copy_zero_hamming(spark):
    from lance_trino_spark.operators.dedup import (
        shingle_hashes,
        simhash_near_dup_pairs,
        simhash_signatures,
    )

    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame([(1, t), (2, t)], ["doc_id", "text"])
    sig = simhash_signatures(shingle_hashes(df))
    rows = simhash_near_dup_pairs(sig).collect()
    assert len(rows) == 1 and rows[0]["hamming"] == 0


def test_cosine_topk_matches_numpy(spark):
    import numpy as np

    from lance_trino_spark.operators.similarity import cosine_topk

    rng = np.random.RandomState(7)
    vecs = rng.rand(20, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)], ["vec_id", "embedding"]
    )
    out = cosine_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    sims = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    expect = [i for i in np.argsort(-sims) if i != 0][:3]
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] == expect
    for r in out:
        assert math.isclose(r["cosine"], float(sims[r["neighbor_id"]]), rel_tol=1e-6)


def test_connected_components_clusters(spark):
    from lance_trino_spark.operators.dedup import connected_components

    # a 5-node chain (forces several propagation iterations) + a pair
    pairs = spark.createDataFrame(
        [(2, 3), (3, 4), (4, 9), (9, 12), (5, 6)], ["id_a", "id_b"]
    )
    out = {r["doc_id"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert out == {2: 2, 3: 2, 4: 2, 9: 2, 12: 2, 5: 5, 6: 5}
    # force the distributed label-propagation path — must agree exactly
    big = {
        r["doc_id"]: r["cluster"]
        for r in connected_components(pairs, driver_edge_limit=0).collect()
    }
    assert big == out


def test_ivf_trained_topk_recall(spark):
    """IVF with a trained codebook must recover most exact top-k neighbors on
    clustered data (recall@5 vs cosine_topk), and never return a neighbor
    from outside the probed cells' candidate set semantics (output schema and
    ranking contract identical to the exact baseline)."""
    import numpy as np

    from lance_trino_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(11)
    # 8 well-separated clusters of 40 vectors each
    centers = rng.rand(8, 16) * 10
    vecs = np.concatenate(
        [c + rng.rand(40, 16) * 0.5 for c in centers]
    ).astype("float64")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        ["vec_id", "embedding"],
    ).cache()
    queries = df.filter(F.col("vec_id") % 40 == 0)  # one per cluster

    centroids = train_ivf_centroids(df, n_cells=8, iters=5, sample=320)
    exact = cosine_topk(df, queries, k=5).collect()
    approx = ivf_topk(df, queries, centroids, k=5, nprobe=2).collect()

    def topk(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    e, a = topk(exact), topk(approx)
    assert set(a) == set(e)  # every query answered
    hits = sum(len(e[q] & a[q]) for q in e)
    total = sum(len(e[q]) for q in e)
    assert hits / total >= 0.9, f"recall@5 too low: {hits}/{total}"


def test_quality_and_tokens(spark):
    from lance_trino_spark.operators.text import quality_score, token_count

    df = spark.createDataFrame([(1, "the cat sat on the mat.")], ["doc_id", "text"])
    row = quality_score(df).withColumn("n_tok", token_count("text")).first()
    assert row["n_tok"] == 6
    assert row["n_stopwords"] == 2  # 'the' twice ('to'/'a'/'of'/'and' absent)
    assert 0.0 <= row["quality_score"] <= 1.0


def test_language_id_markers(spark):
    from lance_trino_spark.operators.text import language_id

    df = spark.createDataFrame(
        [
            (1, "el la de que y el la"),
            (2, "the cat and the dog of a house"),
            (3, "xyzzy plugh"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert out[1] == "es"
    assert out[2] == "en"
    assert out[3] == "und"


def test_multimodal_roundtrip(spark):
    from lance_trino_spark.operators.multimodal import (
        attach_payloads,
        decode_images,
        synth_payload,
    )

    df = spark.createDataFrame([(5,), (6,)], ["doc_id"])
    out = {r["doc_id"]: r for r in decode_images(attach_payloads(df)).collect()}
    for d in (5, 6):
        assert out[d]["width"] == 16 + d % 32
        assert out[d]["channels"] == 1 + d % 3
        payload = synth_payload(d)
        n = out[d]["width"] * out[d]["height"] * out[d]["channels"]
        assert out[d]["mean_px"] == float(sum(payload[10:])) / n


def test_contamination_check_flags_overlap(spark):
    from lance_trino_spark.operators.text import contamination_check

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here none shared at all"),
            (3, "quick brown fox appears again jumps over things"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps high")], ["bench_id", "text"]
    )
    got = {
        (r["doc_id"], r["bench_id"]): r["n_shared"]
        for r in contamination_check(docs, bench, k=3, min_overlap=2).collect()
    }
    assert (1, 100) in got and got[(1, 100)] >= 2  # shares "the quick brown" etc.
    assert all(d != 2 for d, _ in got)  # unrelated doc never flagged


def test_stratified_sample_deterministic_and_bounded(spark):
    from lance_trino_spark.operators.sampling import stratified_sample

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("src"),
    )
    kept1 = stratified_sample(df, "src", {"a": 0.5, "b": 0.1}, "doc_id")
    kept2 = stratified_sample(df, "src", {"a": 0.5, "b": 0.1}, "doc_id")
    rows1 = sorted(r["doc_id"] for r in kept1.collect())
    rows2 = sorted(r["doc_id"] for r in kept2.collect())
    assert rows1 == rows2  # deterministic across runs
    by_src = {r["src"]: r["n"] for r in kept1.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert abs(by_src["a"] / 2000 - 0.5) < 0.06
    assert abs(by_src["b"] / 2000 - 0.1) < 0.06
    # different salt → different (but still deterministic) subset
    alt = sorted(
        r["doc_id"]
        for r in stratified_sample(df, "src", {"a": 0.5, "b": 0.1}, "doc_id", salt="x").collect()
    )
    assert alt != rows1


def test_cosine_topk_rejects_oversized_query_set(spark):
    import pytest as _pytest

    from lance_trino_spark.operators.similarity import cosine_topk

    df = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("double"), F.lit(1.0)).alias("embedding"),
    )
    with _pytest.raises(ValueError, match="max_broadcast_queries"):
        cosine_topk(df, df, k=3, max_broadcast_queries=10).collect()


def test_redact_pii_counts_and_text(spark):
    from lance_trino_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob@x.org or alice@y.co, call 415-555-1234, host 10.0.0.1"),
            (2, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_phone"] == 1 and out[1]["n_ipv4"] == 1
    assert out[1]["redacted"] == "mail <EMAIL> or <EMAIL>, call <PHONE>, host <IP>"
    assert out[2]["redacted"] == "nothing sensitive here"
    assert out[2]["n_email"] == 0


def test_chunk_documents_boundaries(spark):
    from lance_trino_spark.operators.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text), (2, "a b")], ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    # n=10, chunk=4, stride=3 -> ceil(6/3)+1 = 3 chunks: [0:4),[3:7),[6:10)
    assert [r["chunk_text"] for r in c1] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9",
    ]
    assert [r["chunk_n_tokens"] for r in c1] == [4, 4, 4]
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b"
    assert by_doc[2][0]["chunk_n_tokens"] == 2


def test_word_shingles_short_doc_yields_empty(spark):
    from lance_trino_spark.functions import tokens, word_shingles

    df = spark.createDataFrame([(1, "a b"), (2, "a b c d")], ["doc_id", "text"])
    out = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", word_shingles(tokens("text"), 3).alias("sh")
        ).collect()
    }
    assert out[1] == []  # shorter than k: no shingles (not [1,0]-slice junk)
    assert out[2] == ["a b c", "b c d"]


def test_resize_images_gather(spark):
    import numpy as np

    from lance_trino_spark.operators.multimodal import (
        attach_payloads,
        resize_images,
        synth_payload,
    )

    df = spark.createDataFrame([(3,)], ["doc_id"])
    row = resize_images(attach_payloads(df)).first()
    p = synth_payload(3)
    import struct as _s

    w, h, c = _s.unpack("<HHH", p[4:10])
    arr = np.frombuffer(p[10:], dtype=np.uint8).reshape(h, w, c)
    rr = (np.arange(8) * h) // 8
    cc = (np.arange(8) * w) // 8
    expect = arr[rr][:, cc, 0]
    assert bytes(row["resized"]) == expect.tobytes()
    assert row["mean_resized"] == float(expect.sum()) / 64


def test_audio_frame_energy_values(spark):
    from lance_trino_spark.operators.multimodal import (
        AUDIO_FRAME,
        audio_frame_energy,
        synth_waveform,
    )

    df = spark.createDataFrame([(7,)], ["doc_id"])
    rows = sorted(audio_frame_energy(df).collect(), key=lambda r: r["frame_idx"])
    wav = synth_waveform(7)
    assert len(rows) == len(wav) // AUDIO_FRAME
    for r in rows:
        fr = wav[r["frame_idx"] * AUDIO_FRAME : (r["frame_idx"] + 1) * AUDIO_FRAME]
        assert r["energy"] == sum(x * x for x in fr) / AUDIO_FRAME


def test_quantize_embeddings_roundtrip_error_bound(spark):
    from lance_trino_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 127.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    r1 = out[1]
    assert r1["scale"] == 1.0  # max|x| = 127 → scale 1
    assert r1["qvec"] == [1, 0, 0, 127]  # floor(-0.5+0.5)=0, floor(0.25+0.5)=0
    # reconstruction error bounded by scale/2 (+ floor asymmetry)
    assert r1["max_abs_err"] <= r1["scale"] / 2 + 1e-12
    r2 = out[2]
    assert r2["scale"] == 0.0 and r2["qvec"] == [0, 0, 0, 0]
    assert r2["max_abs_err"] == 0.0


def test_gopher_quality_filter_rules(spark):
    from lance_trino_spark.operators.text import gopher_quality_filter

    good = " ".join(["the quick brown fox and some words here"] * 8)  # 64 toks
    short = "too short"
    symbol_soup = " ".join(["### ... ###"] * 30)
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbol_soup)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in gopher_quality_filter(df).collect()}
    assert rows[1]["keep"] is True
    assert rows[2]["keep"] is False and rows[2]["rule_word_count"] is False
    assert rows[3]["rule_symbol_ratio"] is False


def test_fold_accents_fixed_table(spark):
    from lance_trino_spark.operators.text import fold_accents

    df = spark.createDataFrame([(1, "  Café   NAÏVE  jalapeño ")], ["id", "t"])
    out = df.select(fold_accents("t").alias("f")).collect()[0]["f"]
    # Uppercase accents are lowered first, then folded; whitespace collapses.
    assert out == "cafe naive jalapeno"


def test_bm25_ranks_matching_docs_first(spark):
    from lance_trino_spark.operators.text import bm25_scores

    df = spark.createDataFrame(
        [
            (1, "merge merge merge stream filler filler filler"),
            (2, "merge filler filler filler filler filler filler"),
            (3, "filler words only nothing else at all"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["score"] for r in bm25_scores(df, ("merge", "stream")).collect()}
    assert rows[1] > rows[2] > rows[3] == 0.0


def test_source_mix_weights_cap_and_drop(spark):
    from lance_trino_spark.operators.sampling import source_mix_weights

    df = spark.createDataFrame(
        [("a",)] * 98 + [("b",)] * 1 + [("c",)] * 1, ["src"]
    )
    rows = {
        r["src"]: r
        for r in source_mix_weights(df, "src", {"a": 0.5, "b": 0.5}).collect()
    }
    assert math.isclose(rows["a"]["weight"], 0.5 / 0.98)
    assert rows["b"]["weight"] == 10.0  # capped (target 0.5 / observed 0.01)
    assert rows["c"]["weight"] == 0.0  # absent from target mixture


def test_normalize_events_both_encodings(spark, tmp_path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lance_trino_spark.tables import _normalize_events

    base_us = 1_700_000_000_000_000
    for unit in ("ns", "us"):
        arr = pa.array(
            [base_us * 1000, (base_us + 1) * 1000] if unit == "ns" else [base_us, base_us + 1],
            type=pa.timestamp(unit),
        )
        path = str(tmp_path / f"ev_{unit}.parquet")
        pq.write_table(pa.table({"ts": arr}), path)
        out = _normalize_events(spark.read.parquet(path))
        got = sorted(r["ts_ns"] for r in out.select("ts_ns").collect())
        assert got == [base_us * 1000, (base_us + 1) * 1000], unit
        ts0 = out.orderBy("ts_ns").select("ts").collect()[0]["ts"]
        assert ts0 == dt.datetime(2023, 11, 14, 22, 13, 20)


def test_asof_join_semantics(spark):
    from lance_trino_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "k"), (2, 20, "k"), (3, 5, "k"), (4, 20, "j")],
        ["lid", "ts", "k_col"],
    )
    right = spark.createDataFrame(
        [(10, "k", 1.0), (15, "k", 2.0), (25, "k", 3.0), (19, "j", 9.0)],
        ["ts", "k_col", "val"],
    )
    out = {
        r["lid"]: r["val"]
        for r in asof_join(
            left, right, ["k_col"], "ts", "ts", ["val"]
        ).collect()
    }
    # inclusive: lid=1 at ts=10 sees the ts=10 right row
    assert out == {1: 1.0, 2: 2.0, 3: None, 4: 9.0}
    strict = {
        r["lid"]: r["val"]
        for r in asof_join(
            left, right, ["k_col"], "ts", "ts", ["val"], strict=True
        ).collect()
    }
    # strict: lid=1 at ts=10 must NOT see the ts=10 right row
    assert strict == {1: None, 2: 2.0, 3: None, 4: 9.0}


def test_asof_join_atomic_null_payload(spark):
    """True ASOF semantics: a MATCHED right row whose payload field is NULL
    must yield NULL (not fall back to an older non-null value), and multiple
    payload columns must all come from the SAME right row."""
    from lance_trino_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 30, "k")], ["lid", "ts", "k_col"])
    right = spark.createDataFrame(
        [(10, "k", 1.0, "old"), (20, "k", None, "new")],
        "ts long, k_col string, val double, tag string",
    )
    row = asof_join(left, right, ["k_col"], "ts", "ts", ["val", "tag"]).collect()[0]
    # latest right row (ts=20) matched: val stays NULL, tag is 'new' —
    # a per-column carry would have mixed (1.0, 'new') from two rows
    assert row["val"] is None and row["tag"] == "new"


def test_kmv_distinct_exact_and_estimate(spark):
    from lance_trino_spark.operators.sketches import kmv_distinct

    rows = [("small", f"v{i}") for i in range(10)]
    rows += [("big", f"u{i}") for i in range(500)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["g"]: r for r in kmv_distinct(df, "g", "v", k=64).collect()}
    # below k: exact
    assert out["small"]["n_kept"] == 10 and out["small"]["kmv_estimate"] == 10.0
    # at/above k: estimate within 30% of truth for k=64
    assert out["big"]["n_kept"] == 64
    assert abs(out["big"]["kmv_estimate"] - 500) / 500 < 0.3


def test_sequence_packing_bins(spark):
    from lance_trino_spark.operators.text import sequence_packing_plan

    docs = spark.createDataFrame(
        [(i, "w " * 60) for i in range(10)], ["doc_id", "text"]
    )
    plan = {
        r["doc_id"]: r
        for r in sequence_packing_plan(docs, token_budget=100).collect()
    }
    # 60-token docs: doc0 starts bin 0 offset 0, doc1 starts bin 0 offset 60,
    # doc2 starts bin 1 offset 20 (120 tokens before), ...
    assert (plan[0]["bin"], plan[0]["offset_in_bin"]) == (0, 0)
    assert (plan[1]["bin"], plan[1]["offset_in_bin"]) == (0, 60)
    assert (plan[2]["bin"], plan[2]["offset_in_bin"]) == (1, 20)
    assert plan[9]["tokens_before"] == 540


def test_range_join_interval_containment(spark):
    from lance_trino_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [(1, "k", 50), (2, "k", 150), (3, "k", 1500), (4, "j", 50)],
        ["lid", "kc", "pt"],
    )
    right = spark.createDataFrame(
        [("k", 0, 100, "w1"), ("k", 40, 60, "w2"), ("k", 1400, 2600, "w3")],
        ["kc", "s", "e", "tag"],
    )
    out = sorted(
        (r["lid"], r["tag"])
        for r in range_join(left, right, ["kc"], "pt", "s", "e", 100).collect()
    )
    # lid=1 in w1 and w2; lid=2 matches nothing (150 > both ends);
    # lid=3 in w3 (interval spans many buckets — must not duplicate);
    # lid=4 wrong key.
    assert out == [(1, "w1"), (1, "w2"), (3, "w3")]


def test_funnel_milestones_order_and_span(spark):
    from lance_trino_spark.operators.funnel import funnel_milestones

    rows = [
        # user 1: clean a->b->c
        (1, "a", 10), (1, "b", 20), (1, "c", 30),
        # user 2: b before a — b milestone must be the LATER b
        (2, "b", 5), (2, "a", 10), (2, "b", 25), (2, "c", 26),
        # user 3: never reaches c
        (3, "a", 10), (3, "b", 12),
        # user 4: completes but outside max_span
        (4, "a", 0), (4, "b", 1), (4, "c", 1000),
        # user 5: no step-0 event at all — excluded
        (5, "b", 1), (5, "c", 2),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts_us"])
    out = {
        r["user_id"]: r
        for r in funnel_milestones(
            df, ["a", "b", "c"], max_span=100
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["completed"] is True and out[1]["t_2"] == 30
    assert out[2]["t_1"] == 25 and out[2]["completed"] is True
    assert out[3]["t_2"] is None and out[3]["completed"] is False
    assert out[4]["completed"] is False  # span 1000 > 100


def test_quantized_topk_approximates_exact_inner_product(spark):
    import numpy as np

    from lance_trino_spark.operators.similarity import quantized_topk

    rng = np.random.RandomState(11)
    vecs = rng.rand(40, 16).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]], int(i % 4)) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = df.filter("vec_id < 4")
    got = quantized_topk(df, q, k=3).collect()
    assert {r["query_id"] for r in got} == {0, 1, 2, 3}
    x = vecs.astype(np.float64)
    for r in got:
        exact_ip = float(x[r["query_id"]] @ x[r["neighbor_id"]])
        # int8 scalar quantization: reconstruction error well under 1 %
        assert abs(r["approx_ip"] - exact_ip) / exact_ip < 0.01
        # and the top-1 neighbor matches the exact-IP argmax within the cell
        if r["rank"] == 1:
            cell = [j for j in range(40) if j % 4 == r["query_id"] % 4 and j != r["query_id"]]
            best = max(cell, key=lambda j: x[r["query_id"]] @ x[j])
            assert r["neighbor_id"] == best


def test_two_stage_topk_matches_exact_on_full_prefix(spark):
    """With prefix_dims == full dims and m >= corpus, the two-stage path IS
    the exact brute-force ranking — results must equal cosine_topk."""
    import numpy as np

    from lance_trino_spark.operators.similarity import cosine_topk, two_stage_topk

    rng = np.random.default_rng(11)
    x = rng.normal(size=(60, 8)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    q = emb.filter("vec_id < 5")
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(emb, q, k=3).collect()
    }
    staged = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in two_stage_topk(emb, q, k=3, m=60, prefix_dims=8).collect()
    }
    assert staged == exact

    # Narrow prefix + small shortlist still recovers most of the exact set
    # (recall sanity, not a bitwise claim).
    approx = two_stage_topk(emb, q, k=3, m=10, prefix_dims=4).collect()
    hits = sum(
        1 for r in approx if exact.get((r["query_id"], r["rank"])) == r["neighbor_id"]
    )
    assert hits >= 8  # of 15


def test_two_stage_topk_refuses_unbroadcastable_queries(spark):
    import pytest as _pytest

    from lance_trino_spark.operators.similarity import two_stage_topk

    emb = spark.range(30).selectExpr(
        "id AS vec_id", "array(cast(id as float), 1.0f) AS embedding"
    )
    with _pytest.raises(ValueError, match="max_broadcast_queries"):
        two_stage_topk(emb, emb, max_broadcast_queries=10)


def test_cross_source_duplicates_order_insensitive(spark):
    from lance_trino_spark.operators.dedup import cross_source_duplicate_groups

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "web"),
            (2, "gamma beta alpha", "books"),   # same multiset, shuffled
            (3, "alpha beta beta", "web"),      # different multiset
            (4, "alpha  beta   gamma", "news"),  # whitespace noise, same multiset
        ],
        "doc_id long, text string, source string",
    )
    groups = cross_source_duplicate_groups(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert (g["n_docs"], g["n_sources"], g["min_doc_id"], g["max_doc_id"]) == (
        3, 3, 1, 4,
    )


def test_corpus_histogram_and_vocab_stats(spark):
    from lance_trino_spark.operators.text import (
        corpus_token_histogram,
        vocab_stats_by_source,
    )

    docs = spark.createDataFrame(
        [(1, "a a b", "s1"), (2, "a b c", "s1"), (3, "c c c d", "s2")],
        "doc_id long, text string, source string",
    )
    hist = {r["token"]: (r["rank"], r["n"]) for r in
            corpus_token_histogram(docs, top_n=10).collect()}
    assert hist["c"] == (1, 4) and hist["a"] == (2, 3)
    assert hist["b"] == (3, 2) and hist["d"] == (4, 1)

    vocab = {r["source"]: r for r in vocab_stats_by_source(docs).collect()}
    assert vocab["s1"]["n_tokens"] == 6 and vocab["s1"]["n_types"] == 3
    assert vocab["s2"]["n_docs"] == 1 and vocab["s2"]["n_types"] == 2
    assert vocab["s2"]["type_token_ratio"] == 0.5


def test_hll_distinct_estimate_and_registers(spark):
    from pyspark.sql import functions as F

    from lance_trino_spark.operators.sketches import hll_distinct

    df = spark.createDataFrame(
        [("small", f"v{i}") for i in range(10)]
        + [("big", f"v{i}") for i in range(2000)]
        + [("big", f"v{i}") for i in range(2000)],  # duplicates don't count
        "g string, v string",
    )
    out = {r["g"]: r for r in hll_distinct(df, ["g"], "v").collect()}
    # m=256 registers -> ~6.5% standard error; 20% is a safe test bound
    assert abs(out["big"]["hll_estimate"] - 2000) / 2000 < 0.2
    assert out["small"]["empty_buckets"] >= 246
    # register math: checksum fully determined by (nonempty, ranks), and
    # merging two halves of the data must give the same registers as one
    # pass (MAX is associative)
    half1 = hll_distinct(
        df.filter(F.col("v") < "v5"), ["g"], "v"
    ).collect()
    whole = {(r["g"]): r["rank_checksum"] for r in
             hll_distinct(df, ["g"], "v").collect()}
    assert whole == {r["g"]: r["rank_checksum"]
                     for r in hll_distinct(df, ["g"], "v").collect()}
    assert half1  # smoke: subset sketch computes


def test_url_domain_stats(spark):
    from lance_trino_spark.operators.text import url_domain_stats

    docs = spark.createDataFrame(
        [
            (1, "see https://a.com/x and https://a.com/y plus http://b.io/z"),
            (2, "only https://a.com/q here"),
            (3, "no links at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["domain"]: r for r in url_domain_stats(docs).collect()}
    assert out["a.com"]["n_urls"] == 3 and out["a.com"]["n_docs"] == 2
    assert out["b.io"]["n_urls"] == 1
    assert out["a.com"]["sample_url"] == "https://a.com/q"
    assert "no" not in out


def test_hll_merge_equals_direct(spark):
    from pyspark.sql import functions as F

    from lance_trino_spark.operators.sketches import (
        hll_distinct,
        hll_merge,
        hll_registers,
    )

    df = spark.createDataFrame(
        [(i % 4, f"u{i % 700}", f"v{i}") for i in range(3000)],
        "g int, u string, shard string",
    ).withColumn("half", (F.col("u") < "u35").cast("int"))
    merged = {
        r["g"]: r["hll_estimate"]
        for r in hll_merge(
            hll_registers(df, ["g", "half"], "u"), ["g"]
        ).collect()
    }
    direct = {
        r["g"]: r["hll_estimate"]
        for r in hll_distinct(df, ["g"], "u").collect()
    }
    assert merged == direct


def test_extract_features_deterministic_and_distinct(spark):
    from lance_trino_spark.operators.multimodal import (
        attach_payloads,
        extract_features,
    )

    docs = spark.range(50).selectExpr("id AS doc_id")
    feats = {r["doc_id"]: tuple(r["feature"]) for r in
             extract_features(attach_payloads(docs)).collect()}
    assert len(feats) == 50
    assert all(len(v) == 18 for v in feats.values())  # 16 bins + 2 moments
    # injective over the corpus (self-match retrieval depends on it)
    assert len(set(feats.values())) == 50
    # deterministic across runs
    again = {r["doc_id"]: tuple(r["feature"]) for r in
             extract_features(attach_payloads(docs)).collect()}
    assert feats == again


def test_quantile_sketch_bounds_and_merge(spark):
    from pyspark.sql import functions as F

    from lance_trino_spark.operators.sketches import quantile_sketch

    df = spark.createDataFrame(
        [(i % 2, float(i)) for i in range(1, 1001)], "g int, v double"
    )
    out = {r["g"]: r for r in
           quantile_sketch(df, ["g"], "v", bucket_width_cents=1000).collect()}
    for g in (0, 1):
        # true medians ~500; bucket lower bound within one bucket (10.0)
        assert abs(out[g]["q50_cents"] / 100 - 500) <= 10
        assert abs(out[g]["q99_cents"] / 100 - 990) <= 15
        assert out[g]["n_rows"] == 500
    # exactness at the bucket grid: integer values on bucket boundaries
    exact = quantile_sketch(
        spark.createDataFrame([(1, 10.0), (1, 20.0), (1, 30.0)], "g int, v double"),
        ["g"], "v", bucket_width_cents=1000,
    ).collect()[0]
    assert exact["q50_cents"] == 2000  # median 20.00 -> its own bucket


def test_ngram_jaccard_canonicalization_matches_naive(spark):
    """The exact-content canonicalization inside ngram_jaccard_pairs
    (group by text fingerprint -> quadratic pass over representatives ->
    expand back) must reproduce the naive all-documents inverted-index
    pass EXACTLY — pairs, values, and the frequency cap's doc-level
    meaning — on a corpus with exact copies, near variants, a hot capped
    shingle, and a no-shingle short doc."""
    from pyspark.sql import functions as F

    from lance_trino_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_hashes,
    )

    base = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",
        "one two three four five six seven eight nine",
        "totally different words nothing shared here at all",
        "hot hot hot hot hot",  # its shingles go over the tiny cap
        "tiny doc",  # < k words: no shingles at all
    ]
    rows = []
    did = 0
    for t in base:
        for _copy in range(3):  # exact copies of everything
            rows.append((did, t))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = ngram_jaccard_pairs(df, threshold=0.3, max_doc_freq=4)

    # naive reference: the pre-canonicalization algorithm, verbatim
    sh = shingle_hashes(df)
    freq = sh.groupBy("h").agg(F.count("*").alias("df_"))
    rare = sh.join(freq.filter(F.col("df_") <= 4), "h")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = rare.select(F.col("doc_id").alias("id_a"), "h")
    b = rare.select(F.col("doc_id").alias("id_b"), F.col("h").alias("hb"))
    inter = (
        a.join(b, (F.col("h") == F.col("hb")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b").agg(F.count("*").alias("inter"))
    )
    naive = (
        inter
        .join(sizes.select(F.col("doc_id").alias("id_a"),
                           F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"),
                           F.col("sz").alias("sz_b")), "id_b")
        .withColumn("jaccard", F.col("inter").cast("double")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
                    .cast("double"))
        .filter(F.col("jaccard") >= 0.3)
        .select("id_a", "id_b", "jaccard")
    )
    got_set = {(r.id_a, r.id_b, r.jaccard) for r in got.collect()}
    naive_set = {(r.id_a, r.id_b, r.jaccard) for r in naive.collect()}
    assert got_set == naive_set
    assert len(got_set) > 3  # the scenario actually produces pairs
    paired = {i for p in got_set for i in p[:2]}
    # exact copies of the hot doc pair at jaccard 1.0 (its single
    # distinct shingle has doc-level df 3 <= cap)...
    assert (12, 13, 1.0) in got_set
    # ...but the 'tiny doc' copies (< k words -> no shingles) never pair
    assert not paired & {15, 16, 17}


def test_capped_sample_per_group_exact_and_bounded(spark):
    """capped_sample_per_group's thresholded plan must EXACTLY equal the
    naive global-window answer (including the shortfall fallback with a
    tiny safety factor), honor keep-all and drop-group caps, and stay
    deterministic across partitionings."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lance_trino_spark.operators.sampling import capped_sample_per_group

    df = spark.range(5000).selectExpr(
        "id AS doc_id",
        "concat('g', CAST(pmod(id, 7) AS STRING)) AS source",
    )
    caps = {"g0": 17, "g1": 5000, "g2": 0, "g3": 1}

    def naive(caps, default_cap):
        h = F.conv(F.substring(F.md5(
            F.concat(F.lit("cap"), F.col("doc_id").cast("string"))),
            1, 8), 16, 10).cast("bigint")
        w = Window.partitionBy("source").orderBy(h, "doc_id")
        cap = F.coalesce(F.create_map(*[
            x for g, c in sorted(caps.items())
            for x in (F.lit(g), F.lit(c))])[F.col("source")],
            F.lit(default_cap))
        return (df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= cap).drop("__rn"))

    want = {tuple(r) for r in naive(caps, 9).collect()}
    got = {tuple(r) for r in capped_sample_per_group(
        df, "source", caps, id_col="doc_id", default_cap=9).collect()}
    assert got == want
    # tiny safety factor forces the shortfall fallback; still exact
    got_tight = {tuple(r) for r in capped_sample_per_group(
        df, "source", caps, id_col="doc_id", default_cap=9,
        safety=1.0000001).collect()}
    assert got_tight == want
    # partitioning-independence
    got_repart = {tuple(r) for r in capped_sample_per_group(
        df.repartition(13), "source", caps, id_col="doc_id",
        default_cap=9).collect()}
    assert got_repart == want
    # per-group counts honor the caps (tuples are (doc_id, source))
    from collections import Counter
    n = Counter(src for _, src in got)
    assert n["g0"] == 17 and n["g3"] == 1 and "g2" not in n
    assert n["g1"] == 5000 // 7 + 1  # keep-all cap: whole group survives


def test_exact_substring_hash_parity(spark):
    """The 100 TB key (xxhash64 of the window) and the oracle key (the
    raw window string) produce identical per-doc duplicated-span mass —
    the hash only compacts the shuffle, never the answer."""
    from lance_trino_spark.operators.dedup import exact_substring_stats

    rows = [
        (0, "A" * 80 + "unique-tail-zero"),
        (1, "prefix-one " + "A" * 80),          # shares the 80-A run
        (2, "totally different content " * 6),
        (3, "totally different content " * 6),  # exact twin of 2
        (4, "short"),                            # below the window
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["n_dup_windows"]
         for r in exact_substring_stats(docs, window=64,
                                        hash_windows=True).collect()}
    b = {r["doc_id"]: r["n_dup_windows"]
         for r in exact_substring_stats(docs, window=64,
                                        hash_windows=False).collect()}
    assert a == b
    assert set(a) == {0, 1, 2, 3}  # 4 has no 64-char window
    assert a[2] == a[3]  # exact twins share every window
    # the 80-A run's 17 stride-1 windows are all the SAME string — the
    # per-doc distinct() collapses them to one shared window
    assert a[0] == a[1] == 1
