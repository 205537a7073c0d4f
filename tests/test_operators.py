"""Unit tests for the custom operators: as-of join, range join, dedup
families (recall + exactness), similarity search, text analysis,
multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from openetl_spark import catalog
from openetl_spark.operators import dedup as D
from openetl_spark.operators import joins as J
from openetl_spark.operators import multimodal as M
from openetl_spark.operators import similarity as S
from openetl_spark.operators import text as X


# ------------------------------------------------------------- asof join

def test_asof_join_backward_matches_manual(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, base + dt.timedelta(hours=5), "L1"), (1, base + dt.timedelta(hours=1), "L2"),
         (2, base + dt.timedelta(hours=3), "L3")],
        "k long, lts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, base + dt.timedelta(hours=0), 10.0), (1, base + dt.timedelta(hours=4), 20.0),
         (1, base + dt.timedelta(hours=6), 30.0), (3, base, 99.0)],
        "k long, rts timestamp, v double",
    )
    out = {
        r["tag"]: (r["v_asof"], r["rts_asof"])
        for r in J.asof_join(left, right, on="k", left_ts="lts", right_ts="rts", value_cols=["v"]).collect()
    }
    assert out["L1"][0] == 20.0  # nearest prior at hour 4
    assert out["L2"][0] == 10.0  # nearest prior at hour 0
    assert out["L3"][0] is None  # key 2 has no right rows


def test_asof_join_tie_matches(spark):
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 12)
    left = spark.createDataFrame([(1, t, "L")], "k long, lts timestamp, tag string")
    right = spark.createDataFrame([(1, t, 5.0)], "k long, rts timestamp, v double")
    r = J.asof_join(left, right, on="k", left_ts="lts", right_ts="rts", value_cols=["v"]).collect()[0]
    assert r["v_asof"] == 5.0  # equal timestamps match (<=)


def test_asof_join_forward(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, base + dt.timedelta(hours=2), "L")], "k long, lts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, base + dt.timedelta(hours=1), 1.0), (1, base + dt.timedelta(hours=3), 3.0)],
        "k long, rts timestamp, v double",
    )
    r = J.asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                    value_cols=["v"], direction="forward").collect()[0]
    assert r["v_asof"] == 3.0


# ------------------------------------------------------------ range join

def test_range_join_bucketed_equals_plain(spark, sf_dir):
    e = catalog.load(spark, sf_dir, "events").limit(500)
    a = e.select(F.col("user_id"), F.col("ts").alias("a_ts"), F.col("event_id").alias("a_id"))
    b = e.select(
        F.col("user_id").alias("user_id_r"),
        F.col("ts").alias("b_ts"),
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("b_lo"),
        F.col("event_id").alias("b_id"),
    )
    plain = J.range_join(a, b, on=None, left_point="a_ts", right_lo="b_lo", right_hi="b_ts")
    bucketed = J.range_join(a, b, on=None, left_point="a_ts", right_lo="b_lo", right_hi="b_ts", bucket_width=3600)
    key = lambda df: {(r["a_id"], r["b_id"]) for r in df.filter(F.col("user_id") == F.col("user_id_r")).collect()}
    assert key(plain) == key(bucketed)
    assert len(key(plain)) > 0


# ----------------------------------------------------------------- dedup

def test_dedup_exact_keep_min(spark):
    df = spark.createDataFrame(
        [(1, "x"), (5, "x"), (3, "x"), (2, "y")], "id long, v string"
    )
    out = D.dedup_exact_keep_min(df, ["v"], "id")
    assert {(r["id"], r["v"]) for r in out.collect()} == {(1, "x"), (2, "y")}


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b c d e f")], "id long, text string")
    rows = {r["id"]: r["shingles"] for r in D.with_shingles(df, "text", n=5).collect()}
    assert rows[1] == ["a b"]  # shorter than n → single shingle of all words
    assert rows[2] == ["a b c d e", "b c d e f"]


def test_jaccard_df_cap_invariant_on_testdata(spark, sf_dir):
    """VERDICT r01 #2: the df-capped mining path must not change results
    at the query threshold on testdata (max shingle df there is 4, so a
    cap of 50 provably drops nothing; this pins the refactor)."""
    docs = catalog.load(spark, sf_dir, "documents")
    sh = D.with_shingles(docs, "text", n=5)
    uncapped = {
        (r["a"], r["b"], r["jaccard"])
        for r in D.jaccard_similarity_pairs(sh, "doc_id", threshold=0.2).collect()
    }
    capped = {
        (r["a"], r["b"], r["jaccard"])
        for r in D.jaccard_similarity_pairs(sh, "doc_id", threshold=0.2, max_shingle_df=50).collect()
    }
    assert capped == uncapped and len(uncapped) > 0


def test_jaccard_df_cap_bounds_join_and_keeps_exact_values(spark):
    """A boilerplate shingle shared by EVERY doc must be excluded from
    pair mining (bounding the self-join) while the returned jaccard
    still counts it — values stay exact, recall comes from rare
    shingles."""
    # 20 docs all share shingle "BP"; docs 0/1 additionally share r1,r2
    rows = []
    for i in range(20):
        own = {f"u{i}a", f"u{i}b"}
        shared = {"r1", "r2"} if i < 2 else set()
        rows.append((i, ["BP"] + sorted(own | shared)))
    df = spark.createDataFrame(rows, "doc_id long, shingles array<string>")

    # only (0,1) shares rare shingles; its exact jaccard INCLUDES the
    # hot shingle: |{BP,r1,r2}| / |{BP,r1,r2,u0a,u0b,u1a,u1b}| = 3/7;
    # every other pair shares only BP (jaccard 1/5 — below threshold)
    out = D.jaccard_similarity_pairs(
        df, "doc_id", shingle_col="shingles", threshold=0.4, max_shingle_df=5
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"]) == (0, 1)
    assert abs(r["jaccard"] - 3 / 7) < 1e-6  # exact, hot shingle counted

    # without the cap, the all-docs boilerplate shingle mines every pair:
    # mining-join output would be C(20,2)=190 candidate pairs; with the
    # cap the mining join sees zero BP rows, so candidates come only
    # from rare shingles (exactly one pair)
    uncapped_pairs = (
        D.jaccard_similarity_pairs(df, "doc_id", shingle_col="shingles", threshold=0.0)
        .count()
    )
    assert uncapped_pairs == 190  # quadratic blowup the cap avoids


def test_minhash_recall_vs_exact(spark, sf_dir):
    docs = catalog.load(spark, sf_dir, "documents")
    sh = D.with_shingles(docs, "text", n=5)
    exact = {
        (r["a"], r["b"])
        for r in D.jaccard_similarity_pairs(sh, "doc_id", threshold=0.5).collect()
    }
    approx = {
        (r["a"], r["b"])
        for r in D.minhash_near_duplicates(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert approx == exact  # b=64,r=2 → recall ~1 at jaccard ≥ 0.5


def test_simhash_near_dups_contain_high_jaccard(spark, sf_dir):
    """SimHash is a coarse filter on small-shingle-set docs (each bit's
    sign margin is ~√n_shingles, so a few shingle edits flip several
    bits). Assert what the operator guarantees: no pair beyond the
    hamming budget is emitted, recall grows with the budget, and a
    generous budget captures most jaccard-≥0.9 pairs."""
    docs = catalog.load(spark, sf_dir, "documents")
    sh = D.with_shingles(docs, "text", n=5)
    high = {
        (r["a"], r["b"])
        for r in D.jaccard_similarity_pairs(sh, "doc_id", threshold=0.9).collect()
    }
    sim = D.with_simhash(sh, "doc_id")
    c3 = {(r["a"], r["b"]): r["hamming"] for r in D.simhash_candidates(sim, "doc_id", max_hamming=3).collect()}
    c7 = {(r["a"], r["b"]): r["hamming"] for r in D.simhash_candidates(sim, "doc_id", max_hamming=7).collect()}
    assert all(h <= 3 for h in c3.values())
    assert all(h <= 7 for h in c7.values())
    assert set(c3) <= set(c7)
    if high:
        recall7 = len(high & set(c7)) / len(high)
        assert recall7 >= 0.7, f"hamming≤7 recall {recall7}"


def test_simhash_portable_matches_python_reference(spark):
    """r06: the portable md5-based simhash (the oracle-renderable
    variant behind catalog simhash_dedup) matches a pure-Python
    recomputation bit-for-bit — the determinism pin that justifies
    re-deriving fingerprints in DuckDB."""
    import hashlib

    def py_simhash(shingles):
        votes = [0] * 64
        for s in shingles:
            h = hashlib.md5(s.encode()).hexdigest()
            v = (int(h[0:8], 16) << 32) | int(h[8:16], 16)
            for i in range(64):
                votes[i] += 1 if (v >> i) & 1 else -1
        f = 0
        for i in range(64):
            if votes[i] > 0:
                f |= 1 << i
        # interpret as signed 64-bit (Spark long)
        return f - (1 << 64) if f >= (1 << 63) else f

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "pack my box with five dozen liquor jugs right now"),
         (3, "sphinx of black quartz judge my vow said the king")],
        "doc_id long, text string",
    )
    sh = D.with_shingles(df, "text", n=3)
    got = {r["doc_id"]: r["simhash"]
           for r in D.with_simhash(sh, "doc_id", portable=True).collect()}
    want = {r["doc_id"]: py_simhash(r["shingles"]) for r in sh.collect()}
    assert got == want


def test_simhash_identical_docs_hamming_zero(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    sh = D.with_simhash(D.with_shingles(df, "text", n=3), "doc_id")
    pairs = D.simhash_candidates(sh, "doc_id", max_hamming=0).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 0


# ------------------------------------------------------------ similarity

def test_brute_force_knn_self_similarity(spark, sf_dir):
    e = catalog.load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 3).select("embedding").first()[0]
    top = S.brute_force_knn(e, q, k=5).collect()
    assert top[0]["vec_id"] == 3 and top[0]["cosine_sim"] == 1.0


def test_lsh_recall_vs_brute_force(spark):
    """Recall measured on synthetic clustered vectors (the testdata
    embeddings top out at cosine ~0.5 where hyperplane LSH has no
    signal — a 0.8-threshold sweep there is vacuously empty)."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(5, 64) * 3
    vecs = []
    for i in range(200):
        c = centers[i % 5]
        vecs.append((i, [float(x) for x in c + rng.randn(64) * 0.35]))
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    exact = {(r["a"], r["b"]) for r in S.brute_force_similarity_join(e, threshold=0.9).collect()}
    approx = {
        (r["a"], r["b"])
        for r in S.lsh_similarity_join(e, threshold=0.9, n_planes=8, n_tables=8).collect()
    }
    assert approx <= exact  # exact verification: no false positives
    assert len(exact) > 50  # the clusters really produce high-sim pairs
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall}"


def test_blocked_similarity_join_equals_brute_force(spark, sf_dir):
    """r03: the blocked-matmul all-pairs join is EXACTLY the naive n²
    fold join — same pairs, same rounded values — across block counts
    (including n_blocks > distinct hash residues present)."""
    e = catalog.load(spark, sf_dir, "embeddings")
    bf = {(r.a, r.b, r.cosine_sim)
          for r in S.brute_force_similarity_join(e, threshold=0.35).collect()}
    for nb in (1, 3, 8):
        bl = {(r.a, r.b, r.cosine_sim)
              for r in S.blocked_similarity_join(e, threshold=0.35, n_blocks=nb).collect()}
        assert bl == bf, f"n_blocks={nb}: {len(bl)} vs {len(bf)}"
    assert len(bf) > 0


def test_lsh_recall_on_testdata(spark, sf_dir):
    """VERDICT r02 #2: the catalog's low-threshold configuration on the
    REAL embeddings table (not synthetic clusters) — non-vacuous, a
    strict subset of exact pairs, recall ≥ 0.9."""
    e = catalog.load(spark, sf_dir, "embeddings")
    exact = {(r["a"], r["b"]) for r in S.brute_force_similarity_join(e, threshold=0.35).collect()}
    approx = {
        (r["a"], r["b"])
        for r in S.lsh_similarity_join(e, threshold=0.35, n_planes=3, n_tables=12).collect()
    }
    assert len(approx) > 0 and approx <= exact
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall} on {len(exact)} exact pairs"


# ----------------------------------------------------------------- text

def test_token_count_and_stats(spark):
    df = spark.createDataFrame([(1, "  hello   world  "), (2, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in X.with_text_stats(df, "text").collect()}
    assert rows[1]["n_tokens"] == 2
    assert rows[2]["n_tokens"] == 0
    assert rows[1]["avg_token_len"] == 5.0


def test_bpe_ish_tokens_split_punct(spark):
    df = spark.createDataFrame([("don't stop, world!",)], "text string")
    toks = df.select(X.bpe_ish_tokens(F.col("text")).alias("t")).collect()[0]["t"]
    assert toks == ["don", "'", "t", "stop", ",", "world", "!"]


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a"), (4, "  a  b   c ")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in X.with_fingerprint(df, "text").collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
    # whitespace-insensitive (token-sequence domain — what the catalog
    # equality-class oracle canonicalizes on)
    assert fps[1] == fps[4]


def test_detect_language_stopword_evidence(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog in the house"),
         (2, "el perro y la casa de los gatos"),
         (3, "qwerty zxcvb")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["lang_pred"] for r in X.detect_language(df, "text").collect()}
    assert rows[1] == "en" and rows[2] == "es" and rows[3] == "und"


# ------------------------------------------------------------ multimodal

def test_media_type_sniffing(spark):
    rows = [
        ("a.png", bytearray(b"\x89PNG\r\n\x1a\nrest")),
        ("b.jpg", bytearray(b"\xff\xd8\xff\xe0data")),
        ("c.bin", bytearray(b"\x00\x01\x02")),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    got = {r["path"]: r["media_type"] for r in M.with_media_type(df).collect()}
    assert got == {"a.png": "png", "b.jpg": "jpeg", "c.bin": "unknown"}


def test_image_header_decode_true_dimensions(spark):
    """VERDICT r01 #4: real stdlib header decode — parsed width/height
    must equal the dimensions the fixtures were generated with."""
    from tests.media_fixtures import make_gif, make_jpeg, make_png

    rows = [
        ("a.png", bytearray(make_png(320, 200))),
        ("b.jpg", bytearray(make_jpeg(640, 480))),
        ("c.gif", bytearray(make_gif(101, 67))),
        ("d.bin", bytearray(b"\x00\x01\x02garbage")),
        ("e.png", bytearray(b"\x89PNG\r\n\x1a\n")),  # truncated: fmt, no dims
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = {r["path"]: r for r in M.extract_image_features(df).collect()}
    assert (out["a.png"]["format"], out["a.png"]["width"], out["a.png"]["height"]) == ("png", 320, 200)
    assert (out["b.jpg"]["format"], out["b.jpg"]["width"], out["b.jpg"]["height"]) == ("jpeg", 640, 480)
    assert (out["c.gif"]["format"], out["c.gif"]["width"], out["c.gif"]["height"]) == ("gif", 101, 67)
    assert out["d.bin"]["format"] is None and out["d.bin"]["width"] is None
    assert out["e.png"]["format"] == "png" and out["e.png"]["width"] is None
    assert out["a.png"]["n_bytes"] == len(make_png(320, 200))
    # PNG pixel decode is REAL (stdlib, r04): all-black fixture → 0.0
    assert out["a.png"]["mean_luma"] == 0.0
    # JPEG pixel decode remains the PIL-guarded stub (no scan data in
    # the fixture anyway)
    try:
        import PIL  # noqa: F401
    except ImportError:
        assert out["b.jpg"]["mean_luma"] is None


def test_png_pixel_decode_all_filters():
    """r04: the stdlib PNG decoder reverses every scanline filter type
    (spec §9) — encode known pixels under each filter, decode, and
    compare both raw pixels and the ITU-R 601-2 mean luminance."""
    from tests.media_fixtures import make_png

    px = [
        [(255, 0, 0), (0, 255, 0), (10, 20, 30)],
        [(0, 0, 255), (200, 100, 50), (255, 255, 255)],
    ]
    flat = [v for row in px for p in row for v in p]
    lumas = [
        (r * 299 + g * 587 + b * 114) // 1000 for row in px for (r, g, b) in row
    ]
    expect_luma = round(sum(lumas) / (255.0 * len(lumas)), 6)
    for ftype in range(5):
        data = make_png(3, 2, pixels=px, filter_type=ftype)
        decoded = M.decode_png_pixels(data)
        assert decoded is not None, f"filter {ftype}"
        w, h, ch, raw = decoded
        assert (w, h, ch) == (3, 2, 3)
        assert list(raw) == flat, f"filter {ftype} pixels diverge"
        assert M._mean_luma(data) == expect_luma
    # out-of-envelope shapes decline instead of mis-decoding
    assert M.decode_png_pixels(b"\x89PNG\r\n\x1a\n") is None
    assert M.decode_png_pixels(b"not a png") is None


def test_wav_header_decode_true_metadata(spark):
    from tests.media_fixtures import make_wav

    blob = make_wav(8000, 0.5)
    df = spark.createDataFrame(
        [("x.wav", bytearray(blob)), ("y.bin", bytearray(b"nope"))],
        "path string, content binary",
    )
    out = {r["path"]: r for r in M.extract_audio_features(df).collect()}
    x = out["x.wav"]
    assert (x["sample_rate"], x["channels"], x["bits_per_sample"]) == (8000, 1, 16)
    assert abs(x["duration_s"] - 0.5) < 1e-6
    assert out["y.bin"]["sample_rate"] is None


def test_frame_sampling_fan_out(spark):
    blob = bytes(range(256)) * 200  # 51200 bytes → 13 frames (last partial)
    df = spark.createDataFrame([("v.bin", bytearray(blob))], "path string, content binary")
    frames = M.sample_frames(df, frame_size=4096, stride=4).collect()
    # frames 0,4,8,12 sampled; 12 is the trailing partial frame
    assert [f["frame_idx"] for f in frames] == [0, 4, 8, 12]
    assert [len(f["frame_bytes"]) for f in frames] == [4096, 4096, 4096, 2048]


def test_ivf_knn_recall_vs_brute_force(spark):
    """IVF with n_probe=4/16 lists on clustered vectors must recover
    ~all of the brute-force top-10 (the query lands in a tight cluster,
    so its true neighbors share the probed lists)."""
    import numpy as np

    rng = np.random.RandomState(11)
    centers = rng.randn(8, 64) * 3
    vecs = [
        (i, [float(x) for x in centers[i % 8] + rng.randn(64) * 0.3])
        for i in range(400)
    ]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    cents = S.train_ivf_centroids(e, n_lists=16, seed=42)
    assert cents.shape == (16, 64)
    assigned = S.with_ivf_assignment(e, cents)
    # every vector gets a valid list id
    lists = assigned.select("ivf_list").distinct().collect()
    assert all(0 <= r["ivf_list"] < 16 for r in lists)
    q = vecs[5][1]
    exact = [r["vec_id"] for r in S.brute_force_knn(e, q, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in S.ivf_knn(assigned, cents, q, k=10, n_probe=4).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.9, f"IVF recall {recall}"


def test_udtf_shingles_lateral(spark, sf_dir):
    from openetl_spark.operators.udtf_ops import register_udtfs

    register_udtfs(spark)
    catalog.load(spark, sf_dir, "documents").limit(5).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT doc_id, s.pos, s.shingle FROM udtf_docs, LATERAL shingle_udtf(text, 3) s"
    ).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["shingle"]))
    # positions are consecutive from 0 and every shingle has 3 words
    for doc, pairs in by_doc.items():
        pairs.sort()
        assert [p for p, _ in pairs] == list(range(len(pairs)))
        assert all(len(sh.split()) == 3 for _, sh in pairs if len(pairs) > 1)


def test_udtf_expand_json(spark):
    from openetl_spark.operators.udtf_ops import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, '{"a": 1, "b": null}'), (2, "not json"), (3, None)], "id long, js string"
    ).createOrReplaceTempView("udtf_js")
    rows = spark.sql(
        "SELECT id, s.key, s.value FROM udtf_js, LATERAL expand_json_udtf(js) s"
    ).collect()
    got = {(r["id"], r["key"]): r["value"] for r in rows}
    assert got == {(1, "a"): "1", (1, "b"): None}  # bad/missing json -> no rows


def test_connected_components_shapes(spark):
    """Chains, triangles, disjoint pairs: every node labeled with the
    min id of its component; nodes without edges are absent."""
    from openetl_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        # chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), pair 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a long, b long",
    )
    got = {r["node"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_and_reverse_ids(spark):
    """Worst-case propagation direction: ids DESCEND along the chain, so
    the min label must travel the full diameter."""
    from openetl_spark.operators.dedup import connected_components

    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n, 0, -1)], "a long, b long"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert set(got.values()) == {1} and len(got) == n + 1


def test_bigram_repetition_stats_known_values(spark):
    """'a b a b a b' → bigrams [ab, ba, ab, ba, ab]: n=5, 2 distinct
    (ratio 0.4), top 'a b' ×3 (frac 0.6). Single-token and empty docs
    are omitted (no bigrams)."""
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "w x y z"), (3, "solo"), (4, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["distinct_ratio"], r["top_frac"])
           for r in X.bigram_repetition_stats(df).collect()}
    assert got == {1: (5, 0.4, 0.6), 2: (3, 1.0, round(1 / 3, 4))}


def test_wav_sample_decode_features(spark):
    """r04: REAL stdlib WAV sample decode — a sine at amplitude A has
    rms ≈ A/√2 and peak ≈ A; the silent fixture is all-silence."""
    from tests.media_fixtures import make_wav

    rows = [
        ("tone.wav", bytearray(make_wav(8000, 0.5, tone_hz=440, amplitude=0.5))),
        ("quiet.wav", bytearray(make_wav(8000, 0.25))),
        ("junk.bin", bytearray(b"RIFFgarbage")),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = {r["path"]: r for r in M.extract_audio_features(df).collect()}
    tone = out["tone.wav"]
    assert abs(tone["rms"] - 0.5 / 2 ** 0.5) < 0.01
    assert abs(tone["peak"] - 0.5) < 0.01
    assert tone["silence_ratio"] < 0.05
    quiet = out["quiet.wav"]
    assert quiet["rms"] == 0.0 and quiet["peak"] == 0.0 and quiet["silence_ratio"] == 1.0
    assert out["junk.bin"]["rms"] is None


def test_pandas_normalize_vectorized_equals_grouped_map(spark, sf_dir):
    """C25: the catalog's partition-vectorized mapInPandas znorm must
    equal a per-group applyInPandas reference — the grouped-map API
    stays demonstrated while the catalog path avoids its per-group
    call overhead."""
    import pandas as pd

    fast = {
        (r["event_id"]): r["znorm"]
        for r in catalog.QUERIES["pandas_normalize"](spark, sf_dir).collect()
    }

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std()
        mean = pdf["value"].mean()
        if std and std > 0:
            z = ((pdf["value"] - mean) / std).round(4)
        else:
            z = pd.Series([None] * len(pdf), dtype="float64")
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "znorm": z}
        )

    ref_df = (
        catalog.load(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(norm, schema="event_id bigint, user_id bigint, znorm double")
    )
    ref = {r["event_id"]: r["znorm"] for r in ref_df.collect()}
    assert fast == ref


# ------------------------------------------------------------------ PQ

def test_pq_codes_shape_and_range(spark, sf_dir):
    e = catalog.load(spark, sf_dir, "embeddings")
    books = S.train_pq_codebooks(e, m=4, n_codes=16, seed=42)
    assert books.shape == (4, 16, 16)
    rows = S.with_pq_codes(e, books).select("pq_codes").take(50)
    for r in rows:
        assert len(r["pq_codes"]) == 4
        assert all(0 <= c < 16 for c in r["pq_codes"])


def test_pq_adc_recall_vs_brute_force(spark):
    """ADC recall on clustered vectors (same setup as the LSH test —
    the near-uniform testdata embeddings have no neighbor structure to
    recover): the query's own tight cluster must dominate the PQ
    top-k despite the 4-byte compression."""
    import numpy as np

    rng = np.random.RandomState(11)
    centers = rng.randn(5, 64) * 3
    vecs = []
    for i in range(250):
        c = centers[i % 5]
        vecs.append((i, [float(x) for x in c + rng.randn(64) * 0.3]))
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    books = S.train_pq_codebooks(e, m=4, n_codes=16, seed=1)
    corpus = S.with_pq_codes(e.filter(F.col("vec_id") != 0), books)
    qdf = e.filter(F.col("vec_id") == 0)
    got = S.pq_adc_knn(corpus, qdf, books, k=10).collect()
    assert len(got) == 10
    # cluster of vec 0 is i % 5 == 0 — the ADC shortlist must be
    # dominated by same-cluster members
    same = sum(1 for r in got if r["vec_id"] % 5 == 0)
    assert same >= 8, [r["vec_id"] for r in got]
    # distances are non-negative and non-decreasing
    ds = [r["adc_dist"] for r in got]
    assert ds == sorted(ds) and ds[0] >= 0.0


# ----------------------------------------------------------- timeseries

def test_reaggregate_equals_rescan(spark, sf_dir):
    """The continuous-aggregate contract: hour/day levels derived from
    15-min partial cells equal a direct aggregation of the raw events
    at that resolution (counts/min/max exactly, sums to fp noise)."""
    from openetl_spark.operators import timeseries as TS

    e = catalog.load(spark, sf_dir, "events")
    fine = TS.partial_time_aggregate(e, "15 minutes", keys=("event_type",))
    for unit, width in (("hour", "1 hour"), ("day", "1 day")):
        derived = {
            (r["bucket_start"], r["event_type"]): r
            for r in TS.reaggregate(fine, unit, keys=("event_type",)).collect()
        }
        direct = {
            (r["bucket_start"], r["event_type"]): r
            for r in TS.partial_time_aggregate(
                e, width, keys=("event_type",)
            ).collect()
        }
        assert derived.keys() == direct.keys()
        for k, d in derived.items():
            g = direct[k]
            assert d["n_events"] == g["n_events"]
            assert d["min_value"] == g["min_value"]
            assert d["max_value"] == g["max_value"]
            assert abs(d["sum_value"] - g["sum_value"]) < 1e-6


def test_multi_resolution_labels_and_consistency(spark, sf_dir):
    from openetl_spark.operators import timeseries as TS

    e = catalog.load(spark, sf_dir, "events")
    out = TS.multi_resolution(e, keys=("event_type",)).collect()
    by_res = {}
    for r in out:
        by_res.setdefault(r["resolution"], []).append(r)
    assert set(by_res) == {"15m", "1h", "1d"}
    # every level carries the same event total
    totals = {res: sum(r["n_events"] for r in rows) for res, rows in by_res.items()}
    assert len(set(totals.values())) == 1, totals
    # resolutions strictly coarsen
    assert len(by_res["15m"]) >= len(by_res["1h"]) >= len(by_res["1d"])


# ----------------------------------------------------------------- BM25

def test_bm25_rare_term_dominates_and_zero_scores_drop(spark):
    rows = [(i, "common common common filler filler") for i in range(60)]
    rows.append((100, "common rare filler"))
    rows.append((200, "nothing matches here"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = X.bm25_topk(docs, ["common", "rare"], k=100).collect()
    # the sole rare-term doc outranks every common-only doc
    assert got[0]["doc_id"] == 100
    # doc 200 matches no term → filtered, not scored 0
    assert all(r["doc_id"] != 200 for r in got)
    assert all(r["bm25"] > 0 for r in got)


def test_bm25_length_normalization(spark):
    """With equal tf, BM25 (b>0) must prefer the shorter document."""
    rows = [
        (1, "term " + "pad " * 5),
        (2, "term " + "pad " * 50),
        *[(10 + i, "pad filler other") for i in range(20)],
    ]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["bm25"] for r in X.bm25_topk(docs, ["term"], k=10).collect()}
    assert got[1] > got[2]


def test_pq_rerank_converges_to_brute_force(spark, sf_dir):
    """Two-stage PQ: with a full-corpus shortlist the exact re-rank
    must equal brute-force top-k; with a small shortlist it must beat
    plain ADC at recovering the exact neighbors."""
    e = catalog.load(spark, sf_dir, "embeddings")
    books = S.train_pq_codebooks(e, m=4, n_codes=16, seed=42)
    corpus = S.with_pq_codes(e.filter(F.col("vec_id") != 0), books)
    qdf = e.filter(F.col("vec_id") == 0)
    q = qdf.select("embedding").first()[0]

    exact = [r["vec_id"] for r in
             S.brute_force_knn(e.filter(F.col("vec_id") != 0), q, k=10).collect()]
    full = [r["vec_id"] for r in
            S.pq_rerank_knn(corpus, qdf, books, k=10, shortlist=10**6).collect()]
    assert full == exact

    small = {r["vec_id"] for r in
             S.pq_rerank_knn(corpus, qdf, books, k=10, shortlist=100).collect()}
    adc = {r["vec_id"] for r in S.pq_adc_knn(corpus, qdf, books, k=10).collect()}
    assert len(small & set(exact)) >= len(adc & set(exact))


def test_anomalous_buckets_flags_injected_spike(spark):
    """A synthetic spike must be the flagged bucket; a flat series
    yields no flags (std > 0 guard)."""
    import datetime as dt

    from openetl_spark.operators import timeseries as TS

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(200):
        rows.append((base + dt.timedelta(minutes=15 * i), "a", 10.0))
    rows.append((base + dt.timedelta(minutes=15 * 50, seconds=30), "a", 5000.0))
    rows += [(base + dt.timedelta(minutes=15 * i), "flat", 7.0) for i in range(50)]
    e = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    cells = TS.partial_time_aggregate(e, "15 minutes", keys=("event_type",))
    got = TS.anomalous_buckets(cells, by=("event_type",), threshold=2.5).collect()
    assert len(got) == 1
    r = got[0]
    assert r["event_type"] == "a" and r["z_score"] > 2.5
    assert r["bucket_start"] == base + dt.timedelta(minutes=15 * 50)


# ------------------------------------------------------------------ BPE

def _bpe_reference(word_freqs: dict, n_merges: int):
    """Pure-Python BPE (Sennrich et al. 2016 style) with the same
    deterministic tie-break (count desc, pair asc)."""
    syms = {w: tuple(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)
    return merges


def test_bpe_train_matches_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new new new",
        "wide wider widest wide",
        "low new wide slow slower",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    wf = {}
    for t in texts:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    exp = _bpe_reference(wf, 8)
    got = X.bpe_train(df, n_merges=8, checkpoint_every=3)
    assert got == exp, (got, exp)
    # the first merge really is the max-count pair of char_pair_counts
    top = X.char_pair_counts(df, top=1).first()
    assert (top["a"], top["b"]) == exp[0]


def test_bpe_overlapping_merge_is_left_to_right(spark):
    df = spark.createDataFrame([("aaa aaa",)], "text string")
    got = X.bpe_train(df, n_merges=2)
    # 'aaa' → ('aa','a') after merge 1; merge 2 joins ('aa','a')
    assert got == [("a", "a"), ("aa", "a")]


def test_resize_images_real_pixels(spark):
    """Nearest-neighbor resize over real stdlib-decoded PNG/GIF pixels:
    output payload is exactly out_w*out_h*3 bytes, a solid-color image
    stays solid, a half-red/half-blue image keeps its halves, and
    undecodable inputs keep their row with NULL pixels."""
    from tests.media_fixtures import make_gif_with_pixels, make_jpeg, make_png

    red, blue, green = (255, 0, 0), (0, 0, 255), (0, 255, 0)
    # 8x4: left half red, right half blue
    rows = [[red] * 4 + [blue] * 4 for _ in range(4)]
    gif = make_gif_with_pixels([green, red], [[0] * 6 for _ in range(6)])
    df = spark.createDataFrame(
        [
            ("split.png", bytearray(make_png(8, 4, pixels=rows))),
            ("green.gif", bytearray(gif)),
            ("photo.jpg", bytearray(make_jpeg(64, 64))),
        ],
        "path string, content binary",
    )
    out = {r["path"]: r for r in M.resize_images(df, out_w=4, out_h=4).collect()}
    sp = out["split.png"]
    assert (sp["src_width"], sp["src_height"]) == (8, 4)
    assert len(sp["pixels"]) == 4 * 4 * 3
    px = bytes(sp["pixels"])
    pix = [tuple(px[i : i + 3]) for i in range(0, len(px), 3)]
    for r in range(4):
        assert pix[r * 4 + 0] == red and pix[r * 4 + 1] == red
        assert pix[r * 4 + 2] == blue and pix[r * 4 + 3] == blue
    bg = out["green.gif"]
    assert (bg["src_width"], bg["src_height"]) == (6, 6)
    gp = bytes(bg["pixels"])
    assert len(gp) == 48 and all(
        tuple(gp[i : i + 3]) == green for i in range(0, 48, 3)
    )
    assert out["photo.jpg"]["pixels"] is None  # JPEG entropy decode = stub
    assert out["photo.jpg"]["format"] == "jpeg"


def test_constraints_check_counts_and_quarantine(spark):
    from openetl_spark.functions import constraints as DQ

    df = spark.createDataFrame(
        [
            (1, 10, "A", 100),
            (2, None, "A", 100),     # null qty
            (3, 99, "B", 100),       # out of range + out of set
            (4, 10, "A", 999),       # orphan fk
            (4, 10, "A", 100),       # duplicate id=4
            (5, 10, None, None),     # null flag exempt from in_set; null fk exempt
        ],
        "id long, qty long, flag string, ok long",
    )
    ref = spark.createDataFrame([(100,), (200,)], "rk long")
    rules = [
        DQ.not_null("qty"),
        DQ.in_range("qty", 1, 50),
        DQ.in_set("flag", ["A"]),
        DQ.unique("id"),
        DQ.foreign_key(["ok"], ref, ["rk"]),
    ]
    rep = DQ.check(df, rules).first().asDict()
    assert rep == {
        "not_null_qty": 1,
        "in_range_qty": 1,
        "in_set_flag": 1,
        "unique_id": 1,
        "fk_ok": 1,
    }
    clean, bad = DQ.quarantine(df, rules)
    assert {r["id"] for r in bad.collect()} == {2, 3}
    assert {r["id"] for r in clean.collect()} == {1, 4, 5}  # row-local rules only
    # single-job shape: the scan rules compile to one aggregate
    plan = DQ.check(df, rules[:4])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 4  # partial/final (+ distinct expand)


def test_constraints_matches_rule(spark):
    from openetl_spark.functions import constraints as DQ

    df = spark.createDataFrame(
        [("a@b.com",), ("nope",), (None,)], "email string"
    )
    rep = DQ.check(df, [DQ.matches("email", r"^[^@]+@[^@]+$")]).first()
    assert rep["matches_email"] == 1


# ------------------------------------------------------- r08 operators

def test_incremental_dedup_survivor_rules(spark):
    from openetl_spark.operators import dedup as DD

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " extra"
    # index: 100 (dup of base), 101 (unique). new: 10 < index ids (index
    # partner ids may exceed new ids), 11/12 an internal new-batch pair.
    idx = spark.createDataFrame(
        [(100, base), (101, "one two three four five six seven eight nine ten")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (10, near),
            (11, "red orange yellow green blue indigo violet pink brown black"),
            (12, "red orange yellow green blue indigo violet pink brown black"),
            (13, "totally different words nothing shared here at all folks yes"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in DD.incremental_near_duplicates(
            new, idx, "doc_id", "text", threshold=0.5
        ).collect()
    }
    # 10 flagged against index doc 100 (partner id ABOVE the new id)
    assert out[10]["dup_of"] == 100
    # internal new-batch dup group keeps the smallest id: 11 survives
    assert 11 not in out
    assert out[12]["dup_of"] == 11 and out[12]["jaccard"] == 1.0
    # unique docs unflagged; index docs never appear in the output
    assert 13 not in out and 100 not in out and 101 not in out


def test_incremental_dedup_never_reports_index_pairs(spark):
    from openetl_spark.operators import dedup as DD

    text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    idx = spark.createDataFrame(
        [(1, text), (2, text)], ["doc_id", "text"]  # index-internal dup pair
    )
    new = spark.createDataFrame(
        [(3, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10")], ["doc_id", "text"]
    )
    out = DD.incremental_near_duplicates(new, idx, "doc_id", "text").collect()
    assert out == []  # index×index duplication is not this operator's job


def test_semantic_dedup_min_id_survivor_and_cluster_scope(spark):
    import numpy as np

    from openetl_spark.operators import similarity as SS

    # two well-separated centroids; vectors 1,2,3 hug centroid 0 (near-
    # identical), vector 9 hugs centroid 1. 1 survives as min id.
    cents = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    rows = [
        (1, [1.0, 0.01, 0.0]),
        (2, [1.0, 0.011, 0.0]),
        (3, [0.99, 0.01, 0.001]),
        (9, [0.0, 1.0, 0.02]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r["vec_id"]: r
        for r in SS.semantic_dedup(df, cents, threshold=0.99).collect()
    }
    assert set(out) == {2, 3}
    assert out[2]["dup_of"] == 1 and out[3]["dup_of"] == 1
    assert out[2]["cosine_sim"] >= 0.99
    # near-dup ACROSS clusters is out of scope by design (SemDeDup):
    # a vector close to 9 but assigned to centroid 0 must not pair
    rows2 = rows + [(4, [0.6, 0.8, 0.0])]  # leans centroid 1? cos picks argmin dist
    df2 = spark.createDataFrame(rows2, ["vec_id", "embedding"])
    out2 = SS.semantic_dedup(df2, cents, threshold=0.99).collect()
    assert {r["vec_id"] for r in out2} == {2, 3}  # 4 pairs with nobody


def test_semantic_dedup_precomputed_assignment_matches(spark, sf_dir):
    import numpy as np

    from openetl_spark import catalog
    from openetl_spark.operators import similarity as SS

    cents, _ = catalog._ivf_layout(spark, sf_dir, n_lists=16, seed=42)
    e = catalog.load(spark, sf_dir, "embeddings")
    a = SS.semantic_dedup(e, cents, threshold=0.4)
    pre = SS.with_ivf_assignment(e, np.asarray(cents), "embedding", "ivf_list")
    b = SS.semantic_dedup(pre, cents, list_col="ivf_list", threshold=0.4)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0


def test_incremental_dedup_prepared_index_equals_raw(spark, sf_dir, tmp_path):
    from openetl_spark import catalog
    from openetl_spark.operators import curation as CC
    from openetl_spark.operators import dedup as DD

    d = catalog.load(spark, sf_dir, "documents")
    bucket = CC.hash_bucket(F.col("doc_id"), 100)
    idx, new = d.filter(bucket < 50), d.filter(bucket >= 50)
    raw = sorted(
        map(tuple, DD.incremental_near_duplicates(new, idx, "doc_id", "text").collect())
    )
    # persist the index's prepared relation, read back, run the
    # index_prepared path — identical output, no index text access
    path = str(tmp_path / "minhash_index")
    DD.prepare_minhash_index(idx, "doc_id", "text").write.parquet(path)
    prepared = spark.read.parquet(path)
    via_index = sorted(
        map(
            tuple,
            DD.incremental_near_duplicates(
                new, prepared, "doc_id", "text", index_prepared=True
            ).collect(),
        )
    )
    assert raw == via_index and len(raw) > 0


def test_scd2_history_semantics(spark):
    from datetime import datetime

    from openetl_spark.operators import timeseries as TSS

    t = lambda s: datetime(2024, 1, s)
    rows = [
        (1, t(1), 100, "A"),
        (1, t(2), 101, "A"),   # no change → absorbed into the A run
        (1, t(3), 102, "B"),
        (1, t(4), 103, "A"),
        (2, t(5), 104, "X"),   # single-state user: one current row
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    out = sorted(
        TSS.scd2_history(df, "user_id", "event_type", "ts", "event_id").collect(),
        key=lambda r: (r["user_id"], r["valid_from"]),
    )
    u1 = [r for r in out if r["user_id"] == 1]
    assert [(r["event_type"], r["valid_from"].day,
             r["valid_to"].day if r["valid_to"] else None, r["is_current"])
            for r in u1] == [("A", 1, 3, False), ("B", 3, 4, False), ("A", 4, None, True)]
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"]
    # intervals are contiguous: each valid_to equals the next valid_from
    for a, b in zip(u1, u1[1:]):
        assert a["valid_to"] == b["valid_from"]


def test_hot_keys_shares_sum_and_order(spark):
    from openetl_spark.operators.skew import hot_keys

    rows = [(i, "hot" if i % 2 == 0 else f"k{i % 7}") for i in range(700)]
    df = spark.createDataFrame(rows, ["i", "k"])
    out = hot_keys(df, "k", k=3).collect()
    assert out[0]["key"] == "hot" and abs(out[0]["share"] - 0.5) < 0.01
    assert [r["n"] for r in out] == sorted([r["n"] for r in out], reverse=True)


def test_chunk_documents_layout(spark):
    from openetl_spark.operators import text as TX

    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
        (2, "a b c"),                                # shorter than chunk
        (3, ""),                                     # empty → no chunks
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sorted(
        TX.chunk_documents(df, chunk_tokens=4, stride=3).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    d1 = [r for r in out if r["doc_id"] == 1]
    # starts 1,4,7,10 → chunks of ≤4 tokens, dense ids, overlap of 1
    assert [r["chunk_id"] for r in d1] == [0, 1, 2, 3]
    assert d1[0]["chunk_text"] == "w0 w1 w2 w3"
    assert d1[1]["chunk_text"] == "w3 w4 w5 w6"
    assert d1[3]["chunk_text"] == "w9" and d1[3]["n_tokens"] == 1
    # every token appears in ≥1 chunk (coverage)
    covered = set(t for r in d1 for t in r["chunk_text"].split())
    assert covered == {f"w{i}" for i in range(10)}
    d2 = [r for r in out if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "a b c"
    assert not [r for r in out if r["doc_id"] == 3]


def test_top_terms_tfidf_ranks_and_ties(spark):
    from openetl_spark.operators import text as TX

    # doc 1: 'rare' appears twice and only here → top term; 'common'
    # is in every doc → idf 0 → never extracted above fresh terms
    df = spark.createDataFrame(
        [
            (1, "common rare rare alpha"),
            (2, "common beta beta gamma"),
            (3, "common delta delta gamma"),
        ],
        ["doc_id", "text"],
    )
    out = TX.top_terms_tfidf(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    assert sorted(by_doc[1])[0] == (1, "rare")
    # identical scores tie-break on the term string ascending:
    # doc 2's 'beta' (tf=2, df=1) outranks 'gamma' (tf=1, df=2)
    assert sorted(by_doc[2]) == [(1, "beta"), (2, "gamma")]
    # ln(N/df)=ln(1)=0 for 'common' → it never appears in any top-2
    assert all(t != "common" for ranks in by_doc.values() for _, t in ranks)


# ---------------------------------------------------- r05 text additions

def test_gopher_repetition_flags_repeated_phrase(spark):
    from openetl_spark.operators import text as X

    distinct_doc = " ".join(f"word{i}" for i in range(60))  # no repeats;
    # long enough that a singleton n-gram's char mass stays under the
    # thresholds (Gopher's fractions inherently penalize tiny docs)
    df = spark.createDataFrame(
        [
            (1, "spam ham " * 30),   # one bigram dominates
            (2, distinct_doc),
            (3, "solo"),             # <2 tokens → omitted
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in X.gopher_repetition_flags(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["keep"] is False and out[1]["top2_char_frac"] > 0.5
    assert out[2]["keep"] is True and out[2]["dup5_char_frac"] == 0.0
    # doc 1 is 'spam ham' repeated: every 5-gram duplicates
    assert out[1]["dup5_char_frac"] > 0.5


def test_gopher_quality_flags_thresholds(spark):
    from openetl_spark.operators import text as X

    long_good = "the and " + "word " * 60
    df = spark.createDataFrame(
        [(1, long_good), (2, "short doc the and")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in X.gopher_quality_flags(df).collect()}
    assert out[1]["keep"] is True and out[1]["stopword_hits"] == 2
    assert out[2]["keep"] is False  # fails min_words
    assert out[2]["alpha_word_frac"] == 1.0


def test_pmi_collocations_min_count_guard(spark):
    from openetl_spark.operators import text as X

    # 'tick tock' appears 30×; 'rare pair' once (must be suppressed)
    df = spark.createDataFrame(
        [(("tick tock " * 30) + "rare pair",)], "text string"
    )
    out = X.pmi_collocations(df, min_count=20, k=10).collect()
    bigrams = {r["bigram"] for r in out}
    assert "rare pair" not in bigrams
    assert "tick tock" in bigrams
    top = out[0]
    assert top["pair_count"] >= 20


def test_ann_recall_is_one_when_probing_all_lists(spark, sf_dir):
    """Probing every list makes the IVF arm identical to the exact arm,
    so recall@k must be exactly 1.0 for every panel query — pins the
    harness itself (a buggy top-k or join would break the identity)."""
    from openetl_spark import catalog
    from openetl_spark.operators import similarity as S

    cents, data_path = catalog._ivf_layout(spark, sf_dir, n_lists=16, seed=42)
    corpus = spark.read.parquet(data_path)
    panel_rows = (
        catalog.load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 100 == 0)
        .select("vec_id", "embedding")
        .collect()
    )
    panel = [(int(r["vec_id"]), list(r["embedding"])) for r in panel_rows]
    out = S.ann_recall_report(corpus, panel, cents, k=10, n_probe=16)
    assert {r["recall_at_k"] for r in out.collect()} == {1.0}


def test_temperature_sampling_flattens_mix(spark, sf_dir):
    """alpha < 1 must upweight low-resource groups: the kept share of
    the SMALLEST language exceeds its natural share, and no group is
    upsampled (kept_g <= n_g)."""
    from openetl_spark.operators import curation as C

    d = catalog.load(spark, sf_dir, "documents")
    nat = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
    kept = {
        r["lang"]: r["count"]
        for r in C.temperature_sampling(d, alpha=0.3, group_col="lang")
        .groupBy("lang").count().collect()
    }
    assert set(kept) == set(nat)
    for g in nat:
        assert kept[g] <= nat[g]
    small = min(nat, key=nat.get)
    nat_share = nat[small] / sum(nat.values())
    kept_share = kept[small] / sum(kept.values())
    assert kept_share > nat_share
    # binding group (smallest count) keeps ~everything (bp floor may
    # shave <=1/10000)
    assert kept[small] >= nat[small] * 0.999


def test_gap_fill_edges_and_interpolation(spark):
    """One key, buckets at t0/t0+30/t0+45 with values 1.0/4.0/8.0 at
    15-min fill: the t0+15 gap interpolates to the midpoint of 1 and 4;
    leading/trailing grid cells don't exist (grid spans [min, max])."""
    import datetime as dt

    from openetl_spark.operators import timeseries as TS

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("a", t0, 1.0),
        ("a", t0 + dt.timedelta(minutes=30), 4.0),
        ("a", t0 + dt.timedelta(minutes=45), 8.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {
        r["bucket_start"].minute: r
        for r in TS.gap_fill(df, "15 minutes", keys=("event_type",)).collect()
    }
    assert set(out) == {0, 15, 30, 45}  # grid = [min, max], no padding
    assert out[15]["filled"] is True and out[15]["n_events"] == 0
    assert out[15]["sum_value"] == 2.5  # linear midpoint of 1 and 4
    assert out[0]["filled"] is False and out[0]["sum_value"] == 1.0
    assert out[45]["sum_value"] == 8.0


def test_winnowing_guarantee_shared_span_fingerprints(spark):
    """MOSS guarantee: two docs sharing a substring of length
    >= k + window - 1 select at least one identical fingerprint
    REGARDLESS of alignment. Build docs embedding the same 11-char span
    at different offsets inside otherwise-distinct noise; disjoint docs
    share nothing."""
    from openetl_spark.operators import dedup as D

    span = "abcdefghijk"  # k=8, window=4 → guarantee at >= 11 chars
    rows = [
        (1, "zzzzz" + span + "qqqqqq"),
        (2, "pp" + span + "rrrrrrrrrrrr"),   # different alignment
        (3, "totally unrelated content xyz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = D.winnow_fingerprints(df, "doc_id", "text", k=8, window=4)
    by_doc = {
        i: {r["fingerprint"] for r in fps.filter(F.col("doc_id") == i).collect()}
        for i in (1, 2, 3)
    }
    assert by_doc[1] & by_doc[2], "shared span must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    pairs = D.winnow_overlap_pairs(
        df, "doc_id", "text", k=8, window=4, min_shared=1
    ).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {(1, 2)}


def test_pq_recall_sees_compression_loss(spark, sf_dir):
    """With m=4/16-code compression on random 64-dim vectors, recall is
    well below 1 (the harness must SEE the loss) but beats chance
    (random 10 of 499 ≈ 0.02)."""
    from openetl_spark import catalog
    from openetl_spark.operators import similarity as S

    books = catalog._pq_codebooks(spark, sf_dir, m=4, n_codes=16, seed=42)
    corpus = catalog.load(spark, sf_dir, "embeddings")
    panel_rows = (
        corpus.filter(F.col("vec_id") % 100 == 0)
        .select("vec_id", "embedding")
        .collect()
    )
    panel = [(int(r["vec_id"]), list(r["embedding"])) for r in panel_rows]
    out = S.pq_recall_report(corpus, panel, books, k=10).collect()
    recalls = [r["recall_at_k"] for r in out]
    assert len(recalls) == len(panel)
    assert 0.0 <= min(recalls) and max(recalls) < 1.0
    assert sum(recalls) / len(recalls) > 0.05


def test_pq_recall_identity_on_lossless_corpus(spark):
    """Harness-plumbing identity (review r05: the old docstring
    promised this check without performing it): when every corpus
    vector IS a concatenation of codebook centroids, quantization is
    lossless — ADC distance equals exact squared-L2 — so recall@k must
    be exactly 1.0 for every query. A join/overlap bug that uniformly
    depressed recall would fail here."""
    import numpy as np

    from openetl_spark.operators import similarity as S

    rng = np.random.default_rng(11)
    books = rng.normal(0, 1, (2, 4, 2))  # m=2, 4 codes, sub-dim 2
    vecs = []
    for i in range(40):
        c0, c1 = books[0][i % 4], books[1][(i // 4) % 4]
        vecs.append((i, [float(x) for x in np.concatenate([c0, c1])]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    panel = [(i, v) for i, v in vecs if i % 10 == 0]
    out = S.pq_recall_report(df, panel, books, k=5).collect()
    assert {r["recall_at_k"] for r in out} == {1.0}


def test_image_near_duplicates_ahash(spark):
    """Perceptual aHash dedup over real decoded PNGs: an image and its
    slightly-brightened copy collide within the hamming budget; a
    structurally different image doesn't; undecodable JPEG rows drop
    out without failing the job."""
    from tests.media_fixtures import make_jpeg, make_png

    def gradient(shift=0):
        return [
            [(min(255, x * 16 + shift), min(255, y * 16), 40)
             for x in range(16)]
            for y in range(16)
        ]

    def checker():
        return [
            [((255, 255, 255) if (x + y) % 2 else (0, 0, 0))
             for x in range(16)]
            for y in range(16)
        ]

    rows = [
        ("a.png", bytearray(make_png(16, 16, gradient(0)))),
        ("b.png", bytearray(make_png(16, 16, gradient(8)))),   # near-dup
        ("c.png", bytearray(make_png(16, 16, checker()))),     # different
        ("d.jpg", bytearray(make_jpeg(16, 16))),               # undecodable
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = M.image_near_duplicates(df, max_hamming=6)
    pairs = {(r["a"], r["b"]): r["hamming"] for r in out.collect()}
    assert ("a.png", "b.png") in pairs
    assert pairs[("a.png", "b.png")] <= 6
    assert all("c.png" not in p for p in pairs)
    # hashes: None for the JPEG; Spark path matches a direct driver-side
    # recomputation (a real determinism check, not x == x — review r05)
    hs = {r["path"]: r["ahash"] for r in M.with_image_ahash(df).collect()}
    assert hs["d.jpg"] is None
    assert hs["a.png"] == M.average_hash_64(bytes(rows[0][1]))
    # a 32-ish-bit distance separates unrelated structures
    ham = bin((hs["a.png"] ^ hs["c.png"]) & ((1 << 64) - 1)).count("1")
    assert ham > 8
    # corrupt payload (bit-flipped IDAT) hashes to None, doesn't crash
    broken = bytearray(make_png(16, 16, gradient(0)))
    broken[60] ^= 0xFF
    assert M.average_hash_64(bytes(broken)) is None


def test_bmp_ppm_decoders_roundtrip_and_cross_format_ahash(spark):
    """r06 (VERDICT #9): real stdlib BMP (bottom-up, BGR, padded rows)
    and PNM P5/P6 pixel decoders, wired through the shared
    decode_image_rgb dispatch — identical pixels must produce an
    IDENTICAL aHash regardless of container, and the resize path must
    yield non-null fixed-size payloads for the new formats."""
    from openetl_spark.operators import media_synth as MS

    # width 3 → BMP stride pads 9 → 12 bytes: the padding path is live
    px = [[(10 * y + x, 200 - 10 * x, 7 * y) for x in range(3)] for y in range(5)]
    bmp = MS.make_bmp(3, 5, px)
    fmt, w, h = M.parse_image_header(bmp)
    assert (fmt, w, h) == ("bmp", 3, 5)
    dw, dh, ch, flat = M.decode_bmp_pixels(bmp)
    assert (dw, dh, ch) == (3, 5, 3)
    assert list(flat[:3]) == list(px[0][0])          # top-left, RGB order
    assert list(flat[-3:]) == list(px[-1][-1])        # bottom-right
    ppm = MS.make_ppm(3, 5, px, comment="a comment # tricky")
    assert M.parse_image_header(ppm) == ("ppm", 3, 5)
    assert bytes(M.decode_ppm_pixels(ppm)[3]) == bytes(flat)
    pgm = MS.make_pgm(4, 2, [[0, 60, 120, 255], [10, 20, 30, 40]])
    gw, gh, gch, gflat = M.decode_ppm_pixels(pgm)
    assert (gw, gh, gch) == (4, 2, 1) and list(gflat) == [0, 60, 120, 255, 10, 20, 30, 40]

    # cross-format hash consistency on a real aHash pattern
    bits = MS._bits64("bmp-ppm-parity")
    pat = [
        [((200, 200, 200) if bits[(y // 2) * 8 + (x // 2)] else (50, 50, 50))
         for x in range(16)]
        for y in range(16)
    ]
    h_png = M.average_hash_64(MS.make_png(16, 16, pat))
    h_bmp = M.average_hash_64(MS.make_bmp(16, 16, pat))
    h_ppm = M.average_hash_64(MS.make_ppm(16, 16, pat))
    assert h_png == h_bmp == h_ppm and h_png is not None
    # mean luma agrees across containers too
    assert M._mean_luma(MS.make_bmp(16, 16, pat)) == M._mean_luma(MS.make_png(16, 16, pat))
    assert M._mean_luma(MS.make_ppm(16, 16, pat)) == M._mean_luma(MS.make_png(16, 16, pat))

    # corrupt payloads: truncated pixel data → None, not a crash
    assert M.decode_bmp_pixels(bmp[:40]) is None
    assert M.decode_ppm_pixels(ppm[:10]) is None
    assert M.average_hash_64(bmp[:40]) is None

    # Spark resize path covers the new formats
    df = spark.createDataFrame(
        [("a.bmp", bytearray(MS.make_bmp(16, 16, pat))),
         ("b.ppm", bytearray(MS.make_ppm(16, 16, pat)))],
        "path string, content binary",
    )
    out = {r["path"]: r for r in M.resize_images(df, 8, 8).collect()}
    assert out["a.bmp"]["pixels"] is not None and len(out["a.bmp"]["pixels"]) == 8 * 8 * 3
    assert bytes(out["a.bmp"]["pixels"]) == bytes(out["b.ppm"]["pixels"])
    assert out["a.bmp"]["format"] == "bmp" and out["b.ppm"]["format"] == "ppm"


def test_image_ahash_exact_in_mixed_null_batch(spark):
    """r06 regression: when ONE Arrow batch carries both an undecodable
    payload (None hash) and valid images, the hash column must stay
    exact int64 — pandas inference made it float64 and silently rounded
    fingerprints past 2^53 (caught by the streaming dedup-on-arrival
    parity test; batch-composition dependent, so per-row fixtures never
    tripped it)."""
    from openetl_spark.operators import media_synth as MS

    corpus = MS.synthetic_image_corpus()  # includes img/undecodable.jpg
    df = spark.createDataFrame(
        [(p, bytearray(b)) for p, b in corpus], "path string, content binary"
    ).coalesce(1)  # force every row into one Arrow batch
    got = {r["path"]: r["ahash"] for r in M.with_image_ahash(df).collect()}
    for p, b in corpus:
        assert got[p] == M.average_hash_64(bytes(b)), p
    aud = MS.synthetic_audio_corpus()
    adf = spark.createDataFrame(
        [(p, bytearray(b)) for p, b in aud], "path string, content binary"
    ).coalesce(1)
    agot = {r["path"]: r["afp"] for r in M.with_audio_fingerprint(adf).collect()}
    for p, b in aud:
        assert agot[p] == M.audio_fingerprint_64(bytes(b)), p


def test_audio_near_duplicates_energy_fingerprint(spark):
    """Energy-delta fingerprints over real 16-bit PCM: a clip and its
    volume-scaled copy are fingerprint-IDENTICAL (deltas compare, not
    threshold), a different envelope stays out of the hamming budget,
    silence (no energy shape) hashes deterministically but differs."""
    import io
    import math
    import struct
    import wave

    def am_wav(env_hz: float, amp: float = 0.5) -> bytes:
        sr, n = 8000, 8000
        frames = b"".join(
            struct.pack(
                "<h",
                int(amp * 32767
                    * (0.55 + 0.45 * math.sin(2 * math.pi * env_hz * i / sr))
                    * math.sin(2 * math.pi * 440 * i / sr)),
            )
            for i in range(n)
        )
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
            w.writeframes(frames)
        return buf.getvalue()

    rows = [
        ("a.wav", bytearray(am_wav(3.0, amp=0.5))),
        ("b.wav", bytearray(am_wav(3.0, amp=0.25))),  # same shape, half volume
        ("c.wav", bytearray(am_wav(13.0))),           # different envelope
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    fps = {r["path"]: r["afp"] for r in M.with_audio_fingerprint(df).collect()}
    assert fps["a.wav"] == fps["b.wav"]  # volume-invariant
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in M.audio_near_duplicates(df, max_hamming=6).collect()}
    assert pairs[("a.wav", "b.wav")] == 0
    assert all("c.wav" not in p for p in pairs)


# ------------------------------------------------------------------
# ExactSubstr dedup (Lee et al., ACL 2022) — r06 second session
# ------------------------------------------------------------------

def _exactsubstr_corpus(spark):
    return spark.createDataFrame(
        [
            # doc 1 and doc 2 share a 10-token run; doc 1 holds the
            # canonical (smallest (doc, pos)) copy.
            (1, "a b c d e f g h i j"),
            (2, "x y a b c d e f g h i j z"),
            # doc 3 repeats an 8-token phrase twice WITHIN the doc —
            # the second occurrence is the removable one, and the two
            # duplicated windows abut (gap == window) so they merge
            # into a single reported span.
            (3, "p q r s t u v w p q r s t u v w"),
        ],
        "doc_id long, text string",
    )


def test_duplicate_spans_localizes_shared_runs(spark):
    spans = {
        (r["doc_id"], r["span_start"]): r
        for r in D.duplicate_spans(
            _exactsubstr_corpus(spark), window=8
        ).collect()
    }
    assert set(spans) == {(1, 0), (2, 2), (3, 0)}
    # 10-token shared run = 3 overlapping windows merged to one span
    assert (spans[(1, 0)]["span_end"], spans[(1, 0)]["span_tokens"],
            spans[(1, 0)]["n_windows"]) == (9, 10, 3)
    assert (spans[(2, 2)]["span_end"], spans[(2, 2)]["span_tokens"],
            spans[(2, 2)]["n_windows"]) == (11, 10, 3)
    # within-doc repeat: windows at pos 0 and 8 abut -> one 16-token span
    assert (spans[(3, 0)]["span_end"], spans[(3, 0)]["span_tokens"],
            spans[(3, 0)]["n_windows"]) == (15, 16, 2)


def test_remove_duplicate_spans_keeps_canonical_copy(spark):
    out = {
        r["doc_id"]: r
        for r in D.remove_duplicate_spans(
            _exactsubstr_corpus(spark), window=8
        ).collect()
    }
    # canonical doc keeps everything
    assert (out[1]["n_removed"], out[1]["clean_text"]) == (
        0, "a b c d e f g h i j")
    # non-canonical cross-doc copy is excised, surroundings survive
    assert (out[2]["n_tokens"], out[2]["n_removed"], out[2]["clean_text"]) == (
        13, 10, "x y z")
    # within-doc repeat keeps the FIRST occurrence
    assert (out[3]["n_tokens"], out[3]["n_removed"], out[3]["clean_text"]) == (
        16, 8, "p q r s t u v w")


def test_token_windows_short_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "only five tokens right here"), (2, "   "), (3, "a b c d e f g h")],
        "doc_id long, text string",
    )
    rows = D.token_windows(df, window=8).collect()
    # only doc 3 reaches 8 tokens, exactly one window at pos 0
    assert [(r["doc_id"], r["pos"]) for r in rows] == [(3, 0)]
    # short docs still appear in the removal output, untouched
    out = {r["doc_id"]: r for r in D.remove_duplicate_spans(df, window=8).collect()}
    assert out[1]["n_removed"] == 0 and out[1]["n_tokens"] == 5
    assert 2 not in out  # whitespace-only doc has no tokens


# ------------------------------------------------------------------
# baseline JPEG codec pair (r06 second session): decode_jpeg_pixels
# (multimodal) vs encode_jpeg (media_synth)
# ------------------------------------------------------------------

def _gradient_rgb(w, h):
    import numpy as np

    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_jpeg_roundtrip_within_quantization_error():
    import numpy as np

    from openetl_spark.operators.media_synth import encode_jpeg

    img = _gradient_rgb(37, 23)  # deliberately not a multiple of 8
    for q, sub, tol in [(95, "444", 8), (85, "444", 12), (90, "420", 16), (90, "422", 16)]:
        data = encode_jpeg(img, quality=q, subsampling=sub)
        dec = M.decode_jpeg_pixels(data)
        assert dec is not None and dec[:3] == (37, 23, 3)
        px = np.frombuffer(bytes(dec[3]), dtype=np.uint8).reshape(23, 37, 3)
        err = np.abs(px.astype(int) - img.astype(int))
        assert err.max() <= tol, (q, sub, err.max())
        assert err.mean() <= 4, (q, sub, err.mean())
    # header parse agrees on dimensions for real streams
    assert M.parse_image_header(encode_jpeg(img))[:3] == ("jpeg", 37, 23)


def test_jpeg_grayscale_stream_replicates_channels():
    import numpy as np

    from openetl_spark.operators.media_synth import encode_jpeg

    gray = _gradient_rgb(29, 19)[..., 0]
    dec = M.decode_jpeg_pixels(encode_jpeg(gray, quality=92, subsampling="gray"))
    assert dec is not None and dec[:3] == (29, 19, 3)
    px = np.frombuffer(bytes(dec[3]), dtype=np.uint8).reshape(19, 29, 3)
    assert (px[..., 0] == px[..., 1]).all() and (px[..., 0] == px[..., 2]).all()
    assert np.abs(px[..., 0].astype(int) - gray.astype(int)).max() <= 4


def test_jpeg_restart_markers_decode_identically():
    from openetl_spark.operators.media_synth import encode_jpeg

    img = _gradient_rgb(37, 23)
    for sub in ("444", "420", "422"):
        plain = encode_jpeg(img, quality=85, subsampling=sub)
        restarted = encode_jpeg(img, quality=85, subsampling=sub, restart_interval=2)
        assert plain != restarted  # DRI really changed the stream
        a, b = M.decode_jpeg_pixels(plain), M.decode_jpeg_pixels(restarted)
        # same quantized coefficients -> bit-identical pixels
        assert a is not None and b is not None and a[3] == b[3]


def test_jpeg_corrupt_inputs_return_none():
    import numpy as np

    from openetl_spark.operators.media_synth import encode_jpeg

    data = encode_jpeg(_gradient_rgb(16, 16), quality=85)
    # every cut inside headers/entropy data -> None; a cut that only
    # drops the EOI marker still decodes (liberal, like real decoders)
    for k in range(0, len(data) - 2):
        assert M.decode_jpeg_pixels(data[:k]) is None, k
    assert M.decode_jpeg_pixels(data[: len(data) - 2]) is not None
    assert M.decode_jpeg_pixels(data[: len(data) - 1]) is not None
    rng = np.random.RandomState(0)
    for _ in range(40):  # byte flips must never raise
        c = bytearray(data)
        c[rng.randint(2, len(c))] = rng.randint(256)
        M.decode_jpeg_pixels(bytes(c))
    # header-only streams (the legacy fixture) stay undecodable
    from tests.media_fixtures import make_jpeg

    assert M.decode_jpeg_pixels(make_jpeg(64, 64)) is None


def test_jpeg_feeds_the_shared_pixel_paths():
    import numpy as np

    from openetl_spark.operators.media_synth import (
        _bits64,
        _pattern_png,
        encode_jpeg,
    )

    # same pixels through PNG and JPEG must aHash identically: the
    # pattern corpus uses uniform cells at luma 50/200, far beyond the
    # <=4/channel quantization error at q=95
    png = _pattern_png(_bits64("jpeg-parity"))
    w, h, ch, px = M.decode_png_pixels(png)
    rgb = M._to_rgb(px, ch).reshape(h, w, 3)
    jpg = encode_jpeg(np.asarray(rgb), quality=95)
    assert M.average_hash_64(jpg) == M.average_hash_64(png)
    # mean luma flows through the same dispatch (no PIL in container)
    luma = M._mean_luma(jpg)
    assert luma is not None and abs(luma - M._mean_luma(png)) < 0.01


def _bpe_apply_reference(word: str, merges) -> list:
    s = list(word)
    for a, b in merges:
        i, nxt = 0, []
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                nxt.append(a + b)
                i += 2
            else:
                nxt.append(s[i])
                i += 1
        s = nxt
    return s


def test_bpe_encode_matches_reference_and_roundtrips(spark):
    texts = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new new new"),
        (3, "wide wider widest wide slow"),
        (4, ""),  # empty doc -> empty token array, n = 0
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    merges = X.bpe_train(df, n_merges=8, checkpoint_every=3)
    got = {r["doc_id"]: r for r in X.bpe_encode(df, merges).collect()}
    for doc_id, text in texts:
        exp = [s for w in text.split() if w for s in _bpe_apply_reference(w, merges)]
        assert got[doc_id]["bpe_tokens"] == exp, doc_id
        assert got[doc_id]["n_bpe_tokens"] == len(exp)
        # lossless: concatenating the subwords reconstructs the text
        assert "".join(got[doc_id]["bpe_tokens"]) == text.replace(" ", "")
    # encoding compresses: learned merges shorten the symbol stream
    n_chars = sum(len(w) for _, t in texts for w in t.split())
    n_syms = sum(r["n_bpe_tokens"] for r in got.values())
    assert n_syms < n_chars


def test_duplicate_spans_incremental_equals_batch(spark, sf_dir):
    """Incremental ExactSubstr ≡ batch: probing each arriving half of
    the corpus against the accumulated window index (old corpus ∪
    batch-internal repeats) must reproduce exactly the full-corpus
    duplicate_spans rows for the arriving documents — two arrival
    rounds, index updated between them, index×index never re-mined."""
    docs = catalog.load(spark, sf_dir, "documents")
    full = {
        tuple(r)
        for r in D.duplicate_spans(docs, window=8).collect()
    }

    def spans_of(ids_pred):
        return {t for t in full if ids_pred(t[0])}

    batch1 = docs.filter("doc_id % 3 = 0")
    batch2 = docs.filter("doc_id % 3 != 0")
    # arrival 1: empty index — only within-batch duplication counts;
    # cross-check against duplicate_spans over batch1 alone
    empty_idx = spark.createDataFrame([], "wh string")
    inc1 = {
        tuple(r)
        for r in D.duplicate_spans_incremental(empty_idx, batch1, window=8).collect()
    }
    batch1_only = {
        tuple(r) for r in D.duplicate_spans(batch1, window=8).collect()
    }
    assert inc1 == batch1_only
    # arrival 2: index = batch1's distinct window hashes; the arriving
    # docs' spans must equal their full-corpus spans exactly
    idx = D.prepare_window_index(batch1, window=8)
    inc2 = {
        tuple(r)
        for r in D.duplicate_spans_incremental(idx, batch2, window=8).collect()
    }
    assert inc2 == spans_of(lambda d: d % 3 != 0)


def test_lsh_banding_recall_partial_in_midrange(spark):
    """On a synthetic corpus with controlled mid-jaccard pairs, banding
    recall must be PARTIAL (0 < recall < 1 somewhere) and monotone in
    the banding aggressiveness: fewer, wider bands (r=8, b=4) catch
    strictly fewer mid-range pairs than r=2, b=16 — the 1-(1-j^r)^b
    cliff moving right. (The testdata corpus only carries j>=0.8
    planted near-dups, where both configs sit at recall 1.0; this
    covers the regime the catalog query can't observe.)"""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(400)]
    rows = []
    # 40 pairs sharing ~30-60% of their 30 tokens -> mid-range jaccard
    for g in range(40):
        base = rng.sample(vocab, 30)
        share = rng.randint(9, 18)
        other = base[:share] + rng.sample(vocab, 30 - share)
        rows.append((2 * g, " ".join(base)))
        rows.append((2 * g + 1, " ".join(other)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    loose = {
        r["bucket"]: r
        for r in D.lsh_banding_recall_report(
            df, n=2, num_hashes=32, rows_per_band=2, threshold=0.05
        ).collect()
    }
    tight = {
        r["bucket"]: r
        for r in D.lsh_banding_recall_report(
            df, n=2, num_hashes=32, rows_per_band=8, threshold=0.05
        ).collect()
    }
    assert any(0 < r["recall"] < 1 for r in loose.values()), loose
    # same truth-pair population in both reports
    assert sum(r["n_pairs"] for r in loose.values()) == sum(
        r["n_pairs"] for r in tight.values()
    )
    # wider bands never catch MORE pairs in any bucket, and catch
    # strictly fewer overall
    for b, r in tight.items():
        assert r["n_hit"] <= loose[b]["n_hit"], b
    assert sum(r["n_hit"] for r in tight.values()) < sum(
        r["n_hit"] for r in loose.values()
    )


def test_avi_mjpeg_frame_sampling_decodes_for_real(spark):
    """r06-s2: the video leg of C30 made real — an MJPEG AVI's frames
    are sliced at true '00dc' chunk boundaries by the RIFF walk, each
    emitted payload is a standalone JPEG the in-repo decoder renders,
    and the type sniffer distinguishes the two RIFF containers."""
    import numpy as np

    from openetl_spark.operators.media_synth import make_mjpeg_avi, make_wav

    levels = [30, 80, 130, 180, 230]
    fr = [np.full((16, 16, 3), v, dtype=np.uint8) for v in levels]
    avi = make_mjpeg_avi(fr, fps=5, quality=92)
    df = spark.createDataFrame(
        [("clip.avi", bytearray(avi)), ("tone.wav", bytearray(make_wav(8000, 0.05)))],
        "path string, content binary",
    )
    kinds = {r["path"]: r["media_type"] for r in M.with_media_type(df).collect()}
    assert kinds == {"clip.avi": "avi", "tone.wav": "wav"}
    out = M.sample_frames(df.filter("path = 'clip.avi'"), stride=2).collect()
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    for r in out:
        dec = M.decode_jpeg_pixels(bytes(r["frame_bytes"]))
        assert dec is not None and dec[:3] == (16, 16, 3)
        px = np.frombuffer(bytes(dec[3]), dtype=np.uint8)
        assert abs(float(px.mean()) - levels[r["frame_idx"]]) <= 3
    # header metadata: dims, frame interval, count
    assert M.parse_avi_header(avi) == (16, 16, 200000, 5)
    # truncation keeps parsed prefix frames, never raises
    cut = M.parse_avi_frames(avi[: len(avi) - 300])
    assert 0 < len(cut) < 5
    assert M.parse_avi_frames(b"RIFF\x00\x00\x00\x00AVI ") == []


def test_extract_video_features_real_decode(spark):
    import numpy as np

    from openetl_spark.operators.media_synth import make_mjpeg_avi

    fr = [np.full((12, 20, 3), v, dtype=np.uint8) for v in (51, 102, 204)]
    df = spark.createDataFrame(
        [("v.avi", bytearray(make_mjpeg_avi(fr, fps=4))),
         ("junk.bin", bytearray(b"\x00\x01"))],
        "path string, content binary",
    )
    got = {r["path"]: r for r in M.extract_video_features(df).collect()}
    v = got["v.avi"]
    assert (v["width"], v["height"], v["n_frames"], v["fps"]) == (20, 12, 3, 4.0)
    assert abs(v["duration_s"] - 0.75) < 1e-9
    # first frame is uniform luma 51 -> ~0.2 of full scale
    assert abs(v["first_frame_luma"] - 51 / 255.0) < 0.02
    j = got["junk.bin"]
    assert j["width"] is None and j["first_frame_luma"] is None


def test_progressive_jpeg_decodes_identically_to_baseline():
    """Progressive encodes — spectral selection (SOF2, Ah=Al=0) AND
    the successive-approximation script (Al=1 first scans + DC/AC
    refinement) — carry the SAME quantized coefficients as baseline,
    so all three modes must decode bit-identically: the strict
    cross-mode oracle for the multi-scan / EOBRUN / correction-bit
    machinery. Noise images stress the refinement paths (the
    gradient-only form missed a ZRL/correction-bit ordering bug)."""
    import numpy as np

    from openetl_spark.operators.media_synth import encode_jpeg

    yy, xx = np.meshgrid(np.arange(23), np.arange(37), indexing="ij")
    grad = np.stack(
        [xx * 6 % 256, yy * 10 % 256, (xx + yy) * 3 % 256], axis=-1
    ).astype(np.uint8)
    noise = np.random.RandomState(15).randint(
        0, 256, size=(13, 25, 3)
    ).astype(np.uint8)
    for img in (grad, noise):
        for sub in ("444", "420", "422", "gray"):
            src = img[..., 0] if sub == "gray" else img
            base = M.decode_jpeg_pixels(
                encode_jpeg(src, quality=85, subsampling=sub)
            )
            for mode in (True, "sa"):
                prog = M.decode_jpeg_pixels(
                    encode_jpeg(src, quality=85, subsampling=sub,
                                progressive=mode)
                )
                assert prog is not None and prog[3] == base[3], (sub, mode)
    img = grad
    # header parser reads SOF2 dims
    data = encode_jpeg(img, progressive=True)
    assert M.parse_image_header(data)[:3] == ("jpeg", 37, 23)


def test_progressive_jpeg_truncation_renders_completed_scans():
    """The format's coarse-to-fine property: a cut at a scan boundary
    renders the scans that completed (DC-only -> the classic blurry
    preview with the right per-block means), a cut inside a scan's
    entropy data is None, and corruption never raises."""
    import numpy as np

    from openetl_spark.operators.media_synth import encode_jpeg

    img = np.zeros((16, 16, 3), np.uint8)
    img[:8], img[8:] = 60, 190
    data = encode_jpeg(img, quality=90, progressive=True)
    # find the second SOS (end of the DC scan's entropy data)
    first_sos = data.index(b"\xff\xda")
    second_sos = data.index(b"\xff\xda", first_sos + 2)
    dc_only = M.decode_jpeg_pixels(data[:second_sos])
    assert dc_only is not None
    px = np.frombuffer(bytes(dc_only[3]), dtype=np.uint8).reshape(16, 16, 3)
    # DC-only: block means survive, so the two halves keep their levels
    assert abs(float(px[:8].mean()) - 60) < 6 and abs(float(px[8:].mean()) - 190) < 6
    # a cut INSIDE the DC scan's entropy data must be None
    assert M.decode_jpeg_pixels(data[: first_sos + 20]) is None
    rng = np.random.RandomState(1)
    for _ in range(40):
        c = bytearray(data)
        c[rng.randint(2, len(c))] = rng.randint(256)
        M.decode_jpeg_pixels(bytes(c))


def _ref_unigram(rows, max_len=4, min_count=2, iters=2):
    """Pure-Python unigram-LM reference (seed -> Viterbi hard-EM),
    mirroring Kudo 2018 with the operator's documented determinism
    contract (integer counts, char floor, fewest-pieces tie order)."""
    import math
    from collections import Counter

    from openetl_spark.operators.text import _viterbi_segment

    wf = Counter()
    for _, t in rows:
        for w in (t or "").split(" "):
            if w:
                wf[w] += 1
    seed = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for L in range(1, min(max_len, len(w) - i) + 1):
                seed[w[i : i + L]] += f
    chars = {ch for w in wf for ch in w}
    model = {
        p: n
        for p, n in seed.items()
        if n >= min_count or (len(p) == 1 and p in chars)
    }
    segs = {}
    for _ in range(iters):
        total = sum(model.values())
        logp = {p: math.log(c) - math.log(total) for p, c in model.items()}
        used = Counter()
        segs = {w: _viterbi_segment(w, logp, max_len) for w in wf}
        for w, f in wf.items():
            for piece in segs[w]:
                used[piece] += f
        model = {
            p: (max(used.get(p, 0), 1) if len(p) == 1 else used[p])
            for p in model
            if len(p) == 1 or used.get(p, 0) > 0
        }
    # final segmentation under the FINAL model (what unigram_encode sees)
    total = sum(model.values())
    logp = {p: math.log(c) - math.log(total) for p, c in model.items()}
    segs = {w: _viterbi_segment(w, logp, max_len) for w in wf}
    return model, segs


def test_unigram_train_matches_reference(spark):
    from openetl_spark.operators import text as X

    rows = [
        (0, "abab banana band"),
        (1, "banana ana nab"),
        (2, "abba ban band banana"),
        (3, ""),
        (4, "celestial celery cell"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = X.unigram_train(df, iters=2)
    want, _ = _ref_unigram(rows, iters=2)
    assert got == want
    # iters=1 differs from iters=2 (EM actually moves mass)
    assert X.unigram_train(df, iters=1) != got


def test_unigram_encode_matches_reference_and_roundtrips(spark):
    from openetl_spark.operators import text as X

    rows = [
        (0, "abab banana band"),
        (1, "banana ana nab"),
        (2, "abba ban band banana"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    model = X.unigram_train(df, iters=2)
    _, segs = _ref_unigram(rows, iters=2)
    enc = {r["doc_id"]: r for r in X.unigram_encode(df, model).collect()}
    for doc_id, text in rows:
        words = [w for w in text.split(" ") if w]
        want = [p for w in words for p in segs[w]]
        assert enc[doc_id]["unigram_tokens"] == want, doc_id
        assert enc[doc_id]["n_unigram_tokens"] == len(want)
        # lossless: concatenation reproduces the words
        assert "".join(want) == "".join(words)


def test_unigram_seed_counts_weighted_occurrences(spark):
    """'aaa' contributes TWO occurrences of 'aa' per appearance and
    freq-weights multiply in — occurrence counts, not distinct."""
    from openetl_spark.operators import text as X

    df = spark.createDataFrame(
        [(0, "aaa aaa"), (1, "aaa")], "doc_id int, text string"
    )
    got = {
        r["piece"]: r["n"]
        for r in X.unigram_seed_counts(df, max_len=3).collect()
    }
    assert got == {"a": 9, "aa": 6, "aaa": 3}


def test_funnel_steps_strict_order_and_window(spark):
    """Strict ordering: a user whose purchase PRECEDES the click must
    not count as converted; the journey window drops slow converters;
    conversion microseconds are exact."""
    from openetl_spark.operators import analytics as A

    rows = [
        # u1 converts fully, in order, within window
        (1, "signup", "2024-01-01 00:00:00"),
        (1, "view", "2024-01-01 01:00:00"),
        (1, "buy", "2024-01-01 02:00:00"),
        # u2: buy BEFORE view — must stop at signup+view? No: view at
        # 03:00, buy at 01:00 only; no buy after view -> stops at view
        (2, "signup", "2024-01-01 00:00:00"),
        (2, "buy", "2024-01-01 01:00:00"),
        (2, "view", "2024-01-01 03:00:00"),
        # u3: converts but outside the 1-day window
        (3, "signup", "2024-01-01 00:00:00"),
        (3, "view", "2024-01-01 05:00:00"),
        (3, "buy", "2024-01-03 00:00:00"),
        # u4 never signs up
        (4, "view", "2024-01-01 00:00:00"),
        (4, "buy", "2024-01-01 01:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_type string, t string").select(
        "user_id", "event_type", F.col("t").cast("timestamp").alias("ts")
    )
    got = {
        r["step"]: (r["step_idx"], r["n_users"], r["sum_conv_usec"])
        for r in A.funnel_steps(
            df, ["signup", "view", "buy"], window_sec=86400
        ).collect()
    }
    assert got["signup"] == (1, 3, 0)
    # u1 (1h), u2 (3h), u3 (5h) all reach view: 9h total = 32400s
    assert got["view"] == (2, 3, 32400 * 1_000_000)
    # only u1 buys after its view inside the window: 2h
    assert got["buy"] == (3, 1, 7200 * 1_000_000)
    import pytest

    with pytest.raises(ValueError, match="steps"):
        A.funnel_steps(df, ["signup"])
    with pytest.raises(ValueError, match="duplicate"):
        A.funnel_steps(df, ["signup", "signup"])


def test_funnel_steps_empty_step_still_yields_zero_row(spark):
    """One row per step even when a step's converted-user set is
    EMPTY (ADVICE r10): the ungrouped funnel must emit n_users=0 for
    a step nobody reaches — the oracle's scalar subqueries always do,
    and the docstring promises one row per step."""
    from openetl_spark.operators import analytics as A

    rows = [
        (1, "signup", "2024-01-01 00:00:00"),
        (1, "view", "2024-01-01 01:00:00"),
        # nobody ever emits "buy" at all, and "ship" never appears
        (2, "signup", "2024-01-02 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_type string, t string"
    ).select(
        "user_id", "event_type", F.col("t").cast("timestamp").alias("ts")
    )
    got = {
        r["step"]: (r["step_idx"], r["n_users"], r["sum_conv_usec"])
        for r in A.funnel_steps(
            df, ["signup", "view", "buy", "ship"], window_sec=86400
        ).collect()
    }
    assert got["signup"] == (1, 2, 0)
    assert got["view"] == (2, 1, 3600 * 1_000_000)
    assert got["buy"] == (3, 0, 0)
    assert got["ship"] == (4, 0, 0)
    # grouped mode keeps GROUP BY semantics: empty (segment, step)
    # combinations drop, matching the grouped oracle.
    seg = df.withColumn("seg", F.lit("A"))
    grouped = A.funnel_steps(
        seg, ["signup", "view", "buy"], window_sec=86400, group_col="seg"
    ).collect()
    assert {(r["step"], r["n_users"]) for r in grouped} == {
        ("signup", 2),
        ("view", 1),
    }


# ------------------------------------------- clustering agreement


def _py_agreement(assignments):
    """Reference ARI ingredients from (cluster, label) rows."""
    from collections import Counter

    cells = Counter(assignments)
    rows = Counter()
    cols = Counter()
    for (c, l), m in cells.items():
        rows[c] += m
        cols[l] += m
    n = sum(cells.values())
    c2 = lambda x: x * (x - 1) // 2  # noqa: E731
    s = sum(c2(m) for m in cells.values())
    a = sum(c2(m) for m in rows.values())
    b = sum(c2(m) for m in cols.values())
    npairs = c2(n)
    return {
        "n": n, "pairs_total": npairs, "pairs_both": s,
        "pairs_pred": a, "pairs_true": b,
        "ari_num": 2 * (npairs * s - a * b),
        "ari_den": npairs * (a + b) - 2 * a * b,
    }


def test_cluster_agreement_matches_python_reference(spark):
    import random

    rng = random.Random(19)
    rows = [(rng.randrange(4), rng.randrange(3)) for _ in range(200)]
    df = spark.createDataFrame(rows, "list_id int, label int")
    got = S.cluster_agreement(df, "list_id", "label").collect()
    assert len(got) == 1
    r = got[0]
    want = _py_agreement(rows)
    for k, v in want.items():
        assert r[k] == v, (k, r[k], v)
    assert r["mi_nonneg"] and r["mi_le_min_entropy"]


def test_cluster_agreement_perfect_clustering_is_ari_one(spark):
    rows = [(i % 5, i % 5) for i in range(120)]
    df = spark.createDataFrame(rows, "list_id int, label int")
    r = S.cluster_agreement(df, "list_id", "label").collect()[0]
    # clusters identical to labels: the exact rational equals 1
    assert r["ari_num"] == r["ari_den"] != 0


def test_cluster_contingency_cells_and_marginals(spark):
    rows = [(0, 0), (0, 0), (0, 1), (1, 1), (1, 1), (1, 1)]
    df = spark.createDataFrame(rows, "list_id int, label int")
    got = {
        (r["list_id"], r["label"]): (
            r["n_cell"], r["n_cluster"], r["n_label"]
        )
        for r in S.cluster_contingency(df, "list_id", "label").collect()
    }
    assert got == {
        (0, 0): (2, 3, 2),
        (0, 1): (1, 3, 4),
        (1, 1): (3, 3, 4),
    }


# ------------------------------------------- NMI micro-nat dictionary


def test_contingency_micronat_dict_matches_float_mi():
    """The integer micro-nat sums approximate n·MI / n·H within the
    documented 0.5-micro-nat-per-count rounding envelope, on random
    contingency grids."""
    import math
    import random

    from collections import Counter

    for seed in (3, 11, 19):
        rng = random.Random(seed)
        assignments = [
            (rng.randrange(4), rng.randrange(3)) for _ in range(300)
        ]
        cells = [
            (c, l, m) for (c, l), m in Counter(assignments).items()
        ]
        fitted = {
            (k, a, b): mn
            for k, a, b, mn in S.contingency_micronat_dict(cells)
        }
        rows = Counter()
        cols = Counter()
        for c, l, m in cells:
            rows[c] += m
            cols[l] += m
        n = sum(rows.values())
        mi_micro = sum(m * fitted[("cell", c, l)] for c, l, m in cells)
        hu_micro = sum(a * fitted[("row", c, -1)] for c, a in rows.items())
        hv_micro = sum(b * fitted[("col", l, -1)] for l, b in cols.items())
        mi = sum(
            (m / n) * math.log(n * m / (rows[c] * cols[l]))
            for c, l, m in cells
        )
        hu = -sum((a / n) * math.log(a / n) for a in rows.values())
        hv = -sum((b / n) * math.log(b / n) for b in cols.values())
        # each count contributes <= 0.5 micro-nat of rounding error
        assert abs(mi_micro - 10**6 * n * mi) <= 0.5 * n + 1
        assert abs(hu_micro - 10**6 * n * hu) <= 0.5 * n + 1
        assert abs(hv_micro - 10**6 * n * hv) <= 0.5 * n + 1
        # NMI lands in [0, 1] (+ rounding slack) after the one division
        if hu_micro + hv_micro > 0:
            nmi = 2 * mi_micro / (hu_micro + hv_micro)
            assert -1e-3 <= nmi <= 1 + 1e-3


def test_contingency_micronat_dict_hand_case():
    """Independent 2x2 grid: every cell log-ratio is ln(1) = 0, the
    marginal micro-nats are exactly round(1e6 * ln 2)."""
    cells = [(0, 0, 1), (0, 1, 1), (1, 0, 1), (1, 1, 1)]
    fitted = dict(
        ((k, a, b), mn)
        for k, a, b, mn in S.contingency_micronat_dict(cells)
    )
    import math

    ln2 = round(10**6 * math.log(2))
    assert fitted[("cell", 0, 0)] == 0
    assert fitted[("cell", 1, 1)] == 0
    assert fitted[("row", 0, -1)] == ln2
    assert fitted[("col", 1, -1)] == ln2


def test_contingency_micronat_dict_validation():
    with pytest.raises(ValueError, match="scale"):
        S.contingency_micronat_dict([(0, 0, 1)], scale=0)
    with pytest.raises(ValueError, match="empty cell"):
        S.contingency_micronat_dict([(0, 0, 0)])


def test_cluster_nmi_report_perfect_and_independent(spark, tmp_path, monkeypatch):
    """End-to-end property on the engine side: a perfect clustering
    has mi_micro ~ hu_micro = hv_micro (NMI ~ 1); an independent grid
    has mi_micro ~ 0. Uses the fit + exact-bigint sum path directly
    (the catalog query wires the same pieces to the IVF layout)."""
    from collections import Counter

    import math

    def micro_sums(assignments):
        cells = [
            (c, l, m) for (c, l), m in Counter(assignments).items()
        ]
        fitted = {
            (k, a, b): mn
            for k, a, b, mn in S.contingency_micronat_dict(cells)
        }
        rows = Counter()
        cols = Counter()
        for c, l, m in cells:
            rows[c] += m
            cols[l] += m
        mi = sum(m * fitted[("cell", c, l)] for c, l, m in cells)
        hu = sum(a * fitted[("row", c, -1)] for c, a in rows.items())
        hv = sum(b * fitted[("col", l, -1)] for l, b in cols.items())
        return mi, hu, hv

    mi, hu, hv = micro_sums([(i % 5, i % 5) for i in range(200)])
    assert hu == hv
    assert abs(2 * mi / (hu + hv) - 1.0) < 1e-3  # NMI == 1
    mi, hu, hv = micro_sums(
        [(i % 2, (i // 2) % 2) for i in range(200)]
    )
    assert mi == 0  # exact independence: every cell ratio is ln(1)
    assert math.isclose(hu, 200 * round(10**6 * math.log(2)))


# ------------------------------------------- cohort retention


def test_cohort_retention_hand_case(spark):
    from openetl_spark.operators import analytics as A

    # grain_days=10: epoch-day buckets — 2024-01-08 is day 19730 =
    # start of bucket 1973; bucket 1974 starts 2024-01-18; bucket
    # 1976 starts 2024-02-07.
    rows = [
        # u1 signs up in bucket 1973, active there + bucket 1974
        (1, "signup", "2024-01-10 00:00:00"),
        (1, "view", "2024-01-20 00:00:00"),
        # u2 signs up in bucket 1973, active in-bucket only (incl. a
        # pre-signup same-bucket event: bucket grain counts period 0)
        (2, "view", "2024-01-08 00:00:00"),
        (2, "signup", "2024-01-12 00:00:00"),
        # u3 signs up in bucket 1974, active there + bucket 1976
        # (gap bucket emits no row)
        (3, "signup", "2024-01-19 00:00:00"),
        (3, "click", "2024-02-08 00:00:00"),
        # u4 never signs up: excluded entirely
        (4, "view", "2024-01-01 00:00:00"),
        # u2's PRE-cohort-bucket activity is excluded (period < 0)
        (2, "view", "2024-01-02 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_type string, t string"
    ).select(
        "user_id", "event_type", F.col("t").cast("timestamp").alias("ts")
    )
    got = {
        (r["cohort"], r["period"]): (
            r["n_cohort"], r["n_active"], r["retention"]
        )
        for r in A.cohort_retention(df, grain_days=10).collect()
    }
    assert got == {
        ("2024-01-08", 0): (2, 2, 1.0),
        ("2024-01-08", 1): (2, 1, 0.5),
        ("2024-01-18", 0): (1, 1, 1.0),
        ("2024-01-18", 2): (1, 1, 1.0),
    }
    import pytest

    with pytest.raises(ValueError, match="grain_days"):
        A.cohort_retention(df, grain_days=0)


# ------------------------------------------- recursive (c,l)-diversity


def test_l_diversity_recursive_hand_case(spark):
    from openetl_spark.operators import curation as C

    rows = (
        # group A: counts 5,2,2,1 -> r1=5, tail(l=3) = 2+1 = 3;
        # c=2: 5 < 6 -> satisfied
        [("A", "x")] * 5 + [("A", "y")] * 2 + [("A", "z")] * 2 + [("A", "w")]
        # group B: counts 8,1,1 -> tail = 1; 8 < 2 -> fails
        + [("B", "x")] * 8 + [("B", "y")] + [("B", "z")]
        # group C: only 2 distinct values -> empty tail, fails
        + [("C", "x")] * 3 + [("C", "y")] * 3
    )
    df = spark.createDataFrame(rows, "g string, s string")
    got = {
        r["g"]: (
            r["n"], r["n_distinct"], r["r1"], r["tail_sum"], r["satisfied"]
        )
        for r in C.l_diversity_recursive(
            df, ["g"], "s", l=3, c_num=2, c_den=1
        ).collect()
    }
    assert got == {
        "A": (10, 4, 5, 3, True),
        "B": (10, 3, 8, 1, False),
        "C": (6, 2, 3, 0, False),
    }


def test_l_diversity_recursive_validation(spark):
    from openetl_spark.operators import curation as C

    df = spark.createDataFrame([("A", "x")], "g string, s string")
    with pytest.raises(ValueError, match="qi_cols"):
        C.l_diversity_recursive(df, [], "s")
    with pytest.raises(ValueError, match="l >= 2"):
        C.l_diversity_recursive(df, ["g"], "s", l=1)


# ------------------------------------------- RFM segmentation


def test_rfm_scores_matches_python_reference(spark):
    import datetime as dt
    import random

    from openetl_spark.operators import analytics as A

    rng = random.Random(23)
    rows = []
    for ok in range(200):
        cust = rng.randrange(40)
        day = dt.datetime(2024, 1, 1) + dt.timedelta(days=rng.randrange(300))
        price = round(rng.uniform(10, 5000), 2)
        rows.append((ok, cust, day, price))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double"
    )

    # pure-python reference: per-customer triple, SQL-standard ntile
    per = {}
    for _, cust, day, price in rows:
        last, f, m = per.get(cust, (None, 0, 0))
        last = day.date() if last is None or day.date() > last else last
        per[cust] = (last, f + 1, m + round(price * 100))
    ref_d = max(v[0] for v in per.values())

    def ntile(order, k):
        n = len(order)
        big, size = n % k, n // k
        out, i = {}, 0
        for t in range(1, k + 1):
            width = size + 1 if t <= big else size
            for c in order[i:i + width]:
                out[c] = t
            i += width
        return out

    custs = sorted(per)
    r_days = {c: (ref_d - per[c][0]).days for c in custs}
    rt = ntile(sorted(custs, key=lambda c: (r_days[c], c)), 3)
    ft = ntile(sorted(custs, key=lambda c: (-per[c][1], c)), 3)
    mt = ntile(sorted(custs, key=lambda c: (-per[c][2], c)), 3)

    got = {
        r["custkey"]: (
            r["r_days"], r["f_orders"], r["m_cents"],
            r["r_tile"], r["f_tile"], r["m_tile"], r["segment"],
        )
        for r in A.rfm_scores(df).collect()
    }
    want = {
        c: (
            r_days[c], per[c][1], per[c][2], rt[c], ft[c], mt[c],
            f"R{rt[c]}F{ft[c]}M{mt[c]}",
        )
        for c in custs
    }
    assert got == want
    import pytest

    with pytest.raises(ValueError, match="n_tiles"):
        A.rfm_scores(df, n_tiles=1)


# ------------------------------------------- association rules


def test_association_rules_hand_case(spark):
    from openetl_spark.operators import analytics as A

    rows = [
        (1, "A"), (1, "B"), (1, "C"),
        (2, "A"), (2, "B"),
        (3, "B"), (3, "C"),
        (4, "A"),
        (4, "A"),  # duplicate line in one basket: distinct-counted once
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["antecedent"], r["consequent"]): (
            r["n_both"], r["n_ante"], r["n_cons"], r["n_baskets"],
            r["confidence"], r["lift_num"], r["lift_den"],
        )
        for r in A.association_rules(
            df, "basket", "item", min_support=2
        ).collect()
    }
    assert got == {
        ("A", "B"): (2, 3, 3, 4, 2 / 3, 8, 9),
        ("B", "A"): (2, 3, 3, 4, 2 / 3, 8, 9),
        ("B", "C"): (2, 3, 2, 4, 2 / 3, 8, 6),
        ("C", "B"): (2, 2, 3, 4, 1.0, 8, 6),
    }
    import pytest

    with pytest.raises(ValueError, match="min_support"):
        A.association_rules(df, "basket", "item", min_support=0)


def _py_rules_k3(rows, min_support):
    """Brute-force level-3 rules: enumerate EVERY item triple, count
    basket support directly, keep support >= min_support — no
    A-priori pruning, which is exactly what makes it a differential
    for the pruned operator."""
    from itertools import combinations

    baskets = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    items = sorted({i for _, i in rows})
    n_baskets = len(baskets)
    item_sup = {
        i: sum(1 for s in baskets.values() if i in s) for i in items
    }
    pair_sup = {
        (a, b): sum(1 for s in baskets.values() if a in s and b in s)
        for a, b in combinations(items, 2)
    }
    out = {}
    for x, y, z in combinations(items, 3):
        n3 = sum(
            1 for s in baskets.values() if x in s and y in s and z in s
        )
        if n3 < min_support:
            continue
        for aa, ab, c in ((x, y, z), (x, z, y), (y, z, x)):
            n_ante = pair_sup[(aa, ab)]
            out[(aa, ab, c)] = (
                n3, n_ante, item_sup[c], n_baskets,
                n3 / n_ante, n3 * n_baskets, n_ante * item_sup[c],
            )
    return out


@pytest.mark.parametrize("seed", [5, 23])
def test_association_rules_k3_matches_bruteforce(spark, seed):
    """A-priori candidate generation + TID-list counting produces
    exactly the triples an exhaustive enumeration finds."""
    import random

    from openetl_spark.operators import analytics as A

    rng = random.Random(seed)
    rows = list(
        {
            (rng.randrange(12), rng.randrange(8))
            for _ in range(70)
        }
    )
    df = spark.createDataFrame(rows, "basket long, item long")
    got = {
        (r["ante_a"], r["ante_b"], r["consequent"]): (
            r["n_triple"], r["n_ante"], r["n_cons"], r["n_baskets"],
            r["confidence"], r["lift_num"], r["lift_den"],
        )
        for r in A.association_rules_k3(
            df, "basket", "item", min_support=2
        ).collect()
    }
    want = _py_rules_k3(rows, min_support=2)
    assert got == want
    assert got, "gadget produced no frequent triples"


def test_association_rules_k3_hand_case(spark):
    """Baskets {A,B,C} x2 + {A,B}: the only frequent triple is
    (A,B,C) with support 2; rule {A,B}->C has confidence 2/3."""
    from openetl_spark.operators import analytics as A

    rows = [
        (1, "A"), (1, "B"), (1, "C"),
        (2, "A"), (2, "B"), (2, "C"),
        (3, "A"), (3, "B"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["ante_a"], r["ante_b"], r["consequent"]): (
            r["n_triple"], r["n_ante"], r["n_cons"], r["confidence"],
            r["lift_num"], r["lift_den"],
        )
        for r in A.association_rules_k3(
            df, "basket", "item", min_support=2
        ).collect()
    }
    assert got == {
        ("A", "B", "C"): (2, 3, 2, 2 / 3, 6, 6),
        ("A", "C", "B"): (2, 2, 3, 1.0, 6, 6),
        ("B", "C", "A"): (2, 2, 3, 1.0, 6, 6),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_support"):
        A.association_rules_k3(df, "basket", "item", min_support=0)


def _mk_events(spark, seqs):
    """seqs: {user: [event_type, ...]} → an events-shaped DataFrame
    with one event per second so (ts, event_id) ordering is pinned."""
    import datetime as dt

    rows, eid = [], 0
    for u, types in seqs.items():
        for i, t in enumerate(types):
            rows.append(
                (eid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), u, t)
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )


def test_markov_transition_counts_journey_split(spark):
    from openetl_spark.operators import analytics as A

    # A purchase mid-stream ends the journey: the next touch enters
    # from START, and a stream ending on a touch absorbs into NULL.
    e = _mk_events(spark, {1: ["A", "purchase", "B"]})
    got = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in A.markov_transition_counts(e).collect()
    }
    assert got == {
        ("START", "A"): 1,
        ("A", "CONV"): 1,
        ("START", "B"): 1,
        ("B", "NULL"): 1,
    }
    # Direct conversion (purchase with no preceding touch) and
    # back-to-back purchases both render as START->CONV.
    e2 = _mk_events(spark, {1: ["purchase", "purchase"]})
    got2 = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in A.markov_transition_counts(e2).collect()
    }
    assert got2 == {("START", "CONV"): 2}


def test_markov_attribution_hand_chain(spark):
    from openetl_spark.operators import analytics as A
    from openetl_spark.operators.analytics import MARKOV_K

    # Half the journeys go START->A->CONV, half START->B->NULL: the
    # base conversion probability is exactly 1/2, channel A carries
    # ALL of it (remove A -> 0), channel B carries none.
    e = _mk_events(spark, {1: ["A", "purchase"], 2: ["B"]})
    got = {r["channel"]: r for r in A.markov_attribution(e).collect()}
    a, b = got["A"], got["B"]
    assert a["base_p_k"] == MARKOV_K // 2 == b["base_p_k"]
    assert a["removal_p_k"] == 0 and a["effect_k"] == MARKOV_K // 2
    assert b["removal_p_k"] == MARKOV_K // 2 and b["effect_k"] == 0
    assert a["share"] == 1.0 and b["share"] == 0.0
    assert a["n_in"] == 1 and b["n_in"] == 1


def test_markov_attribution_symmetric_channels(spark):
    from openetl_spark.operators import analytics as A

    # Two channels with mirror-image journeys must earn identical
    # fixed-point credit (the arithmetic is deterministic, so this is
    # exact equality, not approximate).
    e = _mk_events(
        spark,
        {
            1: ["A", "B", "purchase"],
            2: ["B", "A", "purchase"],
            3: ["A"],
            4: ["B"],
        },
    )
    got = {r["channel"]: r for r in A.markov_attribution(e).collect()}
    assert got["A"]["effect_k"] == got["B"]["effect_k"] > 0
    assert got["A"]["share"] == got["B"]["share"] == 0.5
    # Conversion estimate: journeys convert iff they reach the second
    # touch; the chain's estimate must sit strictly between 0 and 1.
    assert 0 < got["A"]["base_p_k"] < A.MARKOV_K


def test_discrete_laplace_thresholds_properties():
    import math

    import pytest as _pytest

    from openetl_spark.operators.curation import discrete_laplace_thresholds

    t = discrete_laplace_thresholds()
    assert [r[0] for r in t] == list(range(-64, 65))
    # exact partition of [0, 2^60): contiguous, endpoint pinned
    assert t[0][1] == 0 and t[-1][2] == 1 << 60
    for (_, _, h1), (_, l2, _) in zip(t, t[1:]):
        assert h1 == l2
    w = {k: h - l for k, l, h in t}
    # mode at 0, geometric decay at rate e^-1, symmetric to float
    # accumulation drift (~1e-15 relative of 2^60)
    assert w[0] == max(w.values())
    assert abs(w[1] / w[0] - math.exp(-1)) < 1e-9
    for k in range(1, 65):
        assert abs(w[k] - w[-k]) <= 4096, k
    with _pytest.raises(ValueError, match="eps_micro"):
        discrete_laplace_thresholds(eps_micro=0)


def test_dp_histogram_release_hand(spark):
    from openetl_spark.operators.curation import (
        discrete_laplace_thresholds,
        dp_histogram_release,
        dp_uniform,
    )

    bounds = spark.createDataFrame(
        discrete_laplace_thresholds(), "k long, lo long, hi long"
    )
    df = spark.createDataFrame(
        [("a",)] * 7 + [("b",)] * 3, "g string"
    )
    got = {r["g"]: r for r in dp_histogram_release(
        df, ["g"], bounds
    ).collect()}
    assert got["a"]["n"] == 7 and got["b"]["n"] == 3
    for r in got.values():
        # released = n + noise exactly; noise inside the truncation
        assert r["released"] == r["n"] + r["noise_k"]
        assert -64 <= r["noise_k"] <= 64
        assert r["released_nonneg"] == max(r["released"], 0)
    # determinism: same key, same salt -> identical noise on re-run
    again = {r["g"]: r["noise_k"] for r in dp_histogram_release(
        df, ["g"], bounds
    ).collect()}
    assert again == {g: r["noise_k"] for g, r in got.items()}
    # a different salt redraws the noise somewhere across many keys
    many = spark.createDataFrame(
        [(f"k{i}",) for i in range(40)], "g string"
    )
    u1 = many.select(dp_uniform(F.col("g"), "dp_v1").alias("u")).collect()
    u2 = many.select(dp_uniform(F.col("g"), "other").alias("u")).collect()
    assert [r["u"] for r in u1] != [r["u"] for r in u2]
    # uniforms cover the full 2^60 range domain
    assert all(0 <= r["u"] < 1 << 60 for r in u1)


def test_ewma_fixed_point_hand(spark):
    import pytest as _pytest

    from openetl_spark.operators import timeseries as T

    import datetime as dt

    rows = [
        # series 1, deliberately OUT of ts order in the input
        (1, dt.datetime(2024, 1, 1, 0, 0, 2), 102, 3),
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 100, 10),
        (1, dt.datetime(2024, 1, 1, 0, 0, 1), 101, 5),
        # series 2: single point
        (2, dt.datetime(2024, 1, 1), 200, 7),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, xi long"
    )
    got = {
        r["event_id"]: r["ewma_k"]
        for r in T.ewma_fixed_point(df, "user_id", ("ts", "event_id"), "xi")
        .collect()
    }
    k = 1 << 20
    s1 = 10 * k
    s2 = (5 * k + s1) // 2
    s3 = (3 * k + s2) // 2
    assert got == {100: s1, 101: s2, 102: s3, 200: 7 * k}
    # alpha = 1/4 weights the history 3x
    got4 = {
        r["event_id"]: r["ewma_k"]
        for r in T.ewma_fixed_point(
            df, "user_id", ("ts", "event_id"), "xi", alpha_num=1, alpha_den=4
        ).collect()
    }
    t2 = (1 * 5 * k + 3 * (10 * k)) // 4
    assert got4[101] == t2 and got4[100] == 10 * k
    # guards: negative input raises in the scan; bad alpha up front
    neg = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, -3)],
        "user_id long, ts timestamp_ntz, event_id long, xi long",
    )
    with _pytest.raises(Exception, match="negative input"):
        T.ewma_fixed_point(neg, "user_id", ("ts", "event_id"), "xi").collect()
    with _pytest.raises(ValueError, match="alpha"):
        T.ewma_fixed_point(df, "user_id", ("ts", "event_id"), "xi",
                           alpha_num=3, alpha_den=2)


def test_cusum_fixed_point_hand(spark):
    import datetime as dt

    from openetl_spark.operators import timeseries as T

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, i), 100 + i, x)
        for i, x in enumerate([5, -20, 8, 9, -1])
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, xi long"
    )
    got = {
        r["event_id"]: (r["cusum_g"], r["alarm"])
        for r in T.cusum_fixed_point(
            df, "user_id", ("ts", "event_id"), "xi",
            target=0, slack=2, threshold=10,
        ).collect()
    }
    # g: max(0, 0+5-2)=3; max(0,3-20-2)=0; 0+8-2=6; 6+9-2=13>thr; 13-1-2=10
    assert got == {
        100: (3, False), 101: (0, False), 102: (6, False),
        103: (13, True), 104: (10, False),
    }
    # the statistic clamps at zero, never negative, on any input
    assert all(g >= 0 for g, _ in got.values())


def test_cooccurrence_edges_hand(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "c c a")], "doc_id long, text string"
    )
    got = {
        (r["src"], r["dst"]): r["w"]
        for r in X.cooccurrence_edges(df).collect()
    }
    # doc1 gap1: ab ba ab; gap2: aa bb (self, dropped)
    # doc2 gap1: cc (self, dropped) ca; gap2: ca
    expect = {
        ("a", "b"): 3, ("b", "a"): 3,
        ("c", "a"): 2, ("a", "c"): 2,
    }
    assert got == expect
    # symmetric by construction
    assert all(got[(b, a)] == w for (a, b), w in got.items())
    # window=1 drops the gap-2 pairs
    got1 = {
        (r["src"], r["dst"]): r["w"]
        for r in X.cooccurrence_edges(df, window=1).collect()
    }
    assert got1 == {("a", "b"): 3, ("b", "a"): 3, ("c", "a"): 1, ("a", "c"): 1}
    with _pytest.raises(ValueError, match="window"):
        X.cooccurrence_edges(df, window=0)


def test_holt_fixed_point_hand(spark):
    import datetime as dt

    import pytest as _pytest

    from openetl_spark.operators import timeseries as T
    from openetl_spark.operators.timeseries import HOLT_SHIFT

    def fdiv(y, d):
        return (y + HOLT_SHIFT * d) // d - HOLT_SHIFT

    k = 1 << 20
    # a falling series: the trend numerator goes NEGATIVE
    xs = [10, 4, 2, 8]
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, i), 100 + i, x)
        for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, xi long"
    )
    got = {
        r["event_id"]: (r["level_k"], r["trend_k"])
        for r in T.holt_fixed_point(
            df, "user_id", ("ts", "event_id"), "xi"
        ).collect()
    }
    lv, tr, expect = None, 0, {}
    for i, x in enumerate(xs):
        if lv is None:
            lv = x * k
        else:
            prev = lv
            lv = fdiv(x * k + lv + tr, 2)
            tr = fdiv((lv - prev) + tr, 2)
        expect[100 + i] = (lv, tr)
    assert got == expect
    # the falling steps really produced a negative trend (the branch
    # where python-// and SQL-// would diverge without the shift)
    assert any(t < 0 for _, t in got.values())
    # floor identity: fdiv equals python's floor division everywhere
    for y in (-7, -1, 0, 1, 7):
        assert fdiv(y, 2) == y // 2
    with _pytest.raises(ValueError, match="beta"):
        T.holt_fixed_point(df, "user_id", ("ts", "event_id"), "xi",
                           beta=(3, 2))
