"""Unit tests for dataset-curation operators (operators/curation.py):
edge cases the corpus-level oracle tests don't isolate."""

import pytest
from pyspark.sql import functions as F

from openetl_spark.operators import curation as C


def test_ngrams_short_docs_empty(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e"), (3, "a b"), (4, ""), (5, "   ")],
        ["id", "text"],
    )
    rows = {
        r["id"]: r["g"]
        for r in df.select("id", C.ngrams(F.col("text"), 5).alias("g")).collect()
    }
    assert rows[1] == ["a b c d e", "b c d e f"]
    assert rows[2] == ["a b c d e"]
    assert rows[3] == [] and rows[4] == [] and rows[5] == []


def test_hash_bucket_deterministic_and_in_range(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], ["id"])
    b1 = df.select(C.hash_bucket(F.col("id"), 100).alias("b")).collect()
    b2 = df.select(C.hash_bucket(F.col("id"), 100).alias("b")).collect()
    assert b1 == b2
    vals = [r["b"] for r in b1]
    assert all(0 <= v < 100 for v in vals)
    assert len(set(vals)) > 50  # spreads, not constant


def test_stratified_sample_rate_zero_excludes_and_is_stable(spark):
    rows = [(i, "en" if i % 2 else "fr") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = C.stratified_sample(df, {"en": 0.5}, "lang", "doc_id").collect()
    langs = {r["lang"] for r in out}
    assert langs == {"en"}  # default_rate=0 excludes fr entirely
    n = len(out)
    assert 60 <= n <= 140  # ~50% of 200, loose band
    out2 = C.stratified_sample(df, {"en": 0.5}, "lang", "doc_id").collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in out2)
    # rate 1.0 keeps everything in the stratum
    full = C.stratified_sample(df, {"en": 1.0}, "lang", "doc_id").count()
    assert full == 200


def test_decontaminate_flags_only_overlapping_docs(spark):
    ev = spark.createDataFrame([(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"])
    tr = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon other words here"),  # shares 2 5-grams
            (2, "completely unrelated text with many distinct tokens"),
            (3, "too short"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in C.decontaminate(tr, ev, n=5).collect()}
    assert set(out) == {1}
    # doc 1 has 4 distinct 5-grams; only 'alpha beta gamma delta epsilon'
    # appears in the eval set
    assert out[1]["n_shared"] == 1
    assert abs(out[1]["contamination_frac"] - 0.25) < 1e-9


def test_pack_sequences_bin_boundaries(spark):
    # 4 docs of 3 tokens each, budget 6 → bins: before=0,3 -> bin0; 6,9 -> bin1
    df = spark.createDataFrame(
        [(i, "g", "t t t") for i in range(1, 5)], ["doc_id", "lang", "text"]
    )
    out = {
        (r["lang"], r["bin_id"]): r
        for r in C.pack_sequences(df, budget=6, group_col="lang").collect()
    }
    assert out[("g", 0)]["n_docs"] == 2 and out[("g", 0)]["bin_tokens"] == 6
    assert out[("g", 0)]["first_doc"] == 1 and out[("g", 0)]["last_doc"] == 2
    assert out[("g", 1)]["n_docs"] == 2 and out[("g", 1)]["first_doc"] == 3


def test_pack_sequences_oversized_doc_spans(spark):
    # doc of 10 tokens with budget 4: doc1 bin0; doc2 starts at floor(10/4)=2
    df = spark.createDataFrame(
        [(1, "g", " ".join(["t"] * 10)), (2, "g", "t t")], ["doc_id", "lang", "text"]
    )
    out = {r["bin_id"]: r for r in C.pack_sequences(df, budget=4, group_col="lang").collect()}
    assert set(out) == {0, 2}
    assert out[2]["n_docs"] == 1 and out[2]["first_doc"] == 2


def test_pack_sequences_sharded_conserves_and_is_shard_pure(spark, sf_dir):
    """The (group, shard)-keyed scale path must pack the same corpus
    mass as the single-key path — same doc count and token total per
    group — with globally unique bin ids, every bin shard-pure, and
    within-shard bins matching a per-shard single-key run exactly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    single = C.pack_sequences(docs, budget=512, group_col="lang").toPandas()
    sharded = C.pack_sequences(
        docs, budget=512, group_col="lang", n_shards=8
    ).toPandas()

    for frame in (single, sharded):
        assert not frame.duplicated(["lang", "bin_id"]).any()
    s1 = single.groupby("lang")[["n_docs", "bin_tokens"]].sum()
    s8 = sharded.groupby("lang")[["n_docs", "bin_tokens"]].sum()
    assert s1.equals(s8)

    # Per-shard equivalence: restricting the corpus to one shard and
    # packing it single-key must reproduce the sharded run's bins for
    # that shard (modulo the global offset).
    from openetl_spark.operators.curation import hash_bucket
    from pyspark.sql import functions as F

    keyed = F.concat_ws(":", F.lit("pack0"), F.col("doc_id").cast("string"))
    shard0 = docs.where(hash_bucket(keyed, 8) == 0)
    alone = C.pack_sequences(shard0, budget=512, group_col="lang").toPandas()
    for lang, grp in alone.groupby("lang"):
        got = sharded[sharded["lang"] == lang].sort_values("bin_id")
        # shard 0 has offset 0, so its bins are the first len(grp) bins
        head = got.head(len(grp)).reset_index(drop=True)
        exp = grp.sort_values("bin_id").reset_index(drop=True)
        assert head.equals(exp), lang


def test_pack_sequences_sharded_plan_has_no_group_only_window(spark, sf_dir):
    """The data-sized running window must be keyed (lang, shard): a
    window partitioned by lang alone is one task per language at
    100 TB. The only lang-only window allowed is the tiny shard-offset
    pass over the groups × shards aggregate."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        C.pack_sequences(
            docs, budget=512, group_col="lang", n_shards=8, materialize=False
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    # Running-sum windows order by doc_id; the tiny shard-offset window
    # orders by shard. Every doc_id-ordered (data-sized) window must be
    # partitioned by BOTH the group and the shard key.
    data_windows = [
        w
        for w in re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        if "doc_id" in w
    ]
    assert data_windows, plan
    for w in data_windows:
        assert "lang" in w and "shard" in w, w


def test_length_band_two_pass_equals_exact_window(spark, sf_dir):
    """The histogram+broadcast two-pass gate must be BIT-identical to
    the percent_rank window formulation — same membership and same
    len_pctile values — since both compute the same tie-atomic rank."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kw = dict(strata_col="source", id_col="doc_id", text_col="text")
    two = (
        C.length_band_filter(docs, 0.1, 0.95, **kw)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    win = (
        C.length_band_filter(docs, 0.1, 0.95, exact_window=True, **kw)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert two.equals(win)


def test_length_band_two_pass_plan_has_no_stratum_data_window(spark, sf_dir):
    """The two-pass plan's only window must ride on the post-aggregate
    histogram: no percent_rank/running window over the document-sized
    input partitioned by the stratum alone."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        C.length_band_filter(docs, 0.1, 0.95, materialize=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "percent_rank" not in plan
    assert "BroadcastHashJoin" in plan
    # windows appear only above the (source, n_tokens) aggregate
    import re

    for frag in re.findall(r"Window \[([^\]]*)\]", plan):
        assert "_cnt" in frag, frag


def test_length_band_single_row_stratum_gets_rank_zero(spark):
    df = spark.createDataFrame(
        [(1, "solo", "a b c"), (2, "big", "a"), (3, "big", "a b"), (4, "big", "a b c")],
        ["doc_id", "source", "text"],
    )
    out = {
        r["doc_id"]: r["len_pctile"]
        for r in C.length_band_filter(df, 0.0, 1.0, "source").collect()
    }
    exp = {
        r["doc_id"]: r["len_pctile"]
        for r in C.length_band_filter(
            df, 0.0, 1.0, "source", exact_window=True
        ).collect()
    }
    assert out == exp and out[1] == 0.0


def test_redact_pii_counts_and_replacement(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d+x@e.org, call 555-123-4567 now"),
            (2, "no pii here"),
        ],
        ["id", "text"],
    )
    out = {r["id"]: r for r in C.redact_pii(df, "text").collect()}
    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 1
    assert "[EMAIL]" in out[1]["redacted"] and "[PHONE]" in out[1]["redacted"]
    assert "a@b.com" not in out[1]["redacted"]
    assert out[2]["n_emails"] == 0 and out[2]["redacted"] == "no pii here"


def test_vocab_topk_order_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b a B"), (3, "c")], ["doc_id", "text"]
    )
    out = C.vocab_topk(df, "doc_id", "text", k=2).collect()
    # a: 3 occurrences in 2 docs; b: 3 in 2 docs (case-folded); tie → token asc
    assert [(r["token"], r["n_occurrences"], r["doc_freq"]) for r in out] == [
        ("a", 3, 2),
        ("b", 3, 2),
    ]


def test_quantize_embeddings_zero_vector_and_unit_norm(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], ["vec_id", "embedding"]
    )
    out = {r["vec_id"]: r for r in C.quantize_embeddings(df).collect()}
    assert out[1]["norm"] == 5.0
    assert out[1]["q8"] == [round(3 / 5 * 127), round(4 / 5 * 127)]
    assert out[2]["q8"] == [0, 0] and out[2]["norm"] == 0.0
    # int8 range: all components within [-127, 127]
    assert all(-127 <= v <= 127 for r in out.values() for v in r["q8"])


def test_vocab_sketch_exact_mode_matches_exact_topk(spark):
    """Capacity above the distinct-token count → SpaceSaving never
    evicts, so the sketch IS the exact count and lo == hi."""
    df = spark.createDataFrame(
        [(i, "x y " * (i % 3 + 1) + f"tok{i}") for i in range(40)],
        ["doc_id", "text"],
    ).repartition(4)
    exact = {
        r["token"]: r["n_occurrences"]
        for r in C.vocab_topk(df, "doc_id", "text", k=10).collect()
    }
    out = C.vocab_topk_sketch(df, "text", k=10, capacity=1000).collect()
    assert {r["token"]: r["n_occurrences"] for r in out} == exact
    assert all(r["lo"] == r["n_occurrences"] == r["hi"] for r in out)


def test_vocab_sketch_eviction_bounds_and_heavy_hitter_guarantee(spark):
    """Small capacity forces evictions: every emitted token's true
    count must sit within [lo, hi], and any token with true count
    > N/capacity must be present (the SpaceSaving guarantee holds
    per partition and survives the bound-merge)."""
    rows = []
    # heavy: 300 occurrences of 'hh' spread over docs; tail: singletons
    for i in range(100):
        rows.append((i, "hh hh hh tail%d uniq%d" % (i, i)))
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(5)
    n_tokens = 5 * 100  # 5 tokens per doc
    capacity = 8
    out = C.vocab_topk_sketch(df, "text", k=500, capacity=capacity).collect()
    got = {r["token"]: r for r in out}
    assert "hh" in got, "heavy hitter evicted despite count >> N/capacity"
    true = {"hh": 300}
    for i in range(100):
        true[f"tail{i}"] = 1
        true[f"uniq{i}"] = 1
    for r in out:
        t = true.get(r["token"], 0)
        assert r["lo"] <= t <= r["hi"], (
            f"{r['token']}: true {t} outside [{r['lo']}, {r['hi']}]"
        )
    # the heavy hitter's bounds must be usefully tight: lo ≥ exact share
    assert got["hh"]["lo"] >= 300 - 5 * (n_tokens // capacity)


def test_vocab_sketch_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  "), (4, "a a")],
        "doc_id int, text string",
    )
    out = C.vocab_topk_sketch(df, "text", k=5, capacity=100).collect()
    assert [(r["token"], r["n_occurrences"]) for r in out] == [("a", 2)]


def test_deterministic_shuffle_is_a_stable_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    a = C.deterministic_shuffle(df, "doc_id", seed="1", n_shards=4).collect()
    b = C.deterministic_shuffle(df, "doc_id", seed="1", n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # run-to-run stable
    # every row present exactly once; positions contiguous from 1 per shard
    assert sorted(r["doc_id"] for r in a) == list(range(200))
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # a different seed yields a genuinely different order
    c = C.deterministic_shuffle(df, "doc_id", seed="2", n_shards=4).collect()
    ord_a = [r["doc_id"] for r in sorted(a, key=lambda r: (r["shard"], r["pos_in_shard"]))]
    ord_c = [r["doc_id"] for r in sorted(c, key=lambda r: (r["shard"], r["pos_in_shard"]))]
    assert ord_a != ord_c


def test_cms_never_undercounts_and_is_tight_here(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = C.cms_token_estimates(docs, probe_k=50, depth=4, width=2048).toPandas()
    assert 20 <= len(out) <= 50  # capped by the corpus's distinct tokens
    assert (out["cms_est"] >= out["n_exact"]).all()
    # expected overcount per cell ~ N_tokens/width; with min-over-4-rows
    # the estimate should sit well inside 3x that on this corpus
    n_total = int(
        docs.selectExpr(
            "sum(size(filter(split(trim(text), '\\\\s+'), x -> x != ''))) AS n"
        ).first()["n"]
    )
    assert (out["cms_est"] - out["n_exact"] <= 3 * n_total / 2048 + 1).all()


def test_cms_cells_merge_across_corpus_splits(spark, sf_dir):
    """The cells relation IS the sketch: building it on two disjoint
    halves and summing cells must equal building it on the union —
    the mergeability that lets 100 TB shards sketch independently."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.transform(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != ""),
        F.lower,
    )
    ex = docs.select(F.col("doc_id"), F.explode(toks).alias("token"))

    def cells(frame):
        pos = F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    C.hash_bucket(
                        F.concat_ws(":", F.lit(f"cms{d}"), F.col("token")), 256
                    ).alias("pos"),
                )
                for d in range(2)
            ]
        )
        return (
            frame.select(F.explode(pos).alias("dp"))
            .select("dp.d", "dp.pos")
            .groupBy("d", "pos")
            .agg(F.count("*").alias("cell"))
        )

    whole = cells(ex).toPandas().set_index(["d", "pos"])["cell"]
    lo = cells(ex.where(F.col("doc_id") % 2 == 0)).toPandas().set_index(["d", "pos"])["cell"]
    hi = cells(ex.where(F.col("doc_id") % 2 == 1)).toPandas().set_index(["d", "pos"])["cell"]
    merged = lo.add(hi, fill_value=0).astype(int)
    assert merged.sort_index().equals(whole.sort_index())


def test_cms_width_guard():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="4096"):
        C.cms_token_estimates(None, width=8192)


def test_remove_boilerplate_lines(spark):
    from openetl_spark.operators.curation import remove_boilerplate_lines

    header, footer = "SITE NAV | home | about", "(c) 2024 example corp"
    docs = [
        (i, f"{header}\nunique content {i} line one\nmore {i}\n{footer}")
        for i in range(6)
    ]
    docs.append((100, f"{header}\n{footer}"))          # all boilerplate
    docs.append((200, "totally unique document"))       # untouched
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(df, min_docs=5).collect()
    }
    assert len(got) == 8                                # every doc kept
    for i in range(6):
        assert got[i] == f"unique content {i} line one\nmore {i}"  # order kept
    assert got[100] == ""                               # emptied, not dropped
    assert got[200] == "totally unique document"


def test_remove_boilerplate_lines_normalization(spark):
    from openetl_spark.operators.curation import remove_boilerplate_lines

    # case/whitespace variants of the same line count as one
    docs = [(i, f"  Cookie Notice \nbody {i}") for i in range(3)]
    docs += [(10 + i, f"cookie notice\nbody {10+i}") for i in range(3)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(df, min_docs=6).collect()
    }
    assert all(t.startswith("body ") for t in got.values()), got
    # without normalization the variants stay under the bar
    got2 = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(df, min_docs=6, normalize=False).collect()
    }
    assert any("ookie" in t for t in got2.values())


def test_per_group_sample_two_phase_equals_exact_window(spark, sf_dir):
    from openetl_spark import catalog
    from openetl_spark.operators.curation import per_group_sample

    d = catalog.load(spark, sf_dir, "documents")
    two = {(r["lang"], r["doc_id"])
           for r in per_group_sample(d, k=15, seed=7).collect()}
    exact = {(r["lang"], r["doc_id"])
             for r in per_group_sample(d, k=15, seed=7, exact_window=True).collect()}
    assert two == exact and len(two) > 0
    # per-group size is exactly min(k, group size); deterministic reruns
    from collections import Counter
    c = Counter(l for l, _ in two)
    sizes = {r["lang"]: r["n"] for r in
             d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(c[l] == min(15, sizes[l]) for l in sizes)
    again = {(r["lang"], r["doc_id"])
             for r in per_group_sample(d, k=15, seed=7).collect()}
    assert again == two
    # a different seed draws a different sample
    other = {(r["lang"], r["doc_id"])
             for r in per_group_sample(d, k=15, seed=8).collect()}
    assert other != two


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_remove_boilerplate_lines_random_vs_reference(spark, seed):
    """Randomized differential vs a pure-Python reference: random
    multi-line corpora with a shared line pool, arbitrary min_docs."""
    import random

    from openetl_spark.operators.curation import remove_boilerplate_lines

    rng = random.Random(seed)
    pool = [f"shared line {i}" for i in range(6)]
    docs = []
    for d in range(40):
        n = rng.randint(0, 6)
        lines = [
            rng.choice(pool) if rng.random() < 0.5 else f"unique {d}:{j}"
            for j in range(n)
        ]
        docs.append((d, "\n".join(lines)))
    min_docs = rng.randint(2, 8)

    # reference
    from collections import defaultdict
    seen = defaultdict(set)
    for d, t in docs:
        for ln in t.split("\n"):
            seen[ln.strip().lower()].add(d)
    boiler = {k for k, v in seen.items() if len(v) >= min_docs}
    exp = {
        d: "\n".join(
            ln for ln in t.split("\n") if ln.strip().lower() not in boiler
        )
        for d, t in docs
    }

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(df, min_docs=min_docs).collect()
    }
    assert got == exp


# ------------------------------------------------------- r08 operators

def test_ngram_lm_score_matches_pure_python(spark):
    import math

    docs = [(1, "a b a b"), (2, "a b c"), (3, "c c c c"), (4, "solo"), (5, "")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in C.ngram_lm_score(df, "doc_id", "text").collect()}

    # pure-python add-one bigram LM over the same corpus
    toks = {i: t.split() for i, t in docs}
    bigrams = [(w[j], w[j + 1]) for w in toks.values() for j in range(len(w) - 1)]
    c2: dict = {}
    c1: dict = {}
    for v, w_ in bigrams:
        c2[(v, w_)] = c2.get((v, w_), 0) + 1
        c1[v] = c1.get(v, 0) + 1
    vocab = len({t for w in toks.values() for t in w})
    for i, w in toks.items():
        pairs = [(w[j], w[j + 1]) for j in range(len(w) - 1)]
        if not pairs:
            assert i not in got  # <2 tokens → no row
            continue
        nll = -sum(
            math.log((c2[p] + 1.0) / (c1[p[0]] + vocab)) for p in pairs
        ) / len(pairs)
        assert got[i]["n_bigrams"] == len(pairs)
        assert abs(got[i]["nll"] - round(nll, 4)) < 1e-9


def test_kl_domain_shift_zero_for_identical_groups(spark):
    # two groups with the SAME token multiset → both p == smoothed
    # group distribution, corpus q has 2× counts but identical shape;
    # KL must be equal across groups and near zero
    rows = [(g, "x y z x") for g in ("a", "b") for _ in range(5)]
    df = spark.createDataFrame(rows, ["source", "text"])
    from openetl_spark.operators import text as X

    out = {r["source"]: r["kl"] for r in X.kl_domain_shift(df, "source", "text").collect()}
    assert set(out) == {"a", "b"}
    assert out["a"] == out["b"]
    assert abs(out["a"]) < 0.01


def test_kl_domain_shift_flags_divergent_group(spark):
    from openetl_spark.operators import text as X

    rows = [("norm", "the cat sat on the mat") for _ in range(10)]
    rows += [("weird", "zzz qqq vvv kkk jjj www") for _ in range(10)]
    df = spark.createDataFrame(rows, ["source", "text"])
    out = {r["source"]: r["kl"] for r in X.kl_domain_shift(df, "source", "text").collect()}
    assert out["weird"] > 0.1 and out["norm"] > 0.1  # both diverge from the mix
    # and each group's KL vs itself-only corpus would be ~0 (sanity via subset)
    solo = X.kl_domain_shift(
        df.filter(F.col("source") == "norm"), "source", "text"
    ).collect()[0]
    assert abs(solo["kl"]) < 0.01


def test_zipf_fit_matches_numpy_lstsq(spark):
    import numpy as np

    from openetl_spark.operators import text as X

    rows = [(i, ("alpha " * 8 + "beta " * 4 + "gamma " * 2 + f"tail{i}").strip())
            for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = X.zipf_fit(df, "text").collect()[0]
    # reference fit: counts → rank by (count desc, token) → log-log lstsq
    from collections import Counter

    cnt = Counter(t for _, txt in rows for t in txt.split())
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    lr = np.log(np.arange(1, len(ordered) + 1, dtype=float))
    lc = np.log(np.array([c for _, c in ordered], dtype=float))
    slope, intercept = np.polyfit(lr, lc, 1)
    assert out["vocab_size"] == len(ordered)
    assert abs(out["zipf_slope"] - round(float(slope), 4)) < 1e-3
    assert abs(out["zipf_intercept"] - round(float(intercept), 4)) < 1e-3
    assert out["zipf_slope"] < 0  # frequency falls with rank


def test_mix_to_target_hits_proportions_and_keeps_binding_group(spark):
    rows = [(i, "big" if i < 800 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "src"])
    out = C.mix_to_target(df, {"big": 0.5, "small": 0.5}, "src", "doc_id")
    got = out.groupBy("src").count().collect()
    counts = {r["src"]: r["count"] for r in got}
    # small (200 docs) binds at weight .5 → T = 400; big downsamples
    # to ~200; small keeps everything (rate 10000 bp)
    assert counts["small"] == 200
    assert abs(counts["big"] - 200) <= 30  # hash-sampling tolerance
    # deterministic membership
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in C.mix_to_target(df, {"big": 0.5, "small": 0.5}, "src", "doc_id").collect()
    )
    assert a == b
    # groups absent from target are dropped entirely
    df2 = spark.createDataFrame(
        rows + [(2000 + i, "junk") for i in range(50)], ["doc_id", "src"]
    )
    out2 = C.mix_to_target(df2, {"big": 0.5, "small": 0.5}, "src", "doc_id")
    assert out2.filter(F.col("src") == "junk").count() == 0


def test_perplexity_buckets_terciles_ordered_and_balanced(spark, sf_dir):
    from openetl_spark import catalog

    d = catalog.load(spark, sf_dir, "documents")
    out = C.perplexity_buckets(d, "doc_id", "text", "lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, buckets in by_lang.items():
        assert set(buckets) <= {"head", "middle", "tail"}
        # mean NLL must increase head → middle → tail by construction
        means = [
            buckets[b]["avg_nll"]
            for b in ("head", "middle", "tail")
            if b in buckets
        ]
        assert means == sorted(means), (lang, means)
        # terciles are histogram-approximate but roughly balanced:
        # head holds ≥ 1/3 (threshold bin INCLUDES the crossing bin)
        # and ≤ 2/3 of the group's scored docs for any group big enough
        n = sum(b["n_docs"] for b in buckets.values())
        if n >= 30 and "head" in buckets:
            assert n / 3 <= buckets["head"]["n_docs"] <= 2 * n / 3 + 1, (
                lang,
                {b: r["n_docs"] for b, r in buckets.items()},
            )


def test_ngram_lm_score_degenerate_corpora(spark):
    # all docs < 2 tokens → empty result, no window/lead crash
    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "   ")], ["doc_id", "text"]
    )
    assert C.ngram_lm_score(df, "doc_id", "text").count() == 0
    # unrounded mode returns raw doubles
    df2 = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    r = C.ngram_lm_score(df2, "doc_id", "text", round_dp=None).collect()[0]
    assert r["n_bigrams"] == 3 and r["nll"] > 0


def test_mix_to_target_absent_group_and_single_group(spark):
    df = spark.createDataFrame(
        [(i, "only") for i in range(100)], ["doc_id", "src"]
    )
    # target names a group with no data: achievable mix is just the
    # present group; it binds and keeps everything
    out = C.mix_to_target(df, {"only": 0.5, "ghost": 0.5}, "src", "doc_id")
    assert out.count() == 100
    # single-group target keeps everything too
    assert C.mix_to_target(df, {"only": 1.0}, "src", "doc_id").count() == 100


def test_semantic_dedup_singleton_clusters_no_pairs(spark):
    import numpy as np

    from openetl_spark.operators import similarity as SS

    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    assert SS.semantic_dedup(df, cents, threshold=0.9).count() == 0


def test_contrastive_negatives_properties(spark):
    rows = [(i, i % 3) for i in range(300)]
    df = spark.createDataFrame(rows, ["vec_id", "label"])
    out = C.contrastive_negatives(df, k=3, n_buckets=4).collect()
    by_anchor = {}
    labels = dict(rows)
    for r in out:
        by_anchor.setdefault(r["anchor"], []).append(r)
        # negatives always carry a different label and are never self
        assert labels[r["negative"]] != labels[r["anchor"]]
        assert r["negative"] != r["anchor"]
    assert all(len(v) <= 3 for v in by_anchor.values())
    assert sum(len(v) for v in by_anchor.values()) >= 250 * 3  # dense corpus
    # determinism: identical pairs on a second run
    out2 = C.contrastive_negatives(df, k=3, n_buckets=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_mix_to_target_binding_group_keeps_all_at_fp_hostile_weights(spark):
    """Regression: floor(10000·wn·(n/wn)/n) can land at 9999 from FP
    representation error (e.g. wn=0.9, n=23), silently dropping the
    binding group's bucket-9999 docs. The epsilon nudge must keep the
    binding group at exactly 10000 bp — i.e. keep EVERY doc."""
    for w_big, n_small in [(0.9, 23), (0.9, 3), (0.7, 13)]:
        rows = [(i, "small" if i < n_small else "big") for i in range(1000)]
        df = spark.createDataFrame(rows, ["doc_id", "src"])
        out = C.mix_to_target(
            df, {"small": w_big, "big": round(1 - w_big, 10)}, "src", "doc_id"
        )
        kept_small = out.filter(F.col("src") == "small").count()
        assert kept_small == n_small, (w_big, n_small, kept_small)


def test_unique_rule_null_keys_are_not_duplicates(spark):
    """Regression (r08 review): rows with NULL key columns must not
    count as duplicates — SQL tuple-distinct semantics, matching the
    dq_report oracle's count(DISTINCT (a, b))."""
    from openetl_spark.functions import constraints as DQ

    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (None, "c"), (2, "d"), (2, "e")],
        "k long, v string",
    )
    rep = DQ.check(df, [DQ.unique("k")]).collect()[0]
    # distinct k tuples: (1), (NULL)×2 → the NULLs are DISTINCT rows?
    # SQL count(DISTINCT (k)) over {1, NULL, NULL, 2, 2} = 3 (1, NULL, 2)
    # violations = 5 - 3 = 2: one real dup pair (2,2) and one NULL pair
    # — NULL keys collide with each other but never inflate via drop
    assert rep[DQ.unique("k").name] == 2


def test_ngram_novelty_duplicate_pair_semantics(spark):
    from openetl_spark import catalog  # noqa: F401  (style parity)
    from openetl_spark.operators import dedup as DD
    from pyspark.sql import functions as FF

    text = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "totally different words here now folks")],
        ["doc_id", "text"],
    )
    sh = DD.with_shingles(df, "text", n=3).select(
        "doc_id", FF.explode("shingles").alias("g")
    )
    first = sh.groupBy("g").agg(FF.min("doc_id").alias("_first"))
    out = {
        r["doc_id"]: r
        for r in sh.join(first, "g")
        .groupBy("doc_id")
        .agg(
            FF.count("*").alias("n_grams"),
            FF.round(
                FF.avg(FF.when(FF.col("_first") == FF.col("doc_id"), 1.0).otherwise(0.0)), 4
            ).alias("novelty"),
        )
        .collect()
    }
    assert out[1]["novelty"] == 1.0   # first copy: everything new
    assert out[2]["novelty"] == 0.0   # exact duplicate: nothing new
    assert out[3]["novelty"] == 1.0   # unrelated doc: everything new


def test_winsorize_clips_to_per_dim_bounds(spark):
    """An outlier coordinate must clip to its dimension's quantile
    while inliers pass through; bounds are per-DIMENSION (dim 0's
    outlier doesn't affect dim 1)."""
    import numpy as np

    from openetl_spark.operators import curation as C

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.uniform(-1, 1, 4)]) for i in range(99)]
    rows.append((99, [100.0, 0.0, 0.0, 0.0]))  # dim-0 outlier
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: [int(x) for x in r["winsorized"].split(",")]
        for r in C.winsorize_embeddings(df, 0.05, 0.95).collect()
    }
    assert len(out) == 100
    # the outlier's dim 0 clipped below 10000 (=1.0 fixed-point);
    # its other dims (0.0, within bounds everywhere) stay 0
    assert out[99][0] < 10000
    assert out[99][1] == 0 and out[99][2] == 0
    # EVERY strictly-inside-bounds coordinate of every row passes
    # through unchanged (review r05: the old any() let a bug that
    # corrupted most unclipped coordinates slip)
    mat = np.array([v for _, v in rows])
    lo = np.quantile(mat, 0.05, axis=0)  # 'linear' = Spark percentile
    hi = np.quantile(mat, 0.95, axis=0)
    checked = 0
    for vid, vec in rows:
        for i, x in enumerate(vec):
            if lo[i] < x < hi[i]:
                assert abs(out[vid][i] - round(x * 10000)) <= 1, (vid, i)
                checked += 1
    assert checked > 300  # the bulk of coordinates are inliers


def _h48(seed, key, rep):
    import hashlib

    return int(hashlib.md5(f"{seed}:{key}:{rep}".encode()).hexdigest()[:12], 16)


def test_weighted_sample_matches_python_reference(spark):
    """Exact successive weighted sampling via the replication
    equivalence: item key = min of w seeded 48-bit hashes; ranks and
    inclusion order must equal the bit-level python reference.
    Zero/NULL weights are excluded."""
    import collections

    from openetl_spark.operators.curation import weighted_sample

    rows = [(i, "g1" if i < 8 else "g2", (i % 5) + 1) for i in range(16)]
    rows += [(99, "g1", 0), (98, "g2", None)]
    df = spark.createDataFrame(rows, "doc_id int, lang string, w int")
    ref = collections.defaultdict(list)
    for i, g, w in rows:
        if not w:
            continue
        ref[g].append((min(_h48(42, i, r) for r in range(1, w + 1)), i, w))
    want = set()
    for g, lst in ref.items():
        for pos, (_, i, w) in enumerate(sorted(lst), 1):
            if pos <= 3:
                want.add((g, i, w, pos))
    got = {
        (r["lang"], r["doc_id"], r["w"], r["pos"])
        for r in weighted_sample(df, 3, "w", ("lang",)).collect()
    }
    assert got == want


def test_weighted_sample_is_weight_proportional(spark):
    """Over 120 seeds, a weight-5 item must win the 1-draw sample
    ~5x as often as a weight-1 item (binomial 3-sigma band around
    p = 5/6)."""
    from openetl_spark.operators.curation import weighted_sample

    df = spark.createDataFrame([(1, 1), (2, 5)], "doc_id int, w int")
    wins = 0
    n = 120
    for seed in range(n):
        (row,) = weighted_sample(df, 1, "w", (), seed=seed).collect()
        wins += row["doc_id"] == 2
    p = 5 / 6
    sigma = (n * p * (1 - p)) ** 0.5
    assert abs(wins - n * p) <= 3 * sigma, wins


def test_weighted_sample_validation(spark):
    from openetl_spark.operators.curation import weighted_sample

    df = spark.createDataFrame([(1, "a", 2)], "doc_id int, lang string, w int")
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, 0, "w")
    with pytest.raises(ValueError, match="at most one group"):
        weighted_sample(df, 1, "w", ("lang", "doc_id"))


def test_weighted_sample_weight_magnitude_guard(spark):
    """VERDICT r08 #6: a weight above max_weight FAILS the job with an
    explicit message instead of silently building a w-element replica
    array in one task; raising max_weight opts back in."""
    from openetl_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [(1, 5), (2, (1 << 24) + 1)], "doc_id int, w long"
    )
    with pytest.raises(Exception, match="max_weight"):
        weighted_sample(df, 1, "w").collect()
    # at-cap weights are allowed (boundary is inclusive)…
    ok = spark.createDataFrame([(1, 5), (2, 7)], "doc_id int, w long")
    assert weighted_sample(ok, 1, "w", max_weight=7).count() == 1
    # …and an explicit larger cap opts in (kept small here: the cost
    # contract is Σw replica rows).
    big = spark.createDataFrame([(1, 5), (2, 50_000)], "doc_id int, w long")
    assert weighted_sample(big, 1, "w", max_weight=1 << 26).count() == 1


# ---------------------------------------------------------------- DSIR

def _dsir_py_reference(docs, target_ids, n_buckets, scale=1_000_000):
    """Independent pure-Python DSIR: hashed unigram+bigram counts,
    add-1-smoothed bucket LMs, integer micro-nat scores."""
    import hashlib
    import math

    def feats(text):
        w = text.split()
        grams = w + [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]
        out = {}
        for g in grams:
            h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % n_buckets
            out[h] = out.get(h, 0) + 1
        return out

    per_doc = {i: feats(t) for i, t in docs}
    s_tot, t_tot = {}, {}
    for i, f in per_doc.items():
        for b, c in f.items():
            s_tot[b] = s_tot.get(b, 0) + c
            if i in target_ids:
                t_tot[b] = t_tot.get(b, 0) + c
    S, T = sum(s_tot.values()), sum(t_tot.values())
    r = {
        b: round(
            scale
            * (
                math.log((t_tot.get(b, 0) + 1) / (T + n_buckets))
                - math.log((s_tot.get(b, 0) + 1) / (S + n_buckets))
            )
        )
        for b in range(n_buckets)
    }
    return {
        i: (sum(f.values()), sum(c * r[b] for b, c in f.items()))
        for i, f in per_doc.items()
    }


def test_dsir_matches_python_reference(spark):
    docs = [
        (0, "the cat sat on the mat"),
        (1, "der hund lief im park"),
        (2, "the dog ran in the park"),
        (3, "le chat est sur le tapis"),
        (4, "the the the cat cat dog"),
    ]
    target = {0, 2, 4}
    df = spark.createDataFrame(docs, "doc_id long, text string")
    feats = C.dsir_features(df, n_buckets=64)
    totals = C.dsir_bucket_totals(
        feats, spark.createDataFrame([(i,) for i in sorted(target)], "doc_id long")
    ).collect()
    ratios = spark.createDataFrame(
        C.dsir_log_ratios(totals, 64), "b bigint, r_unats bigint"
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["score_unats"])
        for r in C.dsir_scores(feats, ratios).collect()
    }
    assert got == _dsir_py_reference(docs, target, 64)


def test_dsir_selection_shifts_toward_target(spark, sf_dir):
    # The point of the operator: target-language documents score
    # higher. Selection rate among 'en' docs must strictly exceed the
    # rate among the rest on every testdata corpus.
    from openetl_spark.queries.analytics_r09 import q_dsir_scores
    from openetl_spark.queries.base import load

    scores = q_dsir_scores(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    j = scores.join(d, "doc_id").groupBy(F.col("lang") == "en").agg(
        F.avg(F.col("selected").cast("double")).alias("rate")
    ).collect()
    rates = {r[0]: r["rate"] for r in j}
    assert rates[True] > rates[False]


def test_dsir_features_counts_occurrences_not_distinct(spark):
    df = spark.createDataFrame([(0, "a a a")], "doc_id long, text string")
    rows = C.dsir_features(df, n_buckets=8).collect()
    # unigrams: a x3; bigrams: "a a" x2 — occurrence counts survive.
    assert sorted(r["f"] for r in rows) == [2, 3]


def test_dsir_validation(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_buckets"):
        C.dsir_features(df, n_buckets=1)


# ---------------------------------------------------------- privacy

def test_k_anonymity_counts_and_l_diversity(spark):
    rows = [
        ("a", "x", 1), ("a", "x", 1), ("a", "x", 2),
        ("a", "y", 3),
        ("b", "x", 1), ("b", "x", 1),
    ]
    df = spark.createDataFrame(rows, "qi1 string, qi2 string, s int")
    got = {
        (r["qi1"], r["qi2"]): (r["k"], r["l"])
        for r in C.k_anonymity(df, ["qi1", "qi2"], "s").collect()
    }
    assert got == {("a", "x"): (3, 2), ("a", "y"): (1, 1), ("b", "x"): (2, 1)}


def test_suppress_small_groups_result_is_k_anonymous(spark):
    rows = [("a", i) for i in range(5)] + [("b", 0), ("b", 1)] + [("c", 9)]
    df = spark.createDataFrame(rows, "qi string, payload int")
    kept = C.suppress_small_groups(df, ["qi"], 3)
    out = kept.collect()
    # Only the k>=3 group survives, payload columns intact.
    assert {r["qi"] for r in out} == {"a"}
    assert sorted(r["payload"] for r in out) == list(range(5))
    # Post-condition: every surviving group is k_min-anonymous.
    sizes = C.k_anonymity(kept, ["qi"]).collect()
    assert all(r["k"] >= 3 for r in sizes)


def test_suppress_small_groups_null_qi_agrees_with_audit(spark):
    # ADVICE r09: k_anonymity's groupBy counts NULL as its own group,
    # so enforcement must keep a NULL-QI group that clears k_min —
    # the join back is null-safe, not a plain equi-join.
    rows = [(None, i) for i in range(4)] + [("a", 0), ("a", 1), ("a", 2)] + [("b", 9)]
    df = spark.createDataFrame(rows, "qi string, payload int")
    kept = C.suppress_small_groups(df, ["qi"], 3)
    out = kept.collect()
    assert {r["qi"] for r in out} == {None, "a"}
    assert sorted(r["payload"] for r in out if r["qi"] is None) == list(range(4))
    # Audit agrees: every surviving group (incl. the NULL group) >= 3.
    sizes = C.k_anonymity(kept, ["qi"]).collect()
    assert {r["qi"]: r["k"] for r in sizes} == {None: 4, "a": 3}


def test_suppress_small_groups_multi_qi_null_combination(spark):
    rows = [("a", None, i) for i in range(3)] + [("a", "x", 0), (None, None, 7)]
    df = spark.createDataFrame(rows, "q1 string, q2 string, payload int")
    kept = C.suppress_small_groups(df, ["q1", "q2"], 2).collect()
    assert {(r["q1"], r["q2"]) for r in kept} == {("a", None)}
    assert sorted(r["payload"] for r in kept) == [0, 1, 2]


def test_k_anonymity_validation(spark):
    df = spark.createDataFrame([("a", 1)], "qi string, s int")
    with pytest.raises(ValueError, match="qi_cols"):
        C.k_anonymity(df, [])
    with pytest.raises(ValueError, match="k_min"):
        C.suppress_small_groups(df, ["qi"], 0)


# --------------------------------------------------------- mondrian

def _mondrian_py(rows, k, depth):
    """Independent level-synchronous Mondrian: rows = (id, d1, d2)."""
    r1 = max(max(r[1] for r in rows) - min(r[1] for r in rows), 1)
    r2 = max(max(r[2] for r in rows) - min(r[2] for r in rows), 1)
    leaves = {"r": list(rows)}
    for _ in range(depth):
        nxt = {}
        for leaf, rs in leaves.items():
            mn1, mx1 = min(r[1] for r in rs), max(r[1] for r in rs)
            mn2, mx2 = min(r[2] for r in rs), max(r[2] for r in rs)
            dim = 1 if (mx1 - mn1) * r2 >= (mx2 - mn2) * r1 else 2
            vals = sorted((r[dim], r[0]) for r in rs)
            m = vals[(len(rs) + 1) // 2 - 1][0]
            left = [r for r in rs if r[dim] <= m]
            right = [r for r in rs if r[dim] > m]
            if len(left) >= k and len(right) >= k:
                nxt[leaf + "L"] = left
                nxt[leaf + "R"] = right
            else:
                nxt[leaf] = rs
        leaves = nxt
    return {
        leaf: {r[0] for r in rs} for leaf, rs in leaves.items()
    }


def test_mondrian_matches_python_reference(spark):
    import random

    random.seed(17)
    rows = [
        (i, random.randint(-500, 500), random.randint(0, 30))
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "id long, d1 long, d2 long")
    out = C.mondrian_partition(df, ["d1", "d2"], "id", k_min=20, depth=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["_leaf"], set()).add(r["id"])
    assert got == _mondrian_py(rows, 20, 3)


def test_mondrian_k_guarantee_and_no_drop(spark):
    import random

    random.seed(23)
    rows = [(i, random.randint(0, 99), random.randint(0, 5)) for i in range(97)]
    df = spark.createDataFrame(rows, "id long, d1 long, d2 long")
    out = C.mondrian_partition(df, ["d1", "d2"], "id", k_min=10, depth=4).collect()
    assert len(out) == 97 and len({r["id"] for r in out}) == 97
    from collections import Counter

    sizes = Counter(r["_leaf"] for r in out)
    assert all(v >= 10 for v in sizes.values())


def test_mondrian_degenerate_dimension_freezes(spark):
    # All QI values identical: no k-preserving cut exists — one leaf.
    df = spark.createDataFrame(
        [(i, 7, 7) for i in range(30)], "id long, d1 long, d2 long"
    )
    out = C.mondrian_partition(df, ["d1", "d2"], "id", k_min=5, depth=3)
    assert {r["_leaf"] for r in out.collect()} == {"r"}


def _mondrian_hier_py(rows, hier, h_max, k, depth):
    """Independent level-synchronous hierarchical Mondrian:
    rows = (id, d1, cat); hier = {(value, level): anc}."""
    r1 = max(max(r[1] for r in rows) - min(r[1] for r in rows), 1)
    leaves = {"r": (list(rows), 0)}
    for _ in range(depth):
        nxt = {}
        for leaf, (rs, lvl) in leaves.items():
            mn1, mx1 = min(r[1] for r in rs), max(r[1] for r in rs)
            kc = (h_max - lvl) * r1
            kn = (mx1 - mn1) * h_max
            if max(kc, kn) <= 0:
                nxt[leaf] = (rs, lvl)
                continue
            if kc >= kn:  # categorical descent (ties to cat)
                groups = {}
                for r in rs:
                    groups.setdefault(hier[(r[2], lvl + 1)], []).append(r)
                if len(groups) >= 2 and all(len(g) >= k for g in groups.values()):
                    for c, g in groups.items():
                        nxt[f"{leaf}/{c}"] = (g, lvl + 1)
                else:
                    nxt[leaf] = (rs, lvl)
            else:  # numeric lower-median cut
                vals = sorted((r[1], r[0]) for r in rs)
                m = vals[(len(rs) + 1) // 2 - 1][0]
                left = [r for r in rs if r[1] <= m]
                right = [r for r in rs if r[1] > m]
                if len(left) >= k and len(right) >= k:
                    nxt[leaf + "L"] = (left, lvl)
                    nxt[leaf + "R"] = (right, lvl)
                else:
                    nxt[leaf] = (rs, lvl)
        leaves = nxt
    return {
        leaf: ({r[0] for r in rs}, lvl) for leaf, (rs, lvl) in leaves.items()
    }


def _hier_fixture(spark, n, seed):
    """Random (id, d1, cat) rows over a 2-level taxonomy: categories
    0..11, parents cat//4 (three parents 0..2), root level 0."""
    import random

    random.seed(seed)
    rows = [
        (i, random.randint(-400, 400), random.randint(0, 11))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, d1 long, cat long")
    hier_rows = [(v, 1, v // 4) for v in range(12)] + [
        (v, 2, v) for v in range(12)
    ]
    hier = spark.createDataFrame(hier_rows, "value long, level int, anc long")
    hmap = {(v, l): a for v, l, a in hier_rows}
    return rows, df, hier, hmap


def test_mondrian_hierarchical_matches_python_reference(spark):
    rows, df, hier, hmap = _hier_fixture(spark, 260, 31)
    out = C.mondrian_hierarchical(
        df, ["d1"], "cat", hier, "id", k_min=15, depth=3
    )
    got = {}
    for r in out.collect():
        ids, _ = got.setdefault(r["_leaf"], (set(), r["_lvl"]))
        ids.add(r["id"])
        assert got[r["_leaf"]][1] == r["_lvl"]  # one level per leaf
    assert got == _mondrian_hier_py(rows, hmap, 2, 15, 3)


def test_mondrian_hierarchical_k_guarantee_and_no_drop(spark):
    rows, df, hier, _ = _hier_fixture(spark, 131, 47)
    out = C.mondrian_hierarchical(
        df, ["d1"], "cat", hier, "id", k_min=9, depth=4
    ).collect()
    assert len(out) == 131 and len({r["id"] for r in out}) == 131
    from collections import Counter

    sizes = Counter(r["_leaf"] for r in out)
    assert all(v >= 9 for v in sizes.values())
    # The taxonomy walk actually fired somewhere at this size.
    assert any("/" in leaf for leaf in sizes)


def test_mondrian_hierarchical_cat_guard_blocks_thin_children(spark):
    # 3 records in category 0, 40 in category 4: the level-1 descent
    # (parents 0 vs 1) keeps both children >= 3 only if k <= 3.
    rows = [(i, i, 0) for i in range(3)] + [
        (100 + i, 500 + i, 4) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, d1 long, cat long")
    hier_rows = [(v, 1, v // 4) for v in range(12)] + [
        (v, 2, v) for v in range(12)
    ]
    hier = spark.createDataFrame(hier_rows, "value long, level int, anc long")
    # k=5 > the thin child: the root's categorical pick (tie at full
    # widths goes to cat) freezes — but the NEXT level re-picks and
    # the numeric dim may still cut. Assert the cat path never split.
    out = C.mondrian_hierarchical(
        df, ["d1"], "cat", hier, "id", k_min=5, depth=1
    ).collect()
    assert {r["_leaf"] for r in out} == {"r"}
    assert all(r["_lvl"] == 0 for r in out)


def test_mondrian_hierarchical_fully_specialized_freezes(spark):
    # One category, one d1 value: every width is 0 — frozen, no drop
    # (the all-zero-width arm must not route rows into the level-3
    # ancestor join, which would silently lose them).
    rows = [(i, 7, 4) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, d1 long, cat long")
    hier_rows = [(4, 1, 1), (4, 2, 4)]
    hier = spark.createDataFrame(hier_rows, "value long, level int, anc long")
    out = C.mondrian_hierarchical(
        df, ["d1"], "cat", hier, "id", k_min=5, depth=3
    ).collect()
    assert len(out) == 20
    # The categorical pick wins (kc=2 vs kn=0) but a single-child
    # descent is blocked by the >=2-children guard, so the leaf
    # freezes at the root with all rows intact, every level.
    assert {r["_leaf"] for r in out} == {"r"}
    assert all(r["_lvl"] == 0 for r in out)
    assert len({r["id"] for r in out}) == 20


def test_mondrian_hierarchical_validation(spark):
    df = spark.createDataFrame([(1, 2, 3)], "id long, d1 long, cat long")
    hier = spark.createDataFrame([(3, 1, 0)], "value long, level int, anc long")
    with pytest.raises(ValueError, match="num_cols"):
        C.mondrian_hierarchical(df, [], "cat", hier, "id", 5)
    with pytest.raises(ValueError, match="k_min"):
        C.mondrian_hierarchical(df, ["d1"], "cat", hier, "id", 0)
    with pytest.raises(ValueError, match="_lvl"):
        C.mondrian_hierarchical(
            df.withColumn("_lvl", df.id), ["d1"], "cat", hier, "id", 5
        )


def test_mondrian_validation(spark):
    df = spark.createDataFrame([(1, 2, 3)], "id long, d1 long, d2 long")
    with pytest.raises(ValueError, match="qi_cols"):
        C.mondrian_partition(df, [], "id", 5)
    with pytest.raises(ValueError, match="k_min"):
        C.mondrian_partition(df, ["d1"], "id", 0)
    with pytest.raises(ValueError, match="_leaf"):
        C.mondrian_partition(
            df.withColumn("_leaf", df.id), ["d1"], "id", 5
        )


def _t_closeness_py(rows, bands):
    """Independent EMD reference: rows = (qi, band)."""
    from collections import Counter

    n_total = len(rows)
    glob = Counter(b for _, b in rows)
    out = {}
    for qi in {q for q, _ in rows}:
        mine = Counter(b for q, b in rows if q == qi)
        n = sum(mine.values())
        cumg = cumG = num = 0
        for b in bands:
            cumg += mine.get(b, 0)
            cumG += glob.get(b, 0)
            num += abs(cumg * n_total - cumG * n)
        out[qi] = (n, num, (len(bands) - 1) * n * n_total)
    return out


def test_t_closeness_matches_python_reference(spark):
    import random

    random.seed(31)
    rows = [
        (random.choice("abc"), random.choice([0, 1, 2, 3]))
        for _ in range(120)
    ]
    df = spark.createDataFrame(rows, "qi string, band int")
    got = {
        r["qi"]: (r["n"], r["emd_num"], r["emd_den"])
        for r in C.t_closeness(df, ["qi"], "band").collect()
    }
    assert got == _t_closeness_py(rows, [0, 1, 2, 3])


def test_t_closeness_group_matching_global_is_zero(spark):
    # Two groups with IDENTICAL band distributions: both distributions
    # equal the global one, so EMD is exactly 0 for each.
    rows = [(q, b) for q in ("a", "b") for b in (0, 0, 1, 2)]
    df = spark.createDataFrame(rows, "qi string, band int")
    for r in C.t_closeness(df, ["qi"], "band").collect():
        assert r["emd_num"] == 0


def test_t_closeness_skewed_group_caught_by_emd_not_l(spark):
    # The leak l-diversity misses: group 'hi' sits entirely in the TOP
    # band while 'rest' is spread evenly — 'hi' drifts strictly more
    # from the global distribution (t = 0.375 vs 0.125 here, compared
    # by cross-multiplication so the test stays all-integer).
    rows = [("hi", 3)] * 4 + [(q, b) for q in ("rest",) for b in (0, 1, 2, 3) for _ in range(3)]
    df = spark.createDataFrame(rows, "qi string, band int")
    got = {r["qi"]: (r["emd_num"], r["emd_den"]) for r in C.t_closeness(df, ["qi"], "band").collect()}
    assert got["hi"][0] * got["rest"][1] > got["rest"][0] * got["hi"][1]


def test_t_closeness_validation(spark):
    df = spark.createDataFrame([("a", 1)], "qi string, band int")
    with pytest.raises(ValueError, match="qi_cols"):
        C.t_closeness(df, [], "band")
    with pytest.raises(ValueError, match="bands"):
        C.t_closeness(df, ["qi"], "band")


def test_mondrian_hierarchical_uncovered_category_raises(spark):
    # A category with no hierarchy row must raise at execution time,
    # never silently drop the record (review r10).
    rows = [(i, i, 0) for i in range(6)] + [(99, 5, 7)]  # cat=7 uncovered
    df = spark.createDataFrame(rows, "id long, d1 long, cat long")
    hier_rows = [(0, 1, 0), (0, 2, 0)]
    hier = spark.createDataFrame(hier_rows, "value long, level int, anc long")
    with pytest.raises(Exception, match="no hierarchy row"):
        C.mondrian_hierarchical(
            df, ["d1"], "cat", hier, "id", k_min=2, depth=1
        ).collect()


def test_mondrian_hierarchical_duplicate_hierarchy_row_raises(spark):
    """A duplicate (value, level) hierarchy row must raise, never
    silently duplicate records through the descent join — duplicated
    rows inflate child counts so the per-child k-guard can pass with
    fewer REAL records, quietly breaking the k-guarantee (ADVICE r10)."""
    rows = [(i, i % 3, i % 2) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, d1 long, cat long")
    hier_rows = [
        (0, 1, 0), (0, 2, 0),
        (1, 1, 0), (1, 2, 1),
        (1, 2, 1),  # duplicate (value=1, level=2)
    ]
    hier = spark.createDataFrame(hier_rows, "value long, level int, anc long")
    with pytest.raises(Exception, match="duplicate hierarchy"):
        C.mondrian_hierarchical(
            df, ["d1"], "cat", hier, "id", k_min=2, depth=2
        ).collect()
