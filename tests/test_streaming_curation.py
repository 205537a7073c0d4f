"""Integration: a streaming training-data ingest pipeline composed
from shipped pieces — Kafka-shaped source → JSON parse → quality gate
→ watermarked stateful dedup. Verifies the pieces compose in one
micro-batch plan and that duplicate/low-quality docs never reach the
sink."""

import json

from pyspark.sql import functions as F

from openetl_spark.operators.text import quality_score
from openetl_spark.sources import kafka as K


def _write_doc_log(path: str) -> None:
    good = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        # (partition, offset, doc_id, text)
        (0, 0, 1, good + " one"),
        (0, 1, 2, good + " two"),
        (0, 2, 3, good + " one"),      # exact duplicate of doc 1's text
        (1, 0, 4, "!!! ???"),           # low quality: punctuation soup
        (1, 1, 5, good + " three"),
        (1, 2, 6, good + " two"),      # exact duplicate of doc 2's text
    ]
    with open(path, "w") as f:
        for p, o, did, text in rows:
            f.write(
                json.dumps(
                    {
                        "topic": "docs",
                        "partition": p,
                        "offset": o,
                        "key": str(did),
                        "value": json.dumps({"doc_id": did, "text": text}),
                        "timestamp": 1700000000000 + o * 60000,
                    }
                )
                + "\n"
            )


def test_streaming_ingest_quality_dedup(spark, tmp_path):
    log = str(tmp_path / "docs.jsonl")
    _write_doc_log(log)
    K.register(spark)

    stream = (
        spark.readStream.format("openetl_kafka")
        .option("topic", "docs")
        .option("client_factory", "tests.fake_kafka:consumer_factory")
        .option("factory_arg", log)
        .load()
    )
    parsed = stream.select(
        F.from_json(F.col("value").cast("string"), "doc_id long, text string").alias("j"),
        F.col("timestamp").alias("ts"),
    ).select("j.doc_id", "j.text", "ts")
    gated = quality_score(parsed, "text").where(F.col("quality") >= 0.5)
    deduped = (
        gated.withColumn("text_key", F.md5("text"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["text_key"])
    )

    seen: list[tuple] = []
    q = (
        deduped.writeStream.foreachBatch(
            lambda df, bid: seen.extend(
                (r["doc_id"], r["text"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    kept_ids = sorted(d for d, _ in seen)
    # doc 4 fails the quality gate; docs 3 and 6 are text-duplicates of
    # 1 and 2 (either member of a dup pair may survive, never both)
    assert len(kept_ids) == 3
    assert 4 not in kept_ids
    texts = [t for _, t in seen]
    assert len(set(texts)) == 3
    assert {1, 3} & set(kept_ids) and {2, 6} & set(kept_ids) and 5 in kept_ids


def test_streaming_cms_equals_batch_over_ingested_corpus(spark, tmp_path):
    """The streaming CMS cells table after N micro-batches must equal
    the batch CMS over the union of everything ingested — the
    mergeable-sketch property carried by Spark's state store."""
    import os

    from openetl_spark.operators.curation import cms_positions
    from openetl_spark.operators.text import tokens
    from openetl_spark.streaming import ops as S

    d = tmp_path / "docs_stream"
    d.mkdir()
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "the five boxing wizards jump quickly over the fox",
    ]
    # one file per micro-batch
    for i, t in enumerate(texts):
        (d / f"b{i}.json").write_text(json.dumps({"doc_id": i, "text": t}) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    cells = S.streaming_cms_cells(stream, depth=3, width=256)
    S.run_to_memory_sink(cells, "cms_cells", output_mode="complete")
    got = (
        spark.table("cms_cells")
        .toPandas()
        .sort_values(["d", "pos"])
        .reset_index(drop=True)
    )

    batch = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    toks = F.transform(tokens(F.col("text")), F.lower)
    exp = (
        batch.select(F.explode(toks).alias("token"))
        .select(F.explode(cms_positions(F.col("token"), 3, 256)).alias("dp"))
        .select("dp.d", "dp.pos")
        .groupBy("d", "pos")
        .agg(F.count("*").alias("cell"))
        .toPandas()
        .sort_values(["d", "pos"])
        .reset_index(drop=True)
    )
    assert got.equals(exp)


def test_streaming_dedup_on_arrival_against_persisted_index(spark, tmp_path):
    """Dedup-on-arrival: each micro-batch dedups against the persisted
    MinHash signature index (never re-reading earlier documents' text),
    appends its survivors' prepared rows, and only survivors reach the
    corpus sink. Final corpus must equal the sequential incremental
    semantics: first-arrived doc of every near-dup group survives."""
    import json
    import os

    from openetl_spark.operators import dedup as DD

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    u1 = "one two three four five six seven eight nine ten"
    u2 = "red orange yellow green blue indigo violet pink brown black"
    batches = [
        [(1, base), (2, u1)],
        [(3, base + " extra"), (4, u2), (5, u2)],          # 3→1, 5→4
        [(6, u1 + " more"), (7, "completely different words nothing shared here at all folks yes")],  # 6→2
    ]
    src = tmp_path / "docs"
    src.mkdir()
    for i, rows in enumerate(batches):
        f = src / f"b{i}.json"
        f.write_text(
            "\n".join(json.dumps({"doc_id": d, "text": t}) for d, t in rows) + "\n"
        )
        os.utime(f, (1000000000 + i * 60,) * 2)

    idx_path = str(tmp_path / "minhash_index")
    out_path = str(tmp_path / "corpus")
    empty_index = spark.createDataFrame(
        [], "id long, sh array<string>, minhash array<bigint>"
    )

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        prepared = (
            spark.read.parquet(idx_path)
            if os.path.exists(idx_path)
            else empty_index
        )
        flagged = DD.incremental_near_duplicates(
            df, prepared, "doc_id", "text", index_prepared=True
        )
        survivors = df.join(
            flagged.select(F.col("doc_id")), "doc_id", "left_anti"
        )
        survivors.write.mode("append").parquet(out_path)
        DD.prepare_minhash_index(survivors, "doc_id", "text").write.mode(
            "append"
        ).parquet(idx_path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    kept = sorted(r["doc_id"] for r in spark.read.parquet(out_path).collect())
    assert kept == [1, 2, 4, 7]
    # the index holds exactly the survivors' signatures
    idx_ids = sorted(r["id"] for r in spark.read.parquet(idx_path).collect())
    assert idx_ids == [1, 2, 4, 7]


def test_streaming_gopher_gates_equal_batch(spark, sf_dir, tmp_path):
    """r05 Gopher panels are STATELESS Column expressions, so they run
    unchanged in a stream — micro-batched output over a file stream
    must equal the one-shot batch result on the same corpus (the
    stream/batch parity that makes a quality gate deployable on a
    live ingest without a second implementation)."""
    from openetl_spark.operators.text import gopher_quality_flags

    src = str(tmp_path / "src")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.coalesce(4).write.json(src)

    batch = {
        (r["doc_id"], r["n_words"], r["stopword_hits"], r["keep"])
        for r in gopher_quality_flags(docs).collect()
    }

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    got: set[tuple] = set()
    q = (
        gopher_quality_flags(stream)
        .writeStream.foreachBatch(
            lambda df, bid: got.update(
                (r["doc_id"], r["n_words"], r["stopword_hits"], r["keep"])
                for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert got == batch and len(batch) == 500


def test_streaming_gopher_repetition_equals_batch(spark, sf_dir, tmp_path):
    """r06 (VERDICT #8): the Gopher repetition panel is per-document
    (the gram aggregations never cross doc boundaries), so applying the
    batch operator inside foreachBatch per micro-batch must reproduce
    the one-shot batch result exactly — repetition-gate-on-ingest with
    no second implementation."""
    from openetl_spark.operators.text import gopher_repetition_flags

    src = str(tmp_path / "src")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.coalesce(4).write.json(src)

    keep_cols = ("doc_id", "top2_char_frac", "dup5_char_frac", "keep")
    batch = {
        tuple(r[c] for c in keep_cols)
        for r in gopher_repetition_flags(docs).collect()
    }

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    got: set[tuple] = set()
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: got.update(
                tuple(r[c] for c in keep_cols)
                for r in gopher_repetition_flags(df).collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert got == batch and len(batch) == 500


def test_streaming_image_dedup_on_arrival(spark, tmp_path):
    """r06 (VERDICT #8): perceptual-fingerprint dedup-on-arrival — each
    micro-batch of image BYTES is decoded and aHashed, probed against
    the persisted fingerprint index (index x index never re-mined), and
    appended. index-internal pairs + the union of per-batch probe
    results must equal the one-shot batch miner over the full corpus,
    every pair exactly once."""
    import os

    from openetl_spark.operators import dedup as DD
    from openetl_spark.operators import media_synth as MS
    from openetl_spark.operators import multimodal as M

    corpus = MS.synthetic_image_corpus()
    first, rest = corpus[: len(corpus) // 2], corpus[len(corpus) // 2 :]

    def to_df(rows):
        return spark.createDataFrame(
            [(p, bytearray(b)) for p, b in rows], "path string, content binary"
        )

    idx_path = str(tmp_path / "fp_index")
    M.with_image_ahash(to_df(first)).filter(F.col("ahash").isNotNull()).select(
        "path", "ahash"
    ).write.parquet(idx_path)

    src = str(tmp_path / "img_src")
    to_df(rest).repartition(4).write.parquet(src)

    def norm(rows):
        return {(min(r["a"], r["b"]), max(r["a"], r["b"]), r["hamming"]) for r in rows}

    arrival: set[tuple] = set()

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        fps = M.with_image_ahash(df).filter(F.col("ahash").isNotNull()).select(
            "path", "ahash"
        )
        index = spark.read.parquet(idx_path)
        pairs = DD.fingerprint_dedup_incremental(
            index, fps, "path", "ahash", max_hamming=6
        )
        arrival.update(norm(pairs.collect()))
        fps.write.mode("append").parquet(idx_path)

    q = (
        spark.readStream.schema("path string, content binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    index_internal = norm(
        DD.simhash_candidates(
            M.with_image_ahash(to_df(first)).filter(F.col("ahash").isNotNull()),
            "path", simhash_col="ahash", max_hamming=6,
        ).collect()
    )
    batch_all = norm(M.image_near_duplicates(to_df(corpus), max_hamming=6).collect())
    assert arrival | index_internal == batch_all
    assert arrival, "streamed half must contribute pairs"
    assert len(arrival) + len(index_internal) == len(batch_all)  # no double-mining


def test_streaming_exactsubstr_spans_on_arrival(spark, sf_dir, tmp_path):
    """r06-s2: ExactSubstr dedup-on-arrival — each micro-batch of
    documents is probed against the accumulated window-hash index
    (index×index never re-mined), then its distinct hashes are
    appended to the index. Dedup-on-arrival flags a duplicate when its
    SECOND copy arrives (the first copy is never retroactively
    re-flagged), so the reference is the prefix-corpus span set: for
    each batch, duplicate_spans over (all prior docs ∪ the batch)
    restricted to the batch's documents. The streamed union must equal
    that exactly."""
    import os

    from openetl_spark.operators import dedup as DD
    from openetl_spark import catalog

    docs = catalog.load(spark, sf_dir, "documents")

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    # three arrival files in doc_id order: the stream's batch boundaries
    # line up with doc_id ranges so index coverage is "all prior docs"
    n = docs.count()
    cuts = [0, n // 3, 2 * n // 3, n]
    expected: set[tuple] = set()
    for i in range(3):
        prefix = docs.filter(F.col("doc_id") < cuts[i + 1])
        expected |= {
            tuple(r)
            for r in DD.duplicate_spans(prefix, window=8)
            .filter(F.col("doc_id") >= cuts[i])
            .collect()
        }
        docs.filter(
            (F.col("doc_id") >= cuts[i]) & (F.col("doc_id") < cuts[i + 1])
        ).select("doc_id", "text").coalesce(1).write.json(
            os.path.join(src, f"part{i}")
        )

    idx_path = str(tmp_path / "wh_index")
    # seed with an empty index relation
    spark.createDataFrame([], "wh string").write.parquet(idx_path)

    got: set[tuple] = set()

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        index = spark.read.parquet(idx_path)
        spans = DD.duplicate_spans_incremental(index, df, window=8)
        got.update(tuple(r) for r in spans.collect())
        DD.prepare_window_index(df, window=8).join(
            index, "wh", "left_anti"
        ).write.mode("append").parquet(idx_path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(os.path.join(src, "part*"))
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert got == expected and len(expected) > 0


def test_streaming_audio_dedup_on_arrival(spark, tmp_path):
    """r07 (VERDICT r06 #8): the audio twin of the image
    fingerprint-index append path — energy-delta fingerprints of
    arriving clips probe the persisted index, append, and the union of
    index-internal + arrival pairs must equal the one-shot
    audio_near_duplicates over the full corpus, every pair exactly
    once (no double-mining)."""
    import os

    from openetl_spark.operators import dedup as DD
    from openetl_spark.operators import media_synth as MS
    from openetl_spark.operators import multimodal as M

    corpus = MS.synthetic_audio_corpus()
    first, rest = corpus[: len(corpus) // 2], corpus[len(corpus) // 2 :]

    def to_df(rows):
        return spark.createDataFrame(
            [(p, bytearray(b)) for p, b in rows], "path string, content binary"
        )

    idx_path = str(tmp_path / "afp_index")
    M.with_audio_fingerprint(to_df(first)).filter(
        F.col("afp").isNotNull()
    ).select("path", "afp").write.parquet(idx_path)

    src = str(tmp_path / "aud_src")
    to_df(rest).repartition(3).write.parquet(src)

    def norm(rows):
        return {(min(r["a"], r["b"]), max(r["a"], r["b"]), r["hamming"]) for r in rows}

    arrival: set[tuple] = set()

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        fps = M.with_audio_fingerprint(df).filter(
            F.col("afp").isNotNull()
        ).select("path", "afp")
        index = spark.read.parquet(idx_path)
        pairs = DD.fingerprint_dedup_incremental(
            index, fps, "path", "afp", max_hamming=6
        )
        arrival.update(norm(pairs.collect()))
        fps.write.mode("append").parquet(idx_path)

    q = (
        spark.readStream.schema("path string, content binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_aud"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    index_internal = norm(
        DD.simhash_candidates(
            M.with_audio_fingerprint(to_df(first)).filter(
                F.col("afp").isNotNull()
            ),
            "path", simhash_col="afp", max_hamming=6,
        ).collect()
    )
    batch_all = norm(M.audio_near_duplicates(to_df(corpus), max_hamming=6).collect())
    assert arrival | index_internal == batch_all
    assert arrival, "streamed half must contribute pairs"
    assert len(arrival) + len(index_internal) == len(batch_all)


def test_streaming_bloom_decontaminate_equals_batch(spark, sf_dir, tmp_path):
    """r08 (VERDICT r07 #8): the Bloom-gated decontamination path's
    streaming twin, completing the sketch-family streaming story (CMS
    and HLL cell-log twins already exist). The eval slice's bloom
    cells are built INCREMENTALLY (two halves OR-merged by
    union-distinct — the mergeable-relation law on real data) and
    persisted once; the training corpus then arrives in micro-batches,
    each probed against the persisted cells with per-doc rollups
    APPENDED on arrival (the incremental-dedup discipline: earlier
    batches are never re-read). The concatenated streamed flags must
    equal the batch bloom_decontaminate result row-for-row."""
    import os

    from openetl_spark import catalog
    from openetl_spark.operators import sketches as SK
    from openetl_spark.operators.curation import ngrams
    from openetl_spark.queries.analytics_r07 import _BLOOM_K, _BLOOM_M

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    ng = d.select(
        "doc_id", F.explode(ngrams(F.col("text"), 5)).alias("g")
    ).distinct()
    evg = ng.filter(F.col("doc_id") % 20 == 0).select("g").distinct()

    # cells built in two increments, merged by union-distinct
    half1 = SK.bloom_cells(
        evg.filter(F.abs(F.hash("g")) % 2 == 0), "g", m_bits=_BLOOM_M, k=_BLOOM_K
    )
    half2 = SK.bloom_cells(
        evg.filter(F.abs(F.hash("g")) % 2 == 1), "g", m_bits=_BLOOM_M, k=_BLOOM_K
    )
    merged = half1.unionByName(half2).distinct()
    batch_cells = SK.bloom_cells(evg, "g", m_bits=_BLOOM_M, k=_BLOOM_K)
    assert merged.exceptAll(batch_cells).isEmpty()
    assert batch_cells.exceptAll(merged).isEmpty()

    cells_path = str(tmp_path / "bloom_cells")
    evg_path = str(tmp_path / "eval_grams")
    merged.write.parquet(cells_path)
    evg.write.parquet(evg_path)

    # training docs stream in 3 micro-batches (stable 3-way split)
    train = d.filter(F.col("doc_id") % 20 != 0).select("doc_id", "text")
    src = tmp_path / "stream_src"
    src.mkdir()
    for i in range(3):
        (
            train.filter(F.col("doc_id") % 3 == i)
            .coalesce(1)
            .write.mode("overwrite")
            .json(str(src / f"b{i}"))
        )
    flags_path = str(tmp_path / "flags")

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        cells = spark.read.parquet(cells_path)
        exact = spark.read.parquet(evg_path).withColumn("_ev", F.lit(1))
        bng = df.select(
            "doc_id", F.explode(ngrams(F.col("text"), 5)).alias("g")
        ).distinct()
        flagged = SK.bloom_probe(cells, bng, "g", m_bits=_BLOOM_M, k=_BLOOM_K)
        out = (
            flagged.join(F.broadcast(exact), "g", "left")
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_grams"),
                F.sum(F.col("bloom_hit").cast("int"))
                .cast("bigint")
                .alias("n_bloom_hits"),
                F.sum(F.when(F.col("_ev").isNotNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_confirmed"),
            )
            .filter(F.col("n_bloom_hits") >= 1)
        )
        out.write.mode("append").parquet(flags_path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "b*"))
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_bloom"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    streamed = {
        (r["doc_id"], r["n_grams"], r["n_bloom_hits"], r["n_confirmed"])
        for r in spark.read.parquet(flags_path).collect()
    }
    batch = {
        (r["doc_id"], r["n_grams"], r["n_bloom_hits"], r["n_confirmed"])
        for r in catalog.QUERIES["bloom_decontaminate"](spark, sf_dir).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_streaming_exact_jaccard_dedup_on_arrival(spark, tmp_path):
    """r08: EXACT-jaccard dedup-on-arrival — the PPJoin twin of the
    MinHash streaming index test: each micro-batch probes the
    persisted prepare_ppjoin_index parquet under the FROZEN first-batch
    dictionary, appends its survivors' prepared rows, and only
    survivors reach the corpus. Unlike the MinHash path this is
    lossless by construction (no banding miss probability): the final
    corpus must equal the sequential first-arrival semantics."""
    import json
    import os

    from openetl_spark.operators import dedup as DD

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    u1 = "one two three four five six seven eight nine ten"
    u2 = "red orange yellow green blue indigo violet pink brown black"
    batches = [
        [(1, base), (2, u1)],
        [(3, base + " extra"), (4, u2), (5, u2)],          # 3→1, 5→4
        [(6, u1 + " more"), (7, "completely different words nothing shared here at all folks yes")],  # 6→2
    ]
    src = tmp_path / "pp_docs"
    src.mkdir()
    for i, rows in enumerate(batches):
        f = src / f"b{i}.json"
        f.write_text(
            "\n".join(json.dumps({"doc_id": d, "text": t}) for d, t in rows) + "\n"
        )
        os.utime(f, (1000000000 + i * 60,) * 2)

    dict_path = str(tmp_path / "pp_dict")
    idx_path = str(tmp_path / "pp_index")
    out_path = str(tmp_path / "pp_corpus")
    empty_index = spark.createDataFrame(
        [], "id long, l long, arr array<string>, pre array<struct<tok:string, rn:int>>"
    )

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        if not os.path.exists(dict_path):  # freeze the order on batch 0
            DD.ppjoin_dictionary(df, "text").write.parquet(dict_path)
        dic = spark.read.parquet(dict_path)
        prepared = (
            spark.read.parquet(idx_path)
            if os.path.exists(idx_path)
            else empty_index
        )
        df = df.withColumnRenamed("doc_id", "id")
        flagged = DD.ppjoin_incremental(
            df, prepared, dic, "id", "text", tau_num=1, tau_den=2
        )
        survivors = df.join(flagged.select("id"), "id", "left_anti")
        survivors.withColumnRenamed("id", "doc_id").write.mode(
            "append"
        ).parquet(out_path)
        DD.prepare_ppjoin_index(
            survivors, "id", "text", dic, tau_num=1, tau_den=2
        ).write.mode("append").parquet(idx_path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_pp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    kept = sorted(r["doc_id"] for r in spark.read.parquet(out_path).collect())
    assert kept == [1, 2, 4, 7]
    idx_ids = sorted(r["id"] for r in spark.read.parquet(idx_path).collect())
    assert idx_ids == [1, 2, 4, 7]


def test_streaming_weighted_sample_keys_equal_batch(spark, sf_dir, tmp_path):
    """r08: the weighted-sampling streaming twin — each micro-batch
    APPENDS its item-key relation (weighted_sample_keys: min of w
    seeded draws per item; every item's draws live entirely in its own
    batch, so the union of per-batch relations IS the full relation),
    and ranking the accumulated log on read must reproduce the batch
    weighted_sample exactly, inclusion order included."""
    import os

    from pyspark.sql import Window

    from openetl_spark.operators.curation import (
        weighted_sample,
        weighted_sample_keys,
    )

    d = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select(
            "doc_id",
            "lang",
            F.size(
                F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != "")
            ).cast("long").alias("n_tokens"),
        )
    )
    src = tmp_path / "ws_src"
    src.mkdir()
    for i in range(3):
        (
            d.filter(F.col("doc_id") % 3 == i)
            .coalesce(1)
            .write.mode("overwrite")
            .json(str(src / f"b{i}"))
        )
    log_path = str(tmp_path / "ws_keys_log")
    os.makedirs(log_path)

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        weighted_sample_keys(df, "n_tokens", ("lang",), "doc_id").write.mode(
            "append"
        ).parquet(log_path)

    q = (
        spark.readStream.schema("doc_id long, lang string, n_tokens long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "b*"))
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_ws"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    k = 20
    w = Window.partitionBy("lang").orderBy("_minh", "doc_id")
    streamed = {
        (r["lang"], r["doc_id"], r["_w"], r["pos"])
        for r in spark.read.parquet(log_path)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .filter(F.col("pos") <= k)
        .collect()
    }
    batch = {
        (r["lang"], r["doc_id"], r["n_tokens"], r["pos"])
        for r in weighted_sample(d, k, "n_tokens", ("lang",)).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_streaming_containment_dedup_on_arrival(spark, tmp_path):
    """r09 (VERDICT r08 #4): quotation-duplication-on-arrival — the
    containment twin of the streaming PPJoin test: each micro-batch
    probes the persisted prepare_ppjoin_index parquet under the FROZEN
    first-batch dictionary for DIRECTED containment (is this new doc
    mostly a quote of something known?), appends its survivors'
    prepared rows, and only survivors reach the corpus. Lossless by
    construction: the final corpus must equal the sequential
    first-arrival containment semantics."""
    import json
    import os

    from openetl_spark.operators import dedup as DD

    long_doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    batches = [
        [(1, long_doc), (2, other)],
        # 3 = quote of 1 (flagged); 4 = superset of 2 (NOT flagged:
        # it contains, it is not contained); 5 = quote of 4 in-batch
        [(3, "alpha beta gamma delta epsilon zeta eta theta"),
         (4, other + " eleven twelve thirteen fourteen"),
         (5, "one two three four five six seven eight nine ten eleven twelve")],
        # 6 = unseen-token doc; 7 = its quote (frozen dict never saw these)
        [(6, "zz1 zz2 zz3 zz4 zz5"), (7, "zz1 zz2 zz3 zz4")],
    ]
    src = tmp_path / "ct_docs"
    src.mkdir()
    for i, rows in enumerate(batches):
        f = src / f"b{i}.json"
        f.write_text(
            "\n".join(json.dumps({"doc_id": d, "text": t}) for d, t in rows) + "\n"
        )
        os.utime(f, (1000000000 + i * 60,) * 2)

    dict_path = str(tmp_path / "ct_dict")
    idx_path = str(tmp_path / "ct_index")
    out_path = str(tmp_path / "ct_corpus")
    empty_index = spark.createDataFrame(
        [], "id long, l long, arr array<string>, pre array<struct<tok:string, rn:int>>"
    )

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        if not os.path.exists(dict_path):  # freeze the order on batch 0
            DD.ppjoin_dictionary(df, "text").write.parquet(dict_path)
        dic = spark.read.parquet(dict_path)
        prepared = (
            spark.read.parquet(idx_path)
            if os.path.exists(idx_path)
            else empty_index
        )
        df = df.withColumnRenamed("doc_id", "id")
        flagged = DD.containment_incremental(
            df, prepared, dic, "id", "text", tau_num=4, tau_den=5
        )
        survivors = df.join(flagged.select("id"), "id", "left_anti")
        survivors.withColumnRenamed("id", "doc_id").write.mode(
            "append"
        ).parquet(out_path)
        DD.prepare_ppjoin_index(
            survivors, "id", "text", dic, tau_num=4, tau_den=5
        ).write.mode("append").parquet(idx_path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_ct"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    kept = sorted(r["doc_id"] for r in spark.read.parquet(out_path).collect())
    assert kept == [1, 2, 4, 6]
    idx_ids = sorted(r["id"] for r in spark.read.parquet(idx_path).collect())
    assert idx_ids == [1, 2, 4, 6]


def test_streaming_dsir_scores_equal_batch(spark, tmp_path):
    """r09 (C136 twin): DSIR score-on-arrival — the dictionary is
    fitted ONCE on the reference corpus (batch 0) and FROZEN; every
    later micro-batch scores its documents independently against the
    broadcast integer ratios (scoring is stateless per doc), so the
    streamed score log must equal batch scoring of the whole arrival
    set with the same dictionary. The production posture: fit
    offline, score forever — rescoring never refits."""
    import json
    import os

    from openetl_spark.operators import curation as C

    ref = [
        (1, "the cat sat on the mat", "en"),
        (2, "der hund lief im park", "de"),
        (3, "the dog ran in the park", "en"),
        (4, "le chat est sur le tapis", "fr"),
    ]
    arrivals = [
        [(10, "the cat ran on the mat"), (11, "der hund im park")],
        [(12, "the park the mat the dog"), (13, "chat tapis parc")],
    ]
    # Frozen dictionary from the reference corpus (target = en docs).
    ref_df = spark.createDataFrame(ref, "doc_id long, text string, lang string")
    feats = C.dsir_features(ref_df, n_buckets=64)
    totals = C.dsir_bucket_totals(
        feats, ref_df.filter("lang = 'en'").select("doc_id")
    ).collect()
    ratios = spark.createDataFrame(
        C.dsir_log_ratios(totals, 64), "b bigint, r_unats bigint"
    )

    src = tmp_path / "dsir_docs"
    src.mkdir()
    for i, rows in enumerate(arrivals):
        f = src / f"b{i}.json"
        f.write_text(
            "\n".join(json.dumps({"doc_id": d, "text": t}) for d, t in rows) + "\n"
        )
        os.utime(f, (1000000000 + i * 60,) * 2)
    out_path = str(tmp_path / "dsir_scores_log")

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        C.dsir_scores(C.dsir_features(df, n_buckets=64), ratios).write.mode(
            "append"
        ).parquet(out_path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream.writeStream.foreachBatch(apply_batch).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)

    streamed = {
        (r["doc_id"], r["n_feats"], r["score_unats"], r["selected"])
        for r in spark.read.parquet(out_path).collect()
    }
    all_docs = spark.createDataFrame(
        [r for b in arrivals for r in b], "doc_id long, text string"
    )
    batch = {
        (r["doc_id"], r["n_feats"], r["score_unats"], r["selected"])
        for r in C.dsir_scores(
            C.dsir_features(all_docs, n_buckets=64), ratios
        ).collect()
    }
    assert streamed == batch and len(streamed) == 4


def test_streaming_privacy_audit_cells_equal_batch(spark, tmp_path):
    """r09 (C138 twin): the privacy audits are mergeable-cell
    reports — per-(QI, band) counts are plain SUMs, so a streaming
    maintainer appends per-batch count cells and the k/l audit read
    from the merged log must equal the batch audit of the full
    arrival set (the CMS/HLL/KMV cell-log discipline applied to the
    privacy family; no per-record state, watermark-free)."""
    import json
    import os

    from pyspark.sql import functions as F

    from openetl_spark.operators import curation as C

    batches = [
        [("a", "x", 1), ("a", "x", 2), ("b", "y", 1)],
        [("a", "x", 1), ("b", "y", 3), ("b", "y", 3)],
        [("a", "z", 2), ("a", "x", 2)],
    ]
    src = tmp_path / "priv_rows"
    src.mkdir()
    for i, rows in enumerate(batches):
        f = src / f"b{i}.json"
        f.write_text(
            "\n".join(
                json.dumps({"qi1": q1, "qi2": q2, "s": s}) for q1, q2, s in rows
            )
            + "\n"
        )
        os.utime(f, (1000000000 + i * 60,) * 2)
    log_path = str(tmp_path / "priv_cells")

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        # Per-batch cells: (qi1, qi2, s, n) — the finest grain both
        # k (sum n over s) and distinct-l (count s with n > 0) need.
        df.groupBy("qi1", "qi2", "s").agg(
            F.count(F.lit(1)).alias("n")
        ).write.mode("append").parquet(log_path)

    stream = (
        spark.readStream.schema("qi1 string, qi2 string, s int")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream.writeStream.foreachBatch(apply_batch).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)

    merged = (
        spark.read.parquet(log_path)
        .groupBy("qi1", "qi2", "s")
        .agg(F.sum("n").alias("n"))
    )
    streamed = {
        (r["qi1"], r["qi2"]): (r["k"], r["l"])
        for r in merged.groupBy("qi1", "qi2")
        .agg(
            F.sum("n").cast("bigint").alias("k"),
            F.count_distinct("s").cast("bigint").alias("l"),
        )
        .collect()
    }
    all_rows = spark.createDataFrame(
        [r for b in batches for r in b], "qi1 string, qi2 string, s int"
    )
    batch = {
        (r["qi1"], r["qi2"]): (r["k"], r["l"])
        for r in C.k_anonymity(all_rows, ["qi1", "qi2"], "s").collect()
    }
    assert streamed == batch and len(streamed) == 3


def test_streaming_cohort_retention_cells_equal_batch(spark, sf_dir):
    """r11: the cohort-retention streaming twin — the C153 matrix is
    an audit over two MERGEABLE per-batch relations: (user, partial
    min signup ts) composes by min, and the distinct (user,
    active-day-bucket) cells compose by union-distinct (the CMS/HLL
    cell-log discipline). Events arrive in three micro-batches; the
    audit derived from the merged state must equal the batch operator
    row-for-row. (The strict-order FUNNEL has no such decomposition —
    step k's anchor depends on step k−1's final value across batches —
    which is why the funnel family has no cell-log twin.)"""
    import os

    from openetl_spark.operators import analytics as A

    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    batch = {
        (r["cohort"], r["period"]): (
            r["n_cohort"], r["n_active"], r["retention"]
        )
        for r in A.cohort_retention(e, grain_days=7).collect()
    }
    assert batch, "no cohorts on testdata"

    epoch = F.lit("1970-01-01").cast("date")
    bidx = F.floor(F.datediff(F.col("ts").cast("date"), epoch) / 7).cast(
        "int"
    )
    # three stable micro-batches; per-batch state relations
    anchors, cells = [], []
    for i in range(3):
        b = e.filter(F.abs(F.hash("user_id", "ts")) % 3 == i)
        anchors.append(
            b.filter(F.col("event_type") == "signup")
            .groupBy("user_id")
            .agg(F.min("ts").alias("t0"))
        )
        cells.append(
            b.select("user_id", bidx.alias("bucket")).distinct()
        )
    # merge laws: min over partial mins; union-distinct over cells
    anchor = (
        anchors[0].unionByName(anchors[1]).unionByName(anchors[2])
        .groupBy("user_id").agg(F.min("t0").alias("t0"))
    )
    act = cells[0].unionByName(cells[1]).unionByName(cells[2]).distinct()
    # audit from merged state (the operator's exact math)
    c = anchor.select(
        "user_id",
        F.date_format(
            F.date_add(
                epoch,
                F.floor(F.datediff(F.col("t0").cast("date"), epoch) / 7)
                .cast("int") * 7,
            ),
            "yyyy-MM-dd",
        ).alias("cohort"),
        F.floor(F.datediff(F.col("t0").cast("date"), epoch) / 7)
        .cast("int")
        .alias("_c"),
    )
    sizes = c.groupBy("cohort", "_c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort")
    )
    audit = (
        act.join(c, "user_id")
        .select(
            "cohort", "_c",
            (F.col("bucket") - F.col("_c")).cast("int").alias("period"),
            "user_id",
        )
        .filter(F.col("period") >= 0)
        .distinct()
        .groupBy("cohort", "_c", "period")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
        .join(F.broadcast(sizes), ["cohort", "_c"])
        .select(
            "cohort", "period", "n_cohort", "n_active",
            (F.col("n_active").cast("double") / F.col("n_cohort")).alias(
                "retention"
            ),
        )
    )
    streamed = {
        (r["cohort"], r["period"]): (
            r["n_cohort"], r["n_active"], r["retention"]
        )
        for r in audit.collect()
    }
    assert streamed == batch


def test_streaming_association_rule_cells_equal_batch(spark, sf_dir):
    """r12 (VERDICT r11 #5): the association-rules streaming twin —
    with BASKET-COMPLETE micro-batches (a basket never splits across
    arrivals, the bipartite-census cell-log precondition), every
    ingredient of the C156 rule relation is a mergeable cell log:
    per-batch pair counts, item supports, and basket totals all
    compose by plain SUM because baskets are disjoint across batches.
    The rule relation derived from the merged state must equal the
    batch operator row-for-row. (rfm_scores deliberately has NO such
    twin: its tiles are corpus-relative ranks — see its docstring.)"""
    import os

    from openetl_spark.operators import analytics as A

    li = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select("l_orderkey", "l_partkey")
    )
    batch_rules = {
        (r["antecedent"], r["consequent"]): (
            r["n_both"], r["n_ante"], r["n_cons"], r["n_baskets"],
            r["confidence"], r["lift_num"], r["lift_den"],
        )
        for r in A.association_rules(
            li, "l_orderkey", "l_partkey", min_support=2
        ).collect()
    }
    assert batch_rules, "no frequent pairs on testdata"

    # three BASKET-complete arrivals (split on the basket key)
    pair_cells, item_cells, total_cells = [], [], []
    for i in range(3):
        b = li.filter(F.abs(F.hash("l_orderkey")) % 3 == i).dropDuplicates()
        l, r = b.alias("l"), b.alias("r")
        pair_cells.append(
            l.join(
                r,
                (F.col("l.l_orderkey") == F.col("r.l_orderkey"))
                & (F.col("l.l_partkey") < F.col("r.l_partkey")),
            )
            .groupBy(
                F.col("l.l_partkey").alias("x"),
                F.col("r.l_partkey").alias("y"),
            )
            .agg(F.count_distinct("l.l_orderkey").cast("bigint").alias("n"))
        )
        item_cells.append(
            b.groupBy(F.col("l_partkey").alias("it")).agg(
                F.count_distinct("l_orderkey").cast("bigint").alias("n")
            )
        )
        total_cells.append(
            b.agg(F.count_distinct("l_orderkey").cast("bigint").alias("n"))
        )

    def merged(cells, keys):
        out = cells[0].unionByName(cells[1]).unionByName(cells[2])
        if keys:
            return out.groupBy(*keys).agg(
                F.sum("n").cast("bigint").alias("n")
            )
        return out.agg(F.sum("n").cast("bigint").alias("n"))

    pairs_m = merged(pair_cells, ["x", "y"]).select(
        "x", "y", F.col("n").alias("n_both")
    )
    items_m = {r["it"]: r["n"] for r in merged(item_cells, ["it"]).collect()}
    total_m = merged(total_cells, []).collect()[0]["n"]

    # ingredient-level merge laws: each merged cell log equals the
    # batch relation it stands in for
    batch_items = {
        r["it"]: r["n"]
        for r in li.groupBy(F.col("l_partkey").alias("it"))
        .agg(F.count_distinct("l_orderkey").cast("bigint").alias("n"))
        .collect()
    }
    assert items_m == batch_items
    assert total_m == li.select("l_orderkey").distinct().count()

    # the full rule relation from the merged pair log == batch
    streamed_rules = {
        (r["antecedent"], r["consequent"]): (
            r["n_both"], r["n_ante"], r["n_cons"], r["n_baskets"],
            r["confidence"], r["lift_num"], r["lift_den"],
        )
        for r in A.association_rules(
            li, "l_orderkey", "l_partkey", min_support=2, pairs=pairs_m
        ).collect()
    }
    assert streamed_rules == batch_rules
