"""Source/sink round-trips through the connector layer: CSV, JSON,
binaryFile multimodal ingest, nested-struct dotted paths."""

from pyspark.sql import functions as F

from openetl_spark import catalog
from openetl_spark.functions.transforms import apply_transforms
from openetl_spark.operators import multimodal as M
from openetl_spark.pipeline import Orchestrator, Pipeline
from openetl_spark.spec import Connector, Filter, Sort, Transformation


def test_csv_roundtrip_through_connectors(spark, sf_dir, tmp_path):
    out = str(tmp_path / "nation_csv")
    # parquet -> csv sink
    Orchestrator(spark=spark).run_pipeline(
        Pipeline(
            id="to_csv",
            source=Connector(adapter_id="parquet", endpoint_id=f"{sf_dir}/nation.parquet"),
            target=Connector(
                adapter_id="csv",
                endpoint_id=out,
                config={"mode": "overwrite", "options": {"header": "true"}},
            ),
        )
    )
    # csv source with schema -> filtered read
    res = Orchestrator(spark=spark).run_pipeline(
        Pipeline(
            id="from_csv",
            source=Connector(
                adapter_id="csv",
                endpoint_id=out,
                config={
                    "options": {"header": "true"},
                    "schema": "n_nationkey int, n_name string, n_regionkey int",
                },
                filters=[Filter("n_regionkey", "=", 2)],
                sort=[Sort("n_nationkey")],
            ),
        )
    )
    rows = res.collect()
    assert rows and all(r["n_regionkey"] == 2 for r in rows)


def test_json_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "region_json")
    Orchestrator(spark=spark).run_pipeline(
        Pipeline(
            id="to_json",
            source=Connector(adapter_id="parquet", endpoint_id=f"{sf_dir}/region.parquet"),
            target=Connector(adapter_id="json", endpoint_id=out, config={"mode": "overwrite"}),
        )
    )
    back = Orchestrator(spark=spark).run_pipeline(
        Pipeline(
            id="from_json",
            source=Connector(
                adapter_id="json",
                endpoint_id=out,
                config={"schema": "r_regionkey int, r_name string"},
            ),
        )
    )
    assert {r["r_name"] for r in back.collect()} == {
        "AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"
    }


def test_binaryfile_multimodal_ingest(spark, tmp_path):
    """C30 end-to-end: binary files on disk -> binaryFile connector ->
    media-type sniff -> stub feature extraction (the S3-object pattern,
    lakehouse edition)."""
    from tests.media_fixtures import make_jpeg, make_png, make_wav

    d = tmp_path / "blobs"
    d.mkdir()
    import numpy as np

    from openetl_spark.operators.media_synth import make_mjpeg_avi

    png = make_png(48, 32)
    (d / "a.png").write_bytes(png)
    (d / "b.jpg").write_bytes(make_jpeg(96, 64))
    (d / "c.wav").write_bytes(make_wav(16000, 0.25))
    (d / "d.avi").write_bytes(
        make_mjpeg_avi([np.full((8, 8, 3), 90, dtype=np.uint8)] * 4, fps=8)
    )
    res = Orchestrator(spark=spark).run_pipeline(
        Pipeline(
            id="blobs",
            source=Connector(adapter_id="binaryFile", endpoint_id=str(d)),
        )
    )
    df = M.with_media_type(res.df)
    kinds = {r["path"].rsplit("/", 1)[-1]: r["media_type"] for r in df.collect()}
    assert kinds == {"a.png": "png", "b.jpg": "jpeg", "c.wav": "wav", "d.avi": "avi"}
    feats = M.extract_image_features(df.filter(F.col("media_type") == "png"))
    row = feats.collect()[0]
    assert row["n_bytes"] == len(png) and (row["width"], row["height"]) == (48, 32)
    audio = M.extract_audio_features(df.filter(F.col("media_type") == "wav"))
    arow = audio.collect()[0]
    assert arow["sample_rate"] == 16000 and abs(arow["duration_s"] - 0.25) < 1e-6
    video = M.extract_video_features(df.filter(F.col("media_type") == "avi"))
    vrow = video.collect()[0]
    assert (vrow["width"], vrow["height"], vrow["n_frames"], vrow["fps"]) == (8, 8, 4, 8.0)


def test_nested_struct_dotted_paths(spark):
    """§1.2 nested data: dotted-path renameKey + mergeObjects round-trip
    (reference: dotted-path read in renameKey, transform.ts:31-41)."""
    df = spark.createDataFrame(
        [(1, ("Ada", "ada@x.com")), (2, ("Lin", "lin@y.org"))],
        "id long, user struct<name:string, email:string>",
    )
    out = apply_transforms(
        df,
        [
            Transformation("renameKey", {"from": "user.name", "to": "username"}),
            Transformation("uppercase", {"field": "username", "to": "username_up"}),
            Transformation("mergeObjects", {"fields": ["id", "username"], "to": "packed"}),
        ],
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["username"] == "Ada"
    assert rows[1]["username_up"] == "ADA"
    assert rows[2]["packed"]["username"] == "Lin"


def test_gif_frame_sampling_real_block_walk(spark, tmp_path):
    """C30: animated-GIF frame sampling is REAL — the block walk
    recovers every frame's geometry, delay, and byte span from a
    conformant GIF89a stream (global color table + Netscape loop
    extension skipped correctly), and every_n sampling keeps the right
    descriptors."""
    from tests.media_fixtures import make_animated_gif

    spec = [(0, 0, 20, 10, 5), (2, 1, 18, 9, 10), (4, 2, 16, 8, 15),
            (6, 3, 14, 7, 20), (8, 4, 12, 6, 25)]
    gif = make_animated_gif(20, 10, spec)
    df = spark.createDataFrame([("v.gif", bytearray(gif))], "path string, content binary")

    allf = M.sample_gif_frames(df).toPandas().sort_values("frame_idx")
    assert list(allf["frame_idx"]) == [0, 1, 2, 3, 4]
    assert list(zip(allf["left"], allf["top"], allf["width"], allf["height"])) == [
        (l, t, w, h) for (l, t, w, h, _) in spec
    ]
    assert list(allf["delay_cs"]) == [d for (*_, d) in spec]
    # each frame's byte slice starts at its image descriptor
    assert all(b[:1] == b"\x2c" for b in allf["frame_bytes"])

    sampled = M.sample_gif_frames(df, every_n=2).toPandas()
    assert sorted(sampled["frame_idx"]) == [0, 2, 4]

    # non-GIF input yields no frames (not an error)
    other = spark.createDataFrame([("x.bin", bytearray(b"not a gif"))],
                                  "path string, content binary")
    assert M.sample_gif_frames(other).count() == 0


def test_audio_window_sampling_localizes_loudness(spark):
    """C30: PCM window sampling finds the loud REGION of a clip —
    first half silence, second half a 0.5FS tone — with real decoded
    per-window rms/peak."""
    import struct as _struct
    import io, math, wave

    rate = 8000
    n = rate  # 1 second
    samples = [0] * (n // 2) + [
        int(0.5 * 32767 * math.sin(2 * math.pi * 440 * i / rate))
        for i in range(n // 2)
    ]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(rate)
        w.writeframes(b"".join(_struct.pack("<h", s) for s in samples))
    df = spark.createDataFrame([("t.wav", bytearray(buf.getvalue()))],
                               "path string, content binary")
    wins = {r["window_idx"]: r for r in M.sample_audio_windows(df, window_s=0.25).collect()}
    assert set(wins) == {0, 1, 2, 3}
    assert wins[0]["rms"] == 0.0 and wins[1]["rms"] == 0.0
    assert abs(wins[2]["rms"] - 0.5 / math.sqrt(2)) < 0.01
    assert abs(wins[3]["peak"] - 0.5) < 0.01
    assert abs(wins[2]["start_s"] - 0.5) < 1e-6


def test_sample_frames_dispatches_by_container(spark):
    """C30: sample_frames slices GIFs at real frame boundaries, WAVs at
    sample-aligned windows, and only falls back to byte windows for
    unknown formats."""
    from tests.media_fixtures import make_animated_gif, make_jpeg, make_wav

    gif = make_animated_gif(8, 8, [(0, 0, 8, 8, 1)] * 6)
    wav = make_wav(16000, 0.5)
    jpg = make_jpeg(32, 32)
    df = spark.createDataFrame(
        [("a.gif", bytearray(gif)), ("b.wav", bytearray(wav)), ("c.jpg", bytearray(jpg))],
        "path string, content binary",
    )
    out = M.sample_frames(df, frame_size=4096, stride=2).toPandas()
    by = {p: g.sort_values("frame_idx") for p, g in out.groupby("path")}
    # GIF: 6 real frames, stride 2 → indices 0,2,4, each a descriptor slice
    assert list(by["a.gif"]["frame_idx"]) == [0, 2, 4]
    assert all(b[:1] == b"\x2c" for b in by["a.gif"]["frame_bytes"])
    # WAV: 16000 Hz * 0.5 s = 8000 frames * 2 B = 16000 B → 4 windows
    # of 2048 samples (4096 B), stride 2 → 0,2; slices sample-aligned
    assert list(by["b.wav"]["frame_idx"]) == [0, 2]
    assert all(len(b) == 4096 for b in by["b.wav"]["frame_bytes"])
    # unknown container: byte-window fallback
    assert list(by["c.jpg"]["frame_idx"]) == [0]


def test_gif_pixel_decode_real_luma(spark):
    """C30: GIF pixel decode is REAL (stdlib LZW) — mean_luma on a
    black/white checkerboard GIF is exactly 0.5, and extract_image
    features carries it through the mapInPandas path."""
    from tests.media_fixtures import make_gif_with_pixels

    rows = [[(x + y) % 2 for x in range(20)] for y in range(20)]
    gif = make_gif_with_pixels([(0, 0, 0), (255, 255, 255)], rows)
    df = spark.createDataFrame([("c.gif", bytearray(gif))], "path string, content binary")
    feats = M.extract_image_features(df).collect()[0]
    assert (feats["width"], feats["height"]) == (20, 20)
    assert feats["format"] == "gif"
    assert feats["mean_luma"] == 0.5
