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
    png = make_png(48, 32)
    (d / "a.png").write_bytes(png)
    (d / "b.jpg").write_bytes(make_jpeg(96, 64))
    (d / "c.wav").write_bytes(make_wav(16000, 0.25))
    res = Orchestrator(spark=spark).run_pipeline(
        Pipeline(
            id="blobs",
            source=Connector(adapter_id="binaryFile", endpoint_id=str(d)),
        )
    )
    df = M.with_media_type(res.df)
    kinds = {r["path"].rsplit("/", 1)[-1]: r["media_type"] for r in df.collect()}
    assert kinds == {"a.png": "png", "b.jpg": "jpeg", "c.wav": "wav"}
    feats = M.extract_image_features(df.filter(F.col("media_type") == "png"))
    row = feats.collect()[0]
    assert row["n_bytes"] == len(png) and (row["width"], row["height"]) == (48, 32)
    audio = M.extract_audio_features(df.filter(F.col("media_type") == "wav"))
    arow = audio.collect()[0]
    assert arow["sample_rate"] == 16000 and abs(arow["duration_s"] - 0.25) < 1e-6


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
