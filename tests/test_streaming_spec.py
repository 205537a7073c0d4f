"""Streaming as part of the declarative spec: Connector(streaming=True)
compiles to readStream; sinks become writeStream; and the REST data
source streams new rows per micro-batch."""

from pyspark.sql import functions as F

from openetl_spark import catalog
from openetl_spark.pipeline import Orchestrator, Pipeline
from openetl_spark.spec import Connector, Filter
from tests.mock_http import N_ROWS


def test_streaming_pipeline_file_to_memory(spark, sf_dir, tmp_path):
    src_dir = str(tmp_path / "ev")
    catalog.load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).coalesce(1).write.parquet(src_dir)

    cap = []
    src = Connector(
        adapter_id="parquet",
        endpoint_id=src_dir,
        streaming=True,
        filters=[Filter("event_type", "=", "purchase")],
        fields=["event_id", "user_id", "value"],
    )
    tgt = Connector(
        adapter_id="memory", endpoint_id="t_spec_stream", config={"capture": cap, "sync": True}
    )
    res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="stream", source=src, target=tgt))
    expected = (
        spark.read.parquet(src_dir).filter(F.col("event_type") == "purchase").count()
    )
    assert len(cap) == expected > 0
    assert set(cap[0].asDict()) == {"event_id", "user_id", "value"}


def test_streaming_pipeline_file_to_parquet(spark, sf_dir, tmp_path):
    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    catalog.load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).coalesce(1).write.parquet(src_dir)
    src = Connector(adapter_id="parquet", endpoint_id=src_dir, streaming=True)
    tgt = Connector(
        adapter_id="parquet",
        endpoint_id=out_dir,
        config={"sync": True, "checkpoint": str(tmp_path / "ckpt")},
    )
    Orchestrator(spark=spark).run_pipeline(Pipeline(id="s2p", source=src, target=tgt))
    assert spark.read.parquet(out_dir).count() == spark.read.parquet(src_dir).count()


def test_rest_stream_reader_drains_endpoint(spark):
    from openetl_spark.sources.rest_datasource import register

    register(spark)
    stream = (
        spark.readStream.format("openetl_rest")
        .options(
            transport="tests.mock_http:serve",
            schema_ddl="id long, name string, score double",
            items_per_page="50",
            max_pages_per_trigger="2",
        )
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_rest_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        r["id"] for r in spark.sql("SELECT * FROM t_rest_stream").collect()
    )
    assert got == list(range(N_ROWS))


def test_rest_stream_aggregation(spark):
    from openetl_spark.sources.rest_datasource import register

    register(spark)
    stream = (
        spark.readStream.format("openetl_rest")
        .options(
            transport="tests.mock_http:serve",
            schema_ddl="id long, name string, score double",
            items_per_page="100",
        )
        .load()
    )
    agg = stream.groupBy("score").count()
    q = (
        agg.writeStream.format("memory")
        .queryName("t_rest_agg")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["score"]: r["count"] for r in spark.sql("SELECT * FROM t_rest_agg").collect()}
    assert sum(rows.values()) == N_ROWS
    assert rows[0.0] == 24  # ids 0,10,...,230
