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


def test_stream_static_join_enrichment(spark, sf_dir, tmp_path):
    """Stream-static join: enrich a stream with a dimension table (the
    standard lookup pattern; the static side re-resolves per batch)."""
    src = str(tmp_path / "orders_stream")
    catalog.load(spark, sf_dir, "orders").coalesce(2).write.parquet(src)
    cust = catalog.load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    enriched = stream.join(cust, stream.o_custkey == cust.c_custkey).groupBy(
        "c_mktsegment"
    ).count()
    q = (
        enriched.writeStream.format("memory")
        .queryName("t_enrich")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["c_mktsegment"]: r["count"] for r in spark.sql("SELECT * FROM t_enrich").collect()}
    exp = {
        r["c_mktsegment"]: r["count"]
        for r in catalog.load(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .count()
        .collect()
    }
    assert got == exp


def test_foreach_batch_sink(spark, sf_dir, tmp_path):
    """foreachBatch: arbitrary per-micro-batch sink logic (the
    exactly-once escape hatch for sinks without native streaming
    support — e.g. JDBC upserts)."""
    src = str(tmp_path / "ev_fb")
    catalog.load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    seen = []

    def handle(batch_df, epoch_id):
        seen.append((epoch_id, batch_df.count()))

    q = stream.writeStream.foreachBatch(handle).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(seen) >= 2  # one call per micro-batch
    assert sum(n for _, n in seen) == spark.read.parquet(src).count()
