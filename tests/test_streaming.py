"""Structured Streaming tests: windowed aggregation parity with batch,
streaming dedup, and foreachBatch incremental geocoding."""

import pytest
from pyspark.sql import functions as F

from nominatim_spark.streaming.windowed import (
    streaming_dedup,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory, sf_dir):
    out = str(tmp_path_factory.mktemp("events_stream"))
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(4).write.mode(
        "overwrite"
    ).parquet(out)
    return out


def test_windowed_counts_match_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    schema = batch.schema

    stream = spark.readStream.schema(schema).parquet(events_dir)
    sdf = windowed_event_counts(stream)
    q = (
        sdf.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT window_start, event_type, n_events, sum_value FROM win_counts"
    )
    # batch form of the same aggregation; append mode only emits windows the
    # watermark has finalized (window end <= max_ts - 10 minutes), so the
    # expectation excludes the trailing open windows
    batch = batch.withColumn("ts", F.col("ts").cast("timestamp"))
    max_ts = batch.agg(F.max("ts")).head()[0]
    exp_batch = (
        batch.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(24,6)")).cast("double").alias("sum_value"),
        )
        .filter(
            F.col("win.end") <= F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES")
        )
        .select(F.col("win.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )
    g = sorted(map(tuple, got.collect()))
    e = sorted(map(tuple, exp_batch.collect()))
    assert g == e and len(g) > 0


def test_streaming_dedup(spark, tmp_path):
    pdf_dir = str(tmp_path / "pages")
    from nominatim_spark.sources import synth

    pages = synth.pages_df(spark, n_pages=100, n_cities=4, n_streets=4,
                           n_houses=4, n_pois=2)
    dup = pages.unionByName(pages)  # every url twice
    dup.write.mode("overwrite").parquet(pdf_dir)

    stream = spark.readStream.schema(pages.schema).parquet(pdf_dir)
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("deduped_pages")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(*) AS n FROM deduped_pages").head().n
    assert n == 100  # duplicates dropped
