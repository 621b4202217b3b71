"""Structured Streaming operators.

The reference has no streaming — updates are batch diff replays
(src/nominatim_db/tools/replication.py) — but a 100 TB training-data
deployment ingests pages continuously, so the engine ships the incremental
forms of its batch operators:

* :func:`windowed_event_counts` — tumbling-window aggregation with a
  watermark for late data (the streaming form of gate
  ``events_tumbling_window``)
* :func:`streaming_dedup` — exact dedup on a key within the watermark
  horizon (``dropDuplicates`` with event-time bound): the streaming form of
  the exact-dedup operator
* :func:`stream_geocode_microbatch` — foreachBatch bridge: each micro-batch
  of pages runs the SAME batch extract+geocode DAG against the published
  index (incremental geocoding without a second code path)

All use event time + watermarks, never processing time, so results are
deterministic and replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    group_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts/sums over a streaming events source."""
    # parquet sources surface TIMESTAMP_NTZ; watermarks require TIMESTAMP
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), group_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(24,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            group_col, "n_events", "sum_value",
        )
    )


def streaming_dedup(
    df: DataFrame,
    *,
    key: str = "url",
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact streaming dedup: first row per key within the watermark wins."""
    df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, watermark).dropDuplicates([key])


def stream_geocode_microbatch(spark, pages_stream: DataFrame, idx, osmline,
                              sink_fn):
    """foreachBatch incremental geocoding: every micro-batch runs the batch
    extract+geocode DAG (single code path, batch == streaming semantics).

    ``sink_fn(result_df, batch_id)`` receives each geocoded micro-batch.
    """
    from nominatim_spark.pipeline.extract import extract_pages
    from nominatim_spark.pipeline.search import geocode

    def process(batch_df: DataFrame, batch_id: int) -> None:
        mentions = (
            extract_pages(batch_df)
            .filter(F.col("mention").isNotNull())
            .withColumn(
                "query_id",
                F.concat(F.col("url"), F.lit("#"), F.col("mention_idx")),
            )
            .select("query_id", F.col("mention").alias("qtext"))
        )
        sink_fn(geocode(spark, idx, mentions, osmline=osmline), batch_id)

    return pages_stream.writeStream.foreachBatch(process)
