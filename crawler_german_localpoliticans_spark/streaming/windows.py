"""Event-time windowed aggregation with watermark (Structured Streaming).

The crawl engine itself is iterative batch (SURVEY.md §2.8) — this module
provides the streaming-analytics surface a live deployment would run over
the engine's output feed (or any event stream): tumbling event-time windows
with late-data handling via watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows per event_type; works on a batch OR
    streaming DataFrame (same plan — Catalyst inserts the stateful
    aggregation only under a stream)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    query_name: str = "event_windows",
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """availableNow file stream over an events parquet dir -> windowed
    counts in a memory sink. Returns the started query."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    agg = windowed_event_counts(stream, window, watermark)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
