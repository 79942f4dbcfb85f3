"""Incremental ingest of committed crawl output as a stream.

Replaces the reference's poll-loop incremental scan
(python_container/crawler_ingest.py:406-420 S3 relisting + :244-303 ETag
reprocess gate): Spark's file stream source tracks processed files in its
own checkpoint, so each committed round directory is ingested exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import FETCHED_SCHEMA


def stream_fetched_counts(
    spark: SparkSession, fetched_dir: str, checkpoint_dir: str, query_name: str = "fetched_counts"
):
    """availableNow stream over `<work_dir>/fetched/round=*` producing
    per-depth page counts into an in-memory sink. Returns the started query;
    caller awaits termination and reads `spark.table(query_name)`."""
    stream = (
        spark.readStream.schema(FETCHED_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(fetched_dir)
    )
    agg = stream.groupBy("depth").agg(
        F.count(F.lit(1)).alias("pages"),
        F.sum(F.col("keyword_hit").cast("long")).alias("keyword_pages"),
        F.sum(F.size("found_links")).alias("links"),
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def fetched_as_stream(spark: SparkSession, fetched_dir: str) -> DataFrame:
    """Raw streaming DataFrame over committed fetched rounds (building block
    for custom sinks)."""
    return (
        spark.readStream.schema(FETCHED_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(fetched_dir)
    )
