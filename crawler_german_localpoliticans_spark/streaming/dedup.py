"""Streaming URL-seen dedup — the Structured-Streaming form of the
reference's Redis `SADD visited` check-and-add (src/main.rs:30-45).

The batch engine keeps URL-seen as the bloom sidecar + exact anti-join
(plans/crawl.py, plans/bloom.py). When discovered URLs arrive as a STREAM,
the same contract — first discovery wins, duplicates never re-enqueue — is
Spark-managed state: a watermarked `dropDuplicates` on the canonical URL.
Spark stores one state row per distinct key; the watermark bounds that
state (keys older than the horizon age out), which is what keeps a
10^10-URL frontier's seen-set finite per partition — the streaming analog
of the bloom sidecar's per-partition O(m/P) slices. State is hash-
partitioned on the dedup key, so the check-and-add is local to its
partition: no cross-executor coordination, exactly like the partitioned
bloom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def deduped_discovery_stream(
    discovered: DataFrame,
    url_col: str = "canonical_url",
    ts_col: str = "discovered_at",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-discovery-wins over a stream of (canonical_url, discovered_at,
    ...) rows: exactly one output row per distinct URL within the watermark
    horizon. A key already in state NEVER re-emits (the SADD contract);
    within a single micro-batch the surviving row among simultaneous
    duplicates is engine-chosen, exactly like the reference's racing
    workers (SURVEY §7 — whichever worker's SADD lands first wins).

    The event-time column is cast to session-tz TIMESTAMP (watermarks
    reject TIMESTAMP_NTZ; sessions here pin UTC so the cast is a no-op
    re-labeling)."""
    discovered = discovered.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return discovered.withWatermark(ts_col, watermark).dropDuplicates([url_col])


def run_discovery_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    url_col: str = "canonical_url",
    ts_col: str = "discovered_at",
    watermark: str = "10 minutes",
):
    """File-source form (one parquet drop per crawl wave): reads discovered
    URLs as a stream, emits the first-seen rows, checkpointed so a restart
    resumes the seen-state exactly (the streaming analog of the crawl
    checkpoint log's resume contract)."""
    stream = (
        spark.readStream.schema(
            spark.read.parquet(input_dir).schema
        ).parquet(input_dir)
    )
    deduped = deduped_discovery_stream(stream, url_col, ts_col, watermark)
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
