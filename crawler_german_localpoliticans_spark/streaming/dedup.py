"""Streaming URL-seen dedup — the Structured-Streaming form of the
reference's Redis `SADD visited` check-and-add (src/main.rs:30-45).

The batch engine keeps URL-seen as the bloom sidecar + exact anti-join
(plans/crawl.py, plans/bloom.py). When discovered URLs arrive as a STREAM,
the same contract — first discovery wins, duplicates never re-enqueue — is
Spark-managed state, hash-partitioned on the dedup key so the check-and-add
is local to its partition (no cross-executor coordination, exactly like the
partitioned bloom). Two state regimes, chosen explicitly:

- EXACT (default, `bounded_by_watermark=False`): plain `dropDuplicates` —
  one state row per distinct URL, forever. This IS the Redis SADD
  semantics, and like Redis it grows with the distinct-key count; Spark
  only evicts dedup state when the event-time column is part of the dedup
  key, so a watermark would be dead weight here and none is applied.
- BOUNDED (`bounded_by_watermark=True`): `dropDuplicatesWithinWatermark` —
  duplicates are suppressed only within the watermark horizon and state
  ages out past it, the trade a 10^10-URL frontier makes (a URL
  re-discovered after the horizon re-emits once and the downstream exact
  anti-join — or the bloom sidecar — catches it, the same
  definite-new / maybe-seen split as the batch path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def deduped_discovery_stream(
    discovered: DataFrame,
    url_col: str = "canonical_url",
    ts_col: str = "discovered_at",
    watermark: str = "10 minutes",
    bounded_by_watermark: bool = False,
) -> DataFrame:
    """First-discovery-wins over a stream of (canonical_url, discovered_at,
    ...) rows: exactly one output row per distinct URL (within the watermark
    horizon when bounded). A key already in state never re-emits; within a
    single micro-batch the surviving row among simultaneous duplicates is
    engine-chosen, exactly like the reference's racing workers (SURVEY §7 —
    whichever worker's SADD lands first wins). See the module docstring for
    the exact-vs-bounded state trade.

    The event-time column is cast to session-tz TIMESTAMP (watermarks
    reject TIMESTAMP_NTZ; sessions here pin UTC so the cast is a no-op
    re-labeling)."""
    discovered = discovered.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if bounded_by_watermark:
        return discovered.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [url_col]
        )
    # exact mode: no watermark — it would NOT evict dropDuplicates state
    # (eviction requires the event-time column in the dedup subset), so
    # attaching one would only misdocument the state as bounded
    return discovered.dropDuplicates([url_col])


def run_discovery_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    url_col: str = "canonical_url",
    ts_col: str = "discovered_at",
    watermark: str = "10 minutes",
    bounded_by_watermark: bool = False,
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
    deduped = deduped_discovery_stream(
        stream, url_col, ts_col, watermark, bounded_by_watermark
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
