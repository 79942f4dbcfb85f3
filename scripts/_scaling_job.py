"""One scaling measurement: run the two headline stages at a given core
count and print a JSON line. Invoked by scripts/bench_scaling.py in a fresh
JVM per parallelism level.

Workload: the wave pipeline's compute stages over a replicated corpus —
(a) frontier work: link extraction UDF + candidate posexplode +
    first-discovery dedup + anti-join (the scheduled+deduped metric);
(b) extraction: clean_html + text UDFs over every page.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(cores: int, replicas: int, sf_dir: str) -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"scaling-{cores}")
        # partitioning is DATA-driven, identical at both levels: per-task
        # work (Arrow batches, memo amortization) must not depend on the
        # parallelism level or the comparison measures batching, not scaling
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from crawler_german_localpoliticans_spark.functions import udfs
    from crawler_german_localpoliticans_spark.sources.webcorpus import corpus_from_documents

    base, _, _ = corpus_from_documents(spark, sf_dir)
    pages = (
        base.crossJoin(F.broadcast(spark.range(replicas).select(F.col("id").alias("rep"))))
        .withColumn("url", F.concat(F.col("url"), F.lit("?r="), F.col("rep")))
        .drop("rep")
    )
    pages = pages.repartition(64).persist()
    n_pages = pages.count()  # materialize outside the timed window

    # (a) frontier scheduling/dedup work — one pass: link-extraction UDF,
    # candidate explode, first-discovery dedup (partial aggs map-side)
    t0 = time.monotonic()
    links = pages.select(
        F.col("url"), udfs.found_links(F.col("url"), F.col("html")).alias("found_links")
    )
    cand = links.select(
        F.xxhash64("url").alias("parent"), F.posexplode("found_links").alias("pos", "child")
    )
    first = cand.groupBy("child").agg(
        F.min(F.struct("parent", "pos")).alias("first"), F.count(F.lit(1)).alias("n")
    )
    row = first.agg(F.count(F.lit(1)).alias("deduped"), F.sum("n").alias("cands")).collect()[0]
    n_deduped, n_candidates = int(row["deduped"]), int(row["cands"])
    frontier_sec = time.monotonic() - t0

    # (b) extraction
    t0 = time.monotonic()
    extracted = pages.select(
        "url", udfs.clean_extract(F.col("html")).alias("ce")
    ).select("url", F.col("ce.text").alias("text"))
    n_extracted = extracted.where(F.length("text") > 0).count()
    extract_sec = time.monotonic() - t0

    spark.stop()
    print(
        json.dumps(
            {
                "cores": cores,
                "pages": n_pages,
                "candidates": n_candidates,
                "deduped": n_deduped,
                "frontier_sec": round(frontier_sec, 2),
                "frontier_urls_per_sec": round((n_pages + n_candidates) / frontier_sec, 1),
                "extract_sec": round(extract_sec, 2),
                "pages_extracted_per_sec": round(n_extracted / extract_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main(
        int(sys.argv[1]),
        int(sys.argv[2]) if len(sys.argv) > 2 else 8,
        sys.argv[3] if len(sys.argv) > 3 else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
