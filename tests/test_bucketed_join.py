"""Bucketed pages-join evidence (SCALE.md): with the pages corpus stored
bucketed by url, the per-round frontier⋈pages join shuffles ONLY the
frontier side — the 100 TB side never moves."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_pages_join_shuffles_frontier_side_only(spark, smoke_dir):
    # uses the session's default warehouse dir (spark-warehouse/, gitignored)
    pages = spark.read.parquet(f"{smoke_dir}/pages.parquet").select("url", "warc_ts", "html")
    spark.sql("DROP TABLE IF EXISTS pages_bucketed")
    # an orphaned managed-table dir from a previous session blocks CREATE
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/pages_bucketed", ignore_errors=True)
    (
        pages.write.mode("overwrite")
        .bucketBy(8, "url")
        .sortBy("url")
        .format("parquet")
        .saveAsTable("pages_bucketed")
    )
    bucketed = spark.table("pages_bucketed")
    frontier = pages.select("url").limit(20).withColumn("depth", F.lit(0))

    # disable broadcast so the plan decision is about bucketing, not size
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = frontier.join(bucketed, "url", "left")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)

    # exactly ONE exchange (the frontier side); the bucketed scan feeds the
    # sort-merge join without a shuffle
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" in plan
    # and results still come back
    assert joined.count() == 20
