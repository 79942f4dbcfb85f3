"""S10 ETag-change reprocessing gate + J4 custom_id metadata join.

Reference semantics under test:
- crawler_ingest.py:245-303 `upsert_storage_object`: needs_processing =
  inserted OR etag_changed; unchanged objects only refresh metadata;
- db_writer.py:226-245 / :843-845: request metadata stored per custom_id
  with a 7-day TTL, loaded (or empty) when the batch output is processed.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from crawler_german_localpoliticans_spark.operators.ledger import (
    join_outputs_with_request_metadata,
)
from crawler_german_localpoliticans_spark.streaming.ingest import merge_storage_objects


def _listing(spark, rows):
    return spark.createDataFrame(
        rows, "bucket string, object_key string, etag string, size_bytes long"
    )


def test_etag_gate_flags_new_and_changed_only(spark):
    round1 = _listing(
        spark,
        [
            ("b", "k1", "e1", 10),
            ("b", "k2", "e2", 20),
            ("b", "k3", None, 30),  # object with no etag metadata
        ],
    )
    ledger, todo = merge_storage_objects(None, round1)
    assert {r["object_key"] for r in todo.collect()} == {"k1", "k2", "k3"}

    # round 2: k1 unchanged, k2 content changed, k3 etag still null
    # (null == null -> unchanged, the reference's Python != check), k4 new
    round2 = _listing(
        spark,
        [
            ("b", "k1", "e1", 10),
            ("b", "k2", "e2CHANGED", 25),
            ("b", "k3", None, 30),
            ("b", "k4", "e4", 40),
        ],
    )
    ledger2, todo2 = merge_storage_objects(ledger, round2)
    got = {r["object_key"]: (r["inserted"], r["etag_changed"]) for r in todo2.collect()}
    # flag semantics per the reference (crawler_ingest.py:257-260):
    # etag_changed initializes True and is only COMPARED when a ledger row
    # existed, so an inserted row is (True, True)
    assert got == {"k2": (False, True), "k4": (True, True)}
    # ledger carries the refreshed metadata for ALL listed objects
    led = {r["object_key"]: (r["etag"], r["size_bytes"]) for r in ledger2.collect()}
    assert led == {"k1": ("e1", 10), "k2": ("e2CHANGED", 25), "k3": (None, 30), "k4": ("e4", 40)}


def test_etag_gate_reprocesses_exactly_once(spark):
    """A changed object re-upserts exactly once: after its etag lands in the
    ledger, re-merging the same listing flags nothing."""
    base = _listing(spark, [("b", "k1", "e1", 1)])
    ledger, _ = merge_storage_objects(None, base)
    changed = _listing(spark, [("b", "k1", "e1v2", 2)])
    ledger2, todo = merge_storage_objects(ledger, changed)
    assert [r["object_key"] for r in todo.collect()] == ["k1"]
    _, todo_again = merge_storage_objects(ledger2, changed)
    assert todo_again.count() == 0


def test_etag_gate_over_mutated_crawl_round(spark, tmp_path):
    """End-to-end shape: a committed extracted round re-listed after one
    page's content changed — only that object is flagged for re-upsert."""
    from crawler_german_localpoliticans_spark.sources.webcorpus import run_flagship_crawl

    tables, _ = run_flagship_crawl(
        spark, "/root/testdata/sf0.001", work_dir=str(tmp_path / "crawl"), max_depth=1
    )
    listed = tables.extracted.select(
        F.lit("crawl-bucket").alias("bucket"),
        F.col("custom_id").alias("object_key"),
        F.md5(F.col("text")).alias("etag"),
        F.length("text").cast("long").alias("size_bytes"),
    )
    ledger, _ = merge_storage_objects(None, listed)
    victim = listed.orderBy("object_key").limit(1).collect()[0]["object_key"]
    mutated = listed.withColumn(
        "etag",
        F.when(F.col("object_key") == victim, F.md5(F.concat(F.col("etag"), F.lit("x"))))
        .otherwise(F.col("etag")),
    )
    _, todo = merge_storage_objects(ledger, mutated)
    rows = todo.collect()
    assert [r["object_key"] for r in rows] == [victim]
    assert rows[0]["etag_changed"] and not rows[0]["inserted"]


# ---------------------------------------------------------------------------
# J4: outputs ⟕ request metadata on custom_id
# ---------------------------------------------------------------------------


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_metadata_join_ttl_latest_wins_and_never_drops(spark):
    as_of = _ts("2025-06-08 00:00:00")
    outputs = spark.createDataFrame(
        [("request_a.html", "out-a"), ("request_b.html", "out-b"), ("request_c.html", "out-c")],
        "custom_id string, result string",
    )
    requests = spark.createDataFrame(
        [
            # two stores for a: the later one wins (Redis SET overwrite)
            ("request_a.html", _ts("2025-06-01 00:00:00"), "muc-old"),
            ("request_a.html", _ts("2025-06-05 00:00:00"), "muc-new"),
            # b stored 8 days before as_of: expired at the 7-day TTL
            ("request_b.html", _ts("2025-05-31 00:00:00"), "muc-b"),
            # no row at all for c
        ],
        "custom_id string, stored_at timestamp, municipality string",
    )
    out = join_outputs_with_request_metadata(outputs, requests, as_of=as_of)
    got = {r["custom_id"]: r["municipality"] for r in out.collect()}
    # all three outputs survive; only a has (the latest) metadata
    assert got == {"request_a.html": "muc-new", "request_b.html": None, "request_c.html": None}


def test_metadata_join_boundary_expires_exactly_at_ttl(spark):
    """Redis SETEX expiry-at-boundary: a key stored EXACTLY ttl seconds before
    as_of is already gone (strict stored_at > as_of - ttl), while one stored a
    second later still joins."""
    as_of = _ts("2025-06-08 00:00:00")
    outputs = spark.createDataFrame([("request_x",), ("request_y",)], "custom_id string")
    requests = spark.createDataFrame(
        [
            # exactly 7 days old at as_of: expired
            ("request_x", _ts("2025-06-01 00:00:00"), "m"),
            # one second inside the TTL: live
            ("request_y", _ts("2025-06-01 00:00:01"), "m2"),
        ],
        "custom_id string, stored_at timestamp, municipality string",
    )
    out = join_outputs_with_request_metadata(outputs, requests, as_of=as_of)
    got = {r["custom_id"]: r["municipality"] for r in out.collect()}
    assert got == {"request_x": None, "request_y": "m2"}
