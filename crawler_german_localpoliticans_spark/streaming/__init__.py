"""Streaming surface — intentionally thin.

The reference has no streaming operators (SURVEY.md §2.8): its "streams" are
poll loops over Redis/S3 (src/main.rs:620-622, crawler_ingest.py:523-552),
and the idiomatic Spark rebuild is iterative batch jobs per crawl round
(plans/crawl.py) — each round an atomic snapshot, resume via the checkpoint
log. That design *is* the incremental-processing story.

What this package provides is the one genuinely streaming-shaped piece: a
Structured Streaming ingest of newly committed `fetched` round directories
(the S10 incremental-scan equivalent — replaces the reference's paginated
S3 relisting + ETag gate with file-source tracking), for operators who want
a live metrics feed instead of per-round polling.
"""

from .ingest import stream_fetched_counts  # noqa: F401
