"""Streaming URL-seen dedup (streaming/dedup.py) — the Structured-Streaming
form of the reference's Redis SADD check-and-add (src/main.rs:30-45)."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from crawler_german_localpoliticans_spark.streaming.dedup import (
    run_discovery_dedup_stream,
)


def _write(path, rows):
    pq.write_table(
        pa.table(
            {
                "canonical_url": [r[0] for r in rows],
                "discovered_at": [datetime.datetime(2025, 6, 1, 12, 0, r[1]) for r in rows],
                "depth": [r[2] for r in rows],
            }
        ),
        path,
    )


def test_streaming_dedup_emits_once_and_state_survives_restart(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    # wave 1: three urls, one duplicated within the wave
    _write(
        str(in_dir / "w1.parquet"),
        [
            ("https://a.de/1", 0, 1),
            ("https://a.de/2", 1, 1),
            ("https://a.de/1", 2, 2),  # same-wave duplicate
        ],
    )
    q = run_discovery_dedup_stream(spark, str(in_dir), ckpt, out_dir)
    q.awaitTermination(120)
    out1 = spark.read.parquet(out_dir).collect()
    assert sorted(r["canonical_url"] for r in out1) == ["https://a.de/1", "https://a.de/2"]

    # wave 2 after a RESTART: a re-discovered url must not re-emit (the
    # seen-state lives in the checkpoint, like the reference's Redis set),
    # a genuinely new url must
    _write(
        str(in_dir / "w2.parquet"),
        [
            ("https://a.de/1", 3, 3),  # already seen in wave 1
            ("https://a.de/3", 4, 2),  # new
        ],
    )
    q2 = run_discovery_dedup_stream(spark, str(in_dir), ckpt, out_dir)
    q2.awaitTermination(120)
    out2 = spark.read.parquet(out_dir).collect()
    urls = sorted(r["canonical_url"] for r in out2)
    assert urls == ["https://a.de/1", "https://a.de/2", "https://a.de/3"]
    # and the survivor for a re-discovered key is the ORIGINAL discovery
    first = {r["canonical_url"]: r["depth"] for r in out2}
    assert first["https://a.de/1"] in (1, 2)  # wave-1 row, never the depth-3 re-discovery


def test_bounded_mode_uses_watermark_eviction_operator(spark, tmp_path):
    """bounded_by_watermark=True must plan dropDuplicatesWithinWatermark
    (state ages out past the horizon); exact mode must NOT attach a
    watermark (it would not evict dropDuplicates state and would
    misdocument it as bounded)."""
    in_dir = tmp_path / "in2"
    in_dir.mkdir()
    _write(str(in_dir / "w.parquet"), [("https://a.de/1", 0, 1), ("https://a.de/1", 1, 1)])
    ckpt = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "out2")
    q = run_discovery_dedup_stream(
        spark, str(in_dir), ckpt, out_dir, bounded_by_watermark=True
    )
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir).collect()
    assert [r["canonical_url"] for r in out] == ["https://a.de/1"]

    from crawler_german_localpoliticans_spark.streaming.dedup import (
        deduped_discovery_stream,
    )

    batch = spark.createDataFrame(
        [("u", __import__("datetime").datetime(2025, 1, 1))],
        "canonical_url string, discovered_at timestamp",
    )
    exact_plan = deduped_discovery_stream(batch)._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" not in exact_plan
