"""Custom stateful streaming operator: per-host pacing state
(applyInPandasWithState), the streaming-native form of the reference's
per-host last-fetch mutex (src/main.rs:149-161)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from crawler_german_localpoliticans_spark.streaming.pacing import run_paced_stream


def write_requests(path, rows):
    pq.write_table(
        pa.table(
            {
                "host": [r[0] for r in rows],
                "url": [r[1] for r in rows],
                "arrival_ms": [r[2] for r in rows],
            }
        ),
        path,
    )


def test_pacing_enforces_min_gap_and_state_survives_batches(spark, tmp_path):
    req_dir = tmp_path / "req"
    req_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "paced_out")

    rows1 = [("a.de", f"https://a.de/{i}", (i * 700) % 2100) for i in range(12)]
    rows1 += [("b.de", f"https://b.de/{i}", 0) for i in range(4)]
    write_requests(str(req_dir / "p1.parquet"), rows1)

    q = run_paced_stream(spark, str(req_dir), ckpt, delay_ms=2000, output_dir=out_dir)
    q.awaitTermination(120)
    out1 = spark.read.parquet(out_dir).collect()
    assert len(out1) == 16

    by_host = {}
    for r in out1:
        by_host.setdefault(r["host"], []).append(r)
    for host, rs in by_host.items():
        rs.sort(key=lambda r: r["host_slot"])
        for prev, cur in zip(rs, rs[1:]):
            assert cur["scheduled_at_ms"] - prev["scheduled_at_ms"] >= 2000, host
            assert cur["scheduled_at_ms"] >= cur["arrival_ms"]

    # second batch: state must carry over — a.de's next slot continues after
    # the last schedule of batch 1, not at arrival time
    last_a = max(r["scheduled_at_ms"] for r in by_host["a.de"])
    write_requests(str(req_dir / "p2.parquet"), [("a.de", "https://a.de/late", 0)])
    q2 = run_paced_stream(spark, str(req_dir), ckpt, delay_ms=2000, output_dir=out_dir)
    q2.awaitTermination(120)
    out2 = spark.read.parquet(out_dir).collect()
    assert len(out2) == 17  # only the new file was processed, appended
    late = [r for r in out2 if r["url"] == "https://a.de/late"]
    assert len(late) == 1
    assert late[0]["scheduled_at_ms"] >= last_a + 2000
    assert late[0]["host_slot"] == len(by_host["a.de"])
