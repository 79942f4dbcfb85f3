"""Streaming MinHash-LSH near-dup candidates (streaming/neardup.py):
stream==batch bucket parity, star connectivity, and state survival across
restart."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from crawler_german_localpoliticans_spark.streaming.neardup import (
    run_neardup_stream,
)


def _write(path, rows):
    pq.write_table(
        pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}),
        path,
    )


BOILER = (
    "der gemeinderat tagt am montag im rathaus der stadt und beschliesst "
    "die neue satzung fuer das kommende haushaltsjahr der verwaltung"
)
OTHER = (
    "voellig anderes thema ohne jede textliche uberschneidung mit dem "
    "ersten dokument hier geht es um spark adaptive query execution"
)


def test_streaming_candidates_match_batch_buckets_and_survive_restart(spark, tmp_path):
    from pyspark.sql import functions as F

    from crawler_german_localpoliticans_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_arrow,
    )

    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    wave1 = [
        (1, BOILER),
        (2, BOILER + " mit kleinen abweichungen am ende"),
        (3, OTHER),
        (4, "gaenzlich eigener text vier der mit nichts kollidieren sollte dabei"),
    ]
    _write(str(in_dir / "w1.parquet"), wave1)
    q = run_neardup_stream(spark, str(in_dir), ckpt, out_dir)
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir).collect()
    stream_pairs = {(min(r["id"], r["first_id"]), max(r["id"], r["first_id"])) for r in got}

    docs = spark.createDataFrame(wave1, "doc_id long, text string")
    sigs = minhash_signatures_arrow(docs.select(F.col("doc_id").alias("id"), "text"), "id", "text")
    batch_pairs = {
        (r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs).collect()
    }
    # every streamed candidate is a real bucket collision
    assert stream_pairs <= batch_pairs
    # every batch-flagged doc appears in the stream output (star form)
    batch_docs = {d for p in batch_pairs for d in p}
    stream_docs = {r["id"] for r in got} | {r["first_id"] for r in got}
    assert batch_docs <= stream_docs
    assert (1, 2) in stream_pairs  # the planted near-dup pair

    # wave 2 AFTER restart: a near-dup of wave 1's doc 1 must pair with the
    # checkpointed bucket representative, not start fresh
    _write(
        str(in_dir / "w2.parquet"),
        [(9, BOILER), (10, "wieder ein voellig unabhaengiger neuer text zehn")],
    )
    q2 = run_neardup_stream(spark, str(in_dir), ckpt, out_dir)
    q2.awaitTermination(180)
    got2 = spark.read.parquet(out_dir).collect()
    pairs2 = {(min(r["id"], r["first_id"]), max(r["id"], r["first_id"])) for r in got2}
    assert (1, 9) in pairs2
    assert not any(10 in p for p in pairs2)
