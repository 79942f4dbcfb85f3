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


class _FakeState:
    """Duck-typed GroupState: _make_bucket_group touches only .exists,
    .get[0] and .update(tuple)."""

    def __init__(self, first_id=None):
        self._v = first_id

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return (self._v,)

    def update(self, t):
        self._v = t[0]


def _drive(fn, ids_chunks, first_id=None):
    import pandas as pd

    state = _FakeState(first_id)
    out = list(
        fn((7, 123), (pd.DataFrame({"id": c}) for c in ids_chunks), state)
    )
    rows = [
        (int(i), int(f))
        for pdf in out
        for i, f in zip(pdf["id"], pdf["first_id"])
    ]
    return rows, state._v


def test_bucket_group_cap_boundary_unit():
    """Pure-python drive of the bucket handler (no Spark): exactly-at-cap
    stays EXACT (no overflow, one row per member, min-id representative),
    one-over-cap engages the counter, the stored state always wins, and
    the stored representative is chunk-order-independent."""
    from crawler_german_localpoliticans_spark.streaming.neardup import (
        _make_bucket_group,
    )

    class Acc:
        def __init__(self):
            self.value = 0

        def add(self, n):
            self.value += n

    # exactly cap distinct ids (cap counts non-representative members in
    # steady state; the representative itself is excluded from the set)
    acc = Acc()
    fn = _make_bucket_group(4, acc)
    rows, stored = _drive(fn, [[5, 3, 9], [8, 11]])  # first batch: 5 ids, cap 4
    assert stored == 3  # true min, despite arriving mid-chunk
    assert acc.value == 1  # the 5th distinct id overflowed
    assert {i for i, _ in rows} == {5, 9, 8, 11}
    # connectivity: union of pairs links every id to the stored min
    parent = {i: i for i in [3, 5, 8, 9, 11]}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for a, b in rows:
        parent[find(a)] = find(b)
    assert len({find(i) for i in parent}) == 1

    # at-cap: no overflow, exact star
    acc2 = Acc()
    fn2 = _make_bucket_group(4, acc2)
    rows2, stored2 = _drive(fn2, [[5, 3], [9, 8, 3]])  # 4 distinct
    assert stored2 == 3 and acc2.value == 0
    assert sorted(rows2) == [(5, 3), (8, 3), (9, 3)]

    # steady state: stored wins even over a smaller later id; duplicates
    # within the batch emit once below the cap
    acc3 = Acc()
    fn3 = _make_bucket_group(4, acc3)
    rows3, stored3 = _drive(fn3, [[1, 6, 6], [2]], first_id=5)
    assert stored3 == 5 and acc3.value == 0
    assert sorted(rows3) == [(1, 5), (2, 5), (6, 5)]

    # chunk-order independence of the STORED representative (first batch)
    for chunks in ([[9, 7], [2, 8]], [[2, 8], [9, 7]], [[8, 2, 9, 7]]):
        _, s = _drive(_make_bucket_group(2, Acc()), chunks)
        assert s == 2


def test_streaming_bucket_cap_bounds_skewed_bucket(spark, tmp_path):
    """10^4 copies of one boilerplate text in a SINGLE micro-batch — the
    degenerate-bucket regime the batch LSH_MAX_BUCKET cap exists for. With
    the cap well below the bucket size the stream must still (a) emit a
    connecting row for EVERY member (one connected component through the
    running-min chain), (b) store the true minimum id as the bucket
    representative for later waves, and (c) report the overflow loudly via
    the accumulator."""
    from crawler_german_localpoliticans_spark.streaming.neardup import (
        run_neardup_stream,
    )

    n = 10_000
    cap = 500  # far below the bucket size so the overflow path carries most rows
    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    # ids deliberately NOT in sorted file order: the representative must be
    # the global min (7), not the first-row id
    ids = [(i * 7919 + 7) % (20 * n) for i in range(n)]
    assert len(set(ids)) == n
    _write(str(in_dir / "w1.parquet"), [(i, BOILER) for i in ids])

    acc = spark.sparkContext.accumulator(0)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
    try:
        q = run_neardup_stream(
            spark,
            str(in_dir),
            str(tmp_path / "ckpt"),
            str(tmp_path / "out"),
            max_bucket_size=cap,
            overflow_acc=acc,
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    got = spark.read.parquet(str(tmp_path / "out")).collect()
    # (a) every doc appears, and the candidate graph is ONE component
    seen_docs = {r["id"] for r in got} | {r["first_id"] for r in got}
    assert seen_docs == set(ids)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in got:
        ra, rb = find(r["id"]), find(r["first_id"])
        if ra != rb:
            parent[ra] = rb
    assert len({find(i) for i in ids}) == 1
    # (c) the cap actually engaged and was counted
    assert acc.value > 0

    # (b) a later wave pairs against the stored representative = the true min
    _write(str(in_dir / "w2.parquet"), [(10 ** 9, BOILER)])
    acc2 = spark.sparkContext.accumulator(0)
    q2 = run_neardup_stream(
        spark,
        str(in_dir),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        max_bucket_size=cap,
        overflow_acc=acc2,
    )
    q2.awaitTermination(300)
    got2 = spark.read.parquet(str(tmp_path / "out")).collect()
    w2 = [r for r in got2 if r["id"] == 10 ** 9]
    assert w2 and all(r["first_id"] == min(ids) for r in w2)
    assert acc2.value == 0  # a 1-doc wave is far below the cap
