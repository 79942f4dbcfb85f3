"""Streaming content near-dup — MinHash-LSH candidates over a document
stream.

The batch engine finds near-dup pairs with a banded signature equi-join
(operators/dedup.py). When documents arrive as a STREAM (a live crawl
feeding a corpus), the same band buckets become Spark-managed state: each
(band, band_hash) bucket remembers the FIRST document that claimed it, and
every later document landing in the bucket emits a candidate row against
that representative — the arrival-order analog of the batch bucket join,
with the same connectivity property as the capped batch form (every
near-dup doc is linked to its bucket representative; pair-level recall
within a bucket is intentionally star-shaped, which is what downstream
clustering needs).

Plan shape: signatures are the same shuffle-free Arrow kernel as batch
(stateless map), banding is a Column explode, and the only stateful op is
one applyInPandasWithState grouped by (band, bh) — state is a single long
per bucket, hash-partitioned by bucket key, no cross-executor
coordination. Candidates repeat across bands by design (a doc colliding
with its representative in k bands emits k rows); sinks dedupe with a
batch `distinct` per micro-batch or downstream.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import LSH_BANDS, LSH_ROWS, banded_signatures, minhash_signatures_arrow

CANDIDATE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("first_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
    ]
)
_STATE_SCHEMA = T.StructType([T.StructField("first_id", T.LongType())])


def _bucket_group(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """One (band, bh) bucket: remember the first doc id ever seen; every
    other doc emits (id, first_id, band). Within a micro-batch the winner
    is the MINIMUM id (deterministic — file-source batches carry no
    arrival order); across micro-batches the stored state wins, exactly
    like the URL-seen stream's first-discovery rule."""
    first_id = state.get[0] if state.exists else None
    band = int(key[0])
    # Materialize ALL Arrow chunks before choosing the representative: a
    # bucket larger than arrow.maxRecordsPerBatch arrives as several
    # chunks in nondeterministic order, and a per-chunk minimum would make
    # the stored representative depend on chunk arrival (run-to-run and
    # retry nondeterminism). The buffer is bounded by the bucket size —
    # the same bound the batch cap accepts for its oversized-bucket
    # window (review find, round 4).
    ids = sorted({int(i) for pdf in batches for i in pdf["id"]})
    if ids:
        if first_id is None:
            first_id = ids[0]
        out_ids = [i for i in ids if i != first_id]
        if out_ids:
            yield pd.DataFrame({"id": out_ids, "first_id": first_id, "band": band})
    state.update((first_id,))


def streaming_lsh_candidates(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    k: int = 3,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """Streaming (id, first_id, band) candidate rows. Subset/connectivity
    contract vs batch (pinned by tests/test_streaming_neardup.py): every
    emitted (id, first_id) shares an LSH bucket (so it appears in the
    batch lsh_candidate_pairs set over the same documents), and every
    document the batch join flags appears in the streaming output —
    as `id` or as some row's `first_id`."""
    sigs = minhash_signatures_arrow(
        docs.select(docs[id_col].alias("id"), docs[text_col].alias("text")),
        "id",
        "text",
        num_perm,
        k,
    )
    banded = banded_signatures(sigs, bands, rows)
    return banded.groupBy("band", "bh").applyInPandasWithState(
        _bucket_group,
        outputStructType=CANDIDATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_neardup_stream(
    spark,
    docs_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    query_name: str = "neardup",
):
    """availableNow file stream of (doc_id, text) parquet -> candidate rows
    in a parquet sink. Restart with the same checkpoint resumes the bucket
    state: a doc near-duplicating a PREVIOUS wave's doc still pairs with
    that wave's representative."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    cands = streaming_lsh_candidates(stream, "doc_id", "text")
    return (
        cands.writeStream.outputMode("append")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", output_dir)
        .start()
    )
