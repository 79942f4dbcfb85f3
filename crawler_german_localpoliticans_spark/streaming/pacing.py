"""Per-host pacing as a custom stateful streaming operator.

The reference serializes fetches per host through an in-memory last-fetch
mutex (src/main.rs:149-161 `apply_crawl_delay`). In a live streaming
deployment that state is exactly what `applyInPandasWithState` models: one
state cell per host holding the next free fetch slot, updated as URL
requests stream in. Each URL is assigned a `scheduled_at_ms` that is at
least `delay_ms` after the previous assignment for the same host —
regardless of micro-batch boundaries (state persists across batches via the
streaming checkpoint).

The batch engine does NOT use this (waves schedule politeness as window
arithmetic, plans/politeness.py); this is the streaming-native expression of
the same semantics for operators running a continuous frontier feed.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

PACED_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("arrival_ms", T.LongType()),
        T.StructField("scheduled_at_ms", T.LongType()),
        T.StructField("host_slot", T.LongType()),
    ]
)

STATE_SCHEMA = "next_free_ms LONG, slots LONG"


def _pace_group(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState, delay_ms: int
) -> Iterator[pd.DataFrame]:
    host = key[0]
    if state.exists:
        next_free_ms, slots = state.get
    else:
        next_free_ms, slots = 0, 0
    out = []
    for pdf in batches:
        pdf = pdf.sort_values(["arrival_ms", "url"], kind="mergesort")
        sched, slot_col = [], []
        for arrival in pdf["arrival_ms"]:
            at = max(int(arrival), next_free_ms)
            sched.append(at)
            slot_col.append(slots)
            next_free_ms = at + delay_ms
            slots += 1
        pdf = pdf.assign(scheduled_at_ms=sched, host_slot=slot_col)
        out.append(pdf[["host", "url", "arrival_ms", "scheduled_at_ms", "host_slot"]])
    state.update((next_free_ms, slots))
    yield from out


def paced_requests(requests: DataFrame, delay_ms: int = 2000) -> DataFrame:
    """Streaming DataFrame of (host, url, arrival_ms) -> paced schedule.
    State: one (next_free_ms, slots) cell per host."""

    def fn(key, pdf_iter, state):
        return _pace_group(key, pdf_iter, state, delay_ms)

    return (
        requests.groupBy("host")
        .applyInPandasWithState(
            fn,
            outputStructType=PACED_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_paced_stream(
    spark,
    requests_dir: str,
    checkpoint_dir: str,
    delay_ms: int = 2000,
    query_name: str = "paced",
    output_dir: str | None = None,
):
    """availableNow file stream of request parquet -> paced schedule.

    With `output_dir` the sink is parquet (checkpoint-recoverable: a later
    run with the same checkpoint resumes the per-host state and processes
    only new files); without it, a memory sink for one-shot inspection.
    Returns the started query.
    """
    req_schema = T.StructType(
        [
            T.StructField("host", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("arrival_ms", T.LongType()),
        ]
    )
    stream = spark.readStream.schema(req_schema).parquet(requests_dir)
    paced = paced_requests(stream, delay_ms)
    writer = (
        paced.writeStream.outputMode("append")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if output_dir is not None:
        return writer.format("parquet").option("path", output_dir).start()
    return writer.format("memory").start()
