"""Custom stateful streaming operator: gap-based sessionization.

The batch twin is ``functions.asof.sessionize`` (lag + cumulative sum);
streams cannot use windows over unbounded history, so the session cursor
(start, last event ts, count, seq) lives in the state store, keyed by user —
``applyInPandasWithState``, the same pattern as the streaming dedup.

A session CLOSES when an event arrives more than ``gap`` after the previous
one; the closed session is emitted and the cursor restarts. State per key is
one tiny record; the store shards by key like a shuffle — no driver state.
Production would add an event-time timeout + watermark so idle users' last
sessions eventually flush and state is evicted; this sandbox feeds files in
event-time order (like the dedup stream) and keeps NoTimeout, so the final
still-open session per user intentionally stays in state (tested against
the batch sessionizer minus each user's last session).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_seq long, n_events long, "
    "session_start timestamp, session_end timestamp"
)
# timestamps carried as int64 ns (wall-clock NTZ values; TZ pinned by caller)
STATE_SCHEMA = "start_ns long, last_ns long, n_events long, session_seq long"


def _session_fn(gap_seconds: int):
    gap_ns = int(gap_seconds) * 1_000_000_000

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            # the cursor of the currently-OPEN session (seq matches the batch
            # sessionizer's 1-based numbering)
            start_ns, last_ns, n_events, seq = state.get
        else:
            start_ns = last_ns = None
            n_events, seq = 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        ts = rows["ts"].sort_values().astype("int64").to_numpy()
        closed: list[tuple] = []
        for t in ts:
            if last_ns is None:
                seq, start_ns, n_events = 1, int(t), 0
            elif t - last_ns > gap_ns:
                closed.append((user_id, seq, n_events, start_ns, last_ns))
                seq, start_ns, n_events = seq + 1, int(t), 0
            last_ns = int(t)
            n_events += 1
        state.update((int(start_ns), int(last_ns), int(n_events), int(seq)))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "session_seq", "n_events", "start_ns", "end_ns"],
            )
            yield pd.DataFrame(
                {
                    "user_id": out["user_id"].astype("int64"),
                    "session_seq": out["session_seq"].astype("int64"),
                    "n_events": out["n_events"].astype("int64"),
                    "session_start": pd.to_datetime(out["start_ns"]),
                    "session_end": pd.to_datetime(out["end_ns"]),
                }
            )

    return fn


def streaming_sessionize(
    spark: SparkSession,
    input_path: str,
    schema,
    gap_seconds: int = 1800,
    query_name: str = "session_stream",
    max_files: int = 1,
) -> StreamingQuery:
    """Stream (user_id, ts) events from a directory; emit each CLOSED
    session exactly once, sessions spanning micro-batches included."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_path)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
