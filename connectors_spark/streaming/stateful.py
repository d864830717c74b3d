"""Custom stateful streaming operators via applyInPandasWithState.

The reference's streaming unit is the table version (SURVEY §2.9) — it
has no per-key state. This module supplies the Spark-native extension:
arbitrary keyed state over a stream, here gap-based sessionization
(the canonical custom stateful operator):

- state per user: (session_start_us, last_ts_us, n_events),
- an event extends the open session when it arrives within
  `gap_seconds` of the last one, else the open session is EMITTED as a
  completed row and a new session starts,
- state times out `gap_seconds` of event time after the last event
  (watermark-driven), flushing the final open session.

Scale shape: state is partitioned by the grouping key across executors
(RocksDB/HDFS-backed state store in production configs); each
microbatch touches only keys with new events. Arrow batches carry the
per-key rows into pandas — one Python crossing per key group per batch.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StructField, StructType,
                               TimestampType)

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
])


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800,
                      user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Streaming gap sessionization: one completed-session row per
    (user, quiet period > gap). `events` must be a streaming DataFrame
    with an event-time watermark on `ts_col` (the timeout that flushes
    trailing sessions is watermark-driven)."""
    gap_us = gap_seconds * 1_000_000

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                state.remove()
                yield pd.DataFrame({
                    "user_id": [uid],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n]})
            return
        ts = pd.concat([p[ts_col] for p in pdfs]).sort_values()
        us = ts.astype("int64") // 1000   # ns since epoch -> microseconds
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0
        out = {"user_id": [], "session_start": [], "session_end": [],
               "n_events": []}
        for v in us:
            v = int(v)
            if start_us is None:
                start_us, last_us, n = v, v, 1
            elif v - last_us <= gap_us:
                last_us, n = v, n + 1
            else:
                out["user_id"].append(uid)
                out["session_start"].append(pd.Timestamp(start_us, unit="us"))
                out["session_end"].append(pd.Timestamp(last_us, unit="us"))
                out["n_events"].append(n)
                start_us, last_us, n = v, v, 1
        state.update((start_us, last_us, n))
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        if out["user_id"]:
            yield pd.DataFrame(out)

    return (events.groupBy(F.col(user_col).alias("user_id"))
            .applyInPandasWithState(
                fn, SESSION_SCHEMA, _STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))
