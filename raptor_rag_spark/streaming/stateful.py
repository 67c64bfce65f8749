"""Custom stateful streaming operator: cross-micro-batch sessionization
via ``applyInPandasWithState`` (the Structured Streaming analog of the
batch gap-window sessionize in driver_queries).

State per user = (last event-time epoch, current session index, events
in the current session). Each micro-batch's rows for a user are sorted
by (ts, event_id) inside the kernel and threaded through the state, so
a session spanning several micro-batches keeps ONE session_idx — the
thing a per-batch (stateless) window can never do.

Scale shape: state is a handful of longs per active user key, stored in
the state store (RocksDB on a real cluster); the shuffle is the normal
groupBy(user_id) exchange per micro-batch. Late data: callers put a
watermark on ts upstream; the operator itself also supports state TTL
via GroupStateTimeout if sessions must auto-close.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("es", T.LongType()),
        T.StructField("session_idx", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_es", T.LongType()),
        T.StructField("session_idx", T.LongType()),
        T.StructField("n_in_session", T.LongType()),
    ]
)


def _session_fn(gap_sec: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_es, session_idx, n_in_session = state.get
        else:
            last_es, session_idx, n_in_session = None, 0, 0
        out_event, out_es, out_sess = [], [], []
        # applyInPandasWithState delivers a large group's micro-batch as
        # SEVERAL Arrow chunks (~10k rows each) with no cross-chunk order
        # guarantee: concatenate first, sort ONCE per group-batch, so
        # events spanning chunks thread through the state in time order.
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(["es", "event_id"])
            for eid, es in zip(pdf["event_id"], pdf["es"]):
                es = int(es)
                if last_es is not None and es - last_es > gap_sec:
                    session_idx += 1
                    n_in_session = 0
                last_es = es
                n_in_session += 1
                out_event.append(int(eid))
                out_es.append(es)
                out_sess.append(session_idx)
        state.update((last_es, session_idx, n_in_session))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": out_event,
                "es": out_es,
                "session_idx": out_sess,
            }
        )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    event_col: str = "event_id",
) -> DataFrame:
    """events stream -> (user_id, event_id, es, session_idx) with
    session indices stable ACROSS micro-batches. ``events`` must be a
    streaming DataFrame; parity with the batch sessionize window is
    pytest-asserted on chronologically fed batches."""
    from pyspark.sql import functions as F

    src = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(event_col).cast("long").alias("event_id"),
        F.unix_timestamp(F.col(ts_col)).alias("es"),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_sec),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
