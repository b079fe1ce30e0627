"""Streaming causal sequencer — the reference's core concept as a
stateful Structured Streaming operator.

Batch form (oracle-checked): q_causal_seq in batch_views.py — a plain
window function. This module is the unbounded form: per-key monotone
sequence numbers that survive across micro-batches via keyed state
(``applyInPandasWithState``), i.e. the reference's causal merge +
per-key view, on Spark's state-store machinery.

Semantics:
- events of one user are numbered 1..n in (ts, event_id) order;
- state carries (max_seq, last_ts, last_event_id) per key;
- within a micro-batch, rows are sorted by (ts, event_id) — the
  deterministic order consistent with happened-before;
- an event older than the last sequenced one (late, out of causal
  order across batches) is flagged `late=true` and still sequenced —
  downstream can drop or compensate; the reference's contract is that
  per-key order is never violated *silently*.

Scale: state is O(keys); each micro-batch shuffles once on user_id.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CAUSAL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("late", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("max_seq", T.LongType()),
        T.StructField("last_ts_micros", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)


def causal_sequence_stream(events: DataFrame) -> DataFrame:
    """Attach per-key causal sequence numbers to an unbounded stream.

    ``events`` must be a streaming DataFrame with (event_id, ts,
    user_id) columns (e.g. streaming.jobs.events_stream).

    The state callback is a nested closure on purpose: cloudpickle
    serializes it by value, so Python workers need no access to this
    package on their PYTHONPATH.
    """

    def sequence_group(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            max_seq, last_ts_us, last_eid = state.get
        else:
            max_seq, last_ts_us, last_eid = 0, -(2**62), -1

        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
            seqs, lates = [], []
            for t, eid in zip(ts_us.tolist(), pdf["event_id"].tolist()):
                max_seq += 1
                late = (t, eid) < (last_ts_us, last_eid)
                if not late:
                    last_ts_us, last_eid = t, eid
                seqs.append(max_seq)
                lates.append(late)
            out.append(
                pd.DataFrame(
                    {
                        "user_id": user_id,
                        "event_id": pdf["event_id"].to_numpy(),
                        "ts": pdf["ts"].to_numpy(),
                        "seq": seqs,
                        "late": lates,
                    }
                )
            )
        state.update((max_seq, last_ts_us, last_eid))
        yield from out

    return events.groupBy("user_id").applyInPandasWithState(
        sequence_group,
        outputStructType=CAUSAL_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """transformWithState's Python state protocol speaks protobuf to the
    JVM state server; without the `protobuf` package the driver worker
    crashes at pre-init (verified in this container). Gate, don't fail.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def causal_sequence_stream_tws(events: DataFrame) -> DataFrame:
    """Same sequencer on Spark 4's transformWithState API.

    transformWithState is the successor to applyInPandasWithState:
    typed state variables (ValueState/ListState/MapState), timers, TTL,
    and state-schema evolution. Identical semantics to
    ``causal_sequence_stream``; kept alongside it because TWS requires
    (a) the RocksDB state-store provider — set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``ROCKSDB_PROVIDER`` before starting the query — and (b) the
    `protobuf` package (check ``tws_available()``), while the classic
    API runs anywhere.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class CausalProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("causal_seq", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):  # noqa: ANN001
            (user_id,) = key
            if self._state.exists():
                max_seq, last_ts_us, last_eid = self._state.get()
            else:
                max_seq, last_ts_us, last_eid = 0, -(2**62), -1
            out = []
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
                ts_us = pdf["ts"].astype("int64") // 1000
                seqs, lates = [], []
                for t, eid in zip(ts_us.tolist(), pdf["event_id"].tolist()):
                    max_seq += 1
                    late = (t, eid) < (last_ts_us, last_eid)
                    if not late:
                        last_ts_us, last_eid = t, eid
                    seqs.append(max_seq)
                    lates.append(late)
                out.append(
                    pd.DataFrame(
                        {
                            "user_id": user_id,
                            "event_id": pdf["event_id"].to_numpy(),
                            "ts": pdf["ts"].to_numpy(),
                            "seq": seqs,
                            "late": lates,
                        }
                    )
                )
            self._state.update((max_seq, last_ts_us, last_eid))
            yield from out

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=CausalProcessor(),
        outputStructType=CAUSAL_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
