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
from pyspark.sql import functions as F
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

    Throughput levers, measured at sf0.1 / 100k rows / 4 micro-batches
    (round 7): (1) the sequencing itself is vectorized — see the
    in-kernel comment — which took the warm default-config probe from
    6.4 s to ~5.4 s; (2) the stateful operator inherits
    ``spark.sql.shuffle.partitions`` AT FIRST START (pinned in the
    checkpoint thereafter), and each partition pays a state-store
    commit per micro-batch, so local-scale runs are commit-bound:
    16 partitions ran 4.25 s (23.5k rows/s) vs 5.4 s at the default
    32. Size it to batch volume / desired parallelism, not to the
    batch-query shuffle default; at cluster scale the same conf scales
    the state stores out instead. (3) the state-store PROVIDER
    (round 10): bench.py now records the sequencer under BOTH
    providers each round. Across two measured windows the ordering
    flipped — probe window: RocksDB 6.12 s vs HDFS-backed 6.43 s at 32
    partitions; committed bench record: RocksDB ahead in both configs
    (20.3k vs 15.5k rows/s at 32, 21.4k vs 19.3k at 16) — i.e. the
    difference sits inside host noise at this state size (~15k user
    keys fits trivially in heap, so the provider swap moves only the
    commit path). The DOCUMENTED DEFAULT (VERDICT r10 item 6) is
    RocksDB + 16 state partitions — the best measured configuration
    (r10 bench: 20.8k rows/s vs 15.7k at the heap-backed/32 default),
    applied by the sequencer job builders via
    session.recommended_streaming_state and restored after each job;
    bench.py keeps measuring BOTH providers at both partition counts
    each round for continuity. RocksDB's real point is scale headroom
    anyway — disk-backed state + changelog (delta-only) commits keep
    per-executor state far past heap — and it costs nothing measurable
    here even where that headroom isn't needed.
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

        # Arrow delivers one key's micro-batch as SEVERAL chunks in
        # shuffle order; sorting each independently breaks (ts,
        # event_id) order whenever a key spans chunks (default
        # maxRecordsPerBatch 10k) — concatenate FIRST, sort once.
        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            state.update((max_seq, last_ts_us, last_eid))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        # Vectorized sequencing (VERDICT r06 item 4 — batch the state
        # I/O): after the sort the batch ascends in (ts, event_id), so
        # a row can only be late relative to the CARRY-IN watermark,
        # never an in-batch predecessor (any non-late row becomes the
        # watermark and every later row is ≥ it by the sort) — the
        # per-row loop collapses to two numpy comparisons.
        import numpy as np

        n = len(pdf)
        ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()  # ns → µs
        eid = pdf["event_id"].to_numpy()
        # <= on the id: an event EQUAL to the watermark (ts AND id) is a
        # redelivered duplicate of the key's most recent event — with a
        # strict < it would silently reprocess (fresh seq, late=False),
        # the one at-least-once shape the flag existed to expose
        # (review find, round 9)
        lates = (ts_us < last_ts_us) | ((ts_us == last_ts_us) & (eid <= last_eid))
        seqs = np.arange(max_seq + 1, max_seq + n + 1)
        max_seq += n
        if not lates[-1]:  # sorted ⇒ last row is non-late iff any is
            last_ts_us, last_eid = int(ts_us[-1]), int(eid[-1])
        state.update((max_seq, last_ts_us, last_eid))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": eid,
                "ts": pdf["ts"].to_numpy(),
                "seq": seqs,
                "late": lates,
            }
        )

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


def make_causal_processor():
    """Build the TWS CausalProcessor class (defined inside a function so
    cloudpickle serializes it by value — workers need no PYTHONPATH —
    and so tests can instantiate it against a fake handle without the
    protobuf wire protocol: the class itself only needs pyspark)."""
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
            import numpy as np

            # concat-then-sort, exactly like causal_sequence_stream: a
            # key spanning several Arrow chunks arrives in shuffle
            # order, and the sorted-batch vectorization below is only
            # valid over the WHOLE micro-batch (per-chunk sorting would
            # mis-flag chunk-2 rows older than chunk-1's max as late —
            # code-review find, round 7)
            chunks = [c for c in rows if len(c)]
            if chunks:
                pdf = pd.concat(chunks, ignore_index=True).sort_values(
                    ["ts", "event_id"], kind="mergesort"
                )
                # sorted batch ⇒ late only vs the carry-in watermark
                n = len(pdf)
                ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
                eid = pdf["event_id"].to_numpy()
                # <= on the id: equal-to-watermark = redelivered
                # duplicate, flag it (see the applyInPandasWithState twin)
                lates = (ts_us < last_ts_us) | (
                    (ts_us == last_ts_us) & (eid <= last_eid)
                )
                seqs = np.arange(max_seq + 1, max_seq + n + 1)
                max_seq += n
                if not lates[-1]:
                    last_ts_us, last_eid = int(ts_us[-1]), int(eid[-1])
                self._state.update((max_seq, last_ts_us, last_eid))
                yield pd.DataFrame(
                    {
                        "user_id": user_id,
                        "event_id": eid,
                        "ts": pdf["ts"].to_numpy(),
                        "seq": seqs,
                        "late": lates,
                    }
                )
            else:
                self._state.update((max_seq, last_ts_us, last_eid))

        def close(self) -> None:
            pass

    return CausalProcessor


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
    API runs anywhere. The processor logic itself is unit-tested
    against a fake state handle (tests/test_streaming.py), so the
    absence of protobuf in this container gates only the wire protocol,
    not the semantics.
    """
    CausalProcessor = make_causal_processor()
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=CausalProcessor(),
        outputStructType=CAUSAL_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


# ---------------------------------------------------------------------------
# Streaming causal pattern matching (MATCH_RECOGNIZE-lite, unbounded form
# of operators/windows.py::q_event_pattern).
# ---------------------------------------------------------------------------

PATTERN_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_matches", T.LongType()),
        T.StructField("n_late", T.LongType()),
    ]
)

PATTERN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("open", T.LongType()),  # 1 = s-prefix open (only c/v since)
        T.StructField("n_events", T.LongType()),
        T.StructField("n_matches", T.LongType()),
        T.StructField("n_late", T.LongType()),
        T.StructField("last_ts_micros", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)

_PATTERN_SYMS = {"signup": "s", "click": "c", "view": "v", "purchase": "p"}


def pattern_match_stream(events: DataFrame) -> DataFrame:
    """Count occurrences of the causal pattern signup → (click|view)* →
    purchase per user over an UNBOUNDED stream, with O(1) state per key.

    The batch form (q_event_pattern) collects each user's full symbol
    sequence and runs a regex; that is exact but its state is the
    user's history. The streaming form runs the pattern's DFA instead:
    state is (open-prefix flag, counters, last-processed position) —
    CONSTANT per key — and transitions consume events in causal order.
    For this regex family (leftmost, non-overlapping) the DFA count is
    identical to the regex count, which the stream==batch test asserts
    on a time-ordered replay.

    Causal contract for disorder (same stance as the sequencer: never
    silently wrong): an event arriving BEHIND the key's last processed
    (ts, event_id) cannot be retro-matched by a constant-state DFA, so
    it is counted in ``n_late`` and excluded from matching — the
    consumer sees exactly how many events fell outside the causal
    order instead of a silently drifting match count. Emits one
    cumulative row per (key, micro-batch); the latest row (max
    n_events) is the current view.
    """

    def match_group(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            open_, n_events, n_matches, n_late, last_ts_us, last_eid = state.get
        else:
            open_, n_events, n_matches, n_late, last_ts_us, last_eid = (
                0, 0, 0, 0, -(2**62), -1,
            )
        # concat-then-sort: chunk-local sorting breaks cross-chunk
        # (ts, event_id) order for keys spanning Arrow chunks
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            ts_us = pdf["ts"].astype("int64") // 1000
            for t, eid, et in zip(
                ts_us.tolist(), pdf["event_id"].tolist(), pdf["event_type"].tolist()
            ):
                n_events += 1
                if (t, eid) <= (last_ts_us, last_eid):
                    # behind OR EQUAL: an equal (ts, id) is a redelivered
                    # duplicate of the latest event — reprocessing it would
                    # re-open/advance the DFA and manufacture extra matches
                    # with n_late still 0 (review find, round 9)
                    n_late += 1
                    continue
                last_ts_us, last_eid = t, eid
                sym = _PATTERN_SYMS.get(et, "e")
                if sym == "s":
                    open_ = 1
                elif sym == "p":
                    n_matches += open_
                    open_ = 0
                elif sym not in ("c", "v"):
                    open_ = 0
        state.update((open_, n_events, n_matches, n_late, last_ts_us, last_eid))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n_events],
                "n_matches": [n_matches],
                "n_late": [n_late],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        match_group,
        outputStructType=PATTERN_OUTPUT_SCHEMA,
        stateStructType=PATTERN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CHAIN_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("root_id", T.LongType()),
        T.StructField("depth", T.LongType()),
    ]
)

CHAIN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_micros", T.LongType()),
        T.StructField("cur_root", T.LongType()),
        T.StructField("cur_depth", T.LongType()),
    ]
)


def chain_assign_stream(events: DataFrame, gap_us: int) -> DataFrame:
    """Unbounded form of q_causal_chains: label each event with its
    happened-before chain root and depth, carrying (last_ts, root,
    depth) per user across micro-batches in keyed state.

    The batch recursive CTE walks precomputed next pointers; the
    stream cannot know the next event yet, so the walk inverts into
    the reference's own consume-loop shape — each arriving event
    either extends the open chain (gap ≤ bound) or roots a new one.
    On a causally ordered replay the two formulations agree exactly
    (asserted in tests/test_streaming.py); an out-of-order arrival
    joins the open chain (its gap to the furthest-seen event decides,
    and is necessarily ≤ 0 ≤ gap_us), a deterministic policy rather
    than a silent reorder, matching the sequencer's late-flag
    philosophy. The high-water mark is MONOTONE — a late arrival never
    drags it backwards, so subsequent on-time events still measure
    their gap against the furthest-seen timestamp, same as
    causal_sequence_stream (ADVICE r05). State is O(keys); one shuffle
    per micro-batch on user_id.
    """

    def assign_group(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts_us, cur_root, cur_depth = state.get
        else:
            last_ts_us, cur_root, cur_depth = None, -1, -1

        # Arrow delivers one key's micro-batch as SEVERAL chunks in
        # shuffle order — sorting each chunk independently breaks the
        # (ts, event_id) order whenever a key spans chunks (default
        # maxRecordsPerBatch 10k), so concatenate FIRST, sort once.
        # Per-key micro-batch rows fit one task by the same argument
        # the grouped-map packing kernel relies on.
        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            state.update(
                (last_ts_us if last_ts_us is not None else -(2**62), cur_root, cur_depth)
            )
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
        roots, depths = [], []
        for t, eid in zip(ts_us.tolist(), pdf["event_id"].tolist()):
            if last_ts_us is None or t - last_ts_us > gap_us:
                cur_root, cur_depth = eid, 0
            else:
                cur_depth += 1
            # keep the per-key high-water mark monotone: a late
            # (out-of-order) arrival must not rebase the gap reference
            # for events after it (ADVICE r05)
            if last_ts_us is None or t > last_ts_us:
                last_ts_us = t
            roots.append(cur_root)
            depths.append(cur_depth)
        state.update((last_ts_us if last_ts_us is not None else -(2**62), cur_root, cur_depth))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": pdf["event_id"].to_numpy(),
                "root_id": roots,
                "depth": depths,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        assign_group,
        outputStructType=CHAIN_OUTPUT_SCHEMA,
        stateStructType=CHAIN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEPS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("dep_id", T.LongType()),
        T.StructField("causal_layer", T.LongType()),
        T.StructField("late", T.BooleanType()),
    ]
)

# Per-PAIR state: the online layering needs, for each of the pair's two
# members, the layer of their last event (per-key edge) and the layer +
# id of their latest click (cross-key edge source), plus the pair's
# (us, event_id) high-water mark for late detection. -1 = not seen.
DEPS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_layer_even", T.LongType()),
        T.StructField("last_layer_odd", T.LongType()),
        T.StructField("click_layer_even", T.LongType()),
        T.StructField("click_eid_even", T.LongType()),
        T.StructField("click_layer_odd", T.LongType()),
        T.StructField("click_eid_odd", T.LongType()),
        T.StructField("hwm_us", T.LongType()),
        T.StructField("hwm_eid", T.LongType()),
    ]
)


def causal_deps_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of q_causal_deps (operators/recursion.py): assign
    cross-key causal layers ONLINE, one pair-keyed stateful pass.

    Because every dependency edge stays inside a (u, u^1) pair, the
    stream partitions by pair and each group's state is O(1): when the
    replay delivers events in happened-before order (time-ordered
    slices — stage_events_time_ordered), processing rows in (ts,
    event_id) order makes L(e) = 1 + max(incoming layers) EXACTLY the
    longest-path layer the batch relaxation converges to, so the twin
    is bit-equal to the batch query (pinned in tests/test_streaming.py).
    A row behind the pair's high-water mark cannot be layered online
    (its successors are already out); it is flagged late with layer -1
    and leaves state untouched, mirroring causal_sequence_stream's
    at-least-once redelivery contract.

    Kernel choice — MEASURED, round 14 (VERDICT r13 item 3 asked for
    the sequencer-style vectorization; it loses here): a numpy
    relaxation kernel (per-parity prefix scans iterated to the
    in-batch cross-edge fixpoint, bit-equal to this loop) was built
    and A/B'd. Interleaved sf0.1 probes under the recommended config:
    loop best 7.11 s (14.1k rows/s) vs vectorized best 7.60 s — and a
    kernel-only microbench is one-sided at EVERY group size (n=33:
    1.43 vs 1.98 ms/call; n=1k: 2.6 vs 4.8 ms; n=10k: 15 vs 297 ms,
    quadratic: relaxation rounds grow with in-batch cross-hop depth,
    which for a dense pair grows with batch size). The sequencer's
    recurrence vectorized because it is a pure per-key prefix scan;
    this one carries data-dependent CROSS-parity coupling inside the
    batch (a click's layer feeds later partner purchases in the same
    batch), so the one-pass loop (~0.7 M rows/s, <1% of probe wall —
    state-store commits dominate) is the right kernel. A max-plus
    4-state parallel scan was costed (~1.1e8 element-ops at 100k rows
    via doubling) and also loses. Sequential loop kept, decision
    recorded here and in BASELINE.md round-14 notes.
    """

    def deps_group(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (lle, llo, cle, cee, clo, ceo, hwm_us, hwm_eid) = state.get
        else:
            lle = llo = cle = cee = clo = ceo = -1
            hwm_us, hwm_eid = -(2**62), -1
        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            state.update((lle, llo, cle, cee, clo, ceo, hwm_us, hwm_eid))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
        last = {0: lle, 1: llo}
        click_layer = {0: cle, 1: clo}
        click_eid = {0: cee, 1: ceo}
        deps, layers, lates = [], [], []
        for us, eid, user, etype in zip(
            ts_us.tolist(),
            pdf["event_id"].tolist(),
            pdf["user_id"].tolist(),
            pdf["event_type"].tolist(),
        ):
            if (us, eid) <= (hwm_us, hwm_eid):
                deps.append(None)
                layers.append(-1)
                lates.append(True)
                continue
            p = int(user) % 2
            layer = last[p] + 1  # -1 sentinel → 0 for a first event
            dep = None
            if etype == "purchase" and click_eid[1 - p] >= 0:
                dep = click_eid[1 - p]
                layer = max(layer, click_layer[1 - p] + 1)
            if etype == "click":
                click_layer[p], click_eid[p] = layer, eid
            last[p] = layer
            hwm_us, hwm_eid = us, eid
            deps.append(dep)
            layers.append(layer)
            lates.append(False)
        state.update(
            (
                last[0],
                last[1],
                click_layer[0],
                click_eid[0],
                click_layer[1],
                click_eid[1],
                hwm_us,
                hwm_eid,
            )
        )
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": pdf["user_id"].to_numpy(),
                "event_type": pdf["event_type"].to_numpy(),
                "dep_id": pd.array(deps, dtype="Int64"),
                "causal_layer": layers,
                "late": lates,
            }
        )

    return (
        # sign-safe floor pairing — must match causal_dep_layers
        # (operators/recursion.py) bit for bit; see the comment there
        events.withColumn("pair", F.expr("(user_id - pmod(user_id, 2)) div 2"))
        .groupBy("pair")
        .applyInPandasWithState(
            deps_group,
            outputStructType=DEPS_OUTPUT_SCHEMA,
            stateStructType=DEPS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
