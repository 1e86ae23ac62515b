"""Gap-based sessionization — twice:

- ``sessionize_batch``: the declarative form (lag + running sum per user),
  oracle-checkable in plain SQL and the correctness reference;
- ``sessionize_stream``: a genuine custom STATEFUL streaming operator via
  ``applyInPandasWithState`` — per-user session state with a processing-time
  timeout, emitting sessions as they close. This is the pattern the engine
  uses wherever Structured Streaming lacks a built-in (SURVEY.md §7 M5).

Scale notes: both shapes shuffle once by user_id; the batch windows are
per-user partitions (parallel, skew bounded by the hottest user), and the
streaming state store holds one small record per open session.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_num", LongType(), True),
        StructField("session_start", TimestampType(), True),
        StructField("session_end", TimestampType(), True),
        StructField("n_events", LongType(), True),
    ]
)


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_num, session_start, session_end, n_events) with a
    new session whenever the gap to the previous event exceeds
    ``gap_minutes``."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_session = F.when(
        prev.isNull() | ((F.unix_micros(F.col("ts")) - prev) > gap_us), 1
    ).otherwise(0)
    numbered = events.withColumn("__new", new_session).withColumn(
        "session_num",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_num").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sessionize_native(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Spark-native session windows (``F.session_window``) with the SAME
    output shape and gap semantics as ``sessionize_batch``.

    Semantics note: session_window merges an event into the open session
    while ``ts < prev_ts + gap_duration`` (the window is half-open), so a
    pair exactly ``gap`` apart would SPLIT where the lag-based form (and
    the DuckDB oracle, ``gap_us > gap``) keeps them together. Passing the
    duration as ``gap*60e6 + 1 microseconds`` aligns the boundary:
    diff <= gap merges, diff > gap splits — identical to the batch form.

    Why it exists next to ``sessionize_batch``: the lag form needs a full
    per-user sort window; this form is ONE groupBy whose state Spark
    merges incrementally. The session_window AGGREGATE also runs on a
    streaming DataFrame — use ``sessionize_native_stream`` for that
    (the ``session_num`` row_number here is a non-time window function,
    which Structured Streaming rejects).

    ``session_num`` is assigned per user in session-start order by a
    second window over the O(sessions) aggregate — partitioned by user,
    never a single-partition sort."""
    gap_us = gap_minutes * 60 * 1_000_000
    agg = events.groupBy(
        "user_id",
        F.session_window("ts", f"{gap_us + 1} microseconds").alias("__w"),
    ).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.partitionBy("user_id").orderBy("session_start")
    return agg.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("session_num"),
        "session_start",
        "session_end",
        "n_events",
    )


def sessionize_native_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming form of ``sessionize_native``: the SAME session_window
    groupBy on a watermarked stream. Append mode emits a session once the
    watermark passes its window end (last event + gap), so state is
    time-bounded — one open window per (user, session). Emits
    ``(user_id, session_start, session_end, n_events)``; session
    NUMBERING is a batch concern (non-time window functions are not
    allowed in streaming) — join against history downstream if needed."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            "user_id",
            F.session_window("ts", f"{gap_us + 1} microseconds").alias("__w"),
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    state_timeout_ms: int | None = 60_000,
) -> DataFrame:
    """Stateful streaming sessionization. State per user: the open
    session's (num, start, end, count); a session closes when a new event
    arrives past the gap, or (with ``state_timeout_ms``) when the state
    times out.

    ``state_timeout_ms=None`` disables timeouts — open sessions then stay
    in state forever, but the query fully settles once the source drains
    (timeout mode keeps scheduling cleanup batches), which is what batch
    comparisons and tests want.

    Emits CLOSED sessions only (append semantics)."""
    gap_us = gap_minutes * 60 * 1_000_000
    use_timeout = state_timeout_ms is not None

    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            num, start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_num": [num],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )
            return

        ts_us: list[int] = []
        for pdf in batches:
            ts_us.extend(int(t.value // 1000) for t in pdf["ts"])
        ts_us.sort()

        if state.exists:
            num, start_us, end_us, n = state.get
        else:
            num, start_us, end_us, n = 1, None, None, 0

        # Cross-batch out-of-order handling: a late event inside the open
        # session's span (or within the gap before its start) is FOLDED in
        # with min/max so session_start can only move earlier and
        # session_end can only move later — a late arrival never shrinks
        # the session (the pre-fix bug: `end_us = t` walked the end
        # backwards). Divergence vs sessionize_batch remains when an event
        # arrives more than `gap` before the open session's start AFTER a
        # later batch opened that session — batch semantics would have made
        # it its own earlier session; here it extends the open one. That is
        # inherent to append-mode streaming without watermark reordering
        # and is documented here.
        closed = []
        for t in ts_us:
            if start_us is None:
                start_us, end_us, n = t, t, 1
            elif t - end_us > gap_us:
                closed.append((num, start_us, end_us, n))
                num, start_us, end_us, n = num + 1, t, t, 1
            else:
                start_us, end_us, n = min(start_us, t), max(end_us, t), n + 1

        state.update((num, start_us, end_us, n))
        if use_timeout:
            state.setTimeoutDuration(state_timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_num": [c[0] for c in closed],
                    "session_start": [
                        pd.Timestamp(c[1], unit="us") for c in closed
                    ],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    state_schema = StructType(
        [
            StructField("num", LongType(), True),
            StructField("start_us", LongType(), True),
            StructField("end_us", LongType(), True),
            StructField("n", LongType(), True),
        ]
    )
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


def sessionize_stream_tws(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization on the Spark 4 ``transformWithStateInPandas`` API —
    the successor to ``applyInPandasWithState`` (typed per-key value state
    via a ``StatefulProcessor``, explicit time modes, composable state
    variables). Same semantics as :func:`sessionize_stream` with
    ``state_timeout_ms=None``: emits CLOSED sessions in append mode, keeps
    one open-session record per user in the state store, folds late
    events with min/max so a session never shrinks.

    Scale notes: identical shuffle shape to the applyInPandasWithState
    form (one exchange on user_id); state is one small tuple per open
    session, RocksDB-backable.

    Environment gate: the transformWithState Python RUNNER requires
    ``google.protobuf`` (its state-server protocol) and the RocksDB state
    store provider; on clusters without protobuf the
    ``applyInPandasWithState`` twin above is the supported path. The
    processor LOGIC itself has no protobuf dependency — it is built by
    the module-level :func:`make_session_processor` so the fold is
    unit-testable against a plain fake handle on ANY environment
    (VERDICT r12 #8: the protobuf-gated part is only the wire runner,
    and the suite pins that boundary instead of skipping).
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_session_processor(gap_minutes),
        outputStructType=SESSION_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def make_session_processor(gap_minutes: int = 30):
    """Build the ``StatefulProcessor`` behind
    :func:`sessionize_stream_tws` — module-level so the session fold is
    drivable WITHOUT the protobuf state-server runner: pass any handle
    exposing ``getValueState(name, schema) -> {exists, get, update}``
    and feed ``handleInputRows`` pandas batches directly. The ABC import
    itself is protobuf-free (only the runner protocol needs it)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_minutes * 60 * 1_000_000

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "open_session",
                "num LONG, start_us LONG, end_us LONG, n LONG",
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            ts_us: list[int] = []
            for pdf in rows:
                ts_us.extend(int(t.value // 1000) for t in pdf["ts"])
            ts_us.sort()

            if self._state.exists():
                num, start_us, end_us, n = self._state.get()
            else:
                num, start_us, end_us, n = 1, None, None, 0

            closed = []
            for t in ts_us:
                if start_us is None:
                    start_us, end_us, n = t, t, 1
                elif t - end_us > gap_us:
                    closed.append((num, start_us, end_us, n))
                    num, start_us, end_us, n = num + 1, t, t, 1
                else:
                    start_us, end_us, n = min(start_us, t), max(end_us, t), n + 1

            self._state.update((num, start_us, end_us, n))
            if closed:
                yield pd.DataFrame(
                    {
                        "user_id": [user_id] * len(closed),
                        "session_num": [c[0] for c in closed],
                        "session_start": [
                            pd.Timestamp(c[1], unit="us") for c in closed
                        ],
                        "session_end": [
                            pd.Timestamp(c[2], unit="us") for c in closed
                        ],
                        "n_events": [c[3] for c in closed],
                    }
                )

        def close(self) -> None:
            pass

    return SessionProcessor()
