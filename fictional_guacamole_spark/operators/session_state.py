"""Sessionization with inactivity timeout on the arbitrary-state API.

The canonical ``transformWithState`` use case (and the second of the
repo's arbitrary-state operators, after :mod:`gap_alarm`): per-user
sessions close EITHER when a later event arrives past the gap (emitted
inline from ``handleInputRows``) OR when event time runs out the clock
with no successor (an event-time TIMER at ``last_ts + gap`` fires at the
watermark and closes the session). The two closure paths produce one
deterministic drained result: every session whose end + gap ≤ the final
watermark is emitted exactly once, which is what lets a gaps-and-islands
SQL oracle judge the stream.

State primitives exercised beyond gap_alarm's ValueState+MapState:

- ``ListState`` accumulates the session's event ids (``appendValue`` per
  event; the judged ``id_sum``/``n_events`` come from draining the list
  at closure — a real consumer keeps per-session items this way for
  post-hoc analysis);
- ``deleteTimer`` cancels the superseded deadline when a session
  extends, so the timer set stays O(1) per key rather than one stale
  timer per event (stale timers would be harmless — the expiry guard
  no-ops them — but cancelling is the production-hygienic form the API
  exists to support).

Reference note: the reference app has no sessionization; this is part of
the engine's general stateful-streaming surface (SURVEY §2.5), included
because inactivity-gap sessions are the textbook shape that the older
applyInPandasWithState API can only approximate with processing-time
timeouts (wall-clock-dependent, unjudgeable) — event-time timers make it
deterministic.

Scale posture: state per key = one small value tuple + the OPEN
session's id list; closed sessions leave state immediately. Keys
hash-partition across the RocksDB store; output volume is bounded by
session count.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from fictional_guacamole_spark.operators import gap_alarm as _ga
from fictional_guacamole_spark.operators.gap_alarm import _ensure_protobuf

_ensure_protobuf()


def _register_by_value() -> None:
    """By-value pickling for THIS module and gap_alarm (whose
    _ensure_protobuf this module references) — see
    gap_alarm._register_by_value for why the driver-side
    transform_with_state_driver_worker needs it."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[_ga.__name__])
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

SESSION_INPUT = ("user_id long, event_id long, server_ts timestamp, "
                 "value_cents long")
SESSION_OUTPUT = ("user_id long, session_start timestamp, "
                  "session_end timestamp, n_events long, "
                  "value_cents long, id_sum long")


class SessionTimeoutProcessor(StatefulProcessor):
    """Close a session after ``gap_s`` of event-time inactivity."""

    def __init__(self, gap_s: int = 1800):
        # state tracks event time in MICROSECONDS (the fixture's real ts
        # granularity — ms truncation would corrupt the judged
        # session_start/end); the engine's timer clock is milliseconds,
        # so deadlines round UP to the next ms (a timer may then fire up
        # to 1 ms "late" in wall terms but never before its microsecond
        # deadline has truly passed — the stale-timer guard and the
        # deleteTimer call both derive the SAME ceil value, so register/
        # delete/guard stay consistent)
        self.gap_us = gap_s * 1_000_000

    def __setstate__(self, state):
        # unpickle-time hook: the protobuf fallback must run in every
        # worker even though by-value pickling skips the module import
        _ensure_protobuf()
        self.__dict__.update(state)

    def _deadline_ms(self, last_us: int) -> int:
        return -(-(last_us + self.gap_us) // 1000)  # ceil division

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        # (start_us, last_us, cents) of the OPEN session
        self.sess = handle.getValueState(
            "sess", "start_us long, last_us long, cents long")
        self.ids = handle.getListState("ids", "event_id long")

    def _close_row(self, key, start_us: int, last_us: int,
                   cents: int) -> dict:
        ids = [r[0] for r in self.ids.get()]
        self.ids.clear()
        return {"user_id": key[0],
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(last_us, unit="us"),
                "n_events": len(ids),
                "value_cents": cents,
                "id_sum": sum(ids)}

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame],
                        timerValues: TimerValues) -> Iterator[pd.DataFrame]:
        batches = list(rows)
        pdf = pd.concat(batches) if len(batches) > 1 else batches[0]
        pdf = pdf.sort_values(["server_ts", "event_id"], kind="mergesort")
        closed: list[dict] = []
        if self.sess.exists():
            start_us, last_us, cents = self.sess.get()
        else:
            start_us = None
        for eid, ts, v in zip(pdf["event_id"], pdf["server_ts"],
                              pdf["value_cents"]):
            ts_us = int(ts.value // 1_000)
            if start_us is None:
                start_us, last_us, cents = ts_us, ts_us, 0
            elif ts_us - last_us > self.gap_us:
                # closed by a successor event: emit inline, cancel the
                # (now superseded) timer, open a fresh session
                closed.append(self._close_row(key, start_us, last_us,
                                              cents))
                self.handle.deleteTimer(self._deadline_ms(last_us))
                start_us, last_us, cents = ts_us, ts_us, 0
            else:
                if ts_us != last_us:
                    self.handle.deleteTimer(self._deadline_ms(last_us))
                last_us = ts_us
            cents += int(v)
            self.ids.appendValue((int(eid),))
        self.sess.update((start_us, last_us, cents))
        self.handle.registerTimer(self._deadline_ms(last_us))
        if closed:
            yield pd.DataFrame(closed)

    def handleInitialState(self, key, initialState: pd.DataFrame,
                           timerValues: TimerValues) -> None:
        """Warm-start surface: seed the open session from a BATCH-computed
        snapshot (one row per key: start_us, last_us, cents, ids) before
        the first input batch. The timer is registered here too, so a key
        with NO streamed successor still closes by the clock — the
        property that makes batch→stream state migration exactly-once
        instead of replay-the-world."""
        row = initialState.iloc[0]
        start_us, last_us, cents = (int(row["start_us"]),
                                    int(row["last_us"]),
                                    int(row["cents"]))
        self.sess.update((start_us, last_us, cents))
        for eid in row["ids"]:
            self.ids.appendValue((int(eid),))
        self.handle.registerTimer(self._deadline_ms(last_us))

    def handleExpiredTimer(self, key, timerValues: TimerValues,
                           expiredTimerInfo: ExpiredTimerInfo
                           ) -> Iterator[pd.DataFrame]:
        if not self.sess.exists():
            return iter(())
        start_us, last_us, cents = self.sess.get()
        # stale-timer guard: only the CURRENT deadline may close
        if self._deadline_ms(last_us) > expiredTimerInfo.getExpiryTimeInMs():
            return iter(())
        row = self._close_row(key, start_us, last_us, cents)
        self.sess.clear()
        return iter([pd.DataFrame([row])])

    def close(self) -> None:
        pass


def apply_session_timeout(frames_df, gap_s: int = 1800,
                          initial_state=None):
    """Wire the processor onto a watermarked SESSION_INPUT stream.
    ``initial_state``: optional batch DataFrame (user_id, start_us,
    last_us, cents, ids array<long>) seeding each key's open session
    via ``handleInitialState`` on the first micro-batch."""
    _ensure_protobuf(required=True)
    _register_by_value()
    return (frames_df.groupBy("user_id")
            .transformWithStateInPandas(
                SessionTimeoutProcessor(gap_s),
                outputStructType=SESSION_OUTPUT,
                outputMode="append",
                timeMode="eventTime",
                initialState=(initial_state.groupBy("user_id")
                              if initial_state is not None else None)))
