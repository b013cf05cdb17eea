"""Streaming CEP: online complex-event pattern detection (§2.8 T8').

The batch twin (functions/analytics.py events_pattern_cep) compiles
the pattern click(>view)*>purchase to a regex over completed session
strings; ONLINE the same pattern runs as a per-key automaton in keyed
state — the Structured Streaming shape of Flink's CEP library
(Pattern.begin("click").followedBy(view*).next("purchase")), which is
the reference framework's native pattern-matching surface.

Automaton semantics match the batch regex's FIRST leftmost match per
session exactly:

- events partition by user and advance in (t_us, event_id) order;
- a >30-minute gap starts a new session (session_seq increments, the
  automaton and the matched-flag reset) — same gaps-and-islands
  boundary as the batch sessionizer;
- 'click' arms the automaton (re-arming on a later click is exactly
  regex leftmost-first semantics: the interior admits only views, so
  the first match's click is the last click before the purchase with
  only views between);
- 'view' extends an armed run; any other type disarms;
- 'purchase' on an armed run emits (user_id, session_seq, n_views,
  start_us, end_us) ONCE per session (the batch twin's
  regexp_extract reports one first match per session row).

State per user is O(1): (session_seq, last_ts, armed start, view
count, matched flag) — no event buffering, which is why the pattern
class (no overlapping partial runs needed under leftmost-first)
compiles to constant state. ProcessingTimeTimeout evicts idle users.

Ordering contract: rows must reach the operator in event-time order
per key (the test feeds time-ordered batches; production puts a
watermark-sorted stage upstream, the same discipline Flink CEP's
event-time mode enforces with its ordering buffer).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

CEP_GAP_US = 30 * 60 * 1_000_000  # session gap, matches batch twin

_CEP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_views", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
    ]
)
_CEP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_seq", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("armed_start_us", T.LongType()),  # -1 = disarmed
        T.StructField("n_views", T.LongType()),
        T.StructField("matched", T.LongType()),  # 0/1: session already reported
    ]
)


def pattern_matches_per_user(events: DataFrame, timeout_ms: int = 3_600_000) -> DataFrame:
    """events(user_id, event_id, event_type, t_us) stream → one row per
    first click(>view)*>purchase match per session."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seq, last_us, armed, views, matched = (
            state.get if state.exists else (0, None, -1, 0, 0)
        )
        out: list[tuple] = []
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["t_us", "event_id"])
        for t_us, etype in zip(rows["t_us"], rows["event_type"]):
            t_us = int(t_us)
            if last_us is None or t_us - last_us > CEP_GAP_US:
                seq += 1  # session boundary: reset automaton + flag
                armed, views, matched = -1, 0, 0
            last_us = t_us
            if etype == "click":
                armed, views = t_us, 0
            elif etype == "view":
                if armed >= 0:
                    views += 1
            elif etype == "purchase":
                if armed >= 0 and not matched:
                    out.append((key[0], seq, views, armed, t_us))
                    matched = 1
                armed, views = -1, 0
            else:
                armed, views = -1, 0
        state.update((seq, last_us, armed, views, matched))
        state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "session_seq", "n_views", "start_us", "end_us"]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_CEP_OUT_SCHEMA,
        stateStructType=_CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---- streaming EWMA twin (batch oracle twin: events_ewma_smoothing) -------

_EWMA_TAPS = 16  # mirrors functions/analytics.events_ewma_smoothing

_EWMA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("t_us", T.LongType()),
        T.StructField("v_cents", T.LongType()),
        T.StructField("ewma_units", T.LongType()),
    ]
)
_EWMA_STATE_SCHEMA = T.StructType(
    [T.StructField("hist", T.ArrayType(T.LongType()))]
)


def ewma_per_user(events: DataFrame, timeout_ms: int = 3_600_000) -> DataFrame:
    """Online twin of the batch 16-tap dyadic EWMA: per-key state is
    the last 15 cent values (O(1), no event buffering beyond the tap
    window); each arriving event emits its smoothed value in the same
    integer units as the batch query, so the two are row-for-row
    equal on an in-order stream — the batch window pass IS the oracle
    for the streaming operator (the T7 batch-twin discipline applied
    to keyed state)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (hist,) = state.get if state.exists else ([],)
        hist = list(hist)
        rows = pd.concat(list(pdfs)).sort_values(["t_us", "event_id"])
        out = []
        for eid, t_us, vc in zip(rows["event_id"], rows["t_us"], rows["v_cents"]):
            hist.append(int(vc))
            hist = hist[-_EWMA_TAPS:]
            ewma = sum(
                v * (1 << (_EWMA_TAPS - 1 - k))
                for k, v in enumerate(reversed(hist))
            )
            out.append((int(eid), key[0], int(t_us), int(vc), ewma))
        state.update((hist,))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            out, columns=["event_id", "user_id", "t_us", "v_cents", "ewma_units"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_EWMA_OUT_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
