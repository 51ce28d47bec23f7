"""Stream-stream joins and custom stateful sessionization.

The reference is batch-only (SURVEY.md §2.6); these are the streaming
analogs of the batch range/as-of joins (queries/asof_q.py) and the
batch sessionizer (operators/sessionize.py), built on the two Spark
primitives made for them:

- ``stream_stream_interval_join``: watermarked stream-stream join with
  an event-time interval constraint. Spark buffers each side's rows in
  join state only until the watermark plus the interval bound passes,
  so state stays bounded on infinite streams — the requirement that
  makes a naive unbounded stream join impossible at 100 TB/day. Inner
  and left-outer (unmatched rows emitted once their watermark closes).
- ``stateful_sessionizer``: per-key gap sessionization via
  ``applyInPandasWithState`` with an EVENT-TIME TIMEOUT: a key's open
  session is carried across micro-batches and emitted exactly once,
  as a CLOSED session, when the watermark passes its gap deadline.
  This is the custom-stateful-operator path for session payloads
  ``session_window`` aggregation can't express (first/last event
  payloads, per-session ordered reductions).

Scale notes: both operators shuffle on the join/group key per
micro-batch — the same partitioning a batch join would use — and keep
O(open sessions + in-flight interval) state per key, bounded by the
watermark. No driver-side state, no unbounded buffers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    ts_left: str,
    ts_right: str,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join right-side rows to left-side rows of the same key where
    ``ts_left`` falls within ``[ts_right - lookback, ts_right]``.

    Both sides MUST carry a watermark for Spark to admit the join on
    streams and to expire buffered rows; the interval condition is the
    time-bound that makes join state finite. ``how='leftOuter'`` emits
    unmatched left rows (with nulls) once their watermark closes —
    note that with ``availableNow`` file tests, a final
    watermark-advancing batch is needed before unmatched rows appear.
    """
    lw = left.withWatermark(ts_left, watermark)
    rw = right.withWatermark(ts_right, watermark)
    cond = F.expr(
        f"{key_left} = {key_right} AND "
        f"{ts_left} BETWEEN {ts_right} - INTERVAL {lookback} AND {ts_right}"
    )
    return lw.join(rw, cond, how)


_SESS_STATE = "start_us long, end_us long, n bigint, total double"
_SESS_OUT = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)


def stateful_sessionizer(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessions emitted exactly once, when they CLOSE.

    Semantics (identical to the batch ``sessionize`` operator): events
    of one key whose successive gaps are <= ``gap_minutes`` form one
    session. Sessions that close *within* a micro-batch (a later event
    in the same batch opened a new one) are emitted immediately; the
    trailing open session is parked in state with an event-time timeout
    at ``session_end + gap``, and is emitted by the first micro-batch
    whose watermark passes that deadline (``state.hasTimedOut``).

    Output mode must be 'append' — every emitted row is final.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def _emit(key, sessions):
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": [key for _ in sessions],
                "session_start": [
                    pd.Timestamp(s[0], unit="us") for s in sessions
                ],
                "session_end": [pd.Timestamp(s[1], unit="us") for s in sessions],
                "n_events": [s[2] for s in sessions],
                "sum_value": [round(s[3], 4) for s in sessions],
            }
        )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            # Watermark passed the open session's gap deadline: close it.
            start_us, end_us, n, total = state.get
            state.remove()
            yield _emit(key[0], [(start_us, end_us, n, total)])
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        # Arrow hands timestamps as datetime64; normalize to int64 µs.
        ts = pd.to_datetime(batch[ts_col])
        scale = 1000 if ts.dtype == "datetime64[ns]" else 1
        batch = batch.assign(_us=ts.astype("int64") // scale).sort_values("_us")
        # Standard late-data policy: rows older than the watermark are
        # dropped (their session may already have been emitted).
        wm_ms = state.getCurrentWatermarkMs()
        batch = batch[batch["_us"] // 1000 >= wm_ms]

        open_sess = list(state.get) if state.exists else None
        closed = []
        for us, val in zip(batch["_us"], batch[value_col].fillna(0.0)):
            us = int(us)
            if open_sess is None:
                open_sess = [us, us, 0, 0.0]
            elif us - open_sess[1] > gap_us:
                closed.append(tuple(open_sess))
                open_sess = [us, us, 0, 0.0]
            open_sess[1] = us
            open_sess[2] += 1
            open_sess[3] += float(val)

        if open_sess is None:  # every row was late — nothing to do
            return
        deadline_ms = open_sess[1] // 1000 + gap_minutes * 60 * 1000
        if deadline_ms <= wm_ms:
            # The watermark already passed the gap deadline (file/batch
            # ordering can deliver a key's data after unrelated streams
            # advanced event time): the session is final NOW.
            closed.append(tuple(open_sess))
            if state.exists:
                state.remove()
        else:
            state.update(tuple(open_sess))
            # Deadline in event time; fires once the watermark passes it.
            state.setTimeoutTimestamp(deadline_ms)
        if closed:
            yield _emit(key[0], closed)

    # EventTimeTimeout requires a watermark on the input stream.
    return df.withWatermark(ts_col, watermark).groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=_SESS_OUT,
        stateStructType=_SESS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_static_enrich(
    stream: DataFrame,
    static: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Enrich a stream against a STATIC dimension (the canonical
    lookup-join: events x customer/part attributes).

    Stream-static joins need no watermark and hold no join state — each
    micro-batch joins against the static relation as a plain batch join,
    so the broadcast hint makes every micro-batch a map-side hash join
    (no per-batch shuffle of the stream). The static side is re-read
    per batch, picking up file-level changes; for large dims drop the
    broadcast and let AQE pick the strategy.
    """
    return stream.join(F.broadcast(static), on, how)
