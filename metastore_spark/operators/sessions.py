"""Sessionization: gap-based session assignment, batch and streaming.

Batch: the classic window trick — a session boundary is any event
whose gap from the previous event (per user) exceeds the threshold;
session ids are the running sum of boundary flags. Two window passes
over one shuffle on user_id.

Streaming: the same semantics as a custom stateful operator via
``applyInPandasWithState`` — per-user state carries (last_ts,
session counter); timed-out state flushes finished sessions. This is
the operator shape Spark itself lacks a built-in for (session_window
exists for aggregation, but not for custom per-session logic like
emitting per-session feature rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: int = 30 * 60 * 10**9,
) -> DataFrame:
    """Assign session ids: (user, session_seq starting at 1).

    ``ts_col`` must be a NUMERIC epoch column; ``gap`` is in the same
    unit (callers on the canonical NTZ events table project
    ``ts_us("ts")`` first and pass a microsecond gap). The default
    matches the nanosecond unit-test fixtures.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_flag = F.when(
        F.col(ts_col) - F.lag(ts_col, 1).over(w) > gap, 1
    ).otherwise(0)
    return df.withColumn("_new_session", gap_flag).withColumn(
        "session_seq",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        + 1,
    ).drop("_new_session")


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: int = 30 * 60 * 10**9,
) -> DataFrame:
    """Per-session rollup: bounds, size, value sum."""
    s = sessionize(df, user_col, ts_col, gap)
    return s.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


SESSION_STATE_SCHEMA = (
    "last_ts bigint, seq int, start bigint, n bigint, val double"
)
SESSION_OUT_SCHEMA = (
    "user_id bigint, session_seq int, session_start bigint, "
    "session_end bigint, n_events bigint, session_value double"
)


def sessionize_stream(
    stream: DataFrame,
    gap: int = 30 * 60 * 10**9,
    timeout_ms: int | None = 30 * 60 * 1000,
):
    """Custom stateful streaming sessionization via
    applyInPandasWithState (per-user state: last_ts + session seq).

    Emits one row per FINISHED session — closed by a gap, or flushed
    by processing-time timeout (``timeout_ms``; beware that an
    availableNow drain's final cleanup trigger waits for pending
    timeouts, so short timeouts suit tests and long ones production).
    ``timeout_ms=None`` disables timeouts: only gap-closed sessions
    emit and open tails stay in state. The batch ``session_stats`` is
    the semantics oracle (tests/test_sessions.py).

    Ordering: rows are sorted per micro-batch, and a row older than
    the state's ``last_ts`` (cross-batch disorder / at-least-once
    replay) folds into the CURRENT session without moving ``last_ts``
    backward — deterministic and bounded, though a straggler that
    batch semantics would place in an earlier (already-emitted,
    append-mode-immutable) session stays in the current one. Sources
    that feed batches in event-time order (time-partitioned files —
    the layout write_events_by_day produces) match batch exactly;
    tests/test_streaming.py pins both behaviors.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        rows = pd.concat(list(pdfs)).sort_values("ts")
        if state.hasTimedOut:
            if state.exists:
                last_ts, seq, start, n, val = state.get
                state.remove()
                yield pd.DataFrame(
                    [
                        {
                            "user_id": user_id,
                            "session_seq": seq,
                            "session_start": start,
                            "session_end": last_ts,
                            "n_events": n,
                            "session_value": val,
                        }
                    ]
                )
            return

        if state.exists:
            last_ts, seq, start, n, val = state.get
        else:
            last_ts, seq, start, n, val = None, 0, None, 0, 0.0

        out = []
        for _, r in rows.iterrows():
            ts, v = int(r["ts"]), float(r["value"])
            if last_ts is None:
                seq, start, n, val = seq + 1, ts, 1, v
                last_ts = ts
            elif ts < last_ts:
                # Cross-batch disorder: within one micro-batch rows are
                # sorted above, but a LATER batch can still deliver an
                # earlier timestamp (multi-file sources, at-least-once
                # replay). Fold the late row into the CURRENT session —
                # last_ts must never move backward, or the next on-time
                # row would measure its gap against the straggler and
                # silently merge sessions the batch oracle splits.
                n, val = n + 1, val + v
                if start is not None and ts < start:
                    start = ts
            elif ts - last_ts > gap:
                out.append(
                    {
                        "user_id": user_id,
                        "session_seq": seq,
                        "session_start": start,
                        "session_end": last_ts,
                        "n_events": n,
                        "session_value": val,
                    }
                )
                seq, start, n, val = seq + 1, ts, 1, v
                last_ts = ts
            else:
                n, val = n + 1, val + v
                last_ts = ts
        state.update((last_ts, seq, start, n, val))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out:
            import pandas as pd

            yield pd.DataFrame(out)

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
