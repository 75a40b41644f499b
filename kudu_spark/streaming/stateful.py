"""Custom stateful streaming operators (applyInPandasWithState).

Spark's built-in windowed/session aggregations cover most streaming
state; this module is the escape hatch the prompt-tier (b) operators
use when semantics need explicit state transitions: per-key state
lives in the state store (checkpointed, restart-safe), each
micro-batch's rows arrive as Arrow-backed pandas frames, and the
operator decides what to emit and when.

Scale notes: state is partitioned by the grouping key across
executors (one shuffle per batch on the key, same as any streaming
agg); per-key state here is O(1) floats — millions of keys fit
comfortably in the state store. Output is append-per-batch in update
semantics; route it through streaming.write_stream to land in an
engine table keyed by the group key for a durable running aggregate.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, sum_value double, "
    "n_sessions bigint, last_ts timestamp"
)
STATE_SCHEMA = "n bigint, s double, sess bigint, last_us bigint"


def running_user_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user running stats + session counting with custom state:
    event count, value sum, number of sessions (a new session starts
    when the gap to the previous event exceeds ``gap_minutes``), and
    the latest event time. Emits the updated row for every user seen
    in the micro-batch. Session counting across batches is the part
    ``session_window`` cannot express incrementally without
    re-aggregating — the state carries the previous batch's last
    event time forward."""
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        n, s, sess, last_us = (
            state.get if state.exists else (0, 0.0, 0, None)
        )
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        for ts, val in zip(rows[ts_col], rows[value_col]):
            ts_us = int(ts.value // 1000)  # pandas ns -> us
            if last_us is None or ts_us - last_us > gap_us:
                sess += 1
            last_us = ts_us
            n += 1
            s += float(val) if val == val else 0.0  # NaN-safe
        state.update((n, s, sess, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "n_sessions": [sess],
                "last_ts": [pd.Timestamp(last_us * 1000)],
            }
        )

    return (
        events.groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_OUTPUT_SCHEMA = "user_id bigint, level int, reached_ts timestamp"
FUNNEL_STATE_SCHEMA = "level int, reached_us bigint"


def streaming_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("signup", "view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Incremental strict-order funnel: the streaming twin of
    operators/events.py window_funnel. Per-user state carries
    (deepest level reached, its timestamp) across micro-batches; each
    batch's events are walked in ts order and the user's updated
    (level, reached_ts) is emitted whenever it changes — a funnel
    dashboard aggregates `level` downstream.

    Cross-batch semantics: state makes an advance durable, so a click
    in batch 9 completes a signup->view from batch 1 without any
    re-aggregation. Like every funnel-over-stream, an event arriving
    AFTER a later-step event was already processed (out of order
    ACROSS batches) cannot rewind history — within a batch, the sort
    handles reordering; across batches, bound disorder with a
    watermark upstream. Same state-store scale shape as
    running_user_stats: O(1) ints per user."""
    import pandas as pd

    step_of = {s: i for i, s in enumerate(steps)}

    def update(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        level, reached_us = state.get if state.exists else (0, None)
        before = level
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows[rows[ts_col].notna()].sort_values(ts_col)
        for ts, et in zip(rows[ts_col], rows[type_col]):
            if level >= len(steps):
                break
            if step_of.get(et) != level:
                continue
            ts_us = int(ts.value // 1000)
            if level == 0 or ts_us > reached_us:
                level += 1
                reached_us = ts_us
        if level != before or not state.exists:
            # write state only when it changed (or to materialize the
            # group's first state) — a user spamming non-advancing
            # events costs no state-store write per batch
            state.update((level, reached_us))
        if level != before:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "level": [level],
                    "reached_ts": [pd.Timestamp(reached_us * 1000)],
                }
            )

    return (
        events.where(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
