"""Streaming EMA: the state-carried twin of `events_ema_smoothed`.

The batch query folds each user's full history inside a row (a Catalyst
higher-order aggregate over the sorted sequence). An unbounded stream
cannot hold the whole history in a row, but the EMA recurrence needs only
O(1) state — exactly what `applyInPandasWithState` carries per key: state
= (current ema, events seen). Each micro-batch's rows fold in event-time
order (ts, event_id — the same deterministic order the batch query
sorts on), so a stream replayed in event-time order produces EXACTLY the
batch result per user (pinned by
tests/test_streaming.py::test_stream_ema_matches_batch, the same
equivalence property the motion detector pins).

Scale: one shuffle on user_id (the keyBy); state is two scalars per key —
a million users is megabytes of state store. Emits the running
(user_id, n_events, ema_value) per key per micro-batch in update mode:
downstream either upserts (last write wins — the keyed-upsert sink
pattern) or windows it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EMA_ALPHA = 0.5  # exact in binary: the fold is bit-reproducible

EMA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ema_value", T.DoubleType()),
    ]
)

_EMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ema", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def _fold_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # drain the iterator BEFORE the timeout check, but concat only after:
    # a timed-out invocation passes an EMPTY iterator and pd.concat([])
    # raises, which would crash the query before state.remove() ran
    pdfs = list(pdfs)
    if state.hasTimedOut:  # pragma: no cover - NoTimeout default
        state.remove()
        return
    batch = (
        pd.concat(pdfs, ignore_index=True)
        if pdfs
        else pd.DataFrame(columns=["user_id", "event_id", "ts", "value"])
    )
    # event-time order within the micro-batch: same (ts, event_id) key the
    # batch query's array_sort uses, so the fold order is identical.
    # notna() drops BOTH SQL NULLs and NaNs — Arrow conversion makes them
    # indistinguishable here, so the batch operator and its oracle exclude
    # both as well ("EMA over finite present values"); the three
    # implementations agree on any input
    batch = batch[batch["value"].notna()]
    batch = batch.sort_values(["ts", "event_id"], kind="stable")
    ema, n = (state.get if state.exists else (None, 0))
    if batch.empty:  # all-NULL micro-batch for this key: state unchanged
        if state.exists:
            yield pd.DataFrame(
                [(int(key[0]), int(n), float(ema))],
                columns=["user_id", "n_events", "ema_value"],
            )
        return
    for v in batch["value"]:
        v = float(v)
        ema = v if ema is None else EMA_ALPHA * v + (1.0 - EMA_ALPHA) * ema
        n = int(n) + 1
    state.update((float(ema), int(n)))
    yield pd.DataFrame(
        [(int(key[0]), int(n), float(ema))],
        columns=["user_id", "n_events", "ema_value"],
    )


def ema_stream(events: DataFrame) -> DataFrame:
    """Running per-user EMA over an unbounded events DataFrame. The caller
    replays/feeds events in event-time order across micro-batches (within
    a batch the fold sorts); out-of-order arrivals across batches need the
    watermarked re-sort upstream or an event-time state key."""
    return events.select("user_id", "event_id", "ts", "value").groupby(
        "user_id"
    ).applyInPandasWithState(
        _fold_group,
        EMA_OUT_SCHEMA,
        _EMA_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
