"""Custom stateful streaming operator: per-key session tracking via
``applyInPandasWithState`` — the Spark equivalent of "an operator the engine
doesn't ship" (SURVEY.md §2.9: the reference has no stateful operators at
all; this is the extension pattern for building one).

``track_session_counts`` maintains, per (container, session) key, a running
row count and last-seen event time across micro-batches. State lives in the
state store (checkpointed, recoverable); the callback sees Arrow-batched
pandas frames, never per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "container string, session string, total_rows long, last_ts timestamp"
STATE_SCHEMA = "total_rows long, last_ts timestamp"


def _update(key, pdfs: Iterator, state: GroupState) -> Iterator:
    import pandas as pd

    total, last_ts = state.get if state.exists else (0, None)
    for pdf in pdfs:
        total += len(pdf)
        batch_max = pdf["timestamp"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((total, last_ts))
    yield pd.DataFrame(
        {"container": [key[0]], "session": [key[1]], "total_rows": [total], "last_ts": [last_ts]}
    )


def track_session_counts(stream: DataFrame) -> DataFrame:
    """Running per-(container, session) totals, updated each micro-batch."""
    return stream.groupBy("container", "session").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
