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


HH_OUTPUT_SCHEMA = "container string, token string, min_count long, max_count long"
HH_STATE_SCHEMA = "tokens array<string>, counts array<long>, decrements long"


def _mg_update_factory(k: int):
    def update(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        if state.exists:
            toks, counts, dec = state.get
            summary = dict(zip(list(toks), list(counts)))
            dec = int(dec)
        else:
            summary, dec = {}, 0
        for pdf in pdfs:
            for tok in pdf["token"]:
                if tok in summary:
                    summary[tok] += 1
                elif len(summary) < k:
                    summary[tok] = 1
                else:
                    # Misra-Gries decrement step: all k counters down one,
                    # evict zeros — one "charge" shared by k+1 tokens
                    dec += 1
                    summary = {t: c - 1 for t, c in summary.items() if c > 1}
        toks = sorted(summary)
        state.update((toks, [summary[t] for t in toks], dec))
        yield pd.DataFrame(
            {
                "container": [key[0]] * len(toks),
                "token": toks,
                "min_count": [summary[t] for t in toks],
                "max_count": [summary[t] + dec for t in toks],
            }
        )

    return update


def track_heavy_hitters(stream: DataFrame, k: int = 8) -> DataFrame:
    """Streaming heavy hitters per container — Misra-Gries space-saving via
    ``applyInPandasWithState``: at most ``k`` counters per key regardless of
    stream length or vocabulary (the property that makes streaming top-k
    possible at all; an exact count would hold the whole vocabulary in
    state). Emits per token a [min_count, max_count] bracket — the MG
    guarantee: true_count ∈ [min_count, max_count], and every token with
    true frequency > N/(k+1) is present in the summary. Input: one
    ``token`` row per token with its ``container`` key (explode upstream,
    e.g. from log messages)."""
    return stream.groupBy("container").applyInPandasWithState(
        _mg_update_factory(k),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
