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


# ------------------------------------------------------------------------
# transformWithStateInPandas — Spark 4's arbitrary-stateful operator API
# ------------------------------------------------------------------------

TRACKER_OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_cents long, max_cents long, n_types long"
)


def _tracker_class():
    """Factory so the module imports on any PySpark; the Spark-4-only
    symbols load lazily at stream construction."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserSpendTracker(StatefulProcessor):
        """Per-user running spend profile across micro-batches, built on the
        Spark 4 ``transformWithStateInPandas`` API (SPARK-49564 family) —
        the successor to ``applyInPandasWithState`` with COMPOSABLE state
        primitives instead of one opaque tuple:

        - ``ValueState`` holds the (n, total_cents, max_cents) running
          aggregate;
        - ``MapState`` holds per-event-type counts — keyed sub-state the
          old API could only fake by packing arrays into the tuple (the
          Misra-Gries tracker above does exactly that packing).

        Determinism contract: every accumulator is COMMUTATIVE over rows
        (+, max, per-key +), so the final state after an availableNow
        drain is independent of micro-batch slicing — which is what lets
        one batch-SQL oracle hash-gate the streaming run. Money sums ride
        integer cents computed JVM-side by the same DECIMAL(12,2) cast the
        oracle performs; no float ever enters the state store. Timers are
        deliberately unused: processing-time timers are wall-clock-
        dependent and would break the oracle (the TTL knob on every state
        getter is the production expiry story instead)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n long, total_cents long, max_cents long"
            )
            self._types = handle.getMapState("types", "t string", "c long")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total, mx = (
                self._totals.get() if self._totals.exists() else (0, 0, 0)
            )
            for pdf in rows:
                if not len(pdf):
                    continue
                bmax = int(pdf["cents"].max())
                mx = bmax if n == 0 else max(mx, bmax)  # valid for all-negative cents
                n += len(pdf)
                total += int(pdf["cents"].sum())
                for t, c in pdf.groupby("event_type").size().items():
                    prev = self._types.getValue((t,)) if self._types.containsKey((t,)) else None
                    self._types.updateValue((t,), (int(prev[0] if prev else 0) + int(c),))
            self._totals.update((n, total, mx))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_cents": [total],
                    "max_cents": [mx],
                    "n_types": [n_types],
                }
            )

        def close(self) -> None:
            pass

    return UserSpendTracker


def transform_with_state_available() -> bool:
    """Spark 4's ``transformWithStateInPandas`` worker protocol speaks
    protobuf (generated against the protobuf-6 runtime). The sandbox ships
    no ``google.protobuf`` (the only system copy, the cloud-sdk vendored
    4.23, predates the required ``runtime_version`` module), so the API is
    LIBRARY-BOUND here — the same class as the multimodal codec gate, and
    gated just as loudly. On any real cluster (protobuf is a standard
    Spark-connect-era dependency) the operator below runs as-is."""
    try:
        from google.protobuf import runtime_version  # noqa: F401

        return True
    except Exception:
        return False


def track_user_spend(stream: DataFrame) -> DataFrame:
    """Per-user spend profile via ``transformWithStateInPandas``.

    Input needs columns (user_id long, event_type string, cents long) —
    the caller computes ``cents`` with the DECIMAL(12,2) cast so the state
    only ever sums integers. Output mode ``update`` emits one snapshot row
    per (user, micro-batch); ``n_events`` is strictly monotone per user,
    so "latest snapshot" is a deterministic max — no batch-id needed.

    Raises loudly when the protobuf-6 runtime the worker protocol needs is
    absent (see ``transform_with_state_available``) — never a silent wrong
    answer; ``applyInPandasWithState`` (above) is the exercised stateful
    path in that environment."""
    if not transform_with_state_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf>=6 python runtime "
            "for its worker protocol; it is not installed in this environment. "
            "Use track_session_counts/applyInPandasWithState, or install "
            "protobuf on a real cluster."
        )
    cls = _tracker_class()
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=cls(),
        outputStructType=TRACKER_OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


KMV_OUTPUT_SCHEMA = "g string, kmv array<long>, version long"
KMV_STATE_SCHEMA = "kmv array<long>, version long"


def _kmv_update_factory(k: int):
    def update(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        if state.exists:
            cur, version = state.get
            cur = list(cur)
            version = int(version)
        else:
            cur, version = [], 0
        for pdf in pdfs:
            version += len(pdf)
            merged = set(cur)
            merged.update(int(h) for h in pdf["h"])
            cur = sorted(merged)[:k]
        state.update((cur, version))
        yield pd.DataFrame({"g": [key[0]], "kmv": [cur], "version": [version]})

    return update


def track_kmv(stream: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """Streaming KMV (bottom-k theta) sketch per group — the mergeable
    distinct/intersection sketch of operators/sketch.py maintained as
    ~k·8 bytes of state per group under ANY micro-batch arrival order
    (bottom-k union is commutative and associative, so stream-built ≡
    batch-built to the bit; the shared oracle pins it). The stream must
    carry the portable hash pre-computed JVM-side in column ``h`` — the
    python side only merges integers, never hashes text. ``version``
    counts rows processed per group: strictly monotone, so the final
    snapshot is a deterministic max."""
    return stream.groupBy(group_col).applyInPandasWithState(
        _kmv_update_factory(k),
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
