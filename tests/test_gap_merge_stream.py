"""gap_merge_stream — the unkeyed single-stream gap merge (r8).

Pins bit-equality with the global-window lag→gap→cumsum form under:
hostile bucket counts (buckets smaller than sessions, sessions spanning
many buckets), exact-timestamp ties at would-be bucket boundaries, hostile
input partitioning, and the degenerate single-bucket / empty-stream cases.
Also pins the plan property: no window over the stream without a bucket
partition key (the summary-bridge window is ≤ n_buckets rows).
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import Window as W, functions as F

from arrow_parquet_logs_spark.operators.sessionize import gap_merge_stream

GAP = 1_800_000_000  # 30 min in µs


def _global_form(df):
    w = W.orderBy("ts", "event_id")
    prev = F.lag(F.unix_micros("ts")).over(w)
    nb = F.when(
        prev.isNull() | (F.unix_micros("ts") - prev > GAP), 1
    ).otherwise(0)
    return df.select(
        "ts", "event_id",
        F.sum(nb).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint").alias("burst_id"),
    )


@pytest.fixture(scope="module")
def stream(spark):
    # bursty stream: sessions of 1–40 events at 1–20 min spacing, separated
    # by 31 min – 6 h gaps; duplicate timestamps sprinkled in (tie-break
    # order must hold across any bucketing)
    rng = random.Random(42)
    rows, t, eid = [], 1_700_000_000_000_000, 0
    for _ in range(120):
        t += rng.randint(31 * 60, 6 * 3600) * 1_000_000
        for _ in range(rng.randint(1, 40)):
            rows.append((t, eid)); eid += 1
            if rng.random() < 0.15:  # exact tie
                rows.append((t, eid)); eid += 1
            t += rng.randint(60, 20 * 60) * 1_000_000
    df = spark.createDataFrame(rows, "tsm long, event_id long").select(
        F.timestamp_micros("tsm").alias("ts"), "event_id"
    )
    return df.repartition(16)  # hostile layout


@pytest.mark.parametrize("n_buckets", [1, 3, 64])
def test_matches_global_window(stream, n_buckets):
    got = sorted(
        (r.event_id, r.burst_id)
        for r in gap_merge_stream(stream, "ts", "event_id", GAP, n_buckets).collect()
    )
    want = sorted((r.event_id, r.burst_id) for r in _global_form(stream).collect())
    assert got == want and len(got) > 100


def test_partition_invariance(stream):
    a = sorted(
        (r.event_id, r.burst_id)
        for r in gap_merge_stream(stream.repartition(1), "ts", "event_id", GAP).collect()
    )
    b = sorted(
        (r.event_id, r.burst_id)
        for r in gap_merge_stream(stream.repartition(13), "ts", "event_id", GAP).collect()
    )
    assert a == b


def test_empty_stream(spark):
    df = spark.createDataFrame([], "ts timestamp, event_id long")
    assert gap_merge_stream(df, "ts", "event_id", GAP).count() == 0


def test_stream_window_is_bucket_partitioned(stream):
    from arrow_parquet_logs_spark.plans.inspect import explain_str

    out = gap_merge_stream(stream, "ts", "event_id", GAP)
    plan = explain_str(out, mode="simple").split("== Initial Plan ==")[0]
    win_lines = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert win_lines, plan
    # the per-row windows (_nb_i/_cum_i) must carry the bucket key; only the
    # ≤ n_buckets summary bridge (_prev_last/_off) may order globally
    for ln in win_lines:
        if "_cum_i" in ln or "_nb_i" in ln:
            assert "_b#" in ln, f"stream window lost its bucket key:\n{ln}"


def test_provably_small_scan_skips_quantile_probe(spark, tmp_path, monkeypatch):
    """VERDICT r8 #2: a provably-small file-backed input must take the
    plain single-window plan WITHOUT running the approxQuantile driver
    job (the fixed ~0.5 s probe measured to dominate small queries in the
    skyline's gate work) — and the result must still equal the global
    form. Pinned by making approxQuantile raise: the gated branch never
    reaches it."""
    out = str(tmp_path / "ev.parquet")
    rows = [(1_700_000_000_000_000 + i * 60_000_000, i) for i in range(200)]
    spark.createDataFrame(rows, "tsm long, event_id long").select(
        F.timestamp_micros("tsm").alias("ts"), "event_id"
    ).coalesce(1).write.mode("overwrite").parquet(out)
    df = spark.read.parquet(out)

    def _boom(self, *a, **k):
        raise AssertionError("approxQuantile probe ran on a provably-small input")

    # patch the CONCRETE class (pyspark 4: pyspark.sql.classic.dataframe
    # overrides the base method, so patching pyspark.sql.DataFrame misses)
    monkeypatch.setattr(type(df), "approxQuantile", _boom)
    got = sorted(
        (r.event_id, r.burst_id)
        for r in gap_merge_stream(df, "ts", "event_id", GAP).collect()
    )
    want = sorted((r.event_id, r.burst_id) for r in _global_form(df).collect())
    assert got == want and len(got) == 200


def test_unknown_provenance_keeps_distributed_prefix(spark, monkeypatch):
    """A shuffle-rooted frame (no stat-able files) must still pay the
    quantile probe and bucket — unknown means assume big."""
    rows = [(1_700_000_000_000_000 + i * 60_000_000, i) for i in range(50)]
    df = spark.createDataFrame(rows, "tsm long, event_id long").select(
        F.timestamp_micros("tsm").alias("ts"), "event_id"
    )
    calls = []
    orig = type(df).approxQuantile

    def _spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(type(df), "approxQuantile", _spy)
    gap_merge_stream(df, "ts", "event_id", GAP)
    assert calls, "generated frame must keep the quantile-cut bucketing"
