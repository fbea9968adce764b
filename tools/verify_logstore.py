"""LogStore drive — the verify skill's second surface, from a fresh process.

Covers the checklist in .claude/skills/verify/SKILL.md: empty read, Z /
+00:00 timestamp writes, read-your-writes across landing∪archive, inclusive
ts bounds, exactly-once compaction (+ no-op recompaction + crash-window
landing-file resurrection), every validation/filter error class, and the
("a_b","c") vs ("a","b_c") session-name isolation trap.

Run: SPARK_GRAFT_CPUS=8 python tools/verify_logstore.py
Exit 0 + final "LOGSTORE DRIVE: ALL OK" line on success.
"""
from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile


def main() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("verify-logstore")
        .config("spark.sql.session.timeZone", "America/New_York")  # hostile tz
        .getOrCreate()
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from arrow_parquet_logs_spark.logstore.filters import FilterError
    from arrow_parquet_logs_spark.logstore.store import LogStore, LogValidationError

    root = tempfile.mkdtemp(prefix="verify_logstore_")
    store = LogStore(spark, root)

    # 1. empty read
    assert store.read_logs(container="c", session="s") == [], "empty read"

    # 2. write with Z and +00:00 forms; read-your-writes landing∪archive
    rows = [
        {"timestamp": "2024-01-01T00:00:00Z", "level": "INFO", "message": "m0"},
        {"timestamp": "2024-01-01T06:30:00+00:00", "level": "WARN", "message": "m1"},
        {"timestamp": "2024-01-02T12:00:00Z", "level": "ERROR", "message": "m2"},
    ]
    assert store.write_logs("c", "s", rows) == 3
    got = store.read_logs(container="c", session="s")
    assert [r["message"] for r in got] == ["m0", "m1", "m2"], got

    # 3. inclusive start_ts/end_ts on both ends
    mid = store.read_logs(
        container="c", session="s",
        start_ts="2024-01-01T06:30:00Z", end_ts="2024-01-02T12:00:00Z",
    )
    assert [r["message"] for r in mid] == ["m1", "m2"], mid

    # 4. compact: exactly-once, recompaction no-op, crash-window probe
    landing = glob.glob(os.path.join(root, "landing", "**", "*.parquet"), recursive=True)
    assert landing, "expected landing files before compaction"
    saved = landing[0] + ".saved"
    shutil.copy(landing[0], saved)
    store.compact("c", "s")
    after = store.read_logs(container="c", session="s")
    assert [r["message"] for r in after] == ["m0", "m1", "m2"], "compaction changed rows"
    store.compact("c", "s")  # no-op
    assert [r["message"] for r in store.read_logs(container="c", session="s")] == [
        "m0", "m1", "m2",
    ], "re-compaction must be a no-op"
    # crash window: a consumed landing file resurfaces -> manifest excludes it
    shutil.copy(saved, landing[0])
    res = store.read_logs(container="c", session="s")
    assert [r["message"] for r in res] == ["m0", "m1", "m2"], (
        "resurrected landing file must stay excluded by the manifest"
    )

    # 5. validation probes — every class raises LogValidationError
    bad_batches = [
        [{"level": "INFO", "message": "x"}],                                # missing ts
        [{"timestamp": "not-a-ts", "level": "INFO", "message": "x"}],       # bad ts
        [{"timestamp": "2024-01-01T00:00:00Z", "level": 7, "message": "x"}],  # non-str level
        ["not-a-dict"],                                                     # non-dict row
        [],                                                                 # empty batch
    ]
    for i, batch in enumerate(bad_batches):
        try:
            store.write_logs("c", "s", batch)
        except LogValidationError:
            pass
        else:
            raise AssertionError(f"bad batch {i} did not raise LogValidationError")

    # 6. unknown filter op
    try:
        store.read_logs(container="c", session="s", filters=[("level", "~~", "I")])
    except FilterError:
        pass
    else:
        raise AssertionError("unknown filter op did not raise FilterError")

    # 7. session-name isolation: ("a_b","c") vs ("a","b_c")
    store.write_logs("a_b", "c", rows[:1])
    store.write_logs("a", "b_c", rows[1:])
    assert len(store.read_logs(container="a_b", session="c")) == 1
    assert len(store.read_logs(container="a", session="b_c")) == 2

    shutil.rmtree(root, ignore_errors=True)
    print("LOGSTORE DRIVE: ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
