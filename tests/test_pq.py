"""Product-quantization guarantees: encode matches a numpy reference,
codes are total and partition-invariant, and learned-PQ rerank recalls
the exact top-k."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from arrow_parquet_logs_spark.operators import pq as PQ, similarity as S
from arrow_parquet_logs_spark.sources.tables import load_table


def _numpy_encode(vecs, codebooks):
    """Independent reference: quantize to micro-units, argmin per subspace
    (first minimum on ties — numpy argmin semantics match the (dist, code)
    lexicographic min)."""
    out = {}
    sub = len(codebooks[0][0])
    for vid, v in vecs:
        q = np.floor(np.asarray(v, dtype=np.float64) * PQ.SCALE).astype(np.int64)
        for j, book in enumerate(codebooks):
            d = [int(((q[j * sub : (j + 1) * sub] - np.asarray(c)) ** 2).sum()) for c in book]
            out[(vid, j)] = int(np.argmin(d))
    return out


def test_encode_matches_numpy_reference(spark):
    rng = np.random.RandomState(7)
    vecs = [(i, [float(x) for x in rng.uniform(-1, 1, 64)]) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    cbs = PQ.rademacher_codebooks()
    got = {(r.vec_id, r.j): r.code for r in PQ.encode_pq(df, cbs).collect()}
    # the reference must see the same float32-rounded values Spark reads
    stored = [(r.vec_id, r.embedding) for r in df.collect()]
    assert got == _numpy_encode(stored, cbs)


def test_encode_total_and_partition_invariant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cbs = PQ.rademacher_codebooks()
    a = sorted(map(tuple, PQ.encode_pq(emb, cbs).collect()))
    b = sorted(map(tuple, PQ.encode_pq(emb.repartition(16), cbs).collect()))
    assert a == b  # partitioning-invariant
    n = emb.count()
    assert len(a) == n * 8  # one code per (vector, subspace)
    assert all(0 <= code < 16 for _, _, code in a)


def test_learned_pq_rerank_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    cbs = PQ.fit_pq(emb)
    approx = PQ.pq_rerank_topk(emb, q, cbs, k=5, rerank=100)
    exact = S.brute_force_topk(emb, q, k=5)
    a = {(r.q_id, r.vec_id) for r in approx.collect()}
    e = {(r.q_id, r.vec_id) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.6
    # reranked cosines are exact: every hit's cosine equals the brute-force one
    ac = {(r.q_id, r.vec_id): r.cosine for r in approx.collect()}
    ec = {(r.q_id, r.vec_id): r.cosine for r in exact.collect()}
    assert all(ac[p] == ec[p] for p in (a & e))


def test_fit_pq_rejects_indivisible_dims(spark):
    df = spark.createDataFrame(
        [(i, [float(i)] * 30) for i in range(20)], "vec_id long, embedding array<float>"
    )
    import pytest

    with pytest.raises(ValueError):
        PQ.fit_pq(df, m=8)


def test_ivfpq_materialized_search_recall_and_pruning(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from arrow_parquet_logs_spark.plans.inspect import explain_str

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    cents, books = PQ.fit_ivfpq(emb)
    path = str(tmp_path / "ivfpq")
    PQ.materialize_ivfpq(emb, cents, books, path)
    out = PQ.search_ivfpq(spark, path, emb, q, cents, books, k=5, nprobe=4, rerank=50)
    a = {(r.q_id, r.vec_id) for r in out.select("q_id", "vec_id").collect()}
    e = {
        (r.q_id, r.vec_id)
        for r in S.brute_force_topk(emb, q, k=5).select("q_id", "vec_id").collect()
    }
    assert len(a & e) / len(e) >= 0.5  # nprobe=4 of 16 cells
    # the code scan must carry an explicit cell partition filter
    codes = spark.read.parquet(path).where(F.col("cell").isin([0, 1]))
    pf = [ln for ln in explain_str(codes).splitlines() if "PartitionFilters" in ln]
    assert pf and "cell" in pf[0], explain_str(codes)
    # codes are ~m small ints per vector: the compression contract
    n = emb.count()
    assert spark.read.parquet(path).count() == n * 8


def test_ivfpq_encode_residual_beats_raw_pq(spark, sf_dir):
    """Residual coding must reduce quantization error vs raw-vector PQ at
    the same code budget (the reason IVF-PQ exists)."""
    import numpy as np
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(300).collect()
    x = np.array([r[1] for r in rows], dtype=np.float64)
    cents, books = PQ.fit_ivfpq(emb)
    raw_books = PQ.fit_pq(emb)
    cents_a = np.array(cents)
    assign = ((x[:, None, :] - cents_a[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)

    def mse(vecs, codebooks):
        err = 0.0
        qv = np.floor(vecs * PQ.SCALE)
        for j, book in enumerate(codebooks):
            b = np.array(book, dtype=np.float64)
            subv = qv[:, j * 8 : (j + 1) * 8]
            d = ((subv[:, None, :] - b[None, :, :]) ** 2).sum(axis=2)
            err += d.min(axis=1).sum()
        return err

    res = np.floor(x * PQ.SCALE) - np.floor(cents_a * PQ.SCALE)[assign]
    err_res = 0.0
    for j, book in enumerate(books):
        b = np.array(book, dtype=np.float64)
        subv = res[:, j * 8 : (j + 1) * 8]
        err_res += ((subv[:, None, :] - b[None, :, :]) ** 2).sum(axis=2).min(axis=1).sum()
    assert err_res < mse(x, raw_books)


def test_ivfpq_append_equals_rebuild(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    cents, books = PQ.fit_ivfpq(emb)
    old = emb.where(F.col("vec_id") % 5 != 0)
    new = emb.where(F.col("vec_id") % 5 == 0)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    PQ.materialize_ivfpq(old, cents, books, inc)
    PQ.append_to_ivfpq(new, cents, books, inc)
    PQ.materialize_ivfpq(emb, cents, books, full)
    a = sorted(map(tuple, spark.read.parquet(inc).collect()))
    b = sorted(map(tuple, spark.read.parquet(full).collect()))
    assert a == b


def test_encode_pq_pandas_bit_equal_to_expression(spark, sf_dir):
    from arrow_parquet_logs_spark.operators.ivf import assign_cells_pandas

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = PQ.rademacher_codebooks()
    a = sorted(map(tuple, PQ.encode_pq(emb, cbs).collect()))
    b = sorted(map(tuple, PQ.encode_pq_pandas(emb, cbs).collect()))
    assert a == b
    # residual (IVF-PQ) form, against the expression encode_ivfpq
    cents, books = PQ.fit_ivfpq(emb)
    expr = sorted(
        (r.vec_id, r.cell, r.j, r.code)
        for r in PQ.encode_ivfpq(emb, cents, books).collect()
    )
    assigned = assign_cells_pandas(emb.select("vec_id", "embedding"), cents)
    fast = sorted(
        (r.vec_id, r.cell, r.j, r.code)
        for r in PQ.encode_pq_pandas(assigned, books, centroids=cents).collect()
    )
    assert expr == fast
    # the FUSED assign+encode pass (what materialize/append/stream actually
    # run): same codes as the expression form
    fused = sorted(
        (r.vec_id, r.cell, r.j, r.code)
        for r in PQ._ivfpq_codes(emb, cents, books, "vec_id", "embedding", True).collect()
    )
    assert expr == fused


def test_pq_adc_topk_pandas_encode_bit_equal(spark, sf_dir):
    """The ``pandas_encode=True`` form of the end-to-end ADC top-k (the
    bench/production encode) must return the identical ranked rows as the
    expression-encode default — same oracle hash by construction."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    cbs = PQ.rademacher_codebooks()
    a = sorted(map(tuple, PQ.pq_adc_topk(emb, q, cbs, k=5).collect()))
    b = sorted(map(tuple, PQ.pq_adc_topk(emb, q, cbs, k=5, pandas_encode=True).collect()))
    assert a == b


def test_pq_empty_and_null_vectors(spark):
    cbs = PQ.rademacher_codebooks()
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert PQ.encode_pq(empty, cbs).count() == 0
    assert PQ.encode_pq_pandas(empty, cbs).count() == 0
    # null vectors carry no components -> no codes, never a crash
    withnull = spark.createDataFrame(
        [(1, [0.5] * 64), (2, None)], "vec_id long, embedding array<float>"
    )
    assert {r.vec_id for r in PQ.encode_pq(withnull, cbs).collect()} == {1}
    assert {r.vec_id for r in PQ.encode_pq_pandas(withnull, cbs).collect()} == {1}


def test_stream_ivfpq_ingest_equals_batch_rebuild(spark, sf_dir, tmp_path):
    """A stream-built IVF-PQ index (foreachBatch append per micro-batch)
    must be bit-identical to a batch materialize over the same rows, and
    search results over the two indexes must match exactly."""
    import os

    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    cents, books = PQ.fit_ivfpq(emb)
    base = emb.where(F.col("vec_id") % 5 != 0)
    arriving = emb.where(F.col("vec_id") % 5 == 0)

    # the arriving vectors land as 3 source files -> 3 micro-batches
    src = str(tmp_path / "src")
    for i in range(3):
        arriving.where(F.col("vec_id") % 3 == i).write.mode("append").parquet(src)

    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    PQ.materialize_ivfpq(base, cents, books, inc)
    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = PQ.start_stream_ivfpq_ingest(
        stream, cents, books, inc, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    PQ.materialize_ivfpq(emb, cents, books, full)
    a = sorted(map(tuple, spark.read.parquet(inc).collect()))
    b = sorted(map(tuple, spark.read.parquet(full).collect()))
    assert a == b

    # restart from the checkpoint: consumed batches are NOT re-appended
    q = PQ.start_stream_ivfpq_ingest(
        stream, cents, books, inc, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    assert sorted(map(tuple, spark.read.parquet(inc).collect())) == b

    # the stream-built index answers searches identically to the rebuild
    queries = emb.where(F.col("vec_id") < 3)
    ra = sorted(
        map(tuple, PQ.search_ivfpq(spark, inc, emb, queries, cents, books, k=3).collect())
    )
    rb = sorted(
        map(tuple, PQ.search_ivfpq(spark, full, emb, queries, cents, books, k=3).collect())
    )
    assert ra == rb and ra


def test_ivfpq_model_persistence_self_contained(spark, sf_dir, tmp_path):
    """materialize_ivfpq persists the fitted model beside its codes: a
    fresh process loads the EXACT encode grid back and searches
    identically; an index without a model raises instead of inviting a
    silent re-fit mismatch. The underscore-prefixed model file is
    invisible to the parquet reader."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    cents, books = PQ.fit_ivfpq(emb)
    idx = str(tmp_path / "idx")
    PQ.materialize_ivfpq(emb, cents, books, idx)
    c2, b2 = PQ.load_ivfpq_model(idx)
    assert c2 == cents and b2 == books
    q = emb.where(F.col("vec_id") < 3)
    a = sorted(map(tuple, PQ.search_ivfpq(spark, idx, emb, q, cents, books, k=3).collect()))
    b = sorted(map(tuple, PQ.search_ivfpq(spark, idx, emb, q, c2, b2, k=3).collect()))
    assert a == b and a
    # parquet scan unaffected by the sidecar file
    assert spark.read.parquet(idx).count() > 0
    with pytest.raises(FileNotFoundError, match="_MODEL.json"):
        PQ.load_ivfpq_model(str(tmp_path / "nowhere"))


def test_search_ivfpq_string_ids(spark, sf_dir, tmp_path):
    """ADVICE r3: search_ivfpq must work with non-integer id columns — the
    LUT inherits the caller's id type."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.concat(F.lit("v"), F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    cents, books = PQ.fit_ivfpq(emb)
    idx = str(tmp_path / "sidx")
    PQ.materialize_ivfpq(emb, cents, books, idx)
    q = emb.where(F.col("vec_id").isin("v0", "v1"))
    out = PQ.search_ivfpq(spark, idx, emb, q, cents, books, k=3).collect()
    assert out and all(isinstance(r.q_id, str) and r.q_id.startswith("v") for r in out)
    assert {r.q_id for r in out} == {"v0", "v1"}


def test_split_hot_cells_noop_and_rebalance(spark, sf_dir, tmp_path):
    """split_hot_cells: (a) a balanced index with a generous threshold is a
    NO-OP — model and code rows bit-unchanged; (b) a coarse index splits,
    conserves every (id, j) code row, strictly reduces the max cell size,
    appends child centroids without renumbering roots, and search against
    the updated model still returns k results per query."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.where(F.col("embedding").isNotNull()).count()

    # (a) no-op path
    cents, books = PQ.fit_ivfpq(emb, k=4)
    idx = str(tmp_path / "noop")
    PQ.materialize_ivfpq(emb, cents, books, idx)
    before = sorted(map(tuple, spark.read.parquet(idx).collect()))
    new_cents, splits = PQ.split_hot_cells(spark, idx, emb, max_cell_rows=n + 1)
    assert splits == {} and new_cents == [list(c) for c in cents]
    assert sorted(map(tuple, spark.read.parquet(idx).collect())) == before
    assert PQ.load_ivfpq_model(idx)[0] == cents  # model untouched on no-op

    # (b) split path
    idx2 = str(tmp_path / "hot")
    PQ.materialize_ivfpq(emb, cents, books, idx2)
    m = len(books)
    sizes = lambda p: {
        int(r["cell"]): int(r["n"])
        for r in spark.read.parquet(p).groupBy("cell")
        .agg((F.count(F.lit(1)) / m).cast("long").alias("n")).collect()
    }
    s0 = sizes(idx2)
    new_cents, splits = PQ.split_hot_cells(spark, idx2, emb, max_cell_rows=max(1, n // 6))
    assert splits, "4-cell index must have hot cells at n//6"
    s1 = sizes(idx2)
    assert max(s1.values()) < max(s0.values())
    assert sum(s1.values()) == sum(s0.values()) == n  # conservation
    # roots keep their ids; children appended at the end
    assert len(new_cents) == len(cents) + len(splits)
    for r, (a_idx, b_idx) in splits.items():
        assert a_idx == r and b_idx >= len(cents)
    # every (id, j) pair present exactly once
    codes = spark.read.parquet(idx2)
    assert codes.select("vec_id", "j").distinct().count() == n * m
    # persisted model matches the returned centroids; search still whole
    pc, pb = PQ.load_ivfpq_model(idx2)
    assert pc == new_cents and pb == books
    q = emb.where(F.col("vec_id") < 3)
    out = PQ.search_ivfpq(spark, idx2, emb, q, new_cents, books, k=3)
    got = out.groupBy("q_id").count().collect()
    assert got and all(r["count"] == 3 for r in got)


def test_maintain_ivfpq_converges_and_noops(spark, sf_dir, tmp_path):
    """maintain_ivfpq loops split passes until balanced, then no-ops; the
    round bound turns an unsplittable hot cell into loud imbalance, not a
    hang."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.where(F.col("embedding").isNotNull()).count()
    cents, books = PQ.fit_ivfpq(emb, k=2)  # 2 huge cells: one pass can't balance
    m = len(books)
    idx = str(tmp_path / "idx")
    PQ.materialize_ivfpq(emb, cents, books, idx)
    threshold = max(1, n // 8)
    applied = PQ.maintain_ivfpq(spark, idx, emb, threshold)
    assert applied >= 3, "2 cells at n//8 need at least two passes of splits"
    sizes = {
        int(r["cell"]): int(r["n"])
        for r in spark.read.parquet(idx)
        .groupBy("cell").agg((F.count(F.lit(1)) / m).cast("long").alias("n")).collect()
    }
    assert max(sizes.values()) <= threshold
    assert sum(sizes.values()) == n  # conservation through repeated splits
    assert PQ.maintain_ivfpq(spark, idx, emb, threshold) == 0  # balanced → no-op


def test_maintain_ivfpq_round_bound_degenerate(spark, tmp_path):
    """An all-identical hot cell can never split below threshold — the
    max_split_rounds bound must exit loudly-imbalanced instead of hanging."""
    rows = [(i, [0.5] * 64) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents, books = PQ.fit_ivfpq(emb, k=1)
    idx = str(tmp_path / "idx")
    PQ.materialize_ivfpq(emb, cents, books, idx)
    PQ.maintain_ivfpq(spark, idx, emb, max_cell_rows=5, max_split_rounds=3)
    sizes = [
        int(r["n"])
        for r in spark.read.parquet(idx)
        .groupBy("cell").agg((F.count(F.lit(1)) / len(books)).cast("long").alias("n"))
        .collect()
    ]
    assert sum(sizes) == 40  # no rows lost even when balance is unreachable
    assert max(sizes) > 5  # still hot — bounded, loud, not hung


def test_ingest_batch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """ADVICE r8 (medium): foreachBatch is at-least-once — a replay of an
    ALREADY-COMMITTED batch id (crash between our ledger commit and
    Spark's offset commit) must be a no-op: code rows, model, and cell
    layout bit-unchanged. A replay that finds a mid-pair in-flight marker
    must fail LOUD instead of silently double-appending."""
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    cents, books = PQ.fit_ivfpq(emb, k=4)
    idx, ckpt = str(tmp_path / "idx"), str(tmp_path / "ckpt")
    base = emb.where(F.col("vec_id") % 5 != 0)
    PQ.materialize_ivfpq(base, cents, books, idx)
    n = emb.where(F.col("embedding").isNotNull()).count()
    thr = max(1, n // 6)
    batch = emb.where(F.col("vec_id") % 5 == 0)

    assert PQ.apply_ivfpq_ingest_batch(spark, batch, 0, idx, ckpt, emb, thr)
    rows_after = sorted(map(tuple, spark.read.parquet(idx).collect()))
    model_after = PQ.load_ivfpq_model(idx)

    # replay of the committed batch id: skipped, nothing changes
    assert not PQ.apply_ivfpq_ingest_batch(spark, batch, 0, idx, ckpt, emb, thr)
    assert sorted(map(tuple, spark.read.parquet(idx).collect())) == rows_after
    assert PQ.load_ivfpq_model(idx) == model_after

    # a stale marker naming THIS checkpoint's committed batch is cleaned
    # up silently (crash in the commit->unmark window)...
    open(PQ._inflight_path(idx), "w").write(f"{os.path.abspath(ckpt)}:0")
    assert not PQ.apply_ivfpq_ingest_batch(spark, batch, 0, idx, ckpt, emb, thr)
    assert not os.path.exists(PQ._inflight_path(idx))

    # ...but a marker for an UNCOMMITTED batch means a torn pair: loud
    open(PQ._inflight_path(idx), "w").write(f"{os.path.abspath(ckpt)}:1")
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="in-flight"):
        PQ.apply_ivfpq_ingest_batch(spark, batch, 1, idx, ckpt, emb, thr)

    # ADVICE r9: the ledger is checkpoint-keyed but the marker is
    # index-global — a replay from THIS checkpoint must not silently
    # absorb a torn pair left by a DIFFERENT checkpoint's stream. The
    # same uncommitted marker stays loud even on the replayed-batch path
    # (batch 0 is committed for ckpt; the marker's batch 1 is not):
    with _pytest.raises(RuntimeError, match="in-flight"):
        PQ.apply_ivfpq_ingest_batch(spark, batch, 0, idx, ckpt, emb, thr)
    # ...including a marker naming a checkpoint with no ledger entry
    open(PQ._inflight_path(idx), "w").write(
        f"{os.path.abspath(str(tmp_path / 'foreign_ckpt'))}:0"
    )
    with _pytest.raises(RuntimeError, match="in-flight"):
        PQ.apply_ivfpq_ingest_batch(spark, batch, 0, idx, ckpt, emb, thr)
    # a LEGACY bare-int marker gets the old protocol's grace: stale iff
    # its batch id is committed for the REPLAYING checkpoint...
    open(PQ._inflight_path(idx), "w").write("0")
    assert not PQ.apply_ivfpq_ingest_batch(spark, batch, 0, idx, ckpt, emb, thr)
    assert not os.path.exists(PQ._inflight_path(idx))
    # ...but a legacy marker for an uncommitted batch, or a garbled one,
    # stays loud
    open(PQ._inflight_path(idx), "w").write("7")
    with _pytest.raises(RuntimeError, match="in-flight"):
        PQ.apply_ivfpq_ingest_batch(spark, batch, 0, idx, ckpt, emb, thr)
    open(PQ._inflight_path(idx), "w").write("garbled")
    with _pytest.raises(RuntimeError, match="in-flight"):
        PQ.apply_ivfpq_ingest_batch(spark, batch, 0, idx, ckpt, emb, thr)
    os.remove(PQ._inflight_path(idx))

    # a NEW checkpoint restarts batch numbering — its batch 0 must apply
    ckpt2 = str(tmp_path / "ckpt2")
    extra = emb.where(F.col("vec_id") % 5 == 1).limit(0)  # empty -> skipped
    assert not PQ.apply_ivfpq_ingest_batch(spark, extra, 0, idx, ckpt2, emb, thr)
    assert PQ._ledger_last(idx, os.path.abspath(ckpt2)) == -1

    # ADVICE r10: once the ledger has seen a SECOND checkpoint, a legacy
    # bare-int marker could have been left by either stream — the grace
    # is gated on exactly-one-ledger-key, so it now stays loud even
    # though its batch id is committed for the replaying checkpoint
    extra2 = emb.where(F.col("vec_id") % 5 == 1)
    assert PQ.apply_ivfpq_ingest_batch(spark, extra2, 0, idx, ckpt2, emb, thr)
    assert sorted(PQ._ledger_keys(idx)) == sorted(
        [os.path.abspath(ckpt), os.path.abspath(ckpt2)]
    )
    open(PQ._inflight_path(idx), "w").write("0")
    with _pytest.raises(RuntimeError, match="in-flight"):
        PQ.apply_ivfpq_ingest_batch(spark, batch, 0, idx, ckpt, emb, thr)
    os.remove(PQ._inflight_path(idx))
