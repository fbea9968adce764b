

# ---- filtered_topk (metadata-filtered vector search) ------------------------


def _toy_emb(spark, n=120, d=8):
    import random

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(d)], i % 4)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_filtered_topk_selective_exact_vs_manual(spark):
    """Selective regime: results equal a manual filter + brute-force."""
    from pyspark.sql import functions as F

    from arrow_parquet_logs_spark.operators.similarity import (
        brute_force_topk_pandas, filtered_topk,
    )

    emb = _toy_emb(spark)
    q = emb.where(F.col("vec_id") < 3)
    pred = F.col("label") == 2
    got = filtered_topk(emb, q, pred, k=4).collect()
    want = brute_force_topk_pandas(emb.where(pred), q, k=4).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert all(r.vec_id % 4 == 2 for r in got)  # every hit satisfies the filter


def test_filtered_topk_ivf_regime_postfilters_and_recall(spark):
    """brute_cap=0 forces the IVF over-fetch regime: every returned hit
    satisfies the predicate, per-query hits <= k (honest, never padded),
    and over-fetch recall against the exact filtered answer is >= 1/2 on
    this easy corpus. Without centroids the regime raises loudly."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from arrow_parquet_logs_spark.operators import ivf
    from arrow_parquet_logs_spark.operators.similarity import (
        brute_force_topk_pandas, filtered_topk,
    )

    emb = _toy_emb(spark)
    q = emb.where(F.col("vec_id") < 3)
    pred = F.col("label") == 1
    cents = ivf.fit_kmeans(emb, k=4, iters=3)
    got = filtered_topk(emb, q, pred, k=3, brute_cap=0,
                        centroids=cents, nprobe=3, overfetch=6).collect()
    assert all(r.vec_id % 4 == 1 for r in got)
    per_q = {}
    for r in got:
        per_q.setdefault(r.q_id, set()).add(r.vec_id)
    assert all(len(v) <= 3 for v in per_q.values())
    exact = brute_force_topk_pandas(emb.where(pred), q, k=3).collect()
    want = {}
    for r in exact:
        want.setdefault(r.q_id, set()).add(r.vec_id)
    hits = sum(len(per_q.get(qi, set()) & vs) for qi, vs in want.items())
    total = sum(len(vs) for vs in want.values())
    assert hits / total >= 0.5, (hits, total)
    with _pytest.raises(ValueError, match="centroids"):
        filtered_topk(emb, q, pred, k=3, brute_cap=0)


# ---- binary-quantized shortlist + exact rerank (r9) -------------------------


def test_binary_quantize_words_match_numpy(spark):
    """Packed sign words must equal an independent numpy packing (MSB-first
    within each 32-bit word, bit set iff component > 0)."""
    import random

    import numpy as np
    from pyspark.sql import functions as F

    from arrow_parquet_logs_spark.operators.similarity import binary_quantize_words

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(50)]
    rows.append((50, [0.0] * 64))  # zeros: strict > 0 means no bit set
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: list(r.w)
        for r in df.select(
            "vec_id", binary_quantize_words("embedding", 64).alias("w")
        ).collect()
    }
    for vid, vec in rows:
        # float32 storage: compare against the float32-rounded values
        v32 = np.asarray(vec, dtype=np.float32).astype(np.float64)
        want = []
        for w in range(2):
            acc = 0
            for x in v32[w * 32 : (w + 1) * 32]:
                acc = acc * 2 + (1 if x > 0 else 0)
            want.append(acc)
        assert got[vid] == want, (vid, got[vid], want)


def test_binary_quantized_topk_full_shortlist_equals_brute(spark):
    """With a shortlist covering the whole corpus, the rerank pool is the
    full pair set — the result must equal brute-force exactly (pins the
    rerank stage and the family's total order); partition layout must not
    matter."""
    from pyspark.sql import functions as F

    from arrow_parquet_logs_spark.operators.similarity import (
        binary_quantized_topk,
        brute_force_topk,
    )

    emb = _toy_emb(spark, n=100, d=64)
    q = emb.where(F.col("vec_id") < 4)
    got = sorted(
        map(tuple, binary_quantized_topk(emb, q, k=5, shortlist=200, dims=64).collect())
    )
    want = sorted(map(tuple, brute_force_topk(emb, q, k=5).collect()))
    assert got == want and len(got) == 20

    got13 = sorted(
        map(
            tuple,
            binary_quantized_topk(emb.repartition(13), q, k=5, shortlist=200, dims=64).collect(),
        )
    )
    assert got13 == got


def test_binary_quantized_shortlist_prunes_before_window(spark):
    """Plan pin (the partial_topk discipline, test_topk.py form): the
    per-query Hamming window must consume the MapInPandas-pruned frame,
    and the pruner must consume the raw broadcast-NL pair frame — never a
    corpus-sized window partition."""
    from pyspark.sql import functions as F

    from arrow_parquet_logs_spark.operators.similarity import binary_quantized_topk
    from arrow_parquet_logs_spark.plans.inspect import explain_str

    emb = _toy_emb(spark, n=100, d=64)
    out = binary_quantized_topk(
        emb, emb.where(F.col("vec_id") < 4), k=5, shortlist=10, dims=64
    )
    plan = explain_str(out, mode="simple")
    assert "MapInPandas" in plan, plan
    w, m = plan.index("Window"), plan.index("MapInPandas")
    assert w < m, f"window must consume the pruned frame:\n{plan}"
    assert m < plan.index("BroadcastNestedLoopJoin"), (
        f"pruner must consume the raw pair frame:\n{plan}"
    )
    assert len({(r.q_id, r.vec_id) for r in out.collect()}) == 20


def test_binary_quantize_words_partial_last_word(spark):
    """dims not a multiple of 32: the last word folds over the shorter
    slice (MSB-first over the elements PRESENT), still non-negative and
    deterministic — pinned against the same numpy reference."""
    import random

    import numpy as np

    from arrow_parquet_logs_spark.operators.similarity import binary_quantize_words

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(48)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: list(r.w)
        for r in df.select(
            "vec_id", binary_quantize_words("embedding", 48).alias("w")
        ).collect()
    }
    for vid, vec in rows:
        v32 = np.asarray(vec, dtype=np.float32).astype(np.float64)
        want = []
        for lo, hi in ((0, 32), (32, 48)):
            acc = 0
            for x in v32[lo:hi]:
                acc = acc * 2 + (1 if x > 0 else 0)
            want.append(acc)
        assert got[vid] == want
