

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
