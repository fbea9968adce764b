#!/usr/bin/env python
"""Oracle-free 10x-scale correctness probe for the oracle-unreachable rows.

The sf1 oracle sample (VERIFY_r05_sf1.log) excludes the dedup family:
their DuckDB oracles replay LSH candidate generation in SQL and go
super-linear at 50k documents — the ORACLE is the bottleneck, not the
engine. At true deployment scale no oracle exists at all, so this probe
applies the invariant that carries correctness beyond oracle reach:
results must be BIT-IDENTICAL under a hostile partitioning (shuffle=7,
AQE off) vs the tuned session (shuffle=32, AQE on). Partition-order
independence is what lets a single-node oracle at sf0.01 stand in for a
1000-executor cluster; holding it at sf1 says the 10x plans still
converge to one answer.

Run:  SPARK_GRAFT_CPUS=16 python tools/sf1_invariance.py [sf_dir]
Prints one line per query + a PASS/FAIL footer; exits nonzero on FAIL.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_fast",
    "dedup_ngram_jaccard_fast",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "dedup_semantic_keep",
    "dedup_semantic_keep_best",  # r7: same quadratic-ORACLE class as semantic_keep
    "dedup_embedding_cosine_fast",
    "docs_span_dedup",
    "docs_exact_dedup",
    "ann_srp_lsh_topk",
    # round-5 close: the remaining oracle-unreachable rows, so every
    # registry query has EITHER an sf1 oracle row or an sf1 invariance row.
    # dedup_embedding_cosine (the interpreted expression SPEC form) is the
    # one deliberate exception: at its loose threshold (t=0.4, ε≈1.1) the
    # ε-complete expansion is brute-force-class BY DESIGN (exactness at low
    # t is near-quadratic — see its docstring), and interpreted per-pair
    # cosine makes an sf1 run hours-long while proving nothing new: its
    # bit-equality with dedup_embedding_cosine_fast is pytest-pinned, and
    # the fast form IS sf1-invariant above.
    "dedup_ngram_jaccard",
    "dedup_jaccard_prefix",
    "docs_substring_dedup",
    # round-5 session 3: rows whose ORACLES are quadratic at sf1 — the
    # recursive-CTE walk replay (carries every (node, dist, root) triple)
    # and the NOT EXISTS dominance self-join. The engine sides are
    # frontier-sized BFS and n·|frontier| SFS respectively; invariance at
    # 10x is their beyond-oracle gate.
    "graph_shortest_hops",
    "lineitem_skyline_3d",
]


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--only=")]
    only = next((a.split("=", 1)[1].split(",") for a in sys.argv[1:]
                 if a.startswith("--only=")), None)
    sf_dir = argv[0] if argv else ".scale_data/sf1"
    from arrow_parquet_logs_spark.queries import REGISTRY
    from arrow_parquet_logs_spark.session import get_spark

    spark = get_spark("sf1-invariance")
    failures = []
    queries = [q for q in QUERIES if only is None or q in only]
    for name in queries:
        fn = REGISTRY[name].fn
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        a = sorted(map(tuple, fn(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        b = sorted(map(tuple, fn(spark, sf_dir).collect()))
        # query constructors may repair confs; re-set for the next loop
        ok = a == b
        print(f"{name}: rows={len(a)} {'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff #{i}: {x} vs {y}")
                    break
            failures.append(name)
    print(f"\n{len(queries) - len(failures)}/{len(queries)} partition-invariant at {sf_dir}"
          + (f"; FAILED: {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
