"""Side-by-side sf10 probe: r6 pagerank (per-round dm job + broadcast) vs
r7 (dm rides the checkpoint as an Observation metric). Same session, same
edges, interleaved reps; warm minima decide the >=25% adoption question."""
import importlib.util, os, sys, time

os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
sys.path.insert(0, "/root/repo")
from arrow_parquet_logs_spark.session import get_spark
from arrow_parquet_logs_spark.sources.tables import load_table
from pyspark.sql import functions as F

# r6 baseline = operators/graph.py BEFORE the r7 Observation changes
# (both landed in commit 26f9622; bce3b69 is its pre-change ancestor).
# checked extraction, never a cached stale/empty file: a failed `git show`
# with a shell redirect still creates the file, and an exists-guard would
# then pin the wrong baseline forever.
import subprocess

_r6_src = subprocess.run(
    ["git", "-C", "/root/repo", "show",
     "bce3b69:arrow_parquet_logs_spark/operators/graph.py"],
    check=True, capture_output=True, text=True,
).stdout
assert "def pagerank" in _r6_src and "def hits" in _r6_src, "bad r6 extraction"
with open("/tmp/graph_r6.py", "w") as _fh:
    _fh.write(_r6_src)
spec = importlib.util.spec_from_file_location("graph_r6", "/tmp/graph_r6.py")
g6 = importlib.util.module_from_spec(spec); spec.loader.exec_module(g6)
from arrow_parquet_logs_spark.operators import graph as g7

spark = get_spark("pr-probe")
sf = "/root/repo/.scale_data/sf10"
li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
edges = (
    li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    .groupBy(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    .agg(F.count(F.lit(1)).cast("long").alias("w"))
)

def run(mod):
    t = time.time()
    out = mod.pagerank(edges, iterations=3, damping_pct=85, scale=10**12)
    n = out.orderBy(F.desc("rank_scaled"), "node").limit(20).count()
    assert n == 20
    return time.time() - t

res = {"r6": [], "r7": []}
for rep in range(2):
    for name, mod in (("r6", g6), ("r7", g7)):
        res[name].append(run(mod))
        print(f"rep{rep} {name}: {res[name][-1]:.1f}s", flush=True)
print({k: round(min(v), 1) for k, v in res.items()})
# values must be identical between forms
a = g6.pagerank(edges, iterations=3).orderBy("node").collect()
b = g7.pagerank(edges, iterations=3).orderBy("node").collect()
assert a == b, "rank drift between forms!"
print("VALUES IDENTICAL", len(a))
