"""Graph queries — integer-exact PageRank over the TPC-H trade graph.

The oracle replays the fixed-point iteration (operators/graph.py spec) in
DuckDB with HUGEINT arithmetic; because both engines evaluate the identical
integer recurrence, ranks match bit-for-bit — no float tolerance anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from arrow_parquet_logs_spark.operators.graph import pagerank
from arrow_parquet_logs_spark.queries.catalog import register
from arrow_parquet_logs_spark.sources.tables import load_table

_SCALE = 10**12
_TOPK = 20


def _pagerank_oracle(iterations: int = 3, damping_pct: int = 85,
                     seeds_sql: str | None = None) -> str:
    """Chained-CTE DuckDB replay of the integer (personalized) PageRank
    recurrence. ``seeds_sql`` selects a one-column ``node`` seed set;
    None replays the global form (seeds = all nodes)."""
    p, q = damping_pct, 100 - damping_pct
    if seeds_sql is None:
        seed_cte, flag = "", "1"
    else:
        seed_cte = f"seeds AS MATERIALIZED ({seeds_sql}),"
        flag = "CASE WHEN n.node IN (SELECT node FROM seeds) THEN 1 ELSE 0 END"
    cte = f"""
    {seed_cte}
    edges AS MATERIALIZED (
        SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
               's' || CAST(l_suppkey AS VARCHAR) AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    nodes AS MATERIALIZED (
        SELECT DISTINCT src AS node FROM edges
        UNION
        SELECT DISTINCT dst FROM edges
    ),
    nn AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS n FROM nodes),
    outd AS MATERIALIZED (SELECT src, CAST(sum(w) AS HUGEINT) AS wout FROM edges GROUP BY src),
    flagged AS MATERIALIZED (
        SELECT n.node, {flag} AS s FROM nodes n
    ),
    nns AS MATERIALIZED (SELECT CAST(sum(s) AS HUGEINT) AS ns FROM flagged),
    r0 AS MATERIALIZED (
        SELECT node, s, s * (CAST({_SCALE} AS HUGEINT) // (SELECT ns FROM nns)) AS r
        FROM flagged
    )"""
    for k in range(1, iterations + 1):
        prev = f"r{k - 1}"
        cte += f""",
    c{k} AS MATERIALIZED (
        SELECT e.dst AS node, sum((p.r * e.w) // o.wout) AS c
        FROM edges e
        JOIN {prev} p ON p.node = e.src
        JOIN outd o ON o.src = e.src
        GROUP BY e.dst
    ),
    dm{k} AS MATERIALIZED (
        SELECT COALESCE(sum(p.r), 0) AS dm
        FROM {prev} p LEFT JOIN outd o ON p.node = o.src
        WHERE o.src IS NULL
    ),
    r{k} AS MATERIALIZED (
        SELECT n.node, n.s,
               n.s * (({q} * CAST({_SCALE} AS HUGEINT)) // (100 * (SELECT ns FROM nns)))
             + ({p} * (COALESCE(c.c, 0)
                       + n.s * ((SELECT dm FROM dm{k}) // (SELECT ns FROM nns)))) // 100 AS r
        FROM flagged n LEFT JOIN c{k} c ON c.node = n.node
    )"""
    return (
        f"WITH {cte}\n"
        f"SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM r{iterations}\n"
        f"ORDER BY rank_scaled DESC, node LIMIT {_TOPK}"
    )


@register(
    "graph_pagerank_trade",
    oracle=_pagerank_oracle(),
    # Not in the bench.py headline set: an iterative 3-round algorithm is
    # job-latency-bound at test SF and would swamp the round-over-round
    # recurring-analytics ledger; its public numbers are the SCALE_r05.json
    # rows (8.05 s sf0.1 → 15.9 s sf1, ratio 1.98 on 10× data).
    tags=("graph", "pagerank", "iterative"),
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→supplier trade graph (an edge per
    (customer, supplier) pair weighted by their lineitem count; suppliers
    are all dangling, exercising the dangling-mass redistribution path).
    Three fixed-point iterations of the integer recurrence — one
    ranks-onto-edges join plus one by-dst aggregation per iteration, the
    Pregel cost shape — then the top 20 nodes under a total order. The
    oracle replays the identical HUGEINT recurrence, so any drift in the
    iteration (a float sneaking in, a mis-ordered floor, dangling mass
    dropped) is a hash mismatch, not a tolerance judgment call."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    ranks = pagerank(edges, iterations=3, damping_pct=85, scale=_SCALE)
    return ranks.orderBy(F.desc("rank_scaled"), "node").limit(_TOPK)


_SEEDS_SQL = (
    "SELECT 'c' || CAST(c_custkey AS VARCHAR) AS node "
    "FROM customer JOIN nation ON c_nationkey = n_nationkey "
    "WHERE n_name = 'NATION_2'"
)


@register(
    "graph_pagerank_personalized",
    oracle=_pagerank_oracle(seeds_sql=_SEEDS_SQL),
    tags=("graph", "pagerank", "personalized", "iterative"),
)
def graph_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank: teleport mass (restart, initial ranks, and
    dangling recycling) concentrates on ONE nation's customers, so the
    top suppliers are the ones trade-proximate to that market segment —
    the random-walk-with-restart relevance every recommender/graph-feature
    pipeline uses. Same integer recurrence as graph_pagerank_trade (the
    global form is literally the seeds=all-nodes special case of this code
    path), same bit-exact HUGEINT oracle replay with a seed-flag column;
    a wrong seed restriction, leaked teleport mass, or drift in the seeded
    dangling recycling is a hash mismatch."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    seeds = (
        cust.join(F.broadcast(nation.where(F.col("n_name") == "NATION_2")),
                  cust["c_nationkey"] == F.col("n_nationkey"))
        .select(F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node"))
    )
    ranks = pagerank(edges, iterations=3, damping_pct=85, scale=_SCALE, seeds=seeds)
    return ranks.orderBy(F.desc("rank_scaled"), "node").limit(_TOPK)


@register(
    "graph_triangle_count",
    oracle="""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT least(l1.l_partkey, l2.l_partkey) AS u,
                      greatest(l1.l_partkey, l2.l_partkey) AS v
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey
    ),
    tri AS MATERIALIZED (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM pairs e1
      JOIN pairs e2 ON e2.u = e1.v
      JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    participants AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    SELECT node, CAST(count(*) AS BIGINT) AS triangles
    FROM participants GROUP BY node
    ORDER BY triangles DESC, node LIMIT 20
    """,
    tags=("graph", "triangles", "self-join"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (operators/graph.py:triangle_counts) over the
    part co-occurrence graph — parts are linked when they appear in the
    same order, the classic "frequently bought together" structure; a
    node's triangle count measures how clustered its neighborhood is
    (the unnormalized numerator of local clustering coefficient, the
    standard cohesion feature for community detection and spam/anomaly
    screens on co-occurrence graphs).

    The Spark side runs the degree-ordered orientation — wedge volume
    O(m^1.5) no matter how skewed the hubs — while the oracle restates
    the count with the id-ordered three-way join SQL can express
    directly; any total order counts each triangle exactly once, so the
    results agree bit-for-bit (and the two orientations are additionally
    pinned equal in tests). Top 20 nodes by triangle participation,
    deterministic tie-break on node id."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )
    from arrow_parquet_logs_spark.operators.graph import triangle_counts

    return (
        triangle_counts(edges)
        .orderBy(F.desc("triangles"), "node")
        .limit(_TOPK)
    )


@register(
    "graph_shortest_hops",
    oracle="""
    WITH RECURSIVE
    und AS MATERIALIZED (
      SELECT 'c' || CAST(o_custkey AS VARCHAR) AS s,
             's' || CAST(l_suppkey AS VARCHAR) AS d
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    edges AS MATERIALIZED (
      SELECT s, d FROM und UNION SELECT d, s FROM und
    ),
    seeds AS MATERIALIZED (
      SELECT 'c' || CAST(c_custkey AS VARCHAR) AS node
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE n_name = 'NATION_2'
    ),
    walk(node, dist, root) AS (
      SELECT node, 0, node FROM seeds
      UNION
      SELECT e.d, w.dist + 1, w.root
      FROM walk w JOIN edges e ON e.s = w.node
      WHERE w.dist < 3
    ),
    best AS (
      SELECT node, min(dist) AS dist FROM walk GROUP BY node
    )
    SELECT b.node, CAST(b.dist AS INTEGER) AS dist, min(w.root) AS root
    FROM best b JOIN walk w ON w.node = b.node AND w.dist = b.dist
    GROUP BY b.node, b.dist
    ORDER BY b.node
    """,
    tags=("graph", "bfs", "shortest-path", "iterative"),
)
def graph_shortest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the undirected customer↔supplier trade graph
    (operators/graph.py:shortest_paths): hop distance from the nearest
    NATION_2 customer, with nearest-seed ATTRIBUTION — every reached node
    reports which seed owns it under the (dist, root) lexicographic-min
    rule. The bipartite structure makes distances interpretable (odd =
    supplier, even = customer) and the 3-hop horizon covers the trade
    neighborhood any market-proximity feature would use.

    The oracle replays the BFS as a recursive CTE carrying (node, dist,
    root) walks and re-derives min-dist + min-root-at-min-dist from the
    full walk set — so the engine's one-root-per-node frontier
    propagation is checked against the exhaustive-walk definition, not
    against itself. Integer distances and min-string roots keep the hash
    gate float-free."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    und = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = und.unionAll(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    seeds = (
        cust.join(
            F.broadcast(nation.where(F.col("n_name") == "NATION_2")),
            cust["c_nationkey"] == F.col("n_nationkey"),
        )
        .select(F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node"))
    )
    from arrow_parquet_logs_spark.operators.graph import shortest_paths

    return shortest_paths(edges, seeds, max_hops=3).orderBy("node")


def _kcore_oracle(k: int, rounds: int = 10) -> str:
    """Chained-CTE replay of synchronous k-core peeling: n_i = nodes of
    n_{i-1} with ≥ k neighbors inside n_{i-1}; peel layer = first round a
    node drops; survivors of round `rounds` are the core (layer 0). The
    engine peels to FIXPOINT, so `rounds` only needs to exceed the real
    peel depth (measured: 3 at sf0.01 and sf1; 10 leaves margin — extra
    rounds are no-ops on a converged set and cost one shrinking join
    each)."""
    cte = """
    me0 AS MATERIALIZED (
      SELECT DISTINCT least('c' || CAST(o_custkey AS VARCHAR),
                            's' || CAST(l_suppkey AS VARCHAR)) AS u,
                      greatest('c' || CAST(o_custkey AS VARCHAR),
                               's' || CAST(l_suppkey AS VARCHAR)) AS v
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    me AS MATERIALIZED (
      SELECT u, v FROM me0 UNION ALL SELECT v, u FROM me0
    ),
    n0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM me)"""
    for i in range(1, rounds + 1):
        prev = f"n{i - 1}"
        cte += f""",
    n{i} AS MATERIALIZED (
      SELECT me.u AS node FROM me
      JOIN {prev} a ON me.u = a.node
      JOIN {prev} b ON me.v = b.node
      GROUP BY me.u HAVING count(*) >= {k}
    ),
    p{i} AS MATERIALIZED (
      SELECT a.node, {i} AS peel_round FROM {prev} a
      LEFT JOIN n{i} s ON s.node = a.node WHERE s.node IS NULL
    )"""
    peeled = "\n      UNION ALL ".join(
        f"SELECT node, peel_round FROM p{i}" for i in range(1, rounds + 1)
    )
    return (
        f"WITH {cte}\n"
        f"SELECT node, CAST(peel_round AS INTEGER) AS peel_round FROM (\n"
        f"      {peeled}\n"
        f"      UNION ALL SELECT node, 0 FROM n{rounds}\n"
        f") ORDER BY node"
    )


@register(
    "graph_kcore_trade",
    oracle=_kcore_oracle(k=60),
    tags=("graph", "k-core", "iterative", "cohesion"),
)
def graph_kcore_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition of the trade graph at k=60
    (operators/graph.py:k_core_peel): every node labeled with its peel
    layer — the cohesion coordinate community/anomaly pipelines use
    (deep layers = densely mutually-connected trade neighborhoods;
    layer 1 = periphery). Peeling is genuinely ITERATIVE (a node's fate
    depends on whether its neighbors survive the previous round — no
    single-pass form exists), so this pins the engine's fixpoint loop
    against a 10-round chained-CTE replay: a node peeled one round
    early, or a survivor mislabeled, breaks the hash. At this k the
    graph peels in 3 synchronous rounds at sf0.01 AND sf1 (probed), so
    the 10-round oracle has margin; the engine iterates to fixpoint
    regardless of depth."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    from arrow_parquet_logs_spark.operators.graph import k_core_peel

    return k_core_peel(edges, k=60).orderBy("node")


def _cheapest_oracle(max_hops: int = 3) -> str:
    """Chained-CTE replay of the synchronous Bellman-Ford recurrence:
    d_h = per-node min over d_{h-1} ∪ (d_{h-1} relaxed across one edge) —
    node-sized per round, so the oracle never materializes the weighted
    walk explosion a recursive CTE would."""
    cte = """
    und AS MATERIALIZED (
      SELECT 'c' || CAST(o_custkey AS VARCHAR) AS s,
             's' || CAST(l_suppkey AS VARCHAR) AS d,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    e AS MATERIALIZED (
      SELECT s, d, w FROM und UNION ALL SELECT d, s, w FROM und
    ),
    d0 AS MATERIALIZED (
      SELECT 'c' || CAST(c_custkey AS VARCHAR) AS node, CAST(0 AS BIGINT) AS dist
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE n_name = 'NATION_2'
    )"""
    for h in range(1, max_hops + 1):
        prev = f"d{h - 1}"
        cte += f""",
    d{h} AS MATERIALIZED (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM {prev}
        UNION ALL
        SELECT e.d AS node, p.dist + e.w AS dist
        FROM {prev} p JOIN e ON e.s = p.node
      ) GROUP BY node
    )"""
    return (
        f"WITH {cte}\n"
        f"SELECT node, dist FROM d{max_hops} ORDER BY node"
    )


@register(
    "graph_cheapest_hops",
    oracle=_cheapest_oracle(3),
    tags=("graph", "bellman-ford", "weighted", "shortest-path", "iterative"),
)
def graph_cheapest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted cheapest paths within 3 hops of NATION_2's customers over
    the undirected trade graph, edge cost = that pair's lineitem count
    (operators/graph.py:cheapest_paths — the Bellman-Ford recurrence run
    synchronously). Complements `graph_shortest_hops`: hop-BFS answers
    "how FAR", this answers "how CHEAP", and unlike hop distance the
    weighted optimum routinely takes MORE hops than the direct edge — a
    relaxation bug that only re-checks settled nodes once would pass BFS
    and fail here. Integer weights keep every distance exact, and the
    oracle replays the identical recurrence as chained per-round min
    CTEs (node-sized — never the weighted-walk explosion a recursive
    CTE would build)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    und = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    edges = und.unionAll(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    seeds = (
        cust.join(
            F.broadcast(nation.where(F.col("n_name") == "NATION_2")),
            cust["c_nationkey"] == F.col("n_nationkey"),
        )
        .select(F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node"))
    )
    from arrow_parquet_logs_spark.operators.graph import cheapest_paths

    return cheapest_paths(edges, seeds, max_hops=3).orderBy("node")


def _hits_oracle(iterations: int = 2) -> str:
    """Chained-CTE HUGEINT replay of the integer HITS recurrence
    (operators/graph.py:hits): sum-normalized hubs & authorities, DIV
    truncation identical to Spark's DECIMAL(38,0) DIV."""
    cte = f"""
    edges AS MATERIALIZED (
        SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
               's' || CAST(l_suppkey AS VARCHAR) AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    nodes AS MATERIALIZED (
        SELECT DISTINCT src AS node FROM edges
        UNION
        SELECT DISTINCT dst FROM edges
    ),
    h0 AS MATERIALIZED (SELECT node, CAST({_SCALE} AS HUGEINT) AS s FROM nodes)"""
    for k in range(1, iterations + 1):
        prev = f"h{k - 1}"
        cte += f""",
    ar{k} AS MATERIALIZED (
        SELECT e.dst AS node, sum(CAST(p.s AS HUGEINT) * e.w) AS raw
        FROM edges e JOIN {prev} p ON p.node = e.src GROUP BY e.dst
    ),
    a{k} AS MATERIALIZED (
        SELECT n.node,
               (COALESCE(c.raw, 0) * CAST({_SCALE} AS HUGEINT))
                 // (SELECT sum(raw) FROM ar{k}) AS s
        FROM nodes n LEFT JOIN ar{k} c ON c.node = n.node
    ),
    hr{k} AS MATERIALIZED (
        SELECT e.src AS node, sum(CAST(p.s AS HUGEINT) * e.w) AS raw
        FROM edges e JOIN a{k} p ON p.node = e.dst GROUP BY e.src
    ),
    h{k} AS MATERIALIZED (
        SELECT n.node,
               (COALESCE(c.raw, 0) * CAST({_SCALE} AS HUGEINT))
                 // (SELECT sum(raw) FROM hr{k}) AS s
        FROM nodes n LEFT JOIN hr{k} c ON c.node = n.node
    )"""
    return (
        f"WITH {cte}\n"
        f"SELECT h.node, CAST(h.s AS BIGINT) AS hub_scaled,\n"
        f"       CAST(a.s AS BIGINT) AS auth_scaled\n"
        f"FROM h{iterations} h JOIN a{iterations} a ON a.node = h.node\n"
        f"ORDER BY hub_scaled DESC, auth_scaled DESC, h.node LIMIT 25"
    )


@register(
    "graph_hits_trade",
    oracle=_hits_oracle(),
    tags=("graph", "hits", "hubs-authorities", "iterative"),
)
def graph_hits_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the customer→supplier trade graph
    (operators/graph.py:hits) — the link-analysis complement to PageRank:
    on this bipartite graph a customer's HUB score concentrates on buyers
    whose spend flows to high-authority suppliers, and a supplier's
    AUTHORITY on those bought by high-hub customers — the
    mutually-recursive importance prior recommendation/curation pipelines
    use. Two sum-normalized integer iterations; the oracle replays the
    identical HUGEINT recurrence, so a float sneaking into either
    half-step, a dropped zero-degree node, or a mis-ordered floor breaks
    the hash bit-for-bit. Top 25 under a total order."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    from arrow_parquet_logs_spark.operators.graph import hits

    scores = hits(edges, iterations=2, scale=_SCALE)
    return scores.orderBy(
        F.desc("hub_scaled"), F.desc("auth_scaled"), "node"
    ).limit(25)


def _lpa_oracle(rounds: int = 3) -> str:
    """Chained-CTE replay of synchronous weighted label propagation: per
    round, weighted neighbor votes then row_number argmax with
    (votes DESC, label ASC) — the same total order as the operator's
    min(struct(-votes, label))."""
    cte = """
    und AS MATERIALIZED (
        SELECT 'c' || CAST(o_custkey AS VARCHAR) AS a,
               's' || CAST(l_suppkey AS VARCHAR) AS b,
               CAST(count(*) AS BIGINT) AS w
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    me AS MATERIALIZED (
        SELECT a AS u, b AS v, w FROM und
        UNION ALL SELECT b, a, w FROM und
    ),
    l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM me)"""
    for k in range(1, rounds + 1):
        prev = f"l{k - 1}"
        cte += f""",
    v{k} AS MATERIALIZED (
        SELECT me.u, p.label, sum(me.w) AS cnt
        FROM me JOIN {prev} p ON p.node = me.v
        GROUP BY me.u, p.label
    ),
    n{k} AS MATERIALIZED (
        SELECT u AS node, label FROM (
            SELECT u, label,
                   row_number() OVER (PARTITION BY u ORDER BY cnt DESC, label) AS rn
            FROM v{k}
        ) WHERE rn = 1
    ),
    l{k} AS MATERIALIZED (
        SELECT p.node, COALESCE(n.label, p.label) AS label
        FROM {prev} p LEFT JOIN n{k} n ON n.node = p.node
    )"""
    return (
        f"WITH {cte}\n"
        f"SELECT node, label FROM l{rounds} ORDER BY node"
    )


@register(
    "graph_label_propagation",
    oracle=_lpa_oracle(),
    tags=("graph", "community", "label-propagation", "iterative"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous weighted label propagation over
    the undirected trade graph (operators/graph.py:label_propagation) —
    the massive-graph community algorithm (GraphFrames parity): three
    deterministic rounds of take-the-heaviest-neighbor-label with a
    (votes DESC, label ASC) tie-break. Every node's final label is pinned
    against a chained-CTE row_number replay — a mis-ordered tie-break, a
    dropped isolated node, or an asynchronous update (the classic LPA
    implementation hazard) breaks the hash. Labels after fixed rounds are
    the contract; the operator docstring records the bipartite
    oscillation caveat this shares with GraphFrames."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    from arrow_parquet_logs_spark.operators.graph import label_propagation

    return label_propagation(edges, rounds=3, weight="w").orderBy("node")


_H64D = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"


@register(
    "graph_doc_cycles",
    oracle=f"""
    WITH RECURSIVE idx AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY doc_id) - 1 AS i,
               count(*) OVER () AS n
        FROM documents
    ),
    succ AS (
        SELECT a.doc_id AS v, b.doc_id AS s
        FROM idx a JOIN idx b
          ON b.i = {_H64D.format(x="concat('succ:', CAST(a.doc_id AS VARCHAR))")} % a.n
    ),
    walk(src, cur) AS (
        SELECT v, s FROM succ
        UNION
        SELECT w.src, sc.s FROM walk w JOIN succ sc ON sc.v = w.cur
    ),
    cyc AS (SELECT DISTINCT src AS v FROM walk WHERE cur = src),
    lab AS (
        SELECT w.src AS v, min(w.cur) AS scc
        FROM walk w JOIN cyc c ON c.v = w.src
        GROUP BY w.src
    )
    SELECT scc, CAST(count(*) AS BIGINT) AS cycle_len,
           min(v) AS first_member, max(v) AS last_member
    FROM lab
    GROUP BY scc
    ORDER BY cycle_len DESC, scc
    LIMIT 25
    """,
    tags=("graph", "scc", "cycles"),
)
def graph_doc_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cycle decomposition (= SCC) of a functional "superseded-by" graph
    over the corpus: every document points at one successor (derived from
    the portable hash of its id — deterministic in both engines), and the
    query reports each cycle with its length — the structure a dedup
    keep-pointer or alias chain must NOT contain at publish time.

    Spark side: operators/graph.py:functional_scc — successor DOUBLING
    with a min-label semigroup, O(log n) self-joins instead of
    O(path-length) propagation rounds. Oracle: a recursive-CTE transitive
    closure + mutual-reachability labeling — the definitional form. The
    dense index that turns hashes into graph edges avoids a global
    single-partition window: range-partition by doc_id, rank within each
    bucket, add broadcast cumulative bucket offsets (linkage.py pattern).
    """
    from arrow_parquet_logs_spark.operators.graph import functional_scc

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    nparts = max(1, min(32, n // 1000 + 1))
    rr = docs.repartitionByRange(nparts, "doc_id").select(
        "doc_id", F.spark_partition_id().alias("_b")
    )
    counts = rr.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    from pyspark.sql import Window

    offsets = counts.select(
        "_b",
        (F.sum("_n").over(Window.orderBy("_b")) - F.col("_n")).alias("_off"),
    )
    wb = Window.partitionBy("_b").orderBy("doc_id")
    idx = (
        rr.join(F.broadcast(offsets), "_b")
        .select(
            "doc_id",
            (F.row_number().over(wb) - 1 + F.col("_off")).alias("i"),
        )
    )
    from arrow_parquet_logs_spark.functions.hashing import hash64

    tgt = idx.select(
        F.col("doc_id").alias("v"),
        (hash64(F.concat(F.lit("succ:"), F.col("doc_id").cast("string"))) % F.lit(n)).alias("ti"),
    )
    succ = tgt.join(idx.select(F.col("i").alias("ti"), F.col("doc_id").alias("s")), "ti")
    scc = functional_scc(succ.select("v", "s"), node="v", nxt="s")
    return (
        scc.groupBy("scc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cycle_len"),
            F.min("v").alias("first_member"),
            F.max("v").alias("last_member"),
        )
        .orderBy(F.desc("cycle_len"), "scc")
        .limit(25)
    )
