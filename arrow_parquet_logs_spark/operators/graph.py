"""Graph algorithms over edge DataFrames — fixed-point integer PageRank.

Complements the connected-components family (operators/dedup.py): where
components answer "which docs are transitively duplicates", PageRank ranks
nodes by link authority — the standard importance prior for crawl-derived
training corpora (the original use case) and for entity/seller graphs.

Determinism contract (catalog.py rules): floating-point PageRank sums are
partition-order-dependent in their last ulps, so two engines — or the same
engine re-planned by AQE — can disagree. This implementation defines the
iteration ENTIRELY over non-negative integers (scaled fixed-point, floor
division), so every rank is bit-exact: reproducible across Spark and the
DuckDB oracle, across partition counts, across cluster sizes. The spec:

    R0(v)  = SCALE div N
    C(v)   = Σ_{u→v} (R(u)·w(u,v)) div W(u)        [W(u) = Σ out-weight]
    DM     = Σ_{dangling u} R(u)
    R'(v)  = ((100-p)·SCALE) div (100·N) + (p·(C(v) + DM div N)) div 100

with p the damping percentage (85 ≈ the canonical 0.85). Products are
evaluated as DECIMAL(38,0) before the integral division, so a 10^12 scale
survives multi-million edge weights without overflow (Spark's `DIV` on
decimals and DuckDB's `//` on HUGEINT truncate identically for non-negative
operands — pinned by the oracle).

Scale shape (the 100 TB question): per iteration, exactly one shuffle-join
of ranks onto the (out-degree-annotated, reusable) edge list keyed by src
and one aggregation keyed by dst — the Pregel/GraphX cost model. The two
scalars (N, dangling mass) travel as broadcast one-row frames, never a
collect. k iterations = k join+agg rounds.

Loop hygiene (every iterative operator here): each generation is cut from
its lineage with ``localCheckpoint(eager=True)`` — the same discipline as
``dedup.connected_components``. ``persist()`` alone short-circuits
*execution* but not the *logical plan*: a round that references its
predecessor twice doubles the plan tree per round, and by round ~6
Catalyst's plan stringification (re-run per AQE stage) dominates runtime
and can OOM the driver heap before any data moves (measured: the k=60
peel at sf0.1 went from driver-OOM to 13 s on this change alone). GraphX
solves the identical problem with periodic RDD checkpointing; eager local
checkpoints are the DataFrame equivalent, and results are unaffected —
every loop here is integer-exact and partition-invariant by construction.

The reference has no graph surface at all; this is §2.11 pipeline breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    broadcast_nodes_cap: int = 5_000_000,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Integer-exact PageRank over ``edges(src, dst, w)``.

    ``w`` is a positive integer edge weight (collapse multi-edges with a
    count/sum upstream). Returns ``(node, rank_scaled bigint)`` where
    ``rank_scaled`` ≈ rank·scale under the fixed-point spec above.

    ``seeds`` (optional, one ``node`` column) switches to PERSONALIZED
    PageRank: teleport probability — initial mass, the (1−d) restart, and
    dangling-mass recycling — concentrates uniformly on the seed set
    instead of all nodes (seeds outside the graph are ignored). The global
    form is exactly the seeds = all-nodes special case of the same integer
    recurrence, so one code path serves both:

        R0(v)  = [v∈S]·(SCALE div |S|)
        R'(v)  = [v∈S]·((100-p)·SCALE div (100·|S|))
               + (p·(C(v) + [v∈S]·(DM div |S|))) div 100

    Strategy is size-gated like ``connected_components``: the rank vector
    is 16 bytes/node, so up to ``broadcast_nodes_cap`` nodes (default 5M ≈
    80 MB) each iteration BROADCASTS ranks onto the edge list — zero edge
    shuffles per iteration, only the by-dst contribution aggregation moves
    data (measured 3x on the trade graph, where per-iteration shuffle
    joins of a 587k-edge list against 1,600 ranks were pure overhead).
    Above the cap it falls back to the shuffle join keyed on src — the
    plan that scales to billions of nodes. Results are bit-identical
    either way (integer spec; pinned by the partition-invariance test).
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")

    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outd = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wout")).persist()
    # Out-degree rides with the edge list once; every iteration reuses it —
    # both persist for the loop (without the cache each iteration would
    # recompute the upstream edge build: measured 3x redundant work).
    # The cache is HASH-PARTITIONED BY src: in the non-broadcast regime
    # every iteration's ranks⋈edges join then reuses this partitioning —
    # the Exchange lands on the node-sized rank frame only, never on the
    # edge list (the Pregel-on-Spark partitioning reuse; at 100 TB the
    # edge re-shuffle per iteration IS the job).
    shufn = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_w = (
        edges.join(outd, "src")
        .select("src", "dst", "w", "wout")
        .repartition(shufn, "src")
        .persist()
    )

    # The node frame feeds every iteration's rebuild AND the n/r0 jobs —
    # uncached, its union+distinct shuffle re-runs once per iteration
    # (measured ~half the per-iteration cost on the trade graph).
    nodes = nodes.persist()
    n_df = nodes.agg(F.count(F.lit(1)).alias("n"))  # one row, broadcast
    n_val = n_df.collect()[0]["n"]  # bounded: one long
    small = n_val <= broadcast_nodes_cap
    if seeds is None:
        # global PR == personalized with S = all nodes; one code path
        flagged = nodes.select("node", F.lit(1).alias("s"))
        ns_df = n_df.select(F.col("n").alias("ns"))
    else:
        sd = seeds.select("node").distinct()
        flagged = nodes.join(
            (F.broadcast(sd) if small else sd).select("node", F.lit(1).alias("s")),
            "node",
            "left",
        ).select("node", F.coalesce(F.col("s"), F.lit(0)).alias("s"))
        ns_df = flagged.agg(F.sum("s").cast("long").alias("ns"))
        if ns_df.collect()[0]["ns"] == 0:  # bounded: one long
            raise ValueError("no seed appears in the graph")
    # the DANGLING flag is static — resolve it ONCE into the node state
    # instead of an (outd-sized, possibly broadcast) anti-join per
    # iteration: the per-round dangling mass becomes a plain conditional
    # sum over the checkpointed rank frame, zero joins.
    base = (
        flagged.join(
            outd.select(F.col("src").alias("node"), F.lit(0).alias("dg")),
            "node",
            "left",
        )
        .select("node", "s", F.coalesce(F.col("dg"), F.lit(1)).alias("dg"))
        .join(F.broadcast(n_df))
        .join(F.broadcast(ns_df))
    ).persist()  # (node, s, dg, n, ns)
    # The dangling mass Σ_{dg} R(u) is a scalar of the generation being
    # checkpointed — it RIDES the checkpoint's own job as an Observation
    # metric (the k-core/BFS exit-signal pattern) and feeds the NEXT round
    # as a plain literal. The r6 form ran a separate scan job + 1-row
    # broadcast per round to recompute it; measured at sf10 that job +
    # its broadcast exchange were ~40% of the per-iteration fixed cost.
    from pyspark.sql import Observation

    _dm_metric = (
        F.coalesce(F.sum(F.when(F.col("dg") == 1, F.col("r"))), F.lit(0))
        .cast("long")
        .alias("dm")
    )
    obs0 = Observation("pr_dm_init")
    ranks = (
        base.select(
            "node", "s", "dg", "n", "ns",
            F.expr(f"s * (CAST({scale} AS BIGINT) DIV ns)").alias("r"),
        )
        .observe(obs0, _dm_metric)
        .localCheckpoint(eager=True)
    )
    dm_val = int(obs0.get["dm"] or 0)
    p, q = damping_pct, 100 - damping_pct

    for it in range(iterations):
        rank_side = ranks.select(F.col("node").alias("src"), "r")
        contrib = (
            edges_w.join(F.broadcast(rank_side) if small else rank_side, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("CAST((CAST(r AS DECIMAL(38,0)) * w) DIV wout AS BIGINT)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        obs = Observation(f"pr_dm_{it}")
        nxt = (
            # contrib is NEVER broadcast: its groupBy("node") output is
            # already hash-partitioned on the join key, so the join with
            # the node-partitioned base adds no Exchange — broadcasting a
            # node-sized aggregate would route it through the driver for
            # nothing, once per iteration.
            base.join(contrib, "node", "left")
            .select(
                "node",
                "s",
                "dg",
                "n",
                "ns",
                F.expr(
                    f"s * (({q} * CAST({scale} AS BIGINT)) DIV (100 * ns))"
                    f" + ({p} * (coalesce(c, CAST(0 AS BIGINT))"
                    f"     + s * (CAST({dm_val} AS BIGINT) DIV ns))) DIV 100"
                ).alias("r"),
            )
            # next round's dangling mass observed on THIS materialization
            .observe(obs, _dm_metric)
            # Eager local checkpoint: materializes this generation (the old
            # persist+count) AND cuts the plan at the loop boundary — each
            # round references `ranks` twice (contrib join, next-round
            # plan), so an uncut plan doubles per iteration. Checkpoint
            # blocks free on GC via the ContextCleaner.
            .localCheckpoint(eager=True)
        )
        dm_val = int(obs.get["dm"] or 0)
        ranks = nxt

    # The final generation is materialized by its checkpoint; loop-scoped
    # caches can drop now. The returned frame reads the checkpointed RDD
    # directly.
    edges_w.unpersist()
    outd.unpersist()
    nodes.unpersist()
    base.unpersist()
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def hits(
    edges: DataFrame,
    iterations: int = 2,
    scale: int = 10**12,
    broadcast_nodes_cap: int = 5_000_000,
) -> DataFrame:
    """Integer-exact HITS (Kleinberg's hubs & authorities) over
    ``edges(src, dst, w)`` with positive integer weights. Returns
    ``(node, hub_scaled bigint, auth_scaled bigint)``.

    The classic recurrence with L1 (sum) normalization instead of L2 —
    sum normalization keeps every quantity a non-negative integer under
    the same fixed-point discipline as :func:`pagerank`, so scores are
    bit-exact across engines and partitionings (module determinism
    contract; L2 would force a square root and floats):

        h0(v)    = SCALE
        araw(v)  = Σ_{u→v} h(u)·w(u,v)     a(v) = (araw(v)·SCALE) div Σaraw
        hraw(v)  = Σ_{v→w} a(w)·w(v,w)     h(v) = (hraw(v)·SCALE) div Σhraw

    Products run as DECIMAL(38,0): with SCALE 10¹² and ≤10⁶-weight
    edges, Σaraw stays under 10³⁷ — headroom pinned by the HUGEINT
    oracle replay. A node with no in-edges has authority exactly 0, no
    out-edges hub exactly 0 (dangling nodes don't need the mass
    recycling PageRank does — HITS renormalizes every half-step).

    Cost shape per iteration: two score-onto-edges joins + two keyed
    aggregations (the Pregel shape, twice). Each half-step's raw
    contribution frame is eagerly checkpointed with its normalizing sum
    riding the SAME materialization as an ``Observation`` metric (the
    pagerank dangling-mass pattern) — the r6 form aggregated the raw
    frame separately for the 1-row broadcast and then re-executed the
    whole edge-sized contribution join inside the normalized
    generation's checkpoint, i.e. the dominant join ran TWICE per
    half-step. Requires a non-empty edge list (the normalizing sums are
    its invariant)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    from pyspark.sql import Observation

    e = edges.select("src", "dst", F.col("w").cast("long").alias("w")).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_val = nodes.count()  # bounded: one long; also materializes the cache
    small = n_val <= broadcast_nodes_cap
    bc = F.broadcast if small else (lambda df: df)
    h = nodes.select(
        "node", F.lit(scale).cast("long").alias("s")
    ).localCheckpoint(eager=True)
    a = None

    def half_step(scores: DataFrame, join_key: str, out_key: str, tag: str) -> DataFrame:
        # contribution frame materializes ONCE; its L1 total rides the
        # checkpoint job as an observed metric and normalization reads it
        # back as a literal (exact: DECIMAL(38,0) scale-0 → Python int)
        obs = Observation(tag)
        raw = (
            e.join(bc(scores.select(F.col("node").alias(join_key), "s")), join_key)
            .groupBy(out_key)
            .agg(F.expr("sum(CAST(s AS DECIMAL(38,0)) * w)").alias("raw"))
            .observe(obs, F.sum("raw").alias("total"))
            .localCheckpoint(eager=True)
        )
        total_raw = obs.get["total"]
        if total_raw is None:
            # a NULL observed sum means either the DECIMAL(38,0) contribution
            # sum overflowed (non-ANSI NULL-on-overflow) or every node
            # contributed zero (degenerate all-zero scores / empty edge set);
            # dividing by it would crash with an opaque TypeError — fail loud
            # and name the condition instead (ADVICE r7)
            raise ValueError(
                f"hits_scores {tag}: normalization total is NULL — "
                "DECIMAL(38,0) contribution-sum overflow or an empty/all-zero "
                "contribution frame; the graph cannot be normalized"
            )
        total = int(total_raw)
        return (
            nodes.join(bc(raw.select(F.col(out_key).alias("node"), "raw")), "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST((coalesce(raw, CAST(0 AS DECIMAL(38,0))) * {scale})"
                    f" DIV CAST({total} AS DECIMAL(38,0)) AS BIGINT)"
                ).alias("s"),
            )
            .localCheckpoint(eager=True)
        )

    for it in range(iterations):
        a = half_step(h, "src", "dst", f"hits_a{it}")
        h = half_step(a, "dst", "src", f"hits_h{it}")
    out = (
        h.select("node", F.col("s").alias("hub_scaled"))
        .join(a.select("node", F.col("s").alias("auth_scaled")), "node")
    )
    e.unpersist()
    nodes.unpersist()
    return out


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst",
                    degree_ordered: bool = True) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph.

    Input is any edge list — direction, duplicates, and self-loops are
    normalized away first (least/greatest + distinct). Algorithm is the
    MapReduce-classic oriented wedge join (Suri–Vassilvitskii): orient
    every undirected edge from its ≺-smaller endpoint to its ≺-larger
    one; wedges are pairs of out-edges at a common source; a wedge
    (v, w) closes a triangle iff the oriented edge v→w exists — so every
    triangle is generated exactly once, at its ≺-minimal vertex.

    ``degree_ordered=True`` (production default) uses ≺ = (degree, id):
    out-degrees are then bounded by O(√m), capping total wedge work at
    O(m^1.5) regardless of skew — a celebrity node of degree 10⁶ fans out
    ZERO wedges because every edge orients *into* it. On top of the
    orientation, wedges are never materialized as shuffle rows: each
    vertex's successor set ships as ONE packed array per incident edge and
    the triangle test is a per-edge array intersection, so the only
    explode is the intersection itself — exactly the triangle list. (The
    first form of this operator shuffled every wedge as a row; the sf1
    empirical probe measured ~7.5·10⁸ wedge rows on the 12M-edge
    co-occurrence graph and OOMed small drivers — see SCALING.md.)
    ``False`` uses ≺ = id with the literal wedge-join plan a SQL oracle
    can restate directly; the two regimes count identical triangles (any
    total order works), pinned by tests.

    Returns ``(node, triangles)`` for nodes on ≥1 triangle. Shuffle plan
    (degree path): one adjacency aggregation + two array-carrying joins
    + one count aggregation — no collect, no iteration.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = (
        e.where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    if degree_ordered:
        deg = (
            und.select(F.col("u").alias("n"))
            .unionAll(und.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        g = (
            und.join(deg.select(F.col("n").alias("u"), F.col("deg").alias("du")), "u")
            .join(deg.select(F.col("n").alias("v"), F.col("deg").alias("dv")), "v")
        )
        fwd = (
            F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
            < F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
        )
        oriented = g.select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("d"),
        )
        # Adjacency-intersection form: instead of materializing every wedge
        # as a shuffle row (Σ C(outdeg,2) rows — the 10×-probe bottleneck:
        # ~7.5·10⁸ rows on the sf1 co-occurrence graph), ship each vertex's
        # successor SET once per incident edge as a packed array and
        # intersect per edge. Same asymptotic element volume, but as
        # 8-byte array entries in m rows instead of per-wedge shuffle rows
        # + a second m-row closing join — and the only explode is the
        # intersection itself, which is exactly the triangle list.
        adj = oriented.groupBy("s").agg(F.collect_list("d").alias("nb"))
        e2 = (
            oriented
            .join(adj.select(F.col("s"), F.col("nb").alias("nu")), "s")
            .join(adj.select(F.col("s").alias("d"), F.col("nb").alias("nv")), "d")
            .select("s", "d", F.array_intersect("nu", "nv").alias("common"))
            .where(F.size("common") > 0)
        )
        contrib = (
            e2.select(F.col("s").alias("node"), F.size("common").cast("long").alias("c"))
            .unionAll(e2.select(F.col("d").alias("node"),
                                F.size("common").cast("long").alias("c")))
            .unionAll(e2.select(F.explode("common").alias("node"),
                                F.lit(1).cast("long").alias("c")))
        )
        return (
            contrib.groupBy("node").agg(F.sum("c").alias("triangles"))
        )
    else:
        oriented = und  # least/greatest already oriented by id
        w = (
            oriented.alias("e1")
            .join(oriented.alias("e2"), on=F.col("e1.u") == F.col("e2.u"))
            .where(F.col("e1.v") < F.col("e2.v"))
            .select(
                F.col("e1.u").alias("x"),
                F.col("e1.v").alias("y"),
                F.col("e2.v").alias("z"),
            )
        )
        closing = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    tri = w.join(closing, on=["y", "z"])
    nodes = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any seed, plus
    NEAREST-SEED ATTRIBUTION — ``(node, dist, root)`` where ``root`` is
    the lexicographically smallest seed among those reaching ``node`` at
    its minimum distance. The attribution form is what pipelines actually
    want from BFS: assign every entity to its closest exemplar/region/
    cluster representative, not just report a number.

    Level-synchronous frontier expansion (the Pregel/GraphX BFS): per
    round, one join of the frontier onto the edge list keyed on the
    source endpoint, one min-root aggregation keyed on the destination,
    and one anti-join against the settled set; the loop exits early the
    round the frontier empties (the round count — bounded by
    ``max_hops`` — is the only driver-side signal). Every predecessor on
    a shortest path settles exactly one level earlier, so propagating
    each settled node's single (dist, root) is lossless: the propagated
    min equals the min over ALL shortest walks (the recursive-CTE oracle
    form), not just over remembered ones.

    Determinism: distances are integers and roots resolve by ``min`` —
    bit-stable under any partitioning, no floats anywhere (catalog.py
    contract). Scale shape: state is one row per reached node (16-ish
    bytes + root id); per-round shuffle volume is frontier-adjacent
    edges, never the settled set; each frontier generation is cut from
    its lineage with an eager local checkpoint (module docstring), so
    the settled set is a flat union of checkpointed leaves — plan size
    linear in rounds, never exponential.

    ``edges`` is treated as DIRECTED — union the reversed frame upstream
    for undirected reachability. Seeds absent from the graph still settle
    at distance 0 (they are their own nearest seed).
    """
    from pyspark.sql import Observation

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct().persist()
    settled = (
        sources.select(F.col("node"))
        .distinct()
        .select("node", F.lit(0).alias("dist"), F.col("node").alias("root"))
        .localCheckpoint(eager=True)
    )
    frontier = settled
    for hop in range(1, max_hops + 1):
        grown = (
            frontier.join(e, frontier["node"] == e["s"])
            .select(F.col("d").alias("node"), F.col("root"))
        )
        # Eager checkpoint cuts the round's lineage (module docstring);
        # `settled` stays a flat union of checkpointed generations. The
        # frontier-exhausted signal rides the SAME action as an observed
        # row count — no separate take(1) job per hop.
        obs = Observation(f"bfs_h{hop}")
        new = (
            grown.groupBy("node")
            .agg(F.min("root").alias("root"))
            .join(settled.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).alias("dist"), "root")
            .observe(obs, F.count(F.lit(1)).alias("n_new"))
            .localCheckpoint(eager=True)
        )
        if not obs.get["n_new"]:  # frontier exhausted — reachable set closed
            break
        settled = settled.unionAll(new)
        frontier = new
    e.unpersist()
    return settled


def k_core_peel(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly remove nodes
    with fewer than ``k`` surviving neighbors until the graph stabilizes.
    Returns ``(node, peel_round int)`` — the round (1-based) a node fell
    out, or 0 for members of the k-core. The peel layer is the standard
    cohesion coordinate (spam rings and dense communities live deep; the
    round-1 shell is the periphery), and unlike a raw degree cut it is
    CLOSED under its own definition: every core member keeps ≥ k
    neighbors *inside the core*.

    Per round: one degree aggregation over the surviving induced
    subgraph (edges semi-joined to the alive set on both endpoints) and
    one anti-join to split peeled from survivors — the Pregel cost
    shape, rounds bounded by the peel depth (typically a handful: each
    round must remove at least one node or the loop exits). Each
    generation is cut from its lineage with an eager local checkpoint
    (module docstring) — this loop references ``alive`` three times per
    round (both degree semi-joins + the split), the worst plan-growth
    shape in the family: with persist-only hygiene the k=60 sf0.1 peel
    (6 rounds) spent minutes in Catalyst plan stringification and OOMed
    the driver; checkpointed it runs in seconds. Determinism: degrees
    are integers and rounds are synchronous, so the peel layer of every
    node is partition-invariant by construction.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = (
        e.where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    mirrored = und.unionAll(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    alive = (
        mirrored.select(F.col("u").alias("node")).distinct()
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    peeled_frames: list[DataFrame] = []
    for r in range(1, max_rounds + 1):
        deg = (
            mirrored.join(alive.select(F.col("node").alias("u")), "u")
            .join(alive.select(F.col("node").alias("v")), "v")
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        # ONE checkpoint per round: the alive set annotated with its
        # survive/peel flag. `keep` and `dropped` are plain filters over
        # the checkpointed leaf — referenced three times next round, the
        # plan stays flat, and the old second (dropped-sized) checkpoint
        # job disappears. The fixpoint signal RIDES THE SAME ACTION as an
        # observed metric (Observation fires on the eager checkpoint's
        # internal job), so the round costs exactly one job — the r5 form
        # paid three (keep checkpoint, dropped checkpoint, take(1)).
        obs = Observation(f"kcore_r{r}")
        ann = (
            alive.join(deg.select(F.col("u").alias("node"), "deg"), "node", "left")
            .select(
                "node",
                (F.coalesce(F.col("deg"), F.lit(0)) >= k).alias("in_core"),
            )
            .observe(obs, F.sum(F.when(~F.col("in_core"), 1).otherwise(0)).alias("n_peeled"))
            .localCheckpoint(eager=True)
        )
        n_peeled = obs.get["n_peeled"] or 0
        if n_peeled == 0:  # fixpoint: the k-core
            alive = ann.select("node")
            break
        peeled_frames.append(
            ann.where(~F.col("in_core")).select(
                "node", F.lit(r).cast("int").alias("peel_round")
            )
        )
        alive = ann.where(F.col("in_core")).select("node")
    core = alive.select("node", F.lit(0).cast("int").alias("peel_round"))
    out = core
    for f in peeled_frames:
        out = out.unionByName(f)
    mirrored.unpersist()
    return out


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Synchronous label propagation community detection (the GraphFrames
    ``labelPropagation`` semantics, made deterministic): labels start as
    node ids; each round every node adopts the label with the largest
    total (edge-weighted) neighbor vote, ties broken by the SMALLEST
    label. Returns ``(node, label)`` after exactly ``rounds`` synchronous
    rounds — the fixed round count is part of the spec (like
    :func:`cheapest_paths`' hop bound): pure synchronous LPA may oscillate
    on bipartite structure rather than converge, so "the state after R
    rounds" is the well-defined, replayable contract (GraphFrames
    documents the same caveat).

    Determinism: votes are integer weight sums and the argmax resolves
    through ``min(struct(-votes, label))`` — a total order, so the label
    of every node is partition-invariant bit-for-bit and a chained-CTE
    ``row_number`` oracle replays it exactly.

    The graph is treated as UNDIRECTED (edges mirrored, multi-edges
    collapsed by weight sum); a node with no neighbors keeps its own
    label. Per round: one labels-onto-edges join + two aggregations
    (vote count, then argmin-struct — both with map-side partial
    aggregation, cheaper than a row_number window shuffle), with the
    module's eager-checkpoint lineage hygiene."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"), w.alias("w"))
    und = e.where(F.col("a") != F.col("b"))
    mirrored = (
        und.select("a", "b", "w")
        .unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
        .groupBy(F.col("a").alias("u"), F.col("b").alias("v"))
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    labels = (
        mirrored.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        votes = (
            mirrored.join(labels.select(F.col("node").alias("v"), "label"), "v")
            .groupBy("u", "label")
            .agg(F.sum("w").alias("cnt"))
        )
        nxt = (
            votes.groupBy("u")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("label").alias("l"))
                ).alias("m")
            )
            .select(F.col("u").alias("node"), F.col("m.l").alias("new_label"))
        )
        labels = (
            labels.join(nxt, "node", "left")
            .select(
                "node", F.coalesce("new_label", "label").alias("label")
            )
            .localCheckpoint(eager=True)
        )
    mirrored.unpersist()
    return labels


def cheapest_paths(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Bounded-hop WEIGHTED shortest paths (the Bellman-Ford recurrence,
    run synchronously for ``max_hops`` rounds): minimum total integer
    edge cost from any seed over paths of at most ``max_hops`` edges.
    Returns ``(node, dist bigint)`` for reached nodes. The hop bound is
    part of the SPEC, not a truncation apology — "best within H hops" is
    what routing/attribution features actually consume, it is exactly
    replayable by a chained-CTE oracle, and it sidesteps negative-cycle
    pathology by construction (weights must be positive anyway).

    Per round: one dist⋈edges join keyed on the source endpoint and one
    min aggregation keyed on the destination — the same Pregel shape as
    ``pagerank``/``shortest_paths``, rounds fixed at ``max_hops``
    (a converged round is one no-op join, and H is small by contract);
    each generation is lineage-cut with an eager local checkpoint
    (module docstring — the round references ``dist`` twice).
    Integer weights make every distance exact: min over integers is
    order-free, so results are partition-invariant bit-for-bit.

    ``edges`` is directed (union the reversed frame upstream for
    undirected); multi-edges collapse to their cheapest parallel edge
    before the loop, which never changes any path cost.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    e = (
        edges.select(
            F.col(src).alias("s"), F.col(dst).alias("d"),
            F.col(weight).cast("long").alias("w"),
        )
        .groupBy("s", "d")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    from pyspark.sql import Observation

    dist = (
        sources.select(F.col("node"))
        .distinct()
        .select("node", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint(eager=True)
    )
    for h in range(max_hops):
        step = (
            dist.join(e, dist["node"] == e["s"])
            .select(F.col("d").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        # eager checkpoint = materialize barrier + lineage cut per round.
        # CONVERGENCE rides the same action: the relaxed frame left-joins
        # the previous generation (both node-hash partitioned — no extra
        # Exchange) and observes how many distances improved or appeared;
        # zero means a fixpoint, and with positive weights a Bellman-Ford
        # fixpoint is final — the remaining hops would be no-op rounds the
        # r5 form still paid for (H is a spec bound, not a work quota).
        obs = Observation(f"bf_h{h}")
        prev = dist.select(F.col("node"), F.col("dist").alias("_pd"))
        dist = (
            dist.unionAll(step)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .join(prev, "node", "left")
            .observe(
                obs,
                F.sum(
                    F.when(
                        F.col("_pd").isNull() | (F.col("dist") < F.col("_pd")), 1
                    ).otherwise(0)
                ).alias("n_relaxed"),
            )
            .select("node", "dist")
            .localCheckpoint(eager=True)
        )
        if not (obs.get["n_relaxed"] or 0):
            break
    e.unpersist()
    return dist


def functional_scc(succ: DataFrame, node: str = "node", nxt: str = "succ") -> DataFrame:
    """Cycle decomposition of a FUNCTIONAL graph (every node has exactly
    one out-edge): which nodes lie on a cycle, and which cycle.

    In a functional graph the strongly connected components are precisely
    its cycles (every other node is a singleton on a rho-tail), so this is
    SCC for the next-pointer graph class — ownership chains, symlink/alias
    tables, "superseded-by" dedup pointers, workflow next-state tables —
    where a cycle is usually a data bug worth finding at scale.

    Algorithm — successor DOUBLING with a min-label semigroup, not
    step-by-step propagation: round k holds, per node v,

        jump_k(v)   = succ^(2^k)(v)
        minlab_k(v) = min label on the walk  v, succ(v), …, succ^(2^k-1)(v)

    and composes (jump, minlab) with itself:  jump_{k+1} = jump_k∘jump_k,
    minlab_{k+1}(v) = min(minlab_k(v), minlab_k(jump_k(v))).  After
    ceil(log2 n) rounds the walk length N = 2^ceil(log2 n) >= n, whence

    - jump(v) is ALWAYS a cycle node (any >= n-step walk has entered its
      cycle), and on cycle nodes jump is a rotation — so the cycle-node
      set is exactly the image of jump;
    - for a cycle node c, the N-step walk from c wraps its whole cycle, so
      minlab(c) is the cycle minimum — a canonical, partitioning-
      independent SCC label.

    O(log n) self-joins of n rows each (vs O(cycle+tail length) rounds for
    naive propagation — the same doubling-vs-walking trade as the
    pointer-jumping in connected_components); each generation is cut from
    its lineage with an eager local checkpoint (module docstring).

    Returns ``(node, scc bigint)`` for CYCLE nodes only — callers treat
    absent nodes as singleton SCCs. Labels are the node ids themselves
    (``node``/``nxt`` must be integer-typed).
    """
    cur = (
        succ.select(
            F.col(node).cast("bigint").alias("v"),
            F.col(nxt).cast("bigint").alias("jump"),
            F.least(F.col(node).cast("bigint"), F.col(nxt).cast("bigint")).alias("minlab"),
        )
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    # after this loop the walk length is 2^rounds >= n
    n = cur.count()
    rounds = max(1, (n - 1).bit_length())
    for r in range(rounds):
        nxt_half = cur.select(
            F.col("v").alias("jv"),
            F.col("jump").alias("jump2"),
            F.col("minlab").alias("minlab2"),
        )
        # Early exit, observed on the same checkpoint action: once no
        # node's (jump, minlab) moved, squaring is idempotent — the state
        # is (rotation-)stable after ceil(log2(max tail+cycle)) rounds,
        # usually far fewer than the worst-case ceil(log2 n) the bound
        # prescribes. Composition with a fixed state changes nothing, so
        # cutting the tail rounds is result-identical.
        obs = Observation(f"scc_r{r}")
        cur = (
            cur.join(nxt_half, on=F.col("jump") == F.col("jv"), how="inner")
            .select(
                "v",
                F.col("jump2").alias("jump"),
                F.least(F.col("minlab"), F.col("minlab2")).alias("minlab"),
                F.when(
                    (F.col("jump2") != F.col("jump"))
                    | (F.col("minlab2") < F.col("minlab")),
                    1,
                )
                .otherwise(0)
                .alias("_moved"),
            )
            .observe(obs, F.sum("_moved").alias("n_moved"))
            .select("v", "jump", "minlab")
            .localCheckpoint(eager=True)
        )
        if not (obs.get["n_moved"] or 0):
            break
    # cycle nodes = image of jump; their label = min over their own cycle.
    # minlab_N(v) for the IMAGE node jump(v) is not what we want — we need
    # minlab at the cycle node itself, so semi-join cur onto the image set.
    cycle_nodes = cur.select(F.col("jump").alias("v")).distinct()
    return (
        cur.join(cycle_nodes, on="v", how="leftsemi")
        .select(F.col("v").alias(node), F.col("minlab").alias("scc"))
    )
