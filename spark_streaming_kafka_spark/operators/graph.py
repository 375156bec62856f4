"""Iterative graph operators: PageRank-style centrality.

Web-corpus curation scores SOURCE QUALITY with link-graph centrality
(the Common-Crawl-style move: a page/domain linked from many
well-linked places is a better training-data source than an orphan) —
the same iterative sparse-matvec family as the connected-components
loop in operators/dedup.py, and it follows the identical Spark loop
discipline:

- the whole fixed-iteration recurrence is ONE lazy query: the same
  edge⋈degree subtree (one Python DataFrame object) feeds every round,
  so its source-keyed shuffle is planned once and every later round
  reads it back as a ReusedExchange — the per-round cost is a single
  node-sized aggregation exchange, and there is no per-round
  driver job at all (a fixed iteration count needs no convergence
  check, hence nothing to collect between rounds);
- nodes with no in-edges leave the loop entirely: their rank is the
  bare teleport constant after the first step, so their (constant)
  out-contribution is pre-aggregated once and unioned into each
  round's sum — no per-iteration nodes left-join;
- per-round rank tables ride the shuffled-hash join build side (the
  hint avoids re-sorting the edge stage every round); plan depth grows
  linearly in the iteration count, which is fine at the 5-20 rounds
  PageRank needs — a 100+-round recurrence would re-introduce a
  checkpoint every ~10 rounds to bound optimizer time.

Determinism: fixed iteration count (no convergence test — the oracle
unrolls the same number of steps), no dangling-mass redistribution
(nodes without out-edges simply leak their damped mass, exactly as the
SQL twin computes), and results rounded before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns (node, rank_score) for every node appearing as a source or
    destination. ``r_{t+1}(v) = (1-d)/N + d · Σ_{u→v} r_t(u)/outdeg(u)``
    from a uniform ``1/N`` start. Undirected graphs: pass each edge in
    both directions. Parallel edges each carry contribution (acting as
    weights); pre-``distinct()`` the input for simple-graph semantics.
    """
    from pyspark.sql import Window as _W

    # The caller's edge subtree can be arbitrarily expensive (a
    # fact-fact join + distinct in the registered query) and is needed
    # by several differently-keyed consumers below, where exchange
    # reuse cannot dedup it — materialize it ONCE. localCheckpoint (not
    # persist) so the blocks are ContextCleaner-freed with the result,
    # never session-pinned.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint()

    # ONE aggregation yields the node census AND in-edge liveness; the
    # two loop constants (1/N and the live count) are bounded driver
    # scalars read off it.
    stats = (
        e.select(F.col("src").alias("node"), F.lit(0).alias("has_in"))
        .unionByName(
            e.select(F.col("dst").alias("node"), F.lit(1).alias("has_in"))
        )
        .groupBy("node")
        .agg(F.max("has_in").alias("has_in"))
        .localCheckpoint(eager=False)
    )
    # ONE driver job: the two-scalar aggregate materializes the lazy
    # checkpoint as a side effect (r11 — was three jobs: eager
    # checkpoint, count, filtered count; the fused agg reads the same
    # node-sized rows and returns both loop constants).
    _row = stats.agg(
        F.count(F.lit(1)).alias("n"), F.sum("has_in").alias("nl")
    ).collect()[0]
    n_nodes = _row["n"]
    n_live = int(_row["nl"] or 0)
    base = 1.0 / n_nodes
    teleport = (1.0 - damping) / n_nodes
    if iterations <= 0:
        return stats.select("node", F.lit(base).alias("rank_score"))

    # out-degree rides WITH the edge rows via a src-keyed window (one
    # edge-sized exchange, no join), which also leaves the loop's edge
    # state hash-partitioned on the join key.
    e_deg = e.withColumn(
        "__deg", F.count(F.lit(1)).over(_W.partitionBy("src"))
    )

    # live = nodes with in-edges — the only ranks the recurrence can
    # change; a node without in-edges ("dead") holds the closed-form
    # bare-teleport rank after step one, and its out-contribution is a
    # per-destination constant. When the probe says every node is live
    # (any doubled/undirected graph), the whole dead path vanishes
    # from the plan.
    all_live = n_live == n_nodes
    live = stats.filter(F.col("has_in") == 1).select("node")
    if all_live:
        e_live = e_deg
        dead = dead_w = None
    else:
        e_live = e_deg.join(live, e_deg.src == live.node, "left_semi")
        dead = stats.filter(F.col("has_in") == 0).select("node")
        dead_w = (
            e_deg.join(live, e_deg.src == live.node, "left_anti")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(1.0 / F.col("__deg")).alias("__w"))
            .localCheckpoint(eager=False)
        )
    # Checkpoint the loop's edge state: only the EXCHANGE below the
    # degree window dedups across rounds (ReusedExchange), so without
    # this every round would re-sort and re-count the window. The
    # rounds then share one source-keyed shuffle of the checkpointed
    # rows.
    e_live = e_live.localCheckpoint(eager=False)

    ranks = live.select("node", F.lit(base).alias("r"))
    for t in range(iterations):
        joined = e_live.join(
            ranks.hint("shuffle_hash"), e_live.src == ranks.node
        ).select(
            F.col("dst").alias("node"),
            (F.col("r") / F.col("__deg")).alias("c"),
        )
        if dead_w is not None:
            dead_rank = base if t == 0 else teleport
            joined = joined.unionByName(
                dead_w.select(
                    "node", (F.lit(dead_rank) * F.col("__w")).alias("c")
                )
            )
        contrib = joined.groupBy("node").agg(F.sum("c").alias("__in"))
        ranks = contrib.select(
            "node",
            (F.lit(teleport) + F.lit(damping) * F.col("__in")).alias("r"),
        )
    out = ranks.select("node", F.col("r").alias("rank_score"))
    if dead is None:
        return out
    # dead nodes re-enter with their closed-form rank (iterations >= 1
    # here): bare teleport — no in-mass ever arrives.
    return out.unionByName(
        dead.select("node", F.lit(teleport).alias("rank_score"))
    )


def hits(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS (Kleinberg) hubs & authorities over a directed edge list,
    fixed iteration count: ``a(v) = Σ_{u→v} h(u)``, ``h(u) = Σ_{u→v}
    a(v)`` from ``h ≡ 1``, L1-normalized ONCE at the end — for a fixed
    iteration count the per-round normalizations are scalar factors
    that cancel in the final division, so deferring them removes two
    global reductions per round without changing a single output bit
    beyond float headroom (magnitudes stay ≤ (Σdeg)^(2·iters), well
    inside double range for any graph this engine meets).

    Returns ``(node, hub_score, authority_score)`` for every node,
    0.0 for a role the node never plays (no out-edges → hub 0, no
    in-edges → authority 0). Same loop discipline as :func:`pagerank`:
    the edge list is checkpointed once, each round's two joins read
    the two reused source-/destination-keyed shuffles, scores ride the
    shuffled-hash build side, and the whole recurrence is one lazy
    query. The end normalization is an unpartitioned window over the
    NODE-SIZED score table (the benford-total precedent, never fact
    rows).
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint()
    h = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.lit(1.0).alias("h"))
    )
    a = None
    for _ in range(iterations):
        a = (
            e.join(h.hint("shuffle_hash"), e.src == h.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        h = (
            e.join(a.hint("shuffle_hash"), e.dst == a.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
    wall = Window.partitionBy()
    hub = h.select(
        "node", (F.col("h") / F.sum("h").over(wall)).alias("hub_score")
    )
    auth = a.select(
        "node",
        (F.col("a") / F.sum("a").over(wall)).alias("authority_score"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    return (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.coalesce("hub_score", F.lit(0.0)).alias("hub_score"),
            F.coalesce("authority_score", F.lit(0.0)).alias(
                "authority_score"
            ),
        )
    )


def degree_histogram(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree distribution of an undirected simple graph given as
    normalized (a < b) edge rows: ``(degree, n_nodes)``.

    Two hash aggregations, both map-side combined: node degrees
    (explode each edge to its two endpoints — edge-sized, narrow),
    then the histogram (degree-sized). The standard first look at any
    link/co-occurrence graph before running anything iterative on it.
    """
    ends = edges.select(
        F.explode(F.array(F.col(src), F.col(dst))).alias("node")
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )


#: Edge-count gate for broadcasting the oriented adjacency table in
#: :func:`triangle_counts`: the broadcast relation's payload is one long
#: per oriented edge (plus node keys), so 4M edges ≈ 45 MB — comfortably
#: inside executor memory while removing the edge-sized shuffle that
#: otherwise duplicates every neighbor array per incident edge (measured
#: 224 MB of array shuffle for a 10 MB adjacency table at sf0.1, r11
#: profile). Above the gate the shuffle path runs unchanged — the
#: 100 TB regime, where the adjacency is fact-sized and must partition.
ADJ_BROADCAST_EDGES = 4_000_000


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    adj_broadcast_max_edges: int | None = ADJ_BROADCAST_EDGES,
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph
    (normalized a < b edge rows): ``(node, n_triangles)`` for every
    node in at least one triangle.

    Degree-ordered orientation — the classic bound that makes triangle
    enumeration feasible on skewed graphs: direct every edge from its
    lower endpoint to its higher endpoint under the total order
    (degree, node id), so every vertex's OUT-degree is O(√m) even when
    a hub's raw degree is O(n). Wedges are then generated per source
    from out-neighbor pairs (Σ outdeg² ≤ O(m^1.5) instead of Σ deg²,
    which a hub makes quadratic), and closed against the normalized
    edge set with one equi-join. Each triangle is found exactly once —
    at its (degree, id)-minimal vertex — then exploded to credit its
    three corners.

    The caller's edge subtree is ``localCheckpoint``-ed once (the
    pagerank lesson: it feeds the degree table, the orientation join
    and the closure, and exchange reuse cannot dedup across those
    differently-keyed consumers), which also yields a free edge count —
    the gate for HOW the neighbor arrays attach to edges. Building
    this DataFrame therefore RUNS Spark jobs (the checkpoint + count);
    the result reflects the edge data as of build time, same
    convention as ``retrieval.item_cooccurrence_topk``. At or below
    ``adj_broadcast_max_edges`` the adjacency table broadcasts (two
    map-side joins: no array ever crosses a shuffle — the arrays exist
    only inside the closure stage's stream); above it, arrays attach by
    shuffle join, partitioned on the edge endpoints (the 100 TB path).

    Every join is an equi-join (shuffle/broadcast by key — no
    cartesian); all values are integers, so the DuckDB oracle matches
    exactly.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint()
    m = e.count()  # free: reads the checkpointed blocks
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("__deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("__deg").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("__deg").alias("__db"))
    # orient: lower (deg, id) endpoint -> higher
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("__da") < F.col("__db"))
                | ((F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("__o")
        )
        .select("__o.u", "__o.v")
    )
    # Edge-iterator closure instead of materialized wedges: collect each
    # node's oriented out-neighborhood ONCE (arrays bounded by the
    # O(√m) oriented out-degree), attach both endpoints' arrays to each
    # oriented edge, and intersect. A triangle (u, v, x) with u→v, u→x,
    # v→x appears exactly as x ∈ N⁺(u) ∩ N⁺(v) on edge (u, v). Same
    # integer result as the wedge join, but the shuffle carries one row
    # per edge with an array payload instead of one row per WEDGE —
    # measured 25× fewer shuffled rows (and 3× wall) on the sf0.1
    # co-occurrence graph, where Σ outdeg² ≈ 50M wedges vs 1M edges.
    width = edges.sparkSession.sparkContext.defaultParallelism
    # The neighborhood aggregation is width-pinned for the same reason
    # as the intersect stage below: its shuffle bytes undersell its
    # work (collect_list builds every adjacency array here), and AQE
    # coalesced it to one 2.4 s task at sf0.1.
    adj = (
        oriented.repartition(width, "u")
        .groupBy(F.col("u").alias("node"))
        .agg(F.sort_array(F.collect_list("v")).alias("__nbrs"))
    )
    if adj_broadcast_max_edges is not None and m <= adj_broadcast_max_edges:
        # Broadcast attach: the adjacency payload is ~8·m bytes (one
        # long per oriented edge) — at or below the gate that is a
        # routine broadcast relation, and it removes the shuffle whose
        # bytes are the arrays DUPLICATED once per incident edge (~an
        # order of magnitude more than the adjacency itself on this
        # graph: avg degree ≈ 2m/n copies of each array). The explicit
        # round-robin repartition pins the closure stage's width — the
        # oriented-edge bytes feeding it are tiny and AQE would
        # otherwise coalesce the Σ|N⁺| intersection work to one task.
        # (The two broadcast builds read the adjacency aggregation's
        # one shuffle — ReusedExchange dedups the agg even though the
        # BroadcastExchanges themselves differ by the column rename.)
        adj_u = adj.select(
            F.col("node").alias("u"), F.col("__nbrs").alias("__nu")
        )
        adj_v = adj.select(
            F.col("node").alias("v"), F.col("__nbrs").alias("__nv")
        )
        e2 = (
            oriented.repartition(width)
            .join(F.broadcast(adj_u), "u")
            .join(F.broadcast(adj_v), "v", "left")  # v may have no out-edges
            .select(
                "u",
                "v",
                F.array_intersect(
                    F.col("__nu"), F.coalesce(F.col("__nv"), F.array())
                ).alias("__common"),
            )
        )
    else:
        adj_u = adj.select(
            F.col("node").alias("u"), F.col("__nbrs").alias("__nu")
        )
        adj_v = adj.select(
            F.col("node").alias("v"), F.col("__nbrs").alias("__nv")
        )
        # Shuffle attach (the 100 TB path: adjacency is fact-sized).
        # Explicit stage width for the intersect/explode stage (the
        # Pass-Join lesson, pinned there by test_plan_audit): the
        # shuffle BYTES entering it are tiny so AQE coalesces it to ONE
        # task — but the stage's WORK is the Σ|N⁺| array intersections,
        # which AQE cannot see. Measured 6.7 s single-task vs
        # sub-second at full width.
        e2 = (
            oriented.join(adj_u, "u")
            .repartition(width, "v")
            .join(adj_v, "v", "left")  # v may have no out-edges
            .select(
                "u",
                "v",
                F.array_intersect(
                    F.col("__nu"), F.coalesce(F.col("__nv"), F.array())
                ).alias("__common"),
            )
        )
    corners = e2.select(
        F.explode(
            F.concat(
                # u and v each close size(common) triangles on this edge
                F.transform(F.col("__common"), lambda _: F.col("u")),
                F.transform(F.col("__common"), lambda _: F.col("v")),
                F.col("__common"),
            )
        ).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def link_prediction_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 50,
    max_degree: int | None = 256,
) -> DataFrame:
    """Top-``k`` link-prediction candidates over an undirected simple
    graph (normalized a < b edges): non-adjacent pairs at distance 2,
    scored by common-neighbor count and Adamic-Adar
    (``Σ_z 1/ln(deg z)`` over shared neighbors ``z`` — rare shared
    neighbors weigh more than hubs).

    Candidate generation is wedge expansion at the SHARED neighbor:
    each node z contributes all pairs within its neighborhood, so pair
    volume is ``Σ deg(z)²`` — a hub makes it quadratic. ``max_degree``
    caps it the way every pair-expansion in this package is capped
    (basket caps, LSH bucket sizing): nodes above the cap contribute NO
    wedges (semantics documented, mirrored exactly by the oracle). A
    hub shared by everything carries ~zero Adamic-Adar weight anyway
    (1/ln(deg) → 0), so the cap removes cost, not signal.

    Plan: degree table → capped (z, neighbor) incidence → per-z
    sorted-neighbor-array aggregation with the wedge weight carried on
    the bucket row, then pure array algebra expands weighted pairs
    (one hash agg, never a self-join — the same shape as
    ``dedup._bucket_pairs``) → per-pair aggregation → LEFT ANTI join
    against the edge set (only predicted-NEW links survive) → global
    top-k. ``ln`` of integer degrees is cross-engine stable under the
    suite's round-6 contract.
    """
    from .relational import top_k

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    inc = e.select(F.col("a").alias("z"), F.col("b").alias("n")).unionByName(
        e.select(F.col("b").alias("z"), F.col("a").alias("n"))
    )
    deg = inc.groupBy("z").agg(F.count(F.lit(1)).alias("__deg"))
    if max_degree is not None:
        deg = deg.filter(F.col("__deg") <= max_degree)
    capped = inc.join(deg, "z")
    buckets = (
        capped.groupBy("z", "__deg")
        .agg(F.sort_array(F.collect_list("n")).alias("__ids"))
        .filter(F.size("__ids") >= 2)
    )
    # Width pin on the EXPLODE side (the triangle_counts/Pass-Join
    # lesson): the bucket table is a few thousand small rows, so AQE
    # coalesces its reader to ONE task — which is exactly the stage
    # that expands Σ deg² weighted pairs (measured 14 s single-task at
    # sf0.01). An explicit round-robin REPARTITION_BY_NUM between the
    # aggregation and the explode pins the expansion's parallelism;
    # AQE never coalesces a user-numbered repartition.
    width = edges.sparkSession.sparkContext.defaultParallelism
    buckets = buckets.repartition(width)
    pairs = buckets.select(
        (F.lit(1.0) / F.log(F.col("__deg"))).alias("__w"),
        F.explode(
            F.expr(
                "flatten(transform(__ids, (x, i) -> "
                "transform(slice(__ids, i + 2, size(__ids)), "
                "y -> struct(x AS id_a, y AS id_b))))"
            )
        ).alias("__p"),
    ).select("__p.id_a", "__p.id_b", "__w")
    scored = pairs.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors"),
        F.sum("__w").alias("adamic_adar"),
    )
    known = e.select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
    novel = scored.join(known, ["id_a", "id_b"], "left_anti")
    return top_k(
        novel.select(
            "id_a",
            "id_b",
            "common_neighbors",
            F.round("adamic_adar", 6).alias("adamic_adar"),
        ),
        [
            F.col("adamic_adar").desc(),
            F.col("id_a").asc(),
            F.col("id_b").asc(),
        ],
        k,
    )
