"""Iterative graph operators: PageRank-style centrality.

Web-corpus curation scores SOURCE QUALITY with link-graph centrality
(the Common-Crawl-style move: a page/domain linked from many
well-linked places is a better training-data source than an orphan) —
the same iterative sparse-matvec family as the connected-components
loop in operators/dedup.py, and it follows the identical Spark loop
discipline:

- the edge table is joined with out-degrees ONCE, persisted, and
  reused every iteration (the loop's only fact-sized state);
- each iteration is one join (current ranks onto edge sources) and one
  partial-aggregated sum by destination — shuffle keyed by node id,
  node-sized rows, never wider;
- lineage is truncated per round (persist + count + unpersist of the
  superseded ranks) so the plan does not double per iteration.

Determinism: fixed iteration count (no convergence test — the oracle
unrolls the same number of steps), no dangling-mass redistribution
(nodes without out-edges simply leak their damped mass, exactly as the
SQL twin computes), and results rounded before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # bounded driver scalar; also materializes
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # degree rides WITH the edge rows so the loop never re-joins it
    e_deg = e.join(deg, "src").persist()
    e_deg.count()

    base = 1.0 / n_nodes
    teleport = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("r", F.lit(base)).persist()
    ranks.count()
    for _ in range(iterations):
        contrib = (
            e_deg.join(ranks, e_deg.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("r") / F.col("__deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("__in"))
        )
        new_ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("r"),
            )
            .persist()
        )
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    out = ranks.select("node", F.col("r").alias("rank_score"))
    nodes.unpersist()
    e_deg.unpersist()
    return out
