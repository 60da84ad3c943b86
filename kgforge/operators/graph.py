"""Graph analytics over materialized triple sets — the "graph" half of
the north rule's "graph materialize": entity salience (PageRank) and
k-hop neighborhood expansion as checkpointed DataFrame iterations.

Reference parity: the reference emits relational CDM tables and has no
graph analytics (nothing to cite); these are beyond-reference operators
over the KG this engine emits, in the same iteration discipline as
connected components (kgforge/canon.py): declarative per-round plans,
localCheckpoint lineage cuts, tiny driver-side convergence probes — the
loop is job control, not a Catalyst concern (SURVEY.md §4).

Scale design (10^12-edge posture):
- The edge set is materialized ONCE per call and re-joined every round;
  only the rank/frontier frame (O(nodes)) is rebuilt. On a real
  deployment, bucketing edges by src makes the per-round join reuse the
  edge-side layout so each iteration exchanges only the small rank side.
- Dangling mass and the L1 convergence delta are one tiny aggregation
  each per round (driver scalars) — the same shape as CC's changed
  probe; no node or edge set is ever collected.
- PageRank's per-round shuffle carries (node, double) — 16 bytes of
  payload per node regardless of text/embedding widths upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_ALPHA = 0.85
PR_TOL = 1e-9
PR_MAX_ITER = 40


def pagerank(
    edges: DataFrame,
    alpha: float = PR_ALPHA,
    max_iter: int = PR_MAX_ITER,
    tol: float = PR_TOL,
) -> DataFrame:
    """PageRank over edges(src, dst). Returns (node, rank) for every
    node appearing as src or dst; ranks sum to 1.

    Semantics: standard damped power iteration with dangling-mass
    redistribution — rank' = (1-a)/N + a * (inflow + dangling/N), where
    dangling is the summed rank of nodes with out-degree 0. Duplicate
    edges collapse first (distinct), so a multi-edge contributes once,
    matching the unweighted adjacency-matrix formulation the test's
    numpy reference implements.
    """
    e = (
        edges.select(F.col("src"), F.col("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=True
    )
    dangling_nodes = nodes.join(
        deg.withColumnRenamed("src", "node"), "node", "left_anti"
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        # two scalar jobs per round (dangling mass, then the L1 delta
        # below) — driver-side loop control, same shape as CC's
        # changed-probe; both aggregate frames that are O(nodes)
        dangling = (
            dangling_nodes.join(ranks, "node").agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )
        new = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - alpha) / n)
                    + F.lit(alpha)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.lit(dangling / n)
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            new.join(ranks.withColumnRenamed("rank", "old"), "node")
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
            .collect()[0][0]
        )
        ranks = new
        if delta is not None and delta < tol:
            break
    return ranks


def khop(edges: DataFrame, seeds: DataFrame, k: int) -> DataFrame:
    """Minimal-hop-distance expansion: every node reachable from seeds
    within k directed hops, as (node, dist) with dist = the minimum
    distance (seeds themselves at dist 0). Frontier-at-a-time BFS: each
    round expands only the previous frontier and anti-joins the visited
    set, so a node is emitted exactly once at its first (minimal)
    distance; stops early when a frontier empties.
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    visited = (
        seeds.select("node")
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for d in range(1, k + 1):
        nxt = (
            e.join(
                frontier.select(F.col("node").alias("src")),
                "src",
                "left_semi",
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(d))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def entity_graph(triples: DataFrame, preds: list[str]) -> DataFrame:
    """Project a triple table (subj, pred, obj) to a plain edge list
    (src, dst) restricted to the given object-property predicates —
    the adapter between the pipeline's materialized KG and the
    operators above (literal-valued predicates like hasMeasurement
    must be excluded by the caller's predicate choice)."""
    return triples.filter(F.col("pred").isin(preds)).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
