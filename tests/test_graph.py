"""Graph analytics (kgforge/operators/graph.py): PageRank against an
independent numpy power-iteration reference, k-hop BFS against
hand-computed distances, determinism across partition layouts."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kgforge.operators.graph import entity_graph, khop, pagerank

# a small digraph with a hub (0), a cycle (1->2->3->1), a dangling node
# (4: no out-edges), and a disconnected pair (5->6)
EDGES = [(0, 1), (0, 2), (0, 4), (1, 2), (2, 3), (3, 1), (3, 0), (5, 6)]
N = 7


def ref_pagerank(n, edges, alpha, iters):
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.ones(n) / n
    for _ in range(iters):
        inflow = np.zeros(n)
        for s, d in edges:
            inflow[d] += r[s] / deg[s]
        dangling = r[deg == 0].sum()
        r = (1 - alpha) / n + alpha * (inflow + dangling / n)
    return r


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_pagerank_matches_numpy_reference(spark, edges_df):
    # tol=0 pins the iteration count to the reference's (no early stop)
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges_df, max_iter=40, tol=0.0).collect()
    }
    want = ref_pagerank(N, EDGES, 0.85, 40)
    assert set(got) == set(range(N))
    for node in range(N):
        assert got[node] == pytest.approx(want[node], abs=1e-9), node
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_converges_early_and_orders_hubs(spark, edges_df):
    # tol loose enough to stop before max_iter; the cycle+hub nodes must
    # outrank the dangling and disconnected-tail nodes
    got = {r["node"]: r["rank"] for r in pagerank(edges_df, tol=1e-12).collect()}
    assert got[1] > got[6] and got[2] > got[6] and got[0] > got[4] > got[5]


def test_pagerank_duplicate_edges_collapse(spark, edges_df):
    dup = edges_df.union(edges_df)
    a = sorted(
        (r["node"], round(r["rank"], 12))
        for r in pagerank(edges_df, max_iter=15, tol=0.0).collect()
    )
    b = sorted(
        (r["node"], round(r["rank"], 12))
        for r in pagerank(dup, max_iter=15, tol=0.0).collect()
    )
    assert a == b


def test_pagerank_deterministic_across_partitioning(spark, edges_df):
    a = sorted(
        (r["node"], round(r["rank"], 12))
        for r in pagerank(edges_df.repartition(1), max_iter=15, tol=0.0).collect()
    )
    b = sorted(
        (r["node"], round(r["rank"], 12))
        for r in pagerank(edges_df.repartition(16), max_iter=15, tol=0.0).collect()
    )
    assert a == b


def test_pagerank_empty(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert pagerank(e).count() == 0


def test_khop_minimal_distances(spark, edges_df):
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["dist"] for r in khop(edges_df, seeds, k=3).collect()}
    # 0 at 0; 1,2,4 at 1; 3 at 2 (via 2), NOT 3 (1->2->3 would be hop 3
    # but minimal is 2); 5,6 unreachable
    assert got == {0: 0, 1: 1, 2: 1, 4: 1, 3: 2}


def test_khop_early_stop_and_k_bound(spark, edges_df):
    seeds = spark.createDataFrame([(5,)], "node long")
    assert {r["node"]: r["dist"] for r in khop(edges_df, seeds, k=5).collect()} == {
        5: 0,
        6: 1,
    }
    # k=0: seeds only
    assert {r["node"] for r in khop(edges_df, seeds, k=0).collect()} == {5}


def test_entity_graph_projection(spark):
    t = spark.createDataFrame(
        [
            ("a", "sameAs", "b"),
            ("a", "hasMeasurement", "12.5"),
            ("b", "hasQualifier", "q1"),
        ],
        "subj string, pred string, obj string",
    )
    e = entity_graph(t, ["sameAs", "hasQualifier"])
    assert sorted((r["src"], r["dst"]) for r in e.collect()) == [
        ("a", "b"),
        ("b", "q1"),
    ]


def test_entity_salience_over_emitted_kg(spark):
    """Integration: PageRank over the pipeline's own materialized KG
    (page→concept link edges + sameAs) — concept salience. Nodes that
    are never a link target have zero inflow, so they all sit at the
    exact zero-inflow floor (1-a)/N + a*dangling/N, every link target
    strictly outranks them, and ranks sum to 1 under the dangling-mass
    redistribution."""
    import __spark_entry__ as se

    t = se.queries()["kg_triples"](spark, "/root/testdata/sf0.001")
    e = entity_graph(t, ["hasTopic", "hasOrg", "hasPlace", "hasMetric", "sameAs"])
    ranks = pagerank(e, max_iter=20, tol=1e-10)
    rows = ranks.collect()
    assert len(rows) > 0
    assert sum(r["rank"] for r in rows) == pytest.approx(1.0, abs=1e-9)
    targets = {r["dst"] for r in e.select("dst").distinct().collect()}
    floor = [r["rank"] for r in rows if r["node"] not in targets]
    linked = [r["rank"] for r in rows if r["node"] in targets]
    assert floor and linked
    assert max(floor) == pytest.approx(min(floor), abs=1e-12)  # one shared floor
    assert min(linked) > max(floor)  # every link target outranks it
