"""Graph analytics (kgforge/operators/graph.py): PageRank against an
independent numpy power-iteration reference, k-hop BFS against
hand-computed distances, determinism across partition layouts."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kgforge.operators.graph import (
    cooccurrence_edges,
    entity_graph,
    graph_stats,
    khop,
    label_propagation,
    pagerank,
    triangles_per_node,
)

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
    # every assertion below is iteration-invariant (the zero-inflow
    # floor is exact at each round, ranks always sum to 1), so a short
    # run keeps the integration test honest without paying 20 rounds
    ranks = pagerank(e, max_iter=6, tol=1e-6)
    rows = ranks.collect()
    assert len(rows) > 0
    assert sum(r["rank"] for r in rows) == pytest.approx(1.0, abs=1e-9)
    targets = {r["dst"] for r in e.select("dst").distinct().collect()}
    floor = [r["rank"] for r in rows if r["node"] not in targets]
    linked = [r["rank"] for r in rows if r["node"] in targets]
    assert floor and linked
    assert max(floor) == pytest.approx(min(floor), abs=1e-12)  # one shared floor
    assert min(linked) > max(floor)  # every link target outranks it


# ---- structural analytics (cooccurrence / triangles / stats / LPA) ----


def _ref_triangles(edges):
    """Brute-force per-node triangle counts (itertools, no Spark)."""
    from itertools import combinations

    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {n: k for n, k in tri.items() if k > 0}


def test_cooccurrence_jaccard_threshold(spark):
    # pages p1..p3: x,y always together (J=1); x,z share 1 of 3 pages
    # (J=1/3); y,z share 1 of 3 (J=1/3)
    pe = spark.createDataFrame(
        [
            ("p1", "x"), ("p1", "y"),
            ("p2", "x"), ("p2", "y"),
            ("p3", "x"), ("p3", "z"),
        ],
        "url string, entity string",
    )
    allpairs = {
        (r["a"], r["b"]) for r in cooccurrence_edges(pe).collect()
    }
    assert allpairs == {("x", "y"), ("x", "z")}
    strong = {
        (r["a"], r["b"])
        for r in cooccurrence_edges(pe, min_jaccard=0.5).collect()
    }
    assert strong == {("x", "y")}
    # boundary: J = 1/3 passes a threshold of exactly 1/3 (>= semantics)
    third = {
        (r["a"], r["b"])
        for r in cooccurrence_edges(pe, min_jaccard=1.0 / 3.0).collect()
    }
    assert third == {("x", "y"), ("x", "z")}


def test_cooccurrence_hub_page_cap(spark):
    # a link-farm page mentioning 5 entities is excluded at cap 4; its
    # pairs disappear AND its pages no longer count toward Jaccard
    rows = [("farm", e) for e in "abcde"] + [("p", "a"), ("p", "b")]
    pe = spark.createDataFrame(rows, "url string, entity string")
    got = {
        (r["a"], r["b"])
        for r in cooccurrence_edges(pe, max_entities_per_page=4).collect()
    }
    assert got == {("a", "b")}


def test_triangles_match_bruteforce(spark):
    # deterministic pseudo-random graph: 40 nodes, edge iff
    # (a*7 + b*13) % 5 < 2 — irregular degrees, plenty of triangles
    edges = [
        (a, b)
        for a in range(40)
        for b in range(a + 1, 40)
        if (a * 7 + b * 13) % 5 < 2
    ]
    want = _ref_triangles(edges)
    assert want  # sanity: graph actually has triangles
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["n_tri"] for r in triangles_per_node(df).collect()}
    assert got == want


def test_triangles_orientation_invariant_across_partitioning(spark):
    edges = [
        (a, b)
        for a in range(40)
        for b in range(a + 1, 40)
        if (a * 7 + b * 13) % 5 < 2
    ]
    df1 = spark.createDataFrame(edges, "a long, b long").repartition(1)
    df32 = spark.createDataFrame(edges, "a long, b long").repartition(32)
    r1 = sorted((r["node"], r["n_tri"]) for r in triangles_per_node(df1).collect())
    r32 = sorted((r["node"], r["n_tri"]) for r in triangles_per_node(df32).collect())
    assert r1 == r32


def test_graph_stats_known_values(spark):
    # K4 minus edge (2,3), plus pendant 4-0: degrees 3,2,2,2,1;
    # triangles: (0,1,2) and (0,1,3)
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (0, 4)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: (r["degree"], r["n_tri"], r["clustering"])
        for r in graph_stats(df).collect()
    }
    assert got[0][:2] == (4, 2) and got[0][2] == pytest.approx(2 * 2 / (4 * 3))
    assert got[1][:2] == (3, 2) and got[1][2] == pytest.approx(2 * 2 / (3 * 2))
    assert got[2][:2] == (2, 1) and got[2][2] == pytest.approx(1.0)
    assert got[3][:2] == (2, 1) and got[3][2] == pytest.approx(1.0)
    assert got[4] == (1, 0, 0.0)  # pendant: degree<2 -> clustering 0


def test_label_propagation_two_cliques(spark):
    # two 4-cliques bridged by one edge -> two communities; the
    # deterministic min-label tie-break keeps each clique on its own
    # smallest member
    clique1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    clique2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = clique1 + clique2 + [(3, 10)]
    df = spark.createDataFrame(edges, "a long, b long")
    labels = {r["node"]: r["label"] for r in label_propagation(df).collect()}
    c1 = {labels[n] for n in range(4)}
    c2 = {labels[n] for n in range(10, 14)}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2


def test_label_propagation_deterministic_across_partitioning(spark):
    edges = [
        (a, b)
        for a in range(30)
        for b in range(a + 1, 30)
        if (a * 11 + b * 3) % 7 < 2
    ]
    df1 = spark.createDataFrame(edges, "a long, b long").repartition(1)
    df16 = spark.createDataFrame(edges, "a long, b long").repartition(16)
    r1 = sorted((r["node"], r["label"]) for r in label_propagation(df1).collect())
    r16 = sorted((r["node"], r["label"]) for r in label_propagation(df16).collect())
    assert r1 == r16
