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


# ---------------------------------------------------------------------------
# Web link graph: extraction, resolution, host aggregation, centrality
# ---------------------------------------------------------------------------

LG_PAGES = [
    # page on host a.com: absolute w/ tracking+fragment, protocol-relative,
    # root-relative, and a mailto that must be dropped
    ("https://a.com/p/1",
     '<p>x</p><a href="https://b.com/d/9?utm_source=x#frag">read spark</a>'
     '<a href="//c.com/d/2">more query</a>'
     '<a href="/d/3">next page</a>'
     '<a href="mailto:x@a.com">contact us</a>'),
    # page on b.com: two links to the same canonical target (tracking
    # variants) plus a trailing-slash variant of a.com's page
    ("https://b.com/p/2",
     '<a href="https://b.com/d/9?utm_campaign=y">read hash</a>'
     '<a href="https://b.com/d/9#top">read join</a>'
     '<a href="https://a.com/p/1/">back home</a>'),
    ("https://c.com/p/3", "<p>no links here</p>"),
]


@pytest.fixture(scope="module")
def lg_pages_df(spark):
    return spark.createDataFrame(LG_PAGES, "url string, body string").select(
        "url", F.encode("body", "UTF-8").alias("html")
    )


def test_extract_hyperlinks_pairs_href_with_anchor(spark, lg_pages_df):
    from kgforge.operators.graph import extract_hyperlinks

    got = sorted(
        (r["src_url"], r["href"], r["anchor"])
        for r in extract_hyperlinks(lg_pages_df).collect()
    )
    assert ("https://a.com/p/1", "mailto:x@a.com", "contact us") in got
    assert ("https://a.com/p/1", "/d/3", "next page") in got
    assert ("https://b.com/p/2", "https://b.com/d/9#top", "read join") in got
    assert len(got) == 7  # the no-links page contributes nothing


def test_resolve_links_schemes_and_canonicalization(spark, lg_pages_df):
    from kgforge.operators.graph import extract_hyperlinks, resolve_links

    r = resolve_links(extract_hyperlinks(lg_pages_df))
    got = sorted((x["src_url"], x["dst_url"]) for x in r.collect())
    # mailto dropped: 7 raw anchors -> 6 navigational links
    assert len(got) == 6
    # absolute w/ tracking + fragment canonicalized
    assert ("https://a.com/p/1", "https://b.com/d/9") in got
    # protocol-relative gains https scheme
    assert ("https://a.com/p/1", "https://c.com/d/2") in got
    # root-relative resolves against the source host
    assert ("https://a.com/p/1", "https://a.com/d/3") in got
    # trailing slash stripped by the crawl battery
    assert ("https://b.com/p/2", "https://a.com/p/1") in got
    # both b.com/d/9 tracking variants collapse to one canonical url
    assert sum(1 for _, d in got if d == "https://b.com/d/9") == 3


def test_host_graph_and_degrees_reconcile(spark, lg_pages_df):
    from kgforge.operators.graph import (
        extract_hyperlinks,
        host_degrees,
        host_graph,
        resolve_links,
    )

    he = host_graph(resolve_links(extract_hyperlinks(lg_pages_df)))
    edges = {(r["src_host"], r["dst_host"]): (r["n_links"], r["n_pages"])
             for r in he.collect()}
    assert edges[("a.com", "b.com")] == (1, 1)
    assert edges[("b.com", "b.com")] == (2, 1)  # self-host links kept
    deg = {r["host"]: r for r in host_degrees(he).collect()}
    # link mass conserved: every link leaves one host and enters one
    assert sum(r["n_out"] for r in deg.values()) == 6
    assert sum(r["n_in"] for r in deg.values()) == 6
    # c.com never links out but is linked to: full-outer keeps it
    assert deg["c.com"]["n_out"] == 0 and deg["c.com"]["n_in"] == 1
    assert deg["a.com"]["out_hosts"] == 3  # a.com, b.com, c.com


def test_all_pairs_hops_minimality_and_truncation(spark):
    from kgforge.operators.graph import all_pairs_hops

    # path graph 0->1->2->3 plus shortcut 0->2
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2)], "src long, dst long"
    )
    got = {(r["src"], r["node"]): r["dist"] for r in all_pairs_hops(e, 3).collect()}
    assert got[(0, 2)] == 1  # shortcut wins over 0->1->2
    assert got[(0, 3)] == 2
    assert got[(1, 3)] == 2
    truncated = {
        (r["src"], r["node"]): r["dist"]
        for r in all_pairs_hops(e, 1).collect()
    }
    assert (0, 3) not in truncated and truncated[(0, 1)] == 1


def _ref_harmonic(edges, max_k):
    """Independent pure-Python truncated harmonic centrality."""
    from collections import deque

    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    out = {}
    for root in adj:
        dist = {root: 0}
        q = deque([root])
        while q:
            u = q.popleft()
            if dist[u] >= max_k:
                continue
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        counts = [0] * (max_k + 1)
        for v, dv in dist.items():
            if v != root:
                counts[dv] += 1
        score = 0.0
        for d in range(1, max_k + 1):
            score = score + counts[d] / float(d)
        out[root] = (sum(counts[1:]), score)
    return out


def test_harmonic_centrality_matches_reference(spark):
    from kgforge.operators.graph import harmonic_centrality

    edges = [
        (a, b)
        for a in range(12)
        for b in range(12)
        if a != b and (a * 7 + b * 5) % 11 < 3
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["n_reach"], r["harmonic"])
        for r in harmonic_centrality(df, 4).collect()
    }
    want = _ref_harmonic(edges, 4)
    assert set(got) == set(want)
    for node, (nr, sc) in want.items():
        assert got[node][0] == nr, node
        assert got[node][1] == pytest.approx(sc, abs=1e-12), node


def test_pagerank_over_host_graph(spark, lg_pages_df):
    """The link-graph family feeds the existing PageRank: hosts with
    more inbound mass rank higher."""
    from kgforge.operators.graph import (
        extract_hyperlinks,
        host_graph,
        pagerank,
        resolve_links,
    )

    he = host_graph(resolve_links(extract_hyperlinks(lg_pages_df)))
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(
            he.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
        ).collect()
    }
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    assert ranks["b.com"] > ranks["c.com"]  # b.com has 2 inbound hosts


def test_collapse_redirects_pointer_doubling(spark):
    from kgforge.operators.graph import collapse_redirects

    # chain a->b->c->d->T (4 hops) plus a 1-hop x->T2
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "T"), ("x", "T2")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["src"]: (r["final_url"], r["hops"])
           for r in collapse_redirects(df, max_pow=2).collect()}
    # max_pow=2 collapses chains up to 2^2 = 4 hops
    assert got["a"] == ("T", 4)
    assert got["b"] == ("T", 3)
    assert got["d"] == ("T", 1)
    assert got["x"] == ("T2", 1)


def test_collapse_redirects_needs_enough_rounds(spark):
    """The doubling bound is real: a 4-hop chain does NOT fully
    collapse in one round (2^1 = 2 hops max)."""
    from kgforge.operators.graph import collapse_redirects

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "T")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["src"]: (r["final_url"], r["hops"])
           for r in collapse_redirects(df, max_pow=1).collect()}
    assert got["a"] == ("c", 2)  # stalled mid-chain after one doubling


# ---------------------------------------------------------------------------
# Hearst-pattern taxonomy induction
# ---------------------------------------------------------------------------


def test_hearst_pairs_patterns_and_rollup(spark):
    from kgforge.operators.graph import hearst_pairs

    rows = [
        # pattern 1 emits two pairs; pattern 3 in the same page adds one
        ("u1", "engines such as spark and flink plus formats including parquet"),
        # pattern 2
        ("u2", "spark and other engines"),
        # repeat evidence for (spark, engines) on a second page
        ("u3", "engines such as spark and hive"),
        # no pattern at all -> contributes nothing
        ("u4", "plain words without any cue phrase"),
        # cue words split across unrelated text must not match
        ("u5", "such a day as this and no other option including none"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {
        (r.subj, r.obj): (r.n_evidence, r.n_pages)
        for r in hearst_pairs(df).collect()
    }
    assert got[("spark", "engines")] == (3, 3)
    assert got[("flink", "engines")] == (1, 1)
    assert got[("hive", "engines")] == (1, 1)
    assert got[("parquet", "formats")] == (1, 1)
    # 'option including none' IS a legitimate pattern-3 hit; everything
    # else on u4/u5 must not match
    assert got[("none", "option")] == (1, 1)
    assert set(got) == {
        ("spark", "engines"), ("flink", "engines"), ("hive", "engines"),
        ("parquet", "formats"), ("none", "option"),
    }
    for r in hearst_pairs(df).collect():
        assert r.pred == "isA"


def test_hearst_pairs_plan_stays_codegen(spark):
    """The pattern scan must not leave the JVM or build a cartesian:
    no BatchEvalPython (per-row Python) and no CartesianProduct in the
    physical plan."""
    from kgforge.operators.graph import hearst_pairs

    df = spark.createDataFrame([("u", "a such as b and c")],
                               "url string, text string")
    plan = hearst_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_kg_hearst_no_plant_every_11th(spark, sf001):
    sf_dir = sf001
    """pages_with_taxonomy skips planting when doc_id % 11 == 4, so the
    no-match path is real: those pages' text must equal the raw
    document text."""
    from kgforge.pipeline import pages_with_taxonomy
    from kgforge.sources import read_table

    planted = pages_with_taxonomy(spark, sf_dir).select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        F.col("text").alias("t2"),
    )
    raw = read_table(spark, "documents", sf_dir).select("doc_id", "text")
    j = planted.join(raw, "doc_id")
    skipped = j.filter(F.col("doc_id") % 11 == 4)
    assert skipped.count() > 0
    assert skipped.filter(F.col("t2") != F.col("text")).count() == 0
    assert j.filter(
        (F.col("doc_id") % 11 != 4) & (F.col("t2") == F.col("text"))
    ).count() == 0


def test_label_propagation_delta_equals_full_recompute(spark):
    """r06: the frontier/delta iteration must reproduce the synchronous
    full-recompute reference round for round — exercised on a chain
    glued to a clique so convergence takes several rounds and the
    frontier genuinely shrinks (the regime where a frontier bug would
    diverge)."""
    from pyspark.sql import functions as F

    edges = [(i, i + 1) for i in range(0, 12)] + [
        (20, 21), (21, 22), (20, 22), (22, 12),
    ]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["label"] for r in label_propagation(df).collect()}

    # synchronous full-recompute reference (the pre-r06 algorithm)
    bi = {}
    for a, b in edges:
        bi.setdefault(a, set()).add(b)
        bi.setdefault(b, set()).add(a)
    labels = {n: n for n in bi}
    for _ in range(20):
        new = {}
        for n, nbrs in bi.items():
            votes = {}
            for v in nbrs:
                votes[labels[v]] = votes.get(labels[v], 0) + 1
            new[n] = min(votes, key=lambda l: (-votes[l], l))
        if new == labels:
            break
        labels = new
    assert got == labels


def test_cc_delta_long_chain(spark):
    """r06: delta-iterated min-propagation on a 16-node chain (needs 15
    one-hop rounds — inside the max_iter=20 bound the full-recompute
    version also has — while the frontier shrinks to the wavefront)
    must still label every node with the chain minimum."""
    from kgforge.canon import connected_components

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 115)], "src long, dst long"
    )
    comp = {
        r["node"]: r["comp"]
        for r in connected_components(e, force_distributed=True).collect()
    }
    assert set(comp) == set(range(100, 116))
    assert set(comp.values()) == {100}
