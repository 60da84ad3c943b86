"""Scaling-efficiency evidence for the TRAINING-DATA ops (companion to
BENCH/scaling.py, which measures the flagship KG pipeline): the same
text gauntlet — ingest gates + PII scrub, sequence packing, exact
dedup, passage dedup, benchmark decontamination, duplicated-span
removal (ExactSubstr) — over the same
synthesized documents table at local[N] and local[4N];
efficiency = tput(4N) / (4 x tput(N)), target >= 0.8 (north rule).

The fixture is generated ONCE (fresh JVM), written to /dev/shm, and
read by both levels; each level runs in its own subprocess so no
JVM/executor state leaks. Every op's output row count is collected
(untimed) and asserted IDENTICAL across levels — the ops are
deterministic by design (multiplicative-hash sampler, hash shards,
md5 grams), so any count drift is a parallelism bug.

Run:  python BENCH/scaling_text.py [--docs 2000000] [--n 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

A1, A2, M32 = 2654435761, 2246822519, 1 << 32


def synth_docs(spark, n_docs: int, out: str) -> None:
    """Deterministic word-salad corpus with planted structure: ~5k-word
    vocab, 40-79 words/doc, and every 13th doc copies the text basis of
    its 1300-block leader (exact-dup groups for dd_exact / dd_passage /
    decontam to find). Pure codegen generation — no driver loops."""
    from pyspark.sql import functions as F

    ids = spark.range(0, n_docs, 1, numPartitions=64)
    base = F.when(
        F.col("id") % 13 == 0, (F.floor(F.col("id") / 1300) * 1300).cast("long")
    ).otherwise(F.col("id"))
    n_words = (F.col("b") * A1) % M32 % 40 + 40
    words = F.transform(
        F.sequence(F.lit(1), n_words.cast("int")),
        lambda i: F.concat(
            F.lit("w"), (((F.col("b") * A1 + i * A2) % M32) % 5000).cast("string")
        ),
    )
    (
        ids.select(
            F.col("id").alias("doc_id"),
            base.alias("b"),
            F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
        )
        .select("doc_id", "source", F.concat_ws(" ", words).alias("text"))
        .write.mode("overwrite")
        .parquet(out)
    )


GAUNTLET = (
    "redact_gates", "pack", "dd_exact", "dd_passage", "decontam", "dd_substr",
    "linkgraph",
)


def run_gauntlet(spark, docs_path: str) -> tuple[dict, dict]:
    """Time each op (noop sink: full plan materialized, no driver
    collection), then collect output counts untimed for the
    determinism assert. Returns (timings, counts)."""
    from pyspark.sql import functions as F

    from kgforge.operators.dedup import passage_dedup, substr_dedup
    from kgforge.operators.graph import (
        extract_hyperlinks as _extract,
        host_graph as _host_graph,
        resolve_links as _resolve,
    )
    from kgforge.operators.textstats import _sample_cols, decontam, pack_docs, redact
    from kgforge.pipeline import pages_with_links_from as _pages_links

    def exact(d):
        # the frame form of dd_exact (dedup.py), minus the test-clone seeding
        return (
            d.groupBy(F.md5("text").alias("text_md5"))
            .agg(
                F.min("doc_id").alias("keeper_doc_id"),
                F.count(F.lit(1)).alias("n_copies"),
            )
            .filter(F.col("n_copies") > 1)
        )

    def gates(d):
        words = F.split(F.col("text"), " ")
        n_words = F.size(words)
        mean_wl = (F.length("text") - (n_words - 1)) / n_words
        bucket, rate = _sample_cols()
        kept = d.select(
            "doc_id", "text", bucket, rate,
            ((n_words >= 10) & (mean_wl >= 2.0) & (mean_wl <= 12.0)).alias("keep"),
        ).filter(F.col("keep") & (F.col("bucket") < F.col("rate_permille")))
        return redact(kept)

    docs = spark.read.parquet(docs_path)
    ops = {
        "redact_gates": lambda: gates(docs),
        "pack": lambda: pack_docs(docs),
        "dd_exact": lambda: exact(docs),
        "dd_passage": lambda: passage_dedup(docs),
        "decontam": lambda: decontam(docs),
        # word-level ExactSubstr over the raw text: the planted
        # 1300-block clone groups guarantee corpus-wide duplicated
        # grams at every size
        "dd_substr": lambda: substr_dedup(
            docs.select("doc_id", F.split("text", " ").alias("ws"))
        ),
        # web link graph: anchor extraction from html bytes -> URL
        # resolution/canonicalization -> host-pair rollup; sum(n_links)
        # catches any extraction or resolution drift across levels
        "linkgraph": lambda: _host_graph(
            _resolve(_extract(_pages_links(docs)))
        ),
    }
    # per-op checksum column: summing a value column catches bugs a bare
    # row count cannot (e.g. sum(start_off) changes if the packing
    # window ever orders differently across parallelism levels)
    checksum_col = {
        "redact_gates": "n_emails",
        "pack": "start_off",
        "dd_exact": "n_copies",
        "dd_passage": "n_occ",
        "decontam": "n_contam_grams",
        "dd_substr": "n_covered",
        "linkgraph": "n_links",
    }
    timings, counts = {}, {}
    for name in GAUNTLET:
        df = ops[name]()
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)
        row = (
            ops[name]()
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(checksum_col[name]).cast("long").alias("chk"),
            )
            .collect()[0]
        )
        counts[name] = [row["n"], row["chk"]]
    return timings, counts


def synth_edges(spark, n_nodes: int, out: str) -> None:
    """Deterministic web-shaped directed graph: every node emits 4
    intra-block edges (blocks of 1000 — the community structure LPA
    and the block-restricted CC read), every 10th node one uniform
    cross-block edge (the long-range links that keep k-hop frontiers
    growing), and every node one link to a global hub (id = node % 64
    — in-degree ~n/64, the hot-key skew PageRank's contribution
    shuffle and khop's reversed expansion must survive). Pure codegen
    generation — no driver loops."""
    from pyspark.sql import functions as F

    ids = spark.range(0, n_nodes, 1, numPartitions=64)
    i = F.col("id")
    block = i - i % 1000
    intra = F.transform(
        F.sequence(F.lit(1), F.lit(4)),
        lambda j: block + ((i * A1 + j * A2) % M32) % 1000,
    )
    cross = F.when(
        i % 10 == 0, F.array(((i * A2) % M32) % n_nodes)
    ).otherwise(F.array().cast("array<bigint>"))
    hub = F.array(i % 64)
    (
        ids.select(
            i.alias("src"),
            F.explode(F.concat(intra, cross, hub)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .write.mode("overwrite")
        .parquet(out)
    )


GRAPH_GAUNTLET = ("pagerank", "khop_rev", "lpa", "cc_blocks", "triangles")


def run_graph_gauntlet(spark, edges_path: str) -> tuple[dict, dict]:
    """The graph-iteration ops — PageRank, reversed k-hop BFS through
    the hub skew, deterministic label propagation, distributed-branch
    connected components (block-restricted so components are
    non-trivial), exact degree-ordered triangle counting — same
    timing/determinism protocol as the text/crawl gauntlets. khop/lpa/
    cc/triangles checksums are exact-integer sums; PageRank's is the
    sum of floor(rank * 1e9) — ranks are fixed points of a contraction
    (iteration count is level-stable: successive L1 deltas differ by
    ~15%, twelve orders above float noise), so the 1e-9 quantum sits
    ~1e11 above the cross-parallelism ulp drift of the inflow sums."""
    from pyspark.sql import functions as F

    from kgforge.canon import connected_components
    from kgforge.operators.graph import (
        khop,
        label_propagation,
        pagerank,
        triangles_per_node,
    )

    edges = spark.read.parquet(edges_path)
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    seeds = spark.range(0, 64).select(F.col("id").alias("node"))
    intra = edges.filter(
        F.col("src") - F.col("src") % 1000 == F.col("dst") - F.col("dst") % 1000
    )
    # LPA and CC run on the block subgraph: over the full graph the
    # global hubs hand every node the label/component 0 (sum = 0, a
    # checksum that catches nothing); the block communities give both
    # ops non-trivial structure to recover
    und_intra = intra.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    )
    ops = {
        "pagerank": lambda: pagerank(edges, max_iter=12),
        "khop_rev": lambda: khop(rev, seeds, 2),
        "lpa": lambda: label_propagation(und_intra),
        "cc_blocks": lambda: connected_components(
            intra, force_distributed=True
        ),
        "triangles": lambda: triangles_per_node(und),
    }
    chk_expr = {
        "pagerank": F.floor(F.col("rank") * 1e9),
        "khop_rev": F.col("dist").cast("long"),
        "lpa": F.col("label"),
        "cc_blocks": F.col("comp"),
        "triangles": F.col("n_tri"),
    }
    timings, counts = {}, {}
    for name in GRAPH_GAUNTLET:
        # construction IS the work for the iterative ops (each round
        # localCheckpoints eagerly), so it sits inside the timed region
        t0 = time.time()
        df = ops[name]()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)
        # counts read the SAME frame — the iterative results are already
        # checkpoint-materialized, so this is a cheap scan, not a rerun
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(chk_expr[name]).cast("long").alias("chk"),
        ).collect()[0]
        counts[name] = [row["n"], row["chk"]]
    return timings, counts


CRAWL_GAUNTLET = ("robots", "sitemap", "mainext", "colloc", "hearst")


def run_crawl_gauntlet(spark, docs_path: str) -> tuple[dict, dict]:
    """The crawl-lifecycle ops (seventh wave): robots.txt frontier
    filtering, sitemap recrawl scheduling, within-page main-content
    extraction, collocation mining, Hearst taxonomy induction — same
    timing/determinism protocol as run_gauntlet. Checksums are value
    expressions (sum of a semantic quantity), so ordering or rule-
    resolution drift across parallelism levels cannot hide behind a
    stable row count."""
    from pyspark.sql import functions as F

    from kgforge.operators.dedup import dd_robots_from, dd_sitemap_from
    from kgforge.operators.graph import hearst_pairs
    from kgforge.operators.textstats import (
        main_content_blocks,
        pages_with_block_markup,
        tx_colloc_from,
    )
    from kgforge.pipeline import taxonomy_suffix_col

    docs = spark.read.parquet(docs_path)

    def hearst(d):
        did = F.col("doc_id")
        return hearst_pairs(
            d.select(
                did.cast("string").alias("url"),
                F.concat(F.col("text"), taxonomy_suffix_col(did)).alias("text"),
            )
        )

    ops = {
        "robots": lambda: dd_robots_from(docs),
        "sitemap": lambda: dd_sitemap_from(docs),
        "mainext": lambda: main_content_blocks(pages_with_block_markup(docs)),
        "colloc": lambda: tx_colloc_from(docs),
        "hearst": lambda: hearst(docs),
    }
    blocked = (F.col("decision") == "blocked").cast("long")
    sched = (
        F.when(F.col("decision") == "refetch", 1)
        .when(F.col("decision") == "new", 1000)
        .otherwise(1000000)
        .cast("long")
    )
    chk_expr = {
        "robots": blocked,
        "sitemap": sched,
        "mainext": F.col("main_chars").cast("long"),
        "colloc": F.col("n_xy"),
        "hearst": F.col("n_evidence"),
    }
    timings, counts = {}, {}
    for name in CRAWL_GAUNTLET:
        df = ops[name]()
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)
        row = (
            ops[name]()
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(chk_expr[name]).cast("long").alias("chk"),
            )
            .collect()[0]
        )
        counts[name] = [row["n"], row["chk"]]
    return timings, counts


def child_main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--docs-path", required=True)
    ap.add_argument("--gauntlet", default="text", choices=("text", "crawl", "graph"))
    args = ap.parse_args(sys.argv[2:])
    from kgforge.conf import get_spark

    spark = get_spark("scale-text", cpus=args.cpus, shuffle_partitions=4 * args.cpus)
    runner = {
        "text": run_gauntlet,
        "crawl": run_crawl_gauntlet,
        "graph": run_graph_gauntlet,
    }[args.gauntlet]
    timings, counts = runner(spark, args.docs_path)
    wall = sum(timings.values())
    print(json.dumps({
        "cpus": args.cpus, "wall_sec": round(wall, 3),
        "timings": timings, "counts": counts,
    }))
    return 0


def synth_main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, required=True)
    ap.add_argument("--docs-path", required=True)
    ap.add_argument("--kind", default="docs", choices=("docs", "edges"))
    args = ap.parse_args(sys.argv[2:])
    from kgforge.conf import get_spark

    spark = get_spark("scale-text-synth", cpus=8, shuffle_partitions=32)
    synth = synth_edges if args.kind == "edges" else synth_docs
    synth(spark, args.docs, args.docs_path)
    return 0


def run_sub(mode: str, extra: list[str]) -> str:
    proc = subprocess.run(
        [sys.executable, __file__, mode, *extra],
        capture_output=True, text=True, timeout=10800,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"{mode} failed:\n{proc.stderr[-2000:]}")
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    return lines[-1] if lines else ""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--n", type=int, default=2, help="small level N (large is 4N)")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--gauntlet", default="text", choices=("text", "crawl", "graph"))
    args = ap.parse_args()

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    fixture = tempfile.mkdtemp(prefix="kgf_scaletext_", dir=base)
    kind = "edges" if args.gauntlet == "graph" else "docs"
    docs_path = os.path.join(fixture, f"{kind}.parquet")
    try:
        print(f"synthesizing {args.docs:,} {kind} -> {docs_path}", file=sys.stderr)
        run_sub("synth", ["--docs", str(args.docs), "--docs-path", docs_path,
                          "--kind", kind])
        load0 = round(os.getloadavg()[0], 2)
        levels = {}
        for cpus in (args.n, 4 * args.n):
            levels[cpus] = json.loads(
                run_sub("child", ["--cpus", str(cpus), "--docs-path", docs_path,
                                  "--gauntlet", args.gauntlet])
            )
            print(f"local[{cpus}]: {levels[cpus]['wall_sec']}s", file=sys.stderr)
        small, large = levels[args.n], levels[4 * args.n]
        assert small["counts"] == large["counts"], (
            f"nondeterminism across levels: {small['counts']} != {large['counts']}"
        )
        tput_s = args.docs / small["wall_sec"]
        tput_l = args.docs / large["wall_sec"]
        eff = tput_l / (4 * tput_s)
        job = {
            "crawl": "crawl-gauntlet (robots, sitemap, mainext, colloc, hearst)",
            "graph": "graph-gauntlet (pagerank, khop_rev, lpa, cc_blocks, "
                     "triangles; --docs = n_nodes, ~5.1 edges/node)",
            "text": "text-gauntlet (gates+redact, pack, dd_exact, dd_passage, "
                    "decontam, dd_substr, linkgraph)",
        }[args.gauntlet]
        summary = {
            "job": job,
            "docs": args.docs, "n_small": args.n, "n_large": 4 * args.n,
            "wall_small": small["wall_sec"], "wall_large": large["wall_sec"],
            "tput_small_docs_per_sec": round(tput_s, 1),
            "tput_large_docs_per_sec": round(tput_l, 1),
            "efficiency": round(eff, 3),
            "counts": small["counts"],
            "timings_small": small["timings"], "timings_large": large["timings"],
            "load_avg_at_start": load0,
        }
        print(json.dumps(summary))
        if args.json_out:
            Path(args.json_out).write_text(json.dumps(summary, indent=1))
        return 0
    finally:
        shutil.rmtree(fixture, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        sys.exit(child_main())
    if len(sys.argv) > 1 and sys.argv[1] == "synth":
        sys.exit(synth_main())
    sys.exit(main())
