"""Physical-plan hygiene gates.

The scale posture is made of plan properties (broadcasts, pushdown,
column pruning, no cartesian products, codegen). These tests pin them
structurally so a refactor that silently degrades the plan — a
broadcast hint lost, a filter no longer reaching the scan — fails CI
even while outputs stay correct at test scale.
"""

import contextlib
import io

from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_linker_is_broadcast_no_cartesian(spark, sf001):
    """The mention->dictionary join must broadcast the dictionary: the
    corpus side of the linker is never shuffled (SURVEY.md §3.2)."""
    from kgforge.pipeline import _candidates

    plan = plan_of(_candidates(spark, sf001))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_filtered_scan_pushdown_and_pruning(spark, sf001):
    """Filters reach the parquet scan and the scan reads only the
    projected columns — the PushedFilters/ReadSchema discipline."""
    from kgforge.operators.relational import QUERIES

    plan = plan_of(QUERIES["rel_filtered_scan"](spark, sf001))
    assert "PushedFilters: [" in plan
    # at least one real pushed predicate, not an empty list
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip()
    # column pruning: lineitem is 16 columns; the scan schema must not
    # carry all of them
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert read_schema.count(",") < 10


def test_minhash_pair_path_no_cartesian(spark, sf001):
    from kgforge.operators.dedup import dd_minhash_lsh

    plan = plan_of(dd_minhash_lsh(spark, sf001))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_triples_plan_broadcasts_sparse_mapping(spark, sf001):
    """all_triples joins the corpus against the NON-identity mapping
    rows; that side is duplicate-pages-sized and must broadcast (or at
    minimum never drive a cartesian)."""
    from kgforge.pipeline import _triples

    plan = plan_of(_triples(spark, sf001))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_textstats_stays_jvm_side(spark, sf001):
    """tx_quality is all built-in expressions — no Python evaluation
    node anywhere, and the scan stays columnar (Batched: true). The
    formatted AQE plan does not label codegen spans, so absence of
    Batch/ArrowEvalPython IS the JVM-side assertion."""
    from kgforge.operators.textstats import QUERIES

    plan = plan_of(QUERIES["tx_quality"](spark, sf001))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Batched: true" in plan


def test_span_emitter_broadcasts_periods(spark):
    """The curated-periods side of the span emitter is metadata-scale
    and must broadcast — the corpus-side span aggregate is the only
    exchange."""
    from kgforge.emit import emit_span_triples

    pages = spark.createDataFrame(
        [("u1", "2023-01-01 00:00:00")], "url string, ts string"
    ).selectExpr("url", "CAST(ts AS TIMESTAMP) AS warc_ts")
    mapping = spark.createDataFrame([], "url string, canon_url string")
    periods = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", "2024-02-01 00:00:00")],
        "subj string, ps string, pe string",
    ).selectExpr(
        "subj",
        "CAST(ps AS TIMESTAMP) AS period_start",
        "CAST(pe AS TIMESTAMP) AS period_end",
    )
    plan = plan_of(emit_span_triples(pages, mapping, periods))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_round4_ops_stay_jvm_side(spark, sf001):
    """The r4 training-data ops (repetition stats, passage dedup, URL
    canonicalization) are pure built-in expressions: no Python
    evaluation node, no cartesian, and the documents scan stays
    columnar. The passage chunker in particular must NOT explode before
    hashing — md5 happens in the same project as the chunk slice, so
    the shuffle carries (hash, doc_id) only."""
    from kgforge.operators.dedup import dd_passage, dd_url
    from kgforge.operators.textstats import QUERIES as TXQ

    for q in (dd_passage, dd_url, TXQ["tx_repetition"]):
        plan = plan_of(q(spark, sf001))
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
    plan = plan_of(TXQ["tx_repetition"](spark, sf001))
    assert "Batched: true" in plan


def test_assoc_broadcasts_total_and_avoids_cartesian(spark):
    """kg_assoc's corpus-size constant N joins as a 1-row broadcast —
    the only acceptable 'cross join' shape — and the pair fan-out is an
    equi-join on url, never a cartesian."""
    from kgforge.operators.graph import assoc_scores

    pe = spark.createDataFrame(
        [("p1", "x"), ("p1", "y"), ("p2", "x")], "url string, entity string"
    )
    plan = plan_of(assoc_scores(pe))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row N broadcast


def test_sample_is_zero_shuffle_codegen(spark, sf001):
    """The stratified sampler is a pure per-row function: no exchange,
    no Python eval, whole-stage codegen over the scan."""
    from kgforge.operators.textstats import tx_sample

    plan = plan_of(tx_sample(spark, sf001).limit(10))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Batched: true" in plan


def test_decontam_broadcasts_eval_grams(spark, sf001):
    """Decontam's two joins (eval-gram semi-join, hit-count re-attach)
    must both broadcast — the corpus side never shuffles — and the
    gram fan-out is hashed before any join (no raw 13-word strings in
    the plan's join keys)."""
    from kgforge.operators.textstats import tx_decontam

    plan = plan_of(tx_decontam(spark, sf001))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_shuffles_only_on_shard(spark, sf001):
    """Sequence packing's window must partition by the shard key — a
    global (unpartitioned) window would funnel the corpus through one
    reducer. The plan may contain the shard hash exchange and nothing
    single-partition."""
    from kgforge.operators.textstats import tx_pack

    plan = plan_of(tx_pack(spark, sf001).limit(10))
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _strip_fanout(plan: str) -> str:
    """Rename the declared local-fixture fan-out exchange (r06: a hash
    repartition by doc_id immediately after the one-row-group local
    scan — the guide §2.5 unsplittable-input remedy; a 100-TB table
    arrives as thousands of splits and never adds it) so zero-shuffle
    assertions keep guarding against every OTHER exchange."""
    import re

    out = plan
    for node_id in re.findall(
        r"\((\d+)\) Exchange\nInput [^\n]*\nArguments: hashpartitioning\(doc_id#",
        plan,
    ):
        out = out.replace(f"({node_id}) Exchange", f"({node_id}) Fanout")
        out = out.replace(f"Exchange ({node_id})", f"Fanout ({node_id})")
    return out


def test_redact_is_zero_shuffle_codegen(spark, sf001):
    from kgforge.operators.textstats import tx_redact

    plan = plan_of(tx_redact(spark, sf001).limit(10))
    # ordered limit folds to TakeOrdered; only the fan-out exchange may appear
    assert "Exchange" not in _strip_fanout(plan)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Batched: true" in plan


def test_global_topk_prunes_map_side(spark, sf001):
    """tx_vocab / tx_bpe rank through global_topk: Spark does NOT infer
    WindowGroupLimit for unpartitioned rank windows (verified — the
    single-window form funnels the whole vocabulary through one
    reducer), so the two-phase plan must show (a) the bucket-partitioned
    phase with its map-side WindowGroupLimit pre-prune and (b) the
    bucket exchange; and stay JVM-side throughout."""
    from kgforge.operators.textstats import tx_bpe, tx_vocab

    for q in (tx_vocab, tx_bpe):
        plan = plan_of(q(spark, sf001))
        assert "WindowGroupLimit" in plan
        assert "hashpartitioning(_tkb" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan


def test_classify_is_zero_shuffle_codegen(spark, sf001):
    """The hashed linear classifier is a pure per-row fold: no exchange,
    no Python eval, whole-stage codegen over the scan."""
    from kgforge.operators.textstats import tx_classify

    plan = plan_of(tx_classify(spark, sf001).limit(10))
    assert "Exchange" not in _strip_fanout(plan)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Batched: true" in plan


def test_scd2_single_window_exchange_on_key(spark, sf001):
    """SCD2 computes lead + row_number in ONE window pass: exactly one
    exchange, hash-partitioned on the (user_id, event_type) key — never
    a global window."""
    from kgforge.operators.relational import q_scd2

    plan = plan_of(q_scd2(spark, sf001).limit(10))
    assert "hashpartitioning(user_id" in plan
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_probe_broadcasts_and_never_shuffles_probe_side(spark):
    """The bloom membership test must be a broadcast join on the word
    index — probing may not shuffle the probed side — and build/probe
    stay JVM-side."""
    from pyspark.sql import functions as F

    from kgforge.operators import bloom as B

    big = spark.range(0, 1000).select(F.concat(F.lit("k"), "id").alias("k"))
    bl = B.bloom_build(big.limit(100), B.h60_md5(F.col("k")))
    plan = plan_of(B.bloom_probe(big, B.h60_md5(F.col("k")), bl))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_registry_wide_plan_hygiene(spark, sf001):
    """Sweep EVERY registered driver query (plus the bench-only
    standalones) and pin the two global plan invariants the point
    tests above check locally:

    - no CartesianProduct anywhere except the one labeled exact
      baseline (sim_topk_bruteforce). BroadcastNestedLoopJoin is NOT
      banned: several queries join a 1-row aggregate scalar (corpus
      constant, lazy by design) which planners express as a broadcast
      nested loop — broadcast-bounded, nothing like an all-pairs
      shuffle.
    - no BatchEvalPython anywhere: row-at-a-time Python UDFs are banned
      on the whole surface (Arrow/pandas evaluation is the only Python
      path allowed)

    Construction-time jobs (quantizer training, khop rounds) are fine —
    this inspects whatever DataFrame each query returns."""
    import __spark_entry__ as se
    from kgforge.operators import similarity

    allow_cross = {"sim_topk_bruteforce"}
    qs = dict(se.queries())
    qs["sim_topk_pq"] = similarity.QUERIES["sim_topk_pq"]
    bad = []
    for name, fn in sorted(qs.items()):
        df = fn(spark, sf001)
        plan = plan_of(df)
        if "BatchEvalPython" in plan:
            bad.append(f"{name}: row-at-a-time Python UDF")
        if name not in allow_cross and "CartesianProduct" in plan:
            bad.append(f"{name}: cartesian product")
    assert not bad, "plan hygiene violations:\n" + "\n".join(bad)


def test_winnow_is_zero_shuffle_codegen(spark, sf001):
    """Winnowing is a map-only projection: gram hashing and window mins
    are array arithmetic inside codegen, the only row fan-out is the
    final fingerprint explode — no Exchange, no Python."""
    from kgforge.operators.textstats import tx_winnow

    plan = plan_of(tx_winnow(spark, sf001))
    # the trailing orderBy is presentation; everything before it must be
    # exchange-free, so the whole plan carries at most the orderBy's
    # range exchange (and its AQE echo) plus the local fan-out.
    assert _strip_fanout(plan).count("Exchange") <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_dsir_scoring_is_broadcast_no_heavy_shuffle(spark, sf001):
    """DSIR scoring joins the corpus to a ONE-row broadcast model: the
    join must be a broadcast nested loop (1-row build side), never a
    sort-merge or cartesian; the only exchanges belong to the model
    training pass (DSIR_D-bucket hash + the single-row pack), and the
    corpus text itself never shuffles. Everything stays JVM-side."""
    from kgforge.operators.textstats import dsir
    from kgforge.sources import read_table

    plan = plan_of(dsir(read_table(spark, "documents", sf001)))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # model pass: bucket hash exchange + single-row pack; nothing else
    assert plan.count("Exchange hashpartitioning") <= 1
    assert plan.count("Exchange SinglePartition") <= 1


def test_semdedup_is_cell_blocked_no_cartesian(spark, sf001):
    """SemDeDup's pair stage must be an equi-join on the quantizer cell
    — never an all-pairs cartesian — and stay JVM-side (the quantizer,
    cap, and cosine are all codegen arithmetic, no Python)."""
    from kgforge.operators.similarity import dd_semdedup

    plan = plan_of(dd_semdedup(spark, sf001))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_no_corpus_shuffle_broadcast_candidates(spark, sf001):
    """BM25's corpus side must never hit a sort-merge join or cartesian:
    the term list rides in as a broadcast onto the one restricted
    explode pass, and scoring is a single vectorized MapInPandas over
    the per-doc tf vectors (r06) — no per-pair join of any kind, no
    row-at-a-time Python."""
    from kgforge.operators.textstats import tx_bm25

    plan = plan_of(tx_bm25(spark, sf001))
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_lmscore_and_dd_lines_model_rides_broadcast(spark, sf001):
    """The LM scorer and the line-dedup removal pass must both ship
    their trained model / boiler set as a one-row broadcast (the DSIR
    idiom): no sort-merge join, no cartesian, no Python eval — the
    corpus text never shuffles for scoring/removal, only hashed
    longs/md5s cross the wire during training."""
    from kgforge.operators.dedup import dd_lines
    from kgforge.operators.textstats import tx_lmscore

    for q in (tx_lmscore, dd_lines):
        plan = plan_of(q(spark, sf001))
        assert "SortMergeJoin" not in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__
        assert "BroadcastNestedLoopJoin" in plan, q.__name__
        assert "BatchEvalPython" not in plan, q.__name__
        assert "ArrowEvalPython" not in plan, q.__name__


def test_diversity_and_c4_are_zero_shuffle_codegen(spark, sf001):
    """Diversity stats and the C4 battery are per-doc array arithmetic:
    no Exchange, no join, no Python eval anywhere in the plan."""
    from kgforge.operators.textstats import tx_c4filter, tx_diversity

    for q in (tx_diversity, tx_c4filter):
        plan = plan_of(q(spark, sf001).limit(10))
        assert "Exchange" not in _strip_fanout(
            plan.replace("Exchange rangepartitioning", "")
        ), q.__name__
        assert "Join" not in plan, q.__name__
        assert "BatchEvalPython" not in plan, q.__name__
        assert "ArrowEvalPython" not in plan, q.__name__


def test_substr_dedup_join_shapes(spark, sf001):
    """ExactSubstr span removal: duplicated-position membership is a
    broadcast hash SEMI-join on the 8-byte gram hash (not an
    array_contains scan over a broadcast array — that first cut was
    O(npos x |dup|) per doc), and the per-doc position arrays attach
    via a SHUFFLED hash join aligned with the text side's doc_id
    partitioning — NOT a broadcast (that second cut serialized tens of
    MB of positions through the driver and capped the 4M-doc scaling
    run at 0.55 efficiency) and NOT a sort-merge join (no reason to
    sort 4M text rows). No cartesian, no nested-loop, no Python eval;
    only hashes + int positions shuffle beyond the one pinned text
    exchange."""
    from kgforge.operators.dedup import dd_substr

    plan = plan_of(dd_substr(spark, sf001))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_range_join_is_binned_equi_not_nested_loop(spark, sf001):
    """Interval containment join: the binned formulation must plan as a
    broadcast hash EQUI-join on the bucket id with the containment
    predicate as a post-join filter — never the BroadcastNestedLoopJoin
    a raw theta join degenerates to (per-event linear scan of every
    interval, quadratic at scale)."""
    from kgforge.operators.relational import q_range_join

    plan = plan_of(q_range_join(spark, sf001))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_linkgraph_extraction_zero_shuffle_codegen(spark, sf001):
    """Hyperlink extraction + resolution + canonicalization is one
    codegen pass over the page scan: no exchange, no Python eval —
    regex and string rewrites all JVM-side."""
    from kgforge.operators.graph import extract_hyperlinks, resolve_links
    from kgforge.pipeline import pages_with_links

    plan = plan_of(resolve_links(extract_hyperlinks(pages_with_links(spark, sf001))))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Batched: true" in plan


def test_linkgraph_compound_no_cartesian(spark, sf001):
    from kgforge.pipeline import kg_linkgraph

    plan = plan_of(kg_linkgraph(spark, sf001))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_host_graph_partial_aggregation(spark, sf001):
    """The host-pair rollup must partial-aggregate map-side (two
    HashAggregates around one exchange), so per-page link fan-in is
    soaked before the shuffle — the property that keeps the edge-list
    build viable when pages >> host pairs."""
    from kgforge.operators.graph import extract_hyperlinks, host_graph, resolve_links
    from kgforge.pipeline import pages_with_links

    df = host_graph(
        resolve_links(extract_hyperlinks(pages_with_links(spark, sf001)))
    ).drop("n_pages")  # count-distinct plans its own expand; degree path
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan
