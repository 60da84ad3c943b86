"""Canonicalization: CC correctness, MinHash behavior, idempotence,
parallelism-independence, salting equivalence (SURVEY.md §5, §7.5)."""

from pyspark.sql import functions as F

from kgforge.canon import (
    canonicalize,
    candidate_pairs,
    connected_components,
    lsh_blocks,
    minhash_signatures,
    salted_agg,
)


def test_connected_components_known_graph(spark):
    """Components of size 1..5 plus one hub star — canonical = min id."""
    edges = [
        (1, 2), (2, 3),            # {1,2,3}
        (10, 11),                  # {10,11}
        (20, 21), (21, 22), (22, 23), (20, 23),  # cycle {20..23}
    ] + [(100, 100 + i) for i in range(1, 40)]   # hub star {100..139}
    e = spark.createDataFrame(edges, "src long, dst long")
    for forced in (False, True):  # local union-find AND distributed loop
        got = {
            r["node"]: r["comp"]
            for r in connected_components(e, force_distributed=forced).collect()
        }
        assert got[1] == got[2] == got[3] == 1
        assert got[10] == got[11] == 10
        assert got[20] == got[21] == got[22] == got[23] == 20
        assert all(got[100 + i] == 100 for i in range(40))


def test_minhash_identical_texts_identical_sigs(spark):
    df = spark.createDataFrame(
        [("a", "the quick brown fox jumps over the lazy dog"),
         ("b", "the quick brown fox jumps over the lazy dog"),
         ("c", "completely different words entirely here now")],
        "url string, text string",
    )
    sigs = {r["url"]: tuple(r["sig"]) for r in minhash_signatures(df).collect()}
    assert sigs["a"] == sigs["b"]
    assert sigs["a"] != sigs["c"]


def test_lsh_block_cap_counts_drops(spark):
    """Oversized LSH blocks are dropped AND counted — no silent caps."""
    df = spark.createDataFrame(
        [(f"u{i}", "same text for everyone here today") for i in range(50)],
        "url string, text string",
    )
    blocks = lsh_blocks(minhash_signatures(df))
    pairs, metrics = candidate_pairs(blocks, max_block=10)
    assert pairs.count() == 0  # every block oversized -> all dropped
    m = metrics.collect()
    assert m and all(r["metric"] == "lsh_block_dropped" for r in m)
    assert sum(r["value"] for r in m) == 50 * 32  # 50 ids x 32 bands


def test_canonicalize_finds_near_dups_and_is_idempotent(spark, fixture_dir):
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet").select("url", "text")
    mapping, _ = canonicalize(pages)
    rows = {r["url"]: r["canon_url"] for r in mapping.collect()}
    # known near-dups: each mirror lands in the same component as its
    # source page (golden is_dup_of); representative is min(component)
    golden = spark.read.parquet(f"{fixture_dir}/golden_pages.parquet")
    dups = [
        (r["url"], r["is_dup_of"])
        for r in golden.filter("is_dup_of is not null").collect()
    ]
    assert dups
    hit = sum(1 for m, src in dups if rows[m] == rows[src])
    assert hit / len(dups) >= 0.95
    # idempotence: canonicalizing the canonical representatives is identity
    reps = spark.createDataFrame(
        [(v,) for v in sorted(set(rows.values()))], "url string"
    ).join(pages, "url", "inner")
    mapping2, _ = canonicalize(reps)
    assert all(r["url"] == r["canon_url"] for r in mapping2.collect())


def test_canonicalize_parallelism_independent(spark, fixture_dir):
    """local[8]-vs-local[32] determinism evidence, in-session: the same
    input at 1 vs 16 partitions produces the identical mapping."""
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet").select("url", "text")
    m1, _ = canonicalize(pages.repartition(1))
    m16, _ = canonicalize(pages.repartition(16))
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m16.collect()))


def test_cc_materializes_edges_once(spark):
    """The edge plan (= the expensive verification chain upstream) runs
    exactly once regardless of branch: connected_components checkpoints
    it before the size probe, so the distributed loop's per-round joins
    and the probe both read materialized blocks (VERDICT r02 wart #1)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    acc = spark.sparkContext.accumulator(0)

    @pandas_udf(T.LongType())
    def tick(s: pd.Series) -> pd.Series:
        acc.add(len(s))
        return s

    base = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "src long, dst long"
    )
    for forced, expected in ((True, 4), (False, 4)):
        acc.value = 0
        edges = base.select(tick(F.col("src")).alias("src"), "dst")
        got = {
            r["node"]: r["comp"]
            for r in connected_components(edges, force_distributed=forced).collect()
        }
        assert got[3] == 1 and got[11] == 10 and got[21] == 20
        assert acc.value == expected, (
            f"edge plan evaluated {acc.value} rows for {expected} edges "
            f"(force_distributed={forced}) — verification re-executed"
        )


def test_salted_agg_equals_plain_agg(spark, fixture_dir):
    """Salted two-phase aggregation == direct aggregation (hub-key path,
    SURVEY.md §7.5)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plain = {
        (r["event_type"],): (r["n"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        (r["event_type"],): (r["n"], r["mx"])
        for r in salted_agg(
            ev, ["event_type"], {"n": ("value", "count"), "mx": ("value", "max")}
        ).collect()
    }
    assert plain == salted


def test_local_cc_threshold_policy(spark):
    """The local/distributed CC cutover derives from spark.driver.memory
    (round-4 VERDICT item): the budget scales with the heap, is bounded
    both ways, and degrades to the 1g default on absent/unparseable
    conf. Duck-typed fake sessions cover confs the live session can't
    switch to at runtime (driver memory is a static conf)."""
    from kgforge.canon import (
        LOCAL_CC_EDGE_BYTES,
        LOCAL_CC_MAX,
        LOCAL_CC_MEM_FRACTION,
        LOCAL_CC_MIN,
        _parse_mem_bytes,
        local_cc_threshold,
    )

    assert _parse_mem_bytes("512m") == 512 * 1024**2
    assert _parse_mem_bytes("64g") == 64 * 1024**3
    assert _parse_mem_bytes("2048") == 2048
    assert _parse_mem_bytes(None) == 1024**3
    assert _parse_mem_bytes("not-a-size") == 1024**3

    class _FakeConf:
        def __init__(self, v):
            self._v = v

        def get(self, key, default=None):
            return self._v if self._v is not None else default

    class _FakeSpark:
        def __init__(self, mem):
            self.conf = _FakeConf(mem)

    one_g = local_cc_threshold(_FakeSpark("1g"))
    assert one_g == int(1024**3 * LOCAL_CC_MEM_FRACTION) // LOCAL_CC_EDGE_BYTES
    assert 400_000 < one_g < 500_000  # continuous with the old constant
    eight_g = local_cc_threshold(_FakeSpark("8g"))
    assert eight_g == int((8 * 1024**3 * LOCAL_CC_MEM_FRACTION) // LOCAL_CC_EDGE_BYTES)
    assert abs(eight_g - 8 * one_g) <= 8  # scales with the heap (float-floor slack)
    assert local_cc_threshold(_FakeSpark("1m")) == LOCAL_CC_MIN  # floor
    assert local_cc_threshold(_FakeSpark("4t")) == LOCAL_CC_MAX  # cap
    # the live session resolves through the same path without error
    assert local_cc_threshold(spark) >= LOCAL_CC_MIN


def test_connected_components_reports_branch(spark):
    """Both branch selections surface through the info dict, and
    canonicalize records the decision as cc_* metrics rows."""
    e = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    info: dict = {}
    connected_components(e, info=info).collect()
    assert info["branch"] == "local"
    assert info["n_edges_probed"] == 2
    assert info["threshold"] >= 10_000

    info2: dict = {}
    connected_components(e, force_distributed=True, info=info2).collect()
    assert info2["branch"] == "distributed"

    pages = spark.createDataFrame(
        [("u1", "alpha beta gamma delta epsilon zeta eta theta"),
         ("u2", "alpha beta gamma delta epsilon zeta eta theta"),
         ("u3", "totally different text with other words inside")],
        "url string, text string",
    )
    _mapping, metrics = canonicalize(pages)
    m = {r["metric"]: r for r in metrics.collect()}
    assert m["cc_branch"]["key"] == "local"
    assert m["cc_threshold"]["value"] >= 10_000
