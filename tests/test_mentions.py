"""Mention detection: spans in bounds, comparator decode, outlier
suppression, id determinism (SURVEY.md §5 property tests)."""

from pyspark.sql import functions as F

from kgforge.extract import extract_pages
from kgforge.mentions import detect_mentions


def _pages(spark):
    rows = [
        ("u1", "alpha bravo metric:temp<=23.5 charlie alpha", "en"),
        ("u2", "nothing here", "en"),
        ("u3", "metric:huge=20000000 alpha", "en"),
        ("u4", None, "en"),
    ]
    return spark.createDataFrame(rows, "url string, text string, lang string").withColumn(
        "warc_ts", F.to_timestamp(F.lit("2023-06-01 00:00:00"))
    )


def test_spans_within_bounds_and_surfaces_match(spark):
    m = detect_mentions(_pages(spark), ["alpha", "bravo", "charlie"]).collect()
    texts = {"u1": "alpha bravo metric:temp<=23.5 charlie alpha"}
    for r in m:
        if r["url"] in texts and r["kind"] == "entity":
            t = texts[r["url"]]
            assert 0 <= r["span_start"] < r["span_end"] <= len(t)
            assert t[r["span_start"] : r["span_end"]].lower() == r["surface"]


def test_numeric_comparator_and_outlier_guard(spark):
    m = detect_mentions(_pages(spark), ["alpha"])
    num = {r["url"]: r for r in m.filter(F.col("kind") == "numeric").collect()}
    assert num["u1"]["value_text"] == "LE"
    assert num["u1"]["value_num"] == 23.5
    # > 1e7 suppressed (Oracle/PCORNetLoader_ora.sql:1687 analog)
    assert num["u3"]["value_num"] is None
    assert num["u3"]["value_text"] == "E"


def test_word_boundary_matching(spark):
    pages = spark.createDataFrame(
        [("u1", "scan rescanning scanner scan", "en")],
        "url string, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2023-06-01 00:00:00")))
    m = detect_mentions(pages, ["scan"]).filter(F.col("kind") == "entity").collect()
    assert len(m) == 2  # only the standalone 'scan's


def test_mention_ids_deterministic_across_partitioning(spark):
    p = _pages(spark)
    a = sorted(r["mention_id"] for r in detect_mentions(p.repartition(1), ["alpha"]).collect())
    b = sorted(r["mention_id"] for r in detect_mentions(p.repartition(8), ["alpha"]).collect())
    assert a == b


def test_null_text_yields_no_mentions(spark):
    m = detect_mentions(_pages(spark), ["alpha"])
    assert m.filter(F.col("url") == "u4").count() == 0


def test_token_engine_byte_identical_to_regex(spark, fixture_dir):
    """The O(tokens) token engine must produce byte-identical mentions
    to the alternation-regex engine on the synthetic fixture (multi-word
    aliases, overlaps, case, numerics included) — the large-dictionary
    path cannot drift (VERDICT round-1 #10)."""
    pages = extract_pages(
        spark.read.parquet(f"{fixture_dir}/pages.parquet"), langs=("en",)
    )
    aliases = ["alpha", "bravo", "charlie", "data", "data table", "TABLE",
               "join", "hash", "alpha bravo charlie"]
    cols = ["url", "span_start", "span_end", "surface", "kind", "value_num", "value_text"]
    a = sorted(map(tuple, detect_mentions(pages, aliases, engine="regex").select(cols).collect()))
    b = sorted(map(tuple, detect_mentions(pages, aliases, engine="token").select(cols).collect()))
    assert a == b and len(a) > 0


def test_token_engine_longest_first_and_nonoverlap():
    """Unit semantics: longest alias wins at a position; matches never
    overlap; scan resumes after each match — identical to finditer over
    the longest-first alternation."""
    from kgforge.mentions import _build_token_index, _token_find, _compile_alias_regex

    aliases = ["data", "data table join", "table", "join", "big data"]
    idx = _build_token_index(aliases)
    for text in [
        "big data table join data",
        "Big DATA  table join",
        "data-table join data table join x",
        "nodata data tablejoin table",
    ]:
        got = _token_find(text, idx)
        pat = _compile_alias_regex(aliases)
        want = [(m.start(), m.end(), m.group(1).lower()) for m in pat.finditer(text)]
        assert got == want, (text, got, want)
