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
