"""Stage-1 extraction: byte-identity + determinism (FIXTURES.md, §5)."""

import pandas as pd
from pyspark.sql import functions as F

from kgforge.extract import extract_pages, extract_text_py, extraction_checksums


def _clean_mask(html: bytes) -> bool:
    return html.endswith(b"</html>") and b"</p>" in html


def test_extraction_byte_identity(spark, fixture_dir):
    """For well-formed pages, extracted text == generator ground truth,
    byte for byte (the input_hint per-row invariant)."""
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet")
    golden = pd.read_parquet(f"{fixture_dir}/golden_pages.parquet")
    got = (
        extract_pages(pages, langs=None)
        .select("url", "text")
        .toPandas()
        .set_index("url")["text"]
    )
    raw = pages.select("url", "html").toPandas().set_index("url")["html"]
    checked = 0
    for url, truth in golden.set_index("url")["true_text"].items():
        if _clean_mask(bytes(raw[url])):
            assert got[url] == truth, f"byte mismatch for {url}"
            checked += 1
    assert checked > 100  # most pages are clean


def test_extraction_deterministic_across_layouts(spark, fixture_dir):
    """Same md5 per url no matter how the input is partitioned — the
    sandbox evidence for partition-layout independence."""
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet")
    one = extraction_checksums(pages.repartition(1)).toPandas()
    many = extraction_checksums(pages.repartition(16)).toPandas()
    a = one.sort_values("url").reset_index(drop=True)
    b = many.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_extraction_handles_dirty_bytes():
    """Malformed tags and non-UTF8 bytes produce deterministic output,
    never exceptions."""
    bad = b"<html><body><p>hello</p\xff\xfe<footer>x</footer></body></html>"
    out1 = extract_text_py(bad)
    out2 = extract_text_py(bad)
    assert out1 == out2
    assert "hello" in out1
    assert extract_text_py(None) is None


def test_lang_filter_pushed(spark, fixture_dir):
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet")
    out = extract_pages(pages, langs=("en",))
    assert out.filter(F.col("lang") != "en").count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "lang" in plan  # filter visible in the physical plan
