"""WARC ingestion: synthesis/parse round-trip, quarantine contract,
and byte-identical extraction parity with the table-ingested path."""

import gzip
import io
from datetime import datetime

import pytest

from kgforge.extract import extract_pages, extract_text_py
from kgforge.sources import HTML_PREFIX, HTML_SUFFIX, split_quarantine
from kgforge.warc import (
    WarcFormatError,
    build_warc,
    iter_warc_records,
    read_warc,
)

PAGES_A = [
    (
        "https://a.example.com/1",
        "2023-03-01T12:00:00Z",
        (HTML_PREFIX + "alpha beta gamma" + HTML_SUFFIX).encode(),
    ),
    (
        "https://a.example.com/2",
        "2023-03-02T00:30:00Z",
        (HTML_PREFIX + "delta &amp; epsilon" + HTML_SUFFIX).encode(),
    ),
]
PAGES_B = [
    (
        "https://b.example.com/1",
        "2023-04-05T06:07:08Z",
        (HTML_PREFIX + "zeta eta" + HTML_SUFFIX).encode(),
    ),
]


def test_warc_pure_roundtrip_with_extras():
    """The walker yields every record; payload bytes survive exactly;
    per-record gzip framing parses through one GzipFile stream."""
    raw = build_warc(PAGES_A, per_record_gzip=False)
    recs = list(iter_warc_records(io.BytesIO(raw)))
    # warcinfo + (request + response) per page
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo", "request", "response", "request", "response",
    ]
    gz = build_warc(PAGES_A, per_record_gzip=True)
    recs_gz = list(iter_warc_records(gzip.GzipFile(fileobj=io.BytesIO(gz))))
    assert [(h, b) for h, b in recs] == [(h, b) for h, b in recs_gz]
    resp = [b for h, b in recs if h["warc-type"] == "response"]
    for (url, _, payload), block in zip(PAGES_A, resp):
        assert block.endswith(payload)


def test_warc_read_filters_and_parses(spark, tmp_path):
    (tmp_path / "seg0.warc").write_bytes(build_warc(PAGES_A))
    (tmp_path / "seg1.warc.gz").write_bytes(
        build_warc(PAGES_B, per_record_gzip=True)
    )
    good, bad = split_quarantine(read_warc(spark, str(tmp_path)))
    assert bad.count() == 0
    rows = {r["url"]: r for r in good.collect()}
    # only the 3 response records become rows (warcinfo/request skipped)
    assert len(rows) == 3
    for url, date, payload in PAGES_A + PAGES_B:
        r = rows[url]
        assert bytes(r["html"]) == payload
        assert r["warc_ts"] == datetime.fromisoformat(date[:-1])
        assert r["text"] is None and r["lang"] is None


def test_warc_truncated_file_quarantines_remainder(spark, tmp_path):
    raw = build_warc(PAGES_A)
    # chop mid-way through the LAST record's payload: the good prefix
    # must survive, the damage must surface as exactly one quarantine row
    (tmp_path / "trunc.warc").write_bytes(raw[: len(raw) - 30])
    good, bad = split_quarantine(read_warc(spark, str(tmp_path)))
    assert [r["url"] for r in good.collect()] == [PAGES_A[0][0]]
    quarantined = bad.collect()
    assert len(quarantined) == 1
    assert "trunc.warc" in quarantined[0]["raw_line"]
    assert "truncated record" in quarantined[0]["raw_line"]


def test_warc_walker_rejects_garbage():
    with pytest.raises(WarcFormatError):
        list(iter_warc_records(io.BytesIO(b"HTTP/1.1 200 OK\r\n\r\n")))


def test_warc_pages_extract_byte_identical(spark, tmp_path):
    """WARC-ingested pages run through the SAME extraction as
    table-ingested pages: extracted text equals the pure function of
    the payload bytes, html-entity decoding and boilerplate removal
    included."""
    (tmp_path / "seg.warc.gz").write_bytes(
        build_warc(PAGES_A, per_record_gzip=True)
    )
    good, _ = split_quarantine(read_warc(spark, str(tmp_path)))
    ext = {r["url"]: r["text"] for r in extract_pages(good, langs=None).collect()}
    for url, _, payload in PAGES_A:
        assert ext[url] == extract_text_py(payload)
    assert ext[PAGES_A[1][0]] == "delta & epsilon"
