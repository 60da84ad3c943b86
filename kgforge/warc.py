"""WARC ingestion — Common Crawl's native container format.

The engine's other sources bind logical tables (parquet/Iceberg,
`sources.read_table`) or line-oriented dumps (JSONL/CSV,
`sources.read_documents_text`); real Common-Crawl corpora arrive as
WARC files (ISO 28500): a concatenation of records, each a header
block (WARC/1.0 line + headers + blank line) followed by exactly
Content-Length payload bytes and a CRLF CRLF separator. Crawl segments
are gzipped with ONE GZIP MEMBER PER RECORD, so a reader can stream
records without buffering the decompressed file.

Everything here is pure Python over bytes — synthesis (`build_warc`)
and parse (`iter_warc_records`) round-trip in tests with no network,
no fixtures, no external codec, the same in-repo-pinned discipline as
`extract.extract_text_py` and the multimodal header parsers.

Reference analog: the synonym/view source-binding layer
(Oracle/PCORNetLoader_ora.sql:94-137) extended to the crawl's physical
file format, with the PERMISSIVE/quarantine contract of
`read_documents_text` (a malformed record must not kill a backfill,
and must not vanish silently either).

Scale: Common Crawl ships ~90k segment files of ~1 GB per crawl — the
parallelism unit is the FILE (binaryFile gives one task per file; at
10^12 documents the many-files convention, not intra-file splitting,
is what feeds 1000 executors). The record walk is a single forward
pass with per-record bounded memory: `gzip.GzipFile` streams the
multi-member stream, so peak memory per task is one record + the raw
compressed blob Spark already read, independent of the decompressed
file size.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from datetime import datetime, timezone
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from kgforge.sources import QUARANTINE_COL

CRLF = b"\r\n"


class WarcFormatError(ValueError):
    """Raised by the record walker on a structurally broken record."""


# ---------------------------------------------------------------------------
# synthesis — deterministic, valid WARC bytes for tests/benchmarks
# ---------------------------------------------------------------------------


def _record(headers: list[tuple[str, str]], block: bytes) -> bytes:
    head = b"WARC/1.0" + CRLF
    head += b"".join(
        f"{k}: {v}".encode("utf-8") + CRLF for k, v in headers
    )
    head += f"Content-Length: {len(block)}".encode() + CRLF + CRLF
    return head + block + CRLF + CRLF


def _rec_id(seed: str) -> str:
    h = hashlib.md5(seed.encode("utf-8")).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def build_warc(
    pages: Iterable[tuple[str, str, bytes]],
    per_record_gzip: bool = False,
    with_extras: bool = True,
) -> bytes:
    """pages = (url, iso8601_date, html_payload) triples -> WARC bytes.

    `with_extras` interleaves the record types a real crawl carries —
    a leading warcinfo record and a request record before each
    response — so round-trip tests prove the reader FILTERS rather
    than merely splits. `per_record_gzip` emits the one-gzip-member-
    per-record framing of real .warc.gz segments (multi-member)."""
    out: list[bytes] = []

    def emit(rec: bytes) -> None:
        out.append(gzip.compress(rec, 6, mtime=0) if per_record_gzip else rec)

    if with_extras:
        emit(
            _record(
                [
                    ("WARC-Type", "warcinfo"),
                    ("WARC-Date", "2023-01-01T00:00:00Z"),
                    ("WARC-Record-ID", _rec_id("warcinfo")),
                    ("Content-Type", "application/warc-fields"),
                ],
                b"software: kgforge-synth\r\nformat: WARC File Format 1.0\r\n",
            )
        )
    for url, date, payload in pages:
        if with_extras:
            emit(
                _record(
                    [
                        ("WARC-Type", "request"),
                        ("WARC-Target-URI", url),
                        ("WARC-Date", date),
                        ("WARC-Record-ID", _rec_id("req|" + url)),
                        ("Content-Type", "application/http; msgtype=request"),
                    ],
                    b"GET / HTTP/1.1\r\nHost: h\r\n\r\n",
                )
            )
        http = (
            b"HTTP/1.1 200 OK" + CRLF
            + b"Content-Type: text/html; charset=utf-8" + CRLF
            + f"Content-Length: {len(payload)}".encode() + CRLF + CRLF
            + payload
        )
        emit(
            _record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Target-URI", url),
                    ("WARC-Date", date),
                    ("WARC-Record-ID", _rec_id("resp|" + url)),
                    ("Content-Type", "application/http; msgtype=response"),
                ],
                http,
            )
        )
    return b"".join(out)


# ---------------------------------------------------------------------------
# parse — single forward pass, per-record bounded memory
# ---------------------------------------------------------------------------


def _read_headers(stream) -> tuple[dict[str, str], bool]:
    """Read one record's header block. Returns ({}, False) on clean EOF."""
    line = stream.readline()
    while line in (CRLF, b"\n"):  # inter-record padding
        line = stream.readline()
    if not line:
        return {}, False
    if not line.startswith(b"WARC/"):
        raise WarcFormatError(f"expected WARC/ version line, got {line[:40]!r}")
    headers: dict[str, str] = {}
    while True:
        line = stream.readline()
        if line in (CRLF, b"\n"):
            return headers, True
        if not line or b":" not in line:
            raise WarcFormatError(f"malformed header line {line[:40]!r}")
        k, v = line.split(b":", 1)
        headers[k.strip().lower().decode("ascii")] = v.strip().decode(
            "utf-8", errors="replace"
        )


def iter_warc_records(stream) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (headers, block) per record from a binary stream (plain
    file or GzipFile over a multi-member .warc.gz). Raises
    WarcFormatError mid-iteration on structural damage; records already
    yielded stay valid — the caller quarantines the remainder."""
    while True:
        headers, more = _read_headers(stream)
        if not more:
            return
        try:
            n = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise WarcFormatError(f"bad Content-Length: {e}") from e
        block = stream.read(n)
        if len(block) != n:
            raise WarcFormatError(
                f"truncated record: wanted {n} payload bytes, got {len(block)}"
            )
        sep = stream.read(4)
        if sep not in (CRLF + CRLF, b""):
            raise WarcFormatError(f"missing record separator, got {sep!r}")
        yield headers, block


def _http_payload(block: bytes) -> bytes:
    """Strip the HTTP response head from an application/http block."""
    i = block.find(CRLF + CRLF)
    return block[i + 4 :] if i >= 0 else block


def _parse_warc_date(s: str | None):
    if not s:
        return None
    try:
        return (
            datetime.fromisoformat(s.replace("Z", "+00:00"))
            .astimezone(timezone.utc)
            .replace(tzinfo=None)  # session timezone is pinned UTC
        )
    except ValueError:
        return None


WARC_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField(QUARANTINE_COL, T.StringType(), True),
    ]
)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) -> pages frame in the input_hint shape
    (url, warc_ts, html, text, lang) + the quarantine column.

    Only response records become rows (request/metadata/warcinfo are
    skipped, as are non-http responses); `text`/`lang` are left null —
    extraction is `extract.extract_pages`'s job, so WARC-ingested and
    table-ingested pages go through the SAME byte-identical path. A
    structurally broken file yields its good prefix plus ONE quarantine
    row naming the file and the error (the read_documents_text
    contract); use `sources.split_quarantine` on the result.
    """
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang", QUARANTINE_COL]
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                raw = io.BytesIO(bytes(content))
                stream = (
                    gzip.GzipFile(fileobj=raw) if fpath.endswith(".gz") else raw
                )
                rows: list[tuple] = []
                try:
                    for h, block in iter_warc_records(stream):
                        if h.get("warc-type") != "response":
                            continue
                        if not h.get("content-type", "").startswith(
                            "application/http"
                        ):
                            continue
                        rows.append(
                            (
                                h.get("warc-target-uri"),
                                _parse_warc_date(h.get("warc-date")),
                                _http_payload(block),
                                None,
                                None,
                                None,
                            )
                        )
                except (WarcFormatError, OSError, EOFError) as e:
                    rows.append((None, None, None, None, None, f"{fpath}: {e}"))
                yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(walk, schema=WARC_PAGES_SCHEMA)
