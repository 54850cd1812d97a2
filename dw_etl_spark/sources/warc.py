"""WARC (Web ARChive, ISO 28500) source — the container CommonCrawl
ships, parsed with stdlib only: a WARC file is concatenated records
(``WARC/1.0`` + CRLF headers + Content-Length block + CRLF CRLF), and
the ``.warc.gz`` form is MULTI-MEMBER gzip (one member per record),
which ``zlib`` decompresses end-to-end by design. Response records
carry a full HTTP response; the parser splits status/headers from the
body so downstream sees page bytes, ready for
``functions.text.html_to_text`` → quality → dedup — the complete
crawl-to-corpus front door.

Scale shape:

- WARC.gz is NOT block-splittable (gzip members carry no sync marks a
  generic reader can find), so the unit of parallelism is the FILE —
  exactly how CommonCrawl is consumed in practice: ~1 GB segment
  files, thousands per crawl, one task per file.
  ``spark.read.format("binaryFile")`` lists and distributes the
  files; an Arrow-batched ``mapInPandas`` parses each one and emits
  record rows. 100 TB = ~100k files → healthy task counts with zero
  shuffle in the parse itself.
- Parsed output is record-sized rows (url, date, type, body) — callers
  should ``repartition`` after heavy filtering, since the parse
  inherits file-granular partitioning.
- Memory: one file's decompressed records stream through an iterator;
  the parser never materializes more than one record block at a time
  beyond the raw file bytes Spark already holds. Cap concurrent file
  size exposure with ``binaryFile``'s ``pathGlobFilter`` and the
  driver-side listing — standard practice is fixed ~1 GB segments.

Record framing reference: ISO 28500 §4 (warc-file = 1*warc-record;
each record = header CRLF block CRLF CRLF).
"""

from __future__ import annotations

import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_RECORD_SCHEMA = (
    "warc_file string, warc_type string, url string, warc_date string, "
    "content_type string, http_status int, http_content_type string, "
    "body binary, n_bytes long"
)


def _read_headers(buf: io.BufferedReader) -> dict[str, str] | None:
    """Read a CRLF-terminated header block; None at clean EOF."""
    # skip inter-record blank lines
    line = buf.readline()
    while line in (b"\r\n", b"\n"):
        line = buf.readline()
    if not line:
        return None
    headers: dict[str, str] = {}
    first = line.decode("latin-1").strip()
    headers["__version__"] = first
    while True:
        line = buf.readline()
        if line in (b"\r\n", b"\n", b""):
            break
        s = line.decode("latin-1").rstrip("\r\n")
        if ":" in s:
            k, v = s.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers


def split_http_response(block: bytes) -> tuple[int | None, str, bytes]:
    """HTTP response bytes → (status, content-type, body). A block
    that is not an HTTP response comes back (None, '', block)."""
    if not block.startswith(b"HTTP/"):
        return None, "", block
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        sep = block.find(b"\n\n")
        head, body = (block, b"") if sep < 0 else (block[:sep], block[sep + 2:])
    else:
        head, body = block[:sep], block[sep + 4:]
    lines = head.decode("latin-1", "replace").split("\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = ""
    for ln in lines[1:]:
        if ln.lower().startswith("content-type:"):
            ctype = ln.split(":", 1)[1].strip()
            break
    return status, ctype, body


def parse_warc(payload: bytes) -> Iterator[dict]:
    """Iterate records of one WARC file's bytes (gz or plain). Each
    yielded dict: warc_type, url, warc_date, content_type,
    http_status, http_content_type, body (HTTP body for responses,
    raw block otherwise)."""
    if payload[:2] == b"\x1f\x8b":
        import zlib

        # multi-member gzip: loop decompressobj over the stream
        out = bytearray()
        rest = bytes(payload)
        while rest:
            d = zlib.decompressobj(wbits=31)
            out += d.decompress(rest)
            out += d.flush()
            rest = d.unused_data
        payload = bytes(out)
    buf = io.BufferedReader(io.BytesIO(payload))
    while True:
        headers = _read_headers(buf)
        if headers is None:
            return
        if not headers["__version__"].startswith("WARC/"):
            raise ValueError(
                f"not a WARC record header: {headers['__version__']!r}"
            )
        length = int(headers.get("content-length", "0"))
        block = buf.read(length)
        status, http_ct, body = split_http_response(block)
        yield {
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "http_status": status,
            "http_content_type": http_ct,
            "body": body,
        }


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Distributed WARC scan: one task per file (see module scale
    notes), Arrow-batched parse, one row per record of the requested
    ``record_types`` (default: responses — the page payloads)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    wanted = set(record_types)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc(bytes(content)):
                    if wanted and rec["warc_type"] not in wanted:
                        continue
                    body = rec["body"]
                    rows.append(
                        {
                            "warc_file": fpath,
                            "warc_type": rec["warc_type"],
                            "url": rec["url"],
                            "warc_date": rec["warc_date"],
                            "content_type": rec["content_type"],
                            "http_status": rec["http_status"],
                            "http_content_type": rec["http_content_type"],
                            "body": body,
                            "n_bytes": len(body),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "warc_type", "url", "warc_date",
                    "content_type", "http_status", "http_content_type",
                    "body", "n_bytes",
                ],
            )

    return files.mapInPandas(run, WARC_RECORD_SCHEMA)


def write_warc(records: list[dict], gz: bool = False) -> bytes:
    """Serialize records into WARC bytes (the test-fixture twin of
    ``parse_warc``; also handy for golden files). Each record dict:
    ``warc_type``, ``url``, ``warc_date``, and either ``http`` =
    (status, content_type, body bytes) for response records or
    ``block`` = raw bytes. ``gz=True`` emits one gzip member per
    record — the CommonCrawl layout."""
    import gzip

    out = bytearray()
    for rec in records:
        if "http" in rec:
            status, ctype, body = rec["http"]
            block = (
                f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("latin-1") + body
            warc_ct = "application/http;msgtype=response"
        else:
            block = rec["block"]
            warc_ct = rec.get("content_type", "application/octet-stream")
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rec['warc_type']}\r\n"
            f"WARC-Target-URI: {rec.get('url', '')}\r\n"
            f"WARC-Date: {rec.get('warc_date', '2024-01-01T00:00:00Z')}\r\n"
            f"Content-Type: {warc_ct}\r\n"
            f"Content-Length: {len(block)}\r\n\r\n"
        ).encode("latin-1")
        record = head + block + b"\r\n\r\n"
        out += gzip.compress(record) if gz else record
    return bytes(out)
