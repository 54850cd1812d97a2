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
- Memory: the parse is INCREMENTAL end to end. Gzip members are
  inflated one at a time into ``_IncrementalWarcParser`` (a bounded
  feed/drain buffer that yields each record as soon as its block is
  complete and frees it), and ``read_warc`` emits bounded pandas
  chunks (every ``chunk_records`` records or ``chunk_bytes`` body
  bytes) instead of one frame per file. Peak per-task memory is the
  raw compressed bytes Spark's ``binaryFile`` column already holds +
  one gzip member + one record block + one output chunk — NOT the
  whole decompressed file (a ~1 GB CommonCrawl segment inflates
  4-5×; holding it would multiply task memory). Cap concurrent file
  size exposure with ``binaryFile``'s ``pathGlobFilter`` and the
  driver-side listing — standard practice is fixed ~1 GB segments.

Record framing reference: ISO 28500 §4 (warc-file = 1*warc-record;
each record = header CRLF block CRLF CRLF).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_RECORD_SCHEMA = (
    "warc_file string, warc_type string, url string, warc_date string, "
    "content_type string, http_status int, http_content_type string, "
    "body binary, n_bytes long"
)


def _parse_header_block(block: bytes) -> dict[str, str]:
    """Decode one record's CRLF header block (version line + fields)."""
    headers: dict[str, str] = {}
    lines = block.decode("latin-1").splitlines()
    headers["__version__"] = lines[0].strip() if lines else ""
    for s in lines[1:]:
        if ":" in s:
            k, v = s.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers


class _IncrementalWarcParser:
    """Feed/drain record framer: push decompressed byte chunks in,
    pull completed records out, never holding more than the bytes of
    the record currently in flight. This is what makes the module's
    memory claim true — ``feed`` is called once per gzip member (or
    once for a plain file) and the internal buffer is trimmed as each
    record completes.

    States: ``_need is None`` → scanning for the next header block's
    blank-line terminator; else ``_need = (headers, total_len)`` →
    waiting for the record's Content-Length block to be complete.
    """

    def __init__(self) -> None:
        self._buf = bytearray()
        self._need: tuple[dict[str, str], int] | None = None

    def feed(self, chunk: bytes) -> Iterator[dict]:
        self._buf += chunk
        yield from self._drain()

    def finish(self) -> Iterator[dict]:
        yield from self._drain()
        if self._need is not None or self._buf.strip(b"\r\n"):
            raise ValueError(
                "truncated WARC input: "
                f"{len(self._buf)} unconsumed bytes at EOF"
            )

    def _drain(self) -> Iterator[dict]:
        while True:
            if self._need is None:
                # skip inter-record blank lines
                start = 0
                while self._buf[start:start + 2] == b"\r\n":
                    start += 2
                while self._buf[start:start + 1] == b"\n":
                    start += 1
                if start:
                    del self._buf[:start]
                if not self._buf:
                    return
                # take whichever blank-line terminator occurs FIRST:
                # preferring \r\n\r\n found ANYWHERE would mis-frame an
                # LF-delimited WARC header whose record block contains
                # CRLF HTTP headers (the CRLF blank line inside the
                # body would win over the earlier \n\n header end)
                end_crlf = self._buf.find(b"\r\n\r\n")
                end_lf = self._buf.find(b"\n\n")
                if end_crlf >= 0 and (end_lf < 0 or end_crlf < end_lf):
                    end, nl = end_crlf, 4
                elif end_lf >= 0:
                    end, nl = end_lf, 2
                else:
                    return  # header incomplete: wait for more bytes
                headers = _parse_header_block(bytes(self._buf[:end]))
                if not headers["__version__"].startswith("WARC/"):
                    raise ValueError(
                        "not a WARC record header: "
                        f"{headers['__version__']!r}"
                    )
                del self._buf[:end + nl]
                self._need = (headers, int(headers.get("content-length", "0")))
            headers, length = self._need
            if len(self._buf) < length:
                return  # block incomplete: wait for more bytes
            block = bytes(self._buf[:length])
            del self._buf[:length]
            self._need = None
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
    raw block otherwise).

    Incremental: gzip members are inflated ONE AT A TIME and fed to
    ``_IncrementalWarcParser``, which yields each record as soon as
    its block is complete and frees the consumed bytes — the full
    decompressed file is never materialized (only the compressed
    ``payload`` the caller already holds, plus the member/record in
    flight)."""
    parser = _IncrementalWarcParser()
    if payload[:2] == b"\x1f\x8b":
        import zlib

        # Multi-member gzip (CommonCrawl: one member per record).
        # Feed the inflater bounded windows off a memoryview cursor —
        # NOT `rest = d.unused_data` per member, which would re-copy
        # the compressed tail once per member (O(members × bytes) on
        # a 100k-member segment). At a member boundary unused_data is
        # at most one window, re-fed to a fresh inflater.
        window = 1 << 20
        mv = memoryview(payload)
        pos, n = 0, len(payload)
        d = zlib.decompressobj(wbits=31)
        pending: bytes = b""
        while True:
            if pending:
                chunk, pending = pending, b""
            elif pos < n:
                chunk = mv[pos:pos + window]
                pos += len(chunk)
            else:
                break
            out = d.decompress(chunk)
            if out:
                yield from parser.feed(out)
            if d.eof:
                tail = d.flush()
                if tail:
                    yield from parser.feed(tail)
                pending = d.unused_data
                d = zlib.decompressobj(wbits=31)
    else:
        yield from parser.feed(payload)
    yield from parser.finish()


_WARC_COLS = [
    "warc_file", "warc_type", "url", "warc_date",
    "content_type", "http_status", "http_content_type",
    "body", "n_bytes",
]


def iter_warc_frames(
    files: Iterator[tuple[str, bytes]],
    record_types: tuple[str, ...] = ("response",),
    chunk_records: int = 1024,
    chunk_bytes: int = 64 << 20,
) -> Iterator["pd.DataFrame"]:
    """Parse (path, bytes) WARC files into BOUNDED pandas frames: a
    frame is emitted every ``chunk_records`` records or
    ``chunk_bytes`` accumulated body bytes, whichever trips first —
    never one frame per file, so a 1 GB segment with 4-5 GB of pages
    costs one chunk (not the whole file) of row-buffer memory on top
    of the record in flight. Frames may span files (``warc_file``
    stamps every row). Pure Python — unit-testable without Spark;
    ``read_warc`` wraps it in ``mapInPandas``."""
    import pandas as pd

    wanted = set(record_types)
    rows: list[dict] = []
    pending_bytes = 0

    def flush() -> "pd.DataFrame":
        nonlocal rows, pending_bytes
        frame = pd.DataFrame(rows, columns=_WARC_COLS)
        rows, pending_bytes = [], 0
        return frame

    emitted = False
    for fpath, content in files:
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
            pending_bytes += len(body)
            if len(rows) >= chunk_records or pending_bytes >= chunk_bytes:
                emitted = True
                yield flush()
    if rows or not emitted:  # tail chunk; empty frame iff zero records
        yield flush()


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    chunk_records: int = 1024,
    chunk_bytes: int = 64 << 20,
) -> DataFrame:
    """Distributed WARC scan: one task per file (see module scale
    notes), Arrow-batched incremental parse via ``iter_warc_frames``
    — record rows stream out in bounded chunks rather than one
    file-sized frame, keeping per-task memory at compressed-bytes +
    one gzip member + one output chunk."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield from iter_warc_frames(
                zip(pdf["path"], pdf["content"]),
                record_types,
                chunk_records,
                chunk_bytes,
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
