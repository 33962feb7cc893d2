"""WARC (ISO 28500) corpus ingestion — the Common-Crawl-shaped source.

A web-scale extraction pipeline's raw input is usually not a curated
Parquet table but WARC archives: the ISO 28500 record format Common Crawl,
the Internet Archive, and every major crawler emit.  This module reads
them with the stdlib only (zlib for the per-record gzip members the
Common Crawl convention uses) and adapts HTTP ``response`` records into
the pipeline's canonical ``documents(doc_id, spans)`` shape, so the whole
engine — extraction, dedup, main-content, media — runs straight off a
crawl drop.

Format notes (ISO 28500 / WARC 1.1, public spec):

* a record is ``WARC/1.x CRLF``, name:value headers, ``CRLF CRLF``, then
  exactly ``Content-Length`` content bytes, then ``CRLF CRLF``;
* archives are plain concatenations of records, OR concatenations of
  single-record gzip members (Common Crawl's ``.warc.gz`` layout — members
  are detected by the 1f 8b magic and split via ``zlib``'s unused-data
  tail, so no external gzip-member library is needed);
* ``response`` records wrap a full HTTP/1.1 response (status line, headers,
  body); the body's charset comes from the Content-Type header with a
  utf-8 → latin-1 fallback (latin-1 never fails, so undeclared legacy
  pages still yield text).

Scale design: the WARC *file* is the unit of parallelism — exactly how
Common Crawl is processed in practice (segment files are ~1 GB, and the
format is a stream with no random access, so records of one file are
inherently sequential).  ``spark.read.format("binaryFile")`` gives one row
per file; parsing runs in an Arrow-batched ``mapInPandas`` whose iterator
shape keeps one archive's records in memory at a time, and everything
downstream (extraction etc.) re-partitions on records, not files.  At
100 TB that is ~10^5 files across the cluster — ample task parallelism —
and per-task memory is bounded by one archive.

The writer (`encode_warc`) is an independent forward composition used for
fixtures, per the same discipline as the media codecs: the tolerant reader
must re-derive structure, not share helpers with the writer.

Reference parity note: the reference library (bakame-php/html-table) reads
single HTML pages (src/Parser.php:333-357 parseFile); WARC ingestion is
part of the source surface the build plan adds beyond the reference.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "parse_warc",
    "split_gzip_members",
    "read_warc",
    "warc_to_documents",
    "read_warc_documents",
    "encode_warc",
    "WARC_RECORDS_SCHEMA",
]

WARC_RECORDS_SCHEMA = (
    "archive string, record_idx int, record_type string, url string, "
    "warc_date string, http_status int, mime string, text string, "
    "status string"
)

_VERSION_RE = re.compile(rb"^WARC/(\d+\.\d+)\r?\n")
_CHARSET_RE = re.compile(r"charset=[\"']?([A-Za-z0-9_.:-]+)", re.I)


def split_gzip_members(b: bytes) -> list[bytes]:
    """Decompress a concatenation of gzip members (the .warc.gz layout)
    into the per-member payloads; raises ValueError on a corrupt member."""
    out: list[bytes] = []
    rest = b
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(rest))
            if not d.eof:
                raise ValueError("warc: truncated gzip member")
        except zlib.error as e:
            raise ValueError(f"warc: corrupt gzip member: {e}") from None
        rest = d.unused_data
    if rest.strip(b"\x00"):
        raise ValueError("warc: trailing garbage after gzip members")
    return out


def _decode_body(body: bytes, content_type: str) -> str:
    m = _CHARSET_RE.search(content_type or "")
    if m:
        try:
            return body.decode(m.group(1), errors="replace")
        except LookupError:
            pass
    try:
        return body.decode("utf-8")
    except UnicodeDecodeError:
        return body.decode("latin-1")


def _parse_http_response(content: bytes) -> tuple[int | None, str, str]:
    """(status_code, mime, decoded body text) from an HTTP/1.x response
    block; a block that is not HTTP at all comes back (None, '', raw-text)."""
    head, sep, body = content.partition(b"\r\n\r\n")
    if not sep:
        head, sep, body = content.partition(b"\n\n")
    lines = head.split(b"\n")
    first = lines[0].strip() if lines else b""
    if not first.startswith(b"HTTP/"):
        return None, "", _decode_body(content, "")
    parts = first.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    ctype = ""
    for ln in lines[1:]:
        k, _, v = ln.decode("latin-1").partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    mime = ctype.split(";")[0].strip().lower()
    return status, mime, _decode_body(body, ctype)


def _parse_record_stream(b: bytes) -> Iterator[dict]:
    """Walk concatenated (uncompressed) WARC records tolerantly: a broken
    record yields one error row and parsing resynchronizes at the next
    ``WARC/`` magic, so one bad record cannot sink an archive."""
    i, n = 0, len(b)
    while i < n:
        while i < n and b[i : i + 1] in (b"\r", b"\n"):
            i += 1
        if i >= n:
            return
        m = _VERSION_RE.match(b[i:])
        if not m:
            nxt = b.find(b"WARC/", i + 1)
            yield {"status": "error: no WARC version line"}
            if nxt < 0:
                return
            i = nxt
            continue
        hdr_end = b.find(b"\r\n\r\n", i)
        alt_end = b.find(b"\n\n", i)
        if hdr_end < 0 or (0 <= alt_end < hdr_end):
            hdr_end, skip = alt_end, 2
        else:
            skip = 4
        if hdr_end < 0:
            yield {"status": "error: unterminated header block"}
            return
        headers: dict[str, str] = {}
        for ln in b[i + m.end() : hdr_end].split(b"\n"):
            k, _, v = ln.decode("latin-1", "replace").partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            yield {"status": "error: bad Content-Length", **_ids(headers)}
            nxt = b.find(b"WARC/", hdr_end)
            if nxt < 0:
                return
            i = nxt
            continue
        body_start = hdr_end + skip
        if body_start + length > n:
            yield {"status": "error: truncated content block", **_ids(headers)}
            return
        content = b[body_start : body_start + length]
        rec = {
            "record_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "status": "ok",
            **_http_fields(headers, content),
        }
        yield rec
        i = body_start + length


def _ids(headers: dict[str, str]) -> dict:
    return {
        "record_type": headers.get("warc-type", ""),
        "url": headers.get("warc-target-uri", ""),
        "warc_date": headers.get("warc-date", ""),
    }


def _http_fields(headers: dict[str, str], content: bytes) -> dict:
    ctype = headers.get("content-type", "")
    if headers.get("warc-type") == "response" and ctype.startswith(
        "application/http"
    ):
        status, mime, text = _parse_http_response(content)
        return {"http_status": status, "mime": mime, "text": text}
    # resource / conversion / metadata / warcinfo: content is the payload
    return {
        "http_status": None,
        "mime": ctype.split(";")[0].strip().lower(),
        "text": _decode_body(content, ctype),
    }


def parse_warc(payload: bytes) -> list[dict]:
    """All records of one archive (auto-detecting .warc vs .warc.gz); a
    structurally hopeless archive returns a single error row rather than
    raising (errors are data in this engine, never stage-killers)."""
    b = payload or b""
    try:
        if b[:2] == b"\x1f\x8b":
            b = b"".join(split_gzip_members(b))
        return list(_parse_record_stream(b))
    except ValueError as e:
        return [{"status": f"error: {e}"}]


def _records_frame(archive: str, payload: bytes) -> pd.DataFrame:
    recs = parse_warc(payload)
    return pd.DataFrame(
        {
            "archive": archive,
            "record_idx": range(len(recs)),
            "record_type": [r.get("record_type") for r in recs],
            "url": [r.get("url") for r in recs],
            "warc_date": [r.get("warc_date") for r in recs],
            "http_status": pd.array(
                [r.get("http_status") for r in recs], dtype="Int32"
            ),
            "mime": [r.get("mime") for r in recs],
            "text": [r.get("text") for r in recs],
            "status": [r.get("status") for r in recs],
        }
    )


def parse_warc_column(
    archives: DataFrame, name_col: str = "archive", payload_col: str = "payload"
) -> DataFrame:
    """The parse kernel over any (name, binary-payload) DataFrame — shared
    by the binaryFile reader and in-memory fixture corpora (and by the
    driver-side VALUES oracle, which calls :func:`parse_warc` directly)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for name, payload in zip(pdf[name_col], pdf[payload_col]):
                yield _records_frame(name, bytes(payload or b""))

    return archives.select(
        F.col(name_col).alias(name_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, schema=WARC_RECORDS_SCHEMA)


def read_warc(spark: SparkSession, path: str, glob: str = "*.warc*") -> DataFrame:
    """Scan a directory of WARC archives into one record row per WARC
    record.  One binaryFile row per archive; the iterator-of-frames map
    emits each archive's records as their own Arrow batch, so memory is
    bounded by a single archive regardless of how many land in a task."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(F.col("path").alias("archive"), F.col("content").alias("payload"))
    )
    return parse_warc_column(files)


_HTML_MIMES = ("text/html", "application/xhtml+xml")


def warc_to_documents(records: DataFrame) -> DataFrame:
    """HTML ``response`` records → the canonical ``documents(doc_id,
    spans)`` shape (doc_id = ``url#record_idx``, unique even when a crawl
    revisits a URL), ready for the extraction pipeline / read_documents
    consumers.  Pure Column expressions — the parse already happened."""
    keep = records.where(
        (F.col("status") == "ok")
        & (F.col("record_type") == "response")
        & F.col("mime").isin(*_HTML_MIMES)
        & (F.col("http_status") == 200)
    )
    return keep.select(
        F.concat_ws("#", "url", F.col("record_idx").cast("string")).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )


def read_warc_documents(
    spark: SparkSession, path: str, glob: str = "*.warc*"
) -> DataFrame:
    """One-call crawl→corpus adapter: WARC directory in, extractable
    ``documents(doc_id, spans)`` out."""
    return warc_to_documents(read_warc(spark, path, glob))


# ---------------------------------------------------------------------------
# writer (fixtures/tests only) — independent forward composition
# ---------------------------------------------------------------------------


def _gzip_member(b: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(b) + co.flush()


def encode_warc(
    pages: list[dict],
    per_record_gzip: bool = False,
    warcinfo: str = "software: fixture-writer",
) -> bytes:
    """Compose an archive: one ``warcinfo`` record then one HTTP 200
    ``response`` record per page dict (``url``, ``html``, optional
    ``date``/``status``/``mime``/``charset``).  ``per_record_gzip=True``
    emits the Common Crawl member-per-record .warc.gz layout."""
    records: list[bytes] = []
    info_body = warcinfo.encode()
    records.append(
        _record(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Date", "2024-01-01T00:00:00Z"),
                ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000000>"),
                ("Content-Type", "application/warc-fields"),
            ],
            info_body,
        )
    )
    for k, page in enumerate(pages):
        charset = page.get("charset", "utf-8")
        body = page["html"].encode(charset)
        status = page.get("status", 200)
        http = (
            f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {page.get('mime', 'text/html')}; charset={charset}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("latin-1") + body
        records.append(
            _record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Target-URI", page["url"]),
                    ("WARC-Date", page.get("date", "2024-01-01T00:00:00Z")),
                    ("WARC-Record-ID", f"<urn:uuid:{k:08d}-0000-0000-0000-000000000000>"),
                    ("Content-Type", 'application/http; msgtype=response'),
                ],
                http,
            )
        )
    if per_record_gzip:
        return b"".join(_gzip_member(r) for r in records)
    return b"".join(records)


def _record(headers: list[tuple[str, str]], content: bytes) -> bytes:
    head = "".join(f"{k}: {v}\r\n" for k, v in headers)
    return (
        f"WARC/1.1\r\n{head}Content-Length: {len(content)}\r\n\r\n"
    ).encode("latin-1") + content + b"\r\n\r\n"
