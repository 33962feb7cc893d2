"""CDX indexing for WARC archives (sources/cdx.py)."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from html_table_spark.sources.cdx import cdx_records, urlkey, warc_cdx
from html_table_spark.sources.warc import encode_warc, parse_warc

PAGES = [
    {"url": "HTTP://Example.COM:80/a//b?b=2&a=1#f", "html": "<p>x</p>"},
    {"url": "http://site.example/p", "html": "<table><tr><td>1</td></tr></table>"},
    {"url": "http://site.example/miss", "html": "<i>n</i>", "status": 404},
]


def _random_access_ok(b: bytes, rows: list[dict], gz: bool) -> None:
    for r in rows:
        chunk = b[r["offset"] : r["offset"] + r["length"]]
        raw = zlib.decompress(chunk, 16 + zlib.MAX_WBITS) if gz else chunk
        sub = parse_warc(raw)
        assert len(sub) == 1 and sub[0]["status"] == "ok"
        assert sub[0].get("url", "") == r["url"]


@pytest.mark.parametrize("gz", [False, True])
def test_index_fields_and_random_access(gz):
    b = encode_warc(PAGES, per_record_gzip=gz)
    rows = cdx_records("arc-1", b)
    assert [r["record_type"] for r in rows] == ["warcinfo"] + ["response"] * 3
    resp = rows[1]
    assert resp["urlkey"] == "http://example.com/a/b?a=1&b=2"
    assert resp["ts"] == "20240101000000"
    assert resp["http_status"] == 200 and resp["mime"] == "text/html"
    assert rows[3]["http_status"] == 404
    assert len(resp["digest"]) == 32  # SHA1 base32
    assert rows[0]["offset"] == 0
    # offsets strictly increase and never overlap
    for a, c in zip(rows, rows[1:]):
        assert c["offset"] >= a["offset"] + a["length"] - (0 if gz else 4)
    _random_access_ok(b, rows, gz)


def test_digest_identifies_identical_content():
    b1 = encode_warc([PAGES[1]])
    b2 = encode_warc([PAGES[1]], per_record_gzip=True)
    d1 = cdx_records("a", b1)[1]["digest"]
    d2 = cdx_records("b", b2)[1]["digest"]
    assert d1 == d2  # digest is over the RECORD CONTENT, not the container


def test_unlocatable_records_are_skipped_not_invented():
    good = encode_warc(PAGES[:1])
    rows = cdx_records("a", b"garbage\r\n" + good)
    # the index lists only locatable records (reader surfaces the error)
    assert [r["record_type"] for r in rows] == ["warcinfo", "response"]
    assert cdx_records("a", b"\x1f\x8b\xffbroken") == []
    assert cdx_records("a", b"") == []


def test_urlkey_matches_spark_canonical_semantics():
    assert urlkey("HTTP://Example.COM:80/a//b?b=2&a=1#f") == \
        "http://example.com/a/b?a=1&b=2"
    assert urlkey("https://H/x?utm_source=a&fbclid=z&k=1") == "https://h/x?k=1"
    assert urlkey("http://h") == "http://h/"
    assert urlkey("no-scheme/path") == "no-scheme/path"


@settings(max_examples=30, deadline=None)
@given(data=st.binary(max_size=300))
def test_property_garbage_never_raises(data):
    assert isinstance(cdx_records("a", data), list)


def test_spark_operator_and_registry(spark):
    import __spark_entry__ as entry

    adf = spark.createDataFrame(
        [("one.warc", encode_warc(PAGES)),
         ("two.warc.gz", encode_warc(PAGES[:1], per_record_gzip=True))],
        "archive string, payload binary",
    )
    rows = warc_cdx(adf).collect()
    assert len(rows) == 4 + 2
    assert {r["archive"] for r in rows} == {"one.warc", "two.warc.gz"}

    out = entry.x_warc_cdx(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 74
    assert all(r["length"] > 0 for r in out)
    # urlkeys exist for every response row
    assert all(r["urlkey"] for r in out if r["record_type"] == "response")
