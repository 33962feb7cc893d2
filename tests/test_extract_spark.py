"""Spark extraction operator vs the (fixture-pinned) kernel oracle.

The kernel itself is verified against hand-derived reference expectations in
test_semantics_fixtures.py; here we verify that the distributed path —
Arrow batches, mapInPandas fan-out, span reassembly, mega-doc splitting —
produces byte-identical span sequences to running the kernel in-process.
"""

from __future__ import annotations

import pytest

from html_table_spark.config import ParserConfig
from html_table_spark.corpus import fixture_documents, synthesize_documents
from html_table_spark.fixtures import FIXTURES, f14_mega_doc_html
from html_table_spark.operators.extract import extract_tables, split_mega_docs
from html_table_spark.semantics import parse_document
from html_table_spark.spans import doc_spans_to_html, encode_table_spans, spans_signature
from html_table_spark.sources.documents import DOCUMENTS_SCHEMA


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


def kernel_signatures(rows, config):
    expected = {}
    for row in rows:
        html = doc_spans_to_html(row["spans"])
        for table in parse_document(html, config):
            expected[(row["doc_id"], table.table_idx)] = (
                table.status,
                table.caption,
                tuple(table.header),
                spans_signature(encode_table_spans(table)),
            )
    return expected


def spark_signatures(df):
    out = {}
    # completion markers (table_idx = -1, zero-table docs) are a pipeline
    # bookkeeping row, not an extraction result
    for row in df.filter("table_idx >= 0").collect():
        spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in (row.spans or [])]
        out[(row.doc_id, row.table_idx)] = (
            row.status,
            row.caption,
            tuple(row.header or []),
            spans_signature(spans),
        )
    return out


def test_synthetic_corpus_parity(spark):
    rows = synthesize_documents(n_docs=120, seed=7, media_fraction=0.4)
    config = ParserConfig().all_tables()
    result = extract_tables(_docs_df(spark, rows), config)
    assert spark_signatures(result) == kernel_signatures(rows, config)


def test_fixture_corpus_single_table_mode(spark):
    rows = [r for r in fixture_documents() if r["doc_id"] in ("F01", "F04", "F05", "F13")]
    config = ParserConfig()
    result = extract_tables(_docs_df(spark, rows), config)
    got = spark_signatures(result)
    assert set(got) == {(r["doc_id"], 0) for r in rows}
    assert got == kernel_signatures(rows, config)


def test_error_rows_not_exceptions(spark):
    rows = [
        {"doc_id": "bad", "spans": [{"kind": "text", "text": "no tables", "media_ref": None, "offset": 0}]},
        {"doc_id": "ok", "spans": [{"kind": "text", "text": "<table><tr><td>x</td></tr></table>", "media_ref": None, "offset": 0}]},
    ]
    result = extract_tables(_docs_df(spark, rows), ParserConfig()).collect()
    by_id = {r.doc_id: r for r in result}
    assert by_id["bad"].status == "error"
    assert by_id["bad"].error_msg == "The HTML table could not be found in the submitted html."
    assert by_id["ok"].status == "ok"
    assert by_id["ok"].n_rows == 1


def test_multi_span_document_reassembly(spark):
    # HTML split across many text spans out of order + media spans ignored
    html = FIXTURES["F01"][0]
    third = len(html) // 3
    rows = [
        {
            "doc_id": "split",
            "spans": [
                {"kind": "text", "text": html[third : 2 * third], "media_ref": None, "offset": 1},
                {"kind": "media", "text": "", "media_ref": "mX", "offset": 3},
                {"kind": "text", "text": html[:third], "media_ref": None, "offset": 0},
                {"kind": "text", "text": html[2 * third :], "media_ref": None, "offset": 2},
            ],
        }
    ]
    result = extract_tables(_docs_df(spark, rows), ParserConfig()).collect()
    assert result[0].header == ["prenoms", "nombre", "sexe", "annee"]
    assert result[0].n_rows == 4


@pytest.mark.parametrize("tables_per_chunk", [16, 64])
def test_mega_doc_split_parity(spark, tables_per_chunk):
    n_tables = 150
    html = f14_mega_doc_html(n_tables)
    rows = [
        {"doc_id": "mega", "spans": [{"kind": "text", "text": html, "media_ref": None, "offset": 0}]}
    ]
    config = ParserConfig().all_tables()
    chunks = split_mega_docs(_docs_df(spark, rows), tables_per_chunk=tables_per_chunk)
    got = spark_signatures(extract_tables(chunks, config))
    expected = kernel_signatures(rows, config)
    assert len(got) == n_tables
    assert got == expected  # table_idx base offsets line up globally


def test_split_falls_back_on_soup(spark):
    # unbalanced </table> defeats the linear scan → whole-doc path
    soup = "</table><table><tr><td>x</td></tr></table>"
    rows = [
        {"doc_id": "soup", "spans": [{"kind": "text", "text": soup, "media_ref": None, "offset": 0}]}
    ]
    chunks = split_mega_docs(_docs_df(spark, rows), tables_per_chunk=1).collect()
    assert len(chunks) == 1
    assert chunks[0].table_idx_base == 0


def test_read_html_files_parsefile_parity(spark, tmp_path):
    """parseFile parity: raw .html files → documents schema → extraction."""
    from html_table_spark.config import ParserConfig
    from html_table_spark.operators.extract import extract_tables
    from html_table_spark.sources.documents import read_html_files

    (tmp_path / "a.html").write_text(
        "<table><caption>T</caption><tr><td>x</td><td>y</td></tr></table>"
    )
    (tmp_path / "b.html").write_text(
        "<p>no table here</p>"
    )
    (tmp_path / "skip.txt").write_text("not html")

    docs = read_html_files(spark, str(tmp_path))
    assert docs.columns == ["doc_id", "spans"]
    out = extract_tables(docs, ParserConfig()).collect()
    by_id = {r.doc_id.rsplit("/", 1)[-1]: r for r in out}
    assert set(by_id) == {"a.html", "b.html"}
    a = by_id["a.html"]
    assert a.status == "ok" and a.caption == "T" and a.n_cells == 2
    # no table → reference error semantics, surfaced as a status row
    assert by_id["b.html"].status == "error"


def test_documents_from_html_strings(spark):
    from html_table_spark.config import ParserConfig
    from html_table_spark.operators.extract import extract_tables
    from html_table_spark.sources.documents import documents_from_html

    docs = documents_from_html(spark, ["<table><tr><td>v</td></tr></table>"], ["d1"])
    row = extract_tables(docs, ParserConfig()).first()
    assert row.doc_id == "d1" and row.n_rows == 1


def test_read_documents_reordered_span_fields(spark, tmp_path):
    """A corpus whose span struct carries the same fields in a different
    order must map by NAME, not position (a DDL cast would silently put
    offsets into media_ref)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_table_spark.sources.documents import read_documents

    schema = pa.schema([
        ("doc_id", pa.int64()),
        ("spans", pa.list_(pa.struct([
            ("kind", pa.string()),
            ("text", pa.string()),
            ("offset", pa.int32()),      # offset BEFORE media_ref
            ("media_ref", pa.string()),
        ]))),
    ])
    rows = [{"doc_id": 7, "spans": [
        {"kind": "text", "text": "<table><tr><td>x</td></tr></table>",
         "offset": 0, "media_ref": None},
        {"kind": "media", "text": "", "offset": 1, "media_ref": "M9"},
    ]}]
    p = str(tmp_path / "reordered.parquet")
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), p)
    got = read_documents(spark, p).collect()
    assert got[0].doc_id == "7"
    spans = got[0].spans
    assert spans[0].offset == 0 and spans[0].media_ref is None
    assert spans[1].media_ref == "M9" and spans[1].offset == 1


def test_table_cuts_ignore_comments_rawtext_and_typos():
    from html_table_spark.operators.extract import _top_level_table_cuts

    # commented-out table is not a boundary
    h = "<!-- <table><tr><td>x</td></tr></table> --><table><tr><td>y</td></tr></table>"
    cuts = _top_level_table_cuts(h)
    assert cuts is not None and len(cuts) == 1
    assert h[cuts[0][0]:cuts[0][1]].startswith("<table><tr><td>y")
    # script-embedded table markup is not a boundary
    h2 = "<script>var s='<table>'</script><table><tr><td>z</td></tr></table>"
    cuts2 = _top_level_table_cuts(h2)
    assert cuts2 is not None and len(cuts2) == 1
    # </tables> is not a close tag
    h3 = "<table><tr><td>a</td></tr></tables></table>"
    cuts3 = _top_level_table_cuts(h3)
    assert cuts3 is not None and len(cuts3) == 1
    # unterminated comment → ambiguous → whole-doc fallback
    assert _top_level_table_cuts("<!-- oops <table></table>") is None


def test_table_cuts_quoted_markup_in_uninspected_tag_falls_back():
    """Round-3 ADVICE: balanced table markup hidden inside an UNINSPECTED
    tag's attribute must not produce garbage cuts — the pre-scan detects a
    '<' inside any tag body and falls back to the whole-doc parse."""
    from html_table_spark.operators.extract import _top_level_table_cuts

    t = "<table><tr><td>x</td></tr></table>"
    # the ADVICE repro: quoted close+open stays depth-balanced
    bad = '<table><tr><td data-x="</table>x<table>">A</td></tr></table>'
    assert _top_level_table_cuts(bad) is None
    # unquoted attr value running into an event pattern
    assert _top_level_table_cuts("<table><tr><td foo=</table>>A</td></tr></table>" ) is None
    # quoted '>' before the hidden '<' (defeats any quote-blind heuristic)
    assert _top_level_table_cuts('<div a=">" b="<table">' + t) is None
    # '<' inside an END tag's junk region (</td ... > is quote-blind)
    assert _top_level_table_cuts("<div></div <table>" + t) is None
    # text '< letter' genuinely opens a tag for the tokenizer too → fallback
    assert _top_level_table_cuts("i<j and k<m" + t) is None
    # …but ordinary quoted attributes (including quoted '>') still split
    cuts = _top_level_table_cuts('<table class="a>b"><tr><td>y</td></tr></table>' + t)
    assert cuts is not None and len(cuts) == 2
    cuts = _top_level_table_cuts('<div id="x" data-y=\'1\'>' + t * 2)
    assert cuts is not None and len(cuts) == 2
    # text '<' NOT followed by a letter is harmless
    cuts = _top_level_table_cuts("<p>1 < 2 &lt; 3</p>" + t)
    assert cuts is not None and len(cuts) == 1


def test_unseen_tag_angle_prescan_is_linear_time():
    """Round-3 review: the quote-aware pre-scan must stay linear on
    adversarial quote runs — the pre-fix backtracking variant took ~8x
    longer per +4 quotes (3s at 32 quotes; hours at 60+), pinning an
    executor core on one crafted mega doc. Budget is generous (0.5s for
    200k chars) so the test only fails on a complexity regression, not on
    a loaded box."""
    import time

    from html_table_spark.operators.extract import _UNSEEN_TAG_ANGLE_RE

    t = "<table><tr><td>x</td></tr></table>"
    for q in ('"', "'"):
        for n in (61, 200_000):
            s = "<a " + q * n + ">" + t
            t0 = time.monotonic()
            m = _UNSEEN_TAG_ANGLE_RE.search(s)
            assert time.monotonic() - t0 < 0.5, (q, n)
            assert m is None, "quote run hides no angle -> no match"
    # possessive rewrite keeps the match language: every documented
    # positive/negative from the quote-aware spec still holds
    assert _UNSEEN_TAG_ANGLE_RE.search('<td data-x="</table>x<table>">')
    assert _UNSEEN_TAG_ANGLE_RE.search("</td foo<table>")
    assert _UNSEEN_TAG_ANGLE_RE.search('<a "x<y">')
    assert not _UNSEEN_TAG_ANGLE_RE.search('<td a="q\'q" b=\'d"d\'>x</td>')
    assert not _UNSEEN_TAG_ANGLE_RE.search('<td class="x">a</td><table>')


def test_chunk_mode_emits_only_chunk_rows(spark):
    """INVARIANT the pipeline relies on (plans/pipeline.py dropped its
    parsed-in-place union leg + persist on the strength of this): with
    mega_policy='chunk', every over-threshold doc — splittable or tag
    soup — yields ONLY status='chunk' rows."""
    from html_table_spark.operators.extract import STATUS_CHUNK, extract_tables

    splittable = f14_mega_doc_html(8)
    soup = "</table>" + "<table><tr><td>s</td></tr></table>" * 3
    rows = [
        {"doc_id": "m1", "spans": [{"kind": "text", "text": splittable, "media_ref": None, "offset": 0}]},
        {"doc_id": "m2", "spans": [{"kind": "text", "text": soup, "media_ref": None, "offset": 0}]},
    ]
    out = extract_tables(
        _docs_df(spark, rows),
        ParserConfig().all_tables(),
        mega_cost_threshold=16,  # force both docs over the threshold
        tables_per_chunk=2,
        mega_policy="chunk",
    ).collect()
    assert out, "chunk pass emitted nothing"
    assert {r.status for r in out} == {STATUS_CHUNK}
    # the soup doc must still be represented (whole-doc chunk), not dropped
    assert {r.doc_id for r in out} == {"m1", "m2"}


def test_mega_doc_split_parity_quoted_markup(spark):
    """End-to-end: a doc with quoted table markup inside an attribute
    produces IDENTICAL results via the chunk-split path and the whole-doc
    kernel (the cut scan must fall back rather than cut garbage)."""
    t = "<table><tr><td>c{}</td></tr></table>"
    html = (
        '<table><tr><td data-x="</table>x<table>">A</td></tr></table>'
        + "".join(t.format(i) for i in range(50))
    )
    rows = [
        {"doc_id": "qm", "spans": [{"kind": "text", "text": html, "media_ref": None, "offset": 0}]}
    ]
    config = ParserConfig().all_tables()
    chunks = split_mega_docs(_docs_df(spark, rows), tables_per_chunk=8)
    got = spark_signatures(extract_tables(chunks, config))
    expected = kernel_signatures(rows, config)
    assert len(got) == 51
    assert got == expected

def test_table_cuts_selfclosed_rawtext_and_empty_table():
    """Self-closed <script/>/<style/>/<table/> are EMPTY elements to the
    tokenizer (htmldom _TAG_RE selfclose group) — the boundary scan must not
    raw-text-skip past them or unbalance its depth counter (round-2 ADVICE:
    silent table loss when chunk-splitting engaged)."""
    from html_table_spark.operators.extract import _top_level_table_cuts

    t = "<table><tr><td>x</td></tr></table>"
    # ADVICE repro: <script/> + 3 tables + stray </script> + 1 table.
    # The stray </script> ends raw text nowhere (no raw text is open), the
    # tokenizer sees 4 top-level tables... but the stray close is consumed
    # as an end-tag token; all 4 tables are real.
    h = "<script/>" + t * 3 + "</script>" + t
    cuts = _top_level_table_cuts(h)
    assert cuts is not None and len(cuts) == 4
    # self-closed style
    cuts = _top_level_table_cuts("<style/>" + t * 2 + "</style>" + t)
    assert cuts is not None and len(cuts) == 3
    # self-closed table: a complete zero-row table, must count as a cut and
    # not increment depth
    cuts = _top_level_table_cuts("<table/>" + t + "<table/>")
    assert cuts is not None and len(cuts) == 3
    # self-closed with attributes / unquoted value ending in '/'
    cuts = _top_level_table_cuts('<script src="x.js"/>' + t)
    assert cuts is not None and len(cuts) == 1
    cuts = _top_level_table_cuts("<script src=foo/>" + t)
    assert cuts is not None and len(cuts) == 1
    # quoted '>' inside a raw-text opener's attribute
    cuts = _top_level_table_cuts('<script src="a>b">var x</script>' + t)
    assert cuts is not None and len(cuts) == 1
    # quoted '>' inside the table tag itself
    cuts = _top_level_table_cuts('<table class="a>b"><tr><td>y</td></tr></table>')
    assert cuts is not None and len(cuts) == 1


def test_mega_doc_split_parity_selfclosed_script(spark):
    """End-to-end: chunk-split output == whole-doc output on a mega doc whose
    preamble contains the ADVICE self-closed-script pattern."""
    t = "<table><tr><td>c{}</td></tr></table>"
    html = "<script/>" + "".join(t.format(i) for i in range(40)) + "</script>" + "".join(
        t.format(i) for i in range(40, 50)
    )
    rows = [
        {"doc_id": "sc", "spans": [{"kind": "text", "text": html, "media_ref": None, "offset": 0}]}
    ]
    config = ParserConfig().all_tables()
    chunks = split_mega_docs(_docs_df(spark, rows), tables_per_chunk=8)
    got = spark_signatures(extract_tables(chunks, config))
    expected = kernel_signatures(rows, config)
    assert len(got) == 50
    assert got == expected
