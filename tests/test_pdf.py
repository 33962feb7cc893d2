"""PDF layout parse: writer→independent-reader roundtrips, content-stream
operator coverage, layout ordering, robustness against corrupt payloads, and
the Spark operator's error channel."""

from __future__ import annotations

import zlib

import pytest

from html_table_spark.operators.pdf import (
    PdfError,
    build_pdf,
    extract_pdf_spans,
    extract_pdf_spans_df,
    layout_spans,
    parse_pdf,
    _interpret_content,
)


def texts(spans):
    return [s["text"] for s in spans if s["kind"] == "text"]


# ---------------------------------------------------------------------------
# writer → reader roundtrips
# ---------------------------------------------------------------------------

def test_roundtrip_basic():
    pdf = build_pdf([("text", 72, 700, "hello world")])
    assert texts(extract_pdf_spans(pdf)) == ["hello world"]


def test_roundtrip_uncompressed():
    pdf = build_pdf([("text", 72, 700, "plain")], compress=False)
    assert b"FlateDecode" not in pdf
    assert texts(extract_pdf_spans(pdf)) == ["plain"]


def test_layout_sort_beats_stream_order():
    # written bottom line first; reader must order by y desc
    pdf = build_pdf([("text", 72, 600, "last"), ("text", 72, 700, "first")])
    assert texts(extract_pdf_spans(pdf)) == ["first", "last"]


def test_runs_merge_into_lines_by_x():
    pdf = build_pdf([
        ("text", 300, 700, "right"),
        ("text", 72, 701.5, "left"),  # within y_tol band
        ("text", 72, 650, "below"),
    ])
    assert texts(extract_pdf_spans(pdf)) == ["left right", "below"]


def test_media_interleaves_between_lines():
    pdf = build_pdf([
        ("text", 72, 600, "bottom"),
        ("image", 72, 650, 100, 50, "Im1"),
        ("text", 72, 700, "top"),
    ])
    spans = extract_pdf_spans(pdf)
    assert [(s["kind"], s["text"] or s["media_ref"]) for s in spans] == [
        ("text", "top"), ("media", "Im1"), ("text", "bottom")]
    assert [s["offset"] for s in spans] == [0, 1, 2]


def test_string_escapes_roundtrip():
    tricky = "pa(ren)s \\ back\ttab"
    pdf = build_pdf([("text", 72, 700, tricky)])
    assert texts(extract_pdf_spans(pdf)) == [tricky]


# ---------------------------------------------------------------------------
# reader-only: hand-written object/content constructs the writer never emits
# ---------------------------------------------------------------------------

def wrap_content(content: bytes, extra_objs: bytes = b"") -> bytes:
    """Minimal hand-rolled PDF around a raw (uncompressed) content stream."""
    return (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream\nendobj\n"
        + extra_objs +
        b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    )


def test_tm_t_star_and_quote_operators():
    content = (b"BT 1 0 0 1 72 700 Tm (one) Tj 14 TL T* (two) Tj "
               b"(three) ' ET")
    spans = extract_pdf_spans(wrap_content(content))
    assert texts(spans) == ["one", "two", "three"]


def test_td_sets_leading_for_t_star():
    # TD sets leading = -ty; subsequent T* moves down by it
    content = b"BT 72 700 Td (a) Tj 0 -20 TD (b) Tj T* (c) Tj ET"
    spans = extract_pdf_spans(wrap_content(content))
    assert texts(spans) == ["a", "b", "c"]


def test_tj_array_concatenates_with_kerning():
    content = b"BT 72 700 Td [(he) -40 (llo) 10 ( wor) (ld)] TJ ET"
    assert texts(extract_pdf_spans(wrap_content(content))) == ["hello world"]


def test_double_quote_operator():
    content = b'BT 72 700 Td 12 TL (x) Tj 2 3 (y) " ET'
    assert texts(extract_pdf_spans(wrap_content(content))) == ["x", "y"]


def test_hex_strings_and_octal_escapes():
    # Td is RELATIVE: the second moves 20 down from the first line
    content = b"BT 72 700 Td <686921> Tj 0 -20 Td (\\110\\151) Tj ET"
    assert texts(extract_pdf_spans(wrap_content(content))) == ["hi!", "Hi"]


def test_cm_translation_applies_to_do_and_text():
    content = (b"q 1 0 0 1 0 -100 cm BT 72 700 Td (shifted) Tj ET "
               b"/Im9 Do Q BT 72 650 Td (fixed) Tj ET")
    spans = extract_pdf_spans(wrap_content(content))
    # text at effective y=600, media at y=-100, fixed at 650
    assert [(s["kind"], s["text"] or s["media_ref"]) for s in spans] == [
        ("text", "fixed"), ("text", "shifted"), ("media", "Im9")]


def test_multiple_content_streams_concatenate():
    # spec §7.8.2: /Contents array streams form ONE logical stream (split
    # kept at a token boundary; tokens may not straddle stream boundaries)
    c1 = b"BT 72 700 Td (part) Tj"
    c2 = b"0 -20 Td (two) Tj ET"  # continues the text object begun in c1
    pdf = (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [5 0 R 6 0 R] >>\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(c1)).encode() + b" >>\nstream\n"
        + c1 + b"\nendstream\nendobj\n"
        b"6 0 obj\n<< /Length " + str(len(c2)).encode() + b" >>\nstream\n"
        + c2 + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    )
    assert texts(extract_pdf_spans(pdf)) == ["part", "two"]


def test_indirect_length_resolves():
    content = b"BT 72 700 Td (indirect) Tj ET"
    pdf = (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n"
        b"5 0 obj\n<< /Length 7 0 R >>\nstream\n" + content
        + b"\nendstream\nendobj\n"
        b"7 0 obj\n" + str(len(content)).encode() + b"\nendobj\n"
        b"trailer\n<< /Size 8 /Root 1 0 R >>\n%%EOF\n"
    )
    assert texts(extract_pdf_spans(pdf)) == ["indirect"]


def test_missing_trailer_repairs_via_catalog_scan():
    pdf = build_pdf([("text", 72, 700, "fix me")])
    broken = pdf[: pdf.rfind(b"trailer")]  # drop trailer entirely
    assert texts(extract_pdf_spans(broken)) == ["fix me"]


def test_two_page_documents_concatenate_pages():
    content1 = b"BT 72 700 Td (page one) Tj ET"
    content2 = b"BT 72 700 Td (page two) Tj ET"
    pdf = (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(content1)).encode() + b" >>\nstream\n"
        + content1 + b"\nendstream\nendobj\n"
        b"6 0 obj\n<< /Length " + str(len(content2)).encode() + b" >>\nstream\n"
        + content2 + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    )
    spans = extract_pdf_spans(pdf)
    assert texts(spans) == ["page one", "page two"]
    assert [s["offset"] for s in spans] == [0, 1]


def test_obj_lookalike_inside_stream_data_skipped():
    # binary stream bytes that happen to contain "9 0 obj" must not be
    # parsed as an object (scan-parser trap)
    content = b"BT 72 700 Td (ok) Tj ET % 9 0 obj garbage"
    inner = b"9 0 obj << /Type /Catalog >>"  # lookalike INSIDE stream data
    pdf = (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(inner)).encode() + b" >>\nstream\n"
        + inner + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    )
    doc = parse_pdf(pdf)
    assert 9 not in doc.objects
    assert texts(extract_pdf_spans(pdf)) == ["ok"]


# ---------------------------------------------------------------------------
# robustness: corrupt payloads raise PdfError, never hang or over-allocate
# ---------------------------------------------------------------------------

def test_not_a_pdf():
    with pytest.raises(PdfError):
        parse_pdf(b"GIF89a not a pdf")


def test_truncated_everywhere():
    pdf = build_pdf([("text", 72, 700, "will be cut")])
    for cut in range(8, len(pdf), max(1, len(pdf) // 40)):
        try:
            extract_pdf_spans(pdf[:cut])
        except PdfError:
            pass  # clean structured failure is the contract


def test_mutated_bytes_never_crash_uncleanly():
    pdf = bytearray(build_pdf([("text", 72, 700, "mutate me")]))
    for i in range(8, len(pdf), 7):
        mutated = bytearray(pdf)
        mutated[i] ^= 0xFF
        try:
            extract_pdf_spans(bytes(mutated))
        except PdfError:
            pass


def test_forged_length_rejected():
    pdf = build_pdf([("text", 72, 700, "x")])
    forged = pdf.replace(b"/Length", b"/Length 99999999 %", 1)
    with pytest.raises(PdfError):
        extract_pdf_spans(forged)


def test_zip_bomb_inflation_capped():
    bomb = zlib.compress(b"\x00" * (1 << 27), 9)  # 128 MiB of zeros
    pdf = (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(bomb)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + bomb + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    )
    with pytest.raises(PdfError, match="inflation cap"):
        extract_pdf_spans(pdf)


def test_reference_cycle_detected():
    pdf = (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n2 0 R\nendobj\n"  # self-referencing object
        b"trailer\n<< /Size 3 /Root 1 0 R >>\n%%EOF\n"
    )
    with pytest.raises(PdfError):
        extract_pdf_spans(pdf)


def test_unknown_operator_operands_dropped():
    # a color op the interpreter does not model must not poison Td operands
    content = b"BT 0.5 0.5 0.5 rg 72 700 Td (still here) Tj ET"
    assert texts(extract_pdf_spans(wrap_content(content))) == ["still here"]


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

def test_extract_pdf_spans_df(spark):
    good = build_pdf([("text", 72, 700, "alpha"),
                      ("image", 72, 650, 10, 10, "ImX"),
                      ("text", 72, 600, "beta")])
    docs = spark.createDataFrame(
        [("1", bytearray(good)), ("2", bytearray(b"junk bytes"))],
        "doc_id string, payload binary",
    )
    rows = extract_pdf_spans_df(docs).orderBy("doc_id", "pos").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [(r.kind, r.span_text or r.media_ref) for r in by_doc["1"]] == [
        ("text", "alpha"), ("media", "ImX"), ("text", "beta")]
    assert all(r.status == "ok" for r in by_doc["1"])
    (err,) = by_doc["2"]
    assert err.kind == "error" and err.status.startswith("error:")
