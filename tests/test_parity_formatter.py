"""F12: the reference's row-formatter becomes downstream Spark expressions
(ParserTest.php:465-491 — uppercase + int casts on the testb table), plus
the Table value-object JSON shape and the media enrichment join."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from html_table_spark.config import TR, ParserConfig
from html_table_spark.fixtures import FILE_HTML
from html_table_spark.operators.extract import extract_tables
from html_table_spark.operators.media import (
    MEDIA_SCHEMA,
    enrich_media_spans,
    extract_media_features,
    synthesize_media_table,
)
from html_table_spark.operators.tabular import Tabular
from html_table_spark.sources.documents import DOCUMENTS_SCHEMA
from html_table_spark.spans import html_to_doc_spans


def _extract_f02c(spark):
    cfg = ParserConfig().table_position("testb").table_header_position(TR)
    docs = spark.createDataFrame(
        [{"doc_id": "F12", "spans": html_to_doc_spans(FILE_HTML)}], DOCUMENTS_SCHEMA
    )
    return extract_tables(docs, cfg)


def _rows_df(spark, extracted):
    """Pivot the span stream into a columnar DataFrame with the extracted
    header as column names (the reference's combined-record view)."""
    row = extracted.first()
    header = row.header
    width = len(header)
    cells = [s.text for s in row.spans if s.kind == "cell"]
    records = [
        dict(zip(header, cells[i : i + width], strict=True))
        for i in range(0, len(cells), width)
    ]
    return spark.createDataFrame(records), row


def test_f12_formatter_as_columns(spark):
    extracted = _extract_f02c(spark)
    df, row = _rows_df(spark, extracted)
    assert row.header == ["prenoms", "nombre", "sexe", "annee"]
    # the reference closure: array_map(strtoupper) + (int) casts
    formatted = df.select(
        F.upper("prenoms").alias("prenoms"),
        F.col("nombre").cast("int").alias("nombre"),
        F.upper("sexe").alias("sexe"),
        F.col("annee").cast("int").alias("annee"),
    )
    t = Tabular(formatted, order_by=[F.col("prenoms")])
    first = t.sorted(F.col("nombre").desc()).first()
    # ParserTest.php:483-488
    assert first == {"prenoms": "ABDOULAYE", "nombre": 15, "sexe": "M", "annee": 2004}
    assert t.count() == 5


def test_table_json_shape(spark):
    """Reference Table::jsonSerialize → {caption, header, rows}
    (Table.php:68-75)."""
    extracted = _extract_f02c(spark)
    row = extracted.first()
    cells = [s.text for s in row.spans if s.kind == "cell"]
    width = len(row.header)
    payload = {
        "caption": row.caption,
        "header": list(row.header),
        "rows": [cells[i : i + width] for i in range(0, len(cells), width)],
    }
    encoded = json.loads(json.dumps(payload))
    assert encoded["caption"] is None
    assert encoded["header"] == ["prenoms", "nombre", "sexe", "annee"]
    assert len(encoded["rows"]) == 5
    assert encoded["rows"][0] == ["Abdoulaye", "15", "M", "2004"]


def test_enrich_media_spans(spark):
    html = (
        '<table><tr><td><img data-media-ref="r1"/>a</td>'
        '<td><img data-media-ref="r2"/>b</td></tr></table>'
    )
    docs = spark.createDataFrame(
        [{"doc_id": "m", "spans": html_to_doc_spans(html, ["r1", "r2"])}],
        DOCUMENTS_SCHEMA,
    )
    extracted = extract_tables(docs, ParserConfig())
    media = spark.createDataFrame(synthesize_media_table(["r1", "r2"]), MEDIA_SCHEMA)
    feats = extract_media_features(media)
    enriched = enrich_media_spans(extracted, feats).orderBy("pos").collect()
    assert [r.media_ref for r in enriched] == ["r1", "r2"]
    assert all(r.width is not None and len(r.feature) == 16 for r in enriched)
