"""The distributed extraction operator: Arrow-vectorized ``mapInPandas``.

Design (SURVEY.md §1.4, §3.4): Catalyst plans the Parquet/Iceberg scan with
column pruning down to (doc_id, spans); Arrow moves columnar batches into
the Python worker; this operator runs the pure-Python kernel per document
inside the batch and yields bounded output batches (1 input doc → N output
tables, a UDTF-shaped fan-out).  There is **no per-row Python UDF** anywhere
— the JVM↔Python boundary is crossed per Arrow batch, not per row
(BASELINE.json:6 hot-path constraint).

The extraction config is a small frozen dataclass captured in the closure —
pickled once per task, never re-validated per document.

Memory envelope: multi-MB HTML docs can blow up the default 10k-row Arrow
batches; callers should set ``spark.sql.execution.arrow.maxRecordsPerBatch``
(the pipeline does, see plans/pipeline.py) and this operator additionally
flushes its *output* every ``flush_rows`` tables so one mega-doc cannot
pin a giant pandas frame (iterator-in/iterator-out, never the whole
partition).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..config import ParserConfig
from ..semantics import parse_document
from ..spans import doc_spans_to_html, encode_table_spans
from ..sources.documents import EXTRACTED_SCHEMA

_OUT_COLUMNS = [f.name for f in EXTRACTED_SCHEMA.fields if f.name != "wall_ms"]


def _result_row(doc_id: str, table, part_id: int) -> tuple:
    spans = encode_table_spans(table)
    return (
        doc_id,
        table.table_idx,
        table.caption,
        table.header,
        spans,
        table.n_rows,
        table.n_cells,
        table.status,
        table.error_msg,
        part_id,
    )


def make_extractor(config: ParserConfig, flush_rows: int = 2048):
    """Build the mapInPandas function for ``config``.

    Exposed separately so the mega-doc split path (plans/pipeline.py) can
    reuse it over chunk streams with a table_idx base offset column.
    """

    def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else -1
        started = time.monotonic()

        def flush(rows: list[tuple]) -> pd.DataFrame:
            frame = pd.DataFrame(rows, columns=_OUT_COLUMNS)
            # cumulative partition wall time so far; lineage takes max()
            frame["wall_ms"] = (time.monotonic() - started) * 1000.0
            return frame

        rows: list[tuple] = []
        has_base = None
        for batch in batches:
            if has_base is None:
                has_base = "table_idx_base" in batch.columns
            bases = batch["table_idx_base"].values if has_base else None
            for i, (doc_id, spans) in enumerate(
                zip(batch["doc_id"].values, batch["spans"].values)
            ):
                html = doc_spans_to_html(spans if spans is not None else [])
                base = int(bases[i]) if bases is not None else 0
                results = parse_document(html, config)
                if not results and config.select_all_tables:
                    # completion marker: a doc with zero tables must still be
                    # recorded, or snapshot-resume would reprocess it forever
                    # (filter table_idx >= 0 for real tables)
                    rows.append(
                        (doc_id, -1, None, [], [], 0, 0, "ok", None, part_id)
                    )
                for table in results:
                    if base:
                        table.table_idx += base
                    rows.append(_result_row(doc_id, table, part_id))
                if len(rows) >= flush_rows:
                    yield flush(rows)
                    rows = []
        if rows:
            yield flush(rows)

    return extract_batches


def extract_tables(documents: DataFrame, config: ParserConfig | None = None) -> DataFrame:
    """documents(doc_id, spans[, table_idx_base]) → extracted tables.

    One output row per (document, extracted table); reference single-table
    semantics by default, ``config.all_tables()`` for corpus mode.  Errors
    surface as ``status='error'`` rows, never exceptions (SURVEY.md §2.1).
    """
    config = config or ParserConfig()
    cols = ["doc_id", "spans"] + (
        ["table_idx_base"] if "table_idx_base" in documents.columns else []
    )
    pruned = documents.select(*cols)  # explicit pruning before the UDF stage
    return pruned.mapInPandas(make_extractor(config), schema=EXTRACTED_SCHEMA)


# ---------------------------------------------------------------------------
# Mega-document splitting (skew path)
# ---------------------------------------------------------------------------

SPLIT_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>, table_idx_base int"
)


def _top_level_table_cuts(html: str) -> list[tuple[int, int]] | None:
    """Byte ranges [start, end) of top-level <table>…</table> blocks via a
    single linear scan. Returns None when the scan finds unbalanced nesting
    (tag soup) — callers then fall back to whole-doc extraction, which is
    always correct, just unsplit."""
    lower = html.lower()
    cuts: list[tuple[int, int]] = []
    depth = 0
    pos = 0
    start = -1
    n = len(lower)
    while pos < n:
        open_i = lower.find("<table", pos)
        close_i = lower.find("</table", pos)
        if open_i == -1 and close_i == -1:
            break
        if close_i == -1 or (open_i != -1 and open_i < close_i):
            # an opening tag; require a following boundary char to avoid
            # matching e.g. <tablex>
            after = open_i + 6
            if after < n and lower[after] not in " >\t\n\r/":
                pos = after
                continue
            if depth == 0:
                start = open_i
            depth += 1
            pos = after
        else:
            if depth == 0:
                return None  # stray close — soup; don't split
            depth -= 1
            gt = lower.find(">", close_i)
            end = (gt + 1) if gt != -1 else n
            if depth == 0:
                cuts.append((start, end))
            pos = end
    if depth != 0:
        return None
    return cuts


def split_mega_docs(
    mega: DataFrame, tables_per_chunk: int = 64
) -> DataFrame:
    """mega(doc_id, spans) → chunk work-units (doc_id, spans, table_idx_base).

    Each chunk carries ≤ ``tables_per_chunk`` consecutive top-level tables as
    a single text span, plus the ordinal of its first table, so downstream
    extraction assigns globally correct ``table_idx`` values without any
    per-doc reassembly shuffle (table_idx = base + local ordinal).
    Documents whose markup defeats the linear boundary scan pass through
    whole (base 0) — correctness never depends on the split.
    """

    def split_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: list[tuple] = []
        for batch in batches:
            for doc_id, spans in zip(batch["doc_id"].values, batch["spans"].values):
                html = doc_spans_to_html(spans if spans is not None else [])
                cuts = _top_level_table_cuts(html)
                if not cuts or len(cuts) <= tables_per_chunk:
                    out.append((doc_id, list(spans), 0))
                    continue
                for chunk_no in range(0, len(cuts), tables_per_chunk):
                    group = cuts[chunk_no : chunk_no + tables_per_chunk]
                    text = html[group[0][0] : group[-1][1]]
                    chunk_spans = [
                        {"kind": "text", "text": text, "media_ref": None, "offset": 0}
                    ]
                    out.append((doc_id, chunk_spans, chunk_no))
            if out:
                yield pd.DataFrame(out, columns=["doc_id", "spans", "table_idx_base"])
                out = []

    return mega.select("doc_id", "spans").mapInPandas(split_batches, schema=SPLIT_SCHEMA)
