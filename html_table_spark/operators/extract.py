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
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ParserConfig
from ..htmldom import _TAG_RE as _html_tag_re
from ..semantics import parse_document
from ..spans import doc_spans_to_html, encode_table_flat, encode_table_spans
from ..sources.documents import EXTRACTED_SCHEMA

_OUT_COLUMNS = [f.name for f in EXTRACTED_SCHEMA.fields if f.name != "wall_ms"]

_ARROW_SPAN = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)
_ARROW_OUT = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("table_idx", pa.int32()),
        pa.field("caption", pa.string()),
        pa.field("header", pa.list_(pa.string())),
        pa.field("spans", pa.list_(_ARROW_SPAN)),
        pa.field("row_lens", pa.list_(pa.int32())),
        pa.field("n_rows", pa.int32()),
        pa.field("n_cells", pa.int32()),
        pa.field("status", pa.string()),
        pa.field("error_msg", pa.string()),
        pa.field("part_id", pa.int32()),
        pa.field("wall_ms", pa.float64()),
    ]
)


def _result_row(doc_id: str, table, part_id: int) -> tuple:
    spans = encode_table_spans(table)
    return (
        doc_id,
        table.table_idx,
        table.caption,
        table.header,
        spans,
        [len(r) for r in table.rows],
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
                        (doc_id, -1, None, [], [], [], 0, 0, "ok", None, part_id)
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


def html_reassembly_col(spans_col: str = "spans"):
    """JVM-side twin of ``spans.doc_spans_to_html``: text spans with
    non-null text, ordered by (offset, original span position) — null
    offsets sort as 0 and ties keep span order, exactly the Python
    reference's stable sort — concatenated into one HTML string.

    Doing the reassembly in the JVM (round-3 Arrow-copy reduction) means
    the Python boundary carries ONE string column per document instead of
    the full span struct array: the kind/media_ref/offset child arrays and
    every media span stop crossing the JVM↔Python socket entirely, and the
    worker no longer materializes four ``to_pylist`` copies per batch just
    to re-join them. Null/empty span rows coalesce to ''.

    Expression shape (round-3 serial-planning diet): ONE lambda and a
    comparator-FREE ``array_sort``. Structs sort field-lexicographically,
    so ``struct(o, i, t)`` under the default ordering IS the stable
    (offset, position) sort — ``i`` is unique per array, so the ``t``
    field is never compared. Non-text / null-text spans keep a NULL ``t``
    instead of being pre-filtered: ``array_join`` skips null elements, so
    the filter rides the join for free, and the sorted ``t`` column comes
    out via lambda-free ``getField``. Every lambda costs repeated
    LambdaFunction resolution on EACH analyzer pass over the plan (the
    extraction pipeline analyzes this subtree ~10 times during
    construction) and an interpreted per-element call at runtime; the
    round-2 comparator variant additionally paid an interpreted lambda per
    COMPARISON (O(n log n) per row)."""
    indexed = F.transform(
        spans_col,
        lambda s, i: F.struct(
            F.coalesce(s["offset"], F.lit(0)).alias("o"),
            i.alias("i"),
            F.when(
                (s["kind"] == F.lit("text")) & s["text"].isNotNull(), s["text"]
            ).alias("t"),
        ),
    )
    joined = F.array_join(F.array_sort(indexed).getField("t"), "")
    return F.coalesce(joined, F.lit(""))


STATUS_CHUNK = "chunk"

import re as _re

_COMMENT_END_RE = _re.compile(r"--\s*>")

# A '<' inside a tag the boundary scan does NOT inspect (generic start tags
# like <td ...>, generic end tags like </td ...>) can hide one of the scan's
# own event patterns (quoted '<table>'/'</table>' in a data attribute,
# unquoted 'foo=</table>') and silently divert the depth counter while
# staying balanced. Detect that shape in ONE C-level pass and fall back to
# the always-correct whole-doc parse. Mirrors _TAG_RE's consumption rules:
# start-tag attrs honor quotes (so the quote alternatives here exclude '<'
# to EXPOSE an angle hidden inside them), end tags are quote-blind and stop
# at the first '>'. Event tags (<table/<script/<style/<!/<?/comments) fire
# before anything embedded in them and are consumed exactly, so a match
# inside one of those is only ever a harmless false positive (→ fallback).
_UNSEEN_TAG_ANGLE_RE = _re.compile(
    r"""<(?:
          [a-zA-Z](?:"[^"<]*"|'[^'<]*'|[^<>])*+  # start tag: quote-aware
        | /[^<>]*+                               # end tag: quote-blind
        )<""",
    _re.VERBOSE,
)
# The attr-region quantifiers are POSSESSIVE (*+): a quote char is matchable
# by both the pair alternatives and [^<>], so on a failing overall match a
# backtracking engine re-explores every pair-vs-single split — measured
# exponential (~8× per 4 chars) on a quote run like '<a ' + '"'*48, which
# would pin an executor core on one adversarial mega doc. Possessive
# matching keeps the deterministic left-to-right consumption (pairs first,
# lone quote as a plain char) and the same match language: the pair branch
# excludes '<', so every '<' it could hide is exposed either way, and a
# singles re-parse of a successful pair region dies at the first '>' the
# pair consumed — it can never reach a '<' the possessive scan missed.


def make_arrow_extractor(
    config: ParserConfig,
    flush_rows: int = 4096,
    mega_cost_threshold: int | None = None,
    tables_per_chunk: int = 64,
    mega_policy: str = "parse",
):
    """mapInArrow extraction: Arrow in, Arrow out, flat buffers throughout.

    ``mega_policy`` controls documents whose HTML exceeds
    ``mega_cost_threshold`` (select-all mode only):

    - ``'parse'`` — parse in place (default; single-table mode always does;
      the pipeline's pass 1 — a doc its routing proxy under-calls costs one
      slow task, never a dropped doc);
    - ``'skip'``  — emit nothing (for callers that route the mega tail to a
      dedicated pass with a filter GUARANTEED ≥ the real len(html), as the
      round-2 cost routing was; the discovery routing must NOT use it);
    - ``'chunk'`` — split via a linear boundary scan into chunk rows
      (``status='chunk'``, table_idx = base ordinal, spans = one text span)
      for a salted redistribution; unsplittable tag soup is parsed in place
      (correctness never depends on the split)."""

    def extract_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import gc

        from pyspark import TaskContext

        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else -1
        started = time.monotonic()
        # the DOM tree is acyclic (no parent pointers) — refcounting frees
        # it; CPython's cyclic GC otherwise triggers constantly on the
        # millions of container allocations per batch
        import os

        gc_was_enabled = (
            gc.isenabled() and os.environ.get("HTML_TABLE_SPARK_GC", "off") == "off"
        )
        if gc_was_enabled:
            gc.disable()
        try:
            yield from _run(part_id, started, batches)
        finally:
            # reused Python workers (spark.python.worker.reuse) would keep
            # GC off for every later task if the generator is closed early
            # (downstream limit(), task kill, or any raise)
            if gc_was_enabled:
                gc.enable()
                gc.collect()

    def _run(part_id: int, started: float, batches):
        def new_buffers():
            return {
                "doc_id": [], "table_idx": [], "caption": [], "header": [],
                "row_lens": [], "n_rows": [], "n_cells": [], "status": [],
                "error_msg": [],
                "span_offsets": [0],
                "sk": [], "st": [], "sr": [], "so": [],
            }

        buf = new_buffers()
        buf_bytes = 0  # approx bytes of span text buffered (Arrow string
        # offsets are int32: one array must stay far below 2 GB)
        FLUSH_BYTES = 256 * 1024 * 1024

        def flush() -> pa.RecordBatch:
            nonlocal buf, buf_bytes
            buf_bytes = 0
            n = len(buf["doc_id"])
            wall = (time.monotonic() - started) * 1000.0
            struct = pa.StructArray.from_arrays(
                [
                    pa.array(buf["sk"], pa.string()),
                    pa.array(buf["st"], pa.string()),
                    pa.array(buf["sr"], pa.string()),
                    pa.array(buf["so"], pa.int32()),
                ],
                fields=list(_ARROW_SPAN),
            )
            spans_arr = pa.ListArray.from_arrays(
                pa.array(buf["span_offsets"], pa.int32()), struct
            )
            batch = pa.RecordBatch.from_arrays(
                [
                    pa.array(buf["doc_id"], pa.string()),
                    pa.array(buf["table_idx"], pa.int32()),
                    pa.array(buf["caption"], pa.string()),
                    pa.array(buf["header"], pa.list_(pa.string())),
                    spans_arr,
                    pa.array(buf["row_lens"], pa.list_(pa.int32())),
                    pa.array(buf["n_rows"], pa.int32()),
                    pa.array(buf["n_cells"], pa.int32()),
                    pa.array(buf["status"], pa.string()),
                    pa.array(buf["error_msg"], pa.string()),
                    pa.array([part_id] * n, pa.int32()),
                    pa.array([wall] * n, pa.float64()),
                ],
                schema=_ARROW_OUT,
            )
            buf = new_buffers()
            return batch

        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            bases = (
                batch.column("table_idx_base").to_pylist()
                if "table_idx_base" in batch.schema.names
                else None
            )
            # HTML is reassembled JVM-side (html_reassembly_col): one string
            # column crosses Arrow, already filtered/ordered/joined
            htmls = batch.column("html").to_pylist()
            for i, html in enumerate(htmls):
                doc_id = doc_ids[i]
                base = bases[i] if bases is not None else 0
                if config.select_all_tables and (
                    mega_policy == "chunk"
                    or (
                        mega_policy == "skip"
                        and mega_cost_threshold is not None
                        and len(html) > mega_cost_threshold
                    )
                ):
                    if mega_policy == "skip":
                        continue
                    # INVARIANT (plans/pipeline.py relies on this): chunk
                    # mode emits ONLY status='chunk' rows — for EVERY doc in
                    # the pass, not just over-threshold ones, because the
                    # pipeline's routing proxies (span count under discovery
                    # routing, sort-free span-text length under cost
                    # routing) can exceed the real len(html);
                    # such a doc becomes one whole-doc chunk row, parsed
                    # downstream, never an in-place parse. If an in-place
                    # path is ever added here, the pipeline needs its
                    # parsed-in-place union leg (and the chunk-pass persist)
                    # back, or those rows are re-fed through extraction and
                    # their tables are lost
                    # (tests/test_pipeline.py::test_cost_over_threshold_
                    # but_small_html_keeps_tables).
                    cuts = _top_level_table_cuts(html)
                    if cuts and len(cuts) > tables_per_chunk:
                        pieces = [
                            (chunk_no, html[cuts[chunk_no][0]
                                            : cuts[min(chunk_no + tables_per_chunk, len(cuts)) - 1][1]])
                            for chunk_no in range(0, len(cuts), tables_per_chunk)
                        ]
                    else:
                        # unsplittable (tag soup / few huge tables): one
                        # whole-doc chunk — still redistributed by the salt,
                        # parsed downstream; correctness never depends on
                        # the boundary scan
                        pieces = [(0, html)]
                    for base_ordinal, text in pieces:
                        buf["doc_id"].append(doc_id)
                        buf["table_idx"].append(base_ordinal)
                        buf["caption"].append(None)
                        buf["header"].append([])
                        buf["row_lens"].append([])
                        buf["n_rows"].append(0)
                        buf["n_cells"].append(0)
                        buf["status"].append(STATUS_CHUNK)
                        buf["error_msg"].append(None)
                        buf["sk"].append("text")
                        buf["st"].append(text)
                        buf["sr"].append(None)
                        buf["so"].append(0)
                        buf["span_offsets"].append(len(buf["sk"]))
                        buf_bytes += len(text)
                        if (
                            len(buf["doc_id"]) >= flush_rows
                            or buf_bytes >= FLUSH_BYTES
                        ):
                            yield flush()
                    continue
                results = parse_document(html, config)
                if not results and config.select_all_tables:
                    # completion marker (see make_extractor)
                    buf["doc_id"].append(doc_id)
                    buf["table_idx"].append(-1)
                    buf["caption"].append(None)
                    buf["header"].append([])
                    buf["row_lens"].append([])
                    buf["n_rows"].append(0)
                    buf["n_cells"].append(0)
                    buf["status"].append("ok")
                    buf["error_msg"].append(None)
                    buf["span_offsets"].append(len(buf["sk"]))
                for table in results:
                    buf["doc_id"].append(doc_id)
                    buf["table_idx"].append(table.table_idx + base)
                    buf["caption"].append(table.caption)
                    buf["header"].append(table.header)
                    buf["row_lens"].append([len(r) for r in table.rows])
                    buf["n_rows"].append(table.n_rows)
                    buf["n_cells"].append(table.n_cells)
                    buf["status"].append(table.status)
                    buf["error_msg"].append(table.error_msg)
                    encode_table_flat(table, buf["sk"], buf["st"], buf["sr"], buf["so"])
                    buf["span_offsets"].append(len(buf["sk"]))
                buf_bytes += len(html)  # upper bound on this doc's span text
                if len(buf["doc_id"]) >= flush_rows or buf_bytes >= FLUSH_BYTES:
                    yield flush()
        if buf["doc_id"]:
            yield flush()

    return extract_batches


def extract_tables(
    documents: DataFrame,
    config: ParserConfig | None = None,
    *,
    mega_cost_threshold: int | None = None,
    tables_per_chunk: int = 64,
    mega_policy: str = "parse",
    spread_small_inputs: bool = True,
    pre_reassembled: bool = False,
    has_base: bool | None = None,
) -> DataFrame:
    """documents(doc_id, spans[, table_idx_base]) → extracted tables.

    One output row per (document, extracted table); reference single-table
    semantics by default, ``config.all_tables()`` for corpus mode.  Errors
    surface as ``status='error'`` rows, never exceptions (SURVEY.md §2.1).

    Implemented over ``mapInArrow``: the span columns stay as flat Arrow
    buffers on both sides of the Python boundary — no pandas, no per-span
    dict/object materialization (BASELINE.json hot-path constraint taken to
    its conclusion).

    ``pre_reassembled=True``: the input already carries
    ``(doc_id, html[, table_idx_base])`` — the caller did the JVM-side
    reassembly itself (the extraction pipeline shares ONE reassembly
    subtree across both passes). ``has_base`` skips the ``.columns``
    schema probe when the caller knows the answer — probing an unanalyzed
    DataFrame triggers a full Catalyst analyzer pass, pure serial driver
    time (round-3 serial-planning diet).
    """
    from .util import ensure_parallelism

    config = config or ParserConfig()
    if has_base is None:
        has_base = "table_idx_base" in documents.columns
    if pre_reassembled:
        pruned = documents
    else:
        # explicit pruning before the UDF stage, with the HTML reassembly
        # done JVM-side: the Arrow boundary carries (doc_id, html) only — no
        # span structs, no media spans (round-3 Arrow-copy reduction)
        cols = [F.col("doc_id"), html_reassembly_col("spans").alias("html")] + (
            [F.col("table_idx_base")] if has_base else []
        )
        pruned = documents.select(*cols)
    if spread_small_inputs:
        # a dimension-sized corpus arriving as one file = one partition
        # would serialize the whole Arrow stage on a single Python worker.
        # The full pipeline (plans/pipeline.py) manages partitioning itself
        # and passes False to keep its zero-shuffle 'never' contract.
        pruned = ensure_parallelism(pruned)
    return pruned.mapInArrow(
        make_arrow_extractor(
            config,
            mega_cost_threshold=mega_cost_threshold,
            tables_per_chunk=tables_per_chunk,
            mega_policy=mega_policy,
        ),
        schema=EXTRACTED_SCHEMA,
    )


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
    always correct, just unsplit.

    The scan mirrors the tokenizer exactly at every event it inspects: at a
    candidate <table>/<script>/<style> start tag it runs the tokenizer's own
    ``_TAG_RE`` (htmldom), so self-closed empty elements (``<script/>``,
    ``<table/>``), quoted-attribute ``>`` and quoted ``</table>`` inside the
    *inspected* tag, and ``<tablex``-style non-matches all resolve the same
    way a whole-doc parse would. Table tags inside comments, inside
    <script>/<style> raw text, and inside ``<?...?>`` PIs / ``<!...>``
    bogus declarations (which the tokenizer swallows to their first '>')
    are NOT boundaries, and close tags require the tokenizer's
    name-boundary (``</tables>`` is not a close). Tags the scan does not
    inspect (``<td …>``, ``</td …>``) can swallow event patterns in their
    attribute region — quoted ``data-x="</table>x<table>"`` stays
    *balanced* and would silently cut garbage (round-3 ADVICE) — so a
    single C-level pre-scan (``_UNSEEN_TAG_ANGLE_RE``) detects any ``<``
    inside a tag body and falls back to the whole-doc parse, which is
    always correct, just unsplit."""
    lower = html.lower()
    n = len(lower)
    if n != len(html):  # .lower() changed length (e.g. 'İ') → offsets shift
        return None
    if _UNSEEN_TAG_ANGLE_RE.search(html) is not None:
        return None  # markup hidden inside a tag body — do not split
    cuts: list[tuple[int, int]] = []
    depth = 0
    pos = 0
    start = -1
    find = lower.find
    tag_match = _html_tag_re.match
    # per-pattern next-occurrence cache, refreshed only once consumed — a
    # fresh find() of every pattern at every event would rescan the rest of
    # the doc k times per table (quadratic on mega docs, the one place this
    # function runs)
    pats = {
        "open": "<table", "close": "</table", "bang": "<!",
        "pi": "<?", "script": "<script", "style": "<style",
    }
    nxt = {k: find(p) for k, p in pats.items()}
    while pos < n:
        for k, p in pats.items():
            if -1 < nxt[k] < pos:
                nxt[k] = find(p, pos)
        events = [(v, k) for k, v in nxt.items() if v != -1]
        if not events:
            break
        at, kind = min(events)
        if kind == "bang":
            if lower.startswith("<!--", at):
                # tokenizer comment terminator is the regex --\s*> (not
                # the literal -->); an unterminated comment is ambiguous →
                # fall back to whole-doc parsing rather than risk
                # divergent cuts
                m = _COMMENT_END_RE.search(lower, at + 4)
                if m is None:
                    return None
                pos = m.end()
            else:
                # bogus declaration / DOCTYPE: tokenizer swallows to the
                # first '>' (no node); with no '>' it emits '<' as text
                # and rescans from at+1 — mirror both
                gt = find(">", at)
                pos = (gt + 1) if gt != -1 else at + 1
            continue
        if kind == "pi":
            # <?...> processing instruction: swallowed to the first '>'
            gt = find(">", at)
            pos = (gt + 1) if gt != -1 else at + 1
            continue
        if kind == "close":
            after = at + 7
            if after < n and lower[after] not in " >\t\n\r":
                pos = after  # </tables> — not a table close
                continue
            if depth == 0:
                return None  # stray close — soup; don't split
            depth -= 1
            gt = find(">", at)
            end = (gt + 1) if gt != -1 else n
            if depth == 0:
                cuts.append((start, end))
            pos = end
            continue
        # open / script / style: run the tokenizer's start-tag regex so tag
        # end and self-closing resolve identically to a whole-doc parse
        m = tag_match(lower, at)
        if m is None:
            pos = at + 1  # tokenizer emits '<' as text and rescans from at+1
            continue
        name = m.group("name")
        tag_end = m.end()
        selfclose = bool(m.group("selfclose"))
        if kind in ("script", "style"):
            if name != kind:
                pos = tag_end  # <scriptx ...> — ordinary unknown element
                continue
            if selfclose:
                pos = tag_end  # <script/> is an EMPTY element — no raw text
                continue
            endtag = find(f"</{kind}", tag_end)
            if endtag == -1:
                break  # raw text runs to EOF — nothing after can be a table
            gt = find(">", endtag)
            pos = n if gt == -1 else gt + 1
            continue
        # kind == "open"
        if name != "table":
            pos = tag_end  # <tablex ...>
            continue
        if selfclose:
            # empty table element: a complete zero-row table at this depth —
            # it never pushes the tokenizer's stack, so it must not touch
            # the depth counter either
            if depth == 0:
                cuts.append((at, tag_end))
            pos = tag_end
            continue
        if depth == 0:
            start = at
        depth += 1
        pos = tag_end
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
                    out.append(
                        (doc_id, list(spans) if spans is not None else [], 0)
                    )
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
