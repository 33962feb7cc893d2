"""The extraction kernel: reference-exact table semantics, pure Python.

This is the correctness core (SURVEY.md §7.1 step 1): given one HTML string
and a :class:`ParserConfig`, produce the extracted table(s) with the exact
semantics of the reference parser (bakame-php/html-table,
``src/Parser.php:366-622``), including its quirky grid-expansion variant
(SURVEY.md §2.5) which is deliberately NOT the HTML5 algorithm:

1. span clamping: colspan/rowspan < 2 or > 1000 → 1 (Parser.php:549-556);
2. colspan duplication: a cell with colspan k emits k copies of its full
   text (Parser.php:568);
3. rowspan carry keyed by DOM child index — including whitespace text nodes
   and comments (Parser.php:559-574);
4. a single trailing splice at last_index+1 after the cell loop
   (Parser.php:577-584); pending entries at higher indices stay queued;
5. rowspan state: fresh per <thead>/<tbody>/<tfoot> element, shared across
   ALL direct-<tr> children of <table> (Parser.php:483,499);
6. the header row is extracted with a throwaway rowspan state and never
   contributes carries to the body (Parser.php:534).

Per-document failures return ``status='error'`` results with the reference's
message semantics instead of raising — a raising UDF would kill the Spark
stage (SURVEY.md §2.1).

Everything here is scalar per-document logic by design: the Spark layer
(`operators/extract.py`) vectorizes at the Arrow-batch level (many documents
per Python call), satisfying the "no per-row Python on the hot path" rule
(BASELINE.json:6) — batches, not rows, cross the JVM↔Python boundary.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

from .config import ALL_SECTIONS, TR, ParserConfig, validate_header
from .errors import MSG_TABLE_NOT_FOUND, ParserError, msg_not_a_table
from .htmldom import COMMENT, ELEMENT, TEXT, Node, parse_html, php_int_cast
from .xpath import XPathExpr, compile_xpath

# PHP trim charset used for header cells ONLY (Parser.php:539):
# NBSP + space + \t \n \r \0 \x0B. Data cells are NOT normalized.
HEADER_TRIM_CHARSET = "  \t\n\r\x00\x0b"

CELL_TAGS = ("th", "td")  # Parser.php:48
# elements that carry a media reference in the interleaved corpus
# (graft extension, FIXTURES.md F13)
MEDIA_TAGS = frozenset({"img", "object", "embed", "video", "audio", "source", "iframe"})
MEDIA_REF_ATTR = "data-media-ref"


@dataclass(frozen=True)
class Cell:
    """One emitted grid cell copy: raw nodeValue text + the media refs found
    inside the source cell, in document order."""

    text: str
    media: tuple[str, ...] = ()


@dataclass
class ExtractedTable:
    """One (document, table) extraction result."""

    table_idx: int
    caption: str | None = None
    header: list[str] = field(default_factory=list)
    # combined rows: each entry is a Cell, or None when a user header
    # references a missing source offset (Parser.php:619)
    rows: list[list[Cell | None]] = field(default_factory=list)
    status: str = "ok"
    error_msg: str | None = None

    @property
    def n_rows(self) -> int:
        return len(self.rows)

    @property
    def n_cells(self) -> int:
        return sum(len(r) for r in self.rows)

    def row_texts(self) -> list[list[str | None]]:
        """Rows as plain text lists (the reference's record arrays)."""
        return [[c.text if c is not None else None for c in row] for row in self.rows]


@lru_cache(maxsize=256)
def _compiled(expression: str) -> XPathExpr:
    return compile_xpath(expression)


_CAPTION_EXPR = "(//caption)[1]"  # Parser.php:389
_TABLE_EXPR = "//table"  # Parser.php:478


def _span_size(node: Node, attr: str) -> int:
    """Parser.php:549-556 — PHP int cast then clamp to [2, 1000] else 1."""
    span = php_int_cast(node.attrs.get(attr, ""))
    if span < 2 or span > 1000:
        return 1
    return span


def _collect_media(cell: Node) -> tuple[str, ...]:
    refs: list[str] = []
    for el in cell.iter_elements():
        if el.tag in MEDIA_TAGS:
            ref = el.attrs.get(MEDIA_REF_ATTR)
            if ref:
                refs.append(ref)
    return tuple(refs)


def _cell_text(node: Node) -> str:
    """text_content with a fast path for the dominant leaf shape
    (<td>one text node</td>)."""
    children = node.children
    if not children:
        return ""
    if len(children) == 1:
        first = children[0]
        if type(first) is str:
            return first
        if first.kind != ELEMENT:
            return ""  # comment or PI only → nodeValue ''
    return node.text_content()


def _has_element_child(node: Node) -> bool:
    for c in node.children:
        if type(c) is Node and c.kind == ELEMENT:
            return True
    return False


def extract_record(
    tr: Node,
    row_span_indices: dict[int, list[list[Cell]]],
    emit_media: bool,
) -> list[Cell]:
    """Grid-expand one <tr> (Parser.php:547-587, byte-for-byte semantics).

    ``row_span_indices`` maps DOM child index → queue of pending cell blocks
    from earlier rowspans; mutated in place exactly like the PHP reference.
    """
    row: list[Cell] = []
    index = -2  # PHP: $index ??= -2 when the tr has no childNodes
    for index, node in enumerate(tr.children):
        if row_span_indices:
            pending = row_span_indices.get(index)
            if pending is not None:
                row.extend(pending.pop(0))
                if not pending:
                    del row_span_indices[index]
        if type(node) is Node and node.kind == ELEMENT and node.tag in CELL_TAGS:
            children = node.children
            if len(children) == 1 and type(children[0]) is str:
                # dominant shape: <td>text</td> — no helper calls
                text = children[0]
                has_children_elements = False
            else:
                has_children_elements = _has_element_child(node)
                text = (
                    node.text_content() if has_children_elements else _cell_text(node)
                )
            media = (
                _collect_media(node) if (emit_media and has_children_elements) else ()
            )
            cell = Cell(text, media)
            if node.attrs:
                colspan = _span_size(node, "colspan")
                rowspan = _span_size(node, "rowspan")
            else:
                colspan = rowspan = 1
            cells = [cell] * colspan
            row.extend(cells)
            if rowspan > 1:
                row_span_indices[index] = [list(cells) for _ in range(rowspan - 1)]
    # single trailing splice at last_index + 1 (Parser.php:577-584)
    index += 1
    pending = row_span_indices.get(index)
    if pending is not None:
        row.extend(pending.pop(0))
        if not pending:
            del row_span_indices[index]
    return row


def _extract_header_row(tr: Node, emit_media: bool) -> list[str]:
    """Parser.php:532-540: grid-expand with a throwaway rowspan state, then
    trim each cell with the exact PHP charset."""
    record = extract_record(tr, {}, emit_media)
    return [cell.text.strip(HEADER_TRIM_CHARSET) for cell in record]


def _filter_record(node: Node, marked_id: int | None) -> Node | None:
    """Parser.php:519-527 — keep only <tr> elements that are not the marked
    header row (marking is by node identity here; the reference mutates the
    DOM with a marker attribute, same observable effect)."""
    if type(node) is not Node or node.kind != ELEMENT or node.tag != "tr":
        return None
    if marked_id is not None and id(node) == marked_id:
        return None
    return node


def _combine(record: list[Cell], header_pairs) -> list[Cell | None]:
    """Parser.php:614-622 — project the positional record through the
    (possibly sparse, reordering) header; missing offsets → None."""
    return [record[off] if 0 <= off < len(record) else None for off, _ in header_pairs]


def _extract_table(
    table_node: Node,
    config: ParserConfig,
    table_idx: int,
) -> ExtractedTable:
    """Steps 3-7 of the reference lifecycle (SURVEY.md §3.2) for one selected
    table element: re-root, resolve header, walk sections, grid-expand,
    combine, caption."""
    # Re-root: a fresh document containing only the selected table
    # (Parser.php:375). Subsequent XPaths run over this subtree, which
    # preserves the reference's nested-table quirk: (//caption)[1] and
    # (//table/thead/tr)[1] may match a NESTED table's caption/thead.
    rerooted = Node(ELEMENT, tag="#document")
    rerooted.children = [table_node]

    # -- header resolution (precedence at Parser.php:376-380) --------------
    marked_id: int | None = None
    if config.table_header:
        header_pairs = list(config.table_header)
        header_names = [name for _, name in header_pairs]
        extracted = False
    elif config.ignore_table_header:
        header_pairs = []
        header_names = []
        extracted = False
    else:
        tr = _compiled(config.table_header_expression).first(rerooted)
        if tr is None:
            header_names = []
        else:
            header_names = _extract_header_row(tr, config.emit_media_spans)
            if header_names:
                # reference marks the DOM row so body extraction skips it
                # (Parser.php:536, :524)
                marked_id = id(tr)
        header_pairs = list(enumerate(header_names))
        extracted = True

    # extracted headers are re-validated for duplicates inside the body walk
    # (Parser.php:482); user headers were validated at config time.
    if extracted and header_names:
        try:
            validate_header(header_names)
        except ParserError as exc:
            return ExtractedTable(
                table_idx=table_idx, status="error", error_msg=str(exc)
            )

    # -- body extraction (Parser.php:475-508) -------------------------------
    # NOTE: '//table' item(0) over the re-rooted doc is the selected table
    # itself (document order puts the outer table first).
    included = set(config.included_sections)
    rows: list[list[Cell | None]] = []
    row_span_shared: dict[int, list[list[Cell]]] = {}  # direct-tr state, shared
    for child in table_node.children:
        if type(child) is not Node or child.kind != ELEMENT:
            continue
        section = child.tag if child.tag in ALL_SECTIONS else None
        if section is None or section not in included:
            continue
        if section == TR:
            record_tr = _filter_record(child, marked_id)
            if record_tr is not None:
                record = extract_record(
                    record_tr, row_span_shared, config.emit_media_spans
                )
                rows.append(
                    _combine(record, header_pairs) if header_pairs else list(record)
                )
            continue
        row_span_section: dict[int, list[list[Cell]]] = {}  # fresh per section
        for tr in child.children:
            record_tr = _filter_record(tr, marked_id)
            if record_tr is not None:
                record = extract_record(
                    record_tr, row_span_section, config.emit_media_spans
                )
                rows.append(
                    _combine(record, header_pairs) if header_pairs else list(record)
                )

    # -- caption (Parser.php:389-390) ---------------------------------------
    caption_node = _compiled(_CAPTION_EXPR).first(rerooted)
    caption = caption_node.text_content() if caption_node is not None else config.caption

    return ExtractedTable(
        table_idx=table_idx,
        caption=caption,
        header=header_names,
        rows=rows,
    )


def _top_level_tables(root: Node) -> list[Node]:
    """Tables with no <table> ancestor, document order. Nested tables are
    part of their outer cell's text (nodeValue flattening) — they are not
    independent extraction units."""
    found: list[Node] = []
    stack = list(reversed(root.children))
    while stack:
        node = stack.pop()
        if type(node) is not Node or node.kind != ELEMENT:
            continue
        if node.tag == "table":
            found.append(node)
            continue  # do not descend
        stack.extend(reversed(node.children))
    return found


def parse_document(html: str, config: ParserConfig) -> list[ExtractedTable]:
    """Extract table(s) from one HTML document.

    Single-table mode (reference semantics): select via
    ``config.table_expression``; exactly one result, ``status='error'`` when
    the selection fails (messages per Parser.php:371,373).

    ``select_all_tables`` mode (graft extension for the interleaved corpus):
    one result per top-level table, ``table_idx`` = 0-based ordinal; a
    document with no tables yields no results.
    """
    root, parse_errors = parse_html(html)
    if config.fail_on_xml_errors and parse_errors:
        # reference: ParserError::dueToLibXmlErrors (Parser.php:450-453)
        msg = "\n".join(f"parse error: {e}" for e in parse_errors)
        return [ExtractedTable(table_idx=0, status="error", error_msg=msg)]

    if config.select_all_tables:
        return [
            _extract_table(node, config, i)
            for i, node in enumerate(_top_level_tables(root))
        ]

    selected = _compiled(config.table_expression).first(root)
    if (
        selected is None
        or type(selected) is not Node
        or selected.kind != ELEMENT
        or selected.tag == "#document"
    ):
        # None, or an attribute/text/comment/PI/namespace result, or the
        # synthetic #document container (reachable via parent climbs:
        # //table/.., //comment()/..): the reference gates on
        # `instanceof DOMElement` (Parser.php:370) and a DOMDocument is
        # not a DOMElement, so non-element nodes get the not-found error,
        # not not-a-table
        return [
            ExtractedTable(table_idx=0, status="error", error_msg=MSG_TABLE_NOT_FOUND)
        ]
    if selected.tag != "table":
        return [
            ExtractedTable(
                table_idx=0, status="error", error_msg=msg_not_a_table(selected.tag)
            )
        ]
    return [_extract_table(selected, config, 0)]
