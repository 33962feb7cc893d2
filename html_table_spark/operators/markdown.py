"""HTML → Markdown rendering over the tolerant DOM.

Modern LLM-corpus pipelines convert crawled HTML into markdown-ish text
after boilerplate stripping (the layout survives as lightweight syntax —
headings, lists, links, tables — instead of vanishing into flat text).
This operator renders the same tolerant tree the extraction kernel parses
(:func:`htmldom.parse_html`) into deterministic GitHub-flavored markdown:

* headings ``#``–``######``, paragraphs, ``> `` blockquotes, fenced code
  blocks (``pre``/``code`` verbatim — no entity re-collapse, no wrap),
  ``---`` rules, nested ``-``/``1.`` lists (two-space indent per level,
  ordered lists numbered by position);
* inline ``**strong**``, ``*emphasis*``, `` `code` ``, ``[text](href)``
  links and ``![alt](src)`` images;
* tables as pipe rows with the standard ``| --- |`` separator after the
  first row (markdown requires a rectangular grid, so cells are taken in
  DOM row order — the full grid semantics with rowspan/colspan expansion
  live in the extraction kernel, which is the lossless path);
* ``script``/``style``/``head``/comments dropped, whitespace collapsed
  outside code blocks, blank line between blocks.

Everything is stdlib-recursive with an explicit depth cap (adversarially
nested markup degrades to text content rather than hitting Python's
recursion limit), and the per-document work runs in one Arrow-batched
``mapInPandas`` pass — same zero-shuffle shape as main-content extraction.

Reference parity note: the reference library (bakame-php/html-table) has
no renderer; this is part of the corpus-pipeline surface the build plan
adds beyond the reference (SURVEY.md §2 extension rows).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..htmldom import COMMENT, ELEMENT, Node, parse_html

__all__ = ["html_to_markdown", "render_markdown", "MARKDOWN_SCHEMA"]

MARKDOWN_SCHEMA = "doc_id string, markdown string, status string"

_MAX_DEPTH = 120

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_SKIP = frozenset({"script", "style", "head", "title", "meta", "link", "base",
                   "noscript", "template"})
_BLOCKS = frozenset({"p", "div", "section", "article", "main", "header",
                     "footer", "aside", "nav", "figure", "figcaption",
                     "address", "fieldset", "form", "dl", "dt", "dd"})
_WS = re.compile(r"\s+")


def _inline(node, depth: int) -> str:
    """Inline-render a node (text, element, or comment child entry)."""
    if type(node) is str:
        return _WS.sub(" ", node)
    if node.kind != ELEMENT:
        return ""
    tag = node.tag
    if tag in _SKIP:
        return ""
    if depth > _MAX_DEPTH:
        return _WS.sub(" ", node.text_content())
    inner = "".join(_inline(c, depth + 1) for c in node.children)
    if tag in ("strong", "b"):
        s = inner.strip()
        return f"**{s}**" if s else ""
    if tag in ("em", "i"):
        s = inner.strip()
        return f"*{s}*" if s else ""
    if tag in ("code", "kbd", "samp", "tt"):
        s = inner.strip()
        return f"`{s}`" if s else ""
    if tag == "a":
        s = inner.strip() or node.get_attribute("href")
        href = node.get_attribute("href")
        return f"[{s}]({href})" if href else s
    if tag == "img":
        alt = _WS.sub(" ", node.get_attribute("alt")).strip()
        src = node.get_attribute("src")
        return f"![{alt}]({src})" if src else alt
    if tag == "br":
        return "\n"
    return inner


def _code_text(node: Node) -> str:
    """Verbatim text of a pre/code subtree (no collapsing)."""
    return node.text_content()


def _table_blocks(node: Node, depth: int) -> list[str]:
    rows: list[list[str]] = []

    def walk_rows(el: Node) -> None:
        for c in el.children:
            if type(c) is str or c.kind != ELEMENT:
                continue
            if c.tag == "tr":
                cells = [
                    _WS.sub(" ", _inline_cells(cell, depth)).strip().replace("|", "\\|")
                    for cell in c.children
                    if type(cell) is not str
                    and cell.kind == ELEMENT
                    and cell.tag in ("td", "th")
                ]
                if cells:
                    rows.append(cells)
            elif c.tag in ("thead", "tbody", "tfoot"):
                walk_rows(c)

    caption = ""
    for c in node.children:
        if type(c) is not str and c.kind == ELEMENT and c.tag == "caption":
            caption = _WS.sub(" ", c.text_content()).strip()
    walk_rows(node)
    if not rows:
        return [caption] if caption else []
    width = max(len(r) for r in rows)
    out_lines = []
    for i, r in enumerate(rows):
        padded = r + [""] * (width - len(r))
        out_lines.append("| " + " | ".join(padded) + " |")
        if i == 0:
            out_lines.append("| " + " | ".join(["---"] * width) + " |")
    blocks = []
    if caption:
        blocks.append(caption)
    blocks.append("\n".join(out_lines))
    return blocks


def _inline_cells(cell: Node, depth: int) -> str:
    return "".join(_inline(c, depth + 1) for c in cell.children)


def _list_blocks(node: Node, depth: int, indent: int, ordered: bool) -> list[str]:
    lines: list[str] = []
    idx = 0
    pad = "  " * indent
    for c in node.children:
        if type(c) is str or c.kind != ELEMENT or c.tag != "li":
            continue
        idx += 1
        marker = f"{idx}. " if ordered else "- "
        inline_parts: list[str] = []
        sub: list[str] = []
        for g in c.children:
            if (
                type(g) is not str
                and g.kind == ELEMENT
                and g.tag in ("ul", "ol")
                and depth <= _MAX_DEPTH
            ):
                sub.extend(
                    _list_blocks(g, depth + 1, indent + 1, g.tag == "ol")
                )
            else:
                inline_parts.append(_inline(g, depth + 1))
        text = _WS.sub(" ", "".join(inline_parts)).strip()
        lines.append(f"{pad}{marker}{text}")
        lines.extend(sub)
    return ["\n".join(lines)] if lines else []


def _blocks(node: Node, depth: int) -> list[str]:
    """Render an element into a list of markdown blocks."""
    out: list[str] = []
    para: list[str] = []

    def flush() -> None:
        text = _WS.sub(" ", "".join(para)).strip()
        # a paragraph assembled from inline pieces may carry <br> newlines:
        # keep them as hard line breaks
        if para and "\n" in "".join(para):
            text = "\n".join(
                s for s in (_WS.sub(" ", ln).strip() for ln in "".join(para).split("\n"))
            ).strip("\n")
        if text:
            out.append(text)
        para.clear()

    for c in node.children:
        if type(c) is str:
            para.append(_WS.sub(" ", c))
            continue
        if c.kind == COMMENT or c.kind != ELEMENT:
            continue
        tag = c.tag
        if tag in _SKIP:
            continue
        if tag in _HEADINGS:
            flush()
            text = _WS.sub(" ", _inline_cells(c, depth)).strip()
            if text:
                out.append("#" * _HEADINGS[tag] + " " + text)
        elif tag == "hr":
            flush()
            out.append("---")
        elif tag == "pre":
            flush()
            code = _code_text(c).strip("\n")
            out.append(f"```\n{code}\n```")
        elif tag == "blockquote":
            flush()
            for b in _blocks(c, depth + 1) if depth <= _MAX_DEPTH else [
                _WS.sub(" ", c.text_content()).strip()
            ]:
                out.append("\n".join("> " + ln for ln in b.split("\n")))
        elif tag in ("ul", "ol"):
            flush()
            out.extend(_list_blocks(c, depth + 1, 0, tag == "ol"))
        elif tag == "table":
            flush()
            out.extend(_table_blocks(c, depth + 1))
        elif tag in _BLOCKS or tag in ("body", "html"):
            flush()
            if depth <= _MAX_DEPTH:
                out.extend(_blocks(c, depth + 1))
            else:
                text = _WS.sub(" ", c.text_content()).strip()
                if text:
                    out.append(text)
        else:
            para.append(_inline(c, depth + 1))
    flush()
    return out


def html_to_markdown(html: str) -> str:
    """Deterministic GFM-ish markdown for one HTML document."""
    root, _errors = parse_html(html or "")
    return "\n\n".join(_blocks(root, 0))


def render_markdown(
    docs: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(doc_id, markdown, status) — one Arrow-batched zero-shuffle pass;
    a document whose render raises degrades to an error row, never a
    failed stage."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mds, sts = [], [], []
            for i, h in zip(pdf[id_col], pdf[html_col]):
                try:
                    mds.append(html_to_markdown(h))
                    sts.append("ok")
                except Exception as e:  # noqa: BLE001 - error-as-row policy
                    mds.append(None)
                    sts.append(f"error: {e}")
                ids.append(i)
            yield pd.DataFrame({"doc_id": ids, "markdown": mds, "status": sts})

    return docs.select(
        F.col(id_col).alias(id_col), F.col(html_col).alias(html_col)
    ).mapInPandas(run, schema=MARKDOWN_SCHEMA)
