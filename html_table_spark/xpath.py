"""Minimal XPath subset used by the extraction engine.

The reference accepts arbitrary XPath through ``tableXPathPosition``
(``src/Parser.php:67-92``) but *generates* only four shapes internally
(``Parser.php:56,60,102,105``; ``Section.php:25-27``)::

    (//table)[1]                  -- default table selection
    (//table[@id="x"])[1]         -- selection by id
    (//table)[N]                  -- selection by position
    (//table/thead/tr)[N]         -- header-row location (also //table/tr)

plus the test-suite's ``//p``.  This module evaluates exactly that family —
absolute descendant paths with child steps, ``[@attr="value"]`` /
positional predicates, a wildcard step, and an optional outer ``(...)[N]``
index — over :class:`html_table_spark.htmldom.Node` trees, returning nodes
in document order (deduplicated), as ``DOMXPath::query`` does.

Anything outside the subset raises :class:`ParserError` with the reference's
eager-validation message (``Parser.php:73-80`` validates the expression at
*config* time against an empty document; we validate by parsing the grammar —
same effect: misconfigurations surface on the driver, never inside a Spark
task).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .errors import ParserError, msg_invalid_xpath
from .htmldom import ELEMENT, Node

_STEP_RE = re.compile(
    r"""^
    (?P<axis>//|/)
    (?P<name>\*|[a-zA-Z][a-zA-Z0-9_-]*)
    (?P<preds>(\[[^\]]*\])*)
    """,
    re.VERBOSE,
)
_PRED_RE = re.compile(
    r"""\[
        (?:
            @(?P<attr>[a-zA-Z][a-zA-Z0-9_:-]*)\s*=\s*
            (?:"(?P<dval>[^"]*)"|'(?P<sval>[^']*)')
          | (?P<pos>\d+)
        )
    \]""",
    re.VERBOSE,
)
_OUTER_RE = re.compile(r"^\((?P<path>.+)\)\[(?P<idx>\d+)\]$", re.DOTALL)


@dataclass(frozen=True)
class _Step:
    descendant: bool  # '//' vs '/'
    name: str  # tag name or '*'
    attr_preds: tuple[tuple[str, str], ...]
    position: int | None  # 1-based positional predicate


@dataclass(frozen=True)
class XPathExpr:
    steps: tuple[_Step, ...]
    outer_index: int | None  # 1-based, from the (...)[N] wrapper
    source: str

    def query(self, root: Node) -> list[Node]:
        it = _iter_steps(root, self.steps)
        if self.outer_index is not None:
            # lazy: stop traversing the tree at the N-th match
            i = self.outer_index - 1
            if i < 0:
                return []
            for idx, node in enumerate(it):
                if idx == i:
                    return [node]
            return []
        return list(it)

    def first(self, root: Node) -> Node | None:
        if self.outer_index is not None and self.outer_index != 1:
            result = self.query(root)
            return result[0] if result else None
        return next(_iter_steps(root, self.steps), None)


def compile_xpath(expression: str) -> XPathExpr:
    """Parse ``expression`` or raise ``ParserError`` (reference message,
    ``Parser.php:77``)."""
    text = expression.strip()
    outer_index: int | None = None
    match = _OUTER_RE.match(text)
    if match:
        outer_index = int(match.group("idx"))
        text = match.group("path").strip()
    if not text.startswith("/"):
        raise ParserError(msg_invalid_xpath(expression))
    steps: list[_Step] = []
    pos = 0
    while pos < len(text):
        m = _STEP_RE.match(text[pos:])
        if not m:
            raise ParserError(msg_invalid_xpath(expression))
        preds_text = m.group("preds") or ""
        attr_preds: list[tuple[str, str]] = []
        position: int | None = None
        consumed = 0
        for pm in _PRED_RE.finditer(preds_text):
            if pm.start() != consumed:
                raise ParserError(msg_invalid_xpath(expression))
            consumed = pm.end()
            if pm.group("pos") is not None:
                if position is not None:
                    # [1][2] applies predicates successively in real XPath;
                    # out of subset — reject rather than mis-evaluate
                    raise ParserError(msg_invalid_xpath(expression))
                position = int(pm.group("pos"))
            else:
                if position is not None:
                    # attr predicate AFTER a positional changes meaning in
                    # real XPath ([2][@id=x] vs [@id=x][2]) — out of subset
                    raise ParserError(msg_invalid_xpath(expression))
                value = pm.group("dval")
                if value is None:
                    value = pm.group("sval")
                attr_preds.append((pm.group("attr").lower(), value))
        if consumed != len(preds_text):
            raise ParserError(msg_invalid_xpath(expression))
        descendant = m.group("axis") == "//"
        if descendant and position is not None:
            # real XPath //x[n] counts per PARENT, not across the global
            # descendant walk (our tree has no parent pointers to replicate
            # that) — reject eagerly instead of selecting the wrong node.
            # The reference's generated forms only use the outer (...)[N]
            # wrapper, which IS global document order and stays supported.
            raise ParserError(msg_invalid_xpath(expression))
        steps.append(
            _Step(
                descendant=descendant,
                name=m.group("name").lower(),
                attr_preds=tuple(attr_preds),
                position=position,
            )
        )
        pos += m.end()
    if not steps:
        raise ParserError(msg_invalid_xpath(expression))
    return XPathExpr(steps=tuple(steps), outer_index=outer_index, source=expression)


def _matches(node: Node, step: _Step) -> bool:
    if node.kind != ELEMENT:  # candidates generators yield elements only
        return False
    if step.name != "*" and node.tag != step.name:
        return False
    for attr, value in step.attr_preds:
        if node.attrs.get(attr) != value:
            return False
    return True


def _children_elements(node: Node):
    for child in node.children:
        if type(child) is Node and child.kind == ELEMENT:
            yield child


def _descendants(node: Node):
    # filter on pop instead of building per-node element listcomps: one
    # slice-reverse per expanded node, no throwaway lists on leaf-heavy trees
    stack = node.children[::-1]
    while stack:
        n = stack.pop()
        if type(n) is Node and n.kind == ELEMENT:
            yield n
            if n.children:
                stack.extend(n.children[::-1])


def _step_matches(ctx: Node, step: _Step):
    candidates = _descendants(ctx) if step.descendant else _children_elements(ctx)
    if step.position is not None:
        # positional predicate applies per context node; stop the
        # (possibly deep) traversal at the wanted match
        want = step.position
        for n in candidates:
            if _matches(n, step):
                want -= 1
                if want == 0:
                    yield n
                    return
    else:
        for n in candidates:
            if _matches(n, step):
                yield n


def _iter_steps(root: Node, steps: tuple[_Step, ...]):
    """Lazily yield the path's matches in document order, deduplicated —
    depth-first chaining of the per-step generators, so an outer
    ``(...)[1]`` consumer stops the whole traversal at the first match.

    Order note: contexts are processed in document order and each context's
    matches are generated in document order; for overlapping descendant
    contexts the first-occurrence dedup coincides with document order for
    this XPath subset (same argument as the eager evaluator it replaced).
    """
    last = len(steps) - 1

    def walk(level: int, ctx: Node):
        step = steps[level]
        if level == last:
            yield from _step_matches(ctx, step)
        else:
            for node in _step_matches(ctx, step):
                yield from walk(level + 1, node)

    seen: set[int] = set()
    for node in walk(0, root):
        key = id(node)
        if key not in seen:
            seen.add(key)
            yield node

