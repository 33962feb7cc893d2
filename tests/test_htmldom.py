"""Tokenizer tests: fast scanner vs stdlib oracle (differential), plus the
edge cases the reference's libxml parse pins down."""

from __future__ import annotations

from html_table_spark.corpus import synthesize_documents
from html_table_spark.fixtures import FIXTURES, f14_mega_doc_html
from html_table_spark.htmldom import (
    COMMENT,
    ELEMENT,
    TEXT,
    Node,
    parse_html_fast,
    parse_html_stdlib,
    php_int_cast,
)
from html_table_spark.spans import doc_spans_to_html


def tree_repr(node):
    if isinstance(node, str):  # text children are plain strings
        return ("T", node)
    if node.kind == COMMENT:
        return ("C", node.data)
    return ("E", node.tag, tuple(sorted(node.attrs.items())),
            tuple(tree_repr(c) for c in node.children))


def assert_same_tree(html: str) -> None:
    fast, _ = parse_html_fast(html)
    std, _ = parse_html_stdlib(html)
    assert tree_repr(fast) == tree_repr(std), html[:200]


def test_differential_fixtures():
    for fixture_id, (html, _cfg) in FIXTURES.items():
        assert_same_tree(html)
    assert_same_tree(f14_mega_doc_html(30))


def test_differential_corpus():
    for row in synthesize_documents(n_docs=200, seed=31, media_fraction=0.5):
        assert_same_tree(doc_spans_to_html(row["spans"]))


def test_differential_edge_cases():
    cases = [
        "",
        "plain text only",
        "a < b and c > d",
        "<td>unclosed cell",
        "<table><tr><td>a<td>b</table>",  # implied closes
        "<TABLE ID='X'><TR><TD COLSPAN=2>shout</TD></TR></TABLE>",
        "<table><!-- c --><tr><!-- c2 --><td>x</td></tr></table>",
        "<p>one<p>two<p>three",
        "<table><tr><td>&amp;&nbsp;&lt;ok&gt;</td></tr></table>",
        '<img src="x"/><br><hr/>',
        "<script>if (a<b && c>d) {}</script><table><tr><td>y</td></tr></table>",
        "<style>td > tr { color: red }</style><p>z</p>",
        "<div><span>nested <b>bold</b> tail</span></div>",
        "<table><caption>cap</caption><tr><td>v</td></tr></table>",
        "<ol><li>one<li>two</ol>",
        "df<body></p>sghfd",
        "<table><tr><td title=\"a&quot;b\">t</td></tr></table>",
        "<a href=unquoted>x</a>",
        "<x-custom attr>y</x-custom>",
    ]
    for html in cases:
        assert_same_tree(html)


def test_mismatched_quote_divergence():
    """Known (accepted) divergence: on a start tag with mismatched quotes
    the stdlib tokenizer demotes the whole tag to text, while the fast
    scanner parses it tolerantly — which is what libxml (the reference's
    parser) does. The fast behavior is the spec here."""
    root, _ = parse_html_fast("<td colspan='2\">weird quotes</td>")
    td = next(root.iter_elements())
    assert td.tag == "td"
    assert td.text_content() == "weird quotes"


def test_rawtext_script_not_parsed():
    root, _ = parse_html_fast("<script><table><tr></script><p>after</p>")
    tags = [e.tag for e in root.iter_elements()]
    assert tags == ["script", "p"]


def test_fast_entity_decoding():
    root, _ = parse_html_fast("<td>&amp;x&nbsp;</td>")
    td = next(root.iter_elements())
    assert td.text_content() == "&x\xa0"


def test_unexpected_end_tag_recorded():
    _, errs = parse_html_fast("df</p>x")
    assert any("unexpected end tag" in e for e in errs)


def test_php_int_cast():
    assert php_int_cast("3x") == 3
    assert php_int_cast("") == 0
    assert php_int_cast("  42abc") == 42
    assert php_int_cast("-7") == -7
    assert php_int_cast("1e3") == 1000
    assert php_int_cast("12.9") == 12
    assert php_int_cast("nope") == 0


# --- randomized differential fuzz (fast scanner vs stdlib builder) ----------

from hypothesis import given, settings
from hypothesis import strategies as st

_FUZZ_TAGS = [
    "table", "tr", "td", "th", "thead", "tbody", "tfoot", "caption",
    "p", "div", "span", "b", "li", "ul", "br", "img", "html", "body",
]
_text = st.text(alphabet="ab c&;topmN ", min_size=1, max_size=10)
_attr_val = st.text(alphabet="xyz 123", min_size=0, max_size=6)


@st.composite
def _token(draw):
    kind = draw(st.integers(0, 5))
    tag = draw(st.sampled_from(_FUZZ_TAGS))
    if kind == 0:
        return f"<{tag}>"
    if kind == 1:
        val = draw(_attr_val)
        return f'<{tag} class="{val}" data-k={draw(st.integers(0, 9))}>'
    if kind == 2:
        return f"</{tag}>"
    if kind == 3:
        return draw(_text)
    if kind == 4:
        body = draw(st.text(alphabet="abc ", max_size=8))
        return f"<!-- {body} -->"
    return f"<{tag}/>"


@given(st.lists(_token(), min_size=0, max_size=30))
@settings(max_examples=200, deadline=None)
def test_differential_fuzz_tag_soup(tokens):
    """Random tag soup (unbalanced opens/closes, implied closes, comments,
    entities, void and self-closing elements, skipped structural wrappers):
    the fast scanner and the stdlib builder must produce identical trees."""
    assert_same_tree("".join(tokens))


def test_xpath_descendant_positionals_count_per_parent():
    """``//table[2]`` desugars to descendant-or-self::node()/child::table[2]
    — DOMXPath counts per PARENT, not across the document. Stacked
    positionals re-filter the already-filtered set; attr predicates after a
    positional filter the positional survivor."""
    from html_table_spark.htmldom import parse_html_fast
    from html_table_spark.xpath import compile_xpath

    html = (
        '<div><table id="a"></table><table id="b"></table></div>'
        '<div><table id="c"></table></div>'
        '<table id="d"></table><table id="e"></table>'
    )
    root, _ = parse_html_fast(html)

    def ids(expr):
        return [(n.attrs or {}).get("id") for n in compile_xpath(expr).query(root)]

    # 2nd table per parent: 'b' (div1), 'e' (document) — NOT global 2nd
    assert ids("//table[2]") == ["b", "e"]
    # global document-order 2nd via the wrapper
    assert ids("(//table)[2]") == ["b"]
    # [1][2]: first-per-parent, then 2nd of that singleton set → empty
    assert ids("//table[1][2]") == []
    # positional then attribute filter
    assert ids('//table[2][@id="e"]') == ["e"]
    assert ids('//table[@id="e"][1]') == ["e"]
    # descendant:: counts per CONTEXT (whole subtree), unlike //
    assert ids("descendant::table[2]") == ["b"]
    # the reference's generated forms stay accepted
    for ok in ("(//table)[2]", "(//table[@id=\"x\"])[1]",
               "(//table/thead/tr)[1]", "/table[2]/tr"):
        compile_xpath(ok)
