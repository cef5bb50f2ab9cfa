"""Round-7 fast-path HTML tokenizer: result-identity with html.parser.

`_fast_blocks` must either return EXACTLY what the `_BlockCollector`
(stdlib html.parser) produces, or return None (fall back). Three layers:
the synthesized corpus payloads (the data the driver runs on), targeted
edge cases around the subset guard, and hypothesis-generated documents.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from htep_spark.functions.html_extract import (
    _BlockCollector,
    _fast_blocks,
    extract_main_content,
    looks_like_html,
)


def reference_blocks(html_text: str):
    parser = _BlockCollector()
    parser.feed(html_text)
    parser.close()
    return parser.blocks


def assert_fast_matches(html_text: str):
    fast = _fast_blocks(html_text)
    if fast is not None:
        assert fast == reference_blocks(html_text)
    return fast


def test_corpus_payloads_take_fast_path():
    from htep_spark.sources.io import synthesize_transcripts_pdf

    pdf = synthesize_transcripts_pdf(3000)
    htmls = [t for t in pdf["text"] if looks_like_html(t)]
    assert htmls, "corpus must contain HTML payloads"
    fast_hits = 0
    for t in htmls:
        if assert_fast_matches(t) is not None:
            fast_hits += 1
    # the synthesized corpus is inside the simple subset — the fast path
    # must actually fire there, or the optimization is dead code
    assert fast_hits == len(htmls)


EDGES = [
    "",
    "plain text no tags",
    "<p>hello</p>",
    "<p>one<br/>two</p>",
    "<div class='main'><p>x</p></div>",
    '<div class="main"><a href="/x">link</a> tail</div>',
    "<nav><a href='/'>Home</a></nav><p>body text here</p>",
    "<script>var x=1;</script><p>after</p>",
    "<script>var x=1;\nif(a){b()}</script><p>after</p>",
    "<style>p{margin:0}</style><p>after</p>",
    "<SCRIPT>x</SCRIPT><p>q</p>",
    "<script>unterminated",
    "<script src='x.js'></script><p>ok</p>",
    "<p>space before close</p >",
    "<p>upper</P>",
    "<ul><li>a</li><li>b</li></ul>",
    "<table><tr><td>1</td><td>2</td></tr></table>",
    "<a href='/x'>12345</a>",
    "<a>anchor text much longer than the rest</a><p>tiny</p>",
    "<header><h1>Title</h1></header><main><p>content</p></main>",
    "<p>a  b\n\nc\t d</p>",
    "<br><hr><p>void tags</p>",
    "<p>self closing div <div/> tail</p>",
    "text before any tag<p>then block</p>trailing text",
    "<aside><p>boiler</p></aside><p>real</p>",
    "<p>nested <a href='#'>anchor <b>bold</b> text</a> done</p>",
    "<p>a &amp; b</p>",
    "<p>x&nbsp;y</p>",
    "<p>bare & ampersand</p>",
    "<p>prefix charref &ampx and &copy no-semicolon</p>",
    "<a href='/x'>A &amp; B</a><p>tail</p>",
    "trailing run with &am",
    "<script>if (a<b) x()</script><p>y</p>",
]

# documents OUTSIDE the subset — fast path must decline (None), and the
# composed extract must still work via the stdlib parser
FALLBACK_EDGES = [
    "<!-- comment --><p>x</p>",
    "<!doctype html><p>x</p>",
    "<?pi ?><p>x</p>",
    "<p foo='a>b'>quoted gt</p>",
    "<p>stray < less</p>",
    "<foo-bar>custom element</foo-bar>",
    "</p extra='attr'>",
    "</p/>",
    "<p =bare>odd attr</p>",
    "<p\x00>nul</p>",
]


@pytest.mark.parametrize("doc", EDGES)
def test_edge_cases_match(doc):
    fast = assert_fast_matches(doc)
    assert fast is not None, "expected simple-subset doc to take the fast path"


@pytest.mark.parametrize("doc", FALLBACK_EDGES)
def test_fallback_cases_decline(doc):
    assert _fast_blocks(doc) is None
    # composed call still returns the stdlib-parser result
    blocks = reference_blocks(doc)
    text, kept, dropped = extract_main_content(doc)
    assert kept + dropped == len(blocks)


_tag = st.sampled_from(
    ["p", "div", "li", "ul", "a", "span", "b", "nav", "aside", "br", "script"]
)
_text_chunk = st.text(
    alphabet="abc XY12\n\t.,-&;#", min_size=0, max_size=12
)


@st.composite
def simple_html(draw):
    parts = []
    open_stack = []
    for _ in range(draw(st.integers(0, 12))):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            parts.append(draw(_text_chunk))
        elif kind == 1:
            t = draw(_tag)
            attrs = draw(
                st.sampled_from(["", " class='x'", ' href="/y z"', " id=q1"])
            )
            self_close = draw(st.booleans())
            if t == "script" and not self_close:
                body = draw(st.text(alphabet="abc;= \n", max_size=10))
                parts.append(f"<{t}{attrs}>{body}</{t}>")
            elif self_close:
                parts.append(f"<{t}{attrs}/>")
            else:
                parts.append(f"<{t}{attrs}>")
                open_stack.append(t)
        elif kind == 2 and open_stack:
            parts.append(f"</{open_stack.pop()}>")
        else:
            t = draw(_tag)
            parts.append(f"</{t}>")  # unbalanced close — must still match
    return "".join(parts)


@settings(max_examples=400, deadline=None)
@given(simple_html())
def test_hypothesis_simple_subset(doc):
    assert_fast_matches(doc)


_soup = st.text(
    alphabet="<>/ab p&;=\"'!-?\n\t\x00", min_size=0, max_size=40
)


@settings(max_examples=400, deadline=None)
@given(_soup)
def test_hypothesis_tag_soup_never_diverges(doc):
    # adversarial: arbitrary markup-ish soup must either decline (None)
    # or match html.parser exactly — one-off 8000-example runs were clean
    assert_fast_matches(doc)
