"""Main-content extraction from markup payloads (new-build stages O1–O3).

The north_star mandates HTML-boilerplate stripping with DOM/text-density +
link-density heuristics (Boilerpipe/trafilatura-style block classification)
as the text-domain replacement of the reference's OCR stage (its role: raw
payload → clean main-content text, ``src/ocr/extractor.py:71-104``). The
reference's closest semantics are its cleanup → candidate-region → normalize
pattern (``src/icr/preprocessing.py:48-139``) and code-fence/label stripping
(``src/recognition/icr_llava_engine.py:91-96``).

Stages (all stdlib, deterministic, vectorization-friendly):

O1  Markup cleanup — drop ``<script>/<style>`` subtrees and comments,
    decode entities (``html.parser`` with ``convert_charrefs``), normalize
    whitespace runs within a block to single spaces.
O2  DOM block tokenization — stream parser events into blocks split at
    block-level tags, tracking per block: reading-order index, text length,
    anchor-text length, whether the block sits inside a semantic
    boilerplate container (``nav/header/footer/aside``).
O3  Block classification (keep/drop) — fixed documented thresholds:
    drop blocks inside boilerplate containers; drop blocks with
    link_density > ``LINK_DENSITY_MAX`` (0.33); drop short linky blocks
    (< ``MIN_BLOCK_CHARS`` = 10 chars with any anchor text). Kept blocks
    join with ``"\\n"`` (page-join semantics of ``app/api.py:175-176``).

The thresholds are part of this engine's canonical semantics; the pytest
oracle and the Spark UDF share this exact function.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser
from typing import Dict, List, Tuple

__all__ = [
    "extract_main_content",
    "tokenize_blocks",
    "strip_markdown_fences",
    "looks_like_html",
    "LINK_DENSITY_MAX",
    "MIN_BLOCK_CHARS",
]

LINK_DENSITY_MAX = 0.33
MIN_BLOCK_CHARS = 10

_BLOCK_TAGS = frozenset(
    {
        "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
        "br", "table", "tr", "td", "th", "section", "article", "main",
        "header", "footer", "nav", "aside", "blockquote", "pre", "form",
        "title", "body", "html",
    }
)
_SKIP_TAGS = frozenset({"script", "style"})
_BOILER_CONTAINERS = frozenset({"nav", "header", "footer", "aside"})
_VOID_TAGS = frozenset({"br", "hr", "img", "input", "meta", "link"})

_WS_RE = re.compile(r"\s+")
_HTML_SNIFF_RE = re.compile(
    r"<\s*(?:!doctype|html|head|body|div|p|br|span|a\s|ul|ol|li|h[1-6]|table|nav|"
    r"header|footer|article|section|script|style)\b",
    re.IGNORECASE,
)


def looks_like_html(text: str) -> bool:
    """Payload-kind sniff for markup (router analogue of the suffix routing
    at ``app/api.py:170-178``)."""
    return bool(text) and bool(_HTML_SNIFF_RE.search(text))


class _BlockCollector(HTMLParser):
    """O1+O2: stream DOM events into reading-order text blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[Dict] = []
        self._text_parts: List[str] = []
        self._anchor_chars = 0
        self._skip_depth = 0
        self._anchor_depth = 0
        self._boiler_depth = 0
        self._depth = 0

    def _flush(self) -> None:
        raw = "".join(self._text_parts)
        text = _WS_RE.sub(" ", raw).strip()
        if text:
            self.blocks.append(
                {
                    "block_idx": len(self.blocks),
                    "text": text,
                    "n_chars": len(text),
                    "anchor_chars": min(self._anchor_chars, len(text)),
                    "in_boilerplate": self._boiler_depth > 0,
                    "depth": self._depth,
                }
            )
        self._text_parts = []
        self._anchor_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _BOILER_CONTAINERS:
            self._boiler_depth += 1
        if tag == "a":
            self._anchor_depth += 1
        if tag not in _VOID_TAGS:
            self._depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _BOILER_CONTAINERS:
            self._boiler_depth = max(0, self._boiler_depth - 1)
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag not in _VOID_TAGS:
            self._depth = max(0, self._depth - 1)

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        self._text_parts.append(data)
        if self._anchor_depth:
            self._anchor_chars += len(_WS_RE.sub(" ", data).strip())

    def close(self) -> None:  # final flush
        super().close()
        self._flush()


# ---------------------------------------------------------------------------
# Round-7 fast path (guide §4.2 — make the per-task Python work cheap): a
# regex tokenizer for the SIMPLE HTML SUBSET, result-identical to the
# html.parser event stream by construction and differentially tested
# (tests/test_html_fast_path.py + the golden corpus byte-equality gate).
# Anything outside the subset returns None and the stdlib parser runs.
#
# Subset guard (conservative — any doubt falls back):
#   - no '\x00' (html.parser's tag machinery special-cases it);
#   - the document tiles exactly into text runs and tags of the form
#     `</?name attrs?/?>` with [a-zA-Z][a-zA-Z0-9]* names and attrs whose
#     quoted values contain no <>, bare values no quotes/slash/<>;
#   - end tags carry no attrs and no self-close slash (html.parser's
#     endtagfind is strict there, its tolerant branch diverges);
#   - script/style content (html.parser CDATA mode, 3.11 semantics:
#     ``interesting = r'</\s*elem\s*>'`` IGNORECASE) contains a matching
#     close tag or runs to EOF (discarded, exactly like goahead+close).
#
# Within the subset the event stream is identical: one handle_data per
# inter-tag run — goahead (convert_charrefs mode) finds the next '<' and
# emits `unescape(run)` in one call, which we replicate verbatim (the
# &-branches of goahead are unreachable in that mode; a trailing
# buffered-charref run is flushed by close() as the same single chunk) —
# handle_starttag/endtag with the lowercased name, self-closing tags ->
# startendtag -> start+end (the default handle_startendtag), CDATA
# content as one ignored raw data chunk.
# Bare attr values deliberately include '/' (greedy), mirroring
# html.parser's attrfind_tolerant `[^>\s]*`: in `<p id=q1/>` the slash is
# part of the VALUE there, so the tag is a plain start tag, not
# self-closing — the fast path must agree (hypothesis-found case).
_SIMPLE_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z][a-zA-Z0-9_-]*"
    r"(?:=(?:'[^'<>]*'|\"[^\"<>]*\"|[^\s'\"<>]+))?)*)\s*(/?)>"
)
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}


def _fast_blocks(html_text: str):
    """Simple-subset tokenizer: returns the block list, or None to fall
    back to html.parser. Inlines the _BlockCollector state machine over
    the token stream (identical transitions, no per-event dispatch)."""
    if "\x00" in html_text:
        return None
    blocks: List[Dict] = []
    text_parts: List[str] = []
    anchor_chars = 0
    anchor_depth = 0
    boiler_depth = 0
    depth = 0
    ws_sub = _WS_RE.sub

    def flush() -> None:
        nonlocal anchor_chars
        text = ws_sub(" ", "".join(text_parts)).strip()
        if text:
            blocks.append(
                {
                    "block_idx": len(blocks),
                    "text": text,
                    "n_chars": len(text),
                    "anchor_chars": min(anchor_chars, len(text)),
                    "in_boilerplate": boiler_depth > 0,
                    "depth": depth,
                }
            )
        text_parts.clear()
        anchor_chars = 0

    i = 0
    n = len(html_text)
    while i < n:
        j = html_text.find("<", i)
        if j < 0:
            j = n
        if i < j:
            data = unescape(html_text[i:j])
            text_parts.append(data)
            if anchor_depth:
                anchor_chars += len(ws_sub(" ", data).strip())
        if j == n:
            break
        m = _SIMPLE_TAG_RE.match(html_text, j)
        if m is None:
            return None  # outside the subset — stdlib parser decides
        closing, tag, attrs, selfclose = m.groups()
        tag = tag.lower()
        i = m.end()
        if closing:
            if attrs.strip() or selfclose:
                return None  # html.parser's tolerant end-tag branch
            # handle_endtag
            if tag in _SKIP_TAGS:
                continue  # skip-depth bookkeeping is CDATA-internal here
            if tag in _BLOCK_TAGS:
                flush()
            if tag in _BOILER_CONTAINERS:
                boiler_depth = max(0, boiler_depth - 1)
            elif tag == "a":
                anchor_depth = max(0, anchor_depth - 1)
            if tag not in _VOID_TAGS:
                depth = max(0, depth - 1)
            continue
        # handle_starttag (+ immediate endtag when self-closing)
        if tag in _SKIP_TAGS:
            if selfclose:
                continue  # start+end cancel; no CDATA for self-closing
            close_m = _CDATA_CLOSE[tag].search(html_text, i)
            if close_m is None:
                break  # unterminated CDATA: goahead buffers, close() drops
            # content is one ignored data chunk (skip depth > 0); the close
            # tag matches endtagfind and pops the skip depth
            i = close_m.end()
            continue
        if tag in _BLOCK_TAGS:
            flush()
        if tag in _BOILER_CONTAINERS:
            boiler_depth += 1
        elif tag == "a":
            anchor_depth += 1
        if tag not in _VOID_TAGS:
            depth += 1
        if selfclose:
            # default handle_startendtag -> handle_endtag right away
            if tag in _BLOCK_TAGS:
                flush()
            if tag in _BOILER_CONTAINERS:
                boiler_depth = max(0, boiler_depth - 1)
            elif tag == "a":
                anchor_depth = max(0, anchor_depth - 1)
            if tag not in _VOID_TAGS:
                depth = max(0, depth - 1)
    flush()  # close() -> final _flush
    return blocks


def tokenize_blocks(html_text: str) -> List[Dict]:
    """O2: HTML → reading-order block structs with density features."""
    try:
        fast = _fast_blocks(html_text)
        if fast is not None:
            return fast
    except Exception:
        pass  # any fast-path doubt → the stdlib parser is authoritative
    parser = _BlockCollector()
    try:
        parser.feed(html_text)
        parser.close()
    except Exception:
        # stage-isolation semantics (``app/api.py:215-293``): a failing
        # parse degrades to one block of tag-stripped text, never a lost turn
        stripped = _WS_RE.sub(" ", re.sub(r"<[^>]*>", " ", html_text)).strip()
        return (
            [
                {
                    "block_idx": 0,
                    "text": stripped,
                    "n_chars": len(stripped),
                    "anchor_chars": 0,
                    "in_boilerplate": False,
                    "depth": 0,
                }
            ]
            if stripped
            else []
        )
    return parser.blocks


def _keep_block(block: Dict) -> bool:
    """O3 keep/drop rule (fixed thresholds, see module docstring)."""
    if block["in_boilerplate"]:
        return False
    n = block["n_chars"]
    link_density = block["anchor_chars"] / n if n else 1.0
    if link_density > LINK_DENSITY_MAX:
        return False
    if n < MIN_BLOCK_CHARS and block["anchor_chars"] > 0:
        return False
    return True


def extract_main_content(html_text: str) -> Tuple[str, int, int]:
    """O1–O3 composed: → ``(main_text, blocks_kept, blocks_dropped)``.

    Kept block texts join with ``"\\n"`` in reading order.
    """
    blocks = tokenize_blocks(html_text)
    kept = [b for b in blocks if _keep_block(b)]
    text = "\n".join(b["text"] for b in kept)
    return text, len(kept), len(blocks) - len(kept)


_FENCE_RE = re.compile(r"^```[a-zA-Z0-9_-]*\s*$")
_LABEL_RE = re.compile(r"^(?:transcription|ocr)\s*[:\-]\s*", re.IGNORECASE)


def strip_markdown_fences(text: str) -> str:
    """T8-style cleanup (``src/recognition/icr_llava_engine.py:91-96``):
    drop ``` fence lines and leading "Transcription:"/"OCR:" labels."""
    lines = []
    for line in text.splitlines():
        if _FENCE_RE.match(line.strip()):
            continue
        lines.append(_LABEL_RE.sub("", line))
    return "\n".join(lines).strip()
