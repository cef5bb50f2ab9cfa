"""PDF/layout payload parse: embedded layout JSON → reading-order text (S2).

Text-domain replacement of the reference's PDF path
(``src/ocr/extractor.py:123-137`` returns ``{page: text}``, pages joined with
``"\\n"`` at ``app/api.py:175-176``). A layout payload is JSON in the turn's
``text`` column:

    {"kind": "pdf_layout",
     "pages": [{"page": 1,
                "blocks": [{"bbox": [x0, y0, x1, y1], "text": "..."}, ...]}]}

Reading order: pages ascending by page number; blocks within a page sorted
top-to-bottom then left-to-right by ``(y0, x0)`` — the sort semantics of the
image segmenters (``src/segmentation/line_segmenter.py:21-38`` top-down,
``word_segmenter.py:39`` left-to-right). Blocks join with ``"\\n"`` within a
page and pages join with ``"\\n"``.
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

__all__ = ["looks_like_pdf_layout", "parse_pdf_layout"]


def looks_like_pdf_layout(text: str) -> bool:
    t = text.lstrip() if text else ""
    return t.startswith("{") and '"pdf_layout"' in t[:200]


def parse_pdf_layout(text: str) -> Optional[Tuple[str, int]]:
    """→ ``(joined_text, n_blocks)`` or None if not a valid layout payload."""
    try:
        payload = json.loads(text)
    except Exception:
        return None
    if not isinstance(payload, dict) or payload.get("kind") != "pdf_layout":
        return None
    pages = payload.get("pages") or []
    page_texts = []
    n_blocks = 0
    for page in sorted(pages, key=lambda p: p.get("page", 0)):
        blocks = page.get("blocks") or []
        ordered = sorted(
            blocks,
            key=lambda b: (
                (b.get("bbox") or [0, 0, 0, 0])[1],
                (b.get("bbox") or [0, 0, 0, 0])[0],
            ),
        )
        n_blocks += len(ordered)
        page_texts.append("\n".join(str(b.get("text", "")) for b in ordered))
    return "\n".join(page_texts), n_blocks
