"""Chat-export JSON payload parse (additional source format).

Agent-transcript exports often embed a whole conversation fragment as JSON
inside one turn's ``text``:

    {"kind": "chat_json",
     "messages": [{"role": "user", "text": "..."},
                  {"role": "assistant", "text": "..."}]}

Decode rule (same block-join semantics as the PDF path,
``app/api.py:175-176``): messages in list order, each rendered as
``role: text`` with multi-line message text preserved, joined with
``"\\n"``. Tool/system messages whose text is empty are dropped (no empty
blocks — mirrors the non-empty-line filter of
``src/segmentation/medical_segmenter.py:46``).
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

__all__ = ["looks_like_chat_json", "parse_chat_json"]


def looks_like_chat_json(text: str) -> bool:
    t = text.lstrip() if text else ""
    return t.startswith("{") and '"chat_json"' in t[:200]


def parse_chat_json(text: str) -> Optional[Tuple[str, int]]:
    """→ ``(joined_text, n_messages_kept)`` or None if not a valid payload."""
    try:
        payload = json.loads(text)
    except Exception:
        return None
    if not isinstance(payload, dict) or payload.get("kind") != "chat_json":
        return None
    blocks = []
    for msg in payload.get("messages") or []:
        if not isinstance(msg, dict):
            continue
        body = str(msg.get("text", "") or "")
        if not body.strip():
            continue
        role = str(msg.get("role", "") or "unknown")
        blocks.append(f"{role}: {body}")
    return "\n".join(blocks), len(blocks)
