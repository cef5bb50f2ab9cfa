"""Line-level medical segmentation with character spans (G5).

Semantics of ``MedicalDocumentSegmenter.segment_document``
(``src/segmentation/medical_segmenter.py:25-60``): split text into
non-empty stripped lines, classify each line by the first section whose
keyword substring-matches the lowercased line (section priority =
``SECTION_KEYWORDS`` insertion order), fixed confidence 0.8,
``start_line == end_line == idx`` over the *filtered* line list.

Extension mandated by the north_star: each segment additionally carries
``(start_char, end_char)`` — the half-open character offsets of the stripped
line within the original text (the reference only tracks line indices).
"""

from __future__ import annotations

from typing import Dict, List

from ..dictionaries import SECTION_KEYWORDS

__all__ = ["infer_segment_type", "segment_document"]

# pure per-line memo (same line → same type); template corpora repeat
# section lines massively, so the steady state is one dict probe per line.
# Memory-bounded two ways: long lines (>200 chars, unlikely to repeat) are
# never memoized, and the total is capped by entry count — so per-worker
# growth is bounded by count × max key length, not by corpus line lengths.
_TYPE_MEMO: Dict[str, str] = {}
_MEMO_MAX_LINE_LEN = 200
_MEMO_MAX_ENTRIES = 1_000_000


def infer_segment_type(line: str) -> str:
    hit = _TYPE_MEMO.get(line)
    if hit is not None:
        return hit
    text = line.lower()
    result = "general"
    for segment_type, keywords in SECTION_KEYWORDS.items():
        if any(keyword in text for keyword in keywords):
            result = segment_type
            break
    if len(line) <= _MEMO_MAX_LINE_LEN and len(_TYPE_MEMO) < _MEMO_MAX_ENTRIES:
        _TYPE_MEMO[line] = result
    return result


def segment_document(text: str) -> List[Dict]:
    """Segments with line indices *and* char spans into ``text``."""
    if not text or not text.strip():
        return []
    segments: List[Dict] = []
    idx = 0
    offset = 0
    for raw_line in text.splitlines(keepends=True):
        line = raw_line.strip()
        if line:
            start = offset + raw_line.index(line[0])
            segments.append(
                {
                    "segment_type": infer_segment_type(line),
                    "content": line,
                    "confidence": 0.8,
                    "start_line": idx,
                    "end_line": idx,
                    "start_char": start,
                    "end_char": start + len(line),
                }
            )
            idx += 1
        offset += len(raw_line)
    return segments
