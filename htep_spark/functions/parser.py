"""Dictionary-assisted block-text parser (regex backend, T2–T6).

Reimplements ``BlockTextParser`` (``src/nlp/block_parser.py:107-473``) with
the **regex backend pinned** for determinism: spaCy is absent in this
environment, and the reference itself falls back to
``backend="regex"`` then (``src/nlp/block_parser.py:202-205``). The
spaCy-only token-merge repair (T5, ``:271-279,333-346``) therefore does not
apply — a documented divergence of the canonical semantics (SURVEY.md §2.4).

``parse`` returns the reference's exact result shape: corrected text with
``{from, to, source}`` lineage (T6), flat dictionary matches (substring
fallback, ``:397-399``), layered medical/english matches (token-set
fallback, ``:424-435``), empty entity list (sciSpaCy layer excluded), and
the backend tag.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

from ..dictionaries import ENGLISH_COMMON, MEDICAL_TERMS
from .textops import TokenCorrector, correct_text_regex

__all__ = ["BlockTextParser"]

_ALPHA_TOKEN_RE = re.compile(r"[A-Za-z]+")


class BlockTextParser:
    def __init__(
        self,
        dictionary_terms: Optional[Sequence[str]] = None,
        english_terms: Optional[Sequence[str]] = None,
        similarity_cutoff: float = 0.84,
        english_similarity_cutoff: float = 0.93,
    ):
        self._medical = sorted(set(dictionary_terms or MEDICAL_TERMS))
        self._english = sorted(
            set(t.lower() for t in (english_terms or ENGLISH_COMMON) if t and t.strip())
        )
        self._all_terms = sorted(set(self._medical) | set(self._english))
        self._corrector = TokenCorrector(
            self._medical, self._english, similarity_cutoff, english_similarity_cutoff
        )
        self.backend = "regex"

    def _find_dictionary_matches(self, text: str) -> List[str]:
        """Substring fallback matcher (``src/nlp/block_parser.py:397-399``)."""
        if not text.strip():
            return []
        text_lower = text.lower()
        return sorted(set(t for t in self._all_terms if t.lower() in text_lower))

    def _find_layered_matches(self, text: str) -> Dict[str, List[str]]:
        """Token-set fallback matcher (``src/nlp/block_parser.py:424-435``)."""
        if not text.strip():
            return {"medical": [], "english": []}
        token_set = set(_ALPHA_TOKEN_RE.findall(text.lower()))
        return {
            "medical": sorted(set(t for t in self._medical if t.lower() in token_set)),
            "english": sorted(set(t for t in self._english if t.lower() in token_set)),
        }

    def parse(self, text: str) -> Dict:
        if not text or not text.strip():
            return {
                "corrected_text": "",
                "corrections": [],
                "dictionary_matches": [],
                "dictionary_layers": {"medical": [], "english": []},
                "entities": [],
                "backend": self.backend,
            }
        corrected_text, corrections = correct_text_regex(text, self._corrector)
        return {
            "corrected_text": corrected_text,
            "corrections": corrections,
            "dictionary_matches": self._find_dictionary_matches(corrected_text),
            "dictionary_layers": self._find_layered_matches(corrected_text),
            "entities": [],
            "backend": self.backend,
        }
