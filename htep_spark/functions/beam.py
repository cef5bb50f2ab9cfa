"""Lexicon-aware beam-search word decoding (R9–R11).

Reimplements the numeric semantics of ``src/nlp/lexicon_beam_decoder.py``:

R9  beam search over per-position character candidates: beams expand with
    summed ``log(max(confidence, 1e-8))``, pruned to ``beam_width`` by score
    (:149-196); ``raw_confidence = exp(score / len(normalized))``.
R10 nearest-lexicon lookup: normalize ``[^A-Za-z]``-strip + upper; candidate
    pool bucketed by ``(length, first_char)`` signature within ±1 length —
    a hand-rolled broadcast-hash-join probe (:54-58, 117-147); banded edit
    distance with distance-1 early exit (:89-115).
R11 confidence-gated replacement: primary terms replace when mean top-1
    confidence <= 0.80 or min <= 0.60; non-primary only at distance <= 1 and
    min <= 0.45; a non-primary exact hit yields to a distance<=1 primary term
    under low confidence (:203-260).

On Spark this runs embarrassingly parallel per word inside a pandas UDF —
the lexicon buckets are closure-captured broadcast state.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Tuple

from .fuzzy import banded_edit_distance

__all__ = ["LexiconBeamDecoder"]

_NORM_RE = re.compile(r"[^A-Za-z]")


def _normalize_word(word: str) -> str:
    return _NORM_RE.sub("", word or "").upper()


class LexiconBeamDecoder:
    def __init__(
        self,
        lexicon_terms: Iterable[str],
        primary_terms: Optional[Iterable[str]] = None,
        max_edit_distance: int = 2,
        replacement_confidence_threshold: float = 0.80,
        replacement_min_char_confidence_threshold: float = 0.60,
        non_primary_replacement_min_char_confidence: float = 0.45,
    ):
        self.max_edit_distance = max_edit_distance
        self.replacement_confidence_threshold = replacement_confidence_threshold
        self.replacement_min_char_confidence_threshold = (
            replacement_min_char_confidence_threshold
        )
        self.non_primary_replacement_min_char_confidence = (
            non_primary_replacement_min_char_confidence
        )
        self.lexicon = set()
        self.primary_lexicon = set()
        for term in lexicon_terms:
            normalized = _normalize_word(term)
            if len(normalized) >= 2:
                self.lexicon.add(normalized)
        for term in primary_terms or ():
            normalized = _normalize_word(term)
            if len(normalized) >= 2:
                self.primary_lexicon.add(normalized)
        self.lexicon |= self.primary_lexicon

        # Buckets are filled in SORTED order. The reference iterates a
        # Python set here (src/nlp/lexicon_beam_decoder.py:54-58), leaving
        # equal-distance tie-breaks at the mercy of set iteration order —
        # which varies with PYTHONHASHSEED across worker processes. A
        # distributed engine needs one deterministic answer per input, so
        # we pin the pool order to (length asc via the ±1 loop, then
        # alphabetical): the `_nearest` winner becomes
        # argmin(distance, len(candidate), candidate). This is also what
        # makes R10/R11 reproducible in SQL (`beam_replace` oracle).
        self.by_signature: Dict[Tuple[int, str], List[str]] = defaultdict(list)
        self.primary_by_signature: Dict[Tuple[int, str], List[str]] = defaultdict(list)
        for word in sorted(self.lexicon):
            self.by_signature[(len(word), word[0])].append(word)
        for word in sorted(self.primary_lexicon):
            self.primary_by_signature[(len(word), word[0])].append(word)

    def _nearest_from_pool(
        self, normalized: str, pool: List[str]
    ) -> Tuple[Optional[str], Optional[int]]:
        best_word, best_dist = None, self.max_edit_distance + 1
        for candidate in pool:
            dist = banded_edit_distance(normalized, candidate, self.max_edit_distance)
            if dist < best_dist:
                best_word, best_dist = candidate, dist
                if dist == 1:
                    break
        if best_word is None or best_dist > self.max_edit_distance:
            return None, None
        return best_word, best_dist

    def _nearest(
        self, word: str, signature_index, exact_set
    ) -> Tuple[Optional[str], Optional[int]]:
        normalized = _normalize_word(word)
        if len(normalized) < 2 or not exact_set:
            return None, None
        if normalized in exact_set:
            return normalized, 0
        pool: List[str] = []
        for length in range(len(normalized) - 1, len(normalized) + 2):
            if length >= 2:
                pool.extend(signature_index.get((length, normalized[0]), []))
        return self._nearest_from_pool(normalized, pool)

    def decode_word(
        self,
        char_candidates: List[List[Dict[str, float]]],
        beam_width: int = 20,
    ) -> Dict:
        if not char_candidates:
            return {
                "raw_word": "",
                "decoded_word": "",
                "lexicon_word": None,
                "distance": None,
                "score": float("-inf"),
                "raw_confidence": 0.0,
                "replacement_applied": False,
                "replacement_reason": None,
            }

        beams: List[Tuple[str, float]] = [("", 0.0)]
        top1: List[float] = []
        for position in char_candidates:
            if not position:
                continue
            top1.append(max(float(c.get("confidence", 0.0)) for c in position))
            expanded = [
                (
                    prefix + str(c.get("character", "")),
                    score + math.log(max(float(c.get("confidence", 0.0)), 1e-8)),
                )
                for prefix, score in beams
                for c in position
            ]
            expanded.sort(key=lambda item: item[1], reverse=True)
            beams = expanded[:beam_width]

        raw_word, raw_score = beams[0]
        normalized_raw = _normalize_word(raw_word)
        raw_confidence = float(math.exp(raw_score / max(1, len(normalized_raw))))
        mean_conf = sum(top1) / len(top1) if top1 else 0.0
        min_conf = min(top1) if top1 else 0.0

        lexicon_word: Optional[str] = None
        distance: Optional[int] = None
        replacement_applied = False
        replacement_reason: Optional[str] = None
        decoded = normalized_raw or raw_word

        if normalized_raw in self.lexicon:
            lexicon_word, distance = normalized_raw, 0
        else:
            near_word, near_dist = self._nearest(raw_word, self.by_signature, self.lexicon)
            if near_word is not None and near_dist is not None:
                lexicon_word, distance = near_word, near_dist
                if near_word in self.primary_lexicon:
                    allow = (
                        mean_conf <= self.replacement_confidence_threshold
                        or min_conf <= self.replacement_min_char_confidence_threshold
                    )
                else:
                    allow = (
                        near_dist <= 1
                        and min_conf <= self.non_primary_replacement_min_char_confidence
                    )
                if allow:
                    decoded = near_word
                    replacement_applied = True
                    replacement_reason = "low-confidence-lexicon-fallback"
                else:
                    replacement_reason = "high-confidence-kept-raw"

        if (
            normalized_raw in self.lexicon
            and normalized_raw not in self.primary_lexicon
            and self.primary_lexicon
        ):
            primary_word, primary_dist = self._nearest(
                raw_word, self.primary_by_signature, self.primary_lexicon
            )
            if (
                primary_word is not None
                and primary_dist is not None
                and primary_dist <= 1
                and (
                    mean_conf <= self.replacement_confidence_threshold
                    or min_conf <= self.replacement_min_char_confidence_threshold
                )
            ):
                decoded = primary_word
                lexicon_word, distance = primary_word, primary_dist
                replacement_applied = True
                replacement_reason = "low-confidence-primary-fallback"

        return {
            "raw_word": normalized_raw or raw_word,
            "decoded_word": decoded,
            "lexicon_word": lexicon_word,
            "distance": distance,
            "score": raw_score,
            "raw_confidence": raw_confidence,
            "top1_mean_confidence": mean_conf,
            "min_top1_confidence": min_conf,
            "replacement_applied": replacement_applied,
            "replacement_reason": replacement_reason,
        }
