"""Per-turn text correction / normalization operators (pure Python core).

Each function reimplements one reference operator's semantics from scratch
(file:line citations inline). These functions are the *shared kernel*: the
pytest oracle calls them directly, and the Spark pandas UDFs call them over
Arrow batches — equality by construction, then tested anyway.

Whitespace quirks are load-bearing and preserved exactly:
- ``fusion_correct`` rejoins tokens with a single space, collapsing newlines
  (``src/pipeline/fusion.py:36``);
- ``dictionary_correct`` does the same in its single-word pass
  (``src/nlp/ocr_postprocessor.py:270``).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

from .fuzzy import CloseMatchIndex, extract_one, indel_ratio

__all__ = [
    "fusion_correct",
    "normalize_ocr_confusions",
    "apply_case",
    "correct_token",
    "correct_text_regex",
    "dictionary_correct",
    "postprocess",
]

_NUMERIC_RE = re.compile(r"^\d+(\.\d+)?$")


def fusion_correct(text: str) -> str:
    """Rule-based OCR/ICR fusion (T1).

    Semantics of ``OCRICRFusion.correct_text`` (``src/pipeline/fusion.py:13-36``):
    per whitespace token, numeric tokens map ``O→0, l→1, I→1`` (a no-op on
    tokens already matching ``^\\d+(\\.\\d+)?$`` — faithful quirk), other
    tokens map ``0→O, 1→l``; tokens rejoined with a single space.
    """
    if not text:
        return ""
    out = []
    for word in text.split():
        if _NUMERIC_RE.match(word):
            out.append(word.replace("O", "0").replace("l", "1").replace("I", "1"))
        else:
            out.append(word.replace("0", "O").replace("1", "l"))
    return " ".join(out)


_CONFUSION_TABLE = str.maketrans({"0": "o", "1": "l", "3": "e", "5": "s", "6": "g", "8": "b"})


def normalize_ocr_confusions(token: str) -> str:
    """Digit→letter confusion translate for matching (T2).

    ``BlockTextParser._normalize_ocr_confusions``
    (``src/nlp/block_parser.py:245-255``): ``0→o 1→l 3→e 5→s 6→g 8→b``.
    """
    return token.translate(_CONFUSION_TABLE)


def apply_case(source: str, target: str) -> str:
    """Map a corrected term onto the source token's casing (T3).

    ``BlockTextParser._apply_case`` (``src/nlp/block_parser.py:257-265``).
    """
    if source.isupper():
        return target.upper()
    if source[:1].isupper() and source[1:].islower():
        return target.capitalize()
    if source.islower():
        return target.lower()
    return target


_HAS_LETTER_RE = re.compile(r"[A-Za-z]")
_NON_ALPHA_RE = re.compile(r"[^A-Za-z]")
# Token pattern of the regex correction backend
# (``src/nlp/block_parser.py:360``): whitespace runs, alnum words with one
# optional internal hyphen/apostrophe, or single non-word chars — lossless.
_PARSER_TOKEN_RE = re.compile(r"\s+|[A-Za-z0-9]+(?:[-'][A-Za-z0-9]+)?|[^\w\s]")


def _is_word_token(token: str) -> bool:
    """``src/nlp/block_parser.py:267-269``: len>=3 and contains a letter."""
    return len(token) >= 3 and bool(_HAS_LETTER_RE.search(token))


class TokenCorrector:
    """Two-layer token correction (T4) with per-instance memoization.

    Semantics of ``BlockTextParser._correct_token``
    (``src/nlp/block_parser.py:281-322``): OCR-confusion normalize → strip
    non-alpha + lowercase → exact medical → exact english → difflib close
    match vs medical (cutoff 0.84) → vs english (cutoff 0.93), casing mapped
    back via ``apply_case``. The memo dict is the batch-level fast path that
    makes the Arrow-vectorized UDF cheap on repetitive corpora.
    """

    def __init__(
        self,
        medical_terms: Sequence[str],
        english_terms: Sequence[str],
        similarity_cutoff: float = 0.84,
        english_similarity_cutoff: float = 0.93,
    ):
        self.similarity_cutoff = similarity_cutoff
        self.english_similarity_cutoff = english_similarity_cutoff
        self._medical_lookup = {t.lower(): t for t in sorted(set(medical_terms))}
        self._medical_lower = sorted(self._medical_lookup)
        self._english_lookup = {t.lower(): t for t in sorted(set(english_terms))}
        self._english_lower = sorted(self._english_lookup)
        # length-bucketed indexes: byte-identical to difflib
        # get_close_matches but O(length-window) per uncached miss
        self._medical_index = CloseMatchIndex(self._medical_lower)
        self._english_index = CloseMatchIndex(self._english_lower)
        self._memo: Dict[str, Tuple[str, Optional[str]]] = {}

    def correct(self, token: str) -> Tuple[str, Optional[str]]:
        if not _is_word_token(token):
            return token, None
        hit = self._memo.get(token)
        if hit is not None:
            return hit
        result = self._correct_uncached(token)
        if len(self._memo) < 1_000_000:
            self._memo[token] = result
        return result

    def _correct_uncached(self, token: str) -> Tuple[str, Optional[str]]:
        original = token
        cleaned = _NON_ALPHA_RE.sub("", normalize_ocr_confusions(token)).lower()
        if not cleaned:
            return original, None

        exact_medical = self._medical_lookup.get(cleaned)
        if exact_medical:
            return apply_case(original, exact_medical), "medical"
        exact_english = self._english_lookup.get(cleaned)
        if exact_english:
            return apply_case(original, exact_english), "english"

        close_medical = self._medical_index.lookup(cleaned, self.similarity_cutoff)
        if close_medical:
            return apply_case(original, self._medical_lookup[close_medical]), "medical"
        close_english = self._english_index.lookup(
            cleaned, self.english_similarity_cutoff
        )
        if close_english:
            return apply_case(original, self._english_lookup[close_english]), "english"
        return original, None


def correct_token(
    token: str,
    medical_terms: Sequence[str],
    english_terms: Sequence[str],
    similarity_cutoff: float = 0.84,
    english_similarity_cutoff: float = 0.93,
) -> Tuple[str, Optional[str]]:
    """One-shot wrapper over :class:`TokenCorrector` (tests/convenience)."""
    return TokenCorrector(
        medical_terms, english_terms, similarity_cutoff, english_similarity_cutoff
    ).correct(token)


def correct_text_regex(
    text: str, corrector: TokenCorrector
) -> Tuple[str, List[Dict[str, str]]]:
    """Whole-text correction, whitespace-lossless (T6).

    Semantics of ``BlockTextParser._correct_with_regex``
    (``src/nlp/block_parser.py:359-373``): tokenize preserving every
    character, correct word tokens, emit ``{from, to, source}`` lineage,
    exact concatenation.
    """
    corrected_parts: List[str] = []
    corrections: List[Dict[str, str]] = []
    for part in _PARSER_TOKEN_RE.findall(text):
        corrected, source = corrector.correct(part)
        if corrected != part:
            rec = {"from": part, "to": corrected}
            if source:
                rec["source"] = source
            corrections.append(rec)
        corrected_parts.append(corrected)
    return "".join(corrected_parts), corrections


class MultiWordMatcher:
    """N-gram sliding-window detection of multi-word entries.

    Semantics of ``OCRPostProcessor._find_multi_word_matches``
    (``src/nlp/ocr_postprocessor.py:165-186``): an entry is detected iff
    some n-gram window over the lowercased whitespace tokens scores
    ``indel_ratio >= threshold`` against it (detection only — text is
    unchanged; the consumer sort-dedups, so only the matched *set*
    matters).

    Fast paths (set-identical results): entries grouped by word count so
    each window string is built once; per-ngram memo of matching entries
    (template-heavy corpora repeat n-grams massively); char-multiset +
    length upper bounds prune the DP scorer.
    """

    def __init__(self, multi_dict: Sequence[str], threshold: float):
        from collections import defaultdict

        import numpy as np

        self.threshold = threshold
        groups = defaultdict(list)
        for entry in multi_dict:
            groups[entry.count(" ") + 1].append(entry)
        # ONE combined char-count matrix across every word-count group
        # (round 7): a text's memo misses — regardless of word count — are
        # scored in a single numpy broadcast instead of one per group,
        # amortizing the fixed numpy dispatch cost that dominated the miss
        # path on number-bearing corpora (IDs/dates/vitals make those
        # windows unique per document, so the memo never converges there).
        # Per-group row indices are kept CONTIGUOUS so ascending row order
        # within a group equals the group's entry insertion order — the
        # order the per-ngram hit tuples must preserve. The multiset upper
        # bound stays valid since LCS <= multiset intersection size, and
        # only byte columns the dict side can populate are kept (for any
        # other byte, min(entry_count=0, x) = 0, so dropping those columns
        # changes nothing).
        all_entries: List[str] = []
        self.by_n: Dict[int, tuple] = {}  # n -> (entries, rows, lmin, lmax)
        for n, entries in groups.items():
            rows = np.arange(
                len(all_entries), len(all_entries) + len(entries), dtype=np.int64
            )
            lens = [len(e) for e in entries]
            self.by_n[n] = (entries, rows, min(lens), max(lens))
            all_entries.extend(entries)
        self._entries = all_entries
        if all_entries:
            mat = np.stack([self._charvec(e) for e in all_entries])
            active = np.nonzero(mat.sum(axis=0))[0]
            self._mat = np.ascontiguousarray(mat[:, active])
            self._lens = np.array(
                [len(e) for e in all_entries], dtype=np.int64
            )
            self._active = active
        self._memo: Dict[str, Tuple[str, ...]] = {}

    @staticmethod
    def _charvec(s: str):
        import numpy as np

        b = np.frombuffer(s.encode("utf-8", "replace"), dtype=np.uint8)
        return np.bincount(b, minlength=256).astype(np.int64)

    @staticmethod
    def _charvec_batch(strings):
        """Char-count matrix for many strings in one pass: join with a
        NUL separator, one encode, one scatter-add — ~14x faster than
        per-string bincount, value-identical (separator guarded)."""
        import numpy as np

        if any("\x00" in s for s in strings):  # corrupt separator — rare
            return np.stack([MultiWordMatcher._charvec(s) for s in strings])
        out = np.zeros((len(strings), 256), dtype=np.int64)
        b = np.frombuffer(
            "\x00".join(strings).encode("utf-8", "replace"), dtype=np.uint8
        )
        rows = np.cumsum(b == 0)  # row index per byte (separator increments)
        keep = b != 0
        np.add.at(out, (rows[keep], b[keep]), 1)
        return out

    def _match_misses(self, misses: Dict[str, int]) -> Dict[str, Tuple[str, ...]]:
        """Memo-miss path, batched across EVERY word-count group: one numpy
        broadcast scores all of a text's miss n-grams against the combined
        entry matrix; hits are then masked to the n-gram's own group rows
        (cross-group comparisons never happened in the per-group form and
        must not produce hits here).

        The length bound ``200·min(L,lg)/(L+lg)`` is maximized at entry
        length L = lg (increasing below, decreasing above), so clamping lg
        into the group's [lmin, lmax] gives an exact upper bound over every
        group entry — n-grams failing even that skip the charvec work
        entirely (O(1) python, no numpy dispatch)."""
        import numpy as np

        threshold = self.threshold
        out: Dict[str, Tuple[str, ...]] = {}
        survivors: List[str] = []
        s_lgs: List[int] = []
        s_rows = []
        for g, n in misses.items():
            lg = len(g)
            _entries, rows, lmin, lmax = self.by_n[n]
            best = lmin if lg < lmin else (lmax if lg > lmax else lg)
            if 200.0 * (best if best < lg else lg) / (best + lg) >= threshold:
                survivors.append(g)
                s_lgs.append(lg)
                s_rows.append(rows)
            else:
                out[g] = ()
        if survivors:
            vecs = self._charvec_batch(survivors)[:, self._active]
            lgs = np.array(s_lgs, dtype=np.int64)
            # (M, E) multiset-intersection sizes in one broadcast
            common = np.minimum(self._mat[None, :, :], vecs[:, None, :]).sum(
                axis=2
            )
            bound = (
                200.0
                * np.minimum(
                    common, np.minimum(self._lens[None, :], lgs[:, None])
                )
                / (self._lens[None, :] + lgs[:, None])
            )
            hits = bound >= threshold
            entries_all = self._entries
            for m, g in enumerate(survivors):
                rows = s_rows[m]
                cand = rows[hits[m, rows]]
                out[g] = tuple(
                    entries_all[e]
                    for e in cand.tolist()
                    if indel_ratio(g, entries_all[e]) >= threshold
                )
        if len(self._memo) < 2_000_000:
            self._memo.update(out)
        return out

    def find(self, text: str) -> List[str]:
        words = text.lower().split()
        nwords = len(words)
        matched: List[str] = []
        seen = set()
        memo = self._memo
        # phase 1: enumerate windows + memo probe for every group (() misses
        # are cached too, so None = true miss); unrolled concatenation for
        # the common window widths beats join-over-slice ~2x
        staged = []
        misses: Dict[str, int] = {}
        for n in self.by_n:
            if n > nwords:
                continue
            if n == 2:
                ngrams = [a + " " + b for a, b in zip(words, words[1:])]
            elif n == 3:
                ngrams = [
                    a + " " + b + " " + c
                    for a, b, c in zip(words, words[1:], words[2:])
                ]
            else:
                ngrams = [
                    " ".join(words[i : i + n]) for i in range(nwords - n + 1)
                ]
            hits = [memo.get(g) for g in ngrams]
            for g, h in zip(ngrams, hits):
                if h is None:
                    misses[g] = n
            staged.append((ngrams, hits))
        # phase 2: one batched scoring call for all misses of this text
        extra = self._match_misses(misses) if misses else None
        # phase 3: assemble in the original (group order, window order,
        # in-group entry order) first-seen sequence
        for ngrams, hits in staged:
            for g, h in zip(ngrams, hits):
                if h is None:
                    h = extra[g]
                for entry in h:
                    if entry not in seen:
                        seen.add(entry)
                        matched.append(entry)
        return matched


_MW_CACHE: Dict[tuple, MultiWordMatcher] = {}


def _find_multi_word_matches(
    text: str, multi_dict: Sequence[str], threshold: float
) -> List[str]:
    key = (tuple(multi_dict), threshold)
    matcher = _MW_CACHE.get(key)
    if matcher is None:
        matcher = MultiWordMatcher(multi_dict, threshold)
        if len(_MW_CACHE) < 64:
            _MW_CACHE[key] = matcher
    return matcher.find(text)


_NON_ALPHA_ALL_RE = re.compile(r"[^A-Za-z]")

# word -> stripped-lowercase form. A pure per-string function, memoized at
# module level like the fuzzy lookup memos (round 7): template corpora
# repeat tokens massively, and the dict probe is ~20x cheaper than the
# regex sub + lower it replaces. Bounded like every other memo here.
_CLEAN_MEMO: Dict[str, str] = {}

# Per-(fuzzy-memo, hence per dictionary+threshold) raw-word -> action memo,
# stored INSIDE the caller's fuzzy memo dict under an object-identity key
# (cannot collide with its string keys, lives and dies with that dict).
# The whole per-word decision — clean/strip, length gate, exact-set probe,
# fuzzy lookup, prefix/suffix peel, recasing — is a pure function of the
# raw word, so one dict probe replaces the entire chain on repeats
# (round 7). Values: (output_word, matched_term_or_None, score_or_None);
# a non-None score means the word was rewritten and a correction recorded.
_ACTION_MEMO_KEY: object = object()
_MISS: object = object()


def _word_action(
    word: str,
    single_dict: Sequence[str],
    exact_set: frozenset,
    threshold: float,
    memo: Dict,
) -> Tuple[str, Optional[str], Optional[int]]:
    """Uncached per-word decision of ``dictionary_correct`` (semantics of
    ``src/nlp/ocr_postprocessor.py:188-283``, see its docstring)."""
    clean_memo = _CLEAN_MEMO
    clean = clean_memo.get(word)
    if clean is None:
        clean = _NON_ALPHA_ALL_RE.sub("", word).lower()
        if len(clean_memo) < 1_000_000:
            clean_memo[word] = clean
    if len(clean) < 3:
        return (word, None, None)
    if clean in exact_set:
        return (word, clean, None)

    result = memo.get(clean, _MISS)
    if result is _MISS:
        result = extract_one(clean, single_dict, score_cutoff=threshold)
        memo[clean] = result
    if result is None:
        return (word, None, None)

    match_term, score = result
    if match_term == clean:
        return (word, match_term, None)

    # Peel non-alpha prefix/suffix (``:238-247``).
    prefix = ""
    suffix = ""
    stripped = word
    while stripped and not stripped[0].isalpha():
        prefix += stripped[0]
        stripped = stripped[1:]
    while stripped and not stripped[-1].isalpha():
        suffix = stripped[-1] + suffix
        stripped = stripped[:-1]

    if stripped.isupper():
        corrected = match_term.upper()
    elif stripped and stripped[0].isupper():
        corrected = match_term.capitalize()
    else:
        corrected = match_term

    return (prefix + corrected + suffix, match_term, int(score))


def dictionary_correct(
    text: str,
    single_dict: Sequence[str],
    multi_dict: Sequence[str],
    exact_set: frozenset,
    threshold: float,
    label: str,
    memo: Optional[Dict[str, Optional[Tuple[str, float]]]] = None,
) -> Tuple[str, List[Dict], List[str]]:
    """One dictionary stage of the post-processor (T7).

    Semantics of ``OCRPostProcessor._correct_with_dictionary``
    (``src/nlp/ocr_postprocessor.py:188-283``): per whitespace token, strip
    non-alpha + lowercase; len<3 passes through; exact-set hit records a
    match (fast path, no edit); otherwise fuzzy ``extractOne`` vs the
    single-word dictionary at ``threshold`` — on a differing match the token
    is rewritten with leading/trailing non-alpha characters peeled and
    re-attached and the matched term recased (UPPER / Capitalized / as-is).
    Tokens rejoin with a single space (newline-collapsing quirk, ``:270``).
    Then the n-gram multi-word detection pass. Returns
    ``(corrected_text, corrections, sorted-dedup matched terms)``.
    """
    corrections: List[Dict] = []
    matched: List[str] = []
    new_words: List[str] = []
    if memo is None:
        memo = {}
    actions = memo.get(_ACTION_MEMO_KEY)
    if actions is None:
        actions = memo[_ACTION_MEMO_KEY] = {}

    for word in text.split():
        act = actions.get(word)
        if act is None:
            act = _word_action(word, single_dict, exact_set, threshold, memo)
            if len(actions) < 1_000_000:
                actions[word] = act
        full, match_term, score = act
        new_words.append(full)
        if match_term is not None:
            matched.append(match_term)
            if score is not None:
                corrections.append(
                    {"from": word, "to": full, "type": label, "score": score}
                )

    out_text = " ".join(new_words)
    for entry in _find_multi_word_matches(out_text, multi_dict, threshold):
        if entry not in matched:
            matched.append(entry)
    return out_text, corrections, sorted(set(matched))


def postprocess(
    text: str,
    drugs_single: Sequence[str],
    drugs_multi: Sequence[str],
    drug_set: frozenset,
    diseases_single: Sequence[str],
    diseases_multi: Sequence[str],
    disease_set: frozenset,
    threshold: float = 85.0,
    drug_memo: Optional[Dict] = None,
    disease_memo: Optional[Dict] = None,
) -> Dict:
    """Full two-stage post-processing pipeline (T7 public API).

    ``OCRPostProcessor.process`` (``src/nlp/ocr_postprocessor.py:289-340``):
    empty/blank input yields the canonical empty struct; stage 1 drugs then
    stage 2 diseases, corrections concatenated, matched lists independent.
    """
    if not text or not text.strip():
        return {
            "corrected_text": "",
            "corrections": [],
            "matched_drugs": [],
            "matched_diseases": [],
        }
    corrections: List[Dict] = []
    text, drug_corr, matched_drugs = dictionary_correct(
        text, drugs_single, drugs_multi, drug_set, threshold, "drug", drug_memo
    )
    corrections.extend(drug_corr)
    text, disease_corr, matched_diseases = dictionary_correct(
        text, diseases_single, diseases_multi, disease_set, threshold, "disease",
        disease_memo,
    )
    corrections.extend(disease_corr)
    return {
        "corrected_text": text,
        "corrections": corrections,
        "matched_drugs": matched_drugs,
        "matched_diseases": matched_diseases,
    }
