"""Property-based differential tests (hypothesis).

The fuzzy fast paths (length/char-multiset pruning, memoization, n-gram
grouping) must be *result-identical* to the naive reference forms — these
tests drive random inputs through both.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from htep_spark.functions.fuzzy import (
    FuzzyMatcher,
    banded_edit_distance,
    indel_ratio,
)
from htep_spark.functions.textops import (
    MultiWordMatcher,
    _PARSER_TOKEN_RE,
    correct_text_regex,
    TokenCorrector,
    fusion_correct,
)

words = st.text(alphabet="abcdefgh ", min_size=0, max_size=24)
tokens = st.text(alphabet="abcdefgh", min_size=0, max_size=12)


def naive_extract_one(query, choices, cutoff):
    best, best_score = None, cutoff
    for c in choices:
        s = indel_ratio(query, c)
        if s >= best_score and (best is None or s > best[1]):
            best, best_score = (c, s), s
    return best


@settings(max_examples=300, deadline=None)
@given(tokens, st.lists(tokens, min_size=1, max_size=12), st.floats(0, 100))
def test_fuzzy_matcher_equals_naive(query, choices, cutoff):
    assert FuzzyMatcher(choices).extract_one(query, cutoff) == naive_extract_one(
        query, choices, cutoff
    )


def naive_multiword(text, multi_dict, threshold):
    matched = []
    ws = text.lower().split()
    for entry in multi_dict:
        n = entry.count(" ") + 1
        if n > len(ws):
            continue
        for i in range(len(ws) - n + 1):
            if indel_ratio(" ".join(ws[i : i + n]), entry) >= threshold:
                matched.append(entry)
                break
    return set(matched)


@settings(max_examples=200, deadline=None)
@given(
    words,
    st.lists(
        st.tuples(tokens.filter(bool), tokens.filter(bool)).map(" ".join),
        min_size=0,  # empty dict: the r7 combined-matrix ctor must not stack
        max_size=8,
    ),
    st.sampled_from([60.0, 75.0, 85.0]),
)
def test_multiword_matcher_equals_naive(text, multi_dict, threshold):
    got = set(MultiWordMatcher(multi_dict, threshold).find(text))
    assert got == naive_multiword(text, multi_dict, threshold)


def test_multiword_matcher_empty_dict():
    assert MultiWordMatcher([], 85.0).find("hello world there") == []


@settings(max_examples=300, deadline=None)
@given(tokens, tokens)
def test_indel_ratio_properties(a, b):
    r = indel_ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == indel_ratio(b, a)  # symmetric
    assert indel_ratio(a, a) == 100.0


@settings(max_examples=300, deadline=None)
@given(tokens, tokens, st.integers(0, 3))
def test_banded_edit_distance_vs_full(a, b, maxd):
    def full_lev(x, y):
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            curr = [i]
            for j, cy in enumerate(y, 1):
                curr.append(
                    min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + (cx != cy))
                )
            prev = curr
        return prev[-1]

    got = banded_edit_distance(a, b, maxd)
    true = full_lev(a, b)
    if true <= maxd:
        assert got == true
    else:
        # reference semantics (src/nlp/lexicon_beam_decoder.py:64-87): may
        # return either the true distance or max+1 once the band is blown —
        # callers only ever test `dist > max_distance`
        assert got > maxd


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcd", min_size=0, max_size=8),
    st.lists(
        st.text(alphabet="abcd", min_size=0, max_size=8),
        min_size=0,
        max_size=30,
        unique=True,
    ),
    st.sampled_from([0.6, 0.84, 0.93]),
)
def test_close_match_index_is_byte_identical_to_difflib(word, vocab, cutoff):
    """The length-bucketed fast path (VERDICT r03 #9) must return EXACTLY
    what difflib.get_close_matches(n=1) returns — including equal-ratio
    tie-breaks (nlargest over (ratio, word) → lexicographically largest)
    — on a tiny alphabet chosen to force many ties and near-cutoff
    ratios."""
    import difflib

    from htep_spark.functions.fuzzy import CloseMatchIndex

    want = difflib.get_close_matches(word, vocab, n=1, cutoff=cutoff)
    got = CloseMatchIndex(vocab).lookup(word, cutoff)
    assert got == (want[0] if want else None)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab01l IO.\n\t-'", min_size=0, max_size=60))
def test_fusion_token_count_invariant(text):
    # fusion preserves the (whitespace-split) token multiset size
    assert len(fusion_correct(text).split()) == len(text.split())


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abce135 \n\tX.-", min_size=0, max_size=80))
def test_correct_text_regex_whitespace_lossless(text):
    # T6 invariant: tokenization is lossless and corrections never touch
    # whitespace — the whitespace runs of the output equal the input's
    corrector = TokenCorrector(["abcde"], ["ace"])
    corrected, _ = correct_text_regex(text, corrector)
    import re

    assert re.findall(r"\s+", corrected) == re.findall(r"\s+", text)
    # tokenization covers every character
    assert "".join(_PARSER_TOKEN_RE.findall(text)) == text


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="<>ab c/='\"!-\n&;#pdivscrpt", min_size=0, max_size=120))
def test_html_extraction_total_and_deterministic(raw):
    from htep_spark.functions.html_extract import extract_main_content

    out1 = extract_main_content(raw)
    out2 = extract_main_content(raw)
    assert out1 == out2
    assert isinstance(out1[0], str)


@settings(max_examples=150, deadline=None)
@given(st.text(min_size=0, max_size=200))
def test_extract_turn_total(raw):
    from htep_spark.reference import extract_turn

    result = extract_turn(raw)
    assert isinstance(result["corrected_text"], str)
    assert result["metrics"]["content_chars"] >= 0


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab c:.\nrx bp plan\t", min_size=0, max_size=120))
def test_segment_spans_always_slice_back(text):
    from htep_spark.functions.segments import segment_document

    segments = segment_document(text)
    for i, seg in enumerate(segments):
        assert text[seg["start_char"] : seg["end_char"]] == seg["content"]
        assert seg["start_line"] == seg["end_line"] == i
        assert seg["content"] == seg["content"].strip() != ""


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="PatienNmDr.:- 0123456789/\nAge", min_size=0, max_size=150))
def test_deidentify_span_invariants(text):
    from htep_spark.functions.deid import deidentify

    result = deidentify(text)
    spans = result["spans"]
    # sorted, non-overlapping, in-bounds
    prev = 0
    for s in spans:
        assert 0 <= s["start_char"] < s["end_char"] <= len(text)
        assert s["start_char"] >= prev
        prev = s["end_char"]
    # masking is reconstructable: replacing spans with [KIND] yields masked
    rebuilt = []
    cursor = 0
    for s in spans:
        rebuilt.append(text[cursor : s["start_char"]])
        rebuilt.append(f"[{s['kind']}]")
        cursor = s["end_char"]
    rebuilt.append(text[cursor:])
    assert "".join(rebuilt) == result["masked_text"]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab .!?\n", min_size=0, max_size=120))
def test_sentence_spans_invariants(text):
    from htep_spark.functions.deid import split_sentences

    sentences = split_sentences(text)
    for i, s in enumerate(sentences):
        assert s["sent_idx"] == i
        assert text[s["start_char"] : s["end_char"]] == s["content"]
        assert s["content"] == s["content"].strip() != ""


# ---------------------------------------------------------------- codecs --

_img_arrays = st.integers(2, 24).flatmap(
    lambda h: st.integers(2, 24).flatmap(
        lambda w: st.lists(
            st.integers(0, 255), min_size=h * w * 3, max_size=h * w * 3
        ).map(lambda flat: np.array(flat, dtype=np.uint8).reshape(h, w, 3))
    )
)


@settings(max_examples=60, deadline=None)
@given(_img_arrays, st.sampled_from(["png", "bmp", "ppm"]))
def test_image_codec_roundtrip_exact(img, fmt):
    """encode→decode is the identity for every format on random pixels."""
    from htep_spark.functions import codecs

    out = codecs.decode_image(codecs.encode_image(img, fmt))
    assert np.array_equal(out, img)
    assert codecs.sniff_format(codecs.encode_image(img, fmt)) == fmt


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=4, max_size=2000),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_codec_roundtrip_exact(samples, rate):
    from htep_spark.functions import codecs

    arr = np.array(samples, dtype=np.int16)
    out, out_rate = codecs.decode_wav(codecs.encode_wav(arr, rate))
    assert out_rate == rate
    assert np.array_equal(out[:, 0], arr)


@settings(max_examples=25, deadline=None)
@given(st.lists(_img_arrays, min_size=1, max_size=5))
def test_rawv_roundtrip_and_seek(frames):
    from htep_spark.functions import codecs

    payload = codecs.encode_rawv(frames)
    assert codecs.rawv_frame_count(payload) == len(frames)
    out = codecs.decode_rawv(payload)
    assert all(np.array_equal(a, b) for a, b in zip(out, frames))
    # index-seek decode returns exactly the requested frames
    picks = list(range(0, len(frames), 2))
    seek = codecs.decode_rawv(payload, frame_indices=picks)
    assert all(np.array_equal(seek[j], frames[i]) for j, i in enumerate(picks))


def test_asof_join_matches_pandas_merge_asof(spark):
    """Differential: asof_join == pandas.merge_asof (backward, exact
    matches allowed) on a seeded random workload, with and without
    tolerance — the canonical reference implementation as oracle."""
    import numpy as np
    import pandas as pd

    from htep_spark.operators.joins import asof_join

    rng = np.random.default_rng(20260816)
    base = pd.Timestamp("2024-01-01")
    left_pdf = pd.DataFrame(
        {
            "user_id": rng.integers(0, 6, 300),
            "ts": base + pd.to_timedelta(rng.integers(0, 500_000, 300), unit="s"),
            "lid": np.arange(300),
        }
    )
    right_pdf = pd.DataFrame(
        {
            "user_id": rng.integers(0, 6, 200),
            "ts": base + pd.to_timedelta(rng.integers(0, 500_000, 200), unit="s"),
            "rid": np.arange(200),
        }
    )
    # merge_asof requires unique right keys per (by, ts) for a well-defined
    # pick — dedupe to max rid like the driver query does
    right_pdf = (
        right_pdf.groupby(["user_id", "ts"], as_index=False)["rid"].max()
    )
    left = spark.createDataFrame(left_pdf)
    right = spark.createDataFrame(right_pdf)
    for tol in (None, 3600):
        got = (
            asof_join(left, right, tolerance_sec=tol)
            .select("lid", "rid_r")
            .toPandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            left_pdf.sort_values("ts"),
            right_pdf.sort_values("ts").rename(columns={"rid": "rid_r"}),
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
            tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        ).sort_values("lid").reset_index(drop=True)
        lhs = got["rid_r"].astype("float64")
        rhs = want["rid_r"].astype("float64")
        assert lhs.equals(rhs), f"tol={tol}: first diff at\n" + str(
            pd.concat([got, want["rid_r"].rename("want")], axis=1)[lhs != rhs].head()
        )


_paletted_anim = st.integers(2, 16).flatmap(
    lambda h: st.integers(2, 16).flatmap(
        lambda w: st.integers(1, 3).flatmap(
            lambda nf: st.lists(
                st.lists(
                    st.integers(0, 7), min_size=h * w, max_size=h * w
                ),
                min_size=nf,
                max_size=nf,
            ).map(
                lambda idxs: [
                    np.array(
                        [[i * 31 % 256, i * 57 % 256, i * 13 % 256] for i in row],
                        dtype=np.uint8,
                    ).reshape(h, w, 3)
                    for row in idxs
                ]
            )
        )
    )
)


@settings(max_examples=30, deadline=None)
@given(_paletted_anim)
def test_gif_frames_roundtrip_fuzz(frames):
    """encode_gif_frames→decode_gif is the identity for any ≤256-color
    animation of shared canvas size (per-frame local color tables)."""
    from htep_spark.functions import codecs

    out = codecs.decode_gif(codecs.encode_gif_frames(frames))
    assert len(out) == len(frames)
    for got, want in zip(out, frames):
        assert np.array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(_img_arrays, min_size=1, max_size=3),
    st.sampled_from(["none", "packbits", "lzw"]),
    st.sampled_from(["<", ">"]),
    st.sampled_from([0, 3, 7]),
)
def test_tiff_pages_roundtrip_fuzz(pages, comp, bo, rps):
    """encode_tiff_pages→decode_tiff_pages is the identity for any page
    list across compressions, byte orders, and strip layouts."""
    from htep_spark.functions import codecs

    payload = codecs.encode_tiff_pages(
        pages, compression=comp, byteorder=bo, rows_per_strip=rps
    )
    assert codecs.sniff_format(payload) == "tiff"
    out = codecs.decode_tiff_pages(payload)
    assert len(out) == len(pages)
    for got, want in zip(out, pages):
        assert np.array_equal(got, want)


@settings(max_examples=250, deadline=None)
@given(
    st.sampled_from(
        [
            b"GIF89a", b"GIF87a", b"II*\x00", b"MM\x00*", b"BM", b"P6",
            b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"RAWV", b"",
        ]
    ),
    st.binary(min_size=0, max_size=120),
)
def test_decoders_error_contract_on_garbage(magic, body):
    """Corrupt payloads must raise ValueError — never hang, never allocate
    from absurd claimed dimensions (the MAX_DECODE_PIXELS guard), never
    leak struct.error/IndexError/EOFError (fuzz round 5 found a GIF header
    claiming a ~2GB canvas and several raw-exception leaks)."""
    from htep_spark.functions import codecs

    payload = magic + body
    try:
        img = codecs.decode_image(payload)
    except ValueError:
        return
    # a decode that SUCCEEDS on random garbage must still be a sane image
    assert img.size <= codecs.MAX_DECODE_PIXELS * 4


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=1, max_value=500),
        max_size=60,
    ),
    st.integers(min_value=1, max_value=64),
)
def test_qdigest_properties(hist, k):
    """Q-digest invariants on random histograms (universe 2^8 for speed —
    the rule is depth-generic): (1) counts are preserved exactly; (2)
    digest size <= 2k + 1 (each kept family totals > sigma and families
    are disjoint); (3) every rank query errs by <= D * sigma ranks vs the
    exact rank-selection answer; (4) compaction is a pure function (same
    input -> identical digest)."""
    from htep_spark.operators.qdigest import (
        exact_quantile,
        qdigest_compact,
        qdigest_rank_query,
        rank_of,
    )

    d = 8
    n = sum(hist.values())
    sigma = n // k
    digest = qdigest_compact(hist, d, sigma)
    assert digest == qdigest_compact(dict(reversed(list(hist.items()))), d, sigma)
    assert sum(c for _, _, c in digest) == n
    if sigma > 0:
        assert len(digest) <= 2 * k + 1, (len(digest), k)
    else:
        assert len(digest) <= len(hist) + 1
    for num, den in ((1, 2), (9, 10), (99, 100), (1, 100)):
        r = (num * n + den - 1) // den
        if r == 0:
            continue
        est = min(qdigest_rank_query(digest, r), max(hist))
        assert abs(rank_of(hist, est) - r) <= d * sigma + max(hist.values()), (
            # rank error bound: D*sigma from merged ancestors, plus at most
            # one node's own count from the crossing node itself
            hist, k, r, est,
        )
        exact = exact_quantile(hist, r)
        if sigma == 0:
            assert est == exact  # no compaction -> the sketch is exact
