"""The per-turn reference extractor — single source of truth.

``extract_turn(text)`` is the canonical operator chain of this platform
(SURVEY.md §2.9): payload decode (PDF-layout parse / HTML boilerplate strip
/ markdown-fence strip, replacing the reference's OCR stage) → dictionary
correction (T7) → segmentation with spans (G5) → structured field
extraction (E1/E2/E5) → classification + urgency + entities (C1/C2/C4).

Composition: each downstream consumer uses the reference DAG it belongs to.
``final_text = content.strip()`` and classifier/urgency on the corrected
text follow the API DAG (``app/api.py:233,280-293``). The structured-field
extractor consumes ``final_text`` (newlines intact) per the offline-eval
DAG (``tests/evaluate_metrics.py:39-90``) — the path that produced the
reference's own ``ground_truth.json``; the API path would feed it the
whitespace-collapsed post-processor output (T7 joins tokens with a single
space, ``src/nlp/ocr_postprocessor.py:270``), which destroys every
line-anchored field regex. Segments come from the CLI DAG
(``src/pipeline/controller.py:22-45``) and are computed on the decoded
``content`` with char spans. These composition choices are this engine's
canonical semantics; every per-operator behavior is reference-faithful.

This exact function body is both the pytest oracle and the kernel of the
Spark pandas UDF (``htep_spark/operators/extract.py``) — equality by
construction, then tested anyway. Stage-isolation semantics
(``app/api.py:215-293``): any stage failure degrades that stage's output
and sets ``metrics.failed`` — a turn is never lost.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from .dictionaries import (
    DISEASES_MULTI,
    DISEASES_SINGLE,
    DISEASE_SET,
    DRUGS_MULTI,
    DRUGS_SINGLE,
    DRUG_SET,
)
from .functions.deid import deidentify
from .functions.classify import (
    classify_document,
    document_urgency,
    extract_medical_entities,
)
from .functions.extract_fields import extract_record
from .functions.html_extract import (
    extract_main_content,
    looks_like_html,
    strip_markdown_fences,
)
from .functions.chat_json import looks_like_chat_json, parse_chat_json
from .functions.pdf_layout import looks_like_pdf_layout, parse_pdf_layout
from .functions.segments import segment_document
from .functions.textops import fusion_correct, postprocess

__all__ = ["decode_payload", "extract_turn", "fusion_correct"]

# Per-process fuzzy-lookup memo tables (pure caches: same in → same out).
_DRUG_MEMO: Dict = {}
_DISEASE_MEMO: Dict = {}


def decode_payload(text: Optional[str]) -> Tuple[str, str, int, int]:
    """Payload router → ``(content, payload_kind, blocks_kept, blocks_dropped)``.

    Content-sniff routing (the text-domain analogue of the file-suffix
    routing at ``app/api.py:170-178``): PDF-layout JSON → HTML markup →
    markdown-fenced → plain text. Deterministic per turn, independent of
    any side channel.
    """
    if not text:
        return "", "plain", 0, 0
    if looks_like_pdf_layout(text):
        parsed = parse_pdf_layout(text)
        if parsed is not None:
            content, n_blocks = parsed
            return content, "pdf_layout", n_blocks, 0
    if looks_like_chat_json(text):
        parsed = parse_chat_json(text)
        if parsed is not None:
            content, n_blocks = parsed
            return content, "chat_json", n_blocks, 0
    if looks_like_html(text):
        content, kept, dropped = extract_main_content(text)
        return content, "html", kept, dropped
    if "```" in text:
        return strip_markdown_fences(text), "markdown", 0, 0
    return text, "plain", 0, 0


def extract_turn(text: Optional[str]) -> Dict:
    """Full canonical per-turn extraction. Returns the dict form of
    ``schema.EXTRACTION_RESULT_TYPE``."""
    try:
        return _extract_turn_inner(text)
    except Exception as exc:  # stage isolation: never lose a turn
        safe = text or ""
        return {
            "payload_kind": "plain",
            "content": safe,
            "final_text": safe.strip(),
            "corrected_text": safe.strip(),
            "corrections": [],
            "matched_drugs": [],
            "matched_diseases": [],
            "segments": [],
            "extracted": _empty_extracted(),
            "document_type": "unknown",
            "doc_confidence": 0.0,
            "keywords_found": [],
            "secondary_types": [],
            "urgency": "routine",
            "urgency_confidence": 0.5,
            "entities": {
                "medications": [],
                "conditions": [],
                "procedures": [],
                "measurements": [],
            },
            "deid": {"masked_text": safe.strip(), "spans": []},
            "metrics": {
                "blocks_kept": 0,
                "blocks_dropped": 0,
                "n_segments": 0,
                "n_corrections": 0,
                "content_chars": len(safe),
                "failed": True,
                "error": f"{type(exc).__name__}: {exc}",
            },
        }


def _empty_extracted() -> Dict:
    return {
        "patient_name": None,
        "age": None,
        "gender": None,
        "date": None,
        "doctor_name": None,
        "hospital": None,
        "diagnosis": [],
        "medicines": [],
        "vitals": {"bp": None, "temp": None, "pulse": None},
        "instructions": [],
    }


def _extract_turn_inner(text: Optional[str]) -> Dict:
    content, payload_kind, kept, dropped = decode_payload(text)

    # app/api.py:233 — the canonical text is the decoded content, stripped.
    final_text = content.strip()

    post = postprocess(
        final_text,
        DRUGS_SINGLE,
        DRUGS_MULTI,
        DRUG_SET,
        DISEASES_SINGLE,
        DISEASES_MULTI,
        DISEASE_SET,
        85.0,
        _DRUG_MEMO,
        _DISEASE_MEMO,
    )
    corrected_text = post["corrected_text"] if final_text else ""

    # segments on multi-line content (documented deviation, module docstring)
    segments = segment_document(content)

    # eval-harness DAG: field extraction on the newline-intact final text
    extracted = extract_record(final_text) if final_text else {}
    if extracted:
        vit = extracted.get("vitals") or {}
        extracted["vitals"] = {
            "bp": vit.get("bp"),
            "temp": vit.get("temp"),
            "pulse": vit.get("pulse"),
        }
    else:
        extracted = _empty_extracted()

    cls = classify_document(corrected_text)
    urgency, urgency_conf = document_urgency(corrected_text)
    entities = extract_medical_entities(corrected_text)
    # north_star de-identification: masked text + PII spans against the
    # newline-intact final text (same reference frame as the extractor)
    deid = deidentify(final_text)

    return {
        "payload_kind": payload_kind,
        "content": content,
        "final_text": final_text,
        "corrected_text": corrected_text,
        "corrections": [
            {
                "from": c["from"],
                "to": c["to"],
                "type": c["type"],
                "score": int(c["score"]),
            }
            for c in post["corrections"]
        ],
        "matched_drugs": post["matched_drugs"],
        "matched_diseases": post["matched_diseases"],
        "segments": segments,
        "extracted": extracted,
        "document_type": cls["document_type"],
        "doc_confidence": float(cls["confidence"]),
        "keywords_found": cls["keywords_found"],
        "secondary_types": cls["secondary_types"],
        "urgency": urgency,
        "urgency_confidence": float(urgency_conf),
        "entities": entities,
        "deid": deid,
        "metrics": {
            "blocks_kept": kept,
            "blocks_dropped": dropped,
            "n_segments": len(segments),
            "n_corrections": len(post["corrections"]),
            "content_chars": len(content),
            "failed": False,
            "error": None,
        },
    }
