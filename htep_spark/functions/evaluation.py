"""Evaluation operators of the reference's offline harness (SURVEY.md §3.3).

``tests/evaluate_metrics.py`` defines the reference's quality metrics:
- CER: ``Levenshtein.distance(pred, truth) / len(truth)`` (:14-16);
- entity-set accuracy: flatten the nested extracted record into
  ``"key:value"`` / ``"key.sub:value"`` strings and take
  ``|pred ∩ truth| / |truth|`` (:18-37, 69-74).

The flatten rules are reproduced exactly: scalars → ``key:value``; list of
scalars → one entry per item; list of dicts → ``key.sub:value`` per field;
dict → ``key.sub:value`` — all lowercased, Nones skipped.
"""

from __future__ import annotations

from typing import Dict, Set

__all__ = ["character_error_rate", "flatten_record", "entity_set_accuracy"]


def character_error_rate(pred: str, truth: str) -> float:
    """Levenshtein distance / len(truth); 0.0 for empty truth and empty pred."""
    if not truth:
        return 0.0 if not pred else 1.0
    prev = list(range(len(truth) + 1))
    for i, cp in enumerate(pred, 1):
        curr = [i]
        for j, ct in enumerate(truth, 1):
            curr.append(min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + (cp != ct)))
        prev = curr
    return prev[-1] / len(truth)


def flatten_record(record: Dict) -> Set[str]:
    flat: Set[str] = set()
    for key, value in (record or {}).items():
        if value is None:
            continue
        if isinstance(value, dict):
            for sub, sv in value.items():
                if sv is not None:
                    flat.add(f"{key}.{sub}:{sv}".lower())
        elif isinstance(value, list):
            for item in value:
                if isinstance(item, dict):
                    for sub, sv in item.items():
                        if sv is not None:
                            flat.add(f"{key}.{sub}:{sv}".lower())
                elif item is not None:
                    flat.add(f"{key}:{item}".lower())
        else:
            flat.add(f"{key}:{value}".lower())
    return flat


def entity_set_accuracy(pred: Dict, truth: Dict) -> float:
    truth_flat = flatten_record(truth)
    if not truth_flat:
        return 1.0
    pred_flat = flatten_record(pred)
    return len(pred_flat & truth_flat) / len(truth_flat)
