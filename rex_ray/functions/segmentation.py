"""Sentence segmentation and list splitting.

Reference semantics: ``rex/utils/segmentation.py:9-120`` — newline
insertion after language-specific sentence punctuation (optionally
swallowing trailing quotation marks into the preceding sentence), then
split + strip + drop empties.  Used by the ingest normalizer to break
documents into sentence spans (a flat-map in the dataflow).
"""

from __future__ import annotations

import re
from typing import Any, List, Optional, Sequence, Set, Tuple


def sent_seg(
    text: str,
    special_seg_indicators: Optional[List[Tuple[str, str]]] = None,
    lang: str = "zh",
    punctuations: Optional[Set[str]] = None,
    quotation_seg_mode: bool = True,
) -> List[str]:
    if not isinstance(text, str):
        raise ValueError("text must be a string")
    if not text:
        return []

    if special_seg_indicators:
        for pattern, repl in special_seg_indicators:
            text = re.sub(pattern, repl, text)

    punkt = {"。", "？", "！", "…"} if lang == "zh" else {".", "?", "!"}
    if punctuations:
        punkt = punkt | punctuations

    cls = "".join(punkt)
    if quotation_seg_mode:
        text = re.sub("([%s]+[’”`'\"]*)" % cls, "\\1\n", text)
    else:
        text = re.sub("([%s])" % cls, "\\1\n", text)

    return [s.strip() for s in text.split("\n") if s.strip()]


def split_list_by_element(
    elements: Sequence[Any], delimiter: Any, keep_empty_segments: bool = False
) -> List[List[Any]]:
    """Split a list on every occurrence of ``delimiter``
    (reference ``segmentation.py:82-100``)."""
    segments: List[List[Any]] = []
    cur: List[Any] = []
    found = False
    for el in elements:
        if el == delimiter:
            found = True
            segments.append(cur)
            cur = []
        else:
            cur.append(el)
    if not found:
        return [list(elements)]
    segments.append(cur)
    if keep_empty_segments:
        return segments
    return [s for s in segments if s]


def split_ratios(n: int, ratios: Sequence[float]) -> List[int]:
    """Portion sizes for an n-row split (``segmentation.py:103-120``);
    the distributed form is ``ds.split_proportionately``."""
    sizes = [int(n * r) for r in ratios]
    rest = n - sum(sizes)
    if rest > 0:
        sizes.append(rest)
    return sizes
