"""Closest-pair span decoding from 0/1 start & end indicator vectors.

Semantics match the reference decoder (``rex/utils/span.py:8-81``):
every start position is paired with the nearest end at or after it;
with ``backtrace=True``, ends that no start claimed are paired
backwards with the nearest start at or before them.  Implemented over
numpy arrays (no torch dependency).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def find_closest_span_pairs(
    head: Sequence[int], tail: Sequence[int], backtrace: bool = True
) -> List[Tuple[int, int]]:
    head = np.asarray(head)
    tail = np.asarray(tail)
    head_pos = np.where(head == 1)[0]
    tail_pos = np.where(tail == 1)[0]
    tail_used = {int(p): False for p in tail_pos.tolist()}

    pairs: List[Tuple[int, int]] = []
    for h in head_pos:
        after = tail_pos[tail_pos >= h]
        if len(after) > 0:
            t = int(after[0])
            tail_used[t] = True
            pairs.append((int(h), t))

    if backtrace:
        for t, used in tail_used.items():
            if not used:
                before = head_pos[head_pos <= t]
                if len(before) > 0:
                    pairs.append((int(before[-1]), t))
    return pairs


def find_closest_span_pairs_with_index(
    heads: Sequence[Sequence[int]],
    tails: Sequence[Sequence[int]],
    backtrace: bool = True,
) -> List[Tuple[int, int, int]]:
    """Batched variant: rows are independent indicator vectors; results
    are ``(row_idx, start, end)`` (reference ``span.py:55-81``)."""
    results: List[Tuple[int, int, int]] = []
    for idx, (head, tail) in enumerate(zip(heads, tails)):
        for s, e in find_closest_span_pairs(head, tail, backtrace=backtrace):
            results.append((idx, s, e))
    return results
