"""Pad / truncate encoding of token-id sequences.

Reference semantics: ``rex/data/vocab.py:21-32,105-122`` — sequences
are truncated to ``max_len`` or right-padded with ``pad_id``; the mask
is 1 over real tokens, 0 over padding.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def pad_or_truncate(
    ids: Sequence[int], max_len: int, pad_id: int = 0
) -> Tuple[List[int], List[int]]:
    n = min(len(ids), max_len)
    out = list(ids[:n]) + [pad_id] * (max_len - n)
    mask = [1] * n + [0] * (max_len - n)
    return out, mask


def pad_batch(
    id_lists: Sequence[Sequence[int]], max_len: int, pad_id: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized batch padding: list of variable-length id lists ->
    ``(ids, mask)`` int32 matrices of shape (n, max_len)."""
    n = len(id_lists)
    ids = np.full((n, max_len), pad_id, dtype=np.int32)
    mask = np.zeros((n, max_len), dtype=np.int32)
    for i, row in enumerate(id_lists):
        k = min(len(row), max_len)
        ids[i, :k] = row[:k]
        mask[i, :k] = 1
    return ids, mask
