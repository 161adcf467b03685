"""Piecewise (PCNN) segment masks.

Reference semantics: ``rex/utils/mask.py:1-17`` — segment 1 before the
first of (head, tail), 2 between them, 3 after, 0 for padding.
"""

from __future__ import annotations

import numpy as np


def construct_piecewise_mask(
    head_pos: int, tail_pos: int, seq_len: int, max_seq_len: int
) -> list:
    assert 0 <= head_pos < seq_len
    assert 0 <= tail_pos < seq_len
    return piecewise_mask_batch(
        np.array([head_pos]), np.array([tail_pos]), np.array([seq_len]), max_seq_len
    )[0].tolist()


def piecewise_mask_batch(
    head_pos: np.ndarray,
    tail_pos: np.ndarray,
    seq_len: np.ndarray,
    max_seq_len: int,
) -> np.ndarray:
    """Vectorized over a whole batch: (n,) int arrays -> (n, max_seq_len)
    int8 matrix.  Matches the scalar reference loop exactly."""
    lo = np.minimum(head_pos, tail_pos)[:, None]
    hi = np.maximum(head_pos, tail_pos)[:, None]
    end = np.minimum(seq_len, max_seq_len)[:, None]
    idx = np.arange(max_seq_len)[None, :]
    mask = np.zeros((len(head_pos), max_seq_len), dtype=np.int8)
    mask[(idx >= 0) & (idx < lo)] = 1
    mask[(idx >= lo) & (idx < hi)] = 2
    mask[(idx >= hi) & (idx < end)] = 3
    return mask
