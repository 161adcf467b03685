"""Position kernels: substring search, relative positions, pointer decode.

Reference semantics: ``rex/utils/position.py`` (cited per function).
Torch-free; pointer decoders accept numpy arrays / nested lists.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import numpy as np


def find_all_positions(
    long: Union[List[Any], str], sub: Union[List[Any], str]
) -> List[Tuple[int, int]]:
    """All occurrences of ``sub`` in ``long`` as ``(start, end_plus_1)``
    (reference ``position.py:6-45``; overlapping matches included)."""
    if isinstance(long, str) and isinstance(sub, str):
        long = list(long)
        sub = list(sub)
    if not (isinstance(long, list) and isinstance(sub, list)):
        raise TypeError("types of the two inputs must both be str or list")
    if len(sub) > len(long):
        raise ValueError("sub length is longer than the long")
    k = len(sub)
    return [
        (i, i + k) for i in range(len(long) - k + 1) if long[i : i + k] == sub
    ]


def construct_relative_positions(pos: int, max_length: int) -> List[int]:
    """``|i - pos|`` for i in [0, max_length) (``position.py:48-65``)."""
    if pos < 0 or pos >= max_length:
        raise ValueError(f"pos: {pos} is not in [0, {max_length})")
    return np.abs(np.arange(max_length) - pos).tolist()


def relative_positions_matrix(positions: np.ndarray, max_length: int) -> np.ndarray:
    """Vectorized batch variant: one row of ``|i - pos|`` per input pos.

    Used by the PCNN-style scorer to build position-embedding indices for
    a whole Arrow batch at once instead of per-row Python loops.
    """
    idx = np.arange(max_length)[None, :]
    return np.abs(idx - np.asarray(positions)[:, None])


def find_element_in_list(elements: Sequence[Any], element: Any) -> List[int]:
    return [i for i, el in enumerate(elements) if el == element]


def extract_spans_from_start_end(
    start_label: Sequence[int], end_label: Sequence[int]
) -> List[Tuple[int, int]]:
    """Non-overlapping (start, end) pairs from 1-hot start/end vectors:
    each start takes the first end in [start, next_start)
    (reference ``position.py:72-86``)."""
    start_label = np.asarray(start_label)
    end_label = np.asarray(end_label)
    start_idxes = np.where(start_label == 1)[0].tolist()
    end_idxes = np.where(end_label == 1)[0].tolist()
    positions: List[Tuple[int, int]] = []
    for i, s in enumerate(start_idxes):
        next_start = start_idxes[i + 1] if i < len(start_idxes) - 1 else len(start_label)
        for e in end_idxes:
            if s <= e < next_start:
                positions.append((s, e))
                break
    return positions


def decode_pointer_matrix_spans(
    batch_mat: np.ndarray, offsets: Optional[List[int]] = None
) -> List[List[Tuple[int, int]]]:
    """(batch, cls, seq, seq) 0/1 pointer matrices -> per-row span lists
    from class 0, offset-shifted (reference ``position.py:104-116``)."""
    batch_mat = np.asarray(batch_mat)
    out: List[List[Tuple[int, int]]] = []
    for i in range(len(batch_mat)):
        off = offsets[i] if offsets else 0
        coords = np.argwhere(batch_mat[i, 0] == 1)
        out.append([(int(s) - off, int(e) + 1 - off) for s, e in coords])
    return out


def decode_multiclass_pointer_matrix_spans(
    batch_mat: np.ndarray, offsets: Optional[List[int]] = None
) -> List[List[Tuple[int, int, int]]]:
    """Multi-class variant: spans carry their class index
    (reference ``position.py:119-132``)."""
    batch_mat = np.asarray(batch_mat)
    out: List[List[Tuple[int, int, int]]] = []
    for i in range(len(batch_mat)):
        off = offsets[i] if offsets else 0
        spans: List[Tuple[int, int, int]] = []
        for j in range(batch_mat.shape[1]):
            for s, e in np.argwhere(batch_mat[i, j] == 1):
                spans.append((int(s) - off, int(e) + 1 - off, j))
        out.append(spans)
    return out
