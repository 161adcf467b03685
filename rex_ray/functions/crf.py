"""Vectorized CRF viterbi decode (numpy, batch-first).

Re-derivation of the reference's three CRF decode families
(``/root/reference/rex/modules/crf.py`` — PlainCRF:230 from
pytorch-crf, MaskedCRF:563, ConstraintCRF:961 from AllenNLP) as pure
numpy kernels for map_batches stages: no torch, no per-sequence Python
in the forward pass — the time loop is over sequence length only
(L <= 64 here), everything else is (batch, tags) vectorized, and the
backtrace is batch-vectorized fancy indexing.

Decode modes (same argmax semantics as the reference):

* plain       — learned transitions as-is (PlainCRF._viterbi_decode:477)
* masked      — ``min(transitions, ±100 mask)`` so illegal transitions
                can never win (MaskedCRF.get_min_mask:724)
* constrained — illegal transitions hard-replaced by -10000, including
                start/end constraints (ConstraintCRF.decode:1323)

The BIO/IOB1/BIOUL/BMES transition-legality rules
(:func:`allowed_transitions`, reference crf.py:10-153) follow the
published AllenNLP scheme definitions.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

NEG_INF = -10000.0
MASK_SCALE = 100.0


# ---------------------------------------------------------------- legality
def is_transition_allowed(
    constraint_type: str,
    from_tag: str,
    from_entity: str,
    to_tag: str,
    to_entity: str,
) -> bool:
    """Whether ``from`` -> ``to`` is legal under the tagging scheme.
    START/END are the virtual boundary tags."""
    if to_tag == "START" or from_tag == "END":
        return False
    if constraint_type == "BIO":
        if from_tag == "START":
            return to_tag in ("O", "B")
        if to_tag == "END":
            return from_tag in ("O", "B", "I")
        return (
            to_tag in ("O", "B")
            or (
                to_tag == "I"
                and from_tag in ("B", "I")
                and from_entity == to_entity
            )
        )
    if constraint_type == "IOB1":
        if from_tag == "START":
            return to_tag in ("O", "I")
        if to_tag == "END":
            return from_tag in ("O", "B", "I")
        return (
            to_tag in ("O", "I")
            or (
                to_tag == "B"
                and from_tag in ("B", "I")
                and from_entity == to_entity
            )
        )
    if constraint_type == "BIOUL":
        if from_tag == "START":
            return to_tag in ("O", "B", "U")
        if to_tag == "END":
            return from_tag in ("O", "L", "U")
        return (
            (from_tag in ("O", "L", "U") and to_tag in ("O", "B", "U"))
            or (
                from_tag in ("B", "I")
                and to_tag in ("I", "L")
                and from_entity == to_entity
            )
        )
    if constraint_type == "BMES":
        if from_tag == "START":
            return to_tag in ("B", "S")
        if to_tag == "END":
            return from_tag in ("E", "S")
        return (
            (to_tag in ("B", "S") and from_tag in ("E", "S"))
            or (
                to_tag == "M"
                and from_tag in ("B", "M")
                and from_entity == to_entity
            )
            or (
                to_tag == "E"
                and from_tag in ("B", "M")
                and from_entity == to_entity
            )
        )
    raise ValueError(f"Unknown constraint type: {constraint_type}")


def _split(label: str) -> Tuple[str, str]:
    if label in ("START", "END"):
        return label, ""
    return label[0], label[1:].lstrip("-")


def allowed_transitions(
    constraint_type: str, labels: Dict[int, str]
) -> List[Tuple[int, int]]:
    """All legal (from_id, to_id) pairs, with START=num_labels and
    END=num_labels+1 as virtual ids (reference crf.py:10-54)."""
    num_labels = len(labels)
    items = list(labels.items()) + [
        (num_labels, "START"),
        (num_labels + 1, "END"),
    ]
    out = []
    for fi, fl in items:
        ft, fe = _split(fl)
        for ti, tl in items:
            tt, te = _split(tl)
            if is_transition_allowed(constraint_type, ft, fe, tt, te):
                out.append((fi, ti))
    return out


def transition_mask(
    num_tags: int, allowed_with_start_end: List[Tuple[int, int]]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """±100 soft masks (trans (T,T), start (T,), end (T,)) — legal
    entries +100, illegal -100 (reference
    get_transition_mask_mat_from_allowed, crf.py:178-227)."""
    trans = -np.ones((num_tags, num_tags), dtype=np.float64)
    start = -np.ones(num_tags, dtype=np.float64)
    end = -np.ones(num_tags, dtype=np.float64)
    s_idx, e_idx = num_tags, num_tags + 1
    for f, t in allowed_with_start_end:
        if f == s_idx and t == e_idx:
            continue
        if f == s_idx:
            start[t] = 1.0
        elif t == e_idx:
            end[f] = 1.0
        else:
            trans[f, t] = 1.0
    return trans * MASK_SCALE, start * MASK_SCALE, end * MASK_SCALE


# ---------------------------------------------------------------- decode
def viterbi_decode_batch(
    emissions: np.ndarray,
    mask: np.ndarray,
    transitions: np.ndarray,
    start_transitions: np.ndarray,
    end_transitions: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batch viterbi argmax decode.

    Args:
        emissions: (B, L, T) float scores.
        mask: (B, L) 0/1; ``mask[:, 0]`` must be all 1 (reference
            asserts the same, crf.py:485).
        transitions / start_transitions / end_transitions: (T, T),
            (T,), (T,) additive scores.

    Returns:
        (tags, scores): tags (B, L) int64, -1 beyond each sequence's
        length; scores (B,) the viterbi path score (incl. start/end
        transitions), matching PlainCRF._viterbi_decode:477-555.
    """
    emissions = np.asarray(emissions, dtype=np.float64)
    mask = np.asarray(mask)
    B, L, T = emissions.shape
    if not np.all(mask[:, 0] == 1):
        raise ValueError("mask of the first timestep must be all on")
    score = start_transitions[None, :] + emissions[:, 0, :]  # (B, T)
    history = np.zeros((B, L - 1, T), dtype=np.int64) if L > 1 else None
    batch_idx = np.arange(B)
    for i in range(1, L):
        # (B, T_from, T_to): best-so-far + transition + emission
        nxt = (
            score[:, :, None]
            + transitions[None, :, :]
            + emissions[:, i, None, :]
        )
        idx = nxt.argmax(axis=1)  # (B, T_to)
        nscore = np.take_along_axis(nxt, idx[:, None, :], axis=1)[:, 0, :]
        valid = (mask[:, i] != 0)[:, None]
        score = np.where(valid, nscore, score)
        history[:, i - 1, :] = idx
    score = score + end_transitions[None, :]

    seq_ends = mask.astype(np.int64).sum(axis=1) - 1  # (B,)
    best_last = score.argmax(axis=1)
    best_score = score[batch_idx, best_last]

    tags = np.full((B, L), -1, dtype=np.int64)
    tags[batch_idx, seq_ends] = best_last
    cur = best_last.copy()
    for i in range(L - 1, 0, -1):
        active = seq_ends >= i
        prev = history[batch_idx, i - 1, cur]
        cur = np.where(active, prev, cur)
        tags[active, i - 1] = prev[active]
    return tags, best_score


def masked_decode(
    emissions: np.ndarray,
    mask: np.ndarray,
    transitions: np.ndarray,
    start_transitions: np.ndarray,
    end_transitions: np.ndarray,
    trans_mask: np.ndarray,
    start_mask: np.ndarray,
    end_mask: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """MaskedCRF decode: elementwise ``min`` with the ±100 mask drives
    illegal transitions to <= -99.9 so they cannot win
    (MaskedCRF.get_min_mask, crf.py:724-730)."""
    return viterbi_decode_batch(
        emissions,
        mask,
        np.minimum(transitions, trans_mask),
        np.minimum(start_transitions, start_mask),
        np.minimum(end_transitions, end_mask),
    )


def constrained_decode(
    emissions: np.ndarray,
    mask: np.ndarray,
    transitions: np.ndarray,
    start_transitions: np.ndarray,
    end_transitions: np.ndarray,
    allowed_with_start_end: List[Tuple[int, int]],
) -> Tuple[np.ndarray, np.ndarray]:
    """ConstraintCRF decode: disallowed transitions hard-replaced by
    -10000 (not blended), start/end constraints included
    (ConstraintCRF.decode:1323-1393)."""
    T = transitions.shape[0]
    c_trans, c_start, c_end = transition_mask(T, allowed_with_start_end)
    legal = c_trans > 0
    legal_s = c_start > 0
    legal_e = c_end > 0
    return viterbi_decode_batch(
        emissions,
        mask,
        np.where(legal, transitions, NEG_INF),
        np.where(legal_s, start_transitions, NEG_INF),
        np.where(legal_e, end_transitions, NEG_INF),
    )
